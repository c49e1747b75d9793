package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Partial top-k pushdown as a custom physical AGGREGATE: keeps the `k`
  * smallest struct rows per group in a bounded heap, with map-side partial
  * aggregation — so at most k rows PER GROUP PER PARTITION ever reach the
  * exchange, instead of every candidate row.
  *
  * This is the missing physical shape for the `row_number() ≤ k` pattern
  * when WindowGroupLimit does not apply (e.g. the rank stage sits above
  * joins/projections the rule will not push through, as in the ANN scoring
  * pipelines): the window form shuffles EVERY scored candidate to its
  * query's partition and sorts there — candidates × corpus rows through
  * the wire at 100 TB — while this aggregate reduces each map partition to
  * k rows per query before the exchange, the same asymmetic win as any
  * partial agg. PlanSpec asserts the partial mode below the exchange;
  * `ann_topk_agg` holds the result to the SAME DuckDB oracle as the
  * window-based `ann_topk_exact`, so the semantics equivalence is
  * hash-checked, not asserted.
  *
  * Ordering is the struct's natural field order (field 1 primary, …), so
  * callers encode direction by negating keys and append tie-breaks as
  * extra fields — `struct(-dot, neighbor_id)` reproduces
  * `ORDER BY dot DESC, neighbor_id` with deterministic ties. The heap is
  * a max-heap of the k best so far: a new row only displaces the current
  * worst (O(log k) per row, O(k) memory per group — executor memory never
  * scales with candidate count).
  *
  * Buffers serialize as length-prefixed UnsafeRow bytes (the standard
  * TypedImperativeAggregate spill/shuffle contract), so partial heaps
  * merge across partitions like any builtin sketch.
  */
case class PartialTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  private def structType: StructType = child.dataType.asInstanceOf[StructType]
  private lazy val fieldTypes: Array[DataType] = structType.fields.map(_.dataType)

  @transient private lazy val ordering =
    RowOrdering.createNaturalAscendingOrdering(fieldTypes.toIndexedSeq)
  // max-heap comparator: the heap head is the WORST (largest) kept row
  @transient private lazy val reverseCmp = new java.util.Comparator[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = ordering.compare(b, a)
  }
  @transient private lazy val proj = UnsafeProjection.create(fieldTypes)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"partial_topk requires a STRUCT sort-key child, got ${child.dataType}")
    else if (!RowOrdering.isOrderable(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"partial_topk requires an orderable struct, got ${child.dataType}")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"partial_topk requires k > 0, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k + 1, reverseCmp)

  private def offer(buf: java.util.PriorityQueue[InternalRow], row: InternalRow,
      copyOnKeep: Boolean): Unit = {
    if (buf.size < k) {
      buf.add(if (copyOnKeep) row.copy() else row)
    } else if (ordering.compare(row, buf.peek()) < 0) {
      buf.poll()
      buf.add(if (copyOnKeep) row.copy() else row)
    }
  }

  override def update(buf: java.util.PriorityQueue[InternalRow], input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    // rows are reused by the scan — copy only when actually kept
    if (v != null) offer(buf, v.asInstanceOf[InternalRow], copyOnKeep = true)
    buf
  }

  override def merge(buf: java.util.PriorityQueue[InternalRow], other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next(), copyOnKeep = false)
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = buf.toArray(new Array[InternalRow](buf.size))
    java.util.Arrays.sort(arr, ordering)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray(new Array[InternalRow](buf.size))
    val unsafe = rows.map(r => proj.apply(r).copy())
    val total = 4 + unsafe.map(4 + _.getSizeInBytes).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(unsafe.length)
    unsafe.foreach { u =>
      bb.putInt(u.getSizeInBytes)
      u.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(fieldTypes.length)
      row.pointTo(rowBytes, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PartialTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PartialTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PartialTopK =
    copy(child = newChild)

  override def prettyName: String = "partial_topk"
}

object PartialTopK {
  import org.apache.spark.sql.graftshim

  /** Column-API entry point: `partial_topk(struct(sortKey…, payload…), k)`
    * → array of the k smallest structs, ascending.
    */
  def partial_topk(ord: Column, k: Int): Column =
    graftshim.toColumn(
      PartialTopK(graftshim.toExpression(ord), k).toAggregateExpression())
}
