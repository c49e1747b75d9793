package graft

import org.apache.spark.sql.types._

/** The driver-gate output contract, enforced as code instead of
  * convention: every `SparkEntry.queries` result is pandas-sorted
  * column-by-column by the verification driver, so an entry may emit ONLY
  * flat atomic columns pandas can hash and order. Nested types
  * (array/map/struct) die in `sort_values` with "unhashable type"
  * (CORRECTNESS_r08's one red row, quality_train_lr's `final_w`
  * array&lt;double&gt;); DECIMAL and DATE hash differently than DuckDB's
  * (SURVEY §5's long-standing rule); BINARY is excluded with them — the
  * multimodal entries surface digests/lengths, never raw bytes.
  *
  * SchemaContractSpec runs [[violations]] over every registered entry at
  * sf0.001 each build, so a regression fails `sbt test` rather than
  * surfacing a round later as a red driver row.
  */
object SchemaContract {

  /** The closed set of column types an entry may output. */
  private[graft] def allowed(dt: DataType): Boolean = dt match {
    case BooleanType | DoubleType | FloatType |
         ByteType | ShortType | IntegerType | LongType |
         StringType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Violation messages ("col: type") for a schema; empty = compliant. */
  def violations(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !allowed(f.dataType) => s"${f.name}: ${f.dataType.simpleString}"
    }
}
