package graft

import org.apache.spark.sql.functions._

/** The driver's pandas-sort output contract, enforced by test (VERDICT r8
  * item #2): every registered entry must emit only flat atomic columns —
  * the check ScalaTest could never see until quality_train_lr's
  * array&lt;double&gt; column erred the driver gate in round 8.
  */
class SchemaContractSpec extends SparkSuite {

  test("every SparkEntry.queries output schema is flat-atomic (driver pandas-sortable)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      SchemaContract.violations(fn(spark, sf).schema).map(v => s"$name -> $v")
    }
    assert(bad.isEmpty, s"driver-contract violations:\n${bad.mkString("\n")}")
  }

  test("the guard actually fires: a deliberately-arrayed fixture fails") {
    import spark.implicits._
    val fixture = Seq((1L, Seq(0.1, 0.2))).toDF("id", "final_w")
    val v = SchemaContract.violations(fixture.schema)
    assert(v == Seq("final_w: array<double>"), v)
    // and the other banned classes are banned too
    val banned = Seq(
      $"id".cast("decimal(10,2)").as("dec"),
      to_date(lit("2026-01-01")).as("d"),
      map(lit("k"), lit(1)).as("m"),
      struct(lit(1).as("a")).as("s"),
      lit(Array[Byte](1, 2)).as("b"))
    val df = fixture.select(banned: _*)
    assert(SchemaContract.violations(df.schema).length == banned.length)
  }
}
