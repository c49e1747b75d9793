import org.apache.spark.sql.SparkSession
object SchemaScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("scan")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val types = scala.collection.mutable.Map.empty[String, List[String]]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val sch = fn(spark, "/root/testdata/sf0.001").schema
        sch.fields.foreach(f => types(f.dataType.toString) = n :: types.getOrElse(f.dataType.toString, Nil))
      } catch { case e: Throwable => println(s"ERR $n: ${e.getMessage.take(100)}") }
    }
    types.toSeq.sortBy(_._1).foreach { case (t, ns) => println(s"$t  (${ns.size})  e.g. ${ns.take(3).mkString(",")}") }
    spark.stop()
  }
}
