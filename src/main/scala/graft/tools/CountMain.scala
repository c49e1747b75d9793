package graft.tools

/** Inventory ledger check: prints the registry counts SURVEY §2 must
  * match (queries / oracle-checked / rows-only) and flags oracle
  * entries with no matching query (a driver-gate no-op — always a bug).
  */
object CountMain {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val o = graft.SparkEntry.oracleSql
    println(s"queries=${q.size} oracle=${o.size} rowsOnly=${(q.keySet -- o.keySet).size}")
    println("rows-only: " + (q.keySet -- o.keySet).toSeq.sorted.mkString(", "))
    val orphans = o.keySet -- q.keySet
    if (orphans.nonEmpty) println("ORPHAN oracle entries: " + orphans.mkString(", "))
  }
}
