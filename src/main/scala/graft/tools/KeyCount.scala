package graft.tools

/** Dev probe: print the declared surface size (keys / oracles / no-oracle). */
object KeyCount {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    val n = graft.SparkEntry.noOracleKeys
    println(s"KEYCOUNT keys=${q.size} oracles=${o.size} nooracle=${n.size}")
    val missing = q -- o -- n
    if (missing.nonEmpty) println(s"KEYCOUNT undeclared=${missing.toSeq.sorted.mkString(",")}")
  }
}
