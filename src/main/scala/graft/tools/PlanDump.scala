package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed-plan operator summary (the
  * bench_full.json `plans` recipe) for the keys given as args —
  * `runMain graft.tools.PlanDump <sfDir> key [key ...]` — so a plan
  * trim can be checked without a full Bench run (which would
  * overwrite bench_full.json with the subset artifact). */
object PlanDump {
  private val ops = Seq("BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
    "Exchange", "ReusedXchg", "TopKPerGroup", "Sort", "Window", "Generate",
    "HashAggregate", "ObjectHashAggregate", "SortAggregate")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.head
    args.tail.foreach { k =>
      val df = graft.SparkEntry.queries(k)(spark, d)
      df.write.format("noop").mode("overwrite").save() // execute → AQE final plan
      // "ReusedExchange" would double-count as "Exchange" in a raw
      // substring scan — rename it first so reuse shows separately
      val p = df.queryExecution.executedPlan.toString
        .replace("ReusedExchange", "ReusedXchg")
      val summary = ops.flatMap { op =>
        val n = p.sliding(op.length).count(_ == op)
        if (n > 0) Some(s"$op*$n") else None
      }.mkString(",")
      println(s"PLAN $k :: $summary")
      if (sys.env.contains("GRAFT_PLAN_FULL")) println(p)
    }
    spark.stop()
  }
}
