package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed-plan operator summary for the keys
  * given as args — `runMain graft.tools.PlanDump <sfDir> key [key ...]`
  * — so a plan trim can be checked without a full Bench run (which
  * would overwrite bench_full.json with the subset artifact). Uses
  * Bench.planSummary ITSELF (\b-anchored), so the counts mean exactly
  * what the bench artifact's `plans` field means — a raw substring
  * scan here once double-counted BroadcastExchange as Exchange and
  * reported phantom shuffles. Plus the window/sort/aggregate shapes
  * the bench summary leaves out. Set GRAFT_PLAN_FULL=1 for the tree.
  */
object PlanDump {
  private val extraOps = Seq("Sort", "Window", "Generate",
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
      // The noop write runs its OWN QueryExecution, so df.queryExecution
      // below stays unexecuted and prints the INITIAL AdaptiveSparkPlan,
      // not the AQE-finalized one — deliberately the same property as
      // Bench (whose count() is likewise a separate QueryExecution), so
      // these counts compare 1:1 with bench_full.json's `plans` field.
      // The write still exists to surface runtime errors the plan
      // string alone would hide.
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
      val extra = extraOps.flatMap { op =>
        // \b on BOTH sides: a left anchor alone would still let "Sort"
        // match inside SortMergeJoin/SortAggregate
        val c = ("\\b" + op + "\\b").r.findAllIn(p).size
        if (c == 0) None else Some(s"$op*$c")
      }
      println(s"PLAN $k :: ${(graft.Bench.planSummary(p) +: extra).mkString(",")}")
      if (sys.env.contains("GRAFT_PLAN_FULL")) println(p)
    }
    spark.stop()
  }
}
