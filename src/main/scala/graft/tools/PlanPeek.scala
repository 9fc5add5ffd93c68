package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the initial executed plan for the given keys
  * (`runMain graft.tools.PlanPeek key1 key2 ...` — optional first arg
  * `sf=<dir>` overrides the default sf0.001 fixture dir). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val (sfArgs, keys) = args.partition(_.startsWith("sf="))
    val d = sfArgs.headOption.map(_.stripPrefix("sf="))
      .getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"===== $k =====")
      println(graft.SparkEntry.queries(k)(spark, d).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
