package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: time specific keys at a given sf (args: sfDir key...). */
object HotBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { k =>
      val t0 = System.nanoTime
      val n = graft.SparkEntry.queries(k)(spark, sfDir).count()
      println(f"HOT $k%-24s ${(System.nanoTime - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
