package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does the runtime row-level bloom filter (the injected
  * semi-join pushdown that thins the fact side of a shuffle join
  * before the exchange) fire on this Spark build + session confs? */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "500MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val li = s.read.parquet(s"$d/lineitem.parquet")
    val ord = s.read.parquet(s"$d/orders.parquet").filter(col("o_orderpriority") === "1-URGENT")
    val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity"))
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    println("has mightContain: " + p.contains("might_contain"))
    println(p.split('\n').filter(l => l.toLowerCase.contains("bloom") || l.contains("might_contain")).mkString("\n").take(1500))
    s.stop()
  }
}
