package graft.tools

import graft.api.{Checkpoints, Dedup}
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dump sample n=5 pairs at the 10x dir for an exactness
  * spot-check. */
object NgramScaleProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, args(0)),
      "doc_id", "text", 5, 0.7, Some("lang"))
    pairs.orderBy(col("id1"), col("id2")).limit(10).collect()
      .foreach(r => println(s"NG3 ${r.get(0)} ${r.get(1)} ${r.get(2)}"))
    // distribution: how many pairs are cross-replica?
    val x = pairs.withColumn("_r1", (col("id1") / 1000000000L).cast("long"))
      .withColumn("_r2", (col("id2") / 1000000000L).cast("long"))
      .groupBy(col("_r1") === col("_r2")).agg(count(lit(1))).collect()
    x.foreach(r => println(s"NG3 same_replica=${r.get(0)} n=${r.get(1)}"))
    spark.stop()
  }
}
