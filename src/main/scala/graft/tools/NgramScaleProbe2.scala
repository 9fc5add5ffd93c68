package graft.tools

import graft.api.{Checkpoints, Dedup}
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the n-vs-scale law — time ngramJaccardPairs at n=5 on
  * the given dirs (n=3's saturated-universe blowup is measured by the
  * scale bench itself; this shows the same engine goes back to ~linear
  * growth once the gram universe outgrows the corpus). */
object NgramScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args; n <- Seq(5)) {
      val t0 = System.nanoTime()
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, d),
        "doc_id", "text", n, 0.7, Some("lang"))
      val cnt = pairs.count()
      println(f"NG2 dir=$d n=$n ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=$cnt")
      Checkpoints.free(pairs)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
