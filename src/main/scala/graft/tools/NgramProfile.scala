package graft.tools

import graft.Tables
import graft.functions.Kernels
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does dedup_ngram_jaccard's time go — the shingle
  * hashing projection or the candidate/verify joins? */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm-up
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, d)
    for (_ <- 1 to 3) {
      time("hash-only") {
        docs.repartition(32)
          .select(col("doc_id"), Kernels.charNgramHashesUdf(3)(col("text")).as("_h"))
          .select(sum(size(col("_h")))).collect()
      }
      time("full key") {
        graft.api.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7, Some("lang"))
          .count()
      }
    }
    spark.stop()
  }
}
