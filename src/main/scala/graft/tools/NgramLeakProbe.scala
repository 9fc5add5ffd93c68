package graft.tools

import graft.api.{Checkpoints, Dedup}
import graft.Tables
import org.apache.spark.sql.SparkSession

/** Dev-only (r18): bench-style repeat of the shipped ngram key — free
  * ONLY via Checkpoints.free(result) like graft.Bench does — printing
  * the persistent-RDD count after each free (a growing count = pins
  * unreachable from the result plan). */
object NgramLeakProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, d),
        "doc_id", "text", 3, 0.7, Some("lang"))
      val cnt = pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Checkpoints.free(pairs)
      println(f"NGLEAK round=$r $dt%8.2f s pairs=$cnt persistentRDDs=${spark.sparkContext.getPersistentRDDs.size}")
    }
    spark.stop()
  }
}
