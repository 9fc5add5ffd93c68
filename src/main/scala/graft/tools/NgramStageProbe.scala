package graft.tools

import graft.api.{Checkpoints, Dedup}
import graft.Tables
import org.apache.spark.sql.SparkSession

/** Dev-only (r18): split ngramJaccardPairs' wall time into the gate
  * (adaptive probe) vs the fixed-n pipeline on the same corpus —
  * `runMain graft.tools.NgramStageProbe <dir>` times autoEscalate=true
  * (shipped) against autoEscalate=false (no probe) back to back, twice
  * each, same JVM. */
object NgramStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    for (r <- 1 to 2; auto <- Seq(true, false)) {
      val t0 = System.nanoTime()
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, d),
        "doc_id", "text", 3, 0.7, Some("lang"), autoEscalate = auto)
      val cnt = pairs.count()
      println(f"NGSTAGE round=$r auto=$auto ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=$cnt")
      Checkpoints.free(pairs)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
