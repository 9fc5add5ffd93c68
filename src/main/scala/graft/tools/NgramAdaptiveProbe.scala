package graft.tools

import graft.api.{Checkpoints, Dedup}
import graft.Tables
import org.apache.spark.sql.SparkSession

/** Dev-only: exercise ngramJaccardPairs' adaptive saturation gate on
  * the given dirs with the SHIPPED configuration (n=3, t=0.7,
  * lang-blocked, autoEscalate on) — prints wall seconds and output
  * pairs per dir; the escalation decision logs its measured evidence
  * via slf4j at WARN. */
object NgramAdaptiveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- args) {
      val t0 = System.nanoTime()
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, d),
        "doc_id", "text", 3, 0.7, Some("lang"))
      val cnt = pairs.count()
      println(f"NGA dir=$d ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=$cnt")
      Checkpoints.free(pairs)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
