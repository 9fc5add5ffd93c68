package graft.tools

import graft.Tables
import graft.api.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: stage timing of dedup_clusters. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val pairs = Dedup.nearJaccardPairs(Tables.documents(spark, d),
      "doc_id", "text", 0.8, Some("lang"))
    val p = t("pairs materialize")(pairs.localCheckpoint())
    t("pairs count")(p.count())
    val cc = t("cc build")(Dedup.connectedComponents(p))
    t("cc count")(cc.count())
    spark.stop()
  }
}
