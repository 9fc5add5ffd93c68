package graft.tools

import graft.Tables
import graft.functions.Kernels
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only probe: stage cardinality/time of the PPJoin jaccard path. */
object JacProbe {
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
    val threshold = 0.8
    val hashed = Tables.documents(spark, d).select(col("doc_id").as("_id"),
      col("lang").as("_grp"),
      Kernels.tokenHashesUdf(split(col("text"), " ")).as("_h"))
    val sized = hashed.filter(size(col("_h")) > 0)
      .select(col("_id"), col("_grp"), col("_h"), size(col("_h")).cast("long").as("_sz"))
      .localCheckpoint()
    t("sized")(sized.count())
    val posts = sized.select(col("_id"), col("_grp"), col("_sz"), explode(col("_h")).as("_s"))
    t("posts")(posts.count())
    val dfreq = posts.groupBy("_grp", "_s").agg(count(lit(1)).as("_df"))
    t("dfreq")(dfreq.count())
    val w = Window.partitionBy("_id").orderBy(col("_df").asc, col("_s").asc)
    val prefix = posts.join(dfreq, Seq("_grp", "_s"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= col("_sz") - ceil(col("_sz") * threshold - 1e-9) + 1)
      .select("_id", "_grp", "_sz", "_s").localCheckpoint()
    t("prefix")(prefix.count())
    val a = prefix.select(col("_id").as("id1"), col("_grp"), col("_sz").as("_sz1"), col("_s"))
    val b = prefix.select(col("_id").as("id2"), col("_grp").as("_grp2"),
      col("_sz").as("_sz2"), col("_s").as("_s2"))
    val cand = a.join(b, col("_s") === col("_s2") && col("_grp") === col("_grp2")
        && col("id1") < col("id2")
        && col("_sz2") >= col("_sz1") * threshold - 1e-9
        && col("_sz1") >= col("_sz2") * threshold - 1e-9)
      .select("id1", "id2").distinct().localCheckpoint()
    t("cand")(cand.count())
    val docs = sized.select(col("_id"), col("_h"))
    graft.functions.JaccardSim.register(spark)
    val ver = cand
      .join(docs.select(col("_id").as("id1"), col("_h").as("_h1")), "id1")
      .join(docs.select(col("_id").as("id2"), col("_h").as("_h2")), "id2")
      .withColumn("jaccard", call_function("graft_jaccard", col("_h1"), col("_h2")))
      .filter(col("jaccard") >= threshold)
    t("verified")(ver.count())
    spark.stop()
  }
}
