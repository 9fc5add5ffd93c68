package graft.tools

import graft.api.{Checkpoints, Dedup}
import graft.Tables
import graft.functions.Kernels
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only probe #2: sub-stage split of the chunked shuffle-posture
  * candidate join — raw pair volume, distinct cost, bucket skew. */
object CandProbe2 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val threshold = 0.8
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"C2 $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$r")
    }
    val docs = Tables.documents(spark, d)
    val hashed = docs.select(col("doc_id").as("_id"), col("lang").as("_grp"),
      Kernels.tokenHashesUdf(split(col("text"), " ")).as("_h"))
    val sized = Checkpoints.pin(hashed.filter(size(col("_h")) > 0)
      .select(col("_id"), col("_grp"), col("_h"), size(col("_h")).cast("long").as("_sz")))
    val posts = sized.select(col("_id"), col("_grp"), col("_sz"), explode(col("_h")).as("_s"))
    val dfreq = posts.groupBy("_grp", "_s").agg(count(lit(1)).as("_df"))
    val w = Window.partitionBy("_id").orderBy(col("_df").asc, col("_s").asc)
    val prefix = Checkpoints.pin(posts.join(dfreq.hint("shuffle_hash"), Seq("_grp", "_s"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= col("_sz") - ceil(col("_sz") * threshold - 1e-9) + 1)
      .select("_id", "_grp", "_sz", "_s", "_df"))
    println(s"prefix rows = ${prefix.count()}")
    // bucket skew: top-10 prefix-bucket sizes and sum n^2
    prefix.groupBy("_grp", "_s").agg(count(lit(1)).as("n"), max("_df").as("df"))
      .orderBy(col("n").desc).limit(10).collect()
      .foreach(r => println(s"BUCKET grp=${r.get(0)} n=${r.get(1)} df=${r.get(2)}"))
    val agg = prefix.groupBy("_grp", "_s").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2).as("rawpairs"), count(lit(1)).as("buckets"))
      .collect()(0)
    println(s"RAW upper bound pairs=${agg.get(0)} buckets=${agg.get(1)}")

    def chunked(): DataFrame = {
      val p = prefix.filter(col("_df") >= 2)
        .withColumn("_nk", least(lit(1024L), ceil(col("_df") / lit(256.0))).cast("int"))
        .withColumn("_ck", pmod(xxhash64(col("_id")), col("_nk")).cast("int"))
      val a = p.select(col("_id").as("_ida"), col("_grp"), col("_sz").as("_sza"),
        col("_s"), col("_ck").as("_ca"),
        explode(sequence(col("_ck"), col("_nk") - 1)).as("_cb"))
      val b = p.select(col("_id").as("_idb"), col("_grp").as("_grp2"),
        col("_sz").as("_szb"), col("_s").as("_s2"), col("_ck").as("_cb2"))
      a.join(b.hint("shuffle_hash"),
          col("_s") === col("_s2") && col("_grp") === col("_grp2")
            && col("_cb") === col("_cb2")
            && (col("_ca") < col("_cb2") || col("_ida") < col("_idb"))
            && col("_szb") >= col("_sza") * threshold - 1e-9
            && col("_sza") >= col("_szb") * threshold - 1e-9)
        .select(least(col("_ida"), col("_idb")).as("id1"),
          greatest(col("_ida"), col("_idb")).as("id2"))
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      t("chunk_raw")(chunked().count())
      t("chunk_distinct")(chunked().distinct().count())
      t("chunk_agg_distinct") {
        chunked().groupBy("id1", "id2").agg(count(lit(1))).count()
      }
    }
    spark.stop()
  }
}
