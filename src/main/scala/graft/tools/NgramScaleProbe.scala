package graft.tools

import graft.api.{Checkpoints, Dedup, Fanout}
import graft.Tables
import graft.functions.Kernels
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: why does char-3-gram PPJoin go super-linear on a
  * replicated corpus — gram-universe size, posting skew, prefix-bucket
  * mass (= raw candidate volume) at each given sf dir. */
object NgramScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val threshold = 0.7
    for (d <- args) {
      val docs = Tables.documents(spark, d)
      val hashed = Fanout(docs).select(col("doc_id").as("_id"),
        col("lang").as("_grp"),
        Kernels.charNgramHashesUdf(3)(col("text")).as("_h"))
      val sized = hashed.filter(size(col("_h")) > 0)
        .select(col("_id"), col("_grp"), col("_h"), size(col("_h")).cast("long").as("_sz"))
        .localCheckpoint()
      println(s"=== $d docs=${sized.count()}")
      val posts = sized.select(col("_id"), col("_grp"), col("_sz"), explode(col("_h")).as("_s"))
      val dfreq = posts.groupBy("_grp", "_s").agg(count(lit(1)).as("_df"))
      println("gram universe: " + dfreq.agg(count(lit(1)).as("distinct_grams"),
        max("_df").as("max_df")).collect()(0))
      val w = Window.partitionBy("_id").orderBy(col("_df").asc, col("_s").asc)
      val prefix = posts.join(dfreq, Seq("_grp", "_s"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= col("_sz") - ceil(col("_sz") * threshold - 1e-9) + 1)
        .select("_id", "_grp", "_sz", "_s")
      val stats = prefix.groupBy("_grp", "_s").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("buckets"), max("n").as("max_bucket"),
          sum(col("n") * (col("n") - 1) / 2).as("raw_pair_mass")).collect()(0)
      println(s"prefix rows=${prefix.count()} bucketStats=$stats")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
