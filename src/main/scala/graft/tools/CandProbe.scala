package graft.tools

import graft.api.{Checkpoints, Dedup}
import graft.Tables
import graft.functions.Kernels
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only probe: candidate-enumeration variants for the shuffle
  * posture of the PPJoin — which pair-generation shape is fastest
  * without a broadcast. */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val threshold = 0.8
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"CAND $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$r")
    }
    // build the prefix table once, checkpoint it so variants time ONLY
    // the enumeration
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
      .select("_id", "_grp", "_sz", "_s"))
    println(s"prefix rows = ${prefix.count()}")

    // V1: current grouped enumeration (posexplode + explode(slice))
    def v1(): DataFrame =
      prefix.groupBy("_grp", "_s")
        .agg(collect_list(struct(col("_id").as("_id"), col("_sz").as("_sz"))).as("_xs"))
        .filter(size(col("_xs")) >= 2)
        .select(posexplode(col("_xs")).as(Seq("_i", "_x")), col("_xs"))
        .select(col("_x"),
          explode(slice(col("_xs"), col("_i") + lit(2), size(col("_xs")))).as("_y"))
        .select(
          least(col("_x._id"), col("_y._id")).as("id1"),
          greatest(col("_x._id"), col("_y._id")).as("id2"),
          when(col("_x._id") < col("_y._id"), col("_x._sz")).otherwise(col("_y._sz")).as("_sz1"),
          when(col("_x._id") < col("_y._id"), col("_y._sz")).otherwise(col("_x._sz")).as("_sz2"))
        .filter(col("_sz2") >= col("_sz1") * threshold - 1e-9 &&
          col("_sz1") >= col("_sz2") * threshold - 1e-9)
        .select("id1", "id2").distinct()

    // V2: one flatten(transform(filter(transform))) expression -> one explode
    def v2(): DataFrame = {
      val pairsCol: Column = flatten(transform(col("_xs"), (x, i) =>
        filter(
          transform(slice(col("_xs"), i + lit(2), size(col("_xs"))), y =>
            struct(
              least(x("_id"), y("_id")).as("id1"),
              greatest(x("_id"), y("_id")).as("id2"),
              least(x("_sz"), y("_sz")).as("_szmin"),
              greatest(x("_sz"), y("_sz")).as("_szmax"))),
          p => p("_szmin") >= p("_szmax") * threshold - 1e-9)))
      prefix.groupBy("_grp", "_s")
        .agg(collect_list(struct(col("_id").as("_id"), col("_sz").as("_sz"))).as("_xs"))
        .filter(size(col("_xs")) >= 2)
        .select(explode(pairsCol).as("_p"))
        .select(col("_p.id1").as("id1"), col("_p.id2").as("id2")).distinct()
    }

    // V3: shuffle-hash self equi-join (the r14 shape)
    def v3(): DataFrame = {
      val a = prefix.select(col("_id").as("id1"), col("_grp"), col("_sz").as("_sz1"), col("_s"))
      val b = prefix.select(col("_id").as("id2"), col("_grp").as("_grp2"),
        col("_sz").as("_sz2"), col("_s").as("_s2"))
      a.join(b.hint("shuffle_hash"), col("_s") === col("_s2") && col("_grp") === col("_grp2")
          && col("id1") < col("id2")
          && col("_sz2") >= col("_sz1") * threshold - 1e-9
          && col("_sz1") >= col("_sz2") * threshold - 1e-9)
        .select("id1", "id2").distinct()
    }

    // V4: sort-merge self equi-join
    def v4(): DataFrame = {
      val a = prefix.select(col("_id").as("id1"), col("_grp"), col("_sz").as("_sz1"), col("_s"))
      val b = prefix.select(col("_id").as("id2"), col("_grp").as("_grp2"),
        col("_sz").as("_sz2"), col("_s").as("_s2"))
      a.join(b.hint("merge"), col("_s") === col("_s2") && col("_grp") === col("_grp2")
          && col("id1") < col("id2")
          && col("_sz2") >= col("_sz1") * threshold - 1e-9
          && col("_sz1") >= col("_sz2") * threshold - 1e-9)
        .select("id1", "id2").distinct()
    }

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      t("v1_grouped_2gen")(v1().count())
      t("v2_grouped_1expr")(v2().count())
      t("v3_shuffle_hash_join")(v3().count())
      t("v4_sort_merge_join")(v4().count())
    }
    spark.stop()
  }
}
