package graft.tools

import graft.api.{Checkpoints, Dedup, Fanout}
import graft.Tables
import graft.functions.Kernels
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only (r19): the consolidated ngram/PPJoin probe family —
  * `runMain graft.tools.NgramProbe <mode> [args...]` — one
  * parameterized main replacing the nine separate probes whose
  * measurements the committed artifacts cite (r16–r18). Output lines
  * and behavior per mode are IDENTICAL to the original probes, so
  * every artifact reproduction command still works with only the
  * invocation renamed (mapping recorded in SKILL.md):
  *
  *  - `buckets <dir>...`  (was NgramScaleProbe): char-3-gram universe
  *    size, posting skew, prefix-bucket raw-pair mass per dir — the
  *    super-linear-growth forensic behind BENCH_SCALE10_r16's 46×.
  *  - `n5 <dir>...`       (was NgramScaleProbe2): time the pair
  *    pipeline at n=5 — the back-to-linear counter-demo.
  *  - `sample10x <dir>`   (was NgramScaleProbe3): sample n=5 pairs +
  *    cross-replica distribution on a Scale10Gen dir.
  *  - `adaptive <dir>...` (was NgramAdaptiveProbe): the SHIPPED
  *    config (n=3, t=0.7, lang-blocked, autoEscalate) wall + pairs.
  *  - `stage <dir>`       (was NgramStageProbe): gate-vs-pipeline
  *    split — autoEscalate on/off back to back, twice, same JVM.
  *  - `profile [dir]`     (was NgramProfile): hash-projection vs full
  *    key wall split at sf0.1 (dir overridable).
  *  - `cand`              (was CandProbe): candidate-enumeration
  *    variants for the shuffle posture (dir via SPARK_GRAFT_SF_DIR).
  *  - `cand2`             (was CandProbe2): chunked shuffle-join
  *    sub-stage split + bucket skew (dir via SPARK_GRAFT_SF_DIR).
  *  - `leak <dir>`        (was NgramLeakProbe): bench-style repeats
  *    freeing only via Checkpoints.free(result), printing the
  *    persistent-RDD count (a growing count = stranded pins).
  */
object NgramProbe {
  private val usage =
    "usage: NgramProbe <buckets|n5|sample10x|adaptive|stage|profile|cand|cand2|leak> [dir...]"

  /** `ext` mirrors each ORIGINAL probe's session exactly: only
    * NgramProfile and CandProbe registered GraftExtensions; the other
    * seven ran vanilla Spark. Forcing the extensions onto all modes
    * would register the TopK/TokenCount rewrite rules the originals
    * never planned under, and artifact reproduction runs could
    * silently measure different plans (review finding, r19). */
  private def session(logLevel: String, ext: Boolean): SparkSession = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    val spark = (if (ext) b.config("spark.sql.extensions", "graft.GraftExtensions")
      else b).getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, usage)
    def arg1: String = {
      require(args.length > 1, s"mode '${args(0)}' needs a dir argument — $usage")
      args(1)
    }
    args(0) match {
      case "buckets" => buckets(args.drop(1))
      case "n5" => n5(args.drop(1))
      case "sample10x" => sample10x(arg1)
      case "adaptive" => adaptive(args.drop(1))
      case "stage" => stage(arg1)
      case "profile" =>
        profile(if (args.length > 1) args(1) else "/root/testdata/sf0.1")
      case "cand" => cand()
      case "cand2" => cand2()
      case "leak" => leak(arg1)
      case other => throw new IllegalArgumentException(
        s"unknown NgramProbe mode '$other' — $usage")
    }
  }

  /** The shared PPJoin prefix-table construction behind the cand/cand2
    * enumeration probes (token hashes → sized docs → postings → dfreq
    * → df-ordered prefix), built VERBATIM as the deleted originals
    * did; `withDf` keeps the `_df` column (cand2's chunking needs it).
    * buckets() keeps its own variant deliberately — it probes
    * char-3-grams (not token hashes) with a plain localCheckpoint and
    * a different threshold, and folding the three shapes into one
    * parameterized builder would change what the probes measure. */
  private def prefixTable(spark: SparkSession, d: String, threshold: Double,
      withDf: Boolean): DataFrame = {
    val docs = Tables.documents(spark, d)
    val hashed = docs.select(col("doc_id").as("_id"), col("lang").as("_grp"),
      Kernels.tokenHashesUdf(split(col("text"), " ")).as("_h"))
    val sized = Checkpoints.pin(hashed.filter(size(col("_h")) > 0)
      .select(col("_id"), col("_grp"), col("_h"), size(col("_h")).cast("long").as("_sz")))
    val posts = sized.select(col("_id"), col("_grp"), col("_sz"), explode(col("_h")).as("_s"))
    val dfreq = posts.groupBy("_grp", "_s").agg(count(lit(1)).as("_df"))
    val w = Window.partitionBy("_id").orderBy(col("_df").asc, col("_s").asc)
    val cols = Seq("_id", "_grp", "_sz", "_s") ++ (if (withDf) Seq("_df") else Nil)
    Checkpoints.pin(posts.join(dfreq.hint("shuffle_hash"), Seq("_grp", "_s"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= col("_sz") - ceil(col("_sz") * threshold - 1e-9) + 1)
      .select(cols.map(col): _*))
  }

  /** was NgramScaleProbe: why char-3-gram PPJoin goes super-linear on
    * a replicated corpus — gram-universe size, posting skew,
    * prefix-bucket mass (= raw candidate volume) per dir. */
  private def buckets(dirs: Array[String]): Unit = {
    val spark = session("ERROR", ext = false)
    val threshold = 0.7
    for (d <- dirs) {
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

  /** was NgramScaleProbe2: the n-vs-scale law — ngramJaccardPairs at
    * n=5 (the gram universe outgrows the corpus → ~linear growth). */
  private def n5(dirs: Array[String]): Unit = {
    val spark = session("ERROR", ext = false)
    for (d <- dirs; n <- Seq(5)) {
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

  /** was NgramScaleProbe3: sample n=5 pairs at a 10x dir for an
    * exactness spot-check + cross-replica distribution. */
  private def sample10x(d: String): Unit = {
    val spark = session("ERROR", ext = false)
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, d),
      "doc_id", "text", 5, 0.7, Some("lang"))
    pairs.orderBy(col("id1"), col("id2")).limit(10).collect()
      .foreach(r => println(s"NG3 ${r.get(0)} ${r.get(1)} ${r.get(2)}"))
    val x = pairs.withColumn("_r1", (col("id1") / 1000000000L).cast("long"))
      .withColumn("_r2", (col("id2") / 1000000000L).cast("long"))
      .groupBy(col("_r1") === col("_r2")).agg(count(lit(1))).collect()
    x.foreach(r => println(s"NG3 same_replica=${r.get(0)} n=${r.get(1)}"))
    spark.stop()
  }

  /** was NgramAdaptiveProbe: the shipped adaptive-gate config's wall
    * seconds + output pairs per dir (escalation evidence logs at WARN). */
  private def adaptive(dirs: Array[String]): Unit = {
    val spark = session("WARN", ext = false)
    for (d <- dirs) {
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

  /** was NgramStageProbe: gate (adaptive probe) vs fixed-n pipeline
    * wall split — autoEscalate on/off back to back, twice, same JVM. */
  private def stage(d: String): Unit = {
    val spark = session("WARN", ext = false)
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

  /** was NgramProfile: where the ngram key's time goes — the shingle
    * hashing projection vs the candidate/verify joins. */
  private def profile(d: String): Unit = {
    val spark = session("ERROR", ext = true)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, d)
    for (_ <- 1 to 3) {
      time("hash-only") {
        docs.repartition(32)
          .select(col("doc_id"), Kernels.charNgramHashesUdf(3)(col("text")).as("_h"))
          .select(sum(size(col("_h")))).collect()
      }
      time("full key") {
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7, Some("lang"))
          .count()
      }
    }
    spark.stop()
  }

  /** was CandProbe: candidate-enumeration variants for the shuffle
    * posture of the PPJoin — which pair-generation shape is fastest
    * without a broadcast (dir via SPARK_GRAFT_SF_DIR). */
  private def cand(): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("WARN", ext = true)
    spark.range(1000).selectExpr("sum(id)").collect()
    val threshold = 0.8
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"CAND $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$r")
    }
    val prefix = prefixTable(spark, d, threshold, withDf = false)
    println(s"prefix rows = ${prefix.count()}")

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

  /** was CandProbe2: sub-stage split of the chunked shuffle-posture
    * candidate join — raw pair volume, distinct cost, bucket skew
    * (dir via SPARK_GRAFT_SF_DIR). */
  private def cand2(): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session("WARN", ext = false)
    spark.range(1000).selectExpr("sum(id)").collect()
    val threshold = 0.8
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"C2 $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$r")
    }
    val prefix = prefixTable(spark, d, threshold, withDf = true)
    println(s"prefix rows = ${prefix.count()}")
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

  /** was NgramLeakProbe: bench-style repeats of the shipped ngram key,
    * freeing ONLY via Checkpoints.free(result) like graft.Bench does —
    * a growing persistent-RDD count = pins unreachable from the result
    * plan. */
  private def leak(d: String): Unit = {
    val spark = session("WARN", ext = false)
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
