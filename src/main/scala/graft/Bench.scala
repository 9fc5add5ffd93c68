package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE compact JSON line (totals + the BASELINE.md
  * headline queries) — short enough to survive the driver's tail capture
  * (round 1's full 79-entry line was truncated → "parsed": null) — and
  * writes the complete per-query timing map to bench_full.json (path
  * overridable via SPARK_GRAFT_BENCH_OUT) for the judge's plan audit.
  * Optional CLI args restrict the run to a subset of keys (dev loop).
  */
object Bench {
  /** The queries BASELINE.md carries measured numbers for. */
  private val headline = Seq("agg_groupby_q1", "join_multiway_revenue",
    "window_topk_per_group", "sim_knn_bruteforce", "stream_tumbling_counts",
    "text_tokenize_stats")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    val only = args.toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // broadcast/shuffle cleanup is GC-driven (ContextCleaner); on a
      // large heap a 79-query sequence accumulates dead broadcasts for
      // minutes and later queries pay the memory pressure
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // same at-scale posture as Verify: runtime bloom-filter join
      // pruning on (gated to a no-op at fixture scale by the
      // application-side scan threshold)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up actions so JVM/codegen/parquet-reader initialization
    // isn't billed to whichever query happens to iterate first
    // (measured ~2 s on the first real query otherwise)
    spark.range(1000).selectExpr("sum(id)").collect()
    locally {
      import org.apache.spark.sql.functions.{col, count, lit}
      val reg = spark.read.parquet(s"$sfDir/region.parquet")
      val c0 = reg.columns.head
      reg.as("a").join(reg.as("b"), col(s"a.$c0") === col(s"b.$c0"))
        .agg(count(lit(1))).collect()
    }
    // the plan-diagnostic summary per query: counts of the operators a
    // plan flip would change (join strategies, exchanges, the custom
    // top-k). Extracted from the POST-execution plan, i.e. AQE's final
    // choices — so a stats-dependent broadcast->shuffle flip is visible
    // in the bench artifact itself, not only as a timing anomaly.
    // \b-anchored so "Exchange" counts ONLY shuffle exchanges, not
    // BroadcastExchange/ReusedExchange (tracked separately) — the
    // artifact exists to catch broadcast<->shuffle flips, so the two
    // kinds must not be conflated in one number
    val planOps = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct", "TopKPerGroup",
      "Exchange", "BroadcastExchange", "ReusedExchange")
    def planSummary(p: String): String =
      planOps.flatMap { op =>
        val c = ("\\b" + op).r.findAllIn(p).size
        if (c == 0) None else Some(s"$op*$c")
      }.mkString(",")
    // each key is timed THREE times and the artifact carries min-of-3
    // plus per-run GC time: the bench JVM runs 130+ queries
    // back-to-back, so a single number cannot distinguish a plan
    // regression from ambient load / GC pressure (r6's dedup_keep_best
    // read +36% on an IDENTICAL plan; r9's dedup_ngram_jaccard drifted
    // +52% with a byte-identical plan). Three runs + the GC split make
    // drift adjudication mechanical: a real regression moves ALL runs,
    // co-tenancy noise moves one or two, and a GC-dominated key shows
    // it in gc_sec.
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis(): Long = {
      var t = 0L
      gcBeans.forEach(b => t += math.max(0L, b.getCollectionTime))
      t
    }
    case class Run(sec: Double, plan: String, gcSec: Double)
    val results = SparkEntry.queries
      .filter(q => only.isEmpty || only(q._1))
      .map { case (name, fn) =>
        def timed(): Run = {
          val g0 = gcMillis()
          val t0 = System.nanoTime()
          var df: org.apache.spark.sql.DataFrame = null
          val plan = try {
            df = fn(spark, sfDir)
            df.count()
            planSummary(df.queryExecution.executedPlan.toString)
          } catch { case _: Throwable => "ERROR" }
          val dt = (System.nanoTime() - t0) / 1e9
          // close the gc window BEFORE the unpersist below: any GC the
          // free triggers must not be billed to this run's gc_sec
          // (r10 ADVICE — the free is off the wall clock AND off the
          // gc meter, consistently)
          val gcSec = (gcMillis() - g0) / 1e3
          // release eagerly-pinned localCheckpoint blocks OFF the clock
          // (like System.gc below) and even when the run failed — a
          // leaked checkpoint would bill every later key's memory
          // pressure, the exact accumulation this call exists to stop
          if (df != null)
            try graft.api.Checkpoints.free(df) catch { case _: Throwable => () }
          Run(dt, plan, gcSec)
        }
        // drop each run's dead broadcasts/shuffles off the clock,
        // instead of inside the next run's hot loop
        val rs = Seq.fill(3) { val r = timed(); System.gc(); r }
        val best = rs.map(_.sec).min
        System.err.println(
          f"[bench] $name%-28s min $best%8.3f s  (${rs.map(r => f"${r.sec}%.3f").mkString("/")}, gc ${rs.map(r => f"${r.gcSec}%.2f").mkString("/")})  [${rs.head.plan}]")
        name -> rs
      }
    // explicit locale: the default-locale f"" interpolator would emit
    // "654,756" (invalid JSON) under comma-decimal locales
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fmt(entries: Iterable[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + num(v) }
        .mkString("{", ",", "}")
    val times = results.map { case (k, rs) => k -> rs.map(_.sec).min }
    // the plan is run 1's (cold construction, post-AQE); a later run's
    // plan that DIFFERS is itself a finding and is appended for the audit
    val plans = results.map { case (k, rs) =>
      val p = rs.head.plan +: rs.tail.zipWithIndex.collect {
        case (r, i) if r.plan != rs.head.plan => s"run${i + 2}:${r.plan}"
      }
      "\"" + k + "\":\"" + p.mkString("|") + "\""
    }.mkString("{", ",", "}")
    def lists(f: Run => Double): String =
      results.map { case (k, rs) =>
        "\"" + k + "\":[" + rs.map(r => num(f(r))).mkString(",") + "]"
      }.mkString("{", ",", "}")
    val runsJson = lists(_.sec)
    val gcJson = lists(_.gcSec)
    val total = if (times.nonEmpty) times.values.sum else 0.0
    val fullJson =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":${fmt(times)},"runs":$runsJson,"gc_sec":$gcJson,"plans":$plans,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      fullJson.getBytes("UTF-8"))
    val head = times.filter(r => headline.contains(r._1))
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":${fmt(head)},"n_queries":${times.size},"full":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
