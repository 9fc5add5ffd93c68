package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture tests for the r16 declared keys: each test writes a
  * TINY synthetic table layout to a temp dir and runs the ACTUAL
  * `SparkEntry.queries` entry against it, asserting textbook numbers
  * computed by hand. The DuckDB oracles execute the same closed forms
  * as the Spark code, so a shared misreading of a formula would slip
  * the hash gate — these pin the ground truth independently of both
  * engines, on inputs where the answer is provable. */
class PlantedFixtureSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_plant_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    // (event_id, us, user_id, event_type, value)
    val ss = spark
    import ss.implicits._
    rows.toDF("event_id", "_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("ts_periodogram: planted 24h-periodic hourly counts score r2 = 1 at P=24") {
    // 96 hours, count(h) = 1 + (h mod 24) mod 5 — perfectly 24-periodic
    // (4 identical cycles), NOT 12-periodic (c(p) != c(p+12) for most p)
    val dir = freshDir("period")
    var id = 0L
    val rows = for {
      h <- 0 until 96
      c = 1 + ((h % 24) % 5)
      i <- 0 until c
    } yield {
      id += 1
      (id, h * 3600000000L + i * 1000L, 1L, "click", 1.0)
    }
    writeEvents(dir, rows)
    val out = SparkEntry.queries("ts_periodogram")(spark, dir).collect()
      .map(r => r.getAs[Int]("period_h") -> r.getAs[Double]("r2_seasonal"))
      .toMap
    assert(out(24) == 1.0, s"P=24 should explain ALL variance, got ${out(24)}")
    assert(out(12) < 1.0 && out(12) > 0.0,
      s"P=12 must not fully explain a 24-periodic signal, got ${out(12)}")
    out.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("ts_holt_trend: a constant series smooths to itself with zero trend") {
    // one event per 5-min bin, two types, 60 bins: s1 = s2 = level =
    // forecast = 1 and trend = 0 at EVERY bin (truncated weights
    // normalize, so even the warmup rows are exact)
    val dir = freshDir("holt")
    var id = 0L
    val rows = for {
      t <- Seq("a", "b"); b <- 0 until 60
    } yield { id += 1; (id, b * 300000000L, 1L, t, 1.0) }
    writeEvents(dir, rows)
    val out = SparkEntry.queries("ts_holt_trend")(spark, dir).collect()
    assert(out.length == 120)
    out.foreach { r =>
      assert(r.getAs[Double]("s1") == 1.0 && r.getAs[Double]("s2") == 1.0)
      assert(r.getAs[Double]("level") == 1.0 && r.getAs[Double]("trend") == 0.0)
      assert(r.getAs[Double]("forecast_next") == 1.0)
    }
  }

  test("window_pattern_match: exactly the planted rising-within-24h triples match") {
    val dir = freshDir("pattern")
    val h = 3600000000L
    writeEvents(dir, Seq(
      // user 1: strict rise 1<2<3 inside 2h -> ONE match (at the 3rd row)
      (1L, 0L, 1L, "click", 1.0),
      (2L, 1L * h, 1L, "click", 2.0),
      (3L, 2L * h, 1L, "view", 3.0),
      // user 2: rising but spanning 30h -> no match
      (4L, 0L, 2L, "click", 1.0),
      (5L, 15L * h, 2L, "click", 2.0),
      (6L, 30L * h, 2L, "click", 3.0),
      // user 3: not monotone -> no match
      (7L, 0L, 3L, "click", 2.0),
      (8L, 1L * h, 3L, "click", 1.0),
      (9L, 2L * h, 3L, "click", 3.0)))
    val out = SparkEntry.queries("window_pattern_match")(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("event_type") == "view")
    assert(r.getAs[Long]("n_matches") == 1L && r.getAs[Long]("n_users") == 1L)
    assert(r.getAs[Double]("max_rise") == 2.0)
  }

  test("data_kanonymity_report: planted group sizes give exact risk rows") {
    val ss = spark
    import ss.implicits._
    val dir = freshDir("kanon")
    // group (1,X,band0) x3 rows, group (2,Y,band1) x1 row
    Seq((1L, "c1", 1, 500.0, "X"), (2L, "c2", 1, 510.0, "X"),
        (3L, "c3", 1, 520.0, "X"), (4L, "c4", 2, 1500.0, "Y"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("data_kanonymity_report")(spark, dir)
      .collect().map(r => (r.getAs[Int]("k"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("n_small_groups"), r.getAs[Long]("rows_at_risk"),
        r.getAs[Long]("risk_ppm")))
    assert(out.toSeq == Seq(
      (2, 2L, 1L, 1L, 250000L),   // only the singleton group is < 2
      (5, 2L, 2L, 4L, 1000000L),  // both groups < 5 -> every row at risk
      (20, 2L, 2L, 4L, 1000000L)))
  }

  test("text_char_entropy: planted docs hit the hand entropies") {
    val ss = spark
    import ss.implicits._
    val dir = freshDir("entropy")
    // "aaaa" -> H = 0; "ab" -> 2 * rk6(-0.5 ln 0.5) = 2*0.346574 = 0.693148
    Seq((1L, "aaaa", "en", "s1", 4L), (2L, "ab", "en", "s2", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_char_entropy")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("avg_entropy"), r.getAs[Long]("n_low_entropy")))
      .toMap
    assert(out("s1") == ((0.0, 1L)))
    assert(out("s2") == ((0.6931, 1L)))
  }

  test("agg_benford_test: the nine expected ppm are the textbook Benford masses") {
    // fixture-independent constants: floor(log10(1+1/d)*1e6 + 0.5)
    val want = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
    val got = SparkEntry.queries("agg_benford_test")(spark, TestSpark.sf0001)
      .select("digit", "exp_ppm").distinct().collect()
      .map(r => r.getAs[Int]("digit") -> r.getAs[Long]("exp_ppm")).toMap
    assert(got == want)
  }

  test("join_scd2_pit: purchases fetch the version valid at their ts") {
    val dir = freshDir("pit")
    // user 1: click@1s, purchase@2s, purchase@3s → versions
    // click[1,2), purchase[2,∞). The purchase@3s must fetch the
    // EARLIER purchase version (valid_from 2s), not start a new one —
    // the PIT property that forbids label leakage
    writeEvents(dir, Seq(
      (1L, 1000000L, 1L, "click", 1.0),
      (2L, 2000000L, 1L, "purchase", 5.0),
      (3L, 3000000L, 1L, "purchase", 7.0)))
    val out = SparkEntry.queries("join_scd2_pit")(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[String]("state"), r.getAs[String]("valid_from"))))
      .toMap
    assert(out.keySet == Set(2L, 3L))
    assert(out(2L) == (("purchase", "1970-01-01 00:00:02.000000")))
    assert(out(3L) == (("purchase", "1970-01-01 00:00:02.000000")))
  }

  test("agg_wilson_ci: k=1 of n=10 hits the textbook Wilson bounds") {
    val dir = freshDir("wilson")
    // one rare event in ten: Wilson 95% = [0.017876, 0.404156] — note
    // the naive Wald interval would dip below zero here
    val rows = (1 to 10).map(i =>
      (i.toLong, i * 1000000L, 1L, "click", if (i == 1) 200.0 else 10.0))
    writeEvents(dir, rows)
    val r = SparkEntry.queries("agg_wilson_ci")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("k") == 1L)
    assert(r.getAs[Double]("p_hat") == 0.1)
    assert(r.getAs[Double]("ci_lo") == 0.017876)
    assert(r.getAs[Double]("ci_hi") == 0.404156)
  }

  test("events_bot_score: clockwork user flags, jittery user does not") {
    val dir = freshDir("bot")
    var id = 0L
    def ev(uid: Long, us: Long) = { id += 1; (id, us, uid, "click", 1.0) }
    // user 1: 25 events exactly 1 s apart — cv = 0, flagged;
    // user 2: 25 events with gaps alternating 0.1 s / 3.9 s —
    // cv4 = 0.9704 (human-ish), not flagged;
    // user 3: 5 events — under the m >= 9 cut, excluded entirely
    val clock = (0 until 25).map(i => ev(1L, i * 1000000L))
    var t = 0L
    val jitter = ev(2L, 0L) +: (0 until 24).map { i =>
      t += (if (i % 2 == 0) 100000L else 3900000L); ev(2L, t)
    }
    val tiny = (0 until 5).map(i => ev(3L, i * 777L))
    writeEvents(dir, clock ++ jitter ++ tiny)
    val out = SparkEntry.queries("events_bot_score")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("gap_cv"),
          r.getAs[Double]("events_per_hour"), r.getAs[Long]("regular_flag"))))
      .toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((25L, 0.0, 3750.0, 1L)))
    assert(out(2L) == ((25L, 0.9704, 1875.0, 0L)))
  }

  test("data_ldiversity_report: planted QI groups hit the hand sweep") {
    val ss = spark
    import ss.implicits._
    val dir = freshDir("ldiv")
    // (en, band 0): sources a,b,c (dl=3); (en, band 1): a,a (dl=1);
    // (fr, band 0): a,b (dl=2) — 7 rows, 3 groups.
    // l=2: 1 low group / 2 rows -> 285714 ppm; l=3: 2 / 4 -> 571428;
    // l=5: 3 / 7 -> 1000000
    Seq((1L, "t", "en", "a", 10L), (2L, "t", "en", "b", 20L),
      (3L, "t", "en", "c", 30L), (4L, "t", "en", "a", 110L),
      (5L, "t", "en", "a", 120L), (6L, "t", "fr", "a", 10L),
      (7L, "t", "fr", "b", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("data_ldiversity_report")(spark, dir)
      .collect().map(r => (r.getAs[Int]("l"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("n_low_groups"), r.getAs[Long]("rows_exposed"),
        r.getAs[Long]("exposure_ppm")))
    assert(out.toSeq == Seq(
      (2, 3L, 1L, 2L, 285714L),
      (3, 3L, 2L, 4L, 571428L),
      (5, 3L, 3L, 7L, 1000000L)))
  }

  test("ml_knn_classify: planted separable clusters classify perfectly") {
    val ss = spark
    import ss.implicits._
    val dir = freshDir("knn")
    // 40 vectors in 2-D: label 0 hugs the x-axis, label 1 the y-axis;
    // every 20th vec_id (0, 20) is a query — one per class
    val rows = (0 until 40).map { i =>
      val lab = if (i < 20) 0 else 1
      val e = if (lab == 0) Seq(1.0f, 0.001f * i) else Seq(0.001f * i, 1.0f)
      (i.toLong, e, lab)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("ml_knn_classify")(spark, dir).collect()
      .map(r => r.getAs[Int]("true_label") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_correct"),
          r.getAs[Double]("accuracy")))
      .toMap
    assert(out(0) == ((1L, 1L, 1.0)) && out(1) == ((1L, 1L, 1.0)))
  }
}
