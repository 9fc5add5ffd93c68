package graft

import graft.api.{StatsOps, TimeSeriesOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed oracle values for the r16 stats/survival/sweep-line
  * operators. The DuckDB twins execute the SAME closed forms, so a
  * shared misreading of a formula would slip the hash gate — these
  * pin the textbook numbers independently of both engines. */
class StatsHandSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def df2(rows: Seq[(String, Double)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("v", DoubleType)))
    spark.createDataFrame(
      rows.map { case (g, v) => org.apache.spark.sql.Row(g, v) }.asJava, schema)
  }

  test("crossValLinReg matches the hand leave-fold-out example") {
    // fold 0 = {(1,1),(2,2)} (the y=x line), fold 1 = {(1,3),(2,5),(3,7)}
    // (the y=2x+1 line). Fold 0's model trains on fold 1 → y=2x+1,
    // held-out residuals −2,−3 → rmse=√6.5, mae=2.5; fold 1's model
    // trains on fold 0 → y=x, residuals 2,3,4 → rmse=√(29/3), mae=3.
    val df = spark.createDataFrame(Seq(
      (0L, 1.0, 1.0), (0L, 2.0, 2.0),
      (1L, 1.0, 3.0), (1L, 2.0, 5.0), (1L, 3.0, 7.0)))
      .toDF("fold", "x", "y")
    val rows = StatsOps.crossValLinReg(df, "fold", "x", "y")
      .orderBy("fold").collect()
    assert(rows.length == 2)
    val f0 = rows(0)
    assert(f0.getAs[Long]("n_train") == 3 && f0.getAs[Long]("n_test") == 2)
    assert(f0.getAs[Double]("slope") == 2.0 && f0.getAs[Double]("intercept") == 1.0)
    assert(math.abs(f0.getAs[Double]("rmse") - math.sqrt(6.5)) < 1e-4)
    assert(f0.getAs[Double]("mae") == 2.5)
    val f1 = rows(1)
    assert(f1.getAs[Long]("n_train") == 2 && f1.getAs[Long]("n_test") == 3)
    assert(f1.getAs[Double]("slope") == 1.0 && f1.getAs[Double]("intercept") == 0.0)
    assert(math.abs(f1.getAs[Double]("rmse") - math.sqrt(29.0 / 3.0)) < 1e-4)
    assert(f1.getAs[Double]("mae") == 3.0)
  }

  test("crossValLinReg: a zero-variance training side yields NULL coefficients, not a crash") {
    // fold 1 is the only OTHER fold and has constant x → fold 0's
    // model has no slope; fold 1 still trains fine on fold 0
    val df = spark.createDataFrame(Seq(
      (0L, 1.0, 1.0), (0L, 2.0, 2.0),
      (1L, 4.0, 3.0), (1L, 4.0, 5.0)))
      .toDF("fold", "x", "y")
    val rows = StatsOps.crossValLinReg(df, "fold", "x", "y")
      .orderBy("fold").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("slope")))
    assert(rows(0).isNullAt(rows(0).fieldIndex("rmse")))
    assert(rows(1).getAs[Double]("slope") == 1.0)
  }

  test("mannWhitneyU matches the hand-ranked example") {
    // A = {1,2,3}, B = {2,3,4}: tie-averaged R1 = 1 + 2.5 + 4.5 = 8,
    // U1 = 8 − 6 = 2; ties Σ(t³−t) = 12, σ² = 0.75·(7 − 12/30) = 4.95
    val df = df2(Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 2.0, "b" -> 3.0, "b" -> 4.0))
    val r = StatsOps.mannWhitneyU(df, "g", "v", "a", "b").collect()(0)
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("u_a") == 2.0)
    val z = (2.0 - 4.5) / math.sqrt(4.95)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-4)
  }

  test("ksTest matches the hand ECDF example") {
    // A = {1,2,3}, B = {3,4}: max |F_a − F_b| at v=2: |2/3 − 0| = 2/3
    val df = df2(Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 3.0, "b" -> 4.0))
    val r = StatsOps.ksTest(df, "g", "v", "a", "b").collect()(0)
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 2)
    assert(math.abs(r.getAs[Double]("d") - 2.0 / 3.0) < 1e-4)
  }

  test("kaplanMeier matches the textbook curve incl. censoring and the zero tail") {
    // durations (obs): 1(1) 1(1) 2(1) 3(0) 4(1)
    // S(1) = 1 − 2/5 = 0.6; S(2) = 0.6·(1 − 1/3) = 0.4; the censored 3
    // leaves silently; at 4 the whole remaining risk set (1) dies → 0
    val ss = TestSpark.spark
    import ss.implicits._
    val durs = Seq((1L, 1L), (1L, 1L), (2L, 1L), (3L, 0L), (4L, 1L))
      .toDF("dur", "obs")
    val rows = TimeSeriesOps.kaplanMeier(durs, "dur", "obs")
      .collect().map(r => (r.getAs[Long]("dur"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_events"), r.getAs[Double]("survival")))
    assert(rows.length == 3)
    assert(rows(0) == ((1L, 5L, 2L, 0.6)))
    assert(rows(1) == ((2L, 3L, 1L, 0.4)))
    assert(rows(2)._1 == 4L && rows(2)._2 == 1L && rows(2)._4 == 0.0)
  }

  test("winsorizedMean clips at the interpolated cuts") {
    // {1,2,3,4,100}: p05 = 1.2, p95 = 80.8 → clipped mean 91/5 = 18.2
    val df = df2(Seq("g" -> 1.0, "g" -> 2.0, "g" -> 3.0,
      "g" -> 4.0, "g" -> 100.0))
    val r = StatsOps.winsorizedMean(df, "g", col("v"), 0.05, 0.95).collect()(0)
    assert(r.getAs[Double]("mean") == 22.0)
    assert(math.abs(r.getAs[Double]("winsor_mean") - 18.2) < 1e-4)
  }

  test("concurrencyPeak counts closed-interval overlap at a shared boundary") {
    // sessions [0,10], [5,20], [20,30] µs (gap 15 µs keeps each user's
    // two events one session): the end at 20 still overlaps the start
    // at 20 → active = 2 there; peak 2, five distinct boundary instants
    val ss = TestSpark.spark
    import ss.implicits._
    val ev = Seq((1L, 1L, 0L), (1L, 2L, 10L), (2L, 3L, 5L), (2L, 4L, 20L),
        (3L, 5L, 20L), (3L, 6L, 30L))
      .toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = TimeSeriesOps.concurrencyPeak(ev, "user_id", "event_id", "ts",
      gapUs = 15L).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("hour_bucket") == 0L)
    assert(r(0).getAs[Long]("n_changes") == 5L)
    assert(r(0).getAs[Long]("peak_concurrency") == 2L)
  }

  test("anovaF matches the hand-computed two-arm example") {
    // a = {1,2,3} (mean 2), b = {4,5,6} (mean 5), grand mean 3.5:
    // SSB = 3·1.5² + 3·1.5² = 13.5, SSW = 2 + 2 = 4,
    // F = (13.5/1)/(4/4) = 13.5 with df (1, 4)
    val df = df2(Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 4.0, "b" -> 5.0, "b" -> 6.0))
    val r = StatsOps.anovaF(df, "g", "v").collect()(0)
    assert(r.getAs[Long]("n_groups") == 2 && r.getAs[Long]("n") == 6)
    assert(r.getAs[Long]("df1") == 1 && r.getAs[Long]("df2") == 4)
    assert(math.abs(r.getAs[Double]("f") - 13.5) < 1e-4)
  }

  test("anovaF guards: single group and zero within-variance emit NULL F") {
    val one = StatsOps.anovaF(df2(Seq("a" -> 1.0, "a" -> 2.0)), "g", "v")
      .collect()(0)
    assert(one.isNullAt(one.fieldIndex("f")))
    val const = StatsOps.anovaF(df2(Seq("a" -> 2.0, "a" -> 2.0,
      "b" -> 5.0, "b" -> 5.0)), "g", "v").collect()(0)
    assert(const.isNullAt(const.fieldIndex("f")))
  }

  test("spearmanCorr matches 1 − 6Σd²/(n(n²−1)) on a tie-free example") {
    // x = 1..4, y = (2,3,1,4): d = (−1,−1,2,0), Σd² = 6,
    // ρ = 1 − 36/60 = 0.4
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(("g", 1.0, 2.0), ("g", 2.0, 3.0), ("g", 3.0, 1.0),
      ("g", 4.0, 4.0)).toDF("g", "x", "y")
    val r = StatsOps.spearmanCorr(df, "g", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") == 4)
    assert(math.abs(r.getAs[Double]("rho") - 0.4) < 1e-4)
  }

  test("spearmanCorr ties: identical rank vectors give exactly 1") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(("g", 1.0, 10.0), ("g", 1.0, 10.0), ("g", 2.0, 20.0))
      .toDF("g", "x", "y")
    val r = StatsOps.spearmanCorr(df, "g", "x", "y").collect()(0)
    assert(r.getAs[Double]("rho") == 1.0)
  }

  test("woeIv matches the hand-smoothed two-bin example") {
    // bin A: 2 good / 1 bad, bin B: 1 good / 2 bad (G = B = 3):
    // gd_A = 2.5/3, bd_A = 1.5/3 → WoE_A = ln(5/3) = 0.5108 and by
    // symmetry WoE_B = −0.5108; IV = 2·(1/3)·ln(5/3) = 0.3406
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(("f", "A", 0), ("f", "A", 0), ("f", "A", 1),
      ("f", "B", 0), ("f", "B", 1), ("f", "B", 1))
      .toDF("feature", "bin", "bad")
    val r = graft.api.MlPipeline.woeIv(df, "feature", "bin", "bad")
      .orderBy("bin").collect()
    assert(r.map(_.getAs[Long]("n")).toSeq == Seq(3L, 3L))
    assert(math.abs(r(0).getAs[Double]("woe") - 0.5108) < 1e-9)
    assert(math.abs(r(1).getAs[Double]("woe") + 0.5108) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("iv_contrib") - 0.170275) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("iv") - 0.3406) < 1e-9)
  }

  test("woeIv: a zero-margin feature emits NULL WoE/IV, not a crash") {
    // feature f2 is ALL-bad: its good margin is 0, which cell
    // smoothing does not touch — WoE is undefined for every f2 bin
    // and must surface as NULL (under ANSI Spark the unguarded
    // division killed the job). f1 stays fully defined.
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(("f1", "A", 0), ("f1", "A", 1), ("f1", "B", 1),
      ("f2", "X", 1), ("f2", "Y", 1)).toDF("feature", "bin", "bad")
    val r = graft.api.MlPipeline.woeIv(df, "feature", "bin", "bad")
      .orderBy("feature", "bin").collect()
    val f2 = r.filter(_.getAs[String]("feature") == "f2")
    assert(f2.length == 2)
    f2.foreach { row =>
      assert(row.isNullAt(row.fieldIndex("woe")))
      assert(row.isNullAt(row.fieldIndex("iv")))
    }
    assert(r.filter(_.getAs[String]("feature") == "f1")
      .forall(!_.isNullAt(r(0).fieldIndex("woe"))))
  }

  test("averagePrecisionBinned: zero positives give NULL AP, not a crash") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq((0.9, 0), (0.3, 0)).toDF("score", "y")
    val r = graft.api.MlPipeline.averagePrecisionBinned(df, "score", "y")
      .collect()(0)
    assert(r.getAs[Long]("n_pos") == 0 && r.getAs[Long]("n_neg") == 2)
    assert(r.isNullAt(r.fieldIndex("avg_precision")))
  }

  test("regressionEvalByGroup stays exact on FRACTIONAL x (the (28,8) staging)") {
    // x at 2 dp non-integral: slope(6dp)·x(2dp) has genuine 8 dp —
    // without the (28,8) product staging Spark's precision-38 cap
    // returned the residual at scale 7 (measured on 4.1.2). Values
    // pinned from an exact-decimal reference computation.
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(("g", 1.25, 1.0), ("g", 2.75, 2.3), ("g", 4.25, 4.1))
      .toDF("g", "x", "y")
    val r = StatsOps.regressionEvalByGroup(df, "g", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") == 3)
    assert(math.abs(r.getAs[Double]("rmse") - 0.1179) < 1e-9)
    assert(math.abs(r.getAs[Double]("mae") - 0.1111) < 1e-9)
    assert(math.abs(r.getAs[Double]("mape") - 0.0587) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 0.9914) < 1e-9)
  }

  test("regressionEvalByGroup MAPE: |y| denominator, zero-y rows out of both sides") {
    // y spans negative / zero / positive: the per-row term must be
    // |e|/|y| (a signed denominator lets negative-actual terms CANCEL
    // positive ones) and the mean must divide by the y ≠ 0 row count,
    // not n (r16 ADVICE). Hand fit: slope 3.4, intercept -6.2 exact
    // on the 6 dp grid; residuals (0.3, -0.6, 0.3); MAPE terms
    // 0.3/2.5 = 0.12 and 0.3/4.3 → 0.069767 on the 6 dp grid, mean
    // over the TWO nonzero-y rows = 0.0949 at 4 dp. The pre-fix code
    // returned -0.0167 here (signed cancel + ÷3).
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(("g", 1.0, -2.5), ("g", 2.0, 0.0), ("g", 3.0, 4.3))
      .toDF("g", "x", "y")
    val r = StatsOps.regressionEvalByGroup(df, "g", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") == 3)
    assert(math.abs(r.getAs[Double]("rmse") - 0.4243) < 1e-9)
    assert(math.abs(r.getAs[Double]("mae") - 0.4) < 1e-9)
    assert(math.abs(r.getAs[Double]("mape") - 0.0949) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 0.9772) < 1e-9)
    // an all-zero-y group has no defined MAPE term at all → NULL
    val z = Seq(("z", 1.0, 0.0), ("z", 2.0, 0.0), ("z", 3.0, 0.0))
      .toDF("g", "x", "y")
    val rz = StatsOps.regressionEvalByGroup(z, "g", "x", "y").collect()(0)
    assert(rz.isNullAt(rz.fieldIndex("mape")))
  }

  test("woeIv smoothing keeps pure bins finite") {
    // bin C all-good, bin D all-bad: the +0.5 cell smoothing keeps
    // WoE = ±ln(2.5/0.5) = ±1.6094 instead of ±∞
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(("f", "C", 0), ("f", "C", 0),
      ("f", "D", 1), ("f", "D", 1)).toDF("feature", "bin", "bad")
    val r = graft.api.MlPipeline.woeIv(df, "feature", "bin", "bad")
      .orderBy("bin").collect()
    assert(math.abs(r(0).getAs[Double]("woe") - 1.6094) < 1e-9)
    assert(math.abs(r(1).getAs[Double]("woe") + 1.6094) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("iv") - 3.2189) < 1e-9)
  }

  test("averagePrecisionBinned matches the hand P-R fold") {
    // scores desc: (0.9, y=1) P=1, ΔR=1/2 → 0.5; (0.8, 0) → 0;
    // (0.7, 1) P=2/3, ΔR=1/2 → rk6(1/3) = 0.333333; AP = 0.8333
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq((0.9, 1), (0.8, 0), (0.7, 1)).toDF("score", "y")
    val r = graft.api.MlPipeline.averagePrecisionBinned(df, "score", "y")
      .collect()(0)
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 1)
    assert(r.getAs[Double]("avg_precision") == 0.8333)
    // perfect ranking: all positives above all negatives → AP = 1
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0)).toDF("score", "y")
    val p = graft.api.MlPipeline.averagePrecisionBinned(perfect, "score", "y")
      .collect()(0)
    assert(p.getAs[Double]("avg_precision") == 1.0)
  }

  test("embeddingDrift: orthogonal halves score 0, identical halves 1") {
    val s = TestSpark.spark
    import s.implicits._
    // label 0: ref centroid e_x, cand centroid e_y → cos 0, norms 1;
    // label 1: both halves centered on (3,4) → cos 1, norms 5
    val df = Seq(
      (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),
      (3L, 0, Seq(0f, 1f)), (4L, 0, Seq(0f, 1f)),
      (5L, 1, Seq(3f, 4f)), (6L, 1, Seq(3f, 4f)))
      .toDF("id", "label", "vec")
    val r = graft.api.Similarity.embeddingDrift(df, "label", "vec",
        col("id").isin(1L, 2L, 5L)).orderBy("label").collect()
    assert(r(0).getAs[Double]("centroid_cos") == 0.0)
    assert(r(0).getAs[Double]("norm_ref") == 1.0)
    assert(r(0).getAs[Double]("norm_cand") == 1.0)
    assert(r(1).getAs[Double]("centroid_cos") == 1.0)
    assert(r(1).getAs[Double]("norm_ref") == 5.0)
    assert(r(1).getAs[Long]("n_ref") == 1L && r(1).getAs[Long]("n_cand") == 1L)
  }

  test("seasonalAnomalies z-scores bins against their own hod slot") {
    // key k, hour-of-day 0 across 3 days with counts 2, 1, 3:
    // slot μ = 2, σ = 1 → z = 0, −1, +1; every other hod slot on the
    // gapfilled grid is all-zero (variance 0) and must be excluded
    val s = TestSpark.spark
    import s.implicits._
    val ev = Seq(
      "2026-01-01 00:10:00", "2026-01-01 00:20:00",
      "2026-01-02 00:15:00",
      "2026-01-03 00:05:00", "2026-01-03 00:25:00", "2026-01-03 00:45:00")
      .map(t => ("k", t)).toDF("key", "tss")
      .select(col("key"), to_timestamp(col("tss")).as("ts"))
    val r = TimeSeriesOps.seasonalAnomalies(ev, "ts", "key",
        binSeconds = 3600, topK = 3)
      .orderBy("win_start").collect()
    assert(r.length == 3)
    assert(r.map(_.getAs[Long]("hod")).forall(_ == 0L))
    assert(r.map(_.getAs[Long]("n")).toSeq == Seq(2L, 1L, 3L))
    assert(r.map(_.getAs[Double]("z")).toSeq == Seq(0.0, -1.0, 1.0))
  }

  test("ratioMetricDelta matches the hand delta-method example") {
    // arm A users (x=Σvalue, y=events): (2,1), (4,3) → R = 6/4 = 1.5,
    // varX = 2, varY = 2, cov = 2, ȳ = 2 →
    // Var(R) = (2 − 2·1.5·2 + 2.25·2)/(2·4) = 0.0625 → SE = 0.25.
    // arm B: (1,1), (3,1) → R = 2, varX = 2, varY = 0, cov = 0,
    // ȳ = 1 → Var = 2/(2·1) = 1 → SE = 1.
    // z = (1.5 − 2)/√1.0625 = −0.4851
    val s = TestSpark.spark
    import s.implicits._
    val ev = Seq(
      ("A", "u1", 2.0), ("A", "u2", 1.0), ("A", "u2", 1.0), ("A", "u2", 2.0),
      ("B", "u3", 1.0), ("B", "u4", 3.0)).toDF("arm", "uid", "v")
    val r = StatsOps.ratioMetricDelta(ev, "uid", "arm", "v", "A", "B")
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(math.abs(r.getAs[Double]("ratio_a") - 1.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("ratio_b") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_a") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_b") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") + 0.4851) < 1e-9)
  }

  test("ratioMetricDelta guards: a single-user arm NULLs its SE and z") {
    val s = TestSpark.spark
    import s.implicits._
    val ev = Seq(("A", "u1", 2.0), ("A", "u2", 4.0), ("B", "u3", 1.0))
      .toDF("arm", "uid", "v")
    val r = StatsOps.ratioMetricDelta(ev, "uid", "arm", "v", "A", "B")
      .collect()(0)
    assert(r.getAs[Long]("n_b") == 1)
    assert(r.isNullAt(r.fieldIndex("se_b")))
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("regressionEvalByGroup matches the hand-fit example") {
    // y ~ x on (1,1),(2,2),(3,4): slope 1.5, intercept −2/3 → rounded
    // −0.666667; residuals (0.166667, −0.333333, 0.166667);
    // RMSE = √(0.1666…/3) = 0.2357, MAE = 0.2222,
    // MAPE = (0.166667 + 0.166667 + 0.041667)/3 = 0.125,
    // R² = 1 − SSE/SST = 1 − 0.1666…/4.6667 = 0.9643
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 4.0))
      .toDF("g", "x", "y")
    val r = StatsOps.regressionEvalByGroup(df, "g", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") == 3)
    assert(math.abs(r.getAs[Double]("rmse") - 0.2357) < 1e-9)
    assert(math.abs(r.getAs[Double]("mae") - 0.2222) < 1e-9)
    assert(math.abs(r.getAs[Double]("mape") - 0.125) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 0.9643) < 1e-9)
  }

  test("regressionEvalByGroup: perfect fit and zero-variance guard") {
    val s = TestSpark.spark
    import s.implicits._
    val perfect = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0))
      .toDF("g", "x", "y")
    val p = StatsOps.regressionEvalByGroup(perfect, "g", "x", "y").collect()(0)
    assert(p.getAs[Double]("rmse") == 0.0 && p.getAs[Double]("mae") == 0.0)
    assert(p.getAs[Double]("r2") == 1.0)
    // constant x: den = 0 → NULL metrics, the group still appears
    val flat = Seq(("g", 2.0, 1.0), ("g", 2.0, 3.0)).toDF("g", "x", "y")
    val f = StatsOps.regressionEvalByGroup(flat, "g", "x", "y").collect()(0)
    assert(f.getAs[Long]("n") == 2)
    assert(f.isNullAt(f.fieldIndex("rmse")) && f.isNullAt(f.fieldIndex("r2")))
  }
}
