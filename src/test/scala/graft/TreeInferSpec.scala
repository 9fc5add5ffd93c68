package graft

import graft.api.Sampling
import graft.ml.TreeInfer
import graft.ml.TreeInfer.{Leaf, Split}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TreeInfer expression compilation + Sampling.temperatureSample. */
class TreeInferSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("treeColumn routes hand rows, NULL features go right") {
    val s = spark; import s.implicits._
    val t = Split("x", 10.0, Split("y", 1.0, Leaf(1.0), Leaf(2.0)), Leaf(3.0))
    val df = Seq(
      (1L, Some(5.0), Some(0.5)),  // x<=10, y<=1  -> 1.0
      (2L, Some(5.0), Some(2.0)),  // x<=10, y>1   -> 2.0
      (3L, Some(50.0), Some(0.5)), // x>10         -> 3.0
      (4L, None: Option[Double], Some(0.5)) // NULL x -> right -> 3.0
    ).toDF("id", "x", "y")
    val got = df.select(col("id"), TreeInfer.treeColumn(t).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 3.0))
  }

  test("ensembleScore is the fixed-order sum of tree outputs") {
    val s = spark; import s.implicits._
    val trees = Seq(Leaf(0.1), Leaf(0.2), Split("x", 0.0, Leaf(-1.0), Leaf(1.0)))
    val df = Seq((1L, -5.0), (2L, 5.0)).toDF("id", "x")
    val got = df.select(col("id"),
        TreeInfer.ensembleScore(trees).as("sc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.1 + 0.2 + -1.0)
    assert(got(2L) == 0.1 + 0.2 + 1.0)
  }

  test("momentsByGroup matches a driver-side reference on hand data") {
    val s = spark; import s.implicits._
    val vals = Seq(1.0, 2.0, 2.0, 3.0, 7.0, 9.0, 9.0, 9.5, 0.25, 4.75)
    val df = vals.map(v => ("g", v)).toDF("grp", "v")
    val got = graft.api.StatsOps.momentsByGroup(df, "grp", "v").collect().head
    // reference: population moments in exact arithmetic via BigDecimal sums
    val n = vals.size.toDouble
    val s1 = vals.map(BigDecimal(_)).sum.toDouble
    val s2 = vals.map(v => BigDecimal(v) * BigDecimal(v)).sum.toDouble
    val s3 = vals.map(v => BigDecimal(v) * BigDecimal(v) * BigDecimal(v)).sum.toDouble
    val s4 = vals.map(v => BigDecimal(v).pow(4)).sum.toDouble
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - 3.0 * m * s2 / n + 2.0 * m * m * m
    val m4 = s4 / n - 4.0 * m * s3 / n + 6.0 * m * m * s2 / n - 3.0 * m * m * m * m
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(got.getLong(1) == 10L)
    assert(got.getDouble(2) == r4(m))
    assert(math.abs(got.getDouble(3) - r4(m3 / (m2 * math.sqrt(m2)))) < 1e-12)
    assert(math.abs(got.getDouble(4) - r4(m4 / (m2 * m2) - 3.0)) < 1e-12)
    // zero-variance group -> NULL shape stats, non-null mean
    val z = Seq(("z", 5.0), ("z", 5.0)).toDF("grp", "v")
    val gz = graft.api.StatsOps.momentsByGroup(z, "grp", "v").collect().head
    assert(gz.getDouble(2) == 5.0 && gz.isNullAt(3) && gz.isNullAt(4))
  }

  test("changepointCusum finds a planted level shift, ties to earliest") {
    val s = spark; import s.implicits._
    // series: 30 points at 10.0 then 30 at 20.0 — |CUSUM| peaks at the
    // last low point (index 30, ts 30)
    val rows = (1 to 30).map(i => ("u", i.toLong, i.toLong, 10.0)) ++
      (31 to 60).map(i => ("u", i.toLong, i.toLong, 20.0))
    val df = rows.toDF("k", "ts_l", "id", "v")
      .withColumn("ts", expr("timestamp_micros(ts_l * 1000000)"))
    val got = graft.api.TimeSeriesOps
      .changepointCusum(df, "k", "ts", "v", "id").collect().head
    assert(got.getLong(2) == 30L, s"changepoint at ${got.getLong(2)}, want 30")
    // D_30 = n*cum - k*S = 60*300*1e4 - 30*900*1e4 = -9e7 units;
    // normalized = -9e7/(60*1e4) = -150.0
    assert(got.getLong(3) == -90000000L)
    assert(got.getDouble(4) == -150.0)
    // constant series: D == 0 everywhere, tie breaks to the EARLIEST
    val flat = (1 to 10).map(i => ("c", i.toLong, i.toLong, 5.0)).toDF("k", "ts_l", "id", "v")
      .withColumn("ts", expr("timestamp_micros(ts_l * 1000000)"))
    val gf = graft.api.TimeSeriesOps
      .changepointCusum(flat, "k", "ts", "v", "id").collect().head
    assert(gf.getLong(2) == 1L && gf.getLong(3) == 0L)
  }

  test("temperatureSample: rates favor rare groups, kept counts track M, reruns identical") {
    val s = spark; import s.implicits._
    // 800 'big' docs vs 100 'small' docs
    val df = ((1L to 800L).map(i => (i, "big")) ++
      (1001L to 1100L).map(i => (i, "small"))).toDF("doc_id", "grp")
    val out = Sampling.temperatureSample(df, "doc_id", "grp", budgetFrac = 0.5)
    val rates = out.select("grp", "rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // w_big = sqrt(800)/(sqrt(800)+sqrt(100)), M = 450
    // rate_big = 450*w_big/800 ~ 0.415; rate_small = 450*w_small/100 ~ 1.18 -> capped 1.0
    assert(rates("small") == 1.0, s"rare group should keep everything: $rates")
    assert(rates("big") > 0.3 && rates("big") < 0.5, s"big rate off: $rates")
    val byGrp = out.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("small") == 100L)
    // digest-uniform selection: kept 'big' count within 20% of rate*800
    val expBig = rates("big") * 800
    assert(math.abs(byGrp("big") - expBig) < 0.2 * expBig,
      s"kept ${byGrp("big")} vs expected ~$expBig")
    // pure function of ids: a rerun keeps the identical set
    val a = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.temperatureSample(df, "doc_id", "grp", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }
}
