package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gate for the bounded-state histogram percentile
  * (graft.api.StatsOps.binnedPercentiles), which replaced Spark's
  * value-buffering `percentile` aggregate in the declared keys:
  *
  * 1. Bitwise parity with the built-in on the real fixtures and on a
  *    synthetic corpus covering the interpolation edge cases (odd/even
  *    group sizes, heavy duplicates, single-row groups, p = 0 and 1).
  * 2. The scale claim itself: aggregation state is ∝ distinct values
  *    (the bins), not rows — asserted on the executed plan's
  *    HashAggregate output metrics, which must not grow when the same
  *    value grid is re-sampled at 10× the rows.
  */
class BinnedPercentileSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("fixture parity: orders median by status is bitwise-equal to built-in percentile") {
    val orders = Tables.orders(spark, sf)
    val built = orders.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("m"))
      .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getDouble(1)))
    val binned = graft.api.StatsOps.binnedPercentiles(orders, "o_orderstatus",
        col("o_totalprice"), Seq("m" -> 0.5))
      .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(built.map(_._1).toSeq == binned.map(_._1).toSeq)
    built.zip(binned).foreach { case ((g, a), (_, b)) =>
      assert(bits(a) == bits(b), s"group $g: built-in $a != binned $b") }
  }

  test("fixture parity: events p50/p90/p99 ladder is bitwise-equal to built-in percentile") {
    val events = Tables.events(spark, sf)
    val built = events.groupBy("event_type").agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"),
        max(col("value")).as("pmax"))
      .orderBy("event_type").collect()
    val binned = graft.api.StatsOps.binnedPercentiles(events, "event_type",
        col("value"), Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99),
        maxName = Some("pmax"))
      .orderBy("event_type").collect()
    assert(built.length == binned.length && built.nonEmpty)
    built.zip(binned).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      (1 to 4).foreach { i =>
        assert(bits(a.getDouble(i)) == bits(b.getDouble(i)),
          s"${a.getString(0)} col $i: built-in ${a.getDouble(i)} != binned ${b.getDouble(i)}")
      }
    }
  }

  test("synthetic edge cases: odd/even/duplicate/singleton groups, p in {0, .37, 1}") {
    val s = spark
    import s.implicits._
    // g0: 1 row; g1: 2 rows; g2: odd run with duplicates; g3: all-equal
    // FP-exact; g4: all-equal where interpolating WOULD drift an ulp
    // ((9−8.1)·0.01 + (8.1−8)·0.01 = 0.010000000000000002 ≠ 0.01) —
    // pins the vHi===vLo duplicate-run shortcut
    val rows = Seq(("g0", 5.0)) ++
      Seq(("g1", 1.0), ("g1", 2.0)) ++
      (1 to 9).map(i => ("g2", (i % 4).toDouble)) ++
      (1 to 6).map(_ => ("g3", 7.25)) ++
      (1 to 10).map(_ => ("g4", 0.01))
    val df = rows.toDF("g", "v")
    val ps = Seq("q0" -> 0.0, "q37" -> 0.37, "q100" -> 1.0)
    val built = df.groupBy("g").agg(
        expr("percentile(v, 0.0)").as("q0"),
        expr("percentile(v, 0.37)").as("q37"),
        expr("percentile(v, 1.0)").as("q100"))
      .orderBy("g").collect()
    val binned = graft.api.StatsOps.binnedPercentiles(df, "g", col("v"), ps)
      .orderBy("g").collect()
    built.zip(binned).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      (1 to 3).foreach { i =>
        assert(bits(a.getDouble(i)) == bits(b.getDouble(i)),
          s"${a.getString(0)} p#$i: ${a.getDouble(i)} != ${b.getDouble(i)}")
      }
    }
  }

  test("randomized sweep: 40 seeded groups × 8 percentiles bitwise-match the built-in") {
    // seeded, so the sweep is reproducible; values off a coarse grid so
    // duplicate runs spanning both interpolation positions are common
    // (the case the vHi===vLo shortcut exists for), group sizes 1-30,
    // mixed signs and magnitudes
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260813L)
    // ~1/8 of values are NULL, and 2 groups are entirely null — the
    // row-set/null-propagation contract rides the same sweep as the
    // interpolation parity (r10)
    val rows: Seq[(String, Option[Double])] = (0 until 40).flatMap { g =>
      val scale = math.pow(10.0, rnd.nextInt(4) - 1)
      (0 until (1 + rnd.nextInt(30))).map { _ =>
        val v: Option[Double] =
          if (g < 2) None
          else if (rnd.nextInt(8) == 0) None
          else Some((rnd.nextInt(9) - 3) * 0.25 * scale)
        (s"g$g", v)
      }
    }
    val df = rows.toDF("g", "v")
    val ps = Seq("q00" -> 0.0, "q13" -> 0.13, "q25" -> 0.25, "q50" -> 0.5,
      "q77" -> 0.77, "q90" -> 0.9, "q99" -> 0.99, "q100" -> 1.0)
    val builtIn = df.groupBy("g").agg(
        expr("percentile(v, 0.0)").as("q00"), expr("percentile(v, 0.13)").as("q13"),
        expr("percentile(v, 0.25)").as("q25"), expr("percentile(v, 0.5)").as("q50"),
        expr("percentile(v, 0.77)").as("q77"), expr("percentile(v, 0.9)").as("q90"),
        expr("percentile(v, 0.99)").as("q99"), expr("percentile(v, 1.0)").as("q100"))
      .orderBy("g").collect()
    val binned = graft.api.StatsOps.binnedPercentiles(df, "g", col("v"), ps)
      .orderBy("g").collect()
    assert(builtIn.length == 40 && binned.length == 40)
    builtIn.zip(binned).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      (1 to 8).foreach { i =>
        assert(a.isNullAt(i) == b.isNullAt(i),
          s"${a.getString(0)} p#$i: null-ness differs (built ${a.get(i)}, binned ${b.get(i)})")
        if (!a.isNullAt(i))
          assert(bits(a.getDouble(i)) == bits(b.getDouble(i)),
            s"${a.getString(0)} p#$i: built-in ${a.getDouble(i)} != binned ${b.getDouble(i)}")
      }
    }
  }

  test("all-null and mixed-null groups match the built-in row set (null percentile, not absence)") {
    val s = spark
    import s.implicits._
    // gAll: every value null (the divergence ADVICE r9 flagged — the
    // built-in and DuckDB quantile_cont emit the group with a NULL
    // percentile; dropping it is a row-set mismatch); gMix: nulls are
    // excluded from the computation but the group stays
    val df = Seq(("gAll", None: Option[Double]), ("gAll", None),
        ("gMix", Some(1.0)), ("gMix", None), ("gMix", Some(3.0)),
        ("gVal", Some(2.0)))
      .toDF("g", "v")
    val built = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("m"))
      .orderBy("g").collect()
    val binned = graft.api.StatsOps.binnedPercentiles(df, "g", col("v"), Seq("m" -> 0.5))
      .orderBy("g").collect()
    assert(built.length == 3 && binned.length == 3,
      s"row sets differ: built ${built.length}, binned ${binned.length}")
    built.zip(binned).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.isNullAt(1) == b.isNullAt(1),
        s"${a.getString(0)}: null-ness differs (built ${a.get(1)}, binned ${b.get(1)})")
      if (!a.isNullAt(1))
        assert(bits(a.getDouble(1)) == bits(b.getDouble(1)),
          s"${a.getString(0)}: built-in ${a.getDouble(1)} != binned ${b.getDouble(1)}")
    }
  }

  /** Output rows of the first (partial+final) HashAggregate pair in the
    * executed plan — the bin table's cardinality, i.e. the state the
    * query actually shuffles and holds. */
  private def binAggOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    // AQE nests executed stages inside AdaptiveSparkPlanExec /
    // QueryStageExec wrappers that plain collect() does not enter
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    val aggs = allNodes(df.queryExecution.executedPlan).collect {
      case h: HashAggregateExec => h.metrics("numOutputRows").value
    }
    assert(aggs.nonEmpty, "no HashAggregate in the executed plan")
    // the deepest aggregate pair is the (group, value) histogram; its
    // FINAL output is the smallest count ≥ bins — take the max to get
    // the partial side, the true upper bound on per-stage state
    aggs.max
  }

  test("state is ∝ bins, not rows: 10× the rows over the same grid keeps the bin table fixed") {
    val grid = 100 // distinct values per group
    def corpus(n: Long) = spark.range(n).select(
      (col("id") % 4).cast("string").as("g"),
      ((col("id") * 2654435761L) % grid).cast("double").as("v"))
    val small = graft.api.StatsOps.binnedPercentiles(corpus(20000L), "g",
      col("v"), Seq("p50" -> 0.5, "p99" -> 0.99))
    val large = graft.api.StatsOps.binnedPercentiles(corpus(200000L), "g",
      col("v"), Seq("p50" -> 0.5, "p99" -> 0.99))
    val sBins = binAggOutputRows(small)
    val lBins = binAggOutputRows(large)
    // partial aggregates can emit a few duplicate bins across tasks —
    // allow tasks × bins slack but NOTHING proportional to rows
    val cap = 8L * 4 * grid
    assert(sBins <= cap, s"small-corpus agg emitted $sBins rows (cap $cap)")
    assert(lBins <= cap,
      s"10× rows grew the bin aggregate to $lBins rows (cap $cap) — state is tracking rows")
    // and the built-in buffering percentile is really gone from the plan
    Seq(small, large).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"plan still contains a percentile aggregate:\n$p")
    }
  }

  test("declared percentile-family keys plan a bin aggregate, not a buffering percentile") {
    Seq("agg_percentile", "agg_percentiles_multi", "agg_outlier_iqr",
        "text_quality_filter").foreach { k =>
      val p = SparkEntry.queries(k)(spark, sf).queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("percentile"),
        s"$k still plans the value-buffering percentile:\n$p")
      assert(p.contains("HashAggregate"), s"$k lost its hash aggregate:\n$p")
    }
  }
}
