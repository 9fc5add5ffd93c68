package graft.operators

import graft.{Canon, Q, Tables}
import graft.Canon.{sql => O}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.4 — aggregation. All shapes ride Spark's partial+final hash
  * aggregation (map-side combine), so shuffled bytes are proportional
  * to |groups|, not |rows| — the property that matters at 100 TB.
  * ROLLUP/CUBE/GROUPING SETS expand in the Expand operator before the
  * shuffle; distinct counts use Spark's two-phase expand plan.
  */
object Aggregates {
  val queries: Map[String, Q] = Map(
    "agg_groupby_q1" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          Canon.sumDec(col("l_extendedprice"), 2).as("sum_base_price"),
          Canon.sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          Canon.sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          Canon.r4(avg(col("l_quantity"))).as("avg_qty"),
          Canon.r4(Canon.sumDec(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
          Canon.r4(Canon.sumDec(col("l_discount"), 2) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "agg_having" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 12)
        .orderBy("o_custkey")
    }),
    "agg_distinct_count" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type").agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }),
    "agg_multi_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("value")).as("n_values"))
        .orderBy("event_type")
    }),
    "agg_approx_distinct" -> ((s, d) => {
      // HLL++ sketch — no DuckDB hash parity by design (✘ key);
      // unit-tested within ±5% of the exact count.
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")
    }),
    "agg_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    }),
    "agg_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    }),
    "agg_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT coalesce(l_returnflag, '(all)') AS rf,
          |       coalesce(l_linestatus, '(all)') AS ls,
          |       CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
          |       CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
          |       count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY rf, ls""".stripMargin)
    }),
    "agg_stats" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        Canon.r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
        Canon.r4(var_samp(col("l_quantity"))).as("var_qty"),
        Canon.r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
    }),
    "agg_percentile" -> ((s, d) => {
      // exact median via the bounded-state histogram percentile
      // (state ∝ distinct 2 dp prices, never a per-group value buffer)
      graft.api.StatsOps.binnedPercentiles(Tables.orders(s, d),
          "o_orderstatus", col("o_totalprice"), Seq("median_price" -> 0.5))
        .select(col("o_orderstatus"),
          Canon.r4(col("median_price")).as("median_price"))
        .orderBy("o_orderstatus")
    }),
    "agg_pivot" -> ((s, d) => {
      // PIVOT: order counts and money by status, statuses as columns.
      // Explicit value list so the plan is a single agg pass (no
      // distinct-values pre-query) and the schema is static — the
      // 100 TB posture for pivot.
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"))
        .na.fill(0L)
        .withColumnRenamed("F", "n_f").withColumnRenamed("O", "n_o")
        .withColumnRenamed("P", "n_p")
        .orderBy("o_orderpriority")
    }),
    "agg_collect_sorted" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"))
        .orderBy("o_orderstatus")
    }),
    "agg_unpivot" -> ((s, d) => {
      // UNPIVOT/melt: wide per-status metrics → (status, metric, value)
      // long form — the inverse of agg_pivot. Native Dataset.unpivot
      // (Spark's Expand), one pass, no join; metric count is static so
      // output is rows × metrics at any scale.
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(Canon.sumDec(col("o_totalprice"), 2).as("sum_price"),
          count(lit(1)).cast("double").as("n_orders"),
          Canon.r4(Canon.sumDec(col("o_totalprice"), 2) / count(lit(1))).as("avg_price"))
        .unpivot(Array(col("o_orderstatus")),
          Array(col("sum_price"), col("n_orders"), col("avg_price")),
          "metric", "value")
        .orderBy("o_orderstatus", "metric")
    }),
    "agg_share_of_total" -> ((s, d) => {
      // ratio-to-report: each priority's exact-decimal revenue share
      // of the corpus total — one aggregate + a broadcast 1-row total,
      // never a global window
      val per = Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(Canon.sumDec(col("o_totalprice"), 2).as("rev"))
      val tot = Tables.orders(s, d)
        .agg(Canon.sumDec(col("o_totalprice"), 2).as("_tot"))
      per.crossJoin(broadcast(tot))
        .select(col("o_orderpriority"), col("rev"),
          Canon.r4(col("rev") / col("_tot")).as("share"))
        .orderBy("o_orderpriority")
    }),
    "agg_percentiles_multi" -> ((s, d) => {
      // the ops-report percentile ladder (p50/p90/p99/max) per event
      // type — exact percentiles from ONE histogram pass, state ∝
      // distinct 4 dp values (max rides the same bin table for free)
      graft.api.StatsOps.binnedPercentiles(Tables.events(s, d),
          "event_type", col("value"),
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99),
          maxName = Some("pmax"))
        .select(col("event_type"), Canon.r4(col("p50")).as("p50"),
          Canon.r4(col("p90")).as("p90"), Canon.r4(col("p99")).as("p99"),
          col("pmax"))
        .orderBy("event_type")
    }),
    "agg_cramers_v" -> ((s, d) => {
      // Cramér's V effect size for the lang × source association —
      // the single-number companion to agg_chi2_contrib's per-cell
      // audit (is the corpus's language mix independent of its
      // source?). The cross-cell χ² SUM is the one float sum neither
      // engine's merge order pins, so each cell's (o−e)²/e
      // grid-rounds to 6 dp decimal FIRST and the sum runs exact;
      // empty grid cells contribute their full expected mass
      // (o=0 ⇒ e), so the statistic is the true χ², not an
      // observed-cells-only approximation. Margins and the grid are
      // |langs| × |sources| rows — never ∝ corpus.
      import org.apache.spark.sql.types.DecimalType
      val ct = Tables.documents(s, d).groupBy("lang", "source")
        .agg(count(lit(1)).as("o"))
      val rowT = ct.groupBy("lang").agg(sum(col("o")).as("_r"))
      val colT = ct.groupBy("source").agg(sum(col("o")).as("_c"))
      val tot = ct.agg(sum(col("o")).as("_t"))
      val nr = rowT.agg(count(lit(1)).as("_nr"))
      val nc = colT.agg(count(lit(1)).as("_nc"))
      val o = coalesce(col("o"), lit(0L)).cast("double")
      val e = (col("_r") * col("_c")).cast("double") / col("_t").cast("double")
      val cell = Canon.rk((o - e) * (o - e) / e, 6).cast(DecimalType(28, 6))
      rowT.crossJoin(colT)
        .join(ct, Seq("lang", "source"), "left")
        .crossJoin(broadcast(tot))
        .agg(sum(cell).cast("double").as("_chi2"), max(col("_t")).as("n"))
        .crossJoin(broadcast(nr)).crossJoin(broadcast(nc))
        .select(col("n"), col("_nr").as("n_lang"), col("_nc").as("n_src"),
          Canon.r4(col("_chi2")).as("chi2"),
          Canon.r4(sqrt(col("_chi2")
            / (col("n") * least(col("_nr") - 1, col("_nc") - 1)).cast("double")))
            .as("cramers_v"))
    }),
    "agg_chi2_contrib" -> ((s, d) => {
      // chi-squared independence audit of event_type × UTC hour as a
      // per-cell CONTRIBUTION table: observed count, expected
      // row·col/total, and (o−e)²/e — the cells that deviate ARE the
      // finding (which type misbehaves at which hour), and emitting
      // per-cell terms sidesteps the one thing that would break the
      // hash gate: a cross-cell float sum, whose order neither engine
      // pins. All inputs are exact integer counts; each cell's floats
      // are engine-identical. Margins fold from the CELL table (rows ∝
      // types·24, never events) and broadcast back.
      val ev = Tables.events(s, d)
      val ct = ev.groupBy(col("event_type"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("o"))
      val rowT = ct.groupBy("event_type").agg(sum(col("o")).as("_r"))
      val colT = ct.groupBy("hod").agg(sum(col("o")).as("_c"))
      val tot = ct.agg(sum(col("o")).as("_t"))
      val e = (col("_r") * col("_c")).cast("double") / col("_t").cast("double")
      ct.join(broadcast(rowT), "event_type")
        .join(broadcast(colT), "hod")
        .crossJoin(broadcast(tot))
        .select(col("event_type"), col("hod"), col("o"),
          Canon.r4(e).as("e"),
          Canon.r4((col("o").cast("double") - e) * (col("o").cast("double") - e) / e)
            .as("contrib"))
        .orderBy("event_type", "hod")
    }),
    "agg_ttest_welch" -> ((s, d) => {
      // the A/B-experiment readout: Welch's t between click and
      // purchase values — one aggregate of exact decimal power sums
      // over both arms, t and Welch–Satterthwaite df from the closed
      // form applied once (StatsOps.welchTTest)
      graft.api.StatsOps.welchTTest(Tables.events(s, d),
        "event_type", "value", "click", "purchase")
    }),
    "agg_bootstrap_ci" -> ((s, d) => {
      // distributed bootstrap: 95% CI for mean(l_extendedprice) from
      // B=50 POISSON bootstrap replicas — the resample-free bootstrap
      // (Poisson(1) weights ≈ multinomial at large n) that needs no
      // per-replica shuffle: each row draws its 50 weights from a
      // deterministic md5 stream (engine-portable like the sampling
      // keys), every replica sum runs in exact decimal in ONE
      // aggregate pass over the ×B exploded rows, and the CI cuts
      // come from the exact percentile over the 50 grid-rounded
      // replica means. Wholly reproducible: same data → same CI, on
      // any engine, any partitioning. Scale: linear ×B fan-out, two
      // hash aggregates, no sort wider than 50 rows.
      import org.apache.spark.sql.types.DecimalType
      // Fanout (r21): the ×50 replica explode + per-row md5 stream is
      // the key's dominant cost and would otherwise run on the single
      // scan partition of the one-file fixture
      val li = graft.api.Fanout(Tables.lineitem(s, d).select(
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("_id"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("_x")))
      val rep = li.select(col("_id"), col("_x"),
        explode(sequence(lit(0), lit(49))).as("b"))
      // inverse-CDF Poisson(1) on a 16-bit md5 slice: thresholds are
      // round(F(k)·65536) for k = 0..5, tail mass (~6e-4) draws 6
      val h = conv(substring(md5(concat(col("_id"), lit(":"), col("b"))),
        1, 4), 16, 10).cast("long")
      val w = when(h < 24109, 0L).when(h < 48219, 1L).when(h < 60273, 2L)
        .when(h < 64292, 3L).when(h < 65296, 4L).when(h < 65497, 5L)
        .otherwise(6L)
      val means = rep.withColumn("_w", w)
        .groupBy("b").agg(sum(col("_w")).as("_n"),
          sum(col("_w").cast(DecimalType(2, 0)) * col("_x")).as("_s"))
        .select(lit("ci").as("_g"),
          Canon.r4(col("_s").cast("double") / col("_n").cast("double")).as("_m"))
      val ci = graft.api.StatsOps.binnedPercentiles(means, "_g", col("_m"),
          Seq("_lo" -> 0.025, "_hi" -> 0.975))
        .select(Canon.r4(col("_lo")).as("ci_lo"), Canon.r4(col("_hi")).as("ci_hi"))
      li.agg(count(lit(1)).as("n"),
          Canon.r4(sum(col("_x")).cast("double") / count(lit(1)).cast("double"))
            .as("mean"))
        .crossJoin(broadcast(ci))
    }),
    "agg_ks_test" -> ((s, d) => {
      // distribution-shift detector: two-sample Kolmogorov–Smirnov D
      // between the click and purchase value distributions — ECDFs
      // from the same bounded histogram posture as agg_mann_whitney,
      // D's argmax decided on EXACT cross-multiplied integers, float
      // only in the final D and asymptotic p (StatsOps.ksTest)
      graft.api.StatsOps.ksTest(Tables.events(s, d),
        "event_type", "value", "click", "purchase")
    }),
    "agg_winsorized_mean" -> ((s, d) => {
      // robust location per event type: clip values at the exact
      // interpolated p05/p95 (binnedPercentiles — state ∝ the 4 dp
      // value grid) broadcast back onto the rows, re-round the
      // clipped value to the grid, exact-decimal mean alongside the
      // plain mean (StatsOps.winsorizedMean)
      graft.api.StatsOps.winsorizedMean(Tables.events(s, d),
          "event_type", col("value"), 0.05, 0.95)
        .orderBy("event_type")
    }),
    "agg_mann_whitney" -> ((s, d) => {
      // the nonparametric twin of agg_ttest_welch: Mann–Whitney U on
      // the same click-vs-purchase arms — rank state ∝ distinct 2 dp
      // values (histogram bins, never rows), doubled tie-averaged
      // ranks keep every pre-z quantity exact integer, tie-corrected
      // normal z enters float once (StatsOps.mannWhitneyU)
      graft.api.StatsOps.mannWhitneyU(Tables.events(s, d),
        "event_type", "value", "click", "purchase")
    }),
    "agg_wilson_ci" -> ((s, d) => {
      // Wilson 95% score interval for a rare-event proportion (share
      // of events with value ≥ 150, ~5% here) per type — the interval
      // that stays sane where the naive Wald ±z√(p(1−p)/n) collapses
      // (p near 0, small k: Wald goes negative and under-covers).
      // n, k exact ints from ONE hash aggregate; the closed form is
      // float over those ints, spelled identically in the oracle
      // (z = 1.96 written as 1.96*1.96 BOTH sides — a 3.8416 literal
      // is a different double than the computed square)
      val nn = col("n").cast("double"); val kk = col("k").cast("double")
      val z = lit(1.96); val zz = z * z
      val p = kk / nn
      val denom = lit(1.0) + zz / nn
      val center = (p + zz / (lit(2.0) * nn)) / denom
      val half = z * sqrt(p * (lit(1.0) - p) / nn
        + zz / (lit(4.0) * nn * nn)) / denom
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") >= 150.0, 1L).otherwise(0L)).as("k"))
        .select(col("event_type"), col("n"), col("k"),
          Canon.rk(p, 6).as("p_hat"),
          Canon.rk(center - half, 6).as("ci_lo"),
          Canon.rk(center + half, 6).as("ci_hi"))
        .orderBy("event_type")
    }),
    "agg_anova_f" -> ((s, d) => {
      // the k-arm generalization of agg_ttest_welch: one-way ANOVA F
      // for value across ALL event types — per-group exact power sums,
      // the one cross-group float term grid-rounded to 6 dp before an
      // exact-decimal fold (StatsOps.anovaF)
      graft.api.StatsOps.anovaF(Tables.events(s, d), "event_type", "value")
    }),
    "agg_spearman_corr" -> ((s, d) => {
      // monotone association per language: does doc length track
      // vocabulary size? Spearman ρ on doubled tie-averaged ranks —
      // rank state ∝ distinct counts (histogram bins, never rows),
      // every pre-ρ sum exact DECIMAL(38,0) (StatsOps.spearmanCorr)
      val docs = Tables.documents(s, d)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_dis"))
      graft.api.StatsOps.spearmanCorr(docs, "lang", "n_tok", "n_dis", scale = 0)
        .orderBy("lang")
    }),
    "agg_mutual_info" -> ((s, d) => {
      // mutual information of the lang × source grid — the
      // information-theoretic companion to agg_cramers_v (how many
      // nats does knowing the source tell you about the language?).
      // Every entropy/MI term grid-rounds to 6 dp decimal BEFORE its
      // sum (cross-cell float sums are the one thing merge order can
      // bend), margins stay exact bigint counts, and the normalized
      // MI divides by sqrt(H_l·H_s) at the end. All frames are
      // |langs| × |sources| — never ∝ corpus.
      import org.apache.spark.sql.types.DecimalType
      val d6 = DecimalType(28, 6)
      // ct fans out into margins + MI join — pin the tiny grid once
      // (§7.2 fan-out trap: unpinned, the CORPUS aggregate re-ran per
      // consumer — Exchange*18/HashAggregate*36 → *10/*20; the
      // remaining fan-out re-derives only grid-sized frames)
      val ct = graft.api.Checkpoints.pin(
        Tables.documents(s, d).groupBy("lang", "source")
          .agg(count(lit(1)).as("o")))
      val rowT = ct.groupBy("lang").agg(sum(col("o")).as("_r"))
      val colT = ct.groupBy("source").agg(sum(col("o")).as("_c"))
      val tot = ct.agg(sum(col("o")).as("_t"))
      def ent(m: org.apache.spark.sql.DataFrame, cnt: String) = {
        val p = col(cnt).cast("double") / col("_t").cast("double")
        m.crossJoin(broadcast(tot))
          .agg(sum(Canon.rk(-p * log(p), 6).cast(d6)).cast("double").as("h"))
      }
      val hl = ent(rowT, "_r").select(col("h").as("_hl"))
      val hs = ent(colT, "_c").select(col("h").as("_hs"))
      val pij = col("o").cast("double") / col("_t").cast("double")
      val lift = col("o").cast("double") * col("_t").cast("double") /
        (col("_r").cast("double") * col("_c").cast("double"))
      val mi = ct.join(rowT, "lang").join(colT, "source")
        .crossJoin(broadcast(tot))
        .agg(sum(Canon.rk(pij * log(lift), 6).cast(d6)).cast("double").as("_mi"),
          max(col("_t")).as("n"))
      mi.crossJoin(broadcast(hl)).crossJoin(broadcast(hs))
        .select(col("n"), Canon.r4(col("_hl")).as("h_lang"),
          Canon.r4(col("_hs")).as("h_source"), Canon.r4(col("_mi")).as("mi"),
          when(col("_hl") * col("_hs") > 0.0,
            Canon.r4(col("_mi") / sqrt(col("_hl") * col("_hs")))).as("nmi"))
    }),
    "agg_gini" -> ((s, d) => {
      // revenue concentration per return flag: the Gini coefficient by
      // the sorted-rank identity over exact decimal sums — tie ranks
      // cancel in Σ i·x, so the one rank window cannot make the hash
      // partitioning-dependent (StatsOps.giniByGroup)
      graft.api.StatsOps.giniByGroup(Tables.lineitem(s, d),
          "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag")
    }),
    "agg_percentile_weighted" -> ((s, d) => {
      // quantity-weighted price quartiles per return flag: "the price
      // below which 25/50/75% of the shipped QUANTITY sits" —
      // lower-quantile semantics over exact decimal cumulative
      // weights, integer-scaled cut compare, selected values are
      // actual input prices (StatsOps.weightedPercentilesBinned)
      graft.api.StatsOps.weightedPercentilesBinned(Tables.lineitem(s, d),
          "l_returnflag", "l_extendedprice", "l_quantity",
          Seq("wp25" -> 0.25, "wp50" -> 0.5, "wp75" -> 0.75))
        .orderBy("l_returnflag")
    }),
    "agg_percentile_approx" -> ((s, d) => {
      // ✘ no oracle (sketch): GK-summary approximate percentile ladder
      // (approx_percentile, accuracy 10000 → rank error ≤ 1e-4·n) —
      // the scale companion to the exact binned form for value domains
      // with NO finite rounding grid (latencies, micro-priced amounts
      // at 100 TB), where a per-value histogram could itself grow
      // unboundedly. Sketch state is O(1/ε·log(ε·n)) per group however
      // many rows stream through; merge is associative, so the partial
      // aggregate combines map-side like any sum. Unit-tested against
      // the exact percentiles within the sketch's rank-error bound
      // (NoOracleSpec).
      //
      // Determinism pin (r10 ADVICE): GK merge is ORDER-SENSITIVE and
      // the final aggregate's merge order follows shuffle fetch order,
      // which Spark does not guarantee — every other declared key is
      // structurally deterministic, so this one must be too (§7.3).
      // Repartition by the group key + a total within-partition sort
      // puts each group in exactly one partition with a pinned row
      // order; the groupBy's required distribution is then already
      // satisfied, so NO exchange separates partial from final and the
      // sketch is built single-pass in sorted order — byte-identical
      // across runs by construction. Cost: one sorted shuffle of the
      // rows, the standard price of a deterministic sketch; state per
      // group is unchanged (still the O(1/ε·log(ε·n)) summary).
      Tables.events(s, d)
        .repartition(col("event_type"))
        .sortWithinPartitions("event_type", "event_id")
        .groupBy("event_type")
        .agg(percentile_approx(col("value"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
        .select(col("event_type"), col("qs").getItem(0).as("p50"),
          col("qs").getItem(1).as("p90"), col("qs").getItem(2).as("p99"))
        .orderBy("event_type")
    }),
    "agg_mode" -> ((s, d) => {
      // modal order status per priority (ties → smallest status):
      // one (priority, status) hash aggregate, then row_number<=1 —
      // exactly the shape GraftExtensions rewrites to the bounded-heap
      // TopKPerGroup operator, so no per-group sort at any scale
      val counts = Tables.orders(s, d)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n_mode"))
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("n_mode").desc, col("o_orderstatus").asc)
      counts.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 1)
        .select(col("o_orderpriority"), col("o_orderstatus").as("mode_status"),
          col("n_mode"))
        .orderBy("o_orderpriority")
    }),
    "agg_histogram_fixed" -> ((s, d) => {
      // fixed-width value histogram per event type (50-unit bins) —
      // the reporting staple; one hash aggregate, shuffle ∝ bins, the
      // same bounded-state posture as the binned percentile family
      Tables.events(s, d)
        .groupBy(col("event_type"),
          floor(col("value") / 50.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bin")
    }),
    "agg_null_groups" -> ((s, d) => {
      // NULL-at-rest hardening: the fixtures carry no NULLs (SURVEY
      // §1.2), so until now every aggregate's null path was pinned
      // only by unit tests. Manufacture them DETERMINISTICALLY from
      // the real events table — a NULL GROUP KEY (view → NULL etype),
      // an ALL-NULL value group (signup), and sparse nulls inside
      // every other group (value < 20 → NULL) — then route the frame
      // through the count/stats/extrema families AND the binned exact
      // percentile operator (the r10 all-NULL-group fix, now pinned by
      // the driver gate, not just BinnedPercentileSpec), stitched with
      // a NULL-SAFE equi-join so the NULL key row survives the stitch.
      // A hash match proves Spark and DuckDB agree on all four null
      // semantics: null keys group together, aggregates skip nulls,
      // all-null groups yield NULL (not NaN/0), and <=> joins NULL=NULL.
      //
      // Presentation: the FINAL projection coalesces NULL cells to
      // sentinels ('(null)' / -1.0, both outside the data's domain).
      // No green key has ever shipped NULL output cells, so the
      // driver's hash treatment of them is unpinned — and the sentinel
      // is the sharper probe anyway: coalesce replaces only genuine
      // NULLs, so if an all-null group ever yielded NaN instead (the
      // divergence this key exists to catch), the NaN would survive to
      // the output and hash-mismatch the oracle's sentinel.
      val ev = Tables.events(s, d).select(
        when(col("event_type") === "view", lit(null))
          .otherwise(col("event_type")).as("etype"),
        when(col("event_type") === "signup", lit(null))
          .when(col("value") < 20, lit(null))
          .otherwise(col("value")).as("v"))
      val stats = ev.groupBy("etype").agg(
        count(lit(1)).as("n"),
        count(col("v")).as("n_vals"),
        Canon.r4(avg(col("v"))).as("avg_v"),
        Canon.r4(stddev_samp(col("v"))).as("sd_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      val pcts = graft.api.StatsOps.binnedPercentiles(ev, "etype", col("v"),
          Seq("p50" -> 0.5, "p90" -> 0.9))
        .select(col("etype").as("petype"),
          Canon.r4(col("p50")).as("p50"), Canon.r4(col("p90")).as("p90"))
      stats.join(pcts, col("etype") <=> col("petype"))
        .select(coalesce(col("etype"), lit("(null)")).as("etype"),
          col("n"), col("n_vals"),
          coalesce(col("avg_v"), lit(-1.0)).as("avg_v"),
          coalesce(col("sd_v"), lit(-1.0)).as("sd_v"),
          coalesce(col("min_v"), lit(-1.0)).as("min_v"),
          coalesce(col("max_v"), lit(-1.0)).as("max_v"),
          coalesce(col("p50"), lit(-1.0)).as("p50"),
          coalesce(col("p90"), lit(-1.0)).as("p90"))
        .orderBy("etype")
    }),
    "agg_outlier_iqr" -> ((s, d) => {
      // Tukey-fence outliers per event type: exact per-group
      // percentiles broadcast back as fences, rowwise verdict — robust
      // to skew (events.value has a heavy tail, unlike order totals)
      graft.api.StatsOps.iqrOutliers(Tables.events(s, d),
          "event_type", "event_id", "value")
        .orderBy("event_type", "event_id")
    }),
    "agg_entropy_by_group" -> ((s, d) => {
      // per-user Shannon entropy of the event-type mix — the
      // diversity profile behind bot/spam triage: one (user, type)
      // hash aggregate, then the normalizer and entropy fold over
      // that pair table (StatsOps.entropyByGroup)
      graft.api.StatsOps.entropyByGroup(Tables.events(s, d),
          "user_id", "event_type")
        .orderBy("user_id")
    }),
    "agg_frequent_pairs" -> ((s, d) => {
      // market-basket mining: part pairs co-purchased in >= 2 orders.
      // The Apriori prefilter — a pair can only be frequent if BOTH
      // members are — prunes basket rows BEFORE the quadratic
      // within-order pair self-join, the step that keeps basket
      // mining feasible at catalog scale (the join cost is
      // sum-over-orders of |frequent items in the order|^2, never the
      // raw basket square); the oracle mines WITHOUT the prefilter,
      // so the hash match also proves the pruning loses nothing
      // ONE pinned frame (r22; was two — the basket distinct was pinned
      // separately so the freq aggregate and the join input shared it,
      // each paying a checkpoint job): inside a SINGLE plan the two
      // `b` subtrees canonicalize identically, so Spark's
      // ReusedExchange computes the basket distinct once anyway — the
      // b-pin bought nothing but its own materialization job. (A
      // per-pk window variant — one exchange fewer here — was benched
      // and rejected: it forces a corpus-wide sort by pk where this
      // shape keeps the frequency cut a broadcastable aggregate.)
      val b = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val freq = b.groupBy("pk").agg(count(lit(1)).as("_c"))
        .filter(col("_c") >= 2).select("pk")
      // pinned: fb feeds BOTH sides of the pair self-join — unpinned,
      // each side re-runs the basket distinct and the frequency join
      val fb = graft.api.Checkpoints.pin(b.join(freq, "pk"))
      fb.select(col("ok"), col("pk").as("p1"))
        .join(fb.select(col("ok").as("ok2"), col("pk").as("p2")),
          col("ok") === col("ok2") && col("p1") < col("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 2)
        .orderBy("p1", "p2")
    }),
    "agg_skewness_kurtosis" -> ((s, d) => {
      // distribution-shape profile per return flag: skewness + excess
      // kurtosis from exact decimal power sums (StatsOps.momentsByGroup
      // — the scaladoc has the lossless decimal staging and the
      // engine-portable float-expression argument)
      graft.api.StatsOps.momentsByGroup(Tables.lineitem(s, d),
          "l_returnflag", "l_quantity")
        .orderBy("l_returnflag")
    }),
    "agg_corr_matrix" -> ((s, d) => {
      // pairwise Pearson correlations over the lineitem measures from
      // EXACT decimal power sums (StatsOps.corrMatrixExact): one
      // full-scan aggregate whose state is a handful of decimal sums,
      // merge-order-independent where the built-in corr's co-moment
      // buffers are not — the column-relationship report of a
      // profiling pass, at any scale, in one pass
      graft.api.StatsOps.corrMatrixExact(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
    }),
    "agg_heavy_hitters" -> ((s, d) => {
      // EXACT frequent tokens (count·30 > N) via per-partition
      // Misra–Gries candidates + exact recount of candidates only
      // (StatsOps.heavyHittersExact) — state and shuffle ∝ candidates,
      // never ∝ vocabulary, the shape that answers "which tokens are
      // frequent" over 100 TB of text without shuffling billions of
      // singleton tokens. Result is partitioning-independent (the
      // candidate set is a proven superset; the recount is exact), so
      // it hash-matches DuckDB's naive GROUP BY twin.
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
      graft.api.StatsOps.heavyHittersExact(toks, "token", phi = 30)
        .orderBy(col("n").desc, col("token").asc)
    }),
    "agg_incremental_merge" -> ((s, d) => {
      // incremental aggregate maintenance — the materialized-view
      // pattern every 100 TB warehouse runs nightly: per-(day, type)
      // ALGEBRAIC partials (count / decimal sum / min / max) for the
      // historical window are written ONCE as a day-partitioned
      // parquet table (a new day appends one directory, history is
      // never rescanned); the fresh delta (last week) aggregates on
      // its own, and the final answer folds partials + delta with the
      // merge functions (sum-of-counts, sum-of-sums, min-of-mins,
      // max-of-maxes). The oracle recomputes from RAW events, so the
      // hash match proves merged-partial ≡ full recompute — exactly
      // (sums ride DECIMAL, so partial order cannot drift the bits).
      val ev = Tables.events(s, d).select(col("ts"), col("event_type"),
        col("value").cast("decimal(28,2)").as("v"))
      def partials(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_dec"),
            min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      val cutoff = "2024-01-24"
      val dir = graft.sources.Writers.roundTripDir("graft_agg_partials", d)
      graft.sources.Writers.writePartitioned(
        partials(ev.filter(col("ts") < cutoff)), "day", dir)
      s.read.parquet(dir)
        .select("day", "event_type", "n", "sum_dec", "min_v", "max_v")
        .unionByName(partials(ev.filter(col("ts") >= cutoff)))
        .groupBy("event_type")
        .agg(sum(col("n")).as("n"),
          sum(col("sum_dec")).cast("double").as("sum_val"),
          Canon.r4(sum(col("sum_dec")).cast("double") / sum(col("n"))).as("avg_val"),
          min(col("min_v")).cast("double").as("min_val"),
          max(col("max_v")).cast("double").as("max_val"))
        .orderBy("event_type")
    }),
    "agg_percentile_incremental" -> ((s, d) => {
      // EXACT percentiles, incrementally maintained — the quantile
      // analogue of agg_incremental_merge: the per-(day,type) VALUE
      // HISTOGRAM (value → count) is the persisted partial, because
      // histograms are algebraic (sum-of-counts merges them
      // losslessly) where raw quantiles are not. Historical days are
      // written ONCE as a day-partitioned bin table; the delta builds
      // its own bins; the merged table sums counts and rides the
      // IDENTICAL interpolation math as the single-pass binned
      // percentile (StatsOps.percentilesFromBins). The oracle computes
      // quantile_cont over RAW events — hash match proves
      // merged-histogram percentiles ≡ full recompute, exactly, which
      // no approximate quantile sketch can claim.
      val ev = Tables.events(s, d).select(col("ts"), col("event_type"),
        col("value").cast("double").as("_v"))
      def hist(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(to_date(col("ts")).as("day"), col("event_type"), col("_v"))
          .agg(count(lit(1)).as("_c"))
      val cutoff = "2024-01-24"
      val dir = graft.sources.Writers.roundTripDir("graft_pct_partials", d)
      graft.sources.Writers.writePartitioned(
        hist(ev.filter(col("ts") < cutoff)), "day", dir)
      val merged = s.read.parquet(dir)
        .select("event_type", "_v", "_c")
        .unionByName(hist(ev.filter(col("ts") >= cutoff))
          .select("event_type", "_v", "_c"))
        .groupBy("event_type", "_v").agg(sum(col("_c")).as("_c"))
      graft.api.StatsOps.percentilesFromBins(merged, "event_type",
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        .select(col("event_type"), Canon.r4(col("p50")).as("p50"),
          Canon.r4(col("p90")).as("p90"), Canon.r4(col("p99")).as("p99"))
        .orderBy("event_type")
    }),
    "agg_distinct_sketch_rollup" -> ((s, d) => {
      // mergeable distinct-count summaries (Apache DataSketches HLL,
      // Spark's hll_sketch_agg/hll_union_agg): one compact sketch per
      // (day, type) cell, rolled up to per-type month totals by
      // SKETCH UNION — the pre-aggregation pattern that makes "30-day
      // distinct users" a merge of 30 tiny states instead of a
      // re-scan of 100 TB of raw events. countDistinct cannot
      // pre-aggregate (distinct is not algebraic); sketches can. ✘
      // no-oracle (estimates have no DuckDB twin); NoOracleSpec pins
      // the lossless-merge property (union-of-dailies ≡ one direct
      // sketch, exactly — HLL registers are order-insensitive maxima)
      // and the ±5% envelope vs exact.
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
        .orderBy("event_type")
    }),
    "agg_hhi_concentration" -> ((s, d) => {
      // market-concentration report: Herfindahl–Hirschman index of
      // supplier revenue share per return flag. Per-supplier revenue
      // is ONE map-side-combined corpus aggregate (exact 2 dp decimal
      // sums); everything after runs on the |flags|×|suppliers| frame.
      // Each share² term grid-rounds to 9 dp decimal BEFORE the
      // cross-supplier sum (float merge order is the only
      // nondeterminism risk), HHI lands in conventional 0..10000
      // points. rev fans out into the flag total AND the share join —
      // pinned so the corpus aggregate runs once (§7.2 fan-out trap).
      import org.apache.spark.sql.types.DecimalType
      val rev = graft.api.Checkpoints.pin(
        Tables.lineitem(s, d).groupBy("l_returnflag", "l_suppkey")
          .agg(sum(col("l_extendedprice").cast(DecimalType(28, 2)))
            .as("_rev")))
      val tot = rev.groupBy("l_returnflag")
        .agg(sum(col("_rev")).as("_tot"), count(lit(1)).as("n_suppliers"))
      val share = col("_rev").cast("double") / col("_tot").cast("double")
      rev.join(tot, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(max(col("n_suppliers")).as("n_suppliers"),
          (sum(Canon.rk(share * share * 10000.0, 9)
            .cast(DecimalType(28, 9))).cast("double")).as("_hhi"),
          max(Canon.rk(share * 10000.0, 4)).as("top_share_bp"))
        .select(col("l_returnflag"), col("n_suppliers"),
          Canon.r4(col("_hhi")).as("hhi"), col("top_share_bp"))
        .orderBy("l_returnflag")
    }),
    "agg_benford_test" -> ((s, d) => {
      // data-forensics screen: first-significant-digit distribution of
      // extended prices per return flag vs Benford's law. The digit
      // comes from the INTEGER cents string (cast bigint → varchar is
      // byte-identical in any engine), never from float log10 of the
      // value — so the bucketing cannot drift cross-engine. Counts are
      // exact bigints; observed shares are integer ppm (truncating
      // div); expected ppm grid-rounds the nine log10(1+1/d) constants
      // at 6 dp (≥1e-7 from every rounding boundary — safe for a
      // 1-ulp libm). chi² terms stay per-cell (no cross-cell float
      // sum). State ∝ |flags|×9 however many rows stream through.
      val cents = expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
      val ev = Tables.lineitem(s, d)
        .filter(col("l_extendedprice") > 0)
        .select(col("l_returnflag"),
          substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      val obs = graft.api.Checkpoints.pin(
        ev.groupBy("l_returnflag", "digit").agg(count(lit(1)).as("n_obs")))
      val tot = obs.groupBy("l_returnflag").agg(sum(col("n_obs")).as("_n"))
      val expPpm = floor(log10(lit(1.0) + lit(1.0) / col("digit")) *
        1000000.0 + 0.5).cast("long")
      obs.join(tot, "l_returnflag")
        .select(col("l_returnflag"), col("digit"), col("n_obs"),
          expr("n_obs * 1000000 div _n").as("obs_ppm"),
          expPpm.as("exp_ppm"))
        .withColumn("chi2_term", Canon.rk(
          (col("obs_ppm") - col("exp_ppm")) * (col("obs_ppm") - col("exp_ppm"))
            / col("exp_ppm").cast("double"), 6))
        .orderBy("l_returnflag", "digit")
    })
  )

  val oracles: Map[String, String] = Map(
    "agg_groupby_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  ${O.sumDec("l_extendedprice", 2)} AS sum_base_price,
        |  ${O.sumDec("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
        |  ${O.sumDec("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
        |  ${O.r4("avg(l_quantity)")} AS avg_qty,
        |  ${O.r4(O.sumDec("l_extendedprice", 2) + " / count(*)")} AS avg_price,
        |  ${O.r4(O.sumDec("l_discount", 2) + " / count(*)")} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_having" ->
      """SELECT o_custkey, count(*) AS n FROM orders
        |GROUP BY o_custkey HAVING count(*) >= 12 ORDER BY o_custkey""".stripMargin,
    "agg_distinct_count" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_multi_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       count(DISTINCT value) AS n_values
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "agg_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    "agg_stats" ->
      s"""SELECT ${O.r4("stddev_samp(l_quantity)")} AS sd_qty,
        |  ${O.r4("var_samp(l_quantity)")} AS var_qty,
        |  ${O.r4("corr(l_quantity, l_extendedprice)")} AS corr_qty_price,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,
    "agg_percentile" ->
      s"""SELECT o_orderstatus, ${O.r4("quantile_cont(o_totalprice, 0.5)")} AS median_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_collect_sorted" ->
      """SELECT o_orderstatus, string_agg(p, ',' ORDER BY p) AS priorities
        |FROM (SELECT DISTINCT o_orderstatus, o_orderpriority AS p FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_unpivot" ->
      s"""WITH w AS (SELECT o_orderstatus,
        |    ${O.sumDec("o_totalprice", 2)} AS sum_price,
        |    CAST(count(*) AS DOUBLE) AS n_orders,
        |    ${O.r4(O.sumDec("o_totalprice", 2) + " / count(*)")} AS avg_price
        |  FROM orders GROUP BY 1)
        |SELECT o_orderstatus, metric, value FROM (
        |  SELECT o_orderstatus, 'sum_price' AS metric, sum_price AS value FROM w
        |  UNION ALL SELECT o_orderstatus, 'n_orders', n_orders FROM w
        |  UNION ALL SELECT o_orderstatus, 'avg_price', avg_price FROM w)
        |ORDER BY o_orderstatus, metric""".stripMargin,
    "agg_share_of_total" ->
      s"""WITH per AS (SELECT o_orderpriority,
        |    ${O.sumDec("o_totalprice", 2)} AS rev FROM orders GROUP BY 1),
        |tot AS (SELECT ${O.sumDec("o_totalprice", 2)} AS t FROM orders)
        |SELECT o_orderpriority, rev, ${O.r4("rev / t")} AS share
        |FROM per, tot ORDER BY o_orderpriority""".stripMargin,
    // per-cell floats over exact integer margins — no cross-cell
    // float sum exists to drift
    "agg_cramers_v" ->
      s"""WITH ct AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM ct GROUP BY 1),
        |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS cl FROM ct GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS tt FROM ct),
        |nr AS (SELECT count(*) AS nlang FROM r),
        |nc AS (SELECT count(*) AS nsrc FROM c),
        |j AS (SELECT CAST(COALESCE(ct.o, 0) AS DOUBLE) AS o,
        |        CAST(r.rt * c.cl AS DOUBLE) / CAST(t.tt AS DOUBLE) AS e
        |      FROM r CROSS JOIN c
        |      LEFT JOIN ct ON r.lang = ct.lang AND c.source = ct.source
        |      CROSS JOIN t),
        |chi AS (SELECT CAST(sum(CAST(${O.rk("(o - e) * (o - e) / e", 6)} AS DECIMAL(28,6)))
        |          AS DOUBLE) AS chi2 FROM j)
        |SELECT t.tt AS n, nlang AS n_lang, nsrc AS n_src,
        |  ${O.r4("chi.chi2")} AS chi2,
        |  ${O.r4("sqrt(chi.chi2 / CAST(t.tt * least(nlang - 1, nsrc - 1) AS DOUBLE))")} AS cramers_v
        |FROM chi CROSS JOIN t CROSS JOIN nr CROSS JOIN nc""".stripMargin,
    "agg_chi2_contrib" ->
      s"""WITH ct AS (SELECT event_type,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod,
        |    count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, sum(o) AS rt FROM ct GROUP BY 1),
        |c AS (SELECT hod, sum(o) AS cl FROM ct GROUP BY 1),
        |t AS (SELECT sum(o) AS tt FROM ct),
        |j AS (SELECT ct.event_type, ct.hod, ct.o,
        |    CAST(r.rt * c.cl AS DOUBLE) / CAST(t.tt AS DOUBLE) AS e
        |  FROM ct JOIN r USING (event_type) JOIN c USING (hod) CROSS JOIN t)
        |SELECT event_type, hod, o,
        |  ${O.r4("e")} AS e,
        |  ${O.r4("(CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e")} AS contrib
        |FROM j ORDER BY event_type, hod""".stripMargin,
    // identical md5 weight stream, exact decimal replica sums, and
    // quantile_cont over the same 4 dp-gridded replica means
    "agg_bootstrap_ci" -> {
      val hex4 = "((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096" +
        " + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256" +
        " + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16" +
        " + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1))"
      s"""WITH li AS (SELECT CAST(l_orderkey AS VARCHAR) || '-' ||
        |      CAST(l_linenumber AS VARCHAR) AS id,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS x FROM lineitem),
        |rep AS (SELECT id, x, b FROM li,
        |        UNNEST(generate_series(0, 49)) AS t(b)),
        |hh AS (SELECT x, b, $hex4 AS hv
        |       FROM (SELECT x, b, md5(id || ':' || CAST(b AS VARCHAR)) AS h
        |             FROM rep)),
        |ww AS (SELECT x, b,
        |         CASE WHEN hv < 24109 THEN 0 WHEN hv < 48219 THEN 1
        |         WHEN hv < 60273 THEN 2 WHEN hv < 64292 THEN 3
        |         WHEN hv < 65296 THEN 4 WHEN hv < 65497 THEN 5
        |         ELSE 6 END AS w
        |       FROM hh),
        |m AS (SELECT b, CAST(sum(w) AS BIGINT) AS n,
        |        sum(CAST(w AS DECIMAL(2,0)) * x) AS s
        |      FROM ww GROUP BY 1),
        |mm AS (SELECT ${O.r4("CAST(s AS DOUBLE) / CAST(n AS DOUBLE)")} AS m FROM m),
        |ci AS (SELECT quantile_cont(m, 0.025) AS lo,
        |              quantile_cont(m, 0.975) AS hi FROM mm),
        |base AS (SELECT count(*) AS n,
        |    ${O.r4("CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS mean
        |  FROM li)
        |SELECT n, mean, ${O.r4("lo")} AS ci_lo, ${O.r4("hi")} AS ci_hi
        |FROM base CROSS JOIN ci""".stripMargin
    },
    // D's argmax on exact cross-multiplied integers (HUGEINT ↔
    // DECIMAL(38,0)); float only in the final D and p
    "agg_ks_test" ->
      s"""WITH b AS (SELECT CAST(value AS DECIMAL(18,2)) AS v,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS na,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS nb
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |c AS (SELECT
        |    CAST(sum(na) OVER wc AS BIGINT) AS ca,
        |    CAST(sum(nb) OVER wc AS BIGINT) AS cb
        |  FROM b WINDOW wc AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |             CAST(sum(nb) AS BIGINT) AS n2 FROM b),
        |m AS (SELECT
        |    CAST(max(abs(CAST(ca AS HUGEINT) * n2 - CAST(cb AS HUGEINT) * n1))
        |      AS DOUBLE) AS num,
        |    max(n1) AS n1, max(n2) AS n2 FROM c CROSS JOIN t),
        |f AS (SELECT n1, n2, CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |    num / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS dd FROM m)
        |SELECT 'click' AS group_a, 'purchase' AS group_b,
        |  n1 AS n_a, n2 AS n_b,
        |  CASE WHEN n1 > 0 AND n2 > 0 THEN ${O.r4("dd")} END AS d,
        |  CASE WHEN n1 > 0 AND n2 > 0 THEN
        |    ${O.r4("2.0 * exp(-2.0 * dd * dd * n1d * n2d / (n1d + n2d))")}
        |  END AS p_approx
        |FROM f""".stripMargin,
    // quantile_cont cuts (bitwise-parity with binnedPercentiles),
    // clipped values re-gridded then summed in exact decimal
    "agg_winsorized_mean" ->
      s"""WITH v AS (SELECT event_type AS g,
        |        floor(value*10000 + 0.5)/10000 AS v
        |      FROM events WHERE value IS NOT NULL),
        |c AS (SELECT g, quantile_cont(v, 0.05) AS lo,
        |             quantile_cont(v, 0.95) AS hi FROM v GROUP BY 1),
        |w AS (SELECT v.g, v.v,
        |        floor(least(greatest(v.v, lo), hi)*10000 + 0.5)/10000 AS wv
        |      FROM v JOIN c USING (g))
        |SELECT g AS event_type, count(*) AS n,
        |  ${O.r4("CAST(sum(CAST(v AS DECIMAL(28,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS mean,
        |  ${O.r4("CAST(sum(CAST(wv AS DECIMAL(28,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS winsor_mean
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-group S²/n terms 6 dp-gridded before the cross-group sum
    // (mirrors StatsOps.anovaF's decimal fold); power sums exact
    // mirrors the Spark Wilson spelling op-for-op (z² as 1.96*1.96)
    "agg_wilson_ci" -> {
      val nn = "CAST(n AS DOUBLE)"; val kk = "CAST(k AS DOUBLE)"
      val zz = "1.96*1.96"
      val p = s"$kk / $nn"
      val denom = s"1.0 + $zz / $nn"
      val center = s"(($p) + $zz / (2.0 * $nn)) / ($denom)"
      val half = s"1.96 * sqrt(($p) * (1.0 - ($p)) / $nn" +
        s" + $zz / (4.0 * $nn * $nn)) / ($denom)"
      s"""WITH a AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(CASE WHEN value >= 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM events GROUP BY 1)
        |SELECT event_type, n, k,
        |  ${O.rk(p, 6)} AS p_hat,
        |  ${O.rk(s"($center) - ($half)", 6)} AS ci_lo,
        |  ${O.rk(s"($center) + ($half)", 6)} AS ci_hi
        |FROM a ORDER BY event_type""".stripMargin
    },
    "agg_anova_f" ->
      s"""WITH per AS (SELECT event_type AS g, count(*) AS ng,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sg,
        |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS qg
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1),
        |a AS (SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS DOUBLE) AS s, CAST(sum(qg) AS DOUBLE) AS q,
        |    CAST(sum(CAST(${O.rk("CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS b
        |  FROM per),
        |f AS (SELECT k, n, b - s * s / CAST(n AS DOUBLE) AS ssb,
        |    q - b AS ssw FROM a)
        |SELECT k AS n_groups, n, CAST(k - 1 AS BIGINT) AS df1,
        |  CAST(n - k AS BIGINT) AS df2,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0
        |    THEN ${O.r4("(ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE))")}
        |  END AS f
        |FROM f""".stripMargin,
    // doubled tie-averaged ranks (the mann_whitney trick) per axis,
    // HUGEINT power sums mirror DECIMAL(38,0), float enters at rho
    "agg_spearman_corr" ->
      s"""WITH base AS (SELECT lang AS g,
        |    CAST(len(string_split(text, ' ')) AS DECIMAL(18,0)) AS x,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DECIMAL(18,0)) AS y
        |  FROM documents),
        |bx AS (SELECT g, x, count(*) AS c FROM base GROUP BY 1, 2),
        |rx AS (SELECT g, x, 2 * COALESCE(sum(c) OVER (PARTITION BY g ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r
        |  FROM bx),
        |by2 AS (SELECT g, y, count(*) AS c FROM base GROUP BY 1, 2),
        |ry AS (SELECT g, y, 2 * COALESCE(sum(c) OVER (PARTITION BY g ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r
        |  FROM by2),
        |j AS (SELECT b.g, rx.r AS rx, ry.r AS ry
        |  FROM base b JOIN rx ON b.g = rx.g AND b.x = rx.x
        |  JOIN ry ON b.g = ry.g AND b.y = ry.y),
        |a AS (SELECT g, count(*) AS n,
        |    CAST(sum(CAST(rx AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(ry AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS DOUBLE) AS qx,
        |    CAST(sum(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS DOUBLE) AS qy,
        |    CAST(sum(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS DOUBLE) AS sxy
        |  FROM j GROUP BY 1),
        |f AS (SELECT g, n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * qx - sx * sx AS denx,
        |    CAST(n AS DOUBLE) * qy - sy * sy AS deny
        |  FROM a)
        |SELECT g AS lang, n,
        |  CASE WHEN denx > 0 AND deny > 0
        |    THEN ${O.r4("num / (sqrt(denx) * sqrt(deny))")}
        |  END AS rho
        |FROM f ORDER BY lang""".stripMargin,
    "agg_mann_whitney" ->
      s"""WITH b AS (SELECT CAST(value AS DECIMAL(18,2)) AS v,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS na,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS nb
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |r AS (SELECT na, nb,
        |    CAST(COALESCE(sum(na + nb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum
        |  FROM b),
        |a AS (SELECT CAST(sum(na) AS BIGINT) AS n1, CAST(sum(nb) AS BIGINT) AS n2,
        |    CAST(sum(CAST(na AS HUGEINT) * (2 * cum + na + nb + 1)) AS DOUBLE) AS r1x2,
        |    CAST(sum(CAST(na + nb AS HUGEINT) * (na + nb) * (na + nb) - (na + nb))
        |      AS DOUBLE) AS ties
        |  FROM r),
        |z AS (SELECT n1, n2, r1x2, ties,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |    CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nn
        |  FROM a),
        |s AS (SELECT n1, n2, n1d, n2d,
        |    (r1x2 - n1d * (n1d + 1.0)) / 2.0 AS ua,
        |    n1d * n2d / 12.0 * ((nn + 1.0) - ties / (nn * (nn - 1.0))) AS sigma2
        |  FROM z)
        |SELECT 'click' AS group_a, 'purchase' AS group_b,
        |  n1 AS n_a, n2 AS n_b, ua AS u_a,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND sigma2 > 0 THEN
        |    ${O.r4("(ua - n1d * n2d / 2.0) / sqrt(sigma2)")} END AS z
        |FROM s""".stripMargin,
    // per-term 6 dp grid rounding before every cross-cell sum — the
    // same posture as agg_cramers_v; MI/entropy floats per cell only
    "agg_mutual_info" ->
      s"""WITH ct AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM ct GROUP BY 1),
        |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS cl FROM ct GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS tt FROM ct),
        |hl AS (SELECT CAST(sum(CAST(${O.rk("(-(CAST(rt AS DOUBLE) / CAST(tt AS DOUBLE))) * ln(CAST(rt AS DOUBLE) / CAST(tt AS DOUBLE))", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS h_l
        |  FROM r CROSS JOIN t),
        |hs AS (SELECT CAST(sum(CAST(${O.rk("(-(CAST(cl AS DOUBLE) / CAST(tt AS DOUBLE))) * ln(CAST(cl AS DOUBLE) / CAST(tt AS DOUBLE))", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS h_s
        |  FROM c CROSS JOIN t),
        |mi AS (SELECT CAST(sum(CAST(${O.rk("(CAST(o AS DOUBLE) / CAST(tt AS DOUBLE)) * ln(CAST(o AS DOUBLE) * CAST(tt AS DOUBLE) / (CAST(rt AS DOUBLE) * CAST(cl AS DOUBLE)))", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS m,
        |    max(tt) AS n
        |  FROM ct JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t)
        |SELECT n, ${O.r4("h_l")} AS h_lang, ${O.r4("h_s")} AS h_source,
        |  ${O.r4("m")} AS mi,
        |  CASE WHEN h_l * h_s > 0 THEN ${O.r4("m / sqrt(h_l * h_s)")} END AS nmi
        |FROM mi CROSS JOIN hl CROSS JOIN hs""".stripMargin,
    // identical float expression over identical exact decimal sums —
    // means/variances/se²/df all derived inside the CTE chain
    "agg_ttest_welch" -> {
      val dv = "CAST(value AS DECIMAL(18,2))"
      s"""WITH s AS (SELECT
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS na,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN $dv END) AS DOUBLE) AS sa,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN $dv * $dv END) AS DOUBLE) AS ssa,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS nb,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN $dv END) AS DOUBLE) AS sb,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN $dv * $dv END) AS DOUBLE) AS ssb
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |m AS (SELECT na, nb,
        |    sa / CAST(na AS DOUBLE) AS ma, sb / CAST(nb AS DOUBLE) AS mb,
        |    (CAST(na AS DOUBLE) * ssa - sa * sa)
        |      / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)) AS va,
        |    (CAST(nb AS DOUBLE) * ssb - sb * sb)
        |      / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)) AS vb
        |  FROM s),
        |e AS (SELECT na, nb, ma, mb, va, vb,
        |    va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE) AS se2
        |  FROM m)
        |SELECT 'click' AS group_a, 'purchase' AS group_b,
        |  na AS n_a, nb AS n_b,
        |  CASE WHEN na >= 2 AND nb >= 2 AND se2 > 0 THEN
        |    ${O.r4("(ma - mb) / sqrt(se2)")} END AS t,
        |  CASE WHEN na >= 2 AND nb >= 2 AND se2 > 0 THEN
        |    ${O.r4("(se2 * se2) / ((va / CAST(na AS DOUBLE)) * (va / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) + (vb / CAST(nb AS DOUBLE)) * (vb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0))")}
        |  END AS df
        |FROM e""".stripMargin
    },
    // identical sorted-rank identity over identical exact decimal sums;
    // tie ranks cancel so row_number order cannot drift the hash
    "agg_gini" ->
      s"""WITH r AS (SELECT l_returnflag, l_extendedprice AS v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS i
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |s AS (SELECT l_returnflag,
        |    count(*) AS n,
        |    CAST(sum(CAST(v AS DECIMAL(28,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(i AS DECIMAL(28,0)) * CAST(v AS DECIMAL(28,2))) AS DOUBLE) AS six
        |  FROM r GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CASE WHEN sx <> 0 THEN
        |    ${O.r4("2.0 * six / (CAST(n AS DOUBLE) * sx) - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)")}
        |  END AS gini
        |FROM s ORDER BY l_returnflag""".stripMargin,
    // the identical integer-scaled decimal cut compare as the Spark
    // side — no float enters the selection at all
    "agg_percentile_weighted" ->
      """WITH h AS (SELECT l_returnflag, l_extendedprice AS v,
        |    SUM(CAST(l_quantity AS DECIMAL(28,0))) AS w
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |  GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, v, w,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM h)
        |SELECT l_returnflag,
        |  MIN(CASE WHEN cum * 10000 >= tot * 2500 THEN v END) AS wp25,
        |  MIN(CASE WHEN cum * 10000 >= tot * 5000 THEN v END) AS wp50,
        |  MIN(CASE WHEN cum * 10000 >= tot * 7500 THEN v END) AS wp75
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_percentiles_multi" ->
      s"""SELECT event_type,
        |  ${O.r4("quantile_cont(value, 0.5)")} AS p50,
        |  ${O.r4("quantile_cont(value, 0.9)")} AS p90,
        |  ${O.r4("quantile_cont(value, 0.99)")} AS p99,
        |  max(value) AS pmax
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_mode" ->
      """WITH c AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n_mode
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderpriority, o_orderstatus, n_mode,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY n_mode DESC, o_orderstatus) AS rn FROM c)
        |SELECT o_orderpriority, o_orderstatus AS mode_status, n_mode
        |FROM r WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin,
    "agg_histogram_fixed" ->
      """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bin,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,
    "agg_null_groups" ->
      s"""WITH ev AS (SELECT
        |    CASE WHEN event_type = 'view' THEN NULL ELSE event_type END AS etype,
        |    CASE WHEN event_type = 'signup' THEN NULL
        |         WHEN value < 20 THEN NULL ELSE value END AS v
        |  FROM events),
        |s AS (SELECT etype, count(*) AS n, count(v) AS n_vals,
        |    ${O.r4("avg(v)")} AS avg_v, ${O.r4("stddev_samp(v)")} AS sd_v,
        |    min(v) AS min_v, max(v) AS max_v
        |  FROM ev GROUP BY etype),
        |p AS (SELECT etype, ${O.r4("quantile_cont(v, 0.5)")} AS p50,
        |    ${O.r4("quantile_cont(v, 0.9)")} AS p90
        |  FROM ev GROUP BY etype)
        |SELECT coalesce(s.etype, '(null)') AS etype, n, n_vals,
        |  coalesce(avg_v, -1.0) AS avg_v, coalesce(sd_v, -1.0) AS sd_v,
        |  coalesce(min_v, -1.0) AS min_v, coalesce(max_v, -1.0) AS max_v,
        |  coalesce(p50, -1.0) AS p50, coalesce(p90, -1.0) AS p90
        |FROM s JOIN p ON s.etype IS NOT DISTINCT FROM p.etype
        |ORDER BY 1""".stripMargin,
    "agg_outlier_iqr" ->
      s"""WITH c AS (SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY 1),
        |b AS (SELECT event_type,
        |    ${O.r4("q1 - 1.5 * (q3 - q1)")} AS lo,
        |    ${O.r4("q3 + 1.5 * (q3 - q1)")} AS hi FROM c)
        |SELECT event_type, event_id, value
        |FROM events JOIN b USING (event_type)
        |WHERE value < lo OR value > hi
        |ORDER BY event_type, event_id""".stripMargin,
    "agg_entropy_by_group" ->
      s"""WITH c AS (SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.user_id, CAST(t.tot AS BIGINT) AS n_events,
        |  ${O.r4("-sum((n / CAST(tot AS DOUBLE)) * ln(n / CAST(tot AS DOUBLE)))")} AS entropy
        |FROM c JOIN t USING (user_id) GROUP BY c.user_id, t.tot
        |ORDER BY user_id""".stripMargin,
    // same closed form over the same exact decimal sums — matching it
    // proves the one-pass power-sum path is merge-order-independent
    "agg_frequent_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT a.pk AS p1, c.pk AS p2, count(*) AS sup
        |FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY p1, p2""".stripMargin,
    "agg_skewness_kurtosis" ->
      s"""WITH q AS (SELECT l_returnflag, CAST(l_quantity AS DECIMAL(9,2)) AS x,
        |    CAST(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))
        |         AS DECIMAL(12,4)) AS x2
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND abs(l_quantity) <= 9999.99),
        |a AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(x2 * x) AS DOUBLE) AS s3, CAST(sum(x2 * x2) AS DOUBLE) AS s4
        |  FROM q GROUP BY 1),
        |b AS (SELECT l_returnflag, n, s1, s2, s3, s4, (s1 / n) AS m FROM a),
        |c AS (SELECT l_returnflag, n, m,
        |    ((s2 / n) - (m * m)) AS m2,
        |    (((s3 / n) - (((3.0 * m) * s2) / n)) + (((2.0 * m) * m) * m)) AS m3,
        |    ((((s4 / n) - (((4.0 * m) * s3) / n)) + ((((6.0 * m) * m) * s2) / n))
        |      - ((((3.0 * m) * m) * m) * m)) AS m4
        |  FROM b)
        |SELECT l_returnflag, n, ${O.r4("m")} AS mean,
        |  ${O.r4("CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END")} AS skewness,
        |  ${O.r4("CASE WHEN m2 > 0 THEN (m4 / (m2 * m2)) - 3.0 END")} AS kurtosis_excess
        |FROM c ORDER BY l_returnflag""".stripMargin,
    "agg_corr_matrix" ->
      s"""WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_q,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s_e,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s_d,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_qq,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s_ee,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s_dd,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s_qe,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s_qd,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s_ed
        |  FROM lineitem)
        |SELECT col1, col2, corr FROM (
        |  SELECT 'l_quantity' AS col1, 'l_extendedprice' AS col2,
        |    ${O.r4("(n*s_qe - s_q*s_e) / (sqrt(n*s_qq - s_q*s_q) * sqrt(n*s_ee - s_e*s_e))")} AS corr FROM s
        |  UNION ALL SELECT 'l_quantity', 'l_discount',
        |    ${O.r4("(n*s_qd - s_q*s_d) / (sqrt(n*s_qq - s_q*s_q) * sqrt(n*s_dd - s_d*s_d))")} FROM s
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount',
        |    ${O.r4("(n*s_ed - s_e*s_d) / (sqrt(n*s_ee - s_e*s_e) * sqrt(n*s_dd - s_d*s_d))")} FROM s)
        |ORDER BY col1, col2""".stripMargin,
    // naive GROUP BY twin — matching it proves the sketch-guided
    // two-pass path is exact, not just approximately right
    "agg_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tot AS (SELECT count(*) AS n_total FROM tok)
        |SELECT token, count(*) AS n
        |FROM tok, tot GROUP BY token, n_total
        |HAVING count(*) * 30 > n_total
        |ORDER BY n DESC, token ASC""".stripMargin,
    // quantile_cont over RAW events — matching it proves the
    // merged-histogram percentile path is exact, not approximate
    "agg_percentile_incremental" ->
      s"""SELECT event_type,
        |  ${O.r4("quantile_cont(value, 0.5)")} AS p50,
        |  ${O.r4("quantile_cont(value, 0.9)")} AS p90,
        |  ${O.r4("quantile_cont(value, 0.99)")} AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // full recompute from RAW events — matching it proves the
    // persisted-partial merge path loses nothing
    "agg_incremental_merge" ->
      s"""SELECT event_type, count(*) AS n,
        |  ${O.sumDec("value", 2)} AS sum_val,
        |  ${O.r4(O.sumDec("value", 2) + " / count(*)")} AS avg_val,
        |  CAST(min(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS min_val,
        |  CAST(max(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS max_val
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_hhi_concentration" ->
      s"""WITH rev AS (SELECT l_returnflag, l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT l_returnflag, sum(rev) AS tot,
        |    count(*) AS n_suppliers FROM rev GROUP BY 1),
        |s AS (SELECT rev.l_returnflag, n_suppliers,
        |    CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE) AS sh
        |  FROM rev JOIN t USING (l_returnflag))
        |SELECT l_returnflag, n_suppliers,
        |  ${O.r4(s"CAST(sum(CAST(${O.rk("sh*sh*10000.0", 9)} AS DECIMAL(28,9))) AS DOUBLE)")} AS hhi,
        |  max(${O.r4("sh*10000.0")}) AS top_share_bp
        |FROM s GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "agg_benford_test" ->
      s"""WITH ev AS (SELECT l_returnflag,
        |    CAST(substr(CAST(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM lineitem WHERE l_extendedprice > 0),
        |obs AS (SELECT l_returnflag, digit, count(*) AS n_obs
        |  FROM ev GROUP BY 1, 2),
        |t AS (SELECT l_returnflag, CAST(sum(n_obs) AS BIGINT) AS n
        |  FROM obs GROUP BY 1),
        |j AS (SELECT obs.l_returnflag, digit, n_obs,
        |    n_obs * 1000000 // n AS obs_ppm,
        |    CAST(floor(log10(1 + 1.0/digit)*1000000 + 0.5) AS BIGINT)
        |      AS exp_ppm
        |  FROM obs JOIN t USING (l_returnflag))
        |SELECT l_returnflag, digit, n_obs, obs_ppm, exp_ppm,
        |  ${O.rk("((obs_ppm - exp_ppm)*(obs_ppm - exp_ppm)) / CAST(exp_ppm AS DOUBLE)", 6)} AS chi2_term
        |FROM j ORDER BY l_returnflag, digit""".stripMargin
  )
}
