package graft.operators

import graft.{Canon, Q, Tables}
import graft.Canon.{sql => O}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 window functions + §2.6 sort/limit/top-k.
  *
  * Scale notes: every window here partitions by a high-cardinality key
  * (custkey/user_id/orderstatus) so state per partition stays bounded;
  * none uses a global single-partition window except `window_ranks`,
  * which at 100 TB would be re-expressed per-shard + merge (documented
  * there). `topk_global` relies on Catalyst's TakeOrderedAndProject —
  * O(k) memory per partition, no global sort.
  */
object Windows {
  val queries: Map[String, Q] = Map(
    "window_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),
    "window_ranks" -> ((s, d) => {
      // Rank over a coarse band so ties are REAL (rank vs dense_rank
      // differ); ntile gets a fully tie-broken order so its arbitrary
      // tie-splitting is deterministic. Computed via the two-pass
      // api.Ranking.bandedRanks (per-band cumulative counts broadcast
      // back) — NO global single-partition window in the plan, same
      // output as rank()/dense_rank()/percent_rank()/ntile() over
      // Window.orderBy(band desc).
      val banded = Tables.orders(s, d)
        .select(col("o_orderkey"), floor(col("o_totalprice") / 10000).cast("long").as("band"))
      graft.api.Ranking.bandedRanks(banded, "band", "o_orderkey", 4)
        .select(col("o_orderkey"), col("band"), col("rnk"), col("drnk"),
          Canon.r4(col("prnk")).as("prnk"), col("tile"))
        .orderBy("o_orderkey")
    }),
    "window_first_last" -> ((s, d) => {
      // first/last/nth_value analytic functions, per-user over event
      // time — completing the window-function surface beyond
      // lag/lead/ranks. The frame is the CLASSIC gotcha: last_value
      // over the default frame (UNBOUNDED PRECEDING..CURRENT ROW) is
      // just the current row; the full-extent frame here is what
      // makes it the partition's true last. One user-keyed shuffle;
      // (ts, event_id) order so ties cannot flip endpoints.
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"),
          first(col("event_type")).over(wFull).as("first_type"),
          last(col("event_type")).over(wFull).as("last_type"),
          nth_value(col("value"), 2).over(wFull).as("second_value"),
          row_number().over(w).as("_rn"))
        .filter(col("_rn") === 1).drop("_rn")
        .orderBy("user_id")
    }),
    "window_cume_dist" -> ((s, d) => {
      // cume_dist over the same coarse band order — rides the banded
      // two-pass ranks (per-band lookup broadcast back), completing
      // the global-rank window surface without a global window
      val banded = Tables.orders(s, d)
        .select(col("o_orderkey"), floor(col("o_totalprice") / 10000).cast("long").as("band"))
      graft.api.Ranking.bandedRanks(banded, "band", "o_orderkey", 4)
        .select(col("o_orderkey"), col("band"), Canon.r4(col("cdist")).as("cdist"))
        .orderBy("o_orderkey")
    }),
    "window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("next_event", lead(col("event_id"), 1).over(w))
        .select(col("event_id"), col("user_id"),
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"),
          col("next_event"))
        .orderBy("event_id")
    }),
    "window_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("cum_spend", Canon.r4(sum(col("o_totalprice")).over(w)))
        .select("o_custkey", "o_orderkey", "cum_spend")
        .orderBy("o_custkey", "o_orderkey")
    }),
    "window_sliding_avg" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(-3, 0)
      Tables.orders(s, d)
        .withColumn("mavg", Canon.r4(avg(col("o_totalprice")).over(w)))
        .select("o_orderkey", "o_orderstatus", "mavg")
        .orderBy("o_orderkey")
    }),
    "window_moving_median" -> ((s, d) => {
      // exact trailing-15-row MEDIAN per user over event time — the
      // robust moving-average twin (spikes cannot drag it), a frame
      // aggregate no built-in window function provides. Discrete
      // LOWER-median semantics (sorted frame, 1-based index
      // (n+1)÷2): the result is an ACTUAL input value, so both
      // engines select bit-identically — an interpolated median would
      // gamble the hash on float blends. Frame state is bounded (≤15
      // values) per row; order pinned by (ts, event_id) so ties
      // cannot reshuffle frames.
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-14, 0)
      // median over the frame's NON-NULL values (collect_list drops
      // NULLs; the twin list_filters to match), guarded: an all-NULL
      // frame has no median — element_at(…, 0) would THROW, not null
      val frame = collect_list(col("value")).over(w)
      val sorted = array_sort(frame)
      val med = when(size(sorted) > 0,
        element_at(sorted, ((size(sorted) + 1) / 2).cast("int")))
      Tables.events(s, d)
        .withColumn("med15", med)
        .select(col("event_id"), col("user_id"),
          Canon.tsStrMicros(col("ts")).as("ts"), col("value"), col("med15"))
        .orderBy("event_id")
    }),
    "window_range_frame" -> ((s, d) => {
      // RANGE frame over a value column. Aggregates inside the frame
      // are integer-exact (count + key sum) so segment-tree vs
      // sequential evaluation order cannot drift.
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").asc)
        .rangeBetween(-10000L, 0L)
      Tables.orders(s, d)
        .withColumn("n_in_range", count(lit(1)).over(w))
        .withColumn("key_sum", sum(col("o_orderkey")).over(w))
        .select("o_orderkey", "o_orderstatus", "n_in_range", "key_sum")
        .orderBy("o_orderkey")
    }),
    // ---- §2.6 sort / limit / top-k ----
    "sort_multikey" -> ((s, d) => {
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy(col("o_orderstatus").asc, col("o_orderpriority").desc, col("o_orderkey").asc)
    }),
    "topk_global" -> ((s, d) => {
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),
    "limit_offset" -> ((s, d) => {
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_orderkey").asc)
        .offset(10).limit(20)
    }),
    "events_funnel" -> ((s, d) => {
      // ordered conversion funnel view → click → purchase, each stage
      // within 24 h of the previous stage's first qualifying event —
      // one filtered aggregate per stage, never a per-user full sort
      graft.api.TimeSeriesOps.conversionFunnel(Tables.events(s, d),
          "user_id", "event_type", "ts",
          stages = Seq("view", "click", "purchase"), stepUs = 86400000000L)
        .orderBy("stage")
    }),
    "events_sessionize" -> ((s, d) => {
      // batch sessionization, 6 h inactivity gap — one shuffle on the
      // user key, lag + running-sum passes over the same sort, the
      // batch twin of stream_session_windows
      graft.api.TimeSeriesOps.sessionize(Tables.events(s, d),
          "user_id", "event_id", "ts", gapUs = 21600000000L)
        .orderBy("user_id", "session_id")
    }),
    "events_retention" -> ((s, d) => {
      // cohort retention triangle: first-event day × days-since-join →
      // distinct active users; all stages user-keyed equi-shuffles
      graft.api.TimeSeriesOps.retentionCohorts(Tables.events(s, d), "user_id", "ts")
        .orderBy("cohort_day", "day_offset")
    }),
    "events_top_paths" -> ((s, d) => {
      // path mining: top-20 length-3 event-type journeys corpus-wide —
      // one user-keyed shuffle into ordered per-user paths, rowwise
      // n-gram transform, partial-agg count, global top-k
      graft.api.TimeSeriesOps.topEventPaths(Tables.events(s, d),
        "user_id", "event_type", "ts", "event_id", n = 3, k = 20)
    }),
    "events_active_users" -> ((s, d) => {
      // DAU + trailing-7-day WAU per active day — distinct user-days,
      // one count per day, bounded explode for the trailing window
      graft.api.TimeSeriesOps.activeUsers(Tables.events(s, d), "user_id", "ts")
        .orderBy("day")
    }),
    "events_streaks" -> ((s, d) => {
      // gaps-and-islands: longest consecutive-day activity streak per
      // user — one user-keyed shuffle, island key = day − row_number
      graft.api.TimeSeriesOps.activityStreaks(Tables.events(s, d), "user_id", "ts")
        .orderBy("user_id")
    }),
    "events_attribution" -> ((s, d) => {
      // last-touch attribution: each purchase credited to the user's
      // most recent click within 7 days, bucketed by the click→purchase
      // gap — asofPrior's one-shuffle union+window shape plus a
      // conversion-id equi-join, revenue summed in DECIMAL; DuckDB twin
      // uses its native ASOF LEFT JOIN
      graft.api.TimeSeriesOps.lastTouchAttribution(Tables.events(s, d),
          "user_id", "event_type", "ts", "event_id", "value",
          convType = "purchase", touchType = "click",
          windowUs = 604800000000L)
        .orderBy("channel")
    }),
    "events_stickiness" -> ((s, d) => {
      // the engagement KPI: DAU / trailing-28-day MAU per day — what
      // share of the monthly audience shows up on a given day. Rides
      // the SAME bounded-explode rolling-distinct engine as
      // events_active_users (TimeSeriesOps.activeUsers at 28 days):
      // each user-DAY explodes to ≤28 report days — a constant-factor
      // fanout of the deduped user-day table, never a
      // distinct-over-sliding-window; the ratio is one float over
      // exact bigint counts, rounded
      graft.api.TimeSeriesOps.activeUsers(Tables.events(s, d),
          "user_id", "ts", windowDays = 28)
        .select(col("day"), col("dau"), col("wau").as("mau"),
          Canon.r4(col("dau").cast("double") / col("wau").cast("double"))
            .as("stickiness"))
        .orderBy("day")
    }),
    "events_bot_score" -> ((s, d) => {
      // per-USER traffic-regularity audit — the bot heuristic every
      // ingestion pipeline runs before trusting engagement counts:
      // humans arrive Poisson-ish (gap cv ≈ 1, the fixture's measured
      // baseline), schedulers and replay bots arrive on a clock
      // (cv → 0). Per user with ≥ 10 events: event count, events/hour
      // over the active span, inter-arrival cv, and a regularity flag
      // (cv < 0.85 ∧ n ≥ 20 — the threshold compares the ROUNDED cv,
      // so the verdict cannot straddle a float epsilon). Gaps are
      // exact integer µs from one user-keyed lag window; Σgap
      // telescopes to the span (bigint), Σgap² folds in DECIMAL(38,0)
      // from (19,0) staging; floats enter once per closed form.
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val us = unix_micros(col("ts"))
      val g = Tables.events(s, d)
        .select(col("user_id"), us.as("_t"),
          (us - lag(us, 1).over(w)).as("_g"))
      val agg = g.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        count(col("_g")).as("_m"),
        sum(col("_g")).as("_s"),
        sum(col("_g").cast(DecimalType(19, 0))
          * col("_g").cast(DecimalType(19, 0))).cast("double").as("_q"),
        min(col("_t")).as("_t0"), max(col("_t")).as("_t1"))
        .filter(col("_m") >= 9)
      val m = col("_m").cast("double")
      val mean = col("_s").cast("double") / m
      val varE = (col("_q") - col("_s").cast("double")
        * col("_s").cast("double") / m) / (m - 1.0)
      val cv = when(col("_s") > 0L,
        Canon.r4(when(varE > 0.0, sqrt(varE) / mean).otherwise(0.0)))
      val rate = when(col("_t1") > col("_t0"), Canon.r4(
        col("n_events").cast("double") * 3.6e9
          / (col("_t1") - col("_t0")).cast("double")))
      agg.select(col("user_id"), col("n_events"), cv.as("gap_cv"),
          rate.as("events_per_hour"),
          when(cv < 0.85 && col("n_events") >= 20L, 1L).otherwise(0L)
            .as("regular_flag"))
        .orderBy("user_id")
    }),
    "events_interarrival" -> ((s, d) => {
      // inter-arrival-time profile per event type: integer-μs gaps
      // from ONE type-keyed lag window ((ts, event_id)-pinned order),
      // then the p50/p90/p99/max ladder from the bounded-state exact
      // percentile — the traffic-shape / rate-anomaly baseline every
      // event pipeline monitors. Gaps are exact integers, so the
      // percentile interpolation sees identical inputs in both engines.
      val w = Window.partitionBy("event_type")
        .orderBy(col("ts").asc, col("event_id").asc)
      val us = unix_micros(col("ts"))
      val gaps = Tables.events(s, d)
        .withColumn("gap", us - lag(us, 1).over(w))
        .filter(col("gap").isNotNull)
      graft.api.StatsOps.binnedPercentiles(gaps, "event_type",
          col("gap").cast("double"),
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99),
          maxName = Some("pmax"))
        .select(col("event_type"), Canon.r4(col("p50")).as("p50"),
          Canon.r4(col("p90")).as("p90"), Canon.r4(col("p99")).as("p99"),
          col("pmax"))
        .orderBy("event_type")
    }),
    "events_concurrency_peak" -> ((s, d) => {
      // capacity planning: peak simultaneous 6 h-gap sessions per
      // epoch-hour via the classic +1/−1 sweep line — but the prefix
      // sum is BANDED (within-hour windows run parallel per hour;
      // only |hours| carry-in offsets cross a global window before a
      // broadcast back), never one global sort (TimeSeriesOps
      // .concurrencyPeak). Closed intervals: starts apply before ends
      // at the same µs. All-integer counts.
      graft.api.TimeSeriesOps.concurrencyPeak(Tables.events(s, d),
          "user_id", "event_id", "ts", gapUs = 21600000000L)
        .orderBy("hour_bucket")
    }),
    "events_survival_km" -> ((s, d) => {
      // session-length survival: Kaplan–Meier over 6 h-gap session
      // durations in whole hours, sessions still open within one gap
      // of corpus end CENSORED (their length is only a lower bound —
      // dropping them would bias the curve short; KM is the estimator
      // that keeps them honest). Risk sets and death counts stay
      // exact integers, each log-factor grid-rounds to 6 dp decimal
      // before the exact cumulative sum, exp() re-enters float once
      // (TimeSeriesOps.kaplanMeier); windows run over DISTINCT
      // durations (∝ horizon hours), never sessions
      val gap = 21600000000L
      // sess feeds the max-end scalar AND the duration frame — pin it
      // so sessionize's windows run once (§7.2 fan-out trap)
      val sess = graft.api.Checkpoints.pin(
        graft.api.TimeSeriesOps.sessionize(Tables.events(s, d),
          "user_id", "event_id", "ts", gapUs = gap))
      val mx = sess.agg(max(col("start_us") + col("duration_us")).as("_mx"))
      val durs = sess.crossJoin(broadcast(mx)).select(
        expr("duration_us div 3600000000").as("dur_h"),
        when(col("start_us") + col("duration_us") >= col("_mx") - gap,
          lit(0L)).otherwise(lit(1L)).as("obs"))
      graft.api.TimeSeriesOps.kaplanMeier(durs, "dur_h", "obs")
    }),
    "data_skew_report" -> ((s, d) => {
      // partition-key skew diagnostics — the report an engineer reads
      // before deciding a join/groupBy key needs salting (SkewJoins):
      // the 10 heaviest keys with their exact ppm share + cumulative
      // share, and the corpus-level max/avg ratio. ALL integer
      // arithmetic (ppm via 64-bit multiply + integer div — exact and
      // engine-identical; bound: total·1e6 < 2^63, i.e. ≤ ~9e12 rows).
      // Scale shape: one per-key hash aggregate, top-10 via
      // TakeOrdered (O(k) per partition, never a global sort), the
      // cumulative window runs over 10 rows
      val counts = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("_total"), max(col("cnt")).as("_maxc"))
      val w = Window.orderBy(col("cnt").desc, col("user_id"))
      counts.orderBy(col("cnt").desc, col("user_id")).limit(10)
        .withColumn("rk", row_number().over(w))
        .withColumn("_cum", sum(col("cnt")).over(w))
        .crossJoin(broadcast(stats))
        .select(col("rk"), col("user_id"), col("cnt"),
          expr("cnt * 1000000L div _total").as("share_ppm"),
          expr("_cum * 1000000L div _total").as("cum_ppm"),
          col("n_keys"),
          expr("_maxc * n_keys * 100L div _total").as("max_x100_over_avg"))
        .orderBy("rk")
    }),
    "events_anomaly_mad" -> ((s, d) => {
      // the ROBUST anomaly twin of events_anomaly_zscore: per type,
      // median + MAD (median absolute deviation) via the exact binned
      // percentile machinery (bitwise quantile_cont parity,
      // BinnedPercentileSpec), then count |v − med| > 3σ-equivalent
      // (1.4826·3·MAD). A handful of extreme rows cannot drag the
      // threshold the way they drag mean/stddev — the estimator a
      // monitoring pipeline actually wants. Values pre-rounded to the
      // 4 dp grid so the bin state is bounded and both engines bin
      // identically
      val ev = Tables.events(s, d)
        .select(col("event_type"), Canon.r4(col("value")).as("_v"))
        .filter(col("_v").isNotNull)
      val med = graft.api.StatsOps.binnedPercentiles(
        ev, "event_type", col("_v"), Seq(("med", 0.5)))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("_ad", abs(col("_v") - col("med")))
      val mad = graft.api.StatsOps.binnedPercentiles(
        dev, "event_type", col("_ad"), Seq(("mad", 0.5)))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(Canon.r4(max(col("med"))).as("med"),
          Canon.r4(max(col("mad"))).as("mad"),
          sum(when(col("_ad") > lit(4.4478) * col("mad"), 1L)
            .otherwise(0L)).as("n_anom"))
        .orderBy("event_type")
    }),
    "events_anomaly_zscore" -> ((s, d) => {
      // metric anomalies: |z| >= 3 per event type — one stats
      // aggregate broadcast back, rowwise verdict, no second shuffle
      graft.api.StatsOps.zscoreFlags(Tables.events(s, d),
          "event_type", "event_id", "value", threshold = 3.0)
        .orderBy("event_type", "event_id")
    }),
    "events_rfm_segments" -> ((s, d) => {
      // RFM segmentation — the classic customer-value triage, shaped
      // for scale: per-user (recency, frequency, monetary) is ONE
      // aggregate; each dimension's quartile cuts come from the
      // bounded-state exact percentile (StatsOps.binnedPercentiles)
      // and broadcast back as rowwise comparisons — NEVER a global
      // ntile, whose unpartitioned window is a single-reducer sort at
      // 1e9 users. Cuts are pre-rounded (4 dp) so a score cannot
      // straddle an ulp between engines; equal metrics get equal
      // scores (cut semantics, better than ntile's arbitrary split of
      // ties). r_score inverts recency: recent = high.
      val ev = Tables.events(s, d)
      val perUser = ev.groupBy("user_id")
        .agg(max(to_date(col("ts"))).as("_lastd"),
          count(lit(1)).as("frequency"),
          Canon.sumDec(col("value"), 2).as("monetary"))
      // global anchor from the per-user frame (max of per-user maxes),
      // not a second events scan
      val maxTs = perUser.agg(max(col("_lastd")).as("_maxd"))
      // pin: u feeds BOTH the cuts pass and the final join — without
      // the pin each consumer re-runs the events aggregate (and its
      // anchor broadcast) from the scan; one materialization ∝ |users|
      // honors the multi-branch pin contract (Checkpoints doc)
      val u = graft.api.Checkpoints.pin(perUser
        .crossJoin(broadcast(maxTs))
        .select(col("user_id"),
          datediff(col("_maxd"), col("_lastd")).cast("long").as("recency_days"),
          col("frequency"), col("monetary")))
      // ALL nine quartile cuts in ONE binnedPercentiles pass: stack
      // the three metrics into (metric, value) rows — the metric name
      // IS the percentile group — then pivot the 3-row result into a
      // single 1-row frame broadcast ONCE (r15; the former per-metric
      // fold broadcast seven 1-row frames = six more stage barriers
      // than the operator needs at any scale). Per-metric group math
      // is identical, so the cuts (and the hash) are unchanged.
      val metrics = Seq("recency_days", "frequency", "monetary")
      val stacked = u.select(expr(
        """stack(3,
          |  'recency_days', CAST(recency_days AS DOUBLE),
          |  'frequency',    CAST(frequency AS DOUBLE),
          |  'monetary',     monetary) AS (_m, _v)""".stripMargin))
      val cutsLong = graft.api.StatsOps.binnedPercentiles(stacked, "_m",
        col("_v"), Seq("_q25" -> 0.25, "_q50" -> 0.5, "_q75" -> 0.75))
      val cutExprs = for { m <- metrics; q <- Seq("_q25", "_q50", "_q75") }
        yield max(when(col("_m") === m, Canon.r4(col(q)))).as(s"_$m$q")
      val cutsRow = cutsLong.agg(cutExprs.head, cutExprs.tail: _*)
      // score = 1 + how many pre-rounded quartile cuts the metric
      // strictly exceeds
      def score(metric: String, invert: Boolean): org.apache.spark.sql.Column = {
        val m = col(metric).cast("double")
        val b = lit(1L) + (m > col(s"_${metric}_q25")).cast("long") +
          (m > col(s"_${metric}_q50")).cast("long") +
          (m > col(s"_${metric}_q75")).cast("long")
        if (invert) lit(5L) - b else b
      }
      u.crossJoin(broadcast(cutsRow))
        .withColumn("r_score", score("recency_days", invert = true))
        .withColumn("f_score", score("frequency", invert = false))
        .withColumn("m_score", score("monetary", invert = false))
        .select("user_id", "recency_days", "frequency", "monetary",
          "r_score", "f_score", "m_score")
        .orderBy("user_id")
    }),
    "events_markov_transitions" -> ((s, d) => {
      // first-order journey graph: P(next event type | previous) per
      // observed transition — one user-keyed lag window, then counts
      // and the normalizer over the tiny (prev, next) pair table
      graft.api.TimeSeriesOps.markovTransitions(Tables.events(s, d),
          "user_id", "event_type", "ts", "event_id")
        .orderBy("prev_type", "next_type")
    }),
    "events_time_to_convert" -> ((s, d) => {
      // conversion-delay funnel metric: per user, first purchase AT OR
      // AFTER the first click; delay distribution in integer minutes
      // (p50/p90 via the exact binned-percentile kernel — grid values,
      // quantile_cont parity) plus the conversion rate in integer ppm.
      // Two filtered per-user aggregates + one user-keyed join; the
      // delay frame is ∝ converted users, the percentile state ∝ the
      // minute grid. Delay frame fans into the count AND the
      // percentiles — pinned (§7.2).
      val ev = Tables.events(s, d)
      val us = unix_micros(col("ts"))
      val fc = graft.api.Checkpoints.pin(
        ev.filter(col("event_type") === "click")
          .groupBy("user_id").agg(min(us).as("_c")))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), us.as("_p"))
      val delays = graft.api.Checkpoints.pin(
        fc.join(pu, Seq("user_id")).filter(col("_p") >= col("_c"))
          .groupBy("user_id")
          .agg(expr("min(_p - _c) div 60000000").as("delay_min")))
      val clicked = fc.agg(count(lit(1)).as("n_clicked"))
      val conv = delays.agg(count(lit(1)).as("n_converted"))
      val pct = graft.api.StatsOps.binnedPercentiles(
        delays.select(lit("g").as("_g"),
          col("delay_min").cast("double").as("_v")),
        "_g", col("_v"), Seq("_p50" -> 0.5, "_p90" -> 0.9))
        .select(col("_p50"), col("_p90"))
      clicked.crossJoin(broadcast(conv)).crossJoin(broadcast(pct))
        .select(col("n_clicked"), col("n_converted"),
          expr("n_converted * 1000000 div n_clicked").as("convert_ppm"),
          Canon.r4(col("_p50")).as("p50_delay_min"),
          Canon.r4(col("_p90")).as("p90_delay_min"))
    }),
    "events_disorder_audit" -> ((s, d) => {
      // out-of-order-arrival audit — the measurement that picks a
      // streaming watermark: with event_id as the arrival sequence,
      // how far behind the running event-time high-water mark do rows
      // arrive? Per type: late count beyond 1 h, integer-ppm late
      // share, max and mean disorder. ONE arrival-ordered window pass
      // (running max over rows 1-preceding), then a tiny per-type
      // aggregate; disorder sums are exact bigint µs.
      val w = Window.partitionBy("event_type").orderBy(col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val us = unix_micros(col("ts"))
      Tables.events(s, d)
        .withColumn("_hwm", max(us).over(w))
        .withColumn("_dis", greatest(col("_hwm") - us, lit(0L)))
        .withColumn("_dis", coalesce(col("_dis"), lit(0L)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("_dis") > 3600000000L, 1L).otherwise(0L))
            .as("n_late_1h"),
          max(col("_dis")).as("max_disorder_us"),
          sum(col("_dis")).as("_sd"))
        .select(col("event_type"), col("n"), col("n_late_1h"),
          expr("n_late_1h * 1000000 div n").as("late_ppm"),
          col("max_disorder_us"),
          Canon.r4(col("_sd").cast("double") / col("n")).as("avg_disorder_us"))
        .orderBy("event_type")
    }),
    "window_pattern_match" -> ((s, d) => {
      // MATCH_RECOGNIZE-lite: detect strictly-increasing value runs of
      // length 3 inside a 24-hour span per user — ONE user-keyed
      // window (two lags ride the same sort), match state is 2 rows of
      // lookback however long the user's history is, and the rollup is
      // a tiny |event_type| aggregate. Strict double compares on raw
      // parquet values are engine-exact; ts ties break on event_id
      // (unique), so the lag alignment is deterministic.
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("_v1", lag(col("value"), 1).over(w))
        .withColumn("_v2", lag(col("value"), 2).over(w))
        .withColumn("_t2", lag(unix_micros(col("ts")), 2).over(w))
        .filter(col("_v2") < col("_v1") && col("_v1") < col("value") &&
          unix_micros(col("ts")) - col("_t2") <= 86400000000L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_matches"),
          countDistinct(col("user_id")).as("n_users"),
          Canon.r4(max(col("value") - col("_v2"))).as("max_rise"))
        .orderBy("event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "window_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rn, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_cume_dist" ->
      s"""WITH t AS (SELECT o_orderkey,
        |             CAST(floor(o_totalprice / 10000) AS BIGINT) AS band FROM orders)
        |SELECT o_orderkey, band,
        |  ${O.r4("cume_dist() OVER (ORDER BY band DESC)")} AS cdist
        |FROM t ORDER BY o_orderkey""".stripMargin,
    "window_ranks" ->
      s"""WITH t AS (SELECT o_orderkey,
        |             CAST(floor(o_totalprice / 10000) AS BIGINT) AS band FROM orders)
        |SELECT o_orderkey, band,
        |  CAST(rank() OVER w1 AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w1 AS BIGINT) AS drnk,
        |  ${O.r4("percent_rank() OVER w1")} AS prnk,
        |  CAST(ntile(4) OVER w2 AS BIGINT) AS tile
        |FROM t
        |WINDOW w1 AS (ORDER BY band DESC),
        |       w2 AS (ORDER BY band DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "window_lag_lead" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP))
        |    - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) AS gap_us,
        |  lead(event_id) OVER w AS next_event
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY event_id""".stripMargin,
    "window_running_sum" ->
      s"""SELECT o_custkey, o_orderkey,
        |  ${O.r4("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS cum_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_sliding_avg" ->
      s"""SELECT o_orderkey, o_orderstatus,
        |  ${O.r4("avg(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)")} AS mavg
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    // lower-median (actual input value) so selection is bit-exact;
    // DuckDB's windowed list() + list_sort mirrors the frame collect
    "window_moving_median" ->
      """SELECT event_id, user_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  value,
        |  CASE WHEN len(l) > 0 THEN l[CAST((len(l) + 1) // 2 AS INT)] END AS med15
        |FROM (
        |  SELECT event_id, user_id, ts, value,
        |    list_sort(list_filter(list(value) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id
        |      ROWS BETWEEN 14 PRECEDING AND CURRENT ROW),
        |      x -> x IS NOT NULL)) AS l
        |  FROM events)
        |ORDER BY event_id""".stripMargin,
    "window_range_frame" ->
      """SELECT o_orderkey, o_orderstatus,
        |  count(*) OVER w AS n_in_range,
        |  CAST(sum(o_orderkey) OVER w AS BIGINT) AS key_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "sort_multikey" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        |FROM orders
        |ORDER BY o_orderstatus ASC, o_orderpriority DESC, o_orderkey ASC""".stripMargin,
    "topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 10""".stripMargin,
    "events_funnel" ->
      """WITH e AS (SELECT user_id AS u, event_type AS et,
        |            epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |s1 AS (SELECT u, min(us) AS t FROM e WHERE et = 'view' GROUP BY 1),
        |s2 AS (SELECT e.u, min(us) AS t FROM e JOIN s1 USING (u)
        |       WHERE et = 'click' AND us > s1.t AND us <= s1.t + 86400000000 GROUP BY 1),
        |s3 AS (SELECT e.u, min(us) AS t FROM e JOIN s2 USING (u)
        |       WHERE et = 'purchase' AND us > s2.t AND us <= s2.t + 86400000000 GROUP BY 1)
        |SELECT 1 AS stage, 'view' AS event_type, (SELECT count(*) FROM s1) AS users
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        |ORDER BY stage""".stripMargin,
    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |            epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |m AS (SELECT user_id, event_id, us,
        |        CASE WHEN us - lag(us) OVER w <= 21600000000
        |             THEN 0 ELSE 1 END AS nw
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, us,
        |        sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |  count(*) AS n_events, min(us) AS start_us,
        |  max(us) - min(us) AS duration_us
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_retention" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
        |firsts AS (SELECT user_id, min(day) AS cohort FROM days GROUP BY 1)
        |SELECT cohort AS cohort_day, day - cohort AS day_offset,
        |  count(*) AS n_users
        |FROM days JOIN firsts USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_top_paths" ->
      """WITH s AS (SELECT user_id,
        |    list(event_type ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS ets
        |  FROM events GROUP BY 1),
        |g AS (SELECT unnest(list_transform(generate_series(1, len(ets) - 2),
        |        i -> ets[i] || '>' || ets[i+1] || '>' || ets[i+2])) AS path
        |      FROM s WHERE len(ets) >= 3)
        |SELECT path, count(*) AS n FROM g
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    // events_active_users' rolling-distinct shape at a 28-day window
    // plus the DAU/MAU ratio
    "events_stickiness" ->
      s"""WITH days AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM days GROUP BY 1),
        |span AS (SELECT DISTINCT u, day + gs.i AS rday
        |         FROM days, generate_series(0, 27) gs(i)),
        |mau AS (SELECT rday, count(*) AS mau FROM span GROUP BY 1)
        |SELECT day, dau, mau,
        |  ${O.r4("CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE)")} AS stickiness
        |FROM dau JOIN mau ON day = rday
        |ORDER BY day""".stripMargin,
    "events_active_users" ->
      """WITH days AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM days GROUP BY 1),
        |span AS (SELECT DISTINCT u, day + gs.i AS rday
        |         FROM days, generate_series(0, 6) gs(i)),
        |wau AS (SELECT rday, count(*) AS wau FROM span GROUP BY 1)
        |SELECT day, dau, wau FROM dau JOIN wau ON day = rday
        |ORDER BY day""".stripMargin,
    "events_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
        |i AS (SELECT user_id, day,
        |        day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        |      FROM days),
        |runs AS (SELECT user_id, island, count(*) AS len, min(day) AS start
        |         FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
        |  count(*) AS n_streaks, min(start) AS first_day
        |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin,
    "events_attribution" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'click'),
        |     a AS (SELECT p.event_id, p.value,
        |             epoch_us(p.ts) - epoch_us(c.ts) AS gap
        |           FROM p ASOF LEFT JOIN c
        |             ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT CASE WHEN gap IS NULL OR gap > 604800000000 THEN 'organic'
        |            WHEN gap <= 3600000000 THEN 'instant'
        |            WHEN gap <= 86400000000 THEN 'same_day'
        |            ELSE 'week' END AS channel,
        |       count(*) AS n_conversions,
        |       CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        |FROM a GROUP BY 1 ORDER BY channel""".stripMargin,
    // mirrors the Spark pipeline: integer-µs gaps from the identical
    // (ts, event_id)-ordered lag, Σgap telescopes in bigint, Σgap²
    // promotes via (19,0) staging, cv/rate closed forms spelled in the
    // same op order, flag decided on the ROUNDED cv
    "events_bot_score" -> {
      val cv = "CASE WHEN (q - s*s/m)/(m-1.0) > 0 THEN sqrt((q - s*s/m)/(m-1.0))/(s/m) ELSE 0.0 END"
      s"""WITH g AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
        |    epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |a AS (SELECT user_id, count(*) AS n_events, count(gap) AS mm,
        |    CAST(sum(gap) AS BIGINT) AS sb,
        |    CAST(sum(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))) AS DOUBLE) AS q,
        |    min(t) AS t0, max(t) AS t1
        |  FROM g GROUP BY 1),
        |c AS (SELECT user_id, n_events, CAST(mm AS DOUBLE) AS m,
        |    CAST(sb AS DOUBLE) AS s, q, t0, t1
        |  FROM a WHERE mm >= 9),
        |r AS (SELECT user_id, n_events,
        |    CASE WHEN s > 0 THEN ${O.r4(cv)} END AS gap_cv,
        |    CASE WHEN t1 > t0 THEN
        |      ${O.r4("CAST(n_events AS DOUBLE) * 3.6e9 / CAST(t1 - t0 AS DOUBLE)")} END AS events_per_hour
        |  FROM c)
        |SELECT user_id, n_events, gap_cv, events_per_hour,
        |  CAST(CASE WHEN gap_cv < 0.85 AND n_events >= 20 THEN 1 ELSE 0 END AS BIGINT) AS regular_flag
        |FROM r ORDER BY user_id""".stripMargin
    },
    "events_interarrival" ->
      s"""WITH g AS (SELECT event_type,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP))
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |          PARTITION BY event_type
        |          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS DOUBLE) AS gap
        |  FROM events)
        |SELECT event_type,
        |  ${graft.Canon.sql.r4("quantile_cont(gap, 0.5)")} AS p50,
        |  ${graft.Canon.sql.r4("quantile_cont(gap, 0.9)")} AS p90,
        |  ${graft.Canon.sql.r4("quantile_cont(gap, 0.99)")} AS p99,
        |  max(gap) AS pmax
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "data_skew_report" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |s AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total,
        |             max(cnt) AS maxc FROM c),
        |t AS (SELECT user_id, cnt,
        |        row_number() OVER (ORDER BY cnt DESC, user_id) AS rk,
        |        CAST(sum(cnt) OVER (ORDER BY cnt DESC, user_id) AS BIGINT) AS cum
        |      FROM c QUALIFY rk <= 10)
        |SELECT rk, user_id, cnt,
        |  CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
        |  CAST(cum * 1000000 // total AS BIGINT) AS cum_ppm,
        |  n_keys,
        |  CAST(maxc * n_keys * 100 // total AS BIGINT) AS max_x100_over_avg
        |FROM t, s ORDER BY rk""".stripMargin,
    // all-integer sweep line (the oracle may run the prefix sum
    // globally — the banded Spark plan is algebraically identical)
    "events_concurrency_peak" ->
      """WITH e AS (SELECT user_id, event_id,
        |            epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |m AS (SELECT user_id, event_id, us,
        |        CASE WHEN us - lag(us) OVER w <= 21600000000
        |             THEN 0 ELSE 1 END AS nw
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, us,
        |        sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m),
        |sess AS (SELECT min(us) AS start_us, max(us) AS end_us
        |         FROM s GROUP BY user_id, sid),
        |b AS (SELECT start_us AS us, 1 AS p, 0 AS neg FROM sess
        |      UNION ALL SELECT end_us, 0, -1 FROM sess),
        |u AS (SELECT us, CAST(sum(p) AS BIGINT) AS p,
        |        CAST(sum(neg) AS BIGINT) AS neg FROM b GROUP BY 1),
        |c AS (SELECT us, p,
        |        CAST(COALESCE(sum(p + neg) OVER (ORDER BY us
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS cumb
        |      FROM u)
        |SELECT us // 3600000000 AS hour_bucket, count(*) AS n_changes,
        |  max(cumb + p) AS peak_concurrency
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // integer risk sets; 6-dp-gridded log factors summed exact, exp
    // once; all-churned tail pinned to 0 by the integer flag
    "events_survival_km" ->
      s"""WITH e AS (SELECT user_id, event_id,
        |            epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |m AS (SELECT user_id, event_id, us,
        |        CASE WHEN us - lag(us) OVER w <= 21600000000
        |             THEN 0 ELSE 1 END AS nw
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT user_id, us,
        |        sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m),
        |sess AS (SELECT min(us) AS st, max(us) AS en
        |         FROM s GROUP BY user_id, sid),
        |mx AS (SELECT max(en) AS mxe, count(*) AS n FROM sess),
        |dur AS (SELECT (en - st) // 3600000000 AS dur,
        |    CASE WHEN en >= mxe - 21600000000 THEN 0 ELSE 1 END AS obs, n
        |  FROM sess CROSS JOIN mx),
        |bd AS (SELECT dur, count(*) AS tot, CAST(sum(obs) AS BIGINT) AS d,
        |    max(n) AS n FROM dur GROUP BY 1),
        |r AS (SELECT dur, tot, d,
        |    n - CAST(COALESCE(sum(tot) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM bd),
        |f AS (SELECT dur, tot, d, n_risk,
        |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS zf,
        |    CAST(CASE WHEN d = n_risk THEN 0.0 ELSE
        |      ${O.rk("ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))", 6)}
        |    END AS DECIMAL(28,6)) AS lg
        |  FROM r),
        |c AS (SELECT dur, tot, d, n_risk,
        |    sum(zf) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cz,
        |    sum(lg) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl
        |  FROM f)
        |SELECT dur, n_risk, d AS d_events,
        |  tot - d AS c_censored,
        |  CASE WHEN cz > 0 THEN 0.0 ELSE
        |    ${O.r4("exp(CAST(cl AS DOUBLE))")} END AS survival
        |FROM c WHERE d > 0 ORDER BY dur""".stripMargin,
    "events_anomaly_mad" ->
      """WITH v AS (SELECT event_type, floor(value*10000 + 0.5)/10000 AS v
        |           FROM events WHERE value IS NOT NULL),
        |m AS (SELECT event_type, quantile_cont(v, 0.5) AS med FROM v GROUP BY 1),
        |d AS (SELECT v.event_type, v.v, m.med, abs(v.v - m.med) AS ad
        |      FROM v JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.event_type,
        |  floor(max(d.med)*10000 + 0.5)/10000 AS med,
        |  floor(max(md.mad)*10000 + 0.5)/10000 AS mad,
        |  CAST(sum(CASE WHEN d.ad > 4.4478 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
        |FROM d JOIN md USING (event_type)
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "events_anomaly_zscore" ->
      s"""WITH s AS (SELECT event_type, avg(value) AS mu,
        |             stddev_pop(value) AS sd FROM events GROUP BY 1),
        |j AS (SELECT event_type, event_id, value,
        |        ${graft.Canon.sql.r4("(value - mu) / sd")} AS z
        |      FROM events JOIN s USING (event_type)
        |      WHERE sd > 0)
        |SELECT event_type, event_id, value, z FROM j
        |WHERE abs(z) >= 3.0 ORDER BY event_type, event_id""".stripMargin,
    "window_first_last" ->
      """WITH t AS (SELECT user_id,
        |    first_value(event_type) OVER w AS first_type,
        |    last_value(event_type) OVER w AS last_type,
        |    nth_value(value, 2) OVER w AS second_value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, first_type, last_type, second_value
        |FROM t WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // quantile_cont cuts (pre-rounded like the Spark side) + the same
    // strict-exceed bucket — equal metrics score equally on both sides
    "events_rfm_segments" ->
      s"""WITH u AS (SELECT user_id,
        |    date_diff('day', CAST(max(CAST(ts AS TIMESTAMP)) AS DATE),
        |      (SELECT CAST(max(CAST(ts AS TIMESTAMP)) AS DATE) FROM events)) AS recency_days,
        |    count(*) AS frequency,
        |    ${O.sumDec("value", 2)} AS monetary
        |  FROM events GROUP BY 1),
        |c AS (SELECT
        |    ${O.r4("quantile_cont(CAST(recency_days AS DOUBLE), 0.25)")} AS r25,
        |    ${O.r4("quantile_cont(CAST(recency_days AS DOUBLE), 0.5)")} AS r50,
        |    ${O.r4("quantile_cont(CAST(recency_days AS DOUBLE), 0.75)")} AS r75,
        |    ${O.r4("quantile_cont(CAST(frequency AS DOUBLE), 0.25)")} AS f25,
        |    ${O.r4("quantile_cont(CAST(frequency AS DOUBLE), 0.5)")} AS f50,
        |    ${O.r4("quantile_cont(CAST(frequency AS DOUBLE), 0.75)")} AS f75,
        |    ${O.r4("quantile_cont(monetary, 0.25)")} AS m25,
        |    ${O.r4("quantile_cont(monetary, 0.5)")} AS m50,
        |    ${O.r4("quantile_cont(monetary, 0.75)")} AS m75
        |  FROM u)
        |SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
        |  frequency, monetary,
        |  5 - (1 + CAST(recency_days > r25 AS BIGINT)
        |         + CAST(recency_days > r50 AS BIGINT)
        |         + CAST(recency_days > r75 AS BIGINT)) AS r_score,
        |  1 + CAST(frequency > f25 AS BIGINT) + CAST(frequency > f50 AS BIGINT)
        |    + CAST(frequency > f75 AS BIGINT) AS f_score,
        |  1 + CAST(monetary > m25 AS BIGINT) + CAST(monetary > m50 AS BIGINT)
        |    + CAST(monetary > m75 AS BIGINT) AS m_score
        |FROM u CROSS JOIN c ORDER BY user_id""".stripMargin,
    "events_markov_transitions" ->
      s"""WITH seq AS (SELECT user_id, event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, next_type, count(*) AS n
        |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  ${O.r4("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type)")} AS p
        |FROM c ORDER BY prev_type, next_type""".stripMargin,
    "events_time_to_convert" ->
      s"""WITH fc AS (SELECT user_id,
        |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS c
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |pu AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p
        |  FROM events WHERE event_type = 'purchase'),
        |dl AS (SELECT fc.user_id, min(p - c) // 60000000 AS delay_min
        |  FROM fc JOIN pu USING (user_id) WHERE p >= c GROUP BY 1)
        |SELECT (SELECT count(*) FROM fc) AS n_clicked,
        |  count(*) AS n_converted,
        |  count(*) * 1000000 // (SELECT count(*) FROM fc) AS convert_ppm,
        |  ${O.r4("quantile_cont(CAST(delay_min AS DOUBLE), 0.5)")} AS p50_delay_min,
        |  ${O.r4("quantile_cont(CAST(delay_min AS DOUBLE), 0.9)")} AS p90_delay_min
        |FROM dl""".stripMargin,
    "events_disorder_audit" ->
      s"""WITH seq AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY event_type ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM events),
        |x AS (SELECT event_type,
        |    COALESCE(greatest(hwm - us, 0), 0) AS dis FROM seq),
        |a AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(CASE WHEN dis > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_late_1h,
        |    max(dis) AS max_disorder_us,
        |    CAST(sum(dis) AS BIGINT) AS sd
        |  FROM x GROUP BY 1)
        |SELECT event_type, n, n_late_1h,
        |  n_late_1h * 1000000 // n AS late_ppm,
        |  max_disorder_us,
        |  ${O.r4("CAST(sd AS DOUBLE) / n")} AS avg_disorder_us
        |FROM a ORDER BY event_type""".stripMargin,
    "window_pattern_match" ->
      s"""WITH seq AS (SELECT event_type, user_id, value,
        |    lag(value, 1) OVER w AS v1, lag(value, 2) OVER w AS v2,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t0,
        |    lag(epoch_us(CAST(ts AS TIMESTAMP)), 2) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id))
        |SELECT event_type, count(*) AS n_matches,
        |  count(DISTINCT user_id) AS n_users,
        |  ${O.r4("max(value - v2)")} AS max_rise
        |FROM seq
        |WHERE v2 < v1 AND v1 < value AND t0 - t2 <= 86400000000
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
