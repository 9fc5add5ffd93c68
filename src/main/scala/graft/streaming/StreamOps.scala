package graft.streaming

import graft.{Canon, Q, Tables}
import graft.Canon.{sql => O}
import org.apache.spark.sql.functions._

/** §2.10 — event-time windowing over the events table.
  *
  * Declared queries run batch semantics (the driver's Verify harness
  * is batch-only); the unit suite replays the same frames through
  * Structured Streaming (MemoryStream) and asserts stream == batch.
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregations
  * keyed by (window, type) — partial-aggregated before the shuffle.
  * Session windows keep per-user state; at cluster scale the streaming
  * variant should run on the RocksDB state store
  * (spark.sql.streaming.stateStore.providerClass) so state spills off
  * heap — noted here, not wired at fixture scale.
  */
/** Typed event row for the custom-state (KeyValueGroupedDataset) path. */
case class GraftEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Accumulated per-user state for `StreamOps.userStatsStateful`; the
  * distinct-type set is bounded by the event-type vocabulary, so state
  * per key is O(1) — the shape that keeps a 100 TB keyed stream inside
  * the (RocksDB) state store. */
case class UserStatsState(n: Long, firstTs: java.sql.Timestamp,
    lastTs: java.sql.Timestamp, types: Set[String])

/** Output row of the stateful per-user aggregate. */
case class UserStats(user_id: Long, n_events: Long,
    first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp, n_types: Long)

object StreamOps {
  import org.apache.spark.sql.DataFrame

  /** Transform cores shared by the batch-declared queries and the
    * Structured-Streaming parity tests (same plan applied to
    * readStream/MemoryStream input). */
  def tumblingAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Canon.sumDec(col("value"), 2).as("sum_val"))
      .select(Canon.tsStr(col("window.start")).as("win_start"), col("event_type"),
        col("n"), col("sum_val"))

  def slidingAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), Canon.sumDec(col("value"), 2).as("sum_val"))
      .select(Canon.tsStr(col("window.start")).as("win_start"), col("event_type"),
        col("n"), col("sum_val"))

  /** Batch twin of the custom-state aggregate (integer/timestamp only —
    * no float accumulation, so stream arrival order cannot drift the
    * result). */
  def userStatsBatch(ev: DataFrame): DataFrame =
    ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
        countDistinct(col("event_type")).as("n_types"))

  /** Custom arbitrary-state streaming aggregate via
    * flatMapGroupsWithState (update mode): the KeyValueGroupedDataset
    * path for semantics the built-in window aggregates cannot express.
    * Each trigger emits the group's refreshed totals; the LAST emitted
    * row per user equals `userStatsBatch` once the replay drains
    * (asserted in StreamingParitySpec). */
  def userStatsStateful(ev: org.apache.spark.sql.Dataset[GraftEvent])
      : org.apache.spark.sql.Dataset[UserStats] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = ev.sparkSession
    import spark.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[GraftEvent], state: GroupState[UserStatsState]) =>
          var s = state.getOption.getOrElse(
            UserStatsState(0L, null, null, Set.empty))
          events.foreach { e =>
            s = UserStatsState(
              s.n + 1,
              if (s.firstTs == null || e.ts.before(s.firstTs)) e.ts else s.firstTs,
              if (s.lastTs == null || e.ts.after(s.lastTs)) e.ts else s.lastTs,
              s.types + e.event_type)
          }
          state.update(s)
          Iterator(UserStats(uid, s.n, s.firstTs, s.lastTs, s.types.size.toLong))
      }
  }

  /** Interval join core: for each purchase, the same user's clicks in
    * the preceding hour — the stream-stream join shape (equi-key +
    * event-time range). In batch it is a plain range-condition join;
    * in streaming both sides carry watermarks and the range condition
    * bounds join state, so state size tracks the hour window, not the
    * stream length. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
      col("c.user_id") === col("p.user_id") &&
        col("c.ts") >= col("p.ts") - expr("INTERVAL 1 HOUR") &&
        col("c.ts") <= col("p.ts"))
      .select(col("p.event_id").as("purchase_id"),
        col("c.event_id").as("click_id"), col("p.user_id").as("user_id"))

  /** Idempotent micro-batch sink for `foreachBatch`: each batch lands
    * in its own `batch=<id>` directory with overwrite mode, so an
    * at-least-once REPLAY (crash after the files landed but before the
    * checkpoint committed the batch) overwrites the same directory
    * instead of appending duplicates — exactly-once file output on top
    * of foreachBatch's at-least-once delivery, with no transactional
    * table format needed. Pair with a watermarked APPEND-mode
    * aggregate so batches emit disjoint (finalized) windows and the
    * union over batch directories IS the aggregate; downstream batch
    * readers just read the root path (the batch id is a partition
    * column they drop). Replay-with-injected-crash is exercised in
    * StreamingParitySpec; the lossless batch round-trip is the
    * oracle-checked `stream_sink_idempotent` key. */
  def idempotentBatchSink(path: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      df.write.mode("overwrite").parquet(s"$path/batch=$batchId")

  def sessionAgg(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        Canon.tsStrMicros(col("session_window.start")).as("session_start"),
        col("n_events"))

  val queries: Map[String, Q] = Map(
    "stream_tumbling_counts" -> ((s, d) =>
      tumblingAgg(Tables.events(s, d)).orderBy("win_start", "event_type")),
    "stream_sliding_counts" -> ((s, d) =>
      slidingAgg(Tables.events(s, d)).orderBy("win_start", "event_type")),
    // Spark session semantics: a session is [first, last+gap); an
    // event at exactly prev+gap starts a NEW session — the oracle's
    // gaps-and-islands break uses >= accordingly.
    "stream_session_windows" -> ((s, d) =>
      sessionAgg(Tables.events(s, d)).orderBy("user_id", "session_start")),
    "stream_dedup_ids" -> ((s, d) => {
      // Batch dropDuplicates on the id key; the streaming twin
      // (dropDuplicatesWithinWatermark) is exercised in the unit suite.
      Tables.events(s, d)
        .dropDuplicates("event_id")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    "ts_resample_gapfill" -> ((s, d) => {
      // dense 5-minute grid per event_type with zero-filled gaps —
      // the resample step before any differencing/smoothing
      graft.api.TimeSeriesOps.resampleGapfill(Tables.events(s, d), "ts", "event_type", 300)
        .select(col("event_type"), Canon.tsStr(col("bin")).as("win_start"), col("n"))
        .orderBy("event_type", "win_start")
    }),
    "stream_stream_join" -> ((s, d) => {
      // event-time interval join, batch semantics declared; the
      // watermarked stream-stream twin is parity-tested
      val ev = Tables.events(s, d)
      clickPurchaseJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
        .orderBy("purchase_id", "click_id")
    }),
    "stream_stateful_user_stats" -> ((s, d) => {
      // custom-state aggregate, batch semantics (declared); the
      // flatMapGroupsWithState streaming twin is parity-tested
      userStatsBatch(Tables.events(s, d))
        .select(col("user_id"), col("n_events"),
          Canon.tsStrMicros(col("first_ts")).as("first_ts"),
          Canon.tsStrMicros(col("last_ts")).as("last_ts"),
          col("n_types"))
        .orderBy("user_id")
    }),
    "stream_sink_idempotent" -> ((s, d) => {
      // foreachBatch idempotent sink, batch semantics declared: the
      // tumbling aggregate lands through the SAME sink code path the
      // streaming twin uses — TWICE with the same batch id, simulating
      // the at-least-once replay, which must overwrite rather than
      // duplicate — then reads the directory tree back (dropping the
      // batch partition column). Oracle = the tumbling oracle, so the
      // hash match proves the sink hop is lossless AND the replay
      // added nothing; the streaming property (mid-stream crash +
      // checkpoint restart → exactly-once files) is exercised in
      // StreamingParitySpec.
      val out = graft.sources.Writers.roundTripDir("graft_sink_idem", d)
      val agg = tumblingAgg(Tables.events(s, d))
      idempotentBatchSink(out)(agg, 0L)
      idempotentBatchSink(out)(agg, 0L) // replayed batch: idempotent
      s.read.parquet(out)
        .select("win_start", "event_type", "n", "sum_val")
        .orderBy("win_start", "event_type")
    }),
    "ts_seasonal_hourly" -> ((s, d) => {
      // seasonal profile: per (event_type, UTC hour-of-day) event count
      // and exact-decimal mean value — the diurnal baseline an anomaly
      // detector normalizes against before flagging; ONE hash
      // aggregate, 24·|types| output rows at any scale
      Tables.events(s, d)
        .groupBy(col("event_type"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"),
          Canon.r4(Canon.sumDec(col("value"), 2) / count(lit(1))).as("avg_val"))
        .orderBy("event_type", "hod")
    }),
    "events_traffic_heatmap" -> ((s, d) => {
      // the day-of-week × hour-of-day traffic heatmap (the capacity-
      // planning / on-call-staffing matrix): count, corpus share in
      // integer ppm, exact-decimal mean value per cell — ONE hash
      // aggregate to ≤ 168 cells, one window total over that tiny
      // frame; weekday() here (Mon=0) = DuckDB isodow−1
      val g = Tables.events(s, d)
        .groupBy(weekday(col("ts")).cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hod"))
        .agg(count(lit(1)).as("n"),
          Canon.r4(Canon.sumDec(col("value"), 2) / count(lit(1)))
            .as("avg_val"))
      import org.apache.spark.sql.expressions.Window
      g.withColumn("_t", sum(col("n")).over(Window.partitionBy()))
        .select(col("dow"), col("hod"), col("n"),
          expr("n * 1000000 div _t").as("share_ppm"), col("avg_val"))
        .orderBy("dow", "hod")
    }),
    "ts_seasonal_adjust" -> ((s, d) => {
      // seasonality-ADJUSTED anomalies: each hourly bin z-scored
      // against its own hour-of-day slot's mean/std per type, top-3
      // |z| bins per type — the detector ts_seasonal_hourly's profile
      // exists to feed (a 3 a.m. spike invisible next to the daily
      // peak); exact bigint slot sums, one rank window per type
      // (TimeSeriesOps.seasonalAnomalies)
      graft.api.TimeSeriesOps.seasonalAnomalies(Tables.events(s, d),
          "ts", "event_type", binSeconds = 3600, topK = 3)
        .orderBy("event_type", "win_start")
    }),
    "ts_xcorr_lagged" -> ((s, d) => {
      // lead/lag detector: Pearson cross-correlation of the click and
      // purchase series at lags −3..+3 over the dense 5-min grid —
      // zero-filled bins count (joint silence is signal). Lags ride
      // ONE equi-join (y explodes to its 7 lag targets), power sums in
      // exact decimal, closed form once (TimeSeriesOps.crossCorrelation)
      graft.api.TimeSeriesOps.crossCorrelation(Tables.events(s, d),
          "ts", "event_type", "click", "purchase", binSeconds = 300)
        .orderBy("lag")
    }),
    "ts_acf" -> ((s, d) => {
      // autocorrelation function of each type's hourly count series at
      // lags 1..6 over the dense zero-filled hour grid — the
      // periodicity/persistence fingerprint read before picking
      // seasonal windows or anomaly baselines. Engine-exact the xcorr
      // way: every power/cross sum (Σx, Σx², Σx·x₋ₖ and the lag-k
      // head/tail margins) is an EXACT bigint aggregate; float enters
      // only in the closed form r_k = (m_k − x̄(sh_k+st_k) + (n−k)x̄²)
      // / (Σx² − S²/n), spelled in the same op order in both engines.
      // Scale shape: one gapfill + ONE lag window pass (6 lag columns
      // share it) + one per-type aggregate; output 6·|types| rows.
      import org.apache.spark.sql.expressions.Window
      val maxK = 6
      val g = graft.api.TimeSeriesOps.resampleGapfill(
        Tables.events(s, d), "ts", "event_type", 3600)
      val w = Window.partitionBy("event_type").orderBy("bin")
      val lagged = g.select(col("event_type") +: col("n").as("_x") +:
        (1 to maxK).map(k => lag(col("n"), k).over(w).as(s"_l$k")): _*)
      val aggs = Seq(count(lit(1)).as("_n"), sum(col("_x")).as("_s"),
        sum(col("_x") * col("_x")).as("_q")) ++
        (1 to maxK).flatMap(k => Seq(
          sum(col("_x") * col(s"_l$k")).as(s"_m$k"),
          sum(col(s"_l$k")).as(s"_sh$k"),
          sum(when(col(s"_l$k").isNotNull, col("_x"))).as(s"_st$k")))
      val st = lagged.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
      val rows = st.select(col("event_type"), col("_n"), col("_s"), col("_q"),
          explode(array((1 to maxK).map(k => struct(lit(k).as("lag"),
            col(s"_m$k").as("_m"), col(s"_sh$k").as("_sh"),
            col(s"_st$k").as("_stl"))): _*)).as("_r"))
        .select(col("event_type"), col("_n"), col("_s"), col("_q"), col("_r.*"))
      val xb = col("_s").cast("double") / col("_n").cast("double")
      val den = col("_q").cast("double") -
        (col("_s") * col("_s")).cast("double") / col("_n").cast("double")
      val num = col("_m").cast("double") - xb * (col("_sh") + col("_stl")).cast("double") +
        (col("_n") - col("lag")).cast("double") * xb * xb
      rows.select(col("event_type"), col("lag").cast("long").as("lag"),
          when(den =!= 0.0, Canon.r4(num / den)).otherwise(0.0).as("acf"))
        .orderBy("event_type", "lag")
    }),
    "ts_theil_sen" -> ((s, d) => {
      // robust trend: Theil–Sen slope/intercept of the global hourly
      // event-count series — the median of all pairwise slopes, which
      // a 29%-contaminated series cannot drag (OLS moves with one bad
      // day). Pair volume is ∝ HORIZON² (hours², ~550 k pairs for a
      // month), NOT corpus rows — the series is already the bounded
      // gapfilled grid, so the self-pair enumeration is a small
      // bounded cross, never data-sized. Slopes/residuals grid-round
      // to 6 dp, medians come from the exact binned percentile
      // (quantile_cont parity), outputs r4.
      val g = graft.api.TimeSeriesOps.resampleGapfill(
        Tables.events(s, d).withColumn("_k", lit("all")), "ts", "_k", 3600)
      val b0 = g.agg(min(col("bin")).as("_b0"))
      // idx feeds 4 consumers and sl 2 — pin both (§7.2 fan-out trap)
      val idx = graft.api.Checkpoints.pin(g.crossJoin(broadcast(b0))
        .select(expr("(unix_micros(bin) - unix_micros(_b0)) div 3600000000")
          .as("i"), col("n").as("y")))
      val a = idx.select(col("i").as("i1"), col("y").as("y1"))
      val bb = idx.select(col("i").as("i2"), col("y").as("y2"))
      val sl = graft.api.Checkpoints.pin(
        a.crossJoin(bb).filter(col("i1") < col("i2"))
          .select(lit("g").as("_g"), Canon.rk((col("y2") - col("y1")).cast("double")
            / (col("i2") - col("i1")).cast("double"), 6).as("_s")))
      val med = graft.api.StatsOps.binnedPercentiles(sl, "_g", col("_s"),
        Seq("_p50" -> 0.5)).select(col("_p50"))
      val res = idx.crossJoin(broadcast(med))
        .select(lit("g").as("_g"), Canon.rk(col("y").cast("double")
          - col("_p50") * col("i").cast("double"), 6).as("_r"))
      val icpt = graft.api.StatsOps.binnedPercentiles(res, "_g", col("_r"),
        Seq("_ic" -> 0.5)).select(col("_ic"))
      val counts = idx.agg(count(lit(1)).as("n_hours"))
        .crossJoin(broadcast(sl.agg(count(lit(1)).as("n_pairs"))))
      counts.crossJoin(broadcast(med)).crossJoin(broadcast(icpt))
        .select(col("n_hours"), col("n_pairs"),
          Canon.r4(col("_p50")).as("slope"), Canon.r4(col("_ic")).as("intercept"))
    }),
    "ts_backtest_snaive" -> ((s, d) => {
      // forecast-baseline backtest: seasonal-naive ŷ(t) = y(t−168h)
      // (same hour last week) vs the daily-naive y(t−24h) over the
      // dense zero-filled hourly grid — the accuracy floor any real
      // forecaster must beat, and the drift alarm when last week
      // stops predicting this one. MAE/bias are exact integer sums
      // over counts (float only in the final division); ONE gapfill +
      // ONE lag window serves both horizons; output ∝ |types|.
      import org.apache.spark.sql.expressions.Window
      val g = graft.api.TimeSeriesOps.resampleGapfill(
        Tables.events(s, d), "ts", "event_type", 3600)
      val w = Window.partitionBy("event_type").orderBy("bin")
      val f = g.select(col("event_type"), col("n"),
          lag(col("n"), 168).over(w).as("_f168"),
          lag(col("n"), 24).over(w).as("_f24"))
        .filter(col("_f168").isNotNull)
      f.groupBy("event_type").agg(
          count(lit(1)).as("n_hours"),
          sum(abs(col("n") - col("_f168"))).as("_ae168"),
          sum(abs(col("n") - col("_f24"))).as("_ae24"),
          sum(col("n") - col("_f168")).as("bias_weekly"))
        .select(col("event_type"), col("n_hours"),
          Canon.r4(col("_ae168").cast("double") / col("n_hours").cast("double"))
            .as("mae_weekly"),
          Canon.r4(col("_ae24").cast("double") / col("n_hours").cast("double"))
            .as("mae_daily"),
          col("bias_weekly"))
        .orderBy("event_type")
    }),
    "ts_changepoint_cusum" -> ((s, d) => {
      // level-shift detection per user: the time-ordered point where
      // the cumulative deviation from the user's mean value peaks
      // (TimeSeriesOps.changepointCusum — integer-exact D_k, the mean
      // never materializes, ties to the earliest point)
      graft.api.TimeSeriesOps.changepointCusum(Tables.events(s, d),
          "user_id", "ts", "value", "event_id")
        .select(col("user_id"), Canon.tsStrMicros(col("ts")).as("cp_ts"),
          col("event_id"), col("cusum_units"), col("cusum"))
        .orderBy("user_id")
    }),
    "ts_ewma_smooth" -> ((s, d) => {
      // truncated EWMA (d = 7/10, window 12) over the dense 5-minute
      // grid — the smoothing step between resample and thresholding.
      // Decay applied as exact INTEGER weights (7^k·10^(11-k)), so
      // both engines sum identical integers and float enters once at
      // the final division (TimeSeriesOps.ewmaSmooth).
      val g = graft.api.TimeSeriesOps.resampleGapfill(
        Tables.events(s, d), "ts", "event_type", 300)
      graft.api.TimeSeriesOps.ewmaSmooth(g, "event_type", "bin", "n", 300)
        .select(col("event_type"), Canon.tsStr(col("bin")).as("win_start"),
          col("n"), Canon.r4(col("ewma")).as("ewma"))
        .orderBy("event_type", "win_start")
    }),
    "stream_cdc_upsert" -> ((s, d) => {
      // CDC apply loop, batch semantics declared: the events month is
      // replayed as three chronological micro-batches; each batch's
      // per-user LATEST row (the change record) is SCD-1-upserted into
      // the running snapshot (Maintenance.upsertMerge — the same
      // full-outer key-shuffle merge the lakehouse key uses). The
      // oracle computes each user's global latest event directly, so
      // the hash match proves per-batch merges COMPOSE: fold(upsert,
      // batches) ≡ one-shot latest — the property a streaming
      // foreachBatch CDC sink rests on. Deterministic batch cuts;
      // ties inside a batch break on event_id like every window here.
      val ev = Tables.events(s, d)
      def latest(df: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
          .select(col("user_id"), col("event_type").as("last_type"),
            col("value").as("last_value"), col("ts").as("last_ts"))
      }
      val batches = Seq(
        ev.filter(col("ts") < "2024-01-11"),
        ev.filter(col("ts") >= "2024-01-11" && col("ts") < "2024-01-21"),
        ev.filter(col("ts") >= "2024-01-21"))
      val merged = batches.map(latest).reduce { (snap, upd) =>
        graft.api.Maintenance.upsertMerge(snap, upd, "user_id").drop("action")
      }
      merged.select(col("user_id"), col("last_type"), col("last_value"),
          Canon.tsStrMicros(col("last_ts")).as("last_ts"))
        .orderBy("user_id")
    }),
    "stream_watermark_late" -> ((s, d) => {
      // ✘ no oracle: watermarking is a no-op in batch; the unit suite
      // injects late rows through MemoryStream and asserts they drop.
      Tables.events(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(Canon.tsStr(col("window.start")).as("win_start"), col("n"))
        .orderBy("win_start")
    }),
    "ts_holt_trend" -> ((s, d) => {
      // Brown's double exponential smoothing — trend-aware forecasting
      // one composition up from ts_ewma_smooth: s₁ = EWMA(y),
      // s₂ = EWMA(s₁), level = 2s₁−s₂, trend = (α/(1−α))(s₁−s₂),
      // one-step forecast = level + trend (α = 0.3 from the 7/10
      // decay). BOTH passes are the truncated integer-weight EWMA
      // (exact decimal sums, float only at each pass's division); s₁
      // grid-rounds to 6 dp between passes so the second pass's
      // decimal cast is exact in both engines. Two window passes over
      // the dense grid — state ∝ window, shuffles ∝ |types|.
      val g = graft.api.TimeSeriesOps.resampleGapfill(
        Tables.events(s, d), "ts", "event_type", 300)
      val s1 = graft.api.TimeSeriesOps.ewmaSmooth(g, "event_type", "bin", "n", 300)
        .select(col("event_type"), col("bin"),
          Canon.rk(col("ewma"), 6).as("_s1"))
      val s2 = graft.api.TimeSeriesOps.ewmaSmooth(
        s1, "event_type", "bin", "_s1", 300, valueScale = 6)
      val level = lit(2.0) * col("_s1") - col("ewma")
      val trend = ((col("_s1") - col("ewma")) * 3.0) / 7.0
      s2.select(col("event_type"), Canon.tsStr(col("bin")).as("win_start"),
          Canon.r4(col("_s1")).as("s1"), Canon.r4(col("ewma")).as("s2"),
          Canon.r4(level).as("level"), Canon.rk(trend, 6).as("trend"),
          Canon.r4(level + trend).as("forecast_next"))
        .orderBy("event_type", "win_start")
    }),
    "ts_periodogram" -> ((s, d) => {
      // seasonality scan WITHOUT transcendentals: for each candidate
      // period P, the fraction of hourly-count variance explained by
      // the phase (hour mod P) grouping — the ANOVA / phase-dispersion
      // periodogram. A Fourier periodogram needs cos/sin, whose 1-ulp
      // libm spread across engines can flip grid-rounded terms; phase
      // binning gets the same "is there energy at period P" answer
      // from EXACT integer power sums (counts are ints): per-phase
      // S_p, n_p and global S, Σx², n are bigint-exact, float enters
      // only in S_p²/n_p (ints ≤2^53 — exact-rounded identically
      // everywhere), each term grid-rounds to 6 dp decimal before the
      // ≤168-term cross-phase sum. Scale shape: ONE gapfill, one
      // explode×|periods| aggregate (map-side combined, state ∝
      // Σ_P P ≈ 265 phase cells), one 1-row global aggregate.
      import org.apache.spark.sql.types.DecimalType
      val g = graft.api.TimeSeriesOps.resampleGapfill(
        Tables.events(s, d).withColumn("_k", lit("all")), "ts", "_k", 3600)
      val b0 = g.agg(min(col("bin")).as("_b0"))
      // idx feeds the global moments AND the phase aggregate — pin
      // (§7.2 fan-out trap)
      val idx = graft.api.Checkpoints.pin(g.crossJoin(broadcast(b0))
        .select(expr("(unix_micros(bin) - unix_micros(_b0)) div 3600000000")
          .as("i"), col("n").as("y")))
      val periods = Seq(2, 3, 4, 6, 8, 12, 24, 48, 168)
      val glob = idx.agg(count(lit(1)).as("_n"), sum(col("y")).as("_s"),
        sum(col("y") * col("y")).as("_q"))
      val ph = idx
        .select(explode(array(periods.map(lit(_)): _*)).as("period_h"),
          col("i"), col("y"))
        .groupBy(col("period_h"), (col("i") % col("period_h")).as("_phase"))
        .agg(count(lit(1)).as("_np"), sum(col("y")).as("_sp"))
      val sb = ph.groupBy("period_h").agg(count(lit(1)).as("n_phases"),
        sum(Canon.rk((col("_sp") * col("_sp")).cast("double") / col("_np"), 6)
          .cast(DecimalType(28, 6))).cast("double").as("_sb"))
      val corr = (col("_s") * col("_s")).cast("double") / col("_n")
      val sst = col("_q").cast("double") - corr
      sb.crossJoin(broadcast(glob))
        .select(col("period_h"), col("n_phases"),
          when(sst =!= 0.0, Canon.rk((col("_sb") - corr) / sst, 6))
            .otherwise(0.0).as("r2_seasonal"))
        .orderBy("period_h")
    })
  )

  val oracles: Map[String, String] = Map(
    // the one-shot global latest — matching the 3-batch merge fold
    // proves per-batch SCD-1 merges compose
    "stream_cdc_upsert" ->
      """WITH r AS (SELECT user_id, event_type AS last_type, value AS last_value,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, last_type, last_value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "stream_tumbling_counts" ->
      s"""SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
        |                '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS n, ${O.sumDec("value", 2)} AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "stream_sliding_counts" ->
      s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |w AS (SELECT time_bucket(INTERVAL '15 minutes', ts)
        |               - k.k * INTERVAL '15 minutes' AS win_start,
        |             event_type, value
        |      FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k)
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |  count(*) AS n, ${O.sumDec("value", 2)} AS sum_val
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "stream_session_windows" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |             WHEN ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1
        |             ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "stream_dedup_ids" ->
      """SELECT event_type, count(DISTINCT event_id) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the tumbling oracle again: the sink round-trip (written twice
    // with the same batch id) must change nothing
    "stream_sink_idempotent" ->
      s"""SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
        |                '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS n, ${O.sumDec("value", 2)} AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // same integer-weight fold over the same dense grid — float enters
    // once, at the division, on both sides
    "ts_changepoint_cusum" ->
      """WITH b AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vi
        |  FROM events WHERE value IS NOT NULL),
        |w AS (SELECT user_id, ts, event_id, vi,
        |    count(*) OVER (PARTITION BY user_id) AS n,
        |    sum(vi) OVER (PARTITION BY user_id) AS s,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS k,
        |    sum(vi) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM b),
        |d AS (SELECT user_id, ts, event_id,
        |    ((n * cum) - (k * s)) AS dd, n FROM w),
        |p AS (SELECT user_id, ts, event_id, dd, n,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY abs(dd) DESC, ts, event_id) AS rn
        |  FROM d)
        |SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS cp_ts,
        |  event_id, CAST(dd AS BIGINT) AS cusum_units,
        |  floor((CAST(dd AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0))*10000 + 0.5)/10000 AS cusum
        |FROM p WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "ts_ewma_smooth" ->
      s"""WITH e AS (SELECT event_type, time_bucket(INTERVAL '5 minutes',
        |                    CAST(ts AS TIMESTAMP)) AS bin FROM events),
        |c AS (SELECT event_type, bin, count(*) AS n FROM e GROUP BY 1, 2),
        |r AS (SELECT min(bin) AS minb, max(bin) AS maxb FROM c),
        |g AS (SELECT t.event_type, gs.bin
        |      FROM (SELECT DISTINCT event_type FROM events) t
        |      CROSS JOIN (SELECT unnest(generate_series(minb, maxb,
        |                    INTERVAL '5 minutes')) AS bin FROM r) gs),
        |f AS (SELECT g.event_type, g.bin,
        |        CAST(epoch(g.bin) // 300 AS BIGINT) AS i,
        |        COALESCE(c.n, 0) AS x
        |      FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.bin = c.bin),
        |j AS (SELECT a.event_type, a.bin, a.i - b.i AS k, b.x,
        |        CASE a.i - b.i
        |          WHEN 0 THEN 100000000000 WHEN 1 THEN 70000000000
        |          WHEN 2 THEN 49000000000 WHEN 3 THEN 34300000000
        |          WHEN 4 THEN 24010000000 WHEN 5 THEN 16807000000
        |          WHEN 6 THEN 11764900000 WHEN 7 THEN 8235430000
        |          WHEN 8 THEN 5764801000 WHEN 9 THEN 4035360700
        |          WHEN 10 THEN 2824752490 WHEN 11 THEN 1977326743
        |        END AS w
        |      FROM f a JOIN f b ON a.event_type = b.event_type
        |        AND b.i <= a.i AND b.i > a.i - 12)
        |SELECT event_type, strftime(bin, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  max(CASE WHEN k = 0 THEN x END) AS n,
        |  ${O.r4("CAST(sum(CAST(w AS DECIMAL(20,0)) * CAST(x AS DECIMAL(18,0))) AS DOUBLE)" +
          " / CAST(sum(CAST(w AS DECIMAL(20,0))) AS DOUBLE)")} AS ewma
        |FROM j GROUP BY event_type, bin
        |ORDER BY event_type, win_start""".stripMargin,
    // identical dense-grid pair space and exact decimal power sums;
    // float enters once in the same closed form (sqrt is
    // correctly-rounded, so both engines agree bit-for-bit pre-round)
    "ts_seasonal_hourly" ->
      s"""SELECT event_type,
        |  CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod,
        |  count(*) AS n,
        |  ${graft.Canon.sql.r4(graft.Canon.sql.sumDec("value", 2) + " / count(*)")} AS avg_val
        |FROM events GROUP BY 1, 2 ORDER BY event_type, hod""".stripMargin,
    "ts_xcorr_lagged" ->
      s"""WITH e AS (SELECT event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) AS BIGINT) AS bi
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |c AS (SELECT event_type, bi, count(*) AS n FROM e GROUP BY 1, 2),
        |r AS (SELECT min(bi) AS lo, max(bi) AS hi FROM c),
        |g AS (SELECT unnest(generate_series(lo, hi)) AS bi FROM r),
        |x AS (SELECT g.bi, CAST(COALESCE(c.n, 0) AS DECIMAL(18,0)) AS x
        |      FROM g LEFT JOIN c ON c.event_type = 'click' AND c.bi = g.bi),
        |y AS (SELECT g.bi, CAST(COALESCE(c.n, 0) AS DECIMAL(18,0)) AS y
        |      FROM g LEFT JOIN c ON c.event_type = 'purchase' AND c.bi = g.bi),
        |l AS (SELECT unnest(generate_series(-3, 3)) AS k),
        |j AS (SELECT l.k, x.x, y.y FROM l JOIN x ON true JOIN y ON y.bi = x.bi + l.k),
        |s AS (SELECT k, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(y * y) AS DOUBLE) AS syy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy
        |  FROM j GROUP BY k)
        |SELECT k AS lag, n,
        |  CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx <> 0
        |        AND CAST(n AS DOUBLE) * syy - sy * sy <> 0 THEN
        |    ${graft.Canon.sql.r4("(CAST(n AS DOUBLE) * sxy - sx * sy) / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))")}
        |  END AS xcorr
        |FROM s ORDER BY lag""".stripMargin,
    // 6 dp-gridded slopes/residuals; quantile_cont medians (binned
    // percentile parity); the pair cross is horizon-bounded
    "ts_theil_sen" ->
      s"""WITH e AS (SELECT time_bucket(INTERVAL '1 hour',
        |                    CAST(ts AS TIMESTAMP)) AS bin FROM events),
        |c AS (SELECT bin, count(*) AS n FROM e GROUP BY 1),
        |r AS (SELECT min(bin) AS minb, max(bin) AS maxb FROM c),
        |g AS (SELECT gs.bin FROM (SELECT unnest(generate_series(minb, maxb,
        |                    INTERVAL '1 hour')) AS bin FROM r) gs),
        |x AS (SELECT (epoch_us(g.bin) - epoch_us(r.minb)) // 3600000000 AS i,
        |        CAST(COALESCE(c.n, 0) AS BIGINT) AS y
        |      FROM g CROSS JOIN r LEFT JOIN c ON g.bin = c.bin),
        |sl AS (SELECT ${O.rk("CAST(b.y - a.y AS DOUBLE) / CAST(b.i - a.i AS DOUBLE)", 6)} AS s
        |       FROM x a JOIN x b ON a.i < b.i),
        |med AS (SELECT quantile_cont(s, 0.5) AS p50 FROM sl),
        |res AS (SELECT ${O.rk("CAST(y AS DOUBLE) - p50 * CAST(i AS DOUBLE)", 6)} AS rres
        |        FROM x CROSS JOIN med),
        |icpt AS (SELECT quantile_cont(rres, 0.5) AS ic FROM res),
        |cnt AS (SELECT count(*) AS n_hours FROM x),
        |pc AS (SELECT count(*) AS n_pairs FROM sl)
        |SELECT n_hours, n_pairs, ${O.r4("p50")} AS slope,
        |  ${O.r4("ic")} AS intercept
        |FROM cnt CROSS JOIN pc CROSS JOIN med CROSS JOIN icpt""".stripMargin,
    // integer MAE/bias sums over the same dense grid; float in the
    // final division only
    "ts_backtest_snaive" ->
      s"""WITH e AS (SELECT event_type, time_bucket(INTERVAL '1 hour',
        |                    CAST(ts AS TIMESTAMP)) AS bin FROM events),
        |c AS (SELECT event_type, bin, count(*) AS n FROM e GROUP BY 1, 2),
        |r AS (SELECT min(bin) AS minb, max(bin) AS maxb FROM c),
        |g AS (SELECT t.event_type, gs.bin
        |      FROM (SELECT DISTINCT event_type FROM events) t
        |      CROSS JOIN (SELECT unnest(generate_series(minb, maxb,
        |                    INTERVAL '1 hour')) AS bin FROM r) gs),
        |x AS (SELECT g.event_type, g.bin, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        |      FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.bin = c.bin),
        |l AS (SELECT event_type, n,
        |        lag(n, 168) OVER w AS f168, lag(n, 24) OVER w AS f24
        |      FROM x WINDOW w AS (PARTITION BY event_type ORDER BY bin))
        |SELECT event_type, count(*) AS n_hours,
        |  ${O.r4("CAST(sum(abs(n - f168)) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS mae_weekly,
        |  ${O.r4("CAST(sum(abs(n - f24)) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS mae_daily,
        |  CAST(sum(n - f168) AS BIGINT) AS bias_weekly
        |FROM l WHERE f168 IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ts_acf" -> {
      val lagSums = (1 to 6).map(k =>
        s"""CAST(sum(x*l$k) AS BIGINT) AS m$k, CAST(sum(l$k) AS BIGINT) AS sh$k,
           |        CAST(sum(CASE WHEN l$k IS NOT NULL THEN x END) AS BIGINT) AS st$k""".stripMargin)
        .mkString(",\n        ")
      val unpiv = (1 to 6).map(k =>
        s"SELECT event_type, n, s, q, $k AS lag, m$k AS m, sh$k AS sh, st$k AS stl FROM st")
        .mkString("\n  UNION ALL ")
      val den = "CAST(q AS DOUBLE) - CAST(s*s AS DOUBLE)/n"
      val num = "CAST(m AS DOUBLE) - (CAST(s AS DOUBLE)/n)*(sh + stl) " +
        "+ (n - lag)*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n)"
      s"""WITH e AS (SELECT event_type, time_bucket(INTERVAL '1 hour',
        |                    CAST(ts AS TIMESTAMP)) AS bin FROM events),
        |c AS (SELECT event_type, bin, count(*) AS n FROM e GROUP BY 1, 2),
        |r AS (SELECT min(bin) AS minb, max(bin) AS maxb FROM c),
        |g AS (SELECT t.event_type, gs.bin
        |      FROM (SELECT DISTINCT event_type FROM events) t
        |      CROSS JOIN (SELECT unnest(generate_series(minb, maxb,
        |                    INTERVAL '1 hour')) AS bin FROM r) gs),
        |x AS (SELECT g.event_type, g.bin, CAST(COALESCE(c.n, 0) AS BIGINT) AS x
        |      FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.bin = c.bin),
        |l AS (SELECT event_type, x,
        |        ${(1 to 6).map(k => s"lag(x, $k) OVER w AS l$k").mkString(", ")}
        |      FROM x WINDOW w AS (PARTITION BY event_type ORDER BY bin)),
        |st AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
        |        CAST(sum(x*x) AS BIGINT) AS q,
        |        $lagSums
        |       FROM l GROUP BY 1),
        |u AS ($unpiv)
        |SELECT event_type, CAST(lag AS BIGINT) AS lag,
        |  CASE WHEN $den <> 0 THEN ${O.r4(s"($num) / ($den)")}
        |       ELSE 0.0 END AS acf
        |FROM u ORDER BY event_type, lag""".stripMargin
    },
    "events_traffic_heatmap" ->
      s"""WITH g AS (SELECT isodow(CAST(ts AS TIMESTAMP)) - 1 AS dow,
        |    hour(CAST(ts AS TIMESTAMP)) AS hod, count(*) AS n,
        |    ${O.r4(O.sumDec("value", 2) + " / count(*)")} AS avg_val
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM g)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod, n,
        |  n * 1000000 // tt AS share_ppm, avg_val
        |FROM g CROSS JOIN t ORDER BY dow, hod""".stripMargin,
    // mirrors TimeSeriesOps.seasonalAnomalies: same hourly gapfill as
    // ts_acf, exact bigint per-(type, hod) sums, z spelled in the
    // identical op order, rank = |z| DESC with the bin as a total
    // tie-break; n<2 / zero-variance slots excluded before ranking
    "ts_seasonal_adjust" -> {
      val varE = "(CAST(q AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE)/CAST(c AS DOUBLE))/(CAST(c AS DOUBLE)-1.0)"
      s"""WITH e AS (SELECT event_type, time_bucket(INTERVAL '1 hour',
        |                    CAST(ts AS TIMESTAMP)) AS bin FROM events),
        |cnt AS (SELECT event_type, bin, count(*) AS n FROM e GROUP BY 1, 2),
        |r AS (SELECT min(bin) AS minb, max(bin) AS maxb FROM cnt),
        |g AS (SELECT t.event_type, gs.bin
        |      FROM (SELECT DISTINCT event_type FROM events) t
        |      CROSS JOIN (SELECT unnest(generate_series(minb, maxb,
        |                    INTERVAL '1 hour')) AS bin FROM r) gs),
        |x AS (SELECT g.event_type, g.bin, hour(g.bin) AS hod,
        |        CAST(COALESCE(cnt.n, 0) AS BIGINT) AS x
        |      FROM g LEFT JOIN cnt
        |        ON g.event_type = cnt.event_type AND g.bin = cnt.bin),
        |st AS (SELECT event_type, hod, count(*) AS c,
        |        CAST(sum(x) AS BIGINT) AS s2, CAST(sum(x*x) AS BIGINT) AS q
        |       FROM x GROUP BY 1, 2),
        |sc AS (SELECT x.event_type, x.bin, x.hod, x.x,
        |        (CAST(x.x AS DOUBLE) - CAST(s2 AS DOUBLE)/CAST(c AS DOUBLE))
        |          / sqrt($varE) AS z
        |       FROM x JOIN st
        |         ON x.event_type = st.event_type AND x.hod = st.hod
        |       WHERE c >= 2 AND $varE > 0),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |         ORDER BY abs(z) DESC, bin) AS rn FROM sc)
        |SELECT event_type, strftime(bin, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  CAST(hod AS BIGINT) AS hod, x AS n, ${O.r4("z")} AS z
        |FROM rk WHERE rn <= 3 ORDER BY event_type, win_start""".stripMargin
    },
    "ts_resample_gapfill" ->
      """WITH e AS (SELECT event_type, time_bucket(INTERVAL '5 minutes',
        |                    CAST(ts AS TIMESTAMP)) AS bin FROM events),
        |c AS (SELECT event_type, bin, count(*) AS n FROM e GROUP BY 1, 2),
        |r AS (SELECT min(bin) AS minb, max(bin) AS maxb FROM c),
        |g AS (SELECT t.event_type, gs.bin
        |      FROM (SELECT DISTINCT event_type FROM events) t
        |      CROSS JOIN (SELECT unnest(generate_series(minb, maxb,
        |                    INTERVAL '5 minutes')) AS bin FROM r) gs)
        |SELECT g.event_type, strftime(g.bin, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  COALESCE(c.n, 0) AS n
        |FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.bin = c.bin
        |ORDER BY g.event_type, win_start""".stripMargin,
    "stream_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id AS user_id
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |      WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id""".stripMargin,
    "stream_stateful_user_stats" ->
      """SELECT user_id, count(*) AS n_events,
        |  strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        |  strftime(max(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        |  count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ts_holt_trend" -> {
      val wCase = """CASE a.i - b.i
        |          WHEN 0 THEN 100000000000 WHEN 1 THEN 70000000000
        |          WHEN 2 THEN 49000000000 WHEN 3 THEN 34300000000
        |          WHEN 4 THEN 24010000000 WHEN 5 THEN 16807000000
        |          WHEN 6 THEN 11764900000 WHEN 7 THEN 8235430000
        |          WHEN 8 THEN 5764801000 WHEN 9 THEN 4035360700
        |          WHEN 10 THEN 2824752490 WHEN 11 THEN 1977326743
        |        END""".stripMargin
      val s1div = "CAST(sum(CAST(w AS DECIMAL(20,0)) * CAST(x AS DECIMAL(18,0))) AS DOUBLE)" +
        " / CAST(sum(CAST(w AS DECIMAL(20,0))) AS DOUBLE)"
      val s2div = "CAST(sum(CAST(w AS DECIMAL(12,0)) * CAST(x AS DECIMAL(12,6))) AS DOUBLE)" +
        " / CAST(sum(CAST(w AS DECIMAL(12,0))) AS DOUBLE)"
      s"""WITH e AS (SELECT event_type, time_bucket(INTERVAL '5 minutes',
        |                    CAST(ts AS TIMESTAMP)) AS bin FROM events),
        |c AS (SELECT event_type, bin, count(*) AS n FROM e GROUP BY 1, 2),
        |r AS (SELECT min(bin) AS minb, max(bin) AS maxb FROM c),
        |g AS (SELECT t.event_type, gs.bin
        |      FROM (SELECT DISTINCT event_type FROM events) t
        |      CROSS JOIN (SELECT unnest(generate_series(minb, maxb,
        |                    INTERVAL '5 minutes')) AS bin FROM r) gs),
        |f AS (SELECT g.event_type, g.bin,
        |        CAST(epoch(g.bin) // 300 AS BIGINT) AS i,
        |        COALESCE(c.n, 0) AS x
        |      FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.bin = c.bin),
        |j1 AS (SELECT a.event_type, a.bin, a.i, b.x, $wCase AS w
        |      FROM f a JOIN f b ON a.event_type = b.event_type
        |        AND b.i <= a.i AND b.i > a.i - 12),
        |s1t AS (SELECT event_type, bin, i,
        |        ${O.rk(s1div, 6)} AS x
        |      FROM j1 GROUP BY event_type, bin, i),
        |j2 AS (SELECT a.event_type, a.bin, a.i - b.i AS k, b.x, $wCase AS w
        |      FROM s1t a JOIN s1t b ON a.event_type = b.event_type
        |        AND b.i <= a.i AND b.i > a.i - 12),
        |s2t AS (SELECT event_type, bin,
        |        max(CASE WHEN k = 0 THEN x END) AS s1,
        |        $s2div AS s2
        |      FROM j2 GROUP BY event_type, bin)
        |SELECT event_type, strftime(bin, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  ${O.r4("s1")} AS s1, ${O.r4("s2")} AS s2,
        |  ${O.r4("2.0*s1 - s2")} AS level,
        |  ${O.rk("((s1 - s2) * 3.0) / 7.0", 6)} AS trend,
        |  ${O.r4("(2.0*s1 - s2) + ((s1 - s2) * 3.0) / 7.0")} AS forecast_next
        |FROM s2t ORDER BY event_type, win_start""".stripMargin
    },
    "ts_periodogram" ->
      s"""WITH e AS (SELECT time_bucket(INTERVAL '1 hour',
        |             CAST(ts AS TIMESTAMP)) AS bin FROM events),
        |c AS (SELECT bin, count(*) AS n FROM e GROUP BY 1),
        |r AS (SELECT min(bin) AS minb, max(bin) AS maxb FROM c),
        |g AS (SELECT unnest(generate_series(minb, maxb,
        |        INTERVAL '1 hour')) AS bin FROM r),
        |x AS (SELECT (epoch_us(g.bin) - (SELECT epoch_us(minb) FROM r))
        |        // 3600000000 AS i,
        |        CAST(COALESCE(c.n, 0) AS BIGINT) AS y
        |      FROM g LEFT JOIN c USING (bin)),
        |p AS (SELECT unnest([2,3,4,6,8,12,24,48,168]) AS period_h),
        |ph AS (SELECT period_h, i % period_h AS phase,
        |        count(*) AS np, CAST(sum(y) AS BIGINT) AS sp
        |       FROM x CROSS JOIN p GROUP BY 1, 2),
        |gm AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS s,
        |        CAST(sum(y*y) AS BIGINT) AS q FROM x),
        |sb AS (SELECT period_h, count(*) AS n_phases,
        |        CAST(sum(CAST(${O.rk("CAST(sp*sp AS DOUBLE) / np", 6)}
        |          AS DECIMAL(28,6))) AS DOUBLE) AS sb
        |       FROM ph GROUP BY 1)
        |SELECT period_h, n_phases,
        |  CASE WHEN (CAST(q AS DOUBLE) - CAST(s*s AS DOUBLE)/n) <> 0
        |    THEN ${O.rk("(sb - CAST(s*s AS DOUBLE)/n) / (CAST(q AS DOUBLE) - CAST(s*s AS DOUBLE)/n)", 6)}
        |    ELSE 0.0 END AS r2_seasonal
        |FROM sb CROSS JOIN gm ORDER BY period_h""".stripMargin
  )
}
