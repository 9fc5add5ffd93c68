package graft.operators

import graft.{Canon, Q, Tables}
import graft.Canon.{sql => O}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3 — joins.
  *
  * Scale notes (100 TB): dims (region/nation/part/supplier/customer at
  * TPC-H ratios) stay broadcastable — `broadcast()` is explicit where
  * the optimizer must not fall back to shuffle. Fact-fact joins
  * (lineitem⋈orders) are sort-merge on the join key; AQE handles skew
  * splitting at runtime. The as-of join is expressed as union+window so
  * it needs ONE shuffle by user_id instead of a per-row subquery.
  */
object Joins {
  val queries: Map[String, Q] = Map(
    "join_inner_broadcast" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), Canon.sumDec(col("l_extendedprice"), 2).as("rev"))
        .orderBy("p_brand")
    }),
    "join_inner_shufflemerge" -> ((s, d) => {
      Tables.lineitem(s, d).hint("merge")
        .join(Tables.orders(s, d).hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderstatus")
    }),
    "join_multiway_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(Canon.sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy("n_name")
    }),
    "join_left_outer" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),
    "join_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, col("nk_c") === col("nk_s"), "full")
        .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),
    "join_semi" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),
    "join_anti" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),
    "join_range_theta" -> ((s, d) => {
      // equi key + band predicate: planned as SMJ on the key with the
      // band as a post-join filter — no cartesian blowup at scale.
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") >= col("o_orderdate")
            && col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderstatus")
    }),
    "join_interval_bucketed" -> ((s, d) => {
      // KEYLESS interval join, scale-shaped: views falling inside any
      // error's ±60 s window, with no shared key — binned to 60 s
      // buckets so the plan is an equi-join on the bin id (bounded
      // interval fanout) instead of the cartesian/BNLJ every naive
      // point-in-interval formulation produces
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), unix_micros(col("ts")).as("vus"))
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"),
          (unix_micros(col("ts")) - 60000000L).as("lo"),
          (unix_micros(col("ts")) + 60000000L).as("hi"))
      graft.api.TimeSeriesOps.intervalJoinBucketed(views, errs,
          "vus", "lo", "hi", binUs = 60000000L)
        .groupBy("err_id").agg(count(lit(1)).as("n_views"))
        .orderBy("err_id")
    }),
    "join_asof" -> ((s, d) => {
      // For each error event: most recent click (ts <= error ts) by the
      // same user. Union + running `last` = one shuffle by user_id
      // (graft.api.TimeSeriesOps.asofPrior); DuckDB oracle uses its
      // native ASOF LEFT JOIN.
      val ev = Tables.events(s, d)
      graft.api.TimeSeriesOps.asofPrior(
          left = ev.filter(col("event_type") === "error")
            .select("user_id", "ts", "event_id"),
          right = ev.filter(col("event_type") === "click"),
          keyCol = "user_id", tsCol = "ts", leftIdCol = "event_id")
        .select(col("event_id"), col("user_id"),
          Canon.tsStrMicros(col("ts")).as("error_ts"),
          Canon.tsStrMicros(col("asof_ts")).as("click_ts"))
        .orderBy("event_id")
    }),
    "join_asof_forward" -> ((s, d) => {
      // the forward twin of join_asof: for each error, the user's NEXT
      // view (ts >= error ts) — same one-shuffle union+window shape,
      // scanned in descending time order; DuckDB twin is its native
      // forward ASOF LEFT JOIN
      val ev = Tables.events(s, d)
      graft.api.TimeSeriesOps.asofNext(
          left = ev.filter(col("event_type") === "error")
            .select("user_id", "ts", "event_id"),
          right = ev.filter(col("event_type") === "view"),
          keyCol = "user_id", tsCol = "ts", leftIdCol = "event_id")
        .select(col("event_id"), col("user_id"),
          Canon.tsStrMicros(col("ts")).as("error_ts"),
          Canon.tsStrMicros(col("asof_ts")).as("view_ts"))
        .orderBy("event_id")
    }),
    "join_scd2_pit" -> ((s, d) => {
      // point-in-time (PIT) join — the feature-store / warehouse
      // correctness staple: each purchase event fetches the SCD-2
      // state version valid AT its timestamp (valid_from ≤ ts <
      // valid_to, half-open), never a later version (no label
      // leakage). Spark-first shape: the version lookup is the as-of
      // union+window (ONE user-key shuffle, no per-row subquery),
      // then one equi-join back on (user, valid_from) with the
      // half-open validity filter (which also drops zero-length
      // versions from same-µs change bursts — the oracle's range
      // predicate excludes them identically). versions fans into the
      // as-of union AND the fetch join — pinned (§7.2).
      val ev = Tables.events(s, d)
      val versions = graft.api.Checkpoints.pin(
        graft.api.Maintenance.scd2History(
          ev.select("user_id", "event_type", "ts", "event_id"),
          "user_id", "event_type", "ts", "event_id"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val asof = graft.api.TimeSeriesOps.asofPrior(facts,
        versions.select(col("user_id"), col("valid_from").as("ts")),
        "user_id", "ts", "event_id")
      val vsel = versions.select(col("user_id").as("_vu"),
        col("state"), col("valid_from"), col("valid_to"))
      asof.join(vsel, col("user_id") === col("_vu")
          && col("asof_ts") === col("valid_from"))
        .filter(col("valid_to").isNull || col("ts") < col("valid_to"))
        .select(col("event_id"), col("user_id"),
          Canon.tsStrMicros(col("ts")).as("ts"), col("state"),
          Canon.tsStrMicros(col("valid_from")).as("valid_from"))
        .orderBy("event_id")
    }),
    "join_asof_tolerance" -> ((s, d) => {
      // tolerance-bounded as-of (the pandas merge_asof(tolerance=...)
      // shape): nearest click either way, but a match farther than 12
      // hours is NO match — the left row survives with a NULL partner.
      // Same one-shuffle asofNearest core; the tolerance is a pure
      // rowwise post-filter on the integer-microsecond gap
      val ev = Tables.events(s, d)
      val tolUs = 43200000000L // 12 h
      val base = graft.api.TimeSeriesOps.asofNearest(
        left = ev.filter(col("event_type") === "error")
          .select("user_id", "ts", "event_id"),
        right = ev.filter(col("event_type") === "click"),
        keyCol = "user_id", tsCol = "ts", leftIdCol = "event_id")
      val gap = abs(unix_micros(col("asof_ts")) - unix_micros(col("ts")))
      base.select(col("event_id"), col("user_id"),
          Canon.tsStrMicros(col("ts")).as("error_ts"),
          Canon.tsStrMicros(when(gap <= tolUs, col("asof_ts"))).as("click_ts"),
          when(gap <= tolUs, col("asof_dir")).as("asof_dir"))
        .orderBy("event_id")
    }),
    "join_asof_nearest" -> ((s, d) => {
      // the bidirectional member completing the as-of family: for each
      // error, the same user's click closest in time EITHER way (|gap|
      // minimized, ties to the prior side). One union + ONE key
      // shuffle carrying both directional window passes
      // (TimeSeriesOps.asofNearest); the oracle runs BOTH native ASOF
      // joins and picks with the identical integer-μs gap compare.
      val ev = Tables.events(s, d)
      graft.api.TimeSeriesOps.asofNearest(
          left = ev.filter(col("event_type") === "error")
            .select("user_id", "ts", "event_id"),
          right = ev.filter(col("event_type") === "click"),
          keyCol = "user_id", tsCol = "ts", leftIdCol = "event_id")
        .select(col("event_id"), col("user_id"),
          Canon.tsStrMicros(col("ts")).as("error_ts"),
          Canon.tsStrMicros(col("asof_ts")).as("click_ts"),
          col("asof_dir"))
        .orderBy("event_id")
    }),
    "join_cross_small" -> ((s, d) => {
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_regionkey", "n_nationkey")
        .orderBy("r_regionkey", "n_nationkey")
    }),
    "join_bloom_prefilter" -> ((s, d) => {
      // explicit bloom runtime filter (SkewJoins.bloomSemiJoin): the
      // urgent orders' keys build a distributed bloom sketch that
      // probes lineitem at the SCAN as a codegen predicate, so only
      // ~matching rows reach the exact semi-join's exchange — the
      // first-run-guaranteed form of runtime row filtering for a
      // fact⋉dim where the dim outgrows the broadcast threshold.
      // Oracle is the plain semi-join: the bloom must change cost only
      graft.api.SkewJoins.bloomSemiJoin(
          Tables.lineitem(s, d),
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
            .select("o_orderkey"),
          factKey = "l_orderkey", dimKey = "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), Canon.sumDec(col("l_extendedprice"), 2).as("rev"))
        .orderBy("l_returnflag")
    }),
    "join_skew_salted" -> ((s, d) => {
      // skew-stress enrichment join (SkewJoins.saltedJoinAuto): the
      // routing key funnels ~70% of events onto ONE hot key (a
      // pathological heavy hitter the uniform fixture never produces),
      // so the stats-derived salt factor comes out ~23 (>1) at every
      // sf and the salted path actually RUNS: build replicated
      // salts-fold via explode, join on (key, salt), one hot key
      // spread across ~23 tasks instead of pinning one reducer.
      // Oracle is the PLAIN equi-join - salting must change cost
      // only, never answers. PlanShapeSpec pins the replication
      // (Generate/explode + _salt join key) and the derived factor.
      // The hot key routes to 1 — an EXISTING c_custkey (custkeys
      // start at 1) — so the ~70% hot mass lands in the verified
      // answer and a hot-key-specific drop/duplicate bug in the
      // salted path breaks the oracle hash, not just the shuffle
      // (r17 ADVICE: route 0 matched nothing, leaving the answer
      // blind to the very rows the key exists to stress).
      val probe = Tables.events(s, d).select(
        when(pmod(col("user_id"), lit(10)) < 7, lit(1L))
          .otherwise(pmod(col("user_id"), lit(100))).as("route_id"),
        col("event_id"), col("value"))
      val build = Tables.customer(s, d).filter(col("c_custkey") < 100)
        .select(col("c_custkey").as("route_id"), col("c_mktsegment"))
      graft.api.SkewJoins.saltedJoinAuto(probe, build, "route_id", "event_id")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), Canon.sumDec(col("value"), 2).as("sum_val"))
        .orderBy("c_mktsegment")
    })
  )

  val oracles: Map[String, String] = Map(
    "join_inner_broadcast" ->
      s"""SELECT p_brand, count(*) AS n, ${O.sumDec("l_extendedprice", 2)} AS rev
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_inner_shufflemerge" ->
      """SELECT o_orderstatus, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "join_multiway_revenue" ->
      s"""SELECT n_name, ${O.sumDec("l_extendedprice * (1 - l_discount)", 4)} AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "join_left_outer" ->
"""SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(c.nk, s.nk) AS nationkey,
        |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk ORDER BY nationkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_range_theta" ->
      """SELECT o_orderstatus, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "join_interval_bucketed" ->
      """WITH v AS (SELECT event_id AS view_id,
        |      epoch_us(CAST(ts AS TIMESTAMP)) AS vus
        |    FROM events WHERE event_type = 'view'),
        |e AS (SELECT event_id AS err_id,
        |      epoch_us(CAST(ts AS TIMESTAMP)) - 60000000 AS lo,
        |      epoch_us(CAST(ts AS TIMESTAMP)) + 60000000 AS hi
        |    FROM events WHERE event_type = 'error')
        |SELECT err_id, count(*) AS n_views
        |FROM v JOIN e ON vus >= lo AND vus <= hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_asof" ->
      """WITH errors AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |                FROM events WHERE event_type = 'error'),
        |     clicks AS (SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP) AS ts
        |                FROM events WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM errors e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin,
    "join_asof_forward" ->
      """WITH errors AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |                FROM events WHERE event_type = 'error'),
        |     views AS (SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP) AS ts
        |               FROM events WHERE event_type = 'view')
        |SELECT e.event_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
        |  strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts
        |FROM errors e ASOF LEFT JOIN views v
        |  ON e.user_id = v.user_id AND v.ts >= e.ts
        |ORDER BY e.event_id""".stripMargin,
    // the data_scd2_history version build + the textbook PIT range
    // predicate (valid_from <= ts < valid_to) — DuckDB evaluates the
    // range join directly; the Spark side reaches the same rows via
    // as-of union+window + equi-join (same half-open semantics)
    "join_scd2_pit" ->
      """WITH o AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    lag(event_type) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        |ch AS (SELECT user_id, event_type, ts, event_id FROM o
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |v AS (SELECT user_id, event_type AS state, ts AS vf,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
        |  FROM ch),
        |f AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS fts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id,
        |  strftime(f.fts, '%Y-%m-%d %H:%M:%S.%f') AS ts, v.state,
        |  strftime(v.vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from
        |FROM f JOIN v ON f.user_id = v.user_id
        |  AND v.vf <= f.fts AND (v.vt IS NULL OR f.fts < v.vt)
        |ORDER BY f.event_id""".stripMargin,
    "join_asof_tolerance" ->
      """WITH errors AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |                FROM events WHERE event_type = 'error'),
        |     clicks AS (SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP) AS ts
        |                FROM events WHERE event_type = 'click'),
        |p AS (SELECT e.event_id, c.ts AS pts
        |      FROM errors e ASOF LEFT JOIN clicks c
        |        ON e.user_id = c.user_id AND e.ts >= c.ts),
        |n AS (SELECT e.event_id, c.ts AS nts
        |      FROM errors e ASOF LEFT JOIN clicks c
        |        ON e.user_id = c.user_id AND c.ts >= e.ts),
        |m AS (SELECT e.event_id, e.user_id, e.ts,
        |  CASE
        |    WHEN p.pts IS NULL THEN n.nts
        |    WHEN n.nts IS NULL THEN p.pts
        |    WHEN epoch_us(e.ts) - epoch_us(p.pts)
        |      <= epoch_us(n.nts) - epoch_us(e.ts) THEN p.pts
        |    ELSE n.nts END AS cts,
        |  CASE
        |    WHEN p.pts IS NULL AND n.nts IS NULL THEN NULL
        |    WHEN p.pts IS NULL THEN 'next'
        |    WHEN n.nts IS NULL THEN 'prior'
        |    WHEN epoch_us(e.ts) - epoch_us(p.pts)
        |      <= epoch_us(n.nts) - epoch_us(e.ts) THEN 'prior'
        |    ELSE 'next' END AS dir
        |  FROM errors e
        |  JOIN p ON e.event_id = p.event_id
        |  JOIN n ON e.event_id = n.event_id)
        |SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
        |  strftime(CASE WHEN abs(epoch_us(cts) - epoch_us(ts)) <= 43200000000
        |           THEN cts END, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  CASE WHEN abs(epoch_us(cts) - epoch_us(ts)) <= 43200000000
        |       THEN dir END AS asof_dir
        |FROM m ORDER BY event_id""".stripMargin,
    "join_asof_nearest" ->
      """WITH errors AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |                FROM events WHERE event_type = 'error'),
        |     clicks AS (SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP) AS ts
        |                FROM events WHERE event_type = 'click'),
        |p AS (SELECT e.event_id, c.ts AS pts
        |      FROM errors e ASOF LEFT JOIN clicks c
        |        ON e.user_id = c.user_id AND e.ts >= c.ts),
        |n AS (SELECT e.event_id, c.ts AS nts
        |      FROM errors e ASOF LEFT JOIN clicks c
        |        ON e.user_id = c.user_id AND c.ts >= e.ts)
        |SELECT e.event_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
        |  strftime(CASE
        |    WHEN p.pts IS NULL THEN n.nts
        |    WHEN n.nts IS NULL THEN p.pts
        |    WHEN epoch_us(e.ts) - epoch_us(p.pts)
        |      <= epoch_us(n.nts) - epoch_us(e.ts) THEN p.pts
        |    ELSE n.nts END, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  CASE
        |    WHEN p.pts IS NULL AND n.nts IS NULL THEN NULL
        |    WHEN p.pts IS NULL THEN 'next'
        |    WHEN n.nts IS NULL THEN 'prior'
        |    WHEN epoch_us(e.ts) - epoch_us(p.pts)
        |      <= epoch_us(n.nts) - epoch_us(e.ts) THEN 'prior'
        |    ELSE 'next' END AS asof_dir
        |FROM errors e
        |JOIN p ON e.event_id = p.event_id
        |JOIN n ON e.event_id = n.event_id
        |ORDER BY e.event_id""".stripMargin,
    "join_cross_small" ->
      """SELECT r_regionkey, n_nationkey FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    // the plain semi-join — matching it proves the bloom pre-filter
    // changed the plan's cost, never its answer
    "join_bloom_prefilter" ->
      s"""SELECT l_returnflag, count(*) AS n, ${O.sumDec("l_extendedprice", 2)} AS rev
        |FROM lineitem WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the plain equi-join: the salted rewrite must be answer-invisible
    "join_skew_salted" ->
      s"""WITH p AS (SELECT CASE WHEN user_id % 10 < 7 THEN 1
        |      ELSE user_id % 100 END AS route_id, "value" AS v
        |    FROM events),
        |b AS (SELECT c_custkey AS route_id, c_mktsegment
        |    FROM customer WHERE c_custkey < 100)
        |SELECT c_mktsegment, count(*) AS n, ${O.sumDec("v", 2)} AS sum_val
        |FROM p JOIN b USING (route_id)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
