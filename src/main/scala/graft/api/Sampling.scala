package graft.api

import graft.Canon
import graft.functions.Kernels
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

object Sampling {
  /** Deterministic hex digest column for id-keyed selection: lowercase
    * md5 of the id's decimal string — identical in every engine, stable
    * across runs/partitions (unlike RNG-based `sample`), and uniform in
    * each hex position. */
  private def idHex(idCol: String): Column =
    md5(col(idCol).cast("string").cast("binary"))

  /** Reproducible subsample: keep rows whose digest prefix is below a
    * hex threshold — e.g. prefixLen=2, threshold "1a" keeps 26/256 ≈
    * 10.2%. A pure rowwise filter: pushes into the scan, no shuffle,
    * and the same rows are kept at any scale or partitioning. */
  def hashSample(df: DataFrame, idCol: String, prefixLen: Int,
      thresholdHex: String): DataFrame =
    df.filter(substring(idHex(idCol), 1, prefixLen) < thresholdHex)

  /** Stratified subsample: a different digest threshold per group —
    * the language/source rebalancing step of a training-data pipeline
    * ("keep 25% of en, 10% of everything else"). The per-group
    * threshold is a tiny CASE expression over the group column, so the
    * whole thing stays a pure rowwise filter that pushes to the scan:
    * no shuffle, no per-group pass, identical rows kept at any scale
    * or partitioning. Groups absent from `thresholds` fall back to
    * `defaultThreshold` ("00" = keep nothing). */
  def stratifiedHashSample(df: DataFrame, idCol: String, groupCol: String,
      thresholds: Map[String, String], prefixLen: Int = 2,
      defaultThreshold: String = "00"): DataFrame = {
    val thr = thresholds.foldLeft(lit(defaultThreshold)) { case (acc, (g, t)) =>
      when(col(groupCol) === g, lit(t)).otherwise(acc)
    }
    df.filter(substring(idHex(idCol), 1, prefixLen) < thr)
  }

  /** Deterministic training-shard packing: within each group, documents
    * are laid out in a reproducible pseudo-random order (md5 digest of
    * the id, then id) and greedily packed into shards of ~`budget`
    * size-units (tokens) — shard k = the docs whose EXCLUSIVE running
    * size prefix lands in [k·budget, (k+1)·budget). A doc may straddle
    * a boundary (standard packing-with-overflow); the layout is a pure
    * function of (ids, sizes), so re-runs and incremental re-packs
    * agree.
    *
    * Scale shape: the running sum is NOT one window per group (a single
    * partition per group would serialize 100 TB through few tasks).
    * It is the exact two-pass banded form: the digest's first
    * `bandChars` hex chars split each group into 16^bandChars ORDERED
    * bands (digest order = band order), each band cumsums in its own
    * partition, and a tiny per-(group, band) total table — running-
    * summed over band order and broadcast back — supplies each band's
    * global offset. Identical output to the single window, parallelism
    * ∝ groups × bands. */
  def packShards(df: DataFrame, idCol: String, groupCol: String,
      sizeCol: String, budget: Long, bandChars: Int = 1): DataFrame = {
    require(budget > 0, s"shard budget must be > 0, got $budget")
    require(bandChars >= 1 && bandChars <= 4,
      s"bandChars must be in [1, 4], got $bandChars")
    val digest = idHex(idCol)
    val banded = df.select(col(idCol), col(groupCol),
      col(sizeCol).cast("long").as(sizeCol),
      digest.as("_dig"), substring(digest, 1, bandChars).as("_band"))
    val w = Window.partitionBy(col(groupCol), col("_band"))
      .orderBy(col("_dig"), col(idCol))
    val within = banded.withColumn("_cs", sum(col(sizeCol)).over(w))
    val ow = Window.partitionBy(col(groupCol)).orderBy(col("_band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = banded.groupBy(col(groupCol), col("_band"))
      .agg(sum(col(sizeCol)).as("_bandSum"))
      .withColumn("_off", coalesce(sum(col("_bandSum")).over(ow), lit(0L)))
      .select(col(groupCol), col("_band"), col("_off"))
    within.join(broadcast(offsets), Seq(groupCol, "_band"))
      .withColumn("shard", expr(s"(_cs - `$sizeCol` + _off) div ${budget}L"))
      .select(col(idCol), col(groupCol), col(sizeCol), col("shard"))
  }

  /** Weighted deterministic subsample: keep a row iff u(id) < weight,
    * where u(id) = the digest's first 24 bits as a uniform [0,1) value
    * — so a row with weight 0.9 is kept with probability 0.9, weight
    * ≥ 1 always, weight ≤ 0 never, and the decision is a pure function
    * of the id (reproducible across runs, partitionings, and engines —
    * the quality-weighted downsampling step of a data pipeline without
    * RNG nondeterminism). Pure rowwise filter; pushes to the scan. */
  def weightedHashSample(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    val u = conv(substring(idHex(idCol), 1, 6), 16, 10)
      .cast("long").cast("double") / 16777216.0
    df.filter(u < weight)
  }

  /** Temperature-weighted corpus mixing (the multi-source LLM-data
    * rebalancing step): per-group sampling rate r_g = min(1, M·w_g/n_g)
    * with mixture weight w_g ∝ sqrt(n_g) (temperature α = 0.5, the
    * standard flatten-the-natural-distribution exponent) and M =
    * ⌊budgetFrac · N⌋ the target corpus size — over-represented groups
    * are downsampled hardest, rare groups keep (up to) everything.
    * Selection is the same digest-uniform u(id) < rate rowwise test as
    * [[weightedHashSample]]: no RNG, identical rows kept across runs,
    * partitionings, and engines. Output carries the per-row `rate` so
    * a correctness gate pins the mixture math, not just the kept set.
    *
    * Engine-exact by construction: sqrt is correctly rounded in every
    * IEEE engine, each sqrt is grid-rounded to 6 dp ([[graft.Canon]])
    * before the exact DECIMAL total, and the rate is grid-rounded
    * again — so the rates are pure functions of the integer group
    * counts, never of shuffle or sum order. Plan shape: one tiny
    * groupBy(group) aggregate, whole-frame window totals over
    * |groups| rows, broadcast join back, pushed rowwise filter — the
    * corpus is scanned once and never shuffled. */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
      budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac must be in (0, 1], got $budgetFrac")
    // NULL groups are excluded from BOTH the rate computation and the
    // output — counting them into N (and the sqrt total) while the
    // join below can never match a NULL key would deflate every other
    // group's rate and silently drop the rows
    val in = df.filter(col(groupCol).isNotNull)
    val counts = in.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_sq", Canon.rk(sqrt(col("_n")), 6))
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = counts
      .withColumn("_tot",
        sum(col("_sq").cast(DecimalType(18, 6))).over(w).cast("double"))
      .withColumn("_m", floor(lit(budgetFrac) * sum(col("_n")).over(w)))
      .withColumn("rate", Canon.rk(least(lit(1.0),
        col("_m") * col("_sq") / col("_tot") / col("_n")), 6))
      .select(col(groupCol), col("rate"))
    val u = conv(substring(idHex(idCol), 1, 6), 16, 10)
      .cast("long").cast("double") / 16777216.0
    in.join(broadcast(rates), groupCol).filter(u < col("rate"))
  }

  /** Deterministic per-group cap: keep the `n` rows with the smallest
    * id digest in each group — a reproducible "take at most n per
    * language/source" rebalancer with no RNG (the digest order is a
    * fixed pseudo-random shuffle, so the kept set is unbiased and
    * identical across runs, partitionings, and engines).
    *
    * Scale shape: `row_number() <= n` over (digest, id) per group —
    * exactly the pattern `GraftExtensions` rewrites to the bounded-heap
    * TopKPerGroup operator, so each task keeps an n-row heap per group
    * instead of sorting its partition. */
  def groupCap(df: DataFrame, idCol: String, groupCol: String, n: Int): DataFrame = {
    require(n >= 1, s"per-group cap must be >= 1, got $n")
    val w = Window.partitionBy(groupCol).orderBy(idHex(idCol).asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Budget-capped deterministic selection: keep each group's
    * digest-ordered prefix of documents whose EXCLUSIVE running size
    * stays under `budget` — the "up to N tokens per language" corpus-
    * assembly step. Exactly [[packShards]]' shard 0, so the banded
    * two-pass running sum does the work (parallelism ∝ groups × bands,
    * never one window partition per group) and the kept set is a pure
    * function of (ids, sizes) — stable across runs and engines. */
  def tokenBudgetSample(df: DataFrame, idCol: String, groupCol: String,
      sizeCol: String, budget: Long, bandChars: Int = 1): DataFrame =
    packShards(df, idCol, groupCol, sizeCol, budget, bandChars)
      .filter(col("shard") === 0L)
      .drop("shard")

  /** Deterministic train/test assignment from the same digest: ids
    * with first hex char < trainHexMax go to "train" (e.g. "d" →
    * 13/16 ≈ 81%). Membership is a pure function of the id, so a doc
    * never leaks across splits between runs. */
  def trainTestSplit(df: DataFrame, idCol: String,
      trainHexMax: String): DataFrame =
    df.withColumn("split",
      when(substring(idHex(idCol), 1, 1) < trainHexMax, lit("train"))
        .otherwise(lit("test")))
}
