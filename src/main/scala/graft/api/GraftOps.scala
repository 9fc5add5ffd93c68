package graft.api

import graft.Canon
import graft.functions.Kernels
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public, fixture-independent operator API — what a user of the
  * reference library would call against their own tables. The declared
  * contract queries (graft.operators.*) are thin bindings of these
  * onto the test corpus.
  *
  * Every operation takes a DataFrame plus column names and returns a
  * DataFrame (optimizer-visible). Driver-side state is bounded:
  * `MlPipeline.trainLogisticGD` collects O(dims) weights and
  * `Similarity.trainCodebook` O(sampleSize) vectors; nothing else
  * collects. The multi-branch dedup constructors (`minhashPairs`,
  * `nearJaccardPairs`/`ngramJaccardPairs`, `jaccardPairsAgainstIndex`,
  * `connectedComponents`) materialize their shared hash tables EAGERLY
  * at call time (localCheckpoint) — building the frame runs those
  * jobs; see the r4 known-trap on lazy-checkpoint races for why.
  */
private[graft] object Fanout {
  /** Spread a SCAN-shaped input across all cores: a small parquet
    * input arrives as ONE scan partition, and a map-side UDF/BHJ chain
    * would otherwise run the whole corpus's work on a single core.
    * Explicit numPartitions so AQE does not coalesce it away.
    *
    * Two gates keep this a no-op everywhere else:
    *  1. only NARROW plans (scan + project/filter/generate) are
    *     probed — anything containing a join/aggregate/repartition is
    *     already parallelized by its own exchange, and probing it via
    *     `df.rdd` under AQE would EXECUTE the upstream stages just to
    *     read a partition count. For narrow plans the probe is pure
    *     planning (no exchange ⇒ no stage to run).
    *  2. a narrow input already at or above the target partition count
    *     is returned unchanged — on cluster-scale inputs the
    *     repartition would be a gratuitous extra shuffle. */
  def apply(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val narrow = df.queryExecution.optimizedPlan.collect {
      case p if !(p.isInstanceOf[LeafNode] || p.isInstanceOf[Project] ||
        p.isInstanceOf[Filter] || p.isInstanceOf[Generate] ||
        p.isInstanceOf[SubqueryAlias]) => p
    }.isEmpty
    if (!narrow) return df
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}

/** Lifecycle for the eager `localCheckpoint`s some constructors pin.
  *
  * RETENTION CONTRACT: `Dedup.minhashPairs`, `minhashPairsAgainstIndex`,
  * `jaccardPairsFromHashes` (via `nearJaccardPairs` / `ngramJaccardPairs`),
  * `jaccardPairsAgainstIndex`, and `Similarity.cosineTopKPairsBlocked`
  * (the `sim_knn_bruteforce` key) materialize their hashed-doc /
  * signature / cell-layout tables with eager local checkpoints at CALL
  * time (to run the expensive hashing once across plan branches). Those
  * blocks stay
  * pinned in executor storage until the returned frame is garbage
  * collected (ContextCleaner) — fine for batch jobs, but a long-lived
  * session constructing many pipelines should release them
  * deterministically with `Checkpoints.free(result)` once the result is
  * fully materialized (written / collected / checkpointed itself).
  * Freeing earlier BREAKS the frame: a local checkpoint truncates
  * lineage, so its blocks cannot be recomputed. */
object Checkpoints {
  /** Unpersist every localCheckpoint block in `df`'s lineage. Call only
    * after `df` (and anything else derived from the same constructor
    * call) has been fully materialized and is no longer needed. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}

object Dedup {
  private def fanout(df: DataFrame): DataFrame = Fanout(df)

  /** Exact Jaccard via the native codegen expression (no UDF boundary);
    * bit-identical to Kernels.jaccardLongs. */
  private def jac(df: DataFrame)(a: Column, b: Column): Column = {
    graft.functions.JaccardSim.register(df.sparkSession)
    call_function("graft_jaccard", a, b)
  }
  /** Exact-duplicate groups keyed on a content hash; shuffle carries
    * one 128-bit hash per row, never the content. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))
      .filter(col("n") > 1)

  /** Prefix-fingerprint duplicate groups: docs sharing the md5 of their
    * first `k` whitespace tokens — the crawl-dedup shortcut for pages
    * that differ only in a mutable tail (timestamps, session ids,
    * trailing boilerplate). Same shuffle shape as [[exactGroups]]: one
    * narrow rowwise digest, one hash aggregate carrying a 128-bit hash
    * per row; docs shorter than k tokens fingerprint their whole text. */
  def prefixGroups(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"prefix length must be > 0, got $k")
    df.groupBy(md5(concat_ws(" ",
        slice(split(col(textCol), " "), 1, k)).cast("binary")).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))
      .filter(col("n") > 1)
  }

  /** Fuzzy near-dup pairs by EDIT DISTANCE within prefix blocks:
    * candidates share their first-`prefixK`-token fingerprint (the
    * crawl shape — same page head, mutated tail), and survivors have
    * full-text Levenshtein ≤ `maxDist`. Complements the set-based
    * Jaccard family: edit distance also catches reorder-free
    * character-level mutations (typos, template substitutions) that
    * token-set measures under-count.
    *
    * Scale shape: the block key is one rowwise digest; candidates form
    * a self-equi-join on it (pair volume bounded by block sizes, never
    * all-pairs), and Levenshtein is a codegen'd built-in evaluated only
    * inside blocks. Exact Levenshtein is O(len²) per pair — the block
    * bound is what makes that affordable; choose prefixK so blocks
    * stay small (larger k → tighter blocks → fewer candidates). */
  def levenshteinPairs(df: DataFrame, idCol: String, textCol: String,
      prefixK: Int, maxDist: Int): DataFrame = {
    require(prefixK > 0, s"prefix length must be > 0, got $prefixK")
    require(maxDist >= 0, s"max distance must be >= 0, got $maxDist")
    val key = md5(concat_ws(" ",
      slice(split(col(textCol), " "), 1, prefixK)).cast("binary"))
    val t = df.select(col(idCol).as("_ida"), col(textCol).as("_ta"), key.as("_k"))
    val u = df.select(col(idCol).as("_idb"), col(textCol).as("_tb"), key.as("_k"))
    t.join(u, "_k")
      .filter(col("_ida") < col("_idb"))
      .withColumn("dist", levenshtein(col("_ta"), col("_tb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("_ida").as("id1"), col("_idb").as("id2"), col("dist"))
  }

  /** Exact Jaccard ≥ threshold pairs from a pre-hashed shingle table
    * `(id, _grp, _h: sorted distinct Array[Long])` — the shared core of
    * `nearJaccardPairs` / `ngramJaccardPairs`.
    *
    * Shape: PPJoin-style prefix filtering under a FREQUENCY-ordered
    * canonical shingle order, then exact verification:
    *  1. one aggregate computes each shingle's document frequency per
    *     group; every doc orders its shingles rarest-first under the
    *     global order (df asc, hash asc);
    *  2. prefix-filter theorem: J(A,B) ≥ t ⇒ |A∩B| ≥ ⌈t·|A|⌉, so any
    *     qualifying pair must collide inside the first
    *     |A| − ⌈t·|A|⌉ + 1 shingles of BOTH docs under the shared
    *     order. Only those prefixes are indexed — rarest-first means
    *     hot shingles ("the", common 3-grams) almost never enter a
    *     prefix, which is what keeps the candidate join sub-quadratic
    *     on skewed corpora;
    *  3. candidates = prefix self-equi-join on (grp, shingle) with
    *     id1 < id2 and the exact length filter
    *     (J ≥ t ⇒ t·|A| ≤ |B| ≤ |A|/t), deduped;
    *  4. exact verify: join the two hash arrays back (equi-shuffle on
    *     id; AQE broadcasts when small) and keep pairs with
    *     `Kernels.jaccardLongs ≥ t`.
    *
    * No broadcast of the corpus, no all-pairs stage — every step is an
    * equi-shuffle, hash aggregate, or per-doc window; candidate volume
    * tracks true-pair volume, not n². Empty shingle sets are excluded
    * (J(∅,·) is defined as 0 here — two empty docs are not duplicates;
    * DuckDB oracles are vacuously consistent because string_split never
    * returns an empty list). Requires threshold > 0: with t ≤ 0 the
    * prefix bound degenerates and every pair (including J=0 ones, which
    * this index join can never emit) would qualify.
    *
    * Join strategy is PINNED per regime, exactly like `minhashPairs`:
    * `broadcastJoins=true` (single-node / small-corpus default) puts an
    * explicit `broadcast()` on every build side (df table, candidate
    * index side, both verify doc sides) so a checkpoint-erased stat can
    * never flip a join to a skew-sensitive sort-merge mid-composite;
    * `broadcastJoins=false` is the 100 TB setting — the same joins
    * carry a SHUFFLE_HASH hint: equi-shuffles on (grp, shingle) / id,
    * never a sort, never a broadcast of corpus-sized sides. */
  private[api] def jaccardPairsFromHashes(hashed: DataFrame, threshold: Double,
      broadcastJoins: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    def pin(side: DataFrame): DataFrame =
      if (broadcastJoins) broadcast(side) else side.hint("shuffle_hash")
    // the hashed-doc table feeds FOUR plan branches (df aggregate,
    // prefix window, and both verify sides); an EAGER local checkpoint
    // materializes the shingle hashing exactly once — lazy would leave
    // the branches racing to compute the shared blocks in parallel
    // stages, each potentially running the full hashing
    val sized = hashed.filter(size(col("_h")) > 0)
      .select(col("_id"), col("_grp"), col("_h"), size(col("_h")).cast("long").as("_sz"))
      .localCheckpoint()
    val cand = jaccardCandStage(sized, threshold, pin)
    val docs = sized.select(col("_id"), col("_h"))
    cand
      .join(pin(docs.select(col("_id").as("id1"), col("_h").as("_h1"))), "id1")
      .join(pin(docs.select(col("_id").as("id2"), col("_h").as("_h2"))), "id2")
      .withColumn("jaccard", jac(hashed)(col("_h1"), col("_h2")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** The PPJoin candidate stage (postings → df order → prefixes →
    * candidate self-join): shared by `jaccardPairsFromHashes` and the
    * scale-probe hook [[jaccardCandidatePairs]]. `sized` must carry
    * (_id, _grp, _h, _sz). */
  private def jaccardCandStage(sized: DataFrame, threshold: Double,
      pin: DataFrame => DataFrame): DataFrame = {
    val prefix = prefixTable(sized, threshold, pin)
    val a = prefix.select(col("_id").as("id1"), col("_grp"), col("_sz").as("_sz1"), col("_s"))
    val b = prefix.select(col("_id").as("id2"), col("_grp").as("_grp2"),
      col("_sz").as("_sz2"), col("_s").as("_s2"))
    a.join(pin(b), col("_s") === col("_s2") && col("_grp") === col("_grp2")
        && col("id1") < col("id2")
        && col("_sz2") >= col("_sz1") * threshold - 1e-9
        && col("_sz1") >= col("_sz2") * threshold - 1e-9)
      .select("id1", "id2").distinct()
  }

  /** Each doc's PPJoin prefix — the |X| − ⌈t·|X|⌉ + 1 rarest shingles
    * under the canonical (document frequency asc, hash asc) order —
    * as (_id, _grp, _sz, _s) rows, with TWO physical regimes:
    *
    * - SMALL SHINGLE UNIVERSE (the char-n-gram case: n-grams over a
    *   finite alphabet are a bounded set no matter the corpus size —
    *   sf0.1's 712k 3-gram postings collapse to 1,885 distinct
    *   shingles): the df table is collected ONCE via a bounded probe
    *   and each doc selects its prefix in a single narrow map-side
    *   pass — no posting⋈df join, no per-doc window sort, and the
    *   downstream index explode emits ONLY prefix rows (~30% of
    *   postings at t=0.7). The broadcast-join analogue, gated exactly
    *   like `connectedComponents`' union-find fast path: driver memory
    *   is bounded by `spark.graft.jaccard.localDfThreshold` distinct
    *   (group, shingle) entries (default 1M ≈ tens of MB; 0 disables).
    * - UNBOUNDED UNIVERSE (word tokens: vocabulary grows with the
    *   corpus — typos, ids, URLs): the distributed shape — posting⋈df
    *   equi-join, per-doc row_number window, prefix filter. The
    *   deciding probe costs one aggregate job, which this path was
    *   about to run anyway as the join's build side.
    *
    * Both regimes order by (df asc, hash asc) with the same 1e-9
    * ceil slack (float rounding may only LENGTHEN a prefix, never
    * shorten it), so they produce IDENTICAL prefixes — parity-asserted
    * in ApiParitySpec. */
  /** The bounded decide-and-deliver probe for a local df map (the
    * CC-gate shape): fewer rows than the cap ⇒ the universe fits and
    * the rows ARE the df map; hitting the cap ⇒ caller falls through
    * to the distributed join path. */
  private def collectDfIfSmall(dfreq: DataFrame): Option[Array[org.apache.spark.sql.Row]] = {
    val maxLocal = dfreq.sparkSession.conf
      .get("spark.graft.jaccard.localDfThreshold", "1000000").toLong
    if (maxLocal <= 0) None
    else {
      val cap = (math.min(maxLocal, Int.MaxValue - 2L) + 1L).toInt
      val head = dfreq.limit(cap).collect()
      if (head.length < cap) Some(head) else None
    }
  }

  /** Map-side prefix selection against a collected (grp, shingle)→df
    * table: emits (_id, _grp, _sz, _s) prefix rows from `sized` in one
    * narrow pass — no posting⋈df join, no per-doc window. `defaultDf`
    * is the df assumed for shingles ABSENT from the map (0 for probe
    * docs scored against an index-side df table, matching the window
    * path's left-join + coalesce(_df, 0)). */
  private def localPrefixRows(sized: DataFrame,
      rows: Array[org.apache.spark.sql.Row], threshold: Double,
      defaultDf: Long): DataFrame = {
    def grpKey(v: Any): String = if (v == null) "\u0000" else v.toString
    val byGrp: Map[String, scala.collection.mutable.LongMap[Long]] =
      rows.groupBy(r => grpKey(r.get(0))).map { case (g, rs) =>
        val m = new scala.collection.mutable.LongMap[Long](rs.length * 2)
        rs.foreach(r => m.update(r.getLong(1), r.getLong(2)))
        g -> m
      }
    val bc = sized.sparkSession.sparkContext.broadcast(byGrp)
    val prefUdf = udf((grp: String, h: Seq[Long]) => {
      val dfm = bc.value.getOrElse(if (grp == null) "\u0000" else grp,
        scala.collection.mutable.LongMap.empty[Long])
      val sz = h.length
      val k = (sz - math.ceil(sz * threshold - 1e-9) + 1).toInt
      if (k >= sz) h.toArray
      else h.sortBy(s => (dfm.getOrElse(s, defaultDf), s)).take(k).toArray
    })
    sized.select(col("_id"), col("_grp"), col("_sz"),
      explode(prefUdf(col("_grp").cast("string"), col("_h"))).as("_s"))
  }

  private def prefixTable(sized: DataFrame, threshold: Double,
      pin: DataFrame => DataFrame): DataFrame = {
    val posts = sized.select(col("_id"), col("_grp"), col("_sz"), explode(col("_h")).as("_s"))
    val dfreq = posts.groupBy("_grp", "_s").agg(count(lit(1)).as("_df"))
    collectDfIfSmall(dfreq) match {
      case Some(rows) =>
        // every shingle is in its own df table, so defaultDf is moot
        localPrefixRows(sized, rows, threshold, defaultDf = 1L)
      case None =>
        // prefix length |X| − ⌈t·|X|⌉ + 1, with a 1e-9 slack so float
        // rounding can only LENGTHEN a prefix (safe) never shorten it
        val w = Window.partitionBy("_id").orderBy(col("_df").asc, col("_s").asc)
        // the prefix table feeds both sides of the candidate self-join,
        // but its exchange is shared via ReusedExchange within the
        // action and the post-shuffle window recompute is cheap codegen
        // — an explicit checkpoint here measured SLOWER on large
        // shingle tables (ngram)
        posts.join(pin(dfreq), Seq("_grp", "_s"))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= col("_sz") - ceil(col("_sz") * threshold - 1e-9) + 1)
          .select("_id", "_grp", "_sz", "_s")
    }
  }

  /** Scale-probe hook: the CANDIDATE pairs the PPJoin prefix filter
    * admits for `nearJaccardPairs(df, …, threshold)` — before exact
    * verification. The engine's sub-quadraticity claim is that this
    * count tracks c·(true pairs + n), not n²; a spec generates a
    * corpus with a controlled duplicate rate and asserts exactly that.
    * The hashed table is checkpointed like the real path — release
    * with `Checkpoints.free` after counting. */
  private[graft] def jaccardCandidatePairs(df: DataFrame, idCol: String,
      textCol: String, threshold: Double,
      partitionCol: Option[String] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val hashed = fanout(df).select(col(idCol).as("_id"),
      partitionCol.map(col).getOrElse(lit(0)).as("_grp"),
      Kernels.tokenHashesUdf(split(col(textCol), " ")).as("_h"))
    val sized = hashed.filter(size(col("_h")) > 0)
      .select(col("_id"), col("_grp"), col("_h"), size(col("_h")).cast("long").as("_sz"))
      .localCheckpoint()
    jaccardCandStage(sized, threshold, broadcast)
  }

  /** All pairs with token-set Jaccard ≥ threshold, exact — via the
    * inverted-index count join (`jaccardPairsFromHashes`): sub-quadratic
    * in practice and shuffle-only, vs the naive all-pairs self-join.
    * `minhashPairs` is the probabilistic twin when even the index join
    * is too hot. */
  def nearJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, partitionCol: Option[String] = None,
      broadcastJoins: Boolean = true): DataFrame = {
    // fanout BEFORE the hashing UDF: a single-partition scan would
    // otherwise run the whole corpus's token hashing on one core
    val hashed = fanout(df).select(col(idCol).as("_id"),
      partitionCol.map(col).getOrElse(lit(0)).as("_grp"),
      Kernels.tokenHashesUdf(split(col(textCol), " ")).as("_h"))
    jaccardPairsFromHashes(hashed, threshold, broadcastJoins)
  }

  /** Incremental near-dup detection: all (index_id, probe_id) pairs
    * with token-set Jaccard ≥ threshold BETWEEN a new batch (probe) and
    * an existing corpus (index) — the production shape "dedup today's
    * crawl against the corpus" where re-running corpus-vs-itself would
    * redo almost all of yesterday's work.
    *
    * The asymmetric PPJoin: the canonical shingle order is (index
    * document frequency asc, hash asc), computed from the INDEX side
    * only — so it is a property of the corpus, stable as batches
    * arrive, and probe shingles unseen in the corpus order as df=0
    * (rarest: they cannot collide with any index prefix anyway). Each
    * side takes its own prefix |X| − ⌈t·|X|⌉ + 1 under that shared
    * order; the prefix-filter lemma (with α = max(⌈t|A|⌉, ⌈t|B|⌉) ≤
    * |A∩B|) guarantees every qualifying cross pair collides inside both
    * prefixes. Candidates come from the probe-prefix ⋈ index-prefix
    * equi-join on (grp, shingle) with the two-sided length filter, then
    * exact verification on the hash arrays.
    *
    * At scale the index-side postings/prefix table is computed once and
    * persisted (it is a pure function of the corpus); each new batch
    * pays only its own hashing + the candidate and verify equi-shuffles
    * — cost tracks the BATCH size, not the corpus size. Join pinning
    * follows `jaccardPairsFromHashes`: explicit broadcast by default,
    * SHUFFLE_HASH hints with `broadcastJoins=false`. */
  def jaccardPairsAgainstIndex(probe: DataFrame, index: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      partitionCol: Option[String] = None,
      broadcastJoins: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    def pin(side: DataFrame): DataFrame =
      if (broadcastJoins) broadcast(side) else side.hint("shuffle_hash")
    def hashed(df: DataFrame): DataFrame = fanout(df)
      .select(col(idCol).as("_id"),
        partitionCol.map(col).getOrElse(lit(0)).as("_grp"),
        Kernels.tokenHashesUdf(split(col(textCol), " ")).as("_h"))
      .filter(size(col("_h")) > 0)
      .select(col("_id"), col("_grp"), col("_h"), size(col("_h")).cast("long").as("_sz"))
      .localCheckpoint()
    val idx = hashed(index)
    val prb = hashed(probe)
    val idxPosts = idx.select(col("_id"), col("_grp"), col("_sz"), explode(col("_h")).as("_s"))
    val dfreq = idxPosts.groupBy("_grp", "_s").agg(count(lit(1)).as("_df"))
    // same two prefix regimes as `prefixTable`, under the INDEX-side
    // canonical order: probe shingles absent from the corpus have df 0
    // and sort first (the window path's left join + coalesce(_df, 0))
    val (ip, pp) = collectDfIfSmall(dfreq) match {
      case Some(rows) =>
        (localPrefixRows(idx, rows, threshold, defaultDf = 1L),
          localPrefixRows(prb, rows, threshold, defaultDf = 0L))
      case None =>
        def prefix(posts: DataFrame): DataFrame = {
          val w = Window.partitionBy("_id").orderBy(col("_df").asc, col("_s").asc)
          posts.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") <= col("_sz") - ceil(col("_sz") * threshold - 1e-9) + 1)
            .select("_id", "_grp", "_sz", "_s")
        }
        (prefix(idxPosts.join(pin(dfreq), Seq("_grp", "_s"))),
          prefix(prb
            .select(col("_id"), col("_grp"), col("_sz"), explode(col("_h")).as("_s"))
            .join(pin(dfreq), Seq("_grp", "_s"), "left")
            .withColumn("_df", coalesce(col("_df"), lit(0L)))))
    }
    val cand = pp.select(col("_id").as("probe_id"), col("_grp"),
        col("_sz").as("_szp"), col("_s"))
      .join(pin(ip.select(col("_id").as("index_id"), col("_grp").as("_grp2"),
          col("_sz").as("_szi"), col("_s").as("_s2"))),
        col("_s") === col("_s2") && col("_grp") === col("_grp2")
          && col("_szi") >= col("_szp") * threshold - 1e-9
          && col("_szp") >= col("_szi") * threshold - 1e-9)
      .select("index_id", "probe_id").distinct()
    cand
      .join(pin(idx.select(col("_id").as("index_id"), col("_h").as("_h1"))), "index_id")
      .join(pin(prb.select(col("_id").as("probe_id"), col("_h").as("_h2"))), "probe_id")
      .withColumn("jaccard", jac(probe)(col("_h1"), col("_h2")))
      .filter(col("jaccard") >= threshold)
      .select("index_id", "probe_id", "jaccard")
  }

  /** Scalable near-dup pairs: banded MinHash-LSH candidates, verified
    * with exact Jaccard inside buckets only. Probabilistic recall
    * 1-(1-j^rows)^bands at similarity j — the defaults (16 bands × 8
    * rows) give ≈0.947 at j=0.8 and ≥0.9996 at j=0.9. rows=8 (not 4)
    * keeps the S-curve steep: on duplicate-heavy corpora with high
    * ambient similarity, a flat curve (rows=4 admits 34% of j=0.4
    * pairs) floods the bucket join with sub-threshold candidates and
    * the "LSH" silently degenerates to all-pairs. The 100 TB path: one
    * shuffle by (band, bucket), O(n²) only within buckets.
    *
    * Join strategy is PINNED, not stats-derived: `broadcastJoins=true`
    * (the single-node / small-corpus default) puts an explicit
    * `broadcast()` on the bucket-join build side and both verify-join
    * doc sides, so a checkpoint or a stats miss can never flip the plan
    * to a skew-sensitive shuffle join (a silent flip measured 11 s →
    * 27 s on the same code). `broadcastJoins=false` is the 100 TB
    * setting: the same joins carry a SHUFFLE_HASH hint — an equi-
    * shuffle on (band, bucket) / id, never a sort, never a broadcast of
    * a corpus that no longer fits. With the plan pinned, the hashing
    * work is safely materialized once, eagerly, at call time instead
    * of re-running the token + signature UDFs per plan branch.
    * Checkpoint retention: see [[Checkpoints]] — release with
    * `Checkpoints.free(result)` after materializing. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, bands: Int = 16, rowsPerBand: Int = 8,
      broadcastJoins: Boolean = true): DataFrame = {
    def pin(side: DataFrame): DataFrame =
      if (broadcastJoins) broadcast(side) else side.hint("shuffle_hash")
    // docs feeds both verify joins; sigs feeds both bucket-join sides —
    // checkpointing each makes the expensive UDFs (tokenHashes;
    // bands·rows splitmix rounds per token) run once, the pinned
    // strategy above makes losing their size estimates harmless, and
    // the fanout BEFORE the UDFs spreads the hashing across cores
    // instead of computing it inside a single-partition scan task
    val docs = fanout(df).select(col(idCol).as("_id"),
      Kernels.tokenHashesUdf(split(col(textCol), " ")).as("_th"))
      .localCheckpoint()
    val sigs = docs.select(col("_id"),
      Kernels.minhashBandsUdf(bands, rowsPerBand)(col("_th")).as("_sig"))
      .localCheckpoint()
    val banded = sigs.select(col("_id"), col("_sig"),
      posexplode(col("_sig")).as(Seq("_band", "_bh")))
    val x = banded.select(col("_id").as("id1"), col("_sig").as("_sig1"),
      col("_band"), col("_bh"))
    val y = banded.select(col("_id").as("id2"), col("_sig").as("_sig2"),
      col("_band").as("_band2"), col("_bh").as("_bh2"))
    // A pair colliding in k bands would surface k times; instead of a
    // global `distinct` shuffle over the inflated pair stream, each side
    // carries its full signature and only the FIRST band where the two
    // signatures agree emits the pair — exact dedup, zero extra
    // shuffle. The raw collision stream is the hottest row count in
    // the pipeline (~20M rows for 5k docs at sf0.1), so the first-
    // agreement test is the native codegen FirstEqIndex (fused loop,
    // early exit) rather than an allocating zip_with lambda.
    graft.functions.FirstEqIndex.register(df.sparkSession)
    val firstBand = call_function("graft_first_eq", col("_sig1"), col("_sig2"))
    val cand = x.join(pin(y), col("_band") === col("_band2") && col("_bh") === col("_bh2")
        && col("id1") < col("id2"))
      .filter(firstBand === col("_band") + 1)
      .select("id1", "id2")
    cand
      .join(pin(docs.select(col("_id").as("id1"), col("_th").as("_t1"))), "id1")
      .join(pin(docs.select(col("_id").as("id2"), col("_th").as("_t2"))), "id2")
      .withColumn("jaccard", jac(df)(col("_t1"), col("_t2")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** Incremental MinHash-LSH: banded candidates BETWEEN a new batch
    * (probe) and an existing corpus (index), verified with exact
    * Jaccard — the probabilistic twin of `jaccardPairsAgainstIndex`
    * and the at-scale production shape: the corpus's banded signature
    * table is a pure function of the corpus (persist it once,
    * partitioned by (band, bucket)); each arriving batch pays only its
    * own hashing + one bucket equi-join sized by the BATCH. Recall per
    * pair is the same 1-(1-j^rows)^bands S-curve as `minhashPairs`;
    * the first-agreeing-band test (native `graft_first_eq`) dedups
    * multi-band collisions without a distinct shuffle. Join pinning
    * follows `minhashPairs`: broadcast by default (single-node /
    * small-batch), SHUFFLE_HASH hints with `broadcastJoins=false`. */
  def minhashPairsAgainstIndex(probe: DataFrame, index: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      bands: Int = 16, rowsPerBand: Int = 8,
      broadcastJoins: Boolean = true): DataFrame = {
    def prep(df: DataFrame): (DataFrame, DataFrame) = {
      val docs = fanout(df).select(col(idCol).as("_id"),
        Kernels.tokenHashesUdf(split(col(textCol), " ")).as("_th"))
        .localCheckpoint()
      val banded = docs.select(col("_id"),
          Kernels.minhashBandsUdf(bands, rowsPerBand)(col("_th")).as("_sig"))
        .select(col("_id"), col("_sig"), posexplode(col("_sig")).as(Seq("_band", "_bh")))
      (docs, banded)
    }
    val (idxDocs, idxBanded) = prep(index)
    val (prbDocs, prbBanded) = prep(probe)
    minhashProbeJoin(prbDocs, prbBanded, idxDocs, idxBanded, threshold, broadcastJoins)
  }

  /** The persistable index tables behind `minhashPairsAgainstIndex` —
    * both pure functions of the corpus, so at scale they are written
    * ONCE (sources/Writers.writeBucketed: `banded` bucketed by
    * (_band, _bh), `docs` by _id) and every arriving batch probes them
    * via [[minhashProbePreparedIndex]] with NO exchange on the index
    * side of any join — only the batch shuffles.
    *
    * Returns (docs, banded): docs = (_id, _th token hashes);
    * banded = (_id, _sig, _band, _bh), one row per (doc, band). Each
    * frame re-runs the hashing when materialized — write them in one
    * pass each (no checkpoint here; the write IS the materialization). */
  def minhashIndexTables(index: DataFrame, idCol: String, textCol: String,
      bands: Int = 16, rowsPerBand: Int = 8): (DataFrame, DataFrame) = {
    val docs = fanout(index).select(col(idCol).as("_id"),
      Kernels.tokenHashesUdf(split(col(textCol), " ")).as("_th"))
    val banded = docs.select(col("_id"),
        Kernels.minhashBandsUdf(bands, rowsPerBand)(col("_th")).as("_sig"))
      .select(col("_id"), col("_sig"), posexplode(col("_sig")).as(Seq("_band", "_bh")))
    (docs, banded)
  }

  /** Probe a PREPARED minhash index — `idxDocs`/`idxBanded` as produced
    * by [[minhashIndexTables]], typically round-tripped through
    * bucketed tables. Semantics identical to
    * `minhashPairsAgainstIndex` for the same (bands, rowsPerBand);
    * with `broadcastJoins=false` and the index side bucketed on its
    * join keys, the bucket join and the index verify join read the
    * index exchange-free. */
  def minhashProbePreparedIndex(probe: DataFrame, idxDocs: DataFrame,
      idxBanded: DataFrame, idCol: String, textCol: String,
      threshold: Double, bands: Int = 16, rowsPerBand: Int = 8,
      broadcastJoins: Boolean = true): DataFrame = {
    val prbDocs = fanout(probe).select(col(idCol).as("_id"),
      Kernels.tokenHashesUdf(split(col(textCol), " ")).as("_th"))
      .localCheckpoint()
    val prbBanded = prbDocs.select(col("_id"),
        Kernels.minhashBandsUdf(bands, rowsPerBand)(col("_th")).as("_sig"))
      .select(col("_id"), col("_sig"), posexplode(col("_sig")).as(Seq("_band", "_bh")))
    minhashProbeJoin(prbDocs, prbBanded, idxDocs, idxBanded, threshold, broadcastJoins)
  }

  /** Shared probe tail of the incremental minhash shapes: banded bucket
    * join (first-agreeing-band dedup via native `graft_first_eq`) +
    * exact verify, with the `minhashPairs` join-pinning regimes. */
  private def minhashProbeJoin(prbDocs: DataFrame, prbBanded: DataFrame,
      idxDocs: DataFrame, idxBanded: DataFrame, threshold: Double,
      broadcastJoins: Boolean): DataFrame = {
    def pin(side: DataFrame): DataFrame =
      if (broadcastJoins) broadcast(side) else side.hint("shuffle_hash")
    graft.functions.FirstEqIndex.register(prbDocs.sparkSession)
    val firstBand = call_function("graft_first_eq", col("_sigP"), col("_sigI"))
    val cand = prbBanded
      .select(col("_id").as("probe_id"), col("_sig").as("_sigP"), col("_band"), col("_bh"))
      .join(pin(idxBanded.select(col("_id").as("index_id"), col("_sig").as("_sigI"),
          col("_band").as("_bandI"), col("_bh").as("_bhI"))),
        col("_band") === col("_bandI") && col("_bh") === col("_bhI"))
      .filter(firstBand === col("_band") + 1)
      .select("index_id", "probe_id")
    cand
      .join(pin(idxDocs.select(col("_id").as("index_id"), col("_th").as("_t1"))), "index_id")
      .join(pin(prbDocs.select(col("_id").as("probe_id"), col("_th").as("_t2"))), "probe_id")
      .withColumn("jaccard", jac(prbDocs)(col("_t1"), col("_t2")))
      .filter(col("jaccard") >= threshold)
      .select("index_id", "probe_id", "jaccard")
  }

  /** Driver union-find over a collected edge list — the exact same
    * min-reachable-label contract as the distributed loop, for graphs
    * small enough to fit the driver (id + label only, never content).
    * Union-by-min keeps every root the minimum member of its set, so
    * `find` directly yields the contract label; path halving keeps
    * lookups near-constant. Output is sorted by id for determinism. */
  private def localUnionFind(rows: Array[org.apache.spark.sql.Row],
      idType: org.apache.spark.sql.types.DataType,
      spark: SparkSession, parts: Int): DataFrame = {
    val parent = new java.util.HashMap[Any, Any](rows.length * 2)
    def find(x0: Any): Any = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val g = parent.getOrDefault(p, p)
        parent.put(x, g)
        x = g
        p = parent.getOrDefault(x, x)
      }
      x
    }
    def lt(x: Any, y: Any): Boolean =
      x.asInstanceOf[Comparable[Any]].compareTo(y.asInstanceOf[Comparable[Any]]) < 0
    val seen = new java.util.LinkedHashSet[Any]()
    rows.foreach { r =>
      val a = r.get(0); val b = r.get(1)
      seen.add(a); seen.add(b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    val members: Array[AnyRef] = seen.toArray
    java.util.Arrays.sort(members, new java.util.Comparator[AnyRef] {
      def compare(x: AnyRef, y: AnyRef): Int =
        x.asInstanceOf[Comparable[AnyRef]].compareTo(y)
    })
    val out = members.map(m => org.apache.spark.sql.Row(m, find(m)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("label", idType)))
    val np = math.max(1, math.min(parts, 1 + out.length / 65536))
    spark.createDataFrame(
      spark.sparkContext.parallelize(scala.collection.immutable.ArraySeq.unsafeWrapArray(out), np),
      schema)
  }

  /** Connected components over an undirected pair graph (id1, id2) —
    * the cluster-resolution step after near-dup pair generation: every
    * document gets the MINIMUM id reachable through duplicate pairs as
    * its cluster id, so "keep one doc per cluster" is a filter on
    * id == cluster.
    *
    * Min-label propagation PLUS pointer halving, with a driver-side
    * convergence loop. Each round: (1) propagate — every node takes
    * the min of its own and its neighbors' labels (one equi-join + one
    * hash aggregate over the pre-partitioned edge list); (2) shortcut —
    * each node follows its refreshed label's OWN previous label
    * (`L'(v) = L_prev(merged(v))`, one more equi-join on the small
    * label table). The shortcut contracts label chains geometrically
    * (reach ~doubles per round), so rounds needed are O(log diameter),
    * not O(diameter) — the round complexity of large-star/small-star
    * contraction with a strictly simpler per-round shape. The fixpoint
    * is unchanged: labels only ever DECREASE and stay inside their
    * component (L(x) ≤ x always, and L(x) is reachable from x, so the
    * composition is still a reachable node), and an unchanged Σlabel
    * forces both steps to have been the identity, which forces
    * component-constant labels = the reachable minimum.
    *
    * `localCheckpoint` cuts the growing lineage each round, and the
    * convergence probe rides the SAME action via `observe` — Σlabel is
    * strictly monotone until the fixpoint, and the checkpoint job's
    * CollectMetrics yields it for free: exactly ONE job per round, no
    * separate driver aggregate.
    *
    * Convergence is a hard contract: exiting the loop early means
    * labels are NOT yet the reachable minimum. Rather than return
    * silently wrong cluster ids, the non-converged exit throws (set
    * `strict = false` to get the partial labels plus a warning — e.g.
    * for exploratory runs). With pointer halving the default budget
    * covers diameters beyond 2^20 — any practical graph.
    *
    * Edge lists at or below `spark.graft.cc.localEdgeThreshold`
    * (default 2M edges) skip the loop entirely for a driver union-find
    * over the collected (id1, id2) pairs — identical labels, one job
    * instead of one per round. This is the broadcast-join analogue:
    * pick the local plan when the input provably fits, keep the
    * shuffle plan for when it doesn't. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
      strict: Boolean = true): DataFrame = {
    val spark = pairs.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // materialize the input pairs ONCE before fanning out: `sym` below
    // references the edge list twice (forward + swapped), and two
    // stages racing to compute a shared lazy upstream (e.g. the whole
    // near-dup verify pipeline) can each run it in full — measured as
    // a 10 s → 37 s swing on dedup_clusters depending on stage timing
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .localCheckpoint()
    // SMALL-GRAPH FAST PATH — the broadcast-join analogue for CC: a
    // near-dup pair graph is usually orders of magnitude smaller than
    // the corpus that produced it, and below this edge budget a driver
    // union-find beats the iterative loop's per-round job latency by an
    // order of magnitude (and is immune to ambient-load stragglers).
    // ONE bounded action decides AND delivers: collect up to
    // threshold+1 rows — fewer than the cap means the graph fits and
    // the collected rows ARE the union-find input; hitting the cap
    // cost only a bounded probe over already-checkpointed blocks (no
    // pair-pipeline re-run) and we take the distributed loop. Driver
    // memory is bounded by the conf: ~2M Row(id, id) ≈ tens-of-MB at
    // the default — raise it only with driver heap to match. Set
    // spark.graft.cc.localEdgeThreshold=0 to force the distributed
    // loop (tests do, and a 100 TB graph exceeds any sane threshold).
    val localMax =
      spark.conf.get("spark.graft.cc.localEdgeThreshold", "2000000").toLong
    if (localMax > 0) {
      val cap = (math.min(localMax, Int.MaxValue - 2L) + 1L).toInt
      val head = edges.limit(cap).collect()
      if (head.length < cap) {
        try return localUnionFind(head, edges.schema("a").dataType, spark, n)
        finally { edges.queryExecution.logical match {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
          case _ => ()
        } }
      }
    }
    // hash-partition the (static) edge list by the probe key ONCE; each
    // round's join then only shuffles the much smaller label table
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      .repartition(n, col("b")).localCheckpoint()
    // the eager checkpoint IS the round's one action; Σlabel rides it
    // as an observed metric instead of costing a second job. The sum is
    // taken as decimal(38,0), not long: labels are node ids, and a raw
    // i64 sum over billions of large ids could wrap, silently breaking
    // the strict-monotonicity argument the early-exit relies on.
    def checkpointWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = df.observe(obs, coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("lsum"))
        .localCheckpoint()
      (ck, obs.get("lsum").asInstanceOf[java.math.BigDecimal])
    }
    // free a superseded round's checkpoint blocks instead of leaving
    // them to GC-driven cleanup — a long loop would otherwise pin every
    // round's label table in executor storage
    def freeCheckpoint(df: DataFrame): Unit = df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
    // round 1 needs no join: labels are the ids themselves, so the
    // neighbor-min is a single aggregate over the edge list
    // every checkpoint pinned by the loop is released on ALL exit
    // paths: superseded rounds are freed as the loop runs, edges/sym in
    // the finally, and the current labels table too on ANY abnormal
    // exit — the strict non-convergence throw AND unexpected mid-loop
    // failures (a failed checkpoint/Observation job) alike; only the
    // successfully returned frame keeps its blocks
    var labels: DataFrame = null
    var returned = false
    try {
    var (l0, prevSum) = checkpointWithSum(sym.groupBy(col("b"))
      .agg(least(min(col("a")), col("b")).as("label"))
      .select(col("b").as("id"), col("label")))
    labels = l0
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prop = sym.join(labels.withColumnRenamed("id", "b"), "b")
        .select(col("a").as("id"), col("label"))
      val merged = labels.union(prop)
        .groupBy("id").agg(min(col("label")).as("label"))
      // pointer halving: look the fresh label up in the PREVIOUS
      // round's (already checkpointed) table — L_prev(x) <= x keeps the
      // decrease monotone, and chains contract geometrically. Label
      // values are node ids, so the lookup always hits; the left join +
      // coalesce is belt-and-braces for the first round's self-labels.
      // ADAPTIVE: dense near-dup graphs (diameter ~2-4) converge on
      // plain propagation before the shortcut could help, so its two
      // extra exchanges only start after round 3 — by then the graph
      // has demonstrated real diameter and the log-round contraction
      // is what bounds the loop.
      val short =
        if (i < 3) merged
        else merged
          .join(labels.select(col("id").as("_lid"), col("label").as("_ll")),
            col("label") === col("_lid"), "left")
          .select(col("id"), coalesce(col("_ll"), col("label")).as("label"))
      val (next, s) = checkpointWithSum(short)
      freeCheckpoint(labels)
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      i += 1
    }
    if (!converged) {
      val msg = s"connectedComponents did not converge in $maxIter rounds: " +
        "a duplicate chain is longer than maxIter hops, so labels are not yet " +
        "the reachable minimum. Raise maxIter, or for extreme-diameter graphs " +
        "use large-star/small-star alternation (O(log n) rounds)."
      if (strict) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(Dedup.getClass).warn(msg)
    }
    returned = true
    labels
    } finally {
      freeCheckpoint(edges)
      freeCheckpoint(sym)
      if (!returned && labels != null) freeCheckpoint(labels)
    }
  }

  /** Character n-gram (shingle) Jaccard near-dup pairs — robust to
    * token-boundary edits where word-level Jaccard is not. Shingles are
    * hashed once per row (over Unicode code points, not UTF-16 units);
    * pairs come from the same inverted-index count join as
    * `nearJaccardPairs`. Sub-n-char docs have no shingles and are
    * excluded (J(∅,·) = 0), mirrored by the oracle's `len(gs) > 0`. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, partitionCol: Option[String] = None,
      broadcastJoins: Boolean = true): DataFrame = {
    val hashed = fanout(df).select(col(idCol).as("_id"),
      partitionCol.map(col).getOrElse(lit(0)).as("_grp"),
      Kernels.charNgramHashesUdf(n)(col(textCol)).as("_h"))
    jaccardPairsFromHashes(hashed, threshold, broadcastJoins)
  }

  /** SimHash near-dup pairs: 64-bit per-doc fingerprint, candidate
    * generation by banded bucket-join (pigeonhole guarantees zero false
    * negatives for hamming < bands), then an exact Hamming filter.
    * State per row is ONE i64 — the cheapest scalable near-dup
    * signature; at 100 TB the (band, chunk) join replaces the O(n²)
    * self-join entirely. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(maxHamming < bands, "pigeonhole guarantee needs maxHamming < bands")
    val docs = fanout(df).select(col(idCol).as("_id"),
      Kernels.simhashUdf(Kernels.tokenHashesUdf(split(col(textCol), " "))).as("_sh"))
    val banded = docs.select(col("_id"), col("_sh"),
      posexplode(Kernels.simhashChunksUdf(bands)(col("_sh"))).as(Seq("_cix", "_chunk")))
    val x = banded.select(col("_id").as("id1"), col("_sh").as("_sh1"),
      col("_cix"), col("_chunk"))
    val y = banded.select(col("_id").as("id2"), col("_sh").as("_sh2"),
      col("_cix").as("_cix2"), col("_chunk").as("_chunk2"))
    // Pairs matching in several chunks dedup by keeping only the first
    // agreeing position — and "chunk b agrees" is just "the b-th bit
    // slice of sh1 XOR sh2 is zero", so the first-agreement index is a
    // when-chain of shift/mask tests on ONE xor: pure codegen integer
    // ops per collision row, no per-row chunk arrays, no lambda.
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val xor = col("_sh1").bitwiseXOR(col("_sh2"))
    val firstChunk = (0 until bands).reverse.foldLeft(lit(0): Column) { (acc, b) =>
      when(shiftrightunsigned(xor, b * width).bitwiseAND(lit(mask)) === 0, b + 1)
        .otherwise(acc)
    }
    x.join(y, col("_chunk") === col("_chunk2") && col("id1") < col("id2"))
      .filter(firstChunk === col("_cix") + 1)
      .withColumn("hamming", Kernels.hammingUdf(col("_sh1"), col("_sh2")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming").cast("int").as("hamming"))
  }
}

object Similarity {
  private def fanout(df: DataFrame): DataFrame = Fanout(df)

  /** Slack added to the triangle-inequality pruning cut so float error
    * can never prune a qualifying pair. Bound: cosines accumulate in
    * double over ≤ a few thousand float dims (≤ ~1e-12 absolute), and
    * acos amplifies a cosine error ε to at most √(2ε) ≈ 1.5e-6 rad
    * near ±1; the cut combines four such angles, so 1e-5 covers the
    * worst case with an order of magnitude to spare while costing no
    * measurable pruning (an extra 1e-5 rad of cell-pair admission). */
  private val AngleEps = 1e-5

  /** Cosine via the native codegen expression (no UDF boundary);
    * bit-identical to Kernels.cosineArr. */
  private def cos(df: DataFrame)(a: Column, b: Column): Column = {
    graft.functions.CosineSim.register(df.sparkSession)
    call_function("graft_cosine", a, b)
  }

  /** Global top-k most-similar pairs, brute force (broadcast × fanout).
    * The exactness baseline and the per-bucket inner loop of an
    * LSH/IVF layout at scale. `simRound` rounds similarities BEFORE
    * ordering so the top-k cutoff cannot straddle a float epsilon
    * across engines/runs. */
  def cosineTopKPairs(df: DataFrame, idCol: String, vecCol: String, k: Int,
      simRound: Option[Int] = None): DataFrame = {
    val a = fanout(df).select(col(idCol).as("id1"), col(vecCol).as("_e1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).as("_e2"))
    val sim = cos(df)(col("_e1"), col("_e2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        simRound.map(Canon.rk(sim, _)).getOrElse(sim).as("sim"))
      .orderBy(col("sim").desc, col("id1"), col("id2"))
      .limit(k)
  }

  /** EXACT global top-k most-similar pairs through the cell-blocked
    * join, in TWO passes (parity-asserted against the brute force in
    * ApiParitySpec, equi-join shape pinned in PlanShapeSpec):
    *
    *  1. WITNESS pass — the exact top-k among CELL-LOCAL pairs only
    *     (one equi-join on the cell id over the dense diagonal,
    *     TakeOrdered top-k). Its k-th similarity t₀ is achieved by k
    *     real pairs, and cell-local pairs are a subset of all pairs,
    *     so the global k-th best sim ≥ t₀ — every global top-k pair
    *     has sim ≥ t₀.
    *  2. the provably-exact blocked pair join
    *     ([[cosinePairsAboveCellBlocked]]'s core, reusing the same
    *     materialized cell layout) at threshold t₀, then the global
    *     top k of what it emits.
    *
    * Scale shape: pass 1 touches Σ_c n_c² cell-local pairs (where the
    * near-duplicate mass lives; ~1/|cells| of all pairs even on
    * isotropic data); on clustered corpora t₀ lands high and pass 2's
    * cell-pair admission prunes almost everything, so work tracks the
    * k-th similarity's selectivity, not n². Never an unblocked cross
    * join. Falls back to emit-everything only when fewer than k
    * cell-local pairs exist at all (near-trivial corpora). */
  def cosineTopKPairsBlocked(df: DataFrame, idCol: String, vecCol: String,
      k: Int, centroids: Array[Array[Float]],
      simRound: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // one cell layout shared by both passes (materialized now; freed by
    // the caller via Checkpoints.free after consuming the result, like
    // the dedup operators' shared tables)
    val vecs = assignCells(df, idCol, vecCol, centroids).localCheckpoint()
    val radii = collectRadii(vecs)
    val a = vecs.select(col("_vid").as("id1"), col("_v").as("_va"), col("_cell"))
    val b = vecs.select(col("_vid").as("id2"), col("_v").as("_vb"), col("_cell"))
    val sim = cos(vecs)(col("_va"), col("_vb"))
    val localTopK = a.join(b, Seq("_cell")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        simRound.map(Canon.rk(sim, _)).getOrElse(sim).as("sim"))
      .orderBy(col("sim").desc, col("id1"), col("id2"))
      .limit(k).collect()
    val pairs =
      // < k cell-local pairs: emit everything. Sentinel -2.0 (strictly
      // below any cosine), NOT -1.0: with simRound=None the unrounded
      // codegen cosine of antipodal vectors can land an ulp below -1.0
      // and a `sim >= -1.0` output filter would silently drop it
      if (localTopK.length < k)
        cellBlockedPairsCore(vecs, radii, centroids, -2.0, simRound)
      else
        cellBlockedPairsCore(vecs, radii, centroids,
          localTopK.last.getDouble(2), simRound)
    pairs.orderBy(col("sim").desc, col("id1"), col("id2")).limit(k)
  }

  /** Top-k neighbors for each row matching `queryPred`. */
  def cosineKnn(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, simRound: Option[Int] = None): DataFrame = {
    val q = df.filter(queryPred).select(col(idCol).as("qid"), col(vecCol).as("_qe"))
    val c = fanout(df).select(col(idCol).as("cid"), col(vecCol).as("_ce"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    val sim = cos(df)(col("_qe"), col("_ce"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", simRound.map(Canon.rk(sim, _)).getOrElse(sim))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "cid", "sim", "rank")
  }

  /** All same-group pairs with cosine ≥ minSim. */
  def cosineThresholdJoin(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String, minSim: Double, simRound: Option[Int] = None): DataFrame = {
    val a = fanout(df).select(col(idCol).as("id1"), col(groupCol).as("_g1"), col(vecCol).as("_e1"))
    val b = df.select(col(idCol).as("id2"), col(groupCol).as("_g2"), col(vecCol).as("_e2"))
    val sim = cos(df)(col("_e1"), col("_e2"))
    a.join(broadcast(b), col("_g1") === col("_g2") && col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("_g1").as(groupCol),
        simRound.map(Canon.rk(sim, _)).getOrElse(sim).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** All pairs with cosine ≥ minSim, no blocking key — embedding-space
    * near-duplicate candidates. The exact baseline; at 100 TB route
    * through `ivfKnn`-style cell assignment so only same/adjacent-cell
    * pairs are compared. */
  def cosinePairsAbove(df: DataFrame, idCol: String, vecCol: String,
      minSim: Double, simRound: Option[Int] = None): DataFrame = {
    val a = fanout(df).select(col(idCol).as("id1"), col(vecCol).as("_e1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).as("_e2"))
    val sim = cos(df)(col("_e1"), col("_e2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        simRound.map(Canon.rk(sim, _)).getOrElse(sim).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** EXACT all-pairs cosine ≥ minSim through cell-pair pruning — the
    * blocked twin of `cosinePairsAbove` whose output is guaranteed
    * identical on ANY data:
    *
    *  1. every vector is assigned to its nearest centroid cell (one
    *     map pass over a broadcast codebook) along with its angle to
    *     that centroid;
    *  2. one tiny aggregate yields each cell's angular radius
    *     r_c = max member angle — ≤ |cells| rows, collected (the
    *     codebook is driver-resident already, so this adds no new
    *     scale dependency);
    *  3. a cell pair (a, b) can only contain a qualifying pair if the
    *     MINIMUM possible angle between members,
    *     max(0, θ(centroid_a, centroid_b) − r_a − r_b), still has
    *     cosine ≥ minSim (triangle inequality on the sphere) — the
    *     admission test runs driver-side over the radius table and
    *     the surviving pairs join back as a broadcast equi-join;
    *  4. vectors join through the allowed cell pairs (equi-join on the
    *     cell id, never an unblocked cross join) and the exact cosine
    *     filter keeps the true pairs.
    *
    * On clustered corpora (dedup thresholds like 0.95) almost every
    * cross-cell pair is pruned and the join degenerates to cell-local
    * work — the 100 TB shape, with the cell id doubling as a write-time
    * partition key. On isotropic random data with a loose threshold
    * nothing is prunable by ANY exact method; the plan is then the same
    * all-pairs volume, but still expressed through the blocked join. */
  def cosinePairsAboveCellBlocked(df: DataFrame, idCol: String, vecCol: String,
      minSim: Double, centroids: Array[Array[Float]],
      simRound: Option[Int] = None): DataFrame = {
    val vecs = assignCells(df, idCol, vecCol, centroids)
    cellBlockedPairsCore(vecs, collectRadii(vecs), centroids, minSim, simRound)
  }

  /** (_vid, _v, _cell, _ang): every vector with its nearest-centroid
    * cell and the angle to that centroid — the shared front half of
    * the cell-blocked operators. */
  private def assignCells(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    val cellOf = udf((v: Seq[Float]) => Kernels.nearestCells(v, centroids, 1).head)
    val angToCell = udf((v: Seq[Float], c: Int) =>
      math.acos(math.max(-1.0, math.min(1.0, Kernels.cosineWith(v, centroids(c))))))
    fanout(df).select(col(idCol).as("_vid"), col(vecCol).as("_v"))
      .withColumn("_cell", cellOf(col("_v")))
      .withColumn("_ang", angToCell(col("_v"), col("_cell")))
  }

  /** Per-cell angular radii, collected: bounded by the codebook
    * (≤ |cells| rows, and the codebook already lives on the driver),
    * so the cell-pair admission test can run driver-side. */
  private def collectRadii(vecs: DataFrame): Array[(Int, Double)] =
    vecs.groupBy("_cell").agg(max(col("_ang")).as("_rad"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)

  /** The blocked pair join over pre-assigned vectors: driver-side cell
    * admission, broadcast allowed-pair equi-join, exact cosine filter.
    * Taking (vecs, radii) lets a threshold descent reuse one cell
    * layout across rungs instead of re-deriving it per threshold. */
  private def cellBlockedPairsCore(vecs: DataFrame, radii: Array[(Int, Double)],
      centroids: Array[Array[Float]], minSim: Double,
      simRound: Option[Int]): DataFrame = {
    // the output filter compares the ROUNDED sim to minSim, which
    // admits true sims down to minSim − half an ulp of the rounding
    // grid — the pruning bound must use that effective threshold or
    // boundary pairs in tight cells would be silently dropped
    val effMin = minSim - simRound.map(k => 0.5 * math.pow(10.0, -k)).getOrElse(0.0)
    val thetaMax = math.acos(math.max(-1.0, math.min(1.0, effMin)))
    def centAng(a: Int, b: Int): Double =
      math.acos(math.max(-1.0, math.min(1.0, Kernels.cosineWith(centroids(a).toSeq, centroids(b)))))
    val allowedPairs = for {
      (ca, ra) <- radii.toSeq; (cb, rb) <- radii.toSeq
      if ca <= cb
      if math.max(centAng(ca, cb) - ra - rb, 0.0) <= thetaMax + AngleEps
    } yield (ca, cb)
    val spark = vecs.sparkSession
    import spark.implicits._
    val allowed = allowedPairs.toDF("_ca", "_cbAllowed")
    val a = vecs.select(col("_vid").as("_ida"), col("_v").as("_va"), col("_cell").as("_ca"))
    val b = vecs.select(col("_vid").as("_idb"), col("_v").as("_vb"), col("_cell").as("_cb"))
    val sim = cos(vecs)(col("_va"), col("_vb"))
    a.join(broadcast(allowed), "_ca")
      .join(b, col("_cbAllowed") === col("_cb") && (col("_ca") < col("_cbAllowed")
        || (col("_ca") === col("_cbAllowed") && col("_ida") < col("_idb"))))
      .select(least(col("_ida"), col("_idb")).as("id1"),
        greatest(col("_ida"), col("_idb")).as("id2"),
        simRound.map(Canon.rk(sim, _)).getOrElse(sim).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Incremental EXACT embedding dedup: cosine ≥ minSim pairs between a
    * new BATCH and an existing CORPUS (never corpus×corpus) — the
    * embedding twin of `Dedup.jaccardPairsAgainstIndex`, completing the
    * incremental family (exact text, MinHash, embeddings).
    *
    * Per-batch-vector cell pruning is tighter than the symmetric
    * variant: corpus cell c can contain a match for batch vector v only
    * if θ(v, centroid_c) − r_c ≤ θmax (triangle inequality on the
    * sphere), so each batch vector probes only the cells that can
    * possibly qualify. Output is provably identical to the brute-force
    * batch×corpus join on ANY data — the codebook affects pruning
    * quality, never correctness.
    *
    * Scale shape: the corpus cell assignment and per-cell radii are
    * computable ONCE and persistable (cell id = write-time partition
    * key); a daily ingest then pays one map pass over the batch, a
    * broadcast of the tiny radius table, and an equi-join on the cell
    * id — probe cost tracks BATCH size, not corpus size. */
  def cosinePairsAgainstIndexCellBlocked(batch: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, minSim: Double,
      centroids: Array[Array[Float]], simRound: Option[Int] = None): DataFrame =
    cosineProbePreparedCellIndex(batch,
      cellIndex(corpus, idCol, vecCol, centroids),
      idCol, vecCol, minSim, centroids, simRound)

  /** The persistable index side of [[cosinePairsAgainstIndexCellBlocked]]:
    * every corpus vector with its cell id and centroid angle —
    * (idCol, vecCol, _cell, _ang). Write it once with
    * `Writers.writePartitioned(index, "_cell", path)` (the cell id as
    * the write-time partition key) and probe arriving batches against
    * the loaded table via [[cosineProbePreparedCellIndex]]; the daily
    * ingest then never re-assigns the corpus. */
  def cellIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    val cellOf = udf((v: Seq[Float]) => Kernels.nearestCells(v, centroids, 1).head)
    val angToCell = udf((v: Seq[Float], c: Int) =>
      math.acos(math.max(-1.0, math.min(1.0, Kernels.cosineWith(v, centroids(c))))))
    fanout(corpus).select(col(idCol), col(vecCol))
      .withColumn("_cell", cellOf(col(vecCol)))
      .withColumn("_ang", angToCell(col(vecCol), col("_cell")))
  }

  /** Probe half: exact batch×corpus cosine ≥ minSim pairs against a
    * prepared (possibly loaded-from-disk) [[cellIndex]] table. Same
    * output as the one-shot variant on ANY data; per-cell radii come
    * from one tiny aggregate over the index. */
  def cosineProbePreparedCellIndex(batch: DataFrame, index: DataFrame,
      idCol: String, vecCol: String, minSim: Double,
      centroids: Array[Array[Float]], simRound: Option[Int] = None): DataFrame = {
    // same rounding-aware pruning bound as cosinePairsAboveCellBlocked:
    // the rounded-sim output filter admits true sims half a grid step
    // below minSim, so the triangle-inequality cut must too
    val effMin = minSim - simRound.map(k => 0.5 * math.pow(10.0, -k)).getOrElse(0.0)
    val thetaMax = math.acos(math.max(-1.0, math.min(1.0, effMin)))
    val corp = index.select(col(idCol).as("_cid"), col(vecCol).as("_cv"),
      col("_cell"), col("_ang"))
    // per-cell radii are bounded by the (driver-resident) codebook, so
    // they ship inside the probe UDF: each batch vector explodes into
    // exactly the cells that can qualify — an equi-join on the cell id,
    // with no nested-loop batch × radii pass
    val radii = corp.groupBy("_cell").agg(max(col("_ang")).as("_rad"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    val probeCells = udf((v: Seq[Float]) => radii.collect {
      case (c, rad) if math.acos(math.max(-1.0, math.min(1.0,
        Kernels.cosineWith(v, centroids(c))))) - rad <= thetaMax + AngleEps => c
    })
    val probes = fanout(batch).select(col(idCol).as("_bid"), col(vecCol).as("_bv"))
      .withColumn("_cell", explode(probeCells(col("_bv"))))
    val sim = cos(batch)(col("_bv"), col("_cv"))
    probes.join(corp.drop("_ang"), "_cell")
      .select(col("_bid").as("id1"), col("_cid").as("id2"),
        simRound.map(Canon.rk(sim, _)).getOrElse(sim).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** IVF-style approximate kNN — the scale path for similarity search.
    *
    * Coarse quantization: every vector is assigned to its nearest of
    * `centroids` cells (one pass, broadcastable centroid table);
    * queries probe their `nprobe` nearest cells and rank only those
    * candidates. At 100 TB the cell assignment is a write-time
    * partition key: a query touches nprobe/|cells| of the data instead
    * of all of it. Recall is tested against the brute-force baseline.
    */
  def ivfKnn(df: DataFrame, idCol: String, vecCol: String, queryPred: Column,
      k: Int, centroids: Array[Array[Float]], nprobe: Int,
      simRound: Option[Int] = None): DataFrame = {
    val cellOf = udf((v: Seq[Float]) => Kernels.nearestCells(v, centroids, 1).head)
    val probesOf = udf((v: Seq[Float]) => Kernels.nearestCells(v, centroids, nprobe))
    val cands = fanout(df)
      .select(col(idCol).as("cid"), col(vecCol).as("_ce"))
      .withColumn("_cell", cellOf(col("_ce")))
    val q = df.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("_qe"))
      .withColumn("_probe", explode(probesOf(col("_qe"))))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    val sim = cos(df)(col("_qe"), col("_ce"))
    cands.join(broadcast(q), col("_cell") === col("_probe") && col("qid") =!= col("cid"))
      .withColumn("sim", simRound.map(Canon.rk(sim, _)).getOrElse(sim))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "cid", "sim", "rank")
  }

  /** Persist an IVF index to `path`: the codebook as a tiny parquet
    * table (`Artifacts.saveCodebook`) plus the cell-assigned corpus
    * laid out ONE DIRECTORY PER CELL (`Writers.writePartitioned` on
    * the cell id) — the "cell id as a write-time partition key" layout
    * the scaladocs promise, made durable. Between crawl batches an
    * incremental 100 TB pipeline keeps exactly this on disk: the next
    * batch reopens it cold and probes nprobe/|cells| of the files
    * instead of re-embedding, re-assigning, or re-reading anything. */
  def saveIvfIndex(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], path: String): Unit = {
    graft.sources.Artifacts.saveCodebook(df.sparkSession, centroids,
      s"$path/codebook")
    val cellOf = udf((v: Seq[Float]) => Kernels.nearestCells(v, centroids, 1).head)
    val assigned = df.select(col(idCol).as("_vid"), col(vecCol).as("_v"))
      .withColumn("_cell", cellOf(col("_v")))
    graft.sources.Writers.writePartitioned(assigned, "_cell", s"$path/cells")
  }

  /** Probe a [[saveIvfIndex]] layout COLD: reload the codebook from
    * its parquet table, route each query to its `nprobe` nearest
    * cells, and join against the per-cell directories. Identical
    * output to [[ivfKnn]] over the same corpus/codebook (unit-tested
    * bitwise in NoOracleSpec) — the probe-side cosine is the same
    * codegen kernel and the candidate set is the same cell equi-join;
    * only the index side now comes from disk. The scan is eligible
    * for dynamic partition pruning: the probed cell ids reach the
    * file index, so unprobed cells' directories are never opened. */
  def ivfKnnFromIndex(queries: DataFrame, idCol: String, vecCol: String,
      indexPath: String, k: Int, nprobe: Int,
      simRound: Option[Int] = None): DataFrame = {
    val spark = queries.sparkSession
    val centroids = graft.sources.Artifacts.loadCodebook(spark,
      s"$indexPath/codebook")
    val probesOf = udf((v: Seq[Float]) => Kernels.nearestCells(v, centroids, nprobe))
    val cands = spark.read.parquet(s"$indexPath/cells")
      .select(col("_vid").as("cid"), col("_v").as("_ce"), col("_cell"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("_qe"))
      .withColumn("_probe", explode(probesOf(col("_qe"))))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    val sim = cos(queries)(col("_qe"), col("_ce"))
    cands.join(broadcast(q), col("_cell") === col("_probe") && col("qid") =!= col("cid"))
      .withColumn("sim", simRound.map(Canon.rk(sim, _)).getOrElse(sim))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "cid", "sim", "rank")
  }

  /** Random-hyperplane LSH approximate kNN — the DATA-INDEPENDENT
    * scale path for cosine similarity search, complementing `ivfKnn`:
    * no codebook to train (and so no drift as the corpus grows), at
    * the cost of weaker pruning on clustered data than a trained
    * quantizer. `tables` independent hash tables of `bits` hyperplane
    * sign bits each; a data vector and a query collide if they share
    * any table's bucket (recall per neighbor at angle θ is
    * 1-(1-(1-θ/π)^bits)^tables). Planes are seeded Gaussians, so
    * signatures — and results — are reproducible, and since planes are
    * data-independent there is no query-leakage question at all.
    *
    * Scale shape mirrors `ivfKnn`: signatures are one narrow map pass;
    * candidates come from the (table, bucket) equi-join against the
    * broadcast query side (query sets are bounded); multi-table
    * collisions dedup via the first-agreeing-table test (native
    * `graft_first_eq`, no distinct shuffle); the final per-query top-k
    * is the row_number≤k idiom the TopKPerGroup rewrite turns into a
    * bounded heap. At 100 TB the (table, bucket) pair is a write-time
    * partition key exactly like the IVF cell. `bits` sizes buckets
    * (aim ~n/2^bits candidates per table); the 6/16 defaults suit the
    * fixture's ~unit-norm 64-d corpus. */
  def rpLshKnn(df: DataFrame, idCol: String, vecCol: String, queryPred: Column,
      k: Int, dims: Int, tables: Int = 16, bits: Int = 6, seed: Long = 42L,
      simRound: Option[Int] = None): DataFrame = {
    require(dims > 0, s"dims must be > 0, got $dims")
    require(tables > 0 && bits > 0 && bits <= 63,
      s"need tables > 0 and bits in [1, 63], got tables=$tables bits=$bits")
    val rnd = new java.util.Random(seed)
    val planes: Array[Array[Array[Float]]] =
      Array.fill(tables, bits)(Array.fill(dims)(rnd.nextGaussian().toFloat))
    val sigUdf = udf((v: Seq[Float]) => {
      val arr = v.toArray
      // fail loudly: a vector shorter/longer than the declared dims
      // would otherwise yield a partial dot product and a plausible-
      // but-wrong signature (silently broken recall)
      require(arr.length == dims,
        s"rpLshKnn: vector of length ${arr.length} does not match declared dims=$dims")
      planes.map { tp =>
        var h = 0L
        var i = 0
        while (i < tp.length) {
          val p = tp(i)
          var dp = 0.0
          var j = 0
          while (j < dims) { dp += arr(j) * p(j); j += 1 }
          h = (h << 1) | (if (dp >= 0) 1L else 0L)
          i += 1
        }
        h
      }.toSeq
    })
    graft.functions.FirstEqIndex.register(df.sparkSession)
    val data = fanout(df).select(col(idCol).as("cid"), col(vecCol).as("_ce"))
      .withColumn("_sig", sigUdf(col("_ce")))
      .select(col("cid"), col("_ce"), col("_sig"),
        posexplode(col("_sig")).as(Seq("_t", "_h")))
    val q = df.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("_qe"))
      .withColumn("_qsig", sigUdf(col("_qe")))
      .select(col("qid"), col("_qe"), col("_qsig"),
        posexplode(col("_qsig")).as(Seq("_qt", "_qh")))
    val firstTable = call_function("graft_first_eq", col("_sig"), col("_qsig"))
    val sim = cos(df)(col("_qe"), col("_ce"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    data.join(broadcast(q), col("_t") === col("_qt") && col("_h") === col("_qh")
        && col("qid") =!= col("cid"))
      .filter(firstTable === col("_t") + 1)
      .withColumn("sim", simRound.map(Canon.rk(sim, _)).getOrElse(sim))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "cid", "sim", "rank")
  }

  /** Deterministic sampled k-means codebook — the trained coarse
    * quantizer behind `ivfKnn` and `cosinePairsAboveCellBlocked`.
    *
    * Sampling is hash-ordered, not RNG: the `sampleSize` rows with the
    * smallest md5(id) digests form the sample, identical at any
    * partitioning or scale — at 100 TB the same line samples the same
    * rows. The physical shape is a DIGEST-THRESHOLD FILTER, not a bare
    * TakeOrdered: a plain `orderBy(md5).limit(s)` funnels every
    * partition's s-row partial heap into ONE final task (partitions ×
    * s rows at cluster scale), so instead the scan admits only rows
    * whose 32-bit digest prefix falls under a threshold sized from the
    * row count (expected ~2·s admitted; the digest prefix is a strict
    * lower segment of the full-digest order, so the bottom-s of the
    * admitted set IS the global bottom-s), and the TakeOrdered runs on
    * that bounded set. If the binomial draw under-admits (astronomical
    * at s ≥ 1024: ≥ 30σ), the threshold doubles and retries — the
    * bounded top-up loop, ≤ log₂ rounds, deterministic result either
    * way. Lloyd
    * iterations then run locally on the bounded sample: assignment by
    * cosine (ties to the lower index, matching `Kernels.nearestCells`),
    * update = member mean, empty cells keep their previous centroid.
    * Init = first k sample vectors in hash order. Everything is
    * deterministic, so the codebook — and every query built on it — is
    * reproducible run to run.
    *
    * An untrained codebook (e.g. "first k vectors by id") wrecks IVF
    * recall and cell-pruning rates on clustered corpora; a few Lloyd
    * rounds over a hash sample is the standard fix and is enough — the
    * quantizer only has to be good, not optimal, because `ivfKnn`
    * recall is tuned by nprobe and cell-blocked exactness never depends
    * on the codebook at all. */
  def trainCodebook(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 8, sampleSize: Int = 2048): Array[Array[Float]] = {
    require(k > 0 && iters >= 0 && sampleSize >= k,
      s"need sampleSize >= k > 0, got k=$k sampleSize=$sampleSize")
    val sample = digestSample(df, idCol, vecCol, sampleSize)
    // fail here, by name, rather than let an empty codebook surface as
    // an opaque NoSuchElementException inside Kernels.nearestCells
    require(sample.nonEmpty,
      s"trainCodebook: input '$vecCol' has no rows to sample — cannot train a codebook")
    // an input smaller than k yields that many cells (every vector its
    // own centroid) instead of indexing past the sample
    val kk = math.min(k, sample.length)
    var cents = sample.take(kk).map(_.clone())
    val dims = cents.headOption.map(_.length).getOrElse(0)
    for (_ <- 1 to iters) {
      val sums = Array.fill(kk)(new Array[Double](dims))
      val counts = new Array[Long](kk)
      sample.foreach { v =>
        val c = Kernels.nearestCells(scala.collection.immutable.ArraySeq.unsafeWrapArray(v),
          cents, 1).head
        counts(c) += 1
        var i = 0; while (i < dims) { sums(c)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(kk) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(dims)(i => (sums(c)(i) / counts(c)).toFloat)
      }
    }
    cents
  }

  /** The `sampleSize` vectors with the smallest (md5(id), id) keys —
    * [[trainCodebook]]'s sampling pass, factored out so the
    * threshold-path/TakeOrdered equivalence is directly testable.
    * Ordering by the digest prefix refines ordering by the full
    * digest, so the admitted set `prefix32 < t` is a strict lower
    * segment of the global digest order: whenever it holds ≥
    * sampleSize rows (or the whole input), its bottom-sampleSize IS
    * the global bottom-sampleSize.
    *
    * Null ids are excluded up front: md5(null) is null, so the
    * threshold path's `prefix32 < t` would silently drop them while
    * the frac>=1.0 fallback would sort them FIRST (asc nulls-first) —
    * the two paths would sample different codebooks on nullable-id
    * inputs. One explicit filter makes them provably equivalent on
    * every input (r10 ADVICE). */
  private[graft] def digestSample(df: DataFrame, idCol: String,
      vecCol: String, sampleSize: Int): Array[Array[Float]] = {
    val proj = df
      .select(col(idCol).cast("string").as("_id"), col(vecCol).as("_v"))
      .filter(col("_id").isNotNull)
      .withColumn("_d", md5(col("_id").cast("binary")))
    // one narrow count to size the admission threshold (the scan reads
    // only the id column; everything else is pruned)
    val total = proj.select("_id").count()
    if (total == 0) return Array.empty
    val want = math.min(sampleSize.toLong, total).toInt
    val prefix32 = conv(substring(col("_d"), 1, 8), 16, 10).cast("long")
    var frac = math.min(1.0, 2.0 * sampleSize / total.toDouble)
    var sample: Array[Array[Float]] = null
    while (sample == null) {
      // floor the threshold at 1: below ~1.8e13 rows frac·2^32 >= 1
      // anyway, and above it a truncated-to-0 threshold would admit
      // nothing and burn full-scan retry rounds; threshold 1 already
      // admits ~total/2^32 >= 2·sampleSize rows at that scale
      val admitted =
        if (frac >= 1.0) proj
        else proj.filter(prefix32 <
          lit(math.max(1L, (frac * 4294967296.0).toLong)))
      val rows = admitted.orderBy(col("_d"), col("_id"))
        .limit(sampleSize).select("_v").collect()
        .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
      if (rows.length >= want || frac >= 1.0) sample = rows
      else frac = math.min(1.0, frac * 2.0)
    }
    sample
  }

  /** Mean vector per label as (label, dim, value) rows. */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "_v")))
      .groupBy(col(labelCol), col("dim").cast("long").as("dim"))
      .agg(avg(col("_v").cast("double")).as("centroid"))
}

object Ranking {
  /** Global rank / dense_rank / percent_rank / ntile over
    * (bandCol DESC, tieCol ASC) with NO single-partition window over
    * the data — the two-pass decomposition of a global ranking:
    *
    *  1. one aggregate computes per-band row counts; a window over that
    *     TINY table (cardinality = #bands, not #rows) yields each
    *     band's cumulative preceding count and dense rank;
    *  2. rank / dense_rank / percent_rank / cume_dist depend only on
    *     the band (all rows in a band tie), so they broadcast-join
    *     back as lookups;
    *  3. the global row number needed by ntile = band's preceding count
    *     + row_number within the band (a per-band window, parallel over
    *     bands); the tile index then follows in closed form from the
    *     SQL ntile bucket sizes (first n%k buckets get ⌈n/k⌉ rows).
    *
    * At extreme skew (one band ≫ executor memory) step 3's per-band
    * window would recurse once more on a sub-bucket of tieCol — same
    * pattern, cumulative counts per (band, sub-bucket). */
  def bandedRanks(df: DataFrame, bandCol: String, tieCol: String, tiles: Int): DataFrame = {
    val stats = df.groupBy(bandCol).agg(count(lit(1)).as("_bn"))
    val ws = Window.orderBy(col(bandCol).desc)
    // the grand total rides the SAME tiny single-partition window as
    // the cumulative counts (full frame), not a 1-row cross join — the
    // band table is the only thing windowed, never the fact rows
    val cum = stats
      .withColumn("_before", coalesce(
        sum(col("_bn")).over(ws.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_drnk", row_number().over(ws).cast("long"))
      .withColumn("_n", sum(col("_bn")).over(
        ws.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val wb = Window.partitionBy(bandCol).orderBy(col(tieCol).asc)
    val k = lit(tiles.toLong)
    val rn = col("_before") + row_number().over(wb).cast("long") // global row number
    // Column `/` is double division; floor+cast keeps the arithmetic
    // exact for n < 2^53
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val base = idiv(col("_n"), k)                                // ⌊n/k⌋
    val rem = col("_n") % k
    val boundary = rem * (base + 1)                              // rows in the fat buckets
    // base = 0 only when n < tiles, where boundary = n makes the
    // otherwise-branch unreachable — but guard the divisor anyway so
    // the expression stays ANSI-safe if a refactor ever hoists it out
    // of the CaseWhen short-circuit (floor(x/0) throws under ANSI mode)
    val safeBase = greatest(base, lit(1L))
    df.join(broadcast(cum), bandCol)
      .withColumn("rnk", col("_before") + 1)
      .withColumn("drnk", col("_drnk"))
      .withColumn("prnk", when(col("_n") > 1,
        col("_before").cast("double") / (col("_n") - 1).cast("double")).otherwise(0.0))
      // cume_dist depends only on the band too: (rows ≤ this band)/n
      .withColumn("cdist",
        (col("_before") + col("_bn")).cast("double") / col("_n").cast("double"))
      .withColumn("_rn", rn)
      .withColumn("tile",
        when(col("_rn") <= boundary, idiv(col("_rn") - 1, base + 1) + 1)
          .otherwise(rem + idiv(col("_rn") - boundary - 1, safeBase) + 1))
      .drop("_bn", "_before", "_n", "_rn")
  }
}

object TimeSeriesOps {
  /** As-of join: for each `left` row, the greatest `right` timestamp
    * ≤ its own, per key — one shuffle by key + one window pass, no
    * per-row subquery. Returns left rows + `asof_ts`. */
  def asofPrior(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, leftIdCol: String): DataFrame =
    asofJoin(left, right, keyCol, tsCol, leftIdCol, forward = false)

  /** Forward as-of join: for each `left` row, the SMALLEST `right`
    * timestamp ≥ its own, per key — the "next event after" twin of
    * [[asofPrior]]: same union + ONE window pass, scanned in
    * descending time order so the running `last` seen at a left row is
    * the nearest right timestamp at-or-after it (equal timestamps
    * match, `_kind` puts the right row first). Returns left rows +
    * `asof_ts`. */
  def asofNext(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, leftIdCol: String): DataFrame =
    asofJoin(left, right, keyCol, tsCol, leftIdCol, forward = true)

  /** Shared body of the two as-of directions. NULL timestamps match
    * nothing in either direction (the native ASOF-join behavior both
    * DuckDB twins have): null-ts rows sort FIRST in both scan orders,
    * so a null-ts left row's frame holds no right timestamps and a
    * null-ts right row is ignored by the running `last(ignoreNulls)`. */
  private def asofJoin(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, leftIdCol: String,
      forward: Boolean): DataFrame = {
    val r = right.select(col(keyCol), col(tsCol)).distinct()
      .select(col(keyCol), col(tsCol), lit(null).cast("long").as(leftIdCol), lit(0).as("_kind"))
    val l = left.select(col(keyCol), col(tsCol), col(leftIdCol), lit(1).as("_kind"))
    val order = if (forward) col(tsCol).desc_nulls_first else col(tsCol).asc_nulls_first
    val w = Window.partitionBy(keyCol)
      .orderBy(order, col("_kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("asof_ts", last(when(col("_kind") === 0, col(tsCol)), ignoreNulls = true).over(w))
      .filter(col("_kind") === 1)
      .drop("_kind")
  }

  /** Resample events into fixed epoch-aligned bins per key, emitting a
    * DENSE grid: every (key, bin) between the corpus min and max bin
    * appears, empty bins zero-filled — the gap-fill shape every
    * time-series consumer (charting, anomaly windows, rate limits)
    * needs before it can difference or smooth.
    *
    * Scale: the observed bins are one hash aggregate; the dense grid is
    * keys × `sequence(min, max, step)` — cardinality bins·keys, NOT
    * rows — built from a broadcast 1-row range and joined back with a
    * left join on (key, bin). No window, no per-row state. */
  def resampleGapfill(df: DataFrame, tsCol: String, keyCol: String,
      binSeconds: Int): DataFrame = {
    val bin = timestamp_seconds(
      floor(unix_timestamp(col(tsCol)) / binSeconds).cast("long") * binSeconds)
    val counts = df.select(col(keyCol), bin.as("bin"))
      .groupBy(keyCol, "bin").agg(count(lit(1)).as("n"))
    val range = counts.agg(min(col("bin")).as("_minb"), max(col("bin")).as("_maxb"))
    val grid = df.select(col(keyCol)).distinct()
      .crossJoin(broadcast(range))
      .select(col(keyCol), explode(sequence(col("_minb"), col("_maxb"),
        expr(s"INTERVAL $binSeconds SECONDS"))).as("bin"))
    grid.join(counts, Seq(keyCol, "bin"), "left")
      .select(col(keyCol), col("bin"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Session assignment with an inactivity gap (batch; the streaming
    * twin is graft.streaming.StreamOps.sessionAgg). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gap: String): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Ordered conversion funnel: for each user, stage i+1 counts only if
    * an event of `stages(i+1)`'s type occurs STRICTLY AFTER the user's
    * stage-i time and within `stepUs` microseconds of it; a user's
    * stage time is the EARLIEST qualifying event. Returns one row per
    * stage: (stage 1-based, event_type, users).
    *
    * Scale shape: one filtered aggregate per stage over the event
    * stream plus an equi-join on user against the (monotonically
    * shrinking) reached-users table — never a window over a per-user
    * sort of the full stream. The join is stats-derived by design: the
    * reached side starts at |users| and only shrinks, so AQE broadcasts
    * it when it fits and equi-shuffles otherwise. */
  def conversionFunnel(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], stepUs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stepUs > 0, s"stage window must be > 0 us, got $stepUs")
    val base = df.select(col(userCol).as("_u"), col(typeCol).as("_e"),
      unix_micros(col(tsCol)).as("_us"))
    var reached = base.filter(col("_e") === stages.head)
      .groupBy("_u").agg(min(col("_us")).as("_t"))
    val perStage = scala.collection.mutable.Buffer(stages.head -> reached)
    stages.tail.foreach { st =>
      reached = base.filter(col("_e") === st)
        .join(reached.select(col("_u"), col("_t").as("_pt")), "_u")
        .filter(col("_us") > col("_pt") && col("_us") <= col("_pt") + stepUs)
        .groupBy("_u").agg(min(col("_us")).as("_t"))
      perStage += st -> reached
    }
    perStage.zipWithIndex.map { case ((st, d), i) =>
      d.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), lit(st).as("event_type"), col("users"))
    }.reduce(_ union _)
  }

  /** Batch sessionization: split each user's event stream into sessions
    * wherever the gap to the previous event exceeds `gapUs`, then emit
    * one row per session (user, session_id, n_events, start_us,
    * duration_us). `session_id` is the 1-based session ordinal within
    * the user, so output is a pure function of the input rows.
    *
    * Scale shape: ONE shuffle on the user key; the gap flag (lag) and
    * the session ordinal (running sum of flags) are two passes over the
    * same sort order inside that partitioning, and the final per-session
    * aggregate map-side-combines before its (user, session) exchange.
    * Never a global sort, never per-user driver state — the batch twin
    * of the streaming session_window operator. Ordering ties on the
    * timestamp break on `idCol`, so the split is deterministic. */
  def sessionize(df: DataFrame, userCol: String, idCol: String,
      tsCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"session gap must be > 0 us, got $gapUs")
    val w = Window.partitionBy("_u").orderBy(col("_us").asc, col("_id").asc)
    df.select(col(userCol).as("_u"), col(idCol).as("_id"),
        unix_micros(col(tsCol)).as("_us"))
      .withColumn("_new",
        when(col("_us") - lag(col("_us"), 1).over(w) <= gapUs, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("session_id", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("_u"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("_us")).as("start_us"),
        (max(col("_us")) - min(col("_us"))).as("duration_us"))
      .withColumnRenamed("_u", userCol)
  }

  /** Cohort retention: cohort = the epoch-day of a user's FIRST event;
    * for every (cohort_day, day_offset) cell, how many of that cohort's
    * users were active `day_offset` days after joining — the standard
    * retention triangle.
    *
    * Scale shape: (user, day) pairs are distinct-ed first (shuffle ∝
    * active user-days, not events), first-touch is one aggregate on the
    * user key, and the join back is user-keyed equi — each stage an
    * equi-shuffle with partial aggregation; after the distinct, each
    * user contributes at most one row per day, so the cell count is a
    * plain count(*), no count-distinct shuffle. Day arithmetic is
    * integral (`div`), identical in any engine. */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = df.select(col(userCol).as("_u"), epochDay(tsCol).as("_day"))
      .distinct()
    val first = days.groupBy("_u").agg(min(col("_day")).as("_cohort"))
    days.join(first, "_u")
      .groupBy(col("_cohort").as("cohort_day"),
        (col("_day") - col("_cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Epoch day with FLOOR semantics, not `div` (which truncates toward
    * zero): the two agree post-1970 but diverge on negative micros, and
    * the DuckDB twin (`//`) floors — integral arithmetic keeps the
    * bucketing exact in both engines at any timestamp. */
  private def epochDay(tsCol: String): Column =
    expr(s"unix_micros(`$tsCol`) div 86400000000" +
      s" + (CASE WHEN unix_micros(`$tsCol`) % 86400000000 < 0 THEN -1 ELSE 0 END)")

  /** Daily + trailing-window active users: for every active day,
    * |distinct users that day| (DAU) and |distinct users in
    * [day − windowDays + 1, day]| (WAU for the default 7) — the
    * product-health report every event pipeline serves.
    *
    * Scale shape: (user, day) pairs are distinct-ed first (shuffle ∝
    * user-days, not events). DAU is one count per day. WAU replicates
    * each user-day to its ≤ windowDays trailing report days with a
    * rowwise bounded explode, distincts (user, report-day), and counts
    * — a constant-factor fanout of the small user-day table, instead
    * of the distinct-over-sliding-window no engine can aggregate
    * incrementally. */
  def activeUsers(df: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"window must be >= 1 day, got $windowDays")
    val days = df.select(col(userCol).as("_u"), epochDay(tsCol).as("_day"))
      .distinct()
    val dau = days.groupBy("_day").agg(count(lit(1)).as("dau"))
    val wau = days
      .select(col("_u"),
        explode(sequence(col("_day"), col("_day") + (windowDays - 1))).as("_rday"))
      .distinct()
      .groupBy("_rday").agg(count(lit(1)).as("wau"))
    dau.join(wau, col("_day") === col("_rday"))
      .select(col("_day").as("day"), col("dau"), col("wau"))
  }

  /** Keyless interval join at scale: points vs intervals [lo, hi] with
    * NO equi key — the plan every naive formulation turns into a
    * cartesian/broadcast-nested-loop. Bin time at `binUs`: each point
    * owns exactly ONE bin, each interval replicates to its spanned
    * bins (fanout bounded by len/bin + 1), the join is an equi-join on
    * the bin id, and the exact containment filter runs after. Because
    * a point has a single bin, no candidate pair appears twice — no
    * dedup pass. Choose binUs ≈ the typical interval length: shorter
    * bins raise interval fanout, longer bins raise false candidates.
    * Floor-safe at negative timestamps (same semantics as the DuckDB
    * `//` twin). */
  def intervalJoinBucketed(points: DataFrame, intervals: DataFrame,
      pointUsCol: String, loCol: String, hiCol: String, binUs: Long): DataFrame = {
    require(binUs > 0, s"bin width must be > 0 us, got $binUs")
    def bin(c: String): Column =
      expr(s"`$c` div ${binUs}L + (CASE WHEN `$c` % ${binUs}L < 0 THEN -1 ELSE 0 END)")
    val p = points.withColumn("_bin", bin(pointUsCol))
    val iv = intervals.withColumn("_bin",
      explode(sequence(bin(loCol), bin(hiCol))))
    p.join(iv, "_bin")
      .filter(col(pointUsCol) >= col(loCol) && col(pointUsCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands computation: within a user's distinct active
    * days, `day − row_number()` is constant exactly on a consecutive
    * run, so grouping on that island key yields run lengths.
    *
    * Scale shape: distinct (user, day) first (∝ user-days), ONE
    * shuffle on the user key for the row_number window, then the
    * island and per-user aggregates reuse that partitioning (group
    * keys extend the user key — no further exchange needed for
    * co-location). */
  def activityStreaks(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy("_u").orderBy(col("_day").asc)
    df.select(col(userCol).as("_u"), epochDay(tsCol).as("_day"))
      .distinct()
      .withColumn("_island", col("_day") - row_number().over(w))
      .groupBy(col("_u"), col("_island"))
      .agg(count(lit(1)).as("_len"), min(col("_day")).as("_start"))
      .groupBy(col("_u"))
      .agg(max(col("_len")).as("max_streak"),
        count(lit(1)).as("n_streaks"),
        min(col("_start")).as("first_day"))
      .withColumnRenamed("_u", userCol)
  }

  /** Top-k most common length-`n` event-type sequences (user journeys):
    * each user's events ordered by (timestamp, id) form a path string
    * `a>b>c`; count every n-window of it corpus-wide — the path-mining
    * report behind funnel design.
    *
    * Scale shape: one shuffle on the user key into `collect_list` +
    * `sort_array` (per-user state ∝ that user's events — the same bound
    * every sessionization carries; a pathological user is one group,
    * not one partition), then a rowwise n-gram transform, explode, and
    * a partially-aggregated count with a TakeOrderedAndProject top-k.
    * Tie-break on the path string keeps the cut deterministic. */
  def topEventPaths(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 2, s"path length must be >= 2, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    val grams = TextAnalysis.arrayNgrams(col("_ets"), n, ">")
    df.select(col(userCol).as("_u"),
        struct(unix_micros(col(tsCol)).as("_us"), col(idCol).as("_id"),
          col(typeCol).as("_e")).as("_s"))
      .groupBy("_u").agg(sort_array(collect_list(col("_s"))).as("_arr"))
      .select(expr("transform(_arr, x -> x._e)").as("_ets"))
      .select(explode(grams).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }
}

object TextAnalysis {
  /** Whitespace token stats per group. */
  def tokenStats(df: DataFrame, textCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol), size(split(col(textCol), " ")).cast("long").as("_n_tok"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum(col("_n_tok")).as("n_tokens"),
        (sum(col("_n_tok")) / count(lit(1))).as("avg_tokens"))

  /** Per-doc quality signals: token-type ratio, average token length,
    * stopword ratio, BPE-ish size estimate (chars/4 — the standard
    * subword approximation), vowel density. All ratios of exact
    * integers → engine-portable. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): DataFrame = {
    val sw = stopwords.map(w => s"'$w'").mkString(", ")
    df.select(col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"),
      size(array_distinct(split(col(textCol), " "))).cast("long").as("n_distinct"),
      expr(s"size(filter(split($textCol, ' '), x -> x IN ($sw)))").cast("long").as("n_stop"),
      length(regexp_replace(col(textCol), "[^aeiou]", "")).cast("long").as("n_vowels"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("bpe_est", ceil(col("n_chars") / lit(4.0)).cast("long"))
  }

  /** Unigram-profile language ID: score(doc, lang) = Σ over doc token
    * occurrences of that token's frequency in lang's corpus slice;
    * prediction = argmax. Integer scores → deterministic ranking. The
    * profile is itself a DataFrame, so at scale it is just another
    * (broadcastable) aggregate. */
  def languageId(df: DataFrame, idCol: String, textCol: String, langCol: String): DataFrame = {
    val tok = df.select(col(idCol), col(langCol),
      explode(split(col(textCol), " ")).as("_token"))
    val profile = tok.groupBy(col(langCol).as("_plang"), col("_token"))
      .agg(count(lit(1)).as("_cnt"))
    val scores = tok.join(broadcast(profile), "_token")
      .groupBy(col(idCol), col(langCol), col("_plang"))
      .agg(sum(col("_cnt")).as("score"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("_plang").asc)
    scores.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col(langCol), col("_plang").as("pred_lang"),
        (col(langCol) === col("_plang")).cast("int").as("correct"),
        col("score"))
  }

  /** Per-(doc, token) raw term frequency plus doc length — the shared
    * first aggregate of tfidf / bm25. One explode + one groupBy with
    * map-side partial aggregation; shuffle ∝ distinct (doc, token). */
  private def termCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(idCol)))

  /** TF-IDF term weighting: tfidf(d, t) = tf · ln(N / df_t).
    *
    * Scale shape: document frequency is ONE aggregate over the term
    * table (shuffle ∝ vocabulary); N is a broadcast scalar; the join
    * back to the term table is an equi-join on token that AQE
    * broadcasts while the vocabulary is small. No driver-side state. */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tc = termCounts(df, idCol, textCol)
    val dfreq = tc.groupBy("token").agg(count(lit(1)).as("dft"))
    val n = df.agg(count(lit(1)).as("_n"))
    tc.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") * log(col("_n").cast("double") / col("dft").cast("double")))
      .select(col(idCol), col("token"), col("tf"), col("dft"), col("tfidf"))
  }

  /** Per-document top-k keywords by TF-IDF (ties break on the token) —
    * the summarization/tagging step after term weighting. The weight is
    * pre-rounded (4 dp) so rank ties cannot straddle a float ulp
    * between engines; the `row_number() <= k` filter plans as the
    * bounded-heap TopKPerGroup operator under `GraftExtensions`. */
  def topKeywords(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("token").asc)
    tfidf(df, idCol, textCol)
      .withColumn("tfidf", Canon.r4(col("tfidf")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(idCol), col("token"), col("tfidf"), col("rn"))
  }

  /** Okapi BM25 term weighting with the standard k1/b defaults:
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)),
    * score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    * Same one-aggregate-per-statistic shape as `tfidf`. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tc = termCounts(df, idCol, textCol)
    val dfreq = tc.groupBy("token").agg(count(lit(1)).as("dft"))
    // exact integer sum, ONE division — engines must agree bitwise on
    // avgdl, and incremental double averaging is accumulation-order-
    // dependent while Σlong/len is not
    val stats = df.agg(count(lit(1)).as("_n"))
      .crossJoin(broadcast(tc.select(col(idCol), col("dl")).distinct()
        .agg((sum(col("dl")).cast("double") / count(lit(1))).as("_avgdl"))))
    val idf = log(lit(1.0) +
      (col("_n").cast("double") - col("dft") + lit(0.5)) / (col("dft").cast("double") + lit(0.5)))
    val norm = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("_avgdl")))
    tc.join(dfreq, "token")
      .crossJoin(broadcast(stats))
      .withColumn("bm25", idf * norm)
      .select(col(idCol), col("token"), col("tf"), col("dft"), col("bm25"))
  }

  /** Quality gate: keep rows whose score is at or above the p-quantile
    * of their group — "top 25% per source" style data selection. The
    * per-group quantile (exact interpolated percentile, matching SQL
    * quantile_cont, via the bounded-state histogram form
    * [[StatsOps.binnedPercentiles]]) is broadcast-joined back. */
  def qualityFilter(df: DataFrame, scoreCol: String, groupCol: String,
      p: Double): DataFrame = {
    val cuts = StatsOps.binnedPercentiles(df, groupCol, col(scoreCol),
      Seq("_cut" -> p))
    df.join(broadcast(cuts), groupCol)
      .filter(col(scoreCol) >= col("_cut"))
      .drop("_cut")
  }

  /** Unigram language-model score per document: the mean log
    * probability of the doc's tokens under the corpus's own unigram
    * distribution — the cheap stand-in for an LM-perplexity quality
    * filter (template spam and gibberish score low, fluent text high).
    * score(d) = (Σ_t tf_{d,t}·ln(cnt_t) − n_d·ln(total)) / n_d.
    *
    * Scale shape: the unigram table is ONE aggregate over the term
    * counts (shuffle ∝ vocabulary), the total is a broadcast scalar,
    * and the join back is the same vocabulary equi-join as [[tfidf]].
    * No driver state. Returns (idCol, n_tok, logprob — unrounded). */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tc = df.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val cnts = tc.groupBy("token").agg(sum(col("tf")).as("_ct"))
    val tot = tc.agg(sum(col("tf")).as("_total"))
    tc.join(cnts, "token")
      .groupBy(col(idCol))
      .agg(sum(col("tf").cast("double") * log(col("_ct").cast("double"))).as("_s"),
        sum(col("tf")).as("n_tok"))
      .crossJoin(broadcast(tot))
      .select(col(idCol), col("n_tok"),
        ((col("_s") - col("n_tok").cast("double") * log(col("_total").cast("double")))
          / col("n_tok").cast("double")).as("logprob"))
  }

  /** Sliding n-grams over any array column, elements joined with
    * `sep`; arrays shorter than n yield an empty array. Shared by the
    * word-gram operators here and the event-path miner. Pure codegen
    * (transform/slice/concat_ws). */
  private[api] def arrayNgrams(arr: Column, n: Int, sep: String): Column = {
    val cnt = (size(arr) - (n - 1)).cast("int")
    when(cnt > 0,
      transform(sequence(lit(1), cnt), i => concat_ws(sep, slice(arr, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Sliding word n-grams of `textCol`, empty when the doc has fewer
    * than n tokens. */
  private def wordNgrams(textCol: String, n: Int): Column =
    arrayNgrams(split(col(textCol), " "), n, " ")

  /** Within-document repetition: the fraction of duplicated token
    * n-grams (1 − distinct/total), the classic repetition quality gate
    * for LLM training data — high values flag boilerplate, template
    * spam, and decoding loops. Pure rowwise codegen (split → sliding
    * n-grams via transform/slice → distinct count): no shuffle, no
    * state, scales embarrassingly. Documents shorter than n tokens
    * have no n-grams and score 0. */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val grams = wordNgrams(textCol, n)
    df.select(col(idCol), size(grams).cast("long").as("n_grams"),
        size(array_distinct(grams)).cast("long").as("n_distinct"))
      .withColumn("rep_ratio", when(col("n_grams") > 0,
        lit(1.0) - col("n_distinct").cast("double") / col("n_grams").cast("double"))
        .otherwise(lit(0.0)))
  }

  /** Benchmark decontamination: for each corpus document, how many
    * DISTINCT word n-grams it shares with a benchmark/eval set — the
    * standard "n-gram overlap" test run before training so that eval
    * questions leaking into the corpus are caught (n = 8 words is the
    * commonly published choice; lower n over-flags, higher n misses
    * paraphrases of short items). Returns (idCol, n_hits) for corpus
    * docs with at least one hit; a pipeline drops or audits them.
    *
    * Scale shape: the benchmark gram set is DISTINCT-ed and explicitly
    * broadcast — eval suites are bounded (thousands of items, at most
    * millions of grams) no matter how big the corpus, so the corpus
    * side streams map-side against the broadcast hash set: one scan,
    * one aggregate, no corpus-sized shuffle beyond the per-doc count.
    * Corpus grams are per-doc distinct BEFORE the join (array_distinct
    * inside the row), so the count after the join is already the
    * distinct-gram hit count — no count(distinct) shuffle.
    *
    * Grams cross the join as xxhash64 i64s, not strings: an 8-word
    * gram is ~50 chars, so hashing shrinks the broadcast (and the
    * bench-side distinct) ~10× at real eval-set sizes. Distinctness is
    * taken on the STRING grams per doc (exact), then hashed; an i64
    * collision between two distinct grams is ~n²/2⁶⁴ — the same
    * tolerance every hash-keyed dedup step here already accepts. */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val gramHashes =
      explode(transform(array_distinct(wordNgrams(textCol, n)), g => xxhash64(g))).as("_gh")
    val benchGrams = bench.select(gramHashes).distinct()
    corpus.select(col(idCol), gramHashes)
      .join(broadcast(benchGrams), "_gh")
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
  }

  /** Fixed-size overlapping context-window chunking: document → chunks
    * of `chunkSize` tokens starting every `stride` tokens (the layout
    * step before tokenize-and-pack for an LLM context window; stride <
    * chunkSize gives the standard overlap so no span is split across a
    * boundary unseen). Emits (id, chunk_id, n_tokens, chunk); the last
    * chunk may be short, and chunking stops with the first chunk that
    * reaches the final token — no tail chunk that is a strict subset
    * of its predecessor.
    *
    * Scale shape: pure rowwise codegen — split once, explode a chunk
    * ordinal sequence, slice per ordinal. No shuffle, no state; output
    * rows ∝ input tokens / stride, produced map-side at the scan. */
  def chunkFixed(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    // last chunk ordinal = first start position whose chunk reaches the
    // final token: ceil((n - chunkSize)/stride), clamped at 0 — starting
    // past that would emit tail chunks strictly contained in the
    // previous one (duplicate content in the packed/indexed output)
    df.select(col(idCol), split(col(textCol), " ").as("_w"))
      .select(col(idCol), col("_w"),
        explode(expr(s"sequence(0, greatest(0, CAST((size(_w) - $chunkSize" +
            s" + $stride - 1) div $stride AS INT)))"))
          .as("_ci"))
      .select(col(idCol), col("_ci").cast("long").as("chunk_id"),
        size(slice(col("_w"), col("_ci") * stride + 1, lit(chunkSize)))
          .cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("_w"), col("_ci") * stride + 1, lit(chunkSize)))
          .as("chunk"))
  }

  /** Corpus-wide top-k word n-grams by frequency (ties break on the
    * gram) — the collocation/boilerplate report run over a crawl before
    * choosing filter rules.
    *
    * Scale shape: map-side explode → hash aggregate with partial
    * (map-side) combine, so the shuffle carries one row per DISTINCT
    * gram per task, then a TakeOrderedAndProject global top-k — never a
    * full sort of the gram table. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(explode(wordNgrams(textCol, n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(k)
  }

  /** Stopword pruning: drop the given tokens from each document,
    * emitting the pruned text plus before/after token counts (the
    * index-side normalization step; the count pair doubles as the
    * stopword-density signal). Pure rowwise `filter` lambda — no
    * shuffle, no UDF, stays inside whole-stage codegen. The stopword
    * set is a typed array literal (not SQL text splicing), so words
    * containing quotes and column names needing backticks are safe. */
  def stopwordPrune(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): DataFrame = {
    require(stopwords.nonEmpty, "stopword list must be non-empty")
    val sw = typedlit(stopwords)
    val kept = filter(split(col(textCol), " "), x => !array_contains(sw, x))
    df.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"),
      size(kept).cast("long").as("n_kept"),
      concat_ws(" ", kept).as("pruned"))
  }

  /** Subword token-count estimate for context budgeting: whitespace
    * tokens plus a BPE-ish piece count — each word contributes
    * ⌈len/maxPiece⌉ pieces, the cheap deterministic stand-in for a
    * real tokenizer's "long words split into ~maxPiece-char subwords"
    * behavior. All integer arithmetic (ceil as (len+m−1) div m), so
    * both engines agree exactly. Pure rowwise codegen (split +
    * aggregate lambda): no shuffle, no UDF. */
  def tokenCountBpe(df: DataFrame, idCol: String, textCol: String,
      maxPiece: Int = 4): DataFrame = {
    require(maxPiece >= 1, s"maxPiece must be >= 1, got $maxPiece")
    // typed column lambda, no SQL text splicing (same contract as
    // stopwordPrune); ⌈len/m⌉ as floor((len+m−1)/m) — word lengths are
    // tiny, so the double division is exact before the long cast
    val piece = (x: Column) =>
      floor((length(x) + lit(maxPiece - 1)) / lit(maxPiece)).cast("long")
    df.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"),
      aggregate(split(col(textCol), " "), lit(0L),
        (acc, x) => acc + piece(x)).as("n_pieces"))
  }

  /** Corpus vocabulary report per group: total token occurrences,
    * distinct vocabulary size, and the corpus-level type-token ratio —
    * the vocabulary-growth / diversity signal per source or language
    * slice (a shrinking TTR as a source grows flags template spam).
    *
    * Scale shape: explode → ONE hash aggregate on (group, token) with
    * map-side combine (shuffle ∝ per-group vocabulary, never rows),
    * then a tiny per-group rollup of the token table. */
  def vocabBySource(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(groupCol), explode(split(col(textCol), " ")).as("_t"))
      .groupBy(col(groupCol), col("_t")).agg(count(lit(1)).as("_c"))
    tok.groupBy(groupCol)
      .agg(sum(col("_c")).as("n_tokens"), count(lit(1)).as("n_vocab"))
      .withColumn("ttr",
        Canon.r4(col("n_vocab").cast("double") / col("n_tokens").cast("double")))
  }

  /** Canonical token-set fingerprint (md5 of the sorted distinct
    * tokens) + winnowing rolling-hash fingerprint (shift-robust). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      md5(concat_ws(" ", sort_array(array_distinct(split(col(textCol), " "))))
        .cast("binary")).as("set_fp"),
      Kernels.rollingFingerprintUdf(col(textCol)).as("roll_fp"),
      size(array_distinct(split(col(textCol), " "))).cast("long").as("n_distinct"))
}

object SkewJoins {
  /** Equi-join hardened against heavy-hitter keys: every probe row
    * picks a deterministic salt from a unique column's hash, the build
    * side is replicated `salts` times, and the join runs on
    * (key, salt) — one hot key spreads across `salts` tasks instead of
    * pinning one. Result is identical to the plain equi-join (each
    * probe row matches exactly the one build replica with its salt).
    * AQE's runtime skew split handles moderate skew on its own; this
    * is the explicit pre-salting for the pathological key at 100 TB,
    * at the cost of a `salts`× build-side shuffle. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      probeUniqueCol: String, salts: Int): DataFrame = {
    val salted = probe.withColumn("_salt", pmod(hash(col(probeUniqueCol)), lit(salts)))
    val replicated = build.withColumn("_salt",
      explode(lit((0 until salts).toArray)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Stats-derived salt factor: how many ways the probe's HOTTEST key
    * must split so no task carries more than the average task's row
    * share — `ceil(maxKeyRows / (totalRows / shuffle.partitions))`,
    * clamped to [1, maxSalts]. Computed by one narrow map-side-combined
    * aggregate over the probe key (shuffle ∝ distinct keys, a 2-long
    * collect), so it is deterministic for a given input + conf —
    * unlike AQE's runtime skew split, the decision is visible in the
    * plan and applies to the FIRST run, not after a stats refresh. */
  def derivedSaltFactor(probe: DataFrame, key: String,
      maxSalts: Int = 64): Int = {
    require(maxSalts >= 1, s"maxSalts must be >= 1, got $maxSalts")
    val parts = probe.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val stats = probe.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .agg(max(col("_n")).as("_max"), sum(col("_n")).as("_tot")).collect()(0)
    if (stats.isNullAt(0)) 1
    else {
      val mx = stats.getLong(0)
      val target = math.max(1L, stats.getLong(1) / math.max(1, parts))
      math.min(maxSalts.toLong, math.max(1L, (mx + target - 1) / target)).toInt
    }
  }

  /** [[saltedJoin]] with the salt factor derived from probe stats
    * ([[derivedSaltFactor]]), floored at `minSalts`: the floor lets a
    * caller pin a known-pathological key's minimum spread (or a demo
    * shape) while real skew can only RAISE the factor. k = 1 falls
    * through to the plain equi-join — salting costs a `salts`× build
    * replication, so an unskewed probe shouldn't pay it. */
  def saltedJoinAuto(probe: DataFrame, build: DataFrame, key: String,
      probeUniqueCol: String, minSalts: Int = 1,
      maxSalts: Int = 64): DataFrame = {
    val k = math.max(minSalts, derivedSaltFactor(probe, key, maxSalts))
    if (k <= 1) probe.join(build, Seq(key))
    else saltedJoin(probe, build, key, probeUniqueCol, k)
  }
}

object StatsOps {
  /** Exact interpolated percentiles (SQL `quantile_cont` semantics)
    * computed from a per-(group, value) HISTOGRAM instead of Spark's
    * `percentile` aggregate, whose buffer holds every value of a
    * group in memory at once — the shape that OOMs a 100 TB group.
    * Here aggregation state is one count per distinct value (bounded
    * by the 4 dp rounding grid the determinism rules already impose
    * on inputs — money is 2 dp, scores are pre-rounded 4 dp), and the
    * interpolation pass runs over that bin table, never the rows.
    *
    * Exactness: bitwise-identical to `percentile()` on any input —
    * the interpolation replicates Spark's weighted form
    * `(higher−pos)·v_lo + (pos−lower)·v_hi` (parity-asserted against
    * the built-in on the fixtures in BinnedPercentileSpec). Values
    * are binned as given; nulls are excluded from the computation,
    * and a group whose values are ALL null still appears in the
    * output with null percentiles — the built-in (and DuckDB
    * `quantile_cont`) emit the group, so nulls ride through as a
    * zero-weight bin that keeps the group alive without ever covering
    * a percentile position (row sets stay identical).
    *
    * Scale shape: one hash aggregate (group, value) → count with
    * map-side combine — per-task state ∝ distinct values seen, total
    * shuffle ∝ bins; then two window passes partitioned by group over
    * the bin table (≤ grid size rows per group, vs the row count the
    * buffering aggregate holds). Returns one row per group:
    * (groupCol, <one column per requested (name, p)>[, maxName]). */
  def binnedPercentiles(df: DataFrame, groupCol: String, value: Column,
      ps: Seq[(String, Double)], maxName: Option[String] = None): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    ps.foreach { case (n, p) =>
      require(p >= 0.0 && p <= 1.0, s"percentile $n must be in [0,1], got $p") }
    // null values are KEPT as their own bin with an EFFECTIVE count of
    // 0: the bin table itself then witnesses every group — an all-null
    // group survives the windows and the final aggregate as a single
    // zero-weight bin and emits null percentiles (matching the
    // built-in and DuckDB quantile_cont row sets) with no extra join,
    // no distinct, and exactly one scan of df
    val hist = df.select(col(groupCol), value.cast("double").as("_v"))
      .groupBy(col(groupCol), col("_v"))
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
    val wAll = Window.partitionBy(col(groupCol))
    // bin rows carry [prev, cum) — the 0-based sorted-position range
    // their value occupies within the group. The null bin sorts first
    // (asc = nulls first), carries _cEff 0, and its [0, 0) range can
    // never cover a position, so it is inert in every selection below.
    val cum = hist
      .withColumn("_cEff", when(col("_v").isNotNull, col("_c")).otherwise(lit(0L)))
      .withColumn("_cum", sum(col("_cEff")).over(wCum))
      .withColumn("_n", sum(col("_cEff")).over(wAll))
    val aggs = ps.flatMap { case (name, p) =>
      val h = (col("_n") - 1).cast("double") * p
      val prev = (col("_cum") - col("_cEff")).cast("double")
      val cm = col("_cum").cast("double")
      // exactly one bin covers each of positions ⌊h⌋ / ⌈h⌉ → the
      // conditional max is a selection, not a comparison across bins
      Seq(max(when(prev <= floor(h) && floor(h) < cm, col("_v"))).as(s"_lo_$name"),
        max(when(prev <= ceil(h) && ceil(h) < cm, col("_v"))).as(s"_hi_$name"))
    } ++ maxName.map(m => max(col("_v")).as(m))
    val agged = cum.groupBy(col(groupCol))
      .agg(sum(col("_cEff")).as("_n"), aggs: _*)
    val outs = ps.map { case (name, p) =>
      val h = (col("_n") - 1).cast("double") * p
      val lo = floor(h)
      val hi = ceil(h)
      val vLo = col(s"_lo_$name")
      val vHi = col(s"_hi_$name")
      // vHi === vLo mirrors Spark's higherKey==lowerKey shortcut: when
      // a duplicate run spans both positions the value is returned
      // EXACTLY — interpolating would drift an ulp ((hi−h)·v + (h−lo)·v
      // ≠ v in floats) and break the bitwise-parity contract
      when(hi === lo || vHi === vLo, vLo)
        .otherwise((hi - h) * vLo + (h - lo) * vHi).as(name)
    } ++ maxName.map(col)
    agged.select(col(groupCol) +: outs: _*)
  }

  /** Per-key z-score anomaly flags: rows whose value is at least
    * `threshold` population standard deviations from their key's mean —
    * the monitoring/outlier report over a metric stream.
    *
    * Scale shape: ONE aggregate per key (avg + stddev_pop, partial
    * combine), the tiny per-key stats table broadcast back, and a
    * rowwise filter — no second shuffle, no window. The z-score is
    * pre-rounded (4 dp) so the >=-at-the-cut decision cannot straddle
    * the one-ulp difference between engines' float aggregates (the
    * same contract as [[TextAnalysis.qualityFilter]]). A zero-variance
    * key has no anomalies BY THE GUARD, not by accident: double 0/0
    * is plain IEEE division in BOTH engines (NaN — Spark's null-out
    * on division applies to integral/decimal, not doubles), and both
    * order NaN above every number, so without a guard both sides
    * would flag the entire constant group; the explicit `sd > 0`
    * filter here and in the oracle twin is what makes zero-variance
    * keys flag nothing. */
  def zscoreFlags(df: DataFrame, keyCol: String, idCol: String,
      valueCol: String, threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val stats = df.groupBy(keyCol)
      .agg(avg(col(valueCol)).as("_mu"), stddev_pop(col(valueCol)).as("_sd"))
    df.join(broadcast(stats), keyCol)
      .filter(col("_sd") > 0)
      .withColumn("z", Canon.r4((col(valueCol) - col("_mu")) / col("_sd")))
      .filter(abs(col("z")) >= threshold)
      .select(col(keyCol), col(idCol), col(valueCol), col("z"))
  }

  /** Per-group Tukey-fence outliers: rows outside
    * [q1 − k·IQR, q3 + k·IQR] (k = 1.5 is the standard fence) — the
    * robust-to-skew cousin of the z-score filter.
    *
    * Scale shape: per-group exact percentiles are one aggregate, the
    * per-group fence table is broadcast back, and the verdict is a
    * rowwise filter. Fences are pre-rounded (4 dp) for the same
    * engine-portability reason as [[zscoreFlags]]. */
  def iqrOutliers(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Double = 1.5): DataFrame = {
    require(k > 0, s"fence multiplier must be > 0, got $k")
    val cuts = binnedPercentiles(df, groupCol, col(valueCol),
        Seq("_q1" -> 0.25, "_q3" -> 0.75))
      .select(col(groupCol),
        Canon.r4(col("_q1") - (col("_q3") - col("_q1")) * k).as("_lo"),
        Canon.r4(col("_q3") + (col("_q3") - col("_q1")) * k).as("_hi"))
    df.join(broadcast(cuts), groupCol)
      .filter(col(valueCol) < col("_lo") || col(valueCol) > col("_hi"))
      .select(col(groupCol), col(idCol), col(valueCol))
  }
}

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

object MlPipeline {
  /** σ(w·x) per row against a fixed weight vector — the reference's
    * broadcast-weights forward pass. */
  def linearScore(df: DataFrame, vecCol: String, weights: Array[Double]): DataFrame =
    df.withColumn("score", Kernels.linearScoreUdf(weights)(col(vecCol)))

  /** Minibatch-GEMM forward pass: `mapPartitions` packs rows into a
    * column-major (dims × batch) buffer and scores each batch with ONE
    * BLAS `dgemv` call — the reference's actual per-executor shape
    * (pyspark-caffe fed per-partition minibatches to a broadcast Caffe
    * net's forward()), and the scale-true layout for wider models: the
    * per-row cost drops from a boxed UDF invocation to an amortized
    * slice of a SIMD-blocked multiply (`dev.ludovic.netlib` picks the
    * widest vector kernel the JVM offers; for a k-output model the same
    * buffer feeds one dgemm instead of k dgemv). Weights ship once per
    * executor via broadcast, exactly like [[linearScore]].
    *
    * Numerically: inputs are cast to double BEFORE the multiply (the
    * same contract as the UDF path and the DuckDB twin) and each output
    * is the same w·x sum — but BLAS may reassociate the accumulation,
    * so raw scores can differ from the sequential loop by ulps. The
    * declared callers round to 4 dp, which absorbs an ulp difference
    * EXCEPT for a score sitting exactly on a rounding-grid boundary;
    * no fixture row does (oracle- and bitwise-parity-checked at
    * sf0.001/0.01/0.1), but the guarantee is empirical per dataset,
    * not algebraic — a caller needing provable bit-parity with the
    * sequential path should use [[linearScore]]. */
  def linearScoreBatchGemm(df: DataFrame, idCol: String, vecCol: String,
      weights: Array[Double], batch: Int = 256): DataFrame = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    val spark = df.sparkSession
    import spark.implicits._
    val bcW = spark.sparkContext.broadcast(weights)
    val dims = weights.length
    // fanout BEFORE the mapPartitions: a single-partition scan would
    // otherwise run every batch's GEMM on one core (SURVEY §7.2 #8 —
    // gated, so a no-op on cluster-scale inputs)
    Fanout(df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>")))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val blas = dev.ludovic.netlib.blas.BLAS.getInstance()
        val w = bcW.value
        it.grouped(batch).flatMap { rows =>
          val m = rows.length
          val a = new Array[Double](dims * m)
          var i = 0
          while (i < m) {
            val v = rows(i)._2
            require(v.length == dims,
              s"vector length ${v.length} != weight dims $dims")
            System.arraycopy(v, 0, a, i * dims, dims)
            i += 1
          }
          val y = new Array[Double](m)
          blas.dgemv("T", dims, m, 1.0, a, dims, w, 1, 0.0, y, 1)
          rows.iterator.zipWithIndex.map { case ((id, _), j) =>
            (id, 1.0 / (1.0 + math.exp(-y(j))))
          }
        }
      }.toDF(idCol, "score")
  }

  /** k-class forward pass per row (boxed-UDF path): logits = W·x per
    * class, softmax → (pred = first-argmax class, p_max). The per-row
    * twin of [[multiclassScoreBatchGemm]], kept declared so the bench
    * artifact carries the per-row vs batched comparison at the
    * k-output shape. */
  def multiclassScore(df: DataFrame, idCol: String, vecCol: String,
      weights: Array[Array[Double]]): DataFrame =
    df.select(col(idCol),
        Kernels.multiclassScoreUdf(weights)(col(vecCol)).as("_mc"))
      .select(col(idCol), col("_mc._1").as("pred"), col("_mc._2").as("p_max"))

  /** k-class minibatch forward pass: ONE BLAS `dgemm` scores every
    * class of a 256-row batch — the shape the reference's
    * net.forward() actually had (a k-output layer over a minibatch)
    * and where batched BLAS genuinely amortizes: the k=1 `dgemv`
    * variant loses to the boxed UDF at 64 dims (the Dataset-encoder
    * boundary dominates one dot), but at k outputs the same buffer
    * feeds k×batch FLOPs per encoder crossing. Same numeric caveat as
    * [[linearScoreBatchGemm]]: BLAS may reassociate each w_c·x sum by
    * ulps; the scalar softmax/argmax tail is byte-shared with the UDF
    * path ([[Kernels.multiclassFromLogits]]), and declared callers
    * round p_max to 4 dp. */
  def multiclassScoreBatchGemm(df: DataFrame, idCol: String, vecCol: String,
      weights: Array[Array[Double]], batch: Int = 256,
      fanout: Boolean = true): DataFrame = {
    val k = weights.length
    require(k >= 1 && batch >= 1, s"need k >= 1 classes and batch >= 1")
    val dims = weights.head.length
    require(weights.forall(_.length == dims), "ragged weight matrix")
    val spark = df.sparkSession
    import spark.implicits._
    val bcW = spark.sparkContext.broadcast(weights)
    // the float encoder, NOT cast("array<double>"): the Catalyst cast
    // materializes a second array per row before the encoder copies it
    // again — measured (tools/GemmProbe) as a real slice of the
    // per-row cost at this FLOP count. Floats widen to double in the
    // pack loop below, bit-identically to the cast.
    //
    // `fanout = false` skips the parallelizing repartition: a columnar
    // scan at scale arrives pre-split by row group, so the exchange
    // only ever fires on small single-file inputs — exactly where its
    // fixed stage cost can never amortize (GemmProbe: the exchange IS
    // the entire gap between this path and the boxed UDF at fixture
    // scale). Keep the default true for callers whose input may be a
    // single UNSPLITTABLE large file (the SURVEY §7.2 #8 trap).
    val in0 = df.select(col(idCol).cast("long"), col(vecCol))
    val in = if (fanout) Fanout(in0) else in0
    in.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val blas = dev.ludovic.netlib.blas.BLAS.getInstance()
        val ws = bcW.value
        // (dims × k) column-major: class c's weights occupy column c
        val wMat = new Array[Double](dims * k)
        var c = 0
        while (c < k) { System.arraycopy(ws(c), 0, wMat, c * dims, dims); c += 1 }
        it.grouped(batch).flatMap { rows =>
          val m = rows.length
          val a = new Array[Double](dims * m)
          var i = 0
          while (i < m) {
            val v = rows(i)._2
            require(v.length == dims,
              s"vector length ${v.length} != weight dims $dims")
            var j = 0
            while (j < dims) { a(i * dims + j) = v(j); j += 1 }
            i += 1
          }
          // Y = Aᵀ·W: (m × k) column-major, logit of (row j, class c)
          // lands at y(c*m + j)
          val y = new Array[Double](m * k)
          blas.dgemm("T", "N", m, k, dims, 1.0, a, dims, wMat, dims, 0.0, y, m)
          rows.iterator.zipWithIndex.map { case ((id, _), j) =>
            val (pred, pmax) = Kernels.multiclassFromLogits(
              Array.tabulate(k)(c => y(c * m + j)))
            (id, pred, pmax)
          }
        }
      }.toDF(idCol, "pred", "p_max")
  }

  /** ROC AUC via the rank-sum (Mann-Whitney U) formula over SCORE
    * BINS: AUC = Σ_s nPos_s · (negBelow_s + nNeg_s / 2) / (P · N),
    * ties (equal scores) contributing half — exact on the binned
    * scores. Callers pass an already-rounded score column; binning on
    * the rounded grid is what makes the statistic engine-portable.
    *
    * Scale shape: one hash aggregate per DISTINCT score (shuffle ∝
    * bins, bounded by the rounding grid — ≤ ~10⁴ rows for 4 dp scores
    * in [0,1], at ANY corpus size), then the ordered cumulative pass
    * runs over that provably tiny table. Never a global sort or
    * per-row rank window over the data — the reason plain
    * rank-then-sum AUC breaks at 100 TB and this shape doesn't. The
    * numerator sums half-integer products of exact counts, so it is
    * order-independent in IEEE doubles (no decimal detour needed). */
  def aucBinned(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val bins = df.select(col(scoreCol).as("_s"), col(labelCol).cast("long").as("_y"))
      .groupBy("_s")
      .agg(sum(col("_y")).as("_np"), (count(lit(1)) - sum(col("_y"))).as("_nn"))
    val w = Window.orderBy(col("_s")).rowsBetween(Window.unboundedPreceding, -1)
    bins.withColumn("_below", coalesce(sum(col("_nn")).over(w), lit(0L)))
      .agg(sum(col("_np").cast("double")
          * (col("_below").cast("double") + col("_nn").cast("double") / 2.0)).as("_num"),
        sum(col("_np")).as("n_pos"), sum(col("_nn")).as("n_neg"))
      .select(Canon.r4(col("_num")
          / (col("n_pos").cast("double") * col("n_neg").cast("double"))).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Full-batch logistic-regression GD via treeAggregate: shuffle-free
    * tree reduction per step, O(dims) driver state — the reference's
    * broadcast+reduce training loop, which scales to 1000 executors. */
  def trainLogisticGD(df: DataFrame, vecCol: String, labelCol: String,
      steps: Int, lr: Double, dims: Int): Array[Double] = {
    val data = df.select(col(vecCol), col(labelCol).cast("double"))
      .rdd.map { r =>
        val e = r.getAs[scala.collection.Seq[Float]](0)
        val x = new Array[Double](e.length)
        var i = 0; while (i < e.length) { x(i) = e(i).toDouble; i += 1 }
        (x, r.getDouble(1))
      }.cache()
    val w = new Array[Double](dims)
    for (_ <- 1 to steps) {
      val (grad, n) = data.treeAggregate((new Array[Double](dims), 0L))(
        seqOp = { case ((g, cnt), (x, y)) =>
          var acc = 0.0
          var i = 0; while (i < dims) { acc += w(i) * x(i); i += 1 }
          val err = Kernels.sigmoid(acc) - y
          i = 0; while (i < dims) { g(i) += err * x(i); i += 1 }
          (g, cnt + 1L)
        },
        combOp = { case ((g1, n1), (g2, n2)) =>
          var i = 0; while (i < dims) { g1(i) += g2(i); i += 1 }
          (g1, n1 + n2)
        },
        depth = 2)
      var i = 0
      while (i < dims) { w(i) -= lr * grad(i) / n; i += 1 }
    }
    data.unpersist(blocking = false)
    w
  }
}
