package graft.operators

import graft.{Canon, Q, Tables}
import graft.Canon.{sql => O}
import graft.api.Similarity
import graft.functions.Kernels
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.9 (vector half) — similarity search over the embedding column.
  *
  * All vector math goes through the compiled kernels (SURVEY §4.3):
  * Catalyst higher-order lambdas measured 200× slower. Even the
  * "brute-force" exact top-k key routes through the cell-blocked
  * threshold descent (equi-join through allowed cell pairs), so no
  * declared key plans an unblocked O(n²) join; the true BNLJ
  * baseline lives in the API only as the parity reference.
  */
object SimilarityOps {
  /** DuckDB-side cosine spelled to mirror Kernels.cosineArr op-for-op
    * (double accumulation, sqrt(na)*sqrt(nb) denominator). */
  private def duckCosine(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))" +
      s" / (sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))" +
      s" * sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))))"

  /** Build-once-per-JVM on-disk IVF index for sim_knn_ivf_probe_only,
    * keyed by the input dir: train the codebook, lay the corpus out one
    * directory per cell (Similarity.saveIvfIndex), return the base
    * path. The scratch dir is pid-keyed and shutdown-cleaned
    * (Writers.roundTripDir), so two JVMs never race. */
  private val ivfProbeIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfProbeIndexFor(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    ivfProbeIndexes.computeIfAbsent(d, { _ =>
      val e = Tables.embeddings(s, d)
      val cents = Similarity.trainCodebook(e, "vec_id", "embedding", k = 16)
      val base = graft.sources.Writers.roundTripDir("graft_ivfpo_idx", d)
      Similarity.saveIvfIndex(e, "vec_id", "embedding", cents, base)
      base
    })

  /** Spec-seeded literal projection parameters (embed_project_literal):
    * the SAME rowwise kernel as embed_pca_project but against a PINNED
    * 8×64 component matrix and mean — so the projection kernel gets an
    * exact DuckDB hash gate independent of the eigensolver. Same
    * deterministic recipe as ml.MlOps.weights (6 dp-rounded sin(), so
    * the SQL literal and the JVM double are identical):
    * C(j)(i) = round6(sin(7000 + j·64 + i + 1)),
    * mu(i) = round6(sin(8000 + i + 1)). */
  val litComps: Array[Array[Double]] =
    Array.tabulate(8)(j => Array.tabulate(64)(i =>
      BigDecimal(math.sin(7000.0 + j * 64 + i + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  val litMean: Array[Double] = Array.tabulate(64)(i =>
    BigDecimal(math.sin(8000.0 + i + 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  private def vecLit(v: Array[Double]): String =
    v.map(w => BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toString)
      .mkString("[", ", ", "]")

  /** NDCG@10 rank discounts 1/log2(rank+1), 6 dp-rounded — computed
    * ONCE here and inlined as the SAME literals into both the Spark
    * plan and the DuckDB oracle, so no cross-engine log2 ulp can ever
    * reach the rounding boundary (the §7.3 discipline applied to
    * irrational constants: share literals, not math library calls). */
  private val ndcgDiscs: IndexedSeq[Double] = (1 to 10).map(i =>
    BigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Ideal cumulative DCG at cut k (all-relevant prefix): exact 6 dp
    * decimal partial sums of [[ndcgDiscs]], shared as literals the
    * same way. */
  private val ndcgIdeals: IndexedSeq[Double] = ndcgDiscs
    .scanLeft(BigDecimal(0)) { (acc, d) => acc + BigDecimal(d) }
    .tail.map(_.toDouble)

  val queries: Map[String, Q] = Map(
    "ml_eval_ndcg" -> ((s, d) => {
      // retrieval-ranking eval — the metric a vector-store user grades
      // an index with: per query (vec_id < 10), rank the corpus by
      // exact cosine, take the top-10, score LABEL relevance
      // (candidate shares the query's class) as NDCG@10 /
      // precision@10 / recall@10. Discounts and ideal-DCG cuts are
      // shared 6 dp literals (see ndcgDiscs); per-query DCG is an
      // exact decimal sum of grid-valued terms, so the hash compare
      // cannot drift on float re-association. Scale shape: the top-10
      // comes from the same broadcast-query cosine scan as
      // sim_knn_per_query (one corpus pass, bounded heap); the label
      // lookup joins the corpus AGAINST the broadcast 100-row result;
      // the relevance denominator is a broadcast label histogram
      // (state ∝ 10 classes) — no corpus-sized shuffle anywhere.
      val e = Tables.embeddings(s, d)
      val knn = Similarity.cosineKnn(e, "vec_id", "embedding",
        queryPred = col("vec_id") < 10, k = 10, simRound = Some(4))
      val ql = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("_ql"))
      val hist = e.groupBy(col("label").as("_ql")).agg(count(lit(1)).as("_n"))
      val discArr = array(ndcgDiscs.map(lit(_)): _*)
      val idealArr = array(ndcgIdeals.map(lit(_)): _*)
      val graded = e.select(col("vec_id").as("cid"), col("label").as("_cl"))
        .join(broadcast(knn.join(broadcast(ql), "qid")), "cid")
        .select(col("qid"), col("_ql"),
          (col("_cl") === col("_ql")).cast("int").as("_rel"),
          element_at(discArr, col("rank").cast("int")).as("_disc"))
      val perQ = graded.groupBy("qid", "_ql")
        .agg(sum(col("_rel")).as("hits"),
          Canon.sumDec(col("_disc") * col("_rel"), 6).as("_dcg"))
      val totalRel = col("_n") - 1 // the query itself is never a candidate
      perQ.join(broadcast(hist), "_ql")
        .select(col("qid"), col("hits"), totalRel.as("total_rel"),
          Canon.r4(col("hits") / lit(10.0)).as("precision_at_10"),
          Canon.r4(when(totalRel > 0,
            col("hits").cast("double") / totalRel.cast("double"))
            .otherwise(lit(0.0))).as("recall_at_10"),
          Canon.r4(when(totalRel > 0, col("_dcg") /
            element_at(idealArr, least(lit(10), totalRel).cast("int")))
            .otherwise(lit(0.0))).as("ndcg_at_10"))
        .orderBy("qid")
    }),
    "ml_eval_mrr" -> ((s, d) => {
      // reciprocal rank of the FIRST relevant hit in the cosine top-10
      // per query — the navigational-retrieval twin of ml_eval_ndcg
      // (NDCG grades the whole ranking; MRR grades time-to-first-hit,
      // the metric for RAG-style "did the right chunk surface at all"
      // evals). Same plumbing: broadcast-query cosine scan, label
      // relevance, corpus joined against the broadcast 100-row top-10.
      // rr = r4(1/rank) — an exact division of the same ints in both
      // engines; queries with no relevant hit in the top-10 emit rank
      // 0 / rr 0.0 (never NULL — the driver's NULL-cell hashing is
      // unpinned).
      val e = Tables.embeddings(s, d)
      val knn = Similarity.cosineKnn(e, "vec_id", "embedding",
        queryPred = col("vec_id") < 10, k = 10, simRound = Some(4))
      val ql = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("_ql"))
      e.select(col("vec_id").as("cid"), col("label").as("_cl"))
        .join(broadcast(knn.join(broadcast(ql), "qid")), "cid")
        .groupBy("qid")
        .agg(coalesce(min(when(col("_cl") === col("_ql"), col("rank"))),
          lit(0L)).as("first_rel_rank"))
        .select(col("qid"), col("first_rel_rank"),
          when(col("first_rel_rank") > 0,
            Canon.r4(lit(1.0) / col("first_rel_rank")))
            .otherwise(lit(0.0)).as("rr"))
        .orderBy("qid")
    }),
    "ml_eval_map" -> ((s, d) => {
      // MAP@10 — completes the retrieval-eval trio (r18): ml_eval_ndcg
      // grades the whole ranking by graded discount, ml_eval_mrr the
      // time-to-first-hit; AP integrates precision at every relevant
      // rank — the recall-weighted middle ground and the leaderboard
      // metric for multi-relevant retrieval. Per query:
      // AP@10 = Σ_{i≤10, rel_i=1} P@i / min(10, total_rel), where
      // P@i = hits_at_i / i. Each P@i term grid-rounds to 6 dp BEFORE
      // the exact decimal fold (the averagePrecisionBinned discipline):
      // P@i is one double division of the SAME two ints in both
      // engines, so the rounded terms are bit-identical and the
      // decimal sum cannot re-associate. Scale shape identical to
      // ml_eval_ndcg: one broadcast-query cosine scan (bounded heap),
      // the corpus joined against the broadcast 100-row top-10, the
      // cumulative window over ≤10 rows per query, the relevance
      // denominator a broadcast 10-class label histogram.
      val e = Tables.embeddings(s, d)
      val knn = Similarity.cosineKnn(e, "vec_id", "embedding",
        queryPred = col("vec_id") < 10, k = 10, simRound = Some(4))
      val ql = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("_ql"))
      val hist = e.groupBy(col("label").as("_ql")).agg(count(lit(1)).as("_n"))
      val graded = e.select(col("vec_id").as("cid"), col("label").as("_cl"))
        .join(broadcast(knn.join(broadcast(ql), "qid")), "cid")
        .select(col("qid"), col("_ql"),
          (col("_cl") === col("_ql")).cast("int").as("_rel"), col("rank"))
      val w = Window.partitionBy("qid").orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val terms = graded.withColumn("_ch", sum(col("_rel")).over(w))
        .select(col("qid"), col("_ql"), col("_rel"),
          when(col("_rel") === 1,
            Canon.rk(col("_ch").cast("double") / col("rank").cast("double"), 6))
            .as("_p"))
      val perQ = terms.groupBy("qid", "_ql")
        .agg(sum(col("_rel")).as("hits"), Canon.sumDec(col("_p"), 6).as("_apn"))
      val totalRel = col("_n") - 1 // the query itself is never a candidate
      perQ.join(broadcast(hist), "_ql")
        .select(col("qid"), col("hits"),
          when(col("hits") > 0,
            Canon.r4(col("_apn") / least(lit(10L), totalRel).cast("double")))
            .otherwise(lit(0.0)).as("ap_at_10"))
        .orderBy("qid")
    }),
    "sim_knn_bruteforce" -> ((s, d) => {
      // exact global top-100 pairs — same result as the brute-force
      // pair join, but routed through the cell-blocked threshold
      // descent so the plan is an equi-join through allowed cell
      // pairs (survives 100×; the BNLJ baseline cosineTopKPairs
      // remains in the API as the parity reference, ApiParitySpec)
      val e = Tables.embeddings(s, d)
      val cents = Similarity.trainCodebook(e, "vec_id", "embedding", k = 16)
      Similarity.cosineTopKPairsBlocked(e, "vec_id", "embedding",
          k = 100, centroids = cents, simRound = Some(4))
        .orderBy(col("sim").desc, col("id1").asc, col("id2").asc)
    }),
    "sim_maxsim_multivector" -> ((s, d) => {
      // ColBERT-style late interaction: each 64-dim embedding viewed
      // as 4×16 sub-vectors, score = Σ_i max_j dot(q_i, c_j), top-5
      // per query — the multi-vector retrieval scorer single-vector
      // cosine can't express. Native graft_maxsim codegen expression
      // (dots/maxes/sum in one fixed op sequence → the oracle's
      // greatest(...)+... chain computes the identical double)
      Similarity.maxSimKnn(Tables.embeddings(s, d), "vec_id", "embedding",
          queryPred = col("vec_id") < 5, m = 4, k = 5, simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_knn_per_query" -> ((s, d) => {
      Similarity.cosineKnn(Tables.embeddings(s, d), "vec_id", "embedding",
          queryPred = col("vec_id") < 10, k = 5, simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_knn_ivf" -> ((s, d) => {
      // ✘ no oracle (approximate by design): IVF-quantized kNN for the
      // same queries as sim_knn_per_query; recall vs the brute-force
      // baseline is unit-tested. Centroids: deterministic sampled
      // k-means (hash-ordered sample + Lloyd rounds) — the trained
      // coarse quantizer; the same call scales to 100 TB because the
      // sample is a bounded TakeOrdered.
      val e = Tables.embeddings(s, d)
      val cents = Similarity.trainCodebook(e, "vec_id", "embedding", k = 16)
      Similarity.ivfKnn(e, "vec_id", "embedding",
          queryPred = col("vec_id") < 10, k = 5,
          centroids = cents, nprobe = 4, simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_knn_ivf_persisted" -> ((s, d) => {
      // ✘ no oracle (approximate by design, like sim_knn_ivf): the
      // PERSISTED twin — train the codebook, write the full index to
      // disk (codebook parquet + corpus laid out one directory per
      // cell), reopen it COLD, probe the same queries. This is the
      // cost model an incremental 100 TB dedup actually runs between
      // crawl batches: the index side is on disk, the batch probes
      // nprobe/|cells| of it. Unit-tested: output is BITWISE identical
      // to the in-memory sim_knn_ivf result (NoOracleSpec) and the
      // probe scan carries the cell id as a partition key
      // (WritePathSpec).
      val e = Tables.embeddings(s, d)
      val cents = Similarity.trainCodebook(e, "vec_id", "embedding", k = 16)
      val base = graft.sources.Writers.roundTripDir("graft_ivf_idx", d)
      Similarity.saveIvfIndex(e, "vec_id", "embedding", cents, base)
      Similarity.ivfKnnFromIndex(e.filter(col("vec_id") < 10), "vec_id",
          "embedding", base, k = 5, nprobe = 4, simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_knn_ivf_probe_only" -> ((s, d) => {
      // ✘ no oracle — the PROBE-ONLY twin of sim_knn_ivf_persisted:
      // identical output (NoOracleSpec asserts bitwise parity), but
      // codebook training + the cell-partitioned index write happen
      // ONCE per JVM (memoized below); every subsequent call only
      // routes queries to nprobe cells of the on-disk index. This
      // isolates the per-batch number the 100 TB cost model claims —
      // the persisted key deliberately keeps timing the full cold
      // build+probe round trip. Bench min-of-3 lands on a probe-only
      // run by construction (run 1 pays the build).
      val e = Tables.embeddings(s, d)
      val base = ivfProbeIndexFor(s, d)
      Similarity.ivfKnnFromIndex(e.filter(col("vec_id") < 10), "vec_id",
          "embedding", base, k = 5, nprobe = 4, simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_knn_ivf_routed" -> ((s, d) => {
      // ✘ no oracle — the SIGNAL-ROUTED probe (r20), closing IVF's
      // documented isotropic worst case: saveIvfIndex calibrates a
      // per-nprobe predicted-recall ladder at build time (measured
      // neighbor-cell containment on a bounded hash sample — NOT a
      // geometric proxy; tools.SignalProbe measured the intra/inter
      // angle ratio non-separating) and persists it in the index
      // manifest; the probe self-tunes to the smallest nprobe whose
      // predicted recall meets the 0.9 target. Measured: the
      // near-isotropic fixtures route 4 → 10-11 and read 0.90-0.94@5
      // where the base config reads 0.48-0.62; clustered corpora keep
      // base 4 untouched at 1.0 (SignalProbe lines; NoOracleSpec
      // floors recall ≥ 0.8 and pins the no-regression routing).
      val e = Tables.embeddings(s, d)
      val base = ivfProbeIndexFor(s, d)
      Similarity.ivfKnnFromIndexRouted(e.filter(col("vec_id") < 10), "vec_id",
          "embedding", base, k = 5, baseNprobe = 4, simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_knn_ivfpq" -> ((s, d) => {
      // ✘ no oracle (approximate by design): IVF routing + RESIDUAL
      // product-quantization ADC scan + exact re-rank — the composed
      // memory-resident ANN layout a 100 TB vector store actually
      // runs. Codes quantize x − c(cell), not x (r18; raw codes
      // collapse within a cell on clustered corpora — 0.10 recall@5
      // measured where plain IVF reads 1.00). The candidate join never
      // touches raw vectors (8 byte-codes + a stored norm per corpus
      // row, 26× smaller); the top-50 ADC shortlist re-ranks through
      // the exact codegen cosine. Recall vs brute force and the
      // ADC≡reconstructed-dot identity are unit-tested (PqSpec,
      // NoOracleSpec); clustered-corpus recall in RECALL_r18.json.
      val e = Tables.embeddings(s, d)
      val coarse = Similarity.trainCodebook(e, "vec_id", "embedding", k = 16)
      val books = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
        m = 8, ks = 16, residualTo = Some(coarse))
      Similarity.pqKnn(e, "vec_id", "embedding",
          queryPred = col("vec_id") < 10, k = 5,
          centroids = coarse, nprobe = 4, books = books, rerank = 50,
          simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_knn_ivfpq_hq" -> ((s, d) => {
      // ✘ no oracle (approximate by design): the PRODUCTION-config
      // IVF-PQ twin (r19) — coarse 128 / ks 256 (8-bit codes) /
      // nprobe 8 / rerank 200, the budget the RECALL_r18 pq_ladders
      // prove reaches 0.94 recall@5 on the clustered100k_loose
      // regime (0.56 on tight — sub-resolution gaps stay the exact
      // cell-blocked operator's job) where the fixture-sized
      // sim_knn_ivfpq params read 0.36/0.04. Identical pqKnn /
      // trainPqCodebooks(residualTo) path — ONLY the budget differs:
      // this is the config a user should copy for a real corpus;
      // the small key remains as the tiny-corpus/determinism fixture.
      // NoOracleSpec pins recall ≥ 0.9 on the loose clustered 100k
      // synthetic through this exact config; RECALL_r19 carries the
      // per-regime rows.
      val e = Tables.embeddings(s, d)
      val coarse = Similarity.trainCodebook(e, "vec_id", "embedding", k = 128)
      val books = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
        m = 8, ks = 256, residualTo = Some(coarse))
      Similarity.pqKnn(e, "vec_id", "embedding",
          queryPred = col("vec_id") < 10, k = 5,
          centroids = coarse, nprobe = 8, books = books, rerank = 200,
          simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_knn_ivf_upsert" -> ((s, d) => {
      // ✘ no oracle (approximate by design, like sim_knn_ivf): the
      // INCREMENTAL-MAINTENANCE twin (r19) completing the
      // between-crawls cost model the persisted/probe-only pair
      // claims: the index is built on the EXISTING corpus only
      // (~81% by id digest — the split dedup_embed_incremental uses),
      // the new batch lands via ivfUpsert (frozen codebook routing +
      // per-cell APPEND, existing files untouched), a small id set is
      // ivfDelete-tombstoned, and the probe reads the MERGED index —
      // tombstones applied as a broadcast anti-join, partition
      // pruning intact. NoOracleSpec asserts the probe is BITWISE
      // identical to an index built in one shot on
      // (corpus ∪ batch) ∖ deletes with the same codebook;
      // WritePathSpec asserts the merged probe stays exchange-free
      // over the cells scan and still prunes unprobed cell dirs.
      val e = Tables.embeddings(s, d)
      val isNew = substring(md5(col("vec_id").cast("string").cast("binary")), 1, 1) >= "d"
      val corpus0 = e.filter(!isNew)
      val cents = Similarity.trainCodebook(corpus0, "vec_id", "embedding", k = 16)
      val base = graft.sources.Writers.roundTripDir("graft_ivfup_idx", d)
      Similarity.saveIvfIndex(corpus0, "vec_id", "embedding", cents, base)
      Similarity.ivfUpsert(e.filter(isNew), "vec_id", "embedding", base)
      // delete a deterministic ~1% slice (ids ≡ 13 mod 97, none of
      // them query ids) — exercises tombstones on rows from BOTH the
      // original build and the upserted batch
      Similarity.ivfDelete(e.filter(col("vec_id") % 97 === 13), "vec_id", base)
      Similarity.ivfKnnFromIndex(e.filter(col("vec_id") < 10), "vec_id",
          "embedding", base, k = 5, nprobe = 4, simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_knn_pca" -> ((s, d) => {
      // ✘ no oracle (approximate by design): PCA-prefiltered kNN for
      // the same queries as sim_knn_per_query — coarse L2 in 16-dim
      // PCA space → per-query shortlist-100 → exact cosine re-rank.
      // The dimensionality-reduction member of the ANN family (IVF
      // prunes by partition, PQ by code bytes, this by per-comparison
      // width); recall vs the exact baseline unit-tested. pcaK=16 of
      // 64, not 8: these fixture embeddings are near-isotropic (the
      // spectrum is flat, unlike real text/image embeddings whose
      // energy concentrates in the head), so an 8-dim coarse space
      // under-ranks — the spec records the measured recall ladder.
      Similarity.pcaKnn(Tables.embeddings(s, d), "vec_id", "embedding",
          queryPred = col("vec_id") < 10, k = 5, dims = 64,
          pcaK = 16, shortlist = 100, simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_knn_rplsh" -> ((s, d) => {
      // ✘ no oracle (approximate by design): random-hyperplane LSH kNN
      // for the same queries as sim_knn_per_query — the data-
      // independent twin of sim_knn_ivf (no codebook, seeded planes,
      // fully reproducible). Recall vs the brute-force baseline is
      // unit-tested.
      Similarity.rpLshKnn(Tables.embeddings(s, d), "vec_id", "embedding",
          queryPred = col("vec_id") < 10, k = 5, dims = 64,
          simRound = Some(4))
        .withColumnRenamed("rank", "rn")
        .orderBy("qid", "rn")
    }),
    "dedup_embed_cosine" -> ((s, d) => {
      // embedding-space near-dup pairs above a cosine threshold via the
      // EXACT cell-blocked join (cosinePairsAboveCellBlocked): vectors
      // route through allowed cell pairs (triangle-inequality pruning),
      // never an unblocked cross join. On this fixture's random-ish
      // embeddings a 0.4 threshold admits every cell pair (nothing is
      // exactly prunable), but the output is provably identical to
      // brute force on ANY data, and on clustered production corpora
      // (thresholds 0.95+) the same plan is cell-local. Centroids: the
      // trained k-means codebook, as sim_knn_ivf — exactness never
      // depends on the codebook, only pruning quality does.
      val e = Tables.embeddings(s, d)
      val cents = Similarity.trainCodebook(e, "vec_id", "embedding", k = 16)
      Similarity.cosinePairsAboveCellBlocked(e, "vec_id", "embedding",
          minSim = 0.4, centroids = cents, simRound = Some(4))
        .orderBy("id1", "id2")
    }),
    "dedup_embed_incremental" -> ((s, d) => {
      // incremental semantic dedup: new-batch vectors (id-digest split,
      // ~19%) vs the existing corpus — EXACT batch×corpus cosine pairs
      // via per-batch-vector cell pruning (cosinePairsAgainstIndexCell
      // Blocked); probe cost tracks batch size, the corpus cell layout
      // is the persistable index side. Codebook trained on the CORPUS
      // only (the index side a real ingest would have on hand).
      val e = Tables.embeddings(s, d)
      val isNew = substring(md5(col("vec_id").cast("string").cast("binary")), 1, 1) >= "d"
      val corpus = e.filter(!isNew)
      val cents = Similarity.trainCodebook(corpus, "vec_id", "embedding", k = 16)
      Similarity.cosinePairsAgainstIndexCellBlocked(e.filter(isNew), corpus,
          "vec_id", "embedding", minSim = 0.4, centroids = cents, simRound = Some(4))
        .orderBy("id1", "id2")
    }),
    "sim_threshold_join" -> ((s, d) => {
      Similarity.cosineThresholdJoin(Tables.embeddings(s, d), "vec_id", "embedding",
          groupCol = "label", minSim = 0.95, simRound = Some(4))
        .orderBy("id1", "id2")
    }),
    "multimodal_embed_norm" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"), Canon.r4(Kernels.l2norm(col("embedding"))).as("norm"))
        .orderBy("vec_id")
    }),
    "embed_quantize_int8" -> ((s, d) => {
      // per-vector int8 quantization — the 4× storage cut before ANN
      // at 100 TB. Pure higher-order functions (one codegen'd
      // projection, no UDF); the DuckDB twin spells the identical
      // double arithmetic and floor(x+0.5) grid, so the hash compares
      // all 64 codes per vector exactly (comma-joined, the
      // agg_collect_sorted transport convention for array cells).
      Similarity.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"), col("mn"), col("mx"),
          array_join(col("q"), ",").as("q"))
        .orderBy("vec_id")
    }),
    "embed_pca_project" -> ((s, d) => {
      // ✘ no oracle — eigendecomposition has no DuckDB twin. PCA
      // compression of the embedding table to 8 components: moments in
      // ONE treeAggregate (buffer d + d(d+1)/2 doubles, corpus-size-
      // independent), the 64×64 eigenproblem solved driver-side by
      // Jacobi, projection a rowwise broadcast map. Unit-tested:
      // orthonormality, eigen residuals vs a local covariance, trace
      // identity, variance ordering, projection parity (NoOracleSpec).
      val e = Tables.embeddings(s, d)
      val (mu, comps, _) = graft.api.MlPipeline.pcaFit(e, "embedding", k = 8, dims = 64)
      // Transport: comma-joined scalars (the embed_quantize_int8
      // convention) — a raw array<double> column breaks generic result
      // harnesses (unsortable/unhashable cells). The UDF already emits
      // a 6-dp grid, so the string form is stable across partitionings.
      e.select(col("vec_id"),
          array_join(transform(
            graft.api.MlPipeline.pcaProjectUdf(mu, comps)(col("embedding")),
            x => x.cast("string")), ",").as("proj"))
        .orderBy("vec_id")
    }),
    "embed_project_literal" -> ((s, d) => {
      // Oracle-checked twin of embed_pca_project's TRANSFORM half: the
      // identical rowwise projection kernel (pcaProjectUdf — centered
      // dot per component, 6-dp grid) against pinned literal
      // components, long-form output (the embed_centroid_by_label
      // transport). The DuckDB twin spells the same centered
      // accumulation via list_zip/list_dot_product, so the kernel gets
      // a rows+schema+hash gate independent of the eigensolver.
      val e = Tables.embeddings(s, d)
      e.select(col("vec_id"),
          posexplode(graft.api.MlPipeline.pcaProjectUdf(litMean, litComps)(col("embedding")))
            .as(Seq("comp", "value")))
        .orderBy("vec_id", "comp")
    }),
    "ml_embedding_drift" -> ((s, d) => {
      // embedding-distribution drift: per label, cosine between the
      // md5-split reference/candidate centroid vectors + both norms —
      // the encoder-change monitor run before re-embedding a corpus
      // (rotation → cos < 1, scale change → norm shift). One
      // posexplode pass, exact decimal component sums, per-dim terms
      // grid-rounded before the decimal dot/norm folds
      // (Similarity.embeddingDrift)
      Similarity.embeddingDrift(Tables.embeddings(s, d), "label",
          "embedding",
          substring(md5(col("vec_id").cast("string").cast("binary")),
            1, 1) < "8")
        .orderBy("label")
    }),
    "embed_centroid_by_label" -> ((s, d) => {
      // Row output avoids array-encoding equivalence issues and the
      // groupBy(label, dim) partial-aggregates before the shuffle.
      Similarity.centroids(Tables.embeddings(s, d), "label", "embedding")
        .select(col("label"), col("dim"), Canon.r4(col("centroid")).as("centroid"))
        .orderBy("label", "dim")
    }),
    "dedup_embed_clusters" -> ((s, d) => {
      // SEMANTIC duplicate clusters: the embedding-space twin of
      // dedup_clusters — exact cell-blocked cosine pairs (same plan as
      // dedup_embed_cosine) resolved into connected components, cluster
      // id = min reachable vec_id. The full semantic-dedup composite a
      // training pipeline runs before packing: pairs → graph → keep one
      // per cluster.
      val e = Tables.embeddings(s, d)
      val cents = Similarity.trainCodebook(e, "vec_id", "embedding", k = 16)
      val pairs = Similarity.cosinePairsAboveCellBlocked(e, "vec_id", "embedding",
          minSim = 0.4, centroids = cents, simRound = Some(4))
        .select(col("id1"), col("id2"))
      graft.api.Dedup.connectedComponents(pairs)
        .select(col("id").as("vec_id"), col("label").as("cluster"))
        .orderBy("vec_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "sim_knn_bruteforce" ->
      s"""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  ${O.r4(duckCosine("a.embedding", "b.embedding"))} AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, sim FROM p
        |ORDER BY sim DESC, id1, id2 LIMIT 100""".stripMargin,
    // mirrors Kernels.maxSimArr: per-chunk dots via list_dot_product
    // on double-cast 16-element slices (the graft_cosine parity
    // precedent), greatest() per query chunk, left-assoc + chain —
    // the identical fixed op sequence the codegen kernel runs
    "sim_maxsim_multivector" -> {
      def dp(i: Int, j: Int) = {
        def sl(c: String, x: Int) = s"CAST($c[${x * 16 + 1}:${x * 16 + 16}] AS DOUBLE[])"
        s"list_dot_product(${sl("q.qe", i)}, ${sl("c.embedding", j)})"
      }
      val score = (0 to 3).map(i =>
        s"greatest(${(0 to 3).map(j => dp(i, j)).mkString(", ")})")
        .mkString(" + ")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |j AS (SELECT q.qid, c.vec_id AS cid,
        |        ${O.r4(s"($score)")} AS score
        |      FROM q JOIN embeddings c ON q.qid <> c.vec_id),
        |r AS (SELECT qid, cid, score,
        |        CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS BIGINT) AS rn
        |      FROM j)
        |SELECT qid, cid, score, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
    },
    // same ranking CTE as ml_eval_ndcg; rr is an exact 1/rank division
    "ml_eval_mrr" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
        |      FROM embeddings WHERE vec_id < 10),
        |j AS (SELECT q.qid, q.ql, c.vec_id AS cid, c.label AS cl,
        |        ${O.r4(duckCosine("q.qe", "c.embedding"))} AS sim
        |      FROM q JOIN embeddings c ON q.qid <> c.vec_id),
        |r AS (SELECT qid, ql, cl,
        |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
        |      FROM j),
        |g AS (SELECT qid,
        |        CAST(coalesce(min(CASE WHEN cl = ql THEN rn END), 0) AS BIGINT)
        |          AS first_rel_rank
        |      FROM r WHERE rn <= 10 GROUP BY 1)
        |SELECT qid, first_rel_rank,
        |  CASE WHEN first_rel_rank > 0
        |    THEN ${O.r4("1.0 / first_rel_rank")} ELSE 0.0 END AS rr
        |FROM g ORDER BY qid""".stripMargin,
    // same ranking CTE as sim_knn_per_query at k=10; discounts and
    // ideal-DCG cuts are the ndcgDiscs/ndcgIdeals literals verbatim
    "ml_eval_ndcg" -> {
      // BigDecimal strings, NOT f"%.6f": printf %f is locale-sensitive
      // (a comma-decimal default locale would emit 'THEN 0,630930' —
      // invalid SQL); same rule as vecLit/weightsSqlLit
      def lit6(x: Double): String =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toString
      val discCase = (1 to 10)
        .map(i => s"WHEN $i THEN ${lit6(ndcgDiscs(i - 1))}").mkString(" ")
      val idealCase = (1 to 10)
        .map(k => s"WHEN $k THEN ${lit6(ndcgIdeals(k - 1))}").mkString(" ")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
        |      FROM embeddings WHERE vec_id < 10),
        |j AS (SELECT q.qid, q.ql, c.vec_id AS cid, c.label AS cl,
        |        ${O.r4(duckCosine("q.qe", "c.embedding"))} AS sim
        |      FROM q JOIN embeddings c ON q.qid <> c.vec_id),
        |r AS (SELECT qid, ql, cl,
        |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
        |      FROM j),
        |t AS (SELECT qid, ql, CAST(cl = ql AS INT) AS rel,
        |        CASE rn $discCase END AS disc
        |      FROM r WHERE rn <= 10),
        |h AS (SELECT label AS ql, count(*) AS n FROM embeddings GROUP BY 1),
        |g AS (SELECT qid, ql, CAST(sum(rel) AS BIGINT) AS hits,
        |        CAST(sum(CAST(disc * rel AS DECIMAL(28,6))) AS DOUBLE) AS dcg
        |      FROM t GROUP BY 1, 2)
        |SELECT qid, hits, CAST(n - 1 AS BIGINT) AS total_rel,
        |  ${O.r4("hits / 10.0")} AS precision_at_10,
        |  ${O.r4("CASE WHEN n > 1 THEN CAST(hits AS DOUBLE) / (n - 1) ELSE 0.0 END")} AS recall_at_10,
        |  ${O.r4(s"CASE WHEN n > 1 THEN dcg / (CASE least(10, n - 1) $idealCase END) ELSE 0.0 END")} AS ndcg_at_10
        |FROM g JOIN h USING (ql) ORDER BY qid""".stripMargin
    },
    // same ranking CTE as ml_eval_ndcg; each P@i term 6 dp-grid-rounds
    // (one int/int double division, bit-identical cross-engine) before
    // the exact decimal fold — the averagePrecisionBinned discipline
    "ml_eval_map" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
        |      FROM embeddings WHERE vec_id < 10),
        |j AS (SELECT q.qid, q.ql, c.vec_id AS cid, c.label AS cl,
        |        ${O.r4(duckCosine("q.qe", "c.embedding"))} AS sim
        |      FROM q JOIN embeddings c ON q.qid <> c.vec_id),
        |r AS (SELECT qid, ql, cl,
        |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
        |      FROM j),
        |t AS (SELECT qid, ql, CAST(cl = ql AS INT) AS rel, rn,
        |        sum(CAST(cl = ql AS INT)) OVER (PARTITION BY qid ORDER BY rn) AS ch
        |      FROM r WHERE rn <= 10),
        |h AS (SELECT label AS ql, count(*) AS n FROM embeddings GROUP BY 1),
        |g AS (SELECT qid, ql, CAST(sum(rel) AS BIGINT) AS hits,
        |        ${O.sumDec(s"CASE WHEN rel = 1 THEN ${O.rk("CAST(ch AS DOUBLE) / rn", 6)} END", 6)} AS apn
        |      FROM t GROUP BY 1, 2)
        |SELECT qid, hits,
        |  CASE WHEN hits > 0
        |    THEN ${O.r4("apn / CAST(least(10, n - 1) AS DOUBLE)")}
        |    ELSE 0.0 END AS ap_at_10
        |FROM g JOIN h USING (ql) ORDER BY qid""".stripMargin,
    "sim_knn_per_query" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |j AS (SELECT q.qid, c.vec_id AS cid,
        |        ${O.r4(duckCosine("q.qe", "c.embedding"))} AS sim
        |      FROM q JOIN embeddings c ON q.qid <> c.vec_id),
        |r AS (SELECT qid, cid, sim,
        |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
        |      FROM j)
        |SELECT qid, cid, sim, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    "dedup_embed_cosine" ->
      s"""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  ${O.r4(duckCosine("a.embedding", "b.embedding"))} AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, sim FROM p WHERE sim >= 0.4
        |ORDER BY id1, id2""".stripMargin,
    "dedup_embed_incremental" ->
      s"""WITH n AS (SELECT vec_id, embedding FROM embeddings
        |       WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) >= 'd'),
        |c AS (SELECT vec_id, embedding FROM embeddings
        |      WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < 'd'),
        |p AS (SELECT n.vec_id AS id1, c.vec_id AS id2,
        |        ${O.r4(duckCosine("n.embedding", "c.embedding"))} AS sim
        |      FROM n, c)
        |SELECT id1, id2, sim FROM p WHERE sim >= 0.4
        |ORDER BY id1, id2""".stripMargin,
    "sim_threshold_join" ->
      s"""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, a.label AS label,
        |  ${O.r4(duckCosine("a.embedding", "b.embedding"))} AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id1, id2, label, sim FROM p WHERE sim >= 0.95
        |ORDER BY id1, id2""".stripMargin,
    "multimodal_embed_norm" ->
      s"""SELECT vec_id,
        |  ${O.r4("sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))")} AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "embed_quantize_int8" ->
      """WITH t AS (SELECT vec_id,
        |    CAST(embedding AS DOUBLE[]) AS e,
        |    list_min(CAST(embedding AS DOUBLE[])) AS mn,
        |    list_max(CAST(embedding AS DOUBLE[])) AS mx
        |  FROM embeddings)
        |SELECT vec_id, mn, mx,
        |  array_to_string(
        |    CASE WHEN mx = mn THEN list_transform(e, v -> 0)
        |         ELSE list_transform(e, v ->
        |           CAST(floor((v - mn) * 255.0 / (mx - mn) + 0.5) AS INTEGER))
        |    END, ',') AS q
        |FROM t ORDER BY vec_id""".stripMargin,
    "embed_project_literal" -> {
      val projExprs = litComps.map { w =>
        O.rk("list_dot_product(list_transform(" +
          s"list_zip(CAST(embedding AS DOUBLE[]), CAST(${vecLit(litMean)} AS DOUBLE[])), " +
          s"p -> p[1] - p[2]), CAST(${vecLit(w)} AS DOUBLE[]))", 6)
      }.mkString("[\n    ", ",\n    ", "]")
      s"""WITH t AS (SELECT vec_id, $projExprs AS proj FROM embeddings)
        |SELECT vec_id,
        |  CAST(generate_subscripts(proj, 1) - 1 AS INTEGER) AS comp,
        |  unnest(proj) AS value
        |FROM t ORDER BY vec_id, comp""".stripMargin
    },
    // mirrors Similarity.embeddingDrift: components floor-grid-round
    // to 6 dp in IEEE space BEFORE the decimal cast (a direct
    // float→decimal cast disagrees between engines at representation
    // boundaries — measured a 6 dp ulp flip at sf0.001), float means,
    // per-dim products grid-rounded to 6 dp before the exact decimal
    // dot/norm folds — no cross-dim float sum anywhere
    "ml_embedding_drift" ->
      s"""WITH dd AS (SELECT label,
        |    CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'ref' ELSE 'cand' END AS h,
        |    i - 1 AS dim,
        |    CAST(${O.rk("CAST(embedding[i] AS DOUBLE)", 6)} AS DECIMAL(18,6)) AS v
        |  FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)),
        |s AS (SELECT label, h, dim, CAST(sum(v) AS DOUBLE) AS sv,
        |    count(*) AS n FROM dd GROUP BY 1, 2, 3),
        |m AS (SELECT label, h, dim, sv / CAST(n AS DOUBLE) AS mean, n FROM s),
        |p AS (SELECT label, dim,
        |    max(CASE WHEN h = 'ref' THEN mean END) AS a,
        |    max(CASE WHEN h = 'cand' THEN mean END) AS b,
        |    max(CASE WHEN h = 'ref' THEN n END) AS na,
        |    max(CASE WHEN h = 'cand' THEN n END) AS nb
        |  FROM m GROUP BY 1, 2),
        |g AS (SELECT label, max(na) AS n_ref, max(nb) AS n_cand,
        |    CAST(sum(CAST(${O.rk("a*b", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS ab,
        |    CAST(sum(CAST(${O.rk("a*a", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS aa,
        |    CAST(sum(CAST(${O.rk("b*b", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS bb
        |  FROM p GROUP BY 1)
        |SELECT label, n_ref, n_cand,
        |  CASE WHEN aa > 0 AND bb > 0 THEN
        |    ${O.rk("ab / (sqrt(aa) * sqrt(bb))", 6)} END AS centroid_cos,
        |  ${O.rk("sqrt(aa)", 6)} AS norm_ref,
        |  ${O.rk("sqrt(bb)", 6)} AS norm_cand
        |FROM g ORDER BY label""".stripMargin,
    "embed_centroid_by_label" ->
      s"""SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |  ${O.r4("avg(CAST(embedding[i] AS DOUBLE))")} AS centroid
        |FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
        |GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,
    "dedup_embed_clusters" ->
      s"""WITH RECURSIVE p AS (SELECT id1, id2 FROM (
        |    SELECT a.vec_id AS id1, b.vec_id AS id2,
        |      ${O.r4(duckCosine("a.embedding", "b.embedding"))} AS sim
        |    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |  WHERE sim >= 0.4),
        |edges AS (SELECT id1 AS a, id2 AS b FROM p
        |          UNION ALL SELECT id2, id1 FROM p),
        |reach AS (SELECT a, b FROM edges
        |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT a AS vec_id, least(a, min(b)) AS cluster
        |FROM reach GROUP BY a ORDER BY vec_id""".stripMargin
  )
}
