package graft

import graft.functions.Kernels
import graft.api.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization kernels + the sim_knn_ivfpq key's claims
  * (SURVEY §2.13 r12): ADC ≡ reconstructed dot bitwise, training
  * determinism, reconstruction sanity, and the codes-only candidate
  * side. Recall vs brute force lives in NoOracleSpec with the other
  * ANN keys. */
class PqSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  private val M = 8
  private val KS = 16

  private def emb = Tables.embeddings(spark, sf)

  private def vectors(n: Int): Array[Array[Float]] =
    emb.orderBy("vec_id").limit(n).select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)

  test("trainPqCodebooks is deterministic and shaped [m][ks][dims/m]") {
    val a = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = M, ks = KS)
    val b = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = M, ks = KS)
    assert(a.length == M && a.forall(_.length == KS) &&
      a.forall(_.forall(_.length == 64 / M)))
    assert(a.zip(b).forall { case (x, y) =>
      x.zip(y).forall { case (u, v) => u.sameElements(v) }
    }, "two trainings over the same input diverged")
  }

  test("ADC lookup-table sum is BITWISE the per-subspace dot of the reconstruction") {
    val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = M, ks = KS)
    val dsub = 64 / M
    val vs = vectors(50)
    val q = vs.head
    val lut = Kernels.pqLut(q.toSeq, books)
    vs.foreach { v =>
      val codes = Kernels.pqEncode(v.toSeq, books)
      assert(codes.forall(c => c >= 0 && c < KS))
      val adc = Kernels.adcDot(codes.toSeq, lut.toSeq, KS)
      // reference: per-subspace dots of the reconstruction, added in
      // the same j order — the identity the scaladoc pins
      val recon = Kernels.pqReconstruct(codes.toSeq, books)
      var ref = 0.0
      var j = 0
      while (j < M) {
        var dp = 0.0; var i = 0
        while (i < dsub) {
          dp += q(j * dsub + i).toDouble * recon(j * dsub + i); i += 1
        }
        ref += dp; j += 1
      }
      assert(java.lang.Double.doubleToLongBits(adc) ==
        java.lang.Double.doubleToLongBits(ref),
        s"ADC $adc != per-subspace reconstructed dot $ref")
      // and within float-accumulation distance of the flat full-vector
      // dot (different add grouping, so tolerance not bitwise)
      val flat = Kernels.dotArr(q, recon)
      assert(math.abs(adc - flat) <= 1e-9 * (1.0 + math.abs(flat)),
        s"ADC $adc vs flat reconstructed dot $flat")
    }
  }

  test("trained reconstruction beats the 1-centroid (mean-only) codebook") {
    val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = M, ks = KS)
    val mean = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = M, ks = 1)
    val vs = vectors(200)
    def mse(bs: Array[Array[Array[Float]]]): Double = {
      var s = 0.0
      vs.foreach { v =>
        val r = Kernels.pqReconstruct(Kernels.pqEncode(v.toSeq, bs).toSeq, bs)
        var i = 0
        while (i < v.length) { val d = v(i).toDouble - r(i); s += d * d; i += 1 }
      }
      s / vs.length
    }
    val trained = mse(books)
    val meanOnly = mse(mean)
    assert(trained < meanOnly * 0.8,
      s"ks=$KS reconstruction MSE $trained not clearly below mean-only $meanOnly")
  }

  test("pqEncode rejects a vector whose length does not match the codebooks") {
    val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = M, ks = KS)
    intercept[IllegalArgumentException] {
      Kernels.pqEncode(Seq.fill(63)(0.1f), books)
    }
  }

  test("sim_knn_ivfpq output shape matches the knn family and is reproducible") {
    val a = SparkEntry.queries("sim_knn_ivfpq")(spark, sf).collect()
    val b = SparkEntry.queries("sim_knn_ivfpq")(spark, sf).collect()
    assert(a.nonEmpty && a.length % 5 == 0, s"expected k=5 rows per query, got ${a.length}")
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "two runs of sim_knn_ivfpq diverged")
    assert(a.head.schema.fieldNames.sameElements(Array("qid", "cid", "sim", "rn")))
  }

  test("residual PQ beats raw-vector PQ on a clustered corpus (r18 regression pin)") {
    // The reason pqKnn quantizes x − c(cell): raw-vector codes collapse
    // to the cell id when cluster members share a dominant centroid,
    // so the ADC shortlist degenerates inside exactly the corpora IVF
    // routes best. Synthetic: 16 true clusters × 400 members (noise
    // 0.04, the tight regime) with coarse cells == true clusters —
    // residual codes must recover most of the exact top-5 while raw
    // codes must not be anywhere close (the measured r18 gap on the
    // 100k twin was 1.00 vs 0.10 via the declared key's params).
    val s = spark
    import s.implicits._
    val (cells, per, dims) = (16, 400, 64)
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val cents = Array.tabulate(cells) { k =>
      val r = new java.util.Random(700000L + k)
      normalize(Array.fill(dims)(r.nextGaussian().toFloat))
    }
    val vecs = (0L until (cells * per).toLong).map { id =>
      val r = new java.util.Random(id * 2654435761L + 31)
      val base = cents((id / per).toInt)
      (id, normalize(Array.tabulate(dims)(i =>
        (base(i) + 0.04 * r.nextGaussian()).toFloat)).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    // exact truth: brute-force cosine top-5 per query, driver-side
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = (0L until 10L).flatMap { q =>
      val qv = vecs(q.toInt)._2
      vecs.filter(_._1 != q)
        .map { case (id, v) => (id, cosine(qv, v)) }
        .sortBy { case (id, sim) => (-sim, id) }.take(5)
        .map { case (id, _) => (q, id) }
    }.toSet
    val coarse = Similarity.trainCodebook(df, "vec_id", "embedding", k = cells)
    def recallOf(residual: Boolean, rerank: Int): Double = {
      val books = Similarity.trainPqCodebooks(df, "vec_id", "embedding",
        m = M, ks = KS,
        residualTo = if (residual) Some(coarse) else None)
      // NOTE: pqKnn always residual-encodes; the raw arm measures what
      // mismatched (raw-trained) books do to it — the pre-r18 quality
      // ceiling is the relevant comparison either way, since with
      // cells == clusters the raw sub-codebooks spend their 16 codes
      // spanning cluster OFFSETS, leaving ~0 within-cluster resolution.
      val got = Similarity.pqKnn(df, "vec_id", "embedding",
          queryPred = org.apache.spark.sql.functions.col("vec_id") < 10,
          k = 5, centroids = coarse, nprobe = 2, books = books,
          rerank = rerank, simRound = Some(4))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.count(got.contains).toDouble / truth.size
    }
    // tight shortlist: the code-resolution regime — residual signal
    // must strictly beat raw among ~400 near-equidistant members
    val resRecall = recallOf(residual = true, rerank = 50)
    val rawRecall = recallOf(residual = false, rerank = 50)
    // wide shortlist: the budget lever — with rerank covering half the
    // probed set, the exact re-rank must recover most of the truth
    val resWide = recallOf(residual = true, rerank = 400)
    info(f"clustered 6.4k recall@5: residual $resRecall%.3f raw-books " +
      f"$rawRecall%.3f residual@rerank400 $resWide%.3f")
    assert(resRecall >= rawRecall + 0.05,
      f"residual books must strictly beat raw books at a tight shortlist: " +
        f"$resRecall%.3f vs $rawRecall%.3f (r18 measured 0.26 vs 0.12)")
    assert(resWide >= 0.7,
      f"rerank budget lever broken: residual recall@rerank400 $resWide%.3f " +
        "(r18: PQ cannot rank ~1e-3 cosine separations; the exact re-rank must)")
  }
}
