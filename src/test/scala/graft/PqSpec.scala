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
}
