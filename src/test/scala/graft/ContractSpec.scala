package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants (SURVEY §0/§2). */
class ContractSpec extends AnyFunSuite {
  private val noOracle = Set(
    "agg_approx_distinct", "dedup_minhash_lsh", "stream_watermark_late",
    "ml_train_logreg_gd", "multimodal_decode_stub", "sim_knn_ivf")

  test("entry returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("all contract keys are declared (69 from SURVEY §2 + 7 extensions)") {
    assert(SparkEntry.queries.size == 76)
  }

  test("every oracle key has a query; only declared no-oracle keys are unchecked") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o -- q}")
    assert((q -- o) == noOracle, s"unexpected no-oracle keys: ${(q -- o) -- noOracle}")
  }

  test("every query runs on sf0.001 and returns a deterministic row count") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n1 = fn(TestSpark.spark, TestSpark.sf0001).count()
      assert(n1 >= 0, s"$name failed")
    }
  }
}
