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
  * at call time (Checkpoints.pin) — building the frame runs those
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
  def apply(df: DataFrame): DataFrame =
    spread(df)(_.repartition(_))

  /** Keyed variant: spread by HASH repartitioning on `keys` instead of
    * round-robin. Two structural wins over apply() for explode-heavy
    * text pipelines (guide §2.4 share-one-exchange):
    *  1. a hash exchange skips the local sort every keyless
    *     repartition pays (`spark.sql.execution.sortBeforeRepartition`,
    *     the task-retry determinism guard — hash placement is already
    *     deterministic, so no sort is needed);
    *  2. a downstream aggregate/window whose grouping is a SUPERSET of
    *     `keys` (e.g. groupBy(id, token) after byKey(id)) is already
    *     clustered and plans NO second exchange.
    * Same narrow-plan + already-parallel gates as apply(): no-op at
    * cluster scale and on anything that owns an exchange. */
  def byKey(df: DataFrame, keys: Column*): DataFrame =
    spread(df)(_.repartition(_, keys: _*))

  private def spread(df: DataFrame)(
      repart: (DataFrame, Int) => DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val narrow = df.queryExecution.optimizedPlan.collect {
      case p if !(p.isInstanceOf[LeafNode] || p.isInstanceOf[Project] ||
        p.isInstanceOf[Filter] || p.isInstanceOf[Generate] ||
        p.isInstanceOf[SubqueryAlias]) => p
    }.isEmpty
    if (!narrow) return df
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (df.rdd.getNumPartitions >= target) df else repart(df, target)
  }
}
/** Lifecycle and POSTURE for the eager checkpoints some constructors pin.
  *
  * RETENTION CONTRACT: `Dedup.minhashPairs`, `minhashPairsAgainstIndex`,
  * `jaccardPairsFromHashes` (via `nearJaccardPairs` / `ngramJaccardPairs`),
  * `jaccardPairsAgainstIndex`, and `Similarity.cosineTopKPairsBlocked`
  * (the `sim_knn_bruteforce` key) materialize their hashed-doc /
  * signature / cell-layout tables with eager checkpoints at CALL
  * time (to run the expensive hashing once across plan branches). Those
  * blocks stay
  * pinned in executor storage until the returned frame is garbage
  * collected (ContextCleaner) — fine for batch jobs, but a long-lived
  * session constructing many pipelines should release them
  * deterministically with `Checkpoints.free(result)` once the result is
  * fully materialized (written / collected / checkpointed itself).
  * Freeing earlier BREAKS the frame: a checkpoint truncates
  * lineage, so its blocks cannot be recomputed.
  *
  * POSTURE (`spark.graft.checkpoint.reliable`, default `false`):
  * - `false` — `localCheckpoint()`: blocks live in executor storage
  *   with NO lineage behind them. Fastest on a single node, but a lost
  *   executor or a memory-pressure eviction makes the block
  *   unrecoverable ("Checkpoint block rdd_N_M not found") and kills
  *   every job that still references it. The right default for
  *   `local[*]`, where executor loss cannot happen.
  * - `true` — the CLUSTER posture: reliable `checkpoint()` to the
  *   directory in `spark.graft.checkpoint.dir` (set it to durable
  *   shared storage — HDFS/object store — on a real cluster; defaults
  *   to a process-local temp dir so local runs work out of the box).
  *   Lineage is truncated the same way (the loop-carried plans stay
  *   O(1) per round), but the data lives in FILES: an executor loss or
  *   block eviction recomputes nothing and loses nothing — tasks
  *   re-read the checkpoint. The cost is one write+read round trip per
  *   pinned frame, which for the loop-carried label/edge tables is
  *   marginal next to the joins they feed. */
object Checkpoints {
  private[graft] def reliable(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.checkpoint.reliable", "false").toBoolean

  private def ensureDir(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val dir = spark.conf.getOption("spark.graft.checkpoint.dir").getOrElse(
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      sc.setCheckpointDir(dir)
    }
  }

  /** Materialize `df` exactly once (eagerly) under the session's
    * checkpoint posture — `localCheckpoint()` by default, a reliable
    * file-backed `checkpoint()` when `spark.graft.checkpoint.reliable`
    * is true. All loop-carried and multi-branch frames in the dedup /
    * CC / ANN constructors pin through here, so ONE conf flips the
    * whole library to the fault-tolerant cluster posture. */
  def pin(df: DataFrame): DataFrame =
    if (reliable(df.sparkSession)) { ensureDir(df.sparkSession); df.checkpoint() }
    else df.localCheckpoint()

  /** Unpersist every checkpoint block in `df`'s lineage (and delete the
    * checkpoint files, for reliably-checkpointed frames). Call only
    * after `df` (and anything else derived from the same constructor
    * call) has been fully materialized and is no longer needed. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
        // reliable-posture frames also hold files in the checkpoint
        // dir; best-effort delete so a long session cannot fill disk
        lr.rdd.getCheckpointFile.foreach { f =>
          try {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(p, true)
          } catch { case _: Throwable => () }
        }
      case _ => ()
    }
}
