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
