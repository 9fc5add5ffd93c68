package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-maintenance operators: the write-side half of a lakehouse
  * pipeline (upsert/merge; compaction and shard packing live in
  * graft.sources.Writers / TextAnalysis.packShards).
  */
object Maintenance {
  /** SCD-type-1 upsert (MERGE INTO semantics): rows of `updates`
    * overwrite same-key rows of `snapshot`, unmatched update rows are
    * inserts, unmatched snapshot rows are kept. Emits the merged table
    * plus an `action` column (`keep` / `update` / `insert`) so a
    * pipeline can audit what a merge did before committing it.
    *
    * Both sides must share the schema (same columns, `keyCol`
    * included). Keys must be unique per side — this is a row merge,
    * not a join-explode; with duplicate keys a MERGE is ill-defined
    * (Delta/Iceberg reject it at runtime for the same reason).
    *
    * Scale shape: ONE full-outer equi-shuffle on the key — the
    * merge-on-read shape. At 100 TB both sides arrive hash-partitioned
    * by the key if the snapshot is maintained bucketed (see
    * Writers.writeBucketed / scan_bucketed_join for the exchange-free
    * layout); the update side is usually a small fraction and AQE
    * keeps its side of the exchange cheap. The output preserves the
    * key partitioning, so writing it back bucketed costs no extra
    * exchange and the NEXT merge is exchange-free on the snapshot
    * side — the steady-state nightly-merge loop. */
  def upsertMerge(snapshot: DataFrame, updates: DataFrame,
      keyCol: String): DataFrame = {
    val cols = snapshot.columns.toSeq
    require(cols.contains(keyCol), s"key column $keyCol missing from snapshot")
    require(updates.columns.toSeq.sorted == cols.sorted,
      s"updates schema ${updates.columns.toSeq.sorted} must match " +
        s"snapshot schema ${cols.sorted}")
    val s = snapshot.select(cols.map(c => col(c).as(s"_s_$c")): _*)
    val u = updates.select(cols.map(c => col(c).as(s"_u_$c")): _*)
    val merged = s.join(u, col(s"_s_$keyCol") === col(s"_u_$keyCol"), "full_outer")
    // whole-ROW take, not per-column coalesce: an update row's NULL
    // cell is a real write (clears the field), exactly like
    // [[upsertMergeLatest]] — coalesce would silently resurrect the
    // snapshot value and the two merge APIs would disagree on
    // identical input
    val takeUpd = col(s"_u_$keyCol").isNotNull
    val out = cols.map(c =>
      when(takeUpd, col(s"_u_$c")).otherwise(col(s"_s_$c")).as(c))
    val action = when(col(s"_s_$keyCol").isNull, lit("insert"))
      .when(col(s"_u_$keyCol").isNull, lit("keep"))
      .otherwise(lit("update")).as("action")
    merged.select(out :+ action: _*)
  }

  /** Version-aware upsert: like [[upsertMerge]], but on a key collision
    * the row with the GREATER `versionCol` wins (ties → the update) —
    * the out-of-order-tolerant CDC apply. Folding batches through this
    * converges to the per-key max-version row in ANY arrival order,
    * which is what lets a streaming foreachBatch sink apply change
    * batches as they land without a global ordering barrier
    * (StreamingParitySpec proves the convergence with shuffled
    * batches). Same schema/uniqueness contract and the same one
    * full-outer key-shuffle shape as [[upsertMerge]]. */
  def upsertMergeLatest(snapshot: DataFrame, updates: DataFrame,
      keyCol: String, versionCol: String): DataFrame = {
    val cols = snapshot.columns.toSeq
    require(cols.contains(keyCol), s"key column $keyCol missing from snapshot")
    require(cols.contains(versionCol), s"version column $versionCol missing")
    require(updates.columns.toSeq.sorted == cols.sorted,
      s"updates schema ${updates.columns.toSeq.sorted} must match " +
        s"snapshot schema ${cols.sorted}")
    val s = snapshot.select(cols.map(c => col(c).as(s"_s_$c")): _*)
    val u = updates.select(cols.map(c => col(c).as(s"_u_$c")): _*)
    val takeUpd = col(s"_s_$keyCol").isNull ||
      (col(s"_u_$keyCol").isNotNull &&
        col(s"_u_$versionCol") >= col(s"_s_$versionCol"))
    val out = cols.map(c =>
      when(takeUpd, col(s"_u_$c")).otherwise(col(s"_s_$c")).as(c))
    s.join(u, col(s"_s_$keyCol") === col(s"_u_$keyCol"), "full_outer")
      .select(out: _*)
  }
}
