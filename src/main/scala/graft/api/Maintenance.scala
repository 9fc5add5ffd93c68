package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-maintenance operators: the write-side half of a lakehouse
  * pipeline (upsert/merge; compaction and shard packing live in
  * graft.sources.Writers / TextAnalysis.packShards).
  */
object Maintenance {
  /** Opt-in key-uniqueness gate for the MERGE contract
    * (`spark.graft.merge.checkKeys`, default false): one count-vs-
    * distinct aggregate per side, thrown eagerly so a duplicate-keyed
    * merge fails before any downstream write sees fanned-out rows. */
  private def assertUniqueKeys(snapshot: DataFrame, updates: DataFrame,
      keyCol: String): Unit = {
    val check = snapshot.sparkSession.conf
      .get("spark.graft.merge.checkKeys", "false").toBoolean
    if (check) Seq("snapshot" -> snapshot, "updates" -> updates)
      .foreach { case (side, df) =>
        // count(lit(1)) — NOT count(keyCol) — so NULL-keyed rows are
        // caught too: count(col)/countDistinct both skip NULLs, which
        // would let N NULL-keyed rows sail through the gate and then
        // land as N separate never-matching join rows
        val r = df.agg(count(lit(1)).as("n"),
          countDistinct(col(keyCol)).as("d"),
          count(when(col(keyCol).isNull, 1)).as("nn")).collect()(0)
        require(r.getLong(2) == 0,
          s"$side has ${r.getLong(2)} NULL $keyCol key(s) — a NULL key " +
            "never matches in a key merge; MERGE requires non-null keys")
        require(r.getLong(0) == r.getLong(1),
          s"$side has duplicate $keyCol keys (${r.getLong(0)} rows, " +
            s"${r.getLong(1)} distinct) — MERGE requires unique keys per side")
      }
  }

  /** SCD-type-1 upsert (MERGE INTO semantics): rows of `updates`
    * overwrite same-key rows of `snapshot`, unmatched update rows are
    * inserts, unmatched snapshot rows are kept. Emits the merged table
    * plus an `action` column (`keep` / `update` / `insert`) so a
    * pipeline can audit what a merge did before committing it.
    *
    * Both sides must share the schema (same columns, `keyCol`
    * included). Keys must be unique per side — this is a row merge,
    * not a join-explode; with duplicate keys a MERGE is ill-defined
    * (Delta/Iceberg reject it at runtime for the same reason). The
    * precondition is UNCHECKED by default (checking costs an extra
    * aggregate over both sides); set `spark.graft.merge.checkKeys=true`
    * to assert it eagerly — a violated contract then fails loudly like
    * the schema check, instead of silently fanning rows out through
    * the full-outer join.
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
    assertUniqueKeys(snapshot, updates, keyCol)
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
    * full-outer key-shuffle shape as [[upsertMerge]].
    *
    * NULL versions are ordered EXPLICITLY: a NULL version loses to any
    * non-NULL version (on either side), and a both-NULL collision
    * falls to the tie rule — the update wins, matching
    * [[upsertMerge]]. Without the explicit arms a NULL would make the
    * `>=` comparison NULL and the snapshot would silently win — a
    * divergence from upsertMerge's update-always-wins tie semantics
    * that surfaced only on NULL-versioned data. */
  def upsertMergeLatest(snapshot: DataFrame, updates: DataFrame,
      keyCol: String, versionCol: String): DataFrame = {
    val cols = snapshot.columns.toSeq
    require(cols.contains(keyCol), s"key column $keyCol missing from snapshot")
    require(cols.contains(versionCol), s"version column $versionCol missing")
    require(updates.columns.toSeq.sorted == cols.sorted,
      s"updates schema ${updates.columns.toSeq.sorted} must match " +
        s"snapshot schema ${cols.sorted}")
    assertUniqueKeys(snapshot, updates, keyCol)
    val s = snapshot.select(cols.map(c => col(c).as(s"_s_$c")): _*)
    val u = updates.select(cols.map(c => col(c).as(s"_u_$c")): _*)
    val sv = col(s"_s_$versionCol")
    val uv = col(s"_u_$versionCol")
    val takeUpd = col(s"_s_$keyCol").isNull ||
      (col(s"_u_$keyCol").isNotNull &&
        when(uv.isNull && sv.isNull, lit(true))   // both NULL: tie → update
          .when(uv.isNull, lit(false))            // NULL loses to non-NULL
          .when(sv.isNull, lit(true))
          .otherwise(uv >= sv))
    val out = cols.map(c =>
      when(takeUpd, col(s"_u_$c")).otherwise(col(s"_s_$c")).as(c))
    s.join(u, col(s"_s_$keyCol") === col(s"_u_$keyCol"), "full_outer")
      .select(out: _*)
  }

  /** SCD-Type-2 history build from a change log: per key, collapse
    * consecutive rows with the SAME state (null-safe compare) and emit
    * one row per distinct state RUN with its validity interval —
    * `valid_from` = the run's first timestamp, `valid_to` = the next
    * run's start (NULL for the current run). The dimension-history
    * table every warehouse keeps; dual of [[upsertMergeLatest]], which
    * keeps only the latest state.
    *
    * `ordCol` breaks timestamp ties (two changes in the same
    * microsecond each get a deterministic interval), which is what
    * keeps the output a pure function of the input rows.
    *
    * Scale shape: ONE key shuffle; both window passes (lag for
    * change detection, lead for interval close) share the
    * (key, ts, ord) sort — the filter between them preserves
    * partitioning and ordering, so the second window re-sorts
    * nothing. */
  def scd2History(log: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, ordCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(ordCol).asc)
    log
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      // the explicit first-row arm: lag()'s NULL default is otherwise
      // indistinguishable from a real NULL first state, and the
      // null-safe compare would DROP that run (NULL <=> NULL) — a
      // key's history must always start at its first log row
      .filter(col("_rn") === 1 || !(col("_prev") <=> col(stateCol)))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(stateCol).as("state"),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("long").as("is_current"))
  }

  /** Snapshot diff: classify every key across two versions of a table
    * as `added` (only in new), `removed` (only in old), or `changed`
    * (present in both, any non-key column differs under null-safe
    * equality) — unchanged keys are omitted, like a diff. The audit
    * half of table maintenance: what a merge/rewrite actually did,
    * the input to incremental downstream refresh, and the first tool
    * reached for when two "identical" snapshots disagree.
    *
    * Same schema contract as [[upsertMerge]]; unique keys per side
    * (same opt-in `spark.graft.merge.checkKeys` gate).
    *
    * Scale shape: ONE full-outer equi-shuffle on the key, column
    * comparison rowwise post-join — never a row-hash pre-pass (which
    * would scan both sides twice) and never a content groupBy. On
    * bucketed snapshots the shuffle disappears exactly as for
    * upsertMerge. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCol: String): DataFrame = {
    val cols = oldDf.columns.toSeq
    require(cols.contains(keyCol), s"key column $keyCol missing from old side")
    require(newDf.columns.toSeq.sorted == cols.sorted,
      s"new-side schema ${newDf.columns.toSeq.sorted} must match " +
        s"old-side schema ${cols.sorted}")
    assertUniqueKeys(oldDf, newDf, keyCol)
    val o = oldDf.select(cols.map(c => col(c).as(s"_o_$c")): _*)
    val n = newDf.select(cols.map(c => col(c).as(s"_n_$c")): _*)
    val rowEq = cols.filter(_ != keyCol)
      .map(c => col(s"_o_$c") <=> col(s"_n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val change = when(col(s"_o_$keyCol").isNull, lit("added"))
      .when(col(s"_n_$keyCol").isNull, lit("removed"))
      .when(!rowEq, lit("changed"))
    o.join(n, col(s"_o_$keyCol") === col(s"_n_$keyCol"), "full_outer")
      .withColumn("change", change)
      .filter(col("change").isNotNull)
      .select(coalesce(col(s"_n_$keyCol"), col(s"_o_$keyCol")).as(keyCol),
        col("change"))
  }

  // ---- manifest-pinned snapshot reads (r19) ----------------------------
  //
  // The Iceberg/Delta READ model without the table-format library: a
  // snapshot version is a MANIFEST (a tiny table of data-file paths),
  // and a versioned read opens exactly the manifest's files. Commits
  // never rewrite data: an append adds files + a new manifest; a
  // delete drops files from the next manifest (the old version still
  // lists them, so time travel keeps working); data files are
  // immutable. This is the snapshot-isolation property a 100 TB
  // lakehouse table actually relies on — readers pinned to manifest N
  // are unaffected by any concurrent commit, because nothing a commit
  // does can change the bytes behind N's file list.

  /** Write `df` as an immutable data-file group under
    * `tableDir/data/<group>` and return the file paths (sorted — the
    * manifest content must not depend on listing order). Fails if the
    * group already exists: data files are immutable and commits never
    * rewrite data, so a second write to the same group name would
    * clobber files still listed by earlier manifests — immutability is
    * ENFORCED here, not assumed. Recreating a whole table from scratch
    * (the fixture pattern) must [[dropTable]] first. */
  def writeDataGroup(df: DataFrame, tableDir: String, group: String): Seq[String] = {
    val dir = s"$tableDir/data/$group"
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      df.sparkSession.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(dir)),
      s"data group already exists: $dir — data files are immutable; " +
        "use a new group name, or dropTable to rebuild from scratch")
    df.write.mode("errorifexists").parquet(dir)
    // list the committed part files straight off the filesystem — the
    // former spark.read.parquet(dir).inputFiles round trip paid a
    // relation build (schema-inference footer read + file index) per
    // group just to enumerate paths (r21). Path.toUri.toString is the
    // exact string form Dataset.inputFiles emits ("file:///…" — probed,
    // WritePathSpec compares the two sets), with the same
    // committer-marker exclusions as Spark's own file index.
    val committed = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile)
      .map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
      .map(_.toUri.toString)
    committed.toSeq.sorted
  }

  /** Remove an entire snapshot table (data + manifests) — the ONLY
    * sanctioned way to reuse a table dir, because [[writeDataGroup]]
    * refuses to overwrite a live group. No-op if absent. */
  def dropTable(spark: org.apache.spark.sql.SparkSession, tableDir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tableDir),
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tableDir), true); ()
  }

  /** Compaction as a MANIFEST REWRITE — the snapshot-native small-file
    * fix: rewrite `files` (the fragmented subset of some snapshot)
    * into a NEW immutable data group sized at ceil(bytes/targetBytes)
    * output files and return the new paths; the caller commits the
    * next manifest as (untouched survivors ++ returned). The input
    * files are NEVER modified or deleted — every prior snapshot keeps
    * resolving them (time travel), which is exactly what makes
    * compaction safe to run concurrently with pinned readers at
    * 100 TB: it is a pure metadata swap from the reader's side, and a
    * crashed compaction leaves nothing but an unreferenced group. */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, tableDir: String,
      files: Seq[String], group: String, targetBytes: Long): Seq[String] = {
    require(files.nonEmpty, "compactFiles: empty file list")
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val bytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    writeDataGroup(spark.read.parquet(files: _*).repartition(n), tableDir, group)
  }

  /** Commit manifest `version`: the complete file list of that
    * snapshot, as a tiny one-column parquet table under
    * `tableDir/manifests/v<version>`. */
  def writeManifest(spark: org.apache.spark.sql.SparkSession, tableDir: String,
      version: Int, files: Seq[String]): Unit = {
    import spark.implicits._
    // coalesce, not repartition: the file list is a driver-local Seq —
    // a repartition(1) added a full (if tiny) shuffle per commit (r21)
    files.toDF("path").coalesce(1)
      .write.mode("overwrite").parquet(s"$tableDir/manifests/v$version")
  }

  /** Read snapshot `version`: collect its manifest (bounded by the
    * snapshot's FILE count — the thing that is small by construction;
    * at 100 TB a manifest is MBs where the data is TBs) and scan
    * exactly those files. Files dropped by LATER commits still resolve
    * here — that is the time-travel contract. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession, tableDir: String,
      version: Int): DataFrame = {
    val files = spark.read.parquet(s"$tableDir/manifests/v$version")
      .select("path").collect().map(_.getString(0)).sorted
    require(files.nonEmpty, s"manifest v$version at $tableDir lists no files")
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Snapshot EXPIRY + garbage collection — the retention half of the
    * lifecycle ([[compactFiles]] is the other): keep only the `keep`
    * manifest versions, delete every other manifest, then delete every
    * data file that NO surviving manifest references. Order matters —
    * manifests first, so a crash between the two phases leaves
    * unreferenced-but-present files (wasted bytes, zero correctness
    * risk), never a live manifest pointing at deleted bytes. The
    * referenced-set is the union of the surviving manifests' file
    * lists (bounded by file counts — MBs at 100 TB), compared on
    * scheme-normalized paths so `file:///` vs `file:/` spellings can
    * never cause a false GC. Returns
    * (manifests deleted, data files deleted). */
  def expireSnapshots(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, keep: Seq[Int]): (Int, Int) = {
    require(keep.nonEmpty, "expireSnapshots: must keep at least one version")
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tableDir),
      spark.sparkContext.hadoopConfiguration)
    def norm(p: String): String = new org.apache.hadoop.fs.Path(p).toUri.getPath
    val manifestRoot = new org.apache.hadoop.fs.Path(s"$tableDir/manifests")
    val versions = fs.listStatus(manifestRoot).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v"))
      .map(_.drop(1).toInt)
    val missing = keep.filterNot(versions.contains)
    require(missing.isEmpty, s"expireSnapshots: versions $missing do not exist")
    val referenced = keep.flatMap { v =>
      spark.read.parquet(s"$tableDir/manifests/v$v")
        .select("path").collect().map(r => norm(r.getString(0)))
    }.toSet
    val dropped = versions.filterNot(keep.contains)
    dropped.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/manifests/v$v"), true)
    }
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$tableDir/data"), true)
    var removed = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      // committer markers (_SUCCESS, .crc) are not data: readers
      // ignore them and manifests never list them — leave them be
      val marker = name.startsWith("_") || name.startsWith(".")
      if (f.isFile && !marker && !referenced.contains(norm(f.getPath.toString))) {
        fs.delete(f.getPath, false)
        removed += 1
      }
    }
    (dropped.size, removed)
  }
}
