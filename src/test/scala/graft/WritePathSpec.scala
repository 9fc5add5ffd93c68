package graft

import graft.sources.Writers
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Write-path layouts: partition pruning and exchange-free bucketed
  * joins must be observable in the executed plan, not just claimed. */
class WritePathSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("partitionBy write prunes non-matching directories on read") {
    val out = Files.createTempDirectory("graft-part").toString
    val docs = Tables.documents(spark, TestSpark.sf0001)
    Writers.writePartitioned(docs, "lang", out)
    val rd = spark.read.parquet(out).filter(col("lang") === "en")
    // post-pruning evidence: the executed scan must have touched ONLY
    // the lang=en directory's file, not all 5 (inputFiles would lie —
    // it lists the pre-pruning file index). Execute THIS plan instance
    // so its metrics are populated.
    val qe = rd.queryExecution
    assert(qe.executedPlan.executeCollect().length ==
      docs.filter(col("lang") === "en").count())
    val scans = qe.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in plan")
    val filesRead = scans.head.metrics("numFiles").value
    val totalFiles = spark.read.parquet(out).inputFiles.length
    assert(filesRead < totalFiles && filesRead >= 1,
      s"partition pruning did not engage: read $filesRead of $totalFiles files")
  }

  test("range-clustered layout prunes row groups by footer min/max; round-robin does not") {
    // scan_clustered_minmax's measured claim: after writeRangeClustered
    // on l_shipdate, a one-month predicate decodes only the row groups
    // whose footer [min,max] overlap it — the scan EMITS a small
    // fraction of the table — while the identical scan over the same
    // rows laid out round-robin (every file spans the full date range,
    // so every footer interval overlaps) emits everything.
    val clustered = Files.createTempDirectory("graft-clust").toString
    val roundRobin = Files.createTempDirectory("graft-rr").toString
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select("l_orderkey", "l_quantity", "l_shipdate")
    val total = li.count()
    Writers.writeRangeClustered(li, "l_shipdate", 8, clustered)
    li.repartition(8).write.mode("overwrite").parquet(roundRobin)
    def scanOutputRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("l_shipdate") >= "1995-06-01" &&
          col("l_shipdate") < "1995-07-01")
      val qe = df.queryExecution
      qe.executedPlan.executeCollect()
      val scans = qe.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }
      assert(scans.nonEmpty, "no file scan in plan")
      scans.head
    }
    val matching = li.filter(col("l_shipdate") >= "1995-06-01" &&
      col("l_shipdate") < "1995-07-01").count()
    val clusteredRows = scanOutputRows(clustered)
    val rrRows = scanOutputRows(roundRobin)
    // round-robin: every row group overlaps the month → nothing prunes
    assert(rrRows == total,
      s"round-robin layout unexpectedly pruned: scan emitted $rrRows of $total")
    // clustered: only the ~1/8 of rows in overlapping row groups decode
    assert(clusteredRows >= matching && clusteredRows <= total / 4,
      s"min/max skipping did not engage: scan emitted $clusteredRows of $total " +
        s"(matching=$matching)")
    info(s"scan emitted $clusteredRows/$total rows clustered vs $rrRows round-robin " +
      s"($matching actually match)")
  }

  test("z-order layout prunes BOTH columns' predicates; single-column clustering prunes only its own") {
    // data_zorder_cluster's measured claim: after writeZOrdered on
    // (l_partkey, l_suppkey), EACH single-column range predicate
    // decodes only the row groups whose footer rectangle overlaps it,
    // while a partkey-only range layout answers suppkey predicates by
    // scanning everything (every file spans the full suppkey range).
    val zdir = Files.createTempDirectory("graft-z").toString
    val pdir = Files.createTempDirectory("graft-p").toString
    // sf0.01 (not the usual sf0.001): pruning geometry needs real key
    // cardinality — 2000 partkeys × 100 suppkeys over 16 files
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val total = li.count()
    Writers.writeZOrdered(li, "l_partkey", "l_suppkey", 16, zdir)
    Writers.writeRangeClustered(li, "l_partkey", 16, pdir)
    def scanRows(path: String, pred: org.apache.spark.sql.Column): Long = {
      val qe = spark.read.parquet(path).filter(pred).queryExecution
      qe.executedPlan.executeCollect()
      qe.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.head
    }
    // sf0.01: partkey 0..1999, suppkey 0..99 — both probes ~2-3%
    val partPred = col("l_partkey") <= 40
    val suppPred = col("l_suppkey") <= 2
    val zPart = scanRows(zdir, partPred)
    val zSupp = scanRows(zdir, suppPred)
    val pPart = scanRows(pdir, partPred)
    val pSupp = scanRows(pdir, suppPred)
    // the single-column layout is the stronger prune on ITS column...
    assert(pPart <= total / 4, s"partkey layout did not prune partkey: $pPart/$total")
    // ...but cannot prune the other at all
    assert(pSupp == total,
      s"partkey-range layout unexpectedly pruned a suppkey predicate: $pSupp/$total")
    // the z-curve prunes both: strictly better than full scan on each
    assert(zPart <= total / 2, s"z-order did not prune partkey: $zPart/$total")
    assert(zSupp <= total / 2, s"z-order did not prune suppkey: $zSupp/$total")
    info(s"scan emitted (partkey, suppkey) = ($zPart, $zSupp)/$total z-ordered " +
      s"vs ($pPart, $pSupp)/$total partkey-clustered")
  }

  test("compact shrinks a fragmented table to ceil(bytes/target) files, losing nothing") {
    val frag = Files.createTempDirectory("graft-frag").toString
    val comp = Files.createTempDirectory("graft-comp").toString
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    val fragFiles = spark.read.parquet(frag).inputFiles.length
    assert(fragFiles >= 64, s"fixture should be fragmented, got $fragFiles files")
    val target = 1L * 1024 * 1024
    val n = Writers.compact(spark, frag, comp, targetBytes = target)
    // the arithmetic: n == ceil(on-disk bytes / target), recomputed here
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(frag), spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(frag)).getLength
    assert(n == math.max(1L, (bytes + target - 1) / target).toInt)
    val compFiles = spark.read.parquet(comp).inputFiles.length
    assert(compFiles == n && compFiles < fragFiles,
      s"expected $n compacted files < $fragFiles fragments, got $compFiles")
    // every row moved exactly once
    assert(spark.read.parquet(comp).count() == ev.count())
    assert(spark.read.parquet(comp).agg(sum(col("event_id"))).head().getLong(0) ==
      ev.agg(sum(col("event_id"))).head().getLong(0))
  }

  test("IVF cell id as write-time partition key: a probe reads only its cells") {
    // the §2.13 ANN scale claim made concrete: embeddings written
    // partitioned by their (trained-codebook) cell id, then an
    // nprobe=4 query's scan must touch only 4 of the 16 cell
    // directories — the layout IS the index
    val out = Files.createTempDirectory("graft-ivf").toString
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val cents = graft.api.Similarity.trainCodebook(e, "vec_id", "embedding", k = 16)
    val cellOf = udf((v: Seq[Float]) =>
      graft.functions.Kernels.nearestCells(v, cents, 1).head)
    Writers.writePartitioned(e.withColumn("cell", cellOf(col("embedding"))), "cell", out)
    // one query vector probes its 4 nearest cells
    val qvec = e.filter(col("vec_id") === 3).select("embedding")
      .head().getAs[scala.collection.Seq[Float]](0).toIndexedSeq
    val probes = graft.functions.Kernels.nearestCells(qvec, cents, 4)
    val rd = spark.read.parquet(out).filter(col("cell").isin(probes.map(Int.box): _*))
    val qe = rd.queryExecution
    assert(qe.executedPlan.executeCollect().nonEmpty)
    val scans = qe.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val filesRead = scans.head.metrics("numFiles").value
    val totalFiles = spark.read.parquet(out).inputFiles.length
    assert(filesRead < totalFiles / 2,
      s"cell-partition pruning did not engage: read $filesRead of $totalFiles files")
  }

  test("manifest-pinned snapshots: time travel survives later commits, v2 never opens dropped files") {
    // the data_snapshot_read contract executed directly: after ALL
    // commits (v0 base, v1 append, v2 file-level delete of group b),
    // (1) reading v0 yields exactly the pre-commit base content —
    // later commits are invisible to a pinned reader; (2) the v2 scan
    // opens NO group-b file (the delete dropped them from the
    // manifest, so the reader never touches them — data files
    // themselves were not rewritten, which (3) verifies v0 can still
    // resolve them afterwards: time travel).
    val base = Files.createTempDirectory("graft-snap").toString
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val m = col("o_orderkey") % 4
    val fA = graft.api.Maintenance.writeDataGroup(orders.filter(m.isin(0, 1)), base, "a")
    val fB = graft.api.Maintenance.writeDataGroup(orders.filter(m === 2), base, "b")
    graft.api.Maintenance.writeManifest(spark, base, 0, fA ++ fB)
    val v0Before = graft.api.Maintenance.readSnapshot(spark, base, 0)
      .collect().map(_.toString).sorted.toSeq
    val fD = graft.api.Maintenance.writeDataGroup(orders.filter(m === 3), base, "delta")
    graft.api.Maintenance.writeManifest(spark, base, 1, fA ++ fB ++ fD)
    graft.api.Maintenance.writeManifest(spark, base, 2, fA ++ fD)
    val v0After = graft.api.Maintenance.readSnapshot(spark, base, 0)
      .collect().map(_.toString).sorted.toSeq
    assert(v0After.nonEmpty && v0After == v0Before,
      "a later commit changed what the pinned v0 reader sees — snapshot isolation broken")
    val v2 = graft.api.Maintenance.readSnapshot(spark, base, 2)
    assert(v2.inputFiles.toSet.intersect(fB.toSet).isEmpty,
      "the v2 read resolves files its manifest dropped")
    assert(v2.count() == orders.filter(m.isin(0, 1, 3)).count(),
      "v2 content is not base-minus-b-plus-delta")
  }

  test("snapshot compaction is a pure metadata swap: frag bytes untouched, v1 opens fewer files, healthy group shared") {
    // the data_snapshot_compact contract executed directly: after the
    // compaction commit, (1) v0 reads identical content to before it
    // (pinned readers unaffected), (2) v0's fragmented files are
    // byte-for-byte untouched (same length + mtime), (3) v1 never
    // opens a frag file, (4) v1 opens strictly fewer files than v0,
    // and (5) the healthy group's files appear in BOTH manifests —
    // compaction rewrote only the fragmented subset.
    val base = Files.createTempDirectory("graft-snapcomp").toString
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val m = col("o_orderkey") % 4
    val fFrag = graft.api.Maintenance.writeDataGroup(
      orders.filter(m.isin(0, 1)).repartition(24), base, "frag")
    val fB = graft.api.Maintenance.writeDataGroup(orders.filter(m.isin(2, 3)), base, "b")
    graft.api.Maintenance.writeManifest(spark, base, 0, fFrag ++ fB)
    val v0Before = graft.api.Maintenance.readSnapshot(spark, base, 0)
      .collect().map(_.toString).sorted.toSeq
    def stat(f: String): (Long, Long) = {
      val file = new java.io.File(new java.net.URI(f))
      (file.length(), file.lastModified())
    }
    val fragStats = fFrag.map(f => f -> stat(f)).toMap
    val fComp = graft.api.Maintenance.compactFiles(spark, base, fFrag, "compact",
      targetBytes = 4L * 1024 * 1024)
    graft.api.Maintenance.writeManifest(spark, base, 1, fComp ++ fB)
    val v0After = graft.api.Maintenance.readSnapshot(spark, base, 0)
      .collect().map(_.toString).sorted.toSeq
    assert(v0After.nonEmpty && v0After == v0Before,
      "the compaction commit changed what the pinned v0 reader sees")
    fFrag.foreach { f =>
      assert(stat(f) == fragStats(f), s"compaction modified a v0 data file: $f")
    }
    val v1 = graft.api.Maintenance.readSnapshot(spark, base, 1)
    val v1Files = v1.inputFiles.toSet
    assert(v1Files.intersect(fFrag.toSet).isEmpty,
      "v1 still opens fragmented files its manifest replaced")
    assert(fB.toSet.subsetOf(v1Files),
      "v1 lost the healthy group — compaction must rewrite ONLY the fragmented subset")
    val v0Files = graft.api.Maintenance.readSnapshot(spark, base, 0).inputFiles.toSet
    assert(v1Files.size < v0Files.size,
      s"compaction did not shrink the file count: v0=${v0Files.size} v1=${v1Files.size}")
    assert(v1.count() == orders.count(), "v1 content is not the full table")
  }

  test("snapshot expiry GCs exactly the unreferenced files; the survivor reads identically") {
    // the data_snapshot_expire contract executed directly: after
    // expiring v0 of the compaction-staged table, (1) every frag file
    // is GONE from disk and (2) every compact+b file is intact,
    // (3) the v0 manifest no longer resolves, (4) v1 reads byte-equal
    // to before the expiry, (5) the returned counts are exact.
    val base = Files.createTempDirectory("graft-snapexp").toString
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val m = col("o_orderkey") % 4
    val fFrag = graft.api.Maintenance.writeDataGroup(
      orders.filter(m.isin(0, 1)).repartition(24), base, "frag")
    val fB = graft.api.Maintenance.writeDataGroup(orders.filter(m.isin(2, 3)), base, "b")
    graft.api.Maintenance.writeManifest(spark, base, 0, fFrag ++ fB)
    val fComp = graft.api.Maintenance.compactFiles(spark, base, fFrag, "compact",
      targetBytes = 4L * 1024 * 1024)
    graft.api.Maintenance.writeManifest(spark, base, 1, fComp ++ fB)
    val v1Before = graft.api.Maintenance.readSnapshot(spark, base, 1)
      .collect().map(_.toString).sorted.toSeq
    val (nManifests, nFiles) = graft.api.Maintenance.expireSnapshots(spark, base, Seq(1))
    assert(nManifests == 1 && nFiles == fFrag.size,
      s"expected (1, ${fFrag.size}) expired, got ($nManifests, $nFiles)")
    def onDisk(f: String): Boolean = new java.io.File(new java.net.URI(f)).exists()
    assert(fFrag.forall(!onDisk(_)), "GC left unreferenced frag files on disk")
    assert((fComp ++ fB).forall(onDisk), "GC deleted a file a surviving manifest references")
    intercept[Exception] {
      graft.api.Maintenance.readSnapshot(spark, base, 0).collect()
    }
    val v1After = graft.api.Maintenance.readSnapshot(spark, base, 1)
      .collect().map(_.toString).sorted.toSeq
    assert(v1After.nonEmpty && v1After == v1Before,
      "expiry changed what the surviving snapshot reads")
  }

  test("writeDataGroup refuses to overwrite a live group — immutability is enforced") {
    // earlier manifests list the group's files by path; a second write
    // under the same group name would clobber bytes a pinned reader
    // still resolves. The guard makes that a loud error, and dropTable
    // is the sanctioned reset.
    val base = Files.createTempDirectory("graft-immut").toString
    val orders = Tables.orders(spark, TestSpark.sf0001).limit(10)
    val f1 = graft.api.Maintenance.writeDataGroup(orders, base, "g")
    assert(f1.nonEmpty)
    val err = intercept[IllegalArgumentException] {
      graft.api.Maintenance.writeDataGroup(orders, base, "g")
    }
    assert(err.getMessage.contains("immutable"), err.getMessage)
    graft.api.Maintenance.dropTable(spark, base)
    assert(graft.api.Maintenance.writeDataGroup(orders, base, "g").nonEmpty,
      "dropTable did not unlock the group name")
  }

  test("saveIvfIndex rebuild at the same path clears stale tombstones") {
    // the compaction workflow: delete an id, then REBUILD the index at
    // the same path from a corpus that legitimately contains it. The
    // rebuild must not inherit the old tombstone table, or the probe
    // silently suppresses rows the new index owns.
    val base = Files.createTempDirectory("graft-ivfreb").toString
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val cents = graft.api.Similarity.trainCodebook(e, "vec_id", "embedding", k = 8)
    graft.api.Similarity.saveIvfIndex(e, "vec_id", "embedding", cents, base)
    val s = spark
    import s.implicits._
    graft.api.Similarity.ivfDelete(Seq(3L).toDF("vec_id"), "vec_id", base)
    def hits(): Set[Long] = graft.api.Similarity.ivfKnnFromIndex(
        e.filter(col("vec_id") === 7), "vec_id", "embedding", base,
        k = 1000, nprobe = 8, simRound = Some(4))
      .select("cid").collect().map(_.getLong(0)).toSet
    assert(!hits().contains(3L), "tombstone did not suppress the deleted id")
    graft.api.Similarity.saveIvfIndex(e, "vec_id", "embedding", cents, base)
    assert(hits().contains(3L),
      "rebuild inherited the stale tombstone — id 3 is silently lost")
  }

  test("ivfUpsert into a cell EMPTY at build time: the new directory is created and probed") {
    // the silent-drop hazard of incremental indexes: if the original
    // build never populated cell c (no corpus vector routed there),
    // the upsert's append must CREATE c's directory and the probe must
    // resolve it — a reader pinned to the data/ listing taken at build
    // time would lose every vector upserted into fresh cells. Two
    // far-apart 8-d clusters: the index is built from cluster-0
    // vectors only (both centroids trained in, so cell 1 exists in the
    // codebook but owns NO files), then cluster-1 vectors are
    // upserted; a cluster-1 query must get its true neighbors back.
    val s = spark
    import s.implicits._
    def vec(base: Int, j: Int): Seq[Float] =
      (0 until 8).map(i => (if (i == base) 10f else 0f) + 0.01f * ((j + i) % 3))
    val c0 = (0L until 20L).map(id => (id, vec(0, id.toInt)))
    val c1 = (100L until 120L).map(id => (id, vec(7, id.toInt)))
    val all = (c0 ++ c1).toDF("vec_id", "embedding")
    val cents = graft.api.Similarity.trainCodebook(all, "vec_id", "embedding", k = 2)
    val base = Files.createTempDirectory("graft-ivfup-empty").toString
    graft.api.Similarity.saveIvfIndex(c0.toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, base)
    val dirsBefore = new java.io.File(s"$base/cells").listFiles()
      .count(_.getName.startsWith("_cell="))
    graft.api.Similarity.ivfUpsert(c1.toDF("vec_id", "embedding"),
      "vec_id", "embedding", base)
    val dirsAfter = new java.io.File(s"$base/cells").listFiles()
      .count(_.getName.startsWith("_cell="))
    assert(dirsAfter > dirsBefore,
      s"upsert did not create the empty cell's directory ($dirsBefore -> $dirsAfter)")
    val got = graft.api.Similarity.ivfKnnFromIndex(
        all.filter(col("vec_id") === 100L), "vec_id", "embedding",
        base, k = 5, nprobe = 1, simRound = Some(4))
      .collect().map(_.getLong(1)).toSet
    assert(got.nonEmpty && got.subsetOf((101L until 120L).toSet),
      s"probe of the upserted-only cell returned $got — expected cluster-1 neighbors")
  }

  test("merged IVF index (build+upsert+delete) probes exchange-free and still prunes cell dirs") {
    // the r19 maintenance claim executed: after ivfUpsert appends new
    // files into the per-cell directories and ivfDelete lands
    // tombstones, the probe must look EXACTLY like a fresh index's —
    // (1) the only shuffle in the whole probe is the per-query rank
    // window (the tombstone application is a BROADCAST anti-join, so
    // no exchange ever touches the corpus-sized cells scan), and
    // (2) cell-directory pruning still engages (the appended files
    // joined the same partition layout, so unprobed cells — original
    // AND upserted files alike — are never opened).
    val base = Files.createTempDirectory("graft-ivfmerge").toString
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val half = e.filter(col("vec_id") % 2 === 0)
    val cents = graft.api.Similarity.trainCodebook(half, "vec_id", "embedding", k = 16)
    graft.api.Similarity.saveIvfIndex(half, "vec_id", "embedding", cents, base)
    graft.api.Similarity.ivfUpsert(e.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", base)
    graft.api.Similarity.ivfDelete(e.filter(col("vec_id") % 97 === 13), "vec_id", base)
    // ONE query for the pruning measurement: 10 queries' nprobe=4
    // routes union to ~14 of 16 cells (measured — each query prunes,
    // but the OR of their probes covers the index), which would mask
    // per-query pruning; a single query reads exactly its 4 cells
    val res = graft.api.Similarity.ivfKnnFromIndex(e.filter(col("vec_id") === 3),
      "vec_id", "embedding", base, k = 5, nprobe = 4, simRound = Some(4))
    val qe = res.queryExecution
    assert(qe.executedPlan.executeCollect().nonEmpty, "merged probe returned no rows")
    val plan = qe.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      "tombstones were not applied — no anti-join in the merged probe plan")
    assert(!plan.contains("SortMergeJoin LeftAnti")
        && !plan.contains("ShuffledHashJoin LeftAnti"),
      s"tombstone anti-join shuffles the cells scan:\n$plan")
    // count PHYSICAL shuffle nodes, not string occurrences — AQE's
    // plan text reprints subtrees (initial + final) and would double-
    // count, and AQE/query-stage wrappers hide children from a plain
    // collect; the only real shuffle allowed is the per-query rank
    // window's qid partitioning
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val expanded = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: expanded.flatMap(allNodes)
    }
    val nodes = allNodes(qe.executedPlan)
    // dedup by INSTANCE identity: a ReusedExchangeExec expands to the
    // original exchange object, which the walker may also reach at its
    // first site — structural equality would be wrong the other way
    // (two genuinely distinct shuffles can be structurally equal)
    val shuffles = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.foldLeft(Seq.empty[org.apache.spark.sql.execution.SparkPlan]) {
      (acc, e) => if (acc.exists(_ eq e)) acc else acc :+ e
    }
    assert(shuffles.nonEmpty,
      "plan traversal found no shuffle at all — the rank window must shuffle once, so the walker is broken")
    assert(shuffles.length <= 1,
      s"merged probe has ${shuffles.length} shuffle exchanges (only the rank window is allowed):\n$plan")
    val cellScan = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("cells")) => f
    }
    assert(cellScan.nonEmpty, "no FileSourceScan over the cells layout found")
    val filesRead = cellScan.head.metrics("numFiles").value
    val totalFiles = spark.read.parquet(s"$base/cells").inputFiles.length
    assert(filesRead < totalFiles / 2,
      s"cell pruning lost on the merged index: read $filesRead of $totalFiles files")
  }

  test("csv and json-lines round-trip flat frames losslessly") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "lang", "source", "n_chars")
    val base = Files.createTempDirectory("graft-fmt")
    graft.sources.Writers.writeCsv(docs, s"$base/csv")
    graft.sources.Writers.writeJsonLines(docs, s"$base/json")
    val fromCsv = graft.sources.Readers.csv(spark, s"$base/csv", docs.schema)
    val fromJson = graft.sources.Readers.jsonLines(spark, s"$base/json", docs.schema)
    val want = docs.collect().map(_.toString).sorted.toSeq
    assert(fromCsv.collect().map(_.toString).sorted.toSeq == want)
    assert(fromJson.collect().map(_.toString).sorted.toSeq == want)
  }

  test("bucketed tables join on the bucket key with no shuffle exchange") {
    val base = Files.createTempDirectory("graft-buck")
    val docs = Tables.documents(spark, TestSpark.sf0001)
    Writers.writeBucketed(docs.select("doc_id", "lang"), "doc_id", 4,
      "t_buck_a", s"$base/a")
    Writers.writeBucketed(docs.select("doc_id", "source"), "doc_id", 4,
      "t_buck_b", s"$base/b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("t_buck_a").join(spark.table("t_buck_b"), "doc_id")
      assert(j.count() == docs.count())
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS t_buck_a")
      spark.sql("DROP TABLE IF EXISTS t_buck_b")
    }
  }

  test("upsertMerge over bucketed snapshot + updates runs exchange-free") {
    // Maintenance.upsertMerge's steady-state claim executed: when both
    // the snapshot and the update batch are laid out bucketed by the
    // merge key, the full-outer merge joins on the bucket layout with
    // NO hash exchange — the nightly 100 TB merge loop pays the
    // shuffle zero times, not once per night. The merged result is
    // also byte-equal to the unbucketed merge (layout must never
    // change answers).
    val base = Files.createTempDirectory("graft-merge-buck")
    val snap = Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val upd = snap.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"), col("o_totalprice"))
    Writers.writeBucketed(snap, "o_orderkey", 4, "t_merge_snap", s"$base/s")
    Writers.writeBucketed(upd, "o_orderkey", 4, "t_merge_upd", s"$base/u")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = graft.api.Maintenance.upsertMerge(
        spark.table("t_merge_snap"), spark.table("t_merge_upd"), "o_orderkey")
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed merge still shuffles:\n$plan")
      val got = merged.collect().map(_.toString).sorted.toSeq
      val want = graft.api.Maintenance.upsertMerge(snap, upd, "o_orderkey")
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, "bucketed merge diverged from the plain merge")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS t_merge_snap")
      spark.sql("DROP TABLE IF EXISTS t_merge_upd")
    }
  }

  test("snapshotDiff over two bucketed versions runs exchange-free") {
    // the audit twin of the bucketed-merge proof: diffing two versions
    // laid out bucketed by the key joins on the bucket layout with NO
    // hash exchange, and the diff is identical to the flat-layout diff
    val base = Files.createTempDirectory("graft-diff-buck")
    val old = Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val neu = old.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, lit("C"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_totalprice"))
    Writers.writeBucketed(old, "o_orderkey", 4, "t_diff_old", s"$base/o")
    Writers.writeBucketed(neu, "o_orderkey", 4, "t_diff_new", s"$base/n")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val diff = graft.api.Maintenance.snapshotDiff(
        spark.table("t_diff_old"), spark.table("t_diff_new"), "o_orderkey")
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed diff still shuffles:\n$plan")
      val got = diff.collect().map(_.toString).sorted.toSeq
      val want = graft.api.Maintenance.snapshotDiff(old, neu, "o_orderkey")
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, "bucketed diff diverged from the plain diff")
      assert(got.nonEmpty, "diff fixture produced no changes")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS t_diff_old")
      spark.sql("DROP TABLE IF EXISTS t_diff_new")
    }
  }

  test("a persisted bucketed minhash index probes with no exchange on the index side") {
    // the production incremental-dedup layout: the corpus signature
    // tables are written ONCE (banded bucketed by its join key
    // (_band,_bh), docs by _id) and every arriving batch probes them —
    // the scaladoc's "no exchange on the index side" promise, executed
    val base = Files.createTempDirectory("graft-mhidx")
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val isNew = col("doc_id") % 5 === 0
    val (idxDocs, idxBanded) =
      graft.api.Dedup.minhashIndexTables(docs.filter(!isNew), "doc_id", "text")
    Writers.writeBucketed(idxBanded, Seq("_band", "_bh"), 4, "t_mh_banded", s"$base/banded")
    Writers.writeBucketed(idxDocs, "_id", 4, "t_mh_docs", s"$base/docs")
    // both tables written — release the pin so the suite's executor
    // storage stays bounded (retention contract, r22)
    graft.api.Checkpoints.free(idxDocs)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val want = graft.api.Dedup.minhashPairsAgainstIndex(
          docs.filter(isNew), docs.filter(!isNew), "doc_id", "text", 0.8)
        .collect().map(_.toString).sorted.toSeq
      val probe = graft.api.Dedup.minhashProbePreparedIndex(
        docs.filter(isNew), spark.table("t_mh_docs"), spark.table("t_mh_banded"),
        "doc_id", "text", 0.8, broadcastJoins = false)
      val got = probe.collect().map(_.toString).sorted.toSeq
      assert(got == want, "prepared-index probe changed the pair set")
      assert(got.nonEmpty, "fixture should produce cross pairs")
      // the index tables themselves must never be re-shuffled: flag any
      // exchange whose ENTIRE subtree is index-table scans (exchanges
      // over the candidate stream derived from a join are the probe
      // side's cost and are expected)
      val offenders = probe.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
            if e.collectLeaves().forall(_.toString.contains("t_mh_")) => e
      }
      assert(offenders.isEmpty,
        s"the bucketed index side still shuffles:\n${offenders.headOption.getOrElse("")}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS t_mh_banded")
      spark.sql("DROP TABLE IF EXISTS t_mh_docs")
    }
  }

  test("codebook round-trips bitwise and the loaded copy drives identical IVF results") {
    val base = Files.createTempDirectory("graft-codebook")
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val cents = graft.api.Similarity.trainCodebook(e, "vec_id", "embedding", k = 16)
    graft.sources.Artifacts.saveCodebook(spark, cents, s"$base/cb")
    val loaded = graft.sources.Artifacts.loadCodebook(spark, s"$base/cb")
    assert(loaded.length == cents.length)
    cents.zip(loaded).zipWithIndex.foreach { case ((a, b), c) =>
      assert(a.sameElements(b), s"cell $c drifted through the round-trip") }
    // and the consumer sees no difference: same kNN rows from either copy
    def knn(cb: Array[Array[Float]]) = graft.api.Similarity.ivfKnn(
        e, "vec_id", "embedding", queryPred = col("vec_id") < 10,
        k = 5, centroids = cb, nprobe = 4, simRound = Some(4))
      .orderBy("qid", "rank").collect().map(_.toString).toSeq
    assert(knn(loaded) == knn(cents))
  }

  test("trained GD weights round-trip bitwise and score identically") {
    val base = Files.createTempDirectory("graft-weights")
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .withColumn("y", (col("label") % 2 === 0).cast("int"))
    val w = graft.api.MlPipeline.trainLogisticGD(e, "embedding", "y",
      steps = 3, lr = 0.5, dims = 64)
    graft.sources.Artifacts.saveWeights(spark, w, s"$base/w")
    val loaded = graft.sources.Artifacts.loadWeights(spark, s"$base/w")
    assert(w.zip(loaded).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b) },
      "weights drifted through the round-trip")
    def score(wv: Array[Double]) = graft.api.MlPipeline.linearScore(e, "embedding", wv)
      .select("vec_id", "score").orderBy("vec_id").collect().map(_.toString).toSeq
    assert(score(loaded) == score(w))
  }

  test("dedup_embed_incremental pair set is unchanged probing the persisted cell index") {
    // the embedding twin of the minhash round-trip: corpus cell
    // assignment written ONCE partitioned by the cell id, arriving
    // batches probe the loaded table — same exact pairs as the
    // one-shot declared key
    val base = Files.createTempDirectory("graft-cellidx")
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val isNew = substring(md5(col("vec_id").cast("string").cast("binary")), 1, 1) >= "d"
    val corpus = e.filter(!isNew)
    val cents = graft.api.Similarity.trainCodebook(corpus, "vec_id", "embedding", k = 16)
    val declared = SparkEntry.queries("dedup_embed_incremental")(spark, TestSpark.sf0001)
      .collect().map(_.toString).sorted.toSeq
    graft.sources.Writers.writePartitioned(
      graft.api.Similarity.cellIndex(corpus, "vec_id", "embedding", cents),
      "_cell", s"$base/cells")
    val loaded = spark.read.parquet(s"$base/cells")
    val fromDisk = graft.api.Similarity.cosineProbePreparedCellIndex(
        e.filter(isNew), loaded, "vec_id", "embedding",
        minSim = 0.4, centroids = cents, simRound = Some(4))
      .orderBy("id1", "id2")
      .collect().map(_.toString).sorted.toSeq
    assert(fromDisk == declared, "on-disk cell index changed the declared key's pair set")
    assert(fromDisk.nonEmpty, "fixture should produce cross pairs")
  }

  test("dedup_incremental_minhash pair set is unchanged probing the persisted on-disk index") {
    // the declared key recomputes the corpus signature index per run;
    // the production path writes it once (bucketed by its join keys)
    // and probes the loaded tables — same pairs, so the NoOracleSpec
    // recall guarantee transfers to the on-disk path unchanged
    val base = Files.createTempDirectory("graft-mhkey")
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val isNew = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) >= "d"
    val declared = SparkEntry.queries("dedup_incremental_minhash")(spark, TestSpark.sf0001)
      .collect().map(_.toString).sorted.toSeq
    val (idxDocs, idxBanded) = graft.api.Dedup.minhashIndexTables(
      docs.filter(!isNew), "doc_id", "text")
    Writers.writeBucketed(idxBanded, Seq("_band", "_bh"), 4, "t_mhk_banded", s"$base/banded")
    Writers.writeBucketed(idxDocs, "_id", 4, "t_mhk_docs", s"$base/docs")
    // both tables written — release the pin (retention contract, r22)
    graft.api.Checkpoints.free(idxDocs)
    try {
      val fromDisk = graft.api.Dedup.minhashProbePreparedIndex(
          docs.filter(isNew), spark.table("t_mhk_docs"), spark.table("t_mhk_banded"),
          "doc_id", "text", 0.8)
        .select(col("index_id"), col("probe_id"), graft.Canon.r4(col("jaccard")).as("jac"))
        .collect().map(_.toString).sorted.toSeq
      assert(fromDisk == declared, "on-disk index changed the declared key's pair set")
      assert(fromDisk.nonEmpty, "fixture should produce cross pairs")
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_mhk_banded")
      spark.sql("DROP TABLE IF EXISTS t_mhk_docs")
    }
  }
}
