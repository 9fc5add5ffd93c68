package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary (r12 judge #6): pins the PHYSICAL parquet
  * schema (footer MessageType — the level where the r11 events-ts
  * ns→µs-NTZ drift actually happened; Spark's read schema can mask it
  * behind loaders) of every fixture table at every scale factor
  * against a committed manifest. A driver-side fixture regeneration
  * with a changed layout becomes ONE red test with a readable diff,
  * instead of 38 silently-ERRORing bench queries.
  *
  * Deliberate updates: rerun with GRAFT_REGEN_MANIFEST=1 to rewrite
  * src/test/resources/fixture_manifest.txt, review the diff, commit.
  */
class FixtureDriftSpec extends AnyFunSuite {
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
  private val manifestPath =
    java.nio.file.Paths.get("src/test/resources/fixture_manifest.txt")

  /** One-line physical schema of a parquet file: the footer MessageType
    * with whitespace collapsed (MessageType.toString is pretty-printed). */
  private[graft] def physicalSchema(path: String): String = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.toString.replaceAll("\\s+", " ").trim
    finally r.close()
  }

  private def currentEntries(): Seq[(String, String)] =
    for (d <- sfDirs; t <- tables) yield {
      val sf = d.split('/').last
      s"$sf/$t" -> physicalSchema(s"$d/$t.parquet")
    }

  test("every fixture table's physical schema matches the pinned manifest") {
    val current = currentEntries()
    if (sys.env.get("GRAFT_REGEN_MANIFEST").contains("1")) {
      val body = current.map { case (k, v) => s"$k\t$v" }.mkString("", "\n", "\n")
      java.nio.file.Files.createDirectories(manifestPath.getParent)
      java.nio.file.Files.writeString(manifestPath, body)
      info(s"manifest regenerated with ${current.size} entries — review and commit")
    }
    assert(java.nio.file.Files.exists(manifestPath),
      s"missing $manifestPath — run once with GRAFT_REGEN_MANIFEST=1 and commit it")
    val pinned = java.nio.file.Files.readString(manifestPath).linesIterator
      .filter(_.nonEmpty).map { l =>
        val Array(k, v) = l.split('\t'); (k, v)
      }.toMap
    val diffs = current.flatMap { case (k, v) =>
      pinned.get(k) match {
        case None => Some(s"$k: NEW TABLE (not in manifest): $v")
        case Some(p) if p != v => Some(s"$k: DRIFTED\n  pinned:  $p\n  actual:  $v")
        case _ => None
      }
    } ++ (pinned.keySet -- current.map(_._1).toSet).toSeq.sorted
      .map(k => s"$k: MISSING (in manifest, not on disk)")
    assert(diffs.isEmpty,
      s"fixture layout drift detected (${diffs.size} table(s)):\n" +
        diffs.mkString("\n") +
        "\nIf the driver deliberately regenerated fixtures, rerun with " +
        "GRAFT_REGEN_MANIFEST=1, review, and commit the new manifest.")
  }

  test("the canary actually fires on a simulated drift") {
    // write the events table with ts re-encoded to int64 millis — the
    // shape of a future fixture regeneration — and assert the compare
    // sees a different physical schema than the pinned events entry
    val s = TestSpark.spark
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("drift_sim").toString
    Tables.events(s, TestSpark.sf0001)
      .withColumn("ts", unix_millis(col("ts")))
      .coalesce(1).write.mode("overwrite").parquet(out)
    val f = new java.io.File(out).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val drifted = physicalSchema(f.toString)
    val pinned = java.nio.file.Files.readString(manifestPath).linesIterator
      .find(_.startsWith("sf0.001/events\t")).get.split('\t')(1)
    assert(drifted != pinned,
      "simulated ts re-encoding produced an identical physical schema — canary blind")
  }
}
