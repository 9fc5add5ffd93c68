package graft.operators

import graft.{Canon, Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: media as opaque `binary` + typed metadata.
  *
  * The pipeline shape a 100 TB training-data engine needs: scan media
  * bytes, carry structured metadata alongside, decode/feature-extract
  * per partition (one decoder instance per executor — the same lazy
  * singleton pattern the reference family used for per-executor Caffe
  * nets), frame-sample without materializing whole blobs.
  *
  * The fixture ships no real media, so `media` is synthesized
  * deterministically from documents.text (ASCII → byte-exact). Real
  * image/audio codecs are NOT in this container: the decode kernel
  * below is a clearly-marked STUB with a deterministic fake; the
  * Spark-side plumbing (binary schema, per-partition decoder reuse,
  * batch shape, metadata struct) is real and oracle/unit-tested.
  */
object MultimodalOps {
  /** documents.text → opaque media bytes + typed metadata struct. */
  private def mediaFrame(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        col("n_chars").cast("long").as("n_bytes"),
        col("lang").as("format"),
        col("source").as("origin")).as("meta"))

  /** STUB decoder — stands in for an image/audio codec (not available
    * in this container). Deterministic fake: 8 block-sum features over
    * the byte stream. A real deployment swaps `decodeFake` for the
    * codec call; everything around it (partition iteration, one
    * decoder per partition, batch shape) is the real plumbing. */
  final class FakeDecoder {
    def decode(bytes: Array[Byte]): Array[Double] = {
      val f = new Array[Double](8)
      if (bytes == null || bytes.isEmpty) return f
      var i = 0
      while (i < bytes.length) {
        f(i % 8) += (bytes(i) & 0xff).toDouble
        i += 1
      }
      var k = 0
      while (k < 8) { f(k) /= bytes.length.toDouble; k += 1 }
      f
    }
  }

  val queries: Map[String, Q] = Map(
    "multimodal_binary_meta" -> ((s, d) => {
      // binary column + metadata: hash and size must survive the
      // encode→binary path byte-exactly.
      mediaFrame(s, d).select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("h"),
        col("meta.format").as("format"),
        col("meta.origin").as("origin"))
        .orderBy("doc_id")
    }),
    "multimodal_frame_sample" -> ((s, d) => {
      // Treat media as 16-byte frames; sample every 4th frame. Uses
      // substring on the binary column — no whole-blob decode. The
      // text is ASCII so byte frames == char frames, which keeps this
      // oracle-checkable against DuckDB string ops.
      mediaFrame(s, d).select(
        col("doc_id"),
        ceil(col("meta.n_bytes") / lit(16.0)).cast("long").as("n_frames"),
        ceil(ceil(col("meta.n_bytes") / lit(16.0)) / lit(4.0)).cast("long").as("n_sampled"),
        md5(expr("substring(media, 1, 16)")).as("frame0_h"),
        md5(expr("substring(media, 65, 16)")).as("frame4_h"))
        .orderBy("doc_id")
    }),
    "multimodal_decode_stub" -> ((s, d) => {
      // ✘ no oracle (the decoder is engine-side code): mapPartitions
      // with ONE decoder instance per partition — the reference
      // family's per-executor model reuse — emitting fixed-width
      // feature rows; unit-tested against a driver-side recompute.
      val mf = mediaFrame(s, d).select("doc_id", "media")
      val schema = StructType(
        StructField("doc_id", LongType) +:
          (0 until 8).map(i => StructField(s"f$i", DoubleType)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
      val decoded = mf.mapPartitions { it =>
        val decoder = new FakeDecoder // one per partition, reused per row
        it.map { r =>
          val f = decoder.decode(r.getAs[Array[Byte]]("media"))
          Row.fromSeq(r.getLong(0) +: f.map(v =>
            BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toIndexedSeq)
        }
      }(enc)
      decoded.orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "multimodal_binary_meta" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS h,
        |  lang AS format,
        |  source AS origin
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frame_sample" ->
      """SELECT doc_id,
        |  CAST(ceil(strlen(text) / 16.0) AS BIGINT) AS n_frames,
        |  CAST(ceil(ceil(strlen(text) / 16.0) / 4.0) AS BIGINT) AS n_sampled,
        |  md5(substring(text, 1, 16)) AS frame0_h,
        |  md5(substring(text, 65, 16)) AS frame4_h
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
