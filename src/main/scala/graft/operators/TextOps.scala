package graft.operators

import graft.{Canon, Q, Tables}
import graft.Canon.{sql => O}
import graft.functions.Kernels
import org.apache.spark.sql.functions._

/** §2.9 (text half) — LLM-data-pipeline text analysis + deduplication.
  *
  * Scale design: `dedup_exact` is a hash groupBy (shuffle ∝ distinct
  * hashes). `dedup_near_jaccard` is the exact O(n²)-within-language
  * baseline — correct at fixture scale, quadratic at 100 TB; its
  * scalable twin `dedup_minhash_lsh` (hand-rolled banded MinHash)
  * turns the self-join into a bucket-join on hash bands and is the
  * path to run at cluster scale, with exact Jaccard applied only
  * within candidate buckets.
  */
object TextOps {
  val queries: Map[String, Q] = Map(
    "text_tokenize_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tok"), col("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          Canon.r4(sum(col("n_tok")) / count(lit(1))).as("avg_tokens"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    }),
    "text_term_freq" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    }),
    "text_lang_source_matrix" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "source")
    }),
    "dedup_exact" -> ((s, d) => {
      // Exact dedup keyed on md5(text): shuffle carries one hash per
      // doc, not the text itself. May return 0 groups (valid result).
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
        .filter(col("n") > 1)
        .orderBy("h")
    }),
    "dedup_near_jaccard" -> ((s, d) => {
      // Hash+sort the token set ONCE per doc; the O(n²-within-lang)
      // pair loop then runs an allocation-free primitive merge per
      // pair (identical Jaccard values — hashing is injective w.h.p.).
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          Kernels.tokenHashesUdf(split(col("text"), " ")).as("th"))
      // lang has only 5 values: a shuffle join would cap parallelism at
      // 5. Broadcast one side and round-robin repartition the other so
      // every core generates pairs. (At 100 TB: block-partitioned
      // self-join or the LSH twin below.)
      val p = s.conf.get("spark.sql.shuffle.partitions").toInt
      val a = t.repartition(p).select(col("doc_id").as("id1"), col("lang"), col("th").as("t1"))
      val b = t.select(col("doc_id").as("id2"), col("lang").as("lang2"), col("th").as("t2"))
      a.join(broadcast(b), col("lang") === col("lang2") && col("id1") < col("id2"))
        .withColumn("jac", Kernels.jaccardLongsUdf(col("t1"), col("t2")))
        .filter(col("jac") >= 0.8)
        .select(col("id1"), col("id2"), Canon.r4(col("jac")).as("jac"))
        .orderBy("id1", "id2")
    }),
    "dedup_minhash_lsh" -> ((s, d) => {
      // Scalable near-dup dedup (✘ no oracle — probabilistic recall;
      // unit-tested ≥0.9 against the exact Jaccard truth set).
      //
      // Banded MinHash-LSH, Spark-first: signature UDF (once per doc)
      // → explode 8 band hashes → equi-join on (band, hash) bucket →
      // distinct candidate pairs → exact Jaccard verify within
      // candidates only. At 100 TB this shuffles by band bucket — the
      // O(n²) loop runs only inside buckets, which is exactly the
      // LSH contract. (MLlib's approxSimilarityJoin measured 727 s on
      // sf0.1's duplicate-heavy corpus; this shape runs in seconds.)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), Kernels.tokenHashesUdf(split(col("text"), " ")).as("th"))
      val banded = docs
        .select(col("doc_id"), posexplode(Kernels.minhashBandsUdf(8, 4)(col("th"))).as(Seq("band", "bh")))
      val x = banded.select(col("doc_id").as("id1"), col("band"), col("bh"))
      val y = banded.select(col("doc_id").as("id2"), col("band").as("band2"), col("bh").as("bh2"))
      val cand = x.join(y, col("band") === col("band2") && col("bh") === col("bh2")
          && col("id1") < col("id2"))
        .select("id1", "id2").distinct()
      cand
        .join(docs.select(col("doc_id").as("id1"), col("th").as("t1")), "id1")
        .join(docs.select(col("doc_id").as("id2"), col("th").as("t2")), "id2")
        .withColumn("jac", Kernels.jaccardLongsUdf(col("t1"), col("t2")))
        .filter(col("jac") >= 0.8)
        .select(col("id1"), col("id2"), Canon.r4(col("jac")).as("jac"))
        .orderBy("id1", "id2")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_tokenize_stats" ->
      s"""SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  ${O.r4("CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)")} AS avg_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "text_term_freq" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "text_lang_source_matrix" ->
      """SELECT lang, source, count(*) AS n_docs
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY h""".stripMargin,
    "dedup_near_jaccard" ->
      s"""WITH t AS (SELECT doc_id, lang,
        |             list_distinct(string_split(text, ' ')) AS toks FROM documents),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |        CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |          / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jac
        |      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |SELECT id1, id2, ${O.r4("jac")} AS jac
        |FROM p WHERE jac >= 0.8 ORDER BY id1, id2""".stripMargin
  )
}
