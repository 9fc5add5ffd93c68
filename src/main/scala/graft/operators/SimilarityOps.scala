package graft.operators

import graft.{Canon, Q, Tables}
import graft.Canon.{sql => O}
import graft.functions.Kernels
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.9 (vector half) — similarity search over the embedding column.
  *
  * All vector math goes through the compiled kernels (SURVEY §4.3):
  * Catalyst higher-order lambdas measured 200× slower. The brute-force
  * pair join is the exactness baseline — O(n²) pairs with the small
  * side broadcast, fine for fixture n, and the per-bucket inner loop
  * of an LSH/IVF layout at cluster scale (the bucketing twin is
  * `dedup_minhash_lsh`; the same shape applies to embeddings).
  */
object SimilarityOps {
  /** DuckDB-side cosine spelled to mirror Kernels.cosineArr op-for-op
    * (double accumulation, sqrt(na)*sqrt(nb) denominator). */
  private def duckCosine(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))" +
      s" / (sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))" +
      s" * sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))))"

  val queries: Map[String, Q] = Map(
    "sim_knn_bruteforce" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      // round-robin repartition the probe side: the fixture parquet is
      // one split, which would pin all O(n²) pair work on one core.
      val p = s.conf.get("spark.sql.shuffle.partitions").toInt
      val a = e.repartition(p).select(col("vec_id").as("id1"), col("embedding").as("e1"))
      val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"))
      a.join(broadcast(b), col("id1") < col("id2"))
        .select(col("id1"), col("id2"), Canon.r4(Kernels.cosine(col("e1"), col("e2"))).as("sim"))
        .orderBy(col("sim").desc, col("id1").asc, col("id2").asc)
        .limit(100)
    }),
    "sim_knn_per_query" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val p = s.conf.get("spark.sql.shuffle.partitions").toInt
      val c = e.repartition(p).select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
      c.join(broadcast(q), col("qid") =!= col("cid"))
        .withColumn("sim", Canon.r4(Kernels.cosine(col("qe"), col("ce"))))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select("qid", "cid", "sim", "rn")
        .orderBy("qid", "rn")
    }),
    "sim_threshold_join" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val p = s.conf.get("spark.sql.shuffle.partitions").toInt
      val a = e.repartition(p).select(col("vec_id").as("id1"), col("label"), col("embedding").as("e1"))
      val b = e.select(col("vec_id").as("id2"), col("label").as("label2"), col("embedding").as("e2"))
      a.join(broadcast(b), col("label") === col("label2") && col("id1") < col("id2"))
        .withColumn("sim", Canon.r4(Kernels.cosine(col("e1"), col("e2"))))
        .filter(col("sim") >= 0.95)
        .select("id1", "id2", "label", "sim")
        .orderBy("id1", "id2")
    }),
    "multimodal_embed_norm" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"), Canon.r4(Kernels.l2norm(col("embedding"))).as("norm"))
        .orderBy("vec_id")
    }),
    "embed_centroid_by_label" -> ((s, d) => {
      // Mean vector per label, exploded to (label, dim, value) rows —
      // row output avoids array-encoding equivalence issues and the
      // groupBy(label, dim) partial-aggregates before the shuffle.
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim").cast("long").as("dim"))
        .agg(Canon.r4(avg(col("v").cast("double"))).as("centroid"))
        .orderBy("label", "dim")
    })
  )

  val oracles: Map[String, String] = Map(
    "sim_knn_bruteforce" ->
      s"""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  ${O.r4(duckCosine("a.embedding", "b.embedding"))} AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, sim FROM p
        |ORDER BY sim DESC, id1, id2 LIMIT 100""".stripMargin,
    "sim_knn_per_query" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |j AS (SELECT q.qid, c.vec_id AS cid,
        |        ${O.r4(duckCosine("q.qe", "c.embedding"))} AS sim
        |      FROM q JOIN embeddings c ON q.qid <> c.vec_id),
        |r AS (SELECT qid, cid, sim,
        |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
        |      FROM j)
        |SELECT qid, cid, sim, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    "sim_threshold_join" ->
      s"""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, a.label AS label,
        |  ${O.r4(duckCosine("a.embedding", "b.embedding"))} AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id1, id2, label, sim FROM p WHERE sim >= 0.95
        |ORDER BY id1, id2""".stripMargin,
    "multimodal_embed_norm" ->
      s"""SELECT vec_id,
        |  ${O.r4("sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))")} AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "embed_centroid_by_label" ->
      s"""SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |  ${O.r4("avg(CAST(embedding[i] AS DOUBLE))")} AS centroid
        |FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
        |GROUP BY 1, 2 ORDER BY label, dim""".stripMargin
  )
}
