package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Compiled vector/set kernels (SURVEY §4.3).
  *
  * Catalyst higher-order lambdas (`aggregate(zip_with(...))`) allocate
  * per element and defeat codegen — measured 200× slower than a plain
  * JVM loop on the sim_knn workload. These UDFs run primitive `while`
  * loops over the backing float arrays instead; the only boxing is at
  * the UDF boundary (once per row, not per element). At cluster scale
  * the same kernels apply unchanged — they are embarrassingly parallel
  * per row and carry no state.
  *
  * All accumulation is Double (float widened exactly), left-to-right —
  * matching DuckDB's DOUBLE[] list_* functions for oracle parity.
  */
object Kernels {
  /** Unwrap a Seq[Float] UDF argument to its primitive backing array
    * without copying when Spark hands us ArraySeq.ofFloat (the common
    * case for parquet list<float>). */
  @inline private def floats(s: Seq[Float]): Array[Float] = s match {
    case a: scala.collection.immutable.ArraySeq.ofFloat => a.unsafeArray
    case _ => s.toArray
  }

  def dotArr(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0; val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def dotW(a: Array[Float], w: Array[Double]): Double = {
    var s = 0.0; var i = 0; val n = math.min(a.length, w.length)
    while (i < n) { s += a(i).toDouble * w(i); i += 1 }
    s
  }

  def normArr(a: Array[Float]): Double = math.sqrt(dotArr(a, a))

  def cosineArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Token-set Jaccard |A∩B| / |A∪B| over pre-distinct token arrays. */
  def jaccardSets(a: Seq[String], b: Seq[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet
    var inter = 0
    val itb = b.iterator
    val seen = new scala.collection.mutable.HashSet[String]
    while (itb.hasNext) { val t = itb.next(); if (seen.add(t) && sa.contains(t)) inter += 1 }
    val union = sa.size + seen.size - inter
    if (union == 0) 1.0 else inter.toDouble / union.toDouble
  }

  def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  // ---- Column-level wrappers (compiled Scala UDFs, not SQL lambdas) ----
  val cosineUdf = udf((a: Seq[Float], b: Seq[Float]) => cosineArr(floats(a), floats(b)))
  val dotUdf    = udf((a: Seq[Float], b: Seq[Float]) => dotArr(floats(a), floats(b)))
  val normUdf   = udf((a: Seq[Float]) => normArr(floats(a)))
  val jaccardUdf = udf((a: Seq[String], b: Seq[String]) => jaccardSets(a, b))

  def cosine(a: Column, b: Column): Column = cosineUdf(a, b)
  def dot(a: Column, b: Column): Column    = dotUdf(a, b)
  def l2norm(a: Column): Column            = normUdf(a)
  def jaccard(a: Column, b: Column): Column = jaccardUdf(a, b)

  /** σ(w·x) against a fixed weight vector captured in the closure (the
    * reference's broadcast-weights forward pass; at cluster scale the
    * closure ships once per task via the task binary — for big models
    * use an explicit Broadcast handle instead). */
  def linearScoreUdf(w: Array[Double]) =
    udf((x: Seq[Float]) => sigmoid(dotW(floats(x), w)))
}
