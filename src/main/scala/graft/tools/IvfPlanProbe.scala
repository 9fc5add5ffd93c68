package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IvfPlanProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    val e = graft.Tables.embeddings(s, d)
    val cents = graft.api.Similarity.trainCodebook(e, "vec_id", "embedding", k = 16)
    val base = graft.sources.Writers.roundTripDir("graft_ivf_probe", d)
    graft.api.Similarity.saveIvfIndex(e, "vec_id", "embedding", cents, base)
    val df = graft.api.Similarity.ivfKnnFromIndex(e.filter(col("vec_id") < 10),
      "vec_id", "embedding", base, k = 5, nprobe = 4, simRound = Some(4))
    df.count()
    println("==== EXECUTED ====")
    println(df.queryExecution.executedPlan.toString.take(4000))
    s.stop()
  }
}
