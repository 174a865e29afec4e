package graft
import org.apache.spark.sql.SparkSession
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(l: String)(f: => Long): Unit = { val t0=System.nanoTime(); val n=f; println(f"[probe] $l ${(System.nanoTime()-t0)/1e9}%.2f s (n=$n)") }
    def run(name: String) = graft.queries.VectorOps.all.find(_.name == name).get.run(spark, dir).count()
    time("warmup")(run("e5_kmeans_cells"))
    Seq("e5_kmeans_cells","e8_ann_ivf_kmeans","e10_ann_pq_adc","e11_ann_ivf_pq_rerank","e2_ann_lsh_bucketed").foreach { n =>
      time(n)(run(n)); time(n)(run(n))
    }
    spark.stop()
  }
}
