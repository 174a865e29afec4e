package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.register(spark)
    def time(l: String)(f: => Long): Unit = { val t0=System.nanoTime(); val n=f; println(f"[probe] $l ${(System.nanoTime()-t0)/1e9}%.2f s (n=$n)") }
    val raw = spark.read.parquet(dir + "/embeddings.parquet")
    time("raw_count_1")(raw.count()); time("raw_count_2")(raw.count())
    val viaTables = graft.core.Tables.load(spark, dir, "embeddings")
    time("tables_count_1")(viaTables.count()); time("tables_count_2")(viaTables.count())
    val qz = viaTables.selectExpr("vec_id", "transform(embedding, x -> cast(floor(cast(x as double) * 4096.0d + 0.5d) AS BIGINT)) as qv")
    val qzc = qz.select(expr("graft_qnorm2(qv)").as("n2")).agg(sum("n2"))
    time("quantize_sum_1")(qzc.head().getLong(0)); time("quantize_sum_2")(qzc.head().getLong(0))
    // force the full projection math: sum over all 150 projections
    val digest = java.security.MessageDigest.getInstance("MD5")
    val planeW = Array.tabulate(150, 64) { (p, d) =>
      val h = digest.digest(s"lsh:$p:$d".getBytes("UTF-8")); if ((h(0) & 0x80) == 0) 1 else -1 }
    val planesSql = planeW.map(r => r.map(w => s"${w}L").mkString("array(", ",", ")")).mkString("array(", ",", ")")
    val proj = qz.select(expr(s"aggregate(transform($planesSql, w -> graft_qdot(qv, w)), 0L, (a,x) -> a + x)").as("s")).agg(sum("s"))
    time("proj_sum_1")(proj.head().getLong(0)); time("proj_sum_2")(proj.head().getLong(0))
    time("proj_sum_3")(proj.head().getLong(0))
    spark.stop()
  }
}
