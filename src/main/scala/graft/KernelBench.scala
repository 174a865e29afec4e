package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object KernelBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    // temporarily drop the rewrite rule so the composed form stays composed
    spark.experimental.extraOptimizations = Nil
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    emb.createOrReplaceTempView("e")
    def dot(a: String, b: String) =
      s"aggregate(zip_with($a, $b, (p, q) -> p * q), cast(0 as double), (acc, w) -> acc + w)"
    val composed = s"${dot("a.v","b.v")} / (sqrt(${dot("a.v","a.v")}) * sqrt(${dot("b.v","b.v")}))"
    def time(label: String, sql: String): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = spark.sql(sql).filter(col("s") > 0.95).count()
        println(f"[kb] $label run$i ${(System.nanoTime()-t0)/1e9}%.2f s (n=$n)")
      }
    }
    time("composed", s"SELECT $composed AS s FROM e a JOIN e b ON a.vec_id < b.vec_id")
    time("kernel  ", "SELECT graft_cosine(a.v, b.v) AS s FROM e a JOIN e b ON a.vec_id < b.vec_id")
    spark.stop()
  }
}
