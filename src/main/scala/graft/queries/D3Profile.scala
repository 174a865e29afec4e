package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for the d3 MinHash+LSH cost breakdown (r13): postings build,
  * DF-cap, 128-hash signature aggregate, banding, candidate pairs, verify.
  * `runMain graft.queries.D3Profile [sfDir]`. */
object D3Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d3] $label%-42s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val q = graft.SparkEntry.queries("d3_dedup_minhash_lsh")
    noop(q(spark, sfDir)) // warm
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      time("postings explode (noop)") { noop(TextOps.hashedShingles(docs)) }
      time("postings + df-cap anti (noop)") {
        val ex0 = TextOps.hashedShingles(docs)
        val heavy = ex0.groupBy(col("hv")).agg(count(lit(1)).as("df"))
          .filter(col("df") > TextOps.DfCap)
        noop(ex0.join(broadcast(heavy), Seq("hv"), "left_anti"))
      }
      time("per-doc sorted shingle arrays (noop)") {
        noop(TextOps.hashedShingles(docs).groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("hv"))).as("shingles")))
      }
      time("128-min signature agg (noop)") {
        val P = 2147483647L
        val rnd = new scala.util.Random(42)
        val hashA = Array.fill(128)(1 + rnd.nextLong().abs % (P - 1))
        val hashB = Array.fill(128)(rnd.nextLong().abs % P)
        val ex = TextOps.hashedShingles(docs).withColumn("hv", pmod(col("hv"), lit(P)))
        val minCols = (0 until 128).map(i =>
          min((lit(hashA(i)) * col("hv") + lit(hashB(i))) % lit(P)).as(s"m$i"))
        noop(ex.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*))
      }
      time("full d3 (noop)") { noop(q(spark, sfDir)) }
    }
    spark.stop()
  }
}
