package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for the m7 cost breakdown (r13 optimization round): attributes
  * the ~3 s sf0.1 total across signature build, sigGroups, the intra-pair
  * explode, the banded cross branch, and the full query.
  * `runMain graft.queries.M7Profile [sfDir]`. */
object M7Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[m7] $label%-42s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val q = graft.SparkEntry.queries("m7_media_phash_neardup")
    noop(q(spark, sfDir)) // warm codegen

    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      // replicate the sigs frame exactly as m7 builds it
      import spark.implicits._
      def sigsDf = {
        val docsCid = graft.core.Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), pmod(col("doc_id"), lit(40)).as("cid"))
        val cidSigs = docsCid.select(col("cid")).distinct()
          .select(col("cid"), (pmod(col("cid"), lit(24)) + 8).cast("int").as("w"),
            (pmod(col("cid"), lit(16)) + 8).cast("int").as("h"))
          .as[(Long, Int, Int)]
          .mapPartitions(_.map { case (cid, w, h) =>
            val g = graft.multimodal.MediaOps.poolGrid(
              graft.multimodal.MediaOps.syntheticPng(cid, w, h), 8)
            var sig = 0L; var r = 0
            while (r < 8) { var c = 0; while (c < 7) {
              if (g(r * 8 + c) > g(r * 8 + c + 1)) sig |= 1L << (r * 7 + c); c += 1 }
              r += 1 }
            (cid, sig)
          }).toDF("cid", "sim")
        docsCid.join(broadcast(cidSigs), Seq("cid"))
          .select(col("doc_id"), col("sim"))
      }
      time("sigs only (noop)") { noop(sigsDf) }
      time("sigGroups (noop)") { noop(TextOps.sigGroups(sigsDf)) }
      time("intra explode only (noop)") {
        noop(TextOps.sigGroups(sigsDf)
          .filter(size(col("docs")).between(2, TextOps.BucketCap))
          .select(explode(expr(
            """flatten(transform(docs, (a, i) ->
              |  transform(slice(docs, 1, i), b ->
              |    struct(b as doc_a, a as doc_b))))""".stripMargin)).as("c")))
      }
      time("bucket entries + group (noop)") {
        noop(TextOps.sigBucketEntries(TextOps.sigGroups(sigsDf))
          .groupBy(col("u"), col("key"))
          .agg(count(lit(1)).as("n")))
      }
      time("full hammingPairs (noop)") {
        noop(TextOps.hammingPairs(sigsDf, 5))
      }
      time("full m7 query (noop)") { noop(q(spark, sfDir)) }
    }
    spark.stop()
  }
}
