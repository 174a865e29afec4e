package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev harness for the d4 SimHash cost breakdown (VERDICT r3 ask): times each
  * stage of the pipeline separately so the ~8 s sf0.1 total is attributable —
  * signature build (tokenize + md5 + 60 bit-sums), bucket-entry explode
  * (63 entries/doc), bucket group + pair emit, and the end-to-end query.
  * `runMain graft.queries.D4Profile [sfDir]`.
  */
object D4Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d4] $label%-42s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
      r
    }

    // warm the JVM/codegen paths once
    TextOps.simhashSigs(spark, sfDir).write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val nDocs = time("docs scan (count)") {
        graft.core.Tables.load(spark, sfDir, "documents").count()
      }
      val nToks = time("tokenize+distinct+explode (count)") {
        import org.apache.spark.sql.functions._
        graft.core.Tables.load(spark, sfDir, "documents")
          .select(explode(array_distinct(split(col("text"), " "))).as("tok")).count()
      }
      time("sigs: + md5 + 60 bit-sums (noop)") {
        TextOps.simhashSigs(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val sigs = TextOps.simhashSigs(spark, sfDir)
      val nSigs = time("signature groups (count)") {
        TextOps.sigGroups(sigs).count()
      }
      println(s"[d4] distinct signatures: $nSigs")
      val nEntries = time("sigs + 63x bucket-entry explode (count)") {
        TextOps.sigBucketEntries(TextOps.sigGroups(sigs)).count()
      }
      time("sigs + entries + bucket group (noop)") {
        import org.apache.spark.sql.functions._
        TextOps.sigBucketEntries(TextOps.sigGroups(sigs))
          .groupBy(col("u"), col("key"))
          .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
      time("cross branch only: collect+verify+distinct (noop)") {
        import org.apache.spark.sql.functions._
        TextOps.sigBucketEntries(TextOps.sigGroups(sigs))
          .groupBy(col("u"), col("key"))
          .agg(collect_list(struct(col("sim"), col("docs"), col("is_exact"))).as("ds"))
          .filter(size(col("ds")) > 1 && size(col("ds")) <= TextOps.BucketCap)
          .select(explode(expr(
            s"""flatten(transform(filter(ds, e -> e.is_exact), e ->
               |  flatten(transform(filter(ds, p -> p.sim < e.sim
               |                        AND bit_count(p.sim ^ e.sim) <= 5), p ->
               |    flatten(transform(p.docs, a ->
               |      transform(e.docs, b ->
               |        struct(least(a, b) as doc_a, greatest(a, b) as doc_b,
               |               bit_count(p.sim ^ e.sim) as dist))))))))""".stripMargin)).as("c"))
          .select(col("c.doc_a").as("doc_a"), col("c.doc_b").as("doc_b"),
            col("c.dist").as("dist"))
          .distinct()
          .write.format("noop").mode("overwrite").save()
      }
      time("bucket collect_list only, no lambda (noop)") {
        import org.apache.spark.sql.functions._
        TextOps.sigBucketEntries(TextOps.sigGroups(sigs))
          .groupBy(col("u"), col("key"))
          .agg(collect_list(struct(col("sim"), col("docs"), col("is_exact"))).as("ds"))
          .filter(size(col("ds")) > 1 && size(col("ds")) <= TextOps.BucketCap)
          .select(size(col("ds")).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
      val nPairs = time("full d4 hammingPairs (noop)") {
        TextOps.hammingPairs(sigs, 5).write.format("noop").mode("overwrite").save()
      }
      println(s"[d4] docs=$nDocs tokenRows=$nToks bucketEntries=$nEntries")
    }
    spark.stop()
  }
}
