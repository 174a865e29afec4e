package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev harness for the changelog-family cost breakdown (r13): separates
  * DataFrame CONSTRUCTION (plan building, manifest reads, mask pricing)
  * from execution (noop sink) for s24 / i11 / s31 / i3 / i12.
  * `runMain graft.queries.CdcProfile [sfDir]`. */
object CdcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("s24_changelog_scan", "i11_changelog_incremental_agg",
      "s31_positional_deletes", "i3_scd2_incremental", "i12_overwrite_run_cdc")
    // warm pass
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      names.foreach { n =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        spark.catalog.clearCache()
        println(f"[cdc] $n%-34s build ${(t1 - t0) / 1e9}%5.2f s  exec ${(t2 - t1) / 1e9}%5.2f s")
      }
    }
    spark.stop()
  }
}
