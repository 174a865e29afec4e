package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the i11 changelog fold (round-13 adjudication of the
  * i11 cost trend): splits PLAN time (changes() construction — manifest
  * reads, mask pricing) from EXECUTION time (the netting scans), and times
  * the v1 base-read aggregate separately. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.queries.ProfI11"` */
object ProfI11 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.sources.GraftSqlExtensions")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val VHT = graft.sources.VersionedHiddenTable
    val vhtDir = RelationalOps.vhtCdcEvents(spark, sfDir)
    def sec(t0: Long) = (System.nanoTime() - t0) / 1e9
    for (i <- 1 to 4) {
      var t = System.nanoTime()
      val ch = VHT.changes(spark, vhtDir, 1L, Some(5L))
      val planSec = sec(t)
      t = System.nanoTime()
      ch.write.format("noop").mode("overwrite").save()
      val execSec = sec(t)
      t = System.nanoTime()
      VHT.read(spark, vhtDir, Some(1L)).groupBy(col("user_id"))
        .agg(count(lit(1)), sum(col("value").cast("decimal(18,4)")))
        .write.format("noop").mode("overwrite").save()
      val baseSec = sec(t)
      // per-step plan cost: how much of the plan is mask pricing vs diffing
      t = System.nanoTime()
      val step12 = VHT.changes(spark, vhtDir, 1L, Some(2L))
      val plan12 = sec(t)
      t = System.nanoTime()
      step12.write.format("noop").mode("overwrite").save()
      val exec12 = sec(t)
      println(f"[profi11] rep$i plan=$planSec%.2f exec=$execSec%.2f " +
        f"base=$baseSec%.2f step(1,2]: plan=$plan12%.2f exec=$exec12%.2f")
    }
    spark.stop()
  }
}
