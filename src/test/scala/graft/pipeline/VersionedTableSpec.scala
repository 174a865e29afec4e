package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Versioned-table maintenance: compaction rewrites the latest version into
  * fewer files without changing a row, vacuum retires old versions while
  * retained ones stay time-travelable, and readers never see version ids
  * that were reclaimed.
  */
class VersionedTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("compact preserves rows, reduces files, and lands as a new version") {
    val s = spark
    import s.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft-vt").toString
    // v=0: fragmented (16 files); v=1: the same data updated for key 1
    (1L to 100L).map(k => (k, s"p$k")).toDF("k", "v")
      .repartition(16).write.parquet(s"$tbl/v=0")
    VersionedTable.read(spark, tbl).withColumn("v",
        when(col("k") === 1, lit("updated")).otherwise(col("v")))
      .write.parquet(s"$tbl/v=1")
    val before = VersionedTable.read(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val newV = VersionedTable.compact(spark, tbl, targetFiles = 2)
    assert(VersionedTable.versions(tbl) === Seq(0L, 1L, newV))
    val after = VersionedTable.read(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after === before, "compaction must not change a single row")
    val files = new java.io.File(s"$tbl/v=$newV").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files <= 2, s"compacted version must respect the file target, got $files")

    // time travel: v=0 still shows the pre-update value until vacuumed
    val v0 = VersionedTable.read(spark, tbl, Some(0L))
      .filter(col("k") === 1).head().getString(1)
    assert(v0 === "p1")

    val dropped = VersionedTable.vacuum(tbl, keep = 1)
    assert(dropped === Seq(0L, 1L))
    assert(VersionedTable.versions(tbl) === Seq(newV))
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, tbl, Some(0L))
    }
    assert(VersionedTable.read(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet === before)
  }
}
