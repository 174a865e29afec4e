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

  test("size-targeted clustered compaction: file ranges disjoint, stats prune reads") {
    val s = spark
    import s.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft-vtc").toString
    // fragmented AND key-interleaved: every file spans nearly the full key
    // range, so footer min/max stats can prune nothing before clustering
    (1L to 4000L).map(k => (k, s"p$k")).toDF("k", "v")
      .repartition(16).write.parquet(s"$tbl/v=0")
    val before = VersionedTable.read(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val totalBytes = VersionedTable.bytes(tbl, 0L)

    val newV = VersionedTable.compactBySize(spark, tbl,
      targetBytes = totalBytes / 4 + 1, clusterBy = Seq("k"))
    val after = VersionedTable.read(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after === before, "clustered compaction must not change a single row")

    val files = new java.io.File(s"$tbl/v=$newV").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length <= 5, s"bytes/target sizing must bound files, got ${files.length}")
    // each output file must cover a narrow, pairwise-disjoint key range —
    // the property parquet footer min/max pruning needs
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file key ranges must not interleave: $hi vs $lo2")
      case _ =>
    }
  }

  test("schema evolution: mergeSchema unions file schemas; old files read nulls") {
    // the lakehouse add-a-column path: a later batch lands with an extra
    // column and a widened reader sees the union schema — old rows surface
    // NULL for the new column, new rows carry it; column pruning still
    // reaches the scan when the new column is not selected
    val s = spark
    import s.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft-se").toString
    (1L to 50L).map(k => (k, s"p$k")).toDF("k", "v")
      .write.parquet(s"$tbl/batch=0")
    (51L to 80L).map(k => (k, s"p$k", k * 10)).toDF("k", "v", "score")
      .write.parquet(s"$tbl/batch=1")

    val merged = spark.read.option("mergeSchema", "true").parquet(tbl)
    assert(merged.schema.fieldNames.sorted.toSeq === Seq("batch", "k", "score", "v"))
    assert(merged.count() === 80)
    assert(merged.filter(col("score").isNull).count() === 50,
      "pre-evolution rows read NULL for the added column")
    assert(merged.filter(col("score") === col("k") * 10).count() === 30,
      "post-evolution rows carry their values")
    // pruning: a projection without `score` must not read it from the scan
    val p = merged.select(col("k"), col("v")).queryExecution.executedPlan.toString
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("score"), s"unselected evolved column must prune: $read")
  }

  test("write-audit-publish: staged batches are invisible until the audit passes") {
    val s = spark
    import s.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft-wap").toString
    // v=0: the published base
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.parquet(s"$tbl/v=0")
    // staging is invisible: readers still see v=0 while the candidate lands
    val token = VersionedTable.stage(s, tbl,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    assert(VersionedTable.versions(tbl) == Seq(0L),
      "a staged candidate must not appear in the readable version list")
    assert(VersionedTable.read(s, tbl).count() === 2)
    assert(VersionedTable.readStaged(s, tbl, token).count() === 3)
    // publish = version allocation + one atomic rename; the candidate
    // becomes the newest version
    val v = VersionedTable.publish(tbl, token)
    assert(v === 1L, "version id is allocated at publish time")
    assert(VersionedTable.versions(tbl) == Seq(0L, 1L))
    assert(VersionedTable.read(s, tbl).count() === 3)
    assert(VersionedTable.read(s, tbl, Some(0L)).count() === 2, "time travel intact")
  }

  test("write-audit-publish: a failing audit aborts and leaves the table untouched") {
    val s = spark
    import s.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft-wap2").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$tbl/v=0")
    // the audit is the dbt schema-test surface run against the STAGED bytes
    def audit(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val dupes = Checks.unique(df, Seq("k")).count()
      val nulls = Checks.notNull(df, Seq("v")).count()
      Seq(
        if (dupes > 0) Some(s"$dupes duplicate keys") else None,
        if (nulls > 0) Some(s"$nulls null values") else None).flatten
    }
    // bad batch (duplicate key): rejected, no new version, no staging residue
    val bad = VersionedTable.writeAuditPublish(s, tbl,
      Seq((2L, "x"), (2L, "y")).toDF("k", "v"))(audit)
    assert(bad == Left(Seq("1 duplicate keys")))
    assert(VersionedTable.versions(tbl) == Seq(0L), "rejected batch must not publish")
    assert(VersionedTable.read(s, tbl).count() === 1)
    // good batch: published as the next version
    val good = VersionedTable.writeAuditPublish(s, tbl,
      Seq((2L, "x"), (3L, "y")).toDF("k", "v"))(audit)
    assert(good.isRight)
    assert(VersionedTable.read(s, tbl).count() === 2)
  }

  test("write-audit-publish: concurrent writers never clobber or share a version id") {
    // token-unique staging + publish-time version allocation: two WAP
    // cycles racing on one table must each audit exactly its own bytes and
    // land as DISTINCT versions (the hazard a shared staged-version-id
    // scheme has: one writer publishing bytes the other staged)
    val s = spark
    import s.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft-wap3").toString
    Seq((0L, 0L)).toDF("k", "batch").write.parquet(s"$tbl/v=0")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val results = Await.result(Future.sequence((1 to 4).map(b => Future {
      VersionedTable.writeAuditPublish(s, tbl,
        Seq((b.toLong, b.toLong)).toDF("k", "batch")) { staged =>
        // the audit proves isolation: staged bytes must be THIS batch
        if (staged.select("batch").collect().map(_.getLong(0)).toSeq == Seq(b.toLong)) Nil
        else Seq(s"batch $b audited someone else's bytes")
      }
    })), 5.minutes)
    val published = results.collect { case Right(v) => v }
    assert(results.forall(_.isRight), s"no batch may fail its isolation audit: $results")
    assert(published.sorted == Seq(1L, 2L, 3L, 4L), s"distinct sequential versions: $published")
    assert(VersionedTable.versions(tbl) == Seq(0L, 1L, 2L, 3L, 4L))
    // every batch's bytes are present in exactly one published version
    val all = (1L to 4L).flatMap(v =>
      VersionedTable.read(s, tbl, Some(v)).select("batch").collect().map(_.getLong(0)))
    assert(all.sorted == Seq(1L, 2L, 3L, 4L))
  }

  test("concurrent compaction and publish never collide on a version id") {
    // compact/compactBySize used to compute vs.max + 1 OUTSIDE publishLock —
    // racing a WAP publish could allocate the same v=<n>, failing the rename
    // or renaming into a half-overwritten directory. Both now stage + publish
    // through the locked path, so every allocation is distinct.
    val s = spark
    import s.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft-vtrace").toString
    (1L to 50L).map(k => (k, s"p$k")).toDF("k", "v")
      .repartition(8).write.parquet(s"$tbl/v=0")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val compactions = (1 to 3).map(_ => Future {
      VersionedTable.compact(s, tbl, targetFiles = 2)
    })
    val publishes = (1 to 3).map(b => Future {
      VersionedTable.writeAuditPublish(s, tbl,
        Seq((1000L + b, s"w$b")).toDF("k", "v"))(_ => Nil)
        .toOption.get
    })
    val ids = Await.result(Future.sequence(compactions ++ publishes), 5.minutes)
    assert(ids.distinct.size == 6, s"six distinct version ids, got $ids")
    assert(VersionedTable.versions(tbl) == (0L to 6L),
      s"contiguous version chain: ${VersionedTable.versions(tbl)}")
    // every retained version is a complete, readable directory
    (0L to 6L).foreach(v => VersionedTable.read(s, tbl, Some(v)).count())
  }

  test("time-based snapshot expiry retires old versions, never the newest") {
    val s = spark
    import s.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft-vtexp").toString
    (0L to 3L).foreach { v =>
      Seq((v, s"v$v")).toDF("k", "v").write.parquet(s"$tbl/v=$v")
    }
    val now = System.currentTimeMillis()
    // v=0 and v=1 are "a week old"; v=2 and v=3 are fresh
    Seq(0L, 1L).foreach(v =>
      assert(new java.io.File(s"$tbl/v=$v").setLastModified(now - 7L * 86400 * 1000)))
    val dropped = VersionedTable.expireSnapshots(tbl, horizonEpochMillis = now - 86400 * 1000)
    assert(dropped == Seq(0L, 1L), s"only the aged versions expire: $dropped")
    assert(VersionedTable.versions(tbl) == Seq(2L, 3L))
    // retention floor: even if EVERYTHING is older than the horizon, the
    // newest keepLast versions survive — a quiet table keeps its data
    Seq(2L, 3L).foreach(v =>
      assert(new java.io.File(s"$tbl/v=$v").setLastModified(now - 7L * 86400 * 1000)))
    val dropped2 = VersionedTable.expireSnapshots(tbl, horizonEpochMillis = now, keepLast = 1)
    assert(dropped2 == Seq(2L), s"keepLast must protect the newest: $dropped2")
    assert(VersionedTable.versions(tbl) == Seq(3L))
    assert(VersionedTable.read(s, tbl).count() === 1)
  }

  test("batch-id marker rides the publish rename: no crash window, no data pollution") {
    val s = spark
    import s.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft-vtbatch").toString
    val v = VersionedTable.writeAuditPublish(s, tbl,
      Seq((1L, "a")).toDF("k", "v"), batchId = Some("42"))(_ => Nil)
      .toOption.get
    // marker and commit are one rename: the published dir carries _batch-42
    assert(new java.io.File(s"$tbl/v=$v/_batch-42").isFile,
      "the marker must live INSIDE the published version directory")
    assert(VersionedTable.publishedBatchIds(tbl) == Set("42"))
    // the _-prefixed marker is invisible to the parquet reader
    assert(VersionedTable.read(s, tbl, Some(v)).count() === 1)
    // a rejected batch publishes nothing and leaves no marker anywhere
    val bad = VersionedTable.writeAuditPublish(s, tbl,
      Seq((2L, "b")).toDF("k", "v"), batchId = Some("43"))(_ => Seq("nope"))
    assert(bad.isLeft)
    assert(VersionedTable.publishedBatchIds(tbl) == Set("42"),
      "an aborted batch id must never appear published")
  }
}
