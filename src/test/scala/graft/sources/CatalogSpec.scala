package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The DSv2 `graft` catalog ([[GraftCatalog]]): SQL three-part names, DML
  * and time travel resolve to the SAME storage layer as the Scala API —
  * reads are an analysis-time splice of the library plan (so stats
  * skipping still prunes, plan-asserted), INSERT INTO/OVERWRITE land as
  * append/overwrite snapshots, DELETE FROM runs the copy-on-write delete. */
class CatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sources.GraftSqlExtensions")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    HiddenPartitioning.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private var catSeq = 0
  /** Fresh warehouse + registered catalog per test (catalog instances cache
    * by name, so each warehouse needs its own name). */
  private def freshCatalog(tag: String): (String, String) = {
    catSeq += 1
    val wh = java.nio.file.Files.createTempDirectory(s"graft-cat-$tag").toString
    (GraftCatalog.register(spark, s"gcat_${tag}_$catSeq", wh), wh)
  }

  private def events: DataFrame = graft.core.Tables.load(spark, dir, "events")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: children.flatMap(flatten)
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect(): Unit
    flatten(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.metrics.get("numFiles").map(_.value).getOrElse(0L)
    }.sum
  }

  test("SQL SELECT, VERSION AS OF, tag travel and SYSTEM_TIME equal the Scala API") {
    val (cat, wh) = freshCatalog("read")
    val ev = events
    VersionedHiddenTable.create(spark, s"$wh/db/t",
      ev.filter(col("ts") < "2024-01-16"), Seq(HiddenPartitioning.DayT("ts"))): Unit
    assert(VersionedHiddenTable.append(spark, s"$wh/db/t",
      ev.filter(col("ts") >= "2024-01-16"))().isRight)
    VersionedHiddenTable.tag(spark, s"$wh/db/t", "audit", 0L)
    assert(canon(spark.sql(s"SELECT * FROM $cat.db.t")) ==
      canon(VersionedHiddenTable.read(spark, s"$wh/db/t")),
      "catalog SELECT must equal the Scala read")
    assert(canon(spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 0")) ==
      canon(VersionedHiddenTable.read(spark, s"$wh/db/t", Some(0L))),
      "VERSION AS OF must time-travel")
    assert(canon(spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 'audit'")) ==
      canon(VersionedHiddenTable.read(spark, s"$wh/db/t", Some(0L))),
      "VERSION AS OF a tag name must resolve through refs")
    // SYSTEM_TIME far in the future resolves to the latest snapshot
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
      "FOR SYSTEM_TIME AS OF '2099-01-01'").head().getLong(0) == ev.count())
    // and a filtered aggregate (pushdown path) matches too
    assert(canon(spark.sql(
      s"SELECT event_type, count(*) AS n FROM $cat.db.t " +
        "WHERE user_id < 10 GROUP BY event_type")) ==
      canon(VersionedHiddenTable.read(spark, s"$wh/db/t")
        .filter(col("user_id") < 10).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))))
  }

  test("INSERT INTO appends; INSERT OVERWRITE replaces; DELETE FROM is copy-on-write DML") {
    val (cat, wh) = freshCatalog("dml")
    val ev = events
    val t = s"$wh/t"
    VersionedHiddenTable.create(spark, t, ev.filter(col("ts") < "2024-01-16"),
      Seq(HiddenPartitioning.DayT("ts"))): Unit
    ev.filter(col("ts") >= "2024-01-16").createOrReplaceTempView("cat_rest")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM cat_rest").collect(): Unit
    assert(VersionedHiddenTable.versions(spark, t) == Seq(0L, 1L))
    assert(canon(spark.sql(s"SELECT * FROM $cat.t")) == canon(ev),
      "after INSERT INTO the table holds the full content")
    spark.sql(s"DELETE FROM $cat.t WHERE user_id < 10").collect(): Unit
    assert(VersionedHiddenTable.versions(spark, t) == Seq(0L, 1L, 2L))
    assert(canon(spark.sql(s"SELECT * FROM $cat.t")) ==
      canon(ev.filter(col("user_id") >= 10)),
      "DELETE FROM must remove exactly the matching rows")
    assert(canon(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1")) == canon(ev),
      "the pre-delete snapshot stays readable")
    ev.filter(col("user_id") < 3).createOrReplaceTempView("cat_over")
    spark.sql(s"INSERT OVERWRITE $cat.t SELECT * FROM cat_over").collect(): Unit
    assert(VersionedHiddenTable.snapshotOp(spark, t, 3L) == "overwrite",
      "INSERT OVERWRITE must publish an op=overwrite snapshot")
    assert(canon(spark.sql(s"SELECT * FROM $cat.t")) ==
      canon(ev.filter(col("user_id") < 3)))
  }

  test("stats skipping prunes era files through the catalog read (plan-asserted)") {
    val (cat, wh) = freshCatalog("prune")
    val t = s"$wh/t"
    VersionedHiddenTable.create(spark, t, events, Nil): Unit
    // clustered compaction lays files out with disjoint event_id spans —
    // the layout StatsFileSkipping monetizes
    VersionedHiddenTable.compact(spark, t, clusterBy = Seq("event_id"),
      targetBytes = 1L << 10): Unit
    val total = scannedFiles(spark.sql(s"SELECT * FROM $cat.t"))
    assert(total >= 8, s"precondition: need a multi-file layout, got $total")
    val narrow = scannedFiles(spark.sql(
      s"SELECT * FROM $cat.t WHERE event_id BETWEEN 10 AND 20"))
    assert(narrow * 2 < total,
      s"a narrow key-range catalog read must prune files: $narrow of $total scanned")
  }

  test("SYSTEM_TIME travel resolves along MAIN even when a branch commit is newest") {
    val (cat, wh) = freshCatalog("ttbranch")
    val ev = events
    val t = s"$wh/db/t"
    VersionedHiddenTable.create(spark, t, ev.filter(col("user_id") < 8),
      Seq(HiddenPartitioning.DayT("ts"))): Unit                 // v0 (main)
    VersionedHiddenTable.createBranch(spark, t, "wip"): Unit
    assert(VersionedHiddenTable.appendToBranch(spark, t, "wip",
      ev.filter(col("user_id") >= 8))().isRight)                 // v1 (BRANCH) — newest
    // a future timestamp sees every published snapshot; the newest is the
    // branch commit, which main has never seen — Iceberg resolves timestamp
    // travel along the main branch, so the read must return v0's content
    assert(canon(spark.sql(s"SELECT * FROM $cat.db.t " +
      "FOR SYSTEM_TIME AS OF '2099-01-01'")) ==
      canon(ev.filter(col("user_id") < 8)),
      "timestamp travel must not leak branch-only content")
  }

  test("DELETE FROM with a graft-relation subquery condition splices the inner read") {
    val (cat, wh) = freshCatalog("delsub")
    val ev = events
    VersionedHiddenTable.create(spark, s"$wh/t", ev, Nil): Unit
    VersionedHiddenTable.create(spark, s"$wh/u",
      ev.filter(col("user_id") < 5).select(col("user_id")).distinct(), Nil): Unit
    // the inner graft.u read sits inside DeleteFromTable's condition — it
    // must still get the analysis-time splice (the target alone stays a V2
    // relation for SupportsDelete planning)
    spark.sql(s"DELETE FROM $cat.t WHERE user_id IN " +
      s"(SELECT user_id FROM $cat.u)").collect(): Unit
    assert(canon(spark.sql(s"SELECT * FROM $cat.t")) ==
      canon(ev.filter(col("user_id") >= 5)),
      "the subquery-driven DELETE must remove exactly the matching rows")
  }

  test("catalog hygiene: listTables, dropTable, unsupported ALTER refuses loudly") {
    val (cat, wh) = freshCatalog("hyg")
    VersionedHiddenTable.create(spark, s"$wh/db/a", events.limit(10), Nil): Unit
    VersionedHiddenTable.create(spark, s"$wh/db/b", events.limit(10), Nil): Unit
    assert(canon(spark.sql(s"SHOW TABLES IN $cat.db").select("tableName")) ==
      Seq("[a]", "[b]"))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.a ADD COLUMNS (z INT)").collect()
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.a").head().getLong(0) == 10L)
    spark.sql(s"DROP TABLE $cat.db.a").collect(): Unit
    val fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(s"$wh/db/a")), "DROP TABLE must delete the dir")
    assert(canon(spark.sql(s"SHOW TABLES IN $cat.db").select("tableName")) ==
      Seq("[b]"))
  }

  test("CREATE TABLE (bare + PARTITIONED BY + CTAS): SQL DDL reaches the storage layer") {
    val (cat, wh) = freshCatalog("ctas")
    val ev = events
    ev.filter(col("ts") < "2024-01-16").createOrReplaceTempView("ctas_first")
    ev.filter(col("ts") >= "2024-01-16").createOrReplaceTempView("ctas_rest")
    // CTAS with a hidden-partitioning transform: v0 empty create, v1 spec
    // evolution (days), v2 the CTAS batch
    spark.sql(s"CREATE TABLE $cat.db.t PARTITIONED BY (days(ts)) " +
      "AS SELECT * FROM ctas_first").collect(): Unit
    assert(VersionedHiddenTable.versions(spark, s"$wh/db/t") == Seq(0L, 1L, 2L))
    assert(canon(spark.sql(s"SELECT * FROM $cat.db.t")) ==
      canon(ev.filter(col("ts") < "2024-01-16")))
    // the declared spec is the CURRENT spec: the CTAS batch landed under
    // day-derived partition directories
    val fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())
    val era2 = fs.listStatus(new Path(s"$wh/db/t/data/era-2"))
      .map(_.getPath.getName).filter(_.contains("="))
    assert(era2.nonEmpty && era2.forall(_.startsWith("_p_day_")),
      s"the CTAS batch must lay out under the declared days(ts) spec: ${era2.toSeq}")
    // later INSERTs use the same spec; the content composes
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ctas_rest").collect(): Unit
    assert(canon(spark.sql(s"SELECT * FROM $cat.db.t")) == canon(ev))
    // duplicate CREATE refuses; the empty pre-CTAS snapshot reads as zero rows
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.t (x INT)").collect()
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t VERSION AS OF 1")
      .head().getLong(0) == 0L)
    // bare CREATE TABLE: durable, empty, writable
    spark.sql(s"CREATE TABLE $cat.db.e (x INT, y STRING)").collect(): Unit
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.e").head().getLong(0) == 0L)
    spark.sql(s"INSERT INTO $cat.db.e VALUES (1, 'a'), (2, 'b')").collect(): Unit
    assert(canon(spark.sql(s"SELECT * FROM $cat.db.e")) == Seq("[1,a]", "[2,b]"))
  }
}
