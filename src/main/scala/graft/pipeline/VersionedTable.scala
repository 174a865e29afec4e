package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table protocol shared by the streaming merge/SCD2 sinks
  * and batch maintenance: each write lands a complete `v=<n>` directory, so
  * readers never observe a partial table and a retried writer rebuilds its
  * own version deterministically. This is the manual core of what a
  * transactional table format keeps in a commit log; at 100 TB the version
  * list would live in a metastore, not a directory listing.
  *
  * Maintenance mirrors the table-format operations a long-lived merge table
  * needs:
  *   - [[compact]]: many-small-files versions (the steady state of frequent
  *     micro-batch merges) are rewritten into a target file count as a NEW
  *     version — readers of older versions are untouched;
  *   - [[vacuum]]: retire all but the newest `keep` versions (time-travel
  *     window = what vacuum has not yet reclaimed);
  *   - [[read]]: latest or any still-retained version (time travel).
  */
object VersionedTable {

  // Every filesystem touch resolves through the Hadoop FileSystem of the
  // path's scheme — a java.io.File check on an hdfs:// or s3a:// tableDir is
  // silently always-false/always-empty, which turns the replay-idempotency
  // guard (publishedBatchIds) into a no-op and re-publishes replayed batches
  // (duplicate rows). Same discipline as Tables.successMarkerExists.
  private def fsFor(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(SparkSession.active.sessionState.newHadoopConf()), p)
  }

  /** Children of `dir`, or empty when it does not exist yet. */
  private def ls(fs: FileSystem, dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    try fs.listStatus(dir).toSeq
    catch { case _: java.io.FileNotFoundException => Seq.empty }

  def versions(tableDir: String): Seq[Long] = {
    val (fs, root) = fsFor(tableDir)
    ls(fs, root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
  }

  /** Latest version, or a specific retained one (time travel). */
  def read(spark: SparkSession, tableDir: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(tableDir)
    require(vs.nonEmpty, s"no versions under $tableDir")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not retained (have ${vs.mkString(",")})")
    spark.read.parquet(s"$tableDir/v=$v")
  }

  /** Rewrite the latest version into `targetFiles` files as a new version.
    * Returns the new version id. A distributed run would size targetFiles
    * from bytes/128MB; the rewrite is one narrow repartition — no shuffle
    * key, so AQE-planned round-robin.
    *
    * The rewrite stages + publishes through the WAP path, so the version id
    * is allocated under [[publishLock]] at publish time — a concurrent
    * publish and compaction can never collide on the same `v=<n>` (each
    * gets the next id in commit order), and readers never observe a
    * partially-written compacted version. */
  def compact(spark: SparkSession, tableDir: String, targetFiles: Int): Long = {
    val vs = versions(tableDir)
    require(vs.nonEmpty, s"no versions under $tableDir")
    val token = stage(spark, tableDir,
      spark.read.parquet(s"$tableDir/v=${vs.max}").repartition(targetFiles))
    publish(tableDir, token)
  }

  /** Data bytes of one version (sum of its parquet part files). */
  def bytes(tableDir: String, version: Long): Long = {
    val (fs, _) = fsFor(tableDir)
    ls(fs, new Path(s"$tableDir/v=$version"))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }

  /** Size-targeted compaction, optionally CLUSTERING the rewrite: file count
    * is derived from the version's actual bytes / `targetBytes` (the
    * bytes-over-128MB sizing a table service does), and when `clusterBy` is
    * given the rewrite range-partitions + sorts on those columns — so each
    * output file covers a narrow key range and parquet footer min/max
    * statistics prune file-level reads for key predicates (the poor man's
    * Z-order, exactly right for single-column locality). Returns the new
    * version id. */
  def compactBySize(spark: SparkSession, tableDir: String, targetBytes: Long,
      clusterBy: Seq[String] = Nil): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    val vs = versions(tableDir)
    require(vs.nonEmpty, s"no versions under $tableDir")
    val total = bytes(tableDir, vs.max)
    val nFiles = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(s"$tableDir/v=${vs.max}")
    val shaped =
      if (clusterBy.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles,
          clusterBy.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(clusterBy.head,
          clusterBy.tail: _*)
    // version id allocated at publish under publishLock, like compact()
    publish(tableDir, stage(spark, tableDir, shaped))
  }

  // ---- write-audit-publish (WAP) ---------------------------------------------
  // The staged-commit pattern a transactional format gives via branch/tag
  // metadata: a batch lands COMPLETELY in a staging area invisible to
  // readers, quality audits run against the staged data, and only a passing
  // batch is published — by a single atomic directory rename, the same
  // "pointer swap is the commit" rule the v= protocol already relies on.
  // Readers therefore never see an unaudited row, and a failed audit leaves
  // no trace but the returned violations.
  //
  // Concurrency: each staged candidate lives under a UNIQUE token directory
  // (never shared, so two writers cannot clobber each other's staged bytes
  // or audit the wrong batch), and the version NUMBER is allocated only at
  // publish time under [[publishLock]] — the Iceberg discipline, where a
  // staged snapshot's commit order is decided at commit, not at write. On a
  // real cluster the lock's job is done by the metastore's atomic
  // check-and-swap; the rename is already atomic per filesystem.

  private val publishLock = new Object
  private val stageSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private def stagingDir(tableDir: String, token: String) =
    s"$tableDir/_staging/$token"

  /** The staged candidate's directory — for writers that enrich a staged
    * version BEFORE publish (e.g. landing a `_file_stats.json` manifest so
    * it rides the atomic publish rename; `_`-prefixed names are invisible
    * to readers). */
  def stagedPath(tableDir: String, token: String): String =
    stagingDir(tableDir, token)

  /** Land `df` as a complete STAGED candidate (invisible to [[read]]/
    * [[versions]]); returns the staging token. */
  def stage(spark: SparkSession, tableDir: String, df: DataFrame): String = {
    val token = s"w${stageSeq.incrementAndGet()}-${System.nanoTime()}"
    df.write.parquet(stagingDir(tableDir, token)) // errorifexists: token unique
    token
  }

  /** Read a staged (unpublished) candidate — the audit's input. */
  def readStaged(spark: SparkSession, tableDir: String, token: String): DataFrame =
    spark.read.parquet(stagingDir(tableDir, token))

  /** Atomically publish a staged candidate: allocate the next version id
    * and move the token directory into the `v=` namespace with one rename
    * (atomic on POSIX and HDFS; an object store without atomic rename needs
    * its committer's equivalent). Returns the published version id. */
  def publish(tableDir: String, token: String): Long = publishLock.synchronized {
    val (fs, _) = fsFor(tableDir)
    val from = new Path(stagingDir(tableDir, token))
    require(fs.exists(from) && fs.getFileStatus(from).isDirectory,
      s"no staged candidate '$token' under $tableDir")
    val v = versions(tableDir).lastOption.fold(0L)(_ + 1)
    require(fs.rename(from, new Path(s"$tableDir/v=$v")),
      s"atomic publish rename failed for '$token'")
    v
  }

  /** Drop a staged candidate that failed its audit. */
  def abort(tableDir: String, token: String): Unit = {
    val (fs, _) = fsFor(tableDir)
    fs.delete(new Path(stagingDir(tableDir, token)), true): Unit
  }

  /** The full WAP cycle: stage `df`, run `audit` against the STAGED read
    * (audits see exactly the bytes readers would), publish iff the audit
    * returns no violations, abort otherwise. Returns the published version
    * (Right) or the violation messages (Left) — the caller decides whether
    * a rejected batch is a retry or an alert.
    *
    * `batchId` (optional) tags the staged candidate with an
    * `_batch-<id>` marker file BEFORE publish, so the marker rides the
    * atomic publish rename into the `v=<n>` directory — marker and commit
    * are one filesystem operation. Replay guards should test
    * [[publishedBatchIds]]; a separately-written post-publish marker would
    * leave a crash window in which a published batch looks unpublished and
    * gets re-published on restart (duplicate rows). Spark's parquet reader
    * ignores `_`-prefixed files, so the marker never pollutes the data. */
  def writeAuditPublish(spark: SparkSession, tableDir: String, df: DataFrame,
      batchId: Option[String] = None)(
      audit: DataFrame => Seq[String]): Either[Seq[String], Long] = {
    val token = stage(spark, tableDir, df)
    batchId.foreach { id =>
      require(!id.contains('/'), s"batch id must be a file-name-safe token: '$id'")
      val (fs, _) = fsFor(tableDir)
      fs.create(new Path(stagingDir(tableDir, token), s"_batch-$id"), true).close()
    }
    val violations = try audit(readStaged(spark, tableDir, token))
    catch { case e: Throwable => abort(tableDir, token); throw e }
    if (violations.isEmpty) Right(publish(tableDir, token))
    else { abort(tableDir, token); Left(violations) }
  }

  /** Batch ids of all PUBLISHED versions (from their `_batch-<id>` markers).
    * The replay-idempotency test for [[writeAuditPublish]] callers: a batch
    * id appears here iff its publish rename committed, with no window in
    * which a published batch is missing its marker. Scan cost is one listing
    * per retained version — version-count-bounded, not data-bounded. */
  def publishedBatchIds(tableDir: String): Set[String] = {
    val (fs, root) = fsFor(tableDir)
    ls(fs, root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .flatMap(v => ls(fs, v.getPath))
      .map(_.getPath.getName)
      .filter(_.startsWith("_batch-"))
      .map(_.stripPrefix("_batch-")).toSet
  }

  /** Time-based snapshot expiry — the `expire_snapshots(older_than)`
    * maintenance face, complementing the count-based [[vacuum]]: retire
    * every version whose publish time (directory mtime) is before the
    * ABSOLUTE cutoff instant `horizonEpochMillis` (epoch millis — pass
    * `System.currentTimeMillis() - age`, not an age; the name says what the
    * value is so an age passed by mistake fails the signature review, not
    * silently expires nothing), ALWAYS retaining at least the newest
    * `keepLast` regardless of age (a quiet table must never expire its only
    * data). Returns the removed version ids. Time travel window = versions
    * newer than the horizon, exactly the retention contract a lakehouse
    * table service runs on a schedule. */
  def expireSnapshots(tableDir: String, horizonEpochMillis: Long,
      keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "must retain at least the newest version")
    val (fs, _) = fsFor(tableDir)
    val vs = versions(tableDir)
    val protectedIds = vs.takeRight(keepLast).toSet
    val drop = vs.filter { v =>
      !protectedIds(v) &&
        fs.getFileStatus(new Path(s"$tableDir/v=$v"))
          .getModificationTime < horizonEpochMillis
    }
    drop.foreach(v => fs.delete(new Path(s"$tableDir/v=$v"), true): Unit)
    drop
  }

  /** Delete all but the newest `keep` versions; returns what was removed. */
  def vacuum(tableDir: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must retain at least the newest version")
    val (fs, _) = fsFor(tableDir)
    val drop = versions(tableDir).dropRight(keep)
    drop.foreach(v => fs.delete(new Path(s"$tableDir/v=$v"), true): Unit)
    drop
  }
}
