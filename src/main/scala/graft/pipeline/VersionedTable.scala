package graft.pipeline

import java.io.File
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

  def versions(tableDir: String): Seq[Long] =
    Option(new File(tableDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong).sorted.toSeq

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
  def bytes(tableDir: String, version: Long): Long =
    Option(new File(s"$tableDir/v=$version").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length).sum

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
    * and move the token directory into the `v=` namespace with one rename.
    * Returns the published version id. */
  def publish(tableDir: String, token: String): Long = publishLock.synchronized {
    val from = new File(stagingDir(tableDir, token))
    require(from.isDirectory, s"no staged candidate '$token' under $tableDir")
    val v = versions(tableDir).lastOption.fold(0L)(_ + 1)
    val to = new File(s"$tableDir/v=$v")
    require(from.renameTo(to), s"atomic publish rename failed for '$token'")
    v
  }

  /** Drop a staged candidate that failed its audit. */
  def abort(tableDir: String, token: String): Unit = {
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new File(stagingDir(tableDir, token)))
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
      new File(stagingDir(tableDir, token), s"_batch-$id").createNewFile(): Unit
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
  def publishedBatchIds(tableDir: String): Set[String] =
    Option(new File(tableDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .flatMap(v => Option(v.listFiles()).getOrElse(Array.empty))
      .filter(_.getName.startsWith("_batch-"))
      .map(_.getName.stripPrefix("_batch-")).toSet

  /** Time-based snapshot expiry — the `expire_snapshots(older_than)`
    * maintenance face, complementing the count-based [[vacuum]]: retire
    * every version whose publish time (directory mtime) is older than
    * `olderThanMillis`, ALWAYS retaining at least the newest `keepLast`
    * regardless of age (a quiet table must never expire its only data).
    * Returns the removed version ids. Time travel window = versions newer
    * than the horizon, exactly the retention contract a lakehouse table
    * service runs on a schedule. */
  def expireSnapshots(tableDir: String, olderThanMillis: Long,
      keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "must retain at least the newest version")
    val vs = versions(tableDir)
    val protectedIds = vs.takeRight(keepLast).toSet
    val drop = vs.filter { v =>
      !protectedIds(v) &&
        new File(s"$tableDir/v=$v").lastModified() < olderThanMillis
    }
    drop.foreach { v =>
      def rm(f: File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new File(s"$tableDir/v=$v"))
    }
    drop
  }

  /** Delete all but the newest `keep` versions; returns what was removed. */
  def vacuum(tableDir: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must retain at least the newest version")
    val vs = versions(tableDir)
    val drop = vs.dropRight(keep)
    drop.foreach { v =>
      def rm(f: File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new File(s"$tableDir/v=$v"))
    }
    drop
  }
}
