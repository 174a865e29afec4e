package graft.sources

import org.apache.spark.sql.SparkSession

/** The scheduled table service — the operational loop a 100 TB deployment
  * runs against every [[VersionedHiddenTable]] (Iceberg deployments run the
  * same pair as `rewrite_data_files` + `expire_snapshots` jobs): the DML
  * path deliberately defers ALL rewriting (merge-on-read masks, one era per
  * commit), so something scheduled must fold the fragmentation back down,
  * and something must retire history — without ever touching a table that
  * doesn't need it.
  *
  * [[maintain]] is policy, not mechanism: it reads the latest snapshot's
  * FRAGMENTATION (live era count, equality-delete file count) from the
  * manifest alone — no data scan — and only when a threshold is exceeded
  * pays one [[VersionedHiddenTable.compact]] (clustered if the policy says
  * so, which is what turns an append-ordered table into a stats-skippable
  * one). Retention then runs age-based ([[VersionedHiddenTable.expireSnapshots]])
  * or count-based ([[VersionedHiddenTable.vacuum]]); [[VersionedHiddenTable.tag]]
  * pins survive either. Admin-serialized like the operations it composes;
  * concurrent WRITERS are protected the same way they are against a manual
  * compact: publish-rename atomicity, the staging grace window for
  * staged-but-unpublished snapshots, and the same window applied to
  * never-referenced data directories — an era a concurrent appender is
  * still filling (its write deliberately runs outside any lock) is younger
  * than the grace and survives the GC as an in-flight claim.
  */
object TableService {

  /** What one maintenance pass did — a log line, not a result set. */
  final case class Report(
      tableDir: String,
      liveEras: Int,
      delFiles: Int,
      compacted: Boolean,
      droppedSnapshots: Seq[Long],
      latestVersion: Long)

  /** Maintenance policy knobs. `clusterBy` non-empty makes every policy
    * compaction a clustered rewrite (sorted, size-targeted files — the
    * layout [[StatsFileSkipping]] monetizes). `expireOlderThanMs` set runs
    * age-based retention; otherwise count-based with `keepSnapshots`. */
  final case class Policy(
      maxLiveEras: Int = 16,
      maxDelFiles: Int = 4,
      clusterBy: Seq[String] = Nil,
      targetBytes: Long = 128L << 20,
      keepSnapshots: Int = 3,
      expireOlderThanMs: Option[Long] = None,
      stagingGraceMs: Long = 20L * 60 * 1000)

  /** One maintenance pass: compact iff fragmented, then retire history.
    * Reads only manifests to decide — an already-tidy table costs a few
    * file stats, which is what makes running this over thousands of tables
    * on a schedule viable. Returns what happened. */
  def maintain(spark: SparkSession, tableDir: String,
      policy: Policy = Policy()): Report = {
    val VHT = VersionedHiddenTable
    val vs = VHT.versions(spark, tableDir)
    require(vs.nonEmpty, s"no snapshots under $tableDir")
    val (eras, dels) = VHT.snapshot(spark, tableDir, vs.max)
    val live = eras.count(e =>
      HiddenPartitioning.eraHasData(spark, s"$tableDir/data/$e"))
    val fragmented = live > policy.maxLiveEras || dels.size > policy.maxDelFiles
    if (fragmented)
      VHT.compact(spark, tableDir, policy.clusterBy, policy.targetBytes): Unit
    val dropped = policy.expireOlderThanMs match {
      case Some(age) => VHT.expireSnapshots(spark, tableDir, age,
        policy.keepSnapshots, policy.stagingGraceMs)
      case None => VHT.vacuum(spark, tableDir, policy.keepSnapshots,
        policy.stagingGraceMs)
    }
    Report(tableDir, live, dels.size, fragmented, dropped,
      VHT.versions(spark, tableDir).max)
  }
}
