package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.VersionedHiddenTable

/** Streaming CDC source over a [[graft.sources.VersionedHiddenTable]]'s
  * changelog — the consumption face Iceberg/Delta expose as
  * `spark.readStream.format(...)`: each micro-batch is the net row-level
  * change feed of the snapshot steps published since the last batch (the
  * same era-aware `changes()` arms the batch consumers i11/i12 poll), so an
  * incremental downstream aggregate stays current WITHOUT polling and
  * WITHOUT rescanning the table.
  *
  * {{{
  *   spark.readStream.format("graft-changelog")
  *     .option("startingVersion", 0)       // fold-from base (default: latest at start)
  *     .option("maxVersionsPerTrigger", 5) // backpressure (default: unbounded)
  *     .load(tableDir)
  * }}}
  *
  * Offsets are snapshot VERSIONS — exactly the published commit points, so
  * the offset checkpoint a consumer holds is the same token the batch
  * consumers pass to `changes(from, to)`; a batch covers `(from, to]`.
  * Exactly-once composition: the offset log records each batch's version
  * range before it runs and replays the SAME range on restart, so a
  * transactional sink (e.g. [[graft.sources.VersionedHiddenTable.append]]
  * with the batchId replay guard, the st8 discipline) makes the pipeline
  * end-to-end exactly-once.
  *
  * Backpressure (`maxVersionsPerTrigger`): a consumer resuming after a long
  * gap must not plan one giant union over every missed commit —
  * [[ChangelogSource.latestOffset]] caps each micro-batch at N snapshot
  * steps, so the catch-up runs as a sequence of bounded plans (each further
  * pruned by `changes()`'s no-op-step elision). Implemented through
  * [[SupportsAdmissionControl]] — honored by every trigger mode including
  * `Trigger.AvailableNow` (the [[SupportsTriggerAvailableNow]] face pins the
  * catch-up target at stream start, Kafka's own pattern).
  *
  * Retention race: a consumer whose checkpointed version has been retired by
  * `expireSnapshots`/`vacuum` FAILS LOUDLY on its next batch — `changes()`
  * refuses an unretained `from` — rather than silently emitting a gapped
  * feed; the operator's cure is a rebuild from a snapshot read (the same
  * contract as Delta's `versionAsOf` past retention). Schema is pinned at
  * stream start (the canonical schema of the then-latest snapshot plus the
  * `_change_type`/`_commit_version` meta columns); add-only evolution keeps
  * older checkpoints readable because `changes()` null-fills narrower steps.
  */
object ChangelogStream {

  val FormatName = "graft-changelog"

  /** The stream's fixed schema for `tableDir`: source columns of the latest
    * MAIN snapshot plus the two CDC meta columns — derived from a plan-only
    * zero-step `changes()` frame (no data scan). The feed is a main-lineage
    * contract, so schema (like every offset) resolves along `mainVersions()`
    * — a branch commit that happens to be the newest snapshot must not leak
    * into the stream's identity. */
  def schemaFor(spark: SparkSession, tableDir: String): StructType = {
    val vs = VersionedHiddenTable.mainVersions(spark, tableDir)
    require(vs.nonEmpty, s"$FormatName: no main-lineage snapshots under $tableDir")
    val latest = vs.max
    VersionedHiddenTable.changes(spark, tableDir, latest, Some(latest)).schema
  }

  /** Convenience reader: `changelog(spark, dir, startingVersion = Some(0))`. */
  def changelog(spark: SparkSession, tableDir: String,
      startingVersion: Option[Long] = None,
      maxVersionsPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.format(FormatName)
    startingVersion.foreach(v => r.option("startingVersion", v))
    maxVersionsPerTrigger.foreach(n => r.option("maxVersionsPerTrigger", n))
    r.load(tableDir)
  }
}

/** V1 `StreamSourceProvider` face (the `Source`-returning registration Delta
  * Lake itself uses): the one streaming API whose batches may be ARBITRARY
  * DataFrames — which is exactly what the changelog needs, since a CDC step
  * is a pruned union of era diffs and mask semi-joins, not a file listing a
  * DSv2 `InputPartition` could carry. */
class ChangelogSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = ChangelogStream.FormatName

  private def tableDir(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      s"${ChangelogStream.FormatName}: .load(<versioned table dir>) is required"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (ChangelogStream.FormatName,
      schema.getOrElse(ChangelogStream.schemaFor(
        sqlContext.sparkSession, tableDir(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val dir = tableDir(parameters)
    // every version the stream resolves is a MAIN-lineage version: branch
    // commits share the v=<n> id space but are invisible to the changelog,
    // so admitting one here would poison the offset checkpoint (getBatch's
    // changes() would refuse it on every retry, permanently wedging the
    // stream)
    val vs = VersionedHiddenTable.mainVersions(spark, dir)
    require(vs.nonEmpty,
      s"${ChangelogStream.FormatName}: no main-lineage snapshots under $dir")
    // parse only — validation is LAZY (first fresh-checkpoint trigger, see
    // ChangelogSource.requireStartingRetained): a restart whose checkpoint
    // has advanced past an expired startingVersion must keep running
    val starting = parameters.get("startingVersion").map {
      case "earliest" => vs.min
      case v => v.toLong
    }.getOrElse(vs.max) // default: only commits published AFTER stream start
    val maxPerTrigger = parameters.get("maxVersionsPerTrigger").map(_.toInt)
    maxPerTrigger.foreach(n => require(n > 0,
      s"maxVersionsPerTrigger must be positive, got $n"))
    new ChangelogSource(spark, dir, starting,
      schema.getOrElse(ChangelogStream.schemaFor(spark, dir)), maxPerTrigger)
  }
}

/** One streaming source instance: offsets are snapshot versions; batch
  * `(from, to]` is `VersionedHiddenTable.changes(from, Some(to))` verbatim —
  * era-aware, no-op-pruned, stats-bounded, the SAME plan the batch
  * consumers get, so stream-fold == poll-fold == rebuild by construction. */
class ChangelogSource(spark: SparkSession, tableDir: String,
    startingVersion: Long, schema0: StructType, maxPerTrigger: Option[Int])
  extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  /** Both LongOffset and checkpoint-replayed SerializedOffset carry the
    * version as their json body. */
  private def ver(o: OffsetV2): Long = o.json.toLong

  /** Retained MAIN versions, sorted — the only id space offsets live in. */
  private def mainVs: Seq[Long] = {
    val vs = VersionedHiddenTable.mainVersions(spark, tableDir)
    require(vs.nonEmpty, s"no main-lineage snapshots under $tableDir")
    vs
  }

  private def tableLatest: Long = mainVs.max

  /** Fresh-checkpoint guard, BEFORE the first offset lands in the log: a
    * startingVersion that is expired — or a BRANCH id (branch commits share
    * the v=<n> space but are invisible to the main changelog) — must refuse
    * here, not after latestOffset has written an offset the every-retry
    * `changes()` refusal would permanently wedge. Restarts never hit this:
    * a checkpointed stream passes its committed offset as `start`. */
  private def requireStartingRetained(): Unit = {
    val vs = mainVs
    require(vs.contains(startingVersion),
      s"startingVersion=$startingVersion is not retained on the main " +
        s"lineage (have ${vs.mkString(",")})")
  }

  // Trigger.AvailableNow pins the catch-up target ONCE at stream start;
  // commits published during the drain belong to the next run
  @volatile private var availableNowCap: Option[Long] = None

  override def schema: StructType = schema0

  override def initialOffset(): OffsetV2 = {
    requireStartingRetained()
    LongOffset(startingVersion)
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(tableLatest)

  override def getDefaultReadLimit: ReadLimit =
    // versions-per-trigger rides the maxRows limit shape, the same carrier
    // Kafka uses for maxOffsetsPerTrigger (the unit is the source's own)
    maxPerTrigger.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    // the engine passes null before any batch has committed (first trigger
    // of a fresh checkpoint): advance from the configured starting version,
    // validating it NOW — the last moment before an offset derived from it
    // is written to the checkpoint log
    val from = Option(start).map(ver).getOrElse {
      requireStartingRetained()
      startingVersion
    }
    val cap = availableNowCap.getOrElse(tableLatest)
    // advance ALONG the retained main-version list, never by id arithmetic:
    // branch commits interleave in the shared id space and expireSnapshots
    // with tag/branch pins can leave mid-range gaps, so `from + n` may name
    // a branch or unretained id that getBatch's changes() would refuse
    val steps = mainVs.filter(v => v > from && v <= cap)
    val to = limit match {
      case r: ReadMaxRows =>
        steps.take(math.min(r.maxRows(), Int.MaxValue.toLong).toInt)
          .lastOption.getOrElse(from)
      case _ => steps.lastOption.getOrElse(from)
    }
    LongOffset(math.max(from, to))
  }

  override def reportLatestOffset(): OffsetV2 = LongOffset(tableLatest)

  /** Legacy (non-admission-control) polling face; unbounded. */
  override def getOffset: Option[Offset] = Some(LongOffset(tableLatest))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(o => ver(o)).getOrElse(startingVersion)
    val to = ver(end)
    // from == to is legal and yields the schema-correct empty feed.
    // `changes` refuses an unretained `from`: a consumer older than the
    // retention window fails LOUDLY here instead of emitting a gapped feed.
    // The result is re-marked isStreaming (the V1 getBatch contract) over
    // its own execution RDD — lazy, distributed, plan unchanged.
    org.apache.spark.sql.graftbridge.GraftSqlBridge.asStreaming(spark,
      VersionedHiddenTable.changes(spark, tableDir, from, Some(to)))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"ChangelogSource[$tableDir, starting=$startingVersion, " +
      s"maxVersionsPerTrigger=${maxPerTrigger.getOrElse(-1)}]"
}
