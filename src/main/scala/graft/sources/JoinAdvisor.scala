package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** NDV-informed join-strategy advice from the stats layer — the planning
  * face of the ANALYZE pass (cf. Iceberg's Puffin NDV blobs feeding engine
  * CBOs): pick a dimension side's join hint from MANIFEST facts (bytes,
  * per-file NDV fold) BEFORE any runtime row is seen, where AQE can only
  * re-plan after the first shuffle has already been paid and Spark's own
  * static decision sees raw bytes only.
  *
  * What NDV buys over bytes alone: a wide dimension can be far over the
  * broadcast byte ceiling while its JOIN KEY set is tiny — exactly the case
  * for a semi/anti-shaped probe, where broadcasting the DISTINCT key
  * projection (keys only, deduplicated) is cheap and skips the shuffle that
  * both merge and shuffle-hash pay. The byte ceiling alone can't see that;
  * the analyze-pass NDV can.
  *
  * Advice ladder for the BUILD side of an equi-join, most to least
  * aggressive, each step licensed only by a manifest fact (no guesses —
  * missing stats fall through to the next rung):
  *   1. `Broadcast` — total data bytes within `broadcastMaxBytes`.
  *   2. `BroadcastDistinctKeys` — bytes too big, but every key column is
  *      analyzed and the NDV upper bound (sum of per-file NDVs — distinct
  *      sets at most union) times a conservative per-key width fits the
  *      ceiling. The caller joins against `df.select(keys).distinct()`
  *      hinted broadcast — [[hinted]] does this when the probe is
  *      key-only; a full-row join gets `ShuffleHash` instead (the rows
  *      must ship regardless, but a bounded build side licenses the
  *      hash build over the sort).
  *   3. `ShuffleHash` — row count (exact, from the manifest fold) within
  *      `maxBuildRows`: the hash table fits, skip both sides' sorts.
  *   4. `Merge` — no manifest proof of a bounded build: sort-merge, the
  *      strategy that never blows memory.
  */
object JoinAdvisor {

  sealed trait Advice
  case object Broadcast extends Advice
  case object BroadcastDistinctKeys extends Advice
  case object ShuffleHash extends Advice
  case object Merge extends Advice

  /** Manifest-only facts for the table at `dir`: (data bytes, exact row
    * count if every file is listed, NDV upper bound per analyzed column). */
  private def facts(spark: SparkSession, dir: String)
      : (Long, Option[Long], Map[String, Long]) = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = FileStats.dataBytes(fs, root)
    FileStats.stats(spark, dir) match {
      case None => (bytes, None, Map.empty)
      case Some(manifest) =>
        val recs = manifest.values.toSeq
        val rows = Some(recs.map(_.rows).sum)
        val cols = recs.flatMap(_.cols.keys).distinct
        val ndvHi = cols.flatMap { c =>
          val per = recs.map(_.cols.get(c).flatMap(_.ndv))
          // upper bound only when EVERY file carries an analyzed count
          if (per.nonEmpty && per.forall(_.isDefined))
            Some(c -> per.flatten.sum)
          else None
        }.toMap
        (bytes, rows, ndvHi)
    }
  }

  /** Conservative serialized width of one key value in a broadcast hash
    * relation (covers long/decimal keys and short strings with overhead). */
  private val KeyWidthBytes = 64L

  /** Advice for building the join against the table at `dir` on `keys`. */
  def advise(spark: SparkSession, dir: String, keys: Seq[String],
      broadcastMaxBytes: Long = 10L << 20,
      maxBuildRows: Long = 8L << 20): Advice = {
    require(keys.nonEmpty, "advise needs at least one join key")
    val (bytes, rows, ndvHi) = facts(spark, dir)
    if (bytes <= broadcastMaxBytes) Broadcast
    else {
      val keyNdvs = keys.map(ndvHi.get)
      val distinctFits = keyNdvs.forall(_.isDefined) &&
        keyNdvs.flatten.sum * KeyWidthBytes <= broadcastMaxBytes
      if (distinctFits) BroadcastDistinctKeys
      else if (rows.exists(_ <= maxBuildRows)) ShuffleHash
      else Merge
    }
  }

  /** The advised build-side frame for a FULL-ROW equi-join: the table read
    * from `dir` with the advice applied as a hint. BroadcastDistinctKeys
    * degrades here — full-row joins must ship the rows — but only to
    * ShuffleHash when the manifest ROW count is itself within
    * `maxBuildRows`: the NDV bound licenses broadcasting distinct KEYS, not
    * holding every row in a hash build, and a wide table with a tiny key
    * set can still carry an unbounded row count. Past the row budget it
    * falls to Merge, the rung that never blows memory. Use
    * [[distinctKeysFrame]] for semi/anti-shaped probes where only key
    * membership matters. */
  def hinted(spark: SparkSession, dir: String, df: DataFrame,
      keys: Seq[String],
      broadcastMaxBytes: Long = 10L << 20,
      maxBuildRows: Long = 8L << 20): DataFrame =
    advise(spark, dir, keys, broadcastMaxBytes, maxBuildRows) match {
      case Broadcast => df.hint("broadcast")
      case BroadcastDistinctKeys =>
        val (_, rows, _) = facts(spark, dir)
        if (rows.exists(_ <= maxBuildRows)) df.hint("shuffle_hash")
        else df.hint("merge")
      case ShuffleHash => df.hint("shuffle_hash")
      case Merge => df.hint("merge")
    }

  /** The key-independent rung for materialization READ-BACKS (the automatic
    * wiring [[graft.pipeline.DagRunner]] applies to every stats-carrying
    * model it materializes): hint broadcast iff the manifest bytes fit the
    * ceiling, otherwise return the frame unhinted and let the planner
    * decide. Dimension-sized models then take the broadcast strategy in
    * every downstream mart join without the model author placing hints —
    * and a fact-sized model is never force-broadcast, because the decision
    * is a manifest fact, not a guess. Key-specific rungs (NDV) stay opt-in
    * via [[hinted]]/[[distinctKeysFrame]]. */
  def autoHinted(spark: SparkSession, dir: String, df: DataFrame,
      broadcastMaxBytes: Long = 10L << 20): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    autoHintedBytes(df, FileStats.dataBytes(fs, root), broadcastMaxBytes)
  }

  /** [[autoHinted]] for callers that already hold the LIVE byte count — a
    * versioned table prices at [[VersionedHiddenTable.liveDataBytes]] (the
    * latest snapshot's eras + masks), never at its whole `data/` tree,
    * which grows one retired era per overwrite run and would silently cost
    * a dimension-sized model its broadcast hint. */
  def autoHintedBytes(df: DataFrame, liveBytes: Long,
      broadcastMaxBytes: Long = 10L << 20): DataFrame =
    if (liveBytes <= broadcastMaxBytes) df.hint("broadcast") else df

  /** The advised probe frame for a SEMI/ANTI-shaped membership join: the
    * distinct key projection, broadcast when the NDV bound licenses it. */
  def distinctKeysFrame(spark: SparkSession, dir: String, df: DataFrame,
      keys: Seq[String],
      broadcastMaxBytes: Long = 10L << 20): DataFrame = {
    val keyFrame = df.select(keys.map(org.apache.spark.sql.functions.col): _*)
      .distinct()
    advise(spark, dir, keys, broadcastMaxBytes) match {
      case Broadcast | BroadcastDistinctKeys =>
        org.apache.spark.sql.functions.broadcast(keyFrame)
      case _ => keyFrame
    }
  }
}
