package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage discipline for iterative algorithms (connected components,
  * PageRank, label propagation, BFS): each round's state must be CUT, or
  * the logical plan embeds one copy of the previous round per reference —
  * a state frame referenced twice per round grows the plan O(2^rounds) and
  * hangs the driver long before any data moves.
  *
  * [[cut]] materializes eagerly and truncates lineage: by `localCheckpoint`
  * (executor-local blocks) by default, or by a RELIABLE `checkpoint` when
  * `spark.graft.checkpointDir` is set — on a real cluster localCheckpoint
  * blocks die with their executor mid-job, so a production run points the
  * knob at durable storage (HDFS/S3) and every round's cut survives
  * executor loss. Hoisted from `CorpusOps.connectedComponents` so every
  * iterative operator shares one discipline instead of re-deriving it.
  */
object Lineage {

  private def reliable(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.checkpointDir").map { dir =>
      if (spark.sparkContext.getCheckpointDir.isEmpty ||
          !spark.sparkContext.getCheckpointDir.exists(_.startsWith(dir)))
        spark.sparkContext.setCheckpointDir(dir)
      dir
    }.isDefined

  /** Eagerly materialize `df` with truncated lineage (see object doc). */
  def cut(df: DataFrame): DataFrame =
    if (reliable(df.sparkSession)) df.checkpoint() else df.localCheckpoint()

  /** LAZY cut: lineage truncates, but materialization happens as a side
    * effect of the caller's next action instead of a dedicated job — for
    * round state that is referenced once per consumer and whose first
    * consumer is a full scan (a checksum/stats collect), this saves one
    * job per round over [[cut]]. The caller must guarantee that first
    * action computes every partition (an aggregate does; a limit/head may
    * not), or later consumers re-run the uncheckpointed partitions. */
  def cutLazy(df: DataFrame): DataFrame =
    if (reliable(df.sparkSession)) df.checkpoint(false) else df.localCheckpoint(false)
}
