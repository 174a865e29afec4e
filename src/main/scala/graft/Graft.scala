package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: one call wires a SparkSession the way every
  * graft surface expects it — custom operators (as-of / band join
  * strategies), native functions (`graft_dot`/`graft_cosine`) and the
  * vector-fold optimizer rule injected via `GraftExtensions`, UTC session
  * time (the oracle-compare convention), AQE on, and shuffle parallelism
  * sized to the machine instead of Spark's legacy 200.
  *
  * A SQL-first user then calls [[openCorpus]] to expose the corpus tables
  * as views and works entirely through `spark.sql(...)`; a DataFrame user
  * reaches the same operators through [[SparkEntry.queries]] or the
  * operator packs directly. On a cluster, set
  * `spark.sql.extensions=graft.functions.GraftExtensions` instead of
  * calling [[session]] — everything else is identical.
  */
object Graft {

  /** Build (or reuse) a session with the graft wiring applied. */
  def session(master: String = "local[*]",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val cores = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // INT64 micros, not Spark's legacy INT96: INT96 is deprecated in the
      // parquet spec, carries NO usable min/max stats (undefined column
      // order), and every lakehouse table format forbids it — with micros,
      // [[graft.sources.StatsFileSkipping]] can prune files on timestamp
      // predicates. Values read back identically either way.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
      .getOrCreate()
    // extensions only apply to a NEWLY built session; when getOrCreate
    // reuses one (tests, notebooks), fall back to session-local
    // registration so the function surface is present either way
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  /** Register every corpus table under its logical name so `spark.sql`
    * works against the data directory directly. */
  def openCorpus(spark: SparkSession, sfDir: String): Unit =
    graft.core.Tables.registerAll(spark, sfDir)
}
