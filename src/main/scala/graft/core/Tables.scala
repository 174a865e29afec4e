package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided corpus (`TESTDATA.md`): one parquet file per
  * table under `<sfDir>/<name>.parquet`.
  *
  * Reading straight from parquet keeps Catalyst's vectorized reader, column
  * pruning and filter pushdown on the scan path — at 100 TB the same code works
  * over a partitioned table root; nothing here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet's physical ts encoding varies by corpus generation:
    // TIMESTAMP(NANOS) (unsupported by Spark's reader — read nanos as long,
    // rebuild micros) or TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    // TIMESTAMP_NTZ). Normalize both to a session-UTC TIMESTAMP so every
    // consumer (unix_micros included) sees one type; sessions here run in
    // UTC, so the NTZ wall-clock reinterprets losslessly.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
    else df
  }

  /** Register every corpus table as a temp view (used by SQL-form queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Serializes registry-internal table writes to shared scratch paths
    * (x3/x4 partitioned orders, x6 z-order layout, i10/s12 round trips).
    * Queries may be BUILT concurrently on one session (ConcurrencySpec's
    * contract); two first-builders racing an `overwrite` of the same path
    * could interleave file commits. A JVM-wide lock is enough because the
    * scratch dir is per-JVM scratch, not cluster state. */
  val scratchWriteLock = new Object

  /** Run SQL against DataFrames registered under session-unique temp view
    * names, then drop the views. `spark.sql` analyzes eagerly, so the returned
    * DataFrame's plan no longer references the catalog entries — dropping them
    * immediately keeps registry query builders side-effect-free (no fixed-name
    * view collisions across concurrent builds or multi-dir sessions).
    *
    * `sqlFor` receives the logical-name → unique-name map and must splice the
    * unique names into the query text.
    */
  def sqlOn(spark: SparkSession, views: (String, DataFrame)*)(
      sqlFor: Map[String, String] => String): DataFrame =
    sqlOnArgs(spark, Map.empty[String, Any], views: _*)(sqlFor)

  /** [[sqlOn]] with named parameter markers: `args` binds each `:name` in the
    * text through `spark.sql(text, args)` (Spark 3.4+ parameterized SQL), so
    * serving-layer queries splice values as typed literals, never as string
    * interpolation. */
  def sqlOnArgs(spark: SparkSession, args: Map[String, Any],
      views: (String, DataFrame)*)(
      sqlFor: Map[String, String] => String): DataFrame = {
    val unique = views.map { case (n, _) =>
      n -> s"${n}_g${viewSeq.incrementAndGet()}"
    }.toMap
    views.foreach { case (n, df) => df.createOrReplaceTempView(unique(n)) }
    try {
      val text = sqlFor(unique)
      if (args.isEmpty) spark.sql(text) else spark.sql(text, args)
    } finally unique.values.foreach(v => spark.catalog.dropTempView(v))
  }
}
