package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** All-strings schema-on-read CSV/TSV sources with `"$path"`-derived metadata,
  * replicating the reference's external-table conventions:
  *
  *   - every raw column is a string (reference README.md:33-34 — "All fields
  *     are defined as strings"); typing happens in stage models via explicit
  *     casts, never via `inferSchema` (empty string must stay `''`, not null —
  *     models/stage/mapping/stg_mpd_player_id_map.sql:20-24);
  *   - rows carry `year`/`month`/`day`/`_ptkey`/`_filename`/`_loaddatetime`
  *     parsed from the file path, mirroring Athena's `"$path"` pseudo-column
  *     (models/source/fangraphs/src_fangraphs_projections_preseason_hitting.sql:8-14).
  *
  * Scale: the path layout is `feed/year=YYYY/month=M/day=D/file`; at 100 TB
  * the same layout gives Spark file-level partition pruning when the
  * latest-snapshot filter is pushed (the two-phase max+filter below reads the
  * listing twice but scans matching files once).
  */
object SourceReader {

  /** Read a feed as all-strings CSV. `recursiveFileLookup` intentionally
    * disables Hive-style partition *discovery*: the year/month/day values are
    * parsed from the path string, exactly like the reference's
    * `regexp_extract("$path", ...)`, and `''` survives as empty string. */
  def readCsv(spark: SparkSession, root: String, columns: Seq[String],
      sep: String = ","): DataFrame = {
    val schema = StructType(columns.map(c => StructField(c, StringType, nullable = true)))
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("recursiveFileLookup", "true")
      .option("emptyValue", "")
      .schema(schema)
      .csv(root)
      // Athena all-string externals have NO nulls: an empty CSV field is ''.
      // Spark's parser still nulls unquoted empties regardless of options,
      // so normalize — the id-map's `!= ''` tests depend on it
      // (models/stage/mapping/stg_mpd_player_id_map.sql:20-24).
      .na.fill("")
  }

  /** JSON-lines feed with an explicit schema and PERMISSIVE corrupt-record
    * capture: malformed lines land in `_corrupt_record` instead of killing
    * the job (at corpus scale a feed ALWAYS contains some), valid rows
    * parse typed. Schema is declared, never inferred — inference is a
    * second full scan and locks in whatever the sample happened to contain.
    * Composes with [[withPathMeta]] like the CSV path. */
  def readJsonl(spark: SparkSession, root: String,
      schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains("_corrupt_record")) schema
      else schema.add(StructField("_corrupt_record", StringType, nullable = true))
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("recursiveFileLookup", "true")
      .schema(withCorrupt)
      .json(root)
  }

  /** `input_file_name()` is URI-encoded (spaces → %20); the reference's
    * Athena `"$path"` carries the raw S3 key, so decode for parity — the
    * standings filename keys contain spaces (`'NFBC OC 2025 …'`). */
  private def pathCol: Column = url_decode(input_file_name())

  /** The reference's `"$path"`-derived audit/partition columns. */
  def withPathMeta(df: DataFrame): DataFrame = df
    .withColumn("year", regexp_extract(pathCol, "year=([0-9]{4})", 1))
    .withColumn("month", regexp_extract(pathCol, "month=([0-9]{1,2})", 1))
    .withColumn("day", regexp_extract(pathCol, "day=([0-9]{1,2})", 1))
    .withColumn("_ptkey", concat(col("year"), col("month"), col("day")))
    .withColumn("_filename", element_at(split(pathCol, "/"), -1))
    .withColumn("_loaddatetime", current_timestamp())

  /** S4 latest-snapshot filter: keep rows of the newest snapshot. Two-phase
    * (tiny agg broadcast + pushable equality filter) instead of a sorted
    * scan. Ordering runs over a ZERO-PADDED derivation of the path
    * components, never the raw `_ptkey`: the reference-parity `_ptkey`
    * concatenates unpadded month/day, so a lexicographic max would pick
    * '202655' (May 5) over '2026510' (May 10) — silently serving a stale
    * snapshot from the 10th of any month on. `_ptkey` values themselves are
    * untouched (parity). */
  def latestSnapshot(df: DataFrame): DataFrame = {
    val ord = concat(lpad(col("year"), 4, "0"),
      lpad(col("month"), 2, "0"), lpad(col("day"), 2, "0"))
    val maxKey = df.agg(max(ord).as("_max_ptord"))
    df.join(broadcast(maxKey), ord === col("_max_ptord")).drop("_max_ptord")
  }
}
