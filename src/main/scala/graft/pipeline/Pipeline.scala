package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full reference-parity DAG: 10 source + 16 stage/projection-shared +
  * 12 per-format + 4 mart models = the reference's 40 `dbt` models and two
  * serving queries, re-expressed Spark-first (SURVEY.md §7).
  *
  * Usage:
  * {{{
  *   val out = Pipeline.run(spark, dataRoot = "/path/to/raw/feeds")
  *   out("mart_preseason_overall_rankings_oc").show()
  * }}}
  */
object Pipeline {

  def models(dataRoot: String): Seq[Model] =
    new SourceModels(dataRoot).all ++ StageModels.all ++
      ProjectionModels.all ++ MartModels.all

  def runner(dataRoot: String): DagRunner = new DagRunner(models(dataRoot))

  /** Build every model. `materializeDir=Some(dir)` gives dbt-style per-model
    * table materialization; `None` lets Catalyst fuse across the whole DAG. */
  def run(spark: SparkSession, dataRoot: String,
      materializeDir: Option[String] = None): Map[String, DataFrame] =
    runner(dataRoot).run(spark, materializeDir)

  // ---- serving queries (app/app.py read paths, SURVEY.md §3.2-3.3) ---------

  /** app/app.py:419-430 — the draft-table pull: explicit column list ordered
    * by rank (S8/O2). */
  def servingRankings(mart: DataFrame): DataFrame =
    mart.select("rank", "name", "team", "pos", "position", "pos_group",
      "pa", "ab", "h", "r", "hr", "rbi", "sb", "avg", "obp", "slg",
      "ip", "er", "w", "qs", "k", "sv", "era", "whip",
      "sgp", "value")
      .orderBy("rank")

  /** app/app.py:868-887 — percentile targets for the latest year of a format:
    * derived-column CTE + uncorrelated scalar-subquery max (A7). */
  def servingPercentiles(spark: SparkSession, percentiles: DataFrame,
      format: String): DataFrame = {
    percentiles.createOrReplaceTempView("mart_sgp_percentiles")
    spark.sql(
      s"""WITH filename_parts AS (
         |  SELECT _filename, category, p80, p90,
         |         split_part(_filename, ' ', 2) AS format_part,
         |         CAST(split_part(_filename, ' ', 3) AS INT) AS year_part
         |  FROM mart_sgp_percentiles)
         |SELECT category, p80, p90
         |FROM filename_parts
         |WHERE format_part = '$format'
         |  AND year_part = (SELECT max(year_part) FROM filename_parts
         |                   WHERE format_part = '$format')""".stripMargin)
  }

  /** app/app.py:567-569 — drafted-status KV membership join (`isin`). */
  def withDraftedFlag(rankings: DataFrame, draftedIds: Set[String]): DataFrame =
    rankings.withColumn("drafted", col("id").isin(draftedIds.toSeq: _*))
}
