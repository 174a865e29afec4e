package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.GQuery
import graft.multimodal.MediaOps
import graft.queries.{AggWindowOps, CorpusOps, GraphOps, IncrementalOps, RelationalOps, StatsOps, TemporalOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are registered by the operator packs; every key maps 1:1 to a
  * SURVEY.md §2 inventory row (prefix = row id) or a beyond-parity
  * training-data operator (the d-/e-series).
  */
object SparkEntry {

  val registry: Seq[GQuery] =
    RelationalOps.all ++ AggWindowOps.all ++ TextOps.all ++ CorpusOps.all ++
      VectorOps.all ++ MediaOps.all ++ TemporalOps.all ++ IncrementalOps.all ++
      GraphOps.all ++ StatsOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_groupby_aggregates")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. The uniqueness
    * guard makes a duplicate registration a loud failure — toMap's
    * last-wins would otherwise silently shadow one implementation while
    * Inventory still lists both. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val m = registry.map(q => q.name -> q.run).toMap
    require(m.size == registry.size, {
      val dups = registry.groupBy(_.name).filter(_._2.size > 1).keys
      s"duplicate query names in the registry: ${dups.mkString(", ")}"
    })
    m
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
