package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark-first implementation plus, when the semantics are
  * ANSI-SQL-expressible, an equivalent DuckDB oracle for the driver's
  * differential correctness gate (`BASELINE.md`).
  *
  * Conventions shared by implementation and oracle so hash-compare is stable:
  *   - every aggregated/computed double is `round(x, k)` on BOTH sides;
  *   - every ranking window carries a deterministic tie-break key;
  *   - timestamps are surfaced as dates or epoch seconds, never raw ts;
  *   - column aliases match exactly (driver sorts columns by name).
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")

/** A family of queries contributed to [[graft.SparkEntry]]. */
trait QueryPack {
  def all: Seq[GQuery]
}
