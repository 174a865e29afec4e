package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The dbt schema-test surface (`unique`, `not_null`, `accepted_values`,
  * `relationships`) as composable DataFrame checks. The reference ships dbt,
  * whose test framework compiles each declared test to a violation-counting
  * query; the reference's own tree declares none (`tests/` is empty), but a
  * user of dbt runs these four generics against any model — so the engine
  * carries them as first-class operators.
  *
  * Each check returns the VIOLATION rows (debuggable), and [[summarize]]
  * folds any set of checks into one (check, target, n_violations) frame —
  * the `dbt test` result table. Scale posture: every check is a single
  * aggregate or anti-join pass over the audited table — no windows, no
  * self-joins; the summary union is metadata-sized (one row per check).
  */
object Checks {

  /** Keys appearing more than once: groupBy + HAVING, one hash aggregate.
    * Rows with a null key column are skipped — dbt's `unique` test filters
    * `where column is not null`, so repeated null keys are NOT a violation
    * there; compose with [[notNull]] to reject them. */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame =
    df.filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Rows where any of `cols` is null (with a reason column per violation). */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame = {
    val anyNull = cols.map(col(_).isNull).reduce(_ || _)
    val reasons = array(cols.map(c => when(col(c).isNull, lit(c))): _*)
    df.filter(anyNull)
      .withColumn("null_columns", array_compact(reasons))
  }

  /** Rows whose `column` value is outside the accepted set. Nulls PASS —
    * dbt's `accepted_values` compiles to `NOT IN`, which is unknown (never
    * a violation) for null; rejecting nulls is [[notNull]]'s job, composed
    * separately exactly as a dbt model declares the two tests. */
  def acceptedValues(df: DataFrame, column: String, allowed: Seq[String]): DataFrame =
    df.filter(col(column).isNotNull && !col(column).isin(allowed: _*))

  /** Child rows whose `fk` has no match in `parent.pk` (referential
    * integrity): a LEFT ANTI join on the key — null fks are not orphans,
    * matching dbt's `relationships` semantics. */
  def relationships(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)), Seq(fk), "left_anti")

  /** Fold named checks into the `dbt test` result table: one row per check
    * with its violation count. Each count is an independent 1-row aggregate;
    * the union is check-count-sized. */
  def summarize(checks: (String, String, DataFrame)*): DataFrame = {
    require(checks.nonEmpty,
      "summarize needs at least one check (an empty dbt test suite is a config error)")
    checks.map { case (name, target, violations) =>
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check"), lit(target).as("target"),
          col("n_violations"))
    }.reduce(_ unionByName _)
  }

  /** Order-insensitive content digest of a frame — the golden-hash gate for
    * model outputs (PipelineSpec pins the parity DAG's marts to checked-in
    * digests so a silent constant drift in any model breaks the suite).
    *
    * Canonicalization: columns sorted by NAME, each value cast to its exact
    * string form (doubles print bit-exactly, so no rounding can mask drift)
    * and LENGTH-PREFIXED (`<len>:<value>`, `n` for null) — self-delimiting,
    * so no character a value could contain (separators included) can make
    * two different rows concatenate identically. Each row md5-hashes
    * independently; two 60-bit lanes of the row hash are SUMMED (order-
    * insensitive, so no global sort) together with the row count, then the
    * lane sums + schema signature hash into the final digest. At 100 TB this
    * is one map pass + a 1-row aggregate — the cheapest whole-table equality
    * check that still catches any single-cell change.
    *
    * Excluded columns default to `_loaddatetime` (a wall-clock audit stamp,
    * nondeterministic by construction). */
  def contentDigest(df: DataFrame,
      exclude: Seq[String] = Seq("_loaddatetime")): String = {
    val cols = df.columns.filterNot(exclude.contains).sorted
    val canon = cols.map { c =>
      val v = col(c).cast("string")
      coalesce(concat(length(v), lit(":"), v), lit("n"))
    }
    val h = md5(concat(canon: _*))
    val row = df.select(
        conv(substring(h, 1, 15), 16, 10).cast("decimal(38,0)").as("h1"),
        conv(substring(h, 16, 15), 16, 10).cast("decimal(38,0)").as("h2"))
      .agg(sum(col("h1")), sum(col("h2")), count(lit(1)))
      .first()
    val schemaSig = cols.map(c => s"$c:${df.schema(c).dataType.simpleString}")
      .mkString(",")
    val s = s"${row.get(0)}|${row.get(1)}|${row.get(2)}|$schemaSig"
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
