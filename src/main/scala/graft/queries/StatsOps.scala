package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GQuery, QueryPack, Tables}

/** Statistical aggregates and late-SQL surfaces — the numeric-profiling face
  * of the engine (corpus statistics, drift monitors, feature QA) plus the
  * Spark-4 SQL conveniences a migrating user expects to keep.
  *
  * Scale notes: everything here is a single partial+final hash aggregate —
  * the stats functions (variance/covariance/correlation/regression) all keep
  * O(1) mergeable state per group, which is exactly why they are the right
  * tool for 100 TB profiling jobs (one shuffle of constant-width partials,
  * never a sort or a second scan). The manual-moment columns deliberately
  * rebuild skewness/kurtosis from exact integer power sums so the oracle
  * comparison is bit-stable: both engines evaluate the identical IEEE double
  * expression over identical inputs (`sqrt`/`*`/`-` are correctly rounded;
  * `pow` is avoided because libm implementations differ in the last ulp).
  */
object StatsOps extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---- A19: statistical-aggregate battery ------------------------------------
  // stddev/variance (sample + population), covariance, correlation, and the
  // regr_* linear-model family — every one a one-pass mergeable aggregate.
  // Alongside the natives, skewness/kurtosis are rebuilt from exact integer
  // power sums (l_quantity is integer-valued; sums fit comfortably in int64
  // at test scale — a 100 TB run would widen them to decimal) so the cross-
  // engine compare is deterministic; the native skewness/kurtosis functions
  // are pinned against these manual moments in StatsOpsSpec.
  private val a19 = GQuery(
    "a19_stats_battery",
    (s, dir) => {
      val q = col("l_quantity").cast("long")
      val agg = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_samp"),
          round(stddev_pop(col("l_quantity")), 4).as("sd_pop"),
          round(var_samp(col("l_quantity")), 4).as("var_samp"),
          round(var_pop(col("l_quantity")), 4).as("var_pop"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_samp"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("cov_pop"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("reg_b0"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("reg_r2"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 4).as("reg_ax"),
          round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 4).as("reg_ay"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("reg_n"),
          sum(q).cast("double").as("sx"),
          sum(q * q).cast("double").as("sxx"),
          sum(q * q * q).cast("double").as("sxxx"),
          sum(q * q * q * q).cast("double").as("sxxxx"))
      val nD = col("n").cast("double")
      val m1 = col("sx") / nD
      val r2 = col("sxx") / nD
      val r3 = col("sxxx") / nD
      val r4 = col("sxxxx") / nD
      val m2 = r2 - m1 * m1
      val m3 = r3 - lit(3.0) * m1 * r2 + lit(2.0) * m1 * m1 * m1
      val m4 = r4 - lit(4.0) * m1 * r3 + lit(6.0) * m1 * m1 * r2 -
        lit(3.0) * m1 * m1 * m1 * m1
      agg.select(col("l_returnflag"), col("n"),
        col("sd_samp"), col("sd_pop"), col("var_samp"), col("var_pop"),
        col("corr_qp"), col("cov_samp"), col("cov_pop"),
        col("reg_b0"), col("reg_r2"), col("reg_ax"), col("reg_ay"), col("reg_n"),
        round(m3 / (m2 * sqrt(m2)), 4).as("skew_m"),
        round(m4 / (m2 * m2) - lit(3.0), 4).as("kurt_m"))
    },
    Some("""WITH a AS (
           |  SELECT l_returnflag, count(*) AS n,
           |    round(stddev_samp(l_quantity), 4) AS sd_samp,
           |    round(stddev_pop(l_quantity), 4) AS sd_pop,
           |    round(var_samp(l_quantity), 4) AS var_samp,
           |    round(var_pop(l_quantity), 4) AS var_pop,
           |    round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
           |    round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_samp,
           |    round(covar_pop(l_quantity, l_extendedprice), 2) AS cov_pop,
           |    round(regr_intercept(l_extendedprice, l_quantity), 4) AS reg_b0,
           |    round(regr_r2(l_extendedprice, l_quantity), 4) AS reg_r2,
           |    round(regr_avgx(l_extendedprice, l_quantity), 4) AS reg_ax,
           |    round(regr_avgy(l_extendedprice, l_quantity), 4) AS reg_ay,
           |    regr_count(l_extendedprice, l_quantity) AS reg_n,
           |    CAST(sum(q) AS DOUBLE) AS sx,
           |    CAST(sum(q * q) AS DOUBLE) AS sxx,
           |    CAST(sum(q * q * q) AS DOUBLE) AS sxxx,
           |    CAST(sum(q * q * q * q) AS DOUBLE) AS sxxxx
           |  FROM (SELECT *, CAST(l_quantity AS BIGINT) AS q FROM lineitem) l
           |  GROUP BY l_returnflag),
           |m AS (
           |  SELECT *, CAST(n AS DOUBLE) AS nd,
           |    sx / CAST(n AS DOUBLE) AS m1,
           |    sxx / CAST(n AS DOUBLE) AS r2,
           |    sxxx / CAST(n AS DOUBLE) AS r3,
           |    sxxxx / CAST(n AS DOUBLE) AS r4
           |  FROM a),
           |c AS (
           |  SELECT *, r2 - m1 * m1 AS m2,
           |    r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
           |    r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1 * m1 * m1 * m1 AS m4
           |  FROM m)
           |SELECT l_returnflag, n, sd_samp, sd_pop, var_samp, var_pop, corr_qp,
           |  cov_samp, cov_pop, reg_b0, reg_r2, reg_ax, reg_ay, reg_n,
           |  round(m3 / (m2 * sqrt(m2)), 4) AS skew_m,
           |  round(m4 / (m2 * m2) - 3.0, 4) AS kurt_m
           |FROM c""".stripMargin),
    doc = "Stats battery: stddev/var/covar/corr + regr_* family + moment-exact skew/kurtosis (A19/§2.4).")

  // ---- A20: bitmap-rollup distinct counting ----------------------------------
  // The pre-aggregatable exact-distinct pattern: keys fold into per-bucket
  // RoaringBitmap-style bytes (bitmap_construct_agg over 32k-wide buckets),
  // bucket bitmaps OR together, and the final count is a popcount. Unlike
  // COUNT(DISTINCT) — whose Expand plan must reshuffle raw keys for every
  // re-aggregation — bitmap partials are tiny, mergeable, and storable: a
  // 100 TB pipeline materializes per-partition bitmaps once and serves any
  // rollup (day → month → total) by OR-ing them, never rescanning the fact.
  // The oracle states the same result as plain COUNT(DISTINCT), plus the
  // bucket count from the documented bucket function (ceil(k / 32768)).
  // Bitmap positions are 1-based: the 0-based surrogate key is shifted to
  // k+1 on BOTH sides (injective, so distinct counts are unchanged) — keys
  // <= 0 would land in a sign-special bucket and muddy the oracle algebra.
  private val a20 = GQuery(
    "a20_bitmap_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), (col("l_partkey") + 1).as("pk1"))
        .groupBy(col("l_returnflag"),
          expr("bitmap_bucket_number(pk1)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(pk1))").as("bm"))
        .groupBy(col("l_returnflag"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_parts"),
          count(lit(1)).as("n_buckets")),
    Some("""SELECT l_returnflag,
           |  count(DISTINCT l_partkey + 1) AS n_parts,
           |  count(DISTINCT l_partkey // 32768) AS n_buckets
           |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    doc = "Bitmap-rollup exact distinct: mergeable per-bucket bitmaps == COUNT(DISTINCT) (A20/§2.4).")

  // ---- A21: deterministic mode + median --------------------------------------
  // mode(x, deterministic=true) pins the tie-break (lowest most-frequent
  // value) so the answer is corpus-determined, not partition-order-determined
  // — the only spelling safe to put in a differential gate. The oracle has no
  // native deterministic mode, so it states the contract directly: rank
  // (count DESC, value ASC), take row 1. median is interpolated on both
  // engines; the midpoint arithmetic differs only below the rounding floor.
  private val a21 = GQuery(
    "a21_mode_median",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          expr("mode(l_quantity, true)").as("mode_qty"),
          round(median(col("l_quantity")), 4).as("median_qty"),
          round(median(col("l_extendedprice")), 2).as("median_price")),
    Some("""WITH c AS (
           |  SELECT l_returnflag, l_quantity, count(*) AS cnt
           |  FROM lineitem GROUP BY 1, 2),
           |r AS (
           |  SELECT l_returnflag, l_quantity,
           |    row_number() OVER (PARTITION BY l_returnflag
           |                       ORDER BY cnt DESC, l_quantity ASC) AS rn
           |  FROM c),
           |m AS (
           |  SELECT l_returnflag, count(*) AS n,
           |    round(median(l_quantity), 4) AS median_qty,
           |    round(median(l_extendedprice), 2) AS median_price
           |  FROM lineitem GROUP BY 1)
           |SELECT m.l_returnflag, m.n, r.l_quantity AS mode_qty,
           |  m.median_qty, m.median_price
           |FROM m JOIN r ON m.l_returnflag = r.l_returnflag AND r.rn = 1""".stripMargin),
    doc = "Deterministic mode (lowest most-frequent) + interpolated median (A21/§2.4).")

  // ---- A22: ordered LISTAGG ---------------------------------------------------
  // listagg ... WITHIN GROUP (ORDER BY ...) — the SQL:2016 spelling Spark 4
  // added. The ordered concatenation is the deterministic form (unordered
  // listagg is partition-order-dependent and ungateable); the long key list
  // is surfaced as an md5 digest so the output row stays small while the
  // hash still proves byte-exact agreement. The filter bounds group size —
  // at scale an unbounded listagg is an anti-pattern (a single group's
  // string must fit in one row); the digest-of-sorted-list is the scalable
  // idiom this query demonstrates.
  private val a22 = GQuery(
    "a22_listagg",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_totalprice") > 450000)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          md5(expr(
            "listagg(CAST(o_orderkey AS STRING), ',') WITHIN GROUP (ORDER BY o_orderkey)"))
            .as("keys_md5"),
          expr("listagg(DISTINCT o_orderstatus, '|') WITHIN GROUP (ORDER BY o_orderstatus)")
            .as("statuses")),
    Some("""SELECT o_orderpriority, count(*) AS n,
           |  md5(string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)) AS keys_md5,
           |  string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus) AS statuses
           |FROM orders WHERE o_totalprice > 450000
           |GROUP BY o_orderpriority""".stripMargin),
    doc = "Ordered LISTAGG WITHIN GROUP, digest-pinned; DISTINCT variant included (A22/§2.4).")

  // ---- F22: GROUP BY ALL / ORDER BY ALL ---------------------------------------
  // The by-name grouping shorthand: every non-aggregate select item becomes a
  // grouping key. Pinned against the oracle's explicit column list — the
  // shorthand must be sugar only (same keys inferred, same aggregate), which
  // the shared hash gate proves.
  private val f22 = GQuery(
    "f22_group_order_by_all",
    (s, dir) =>
      Tables.sqlOn(s, "orders" -> t(s, dir, "orders")) { v =>
        s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           |FROM ${v("orders")}
           |GROUP BY ALL
           |ORDER BY ALL""".stripMargin
      },
    Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           |FROM orders
           |GROUP BY o_orderpriority, o_orderstatus
           |ORDER BY o_orderpriority, o_orderstatus""".stripMargin),
    doc = "GROUP BY ALL / ORDER BY ALL shorthand pinned to the explicit key list (F22/§2.6).")

  // ---- F23: parameterized SQL (named parameter markers) -----------------------
  // spark.sql(text, args): named :params bind server-side as typed literals —
  // the injection-safe serving-layer idiom (the reference app interpolates
  // f-strings into SQL; parameter markers are the hardened equivalent).
  // Constant folding sees the bound literal, so the filter still pushes into
  // the scan exactly as if it were inline — StatsOpsSpec asserts the
  // pushdown. The oracle inlines the same constants.
  private val f23 = GQuery(
    "f23_parameterized_sql",
    (s, dir) =>
      Tables.sqlOnArgs(s,
        Map("minp" -> Int.box(300000), "cutoff" -> "1995-06-01 00:00:00"),
        "orders" -> t(s, dir, "orders")) { v =>
        s"""SELECT o_orderpriority, count(*) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           |FROM ${v("orders")}
           |WHERE o_totalprice > :minp AND o_orderdate >= CAST(:cutoff AS TIMESTAMP)
           |GROUP BY o_orderpriority""".stripMargin
      },
    Some("""SELECT o_orderpriority, count(*) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           |FROM orders
           |WHERE o_totalprice > 300000
           |  AND o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'
           |GROUP BY o_orderpriority""".stripMargin),
    doc = "Named-parameter SQL (:param binding), pushdown preserved (F23/§2.6).")

  private val ddlSeq = new java.util.concurrent.atomic.AtomicLong(0)

  // ---- F24: SQL-defined scalar UDF (CREATE FUNCTION ... RETURN expr) ----------
  // Spark 4 SQL UDFs: the function body is SQL, so the analyzer INLINES it —
  // the plan is identical to writing the expression by hand (no black-box
  // UDF call, codegen and pushdown intact). That inlining is the scale
  // contract this query pins: the oracle states the body inline, and the
  // hash gate proves the UDF spelling changes nothing. Unique-suffixed name
  // + drop keeps the builder side-effect-free (the sqlOn discipline).
  private val f24 = GQuery(
    "f24_sql_udf",
    (s, dir) => {
      val f = s"graft_disc_price_${ddlSeq.incrementAndGet()}"
      s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $f(price DOUBLE, disc DOUBLE)
               |RETURNS DOUBLE RETURN CAST(CAST(price AS DECIMAL(18,2))
               |  * (CAST(1 AS DECIMAL(18,2)) - CAST(disc AS DECIMAL(18,2))) AS DOUBLE)""".stripMargin)
      try Tables.sqlOn(s, "lineitem" -> t(s, dir, "lineitem")) { v =>
        s"""SELECT l_returnflag,
           |  round(sum($f(l_extendedprice, l_discount)), 2) AS disc_revenue,
           |  count(*) AS n
           |FROM ${v("lineitem")} GROUP BY l_returnflag""".stripMargin
      } finally s.sql(s"DROP TEMPORARY FUNCTION IF EXISTS $f")
    },
    Some("""SELECT l_returnflag,
           |  round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
           |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)), 2)
           |    AS disc_revenue,
           |  count(*) AS n
           |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    doc = "SQL-defined scalar UDF inlined by the analyzer == hand-written expression (F24/§2.8).")

  // ---- F25: session variables (DECLARE / SET VAR) -----------------------------
  // Typed session variables hold a query-computed scalar the next statement
  // uses as a literal — the multi-statement-job idiom (compute a threshold,
  // reuse it across statements without a self-join). The variable is bound
  // BEFORE the consuming query plans, so the filter arrives as a foldable
  // literal. Oracle inlines the defining subquery.
  private val f25 = GQuery(
    "f25_session_variables",
    (s, dir) => {
      val vn = s"graft_thr_${ddlSeq.incrementAndGet()}"
      try Tables.sqlOn(s, "orders" -> t(s, dir, "orders")) { v =>
        s.sql(s"DECLARE OR REPLACE VARIABLE $vn DOUBLE DEFAULT 0.0")
        s.sql(s"SET VAR $vn = (SELECT avg(o_totalprice) FROM ${v("orders")})")
        s"""SELECT o_orderpriority, count(*) AS n_above,
           |  round(min(o_totalprice), 2) AS min_above
           |FROM ${v("orders")} WHERE o_totalprice > $vn
           |GROUP BY o_orderpriority""".stripMargin
        // the variable resolves to a literal during eager analysis, so
        // dropping it right after keeps the builder side-effect-free (the
        // sqlOn view discipline applied to session variables)
      } finally s.sql(s"DROP TEMPORARY VARIABLE IF EXISTS $vn")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_above,
           |  round(min(o_totalprice), 2) AS min_above
           |FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
           |GROUP BY o_orderpriority""".stripMargin),
    doc = "Session variables: query-computed scalar bound as a literal in the next statement (F25/§2.6).")

  // ---- F26: SQL scripting (BEGIN ... END control flow) ------------------------
  // Procedural SQL: a WHILE loop derives a threshold (1.5^10 = 59049/1024,
  // exactly representable in binary -> the loop result is bit-deterministic),
  // an IF on a data-derived count picks the branch, and the script's value
  // is its last statement. The oracle states the taken branch with the
  // loop's closed-form literal — pinning both the control flow and that
  // scripting introduces no engine-specific arithmetic.
  private val f26 = GQuery(
    "f26_sql_scripting",
    (s, dir) =>
      Tables.sqlOn(s, "orders" -> t(s, dir, "orders")) { v =>
        s"""BEGIN
           |  DECLARE k INT DEFAULT 0;
           |  DECLARE thr DOUBLE DEFAULT 1.0;
           |  WHILE k < 10 DO
           |    SET thr = thr * 1.5;
           |    SET k = k + 1;
           |  END WHILE;
           |  IF (SELECT count(*) FROM ${v("orders")}) >= 1000 THEN
           |    SELECT o_orderpriority, count(*) AS n,
           |      round(max(o_totalprice), 2) AS max_price
           |    FROM ${v("orders")} WHERE o_totalprice > thr * 1000
           |    GROUP BY o_orderpriority;
           |  ELSE
           |    SELECT 'small' AS o_orderpriority, CAST(0 AS BIGINT) AS n,
           |      CAST(0.0 AS DOUBLE) AS max_price;
           |  END IF;
           |END""".stripMargin
      },
    Some("""SELECT o_orderpriority, count(*) AS n,
           |  round(max(o_totalprice), 2) AS max_price
           |FROM orders WHERE o_totalprice > 57665.0390625
           |GROUP BY o_orderpriority""".stripMargin),
    doc = "SQL scripting: WHILE-derived exact threshold + IF branch, value = last statement (F26/§2.6).")

  override val all: Seq[GQuery] = Seq(a19, a20, a21, a22, f22, f23, f24, f25, f26)
}
