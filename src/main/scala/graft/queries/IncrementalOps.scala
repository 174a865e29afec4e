package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GQuery, QueryPack, Tables}
import graft.pipeline.Incremental

/** Registry face of [[graft.pipeline.Incremental]] — dbt's `incremental` and
  * `snapshot` materializations over the events change log, oracle-checked.
  *
  * i3 is the important one: the engine folds the log through the cheap
  * per-batch [[Incremental.scd2Apply]] path, while the oracle recomputes the
  * history from the full log in one SQL pass — so the DuckDB gate proves the
  * incremental path converges to the batch rebuild, not just that two copies
  * of the same algorithm agree.
  */
object IncrementalOps extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def ev(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))

  /** Surfaced per convention: timestamps leave as floored epoch seconds. */
  private def sec(c: org.apache.spark.sql.Column) = unix_timestamp(c)

  // ---- I1: incremental merge (dbt incremental, unique_key=user_id) ---------
  // Base = latest pre-cutoff event per user; the post-cutoff batch merges in,
  // replacing matched keys and appending new ones. The oracle states the
  // fixpoint directly: latest event per user over the whole log.
  private val i1 = GQuery(
    "i1_incremental_upsert",
    (s, dir) => {
      val all = ev(s, dir)
      val cutoff = lit("2024-01-20").cast("timestamp")
      val old = all.filter(col("ts") < cutoff)
      val batch = all.filter(col("ts") >= cutoff)
      val base = Incremental.upsert(old.limit(0), old,
        Seq("user_id"), "ts", "event_id")
      Incremental.upsert(base, batch, Seq("user_id"), "ts", "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), sec(col("ts")).as("ts_sec"))
    },
    Some("""SELECT user_id, event_id, event_type, value,
           |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
           |FROM (SELECT *, row_number() OVER (
           |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           |      FROM events) r
           |WHERE rn = 1""".stripMargin),
    doc = "dbt incremental merge: batch replaces matched keys, appends new (I1).")

  // ---- I2: SCD2 snapshot backfill (dbt snapshot, check strategy) -----------
  // Compress the per-user event_type change log into validity intervals in
  // one partitioned window pass.
  private val i2 = GQuery(
    "i2_scd2_history",
    (s, dir) =>
      Incremental.scd2Rebuild(ev(s, dir), Seq("user_id"), "event_type",
          "ts", "event_id")
        .select(col("user_id"), col("event_type"),
          sec(col("valid_from")).as("valid_from_sec"),
          sec(col("valid_to")).as("valid_to_sec")),
    Some(scd2OracleSql),
    doc = "dbt snapshot backfill: change log -> SCD2 validity intervals (I2).")

  // ---- I3: SCD2 incremental apply == batch rebuild (differential) ----------
  // The engine folds three disjoint time slices through scd2Apply; the
  // oracle rebuilds from the full log. Hash-equality proves the incremental
  // materialization converges to the batch one.
  private val i3 = GQuery(
    "i3_scd2_incremental",
    (s, dir) => {
      val all = ev(s, dir)
      val c1 = lit("2024-01-11").cast("timestamp")
      val c2 = lit("2024-01-21").cast("timestamp")
      val h0 = Incremental.scd2Rebuild(all.filter(col("ts") < c1),
        Seq("user_id"), "event_type", "ts", "event_id")
      val h1 = Incremental.scd2Apply(h0,
        all.filter(col("ts") >= c1 && col("ts") < c2),
        Seq("user_id"), "event_type", "ts", "event_id")
      val h2 = Incremental.scd2Apply(h1, all.filter(col("ts") >= c2),
        Seq("user_id"), "event_type", "ts", "event_id")
      h2.select(col("user_id"), col("event_type"),
        sec(col("valid_from")).as("valid_from_sec"),
        sec(col("valid_to")).as("valid_to_sec"))
    },
    Some(scd2OracleSql),
    doc = "SCD2 incremental fold over 3 batches, oracle-checked against the full rebuild (I3).")

  // ---- I4: SCD2 hard-delete detection (dbt invalidate_hard_deletes) --------
  // The missing quadrant of the snapshot semantics: i2/i3 only ever SEE
  // changes — a key that stops arriving keeps an open interval forever.
  // Here the pre-cutoff history meets the post-cutoff key snapshot: users
  // with no post-cutoff events are hard-deleted, their open interval closes
  // at the cutoff. Key-only anti/semi joins — no row multiplication.
  private val i4 = GQuery(
    "i4_scd2_hard_deletes",
    (s, dir) => {
      val all = ev(s, dir)
      val cutoff = lit("2024-01-21").cast("timestamp")
      val hist = Incremental.scd2Rebuild(all.filter(col("ts") < cutoff),
        Seq("user_id"), "event_type", "ts", "event_id")
      val present = all.filter(col("ts") >= cutoff).select(col("user_id"))
      Incremental.scd2CloseDeleted(hist, present, Seq("user_id"), cutoff)
        .select(col("user_id"), col("event_type"),
          sec(col("valid_from")).as("valid_from_sec"),
          sec(col("valid_to")).as("valid_to_sec"))
    },
    Some("""WITH c AS (
           |  SELECT user_id, event_type, ts, event_id,
           |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           |  FROM events WHERE ts < TIMESTAMP '2024-01-21'),
           |chg AS (SELECT user_id, event_type, ts, event_id FROM c
           |        WHERE prev IS NULL OR prev <> event_type),
           |hist AS (
           |  SELECT user_id, event_type,
           |    CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_sec,
           |    CAST(floor(epoch(lead(ts) OVER (
           |      PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS valid_to_sec
           |  FROM chg),
           |pres AS (SELECT DISTINCT user_id FROM events
           |         WHERE ts >= TIMESTAMP '2024-01-21')
           |SELECT user_id, event_type, valid_from_sec,
           |  CASE WHEN valid_to_sec IS NULL
           |        AND user_id NOT IN (SELECT user_id FROM pres)
           |       THEN CAST(floor(epoch(TIMESTAMP '2024-01-21')) AS BIGINT)
           |       ELSE valid_to_sec END AS valid_to_sec
           |FROM hist""".stripMargin),
    doc = "SCD2 hard-delete detection: vanished keys close at the snapshot cutoff (I4).")

  // ---- I5: CDC apply — last-writer-wins with tombstones + column patches ----
  // The Debezium-shaped quadrant the merge family still lacked: the event
  // log read as a CDC feed where 'error' is a DELETE tombstone and each
  // other op patches ONE column of the user's row (click/view/purchase →
  // their latest value). Final state = per-key latest-op-wins: keys whose
  // LAST op is a tombstone vanish; surviving rows carry each column's most
  // recent patch — max_by under a FILTER, one hash aggregate, no window
  // sort, no join. (ts alone is the orderer: (user_id, ts) is unique in the
  // corpus at every SF — the DuckDB side's arg_max can't take a composite
  // orderer, so the tie-break-free contract is load-bearing and pinned by
  // the oracle comparing equal.)
  private val i5 = GQuery(
    "i5_cdc_apply",
    (s, dir) =>
      graft.streaming.EventStream.cdcState(ev(s, dir))
        .filter(col("last_op") =!= "error"),
    Some("""SELECT user_id,
           |  arg_max(event_type, ts) AS last_op,
           |  arg_max(value, ts) FILTER (event_type = 'click') AS click_value,
           |  arg_max(value, ts) FILTER (event_type = 'view') AS view_value,
           |  arg_max(value, ts) FILTER (event_type = 'purchase') AS purchase_value,
           |  CAST(floor(epoch(max(ts))) AS BIGINT) AS last_ts_sec,
           |  count(*) AS n_ops
           |FROM events GROUP BY user_id
           |HAVING arg_max(event_type, ts) <> 'error'""".stripMargin),
    doc = "CDC apply: latest-op-wins with tombstones and per-column patches, one aggregate (I5).")

  // ---- I6: incremental aggregate maintenance -------------------------------
  // The additive-state quadrant: i1/i3 maintain ROWS, i6 maintains per-key
  // AGGREGATES by folding mergeable partial states (sum/count/max/min are
  // associative+commutative, avg derives at read time — the same algebra
  // a streaming state store or an OLAP rollup cube relies on). Three
  // disjoint slices fold through mergeAggState; the oracle aggregates the
  // full log in one shot — equality proves the fold rescans nothing and
  // converges independent of arrival order.
  private val i6 = GQuery(
    "i6_incremental_agg",
    (s, dir) => {
      val all = ev(s, dir)
      val c1 = lit("2024-01-11").cast("timestamp")
      val c2 = lit("2024-01-21").cast("timestamp")
      val st = Seq(
        all.filter(col("ts") < c1),
        all.filter(col("ts") >= c1 && col("ts") < c2),
        all.filter(col("ts") >= c2))
        .map(b => Incremental.aggState(b, Seq("user_id"), "value", "ts"))
        .reduce(Incremental.mergeAggState(_, _, Seq("user_id")))
      st.select(col("user_id"), col("n"),
        col("total").cast("double").as("total"),
        col("max_v"), col("min_v"),
        sec(col("last_ts")).as("last_ts_sec"),
        (col("total").cast("double") / col("n")).as("avg_v"))
    },
    Some("""SELECT user_id, count(*) AS n,
           |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
           |  max(value) AS max_v, min(value) AS min_v,
           |  CAST(floor(epoch(max(ts))) AS BIGINT) AS last_ts_sec,
           |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_v
           |FROM events GROUP BY user_id""".stripMargin),
    doc = "Incremental aggregate maintenance: mergeable partial states folded over 3 batches == one-shot aggregate (I6).")

  private lazy val scd2OracleSql =
    """WITH c AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |chg AS (SELECT user_id, event_type, ts, event_id FROM c
      |        WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_sec,
      |  CAST(floor(epoch(lead(ts) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS valid_to_sec
      |FROM chg""".stripMargin

  override val all: Seq[GQuery] = Seq(i1, i2, i3, i4, i5, i6)
}
