package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GQuery, QueryPack, Tables}

/** Temporal join operators neither the reference nor stock Spark offers as a
  * primitive — as-of join and range join — in their scale-correct Spark
  * forms (the naive spellings are range-condition joins Spark would plan as
  * a per-key quadratic nested loop):
  *
  *   - As-of join: union-tag both sides, ONE shuffle on the partition key,
  *     and carry the right side forward with a running `last(_, ignoreNulls)`
  *     window. Cost is a sort per key — independent of how many right rows
  *     each left row "sees".
  *   - Range join: bucket event time by the range width; the earlier side
  *     probes its own and the next bucket (equi-keys!), then the exact range
  *     predicate filters. Each qualifying pair meets in exactly one bucket,
  *     so no dedup pass is needed; the join stays a hash/merge join on
  *     (user, bucket).
  *
  * Timestamps flow as exact micros longs (`unix_micros` / DuckDB `epoch_us`)
  * so the oracle compare is bit-exact; raw values pass through unrounded.
  */
object TemporalOps extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def micros(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(col("event_id"), col("user_id"),
      col("event_type"), expr("unix_micros(ts)").as("us"), col("value"))

  // ---- T1: as-of join ----------------------------------------------------------

  /** Generic as-of join: for every left row, the latest right row of the
    * same `key` with `rightTs` <= `leftTs` (right columns NULL when none).
    * Union-tag both sides, ONE shuffle on the key, carry the right side
    * forward with running `last(_, ignoreNulls)` windows — cost is a sort
    * per key, independent of how many right rows each left row "sees", and
    * no range-condition join Spark would plan as a per-key nested loop.
    *
    * `left`/`right` must share no column names besides what `payload`
    * selects; ties on the timestamp resolve by `tieBreak` (right rows at
    * the same (ts, tieBreak <= left's) are visible). */
  private[graft] def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: String): DataFrame = {
    require(payload.forall(c => !left.columns.contains(c)),
      "payload columns must not collide with left columns")
    val leftExtra = left.columns.filterNot(_ == key).toSeq
    val taggedLeft = left.select(
      Seq(col(key)) ++ leftExtra.map(col) ++
        Seq(col(leftTs).as("_ts"), col(tieBreak).as("_tb"), lit(1).as("_is_left")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val taggedRight = right.select(
      Seq(col(key)) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTs).as("_ts"), col(tieBreak).as("_tb"), lit(0).as("_is_left")) ++
        payload.map(col): _*)
    // at equal (_ts, _tb) right rows sort before left rows, so a
    // prior-or-equal right value is visible to the left row
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_tb"), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(taggedLeft.unionByName(taggedRight)) { (df, c) =>
      df.withColumn(c, last(when(col("_is_left") === 0, col(c)), ignoreNulls = true).over(w))
    }
    carried.filter(col("_is_left") === 1).drop("_is_left", "_ts", "_tb")
  }

  /** The t1/t4 as-of oracle, shared verbatim: the composed window form and
    * the native operator MUST stay pinned against the same SQL — two
    * hand-maintained copies is how a tie-break fix silently forks them. */
  private val asofOracleSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us, value
      |  FROM events WHERE event_type IN ('click', 'view')),
      |enriched AS (
      |  SELECT event_id, user_id, event_type, us,
      |    last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_us,
      |    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_value
      |  FROM ev)
      |SELECT event_id AS click_id, user_id, us AS click_us, view_us, view_value
      |FROM enriched WHERE event_type = 'click'""".stripMargin

  /** The t1/t4 input frames: (clicks, views) with the view payload. */
  private def clickViewFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = micros(s, dir).filter(col("event_type").isin("click", "view"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("us"),
        col("us").as("view_us"), col("value").as("view_value"))
    (clicks, views)
  }

  // For every click, the most recent prior-or-equal view of the same user
  // (NULL when none): the canonical "latest quote for each trade" shape.
  private val t1 = GQuery(
    "t1_asof_join",
    (s, dir) => {
      val (clicks, views) = clickViewFrames(s, dir)
      asofJoin(clicks, views, key = "user_id", leftTs = "us", rightTs = "us",
        payload = Seq("view_us", "view_value"), tieBreak = "event_id")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("click_us"), col("view_us"), col("view_value"))
    },
    Some(asofOracleSql),
    doc = "As-of join: latest prior view per click, via running last() window (temporal #1).")

  // ---- T2: range join, bucketed ------------------------------------------------
  private val RangeUs = 300L * 1000 * 1000

  /** Generic bucketed range join: all (early, late) row pairs sharing `key`
    * with `0 < late.ts - early.ts <= range`. Bucket width == range width;
    * the early side probes its own and the next bucket (equi-keys!), then
    * the exact predicate filters. Each qualifying pair meets in exactly one
    * bucket, so no dedup pass is needed and the join stays a hash/merge
    * join on (key, bucket) — never the per-key nested loop Spark plans for
    * a raw range condition. Column name collisions are the caller's to
    * avoid (prefix the two sides). */
  private[graft] def rangeJoin(early: DataFrame, late: DataFrame, key: String,
      earlyTs: String, lateTs: String, range: Long): DataFrame = {
    val e = early.withColumn("_jb",
      explode(array(expr(s"$earlyTs div $range"), expr(s"$earlyTs div $range + 1"))))
    val l = late.withColumn("_jb", expr(s"$lateTs div $range"))
    e.join(l, Seq(key, "_jb"))
      .filter(col(lateTs) > col(earlyTs) && col(lateTs) <= col(earlyTs) + range)
      .drop("_jb")
  }

  // All same-user event pairs at most 300 s apart (strictly later second
  // event). Bucket width == range width, earlier side probes 2 buckets.
  private val t2 = GQuery(
    "t2_range_join_bucketed",
    (s, dir) => {
      val ev = micros(s, dir).select(col("event_id"), col("user_id"), col("us"))
      val early = ev.select(col("user_id"),
        col("event_id").as("early_id"), col("us").as("early_us"))
      val late = ev.select(col("user_id"),
        col("event_id").as("late_id"), col("us").as("late_us"))
      rangeJoin(early, late, key = "user_id",
        earlyTs = "early_us", lateTs = "late_us", range = RangeUs)
        .select(col("user_id"), col("early_id"), col("late_id"),
          (col("late_us") - col("early_us")).as("gap_us"))
    },
    Some(s"""SELECT a.user_id, a.event_id AS early_id, b.event_id AS late_id,
            |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
            |FROM events a JOIN events b
            |ON a.user_id = b.user_id
            |AND epoch_us(b.ts) > epoch_us(a.ts)
            |AND epoch_us(b.ts) <= epoch_us(a.ts) + $RangeUs""".stripMargin),
    doc = "Range join: same-user pairs within 300 s, bucket-probed equi-join (temporal #2).")

  // ---- T3: session windows (batch twin of the streaming sessionizer) -----------
  // Native `session_window` grouping: per-user sessions that close after 30
  // minutes of inactivity; the same gap definition EventStream.sessionize
  // implements statefully. Spark merges the windows during aggregation (no
  // per-user sort materialized); the DuckDB oracle derives identical
  // sessions with the classic gaps-and-islands window (lag + running flag
  // sum). The value sum goes through DECIMAL so per-session totals are
  // order-insensitive and hash-stable.
  private val SessionGapUs = 1800L * 1000 * 1000

  private[graft] def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("sess_start_us"),
        expr("unix_micros(session_window.end)").as("sess_end_us"),
        col("n_events"), col("total"))

  private val t3 = GQuery(
    "t3_session_window",
    (s, dir) => sessionAgg(t(s, dir, "events")),
    Some(s"""WITH ev AS (
            |  SELECT user_id, epoch_us(ts) AS us, value FROM events),
            |flagged AS (
            |  SELECT user_id, us, value,
            |    CASE WHEN lag(us) OVER w IS NULL
            |           OR us - lag(us) OVER w > $SessionGapUs THEN 1 ELSE 0 END AS new_sess
            |  FROM ev
            |  WINDOW w AS (PARTITION BY user_id ORDER BY us)),
            |islands AS (
            |  SELECT user_id, us, value,
            |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
            |  FROM flagged)
            |SELECT user_id, min(us) AS sess_start_us,
            |  max(us) + $SessionGapUs AS sess_end_us,
            |  count(*) AS n_events,
            |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
            |FROM islands GROUP BY user_id, sess_id""".stripMargin),
    doc = "Session windows: 30-min inactivity gap per user, native session_window (temporal #3).")

  // ---- T4: as-of join through the native Catalyst operator ---------------------
  // Same query and SAME DuckDB oracle as t1, but planned through
  // graft.plans.AsOfJoin -> AsOfJoinStrategy -> AsOfJoinExec: co-partitioned
  // sorted-merge with one buffered right row instead of the union+window
  // composition. The shared oracle means the custom physical operator is
  // value-proven by the same gate as the composed form, and
  // AsOfJoinNativeSpec pins plan shape + equality on randomized fixtures.
  private val t4 = GQuery(
    "t4_asof_join_native",
    (s, dir) => {
      val (clicks, views) = clickViewFrames(s, dir)
      graft.plans.AsOf.join(clicks, views, key = "user_id",
        leftTs = "us", rightTs = "us",
        payload = Seq("view_us", "view_value"), tieBreak = "event_id")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("click_us"), col("view_us"), col("view_value"))
    },
    Some(asofOracleSql),
    doc = "As-of join via custom LogicalPlan/Strategy/SparkPlan: co-partitioned sorted merge (temporal #4).")

  // ---- T5: band join via the native operator ---------------------------------
  // Same semantics and oracle as t2, executed by graft.plans.BandJoin — a
  // custom LogicalPlan/Strategy/SparkPlan that co-partitions both sides on
  // the key, sorts by (key, ts), and sweeps the late side holding only the
  // in-band early rows in a deque. vs the bucketed compose: no 2x early-side
  // explode, no post-filter, one shuffle per side at its own size; state is
  // bounded by rows-per-band, not partition size. Differentially tested
  // against the composed form in BandJoinNativeSpec.
  private val t5 = GQuery(
    "t5_band_join_native",
    (s, dir) => {
      val ev = micros(s, dir).select(col("event_id"), col("user_id"), col("us"))
      val early = ev.select(col("user_id"),
        col("event_id").as("early_id"), col("us").as("early_us"))
      val late = ev.select(col("user_id"),
        col("event_id").as("late_id"), col("us").as("late_us"))
      graft.plans.Band.join(early, late, key = "user_id",
          earlyTs = "early_us", lateTs = "late_us", range = RangeUs)
        .select(col("user_id"), col("early_id"), col("late_id"),
          (col("late_us") - col("early_us")).as("gap_us"))
    },
    Some(s"""SELECT a.user_id, a.event_id AS early_id, b.event_id AS late_id,
            |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
            |FROM events a JOIN events b
            |ON a.user_id = b.user_id
            |AND epoch_us(b.ts) > epoch_us(a.ts)
            |AND epoch_us(b.ts) <= epoch_us(a.ts) + $RangeUs""".stripMargin),
    doc = "Band join via custom LogicalPlan/Strategy/SparkPlan: in-band deque sweep (temporal #5).")

  // ---- T6: as-of join with freshness tolerance -------------------------------
  // t4's native operator with merge_asof's tolerance knob: the latest prior
  // view, but only when at most 10 minutes old — stale context nulls out.
  // The oracle carries the match's own timestamp and applies the same
  // freshness rule independently.
  private val ToleranceUs = 600L * 1000 * 1000

  private val t6 = GQuery(
    "t6_asof_tolerance",
    (s, dir) => {
      val ev = micros(s, dir).filter(col("event_type").isin("click", "view"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("us"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("us"),
          col("us").as("view_us"), col("value").as("view_value"))
      graft.plans.AsOf.join(clicks, views, key = "user_id",
          leftTs = "us", rightTs = "us",
          payload = Seq("view_us", "view_value"), tieBreak = "event_id",
          tolerance = Some(ToleranceUs))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("click_us"), col("view_us"), col("view_value"))
    },
    Some(s"""WITH ev AS (
            |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us, value
            |  FROM events WHERE event_type IN ('click', 'view')),
            |enriched AS (
            |  SELECT event_id, user_id, event_type, us,
            |    last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
            |      OVER (PARTITION BY user_id ORDER BY us, event_id
            |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_us,
            |    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
            |      OVER (PARTITION BY user_id ORDER BY us, event_id
            |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_value
            |  FROM ev)
            |SELECT event_id AS click_id, user_id, us AS click_us,
            |  CASE WHEN us - view_us <= $ToleranceUs THEN view_us END AS view_us,
            |  CASE WHEN us - view_us <= $ToleranceUs THEN view_value END AS view_value
            |FROM enriched WHERE event_type = 'click'""".stripMargin),
    doc = "Native as-of with merge_asof tolerance: stale matches null out (temporal #6).")

  // ---- T7: interval-overlap join ---------------------------------------------
  // The interval-intersection primitive (t2/t5 are point-vs-band; this is
  // interval-vs-interval): per-(user, event_type) sessions, then every pair
  // of DIFFERENT-type sessions of the same user that overlap in time — "align
  // the user's purchase sessions with their browse sessions". Naive spelling
  // is a range-condition self-join Spark would nested-loop per user; here
  // both sides explode their bucket span (bucket width = the 30-min gap, so
  // a session covers O(duration/gap) buckets ~ a small constant) and join on
  // the EQUI key (user, bucket). Each overlapping pair meets in possibly
  // many buckets but is emitted in exactly ONE — the bucket containing the
  // later start (greatest(a_start, b_start), which lies inside both
  // intervals) — so no distinct pass is needed. All interval math is exact
  // micros longs.
  /** Generic interval-overlap join: all (a, b) row pairs sharing `key` whose
    * half-open intervals [aStart, aEnd) and [bStart, bEnd) intersect. Both
    * sides explode their bucket span (`bucketWidth` buckets of the
    * timestamp domain — size it near the typical interval length so the
    * explode factor stays O(1)) and hash-join on (key, bucket); a pair that
    * shares several buckets is emitted in exactly ONE — the bucket holding
    * the later start, which lies inside both intervals — so no dedup pass
    * runs. Column names across `a` and `b` must be disjoint except `key`. */
  private[graft] def overlapJoin(a: DataFrame, b: DataFrame, key: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketWidth: Long): DataFrame = {
    val ax = a.withColumn("_jb",
      explode(expr(s"sequence($aStart div $bucketWidth, ($aEnd - 1) div $bucketWidth)")))
    val bx = b.withColumn("_jb",
      explode(expr(s"sequence($bStart div $bucketWidth, ($bEnd - 1) div $bucketWidth)")))
    ax.join(bx, Seq(key, "_jb"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("_jb") === expr(s"greatest($aStart, $bStart) div $bucketWidth"))
      .drop("_jb")
  }

  private val t7 = GQuery(
    "t7_interval_overlap_join",
    (s, dir) => {
      val sess = t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"),
          session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(session_window.start)").as("s_us"),
          expr("unix_micros(session_window.end)").as("e_us"))
      val a = sess.select(col("user_id"), col("event_type").as("type_a"),
        col("s_us").as("a_start"), col("e_us").as("a_end"))
      val b = sess.select(col("user_id"), col("event_type").as("type_b"),
        col("s_us").as("b_start"), col("e_us").as("b_end"))
      overlapJoin(a, b, "user_id", "a_start", "a_end", "b_start", "b_end",
          bucketWidth = SessionGapUs)
        .filter(col("type_a") < col("type_b"))
        .select(col("user_id"), col("type_a"), col("type_b"),
          col("a_start"), col("b_start"),
          (least(col("a_end"), col("b_end"))
            - greatest(col("a_start"), col("b_start"))).as("overlap_us"))
    },
    Some(s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
            |flagged AS (
            |  SELECT user_id, event_type, us,
            |    CASE WHEN lag(us) OVER w IS NULL
            |           OR us - lag(us) OVER w > $SessionGapUs THEN 1 ELSE 0 END AS new_sess
            |  FROM ev
            |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY us)),
            |islands AS (
            |  SELECT user_id, event_type, us,
            |    sum(new_sess) OVER (PARTITION BY user_id, event_type ORDER BY us
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
            |  FROM flagged),
            |sess AS (SELECT user_id, event_type, min(us) AS s_us,
            |           max(us) + $SessionGapUs AS e_us
            |         FROM islands GROUP BY user_id, event_type, sess_id)
            |SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
            |  a.s_us AS a_start, b.s_us AS b_start,
            |  least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us
            |FROM sess a JOIN sess b
            |  ON a.user_id = b.user_id AND a.event_type < b.event_type
            |  AND a.s_us < b.e_us AND b.s_us < a.e_us""".stripMargin),
    doc = "Interval-overlap join: cross-type session pairs via bucketed equi-join, emit-once (temporal #7).")

  // ---- T8: point-in-time multi-feature join ---------------------------------
  // The feature-store read that generates training data without leakage:
  // for every label event (purchase), attach each feature table's latest
  // prior-or-equal state — here TWO feature streams (clicks, views) chained
  // through the as-of operator, plus the staleness of the click feature
  // (the quantity a feature-freshness SLO monitors). Chaining as-ofs is the
  // point: each join is one key-partitioned sort-window pass, so F feature
  // tables cost F passes, never a per-row lookup — and nothing after the
  // event's own timestamp can leak in by construction.
  private val t8 = GQuery(
    "t8_pit_feature_join",
    (s, dir) => {
      val ev = micros(s, dir)
        .filter(col("event_type").isin("purchase", "click", "view"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("us"),
          col("us").as("click_us"), col("value").as("click_value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("us"),
          col("us").as("view_us"), col("value").as("view_value"))
      val withClick = asofJoin(purchases, clicks, key = "user_id",
        leftTs = "us", rightTs = "us",
        payload = Seq("click_us", "click_value"), tieBreak = "event_id")
      asofJoin(withClick, views, key = "user_id",
          leftTs = "us", rightTs = "us",
          payload = Seq("view_us", "view_value"), tieBreak = "event_id")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("us").as("purchase_us"),
          col("click_us"), col("click_value"),
          col("view_us"), col("view_value"),
          (col("us") - col("click_us")).as("click_staleness_us"))
    },
    Some("""WITH ev AS (
           |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us, value
           |  FROM events WHERE event_type IN ('purchase', 'click', 'view')),
           |enriched AS (
           |  SELECT event_id, user_id, event_type, us,
           |    last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
           |      OVER w AS click_us,
           |    last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
           |      OVER w AS click_value,
           |    last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
           |      OVER w AS view_us,
           |    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
           |      OVER w AS view_value
           |  FROM ev
           |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           |SELECT event_id AS purchase_id, user_id, us AS purchase_us,
           |  click_us, click_value, view_us, view_value,
           |  us - click_us AS click_staleness_us
           |FROM enriched WHERE event_type = 'purchase'""".stripMargin),
    doc = "Point-in-time feature join: two as-of feature streams chained onto the label spine, leak-free with staleness (temporal #8).")

  // ---- T9: gap-fill / resample with last-observation-carried-forward --------
  // The feature-store resample shape: a fixed hourly grid per entity, the
  // sparse observations attached, and gaps filled with the most recent
  // observed value (LOCF). The grid is entities × horizon — its size is
  // independent of event count, and the explode is map-side (no shuffle to
  // build it). LOCF is a running `last(ignoreNulls)` over a PER-ENTITY
  // window ordered by the grid hour: state is one value per partition, and
  // the partition is horizon-bounded (168 rows here) no matter how large
  // the corpus grows. Hours before an entity's first observation stay null
  // on both engines. The observed value is max() per hour — selection, not
  // arithmetic — so fills compare bit-exactly.
  private val t9 = GQuery(
    "t9_gap_fill_locf",
    (s, dir) => {
      val ev = t(s, dir, "events").filter(col("ts") < "2024-01-08")
      val hourSec = ((unix_timestamp(col("ts")) / 3600).cast("long") * 3600)
      val obs = ev.groupBy(col("user_id"), hourSec.as("hour_sec"))
        .agg(max(col("value")).as("v_obs"))
      val grid = ev.select(col("user_id")).distinct()
        .select(col("user_id"), explode(sequence(lit(0L), lit(167L))).as("h"))
        .select(col("user_id"), (lit(1704067200L) + col("h") * 3600L).as("hour_sec"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour_sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "hour_sec"), "left")
        .withColumn("v_fill", last(col("v_obs"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("hour_sec"), col("v_fill"),
          col("v_obs").isNotNull.cast("int").as("is_observed"))
    },
    Some("""WITH ev AS (SELECT * FROM events WHERE ts < '2024-01-08'),
           |grid AS (
           |  SELECT user_id, 1704067200 + 3600 * g.x AS hour_sec
           |  FROM (SELECT DISTINCT user_id FROM ev)
           |  CROSS JOIN (SELECT unnest(generate_series(0, 167)) AS x) g),
           |obs AS (
           |  SELECT user_id, CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_sec,
           |    max(value) AS v_obs
           |  FROM ev GROUP BY 1, 2)
           |SELECT g.user_id, g.hour_sec,
           |  last_value(o.v_obs IGNORE NULLS) OVER (
           |    PARTITION BY g.user_id ORDER BY g.hour_sec
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill,
           |  CAST(o.v_obs IS NOT NULL AS INT) AS is_observed
           |FROM grid g LEFT JOIN obs o
           |  ON g.user_id = o.user_id AND g.hour_sec = o.hour_sec""".stripMargin),
    doc = "Hourly resample + LOCF gap-fill per entity: fixed grid, per-key bounded window (temporal #9).")

  // ---- T10: calendar-dimension join (generated date spine) -------------------
  // The dbt-utils date-spine pattern: GENERATE the calendar (no seed
  // table), flag each day, and join facts onto it — the backbone of
  // business-day and seasonality rollups. The facts PRE-AGGREGATE to one
  // row per day FIRST (map-side partials collapse the corpus to the
  // horizon size), then the day table left-joins onto the spine with the
  // tiny aggregate broadcast — the only outer-join shape a broadcast hash
  // join can actually serve here (the preserved side of an outer join
  // cannot be the build side, so "broadcast the spine against raw facts"
  // would silently sort-merge the full fact table at scale). It also
  // keeps the spine un-fanned, so day-level flags aggregate to DAY counts.
  // Day-of-week numbering is pinned explicitly (Spark's dayofweek is
  // 1=Sunday, DuckDB's is 0=Sunday — the oracle adds 1) because silent
  // calendar-convention drift is the classic cross-engine reporting bug.
  private val t10 = GQuery(
    "t10_calendar_spine_join",
    (s, dir) => {
      val spine = s.range(1)
        .select(explode(expr(
          "sequence(to_date('1996-01-01'), to_date('1996-12-31'), interval 1 day)"))
          .as("d"))
        .select(col("d"), dayofweek(col("d")).as("dow"),
          dayofweek(col("d")).isin(1, 7).cast("int").as("is_weekend"),
          (last_day(col("d")) === col("d")).cast("int").as("is_month_end"))
      val perDay = t(s, dir, "orders")
        .select(to_date(col("o_orderdate")).as("od"), col("o_totalprice"))
        .groupBy(col("od"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("tot"))
      spine.join(broadcast(perDay), col("d") === col("od"), "left")
        .groupBy(col("dow"), col("is_weekend"))
        .agg(sum(coalesce(col("n"), lit(0L))).as("n_orders"),
          sum(coalesce(col("tot"), lit(java.math.BigDecimal.ZERO)))
            .cast("double").as("total"),
          sum(col("is_month_end")).cast("long").as("n_month_end_days"))
    },
    Some("""WITH spine AS (
           |  SELECT CAST(unnest(generate_series(DATE '1996-01-01', DATE '1996-12-31',
           |                                     INTERVAL 1 DAY)) AS DATE) AS d),
           |flags AS (
           |  SELECT d, dayofweek(d) + 1 AS dow,
           |    CAST(dayofweek(d) + 1 IN (1, 7) AS INT) AS is_weekend,
           |    CAST(last_day(d) = d AS INT) AS is_month_end
           |  FROM spine),
           |perday AS (
           |  SELECT CAST(o_orderdate AS DATE) AS od, count(*) AS n,
           |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
           |  FROM orders GROUP BY 1)
           |SELECT dow, is_weekend,
           |  CAST(sum(coalesce(n, 0)) AS BIGINT) AS n_orders,
           |  CAST(sum(coalesce(tot, 0)) AS DOUBLE) AS total,
           |  CAST(sum(is_month_end) AS BIGINT) AS n_month_end_days
           |FROM flags LEFT JOIN perday ON d = od
           |GROUP BY dow, is_weekend""".stripMargin),
    doc = "Generated date spine + per-day fact aggregate: calendar conventions pinned, broadcast-able join (temporal #10).")

  // ---- T11: named-timezone battery -------------------------------------------
  // IANA-zone conversions pinned across engines: whole-hour offset with DST
  // in effect (America/New_York, EST in the January corpus window),
  // HALF-hour offset (Asia/Kolkata +5:30 — the case that breaks
  // hour-arithmetic shortcuts), southern-hemisphere DST (Australia/Sydney
  // AEDT +11), and a Kolkata wall-clock round trip back to the epoch —
  // lossless because Kolkata has no DST, so no ambiguous local times exist
  // (a Berlin round trip would be lossy one hour a year). The corpus window
  // (January 2024) contains no transition, so every conversion is a pure
  // per-row offset — map-only, codegen'd; the oracle drives DuckDB's ICU
  // path via timezone('UTC', ts) -> instant -> timezone(zone, instant).
  private val t11 = GQuery(
    "t11_timezone_battery",
    (s, dir) => t(s, dir, "events").select(
      col("event_id"),
      date_format(from_utc_timestamp(col("ts"), "America/New_York"),
        "yyyy-MM-dd HH:mm:ss").as("ny_wall"),
      hour(from_utc_timestamp(col("ts"), "Asia/Kolkata")).as("kolkata_hour"),
      date_format(from_utc_timestamp(col("ts"), "Australia/Sydney"),
        "yyyy-MM-dd").as("sydney_date"),
      unix_timestamp(to_utc_timestamp(
        from_utc_timestamp(col("ts"), "Asia/Kolkata"), "Asia/Kolkata"))
        .as("roundtrip_s")),
    Some("""SELECT event_id,
           |  strftime(timezone('America/New_York', timezone('UTC', ts)),
           |           '%Y-%m-%d %H:%M:%S') AS ny_wall,
           |  CAST(extract(hour FROM timezone('Asia/Kolkata', timezone('UTC', ts)))
           |    AS INT) AS kolkata_hour,
           |  strftime(timezone('Australia/Sydney', timezone('UTC', ts)),
           |           '%Y-%m-%d') AS sydney_date,
           |  CAST(floor(epoch(ts)) AS BIGINT) AS roundtrip_s
           |FROM events""".stripMargin),
    doc = "IANA timezone battery: whole/half-hour offsets, southern DST, lossless round trip (temporal #11).")

  // ---- T12: cohort retention matrix ------------------------------------------
  // The product-analytics backbone: users cohorted by FIRST-seen day, then
  // counted per (cohort, day-offset) — the retention triangle. Two hash
  // aggregates and one join, all keyed by user/cohort: the first-seen
  // aggregate is a per-user min (map-side partials), the activity set is a
  // (user, day) distinct, and the matrix is cohort-x-horizon-sized — tiny
  // regardless of event volume. No windows, no self-join explosion.
  private val t12 = GQuery(
    "t12_cohort_retention",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = e.groupBy(col("user_id"))
        .agg(min(col("d")).as("cohort_d"))
      val act = e.distinct()
      act.join(first, "user_id")
        .select(col("cohort_d"), datediff(col("d"), col("cohort_d")).as("offset_days"))
        .groupBy(col("cohort_d"), col("offset_days"))
        .agg(count(lit(1)).as("n_users"))
        .select(col("cohort_d").cast("string").as("cohort_day"),
          col("offset_days"), col("n_users"))
    },
    Some("""WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
           |f AS (SELECT user_id, min(d) AS cohort_d FROM e GROUP BY user_id)
           |SELECT CAST(cohort_d AS VARCHAR) AS cohort_day,
           |  CAST(d - cohort_d AS INT) AS offset_days,
           |  count(*) AS n_users
           |FROM e JOIN f USING (user_id)
           |GROUP BY cohort_d, d - cohort_d""".stripMargin),
    doc = "Cohort retention: first-seen cohorts x day offsets, two hash aggs + one join (temporal #12).")

  // ---- T13: ordered event funnel ---------------------------------------------
  // Sequence-constrained conversion: view -> first click AFTER the view ->
  // first purchase AFTER that click, per user. Each stage is a conditional
  // min aggregate joined back (stage state = one timestamp per user) —
  // never a window over the event stream, never an events x events
  // self-join, so the plan's cost is three user-keyed aggregates no matter
  // how deep the event history is. Output is the one-row funnel summary.
  private val t13 = GQuery(
    "t13_event_funnel",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
      val v = e.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("tv"))
      val c = e.join(v, "user_id")
        .groupBy(col("user_id"), col("tv"))
        .agg(min(when(col("event_type") === "click" && col("ts") > col("tv"),
          col("ts"))).as("tc"))
      val p = e.join(c, "user_id")
        .groupBy(col("user_id"), col("tv"), col("tc"))
        .agg(min(when(col("event_type") === "purchase" && col("ts") > col("tc"),
          col("ts"))).as("tp"))
      p.agg(count(lit(1)).as("n_users"),
        count(col("tv")).as("n_view"),
        count(col("tc")).as("n_click_after_view"),
        count(col("tp")).as("n_purchase_after_click"))
    },
    Some("""WITH v AS (
           |  SELECT user_id,
           |    min(CASE WHEN event_type = 'view' THEN ts END) AS tv
           |  FROM events GROUP BY user_id),
           |c AS (
           |  SELECT e.user_id, v.tv,
           |    min(CASE WHEN event_type = 'click' AND ts > tv THEN ts END) AS tc
           |  FROM events e JOIN v USING (user_id) GROUP BY e.user_id, v.tv),
           |p AS (
           |  SELECT e.user_id, c.tv, c.tc,
           |    min(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END) AS tp
           |  FROM events e JOIN c USING (user_id) GROUP BY e.user_id, c.tv, c.tc)
           |SELECT count(*) AS n_users, count(tv) AS n_view,
           |  count(tc) AS n_click_after_view,
           |  count(tp) AS n_purchase_after_click
           |FROM p""".stripMargin),
    doc = "Ordered funnel: chained conditional-min stages, per-user state of one timestamp (temporal #13).")

  // ---- T14: OHLC resampling ---------------------------------------------------
  // The finance-style downsample every metrics store runs: per (user, 15-min
  // bar) open/high/low/close + volume in ONE hash aggregate — open/close are
  // min_by/max_by on the timestamp orderer, so there is no window sort and
  // no per-bar event buffering; state per group is five scalars at any
  // event volume. (user_id, ts) is unique in the corpus (the i5 contract),
  // so the argmin/argmax picks are tie-free and the oracle pin is exact.
  // Values leave as raw doubles (straight from parquet, no arithmetic) and
  // the volume sum is DECIMAL — nothing order-sensitive anywhere.
  private val t14 = GQuery(
    "t14_ohlc_resample",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"),
          (floor(unix_timestamp(col("ts")) / 900) * 900).cast("long").as("bar_start"))
        .agg(
          min_by(col("value"), col("ts")).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), col("ts")).as("close"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("volume")),
    Some("""SELECT user_id,
           |  CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS bar_start,
           |  arg_min(value, ts) AS open,
           |  max(value) AS high,
           |  min(value) AS low,
           |  arg_max(value, ts) AS close,
           |  count(*) AS n_events,
           |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume
           |FROM events GROUP BY 1, 2""".stripMargin),
    doc = "OHLC downsample: per-(user, 15-min bar) open/high/low/close in one hash aggregate (temporal #14).")

  // ---- T15: FORWARD as-of join ----------------------------------------------
  // merge_asof(direction='forward'): for each click, the EARLIEST view
  // at-or-after it — the reaction-to-impression shape (t1 runs backward).
  // Implemented by running the same union-tag as-of machinery on NEGATED
  // (ts, tie) keys: latest-prior on (-ts, -id) IS earliest-later on
  // (ts, id), so the one window implementation serves both directions and
  // inherits t1's scale shape (one shuffle by user, bounded window state).
  // Same-ts tie contract matches t1's mirror-image: a same-ts view pairs
  // when its id is LARGER than the click's (t1: smaller).
  private val t15 = GQuery(
    "t15_asof_join_forward",
    (s, dir) => {
      val ev = micros(s, dir).filter(col("event_type").isin("click", "view"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("us"),
          (-col("us")).as("nus"), (-col("event_id")).as("ntb"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("us"),
          (-col("us")).as("nus"), (-col("event_id")).as("ntb"),
          col("us").as("view_us"), col("value").as("view_value"))
      asofJoin(clicks, views, key = "user_id", leftTs = "nus", rightTs = "nus",
        payload = Seq("view_us", "view_value"), tieBreak = "ntb")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("click_us"), col("view_us"), col("view_value"))
    },
    Some("""WITH ev AS (
           |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us, value
           |  FROM events WHERE event_type IN ('click', 'view')),
           |enriched AS (
           |  SELECT event_id, user_id, event_type, us,
           |    first_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY us, event_id
           |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS view_us,
           |    first_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY us, event_id
           |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS view_value
           |  FROM ev)
           |SELECT event_id AS click_id, user_id, us AS click_us, view_us, view_value
           |FROM enriched WHERE event_type = 'click'""".stripMargin),
    doc = "Forward as-of join: earliest at-or-after view per click via the negated-key backward machinery (temporal #15).")

  // ---- T16: session windows with DYNAMIC per-event gaps ----------------------
  // t3's gap is one constant; real sessionization keys the timeout on the
  // event (a click holds attention 10 min, a passive view 30). Spark's
  // session_window takes a gap EXPRESSION — each event contributes
  // [ts, ts+gap(event)) and overlapping windows merge, so the session end
  // is max(ts+gap), not last-event+constant. The oracle restates exactly
  // that with a running max-end island scan: a new session starts iff ts
  // lands STRICTLY past every prior event's window end — an event exactly
  // AT the boundary merges (verified against Spark's session_window; the
  // same at-boundary-merges convention as t3's `diff > gap` oracle and the
  // streaming sessionizer's `diff <= gap`). Same scale shape as t3: one
  // shuffle by user, merging state bounded per key.
  private val t16 = GQuery(
    "t16_session_window_dynamic_gap",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"),
            when(col("event_type") === "click", "10 minutes")
              .otherwise("30 minutes")).as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total"))
        .select(col("user_id"),
          expr("unix_micros(sw.start)").as("sess_start_us"),
          expr("unix_micros(sw.end)").as("sess_end_us"),
          col("n_events"), col("total")),
    Some("""WITH ev AS (
           |  SELECT user_id, epoch_us(ts) AS us, value,
           |    CASE WHEN event_type = 'click' THEN 600000000
           |         ELSE 1800000000 END AS gap
           |  FROM events),
           |o AS (
           |  SELECT *, max(us + gap) OVER (PARTITION BY user_id ORDER BY us
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
           |  FROM ev),
           |fl AS (
           |  SELECT *, CASE WHEN prev_end IS NULL OR us > prev_end
           |                 THEN 1 ELSE 0 END AS brk
           |  FROM o),
           |isl AS (
           |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           |  FROM fl)
           |SELECT user_id, min(us) AS sess_start_us, max(us + gap) AS sess_end_us,
           |  count(*) AS n_events,
           |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
           |FROM isl GROUP BY user_id, sess""".stripMargin),
    doc = "Session windows with per-event dynamic gaps: merged end = max(ts+gap), islands oracle (temporal #16).")

  // ---- T17: time-weighted average (TWAP) --------------------------------------
  // The mean that respects DURATION, not sample count: each observation
  // holds until the next one, so its weight is the interval length — the
  // standard TWAP/monitoring aggregate for irregularly-sampled series
  // (a plain avg over-weights bursts of rapid events). One per-user lead()
  // window derives the hold durations (bounded state), the last
  // observation carries no interval and is excluded on both engines, and
  // the weighted sum follows the decimal-term discipline (round 6, sum
  // DECIMAL, ONE double division by the exact integer duration total).
  // Durations weight in WHOLE SECONDS (truncating div, identical both
  // engines; sub-second gaps weight 0 and drop): micro-weighted decimal
  // sums exceed 2^53, where the two engines' decimal->double conversions
  // round differently in the last ulp — second-weighted sums stay exactly
  // double-representable, so the division operands are bit-identical.
  private val t17 = GQuery(
    "t17_time_weighted_avg",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      micros(s, dir)
        .withColumn("nus", lead(col("us"), 1).over(w))
        .filter(col("nus").isNotNull)
        .withColumn("dur", expr("(nus - us) div 1000000L"))
        .filter(col("dur") > 0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dur")).as("total_s"),
          (sum(round(col("value") * col("dur"), 6).cast("decimal(28,6)"))
            .cast("double") / sum(col("dur"))).as("twap"))
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
           |seq AS (
           |  SELECT user_id, value, us,
           |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nus
           |  FROM ev),
           |iv AS (SELECT user_id, value, (nus - us) // 1000000 AS dur
           |       FROM seq WHERE nus IS NOT NULL),
           |iv2 AS (SELECT * FROM iv WHERE dur > 0)
           |SELECT user_id, count(*) AS n_intervals,
           |  CAST(sum(dur) AS BIGINT) AS total_s,
           |  CAST(sum(CAST(round(value * dur, 6) AS DECIMAL(28,6))) AS DOUBLE)
           |    / CAST(sum(dur) AS BIGINT) AS twap
           |FROM iv2 GROUP BY user_id""".stripMargin),
    doc = "Time-weighted average: hold-until-next weighting via lead(), decimal-summed second weights (temporal #17).")

  override val all: Seq[GQuery] =
    Seq(t1, t2, t3, t4, t5, t6, t7, t8, t9, t10, t11, t12, t13, t14, t15, t16, t17)
}
