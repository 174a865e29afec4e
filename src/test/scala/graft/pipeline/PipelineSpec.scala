package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end run of the reference-parity DAG over generated fixtures
  * (SURVEY.md §5 items 2/5): model semantics, snapshot filters, cascade
  * pools, SGP math (slope hand-checked), dollar-budget invariant, marts.
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var out: Map[String, DataFrame] = _
  private val root = Files.createTempDirectory("graft-fixtures").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    FixtureGen.generate(root)
    // materialized (dbt-style) mode: one pass builds all 40 models to parquet,
    // so each assertion below reads a table instead of recomputing the DAG
    out = Pipeline.run(spark, root,
      materializeDir = Some(Files.createTempDirectory("graft-mat").toString))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("DAG wires all 40 reference models and orders the mart->stage back-edge") {
    val names = Pipeline.models(root).map(_.name)
    assert(names.size == 40, s"expected 40 models, got ${names.size}: $names")
    val order = Pipeline.runner(root).topoOrder
    assert(order.indexOf("mart_sgp_factors") <
      order.indexOf("stg_proj_preseason_hitting_sgp_oc"),
      "mart_sgp_factors must build before the stage models that consume it")
  }

  test("S4 latest-snapshot filter keeps only the newest ingest date") {
    val pl = out("src_nfbc_players")
    assert(pl.select("_ptkey").distinct().collect().map(_.getString(0)).toSeq == Seq("2026210"))
    // the stale 3-row snapshot from 2026-01-05 must not leak through
    assert(pl.count() == FixtureGen.hitters.size + FixtureGen.pitchers.size + 1)
  }

  test("S5 per-file snapshot: both ADP format files survive with their own dates") {
    val adp = out("src_nfbc_adp")
    val files = adp.select("_filename", "_ptkey").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(files == Map("OC_ADP.tsv" -> "2026211", "Fifties_ADP.tsv" -> "2026212"))
  }

  test("id map drops all-empty rows and collapses duplicates") {
    val ids = out("stg_mpd_player_id_map")
    assert(!ids.select("id").collect().map(_.getString(0)).contains("n9999"))
    assert(ids.filter(col("id") === "n1").count() == 1)
    val name1 = ids.filter(col("id") === "n1").select("name").first().getString(0)
    assert(name1 == "First1 Last1") // "Last, First" -> "First Last"
  }

  test("ranked standings: rank_r inverts r ordering per (file, league)") {
    val rs = out("stg_nfbc_ranked_standings")
      .filter(col("_filename") === "NFBC OC 2025 Overall Standings.csv" && col("league") === "L1")
      .select("r", "rank_r").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rs.length == 12)
    val sorted = rs.sortBy(-_._1).map(_._2)
    assert(sorted.toSeq == (1 to 12), s"rank_r should be 1..12 by r desc, got ${sorted.toSeq}")
  }

  test("SGP factor slope matches hand-computed least squares") {
    // replicate stg_nfbc_sgp_inputs + stg_nfbc_sgp_factors for (OC file, HR)
    // directly from the ranked standings output
    val rows = out("stg_nfbc_ranked_standings")
      .filter(col("_filename") === "NFBC OC 2025 Overall Standings.csv")
      .select("league", "rank_hr", "hr").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .filter { case (_, rk, _) => rk >= 3 && rk <= 10 }
    val byRank = rows.groupBy(_._2).map { case (rk, g) =>
      (13.0 - rk, g.map(_._3.toDouble).sum / g.size)
    }.toSeq
    val n = byRank.size.toDouble
    val (sx, sy) = (byRank.map(_._1).sum, byRank.map(_._2).sum)
    val sxy = byRank.map(p => p._1 * p._2).sum
    val sx2 = byRank.map(p => p._1 * p._1).sum
    val expected = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    val got = out("mart_sgp_factors")
      .filter(col("_filename") === "NFBC OC 2025 Overall Standings.csv")
      .select("sgp_hr").first().getDouble(0)
    assert(math.abs(got - expected) < 1e-9, s"slope $got != $expected")
  }

  test("pitching agg excludes the hardcoded id and blends saves without thebat") {
    val agg = out("stg_proj_preseason_pitching_agg")
    assert(agg.filter(col("id") === FixtureGen.excludedPitcherId).count() == 0)
    // relievers (sv > 0 in fixtures) keep positive blended saves
    assert(agg.filter(col("sv") > 0).count() >= 5)
  }

  test("hitting rep_lvl: one row per position incl. the UT max-of-mins append") {
    val rl = out("stg_proj_preseason_hitting_rep_lvl_oc").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // pool rows keep their TRUE position (MI/CI are pos_groups, not
    // positions), so rep_lvl holds the six real positions + the UT append
    assert(rl.keySet == Set("C", "1B", "2B", "3B", "SS", "OF", "UT"),
      s"positions: ${rl.keySet}")
    assert(rl("UT") == rl.removed("UT").values.max,
      "UT replacement level must equal the max of the other positions' minimums")
  }

  test("dollar values: sum of (value-1) over positive-sgpar players equals the budget") {
    val v = out("stg_proj_preseason_hitting_values_oc")
    val total = v.filter(col("sgpar") > 0)
      .agg(sum(col("value") - 1)).first().getDouble(0)
    assert(math.abs(total - LeagueFormat.Oc.hitBudget) < 1e-6,
      s"sum(value-1)=$total != budget ${LeagueFormat.Oc.hitBudget}")
  }

  test("overall rankings mart: contiguous ranks, value-sorted, joins applied") {
    val mart = out("mart_preseason_overall_rankings_oc")
    val rows = mart.select("rank", "value", "adp", "projected_opening_day_status")
      .orderBy("rank").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length), "ranks must be 1..N")
    val values = rows.map(_.getDouble(1))
    assert(values.zip(values.tail).forall { case (a, b) => a >= b }, "value must descend")
    // ADP joined from the OC file only, newest snapshot (offset 0.4)
    val adps = rows.flatMap(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
    assert(adps.nonEmpty && adps.forall(a => (a * 10).round % 10 == 4),
      s"expected OC ADP values ending .4, got ${adps.take(5).toSeq}")
    // roster exclusion: fgId 105 -> '19755' + SP is filtered from rosters
    val excluded = mart.filter(col("id") === FixtureGen.nfbcId(105))
      .select("projected_opening_day_status").collect()
    assert(excluded.forall(_.isNullAt(0)), "19755SP roster row must not join")
  }

  test("50s mart differs from oc only via constants and ADP file") {
    val oc = out("mart_preseason_overall_rankings_oc")
    val fifties = out("mart_preseason_overall_rankings_50s")
    assert(oc.count() == fifties.count())
    val a5 = fifties.select("adp").filter(col("adp").isNotNull).limit(5)
      .collect().map(_.getDouble(0))
    assert(a5.forall(a => (a * 10).round % 10 == 7),
      s"50s ADP must come from Fifties_ADP.tsv (.7 offsets), got ${a5.toSeq}")
  }

  test("serving queries: rankings pull and latest-year percentiles") {
    val serving = Pipeline.servingRankings(out("mart_preseason_overall_rankings_oc"))
    assert(serving.columns.take(2).toSeq == Seq("rank", "name"))
    assert(serving.count() > 0)
    val pct = Pipeline.servingPercentiles(spark, out("mart_sgp_percentiles"), "OC")
    val cats = pct.select("category").collect().map(_.getString(0)).toSet
    assert(cats == Set("R", "HR", "RBI", "SB", "AVG", "K", "W", "S", "ERA", "WHIP"))
    // ERA/WHIP sign-flip round-trips to positive values
    val era = pct.filter(col("category") === "ERA").select("p80").first().getDouble(0)
    assert(era > 0, s"ERA p80 should be positive after double sign-flip, got $era")
  }

  test("one player's SGP and dollar value recompute independently from upstream models") {
    // cross-model check: take hitter n8's blended stats + the OC factors and
    // redo the arithmetic of sgp_oc/values_oc in plain Scala
    val f = LeagueFormat.Oc
    val agg = out("stg_proj_preseason_hitting_agg")
      .filter(col("id") === "n8").first()
    val fac = out("mart_sgp_factors")
      .filter(col("_filename") === f.standingsFile).first()
    def d(r: org.apache.spark.sql.Row, c: String) = r.getAs[Double](c)
    val expectedSgp =
      d(agg, "r") / d(fac, "sgp_r") + d(agg, "hr") / d(fac, "sgp_hr") +
        d(agg, "rbi") / d(fac, "sgp_rbi") + d(agg, "sb") / d(fac, "sgp_sb") +
        ((d(agg, "h") + f.lgH) / (d(agg, "ab") + f.lgAb) - f.lgAvg) / d(fac, "sgp_avg")
    // n8 is single-position 1B (no multi-position bonus/penalty)
    val got = out("stg_proj_preseason_hitting_sgp_oc")
      .filter(col("id") === "n8").select("sgp").first().getDouble(0)
    assert(math.abs(got - expectedSgp) < 1e-9, s"sgp $got != $expectedSgp")
    // dollars: value = sgpar * budget / sum(positive sgpar) + 1
    val values = out("stg_proj_preseason_hitting_values_oc")
    val sumPos = values.filter(col("sgpar") > 0)
      .agg(sum("sgpar")).first().getDouble(0)
    val row = values.filter(col("id") === "n8")
      .select("sgpar", "value").first()
    val expectedValue = row.getDouble(0) * (f.hitBudget / sumPos) + 1
    assert(math.abs(row.getDouble(1) - expectedValue) < 1e-6,
      s"value ${row.getDouble(1)} != $expectedValue")
  }

  test("fused mode produces the same mart as materialized mode") {
    // fused: no per-model parquet breaks — Catalyst optimizes across the DAG.
    // Values may differ in low-order bits (double sums accumulate in a
    // different partition order), so compare with tolerance, ranks exactly.
    val fused = Pipeline.run(spark, root)("mart_preseason_overall_rankings_oc")
      .select(col("id"), col("rank").as("rank_f"), col("value").as("value_f"))
    val mat = out("mart_preseason_overall_rankings_oc")
      .select("id", "rank", "value")
    val joined = mat.join(fused, Seq("id")).collect()
    assert(joined.length == mat.count(), "same id set in both modes")
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("value") - r.getAs[Double]("value_f")) < 1e-9,
        s"value mismatch for ${r.getAs[String]("id")}")
    }
    // row_number over `value desc` has no tie-break (faithful to the
    // reference, SURVEY.md §7.4) — rank may permute within equal values, so
    // compare rank only up to value-ties: same id multiset per value bucket.
    def buckets(rows: Array[org.apache.spark.sql.Row], v: String) =
      rows.groupBy(r => math.round(r.getAs[Double](v) * 1e6))
        .view.mapValues(_.map(_.getAs[String]("id")).sorted.toSeq).toMap
    assert(buckets(joined, "value") == buckets(joined, "value_f"))
  }
}
