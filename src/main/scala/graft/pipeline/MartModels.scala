package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Main-layer marts (SURVEY.md §7.2 M1/M5). Note `mart_sgp_factors` is
  * consumed by STAGE models — the DAG's back-edge (SURVEY.md §3.1). */
object MartModels {

  private val cats = Seq("R", "HR", "RBI", "SB", "AVG", "K", "W", "S", "ERA", "WHIP")

  /** models/main/mart_sgp_factors.sql — long→wide pivot via max(CASE WHEN)
    * (A4), kept as the literal case-when translation for bit-exactness. */
  val sgpFactors: Model = Model("mart_sgp_factors", Seq("stg_nfbc_sgp_factors"))((_, in) =>
    in("stg_nfbc_sgp_factors").groupBy(col("_filename"))
      .agg(max(when(col("category") === cats.head, col("sgp_value"))).as("sgp_" + cats.head.toLowerCase),
        cats.tail.map(c =>
          max(when(col("category") === c, col("sgp_value"))).as("sgp_" + c.toLowerCase)): _*))

  /** models/main/mart_sgp_percentiles.sql — 10-way unpivot (U2) + sign-flip
    * for ascending metrics (P12) + percentiles (A8). Exact `percentile`
    * instead of Presto's approx_percentile: groups are tens of rows, and the
    * exact form is oracle-stable (SURVEY.md §2.4 A8). */
  val sgpPercentiles: Model = Model("mart_sgp_percentiles", Seq("src_nfbc_standings"))((_, in) => {
    val st = in("src_nfbc_standings")
    def cat(name: String, c: Column): DataFrame =
      st.select(col("_filename"), lit(name).as("category"), c.cast(DoubleType).as("val"))
    val base =
      cat("R", col("r")).union(cat("HR", col("hr"))).union(cat("RBI", col("rbi")))
        .union(cat("SB", col("sb"))).union(cat("AVG", col("avg"))).union(cat("K", col("k")))
        .union(cat("W", col("w"))).union(cat("S", col("s")))
        .union(cat("ERA", col("era").cast(DoubleType) * -1))
        .union(cat("WHIP", col("whip").cast(DoubleType) * -1))
    val flip = when(col("category").isin("ERA", "WHIP"), lit(-1.0)).otherwise(lit(1.0))
    base.groupBy(col("_filename"), col("category"))
      .agg(expr("percentile(val, 0.8)").as("p80_raw"), expr("percentile(val, 0.9)").as("p90_raw"))
      .select(col("_filename"), col("category"),
        (col("p80_raw") * flip).as("p80"), (col("p90_raw") * flip).as("p90"))
  })

  /** models/main/mart_preseason_overall_rankings_{oc,50s}.sql — null-padded
    * hitter+pitcher union (U4), ADP left join with filename literal (J5),
    * roster enrichment (J3), global value rank (W4). */
  def overallRankings(f: LeagueFormat): Model = Model(
    s"mart_preseason_overall_rankings_${f.key}",
    Seq(s"stg_proj_preseason_hitting_values_${f.key}",
      s"stg_proj_preseason_pitching_values_${f.key}",
      "src_fangraphs_opening_day_rosters", "stg_mpd_player_id_map",
      "src_nfbc_adp"))((_, in) => {
    val nullD = lit(null).cast(DoubleType)
    val hit = in(s"stg_proj_preseason_hitting_values_${f.key}").select(
      col("id"), col("name"), col("team"), col("pos"), col("position"), col("pos_group"),
      col("pa"), col("ab"), col("h"), col("x1b"), col("x2b"), col("x3b"),
      col("r"), col("hr"), col("rbi"), col("sb"), col("bb"), col("hbp"),
      col("avg"), col("obp"), col("slg"),
      nullD.as("ip"), nullD.as("er"), nullD.as("w"), nullD.as("qs"), nullD.as("k"),
      nullD.as("sv"), nullD.as("era"), nullD.as("whip"), nullD.as("k_per_9"),
      col("r_sgp"), col("hr_sgp"), col("rbi_sgp"), col("sb_sgp"), col("avg_sgp"),
      nullD.as("w_sgp"), nullD.as("k_sgp"), nullD.as("sv_sgp"), nullD.as("era_sgp"),
      nullD.as("whip_sgp"),
      col("sgp"), col("replvl"), col("sgpar"), col("value"))
    val pit = in(s"stg_proj_preseason_pitching_values_${f.key}").select(
      col("id"), col("name"), col("team"), col("pos"), col("position"),
      lit("P").as("pos_group"),
      nullD.as("pa"), nullD.as("ab"), col("h"), nullD.as("x1b"), nullD.as("x2b"),
      nullD.as("x3b"), nullD.as("r"), nullD.as("hr"), nullD.as("rbi"), nullD.as("sb"),
      col("bb"), nullD.as("hbp"), nullD.as("avg"), nullD.as("obp"), nullD.as("slg"),
      col("ip"), col("er"), col("w"), col("qs"), col("k"), col("sv"),
      col("era"), col("whip"), col("k_per_9"),
      nullD.as("r_sgp"), nullD.as("hr_sgp"), nullD.as("rbi_sgp"), nullD.as("sb_sgp"),
      nullD.as("avg_sgp"),
      col("w_sgp"), col("k_sgp"), col("sv_sgp"), col("era_sgp"), col("whip_sgp"),
      col("sgp"), col("replvl"), col("sgpar"), col("value"))
    val base = hit.union(pit)
    val rosters = in("src_fangraphs_opening_day_rosters").as("rost")
      .filter(col("playerid") =!= "") // '' spine-key guard (StageModels rule)
      .join(in("stg_mpd_player_id_map").as("ids"),
        col("rost.playerid") === col("ids.idfangraphs"))
      .filter(concat(col("rost.playerid"), col("rost.pos")) =!= "19755SP")
      .select(col("ids.id").as("rost_id"), col("rost.projected_opening_day_status"))
    val adp = in("src_nfbc_adp")
      .filter(col("_filename") === f.adpFile)
      .select(col("playerid").as("adp_playerid"), col("adp"),
        col("min_pick"), col("max_pick"))
    // id tiebreak: equal-value players would otherwise rank in shuffle
    // order under the golden-digest gate (the rep-lvl pool discipline)
    val wRank = Window.orderBy(col("value").desc, col("id"))
    base
      .join(adp, base("id") === col("adp_playerid"), "left")
      .join(rosters, base("id") === col("rost_id"), "left")
      .withColumn("rank", row_number().over(wRank))
      .select(Seq(col("rank")) ++ base.columns.map(col) ++ Seq(
        col("adp").cast(DoubleType).as("adp"),
        col("min_pick").cast("int").as("min_pick"),
        col("max_pick").cast("int").as("max_pick"),
        (col("adp").cast(DoubleType) - col("rank")).as("rank_diff"),
        col("projected_opening_day_status")): _*)
      .orderBy(col("value").desc, col("id"))
  })

  val all: Seq[Model] = Seq(sgpFactors, sgpPercentiles) ++
    LeagueFormat.all.map(overallRankings)
}
