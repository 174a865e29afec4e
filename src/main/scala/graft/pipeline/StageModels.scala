package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-layer models: id spine, vendor rate normalization, and the NFBC
  * standings→SGP-factor chain (SURVEY.md §7.2 M1/M2).
  */
object StageModels {

  /** models/stage/mapping/stg_mpd_player_id_map.sql — conform 5 vendors' ids
    * into one spine; "Last, First" → "First Last"; empty-string (not null)
    * id tests; DISTINCT to collapse duplicates. */
  val idMap: Model = Model("stg_mpd_player_id_map",
    Seq("src_nfbc_players", "src_mpd_player_id_map"))((_, in) => {
    val players = in("src_nfbc_players")
    val ids = in("src_mpd_player_id_map")
    players.join(ids, players("id") === ids("nfbcid"), "left")
      .filter(col("mlbid") =!= "" || col("idfangraphs") =!= "" ||
        col("underdog") =!= "" || col("razzballid") =!= "" || col("bpid") =!= "")
      .select(
        players("id"),
        // try_element_at: one malformed name without ", " must yield a
        // null name (the reference's Presto element_at semantics), not
        // abort the DAG with ANSI INVALID_ARRAY_INDEX
        concat(expr("try_element_at(split(players, ', '), 2)"), lit(" "),
          expr("try_element_at(split(players, ', '), 1)")).as("name"),
        players("team"), players("pos"),
        col("mlbid"), col("idfangraphs"), col("underdog"), col("razzballid"), col("bpid"))
      .distinct()
  })

  private val hitStats = Seq("ab", "h", "x1b", "x2b", "x3b", "r", "hr", "rbi", "sb")
  private val hitRates = Seq("avg", "obp", "slg")

  /** Shared shape of stg_{fg,razzball}_proj_preseason_hitting_per_pa:
    * counting stats → per-PA rates, joined to the id spine. */
  private def hittingPerPa(src: DataFrame, ids: DataFrame, joinCol: String,
      suffix: String): DataFrame = {
    val pa = col("pa").cast("double")
    // nullif-style zero guard (the P8 discipline sgpFactors already uses):
    // a 0-PA row must rate as null, not abort the model under ANSI
    // DIVIDE_BY_ZERO
    val paSafe = when(pa =!= 0.0, pa)
    val stats = hitStats.map(c => (col(c).cast("double") / paSafe).as(c)) ++
      hitRates.map(c => col(c).cast("double").as(c)) ++
      Seq((col("bb").cast("double") / paSafe).as("bb_r"),
        (col("hbp").cast("double") / paSafe).as("hbp_r"))
    // the id spine keeps '' for vendors a player lacks; an empty-keyed
    // source row must never equi-join the whole ''-keyed spine slice
    src.filter(src(joinCol) =!= "")
      .join(ids, src(joinCol) === ids(if (joinCol == "razzid") "razzballid" else "idfangraphs"))
      .select(Seq(ids("id"), ids("name"), ids("team"),
        regexp_replace(col("_filename"), suffix + "$", "").as("proj_system"),
        pa.as("pa")) ++ stats: _*)
      .withColumnRenamed("bb_r", "bb").withColumnRenamed("hbp_r", "hbp")
  }

  /** models/stage/fangraphs/stg_fg_proj_preseason_hitting_per_pa.sql */
  val fgHitPerPa: Model = Model("stg_fg_proj_preseason_hitting_per_pa",
    Seq("src_fangraphs_projections_preseason_hitting", "stg_mpd_player_id_map"))((_, in) =>
    hittingPerPa(in("src_fangraphs_projections_preseason_hitting"),
      in("stg_mpd_player_id_map"), "playerid", "-hit\\.csv"))

  /** models/stage/razzball/stg_razzball_proj_preseason_hitting_per_pa.sql */
  val razzHitPerPa: Model = Model("stg_razzball_proj_preseason_hitting_per_pa",
    Seq("src_razzball_projections_preseason_hitting", "stg_mpd_player_id_map"))((_, in) =>
    hittingPerPa(in("src_razzball_projections_preseason_hitting"),
      in("stg_mpd_player_id_map"), "razzid", "-hit\\.csv"))

  /** Shared shape of stg_{fg,razzball}_proj_preseason_pitching_per_ip.
    * Fangraphs names strikeouts `so` (aliased to k) and ships k_per_9/bb_per_9;
    * razzball has `k` and derives the per-9s (×9). */
  private def pitchingPerIp(src: DataFrame, ids: DataFrame, joinCol: String,
      kCol: String, hasPer9: Boolean): DataFrame = {
    val ip = col("ip").cast("double")
    val ipSafe = when(ip =!= 0.0, ip) // zero-IP guard, same as hittingPerPa
    val per9 =
      if (hasPer9) Seq(col("k_per_9").cast("double").as("k_per_9"),
        col("bb_per_9").cast("double").as("bb_per_9"))
      else Seq((col(kCol).cast("double") / ipSafe * 9).as("k_per_9"),
        (col("bb").cast("double") / ipSafe * 9).as("bb_per_9"))
    src.filter(src(joinCol) =!= "") // '' spine-key guard, same as hittingPerPa
      .join(ids, src(joinCol) === ids(if (joinCol == "razzid") "razzballid" else "idfangraphs"))
      .select(Seq(ids("id"), ids("name"), ids("team"),
        regexp_replace(col("_filename"), "-pitch\\.csv$", "").as("proj_system"),
        ip.as("ip"),
        (col("er").cast("double") / ipSafe).as("er_r"),
        (col("h").cast("double") / ipSafe).as("h_r"),
        (col("bb").cast("double") / ipSafe).as("bb_r"),
        (col("w").cast("double") / ipSafe).as("w_r"),
        (col("qs").cast("double") / ipSafe).as("qs_r"),
        (col(kCol).cast("double") / ipSafe).as("k_r"),
        (col("sv").cast("double") / ipSafe).as("sv_r"),
        col("era").cast("double").as("era"),
        col("whip").cast("double").as("whip")) ++ per9: _*)
      .withColumnRenamed("er_r", "er").withColumnRenamed("h_r", "h")
      .withColumnRenamed("bb_r", "bb").withColumnRenamed("w_r", "w")
      .withColumnRenamed("qs_r", "qs").withColumnRenamed("k_r", "k")
      .withColumnRenamed("sv_r", "sv")
  }

  /** models/stage/fangraphs/stg_fg_proj_preseason_pitching_per_ip.sql */
  val fgPitPerIp: Model = Model("stg_fg_proj_preseason_pitching_per_ip",
    Seq("src_fangraphs_projections_preseason_pitching", "stg_mpd_player_id_map"))((_, in) =>
    pitchingPerIp(in("src_fangraphs_projections_preseason_pitching"),
      in("stg_mpd_player_id_map"), "playerid", "so", hasPer9 = true))

  /** models/stage/razzball/stg_razzball_proj_preseason_pitching_per_ip.sql */
  val razzPitPerIp: Model = Model("stg_razzball_proj_preseason_pitching_per_ip",
    Seq("src_razzball_projections_preseason_pitching", "stg_mpd_player_id_map"))((_, in) =>
    pitchingPerIp(in("src_razzball_projections_preseason_pitching"),
      in("stg_mpd_player_id_map"), "razzid", "k", hasPer9 = false))

  /** models/stage/nfbc/stg_nfbc_ranked_standings.sql — 17 casts + 10 parallel
    * per-(file, league) category ranking windows (W1; ERA/WHIP ascend). */
  val rankedStandings: Model = Model("stg_nfbc_ranked_standings",
    Seq("src_nfbc_standings"))((_, in) => {
    // team appended as the tiebreaker: tied stat values are real (two
    // teams can share a win count), and row_number over a tie would
    // otherwise assign ranks by shuffle arrival order — nondeterministic
    // under the golden-digest gate
    def w(c: org.apache.spark.sql.Column) =
      Window.partitionBy(col("_filename"), col("league")).orderBy(c, col("team"))
    in("src_nfbc_standings").select(
      col("rank"), col("team"), col("owners"), col("league"),
      col("points").cast("double").as("points"),
      col("r").cast("int").as("r"), col("hr").cast("int").as("hr"),
      col("rbi").cast("int").as("rbi"), col("sb").cast("int").as("sb"),
      col("ab").cast("int").as("ab"), col("h").cast("int").as("h"),
      col("k").cast("int").as("k"), col("w").cast("int").as("w"),
      col("s").cast("int").as("s"), col("ip").cast("double").as("ip"),
      col("er").cast("int").as("er"), col("bb").cast("int").as("bb"),
      col("ha").cast("int").as("ha"), col("avg").cast("double").as("avg"),
      col("era").cast("double").as("era"), col("whip").cast("double").as("whip"),
      col("_ptkey"), col("_filename"), col("_loaddatetime"),
      row_number().over(w(col("r").cast("int").desc)).as("rank_r"),
      row_number().over(w(col("hr").cast("int").desc)).as("rank_hr"),
      row_number().over(w(col("rbi").cast("int").desc)).as("rank_rbi"),
      row_number().over(w(col("sb").cast("int").desc)).as("rank_sb"),
      row_number().over(w(col("avg").cast("double").desc)).as("rank_avg"),
      row_number().over(w(col("k").cast("int").desc)).as("rank_k"),
      row_number().over(w(col("w").cast("int").desc)).as("rank_w"),
      row_number().over(w(col("s").cast("int").desc)).as("rank_s"),
      row_number().over(w(col("era").cast("double").asc)).as("rank_era"),
      row_number().over(w(col("whip").cast("double").asc)).as("rank_whip"))
  })

  private val categories = Seq(
    ("R", "rank_r", "r"), ("HR", "rank_hr", "hr"), ("RBI", "rank_rbi", "rbi"),
    ("SB", "rank_sb", "sb"), ("AVG", "rank_avg", "avg"), ("K", "rank_k", "k"),
    ("W", "rank_w", "w"), ("S", "rank_s", "s"), ("ERA", "rank_era", "era"),
    ("WHIP", "rank_whip", "whip"))

  /** models/stage/nfbc/stg_nfbc_sgp_inputs.sql — 10-way unpivot (U2), league
    * routing on filename (P6), rank band filter (P9), per-rank AVG (A3),
    * rank→points ladder (P5): 15-team contests (ME/DC) use ranks 4-12 and
    * points 16-rank; 12-team use 3-10 and 13-rank. */
  val sgpInputs: Model = Model("stg_nfbc_sgp_inputs",
    Seq("stg_nfbc_ranked_standings"))((_, in) => {
    val rs = in("stg_nfbc_ranked_standings")
    val unpivoted = categories.map { case (cat, rankC, valC) =>
      rs.select(col("_filename"), col("league"), lit(cat).as("category"),
        col(rankC).as("rank"), col(valC).cast("double").as("value"))
    }.reduce(_.union(_))
    val isBig = col("_filename").like("NFBC ME%") || col("_filename").like("NFBC DC%")
    unpivoted
      .filter((isBig && col("rank").between(4, 12)) ||
        (!isBig && col("rank").between(3, 10)))
      .groupBy(col("_filename"), col("category"), col("rank"))
      .agg(avg(col("value")).as("avgvalue"))
      .select(col("_filename"), col("category"), col("rank"),
        when(isBig, lit(16) - col("rank")).otherwise(lit(13) - col("rank")).as("points"),
        col("avgvalue").as("value"))
  })

  /** models/stage/nfbc/stg_nfbc_sgp_factors.sql — least-squares slope from
    * regression sums (A2) with nullif zero-denominator guard (P8). */
  val sgpFactors: Model = Model("stg_nfbc_sgp_factors",
    Seq("stg_nfbc_sgp_inputs"))((_, in) =>
    in("stg_nfbc_sgp_inputs")
      .groupBy(col("_filename"), col("category"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("points")).as("sum_x"),
        sum(col("value")).as("sum_y"),
        sum(col("points") * col("value")).as("sum_xy"),
        sum(col("points") * col("points")).as("sum_x2"))
      .select(col("_filename"), col("category"),
        ((col("n") * col("sum_xy") - col("sum_x") * col("sum_y")) /
          expr("nullif(n * sum_x2 - sum_x * sum_x, 0)")).as("sgp_value")))

  val all: Seq[Model] = Seq(idMap, fgHitPerPa, razzHitPerPa, fgPitPerIp,
    razzPitPerIp, rankedStandings, sgpInputs, sgpFactors)
}
