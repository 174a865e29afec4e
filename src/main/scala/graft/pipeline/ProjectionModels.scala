package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Projection blend + scoring + valuation models (SURVEY.md §7.2 M3-M4).
  * The per-format sgp/rep_lvl/values models are implemented once and
  * instantiated per [[LeagueFormat]] (the reference's `_oc`/`_50s` files are
  * copy-paste twins — SURVEY.md §7.4).
  */
object ProjectionModels {

  // ---- blend: playing time + skills + agg -----------------------------------

  /** stg_proj_preseason_hitting_pt.sql — consensus playing time (U1 + A1). */
  val hitPt: Model = Model("stg_proj_preseason_hitting_pt",
    Seq("stg_fg_proj_preseason_hitting_per_pa", "stg_razzball_proj_preseason_hitting_per_pa"))((_, in) =>
    in("stg_fg_proj_preseason_hitting_per_pa").select("id", "pa", "proj_system")
      .union(in("stg_razzball_proj_preseason_hitting_per_pa").select("id", "pa", "proj_system"))
      .filter(col("proj_system").isin("depthcharts", "atc", "thebat-x", "razzball"))
      .groupBy("id").agg(avg("pa").as("pa")))

  /** stg_proj_preseason_pitching_pt.sql */
  val pitPt: Model = Model("stg_proj_preseason_pitching_pt",
    Seq("stg_fg_proj_preseason_pitching_per_ip", "stg_razzball_proj_preseason_pitching_per_ip"))((_, in) =>
    in("stg_fg_proj_preseason_pitching_per_ip").select("id", "ip", "proj_system")
      .union(in("stg_razzball_proj_preseason_pitching_per_ip").select("id", "ip", "proj_system"))
      .filter(col("proj_system").isin("depthcharts", "atc", "thebat", "razzball"))
      .groupBy("id").agg(avg("ip").as("ip")))

  private val hitSkillCols = Seq("ab", "h", "x1b", "x2b", "x3b", "r", "hr",
    "rbi", "sb", "bb", "hbp", "avg", "obp", "slg")

  /** stg_proj_preseason_hitting_skills.sql — blended per-PA rates (A1, P10). */
  val hitSkills: Model = Model("stg_proj_preseason_hitting_skills",
    Seq("stg_fg_proj_preseason_hitting_per_pa"))((_, in) =>
    in("stg_fg_proj_preseason_hitting_per_pa")
      .filter(col("proj_system").isin("steamer", "atc", "thebat-x", "oopsy"))
      .groupBy("id")
      .agg(avg(hitSkillCols.head).as(hitSkillCols.head),
        hitSkillCols.tail.map(c => avg(c).as(c)): _*))

  /** stg_proj_preseason_pitching_skills.sql — note `thebat` saves are nulled
    * out of the blend (P11/A10). */
  val pitSkills: Model = Model("stg_proj_preseason_pitching_skills",
    Seq("stg_fg_proj_preseason_pitching_per_ip"))((_, in) =>
    in("stg_fg_proj_preseason_pitching_per_ip")
      .filter(col("proj_system").isin("steamer", "atc", "thebat", "oopsy"))
      .groupBy("id")
      .agg(avg("er").as("er"), avg("h").as("h"), avg("bb").as("bb"),
        avg("w").as("w"), avg("qs").as("qs"), avg("k").as("k"),
        avg(when(col("proj_system") =!= "thebat", col("sv"))).as("sv"),
        avg("era").as("era"), avg("whip").as("whip"),
        avg("k_per_9").as("k_per_9"), avg("bb_per_9").as("bb_per_9")))

  /** stg_proj_preseason_hitting_agg.sql — rates × consensus PA (J2, P3). */
  val hitAgg: Model = Model("stg_proj_preseason_hitting_agg",
    Seq("stg_proj_preseason_hitting_pt", "stg_proj_preseason_hitting_skills"))((_, in) => {
    val pt = in("stg_proj_preseason_hitting_pt")
    val sk = in("stg_proj_preseason_hitting_skills")
    val counting = Seq("ab", "h", "x1b", "x2b", "x3b", "r", "hr", "rbi", "sb", "bb", "hbp")
    pt.join(sk, Seq("id"))
      .select(Seq(col("id"), col("pa")) ++
        counting.map(c => (col(c) * col("pa")).as(c)) ++
        Seq(col("avg"), col("obp"), col("slg")): _*)
  })

  /** stg_proj_preseason_pitching_agg.sql — incl. the hardcoded `id != '9810'`
    * exclusion (P7). */
  val pitAgg: Model = Model("stg_proj_preseason_pitching_agg",
    Seq("stg_proj_preseason_pitching_pt", "stg_proj_preseason_pitching_skills"))((_, in) => {
    val pt = in("stg_proj_preseason_pitching_pt")
    val sk = in("stg_proj_preseason_pitching_skills")
    val counting = Seq("er", "h", "bb", "w", "qs", "k", "sv")
    pt.join(sk, Seq("id"))
      .filter(col("id") =!= "9810")
      .select(Seq(col("id"), col("ip")) ++
        counting.map(c => (col(c) * col("ip")).as(c)) ++
        Seq(col("era"), col("whip"), col("k_per_9"), col("bb_per_9")): _*)
  })

  // ---- per-format scoring (sgp), replacement level, dollar values -----------

  /** stg_proj_preseason_hitting_sgp_{oc,50s}.sql — position ladders (P5),
    * 1-row constants cross join (J6), smoothing ratio (P4), multi-position
    * bonus/penalty. */
  def hitSgp(f: LeagueFormat): Model = Model(s"stg_proj_preseason_hitting_sgp_${f.key}",
    Seq("stg_proj_preseason_hitting_agg", "stg_mpd_player_id_map", "mart_sgp_factors"))((_, in) => {
    val ids = in("stg_mpd_player_id_map")
    val agg = in("stg_proj_preseason_hitting_agg")
    val consts = in("mart_sgp_factors")
      .filter(col("_filename") === f.standingsFile)
      .select("sgp_r", "sgp_hr", "sgp_rbi", "sgp_sb", "sgp_avg")
    val base = agg.join(ids.select("id", "name", "team", "pos"), Seq("id"))
      .select(Seq(col("id"), col("name"), col("team"), col("pos"), col("pa")) ++
        Seq("ab", "h", "x1b", "x2b", "x3b", "r", "hr", "rbi", "sb", "bb", "hbp",
          "avg", "obp", "slg").map(col): _*)
      .distinct()
    val sgps = base.crossJoin(broadcast(consts))
      .withColumn("position",
        when(col("pos").like("%C%"), "C")
          .when(col("pos").like("%2B%"), "2B")
          .when(col("pos").like("%OF%"), "OF")
          .when(col("pos").like("%3B%"), "3B")
          .when(col("pos").like("%1B%"), "1B")
          .when(col("pos").like("%SS%"), "SS")
          .otherwise("UT"))
      // derived from position (same branch ORDER by construction) — a
      // second like-ladder here could silently desynchronize the two
      .withColumn("pos_group",
        when(col("position").isin("2B", "SS"), "MI")
          .when(col("position").isin("1B", "3B"), "CI")
          .otherwise(col("position")))
      .withColumn("r_sgp", col("r") / col("sgp_r"))
      .withColumn("hr_sgp", col("hr") / col("sgp_hr"))
      .withColumn("rbi_sgp", col("rbi") / col("sgp_rbi"))
      .withColumn("sb_sgp", col("sb") / col("sgp_sb"))
      .withColumn("avg_sgp",
        ((col("h") + f.lgH) / (col("ab") + f.lgAb) - f.lgAvg) / col("sgp_avg"))
    val total = col("r_sgp") + col("hr_sgp") + col("rbi_sgp") + col("sb_sgp") + col("avg_sgp")
    sgps.withColumn("sgp",
      when(col("pos").like("%UT%"), total - 0.25)
        .when(col("pos").like("%,%"), total + 0.25)
        .otherwise(total))
      // the 1-row constants are inputs, not outputs (reference selects b.*)
      .drop("sgp_r", "sgp_hr", "sgp_rbi", "sgp_sb", "sgp_avg")
  })

  /** stg_proj_preseason_pitching_sgp_{oc,50s}.sql — SP/RP split on sv>0. */
  def pitSgp(f: LeagueFormat): Model = Model(s"stg_proj_preseason_pitching_sgp_${f.key}",
    Seq("stg_proj_preseason_pitching_agg", "stg_mpd_player_id_map", "mart_sgp_factors"))((_, in) => {
    val ids = in("stg_mpd_player_id_map")
    val agg = in("stg_proj_preseason_pitching_agg")
    val consts = in("mart_sgp_factors")
      .filter(col("_filename") === f.standingsFile)
      .select("sgp_k", "sgp_w", "sgp_s", "sgp_era", "sgp_whip")
    val base = agg.join(ids.select("id", "name", "team", "pos"), Seq("id"))
      .select(Seq(col("id"), col("name"), col("team"), col("pos"), col("ip")) ++
        Seq("er", "h", "bb", "w", "qs", "k", "sv", "era", "whip",
          "k_per_9", "bb_per_9").map(col): _*)
      .distinct()
    base.crossJoin(broadcast(consts))
      .withColumn("position", when(col("sv") > 0, "RP").otherwise("SP"))
      .withColumn("k_sgp", col("k") / col("sgp_k"))
      .withColumn("w_sgp", col("w") / col("sgp_w"))
      .withColumn("sv_sgp", col("sv") / col("sgp_s"))
      .withColumn("era_sgp",
        (((lit(f.lgEr) + col("er")) * 9) / (lit(f.lgIp) + col("ip")) - f.lgEra) / col("sgp_era"))
      .withColumn("whip_sgp",
        ((lit(f.lgHbb) + col("h") + col("bb")) / (lit(f.lgIp) + col("ip")) - f.lgWhip) / col("sgp_whip"))
      .withColumn("sgp",
        col("k_sgp") + col("w_sgp") + col("sv_sgp") + col("era_sgp") + col("whip_sgp"))
      .drop("sgp_k", "sgp_w", "sgp_s", "sgp_era", "sgp_whip")
  })

  /** stg_proj_preseason_hitting_rep_lvl_{oc,50s}.sql — cascaded residual
    * top-K pools (W3/U3): position slots, then MI/CI from leftovers, then UT
    * from the rest; per-position MIN; UT row = max of the mins (A5/A7). */
  def hitRepLvl(f: LeagueFormat): Model = Model(s"stg_proj_preseason_hitting_rep_lvl_${f.key}",
    Seq(s"stg_proj_preseason_hitting_sgp_${f.key}"))((_, in) => {
    val sgp = in(s"stg_proj_preseason_hitting_sgp_${f.key}")
    val t = f.teams
    // id tiebreak: equal-sgp players at a pool cutoff would otherwise
    // enter in shuffle order, flapping replvl/sgpar/value run-to-run
    val wPos = Window.partitionBy(col("position")).orderBy(col("sgp").desc, col("id"))
    val base = sgp.withColumn("pos_rank", row_number().over(wPos))
      .withColumn("include_in_pool",
        when(col("position").isin("1B", "2B", "3B", "SS") && col("pos_rank") <= t, "Y")
          .when(col("position") === "OF" && col("pos_rank") <= t * 5, "Y")
          .when(col("position") === "C" && col("pos_rank") <= t * 2, "Y")
          .otherwise("N"))
    val wGroup = Window.partitionBy(col("pos_group")).orderBy(col("sgp").desc, col("id"))
    val remaining = base.filter(col("include_in_pool") === "N")
      .withColumn("gr_rank", row_number().over(wGroup))
      .withColumn("include_in_pool_mi_ci",
        when(col("pos_group").isin("MI", "CI") && col("gr_rank") <= t, "Y").otherwise("N"))
    val wAll = Window.orderBy(col("sgp").desc, col("id"))
    val remainingUt = remaining.filter(col("include_in_pool_mi_ci") === "N")
      .withColumn("ut_rank", row_number().over(wAll))
      .withColumn("include_in_pool_ut", when(col("ut_rank") <= t, "Y").otherwise("N"))
    val pool =
      base.filter(col("include_in_pool") === "Y").select("id", "name", "position", "sgp")
        .union(remaining.filter(col("include_in_pool_mi_ci") === "Y")
          .select("id", "name", "position", "sgp"))
        .union(remainingUt.filter(col("include_in_pool_ut") === "Y")
          .select("id", "name", "position", "sgp"))
    val repLvl = pool.filter(col("position") =!= "UT")
      .groupBy("position").agg(min("sgp").as("replvl"))
    val utRow = repLvl.agg(max("replvl").as("replvl"))
      .select(lit("UT").as("position"), col("replvl"))
    repLvl.union(utRow)
  })

  /** stg_proj_preseason_pitching_rep_lvl_{oc,50s}.sql — SP/RP tiers + a P
    * residual tier; no UT append. */
  def pitRepLvl(f: LeagueFormat): Model = Model(s"stg_proj_preseason_pitching_rep_lvl_${f.key}",
    Seq(s"stg_proj_preseason_pitching_sgp_${f.key}"))((_, in) => {
    val sgp = in(s"stg_proj_preseason_pitching_sgp_${f.key}")
    val t = f.teams
    // id tiebreak: equal-sgp players at a pool cutoff would otherwise
    // enter in shuffle order, flapping replvl/sgpar/value run-to-run
    val wPos = Window.partitionBy(col("position")).orderBy(col("sgp").desc, col("id"))
    val base = sgp.withColumn("pos_rank", row_number().over(wPos))
      .withColumn("include_in_pool",
        when(col("position") === "SP" && col("pos_rank") <= t * 6, "Y")
          .when(col("position") === "RP" && col("pos_rank") <= t * 2, "Y")
          .otherwise("N"))
    val wAll = Window.orderBy(col("sgp").desc, col("id"))
    val remaining = base.filter(col("include_in_pool") === "N")
      .withColumn("p_rank", row_number().over(wAll))
      .withColumn("include_in_pool_p", when(col("p_rank") <= t, "Y").otherwise("N"))
    val pool =
      base.filter(col("include_in_pool") === "Y").select("id", "name", "position", "sgp")
        .union(remaining.filter(col("include_in_pool_p") === "Y")
          .select("id", "name", "position", "sgp"))
    pool.groupBy("position").agg(min("sgp").as("replvl"))
  })

  /** stg_proj_preseason_{hitting,pitching}_values_{oc,50s}.sql — SGP above
    * replacement → auction dollars: budget / Σ positive sgpar (A6, J6, J4). */
  private def values(name: String, sgpModel: String, repModel: String,
      budget: Double): Model = Model(name, Seq(sgpModel, repModel))((_, in) => {
    val base = in(sgpModel).join(
      in(repModel).select(col("position").as("rl_position"), col("replvl")),
      col("position") === col("rl_position"), "left")
      .drop("rl_position")
      .withColumn("sgpar", col("sgp") - col("replvl"))
    val dollars = base.filter(col("sgpar") > 0)
      .agg((lit(budget) / sum(col("sgpar"))).as("dollars_per_sgp"))
    base.crossJoin(broadcast(dollars))
      .withColumn("value", col("sgpar") * col("dollars_per_sgp") + 1)
      .drop("dollars_per_sgp")
      .orderBy(col("value").desc)
  })

  def hitValues(f: LeagueFormat): Model = values(
    s"stg_proj_preseason_hitting_values_${f.key}",
    s"stg_proj_preseason_hitting_sgp_${f.key}",
    s"stg_proj_preseason_hitting_rep_lvl_${f.key}", f.hitBudget)

  def pitValues(f: LeagueFormat): Model = values(
    s"stg_proj_preseason_pitching_values_${f.key}",
    s"stg_proj_preseason_pitching_sgp_${f.key}",
    s"stg_proj_preseason_pitching_rep_lvl_${f.key}", f.pitBudget)

  val all: Seq[Model] =
    Seq(hitPt, pitPt, hitSkills, pitSkills, hitAgg, pitAgg) ++
      LeagueFormat.all.flatMap(f =>
        Seq(hitSgp(f), pitSgp(f), hitRepLvl(f), pitRepLvl(f), hitValues(f), pitValues(f)))
}
