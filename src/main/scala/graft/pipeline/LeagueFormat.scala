package graft.pipeline

/** Per-league-format constants. The reference's `oc` and `50s` model pairs are
  * copy-paste twins differing only in these values (SURVEY.md §7.4):
  * smoothing constants at stg_proj_preseason_hitting_sgp_oc.sql:63 vs
  * …_sgp_50s.sql:63 and …pitching_sgp_oc.sql:47-48 vs …_sgp_50s.sql:47-48;
  * standings/_filename keys at …sgp_oc.sql:40 and
  * mart_preseason_overall_rankings_oc.sql:122.
  */
final case class LeagueFormat(
    key: String,             // model-name suffix: "oc" | "50s"
    standingsFile: String,   // mart_sgp_factors row selector
    adpFile: String,         // ADP join literal (J5)
    percentilesKey: String,  // servingPercentiles :format token (filename word 2)
    teams: Int,              // pool sizing unit (12-team leagues throughout)
    // hitting AVG smoothing: ((h + lgH) / (ab + lgAb) - lgAvg) / sgp_avg
    lgH: Double, lgAb: Double, lgAvg: Double,
    // pitching ERA smoothing: (((lgEr + er) * 9) / (lgIp + ip) - lgEra) / sgp_era
    lgEr: Double, lgIp: Double, lgEra: Double,
    // pitching WHIP smoothing: ((lgHbb + h + bb) / (lgIp + ip) - lgWhip) / sgp_whip
    lgHbb: Double, lgWhip: Double,
    // auction budget: (teams * 260 * share) - (teams * slots)
    hitShare: Double = 0.67, hitSlots: Int = 14,
    pitShare: Double = 0.33, pitSlots: Int = 9) {

  def hitBudget: Double = (teams * 260 * hitShare) - (teams * hitSlots)
  def pitBudget: Double = (teams * 260 * pitShare) - (teams * pitSlots)
}

object LeagueFormat {
  /** stg_proj_preseason_hitting_sgp_oc.sql:40,63; …pitching_sgp_oc.sql:47-48;
    * …values_oc.sql:17; mart_preseason_overall_rankings_oc.sql:122 */
  val Oc: LeagueFormat = LeagueFormat(
    key = "oc", standingsFile = "NFBC OC 2025 Overall Standings.csv",
    adpFile = "OC_ADP.tsv", percentilesKey = "OC", teams = 12,
    lgH = 1765.0, lgAb = 6958.0, lgAvg = 0.2536,
    lgEr = 487.0, lgIp = 1163.0, lgEra = 3.7707,
    lgHbb = 1398.0, lgWhip = 1.2022)

  /** …_sgp_50s.sql:40,63; …pitching_sgp_50s.sql:47-48;
    * mart_preseason_overall_rankings_50s.sql:122 */
  val Fifties: LeagueFormat = LeagueFormat(
    key = "50s", standingsFile = "NFBC 50s 2025 Overall Standings.csv",
    adpFile = "Fifties_ADP.tsv", percentilesKey = "50s", teams = 12,
    lgH = 1725.0, lgAb = 6805.0, lgAvg = 0.2535,
    lgEr = 474.0, lgIp = 1131.0, lgEra = 3.774,
    lgHbb = 1359.0, lgWhip = 1.201)

  val all: Seq[LeagueFormat] = Seq(Oc, Fifties)
}
