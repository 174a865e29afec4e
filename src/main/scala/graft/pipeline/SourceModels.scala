package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The 10 `source`-layer models: raw feed → all-strings table with path
  * metadata, most filtered to the latest ingest snapshot (SURVEY.md §2.1).
  *
  * Feed root paths and column lists follow FIXTURES.md family A; the raw CSV
  * files live under `<dataRoot>/<feed>/year=YYYY/month=M/day=D/<file>`.
  */
final class SourceModels(dataRoot: String) {
  import SourceReader._

  private def feed(spark: SparkSession, path: String, cols: Seq[String],
      sep: String = ","): DataFrame =
    withPathMeta(readCsv(spark, s"$dataRoot/$path", cols, sep))

  /** models/source/fangraphs/src_fangraphs_projections_preseason_hitting.sql */
  val fgHitting: Model = Model("src_fangraphs_projections_preseason_hitting", Nil)((s, _) =>
    latestSnapshot(feed(s, "fangraphs/projections/preseason/hitting", Seq(
      "playerid", "pa", "ab", "h", "x1b", "x2b", "x3b", "r", "hr", "rbi", "sb",
      "avg", "obp", "slg", "bb", "hbp"))))

  /** models/source/fangraphs/src_fangraphs_projections_preseason_pitching.sql */
  val fgPitching: Model = Model("src_fangraphs_projections_preseason_pitching", Nil)((s, _) =>
    latestSnapshot(feed(s, "fangraphs/projections/preseason/pitching", Seq(
      "playerid", "ip", "er", "h", "bb", "w", "qs", "so", "sv", "era", "whip",
      "k_per_9", "bb_per_9"))))

  /** models/source/fangraphs/src_fangraphs_opening_day_rosters.sql */
  val fgRosters: Model = Model("src_fangraphs_opening_day_rosters", Nil)((s, _) =>
    latestSnapshot(feed(s, "fangraphs/rosters", Seq(
      "playerid", "pos", "projected_opening_day_status"))))

  /** models/source/razzball/src_razzball_projections_preseason_hitting.sql */
  val razzHitting: Model = Model("src_razzball_projections_preseason_hitting", Nil)((s, _) =>
    latestSnapshot(feed(s, "razzball/projections/preseason/hitting", Seq(
      "razzid", "pa", "ab", "h", "x1b", "x2b", "x3b", "r", "hr", "rbi", "sb",
      "avg", "obp", "slg", "bb", "hbp"))))

  /** models/source/razzball/src_razzball_projections_preseason_pitching.sql */
  val razzPitching: Model = Model("src_razzball_projections_preseason_pitching", Nil)((s, _) =>
    latestSnapshot(feed(s, "razzball/projections/preseason/pitching", Seq(
      "razzid", "ip", "er", "h", "bb", "w", "qs", "k", "sv", "era", "whip"))))

  /** models/source/nfbc/src_nfbc_players.sql */
  val nfbcPlayers: Model = Model("src_nfbc_players", Nil)((s, _) =>
    latestSnapshot(feed(s, "nfbc/players", Seq("id", "players", "team", "pos"))))

  /** models/source/nfbc/src_nfbc_standings.sql — keeps ALL history (S6). */
  val nfbcStandings: Model = Model("src_nfbc_standings", Nil)((s, _) =>
    feed(s, "nfbc/standings", Seq(
      "rank", "team", "owners", "league", "points", "r", "hr", "rbi", "sb",
      "ab", "h", "k", "w", "s", "ip", "er", "bb", "ha", "avg", "era", "whip")))

  /** models/source/nfbc/src_nfbc_adp.sql — newest snapshot PER FILE via
    * rank() so differently-dated format files all survive (S5/W2). */
  val nfbcAdp: Model = Model("src_nfbc_adp", Nil)((s, _) => {
    val w = Window.partitionBy(col("_filename")).orderBy(col("_ptkey").desc)
    feed(s, "nfbc/adp", Seq("playerid", "adp", "min_pick", "max_pick"), sep = "\t")
      .withColumn("_rnk", rank().over(w))
      .filter(col("_rnk") === 1)
  })

  /** models/source/underdog/src_underdog_adp.sql — unconsumed leaf. */
  val underdogAdp: Model = Model("src_underdog_adp", Nil)((s, _) =>
    latestSnapshot(feed(s, "underdog/adp", Seq("id", "adp"))))

  /** models/source/mapping/src_mpd_player_id_map.sql — no path metadata at
    * all, only the audit timestamp (reference lines 7-9). */
  val idMap: Model = Model("src_mpd_player_id_map", Nil)((s, _) =>
    readCsv(s, s"$dataRoot/mapping/mpd_player_id_map", Seq(
      "nfbcid", "mlbid", "idfangraphs", "underdog", "razzballid", "bpid"))
      .withColumn("_loaddatetime", current_timestamp()))

  val all: Seq[Model] = Seq(fgHitting, fgPitching, fgRosters, razzHitting,
    razzPitching, nfbcPlayers, nfbcStandings, nfbcAdp, underdogAdp, idMap)
}
