package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The 10 `source`-layer models: raw feed → all-strings table with path
  * metadata, most filtered to the latest ingest snapshot (SURVEY.md §2.1).
  *
  * The models are DERIVED from [[SourceModels.defaultConfig]] — the engine's
  * equivalent of the reference's `_sources.yml` declarations
  * (models/source/&#42;/_sources.yml): adding or repointing a feed is a config
  * edit, not code. Pass a custom config to read a different lake layout with
  * the same snapshot/typing semantics. Feed root paths and column lists
  * follow FIXTURES.md family A; raw CSV files live under
  * `<dataRoot>/<feed>/year=YYYY/month=M/day=D/<file>`.
  */
final class SourceModels(dataRoot: String,
    config: String = SourceModels.defaultConfig) {
  import SourceReader._
  import SourceConfig.SourceSpec

  val specs: Seq[SourceSpec] = SourceConfig.parse(config)

  private def build(spec: SourceSpec)(s: SparkSession): DataFrame = {
    val raw = readCsv(s, s"$dataRoot/${spec.path}", spec.columns, spec.sep)
    if (!spec.pathMeta)
      // id-map convention: no "$path" metadata, audit timestamp only
      // (reference src_mpd_player_id_map.sql:7-9)
      raw.withColumn("_loaddatetime", current_timestamp())
    else spec.snapshot match {
      case "latest" => latestSnapshot(withPathMeta(raw))
      case "per_file" =>
        // newest snapshot PER FILE via rank() so differently-dated format
        // files all survive (S5/W2 — reference src_nfbc_adp.sql). Ordering
        // runs over the ZERO-PADDED path components, not the raw _ptkey:
        // the unpadded parity key ranks '202629' (Feb 9) above '2026210'
        // (Feb 10) lexicographically — the same latent staleness
        // latestSnapshot guards against. The helper rank is dropped — it
        // is an implementation detail, not part of the source schema.
        val ord = concat(lpad(col("year"), 4, "0"),
          lpad(col("month"), 2, "0"), lpad(col("day"), 2, "0"))
        val w = Window.partitionBy(col("_filename")).orderBy(ord.desc)
        withPathMeta(raw).withColumn("_rnk", rank().over(w))
          .filter(col("_rnk") === 1).drop("_rnk")
      case "none" => withPathMeta(raw) // keep ALL history (S6 — standings)
    }
  }

  val all: Seq[Model] =
    specs.map(spec => Model(spec.name, Nil)((s, _) => build(spec)(s)))
}

object SourceModels {

  /** The reference's source declarations, one `tables:` entry per external
    * feed — same operational surface as its `_sources.yml` files (e.g.
    * models/source/fangraphs/_sources.yml:8-16, nfbc/_sources.yml,
    * razzball/_sources.yml, underdog/_sources.yml, mapping/_sources.yml). */
  val defaultConfig: String =
    """version: 2
      |sources:
      |  - name: fangraphs
      |    tables:
      |      - name: src_fangraphs_projections_preseason_hitting
      |        path: fangraphs/projections/preseason/hitting
      |        columns: [playerid, pa, ab, h, x1b, x2b, x3b, r, hr, rbi, sb, avg, obp, slg, bb, hbp]
      |      - name: src_fangraphs_projections_preseason_pitching
      |        path: fangraphs/projections/preseason/pitching
      |        columns: [playerid, ip, er, h, bb, w, qs, so, sv, era, whip, k_per_9, bb_per_9]
      |      - name: src_fangraphs_opening_day_rosters
      |        path: fangraphs/rosters
      |        columns: [playerid, pos, projected_opening_day_status]
      |  - name: razzball
      |    tables:
      |      - name: src_razzball_projections_preseason_hitting
      |        path: razzball/projections/preseason/hitting
      |        columns: [razzid, pa, ab, h, x1b, x2b, x3b, r, hr, rbi, sb, avg, obp, slg, bb, hbp]
      |      - name: src_razzball_projections_preseason_pitching
      |        path: razzball/projections/preseason/pitching
      |        columns: [razzid, ip, er, h, bb, w, qs, k, sv, era, whip]
      |  - name: nfbc
      |    tables:
      |      - name: src_nfbc_players
      |        path: nfbc/players
      |        columns: [id, players, team, pos]
      |      - name: src_nfbc_standings
      |        path: nfbc/standings
      |        snapshot: none
      |        columns: [rank, team, owners, league, points, r, hr, rbi, sb, ab, h, k, w, s, ip, er, bb, ha, avg, era, whip]
      |      - name: src_nfbc_adp
      |        path: nfbc/adp
      |        sep: "\t"
      |        snapshot: per_file
      |        columns: [playerid, adp, min_pick, max_pick]
      |  - name: underdog
      |    tables:
      |      - name: src_underdog_adp
      |        path: underdog/adp
      |        columns: [id, adp]
      |  - name: mapping
      |    tables:
      |      - name: src_mpd_player_id_map
      |        path: mapping/mpd_player_id_map
      |        snapshot: none
      |        path_meta: false
      |        columns: [nfbcid, mlbid, idfangraphs, underdog, razzballid, bpid]
      |""".stripMargin
}
