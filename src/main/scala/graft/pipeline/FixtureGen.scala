package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets

/** Deterministic reference-shaped CSV fixtures (FIXTURES.md family A).
  * Layout: `<root>/<feed>/year=YYYY/month=M/day=D/<file>` so the
  * `input_file_name()` metadata path parsing is exercised end-to-end.
  */
object FixtureGen {

  final case class Hitter(i: Int, pos: String)
  final case class Pitcher(i: Int, sv: Boolean)

  // Position mix sized so every pool tier has both included and excluded
  // members at 12-team pool sizes (1B/2B overflow into CI/MI tiers; UT
  // players only enter via the final residual tier).
  val hitters: Seq[Hitter] =
    (1 to 14).map(i => Hitter(i, "1B")) ++
      (15 to 28).map(i => Hitter(i, "2B")) ++
      (29 to 32).map(i => Hitter(i, "3B")) ++
      (33 to 36).map(i => Hitter(i, "SS")) ++
      (37 to 40).map(i => Hitter(i, "C")) ++
      (41 to 48).map(i => Hitter(i, "OF")) ++
      (49 to 63).map(i => Hitter(i, "UT")) ++
      (64 to 65).map(i => Hitter(i, "1B,OF"))

  val pitchers: Seq[Pitcher] =
    (101 to 120).map(i => Pitcher(i, sv = false)) ++
      (121 to 125).map(i => Pitcher(i, sv = true))

  /** The excluded pitcher (stg_proj_preseason_pitching_agg.sql:23). */
  val excludedPitcherId = "9810"
  /** The excluded roster row (mart_preseason_overall_rankings_oc.sql:109). */
  val excludedRosterFg = "19755"

  def nfbcId(i: Int): String = if (i == 120) excludedPitcherId else s"n$i"
  def fgId(i: Int): String = if (i == 105) excludedRosterFg else s"f$i"
  def razzId(i: Int): String = s"z$i"

  private def write(root: Path, rel: String, header: String, rows: Seq[String]): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, (header +: rows).mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  /** Generate the fixture corpus. `noiseSeed` perturbs the deterministic
    * pseudo-noise stream — the DAG's STRUCTURAL invariants (budget
    * conservation, contiguous ranks, snapshot filtering) must hold for any
    * seed; hand-computed value assertions pin seed 0 only. */
  def generate(rootDir: String, noiseSeed: Int = 0): Unit = {
    val root = Paths.get(rootDir)

    // deterministic pseudo-noise
    def j(i: Int, k: Int): Int =
      math.floorMod(i * 7 + k * 13 + noiseSeed * 17 + (i + k) * noiseSeed, 5)

    // ---- nfbc standings: 3 format files × 2 leagues ------------------------
    def standingsRows(nTeams: Int, seed: Int): Seq[String] =
      for {
        lg <- Seq("L1", "L2")
        rk <- 1 to nTeams
      } yield {
        val s = seed + (if (lg == "L1") 0 else 3)
        val pts = (nTeams - rk) * 10.0 + s
        def v(base: Int, step: Int, k: Int) = base - rk * step + j(rk + s, k)
        val ip = 1200.0 + rk * 3 + s
        val avgv = 0.270 - rk * 0.002 + j(rk + s, 9) * 1e-4
        val erav = 3.50 + rk * 0.05 + j(rk + s, 10) * 0.01
        val whipv = 1.15 + rk * 0.01 + j(rk + s, 11) * 0.002
        Seq(rk, s"T$rk$lg", s"Owner$rk", lg, pts,
          v(950, 12, 1), v(260, 4, 2), v(930, 11, 3), v(140, 3, 4),
          7000 + rk * 10, 1900 - rk * 8, v(1400, 15, 5), v(95, 2, 6), v(80, 2, 7),
          ip, v(560, -4, 8), 420 + rk * 2, 1300 + rk * 4,
          f"$avgv%.4f", f"$erav%.2f", f"$whipv%.3f").mkString(",")
      }
    val stHeader = "rank,team,owners,league,points,r,hr,rbi,sb,ab,h,k,w,s,ip,er,bb,ha,avg,era,whip"
    write(root, "nfbc/standings/year=2025/month=10/day=5/NFBC OC 2025 Overall Standings.csv",
      stHeader, standingsRows(12, 1))
    write(root, "nfbc/standings/year=2025/month=10/day=5/NFBC 50s 2025 Overall Standings.csv",
      stHeader, standingsRows(12, 2))
    write(root, "nfbc/standings/year=2025/month=10/day=5/NFBC ME 2025 Overall Standings.csv",
      stHeader, standingsRows(15, 3))
    // an older year for the percentile latest-year serving query
    write(root, "nfbc/standings/year=2024/month=10/day=6/NFBC OC 2024 Overall Standings.csv",
      stHeader, standingsRows(12, 4))

    // ---- id map (+ all-empty row dropped, duplicate collapsed) -------------
    val idHeader = "nfbcid,mlbid,idfangraphs,underdog,razzballid,bpid"
    val idRows = (hitters.map(_.i) ++ pitchers.map(_.i)).map(i =>
      s"${nfbcId(i)},m$i,${fgId(i)},u$i,${razzId(i)},b$i") ++
      Seq("n9999,,,,,", s"n1,m1,f1,u1,z1,b1") // dropped; duplicate
    write(root, "mapping/mpd_player_id_map/id_map.csv", idHeader, idRows)

    // ---- nfbc players ------------------------------------------------------
    val plHeader = "id,players,team,pos"
    val plRows = hitters.map(h =>
      s"${nfbcId(h.i)},\"Last${h.i}, First${h.i}\",TM${h.i % 6},\"${h.pos}\"") ++
      pitchers.map(p =>
        s"${nfbcId(p.i)},\"Last${p.i}, First${p.i}\",TM${p.i % 6},P") :+
      "n9999,\"Nobody, Joe\",TMX,UT"
    write(root, "nfbc/players/year=2026/month=2/day=10/players.csv", plHeader, plRows)
    // older snapshot that must be filtered out (S4)
    write(root, "nfbc/players/year=2026/month=1/day=5/players.csv", plHeader,
      plRows.take(3))

    // ---- fangraphs hitting projections (5 systems × 2 snapshots) ----------
    val fgHitHeader = "playerid,pa,ab,h,x1b,x2b,x3b,r,hr,rbi,sb,avg,obp,slg,bb,hbp"
    def fgHitRows(sys: Int): Seq[String] = hitters.map { h =>
      val i = h.i
      val pa = 560 + i % 60 + sys
      val ab = pa - 60
      val hits = 120 + (i * 3) % 50 + sys
      Seq(fgId(i), pa, ab, hits, hits - 40, 25 + j(i, sys), 3 + j(i, sys + 1),
        70 + (i * 5) % 40, 12 + (i * 7) % 30, 68 + (i * 11) % 45, 5 + (i * 3) % 25,
        f"${hits.toDouble / ab}%.4f", f"${(hits + 50).toDouble / pa}%.4f",
        f"${(hits * 1.6) / ab}%.4f", 45 + j(i, sys + 2), 4 + j(i, sys + 3)).mkString(",")
    }
    for ((sys, k) <- Seq("steamer", "atc", "thebat-x", "oopsy", "depthcharts").zipWithIndex) {
      write(root, s"fangraphs/projections/preseason/hitting/year=2026/month=2/day=10/$sys-hit.csv",
        fgHitHeader, fgHitRows(k))
      write(root, s"fangraphs/projections/preseason/hitting/year=2026/month=1/day=20/$sys-hit.csv",
        fgHitHeader, fgHitRows(k + 9)) // stale snapshot: must not survive S4
    }

    // ---- razzball hitting --------------------------------------------------
    val rzHitHeader = "razzid,pa,ab,h,x1b,x2b,x3b,r,hr,rbi,sb,avg,obp,slg,bb,hbp"
    val rzHitRows = hitters.map { h =>
      val i = h.i
      val pa = 575 + i % 50
      val ab = pa - 55
      val hits = 125 + (i * 3) % 45
      Seq(razzId(i), pa, ab, hits, hits - 42, 24 + j(i, 3), 2 + j(i, 4),
        72 + (i * 5) % 38, 13 + (i * 7) % 28, 70 + (i * 11) % 42, 6 + (i * 3) % 22,
        f"${hits.toDouble / ab}%.4f", f"${(hits + 48).toDouble / pa}%.4f",
        f"${(hits * 1.55) / ab}%.4f", 44 + j(i, 5), 5 + j(i, 6)).mkString(",")
    }
    write(root, "razzball/projections/preseason/hitting/year=2026/month=2/day=9/razzball-hit.csv",
      rzHitHeader, rzHitRows)

    // ---- fangraphs pitching (so column; k_per_9 present) -------------------
    val fgPitHeader = "playerid,ip,er,h,bb,w,qs,so,sv,era,whip,k_per_9,bb_per_9"
    def fgPitRows(sys: Int): Seq[String] = pitchers.map { p =>
      val i = p.i
      val ip = if (p.sv) 65 + i % 10 else 160 + i % 40 + sys
      val er = (ip * (3.2 + j(i, sys) * 0.2) / 9).round
      val so = (ip * (9.5 + j(i, sys + 1) * 0.3) / 9).round
      val bb = (ip * 3.0 / 9).round
      val sv = if (p.sv) 25 + j(i, sys) else 0
      val h = (ip * 0.95).round
      Seq(fgId(i), ip, er, h, bb, 8 + j(i, sys + 2), 12 + j(i, sys + 3), so, sv,
        f"${er * 9.0 / ip}%.2f", f"${(h + bb).toDouble / ip}%.3f",
        f"${so * 9.0 / ip}%.2f", f"${bb * 9.0 / ip}%.2f").mkString(",")
    }
    for ((sys, k) <- Seq("steamer", "atc", "thebat", "oopsy", "depthcharts").zipWithIndex)
      write(root, s"fangraphs/projections/preseason/pitching/year=2026/month=2/day=10/$sys-pitch.csv",
        fgPitHeader, fgPitRows(k))

    // ---- razzball pitching (k column; no per-9s) ---------------------------
    val rzPitHeader = "razzid,ip,er,h,bb,w,qs,k,sv,era,whip"
    val rzPitRows = pitchers.map { p =>
      val i = p.i
      val ip = if (p.sv) 68 + i % 8 else 165 + i % 35
      val er = (ip * 3.4 / 9).round
      val k = (ip * 9.8 / 9).round
      val bb = (ip * 2.9 / 9).round
      val h = (ip * 0.92).round
      Seq(razzId(i), ip, er, h, bb, 9 + j(i, 7), 13 + j(i, 8), k,
        if (p.sv) 22 + j(i, 9) else 0,
        f"${er * 9.0 / ip}%.2f", f"${(h + bb).toDouble / ip}%.3f").mkString(",")
    }
    write(root, "razzball/projections/preseason/pitching/year=2026/month=2/day=9/razzball-pitch.csv",
      rzPitHeader, rzPitRows)

    // ---- rosters (incl. the excluded 19755/SP row) -------------------------
    val roHeader = "playerid,pos,projected_opening_day_status"
    val roRows = (hitters.map(_.i) ++ pitchers.map(_.i)).map(i =>
      s"${fgId(i)},${if (i > 100) "SP" else "1B"},${if (i % 7 == 0) "IL" else "Active"}")
    write(root, "fangraphs/rosters/year=2026/month=3/day=1/rosters.csv", roHeader, roRows)

    // ---- nfbc adp: two format files on DIFFERENT dates (S5) ----------------
    val adpHeader = Seq("playerid", "adp", "min_pick", "max_pick").mkString("\t")
    def adpRows(off: Double): Seq[String] =
      (hitters.map(_.i) ++ pitchers.map(_.i)).zipWithIndex.map { case (i, idx) =>
        Seq(nfbcId(i), f"${idx + 1 + off}%.1f", idx + 1, idx + 15).mkString("\t")
      }
    // NB: _ptkey is a string concat (reference semantics) — day must stay
    // two-digit here or string max would pick the wrong "newest"
    write(root, "nfbc/adp/year=2026/month=2/day=11/OC_ADP.tsv", adpHeader, adpRows(0.4))
    write(root, "nfbc/adp/year=2026/month=2/day=10/OC_ADP.tsv", adpHeader, adpRows(9.9))
    write(root, "nfbc/adp/year=2026/month=2/day=12/Fifties_ADP.tsv", adpHeader, adpRows(0.7))

    // ---- underdog adp (unconsumed leaf) ------------------------------------
    write(root, "underdog/adp/year=2026/month=2/day=10/underdog_adp.csv",
      "id,adp", hitters.take(10).map(h => s"u${h.i},${h.i}.5"))
  }
}
