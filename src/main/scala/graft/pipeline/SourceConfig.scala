package graft.pipeline

/** Declarative source registry — the engine-side equivalent of the
  * reference's `_sources.yml` files (e.g.
  * models/source/fangraphs/_sources.yml:8-16, one `tables:` entry per
  * external feed). dbt users declare externals in config and never touch
  * code; [[SourceModels]] now derives its models from exactly such a
  * declaration, so adding a feed is a config edit here too.
  *
  * The format is the dbt-shaped YAML subset below — parsed by a
  * self-contained scanner (the environment is dependency-free by design, so
  * no YAML library; the subset is deliberately small enough that a full
  * parser would be overkill):
  *
  * {{{
  * version: 2
  * sources:
  *   - name: fangraphs
  *     tables:
  *       - name: src_fangraphs_projections_preseason_hitting
  *         path: fangraphs/projections/preseason/hitting
  *         snapshot: latest            # latest | per_file | none
  *         columns: [playerid, pa, ab]
  *       - name: ...
  * }}}
  *
  * Per-table keys: `path` (feed dir under the data root), `columns`
  * (all-strings schema, inline list), optional `sep` (default `,`; `"\t"`
  * for TSV), optional `snapshot` (default `latest`), optional `path_meta`
  * (default `true`; `false` = audit timestamp only, the id-map convention,
  * reference src_mpd_player_id_map.sql:7-9).
  */
object SourceConfig {

  /** One declared external feed. `snapshot`: `latest` keeps only the newest
    * `_ptkey` (S4), `per_file` keeps each file's newest (S5), `none` keeps
    * all history (S6). */
  final case class SourceSpec(
      source: String,
      name: String,
      path: String,
      columns: Seq[String],
      sep: String = ",",
      snapshot: String = "latest",
      pathMeta: Boolean = true)

  private val Snapshots = Set("latest", "per_file", "none")
  // every key a table entry may carry (`name` arrives via the entry line);
  // anything else fails fast — a deeper-indented typo ('colums:') silently
  // absorbed into the table map would weaken the fail-fast contract
  private val TableKeys = Set("path", "columns", "sep", "snapshot", "path_meta")

  /** Drop a trailing `# comment`, following YAML's two rules the naive scan
    * gets wrong: a `#` only opens a comment OUTSIDE any quoted span AND when
    * preceded by whitespace (or start of line) — `path: a#b` is a value, not
    * a truncation point — and inside a double-quoted span a backslash
    * escapes the next character, so `"a\"b#c"` does not flip the quote state
    * early (the regression class this function exists to prevent). */
  private def stripComment(l: String): String = {
    var inSingle = false; var inDouble = false
    val sb = new StringBuilder
    var i = 0
    while (i < l.length) {
      val c = l.charAt(i)
      if (inDouble && c == '\\' && i + 1 < l.length) {
        sb.append(c).append(l.charAt(i + 1))
        i += 2
      } else {
        if (c == '"' && !inSingle) inDouble = !inDouble
        else if (c == '\'' && !inDouble) inSingle = !inSingle
        else if (c == '#' && !inSingle && !inDouble &&
            (i == 0 || l.charAt(i - 1).isWhitespace)) return sb.toString
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Parse the YAML subset. Fails fast with the offending line number —
    * a config typo must break the build, not silently drop a feed. */
  def parse(text: String): Seq[SourceSpec] = {
    def fail(lineNo: Int, msg: String): Nothing =
      throw new IllegalArgumentException(s"source config line ${lineNo + 1}: $msg")
    // (indent, key, value, lineNo) for every non-blank, non-comment line
    val lines = text.linesIterator.zipWithIndex
      .map { case (raw, i) => (stripComment(raw), i) }
      .filter(_._1.trim.nonEmpty)
      .map { case (l, i) =>
        val indent = l.takeWhile(_ == ' ').length
        val entry = l.trim.startsWith("- ")
        val body = if (entry) l.trim.drop(2) else l.trim
        body.split(":", 2) match {
          case Array(k, v) => (indent, entry, k.trim, v.trim, i)
          case _ => fail(i, s"expected 'key: value', got '${l.trim}'")
        }
      }.toSeq

    var sourceIndent = -1
    var tableIndent = -1
    var curSource: String = null
    // accumulate mutable per-table key maps, then validate at the end
    val tables = scala.collection.mutable.ArrayBuffer
      .empty[(String, scala.collection.mutable.Map[String, String], Int)]
    lines.foreach { case (indent, entry, key, value, lineNo) =>
      key match {
        case "version" | "sources" | "tables" => // structural; no payload
        case "name" if entry =>
          if (sourceIndent < 0 || indent <= sourceIndent) {
            sourceIndent = indent
            curSource = unquote(value)
          } else {
            if (curSource == null) fail(lineNo, "table declared before any source")
            tableIndent = indent
            tables += ((curSource,
              scala.collection.mutable.Map("name" -> unquote(value)), lineNo))
          }
        case k if tables.nonEmpty && indent >= tableIndent =>
          if (!TableKeys(k))
            fail(lineNo, s"unknown table key '$k' (allowed: ${TableKeys.toSeq.sorted.mkString(", ")})")
          tables.last._2 += k -> value
        case k => fail(lineNo, s"unexpected key '$k' outside a table entry")
      }
    }
    if (tables.isEmpty)
      throw new IllegalArgumentException("source config declares no tables")

    tables.map { case (src, kv, lineNo) =>
      def req(k: String) = kv.getOrElse(k,
        fail(lineNo, s"table '${kv("name")}' missing required key '$k'"))
      val snapshot = unquote(kv.getOrElse("snapshot", "latest"))
      if (!Snapshots(snapshot))
        fail(lineNo, s"table '${kv("name")}': snapshot '$snapshot' not in $Snapshots")
      val colsRaw = req("columns")
      if (!colsRaw.startsWith("[") || !colsRaw.endsWith("]"))
        fail(lineNo, s"table '${kv("name")}': columns must be an inline [a, b] list")
      val cols = colsRaw.drop(1).dropRight(1).split(",").map(c => unquote(c.trim))
        .filter(_.nonEmpty).toSeq
      if (cols.isEmpty) fail(lineNo, s"table '${kv("name")}': empty columns list")
      val pathMeta = unquote(kv.getOrElse("path_meta", "true")).toBoolean
      // cross-key validation: snapshot filters need the path-derived _ptkey,
      // which path_meta: false suppresses — reject the combination instead
      // of silently keeping all history
      if (!pathMeta && snapshot != "none")
        fail(lineNo, s"table '${kv("name")}': snapshot '$snapshot' requires " +
          "path metadata; declare snapshot: none with path_meta: false")
      SourceSpec(
        source = src,
        name = kv("name"),
        path = unquote(req("path")),
        columns = cols,
        sep = unquote(kv.getOrElse("sep", ",")),
        snapshot = snapshot,
        pathMeta = pathMeta)
    }.toSeq
  }

  /** Strip one layer of quotes and decode the two escapes the format needs:
    * `\t` (TSV separators) and, for values that were double-quoted, `\"`
    * (the escape [[stripComment]] honors when scanning quote state). */
  private def unquote(s: String): String = {
    val doubleQuoted = s.length >= 2 && s.head == '"' && s.last == '"'
    val u = if (doubleQuoted ||
      (s.length >= 2 && s.head == '\'' && s.last == '\''))
      s.substring(1, s.length - 1) else s
    val t = u.replace("\\t", "\t")
    if (doubleQuoted) t.replace("\\\"", "\"") else t
  }
}
