package graft

import java.nio.file.{Files, Paths}

/** Writes QUERIES.md — the generated registry inventory: one line per
  * query with its doc string and oracle status. Generated from the same
  * `SparkEntry.registry` the driver executes, so the inventory can never
  * drift from the code (regenerate with `sbt "runMain graft.Inventory"`).
  */
object Inventory {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("QUERIES.md")
    val groups = SparkEntry.registry
      .groupBy(q => q.name.takeWhile(!_.isDigit))
      .toSeq.sortBy(_._1)
    val sb = new StringBuilder
    sb.append("# QUERIES — generated registry inventory\n\n")
    sb.append(s"${SparkEntry.registry.size} queries; 'oracle' = DuckDB hash-compared by the driver, ")
    sb.append("'rows-only' = alternate gate documented in the named spec.\n")
    sb.append("Regenerate: `sbt \"runMain graft.Inventory\"`.\n")
    groups.foreach { case (prefix, qs) =>
      sb.append(s"\n## ${prefix.toUpperCase}-series\n\n")
      // numeric series order (a2 before a10), not lexicographic
      qs.sortBy { q =>
        val m = "^([a-z]+)([0-9]+)".r.findFirstMatchIn(q.name)
        (m.map(_.group(1)).getOrElse(q.name),
          m.map(_.group(2).toInt).getOrElse(0), q.name)
      }.foreach { q =>
        val gate = if (q.oracle.isDefined) "oracle" else "rows-only"
        sb.append(s"- `${q.name}` [$gate] — ${q.doc}\n")
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote ${SparkEntry.registry.size} entries to $out")
  }
}
