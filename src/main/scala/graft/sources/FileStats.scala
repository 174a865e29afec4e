package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Per-FILE column statistics — the manifest-level stats layer of the
  * Iceberg contract (cf. reference `dbt_project.yml:40-43`, whose Iceberg
  * tables carry data-file min/max stats in their manifests), re-expressed
  * over plain parquet.
  *
  * Spark's parquet reader already skips ROW GROUPS from footer stats — but
  * only after the scan has listed every file and scheduled a task per file.
  * At 100 TB that is the cost that matters: a 1000-executor cluster burns
  * its time opening footers of files a metadata check could have excluded.
  * Iceberg fixes this by keeping per-file min/max/null-count in the table's
  * own metadata and pruning at PLAN time; this object is that layer:
  *
  *   - [[write]] harvests per-file stats from parquet FOOTERS (metadata-only
  *     — no data pages are read; distributed over executors past a small
  *     file count) into `_file_stats.json` next to the data.
  *   - [[StatsFileSkipping]] (a `Rule[LogicalPlan]`) consults the manifest
  *     when a Filter sits on a stats-carrying scan and removes files no
  *     predicate-satisfying row can live in — before the physical scan is
  *     planned, so skipped files never become tasks.
  *
  * Soundness stance (the same rule as [[HiddenPartitionPruning]]): skipping
  * may only remove files PROVABLY free of matching rows; anything unknown —
  * a column missing from the manifest, a file appended after the manifest
  * was written, a non-literal conjunct, a type this layer does not model —
  * keeps the file. The original filter still runs over surviving rows, so
  * stats can lag the data without a correctness cliff.
  *
  * Column domains modeled (matching parquet's TYPE_DEFINED_ORDER to Spark's
  * ordering exactly):
  *   - signed integers (INT32/INT64, byte..long)     -> long compare
  *   - DATE (days), TIMESTAMP micros/millis (INT64)  -> long compare
  *   - BOOLEAN                                       -> 0/1
  *   - UTF8 strings (BINARY) -> unsigned byte-wise compare, which is both
  *     parquet's UNSIGNED binary order and `UTF8String.compareTo`'s order
  * FLOAT/DOUBLE are deliberately NOT skippable: parquet min/max poisons on
  * NaN and Spark orders NaN above +Inf — range logic over those stats can
  * narrow. DECIMAL and INT96 timestamps are likewise excluded (INT96 has no
  * defined stats order). Excluded columns simply never prune.
  */
object FileStats {

  val StatsFile = "_file_stats.json"

  /** Per-column record. `mm` states: `ex` — min/max below are exact over the
    * file's non-null values; `nul` — provably zero non-null values; `unk` —
    * at least one row group lacked usable stats. `nulls` is the exact null
    * count when every row group recorded one. Values in the long domain are
    * `java.lang.Long`; strings are UTF-8 byte arrays. */
  final case class ColRec(kind: String, mm: String,
      min: Any, max: Any, nulls: Option[Long])

  /** `len` is the data file's byte length at harvest time — the identity
    * check that makes a same-path in-place rewrite (external compaction or
    * repair tool) detectable: [[entryFor]] refuses the entry when the live
    * length differs, so stale min/max can never prune the rewritten file and
    * the count pushdown never folds its stale row count. Iceberg gets this
    * for free by tracking immutable file identities; this is the
    * plain-parquet equivalent. `-1` marks a pre-length-tracking manifest
    * (legacy grace: trusted as before, regenerated on the next write). */
  final case class FileRec(rows: Long, cols: Map[String, ColRec], len: Long = -1L)

  /** The manifest entry for `rel`, but ONLY if the live file's byte length
    * matches the length recorded at harvest — a mismatch means the file was
    * rewritten in place after the harvest, so its stats (and row count) are
    * for bytes that no longer exist. Callers treat None exactly like an
    * unlisted file: keep it / disqualify the metadata fold. */
  def entryFor(manifest: Map[String, FileRec], rel: String,
      liveLen: Long): Option[FileRec] =
    manifest.get(rel).filter(rec => rec.len < 0 || rec.len == liveLen)

  // ---- harvest ---------------------------------------------------------------

  /** Spark's InMemoryFileIndex visibility rule — a name this returns false
    * for is invisible to the scan, so it must not enter the manifest. */
  private def visible(n: String): Boolean =
    !n.startsWith(".") && (!n.startsWith("_") || n.contains("="))

  /** Manifest keys are table-root-RELATIVE paths, and both sides of the
    * lookup must relativize identically. Comparing raw URI strings is a
    * trap: the same local file renders as `file:/tmp/x` from makeQualified
    * and `file:///tmp/x` from FileIndex.inputFiles. Going through
    * `toUri.getPath` normalizes the authority away on both sides. */
  private[sources] def rootUriPath(fs: FileSystem, root: Path): String =
    fs.makeQualified(root).toUri.getPath

  private[sources] def relPath(rootUri: String, p: Path): String =
    p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")

  private def dataFiles(fs: FileSystem, root: Path): Seq[FileStatus] = {
    def walk(p: Path): Seq[FileStatus] =
      (try fs.listStatus(p).toSeq
       catch { case _: java.io.FileNotFoundException => Seq.empty })
        .filter(st => visible(st.getPath.getName))
        .flatMap(st => if (st.isDirectory) walk(st.getPath) else Seq(st))
    walk(root).filter(_.getPath.getName.endsWith(".parquet"))
  }

  /** Total bytes of the scan-visible parquet files under `root` — the
    * size-targeted compaction sizing input. */
  private[sources] def dataBytes(fs: FileSystem, root: Path): Long =
    dataFiles(fs, root).map(_.getLen).sum

  /** Comparable-domain tag of a parquet primitive column, or None when the
    * column is excluded from skipping (float/double/decimal/INT96/unsigned —
    * see the object doc for why each is out). */
  private def kindOf(pt: PrimitiveType): Option[String] = {
    // stats are only meaningful under the type-defined order; INT96 and
    // legacy-writer columns report UNDEFINED and drop out here
    if (pt.columnOrder().getColumnOrderName !=
        org.apache.parquet.schema.ColumnOrder.ColumnOrderName.TYPE_DEFINED_ORDER)
      return None
    import LogicalTypeAnnotation._
    val ann = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => Some("bool")
      case PrimitiveTypeName.INT32 => ann match {
        case null => Some("int")
        case _: DateLogicalTypeAnnotation => Some("date")
        case i: IntLogicalTypeAnnotation if i.isSigned => Some("int")
        case _ => None
      }
      case PrimitiveTypeName.INT64 => ann match {
        case null => Some("int")
        case i: IntLogicalTypeAnnotation if i.isSigned => Some("int")
        case t: TimestampLogicalTypeAnnotation
            if t.getUnit != TimeUnit.NANOS =>
          Some(if (t.isAdjustedToUTC) "tsutc" else "tsntz")
        case _ => None
      }
      case PrimitiveTypeName.BINARY => ann match {
        case _: StringLogicalTypeAnnotation => Some("string")
        case _ => None
      }
      case _ => None
    }
  }

  /** Normalize one stats bound into its comparable domain: timestamps to
    * micros, integers/dates/bools to Long, strings to UTF-8 bytes. */
  private def bound(v: AnyRef, pt: PrimitiveType, kind: String): Any = kind match {
    case "string" => v.asInstanceOf[Binary].getBytes
    case "bool" => if (v.asInstanceOf[java.lang.Boolean]) 1L else 0L
    case "tsutc" | "tsntz" =>
      val raw = v.asInstanceOf[java.lang.Long].longValue()
      pt.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if t.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
        case _ => raw
      }
    case _ => v match { // int / date over INT32 or INT64
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
    }
  }

  /** Footer-only harvest of one file. Row groups fold per column: min/max
    * are exact only when EVERY group either has a non-null-value stat or is
    * provably all-null; null counts sum only when every group recorded one.
    * One group with unusable stats degrades the column to `unk` — kept, not
    * guessed. */
  private def harvestOne(conf: Configuration, file: Path, rel: String,
      len: Long): (String, FileRec) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks
      var rows = 0L
      // (kind, min, max, nulls, sawValue, exact, nullsKnown) per column path
      val acc = scala.collection.mutable.LinkedHashMap[String,
        (String, Any, Any, Long, Boolean, Boolean, Boolean)]()
      val it = blocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        rows += b.getRowCount
        val cit = b.getColumns.iterator()
        while (cit.hasNext) {
          val cc = cit.next()
          if (cc.getPath.size() == 1) { // top-level primitives only
            val name = cc.getPath.toDotString
            kindOf(cc.getPrimitiveType).foreach { kind =>
              val st: Statistics[_] = cc.getStatistics
              val nullsSet = st != null && st.isNumNullsSet && st.getNumNulls >= 0
              val hasVal = st != null && st.hasNonNullValue
              val allNull = nullsSet && st.getNumNulls == b.getRowCount
              // exact iff this group's min/max story is fully known
              val groupExact = hasVal || allNull
              val (mn, mx) =
                if (hasVal) (bound(st.genericGetMin.asInstanceOf[AnyRef], cc.getPrimitiveType, kind),
                  bound(st.genericGetMax.asInstanceOf[AnyRef], cc.getPrimitiveType, kind))
                else (null, null)
              acc.get(name) match {
                case None =>
                  acc(name) = (kind, mn, mx, if (nullsSet) st.getNumNulls else 0L,
                    hasVal, groupExact, nullsSet)
                case Some((k0, mn0, mx0, n0, saw0, ex0, nk0)) =>
                  val mn1 = if (!hasVal) mn0 else if (!saw0) mn
                    else if (cmpDomain(kind, mn, mn0) < 0) mn else mn0
                  val mx1 = if (!hasVal) mx0 else if (!saw0) mx
                    else if (cmpDomain(kind, mx, mx0) > 0) mx else mx0
                  acc(name) = (k0, mn1, mx1, n0 + (if (nullsSet) st.getNumNulls else 0L),
                    saw0 || hasVal, ex0 && groupExact, nk0 && nullsSet)
              }
            }
          }
        }
      }
      val cols = acc.iterator.map { case (name, (kind, mn, mx, nulls, saw, exact, nullsKnown)) =>
        val mm = if (!exact) "unk" else if (saw) "ex" else "nul"
        name -> ColRec(kind, mm, if (mm == "ex") mn else null,
          if (mm == "ex") mx else null, if (nullsKnown) Some(nulls) else None)
      }.toMap
      (rel, FileRec(rows, cols, len))
    } finally reader.close()
  }

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def cmpDomain(kind: String, a: Any, b: Any): Int = kind match {
    case "string" => cmpBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case _ => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  /** Hadoop Configuration is not Serializable but IS a Writable — this
    * wrapper ships the full conf (credentials, fs impls) to executors for
    * the distributed harvest, where a fresh `new Configuration()` would
    * silently drop cluster-specific settings. */
  private final class SerConf(@transient var conf: Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject(); conf = new Configuration(false); conf.readFields(in)
    }
  }

  /** Harvest footer stats for every data file under `dir` and commit
    * `_file_stats.json` (temp-file + rename — readers see the old manifest
    * or the new one, never a torn one). Re-run after every append: a file
    * the manifest misses is merely never skipped, so a crash between data
    * and stats commit degrades performance, not answers. Small tables
    * harvest on the driver; past 64 files the footer reads fan out over
    * executors (each is one metadata fetch — at 100 TB this is a short
    * metadata-only job, not a data scan). */
  def write(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val rootUri = rootUriPath(fs, root)
    val files = dataFiles(fs, root)
    val rels = files.map(f =>
      (f.getPath.toString, relPath(rootUri, f.getPath), f.getLen))
    val recs: Seq[(String, FileRec)] =
      if (rels.size <= 64)
        rels.map { case (abs, rel, len) => harvestOne(conf, new Path(abs), rel, len) }
      else {
        val sc = spark.sparkContext
        val ser = new SerConf(conf)
        sc.parallelize(rels, math.min(rels.size, sc.defaultParallelism))
          .map { case (abs, rel, len) => harvestOne(ser.conf, new Path(abs), rel, len) }
          .collect().toSeq
      }
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("v", 1): Unit
    val fnode = node.putObject("files")
    recs.foreach { case (rel, rec) =>
      val f = fnode.putObject(rel)
      f.put("rows", rec.rows): Unit
      f.put("len", rec.len): Unit
      val cnode = f.putObject("cols")
      rec.cols.foreach { case (name, c) =>
        val cn = cnode.putObject(name)
        cn.put("k", c.kind); cn.put("mm", c.mm): Unit
        if (c.mm == "ex") c.kind match {
          case "string" =>
            cn.put("min", new String(c.min.asInstanceOf[Array[Byte]], "UTF-8"))
            cn.put("max", new String(c.max.asInstanceOf[Array[Byte]], "UTF-8")): Unit
          case _ =>
            cn.put("min", c.min.asInstanceOf[Long])
            cn.put("max", c.max.asInstanceOf[Long]): Unit
        }
        c.nulls.foreach(n => cn.put("nulls", n): Unit)
      }
    }
    val tmp = new Path(root, s".$StatsFile.tmp-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    out.write(node.toString.getBytes("UTF-8"))
    out.close()
    val dst = new Path(root, StatsFile)
    if (!fs.rename(tmp, dst)) {
      fs.delete(dst, false)
      require(fs.rename(tmp, dst), s"stats manifest commit rename failed under $dir")
    }
    statsCache.remove(fs.makeQualified(root).toString): Unit
  }

  // ---- manifest read (fingerprint-cached, like the partition-spec cache) -----

  // Bounded: a long-lived session planning over many scratch tables must not
  // grow the cache monotonically — past the cap the whole map clears (parses
  // are cheap to redo; an LRU would buy little for a pure-throughput cache).
  // Known cross-JVM staleness window, accepted and documented: the
  // fingerprint is (mtime:len), so ANOTHER JVM rewriting the manifest within
  // the same mtime granule at the same byte length could serve this JVM a
  // stale parse (the writer's own JVM is covered by the explicit remove in
  // [[write]]). Under this library's write discipline a rewrite changes the
  // file set or the stats, so same-length same-second collisions do not
  // arise; the per-FILE `len` check in [[entryFor]] independently stops a
  // stale parse from mis-pruning any rewritten data file.
  private val statsCacheCap = 64
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Option[Map[String, FileRec]])]()

  private def fingerprint(fs: FileSystem, f: Path): String =
    try {
      val st = fs.getFileStatus(f)
      s"${st.getModificationTime}:${st.getLen}"
    } catch { case _: java.io.FileNotFoundException => "absent" }

  /** The parsed manifest for the table at `dir`, keyed by path relative to
    * the table root; None when absent or unparseable (a torn manifest reads
    * as "no stats", never as wrong stats). */
  def stats(spark: SparkSession, dir: String): Option[Map[String, FileRec]] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val qRoot = fs.makeQualified(root).toString
    val f = new Path(root, StatsFile)
    val fp = fingerprint(fs, f)
    val cached = statsCache.get(qRoot)
    if (cached != null && cached._1 == fp) cached._2
    else {
      val v =
        if (fp == "absent") None
        else try {
          val in = fs.open(f)
          val bytes = try {
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            var n = in.read(tmp)
            while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
            buf.toByteArray
          } finally in.close()
          Some(parse(bytes))
        } catch { case scala.util.control.NonFatal(_) => None }
      if (statsCache.size >= statsCacheCap) statsCache.clear()
      statsCache.put(qRoot, (fp, v))
      v
    }
  }

  private def parse(bytes: Array[Byte]): Map[String, FileRec] = {
    val rootN = new ObjectMapper().readTree(bytes)
    require(rootN.get("v").asInt() == 1, "unknown stats manifest version")
    val files = rootN.get("files")
    val b = Map.newBuilder[String, FileRec]
    val it = files.fields()
    while (it.hasNext) {
      val e = it.next()
      val f = e.getValue
      val cb = Map.newBuilder[String, ColRec]
      val cit = f.get("cols").fields()
      while (cit.hasNext) {
        val ce = cit.next()
        val c = ce.getValue
        val kind = c.get("k").asText()
        val mm = c.get("mm").asText()
        val (mn, mx) =
          if (mm != "ex") (null, null)
          else if (kind == "string")
            (c.get("min").asText().getBytes("UTF-8"), c.get("max").asText().getBytes("UTF-8"))
          else (c.get("min").asLong(): java.lang.Long, c.get("max").asLong(): java.lang.Long)
        val nulls = Option(c.get("nulls")).map(_.asLong())
        cb += ce.getKey -> ColRec(kind, mm,
          if (mn == null) null else (mn match { case l: java.lang.Long => l.longValue(); case o => o }),
          if (mx == null) null else (mx match { case l: java.lang.Long => l.longValue(); case o => o }),
          nulls)
      }
      b += e.getKey -> FileRec(f.get("rows").asLong(), cb.result(),
        Option(f.get("len")).map(_.asLong()).getOrElse(-1L))
    }
    b.result()
  }

  // ---- skipping evaluation ---------------------------------------------------

  /** Comparable-domain kind a Spark type maps to (mirror of [[kindOf]]);
    * None -> the type never participates in skipping. */
  private[sources] def kindOfSpark(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("int")
    case DateType => Some("date")
    case TimestampType => Some("tsutc")
    case TimestampNTZType => Some("tsntz")
    case StringType => Some("string")
    case BooleanType => Some("bool")
    case _ => None
  }

  /** Spark-internal literal value -> domain value for `kind`. */
  private[sources] def toDomain(v: Any, dt: DataType): Option[Any] = dt match {
    case ByteType => Some(v.asInstanceOf[Byte].toLong)
    case ShortType => Some(v.asInstanceOf[Short].toLong)
    case IntegerType | DateType => Some(v.asInstanceOf[Int].toLong)
    case LongType | TimestampType | TimestampNTZType => Some(v.asInstanceOf[Long])
    case StringType =>
      Some(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    case BooleanType => Some(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case _ => None
  }

  /** May a row of a file with stats `c` satisfy `<col> <op> <v>`? Sound in
    * one direction only: `false` is a proof, `true` is a shrug. */
  private[sources] def cmpMay(c: ColRec, kind: String, op: String, v: Any): Boolean =
    if (c.kind != kind) true
    else c.mm match {
      case "nul" => false // zero non-null values: no comparison can hold
      case "unk" => true
      case "ex" =>
        val lo = cmpDomain(kind, c.min, v) // min vs v
        val hi = cmpDomain(kind, c.max, v) // max vs v
        op match {
          case "eq" => lo <= 0 && hi >= 0
          case "gt" => hi > 0
          case "ge" => hi >= 0
          case "lt" => lo < 0
          case "le" => lo <= 0
        }
    }

  private[sources] def isNullMay(c: ColRec): Boolean =
    c.nulls match {
      case Some(n) => n > 0
      case None => true // null count unknown -> keep
    }

  private[sources] def isNotNullMay(c: ColRec, rows: Long): Boolean =
    c.mm match {
      case "nul" => false
      case "ex" => true
      case "unk" => !c.nulls.contains(rows)
    }

  /** The smallest byte string strictly greater than every string with
    * prefix `p`, when one exists (all-0xFF prefixes have none). */
  private[sources] def nextPrefix(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && (p(i) & 0xff) == 0xff) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(p, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }

  private[sources] def startsWithMay(c: ColRec, p: Array[Byte]): Boolean =
    if (c.kind != "string") true
    else c.mm match {
      case "nul" => false
      case "unk" => true
      case "ex" =>
        // strings with prefix p live in [p, nextPrefix(p)): overlap check
        val mx = c.max.asInstanceOf[Array[Byte]]
        val mn = c.min.asInstanceOf[Array[Byte]]
        cmpBytes(mx, p) >= 0 && nextPrefix(p).forall(np => cmpBytes(mn, np) < 0)
    }
}

/** [[org.apache.spark.sql.execution.datasources.FileIndex]] that delegates
  * listing (including physical-planning partition pruning) to `base` and
  * then drops every file outside `kept` — the carrier
  * [[StatsFileSkipping]] swaps into a scan, so skipped files never become
  * tasks. Empty partitions vanish entirely; `sizeInBytes` reflects only the
  * surviving bytes, so downstream join-side estimates (broadcast decisions)
  * see the pruned scan, not the raw table.
  *
  * `kept` holds scheme-less URI paths (`Path.toUri.getPath`), NOT raw URI
  * strings: the same local file renders as `file:/x` from a FileStatus and
  * `file:///x` from `inputFiles`, so string-keyed membership over raw URIs
  * silently empties the scan. */
final case class StatsPrunedFileIndex(
    base: org.apache.spark.sql.execution.datasources.FileIndex,
    kept: Set[String])
  extends org.apache.spark.sql.execution.datasources.FileIndex {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.execution.datasources.PartitionDirectory

  private def keep(p: Path): Boolean = kept(p.toUri.getPath)

  override def rootPaths: Seq[Path] = base.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    base.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => keep(f.getPath))))
      .filter(_.files.nonEmpty)

  override def inputFiles: Array[String] =
    base.inputFiles.filter(s => keep(new Path(s)))

  override def refresh(): Unit = base.refresh()

  override lazy val sizeInBytes: Long =
    base.listFiles(Nil, Nil).iterator.flatMap(_.files)
      .filter(f => keep(f.getPath)).map(_.getLen).sum

  override def partitionSchema: StructType = base.partitionSchema
}

/** Plan-time file skipping from the `_file_stats.json` manifest — the
  * scan-planning half of [[FileStats]] (see that doc for the scale argument
  * and the soundness stance). Registered session-locally via
  * [[HiddenPartitioning.register]] or cluster-wide via `GraftExtensions`,
  * in the same user-provided optimizer batch as [[HiddenPartitionPruning]]:
  * that rule turns source-column predicates into partition-directory
  * pruning; this one removes individual FILES inside the surviving
  * directories whose footer-harvested min/max/null-count prove no matching
  * row exists. Files the manifest does not list (appended after the last
  * stats write) and conjunct shapes the evaluator does not model keep their
  * files — the filter still runs over every surviving row, so skipping is
  * an optimization, never a semantics change.
  *
  * The batch runs to fixpoint, so the rewrite must converge: a pass that
  * keeps every currently-listed file returns the plan unchanged, a pass
  * that proves the scan empty folds the whole Filter to an empty
  * [[LocalRelation]], and a pruning pass strictly shrinks the file set. */
object StatsFileSkipping
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or => COr, StartsWith}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
  import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
  import FileStats.FileRec

  private type Check = FileRec => Boolean

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation) =>
      rel.relation match {
        case hfs: HadoopFsRelation if hfs.location.rootPaths.size == 1 =>
          val spark = SparkSession.active
          val root = hfs.location.rootPaths.head
          FileStats.stats(spark, root.toString) match {
            case Some(manifest) =>
              val checks = splitAnd(cond).flatMap(compile)
              if (checks.isEmpty) f
              else {
                val rootUri = FileStats.rootUriPath(
                  root.getFileSystem(spark.sessionState.newHadoopConf()), root)
                // scheme-less URI paths throughout (see StatsPrunedFileIndex);
                // the live LISTING (not inputFiles) so each file's byte length
                // rides along for entryFor's rewritten-in-place check
                val files = hfs.location.listFiles(Nil, Nil)
                  .flatMap(_.files.map(st => (st.getPath.toUri.getPath, st.getLen)))
                val kept = files.filter { case (uriPath, liveLen) =>
                  FileStats.entryFor(manifest,
                      uriPath.stripPrefix(rootUri).stripPrefix("/"), liveLen) match {
                    case Some(rec) => rec.rows > 0 && checks.forall(_(rec))
                    case None => true // unlisted or rewritten: never skip on a guess
                  }
                }.map(_._1)
                if (kept.length == files.length) f
                else if (kept.isEmpty)
                  LocalRelation(rel.output, Nil, isStreaming = false)
                else Filter(cond, rel.copy(relation = hfs.copy(
                  location = StatsPrunedFileIndex(hfs.location, kept.toSet))(spark)))
              }
            case None => f
          }
        case _ => f
      }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Integral byte width, or 0 for a non-integral type. */
  private def intWidth(dt: DataType): Int = dt match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType => 4
    case LongType => 8
    case _ => 0
  }

  /** The (name, effective type) of a bare column reference, looking through
    * the integral UP-casts type coercion inserts (`int_col > 5L` analyzes to
    * `Cast(int_col AS BIGINT) > 5L`; a widening cast is order- and
    * equality-preserving and both sides live in the long domain, so the
    * stats remain exact under it). The widening precondition is load-bearing
    * (mirroring `UnwrapCastInBinaryComparison`): an explicit NARROWING cast
    * (`CAST(bigint_col AS INT) = 5`) wraps on overflow in non-ANSI mode, so
    * a file whose pre-cast values wrap onto the literal would be "provably"
    * skipped while its rows actually satisfy the predicate — deriving
    * through it is unsound, not merely imprecise. Any other wrapping
    * derives nothing. */
  private def attrOf(e: Expression): Option[(String, DataType)] = e match {
    case a: AttributeReference => Some((a.name, a.dataType))
    case c: Cast => c.child match {
      case a: AttributeReference if intWidth(a.dataType) > 0 &&
          intWidth(c.dataType) >= intWidth(a.dataType) =>
        Some((a.name, c.dataType))
      case _ => None
    }
    case _ => None
  }

  /** Column absent from the manifest -> keep the file. */
  private def colCheck(name: String)(g: FileStats.ColRec => Boolean): Check =
    rec => rec.cols.get(name).forall(g)

  private def cmpCheck(name: String, dt: DataType, op: String, l: Literal): Option[Check] =
    if (l.value == null) Some(_ => false) // `col <op> NULL` matches no row
    else for {
      kind <- FileStats.kindOfSpark(dt)
      v <- FileStats.toDomain(l.value, l.dataType)
    } yield colCheck(name)(c => FileStats.cmpMay(c, kind, op, v))

  private def compile(e: Expression): Option[Check] = e match {
    case EqualTo(x, l: Literal) => attrOf(x).flatMap { case (n, dt) => cmpCheck(n, dt, "eq", l) }
    case EqualTo(l: Literal, x) => attrOf(x).flatMap { case (n, dt) => cmpCheck(n, dt, "eq", l) }
    case GreaterThan(x, l: Literal) => attrOf(x).flatMap { case (n, dt) => cmpCheck(n, dt, "gt", l) }
    case GreaterThan(l: Literal, x) => attrOf(x).flatMap { case (n, dt) => cmpCheck(n, dt, "lt", l) }
    case GreaterThanOrEqual(x, l: Literal) => attrOf(x).flatMap { case (n, dt) => cmpCheck(n, dt, "ge", l) }
    case GreaterThanOrEqual(l: Literal, x) => attrOf(x).flatMap { case (n, dt) => cmpCheck(n, dt, "le", l) }
    case LessThan(x, l: Literal) => attrOf(x).flatMap { case (n, dt) => cmpCheck(n, dt, "lt", l) }
    case LessThan(l: Literal, x) => attrOf(x).flatMap { case (n, dt) => cmpCheck(n, dt, "gt", l) }
    case LessThanOrEqual(x, l: Literal) => attrOf(x).flatMap { case (n, dt) => cmpCheck(n, dt, "le", l) }
    case LessThanOrEqual(l: Literal, x) => attrOf(x).flatMap { case (n, dt) => cmpCheck(n, dt, "ge", l) }
    case EqualNullSafe(x, l: Literal) => nullSafe(x, l)
    case EqualNullSafe(l: Literal, x) => nullSafe(x, l)
    case In(x, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      attrOf(x).flatMap { case (n, dt) =>
        val nonNull = vs.collect { case l: Literal if l.value != null => l }
        if (nonNull.isEmpty) Some((_: FileRec) => false) // IN (NULL,...) matches no row
        else {
          val member = nonNull.map(cmpCheck(n, dt, "eq", _))
          if (member.exists(_.isEmpty)) None
          else Some((rec: FileRec) => member.flatten.exists(_(rec)))
        }
      }
    case InSet(x, hset) =>
      attrOf(x).flatMap { case (n, dt) =>
        FileStats.kindOfSpark(dt).flatMap { kind =>
          val nonNull = hset.iterator.filter(_ != null).toSeq
          val vals = nonNull.flatMap(v => FileStats.toDomain(v, dt))
          if (vals.size != nonNull.size) None // a value we cannot model
          else if (vals.isEmpty) Some((_: FileRec) => false)
          else Some(colCheck(n)(c => vals.exists(v => FileStats.cmpMay(c, kind, "eq", v))))
        }
      }
    case IsNull(x) => attrOf(x).map { case (n, _) =>
      (rec: FileRec) => rec.cols.get(n).forall(FileStats.isNullMay)
    }
    case IsNotNull(x) => attrOf(x).map { case (n, _) =>
      (rec: FileRec) => rec.cols.get(n).forall(c => FileStats.isNotNullMay(c, rec.rows))
    }
    case StartsWith(x, l: Literal) if l.value != null =>
      attrOf(x).collect { case (n, StringType) =>
        val p = l.value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
        colCheck(n)(c => FileStats.startsWithMay(c, p))
      }
    // a disjunction may match iff either branch may — but only when BOTH
    // branches are provable; one unmodeled branch makes the whole OR
    // unmodeled (it alone could admit the row)
    case COr(l, r) =>
      for { cl <- compile(l); cr <- compile(r) }
        yield (rec: FileRec) => cl(rec) || cr(rec)
    // `col != v`: only a file whose every non-null value IS v (min==max==v)
    // or that holds no non-null value at all can prove no row passes —
    // NULLs never satisfy != either, so they don't block the skip
    case Not(EqualTo(x, l: Literal)) => notEqual(x, l)
    case Not(EqualTo(l: Literal, x)) => notEqual(x, l)
    case _ => None
  }

  private def notEqual(x: Expression, l: Literal): Option[Check] =
    attrOf(x).flatMap { case (n, dt) =>
      if (l.value == null) Some((_: FileRec) => false) // `col != NULL`: no row
      else for {
        kind <- FileStats.kindOfSpark(dt)
        v <- FileStats.toDomain(l.value, l.dataType)
      } yield colCheck(n)(c =>
        if (c.kind != kind) true
        else c.mm match {
          case "nul" => false
          case "unk" => true
          case "ex" => !(domEq(c.min, v, kind) && domEq(c.max, v, kind))
        })
    }

  private def domEq(a: Any, b: Any, kind: String): Boolean = kind match {
    case "string" => java.util.Arrays.equals(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case _ => a.asInstanceOf[Long] == b.asInstanceOf[Long]
  }

  private def nullSafe(x: Expression, l: Literal): Option[Check] =
    attrOf(x).flatMap { case (n, dt) =>
      if (l.value == null) // `col <=> NULL` is IS NULL
        Some((rec: FileRec) => rec.cols.get(n).forall(FileStats.isNullMay))
      else cmpCheck(n, dt, "eq", l)
    }
}

/** Metadata COUNT pushdown — Iceberg's "count(*) from manifests" applied to
  * the stats layer: an ungrouped, unfiltered `count(*)`/`count(1)` over a
  * stats-carrying parquet table folds to a [[LocalRelation]] holding the
  * manifest row-count sum. At 100 TB a bare count is a pure metadata
  * question; scheduling a task per file to learn it is the anti-pattern
  * this rule removes.
  *
  * Soundness guards (each one independently keeps the scan):
  *   - EVERY file the relation currently lists must appear in the manifest
  *     — a file appended after the last stats write makes the manifest an
  *     undercount, so coverage is checked against the live listing, and
  *     the sum is taken over the LISTED files only (a manifest entry whose
  *     file was deleted must not overcount either);
  *   - any Filter between the aggregate and the relation disqualifies
  *     (count-under-predicate is [[StatsFileSkipping]]'s job at file
  *     granularity, not this rule's);
  *   - only `count(1)`-shaped aggregates (no DISTINCT, no FILTER clause,
  *     no other functions) qualify — a Project in between is fine, it is
  *     row-preserving. */
object StatsCountPushdown
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
  import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate if agg.groupingExpressions.isEmpty &&
        agg.aggregateExpressions.nonEmpty &&
        agg.aggregateExpressions.forall(isCountStar) =>
      relationOf(agg.child) match {
        case Some(hfs) if hfs.location.rootPaths.size == 1 =>
          val spark = SparkSession.active
          val root = hfs.location.rootPaths.head
          FileStats.stats(spark, root.toString) match {
            case Some(manifest) =>
              val rootUri = FileStats.rootUriPath(
                root.getFileSystem(spark.sessionState.newHadoopConf()), root)
              // live listing (with byte lengths): an entry whose file was
              // rewritten in place must disqualify the fold, same as unlisted
              val recs = hfs.location.listFiles(Nil, Nil).flatMap(_.files.map(st =>
                FileStats.entryFor(manifest,
                  FileStats.relPath(rootUri, st.getPath), st.getLen)))
              if (recs.forall(_.isDefined)) {
                val n = recs.map(_.get.rows).sum
                LocalRelation(agg.output.map(_.toAttribute),
                  Seq(InternalRow(agg.aggregateExpressions.map(_ => n): _*)),
                  isStreaming = false)
              } else agg // a listed file the manifest misses: count for real
            case None => agg
          }
        case _ => agg
      }
  }

  /** The relation under the aggregate, looking through row-preserving
    * Projects only. A Filter (or anything else) disqualifies. */
  private def relationOf(p: LogicalPlan): Option[HadoopFsRelation] = p match {
    case Project(_, child) => relationOf(child)
    case rel: LogicalRelation if !rel.isStreaming => rel.relation match {
      case hfs: HadoopFsRelation => Some(hfs)
      case _ => None
    }
    case _ => None
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) => v != null // count(1)/count(lit)
        case _ => false
      })
    case _ => false
  }
}
