package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL maintenance procedures for the `graft` catalog — Iceberg's `CALL`
  * surface (`rewrite_data_files`, `expire_snapshots`, …) on Spark 4's DSv2
  * `ProcedureCatalog` API, so table operations stop needing Scala:
  *
  * {{{
  *   CALL graft.system.compact('db.t')                        -- rewrite-to-one-era
  *   CALL graft.system.compact('db.t', 'event_id', 134217728) -- clustered, sized
  *   CALL graft.system.expire_snapshots('db.t', 86400000, 3)  -- age retention
  *   CALL graft.system.vacuum('db.t', 5)                      -- count retention
  *   CALL graft.system.maintain('db.t')                       -- policy pass
  * }}}
  *
  * Each call delegates to the SAME maintenance entry point the Scala API
  * exposes ([[VersionedHiddenTable.compact]]/[[VersionedHiddenTable.expireSnapshots]]/
  * [[VersionedHiddenTable.vacuum]]/[[TableService.maintain]]) and returns
  * its outcome as result rows through a driver-side [[LocalScan]] — these
  * are manifest-level operations whose results are a handful of version
  * ids, not data-scale rows (the data-scale work inside them stays
  * distributed). Tag/branch pins survive exactly as in the Scala API
  * because it IS the Scala API. */
object GraftProcedures {

  private val System = Array("system")

  /** Procedure identifiers under `<catalog>.system`. */
  def list(namespace: Array[String]): Array[Identifier] =
    if (!namespace.sameElements(System)) Array.empty
    else Array("compact", "expire_snapshots", "vacuum", "maintain")
      .map(Identifier.of(System, _))

  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(System),
      s"unknown procedure namespace ${ident.namespace().mkString(".")} " +
        "(procedures live under `system`)")
    val spark = SparkSession.active
    def dirOf(table: String): String = {
      val dir = (Seq(catalog.warehouseDir) ++ table.split('.')).mkString("/")
      require(VersionedHiddenTable.versions(spark, dir).nonEmpty,
        s"${catalog.name()}: no such table '$table'")
      dir
    }
    def p(name: String, dt: DataType) = ProcedureParameter.in(name, dt).build()
    def pd(name: String, dt: DataType, default: String) =
      ProcedureParameter.in(name, dt).defaultValue(default).build()

    ident.name() match {
      case "compact" => proc("compact",
        "Rewrite the live snapshot into one era (clustered + size-targeted " +
          "when cluster_by is set); retires merge-on-read masks",
        Array(p("table", StringType),
          pd("cluster_by", StringType, "NULL"),
          pd("target_bytes", LongType, (128L << 20).toString)),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        in => {
          val dir = dirOf(in.getUTF8String(0).toString)
          val clusterBy = if (in.isNullAt(1)) Nil
            else in.getUTF8String(1).toString.split(',').toSeq
              .map(_.trim).filter(_.nonEmpty)
          val v = VersionedHiddenTable.compact(spark, dir, clusterBy, in.getLong(2))
          Seq(InternalRow(v))
        })
      case "expire_snapshots" => proc("expire_snapshots",
        "Retire snapshots older than older_than_ms (keeping keep_last and " +
          "every tag/branch pin), then reference-counted GC",
        Array(p("table", StringType), p("older_than_ms", LongType),
          pd("keep_last", IntegerType, "1")),
        StructType(Seq(StructField("expired_version", LongType, nullable = false))),
        in => {
          val dir = dirOf(in.getUTF8String(0).toString)
          VersionedHiddenTable.expireSnapshots(spark, dir, in.getLong(1),
            in.getInt(2)).map(v => InternalRow(v))
        })
      case "vacuum" => proc("vacuum",
        "Retire all but the newest keep snapshots (tag/branch pins survive), " +
          "then reference-counted GC",
        Array(p("table", StringType), p("keep", IntegerType)),
        StructType(Seq(StructField("dropped_version", LongType, nullable = false))),
        in => {
          val dir = dirOf(in.getUTF8String(0).toString)
          VersionedHiddenTable.vacuum(spark, dir, in.getInt(1))
            .map(v => InternalRow(v))
        })
      case "maintain" => proc("maintain",
        "One TableService policy pass: compact iff fragmented, then retire " +
          "history; manifest-reads only on an already-tidy table",
        Array(p("table", StringType),
          pd("max_live_eras", IntegerType, "16"),
          pd("max_del_files", IntegerType, "4"),
          pd("keep_snapshots", IntegerType, "3")),
        StructType(Seq(
          StructField("live_eras", IntegerType, nullable = false),
          StructField("del_files", IntegerType, nullable = false),
          StructField("compacted", BooleanType, nullable = false),
          StructField("dropped_snapshots", IntegerType, nullable = false),
          StructField("latest_version", LongType, nullable = false))),
        in => {
          val dir = dirOf(in.getUTF8String(0).toString)
          val r = TableService.maintain(spark, dir, TableService.Policy(
            maxLiveEras = in.getInt(1), maxDelFiles = in.getInt(2),
            keepSnapshots = in.getInt(3)))
          Seq(InternalRow(r.liveEras, r.delFiles, r.compacted,
            r.droppedSnapshots.size, r.latestVersion))
        })
      case other => throw new UnsupportedOperationException(
        s"unknown procedure '$other' (have: compact, expire_snapshots, " +
          "vacuum, maintain)")
    }
  }

  /** An unbound+bound procedure in one: binding is trivial because the
    * parameter list is fixed — Spark aligns/coerces arguments to
    * `parameters()` and hands `call` one InternalRow in that order. */
  private def proc(procName: String, desc: String,
      params: Array[ProcedureParameter], resultSchema: StructType,
      body: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params
      // every procedure mutates table state; never cache/reuse its result
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        // distinct name from the LocalScan member: `rows` inside the anon
        // class would resolve to the method itself (a tail-recursive spin)
        val resultRows = body(input).toArray
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = resultRows
          override def readSchema(): StructType = resultSchema
        }).iterator()
      }
    }
}
