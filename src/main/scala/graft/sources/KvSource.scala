package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, XxHash64Function}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-kv` — a DataSource V2 connector for a hash-bucketed key-value
  * snapshot, the engine-level face of the reference's DynamoDB draft-state
  * store (SURVEY.md S9: `app/app.py:139-245` GetItem/Scan + the `isin`
  * serving join). The reference treats the KV store as an external system
  * reached through driver-side API calls; here it is a first-class Spark
  * table: `spark.read.format("graft.sources.KvTableProvider").load(dir)`
  * plans a distributed scan whose PARTITIONS are the hash buckets, so a
  * key-equality predicate prunes the scan to one bucket — the GetItem access
  * path — while a full scan reads all buckets in parallel — the paginated
  * Scan access path. This is the §7.3 escape hatch not exercised anywhere
  * else: a custom source with schema inference, partition planning, filter
  * pushdown (bucket pruning) and column pruning.
  *
  * Layout (written by [[KvStore.write]], entirely via distributed Spark
  * jobs): `dir/__b=<bucket>/part-*.json` JSON-lines files from a
  * `partitionBy` write, plus a driver-written metadata-scale
  * `_graft_kv_meta.json` carrying the key column, bucket count, and schema
  * DDL. Bucketing hash = Spark SQL's `xxhash64` (seed 42), recomputed on the
  * read side via the same catalyst `XxHash64Function`, so writer and pruner
  * can never drift.
  */
object KvStore {
  private[sources] val MetaFile = "_graft_kv_meta.json"

  private val SupportedTypes: Set[DataType] =
    Set(StringType, LongType, IntegerType, DoubleType, BooleanType)

  /** Write `df` as a graft-kv snapshot: hash-bucketed on `key` into
    * `buckets` partitions. Distributed end to end; only the metadata file is
    * driver-written. Schema is validated HERE (driver, before any write)
    * against the reader's supported types — deferring it would let the
    * snapshot land and every later scan fail per-batch on executors. */
  def write(df: DataFrame, dir: String, key: String, buckets: Int): Unit = {
    require(buckets > 0, "buckets must be positive")
    require(df.columns.contains(key), s"key column '$key' not in ${df.columns.toSeq}")
    require(!df.columns.contains("__b"),
      "'__b' is the reserved bucket column: a user column of that name " +
        "would be silently overwritten by the bucket id and read back null")
    df.schema.fields.foreach(f => require(SupportedTypes.contains(f.dataType),
      s"graft-kv does not support ${f.dataType} (column '${f.name}'); " +
        s"supported: ${SupportedTypes.map(_.simpleString).mkString(", ")}"))
    // column-API hash, never SQL-text splicing: a key named `a-b` would
    // otherwise PARSE as subtraction and bucket by the wrong value while
    // meta records the name — the read-side pruner would then probe the
    // wrong bucket and silently return no rows
    df.withColumn("__b", pmod(xxhash64(col(key)), lit(buckets.toLong)))
      .write.mode("overwrite").partitionBy("__b").json(dir)
    val spark = df.sparkSession
    val meta = new ObjectMapper().createObjectNode()
    meta.put("key", key)
    meta.put("buckets", buckets)
    meta.put("schema", df.schema.toDDL)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(dir, MetaFile), true)
    out.write(meta.toString.getBytes("UTF-8"))
    out.close()
  }

  /** True when `dir` holds a COMPLETE snapshot: the metadata file is written
    * last, so its presence is the commit marker (skip-if-exists guards use
    * this, never `_SUCCESS` alone — the json commit precedes the meta).
    * Checked through the Hadoop FileSystem like [[write]]/[[readMeta]], so
    * the guard works on URI paths (hdfs://, s3a://, file:/) too — a
    * local-File check would read false there and re-overwrite on every
    * build, reintroducing the concurrent-scan race the marker prevents. */
  def exists(dir: String): Boolean = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    new Path(dir).getFileSystem(conf).exists(new Path(dir, MetaFile))
  }

  private[sources] case class Meta(key: String, buckets: Int, schema: StructType)

  private[sources] def readMeta(dir: String): Meta = {
    val spark = SparkSession.active
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(new Path(dir, MetaFile))
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
    val node = new ObjectMapper().readTree(bytes)
    Meta(node.get("key").asText(), node.get("buckets").asInt(),
      StructType.fromDDL(node.get("schema").asText()))
  }

  /** The write-side bucket function, exposed for the read-side pruner. */
  private[sources] def bucketOf(keyValue: String, buckets: Int): Int =
    java.lang.Math.floorMod(
      XxHash64Function.hash(UTF8String.fromString(keyValue), StringType, 42L),
      buckets.toLong).toInt
}

class KvTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvStore.readMeta(options.get("path")).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

class KvTable(dir: String, schema: StructType) extends Table with SupportsRead {
  // one meta read per TABLE, not per scan: re-planning a hot path (s10's
  // probe shape) must not pay a filesystem round trip per newScanBuilder
  private lazy val meta = KvStore.readMeta(dir)
  override def name(): String = s"graft-kv `$dir`"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(dir, schema, meta)
}

class KvScanBuilder(dir: String, fullSchema: StructType, meta: KvStore.Meta)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var keyFilters: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    keyFilters = filters.filter {
      case EqualTo(a, _: String) => a == meta.key
      case In(a, vs) => a == meta.key && vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    // every filter is re-evaluated by Spark post-scan: the key filters are
    // used for bucket PRUNING only, which may keep false-positive rows of
    // the same bucket — exactly the parquet row-group-stats contract
    filters
  }

  override def pushedFilters(): Array[Filter] = keyFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // buckets that can hold a matching key: intersection across key filters,
    // union within one filter's value list; no key filter -> all buckets
    val all = (0 until meta.buckets).toSet
    val live = keyFilters.foldLeft(all) { (acc, f) =>
      val hit = f match {
        case EqualTo(_, v: String) => Set(KvStore.bucketOf(v, meta.buckets))
        case In(_, vs) => vs.map(v => KvStore.bucketOf(v.asInstanceOf[String], meta.buckets)).toSet
        case _ => all
      }
      acc intersect hit
    }
    new KvScan(dir, meta, required, live)
  }
}

/** One input partition per live bucket (bucket = unit of parallelism AND of
  * pruning). File listing happens once on the driver at planning time. */
case class KvBucketPartition(files: Array[String]) extends InputPartition

class KvScan(dir: String, meta: KvStore.Meta, required: StructType,
    liveBuckets: Set[Int]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv buckets=${liveBuckets.size}/${meta.buckets} cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    liveBuckets.toArray.sorted.flatMap { b =>
      val p = new Path(dir, s"__b=$b")
      if (!fs.exists(p)) None
      else {
        val files = fs.listStatus(p)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
          .map(_.getPath.toString)
        if (files.isEmpty) None else Some(KvBucketPartition(files))
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // runs on the DRIVER: capture the session Hadoop conf here and ship it
    // to executors, so credentialed/HA filesystems (s3a keys, HDFS
    // nameservices) resolve on the scan path exactly as they did at
    // planning — a bare executor-side `new Configuration()` would not
    new KvReaderFactory(required,
      new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))
}

/** Hadoop `Configuration` is not java-serializable; ship it Writable-style
  * (the same trick Spark's own file sources use). */
private[sources] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

class KvReaderFactory(required: StructType, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvPartitionReader(partition.asInstanceOf[KvBucketPartition], required, conf)
}

/** Streams the bucket's JSON-lines files; one Jackson parse per row, fields
  * materialized only for the pruned schema. */
class KvPartitionReader(partition: KvBucketPartition, required: StructType,
    sconf: SerializableHadoopConf) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private def conf = sconf.value
  private var fileIdx = 0
  private var reader: java.io.BufferedReader = _
  private var line: String = _

  private def nextLine(): String = {
    while (true) {
      if (reader == null) {
        if (fileIdx >= partition.files.length) return null
        val p = new Path(partition.files(fileIdx))
        fileIdx += 1
        reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getFileSystem(conf).open(p), "UTF-8"))
      }
      val l = reader.readLine()
      if (l == null) { reader.close(); reader = null }
      else if (l.nonEmpty) return l
    }
    null // unreachable
  }

  override def next(): Boolean = { line = nextLine(); line != null }

  override def get(): InternalRow = {
    val node = mapper.readTree(line)
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      val f = required(i)
      val v = node.get(f.name)
      row.update(i, if (v == null || v.isNull) null else convert(v, f.dataType))
      i += 1
    }
    row
  }

  private def convert(v: com.fasterxml.jackson.databind.JsonNode,
      dt: DataType): Any = dt match {
    case StringType => UTF8String.fromString(v.asText())
    case LongType => v.asLong()
    case IntegerType => v.asInt()
    case DoubleType => v.asDouble()
    case BooleanType => v.asBoolean()
    case other => throw new IllegalArgumentException(
      s"graft-kv does not support $other")
  }

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}
