package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.SparkContext

import graft.io.Tar

/** DataSource V2 READER for WebDataset-style tar shard directories
  * (the layout [[graft.llm.Pack.writeTarShards]] writes:
  * `shard_<k>.tar` files of `<key>.<ext>` members):
  * `spark.read.format("wds-shards").load(dir)` yields one row per
  * member — `(shard, key, ext, size, payload: binary)`.
  *
  * A training loader READS shards far more often than it writes them;
  * this is the mount-back counterpart of the five shard writers
  * (q429/q431/q436/q437/q439), built like [[NpyDataSource]]:
  *
  *   - **Shard-file pruning**: each file IS one shard, declared in its
  *     name — predicates on `shard` are accepted via
  *     `SupportsPushDownFilters` and evaluated against the parsed
  *     names at planning time, so `WHERE shard = 3` opens only that
  *     shard. Exact at whole-file granularity (Spark re-applies
  *     nothing). This is how a loader resumes mid-run or a debugger
  *     pulls one shard out of 10⁵ without listing-and-reading 100 TB.
  *   - **Decode-skipping projection**: via
  *     `SupportsPushDownRequiredColumns`. A projection without
  *     `payload` streams HEADERS ONLY — [[Tar.memberIterator]] with
  *     `withPayload = false` skips every payload and its 512-padding
  *     instead of reading it, so a manifest-style scan (keys, sizes)
  *     costs 512 bytes per member, not the shard. WdsSourceSpec pins
  *     both behaviors with counters.
  *   - One [[InputPartition]] per shard file: shards are BY DESIGN
  *     single-executor-sized (the WebDataset contract — ~100 MB–1 GB
  *     so loaders can stream them sequentially), the engine-wide work
  *     unit, scheduled by Spark with locality and no driver
  *     materialization. Members stream through the strict parser —
  *     bad magic / checksum mismatch / truncation die loud (the
  *     quarantine contract), never yield silent rows.
  *
  * Member names split at the FIRST dot — `key` is the WebDataset
  * grouping key (all modalities of one sample share it: `7.txt` and
  * `7.bmp` are two rows with key "7"), `ext` the member type; a
  * dotless name has ext "".
  */
class WdsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "wds-shards"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WdsDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      sys.error("wds-shards requires .load(<directory>)"))
    WdsShardTable(path)
  }
}

object WdsDataSource {
  val schema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("ext", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** test hooks (same-JVM local mode): shard files actually opened,
    * and members whose payload was actually materialized
    */
  private[graft] val filesOpened = new AtomicLong(0)
  private[graft] val payloadReads = new AtomicLong(0)

  private[sources] def splitName(name: String): (String, String) = {
    val dot = name.indexOf('.')
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  /** evaluate a pushed filter against a shard index; filters that get
    * here reference only `shard` (vetted in pushFilters)
    */
  private[sources] def eval(f: Filter, shard: Int): Boolean = {
    // compare as Long: an out-of-Int-range literal must evaluate
    // truthfully, not prune every file (the NpyDataSource rule)
    val v = shard.toLong
    def asLong(x: Any): Long = x match {
      case i: Int => i.toLong
      case l: Long => l
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => sys.error(s"unexpected literal $other in pushed filter")
    }
    f match {
      case EqualTo(_, x) => v == asLong(x)
      case In(_, xs) => xs.exists(asLong(_) == v)
      case GreaterThan(_, x) => v > asLong(x)
      case GreaterThanOrEqual(_, x) => v >= asLong(x)
      case LessThan(_, x) => v < asLong(x)
      case LessThanOrEqual(_, x) => v <= asLong(x)
      case And(l, r) => eval(l, shard) && eval(r, shard)
      case Or(l, r) => eval(l, shard) || eval(r, shard)
      case Not(c) => !eval(c, shard)
      case _ => sys.error(s"unexpected pushed filter $f")
    }
  }

  /** a filter is fully evaluable at file granularity iff it references
    * only `shard` with integral literals
    */
  private[sources] def supported(f: Filter): Boolean = {
    def intLit(x: Any): Boolean = x match {
      case _: Int | _: Long | _: Short | _: Byte => true
      case _ => false
    }
    f match {
      case EqualTo("shard", x) => intLit(x)
      case In("shard", xs) => xs.nonEmpty && xs.forall(intLit)
      case GreaterThan("shard", x) => intLit(x)
      case GreaterThanOrEqual("shard", x) => intLit(x)
      case LessThan("shard", x) => intLit(x)
      case LessThanOrEqual("shard", x) => intLit(x)
      case And(l, r) => supported(l) && supported(r)
      case Or(l, r) => supported(l) && supported(r)
      case Not(c) => supported(c)
      case _ => false
    }
  }
}

case class WdsShardTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"wds-shards `$path`"
  override def schema(): StructType = WdsDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WdsScanBuilder(path)
}

class WdsScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = WdsDataSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(WdsDataSource.supported)
    pushed = ok
    rest // unsupported conjuncts stay with Spark
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = WdsScan(path, required, pushed)
}

case class WdsShardPartition(file: String, shard: Int) extends InputPartition

case class WdsScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"wds-shards $path, pushed=[${pushed.mkString(", ")}], read=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val conf = SparkContext.getOrCreate().hadoopConfiguration
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).iterator
      .filter(_.isFile)
      .flatMap { st =>
        Tar.parseShardFileName(st.getPath.getName)
          .map(sh => (st.getPath.toString, sh))
      }
      .filter { case (_, sh) => pushed.forall(WdsDataSource.eval(_, sh)) }
      .map { case (f, sh) => WdsShardPartition(f, sh): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the driver's Hadoop conf entries so scheme credentials and
    // settings apply on executors (Configuration isn't serializable)
    val confEntries = SparkContext.getOrCreate().hadoopConfiguration
      .iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    WdsReaderFactory(required, confEntries)
  }
}

case class WdsReaderFactory(required: StructType,
    confEntries: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[WdsShardPartition]
    val needPayload = required.fieldNames.contains("payload")
    new PartitionReader[InternalRow] {
      WdsDataSource.filesOpened.incrementAndGet()
      private val in = {
        val conf = new Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val p = new Path(part.file)
        p.getFileSystem(conf).open(p)
      }
      private val members = Tar.memberIterator(in, withPayload = needPayload)
      private var current: (String, Long, Option[Array[Byte]]) = _

      override def next(): Boolean =
        if (members.hasNext) { current = members.next(); true } else false

      override def get(): InternalRow = {
        val (name, size, body) = current
        val (key, ext) = WdsDataSource.splitName(name)
        val vals = required.fields.map { f =>
          f.name match {
            case "shard" => part.shard
            case "key" => UTF8String.fromString(key)
            case "ext" => UTF8String.fromString(ext)
            case "size" => size
            case "payload" =>
              WdsDataSource.payloadReads.incrementAndGet()
              body.get
            case other => sys.error(s"unknown column $other")
          }
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }

      override def close(): Unit = in.close()
    }
  }
}
