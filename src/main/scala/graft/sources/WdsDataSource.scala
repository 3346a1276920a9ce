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
  * member — `(shard, idx, key, ext, size, payload: binary)`, where
  * `idx` is the member's ordinal within its shard file (= the order a
  * sequential loader sees — how q448 pins consumption order).
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

  // writes arrive with the DataFrame's (key, ext, payload) schema, not
  // the 5-column read schema — accept it here, vet it in WriteBuilder
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      sys.error("wds-shards requires .load(<directory>) / .save(<directory>)"))
    WdsShardTable(path, schema)
  }
}

object WdsDataSource {
  val schema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("ext", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** streaming shard-id encoding: shard = epoch·EpochStride + slot
    * (the [[graft.llm.Pack.seqIdStride]] house rule)
    */
  private[graft] val EpochStride = 100000L

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

case class WdsShardTable(path: String, tableSchema: StructType)
    extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"wds-shards `$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(tableSchema == WdsDataSource.schema,
      "wds-shards does not support user-specified read schemas; " +
        "project after .load() instead")
    val maxShards = Option(options.get("maxShardsPerTrigger")).map { v =>
      val n = v.toInt
      require(n >= 1, s"maxShardsPerTrigger must be >= 1: $n")
      n
    }
    new WdsScanBuilder(path, maxShards)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new WdsWriteBuilder(path, info.schema(), info.options())
}

class WdsScanBuilder(path: String, maxShards: Option[Int] = None)
    extends ScanBuilder
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

  override def build(): Scan = WdsScan(path, required, pushed, maxShards)
}

case class WdsShardPartition(file: String, shard: Int) extends InputPartition

case class WdsScan(path: String, required: StructType, pushed: Array[Filter],
    maxShards: Option[Int] = None)
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

  /** STREAMING READ — `readStream.format("wds-shards")`: shards are
    * consumed in SHARD-ID ORDER as they appear, which is exactly how
    * a training loader follows a crawl that appends shards (and, for
    * a q448 curriculum artifact, ID order IS the curriculum). The
    * offset is simply the highest shard id processed — exact,
    * restart-safe (the checkpoint replays ids > offset), and immune
    * to re-listing races because published shard files are immutable
    * (the sink's rename-publish contract). Pushed `shard` filters
    * and column pruning apply unchanged. CONTRACT: shards must be
    * published in increasing id order — ids at or below the committed
    * offset are never re-listed (the streaming sink's epoch encoding
    * guarantees the order; WdsSourceSpec pins the two-wave pickup).
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    WdsMicroBatchStream(path, required, pushed, maxShards)
}

case class WdsOffset(maxShard: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"maxShard":$maxShard}"""
}

case class WdsMicroBatchStream(path: String, required: StructType,
    pushed: Array[Filter], maxShards: Option[Int])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  private def listIds(): Seq[(String, Int)] = {
    val p = new Path(path)
    val conf = SparkContext.getOrCreate().hadoopConfiguration
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).iterator
      .filter(_.isFile)
      .flatMap(st => Tar.parseShardFileName(st.getPath.getName)
        .map(sh => (st.getPath.toString, sh)))
      .toSeq
  }

  override def initialOffset(): Offset = WdsOffset(-1L)

  override def latestOffset(): Offset = {
    val ids = listIds()
    WdsOffset(if (ids.isEmpty) -1L else ids.map(_._2.toLong).max)
  }

  /** RATE CONTROL — `.option("maxShardsPerTrigger", n)`: each trigger
    * admits at most the n LOWEST unprocessed shard ids (admission is
    * id-ordered, like everything else here — a rate-limited loader
    * still walks the curriculum in order). Backlog beyond the cap
    * stays pending; the engine keeps triggering until drained.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxShards.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[WdsOffset].maxShard
    val fresh = listIds().map(_._2.toLong).filter(_ > lo).sorted
    if (fresh.isEmpty) start
    else limit match {
      case mf: ReadMaxFiles => WdsOffset(fresh.take(mf.maxFiles()).last)
      case _ => WdsOffset(fresh.last)
    }
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset = {
    val m = """\{"maxShard":(-?\d+)\}""".r
    json.trim match {
      case m(v) => WdsOffset(v.toLong)
      case other => sys.error(s"bad wds-shards offset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[WdsOffset].maxShard
    val hi = end.asInstanceOf[WdsOffset].maxShard
    listIds()
      .filter { case (_, sh) => sh > lo && sh <= hi }
      .filter { case (_, sh) => pushed.forall(WdsDataSource.eval(_, sh)) }
      .sortBy(_._2)
      .map { case (f, sh) => WdsShardPartition(f, sh): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val confEntries = SparkContext.getOrCreate().hadoopConfiguration
      .iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    WdsReaderFactory(required, confEntries)
  }

  // ids <= the committed offset are done (immutable artifacts); ids
  // above it are simply the next batch — nothing to reconcile here
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** The SINK half: `df.write.format("wds-shards").save(dir)` with input
  * rows `(key string, ext string, payload binary)` — each non-empty
  * Spark partition streams into ONE `shard_<partitionId>.tar` under
  * the real DataSource V2 two-phase commit protocol:
  *
  *   - a task writes to a UNIQUE temp (`.tmp-<uuid>`, one per task
  *     ATTEMPT — speculative/retried attempts cannot collide) through
  *     [[Tar.StreamWriter]] in CONSTANT memory (header + payload +
  *     padding stream straight out; a 1 GiB shard never materializes
  *     on-heap);
  *   - `DataWriter.commit` returns the temp path in its commit
  *     message; nothing is visible yet;
  *   - the DRIVER's `BatchWrite.commit` publishes every temp via
  *     rename — only fully-written shards from the winning attempts
  *     become visible, the all-or-nothing file-sink contract;
  *   - `abort` (task- or job-level) deletes temps, leaving the
  *     directory exactly as it was.
  *
  * SaveMode.Overwrite (TRUNCATE capability) deletes the existing
  * `shard_*.tar` set inside the driver commit, after every new temp is
  * known good — a failed overwrite never destroys the old data.
  * Partition → shard is the caller's contract (repartition by a shard
  * key first); empty partitions produce NO file (no empty shards).
  *
  * `.option("shardColumn", "<col>")` switches to DATA-DRIVEN shard
  * identity (the dynamic-partitioning analogue): input rows are
  * (<col> int/long, key, ext, payload) and each distinct column value
  * becomes `shard_<value>.tar`, so the on-disk shard numbering is a
  * semantic artifact (e.g. the curriculum step, q448) instead of a
  * physical partition id. The caller must partition BY that column
  * (all rows of one shard in one partition — a value split across
  * partitions is detected at driver commit, which fails LOUD before
  * any rename); a partition may own several shards, each streamed to
  * its own temp. Member order within a shard = row order within the
  * partition (sortWithinPartitions first), surfaced back by the
  * reader's `idx` column.
  */
class WdsWriteBuilder(path: String, schema: StructType,
    options: CaseInsensitiveStringMap)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false

  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }

  override def build(): org.apache.spark.sql.connector.write.Write = {
    val names = schema.fields.map(f => f.name -> f.dataType).toMap
    val shardCol = Option(options.get("shardColumn"))
    shardCol match {
      case None =>
        require(names.get("key").contains(StringType) &&
          names.get("ext").contains(StringType) &&
          names.get("payload").contains(BinaryType) && schema.fields.length == 3,
          "wds-shards write expects exactly (key string, ext string, " +
            s"payload binary), got ${schema.simpleString}")
      case Some(sc) =>
        require(names.get(sc).exists(t => t == LongType || t == IntegerType),
          s"wds-shards shardColumn '$sc' must be an int/long column of the " +
            s"input, got ${schema.simpleString}")
        require(names.get("key").contains(StringType) &&
          names.get("ext").contains(StringType) &&
          names.get("payload").contains(BinaryType) && schema.fields.length == 4,
          s"wds-shards write with shardColumn expects exactly ($sc int/long, " +
            s"key string, ext string, payload binary), got ${schema.simpleString}")
    }
    val confEntries = SparkContext.getOrCreate().hadoopConfiguration
      .iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    WdsWrite(path, schema, doTruncate, shardCol, confEntries)
  }
}

case class WdsWrite(path: String, schema: StructType, truncate: Boolean,
    shardCol: Option[String], confEntries: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.BatchWrite
    with org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write._

  override def toBatch: BatchWrite = this
  override def toStreaming: streaming.StreamingWrite = this
  // both parent traits declare this default — restate to disambiguate
  override def useCommitCoordinator(): Boolean = true

  private def factory(epochBase: Long): WdsWriterFactory = {
    val keyAt = schema.fieldIndex("key")
    val extAt = schema.fieldIndex("ext")
    val payloadAt = schema.fieldIndex("payload")
    val shardAt = shardCol.map(sc =>
      (schema.fieldIndex(sc), schema(sc).dataType == LongType))
    WdsWriterFactory(path, keyAt, extAt, payloadAt, shardAt, epochBase,
      confEntries)
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = factory(epochBase = 0L)

  /** STREAMING: shard id = epoch·10⁵ + (shard-column value | partition
    * id) — a pure function of (epoch, slot), so a replayed epoch (the
    * at-least-once delivery case) regenerates the SAME file names and
    * the commit's delete-then-rename makes the artifacts exactly-once
    * (the q431 contract, engine-native). No truncate in streaming:
    * each epoch only ever touches its own names.
    */
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : streaming.StreamingDataWriterFactory = {
    val self = this
    new streaming.StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] = {
        require(epochId >= 0 && partitionId < WdsDataSource.EpochStride,
          s"epoch $epochId / partition $partitionId overflow the shard-id encoding")
        self.factory(epochBase = epochId * WdsDataSource.EpochStride)
          .createWriter(partitionId, taskId)
      }
    }
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = publish(messages)

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = abort(messages)

  private def fs = {
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    new Path(path).getFileSystem(conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    publish(messages)

  private def publish(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    val files = messages.collect { case m: WdsCommitMessage => m.files }
      .flatten
    // a shard id claimed by two partitions means the caller broke the
    // partition-by-shard-column contract — fail BEFORE any rename,
    // with every temp still unpublished
    val dup = files.groupBy(_.shardId).filter(_._2.length > 1).keys
    require(dup.isEmpty,
      s"wds-shards commit: shard id(s) ${dup.mkString(",")} written by " +
        "multiple partitions — repartition by the shard column before writing")
    // overwrite deletes the OLD shard set only now — after every new
    // temp exists and is fully written
    if (truncate) {
      val dir = new Path(path)
      if (f.exists(dir)) f.listStatus(dir).foreach { st =>
        if (Tar.parseShardFileName(st.getPath.getName).isDefined)
          f.delete(st.getPath, false)
      }
    }
    files.foreach { m =>
      val dest = new Path(new Path(path), Tar.shardFileNameOf(m.shardId))
      if (f.exists(dest)) f.delete(dest, false) // retried job idempotence
      require(f.rename(new Path(m.tmpPath), dest),
        s"wds-shards commit: rename ${m.tmpPath} -> $dest failed")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    messages.collect { case m: WdsCommitMessage => m.files }.flatten
      .foreach(m => f.delete(new Path(m.tmpPath), false))
  }
}

/** one finished temp shard: renamed to `shard_<shardId>.tar` at commit */
case class WdsShardFile(shardId: Long, tmpPath: String, nMembers: Long,
  payloadBytes: Long, tarBytes: Long)

case class WdsCommitMessage(files: Seq[WdsShardFile])
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

case class WdsWriterFactory(path: String, keyAt: Int, extAt: Int,
    payloadAt: Int, shardAt: Option[(Int, Boolean)], epochBase: Long,
    confEntries: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      // one open stream per shard this partition owns: exactly one in
      // partition-id mode; keyed by the shard column's value in
      // shardColumn mode (constant memory per open shard — bytes
      // stream to the temp file, never on-heap)
      private case class OpenShard(tmp: Path,
        out: org.apache.hadoop.fs.FSDataOutputStream, tw: Tar.StreamWriter)
      private val open =
        scala.collection.mutable.LinkedHashMap.empty[Long, OpenShard]
      private var fsys: org.apache.hadoop.fs.FileSystem = _

      private def shardOf(row: InternalRow): Long = {
        val slot = shardAt match {
          case None => partitionId.toLong
          case Some((at, isLong)) =>
            if (isLong) row.getLong(at) else row.getInt(at).toLong
        }
        if (epochBase > 0)
          require(slot >= 0 && slot < WdsDataSource.EpochStride,
            s"streaming shard slot $slot overflows the epoch stride")
        epochBase + slot
      }

      // lazily on the first row: empty partitions produce no file
      private def shardFor(id: Long): OpenShard =
        open.getOrElseUpdate(id, {
          if (fsys == null) {
            val conf = new Configuration(false)
            confEntries.foreach { case (k, v) => conf.set(k, v) }
            val base = new Path(path)
            fsys = base.getFileSystem(conf)
            // no .crc sidecars: object stores have none, and the shard
            // directory contract is "shard_<k>.tar files only"
            fsys.setWriteChecksum(false)
            if (!fsys.exists(base)) fsys.mkdirs(base)
          }
          // per-ATTEMPT unique temp: speculation/retry safe
          val tmp = new Path(new Path(path), Tar.shardFileNameOf(id) +
            ".tmp-" + java.util.UUID.randomUUID)
          val out = fsys.create(tmp, true)
          OpenShard(tmp, out, new Tar.StreamWriter(out))
        })

      override def write(row: InternalRow): Unit = {
        val sh = shardFor(shardOf(row))
        val key = row.getUTF8String(keyAt).toString
        val ext = row.getUTF8String(extAt).toString
        val name = if (ext.isEmpty) key else s"$key.$ext"
        sh.tw.write(name, row.getBinary(payloadAt))
      }

      override def commit()
          : org.apache.spark.sql.connector.write.WriterCommitMessage =
        WdsCommitMessage(open.toSeq.map { case (id, sh) =>
          sh.tw.finish()
          sh.out.close()
          WdsShardFile(id, sh.tmp.toString, sh.tw.members,
            sh.tw.payloadBytes, sh.tw.tarBytes)
        })

      override def abort(): Unit = if (open.nonEmpty) {
        open.values.foreach { sh =>
          try sh.out.close() catch { case _: Throwable => () }
          fsys.delete(sh.tmp, false)
        }
        open.clear()
      }

      override def close(): Unit = ()
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
      private var ordinal = -1L

      override def next(): Boolean =
        if (members.hasNext) { current = members.next(); ordinal += 1; true }
        else false

      override def get(): InternalRow = {
        val (name, size, body) = current
        val (key, ext) = WdsDataSource.splitName(name)
        val vals = required.fields.map { f =>
          f.name match {
            case "shard" => part.shard
            case "idx" => ordinal
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
