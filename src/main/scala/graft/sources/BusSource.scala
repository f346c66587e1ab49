package graft.sources

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Message-bus-shaped streaming connector (SURVEY S9's `kafka` row, the
  * wire-protocol-independent half): a DSv2 micro-batch source over a
  * directory of IMMUTABLE, length-prefixed record segments with
  * (topic, partition, offset) semantics — the exact coordinate system a
  * broker log exposes, without a broker in the loop.
  *
  * Log layout (one dir per topic-partition, one file per segment):
  * {{{
  *   <root>/<topic>/p<partition>/<baseOffset %020d>.seg
  * }}}
  * A segment is a flat sequence of `[int32 big-endian length][payload]`
  * records; the record at index i inside a segment holds bus offset
  * `baseOffset + i`. Appending to a partition = writing a NEW segment
  * whose baseOffset is the partition's current end offset — existing
  * files are never touched, which is what makes offset-addressed replay
  * (and therefore exactly-once recovery) trivial: a (start, end] offset
  * range always re-reads to the same records.
  *
  * Execution shape: one input partition per topic-partition per
  * micro-batch (the broker model — parallelism = partition count), each
  * reader streaming only the segments overlapping its offset range.
  * Offsets are engine-checkpointed; restart resumes from the committed
  * per-partition offsets mid-log, not at file granularity. At 100 TB
  * the root lives on shared storage and segments rotate per producer
  * epoch; nothing here holds state proportional to the log.
  */
object Bus {

  val schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", BinaryType, nullable = false)))

  /** Kafka's own topic-name constraint; doubles as offset-JSON safety. */
  private[sources] def requireValidTopic(topic: String): Unit =
    require(topic.nonEmpty && topic.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"Bus: invalid topic name '$topic' (allowed: [A-Za-z0-9._-]+)")

  private def partDir(root: String, topic: String, p: Int) =
    new java.io.File(s"$root/$topic/p$p")

  /** Sorted (baseOffset, file) segments of one topic-partition. */
  private[sources] def segments(root: String, topic: String, p: Int)
      : Seq[(Long, java.io.File)] = {
    val d = partDir(root, topic, p)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".seg"))
      .map(f => (f.getName.stripSuffix(".seg").toLong, f))
      .sortBy(_._1).toSeq
  }

  /** Record count of a segment: walks the length prefixes, skipping
    * payloads. A production log would keep a sidecar index; at the
    * driver this touches 4 bytes per record. */
  private[sources] def recordCount(f: java.io.File): Long = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(new FileInputStream(f)))
    try {
      var n = 0L
      var done = false
      while (!done) {
        try {
          val len = in.readInt()
          require(len >= 0 && in.skipBytes(len) == len,
            s"Bus: truncated segment $f at record $n")
          n += 1
        } catch { case _: EOFException => done = true }
      }
      n
    } finally in.close()
  }

  /** All discovered (topic, partition) -> end offset. */
  private[sources] def endOffsets(root: String): Map[(String, Int), Long] = {
    val rootF = new java.io.File(root)
    val topics = Option(rootF.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName)
    topics.flatMap { t =>
      val parts = Option(new java.io.File(rootF, t).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("p"))
        .map(_.getName.drop(1).toInt)
      parts.map { p =>
        val segs = segments(root, t, p)
        val end = segs.lastOption
          .map { case (base, f) => base + recordCount(f) }.getOrElse(0L)
        (t, p) -> end
      }
    }.toMap
  }

  /** Append `records` as ONE new segment of `topic`/`partition`, based at
    * the partition's current end offset. Single-writer per partition is
    * the caller's contract (as with a broker's partition leader). */
  def appendSegment(root: String, topic: String, partition: Int,
                    records: Iterator[Array[Byte]]): Unit = {
    requireValidTopic(topic)
    val d = partDir(root, topic, partition)
    d.mkdirs()
    val base = segments(root, topic, partition).lastOption
      .map { case (b, f) => b + recordCount(f) }.getOrElse(0L)
    val tmp = new java.io.File(d, f"$base%020d.seg.tmp")
    val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(tmp)))
    var n = 0L
    try records.foreach { r => out.writeInt(r.length); out.write(r); n += 1 }
    finally out.close()
    if (n == 0L) { tmp.delete(); return }
    // atomic publish: readers never observe a half-written segment
    val fin = new java.io.File(d, f"$base%020d.seg")
    require(tmp.renameTo(fin), s"Bus: could not publish segment $fin")
  }

  /** Distributed producer: routes each row to `pmod(partOf, nParts)`,
    * orders records within a partition by `order`, and appends one
    * segment per bus partition. The hash repartition puts every bus
    * partition wholly inside one task (two partitions may share a task;
    * a partition never splits), so offsets are deterministic given the
    * data — the property every replay-based test leans on. */
  def produce(df: DataFrame, root: String, topic: String, nParts: Int,
              partOf: Column, payload: Column, order: Column): Unit = {
    requireValidTopic(topic)
    df.select(pmod(partOf, lit(nParts)).cast("int").as("__p"),
        payload.cast("binary").as("__v"), order.as("__o"))
      .repartition(nParts, col("__p"))
      .sortWithinPartitions("__p", "__o")
      .foreachPartition { (it: Iterator[Row]) =>
        it.foldLeft(Option.empty[(Int, collection.mutable.ArrayBuffer[Array[Byte]])]) {
          case (acc, row) =>
            val p = row.getInt(0)
            val v = row.getAs[Array[Byte]](1)
            acc match {
              case Some((cp, buf)) if cp == p => buf += v; acc
              case Some((cp, buf)) =>
                appendSegment(root, topic, cp, buf.iterator)
                Some((p, collection.mutable.ArrayBuffer(v)))
              case None =>
                Some((p, collection.mutable.ArrayBuffer(v)))
            }
        }.foreach { case (cp, buf) =>
          appendSegment(root, topic, cp, buf.iterator)
        }
      }
  }
}

/** `spark.readStream.format("graft-bus").option("path", root)` — also
  * readable as a batch table (the whole log, offset 0 to end). */
class BusSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-bus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Bus.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val root = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-bus: 'path' option required"))
    new BusTable(root)
  }
}

class BusTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft_bus($root)"
  override def schema(): StructType = Bus.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new BusScan(root) }
}

class BusScan(root: String) extends Scan with Batch {
  override def readSchema(): StructType = Bus.schema
  override def description(): String = s"graft-bus $root"
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BusMicroBatchStream(root)
  // batch: the whole log as of planning time
  override def planInputPartitions(): Array[InputPartition] =
    BusMicroBatchStream.plan(root,
      Map.empty[(String, Int), Long], Bus.endOffsets(root))
  override def createReaderFactory(): PartitionReaderFactory =
    new BusReaderFactory
}

/** Engine-checkpointed offset: per topic-partition end offsets, JSON as
  * {"topic/partition": offset, ...} (topic names are [A-Za-z0-9._-]+, so
  * no escaping is ever needed and the round trip is exact). */
case class BusOffset(offsets: Map[(String, Int), Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy { case ((t, p), _) => (t, p) }
      .map { case ((t, p), o) => s""""$t/$p":$o""" }
      .mkString("{", ",", "}")
}

object BusOffset {
  def fromJson(s: String): BusOffset = {
    val body = s.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) BusOffset(Map.empty)
    else BusOffset(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2)
      val key = k.trim.stripPrefix("\"").stripSuffix("\"")
      val i = key.lastIndexOf('/')
      (key.substring(0, i), key.substring(i + 1).toInt) -> v.trim.toLong
    }.toMap)
  }
}

object BusMicroBatchStream {
  /** One input partition per topic-partition with new records; each
    * carries only the segments overlapping its (start, end) range. */
  def plan(root: String, start: Map[(String, Int), Long],
           end: Map[(String, Int), Long]): Array[InputPartition] =
    end.toSeq.sortBy { case ((t, p), _) => (t, p) }.flatMap {
      case ((t, p), endOff) =>
        val startOff = start.getOrElse((t, p), 0L)
        if (endOff <= startOff) None
        else {
          val segs = Bus.segments(root, t, p)
            .filter { case (base, _) => base < endOff }
          Some(BusInputPartition(t, p,
            segs.map { case (b, f) => (b, f.getAbsolutePath) }.toArray,
            startOff, endOff))
        }
    }.toArray
}

class BusMicroBatchStream(root: String) extends MicroBatchStream {
  override def initialOffset(): Offset = BusOffset(Map.empty)
  override def latestOffset(): Offset = BusOffset(Bus.endOffsets(root))
  override def deserializeOffset(json: String): Offset = BusOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    BusMicroBatchStream.plan(root,
      start.asInstanceOf[BusOffset].offsets, end.asInstanceOf[BusOffset].offsets)
  override def createReaderFactory(): PartitionReaderFactory =
    new BusReaderFactory
}

case class BusInputPartition(topic: String, partition: Int,
                             segs: Array[(Long, String)],
                             startOff: Long, endOff: Long)
  extends InputPartition

class BusReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BusPartitionReader(partition.asInstanceOf[BusInputPartition])
}

/** Streams records with offsets in [startOff, endOff): payload bytes of
  * pre-start records are skipped (not materialized), post-end iteration
  * stops at the boundary. */
class BusPartitionReader(part: BusInputPartition)
  extends PartitionReader[InternalRow] {
  private val topicUtf8 = UTF8String.fromString(part.topic)
  private var segIdx = 0
  private var in: DataInputStream = _
  private var nextOffset = 0L
  private var current: InternalRow = _

  private def openNext(): Boolean = {
    if (in != null) { in.close(); in = null }
    while (segIdx < part.segs.length) {
      val (base, path) = part.segs(segIdx)
      segIdx += 1
      if (base < part.endOff) {
        in = new DataInputStream(new java.io.BufferedInputStream(
          new FileInputStream(path)))
        nextOffset = base
        return true
      }
    }
    false
  }

  override def next(): Boolean = {
    while (true) {
      if (in == null && !openNext()) return false
      if (nextOffset >= part.endOff) { close(); return false }
      try {
        val len = in.readInt()
        if (nextOffset < part.startOff) {
          // before the committed start: skip payload, advance offset
          require(in.skipBytes(len) == len,
            s"Bus: truncated segment in ${part.topic}/p${part.partition}")
          nextOffset += 1
        } else {
          val buf = new Array[Byte](len)
          in.readFully(buf)
          current = new GenericInternalRow(
            Array[Any](topicUtf8, part.partition, nextOffset, buf))
          nextOffset += 1
          return true
        }
      } catch {
        case _: EOFException => in.close(); in = null
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (in != null) { in.close(); in = null }
}
