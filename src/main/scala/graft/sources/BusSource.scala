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
  * Execution shape: one input split per SEGMENT overlapping the batch's
  * offset range (r20 — previously one per topic-partition, which pinned
  * drain parallelism at the partition count; segments rotate every
  * `maxRecordsPerSegment` producer records, so task count grows with
  * the data). Offsets are engine-checkpointed; restart resumes from the
  * committed per-partition offsets mid-log, not at file granularity.
  * End-offset discovery is O(1) per partition: each segment's record
  * count is stamped in its filename at publish. At 100 TB the root
  * lives on shared storage and segments rotate per producer epoch;
  * nothing here holds state proportional to the log.
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

  /** Sorted (baseOffset, file) segments of one topic-partition. Segment
    * names are either `<base20>.seg` (legacy) or `<base20>_<count>.seg`
    * (count-stamped — the base is everything before the first '_'). */
  private[sources] def segments(root: String, topic: String, p: Int)
      : Seq[(Long, java.io.File)] = {
    val d = partDir(root, topic, p)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".seg"))
      .map(f => (f.getName.stripSuffix(".seg").split('_')(0).toLong, f))
      .sortBy(_._1).toSeq
  }

  /** Record count stamped in the segment filename
    * (`<base>_<count>.seg`), or None for a legacy name. */
  private[sources] def stampedCount(f: java.io.File): Option[Long] = {
    val parts = f.getName.stripSuffix(".seg").split('_')
    if (parts.length == 2) Some(parts(1).toLong) else None
  }

  /** Record count of a segment: O(1) from the count-stamped filename
    * (every segment [[appendSegment]] writes); legacy unstamped segments
    * fall back to walking the length prefixes. The stamp matters at
    * scale: `latestOffset` runs on the DRIVER once per trigger poll, and
    * walking a multi-million-record tail segment per poll was the
    * dominant component of s19's plan_sec at sf10 (r20 decomposition:
    * 2.0s of a 16s wall before the stamp). */
  private[sources] def recordCount(f: java.io.File): Long =
    stampedCount(f).getOrElse(walkCount(f))

  private def walkCount(f: java.io.File): Long = {
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
    // atomic publish: readers never observe a half-written segment; the
    // record count rides in the name so end-offset discovery is O(1)
    val fin = new java.io.File(d, f"$base%020d_$n%d.seg")
    require(tmp.renameTo(fin), s"Bus: could not publish segment $fin")
  }

  /** Distributed producer: routes each row to `pmod(partOf, nParts)`,
    * orders records within a partition by `order`, and appends segments
    * per bus partition, ROTATING every `maxRecordsPerSegment` records
    * (a broker's segment.bytes roll, here record-counted so offsets stay
    * arithmetic). The hash repartition puts every bus partition wholly
    * inside one task (two partitions may share a task; a partition never
    * splits), so offsets are deterministic given the data — the property
    * every replay-based test leans on; rotation preserves it (chunks cut
    * at fixed counts in sorted order). Rotation is what gives the READ
    * side its scale parallelism: [[BusMicroBatchStream.plan]] emits one
    * input split per segment, so a drain's task count grows with the
    * data instead of pinning at the partition count. */
  def produce(df: DataFrame, root: String, topic: String, nParts: Int,
              partOf: Column, payload: Column, order: Column,
              maxRecordsPerSegment: Long = 1L << 18): Unit = {
    requireValidTopic(topic)
    require(maxRecordsPerSegment > 0, "Bus: maxRecordsPerSegment must be > 0")
    df.select(pmod(partOf, lit(nParts)).cast("int").as("__p"),
        payload.cast("binary").as("__v"), order.as("__o"))
      .repartition(nParts, col("__p"))
      .sortWithinPartitions("__p", "__o")
      .foreachPartition { (it: Iterator[Row]) =>
        def flush(p: Int, buf: collection.mutable.ArrayBuffer[Array[Byte]]): Unit =
          if (buf.nonEmpty) appendSegment(root, topic, p, buf.iterator)
        it.foldLeft(Option.empty[(Int, collection.mutable.ArrayBuffer[Array[Byte]])]) {
          case (acc, row) =>
            val p = row.getInt(0)
            val v = row.getAs[Array[Byte]](1)
            acc match {
              case Some((cp, buf)) if cp == p =>
                buf += v
                if (buf.length >= maxRecordsPerSegment) {
                  flush(cp, buf); Some((cp, collection.mutable.ArrayBuffer.empty[Array[Byte]]))
                } else acc
              case Some((cp, buf)) =>
                flush(cp, buf)
                Some((p, collection.mutable.ArrayBuffer(v)))
              case None =>
                Some((p, collection.mutable.ArrayBuffer(v)))
            }
        }.foreach { case (cp, buf) => flush(cp, buf) }
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
  /** One input split PER SEGMENT overlapping each topic-partition's
    * (start, end) range — not one per topic-partition: a drain's task
    * parallelism then grows with the log (segments rotate every
    * `maxRecordsPerSegment` records) instead of pinning at the partition
    * count. Each segment's offset span is [its base, the next segment's
    * base) — no record counting at plan time — clipped to the batch
    * range; the reader's skip/stop logic is unchanged. Offsets within a
    * topic-partition stay globally dense and exactly-once: the splits
    * tile [startOff, endOff) without overlap by construction. (r20, the
    * s19 slope fix: sf10 drain was 4 readers over 10M records.) */
  def plan(root: String, start: Map[(String, Int), Long],
           end: Map[(String, Int), Long]): Array[InputPartition] =
    end.toSeq.sortBy { case ((t, p), _) => (t, p) }.flatMap {
      case ((t, p), endOff) =>
        val startOff = start.getOrElse((t, p), 0L)
        if (endOff <= startOff) Nil
        else {
          val segs = Bus.segments(root, t, p)
            .filter { case (base, _) => base < endOff }
          // segment i spans [base_i, base_{i+1}); the last one is capped
          // by the batch's endOff (== its base + count at plan time)
          val uppers = segs.drop(1).map(_._1) :+ endOff
          segs.zip(uppers).flatMap { case ((base, f), upper) =>
            val lo = math.max(startOff, base)
            val hi = math.min(endOff, upper)
            if (hi <= lo) None
            else Some(BusInputPartition(t, p,
              Array((base, f.getAbsolutePath)), lo, hi))
          }
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
