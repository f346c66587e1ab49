package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate top-k (heavy hitters) via the Misra-Gries summary
  * (Misra & Gries 1982; mergeability per Agarwal et al. 2013, "Mergeable
  * Summaries", PODS best-paper line of work):
  *
  *  - at most `k` counters are kept; an unseen item either claims a free
  *    counter or decrements ALL counters by 1 (dropping zeros);
  *  - merge sums two summaries' counters, then if more than `k` survive,
  *    subtracts the (k+1)-th largest count from all and keeps positives —
  *    the standard merge that preserves the error bound;
  *  - every reported count satisfies true - n/(k+1) <= reported <= true,
  *    and any item with frequency > n/(k+1) is guaranteed to survive.
  *
  * When the column's distinct cardinality is <= k, no decrement ever fires
  * and the counts are EXACT — the regime the DuckDB oracle certifies
  * (t13); the approximate regime is property-tested in ScalaTest.
  *
  * Scale shape: this is the whole point at 100 TB — a FIXED k-sized state
  * per (partition, group) regardless of input cardinality, map-side
  * partial aggregation, and a shuffle that carries one k-entry summary per
  * partition instead of the full distinct domain (contrast q27's exact
  * word count, whose shuffle width is the vocabulary). Output is sorted
  * (count desc, item asc) so downstream top-N slicing is deterministic. */
case class MisraGriesAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "misra_gries needs k > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string column, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null)
      MisraGriesAgg.updateOne(buffer, v.asInstanceOf[UTF8String].toString, k)
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (i, c) =>
      buffer(i) = buffer.getOrElse(i, 0L) + c
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest count, keep strictly positive
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer[String]()
      buffer.mapValuesInPlace((_, c) => c - sub)
      buffer.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy { case (i, c) => (-c, i) }
    new GenericArrayData(sorted.map { case (i, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(i), c))
    })
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] =
    MisraGriesAgg.serializeSketch(buffer)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MisraGriesAgg.deserializeSketch(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column API: Misra-Gries summary of a string column as a sorted
    * array<struct<item, cnt>> (count desc, item asc). */
  def approx_topk(item: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(item), k).toAggregateExpression())

  /** Core MG counter update — shared by the batch aggregate above and the
    * streaming sketch (streaming/StatefulOps.MgTopKProcessor), so batch
    * and stream provably run the same arithmetic. */
  def updateOne(buffer: mutable.HashMap[String, Long], item: String, k: Int): Unit =
    buffer.get(item) match {
      case Some(c) => buffer(item) = c + 1
      case None if buffer.size < k => buffer(item) = 1L
      case None =>
        // decrement-all; O(k) only on the no-free-counter path
        val dead = mutable.ArrayBuffer[String]()
        buffer.mapValuesInPlace((_, c) => c - 1)
        buffer.foreach { case (i, c) => if (c <= 0) dead += i }
        dead.foreach(buffer.remove)
    }

  /** Compact length-prefixed sketch codec — the aggregate's shuffle format
    * and the streaming processor's RocksDB ValueState format. */
  def serializeSketch(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buffer.toSeq.map { case (i, c) =>
      (i.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.size)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  def deserializeSketch(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      m(new String(b, StandardCharsets.UTF_8)) = bb.getLong
    }
    m
  }
}
