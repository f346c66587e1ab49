package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The kafka-shape connector's contract: offset-addressed replay over
  * immutable segments — batch/stream parity, exactly-once restart that
  * resumes MID-LOG from the committed per-partition offsets (not at file
  * granularity), and discovery of partitions that appear after the
  * checkpoint was taken. */
class BusSourceSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_bus_").toString

  private def csvPayload = concat(
    col("event_id"), lit(","), col("user_id"), lit(","), col("event_type"))

  test("offset json round-trips exactly") {
    val o = BusOffset(Map(("events", 0) -> 17L, ("events", 1) -> 0L,
      ("audit.log-2", 11) -> 123456789L))
    assert(BusOffset.fromJson(o.json()) == o)
    assert(BusOffset.fromJson(BusOffset(Map.empty).json()) == BusOffset(Map.empty))
  }

  test("produce + batch read: every record, exact offsets per partition") {
    val root = tmp()
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type")
    Bus.produce(ev, root, "events", nParts = 3,
      partOf = col("event_id"), payload = csvPayload, order = col("event_id"))
    val back = spark.read.format("graft-bus").option("path", root).load()
    // offsets are dense 0..n-1 within each partition
    val perPart = back.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(perPart.length == 3)
    perPart.foreach { case (_, n, lo, hi) =>
      assert(lo == 0L && hi == n - 1, s"offsets not dense: $lo..$hi for $n") }
    // payload fidelity: parse back and compare to the source rows
    val parsed = back.select(split(col("value").cast("string"), ",").as("f"))
      .select(element_at(col("f"), 1).cast("long").as("event_id"),
        element_at(col("f"), 2).cast("long").as("user_id"),
        element_at(col("f"), 3).as("event_type"))
    assert(parsed.exceptAll(ev).isEmpty && ev.exceptAll(parsed).isEmpty,
      "bus round-trip lost or duplicated records")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("streaming restart resumes mid-log exactly-once; late partitions discovered") {
    val root = tmp()
    val base = tmp()
    val (ck, sink) = (s"$base/ck", s"$base/sink")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type").localCheckpoint(true)
    val half = ev.agg(expr("percentile(event_id, 0.5)")).head().getDouble(0)
    def run(): Unit = {
      val q = spark.readStream.format("graft-bus").option("path", root).load()
        .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ck)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    // half A into partitions {0,1}, then a controlled kill
    Bus.produce(ev.filter(col("event_id") <= half), root, "t", 2,
      col("event_id"), csvPayload, col("event_id"))
    run()
    val afterA = spark.read.parquet(sink).count()
    // half B appends NEW segments to the SAME partitions (so the restart
    // must resume from a mid-log offset) AND opens partition 2 (so the
    // restart must also pick up a partition absent from its checkpoint)
    Bus.produce(ev.filter(col("event_id") > half), root, "t", 3,
      col("event_id"), csvPayload, col("event_id"))
    run()
    val all = spark.read.parquet(sink)
    assert(afterA > 0 && all.count() > afterA)
    // exactly-once: record multiset equals the source, no dupes, no gaps
    val parsed = all.select(split(col("v"), ",").as("f"))
      .select(element_at(col("f"), 1).cast("long").as("event_id"),
        element_at(col("f"), 2).cast("long").as("user_id"),
        element_at(col("f"), 3).as("event_type"))
    assert(parsed.exceptAll(ev).isEmpty && ev.exceptAll(parsed).isEmpty,
      "restart lost or duplicated records")
    // and partition 2 only holds post-restart records
    assert(spark.read.parquet(sink).filter(col("partition") === 2).count() > 0)
    Seq(root, base).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
  }

  test("segment rotation: per-segment splits tile the offset range; restart mid-segment") {
    // r20 (s19 slope fix): the producer rotates segments every
    // maxRecordsPerSegment records and plan() emits one input split per
    // segment, so drain parallelism grows with the log. The contract to
    // pin: offsets stay dense per partition, the splits TILE each batch
    // range without overlap, and a restart whose committed offset lands
    // MID-SEGMENT (possible since a batch boundary need not be a segment
    // boundary after a partial-wave kill) still replays exactly-once.
    val root = tmp()
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type").localCheckpoint(true)
    val n = ev.count()
    // rotate every 40 records -> many segments per partition
    Bus.produce(ev, root, "r", 2, col("event_id"), csvPayload,
      col("event_id"), maxRecordsPerSegment = 40L)
    val segs0 = Bus.segments(root, "r", 0)
    val segs1 = Bus.segments(root, "r", 1)
    assert(segs0.size > 2 && segs1.size > 2,
      s"expected rotation to cut multiple segments, got ${segs0.size}/${segs1.size}")
    // every segment is count-stamped and the stamps chain into dense bases
    Seq(segs0, segs1).foreach { segs =>
      segs.foldLeft(0L) { case (expectBase, (bse, f)) =>
        assert(bse == expectBase, s"segment base $bse != expected $expectBase")
        val c = Bus.stampedCount(f)
        assert(c.exists(_ > 0), s"segment ${f.getName} not count-stamped")
        bse + c.get
      }
    }
    // batch read: full fidelity + dense offsets across rotated segments
    val back = spark.read.format("graft-bus").option("path", root).load()
    assert(back.count() == n)
    back.groupBy("partition")
      .agg(count(lit(1)).as("cnt"), min("offset").as("lo"), max("offset").as("hi"))
      .collect().foreach { r =>
        assert(r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1,
          s"offsets not dense across rotated segments: $r")
      }
    // split planning: one split per segment, tiling [start, end) exactly —
    // including a start offset that lands MID-segment
    val end = Bus.endOffsets(root)
    val midStart = Map(("r", 0) -> 55L) // inside segment 1 (40..79) at p0
    val splits = BusMicroBatchStream.plan(root, midStart, end)
      .map(_.asInstanceOf[BusInputPartition])
    val p0 = splits.filter(s => s.topic == "r" && s.partition == 0)
      .sortBy(_.startOff)
    assert(p0.head.startOff == 55L)
    assert(p0.forall(_.segs.length == 1), "a split must carry ONE segment")
    p0.sliding(2).foreach {
      case Array(a, b) => assert(a.endOff == b.startOff,
        s"splits must tile: ${a.endOff} != ${b.startOff}")
      case _ =>
    }
    assert(p0.last.endOff == end(("r", 0)))
    assert(p0.size == segs0.count(_._1 + 39 >= 55) ||
      p0.size == segs0.size - 1, s"expected per-segment splits, got ${p0.size}")
    // and the mid-segment split reads exactly its clipped records
    val mid = spark.read.format("graft-bus").option("path", root).load()
      .filter(col("partition") === 0 && col("offset") >= 55)
    assert(mid.count() == end(("r", 0)) - 55)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
