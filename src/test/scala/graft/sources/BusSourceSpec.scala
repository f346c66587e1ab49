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
}
