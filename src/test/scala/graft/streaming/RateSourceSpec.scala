package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connector parity: the s01 operator shape (EventStreams.hourlyCounts)
  * over the `rate` message-bus connector must produce exactly what the
  * SAME operator produces in batch over the ingested prefix. The
  * operators are source-agnostic by Structured Streaming's contract;
  * this pins it with a real second connector family (generator/bus, not
  * file/memory) end to end.
  *
  * Determinism under an uncontrolled connector: every events column is a
  * pure function of the rate source's monotonic value (see
  * EventStreams.eventColumnsOf), and the rate source emits values as a
  * contiguous prefix 0..n-1 — so whatever prefix happened to be ingested
  * before the stop is exactly recomputable from spark.range(n).
  */
class RateSourceSpec extends SparkSpec {

  test("hourlyCounts over the rate connector matches its batch twin on the ingested prefix") {
    val sink = "graft_rate_parity_sink"
    val agg = EventStreams.hourlyCounts(
      EventStreams.rateEvents(spark, rowsPerSecond = 20000, partitions = 4))
    val q = agg.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try {
      // drain until the committed snapshot covers a few thousand events
      // (several hourly windows at one synthetic event / 3s), bounded by a
      // deadline so a wedged source fails the test instead of hanging it
      val deadline = System.currentTimeMillis() + 60000
      var n = 0L
      while (n < 5000 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        q.processAllAvailable()
        n = spark.table(sink)
          .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
      }
    } finally q.stop() // freeze the sink table before reading it
    val streamed = spark.table(sink)
      .select("w", "event_type", "n", "sv").collect().toSet
    val total = streamed.toSeq.map(_.getLong(2)).sum
    assert(total >= 5000, s"rate source only delivered $total rows")

    // batch twin: same operator, same column derivations, over range(total)
    val batch = spark.range(total)
      .select(EventStreams.eventColumnsOf(col("id")): _*)
    val expected = EventStreams.hourlyCounts(batch)
      .select("w", "event_type", "n", "sv").collect().toSet
    assert(streamed === expected)
  }
}
