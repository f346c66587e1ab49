package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** resampleLerp against hand-computed values — incl. the negative-slope
  * truncation case that distinguishes `div` (toward zero) from floor
  * division, which the e03 oracle exercises only by data accident. */
class ResampleLerpSpec extends SparkSpec {

  test("hand-derived lerp: rising, falling and single-event keys") {
    import spark.implicits._
    val t0 = 1699999200L // epoch seconds, HOUR-ALIGNED (472222 * 3600) so
    // date_trunc(hour, min ts) == the first event and the grid hits the
    // event instants exactly
    def ts(h: Double) = new java.sql.Timestamp((t0 + (h * 3600).toLong) * 1000)
    val events = Seq(
      // u1 rises 1.00 -> 3.00 over 4h
      (1L, ts(0), 1.00, 10L), (1L, ts(4), 3.00, 11L),
      // u2 falls 3.00 -> 1.00 over 3h (negative slope -> truncation)
      (2L, ts(0), 3.00, 20L), (2L, ts(3), 1.00, 21L),
      // u3 has a single event -> grid of one point, value itself
      (3L, ts(1), 2.50, 30L))
      .toDF("user_id", "ts", "value", "event_id")
    val out = RelationalOps.resampleLerp(events, "user_id", "ts", "value",
        stepHours = 1, tieBreak = "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.get(2)))
      .toSet
    def at(h: Double) = ts(h).getTime
    // grid starts at date_trunc(hour, min ts); t0 may not be hour-aligned,
    // so recompute the truncated start per key from the data
    val tr1 = events.filter(col("user_id") === 1)
      .agg(date_trunc("hour", min("ts"))).head().getTimestamp(0).getTime
    assert(tr1 <= at(0))
    // u1: value climbs 50 centi-units per hour from its first event; grid
    // points before the event are NULL (if the truncation shifted the grid)
    val u1 = out.filter(_._1 == 1L).toSeq.sortBy(_._2)
    val u1AtEvents = u1.filter(_._2 >= at(0))
    assert(u1AtEvents.map(_._3) == (0 to 4).map(h => 100L + 50L * h))
    // u2: -200 centi over 3h: at 1h -> 300 + (-200*3600e6) div 10800e6
    //   = 300 - 66 (TRUNCATED toward zero, not floored to -67) = 234
    val u2 = out.filter(t => t._1 == 2L && t._2 >= at(0)).toSeq.sortBy(_._2)
    assert(u2.map(_._3) == Seq(300L, 234L, 167L, 100L))
    // u3: single event -> lerp degenerates to the value at/after it
    val u3 = out.filter(_._1 == 3L)
    assert(u3.forall(t => t._3 == null || t._3 == 250L))
    assert(u3.exists(_._3 == 250L))
  }
}
