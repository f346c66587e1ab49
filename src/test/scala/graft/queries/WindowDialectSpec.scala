package graft.queries

import graft.SparkSpec

/** Round-18 second wave: hand-derived pins for the two catalog rows that
  * certify the fuzzer-unreachable window dialect gaps (q75 IGNORE NULLS
  * navigation, q76 frame EXCLUDE composed from plain aggregates). The
  * gate proves the semantics against DuckDB at data scale; this spec
  * proves them against VALUES DERIVED BY HAND on a fixture built to hit
  * every corner the composition's guards exist for:
  *  - a single-row partition (EXCLUDE CURRENT ROW and EXCLUDE GROUP must
  *    both empty to NULL; EXCLUDE TIES must restore the row itself);
  *  - a peer group that IS the whole frame (EXCLUDE GROUP empties while
  *    EXCLUDE TIES keeps exactly the current value);
  *  - a NULL current value inside a populated frame (the self-count term
  *    must not subtract for it) and a NULL-only exclusion window.
  * Runs the REAL catalog builders over a temp events.parquet shaped like
  * the driver table, so the pins cover the shipped query code, not a
  * re-derivation. */
class WindowDialectSpec extends SparkSpec {

  // (event_id, day, user_id, event_type, value):
  //  user 1 - 4 consecutive days; q75 NULL-injects click/view (rows 2,3)
  //  user 2 - single-row partition
  //  user 3 - two same-day rows (a whole peer group) + a q76-NULL 'error'
  //           row alone in its RANGE frame
  private lazy val dir: String = {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(day: Int) = new java.sql.Timestamp(base + day * 86400000L)
    val rows = Seq(
      (1L, 0, 1L, "purchase", 0.05), (2L, 1, 1L, "click", 1.00),
      (3L, 2, 1L, "view", 2.00), (4L, 3, 1L, "purchase", 0.20),
      (5L, 0, 2L, "signup", 0.10),
      (6L, 5, 3L, "signup", 0.10), (7L, 5, 3L, "purchase", 0.20),
      (8L, 9, 3L, "error", 9.99))
    val d = tmpDir("graft_windowdialect_")
    rows.map { case (id, day, u, et, v) => (id, ts(day), u, et, v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def collect(name: String, cols: Seq[String]): Map[Long, Seq[Option[Long]]] =
    Catalog.queries(name)(spark, dir)
      .collect().map { r =>
        r.getLong(r.fieldIndex("event_id")) -> cols.map { c =>
          val i = r.fieldIndex(c)
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        }
      }.toMap

  test("q75 ignore-nulls navigation matches the hand-derived values") {
    val got = collect("q75_ignore_nulls_nav",
      Seq("prev_nn", "next2_nn", "locf_v", "first_nn", "second_nn"))
    def row(p: Any, n2: Any, l: Any, f: Any, s: Any) =
      Seq(p, n2, l, f, s).map { case null => None
        case v: Int => Some(v.toLong) }
    val want = Map[Long, Seq[Option[Long]]](
      // user 1: cents [5, NULL, NULL, 20]
      1L -> row(null, null, 5, 5, null),
      2L -> row(5, null, 5, 5, null),
      3L -> row(5, null, 5, 5, null),
      4L -> row(5, null, 20, 5, 20),
      // user 2: single row
      5L -> row(null, null, 10, 10, null),
      // user 3: cents [10, 20, 999], none injected to NULL
      6L -> row(null, 999, 10, 10, null),
      7L -> row(10, null, 20, 10, 20),
      8L -> row(20, null, 999, 10, 20))
    assert(got === want)
  }

  test("q76 frame-exclude composition matches the hand-derived values") {
    val got = collect("q76_frame_exclude",
      Seq("sum_ex_current", "sum_ex_group", "sum_ex_ties"))
    def row(c: Any, g: Any, t: Any) =
      Seq(c, g, t).map { case null => None
        case v: Int => Some(v.toLong) }
    val want = Map[Long, Seq[Option[Long]]](
      // user 1: cents [5, 100, 200, 20] (q76 nulls only 'error'), all 4
      // days within RANGE 3 of each other, every peer group a singleton
      1L -> row(300, 320, 325),
      2L -> row(225, 225, 325),
      3L -> row(125, 125, 325),
      4L -> row(300, 305, 325),
      // user 2: single row - current/group empty to NULL, ties = itself
      5L -> row(null, null, 10),
      // user 3: days [5, 5, 9], cents [10, 20, NULL('error')]: the day-5
      // peer group IS its whole RANGE frame (group empties, ties keeps
      // self); the NULL row's exclusion windows are value-empty
      6L -> row(20, null, 10),
      7L -> row(10, null, 20),
      8L -> row(30, null, null))
    assert(got === want)
  }
}
