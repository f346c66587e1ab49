package graft.queries

import graft.Tables
import graft.operators.RelationalOps
import graft.queries.Catalog.QueryDef
import org.apache.spark.sql.functions._

/** Round-20 additions: the full pandas-merge_asof direction/tolerance
  * surface on [[RelationalOps.asOfJoin]] (q10 certifies only the default
  * backward/no-tolerance arm). All three ride the operator's single
  * key-shuffle union+running-last plan; the oracles re-derive each match
  * with correlated subqueries over exact timestamp arithmetic, and NULLs
  * (no match / out-of-tolerance) are part of the compared row set.
  *
  * Right-side (user_id, ts) ties among signups are harmless here: the
  * carried value IS the matched ts, so any row of a tie carries the same
  * value — the operator's right-tie nondeterminism cannot reach the
  * output (same construction as q10's MAX form).
  */
object R20 {

  private def purchases(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")

  private def signups(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).filter(col("event_type") === "signup")
      .select("user_id", "ts")

  /** Forward as-of: earliest signup at-or-after each purchase. */
  private val e05 = QueryDef("e05_asof_forward",
    (s, d) => RelationalOps.asOfJoin(purchases(s, d), signups(s, d),
        "user_id", "ts", "ts", Seq("ts" -> "next_signup"),
        direction = "forward")
      .select("event_id", "next_signup")
      .orderBy("event_id"),
    Some("""SELECT p.event_id,
              (SELECT CAST(MIN(s.ts) AS TIMESTAMP) FROM events s
               WHERE s.user_id = p.user_id AND s.event_type = 'signup'
                 AND s.ts >= p.ts) AS next_signup
            FROM events p WHERE p.event_type = 'purchase'
            ORDER BY p.event_id"""))

  /** Backward as-of with a 2-day tolerance: the latest at-or-before match
    * is VOIDED (NULL) when farther than 172800s — for backward, pick-then-
    * check equals filter-then-max (the latest match is the max, so if it
    * misses the window every match does), which is what the oracle runs. */
  private val e06 = QueryDef("e06_asof_tolerance",
    (s, d) => RelationalOps.asOfJoin(purchases(s, d), signups(s, d),
        "user_id", "ts", "ts", Seq("ts" -> "last_signup"),
        toleranceSeconds = Some(172800L))
      .select("event_id", "last_signup")
      .orderBy("event_id"),
    Some("""SELECT p.event_id,
              (SELECT CAST(MAX(s.ts) AS TIMESTAMP) FROM events s
               WHERE s.user_id = p.user_id AND s.event_type = 'signup'
                 AND s.ts <= p.ts
                 AND s.ts >= p.ts - INTERVAL 172800 SECOND) AS last_signup
            FROM events p WHERE p.event_type = 'purchase'
            ORDER BY p.event_id"""))

  /** Nearest as-of: closest signup in either direction, exact-microsecond
    * distance, equal distance resolved backward (the smaller ts — pinned
    * on the oracle side by the `, s.ts` ordering). */
  private val e07 = QueryDef("e07_asof_nearest",
    (s, d) => RelationalOps.asOfJoin(purchases(s, d), signups(s, d),
        "user_id", "ts", "ts", Seq("ts" -> "near_signup"),
        direction = "nearest")
      .select("event_id", "near_signup")
      .orderBy("event_id"),
    Some("""SELECT p.event_id,
              (SELECT CAST(s.ts AS TIMESTAMP) FROM events s
               WHERE s.user_id = p.user_id AND s.event_type = 'signup'
               ORDER BY ABS(epoch_us(s.ts) - epoch_us(p.ts)), s.ts
               LIMIT 1) AS near_signup
            FROM events p WHERE p.event_type = 'purchase'
            ORDER BY p.event_id"""))

  val all: Seq[QueryDef] = Seq(e05, e06, e07)
}
