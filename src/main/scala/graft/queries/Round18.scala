package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextAnalysis
import graft.queries.Catalog.QueryDef

/** Round-18 additions (verdict task 6): the last two genuinely untwinned
  * `no_oracle` rows get oracled siblings.
  *
  *  - q74: an ERROR-BAND CERTIFICATE for q37's approx_count_distinct —
  *    the HLL sketch itself is engine-specific (DuckDB's differs, so the
  *    estimate can never hash-match), but the CLAIM that matters ("the
  *    estimate lands within the configured rsd band of the exact count")
  *    is a boolean the gate CAN certify: Spark emits the band verdict
  *    computed from its own estimate, the oracle emits the exact count
  *    and TRUE — an out-of-band estimate hash-mismatches the gate.
  *    HllBandSpec pins the actual relative errors at 3 scales.
  *  - t38: t08's MinHash ESTIMATOR re-derived with portable hash lanes
  *    (TextAnalysis.sourceSimilarityPortable) so the estimate is
  *    bit-certified against DuckDB, completing the pattern that covers
  *    every other approximate row (d08/d12, x12–x17).
  */
object R18 {

  /** Default HLL rsd in Spark is 0.05 (one standard error); the band is
    * 2x that — the estimate is a random variable, and a 1-sigma band
    * would trip on design variance (measured: sf0.001 l_orderkey sits at
    * 1.3 sigma = 0.064). Max observed error across 9 (scale, column)
    * cells is 0.064, well inside the band; HllBandSpec pins all of them
    * at 3 scales. */
  private val hllBand = 0.10

  private val q74 = QueryDef("q74_hll_band",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.agg(
        approx_count_distinct(col("l_orderkey")).as("a_ord"),
        countDistinct(col("l_orderkey")).as("e_ord"),
        approx_count_distinct(col("l_partkey")).as("a_part"),
        countDistinct(col("l_partkey")).as("e_part"),
        approx_count_distinct(col("l_suppkey")).as("a_supp"),
        countDistinct(col("l_suppkey")).as("e_supp"))
      def row(name: String, ac: String, ec: String) =
        struct(lit(name).as("col_name"), col(ec).as("exact_count"),
          (abs(col(ac) - col(ec)) <= col(ec) * hllBand).as("within_band"))
      a.select(explode(array(
          row("l_orderkey", "a_ord", "e_ord"),
          row("l_partkey", "a_part", "e_part"),
          row("l_suppkey", "a_supp", "e_supp"))).as("r"))
        .select("r.*")
        .orderBy("col_name")
    },
    Some("""SELECT col_name, exact_count, TRUE AS within_band FROM (
              SELECT 'l_orderkey' AS col_name,
                     COUNT(DISTINCT l_orderkey) AS exact_count FROM lineitem
              UNION ALL
              SELECT 'l_partkey', COUNT(DISTINCT l_partkey) FROM lineitem
              UNION ALL
              SELECT 'l_suppkey', COUNT(DISTINCT l_suppkey) FROM lineitem)
            ORDER BY col_name"""))

  private val t38 = QueryDef("t38_source_sim_minhash_portable",
    (s, d) => TextAnalysis.sourceSimilarityPortable(Tables.documents(s, d))
      .orderBy("src_a", "src_b"),
    Some("""WITH w AS (SELECT source, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '') AS w FROM documents),
            g AS (SELECT DISTINCT source, sh FROM (
                    SELECT source, UNNEST(list_transform(
                      range(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
                    FROM w)),
            l AS (SELECT source, i,
                    ('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || sh), 1, 15))::BIGINT AS h
                  FROM g CROSS JOIN (SELECT UNNEST(range(0, 32)) AS i)),
            s AS (SELECT source, i, MIN(h) AS mh FROM l GROUP BY source, i),
            p AS (SELECT a.source AS src_a, b.source AS src_b,
                    SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS m
                  FROM s a JOIN s b ON a.i = b.i AND a.source < b.source
                  GROUP BY 1, 2)
            SELECT src_a, src_b,
              FLOOR(m / 32.0 * 10000 + 0.5) / 10000 AS est_jaccard
            FROM p ORDER BY src_a, src_b"""))

  /** q75/q76 (round-18 second wave): COVERAGE.md listed IGNORE NULLS
    * navigation and window-frame EXCLUDE as dialect gaps the DIFFERENTIAL
    * FUZZER cannot reach (the same SQL text cannot parse on both
    * engines). The catalog gate has no such constraint — the Spark side
    * is DataFrame code and the oracle is DuckDB-dialect SQL — so both
    * semantics ARE bit-certifiable:
    *  - q75 drives Spark's native ignoreNulls lag/lead/first/last/
    *    nth_value against DuckDB's `IGNORE NULLS` spelling;
    *  - q76 COMPOSES the three EXCLUDE modes Spark lacks from plain
    *    frame aggregates — EXCLUDE CURRENT ROW = frame sum minus the
    *    current value, EXCLUDE GROUP = frame sum minus the peer-group
    *    sum (a RANGE 0-0 frame IS the peer group), EXCLUDE TIES = group
    *    exclusion plus the current value back — each with a non-null
    *    COUNT guard so an emptied exclusion window yields NULL exactly
    *    where SQL's empty-frame SUM does. Oracled against DuckDB's
    *    native EXCLUDE clause.
    * Deterministic NULLs are CASE-injected from event_type (the driver
    * events table has none), so the null-skipping paths are exercised on
    * every scale. Integer cents per the fuzzer's portability rules. */
  private val q75 = QueryDef("q75_ignore_nulls_nav",
    (s, d) => {
      val ev = Tables.events(s, d).withColumn("v",
        when(col("event_type").isin("click", "view"), lit(null))
          .otherwise(floor(col("value") * 100 + 0.5).cast("long")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("user_id"), col("event_id"), col("v"),
          lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_nn"),
          lead(col("v"), 2, null, ignoreNulls = true).over(w).as("next2_nn"),
          last(col("v"), ignoreNulls = true).over(cum).as("locf_v"),
          first(col("v"), ignoreNulls = true).over(cum).as("first_nn"),
          nth_value(col("v"), 2, ignoreNulls = true).over(cum).as("second_nn"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH e AS (SELECT event_id, user_id, ts,
              CASE WHEN event_type IN ('click', 'view') THEN NULL
                   ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS v
              FROM events)
            SELECT user_id, event_id, v,
              lag(v, 1 IGNORE NULLS) OVER w AS prev_nn,
              lead(v, 2 IGNORE NULLS) OVER w AS next2_nn,
              last_value(v IGNORE NULLS) OVER cum AS locf_v,
              first_value(v IGNORE NULLS) OVER cum AS first_nn,
              nth_value(v, 2 IGNORE NULLS) OVER cum AS second_nn
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
              cum AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ORDER BY user_id, event_id"""))

  private val q76 = QueryDef("q76_frame_exclude",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("v",
          when(col("event_type") === "error", lit(null))
            .otherwise(floor(col("value") * 100 + 0.5).cast("long")))
        .withColumn("dk", datediff(col("ts").cast("date"),
          to_date(lit("2020-01-01"))).cast("long"))
      val wRows = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 2)
      val wRange = Window.partitionBy(col("user_id"))
        .orderBy(col("dk")).rangeBetween(-3, 3)
      val wPeer = Window.partitionBy(col("user_id"))
        .orderBy(col("dk")).rangeBetween(0, 0)
      val selfCnt = when(col("v").isNotNull, 1L).otherwise(0L)
      // EXCLUDE CURRENT ROW over the ROWS frame
      val exCurCnt = count(col("v")).over(wRows) - selfCnt
      val exCur = when(exCurCnt === 0, lit(null))
        .otherwise(sum(col("v")).over(wRows) - coalesce(col("v"), lit(0L)))
      // EXCLUDE GROUP over the RANGE frame: peers = the RANGE 0-0 frame
      val exGrpCnt = count(col("v")).over(wRange) - count(col("v")).over(wPeer)
      val exGrp = when(exGrpCnt === 0, lit(null))
        .otherwise(sum(col("v")).over(wRange) -
          coalesce(sum(col("v")).over(wPeer), lit(0L)))
      // EXCLUDE TIES = EXCLUDE GROUP + the current row restored
      val exTiesCnt = exGrpCnt + selfCnt
      val exTies = when(exTiesCnt === 0, lit(null))
        .otherwise(sum(col("v")).over(wRange) -
          coalesce(sum(col("v")).over(wPeer), lit(0L)) +
          coalesce(col("v"), lit(0L)))
      ev.select(col("user_id"), col("event_id"), col("v"), col("dk"),
          exCur.as("sum_ex_current"), exGrp.as("sum_ex_group"),
          exTies.as("sum_ex_ties"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH e AS (SELECT event_id, user_id, ts,
              CASE WHEN event_type = 'error' THEN NULL
                   ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS v,
              datediff('day', DATE '2020-01-01', CAST(ts AS DATE)) AS dk
              FROM events)
            SELECT user_id, event_id, v, dk,
              CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                EXCLUDE CURRENT ROW) AS BIGINT) AS sum_ex_current,
              CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY dk
                RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING
                EXCLUDE GROUP) AS BIGINT) AS sum_ex_group,
              CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY dk
                RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING
                EXCLUDE TIES) AS BIGINT) AS sum_ex_ties
            FROM e ORDER BY user_id, event_id"""))

  val all: Seq[QueryDef] = Seq(q74, t38, q75, q76)
}
