package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Catalog.QueryDef

/** Scalar / aggregate function-suite coverage (C12 breadth): arrays,
  * conditionals, math, statistics, string aggregation, date generation. */
object FunctionSuites {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  private val q41 = QueryDef("q41_array_more",
    (s, d) => {
      val ed = transform(col("embedding"), x => x.cast("double"))
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(flatten(array(slice(ed, 1, 2), slice(ed, 3, 2)))).cast("int").as("flat4"),
        (round(element_at(reverse(ed), 1).cast("double"), 4) + lit(0.0))
          .as("last_e"), // + 0.0: zero-sign-normal, like joined below
        // + 0.0 normalizes negative zero (-0.0 stringifies differently
        // between engines)
        array_join(transform(slice(ed, 1, 3), x => (round(x, 2) + lit(0.0)).cast("string")), ",")
          .as("joined"),
        size(array_remove(sequence(lit(1), lit(10)), 5)).cast("int").as("seq9"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings)
            SELECT vec_id,
              CAST(len(list_concat(ed[1:2], ed[3:4])) AS INT) AS flat4,
              ROUND(list_reverse(ed)[1], 4) + 0.0 AS last_e,
              array_to_string(list_transform(ed[1:3], x -> CAST(ROUND(x, 2) + 0.0 AS VARCHAR)), ',') AS joined,
              CAST(len(list_filter(range(1, 11), x -> x <> 5)) AS INT) AS seq9
            FROM e ORDER BY vec_id"""))

  private val q42 = QueryDef("q42_conditional",
    (s, d) => Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_totalprice") > 250000, "high")
        .when(col("o_totalprice") > 100000, "mid")
        .otherwise("low").as("band"),
      nullif(col("o_orderstatus"), lit("O")).as("st_or_null"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("st_disp"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              CASE WHEN o_totalprice > 250000 THEN 'high'
                   WHEN o_totalprice > 100000 THEN 'mid'
                   ELSE 'low' END AS band,
              NULLIF(o_orderstatus, 'O') AS st_or_null,
              COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st_disp
            FROM orders ORDER BY o_orderkey"""))

  private val q43 = QueryDef("q43_math_suite",
    (s, d) => Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_discount") - 0.05).as("absd"),
      ceil(col("l_quantity")).cast("long").as("cq"),
      floor(col("l_quantity")).cast("long").as("fq"),
      round(exp(col("l_discount")), 6).as("expd"),
      round(log(col("l_quantity") + 1), 6).as("lnq"),
      pmod(col("l_orderkey"), lit(97)).as("m97"),
      signum(col("l_discount") - 0.05).as("sgn"))
      .orderBy("l_orderkey", "l_linenumber", "cq", "expd"),
    Some("""SELECT l_orderkey, l_linenumber,
              ABS(l_discount - 0.05) AS absd,
              CAST(CEIL(l_quantity) AS BIGINT) AS cq,
              CAST(FLOOR(l_quantity) AS BIGINT) AS fq,
              ROUND(EXP(l_discount), 6) AS expd,
              ROUND(LN(l_quantity + 1), 6) AS lnq,
              l_orderkey % 97 AS m97,
              CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sgn
            FROM lineitem ORDER BY l_orderkey, l_linenumber, cq, expd"""))

  private val q44 = QueryDef("q44_greatest_least",
    (s, d) => Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      greatest(col("l_discount"), col("l_tax"), lit(0.02)).as("g"),
      least(col("l_discount"), col("l_tax"), lit(0.02)).as("l"))
      .orderBy("l_orderkey", "l_linenumber", "g", "l"),
    Some("""SELECT l_orderkey, l_linenumber,
              GREATEST(l_discount, l_tax, 0.02) AS g,
              LEAST(l_discount, l_tax, 0.02) AS l
            FROM lineitem ORDER BY l_orderkey, l_linenumber, g, l"""))

  private val q45 = QueryDef("q45_stats",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 2).as("sd"),
        round(var_samp(col("l_quantity")), 2).as("vr"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("cr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cv"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
              ROUND(STDDEV_SAMP(l_quantity), 2) AS sd,
              ROUND(VAR_SAMP(l_quantity), 2) AS vr,
              ROUND(CORR(l_quantity, l_extendedprice), 4) AS cr,
              ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cv
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val q46 = QueryDef("q46_median",
    (s, d) => Tables.orders(s, d)
      .groupBy("o_orderpriority")
      // floor-idiom rounding: interpolated percentiles of 2-decimal data
      // land exactly on rounding midpoints (see t04 note)
      .agg((floor(expr("percentile(o_totalprice, 0.5)") * 100 + 0.5) / 100).as("med"),
        (floor(expr("percentile(o_totalprice, 0.9)") * 100 + 0.5) / 100).as("p90"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
              FLOOR(QUANTILE_CONT(o_totalprice, 0.5) * 100 + 0.5) / 100 AS med,
              FLOOR(QUANTILE_CONT(o_totalprice, 0.9) * 100 + 0.5) / 100 AS p90
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  private val q47 = QueryDef("q47_string_agg",
    (s, d) => Tables.nation(s, d)
      .groupBy("n_regionkey")
      .agg(concat_ws("|", sort_array(collect_list(col("n_name")))).as("names"))
      .orderBy("n_regionkey"),
    Some("""SELECT n_regionkey, STRING_AGG(n_name, '|' ORDER BY n_name) AS names
            FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  private val q48 = QueryDef("q48_minmax_by",
    (s, d) => Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest"),
        max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("priciest"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
              FIRST(o_orderkey ORDER BY o_totalprice, o_orderkey) AS cheapest,
              FIRST(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS priciest
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  private val q49 = QueryDef("q49_date_sequence",
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderkey") <= 100)
      .select(col("o_orderkey"), col("o_orderdate"),
        explode(sequence(lit(0), lit(2))).as("week_no"))
      .withColumn("due", expr("o_orderdate + make_interval(0, 0, week_no, 0, 0, 0, 0)"))
      .select(col("o_orderkey"), col("week_no"), col("due"))
      .orderBy("o_orderkey", "week_no"),
    Some("""SELECT o_orderkey, CAST(w.week_no AS INT) AS week_no,
              CAST(o_orderdate + w.week_no * INTERVAL 7 DAY AS TIMESTAMP) AS due
            FROM orders, (SELECT UNNEST(range(3)) AS week_no) w
            WHERE o_orderkey <= 100
            ORDER BY o_orderkey, week_no"""))

  private val q51 = QueryDef("q51_grouping_sets",
    (s, d) => Catalog.scopedSql(s,
      Seq("graft_q51_orders" -> Tables.orders(s, d)),
      """SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
                COALESCE(o_orderstatus, 'ALL') AS st,
                COUNT(*) AS n
         FROM graft_q51_orders
         GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                 (o_orderpriority), ())
         ORDER BY pri, st"""),
    Some("""SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
              COALESCE(o_orderstatus, 'ALL') AS st, COUNT(*) AS n
            FROM orders
            GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                    (o_orderpriority), ())
            ORDER BY pri, st"""))

  private val q52 = QueryDef("q52_rank_distribution",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      // percent_rank/cume_dist are exact integer-ratio doubles computed by
      // the same formula in both engines — compared raw, no rounding
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          dense_rank().over(w).as("dr"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem — tiebreak on the computed rank for a total order
        .orderBy("l_orderkey", "l_linenumber", "pr")
    },
    Some("""SELECT l_orderkey, l_linenumber,
              CAST(DENSE_RANK() OVER w AS INT) AS dr,
              PERCENT_RANK() OVER w AS pr,
              CUME_DIST() OVER w AS cd
            FROM lineitem WHERE l_orderkey <= 1000
            WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
            ORDER BY l_orderkey, l_linenumber, pr"""))

  private val q53 = QueryDef("q53_posexplode",
    (s, d) => Tables.embeddings(s, d)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").cast("int").as("idx"),
        round(col("col").cast("double"), 4).as("v"))
      .orderBy("vec_id", "idx"),
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed
                       FROM embeddings WHERE vec_id < 10),
            i AS (SELECT UNNEST(range(64)) AS idx)
            SELECT vec_id, CAST(idx AS INT) AS idx, ROUND(ed[idx+1], 4) AS v
            FROM e, i ORDER BY vec_id, idx"""))

  val all: Seq[QueryDef] = Seq(q41, q42, q43, q44, q45, q46, q47, q48, q49,
    q51, q52, q53)
}
