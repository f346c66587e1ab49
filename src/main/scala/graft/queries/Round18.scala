package graft.queries

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

  val all: Seq[QueryDef] = Seq(q74, t38)
}
