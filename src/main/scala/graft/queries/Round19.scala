package graft.queries

import graft.Tables
import graft.queries.Catalog.QueryDef

/** Round-19 additions (verdict task 6 tail): Spark 4.1 cannot PARSE
  * `UNION` (distinct) recursion in recursive CTEs — it raises
  * UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE, so the differential fuzzer can
  * never reach dedup-recursion semantics (same class as the q75/q76
  * window dialect gaps). q77 certifies the SEMANTICS through the catalog
  * gate instead: the oracle runs DuckDB's NATIVE dedup recursion (the
  * frontier keeps only never-seen rows and the recursion terminates at
  * closure), while the Spark side computes the same fixpoint with the
  * only supported form — a depth-bounded UNION ALL walk plus a final
  * DISTINCT. A hash match proves the bounded-ALL+DISTINCT rewrite is
  * exactly dedup recursion on this class.
  */
object R19 {

  /** Two affine orbits mod 89 seeded from the data (two-row anchor, so
    * DuckDB's frontier dedup genuinely operates across rows, and the
    * chains can merge). Equality argument: each chain has at most 89
    * distinct values, so by pigeonhole its first repeat occurs within 89
    * steps; the walk's 90 levels therefore cover every chain's full
    * tail+cycle, and DISTINCT over the walk equals the UNION recursion's
    * accumulated new-value set. 91 levels stays under Spark's
    * cteRecursionLevelLimit default (100) — no conf override needed. */
  private val q77 = QueryDef("q77_rcte_union_twin",
    (s, d) => Catalog.scopedSql(s,
      Seq("graft_q77_orders" -> Tables.orders(s, d)),
      """WITH RECURSIVE rr(acc, n) AS (
           SELECT CAST(x % 89 AS BIGINT) AS acc, CAST(0 AS BIGINT) AS n
           FROM (SELECT COALESCE(MIN(o_orderkey), 0) AS x
                   FROM graft_q77_orders
                 UNION ALL
                 SELECT COALESCE(MAX(o_custkey), 0) FROM graft_q77_orders)
           UNION ALL
           SELECT (acc * 31 + 7) % 89, n + 1 FROM rr WHERE n < 89)
         SELECT DISTINCT acc FROM rr ORDER BY acc"""),
    Some("""WITH RECURSIVE rr(acc) AS (
              SELECT CAST(x % 89 AS BIGINT)
              FROM (SELECT COALESCE(MIN(o_orderkey), 0) AS x FROM orders
                    UNION ALL
                    SELECT COALESCE(MAX(o_custkey), 0) FROM orders)
              UNION
              SELECT (acc * 31 + 7) % 89 FROM rr)
            SELECT acc FROM rr ORDER BY acc"""))

  val all: Seq[QueryDef] = Seq(q77)
}
