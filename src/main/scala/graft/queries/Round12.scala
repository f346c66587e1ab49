package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.KmeansPortable
import graft.queries.Catalog.QueryDef

/** Round-12 additions: the portable k-means cells twin — the one design
  * family (x09's SemDeDup k-means) that had no bit-exact oracled sibling.
  * x12 hash-certifies the clustering itself: quantized integer
  * coordinates, md5-derived init, three unrolled Lloyd rounds with
  * floor-average centroids, first-min tie-break, and the within-cell
  * drop rule — all re-derived in DuckDB CTE-by-CTE.
  */
object R12 {

  /** x12: deterministic portable k-means over the embedding corpus (with
    * planted exact-duplicate clones so the drop rule is load-bearing).
    * Every stage is exact: the only double arithmetic is the quantizer's
    * `floor(x*256 + 0.5)`, evaluated token-identically on both engines;
    * init order, assignment, centroid updates and distances are integer.
    * A wrong init draw, a drifted centroid, a wrong argmin tie-break or a
    * lost empty-cell carry-over is a hash mismatch. x09 (double k-means +
    * cosine threshold) stays the production SemDeDup path; this is its
    * oracled twin, the d12/d08 technique applied to clustering. */
  private val x12 = QueryDef("x12_kmeans_portable",
    (s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val clones = emb.filter(col("vec_id") < 30)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      KmeansPortable.cells(emb.unionByName(clones), k = 4, rounds = 3)
        .orderBy("vec_id")
    },
    Some("""WITH corpus AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 10000, embedding FROM embeddings
              WHERE vec_id < 30),
            q AS (
              SELECT vec_id,
                list_transform(embedding, x -> GREATEST(0, LEAST(255,
                  CAST(floor(CAST(x AS DOUBLE) * 256.0 + 0.5) AS BIGINT)
                    + 128))) AS qv
              FROM corpus),
            qe AS (
              SELECT vec_id, CAST(p.range + 1 AS INT) AS pos,
                     qv[CAST(p.range + 1 AS INT)] AS val
              FROM q, range(64) p),
            init AS (
              SELECT row_number() OVER (
                  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j,
                vec_id
              FROM q QUALIFY j <= 3),
            c0 AS (SELECT i.j, e.pos, e.val
                   FROM init i JOIN qe e USING (vec_id)),
            a1 AS (SELECT e.vec_id, c.j,
                     CAST(SUM((e.val - c.val) * (e.val - c.val)) AS BIGINT) AS d
                   FROM qe e JOIN c0 c USING (pos) GROUP BY 1, 2),
            g1 AS (SELECT vec_id, j FROM (
                     SELECT vec_id, j, row_number() OVER (
                       PARTITION BY vec_id ORDER BY d, j) AS rn FROM a1)
                   WHERE rn = 1),
            s1 AS (SELECT g.j, e.pos,
                     CAST(SUM(e.val) // COUNT(*) AS BIGINT) AS val
                   FROM g1 g JOIN qe e USING (vec_id) GROUP BY 1, 2),
            c1 AS (SELECT c0.j, c0.pos, COALESCE(s1.val, c0.val) AS val
                   FROM c0 LEFT JOIN s1 ON s1.j = c0.j AND s1.pos = c0.pos),
            a2 AS (SELECT e.vec_id, c.j,
                     CAST(SUM((e.val - c.val) * (e.val - c.val)) AS BIGINT) AS d
                   FROM qe e JOIN c1 c USING (pos) GROUP BY 1, 2),
            g2 AS (SELECT vec_id, j FROM (
                     SELECT vec_id, j, row_number() OVER (
                       PARTITION BY vec_id ORDER BY d, j) AS rn FROM a2)
                   WHERE rn = 1),
            s2 AS (SELECT g.j, e.pos,
                     CAST(SUM(e.val) // COUNT(*) AS BIGINT) AS val
                   FROM g2 g JOIN qe e USING (vec_id) GROUP BY 1, 2),
            c2 AS (SELECT c1.j, c1.pos, COALESCE(s2.val, c1.val) AS val
                   FROM c1 LEFT JOIN s2 ON s2.j = c1.j AND s2.pos = c1.pos),
            a3 AS (SELECT e.vec_id, c.j,
                     CAST(SUM((e.val - c.val) * (e.val - c.val)) AS BIGINT) AS d
                   FROM qe e JOIN c2 c USING (pos) GROUP BY 1, 2),
            g3 AS (SELECT vec_id, j FROM (
                     SELECT vec_id, j, row_number() OVER (
                       PARTITION BY vec_id ORDER BY d, j) AS rn FROM a3)
                   WHERE rn = 1),
            s3 AS (SELECT g.j, e.pos,
                     CAST(SUM(e.val) // COUNT(*) AS BIGINT) AS val
                   FROM g3 g JOIN qe e USING (vec_id) GROUP BY 1, 2),
            c3 AS (SELECT c2.j, c2.pos, COALESCE(s3.val, c2.val) AS val
                   FROM c2 LEFT JOIN s3 ON s3.j = c2.j AND s3.pos = c2.pos),
            af AS (SELECT e.vec_id, c.j,
                     CAST(SUM((e.val - c.val) * (e.val - c.val)) AS BIGINT) AS d
                   FROM qe e JOIN c3 c USING (pos) GROUP BY 1, 2),
            gf AS (SELECT vec_id, j, d FROM (
                     SELECT vec_id, j, d, row_number() OVER (
                       PARTITION BY vec_id ORDER BY d, j) AS rn FROM af)
                   WHERE rn = 1),
            kk AS (SELECT vec_id, array_to_string(qv, ',') AS qkey FROM q)
            SELECT g.vec_id, CAST(g.j AS INT) AS cell, g.d AS dist2,
              g.vec_id = MIN(g.vec_id) OVER (PARTITION BY g.j, k.qkey)
                AS kept
            FROM gf g JOIN kk k USING (vec_id)
            ORDER BY vec_id"""), bench = true)

  val all: Seq[QueryDef] = Seq(x12)
}
