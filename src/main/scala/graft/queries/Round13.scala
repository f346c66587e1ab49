package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.KmeansPortable
import graft.queries.Catalog.QueryDef

/** Round-13 additions: the portable IVF search twin — x12's machinery
  * applied to the ANN path, certifying x03's last uncertified stage
  * (cell-pruned kNN) end-to-end in DuckDB: coarse-quantizer cells,
  * nprobe cell ranking, and exact in-cell distances.
  */
object R13 {

  /** x13: deterministic portable IVF kNN over the embedding corpus.
    * [[KmeansPortable.fit]] (k=4 cells, 3 Lloyd rounds, md5 init) is the
    * coarse quantizer; each query (vec_id < 20) probes its nprobe=2
    * nearest cells by exact integer centroid distance with ties to the
    * lowest cell index; candidates in the probed cells are reranked by
    * exact integer L2² with a (dist2, nn_id) tie-break; top-5 per query.
    * The oracle re-derives every stage: the x12 centroid CTE chain
    * (c0..c3), the final corpus assignment (af/gf), the probe ranking
    * (row_number over the SAME af — queries are corpus members, so their
    * centroid distances are already in af), candidate generation, and the
    * exact rerank. A wrong centroid, a wrong probe ranking, a candidate
    * leak across unprobed cells, or a wrong rerank tie-break is a hash
    * mismatch. x03 (double k-means + cosine) stays the production IVF
    * path; this is its oracled twin. */
  private val x13 = QueryDef("x13_ivf_portable",
    (s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      KmeansPortable.ivfSearch(emb.filter(col("vec_id") < 20), emb,
          topK = 5, k = 4, rounds = 3, nprobe = 2)
        .orderBy("vec_id", "rnk")
    },
    Some("""WITH q AS (
              SELECT vec_id,
                list_transform(embedding, x -> GREATEST(0, LEAST(255,
                  CAST(floor(CAST(x AS DOUBLE) * 256.0 + 0.5) AS BIGINT)
                    + 128))) AS qv
              FROM embeddings),
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
            gf AS (SELECT vec_id, j FROM (
                     SELECT vec_id, j, row_number() OVER (
                       PARTITION BY vec_id ORDER BY d, j) AS rn FROM af)
                   WHERE rn = 1),
            probe AS (SELECT vec_id AS qid, j FROM (
                        SELECT vec_id, j, row_number() OVER (
                          PARTITION BY vec_id ORDER BY d, j) AS rn
                        FROM af WHERE vec_id < 20)
                      WHERE rn <= 2),
            cand AS (SELECT p.qid, g.vec_id AS nn
                     FROM probe p JOIN gf g USING (j)
                     WHERE g.vec_id <> p.qid),
            dist AS (SELECT c.qid, c.nn,
                       CAST(SUM((a.val - b.val) * (a.val - b.val)) AS BIGINT)
                         AS d
                     FROM cand c
                     JOIN qe a ON a.vec_id = c.qid
                     JOIN qe b ON b.vec_id = c.nn AND b.pos = a.pos
                     GROUP BY 1, 2)
            SELECT qid AS vec_id, nn AS nn_id, d AS dist2,
              CAST(rn AS INT) AS rnk
            FROM (SELECT qid, nn, d, row_number() OVER (
                    PARTITION BY qid ORDER BY d, nn) AS rn FROM dist)
            WHERE rn <= 5
            ORDER BY vec_id, rnk"""), bench = true)

  val all: Seq[QueryDef] = Seq(x13)
}
