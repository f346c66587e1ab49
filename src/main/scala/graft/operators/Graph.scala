package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames. Companion to the
  * connected-components operators in `Dedup.scala` (duplicateClusters /
  * connectedComponentsStar); used for corpus curation signals such as
  * centrality weighting of near-duplicate clusters.
  */
object Graph {

  /** PageRank in EXACT integer arithmetic: ranks are maintained as scaled
    * BIGINTs (`scale` = 1.0) and every step uses integral division, so the
    * result is bit-identical across engines, run orders, and partition
    * counts — no float summation drift, which makes the iteration
    * oracle-checkable (d14). Damping 0.85 as the classic integer split:
    *
    *   r_{k+1}(v) = ((15 * scale) DIV 100) DIV n
    *              + (85 * SUM over incoming u of (r_k(u) DIV deg(u))) DIV 100
    *
    * Truncation loses mass (sum < scale, drifting down by < n per round) —
    * acceptable for a ranking signal; floats would lose determinism
    * instead, which is worse.
    *
    * Scale shape: each iteration is one equi join (ranks x out-degree — a
    * node-table join, broadcast when nodes fit) plus one shuffle hash agg
    * on dst with map-side partial sums; the classic distributed PR round.
    * localCheckpoint(true) cuts lineage per round (the Ivf.fitCentroids
    * rule — without it the plan stacks `iters` join+agg layers).
    *
    * @param edges undirected edge list (idA, idB); each edge contributes
    *              rank flow in both directions. Every node in `edges` has
    *              degree >= 1, so there are no dangling nodes.
    * @return (id, pr) — pr is the scaled rank as BIGINT.
    */
  def pageRankScaled(edges: DataFrame, idA: String = "id_a",
                     idB: String = "id_b", iters: Int = 3,
                     scale: Long = 1000000000000L): DataFrame = {
    val dir = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .union(edges.select(col(idB).as("src"), col(idA).as("dst")))
      .localCheckpoint(true) // evaluated every round: pin it once
    val deg = dir.groupBy("src").agg(count(lit(1)).as("deg"))
    // node count: one tiny agg — a scalar, same class as tfIdf's N
    val n = deg.count()
    require(n > 0, "pageRankScaled: empty edge set")
    val base = ((15L * scale) / 100) / n
    var ranks = deg.select(col("src").as("id"), lit(scale / n).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(deg, col("id") === col("src"))
        .select(col("id").as("u"), expr("pr DIV deg").as("c"))
      ranks = contrib.join(dir, col("u") === col("src"))
        .groupBy(col("dst"))
        .agg(expr(s"${base}L + (85 * sum(c)) DIV 100").as("pr"))
        .select(col("dst").as("id"), col("pr"))
        .localCheckpoint(true)
    }
    ranks
  }
}
