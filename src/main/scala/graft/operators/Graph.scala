package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.Pins.PinSyntax

/** Distributed graph analytics over edge DataFrames. Companion to the
  * connected-components operators in `Dedup.scala` (duplicateClusters /
  * connectedComponentsStar); used for corpus curation signals such as
  * centrality weighting of near-duplicate clusters.
  */
object Graph {

  /** Pin a STATIC table (the edge set every round re-reads) via the SQL
    * COLUMNAR cache instead of `localCheckpoint(true)`.
    *
    * Round-15 scale finding (sf10, 8 GiB heap): localCheckpoint stores
    * raw deserialized UnsafeRow blocks at MEMORY_AND_DISK; once the edge
    * set outgrows storage memory the blocks land on disk, and EVERY
    * subsequent read re-promotes 200 MiB+ blocks into the heap through
    * row-by-row Java deserialization (`BlockManager.
    * maybeCacheDiskValuesInMemory` -> `putIteratorAsValues`) — 32
    * concurrent tasks doing that OOM'd d28_kcore at sf10 (120 M mirrored
    * edges). The SQL cache stores compressed COLUMNAR batches (delta/RLE
    * on the long keys — several times smaller), reads them as byte
    * buffers without per-row promotion, and keeps lineage so an evicted
    * batch falls back to recompute-from-parquet instead of a lost block.
    * The cached relation also preserves the child's outputPartitioning,
    * so the repartition(src) layout the per-round joins rely on
    * survives. Lineage truncation — the reason the ITERATIVE node state
    * uses localCheckpoint — is not load-bearing here: the edge pin's
    * lineage is a constant-depth scan->mirror->repartition->distinct.
    * The eager count() materializes the cache once, outside the first
    * round's join. Callers unpersist on exit. */
  private def pinStatic(df: DataFrame): DataFrame = {
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pinned.count()
    pinned
  }

  /** Mirror an edge list in ONE pass: each (src, dst) row explodes into
    * itself plus its reverse. Replaces the union-of-two-projections
    * mirror, which evaluates the upstream plan ONCE PER BRANCH — for a
    * file scan that is two decompress passes over the same parquet (the
    * r21 d28 profile: the edge-build stage was 1.1s of double
    * single-row-group decode), and for a derived edge set it re-runs the
    * whole upstream pipeline. Row set, and therefore everything
    * downstream, is identical. */
  private[graft] def mirror(e: DataFrame, a: String = "src",
                                b: String = "dst",
                                carry: Seq[String] = Nil): DataFrame = {
    val fwd = struct((Seq(col(a), col(b)) ++ carry.map(col)): _*)
    val rev = struct((Seq(col(b).as(a), col(a).as(b)) ++ carry.map(col)): _*)
    e.select(explode(array(fwd, rev)).as("__e"))
      .select((Seq(a, b) ++ carry).map(f => col(s"__e.$f").as(f)): _*)
  }

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
    val dir = pinStatic(mirror(
      edges.select(col(idA).as("src"), col(idB).as("dst"))))
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
        .pinned
    }
    dir.unpersist(false) // ranks is checkpoint-materialized; pin no longer needed
    ranks
  }

  /** Exact per-vertex triangle counts with DEGREE-ORDERED orientation
    * (Cohen 2009 / Schank–Wagner): each undirected edge is directed from
    * its (degree, id)-smaller endpoint, wedges are built only from
    * out-neighbors, and a wedge closes against the undirected edge set.
    * Every triangle is generated exactly once — at its minimum-(degree,id)
    * vertex — and the orientation caps wedge fan-out at O(sqrt(m)) per
    * vertex on any graph, which is what keeps the self-join from exploding
    * on hubs at 100 TB (an unoriented wedge join is quadratic in the max
    * degree; the oriented one is quadratic only in the SMALLER degree).
    * Shapes: two node-table joins (degree), one wedge self-join keyed on
    * the pivot, one closing equi join — all equi, no cartesian.
    *
    * @param edges undirected (idA, idB), idA < idB, distinct
    * @return (id, n_tri) — vertices in no triangle yield no row
    */
  def triangleCounts(edges: DataFrame, idA: String = "id_a",
                     idB: String = "id_b"): DataFrame = {
    val e = edges.select(col(idA).as("a"), col(idB).as("b"))
    val sym = mirror(e, "a", "b")
    val deg = sym.groupBy("a").agg(count(lit(1)).as("d"))
    val ori = sym
      .join(deg, Seq("a"))
      .join(deg.select(col("a").as("b"), col("d").as("db")), Seq("b"))
      .filter(col("d") < col("db") || (col("d") === col("db") && col("a") < col("b")))
      .select(col("a").as("u"), col("b").as("v"))
    val wedges = ori.as("e1").join(ori.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    // the closing edge is undirected; (y, z) is already id-ordered
    val tri = wedges.join(e.select(col("a").as("y"), col("b").as("z")),
      Seq("y", "z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** Multi-source breadth-first search: label every vertex reachable from
    * `seeds` within `maxHops` edges with its exact hop distance (= the
    * minimum over seeds). The recursive-query workhorse — what engines
    * with WITH RECURSIVE express as a bounded fixpoint, built here as a
    * driver-coordinated frontier loop (the standard distributed BFS):
    * each round is ONE equi join (frontier × edges, keyed on src) plus a
    * distinct and an anti join against the settled vertices — for the
    * undirected case only the previous TWO levels (see the loop comment:
    * BFS level locality makes that exact), so per-round work is
    * proportional to the frontier's out-edges — never the whole graph,
    * and never the whole settled set.
    * The frontier is re-derived as exactly the newly settled vertices, so
    * a vertex's neighbors are expanded once, ever (label-correcting, not
    * label-propagating: total work O(E) across all rounds, not O(E·hops)).
    *
    * localCheckpoint(true) pins each round's result — without it the plan
    * stacks `maxHops` join layers (the pageRankScaled rationale). The
    * empty-frontier early exit makes the hop bound a cap, not a cost: on
    * a graph of diameter d only d rounds run.
    *
    * @param edges    edge list (src, dst); treated as UNDIRECTED when
    *                 `directed` is false (each edge expands both ways)
    * @param seeds    one column `id` — the 0-hop vertex set
    * @param maxHops  inclusive hop cap (bounds the fixpoint)
    * @return (id, hops: int) — vertices unreachable within the cap are
    *         absent, seeds report 0
    */
  def shortestHops(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                   directed: Boolean = false): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"))
    // hash-partition the edge table on src ONCE: every round's
    // frontier-expansion join then reuses this partitioning (only the
    // small frontier moves), instead of re-shuffling the edges per round
    val dir = pinStatic((if (directed) fwd else mirror(fwd))
      // repartition FIRST: hash-partitioning on src co-locates equal
      // (src,dst) pairs too, so the distinct's aggregate runs partition-
      // local on top of it — one exchange, and the result stays
      // partitioned on src for every round's join
      .repartition(col("src"))
      .distinct())
    // Every per-round level below is pinned with HONEST block-truth leaf
    // stats (Pins.pin via .pinned) — each round's exchanges plan from
    // real stored bytes, 0 poisoned-pin rejections at sf0.1/sf10.
    // Sizing-churn adjudication (r20, D24_SIZING_AB_sf10_r20.json): the
    // remaining per-round Up(512) decisions are driven by the honest
    // leaf-sum that includes the pinned 2.9 GB edge table, are stable
    // across runs/sessions, and are wall-NEUTRAL at sf10 (reversed-order
    // two-session A/B: on 31.28/30.24s vs off 31.22/28.76s medians) —
    // AQE coalescing trims the actual counts either way. The wall slope
    // itself is output-bound: 10x output rows per decade, per-output-row
    // throughput IMPROVES 1.51x at decade 2 (266k -> 403k rows/s).
    // lazy checkpoint + count (the duplicateClusters round shape): the
    // frontier-emptiness check doubles as the materializing action, so
    // each round runs ONE distributed job instead of an eager-pin job
    // plus an isEmpty job
    val dist0 = seeds.select(col("id")).distinct()
      .withColumn("hops", lit(0)).localCheckpoint(false)
    var frontierRows = dist0.count()
    var dist = graft.plans.Pins.restamp(dist0)
    var frontier = dist
    // two-level settled window for the UNDIRECTED anti join: a neighbor
    // of a level-(h-1) vertex has distance in {h-2, h-1, h} (an edge
    // changes distance by at most 1 both ways), so candidates can only
    // collide with the previous TWO levels — anti-joining against them
    // alone is exact, and per-round anti-join input is O(|frontier
    // levels|) instead of O(|all settled|): total anti-join work across
    // the walk is O(V), not O(V x hops), the difference that matters on
    // a deep 100 TB walk. A DIRECTED graph has no such locality (an edge
    // may land on any earlier level), so it keeps the full settled set.
    // Measured on d24 (3 hops, tiny seed level — the shape where the
    // window saves least): isolated 5-run medians tie at both scales
    // (sf0.1 2.44s vs 2.47s; sf1 5.69s vs 5.68s), so the asymptotic win
    // is free; exactness is pinned by GraphSpec's cyclic-graph reference
    // BFS and d24's oracle at sf0.01/sf0.1.
    var prev2 = frontier.limit(0)
    var h = 0
    while (h < maxHops && frontierRows > 0) {
      h += 1
      val settled =
        if (directed) dist.select("id")
        else prev2.select("id").unionByName(frontier.select("id"))
      val lazyNext = frontier.join(dir, frontier("id") === dir("src"))
        .select(col("dst").as("id")).distinct()
        .join(settled, Seq("id"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint(false)
      frontierRows = lazyNext.count()
      val next = graft.plans.Pins.restamp(lazyNext)
      // dist stays a lazy union of checkpointed levels — every member is
      // already pinned, so re-checkpointing the union would only copy it
      dist = dist.unionByName(next)
      prev2 = frontier
      frontier = next
    }
    dir.unpersist(false) // every level in dist is checkpoint-materialized
    dist
  }

  /** Hop-bounded single/multi-source shortest paths over non-negative
    * integer edge weights (Bellman–Ford relaxation): after `rounds`
    * rounds, each vertex holds the exact minimum total weight over all
    * paths of at most `rounds` edges from any seed — the weighted
    * companion of [[shortestHops]], and the same bounded fixpoint a
    * WITH RECURSIVE oracle enumerates. Integer weights keep the result
    * bit-identical across engines (no float path-sum drift).
    *
    * Each round is one equi join (settled × edges on src) plus one
    * min-aggregation — both map-side-combinable shuffles on the vertex
    * id. Unlike BFS the full settled set relaxes every round (distances
    * can improve), so per-round cost is O(settled out-edges); the hop
    * bound is the scale contract that keeps the loop finite on cyclic
    * graphs.
    *
    * @param edges (src, dst, w: bigint >= 0); undirected unless `directed`
    * @param seeds one column `id` — distance-0 vertices
    * @return (id, dist: bigint) — min path weight within the hop bound;
    *         unreachable vertices absent
    */
  def boundedShortestPaths(edges: DataFrame, seeds: DataFrame, rounds: Int,
                           directed: Boolean = false): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"), col("w"))
    val dir = pinStatic((if (directed) fwd
               else mirror(fwd, carry = Seq("w")))
      .repartition(col("src"))) // one-time: each round's relax join reuses it
    var dist = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0L)).pinned
    for (_ <- 1 to rounds) {
      val relax = dist.join(dir, dist("id") === dir("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relax)
        .groupBy("id").agg(min("dist").as("dist"))
        .pinned
    }
    dir.unpersist(false)
    dist
  }

  /** K-CORE decomposition membership (Seidman 1983; the Matula–Beck
    * peeling fixpoint): the maximal subgraph in which every vertex has
    * degree >= k — the standard density filter for duplicate/citation
    * graphs (template communities survive, incidental links peel away).
    *
    * Iterated peeling: each round computes degrees over the surviving
    * edge set (one map-side-combinable count aggregation) and drops
    * vertices below k via two semi joins (an edge survives only if BOTH
    * endpoints do), until the vertex count is stable. A round that
    * removes nothing removes no edges either, so node-count stability IS
    * the fixpoint. Per-round cost is O(surviving edges); `maxRounds` is
    * the same bounded-fixpoint contract as [[boundedShortestPaths]] —
    * the operator RAISES if the cascade outruns it rather than returning
    * a non-core superset, because callers (and the unrolled SQL oracle)
    * depend on the converged answer.
    *
    * localCheckpoint(true) pins each round (the shortestHops rationale:
    * otherwise the plan stacks `rounds` join layers), and the count that
    * drives convergence reads the pinned blocks.
    *
    * Rejected alternative, measured TWICE at sf1 (the deep-cascade
    * regime): DELTA peeling (propagate degree losses only from last
    * round's removed nodes, the sequential Matula–Beck trick) lost both
    * times — 25.8s vs 13.0s with the round-11 variant, and 14.29s/16.43s
    * vs 13.58s/15.43s (best/median of 3, identical 494,310-row core)
    * with a leaner round-13 rewrite (graft.ProbeKcoreDelta, kept as the
    * re-runnable A/B harness). The mechanism holds at any depth: without
    * an adjacency index, the "removed's incident edges" semi join still
    * scans the full pinned edge table every round, so the O(E)-total
    * bound never materializes, and the running (id, deg) table adds an
    * O(V) join + checkpoint per round on top. A third variant —
    * re-pinning the edge set restricted to survivors whenever the alive
    * node count halves — measured 14.44s/14.92s vs full-rescan's
    * 14.47s/15.40s in the same session: inside the ~1.2x session-variance
    * band, because d28's core retains most of the graph so the shrink
    * rarely fires; kept OUT for simplicity, but it is the variant to
    * revisit if a workload peels away most of the graph (the probe
    * harness retains all three).
    *
    * Round-14 (verdict task 4) added a FOURTH variant and an order
    * control: "bucket" peeling that fuses TWO cascade levels per Spark
    * round (peel deg<k, then in the same job peel survivors whose
    * degree minus just-lost edges drops below k — halving the round
    * count for one extra semi join + left join per round). Measured at
    * sf1 in two clean sessions with the variant ORDER REVERSED between
    * them (position in session is itself a ~1.5-2s treatment: the
    * first-run variant always reads worst, e.g. full-rescan 14.84s
    * best when first vs 12.78s when last): best-of-both-sessions
    * full-rescan 12.78s, shrink-pin 13.06s, delta-peel 13.32s,
    * fused-2lvl 14.36s, all four producing the identical 494,310-row
    * core. Fused REJECTED — the cascade here is shallow enough that
    * halving rounds buys less than the extra per-round joins cost —
    * and full-rescan KEPT a third time; no variant separates from it
    * beyond the session-variance band.
    *
    * Round-18 (verdict task 1) closed the last open question: all prior
    * A/Bs ran where spill was ZERO, and d28's sf10 profile (80 GB
    * mem-spill per execution, the repo's one superlinear slope) could
    * plausibly invert the verdict — each full rescan re-spills the edge
    * set, while delta-peeling touches a fraction of it. MEASURED at
    * sf10 (KCORE_AB_sf10_r18.json: two sessions, reversed order, 3 runs
    * each, bench posture, sizing rule on): full-rescan best
    * 160.0/173.2s vs delta-peel 211.2/214.4s — the rescan stays ~1.3x
    * FASTER in both orders even though delta-peeling spills 2.2x less
    * (37 vs 80 GB mem-spill/run). Bytes are not the cost: the delta
    * variant pays one extra shuffle (the losses join) plus an O(V)
    * degree-table rewrite and localCheckpoint per cascade level, all on
    * the blocking path, while the rescan's spill is sequential columnar
    * I/O the executors overlap with compute. Full-rescan is now
    * measured-optimal in BOTH regimes — zero-spill (sf0.1/sf1, three
    * prior A/Bs) and deep-spill (sf10) — so the 12.5x/decade d28 slope
    * is the honest price of the working set, not an algorithmic miss.
    *
    * @param edges (src, dst); treated as undirected (mirrored + distinct)
    * @param k     minimum within-core degree (counts DISTINCT neighbors,
    *              since the mirrored edge set is deduplicated)
    * @return one column (id) — the vertices of the k-core, possibly empty
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 20): DataFrame = {
    require(k >= 1, "kCore: k must be >= 1")
    // the edge table is pinned ONCE and never rewritten; each round
    // re-derives the surviving NODE set from it, so per-round
    // materialized state is O(V), not O(E) — at corpus scale the node
    // set is the thing that fits, and (being the small side) it is the
    // side AQE turns into broadcast semi joins against the static edges.
    // repartition(src) BEFORE distinct is load-bearing, not redundant
    // (round-11 ADVICE suggested dropping it; MEASURED and kept): a
    // HashPartitioning on src already co-locates equal (src, dst) rows,
    // so it satisfies the distinct aggregate's ClusteredDistribution —
    // the distinct adds NO exchange of its own and the cached
    // layout stays src-partitioned, which the per-round joins then reuse
    // whenever the node side is past broadcast size (exactly the BFS pin
    // above). A/B at sf0.1, same session, best/median of 5: with the
    // repartition 3.82/4.09 s; without (distinct's own (src,dst)
    // exchange, rounds re-shuffling edges) 5.41/6.01 s.
    val dir = pinStatic(mirror(edges.select(col("src"), col("dst")))
      .repartition(col("src"))
      .distinct())
    // lazy checkpoint + count, not eager pin + count: the convergence
    // count is the materializing action, so each round runs ONE
    // distributed job instead of two (the duplicateClusters round shape;
    // restamp below re-stamps block-truth leaf stats once materialized)
    val nodes0 = dir.select(col("src").as("id")).distinct()
      .localCheckpoint(false)
    var nNodes = nodes0.count()
    var nodes = graft.plans.Pins.restamp(nodes0)
    var rounds = 0
    var stable = false
    while (!stable) {
      require(rounds < maxRounds,
        s"kCore: cascade exceeded maxRounds=$maxRounds (still $nNodes nodes)")
      rounds += 1
      val alive = dir
        .join(nodes, dir("src") === nodes("id"), "left_semi")
      val lazyNext = alive
        .join(nodes, alive("dst") === nodes("id"), "left_semi")
        .groupBy("src").agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k)
        .select(col("src").as("id"))
        .localCheckpoint(false)
      val n = lazyNext.count()
      val next = graft.plans.Pins.restamp(lazyNext)
      // node sets only shrink, so count equality IS set equality — and a
      // round that drops no node drops no edge either: the fixpoint
      stable = n == nNodes
      nodes = next
      nNodes = n
    }
    dir.unpersist(false)
    nodes
  }
}
