package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the portable PQ/SQ twin contracts (x14/x15/x16's operators):
  * determinism under repartitioning, codebook shape/range, top-k
  * completeness with self-exclusion, and the scale-plan shape (corpus
  * never shuffles before the single top-k exchange). */
class PqPortableSpec extends SparkSpec {
  import spark.implicits._

  // 40 vectors x 8 dims, deterministic, spread over [-0.5, 0.5)
  private lazy val corpus = (0L until 40L).map { i =>
    (i, (0 until 8).map(d => (((i * 7 + d * 13) % 32) - 16) / 32.0f))
  }.toDF("vec_id", "embedding")
  private lazy val queries = corpus.filter(col("vec_id") < 5)

  test("fitBooks: m x codes x dsub integer books in the quantized range") {
    val books = PqPortable.fitBooks(corpus, m = 4, codes = 4, rounds = 2)
    assert(books.length == 4 && books.forall(_.length == 4)
      && books.flatten.forall(_.length == 2))
    assert(books.flatten.flatten.forall(v => v >= 0L && v <= 255L))
  }

  test("pqSearch: full top-k per query, no self, deterministic under repartition") {
    val a = PqPortable.pqSearch(queries, corpus, topK = 3,
      m = 4, codes = 4, rounds = 2).orderBy("vec_id", "rnk").collect().toSeq
    val b = PqPortable.pqSearch(queries.repartition(7), corpus.repartition(5),
      topK = 3, m = 4, codes = 4, rounds = 2)
      .orderBy("vec_id", "rnk").collect().toSeq
    assert(a == b)
    assert(a.size == 5 * 3)
    assert(a.forall(r => r.getLong(0) != r.getLong(1)))
    // rnk is exactly 1..k per query
    assert(a.groupBy(_.getLong(0)).values
      .forall(_.map(_.getInt(3)).sorted == Seq(1, 2, 3)))
  }

  test("ivfAdcSearch: deterministic under repartition, no self, rnk <= k") {
    val a = PqPortable.ivfAdcSearch(queries, corpus, topK = 3,
      kCells = 3, coarseRounds = 2, nprobe = 2, m = 4, codes = 4,
      pqRounds = 2).orderBy("vec_id", "rnk").collect().toSeq
    val b = PqPortable.ivfAdcSearch(queries.repartition(6),
      corpus.repartition(9), topK = 3, kCells = 3, coarseRounds = 2,
      nprobe = 2, m = 4, codes = 4, pqRounds = 2)
      .orderBy("vec_id", "rnk").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.forall(r => r.getLong(0) != r.getLong(1) && r.getInt(3) <= 3))
  }

  test("ivfAdcSearch really prunes: nprobe=1 on a two-cluster corpus never crosses clusters") {
    // two tight, well-separated clusters; kCells=2 splits them, so with
    // nprobe=1 each query's candidates are its own cluster ONLY: with
    // topK far above the in-cluster candidate count, a full-scan
    // regression (cell join degrading to all cells) would return 15
    // rows per query where pruning caps it at the 7 cluster-mates
    val two = (0L until 16L).map { i =>
      val base = if (i < 8) 0.4f else -0.4f
      (i, Seq(base + (i % 8) * 0.005f, base - (i % 8) * 0.005f))
    }.toDF("vec_id", "embedding")
    val out = PqPortable.ivfAdcSearch(two.filter(col("vec_id") < 2), two,
      topK = 15, kCells = 2, coarseRounds = 2, nprobe = 1,
      m = 2, codes = 2, pqRounds = 1).collect()
    val perQuery = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.nonEmpty && perQuery.values.forall(_ <= 7),
      s"nprobe=1 must cap candidates at the 7 cluster-mates: $perQuery")
    // and no returned neighbor crosses the cluster boundary
    assert(out.forall(r => (r.getLong(0) < 8) == (r.getLong(1) < 8)),
      out.mkString(", "))
  }

  test("sqSearch: deterministic under repartition, exact top-k, no self") {
    val a = Sq.sqSearch(queries, corpus, topK = 4, levels = 16)
      .orderBy("vec_id", "rnk").collect().toSeq
    val b = Sq.sqSearch(queries.repartition(3), corpus.repartition(8),
      topK = 4, levels = 16).orderBy("vec_id", "rnk").collect().toSeq
    assert(a == b)
    assert(a.size == 5 * 4)
    assert(a.forall(r => r.getLong(0) != r.getLong(1)))
    // dist2 is nondecreasing in rnk within a query
    a.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRnk = rows.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(byRnk == byRnk.sorted)
    }
  }

  test("sqSearch is lossless when the per-dim width equals the level count") {
    // when hi - lo + 1 == levels, each integer value is its own cell:
    // code = v - lo and the midpoint reconstruction returns exactly v, so
    // the search equals exact integer kNN over the quantized coordinates.
    // craft that: 2-dim vectors whose quantized values span 128..143 in
    // BOTH dims (k/256 quantizes to exactly 128 + k), levels = 16
    val grid16 = (0L until 16L).map(i =>
      (i, Seq((i / 256.0).toFloat, (((i * 7) % 16) / 256.0).toFloat)))
      .toDF("vec_id", "embedding")
    val grid16q = grid16.filter(col("vec_id") < 5)
    val exact = Sq.sqSearch(grid16q, grid16, topK = 3, levels = 16)
      .orderBy("vec_id", "rnk").collect().toSeq
    val q = KmeansPortable.quantize(grid16)
    val qq = q.select(col("__id").as("vec_id"), col("__q").as("qa"))
      .filter(col("vec_id") < 5)
    val cc = q.select(col("__id").as("nn_id"), col("__q").as("ca"))
    val brute = qq.crossJoin(cc).filter(col("vec_id") =!= col("nn_id"))
      .withColumn("dist2", aggregate(zip_with(col("qa"), col("ca"),
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("dist2"), col("nn_id"))))
      .filter(col("rnk") <= 3)
      .select("vec_id", "nn_id", "dist2", "rnk")
      .orderBy("vec_id", "rnk").collect().toSeq
    assert(exact == brute)
  }

  test("lshPortable: deterministic under repartition, no self, recall-sane on spread data") {
    val a = Similarity.lshPortable(queries, corpus, topK = 3,
      tables = 4, nPlanes = 4).orderBy("vec_id", "rnk").collect().toSeq
    val b = Similarity.lshPortable(queries.repartition(5),
      corpus.repartition(11), topK = 3, tables = 4, nPlanes = 4)
      .orderBy("vec_id", "rnk").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.forall(r => r.getLong(0) != r.getLong(1) && r.getInt(3) <= 3))
    // every emitted pair really shares a (table, bucket): distances are
    // between bucket-mates only, so no pair may beat the true exact-NN
    // distance of its query (LSH never invents closer neighbors)
    val exactBest = {
      val q = KmeansPortable.quantize(corpus)
      val qq = q.select(col("__id").as("vec_id"), col("__q").as("qa"))
        .filter(col("vec_id") < 5)
      val cc = q.select(col("__id").as("nn_id"), col("__q").as("ca"))
      qq.crossJoin(cc).filter(col("vec_id") =!= col("nn_id"))
        .withColumn("d", aggregate(zip_with(col("qa"), col("ca"),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x))
        .groupBy("vec_id").agg(min("d").as("best"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    a.filter(_.getInt(3) == 1).foreach { r =>
      assert(r.getLong(2) >= exactBest(r.getLong(0)),
        s"rank-1 LSH distance beats the exact NN for query ${r.getLong(0)}")
    }
  }

  test("pqSearch scale plan: corpus never shuffles — one exchange total, at the top-k") {
    // the PqPortable scaladoc contract: encoding is a literal-codebook
    // map, queries broadcast (BNLJ), so the ONLY exchange in the whole
    // plan is the top-k window's hash partitioning on the query id
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // descend AQE wrappers: after execution, exchanges live inside
    // materialized QueryStageExec leaves, not inline in the tree
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case s: ShuffleExchangeExec => s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
    val out = PqPortable.pqSearch(queries, corpus, topK = 3,
      m = 4, codes = 4, rounds = 2)
    out.collect() // materialize so AQE settles the final plan
    val plan = out.queryExecution.executedPlan
    val ex = shuffles(plan)
    assert(ex.size == 1, s"expected exactly one ShuffleExchangeExec:\n$plan")
    // match on the partitioning's attribute names, not its rendering —
    // toString formats differ across Spark versions
    val partAttrs = ex.head.outputPartitioning match {
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        h.expressions.flatMap(_.references.map(_.name))
      case other => fail(s"expected HashPartitioning, got $other")
    }
    assert(partAttrs.contains("__qid"),
      s"the single exchange must partition on the query id: $partAttrs")
    val rendered = plan.toString
    assert(!rendered.contains("SortMergeJoin") &&
      !rendered.contains("ShuffledHashJoin") &&
      !rendered.contains("CartesianProduct"), rendered)
  }
}
