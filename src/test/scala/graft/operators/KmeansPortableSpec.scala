package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the portable k-means contract (x12's operator): determinism,
  * quantizer clamping, first-min tie-break, empty-cell carry-over, and
  * the within-cell duplicate collapse. */
class KmeansPortableSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("quantizer clamps to [0,255] and is integer-typed") {
    val q = KmeansPortable.quantize(frame(Seq(
      (1L, Seq(-10f, 10f, 0f, 0.25f)))))
    val v = q.select("__q").head.getSeq[Long](0)
    assert(v == Seq(0L, 255L, 128L, 192L))
  }

  test("cells are deterministic and cover 0..k-1 on a spread corpus") {
    // four well-separated 2d points, k=2: same result on repeated fits
    val rows = Seq(
      (1L, Seq(0.4f, 0.4f)), (2L, Seq(0.38f, 0.42f)),
      (3L, Seq(-0.4f, -0.4f)), (4L, Seq(-0.42f, -0.38f)))
    val a = KmeansPortable.cells(frame(rows), k = 2, rounds = 2)
      .orderBy("vec_id").collect().toSeq
    val b = KmeansPortable.cells(frame(rows), k = 2, rounds = 2)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
    // the two spatial clusters land in distinct cells
    val byId = a.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byId(1L) == byId(2L) && byId(3L) == byId(4L)
      && byId(1L) != byId(3L))
  }

  test("exact duplicates collapse to the smallest id within a cell") {
    val rows = Seq(
      (5L, Seq(0.1f, 0.1f)), (9L, Seq(0.1f, 0.1f)), (7L, Seq(0.1f, 0.1f)),
      (2L, Seq(-0.3f, -0.3f)))
    val out = KmeansPortable.cells(frame(rows), k = 2, rounds = 1)
    val kept = out.filter(col("kept")).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept.contains(5L) && !kept.contains(7L) && !kept.contains(9L))
    assert(kept.contains(2L))
  }

  test("an emptied cell keeps its previous centroid (stable cell ids)") {
    // k = n: every vector is an init centroid; after one round the cells
    // must still be exactly 0..k-1 with dist2 = 0 for each member — a
    // dropped empty cell would renumber or lose one
    val rows = Seq(
      (1L, Seq(0.4f, 0.0f)), (2L, Seq(-0.4f, 0.0f)), (3L, Seq(0.0f, 0.4f)))
    val out = KmeansPortable.cells(frame(rows), k = 3, rounds = 3)
    assert(out.select("cell").distinct().count() == 3)
    assert(out.agg(max(col("dist2"))).head.getLong(0) == 0L)
  }

  test("cells are invariant under input partitioning (the 1000-executor property)") {
    // every stage must be order/partitioning-independent: md5 init is a
    // global TakeOrdered, centroid sums are exact integer aggregations,
    // assignment is per-row — so a repartitioned corpus must produce
    // BIT-identical cells, distances and kept flags
    val rows = (0L until 64L).map(i =>
      (i, Seq.tabulate(4)(j => ((i * 7 + j * 13) % 19 - 9) / 20.0f)))
    val base = KmeansPortable.cells(frame(rows), k = 3, rounds = 2)
      .orderBy("vec_id").collect().toSeq
    val shuffled = KmeansPortable.cells(frame(rows.reverse).repartition(7),
        k = 3, rounds = 2)
      .orderBy("vec_id").collect().toSeq
    assert(base == shuffled)
  }

  private def quant(v: Seq[Float]): Seq[Long] =
    v.map(x => math.max(0L, math.min(255L,
      math.floor(x * 256.0 + 0.5).toLong + 128L)))

  test("ivfSearch with nprobe=k equals brute-force integer kNN") {
    // probing every cell makes the candidate set the whole corpus, so the
    // result must be EXACTLY the quantized-space kNN with the (dist2,
    // nn_id) tie-break — certifying probe ranking, candidate join and
    // rerank in one shot
    val rows = (0L until 40L).map(i =>
      (i, Seq.tabulate(4)(j => ((i * 11 + j * 5) % 23 - 11) / 12.0f)))
    val got = KmeansPortable.ivfSearch(frame(rows.take(5)), frame(rows),
        topK = 3, k = 3, rounds = 2, nprobe = 3)
      .orderBy("vec_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val qv = rows.map { case (id, v) => id -> quant(v) }.toMap
    val expect = rows.take(5).flatMap { case (qid, _) =>
      rows.filter(_._1 != qid).map { case (nid, _) =>
        (nid, qv(qid).zip(qv(nid)).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (nid, d) => (d, nid) }.take(3)
        .zipWithIndex.map { case ((nid, d), i) => (qid, nid, d, i + 1) }
    }
    assert(got == expect)
  }

  test("ivfSearch candidates stay inside probed cells; partition-invariant") {
    // two well-separated clusters, nprobe=1: every neighbor must share
    // the query's cell (a cross-cell candidate leak would surface the
    // far cluster), and a repartitioned corpus gives bit-identical output
    val near = (0L until 6L).map(i => (i, Seq(0.3f + i * 0.01f, 0.3f)))
    val far = (10L until 16L).map(i => (i, Seq(-0.3f - (i - 10) * 0.01f, -0.3f)))
    val rows = near ++ far
    val res = KmeansPortable.ivfSearch(frame(rows.take(2)), frame(rows),
        topK = 4, k = 2, rounds = 2, nprobe = 1)
      .orderBy("vec_id", "rnk").collect().toSeq
    assert(res.nonEmpty)
    assert(res.forall(_.getLong(1) < 10L),
      s"nprobe=1 neighbors must stay in the query's (near) cell: $res")
    val shuffled = KmeansPortable.ivfSearch(frame(rows.take(2)),
        frame(rows.reverse).repartition(5), topK = 4, k = 2, rounds = 2,
        nprobe = 1)
      .orderBy("vec_id", "rnk").collect().toSeq
    assert(res == shuffled)
  }

  test("fit rejects a corpus smaller than k") {
    val tiny = frame(Seq((1L, Seq(0.1f, 0.1f))))
    intercept[IllegalArgumentException] {
      KmeansPortable.fit(tiny, k = 4, rounds = 1)
    }
  }
}
