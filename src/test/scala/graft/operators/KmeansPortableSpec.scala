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

  test("fit rejects a corpus smaller than k") {
    val tiny = frame(Seq((1L, Seq(0.1f, 0.1f))))
    intercept[IllegalArgumentException] {
      KmeansPortable.fit(tiny, k = 4, rounds = 1)
    }
  }
}
