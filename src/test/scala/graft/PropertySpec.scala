package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.ArrayExprs
import graft.mwa.{GraftConfig, Model}

/** Property-based tests (SURVEY §5.3) over the pure compute kernels —
  * no SparkSession needed, so these run in milliseconds. */
class PropertySpec extends AnyFunSuite {

  /** Minimal deterministic property driver over ScalaCheck Gens (the
    * scalatest-plus bridge is not in the offline dependency cache). */
  private val seed0 = org.scalacheck.rng.Seed(42L)
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    var seed = seed0
    for (_ <- 1 to 100) {
      val a = ga.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val b = gb.pureApply(Gen.Parameters.default, seed); seed = seed.next
      f(a, b)
    }
  }
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit = {
    var seed = seed0
    for (_ <- 1 to 100) {
      val a = ga.pureApply(Gen.Parameters.default, seed); seed = seed.next
      f(a)
    }
  }

  private def strArray(xs: Seq[String]) =
    new GenericArrayData(xs.map(s => UTF8String.fromString(s)).toArray[Any])
  private def dblArray(xs: Seq[Double]) =
    new GenericArrayData(xs.toArray[Any])

  test("minhash signature is invariant under shingle permutation") {
    forAll(Gen.listOf(Gen.alphaNumStr), Gen.long) { (xs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      val a = ArrayExprs.minhashCompute(strArray(xs), 32)
      val b = ArrayExprs.minhashCompute(strArray(shuffled), 32)
      assert(a.toLongArray().sameElements(b.toLongArray()))
    }
  }

  test("identical inputs give identical signatures; empty gives MaxValue") {
    forAll(Gen.listOf(Gen.alphaNumStr)) { xs =>
      val a = ArrayExprs.minhashCompute(strArray(xs), 16)
      val b = ArrayExprs.minhashCompute(strArray(xs), 16)
      assert(a.toLongArray().sameElements(b.toLongArray()))
    }
    assert(ArrayExprs.minhashCompute(strArray(Nil), 8).toLongArray()
      .forall(_ == Long.MaxValue))
  }

  test("minhash of a superset is <= elementwise (mins only decrease)") {
    forAll(Gen.listOf(Gen.alphaNumStr), Gen.listOf(Gen.alphaNumStr)) { (xs, ys) =>
      val sub = ArrayExprs.minhashCompute(strArray(xs), 32).toLongArray()
      val sup = ArrayExprs.minhashCompute(strArray(xs ++ ys), 32).toLongArray()
      assert(sub.zip(sup).forall { case (a, b) => b <= a })
    }
  }

  test("dot product is commutative and linear in scalar") {
    val genVec = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))
    forAll(genVec, genVec) { (a, b) =>
      val ab = ArrayExprs.dotCompute(dblArray(a), dblArray(b), false, false)
      val ba = ArrayExprs.dotCompute(dblArray(b), dblArray(a), false, false)
      assert(ab == ba)
      val a2 = ArrayExprs.dotCompute(dblArray(a.map(_ * 2)), dblArray(b), false, false)
      assert(math.abs(a2 - 2 * ab) <= 1e-9 * math.max(1.0, math.abs(ab)))
    }
  }

  test("dot(a,a) is non-negative") {
    forAll(Gen.listOfN(8, Gen.chooseNum(-1e6, 1e6))) { a =>
      assert(ArrayExprs.dotCompute(dblArray(a), dblArray(a), false, false) >= 0.0)
    }
  }

  test("batch-count formula: >=1, monotone in size, doubles beyond memory") {
    forAll(Gen.chooseNum(1L, 10000L), Gen.chooseNum(1L, 1024L)) { (size, mem) =>
      val b = Model.computeOptimalBatches(size, availMemGb = mem)
      assert(b >= 1)
      val b2 = Model.computeOptimalBatches(size + 1, availMemGb = mem)
      assert(b2 >= b) // monotone: more data never means fewer batches
      if (size * 7 < mem) assert(b == 1) else assert(b % 2 == 0)
    }
  }

  test("derived suffix grammar (configurators.py:125-134)") {
    import graft.mwa.SpectrumType
    forAll(Gen.oneOf(SpectrumType.All, SpectrumType.Auto, SpectrumType.Cross),
      Gen.oneOf(true, false)) { (st, diff) =>
      val s = GraftConfig(diff = diff, spectrumType = st).derivedSuffix
      if (diff) assert(s.startsWith(".diff"))
      if (st != SpectrumType.All) assert(s.endsWith(s".${st.name}"))
      if (!diff && st == SpectrumType.All) assert(s.isEmpty)
    }
  }

  test("gps conversion: 18s offset in 2024 and exact arithmetic order") {
    import graft.functions.GpsTime
    // 2024-01-01T00:00:00 UTC = 1704067200 unix
    val us = 1704067200L * 1000000L
    assert(GpsTime.gpsFromMicros(us) == (us / 1e6 - 315964800) + 18)
    // pre-GPS-era leap count is 0
    assert(GpsTime.leapSecondsAt(0L) == 0)
    // boundary: first leap second 1981-07-01
    assert(GpsTime.leapSecondsAt(362793600L) == 1)
    assert(GpsTime.leapSecondsAt(362793599L) == 0)
  }
}
