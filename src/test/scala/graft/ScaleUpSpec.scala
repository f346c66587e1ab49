package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ScaleUp letter-bijection family against the round-15 fold
  * bug: the original rotations-of-"etaoins" family is a cyclic group of
  * order 7, so beyond 7 copies the family repeats, and a TWO-LEVEL
  * derivation (sf0.1 -> sf1 -> sf10) composes rotations, folding 100
  * (outer, inner) copy pairs onto 7 bijections — every base document
  * then exists in ~14 byte-identical variants and the corpus's true
  * near-dup structure grows quadratically, which is a skew experiment,
  * not the scale trend the sweep measures (it cost d27 a disk-exhausted
  * sort at sf10 before it was caught; BENCH_sf10.json). These tests fail
  * on ANY family whose members or pairwise compositions collide at the
  * factors the project actually derives. */
class ScaleUpSpec extends AnyFunSuite {

  private def compose(outer: String, inner: String): String =
    // translate(translate(t, A, inner), A, outer): base letter at index k
    // maps first to inner(k), then that letter maps through outer
    inner.map(c => outer(ScaleUp.alphabet.indexOf(c)))

  test("copy 0 is the identity (base corpus stays a subset)") {
    assert(ScaleUp.perm(0) == ScaleUp.alphabet)
  }

  test("every member is a bijection of the alphabet") {
    for (i <- 0 until 100) {
      val p = ScaleUp.perm(i)
      assert(p.sorted == ScaleUp.alphabet, s"perm($i) is not a bijection")
    }
  }

  test("family is collision-free through factor 100") {
    val fam = (0 until 100).map(ScaleUp.perm)
    assert(fam.distinct.size == fam.size)
  }

  test("two-level 10x10 derivation folds only at the identity overlap " +
      "(the exact round-15 fold class)") {
    // With identity in the family (copy 0 — a deliberate property: the
    // base corpus stays a subset), compose(p_i, id) == compose(id, p_i),
    // so F*F two-level pairs can reach at most F*F - (F-1) distinct
    // bijections and each class has multiplicity <= 2: duplicate texts
    // grow LINEARLY in the factor. The old rotations-of-"etaoins" family
    // folded all 100 pairs onto 7 classes (multiplicity ~14) — duplicate
    // texts grew QUADRATICALLY, which is what buried d27 at sf10.
    val fam = (0 until 10).map(ScaleUp.perm)
    val composed = for (o <- fam; i <- fam) yield compose(o, i)
    val byClass = composed.groupBy(identity).view.mapValues(_.size)
    assert(composed.distinct.size == 100 - 9,
      s"composed family folds to ${composed.distinct.size} classes")
    assert(byClass.values.max <= 2,
      s"a composed class has multiplicity ${byClass.values.max}")
  }

  test("per-copy key offset survives composition (round-16 key-fold fix)") {
    // sf0.1-scale keys keep the legacy 10M offset (certified sf1
    // derivation unchanged)...
    assert(ScaleUp.offsetFor(600000L) == 10000000L)
    // ...but a source that is ITSELF a 10-copy derivation (keys ~90M)
    // must clear to the next decade — the round-16 finding: the constant
    // 10M folded sf1->sf10 keys onto 1.9x the base space (500k documents,
    // 95k distinct doc_ids; d06's verify join fanned out 12.6x)
    assert(ScaleUp.offsetFor(90600000L) == 100000000L)
    assert(ScaleUp.offsetFor(10000000L) == 100000000L) // boundary: strict >
    assert(ScaleUp.offsetFor(999999999L) == 1000000000L)
    // disjointness by construction: 10 copies of [0, maxKey] at the
    // derived stride never overlap
    val maxKey = 90600000L
    val k = ScaleUp.offsetFor(maxKey)
    val ranges = (0 until 10).map(i => (i * k, i * k + maxKey))
    ranges.sliding(2).foreach { case Seq((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"copy ranges overlap: $hi >= $lo2")
    }
  }
}
