package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for a training-data pipeline, expressed as
  * Catalyst column expressions (higher-order functions, no UDFs) so they
  * distribute and codegen. Everything here is deterministic — a hard
  * requirement for dedup keys that must agree across 1000 executors.
  *
  * PERFORMANCE NOTE — `bind`: inside a higher-order-function lambda, a
  * referenced sub-expression is RE-EVALUATED on every lambda iteration
  * (Catalyst has no common-subexpression elimination across lambda
  * boundaries). A minhash written naively as
  * `transform(0..k, j -> min(transform(shingles(text), ...)))` recomputes
  * the whole shingle pipeline k times per row — observed 100x slowdowns.
  * `bind` introduces a let-binding (single-element transform) so the
  * sub-expression is evaluated exactly once per row.
  */
object Fn {
  /** let-binding for column expressions: evaluate `c` once, use many times. */
  def bind(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), body), 1)

  /** two-value let-binding. */
  def bind2(a: Column, b: Column)(body: (Column, Column) => Column): Column =
    bind(struct(a.as("_1"), b.as("_2")))(s => body(s.getField("_1"), s.getField("_2")))
}

object TextFns {
  import Fn._

  /** Whitespace tokenization; empty tokens dropped. Compiled pass via the
    * existing word_grams kernel at n=1 (a 1-gram IS the word list: same
    * Java-\s+ split, same empty-token drop, order and repeats kept) —
    * the filter(split) form ran an interpreted lambda per token. */
  def words(text: Column): Column =
    ArrayExprs.word_grams(text, 1)

  /** BPE-ish pre-tokenization: word pieces OR single punctuation marks. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))

  /** Count of BPE-ish tokens. */
  def tokenCount(text: Column): Column = size(regexTokens(text))

  /** Distinct word n-gram shingles, the MinHash/Jaccard input unit.
    * n-gram i = words[i..i+n-1] joined by a single space; docs shorter
    * than n words yield an empty set. Native expression
    * (ArrayExprs.WordShingles, one compiled pass). */
  def wordShingles(text: Column, n: Int): Column =
    ArrayExprs.word_shingles(text, n)

  /** Exact Jaccard similarity — the GENERAL form: inputs are treated as
    * sets (deduplicated first), so raw token arrays with repeats get the
    * correct answer. Hot paths that already hold distinct arrays should
    * call [[jaccardDistinct]] and skip the two array_distinct builds. */
  def jaccard(a: Column, b: Column): Column =
    jaccardDistinct(array_distinct(a), array_distinct(b))

  /** Exact Jaccard similarity of two DISTINCT-element arrays — the fast
    * path, with the precondition in the name (round-11 ADVICE: the old
    * `jaccard` name silently mis-scored non-distinct inputs, since
    * |A∪B| = |A|+|B|-|A∩B| only holds for sets). For distinct inputs ONE
    * intersect hash-set build replaces intersect+union (every internal
    * caller feeds wordShingles output, distinct by construction;
    * whole-stage codegen CSEs the repeated intersect). Same integers,
    * same single division — bit-identical to the intersect/union form. */
  def jaccardDistinct(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  /** MinHash signature of length k over a shingle array — native Catalyst
    * expression (ArrayExprs.MinHashSig): one XxHash64 per shingle plus k
    * linear permutations, in a compiled loop. Deterministic, shuffle-free.
    * Empty shingle set => all-Long.MaxValue signature. */
  def minhashSignature(shingles: Column, k: Int): Column =
    ArrayExprs.minhash_signature(shingles, k)

  /** Estimated Jaccard = fraction of agreeing MinHash components.
    * Native compiled expression (ArrayExprs.MinHashEstimate) — bit-identical
    * to the zip_with(when equal)+aggregate+cast+divide formulation it
    * replaces (agreement count over the common prefix, divided by
    * size(sigA), both through double). */
  def minhashEstimate(sigA: Column, sigB: Column): Column =
    ArrayExprs.minhash_estimate(sigA, sigB)

  /** LSH band digests: the k-long signature split into `bands` bands of
    * k/bands rows, each band hashed to one long. Docs sharing any band
    * digest become near-dup candidates; candidates are found with an equi
    * join on (band, digest) — a hash join that scales, instead of an
    * all-pairs cross join that doesn't. */
  def lshBands(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    // explicit CreateArray over the (compile-time) band indices, NOT
    // bind + transform: bind's let-binding wraps its whole body in a
    // single-iteration lambda, which evaluates INTERPRETED — for 32
    // bands that was 32 interpreted slice+hash evaluations per row.
    // CALLER CONTRACT: pass a cheap column (an attribute, as every
    // current call site does) — `sig` is referenced once per band.
    // Identical digests: xxhash64(int b, slice) over the same slices.
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), slice(sig, b * rows + 1, rows))
          .as("digest"))): _*)
  }

  /** Portable (md5-derived) MinHash signature: component i is the minimum
    * over shingles of the 60-bit integer prefix of md5("i:shingle") — the
    * oracle-checkable twin of [[minhashSignature]] (whose xxhash64 is
    * engine-native), the same trick d08 plays for SimHash. Re-derivable in
    * any engine with md5. Callers must filter empty shingle sets (min of
    * an empty list is NULL in every engine, but engines disagree on how
    * NULL list elements serialize downstream). */
  def minhashPortable(shingles: Column, k: Int): Column =
    // native compiled loop (ArrayExprs.MinHashPortableSig) — bit-identical
    // to the transform(sequence) + array_min(transform(md5_prefix_long))
    // nest it replaces (same "i:shingle" digest bytes, same array_min
    // null semantics; see the compute scaladoc). The when() keeps the old
    // formulation's null-input shape: bind+transform turned a NULL
    // shingle array into k NULL components, not a NULL array. CALLER
    // CONTRACT (as lshBands): pass a cheap column — `shingles` is
    // referenced twice (the null guard and the signature build).
    when(shingles.isNotNull, ArrayExprs.minhash_portable_sig(shingles, k))
      .otherwise(array((0 until k).map(_ => lit(null).cast("long")): _*))

  /** Portable LSH band digests: identical banding logic to [[lshBands]]
    * (band b covers signature rows [b*r, (b+1)*r), r = k/bands) with the
    * engine-native xxhash64 digest replaced by md5 over the comma-joined
    * decimal rows, so the band-slice boundaries and bucket keys are
    * re-derivable cross-engine. */
  def lshBandsPortable(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    // explicit CreateArray, same rationale and caller contract as
    // [[lshBands]]; digests unchanged (md5 over the same joined slices)
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",",
          transform(slice(sig, b * rows + 1, rows), x => x.cast("string")))
          .cast("binary")).as("digest"))): _*)
  }

  /** 64-bit SimHash over the word multiset. Bit j of the result is set iff
    * sum over words of (+1 if bit j of xxhash64(word) else -1) is > 0.
    * Near-duplicates differ in few bits (compare via hamming()).
    * Uses call_function for shiftright/shiftleft because the Scala
    * functions API only accepts literal Int shift amounts. */
  def simhash64(text: Column): Column =
    // native compiled loop (ArrayExprs.SimHashText): same word split,
    // same xxhash64(word) seed-42 token hash, same +1/-1 bit votes and
    // positive-sum bit assembly as the aggregate/zip_with formulation it
    // replaces — which evaluated a 64-iteration interpreted lambda (with
    // a shiftright call_function per bit) per word per row.
    ArrayExprs.simhash_text(text, 64, portable = false)

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Portable 60-bit SimHash: token hash = first 15 hex digits of md5
    * (reproducible in any engine with md5 + hex parsing), bit j set iff the
    * token-vote sum for bit j is positive. Same algorithm as [[simhash64]];
    * that one's xxhash64 token hash is the fast production path, this one
    * is the DuckDB-oracle-checkable twin (d08). */
  def simhashPortable(text: Column): Column =
    // same compiled loop as [[simhash64]] with the md5 15-hex-digit
    // prefix token hash (= conv(substring(md5(w), 1, 15), 16, 10), the
    // ArrayExprs.md5PrefixLongCompute contract) over 60 bits — the
    // DuckDB oracle (d08) re-derives these exact values bit-for-bit.
    ArrayExprs.simhash_text(text, 60, portable = true)

  /** Polynomial rolling-hash fingerprint of normalized text (lowercased,
    * whitespace collapsed): h = h*31 + codepoint, wrapping in Long. */
  def rollingFingerprint(text: Column): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    aggregate(
      transform(split(norm, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => acc * 31L + c)
  }

  /** Fraction of tokens that are stopwords (quality signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    bind(words(lower(text))) { w =>
      size(filter(w, x => x.isin(stopwords: _*))).cast("double") /
        greatest(size(w), lit(1)).cast("double")
    }

  /** Heuristic language id over a tiny built-in stopword table: the
    * language whose stopwords hit the most tokens wins ("und" if none). */
  def langId(text: Column): Column = {
    val table: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
      "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans"))
    bind(words(lower(text))) { w =>
      val scores = table.map { case (lang, sw) =>
        struct(size(filter(w, x => x.isin(sw: _*))).as("score"), lit(lang).as("lang"))
      }
      val best = greatest(scores: _*)
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
    }
  }
}
