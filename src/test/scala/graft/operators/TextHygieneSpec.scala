package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the corpus-hygiene operators (cross-doc n-gram dedup
  * signal, PII redaction, boilerplate-chunk removal) on controlled
  * fixtures where every expected value is hand-derivable. */
class TextHygieneSpec extends SparkSpec {

  import spark.implicits._

  test("crossDocNgramDup: exact copies score 1.0, unique docs 0.0") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),  // copy of 1
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),    // unique
      (3L, "short doc")                             // < n words: no row
    ).toDF("doc_id", "text")
    val r = TextAnalysis.crossDocNgramDup(docs, n = 5)
      .orderBy("doc_id").collect()
    assert(r.length === 3) // doc 3 has no 5-grams
    assert(r(0).getLong(1) === 2 && r(0).getLong(2) === 2 && r(0).getDouble(3) === 1.0)
    assert(r(1).getDouble(3) === 1.0)
    assert(r(2).getLong(2) === 0L && r(2).getDouble(3) === 0.0)
  }

  test("linearClassify: scores are the exact bucket-weight sums, keep thresholds them") {
    // weight table: every bucket weighs +1 except word "bad"'s bucket,
    // which weighs enough negative to sink any doc containing it
    val dim = 64
    val badBucket = Sampling.keyHash(lit("bad")).cast("long")
    val docs = Seq(
      (0L, "good words only here"),
      (1L, "some bad words here"),
      (2L, "bad bad bad")
    ).toDF("doc_id", "text")
    val weights = spark.range(dim.toLong).select(col("id").as("bucket"),
      when(col("id") === pmod(badBucket, lit(dim.toLong)), lit(-100L))
        .otherwise(lit(1L)).as("weight"))
    val r = TextAnalysis.linearClassify(docs, weights, dim)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) === 4L && r(0).getLong(2) === 4L && r(0).getBoolean(3))
    // doc 1: 3 good words (+3), one "bad" (-100) = -97 -> dropped
    assert(r(1).getLong(1) === -97L && !r(1).getBoolean(3))
    assert(r(2).getLong(1) === -300L && !r(2).getBoolean(3))
  }

  test("crossDocNgramDup: partial overlap counts occurrences, not grams") {
    // doc 0 repeats a shared 2-gram twice: both OCCURRENCES count as dup
    val docs = Seq(
      (0L, "a b a b"),   // 2-grams: "a b","b a","a b" -> "a b" x2 shared
      (1L, "a b c")      // 2-grams: "a b","b c"
    ).toDF("doc_id", "text")
    val r = TextAnalysis.crossDocNgramDup(docs, n = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) === 3 && r(0).getLong(2) === 2)  // 2 of 3 occurrences
    assert(r(1).getLong(1) === 2 && r(1).getLong(2) === 1)
  }

  test("piiRedact: emails and long digit runs replaced, counts exact") {
    val docs = Seq(
      (0L, "mail a.b+c@ex-ample.org and x@y.io now"),
      (1L, "call 1234567 or 87654321 ext 12345"),   // 12345 too short
      (2L, "clean text no pii")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiRedact(docs).orderBy("doc_id").collect()
    assert(r(0).getString(1) === "mail <EMAIL> and <EMAIL> now")
    assert(r(0).getInt(2) === 2 && r(0).getInt(3) === 0)
    assert(r(1).getString(1) === "call <NUM> or <NUM> ext 12345")
    assert(r(1).getInt(2) === 0 && r(1).getInt(3) === 2)
    assert(r(2).getString(1) === "clean text no pii")
    assert(r(2).getInt(2) === 0 && r(2).getInt(3) === 0)
  }

  test("removeBoilerplateChunks: drops corpus-frequent chunks, keeps order") {
    // "x y" chunk appears in 3 docs -> dropped at maxDocs=3; everything
    // else is unique and survives in original position
    val docs = Seq(
      (0L, "x y a0 b0 x y c0 d0"),
      (1L, "x y a1 b1"),
      (2L, "a2 b2 x y"),
      (3L, "solo words only here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.removeBoilerplateChunks(docs, chunkWords = 2, maxDocs = 3)
      .orderBy("doc_id").collect()
    assert(r(0).getInt(1) === 4 && r(0).getInt(2) === 2)
    assert(r(0).getString(3) === "a0 b0 c0 d0")
    assert(r(1).getString(3) === "a1 b1")
    assert(r(2).getString(3) === "a2 b2")
    assert(r(3).getInt(2) === 0 && r(3).getString(3) === "solo words only here")
  }

  test("curationFunnel: funnel arithmetic exact, NULL predicates fail closed") {
    val docs = Seq(
      (0L, Some("en"), 10),  // passes both stages
      (1L, Some("en"), 3),   // fails stage 2
      (2L, Some("de"), 10),  // fails stage 1 -> never reaches stage 2
      (3L, None, 10)         // NULL lang: stage-1 predicate is NULL -> dropped
    ).toDF("doc_id", "lang", "n")
    val r = TextAnalysis.curationFunnel(docs, Seq(
      "lang_en" -> (col("lang") === "en"),
      "min_5" -> (col("n") >= 5))).orderBy("stage_idx").collect()
    assert(r.length === 2)
    assert(r(0).getLong(2) === 4L && r(0).getLong(3) === 2L && r(0).getLong(4) === 2L)
    // rows_in of stage 2 = rows_kept of stage 1; doc 2 was NOT re-tested
    assert(r(1).getLong(2) === 2L && r(1).getLong(3) === 1L && r(1).getLong(4) === 1L)
  }

  test("curationFunnel: empty input yields all-zero stage rows") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    val r = TextAnalysis.curationFunnel(docs,
      Seq("gate" -> (col("lang") === "en"))).collect()
    assert(r.length === 1)
    assert(r(0).getLong(2) === 0L && r(0).getLong(3) === 0L && r(0).getLong(4) === 0L)
  }

  test("removeBoilerplateChunks: fully-boilerplate doc reassembles to ''") {
    val docs = Seq(
      (0L, "x y"), (1L, "x y"), (2L, "x y")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.removeBoilerplateChunks(docs, chunkWords = 2, maxDocs = 3)
      .orderBy("doc_id").collect()
    assert(r.forall(_.getString(3) === ""))
    assert(r.forall(_.getInt(2) === 1))
  }
}
