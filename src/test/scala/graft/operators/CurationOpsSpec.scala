package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the round-6 curation operators — LM cross-entropy scoring,
  * RAG chunking, SemDeDup, MERGE/upsert, SCD2 — on fixtures where every
  * expected value is hand-derivable. */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  test("ngramLmScore: seen bigrams score c12/c1, unseen back off, exact sums") {
    // reference "a b a b a": uni a:3 b:2, T=5 V=2; bigrams (a,b):2 (b,a):2
    val ref = Seq((100L, "a b a b a")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "a b a"), // (a,b): ln(2/3); (b,a): ln(2/2)=0
      (1L, "c d"),   // unseen w1 -> backoff 0.4*(0+1)/7
      (2L, "a")      // < 2 tokens: no row
    ).toDF("doc_id", "text")
    val r = TextAnalysis.ngramLmScore(docs, ref).orderBy("doc_id").collect()
    assert(r.length === 2)
    def lp(s: Double): Long = math.floor(math.log(s) * 10000 + 0.5).toLong
    def ce(lps: Seq[Long]): Double =
      math.floor(-lps.sum.toDouble / lps.size + 0.5) / 10000
    assert(r(0).getLong(1) === 2L)
    assert(r(0).getDouble(2) === ce(Seq(lp(2.0 / 3), lp(1.0))))
    assert(r(1).getLong(1) === 1L)
    assert(r(1).getDouble(2) === ce(Seq(lp(0.4 * 1 / 7))))
    // the backoff doc is further from the reference LM than the seen doc
    assert(r(1).getDouble(2) > r(0).getDouble(2))
  }

  test("chunkDocs: stride windows, clipped tail, exact offsets") {
    val docs = Seq((0L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val r = TextAnalysis.chunkDocs(docs, chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
    assert(r.map(_.getString(4)).toSeq === Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(r.map(_.getInt(2)).toSeq === Seq(0, 3, 6, 9))
    assert(r.map(_.getInt(3)).toSeq === Seq(4, 4, 4, 1))
  }

  test("semanticDedup: within-cell lower-id duplicate drops, cross-cell kept") {
    // ids 1,2 are parallel vectors (cosine exactly 1.0) in the same sign
    // cell; id 3 lands in another cell and survives untouched
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.semanticDedup(emb, cellBits = 2, threshold = 0.9)
      .orderBy("vec_id").collect()
    // cells: [1,0] -> bits (1>=0, 0>=0) = 3; [-1,0.5] -> (no, yes) = 2
    assert(r.map(x => (x.getLong(0), x.getInt(1), x.getBoolean(2))).toSeq ===
      Seq((1L, 3, true), (2L, 3, false), (3L, 2, true)))
  }

  test("bpeEncode: rank priority, chained merges, all-occurrence merging") {
    import graft.functions.ArrayExprs
    val merges = Seq("a" -> "r", "t" -> "h", "ar" -> "k", "s" -> "p",
      "e" -> "r", "o" -> "w", "q" -> "u", "th" -> "e")
    val df = Seq(
      (0L, "spark"),      // a+r first (rank 0), ar+k (rank 2), s+p (rank 3)
      (1L, "the"),        // t+h then th+e: chained to one token
      (2L, "ararar xx"),  // all three (a,r) occurrences merge in one pass
      (3L, "hash")        // no merge applies
    ).toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
        ArrayExprs.bpe_encode(col("text"), merges).as("t"))
      .orderBy("doc_id").collect()
    assert(r(0).getSeq[String](1) === Seq("sp", "ark"))
    assert(r(1).getSeq[String](1) === Seq("the"))
    assert(r(2).getSeq[String](1) === Seq("ar", "ar", "ar", "x", "x"))
    assert(r(3).getSeq[String](1) === Seq("h", "a", "s", "h"))
    intercept[IllegalArgumentException] {
      ArrayExprs.bpe_encode(col("text"), Seq("a" -> "a"))
    }
  }

  test("bpeTokenize: dictionary encode + ordered per-doc reassembly") {
    val merges = Seq("a" -> "r", "s" -> "p", "ar" -> "k")
    val docs = Seq((7L, "spark spark ark")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTokenize(docs, merges).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 5L) // [sp ark] [sp ark] [ark]
    assert(r(0).getString(2) === "sp ark sp ark ark")
  }

  test("repetition_stats: fused expression is bit-identical to the HOF form") {
    import graft.functions.{ArrayExprs, TextFns, Fn}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq((90001L, ""), (90002L, "  x  "), (90003L, "a a a b"),
        (90004L, "one two")).toDF("doc_id", "text"))
    def ngrams(w: org.apache.spark.sql.Column, n: Int) =
      when(size(w) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + 1, lit(n)))))
    def dupFrac(w: org.apache.spark.sql.Column, n: Int) =
      Fn.bind(ngrams(w, n)) { g =>
        when(size(g) <= 0, 0.0).otherwise(
          floor((size(g) - size(array_distinct(g))).cast("double") /
            size(g).cast("double") * 10000 + 0.5) / 10000)
      }
    val hof = docs.select(col("doc_id"), Fn.bind(TextFns.words(col("text"))) { w =>
      struct(
        dupFrac(w, 2).as("dup_bigram"),
        dupFrac(w, 3).as("dup_trigram"),
        when(size(w) <= 0, 0.0).otherwise(
          floor(array_max(transform(array_distinct(w),
            d => size(filter(w, x => x === d)))).cast("double") /
            size(w).cast("double") * 10000 + 0.5) / 10000).as("top_word_frac"))
    }.as("r"))
    val fused = docs.select(col("doc_id"),
      ArrayExprs.repetition_stats(col("text")).as("r"))
    assert(fused.exceptAll(hof).isEmpty && hof.exceptAll(fused).isEmpty)
  }

  test("semanticDedupKmeans: exact duplicates drop, everything else survives") {
    // planted exact duplicates share their source's k-means cell by
    // construction (identical vectors, L2 argmin) and have cosine exactly
    // 1.0; the corpus' max natural pairwise cosine is 0.449, so at 0.9
    // the drop set must be EXACTLY the 30 clones
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 200).select("vec_id", "embedding")
    val clones = emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val r = Similarity.semanticDedupKmeans(emb.unionByName(clones),
        nCells = 8, iters = 3, threshold = 0.9)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r.size === 230)
    assert((0L until 30L).forall(i => !r(i + 10000)), "every clone drops")
    assert(r.count(!_._2) === 30, "nothing but the clones drops")
  }

  test("mmrRerank: diversity penalty overrides raw relevance greedily") {
    // query [1, 0.2]; c11 is most relevant, c10 nearly duplicates c11, c12
    // is orthogonal-ish: pure top-2 = (c11, c10) but MMR picks (c11, c12)
    val q = Seq((1L, Seq(1.0f, 0.2f))).toDF("vec_id", "embedding")
    val c = Seq(
      (10L, Seq(1.0f, 0.0f)),
      (11L, Seq(0.95f, 0.05f)),
      (12L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.mmrRerank(q, c, k = 2, lambda = 0.5)
      .orderBy("rnk").collect()
    assert(r.map(x => (x.getInt(2), x.getLong(1))).toSeq ===
      Seq((1, 11L), (2, 12L)))
    // rank-1 is the pure-relevance argmax by construction
    assert(r(0).getLong(3) > r(1).getLong(3))
  }

  test("mmrRerank: per-query candidate pairs keep each query inside its own pool") {
    // two queries with DISJOINT retrieved candidate lists; a shared-pool
    // run would happily hand q1 the candidate that only q2 retrieved
    // (c20 is more relevant to q1 than anything in q1's own list)
    val q = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val c = Seq(
      (10L, Seq(0.9f, 0.1f)), (11L, Seq(0.1f, 0.9f)), // q1's retrieval
      (20L, Seq(1.0f, 0.0f)), (21L, Seq(0.5f, 0.5f))  // q2's retrieval
    ).toDF("vec_id", "embedding")
    val pairs = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("qid", "cid")
    val r = Similarity.mmrRerank(q, c, k = 2, lambda = 0.5,
        candidatePairs = Some(pairs))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // every query selects exactly (and only) from its own candidate list —
    // no cross-pool pair is ever scored, so q1 cannot see c20
    assert(r === Set((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L)))

    // and the restricted run matches running each query alone on its pool
    val solo1 = Similarity.mmrRerank(q.filter(col("vec_id") === 1L),
      c.filter(col("vec_id") < 20L), k = 2, lambda = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    val both = Similarity.mmrRerank(q, c, k = 2, lambda = 0.5,
        candidatePairs = Some(pairs))
      .filter(col("qid") === 1L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(both === solo1)
  }

  test("mergeUpsert: source wins on match, both sides' unmatched survive") {
    val target = Seq(
      (1L, 10L, 1.0), (1L, 5L, 9.9), // key 1: ts 10 wins within target
      (2L, 10L, 2.0)
    ).toDF("user_id", "ts", "value")
    val source = Seq(
      (2L, 20L, 9.0), (2L, 15L, 8.8), // key 2: ts 20 wins within source
      (3L, 1L, 3.0)                   // insert (older ts than target rows!)
    ).toDF("user_id", "ts", "value")
    val r = RelationalOps.mergeUpsert(target, source, "user_id",
        Seq(col("ts").desc))
      .orderBy("user_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq ===
      Seq((1L, 10L, 1.0), (2L, 20L, 9.0), (3L, 1L, 3.0)))
  }

  test("scd2: equal-value runs compress to intervals, open run ends null") {
    val ev = Seq(
      (1L, 10L, "A", 1L), (1L, 20L, "A", 2L), (1L, 30L, "B", 3L),
      (1L, 40L, "A", 4L),
      (2L, 10L, "X", 5L)
    ).toDF("user_id", "ts", "state", "event_id")
    val r = RelationalOps.scd2(ev, "user_id", "ts", "state", "event_id")
      .orderBy("user_id", "valid_from").collect()
    assert(r.map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSeq ===
      Seq((1L, "A", 10L, 30L), (1L, "B", 30L, 40L), (1L, "A", 40L, -1L),
        (2L, "X", 10L, -1L)))
  }
}
