package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.plans.Pins.PinSyntax

/** Document-corpus analysis operators (quality scoring, language id,
  * fingerprinting, token statistics) — per-row column expressions, so they
  * scan-parallelize with no shuffle at all except where noted.
  */
object TextAnalysis {

  /** Per-document statistics: token counts, distinctness, lengths. */
  def textStats(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    docs.select(Seq(col(idCol)) ++ Seq(graft.functions.Fn.bind(TextFns.words(col(textCol))) {
      w =>
        struct(
          size(w).cast("int").as("n_tokens"),
          size(array_distinct(w)).cast("int").as("n_distinct"),
          // floor(x*1e4+0.5)/1e4 instead of round(): ratios of small ints
          // land exactly on rounding midpoints, where Spark and DuckDB
          // ROUND disagree; this idiom is bit-deterministic on both
          (floor(size(array_distinct(w)).cast("double") /
            greatest(size(w), lit(1)).cast("double") * 10000 + 0.5) / 10000).as("ttr"),
          length(col(textCol)).cast("int").as("n_chars"),
          (floor((length(col(textCol)) - (size(w) - 1)).cast("double") /
            greatest(size(w), lit(1)).cast("double") * 10000 + 0.5) / 10000)
            .as("avg_word_len"))
    }.as("__s")): _*)
      .select(col(idCol), col("__s.n_tokens"), col("__s.n_distinct"),
        col("__s.ttr"), col("__s.n_chars"), col("__s.avg_word_len"))

  /** Quality score in [0,1]: blend of length band, type-token ratio and
    * alphabetic character ratio — the usual cheap pre-filter signals for
    * training-data curation. Deterministic arithmetic only. */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    // compiled kernel (ArrayExprs.QualityScore) for the former bind body —
    // Fn.bind evaluates its whole body interpreted (the lshBands finding),
    // so the word filter/distinct/regex chain ran per row in the
    // interpreter. Same doubles: least(nTok/50, 1), distinct/greatest
    // ttr, [a-zA-Z ]-codepoint alpha ratio, (0.4*ls + 0.3*ttr) + 0.3*ar
    // (see the compute scaladoc); the midpoint-safe floor idiom stays
    // declarative here.
    docs.select(col(idCol),
      (floor(graft.functions.ArrayExprs.quality_score(col(textCol))
        * 10000 + 0.5) / 10000).as("quality"))

  /** Within-document repetition signals (the Gopher-rule family, Rae et
    * al. 2021 — public heuristics): duplicate word-bigram and -trigram
    * fractions plus the most-frequent-word fraction. Per-row column
    * expressions only — no shuffle; templated/spammy documents score
    * high and get filtered before training. Ratios use the midpoint-safe
    * floor(x*1e4+0.5)/1e4 idiom (see textStats). */
  def repetitionScores(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    // one fused tokenization+hash pass per row (ArrayExprs.RepetitionStats)
    // — bit-identical to the HOF formulation this replaced (t15's oracle
    // and CurationOpsSpec's parity test pin that), without materializing the
    // bigram/trigram arrays or running the O(distinct x n) count lambda
    docs.select(col(idCol),
        graft.functions.ArrayExprs.repetition_stats(col(textCol)).as("__r"))
      .select(col(idCol), col("__r.dup_bigram"), col("__r.dup_trigram"),
        col("__r.top_word_frac"))

  /** Benchmark decontamination: for every corpus document, the number of
    * distinct word n-gram shingles it shares with a benchmark (eval-set)
    * corpus — the overlap check run before training to drop contaminated
    * documents. Scale shape: the benchmark's distinct shingle set is tiny
    * and BROADCAST; the corpus side is one explode + broadcast hash join +
    * hash agg — the corpus never shuffles its text, only matched shingle
    * hits. Returns (doc_id, n_shared), n_shared > 0. */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleN: Int = 3): DataFrame = {
    val bench = broadcast(
      benchmark.select(explode(TextFns.wordShingles(col(textCol), shingleN)).as("__s"))
        .distinct())
    corpus
      .select(col(idCol), explode(TextFns.wordShingles(col(textCol), shingleN)).as("__s"))
      .join(bench, Seq("__s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Cross-document duplicate n-gram statistics (the occurrence-weighted
    * dedup signal of Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better" — arXiv:2107.06499): for every document, the
    * fraction of its word n-gram OCCURRENCES whose n-gram also appears in
    * at least one other document. High-fraction documents are near-copies
    * of corpus content even when no single whole-doc hash matches.
    *
    * Scale shape: per-doc occurrence counts first (one hash agg keyed on
    * (doc, digest) with map-side combine — the token stream never
    * re-shuffles), then document frequency is one more agg over the
    * already-distinct (doc, digest) rows, joined back and re-aggregated
    * per doc. The shuffle key is md5(ngram) (16 bytes), never the raw
    * n-gram string. Docs shorter than n words yield no row (no n-grams).
    *
    * @return (doc_id, n_grams, n_dup, dup_frac), floor-idiom rounding.
    */
  def crossDocNgramDup(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", n: Int = 5): DataFrame = {
    // native word_grams (repeats kept) — same split/join as the old
    // transform-over-words lambda, compiled (see dsirWeights)
    val grams = docs.select(col(idCol),
        explode(graft.functions.ArrayExprs.word_grams(col(textCol), n))
          .as("__g"))
      .select(col(idCol), md5(col("__g").cast("binary")).as("__d"))
    val perDoc = grams.groupBy(col(idCol), col("__d"))
      .agg(count(lit(1)).as("cnt"))
    val docFreq = perDoc.groupBy("__d").agg(count(lit(1)).as("ndocs"))
    perDoc.join(docFreq, Seq("__d"))
      .groupBy(col(idCol))
      .agg(
        sum("cnt").cast("long").as("n_grams"),
        sum(when(col("ndocs") > 1, col("cnt")).otherwise(lit(0L)))
          .cast("long").as("n_dup"),
        (floor(sum(when(col("ndocs") > 1, col("cnt")).otherwise(lit(0L))).cast("double") /
          sum("cnt").cast("double") * 10000 + 0.5) / 10000).as("dup_frac"))
  }

  /** Email pattern for [[piiRedact]] — deliberately RE2-compatible (no
    * backreferences, no lookaround) so Spark (java.util.regex) and the
    * DuckDB oracle (RE2) match identically. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Long digit runs (account/phone-shaped) for [[piiRedact]]. */
  val LongNumRe = "[0-9]{6,}"

  /** PII scrubbing pass for training-data curation: replaces email
    * addresses and long digit runs with typed placeholder tokens and
    * reports per-document match counts. Pure per-row regex work — scan
    * parallel, no shuffle, whole-stage codegen. */
  def piiRedact(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        LongNumRe, "<NUM>").as("redacted"),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
        .cast("int").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(LongNumRe), lit(0)))
        .cast("int").as("n_nums"))

  /** C4-style boilerplate removal (Raffel et al. 2020 drop repeated lines
    * corpus-wide): documents are segmented into fixed `chunkWords`-word
    * segments (the stand-in for lines on newline-free corpora; a real
    * corpus would segment on '\n'), any segment appearing in >= `maxDocs`
    * distinct documents is dropped, and each document is reassembled from
    * its surviving segments in original order.
    *
    * Scale shape: posexplode to (doc, pos, chunk) -> document frequency is
    * a hash agg on md5(chunk) -> join back -> per-doc rebuild via
    * collect_list of (pos, chunk) + array_sort (each doc's chunk list is
    * document-sized — bounded — never corpus-sized). Two shuffles total.
    *
    * @return (doc_id, n_chunks, n_removed, cleaned)
    */
  def removeBoilerplateChunks(docs: DataFrame, idCol: String = "doc_id",
                              textCol: String = "text", chunkWords: Int = 3,
                              maxDocs: Int = 3): DataFrame = {
    import graft.functions.Fn.bind
    val cw = chunkWords
    val chunks = docs.select(col(idCol),
      posexplode(bind(TextFns.words(col(textCol))) { w =>
        when(size(w) <= 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), ceil(size(w).cast("double") / cw).cast("int") - 1),
            i => concat_ws(" ", slice(w, i * cw + 1, lit(cw)))))
      }).as(Seq("pos", "chunk")))
    val docFreq = chunks.groupBy(md5(col("chunk").cast("binary")).as("__d"))
      .agg(count_distinct(col(idCol)).as("ndocs"))
    chunks.join(docFreq, md5(col("chunk").cast("binary")) === col("__d"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_chunks"),
        sum(when(col("ndocs") >= maxDocs, 1).otherwise(0))
          .cast("int").as("n_removed"),
        array_join(transform(
          array_sort(collect_list(
            when(col("ndocs") < maxDocs, struct(col("pos"), col("chunk"))))),
          s => s.getField("chunk")), " ").as("cleaned"))
  }

  /** Language identification via stopword-hit heuristic. */
  def languageId(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TextFns.langId(col(textCol)).as("pred_lang"))

  /** Content fingerprints: md5 of normalized text (oracle-checkable) plus
    * the polynomial rolling hash (engine-native). */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      md5(lower(col(textCol)).cast("binary")).as("fp_md5"),
      TextFns.rollingFingerprint(col(textCol)).as("fp_roll"))

  /** BM25 retrieval scoring (Robertson/Sparck Jones; the Lucene idf form
    * ln(1 + (N - df + 0.5)/(df + 0.5))) of every document against a fixed
    * term set — the standard lexical-search / data-curation ranking
    * signal. Per-term scores are rounded to 4 decimals BEFORE the per-doc
    * sum so cross-engine float-summation order cannot flip ranks (the
    * tfIdf rule), and the final ordering ties on doc id.
    *
    * Scale shape: the token stream is filtered to the (tiny, broadcast
    * literal) term set at the scan, so the tf aggregation shuffles only
    * matching tokens; df derives from tf (one more tiny agg — the t07
    * derivation); dl/avgdl are exact integer sums in double. Only docs
    * containing at least one term produce a row.
    *
    * @return (doc_id, bm25) top-`topK` by (bm25 desc, doc_id).
    */
  def bm25(docs: DataFrame, terms: Seq[String], topK: Int = 20,
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val stats = docs.select(col(idCol),
      size(TextFns.words(col(textCol))).cast("double").as("dl"))
    val g = stats.agg(count(lit(1)).cast("double").as("n"),
      avg("dl").as("avgdl")).head()
    val (nDocs, avgdl) = (g.getDouble(0), g.getDouble(1))
    val tf = docs.select(col(idCol),
        explode(TextFns.words(col(textCol))).as("word"))
      .filter(col("word").isin(terms: _*))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("word").agg(count(lit(1)).as("df"))
    tf.join(dfT, Seq("word")).join(stats, Seq(idCol))
      .withColumn("s", round(
        log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))), 4))
      .groupBy(col(idCol))
      .agg(round(sum(col("s")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** Bigram language-model cross-entropy scoring — the CCNet-style
    * in-domain quality signal (Wenzek et al. 2020 score documents by the
    * perplexity of a reference-corpus LM; low = in-domain). The LM is a
    * Stupid-Backoff bigram model (Brants et al. 2007): seen bigram scores
    * c12/c1, otherwise alpha * (c2 + 1)/(T + V) (add-one unigram backoff,
    * so unseen words stay finite).
    *
    * Determinism: each bigram's ln-score is rounded to 4 decimals and
    * summed as a SCALED BIGINT (the d14 integer trick), so the per-doc sum
    * is exact and order-independent across engines and partitionings;
    * cross_entropy = -mean, floor-idiom rounded.
    *
    * Scale shape: LM training is two hash aggs over the reference token /
    * bigram stream; scoring reduces each doc to distinct (doc, w1, w2)
    * counts first (tokens never re-shuffle), then equi-joins the count
    * tables on their word keys — vocabulary-sized sides are NEVER
    * broadcast or collected (T and V are the only driver scalars).
    *
    * @return (doc_id, n_bigrams, cross_entropy); docs with < 2 tokens
    *         yield no row
    */
  def ngramLmScore(docs: DataFrame, reference: DataFrame, alpha: Double = 0.4,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // native word_grams + a split at the single joining space (words are
    // \s+-split, so they contain no whitespace — substring_index is an
    // exact inverse for n=2). Replaces the interpreted transform lambda
    // building per-bigram structs (the r21 t27 gram-stage finding).
    def bigrams(df: DataFrame, keep: Seq[org.apache.spark.sql.Column]) =
      df.select(keep :+ explode(
          graft.functions.ArrayExprs.word_grams(col(textCol), 2)).as("__g"): _*)
        .select(keep ++ Seq(
          substring_index(col("__g"), " ", 1).as("w1"),
          substring_index(col("__g"), " ", -1).as("w2")): _*)
    val refTokens = reference.select(
      explode(TextFns.words(col(textCol))).as("w"))
    val uni = refTokens.groupBy("w").agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum("c").as("t"), count(lit(1)).as("v")).head()
    val (bigT, bigV) = (totals.getLong(0), totals.getLong(1))
    val big = bigrams(reference, Seq.empty)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val docBig = bigrams(docs, Seq(col(idCol)))
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
    val scored = docBig
      .join(big, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"), "left")
      .withColumn("__s",
        when(col("c12").isNotNull,
          col("c12").cast("double") / col("c1").cast("double"))
          .otherwise(lit(alpha) * (coalesce(col("c2"), lit(0L)) + lit(1L))
            .cast("double") / lit((bigT + bigV).toDouble)))
      .withColumn("__lp", floor(log(col("__s")) * 10000 + 0.5).cast("long"))
    scored.groupBy(col(idCol))
      .agg(sum("cnt").cast("long").as("n_bigrams"),
        (floor(-sum(col("__lp") * col("cnt")).cast("double") /
          sum("cnt").cast("double") + 0.5) / 10000).as("cross_entropy"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169 —
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document by how much more likely its hashed-bigram
    * features are under a TARGET slice of the corpus than under the raw
    * corpus. log w(doc) = Σ_b count_doc(b)·[ln p̂_t(b) − ln p̂_r(b)] with
    * add-1 smoothing over `buckets` hashed feature buckets; resampling
    * by these weights tilts a web-scale corpus toward the target domain.
    *
    * Scale shape: ONE gram scan feeds both distributions (the target is
    * a flag, not a second pass); bucket log-ratios live in a table of at
    * most `buckets` rows — broadcast to the per-document join regardless
    * of corpus size; the ONLY corpus-scale shuffle is the (doc, bucket)
    * hash agg (bucket and corpus totals reduce from it in-plan; nothing
    * touches the driver). Per-bucket ratios take two
    * separate ln()s of double divisions — never an integer cross-product
    * numerator, which would overflow Long once ct·R passes 2^63 (real at
    * corpus scale). Log terms are scaled-BIGINT (floor(x·1e4+0.5)) so
    * the per-document sum is order-independent and oracle-exact.
    *
    * @param isTarget boolean column marking the target-domain rows
    * @return (doc_id, n_feats, log_w) — log_w is the scaled-BIGINT log
    *         importance weight; docs with <2 words have no features and
    *         yield no row (as in ngramLmScore)
    */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int = 1024,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0, "dsirWeights: buckets must be positive")
    // native word_grams (all bigrams, repeats kept) — same split and
    // single-space join as the old transform-over-words lambda, minus the
    // interpreted per-element HOF evaluation (r21 t27 profile: the gram
    // stage was 1.2s single-task at sf0.1, dominated by the lambda chain)
    val grams = docs.select(col(idCol), isTarget.as("__t"),
        explode(graft.functions.ArrayExprs.word_grams(col(textCol), 2))
          .as("__g"))
      .select(col(idCol), col("__t"),
        pmod(Sampling.keyHash(col("__g")), lit(buckets.toLong)).as("__b"))
    // ONE corpus-scale scan and shuffle: the (doc, bucket) counts,
    // materialized (localCheckpoint) because BOTH the ratio table and
    // the per-document side consume them — ReuseExchange does not fire
    // across the broadcast boundary (measured: 3 scans without this),
    // and re-running the gram explode is the expensive path at scale.
    // Bucket totals and corpus totals reduce FROM the materialized
    // counts (__t is constant per doc, so grouping by it is free) as
    // <= buckets-row / 1-row broadcasts — nothing touches the driver.
    val docBucket = grams.groupBy(col(idCol), col("__t"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .pinned
    val bucketCounts = docBucket.groupBy("__b").agg(
      sum("__cnt").as("__cr"),
      sum(when(col("__t"), col("__cnt")).otherwise(lit(0L))).as("__ct"))
      .pinned
    val totals = bucketCounts.agg(
      coalesce(sum("__cr"), lit(0L)).as("__rt"),
      coalesce(sum("__ct"), lit(0L)).as("__tt"))
    val lw = bucketCounts.crossJoin(broadcast(totals)).select(col("__b"),
      floor((log((col("__ct") + 1L).cast("double") /
               (col("__tt") + buckets).cast("double")) -
             log((col("__cr") + 1L).cast("double") /
               (col("__rt") + buckets).cast("double")))
        * 10000 + 0.5).cast("long").as("__lw"))
    docBucket.join(broadcast(lw), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum("__cnt").cast("long").as("n_feats"),
        sum(col("__cnt") * col("__lw")).cast("long").as("log_w"))
  }

  /** Overlapping token-window chunking — the RAG / context-packing
    * segmentation step: windows of `chunkTokens` tokens starting every
    * `chunkTokens - overlap` tokens (every start k*stride < n_tokens; the
    * final window may be shorter). Pure per-row array expressions then one
    * explode — scan-parallel, zero shuffle.
    *
    * @return (doc_id, chunk_idx, start_tok, n_tokens, chunk)
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 32, overlap: Int = 8,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"chunkDocs: need 0 <= overlap < chunkTokens, got $overlap/$chunkTokens")
    val stride = chunkTokens - overlap
    import graft.functions.Fn.bind
    docs.select(col(idCol),
        posexplode(bind(TextFns.words(col(textCol))) { w =>
          when(size(w) <= 0, array().cast("array<array<string>>"))
            .otherwise(transform(
              sequence(lit(0), floor((size(w) - 1).cast("double") / stride).cast("int")),
              k => slice(w, k * stride + 1, lit(chunkTokens))))
        }).as(Seq("chunk_idx", "__w")))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("int").as("start_tok"),
        size(col("__w")).cast("int").as("n_tokens"),
        concat_ws(" ", col("__w")).as("chunk"))
  }

  /** Dictionary-based BPE tokenization (Sennrich et al. 2016): the ranked
    * merge table is applied per DISTINCT word by the native BpeEncode
    * expression, then joined back to the occurrence stream and reassembled
    * per document in original order — at 100 TB the BPE loop runs once per
    * vocabulary entry, not once per token occurrence, and the join-back is
    * a plain equi join on word (vocabulary-sized side, AQE picks the
    * strategy; never collected).
    *
    * @return (doc_id, n_bpe, toks) — total BPE token count and the
    *         space-joined token stream; empty docs yield no row
    */
  def bpeTokenize(docs: DataFrame, merges: Seq[(String, String)],
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol),
      posexplode(TextFns.words(col(textCol))).as(Seq("pos", "word")))
    val dict = words.select("word").distinct()
      .withColumn("toks",
        graft.functions.ArrayExprs.bpe_encode(col("word"), merges))
    words.join(dict, Seq("word"))
      .groupBy(col(idCol))
      .agg(
        sum(size(col("toks"))).cast("long").as("n_bpe"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("toks")))),
          s => s.getField("toks"))), " ").as("toks"))
  }

  /** BPE tokenizer TRAINING (Sennrich et al. 2016) — the learning half of
    * [[bpeTokenize]]: `rounds` merge rounds, each choosing the most
    * frequent adjacent token pair (ties broken lexicographically) over
    * the corpus word-frequency table and merging every occurrence. Pairs
    * with left == right are excluded — the same x != y contract
    * [[graft.functions.ArrayExprs.BpeEncode]] asserts, which makes every
    * occurrence of the chosen pair disjoint BY CONSTRUCTION (an
    * occurrence at i would need toks(i)=b=a at i-1 to overlap), so merge
    * application is a position-independent map, not a left-to-right
    * fold — the property that lets an external engine replay training
    * bit-for-bit and lets the learned table feed BpeEncode unchanged.
    *
    * Scale shape: ONE corpus scan builds (word, freq); every round after
    * that runs on the DISTINCT-WORD table (vocabulary-scale, like
    * [[bpeTokenize]]'s application loop). The chosen pair is a 1-row
    * broadcast, never driver state; each round's state is
    * localCheckpoint'ed so lineage stays flat across rounds.
    *
    * @return (merge_rank, lhs, rhs, pair_count) — the learned merge table
    */
  def bpeTrain(docs: DataFrame, rounds: Int,
               textCol: String = "text"): DataFrame = {
    require(rounds >= 1, "bpeTrain: rounds must be >= 1")
    val toksOf = (w: Column) => filter(split(w, ""), t => t =!= "")
    val s0 = docs
      .select(explode(TextFns.words(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__freq"))
      .select(col("__w"), col("__freq"), toksOf(col("__w")).as("__toks"))
      .pinned
    val (_, merges) = (1 to rounds).foldLeft((s0, Seq.empty[DataFrame])) {
      case ((state, acc), r) =>
        val best = state
          .select(col("__freq"),
            explode(when(size(col("__toks")) < 2,
                array().cast("array<struct<a:string,b:string>>"))
              .otherwise(transform(sequence(lit(1), size(col("__toks")) - 1),
                i => struct(element_at(col("__toks"), i).as("a"),
                  element_at(col("__toks"), i + 1).as("b"))))).as("__p"))
          .filter(col("__p.a") =!= col("__p.b"))
          .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
          .agg(sum("__freq").as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
          .pinned
        val next = state.crossJoin(broadcast(best))
          .select(col("__w"), col("__freq"),
            filter(transform(sequence(lit(1), size(col("__toks"))), i =>
              when(i < size(col("__toks")) &&
                   element_at(col("__toks"), i) === col("a") &&
                   element_at(col("__toks"), i + 1) === col("b"),
                concat(element_at(col("__toks"), i),
                  element_at(col("__toks"), i + 1)))
              .when(i > lit(1) &&
                   element_at(col("__toks"), i) === col("b") &&
                   element_at(col("__toks"), i - 1) === col("a"),
                lit(null).cast("string"))
              .otherwise(element_at(col("__toks"), i))),
              t => t.isNotNull).as("__toks"))
          .pinned
        (next, acc :+ best.select(lit(r).as("merge_rank"),
          col("a").as("lhs"), col("b").as("rhs"),
          col("cnt").cast("long").as("pair_count")))
    }
    merges.reduce(_ unionByName _)
  }

  /** Multi-query BM25 retrieval: [[bm25]] generalized to a query TABLE —
    * the retrieval join a search/RAG pipeline runs per batch of queries.
    * One corpus scan builds tf over the union of all query terms; df/dl/
    * avgdl follow t19's exact arithmetic (per-term rounding before the
    * per-(query, doc) sum); the query-term table is tiny and broadcast;
    * ranking is a top-k window per query with ties on doc id.
    *
    * Scale shape: the corpus token stream is filtered to the union term
    * set AT THE SCAN, so tf's shuffle carries only matching tokens; the
    * per-query fan-out joins tf to the broadcast query-term table — rows
    * scale with (matching tokens x queries containing the term), never
    * with the corpus.
    *
    * @return (query_id, doc_id, bm25, rnk) top-`topK` per query
    */
  def bm25Retrieve(docs: DataFrame, queries: Seq[(String, Seq[String])],
                   topK: Int = 5, k1: Double = 1.2, b: Double = 0.75,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = broadcast(
      queries.flatMap { case (q, ws) => ws.map(q -> _) }.toDF("query_id", "word"))
    val terms = queries.flatMap(_._2).distinct
    val stats = docs.select(col(idCol),
      size(TextFns.words(col(textCol))).cast("double").as("dl"))
    val g = stats.agg(count(lit(1)).cast("double").as("n"),
      avg("dl").as("avgdl")).head()
    val (nDocs, avgdl) = (g.getDouble(0), g.getDouble(1))
    val tf = docs.select(col(idCol),
        explode(TextFns.words(col(textCol))).as("word"))
      .filter(col("word").isin(terms: _*))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfT, Seq("word")).join(stats, Seq(idCol))
      .join(qt, Seq("word"))
      .withColumn("s", round(
        log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))), 4))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("s")), 4).as("bm25"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("bm25").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col(idCol), col("bm25"), col("rnk").cast("int").as("rnk"))
  }

  /** Count-Min sketch frequency estimates (Cormode & Muthukrishnan 2005)
    * in the RELATIONAL formulation: the sketch IS a (depth x width)
    * counters table — counter(i, b) = total occurrences of tokens hashing
    * to bucket b at depth i — and est(w) = min over depths of the counter
    * at w's bucket. Bucket hashes are md5-derived (the t10 portable-hash
    * contract), so the WHOLE sketch — including its collision
    * overcounts — is deterministic and independently re-derivable by the
    * SQL oracle: est >= true always, equality exactly when some depth is
    * collision-free for that word.
    *
    * Scale shape: one token-stream agg keyed on (depth, bucket) — the
    * shuffle domain is bounded by depth x width REGARDLESS of corpus
    * size or vocabulary (the sketch property); the estimate join touches
    * only queried words' buckets.
    *
    * @return (word, est, cnt) for the corpus vocabulary — est the CMS
    *         estimate, cnt the true count
    */
  def countMinEstimates(docs: DataFrame, depth: Int = 3, width: Int = 64,
                        textCol: String = "text"): DataFrame = {
    def bucket(i: Int, c: Column): Column =
      pmod(conv(substring(md5(concat(lit(i.toString), lit(":"), c)
        .cast("binary")), 1, 15), 16, 10).cast("long"), lit(width.toLong))
    val tokens = docs.select(explode(TextFns.words(col(textCol))).as("word"))
    val truth = tokens.groupBy("word").agg(count(lit(1)).as("cnt"))
    val rows = tokens.select(col("word"),
      explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"), bucket(i, col("word")).as("b"))): _*)).as("h"))
    val counters = rows.groupBy(col("h.i").as("i"), col("h.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val probes = truth.select(col("word"), col("cnt"),
      explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"), bucket(i, col("word")).as("b"))): _*)).as("h"))
    probes.join(counters, col("h.i") === col("i") && col("h.b") === col("b"))
      .groupBy(col("word"), col("cnt"))
      .agg(min(col("c")).as("est"))
      .select(col("word"), col("est"), col("cnt"))
  }

  /** Corpus-level word frequency: explode + hash aggregate (one shuffle on
    * word; the classic map-side-combine friendly shape). */
  def wordFrequency(docs: DataFrame, textCol: String = "text",
                    topN: Int = 20): DataFrame =
    docs.select(explode(TextFns.words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(topN)

  /** PMI collocation mining: the corpus's top-k adjacent word pairs by
    * pointwise mutual information over the bigram sample space —
    * PMI(a,b) = ln( p(a,b) / (p(a,·)·p(·,b)) ) with all three
    * probabilities estimated from bigram counts, reported as a
    * scaled-BIGINT (floor(x·1e4+0.5), the dsirWeights convention) so
    * ranking and output are oracle-exact; the inner ratio is a pure
    * IEEE double multiply/divide, never an integer cross-product that
    * would overflow Long at corpus scale.
    *
    * Scale shape: ONE bigram explode + hash agg is the only corpus-scale
    * shuffle; the marginals and the total are all derived FROM the
    * aggregated pair table (the tfIdf df-from-tf rule), which is
    * localCheckpoint-pinned so the corpus scan runs once, not four
    * times. The min-count filter prunes the pair table BEFORE the
    * marginal joins, and the total rides in as a broadcast scalar. Top-k
    * by (pmi, w1, w2) via orderBy+limit = TakeOrdered, no global sort.
    *
    * @return (w1, w2, n2, pmi_scaled) — the `topK` pairs with
    *         n2 >= minCount, strongest PMI first at equal PMI ordered by
    *         (w1, w2)
    */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5, topK: Int = 20,
                      textCol: String = "text"): DataFrame = {
    // native word_grams + substring_index split (see ngramLmScore — words
    // contain no whitespace, so the single-space split is exact for n=2)
    val bg = docs.select(explode(
        graft.functions.ArrayExprs.word_grams(col(textCol), 2)).as("__g"))
      .select(substring_index(col("__g"), " ", 1).as("w1"),
        substring_index(col("__g"), " ", -1).as("w2"))
    val n2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
      .pinned
    val m1 = n2.groupBy("w1").agg(sum("n2").as("c1"))
    val m2 = n2.groupBy("w2").agg(sum("n2").as("c2"))
    val t = n2.agg(sum("n2").as("t"))
    n2.filter(col("n2") >= minCount)
      .join(m1, Seq("w1")).join(m2, Seq("w2"))
      .crossJoin(broadcast(t))
      .withColumn("pmi_scaled", floor(
        log((col("n2").cast("double") * col("t").cast("double")) /
            (col("c1").cast("double") * col("c2").cast("double"))) * 10000
          + 0.5).cast("long"))
      .orderBy(col("pmi_scaled").desc, col("w1"), col("w2"))
      .limit(topK)
      .select("w1", "w2", "n2", "pmi_scaled")
  }

  /** TF-IDF top-k terms per document. Two hash aggregations (term
    * frequency per doc, document frequency per term) joined on word;
    * ranking on the ROUNDED score so cross-engine float noise cannot flip
    * ranks. The tf-df join is deliberately NOT broadcast-hinted: a 100 TB
    * corpus vocabulary doesn't fit an executor — AQE picks broadcast at
    * small scale and sort-merge at large on its own. */
  def tfIdf(docs: DataFrame, topK: Int, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val n = docs.count()
    val words = docs.select(col(idCol), explode(TextFns.words(col(textCol))).as("word"))
    val tf = words.groupBy(idCol, "word").agg(count(lit(1)).as("tf"))
    // document frequency DERIVED from tf: tf's grouping already reduced the
    // corpus to distinct (doc, word) rows, so df is one more tiny hash agg —
    // not a second explode + distinct over the full token stream
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("word"))
      .withColumn("tfidf", round(col("tf") * log(lit(n.toDouble) / col("df")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("word"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col(idCol), col("word"), col("tfidf"), col("rn").as("rnk"))
  }

  /** Per-source union MinHash signatures + pairwise estimated Jaccard of
    * the full shingle-set unions — corpus-level similarity without
    * materializing any union (MinHashUnionAgg). */
  def sourceSimilarity(docs: DataFrame, groupCol: String = "source",
                       textCol: String = "text", k: Int = 128): DataFrame = {
    import graft.functions.MinHashUnionAgg.minhash_union
    val sigs = docs
      .select(col(groupCol),
        graft.functions.ArrayExprs.minhash_text(col(textCol), 3, k).as("sig"))
      .groupBy(groupCol)
      .agg(minhash_union(col("sig"), k).as("gsig"))
    sigs.as("a").join(sigs.as("b"), col(s"a.$groupCol") < col(s"b.$groupCol"))
      .select(col(s"a.$groupCol").as("src_a"), col(s"b.$groupCol").as("src_b"),
        round(TextFns.minhashEstimate(col("a.gsig"), col("b.gsig")), 4).as("est_jaccard"))
  }

  /** Portable-hash MinHash twin of [[sourceSimilarity]] (round-18 verdict
    * task 6): the same estimator — per-group union-MinHash signatures,
    * pairwise matching-lane fraction — computed with hash lanes any
    * engine can re-derive (lane i of shingle s = first 15 hex chars of
    * md5("i:s") as a 60-bit bigint, the t10/t12 portable-hash idiom), so
    * the ESTIMATE itself is DuckDB-certifiable bit-for-bit, not just the
    * exact quantity it approximates ([[sourceSimilarityExact]] / t09).
    * Distinct (group, shingle) rows explode k lane rows each before the
    * per-(group, lane) min aggregation — a k-fold stream the production
    * [[sourceSimilarity]] avoids by computing all lanes in-row inside one
    * native expression; this twin is the certification path (the x12–x17
    * pattern), priced for gate scales, while the fused operator remains
    * the 100 TB path. Signature join is group-level (|groups| x k rows) —
    * tiny at any corpus size. */
  def sourceSimilarityPortable(docs: DataFrame, groupCol: String = "source",
                               textCol: String = "text", n: Int = 3,
                               k: Int = 32): DataFrame = {
    val sh = docs.select(col(groupCol).as("src"),
        explode(TextFns.wordShingles(col(textCol), n)).as("sh"))
      .distinct()
    val lanes = sh.select(col("src"), col("sh"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .withColumn("h", conv(substring(md5(concat(col("i").cast("string"),
        lit(":"), col("sh"))), 1, 15), 16, 10).cast("long"))
    val sig = lanes.groupBy("src", "i").agg(min("h").as("mh"))
    sig.as("a").join(sig.as("b"),
        col("a.i") === col("b.i") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(sum(when(col("a.mh") === col("b.mh"), 1L).otherwise(0L)).as("m"))
      .select(col("src_a"), col("src_b"),
        (floor(col("m") / lit(k.toDouble) * 10000 + 0.5) / 10000)
          .as("est_jaccard"))
  }

  /** EXACT pairwise Jaccard of the per-source shingle-set unions — the
    * quantity [[sourceSimilarity]] estimates. Inverted-index shape: explode
    * to distinct (source, shingle) rows, equi-join on shingle for
    * intersection counts (a hash join that scales — never an all-pairs
    * cross join on documents), then a tiny source-level pair join fills in
    * zero-intersection pairs. floor-idiom rounding: jaccard is an integer
    * ratio, which lands on ROUND midpoints where engines disagree. */
  def sourceSimilarityExact(docs: DataFrame, groupCol: String = "source",
                            textCol: String = "text", n: Int = 3): DataFrame = {
    val sh = docs.select(col(groupCol).as("src"),
        explode(TextFns.wordShingles(col(textCol), n)).as("sh"))
      .distinct()
    val sizes = sh.groupBy("src").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("ni"))
    val pairs = sizes.as("x").join(sizes.as("y"), col("x.src") < col("y.src"))
      .select(col("x.src").as("src_a"), col("y.src").as("src_b"),
        col("x.sz").as("sza"), col("y.sz").as("szb"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("ni", coalesce(col("ni"), lit(0L)))
      .select(col("src_a"), col("src_b"),
        (floor(col("ni") / (col("sza") + col("szb") - col("ni")) * 10000 + 0.5) / 10000)
          .as("jaccard"))
  }

  /** Single-scan curation-funnel report: per-stage kept/dropped accounting
    * for a sequential hygiene pipeline — the audit artifact of a corpus
    * curation run ("what did each filter drop?"). Every stage predicate
    * is evaluated as a flag column in ONE corpus pass; the funnel
    * semantics (a doc reaches stage i only by passing stages 1..i-1) is a
    * cumulative AND over the flags inside a single tiny aggregation — so
    * the report costs one scan REGARDLESS of stage count, where the naive
    * per-stage `.count()` loop rescans the corpus S times. NULL
    * predicates count as failed (dropped), never silently pass.
    *
    * @param stages (name, predicate) in pipeline order
    * @return (stage_idx, stage, rows_in, rows_kept, rows_dropped), one
    *         row per stage; rows_in of stage i+1 = rows_kept of stage i
    */
  def curationFunnel(docs: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "curationFunnel: need at least one stage")
    val flagged = docs.select(stages.zipWithIndex.map { case ((_, p), i) =>
      coalesce(p.cast("boolean"), lit(false)).as(s"__p$i")
    }: _*)
    def reach(i: Int): Column =
      if (i == 0) lit(true)
      else (0 until i).map(j => col(s"__p$j")).reduce(_ && _)
    val aggs = stages.indices.flatMap { i =>
      Seq(sum(when(reach(i), 1L).otherwise(0L)).as(s"__in$i"),
        sum(when(reach(i) && col(s"__p$i"), 1L).otherwise(0L)).as(s"__kept$i"))
    }
    flagged.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(stages.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(i).as("stage_idx"), lit(name).as("stage"),
          coalesce(col(s"__in$i"), lit(0L)).as("rows_in"),
          coalesce(col(s"__kept$i"), lit(0L)).as("rows_kept"),
          coalesce(col(s"__in$i") - col(s"__kept$i"), lit(0L)).as("rows_dropped"))
      }: _*)).as("__s"))
      .select(col("__s.*"))
  }

  /** Linear text-classifier INFERENCE, fasttext-shaped (Joulin et al.
    * 2016, arXiv:1607.01759 — bag of hashed word features against a
    * weight vector): each word hashes into one of `dim` feature buckets
    * via the md5-portable 60-bit hash, the (bucket, weight) table is
    * BROADCAST-joined (a classifier fits in memory by definition — dim
    * counts in the millions are still megabytes), and the document score
    * is the per-doc weight sum. The whole pass is one explode, one
    * broadcast hash join, one hash agg keyed by doc id: scan-side
    * inference whose only shuffle carries (doc_id, partial sum) — the
    * shape a quality-filter pass over 100 TB needs.
    *
    * Weights are INTEGER (quantized — standard for shipped linear
    * models), so the score is bit-exact cross-engine and thresholding
    * needs no float comparison; the linear score is monotone in the
    * sigmoid probability, so `keep = score_sum >= threshold` IS the
    * probability cutoff.
    *
    * The weight table may be SPARSE: a bucket absent from `weights`
    * contributes weight 0 (LEFT join + coalesce), and the word still
    * counts toward `n_words` — a doc whose words all miss scores 0
    * rather than vanishing from the output (round-7's inner join
    * silently dropped both).
    *
    * @param weights (bucket: long, weight: long), at most one row per
    *                bucket; missing buckets read as weight 0
    * @return (idCol, score_sum, n_words, keep)
    */
  def linearClassify(docs: DataFrame, weights: DataFrame, dim: Int,
                     threshold: Long = 0L, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(TextFns.words(col(textCol))).as("__w"))
      .withColumn("bucket", pmod(Sampling.keyHash(col("__w")), lit(dim.toLong)))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("weight"), lit(0L))).as("score_sum"),
        count(lit(1)).as("n_words"))
      .withColumn("keep", col("score_sum") >= threshold)
}
