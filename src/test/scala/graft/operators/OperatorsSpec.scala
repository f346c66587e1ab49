package graft.operators

import graft.SparkSpec
import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Unit tests for the generic relational / dedup / similarity operators. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at-or-before each left row") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:05:00")),
      (3L, "B", ts("2024-01-01 10:01:00")),
      (4L, "B", ts("2024-01-01 09:00:00"))
    ).toDF("id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:59:00"), 10.0),
      ("A", ts("2024-01-01 10:00:00"), 11.0), // tie with trade 1 -> included
      ("A", ts("2024-01-01 10:04:00"), 12.0),
      ("B", ts("2024-01-01 10:00:00"), 20.0)
    ).toDF("sym", "t", "px")
    val r = RelationalOps.asOfJoin(trades, quotes, "sym", "t", "t",
      Seq("px" -> "last_px"))
      .select("id", "last_px").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(r(1L) == 11.0) // tie included
    assert(r(2L) == 12.0)
    assert(r(3L) == 20.0)
    assert(r(4L).isNaN)   // no quote before 09:00
  }

  test("asOfJoin carries the whole matched right ROW, including its NULLs") {
    // the latest quote has px = NULL and sz = 5: a per-column carry would
    // resurrect px = 10.0 from the older row and stitch the output from two
    // different right rows; the row contract says both values come from the
    // 10:02 row (px NULL, sz 5)
    val trades = Seq((1L, "A", ts("2024-01-01 10:03:00"))).toDF("id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:01:00"), Some(10.0), None),
      ("A", ts("2024-01-01 10:02:00"), None, Some(5L))
    ).toDF("sym", "t", "px", "sz")
    val row = RelationalOps.asOfJoin(trades, quotes, "sym", "t", "t",
      Seq("px" -> "last_px", "sz" -> "last_sz"))
      .select("id", "last_px", "last_sz").collect().head
    assert(row.getLong(0) == 1L)
    assert(row.isNullAt(1))        // the matched row's px IS null
    assert(row.getLong(2) == 5L)
  }

  test("asOfJoin directions: forward, nearest (ties backward), tolerance boundary") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:03:00")),   // back 2min, fwd 3min -> nearest=back
      (2L, "A", ts("2024-01-01 10:05:00")),   // back 4min, fwd 1min -> nearest=fwd
      (3L, "A", ts("2024-01-01 10:03:30"))    // 2.5min both ways -> tie -> back
    ).toDF("id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:01:00"), 1.0),
      ("A", ts("2024-01-01 10:06:00"), 2.0)
    ).toDF("sym", "t", "px")
    def run(dir: String, tol: Option[Long] = None): Map[Long, Option[Double]] =
      RelationalOps.asOfJoin(trades, quotes, "sym", "t", "t",
          Seq("px" -> "p"), direction = dir, toleranceSeconds = tol)
        .select("id", "p").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(run("forward") ==
      Map(1L -> Some(2.0), 2L -> Some(2.0), 3L -> Some(2.0)))
    assert(run("nearest") ==
      Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(1.0)))
    // trade 1 is exactly 120s after the 10:01 quote: tolerance is
    // inclusive at the boundary and void one second under it
    assert(run("backward", Some(120L))(1L) == Some(1.0))
    assert(run("backward", Some(119L))(1L) == None)
    // trade 2 backward distance is 240s -> voided at 120s tolerance
    assert(run("backward", Some(120L))(2L) == None)
  }

  test("rangeJoinBucketed equals the naive theta join") {
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:04:00")),
      (3L, 7L, ts("2024-01-01 10:09:59")),
      (4L, 7L, ts("2024-01-01 10:10:01")),
      (5L, 8L, ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val left = ev.select($"event_id", $"user_id", $"ts")
    val right = ev.select($"user_id", $"ts".as("ts2"))
    val bucketed = RelationalOps.rangeJoinBucketed(left, right, "user_id", "ts", "ts2", 600L)
      .select("event_id", "ts2").collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val naive = left.join(right, left("user_id") === right("user_id") &&
        $"ts2" > $"ts" && $"ts2" <= $"ts" + expr("INTERVAL 600 SECONDS"))
      .select("event_id", "ts2").collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(bucketed == naive)
    // event 1 sees 10:04 and 10:09:59 (<=10min) but NOT 10:10:01
    assert(bucketed.count(_._1 == 1L) == 2)
  }

  test("rangeJoinBucketed on TIMESTAMP_NTZ is DST fall-back safe") {
    // mirror of the RangeJoinRewrite DST regression: the residual filter
    // compares raw NTZ columns on the LOCAL number line, so buckets must be
    // computed on that same line — a pre-cast through a DST session zone
    // would put values 8s apart into buckets ~3608s apart and drop matches
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val df = (0 until 60).map(i => (i.toLong, 7L, i * 4L)).toDF("id", "k", "off")
        .withColumn("ts", expr(
          "timestampadd(SECOND, off, TIMESTAMP_NTZ'2025-11-02 01:58:00')"))
      val l = df.select($"id".as("lid"), $"k", $"off".as("loff"), $"ts")
      val r = df.select($"id".as("rid"), $"k", $"off".as("roff"), $"ts".as("ts2"))
      val got = RelationalOps.rangeJoinBucketed(l, r, "k", "ts", "ts2", 10L)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val offs = (0 until 60).map(i => (i.toLong, i * 4L))
      val expected = (for {
        (li, ls) <- offs; (ri, rs) <- offs
        if rs > ls && rs <= ls + 10
      } yield (li, ri)).toSet
      assert(got == expected,
        s"missing: ${expected -- got}; extra: ${got -- expected}")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("sessionize splits on gaps > threshold") {
    val ev = Seq(
      (7L, ts("2024-01-01 10:00:00")),
      (7L, ts("2024-01-01 10:10:00")),
      (7L, ts("2024-01-01 11:10:00")), // 1h gap -> new session
      (8L, ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "ts")
    val s = RelationalOps.sessionize(ev, "user_id", "ts", 1800L)
    val bySess = s.groupBy("user_id").agg(max("session_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySess(7L) == 2L && bySess(8L) == 1L)
  }

  test("saltedJoin equals the plain join on skewed data") {
    // 1000 rows of one hot key + a few cold keys
    val left = spark.range(1000).select(lit("hot").as("k"), col("id"))
      .union(spark.range(5).select(lit("cold").as("k"), col("id")))
    val right = Seq(("hot", 1.0), ("cold", 2.0), ("absent", 3.0)).toDF("k", "v")
    val salted = RelationalOps.saltedJoin(left, right, "k", salts = 8,
      saltFrom = col("id"))
    val plain = left.join(right, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("v")).head.getDouble(0) ==
      plain.agg(sum("v")).head.getDouble(0))
    // salt spreads the hot key across multiple salt values
    val spread = left.filter($"k" === "hot")
      .select(pmod(xxhash64($"id"), lit(8)).as("s")).distinct().count()
    assert(spread == 8)
  }

  test("dedupFirst keeps the deterministic survivor") {
    val df = Seq((1L, "x", 3.0), (2L, "x", 1.0), (3L, "y", 2.0))
      .toDF("id", "k", "v")
    val kept = RelationalOps.dedupFirst(df, Seq(col("k")), Seq(col("v"), col("id")))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L)) // min v per key
  }

  test("fused minhash_text is bit-identical to minhash over word shingles") {
    import graft.functions.ArrayExprs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "  tab\tand\nnewline\u000Bvtab\f\rseparators  collapse "),
      (3L, "short"), // fewer words than n -> empty shingle set
      (4L, "dup dup dup dup dup"), // duplicate shingles are min-idempotent
      (5L, "unicode éèê multi世界 byte words here")
    ).toDF("doc_id", "text")
    val k = 64
    val fused = docs.select(col("doc_id"),
      ArrayExprs.minhash_text(col("text"), 3, k).as("s"))
    val composed = docs.select(col("doc_id"),
      TextFns.minhashSignature(TextFns.wordShingles(col("text"), 3), k).as("s"))
    val bad = fused.as("f").join(composed.as("c"), "doc_id")
      .filter(col("f.s") =!= col("c.s")).count()
    assert(bad == 0)
  }

  test("jaccard general form deduplicates; jaccardDistinct is the fast path") {
    // raw token arrays WITH repeats: the general form must treat them as
    // sets ({a,b,c} vs {b,c,d} -> 2/4), where the distinct-only fast path
    // fed the same raw arrays would mis-score (the round-11 ADVICE trap)
    val df = Seq((Seq("a", "b", "b", "c"), Seq("b", "c", "c", "c", "d")))
      .toDF("x", "y")
      .select(TextFns.jaccard(col("x"), col("y")).as("general"),
        TextFns.jaccardDistinct(col("x"), col("y")).as("rawFast"))
    val r = df.head
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) != 0.5) // the fast path needs distinct inputs
    // on distinct inputs the two agree bit-for-bit
    val d = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(TextFns.jaccard(col("x"), col("y")),
        TextFns.jaccardDistinct(col("x"), col("y"))).head
    assert(d.getDouble(0) == d.getDouble(1))
  }

  test("minhash estimate approximates exact jaccard") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o q"), // near-dup of 1
      (3L, "z y x w v u t s r q p o n m l k")
    ).toDF("doc_id", "text")
    val withSig = docs.select(col("doc_id"),
      TextFns.wordShingles(col("text"), 3).as("sh"))
      .withColumn("sig", TextFns.minhashSignature(col("sh"), 256))
    val pairs = withSig.as("a").join(withSig.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        TextFns.jaccardDistinct(col("a.sh"), col("b.sh")).as("exact"),
        TextFns.minhashEstimate(col("a.sig"), col("b.sig")).as("est"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 0.15,
        s"pair ${r.getLong(0)}-${r.getLong(1)}: exact=${r.getDouble(2)} est=${r.getDouble(3)}")
    }
  }

  test("minhashLsh finds a planted near-duplicate") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"), // ~0.93 trigram jaccard
      (3L, (100 to 140).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhashPairs finds exact duplicates via chunk candidates") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, "entirely different content here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("simhash: identical texts collide, disjoint texts differ") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "completely different words here"))
      .toDF("id", "text")
      .select(col("id"), TextFns.simhash64(col("text")).as("s"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }

  test("minhash_union aggregate equals the signature of the union") {
    import graft.functions.MinHashUnionAgg.minhash_union
    val docs = Seq(
      (1L, "g1", "a b c d e f g h"),
      (2L, "g1", "x y z w v u t s"),
      (3L, "g2", "p q r")).toDF("id", "g", "text")
    val k = 64
    val sigs = docs.select(col("g"),
      TextFns.minhashSignature(TextFns.wordShingles(col("text"), 2), k).as("sig"))
    val grouped = sigs.groupBy("g").agg(minhash_union(col("sig"), k).as("gsig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // union signature = elementwise min of member signatures (MinHash property)
    val members = sigs.collect().map(r => r.getString(0) -> r.getSeq[Long](1))
    val expected = members.groupBy(_._1).map { case (g, ss) =>
      g -> ss.map(_._2).reduce((a, b) => a.zip(b).map(t => math.min(t._1, t._2)))
    }
    assert(grouped("g1") == expected("g1") && grouped("g2") == expected("g2"))
    // and equals the signature computed directly over the union text
    val unionSig = Seq(("u", "a b c d e f g h x y z w v u t s"))
      .toDF("g", "text")
      .select(TextFns.minhashSignature(TextFns.wordShingles(col("text"), 2), k))
      .head.getSeq[Long](0)
    // g1 docs share no 2-grams across the boundary word pair (h->x is not a
    // shingle of either doc), so union-of-sets equals the concatenated text's
    // shingles minus the bridging shingle "h x"
    val bridging = Seq(("b", "h x")).toDF("g", "text")
      .select(TextFns.minhashSignature(TextFns.wordShingles(col("text"), 2), k))
      .head.getSeq[Long](0)
    val expectedUnion = unionSig.zip(grouped("g1")).zip(bridging).collect {
      case ((u, g), b) => (u, g, b)
    }
    // every union-signature component is explained by either the group
    // signature or the bridging shingle
    assert(expectedUnion.forall { case (u, g, b) => u == math.min(g, b) })
  }

  test("cosine kNN: orthogonal vs identical vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.bruteForceKnn(vecs, vecs, 1)
      .select("vec_id", "nn_id", "sim").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(r(1L) == (3L, 1.0)) // parallel vector wins with sim 1.0
    assert(r(3L) == (1L, 1.0))
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq((1L, "the cat is on the mat and it is happy"),
      (2L, "el gato es un animal y no es feo"))
      .toDF("id", "text")
    val r = TextAnalysis.languageId(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(1L) == "en" && r(2L) == "es")
  }

  test("VectorFns.l2sq and norm") {
    val df = Seq((Array(3.0f, 4.0f), Array(0.0f, 0.0f))).toDF("a", "b")
    val r = df.select(VectorFns.norm(col("a")), VectorFns.l2sq(col("a"), col("b"))).head
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 25.0)
  }

  test("duplicateClusters labels every node with its component minimum") {
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L), (11L, 12L), (5L, 6L))
      .toDF("id_a", "id_b")
    val r = Dedup.duplicateClusters(pairs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponentsStar agrees with min-label propagation") {
    // adversarial shapes: a 30-node chain (diameter stress), a hub star
    // with the MIN at a leaf (hooking must pass through the hub), a
    // triangle with a chord, and singleton-pair components
    val chain = (100L until 129L).map(i => (i, i + 1))
    val star = Seq((50L, 40L), (50L, 41L), (50L, 42L), (50L, 7L))
    val tri = Seq((60L, 61L), (61L, 62L), (60L, 62L), (62L, 63L))
    val pairs = (chain ++ star ++ tri ++ Seq((200L, 201L)))
      .toDF("id_a", "id_b")
    val exp = Dedup.duplicateClusters(pairs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val got = Dedup.connectedComponentsStar(pairs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == exp)
    assert(got(129L) == 100L && got(50L) == 7L && got(40L) == 7L
      && got(63L) == 60L && got(201L) == 200L)
  }

  test("weightedSample is deterministic and upweights the heavy class") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val w = when(col("lang") === "en", 3).otherwise(0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, col("doc_id"), w, 60)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = ids(docs)
    assert(s1 == ids(docs.repartition(7))) // stable under partitioning
    val enShareCorpus = docs.filter(col("lang") === "en").count().toDouble / docs.count()
    val enShareSample = docs.filter(col("doc_id").isInCollection(s1))
      .filter(col("lang") === "en").count().toDouble / s1.size
    // 8x weight must clearly overrepresent the en stratum
    assert(enShareSample > enShareCorpus * 1.5,
      s"sample $enShareSample vs corpus $enShareCorpus")
  }

  test("hashSample is deterministic, near-rate and join-compatible") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val s1 = Sampling.hashSample(docs, col("doc_id"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs.repartition(7), col("doc_id"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // stable under re-partitioning (rand() sample is not)
    val n = docs.count().toDouble
    assert(s1.size > n * 0.06 && s1.size < n * 0.15, s"rate ${s1.size / n}")
    // join-compatibility: the same keys sample identically in another table
    val other = docs.select(col("doc_id"), col("lang"))
    val s3 = Sampling.hashSample(other, col("doc_id"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s3 == s1)
  }

  test("stratifiedSample returns exactly n per stratum, deterministically") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val s = Sampling.stratifiedSample(docs, Seq(col("lang")), col("doc_id"), 5)
    val perLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.values.forall(_ == 5L))
    val again = Sampling.stratifiedSample(docs, Seq(col("lang")), col("doc_id"), 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == s.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("packSequences: contiguous bins per shard, bounded offsets, stable") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .withColumn("n_tok", size(TextFns.words(col("text"))).cast("long"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(d, col("doc_id"), col("n_tok"), 512, 4)
        .select("doc_id", "seq_id", "seq_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val p = run(docs)
    assert(p.forall { case (_, _, off) => off >= 0 && off < 512 })
    // bins within each shard are contiguous from 0 (no holes in packing)
    p.groupBy(_._2 >> 20).foreach { case (_, rows) =>
      val bins = rows.map(t => t._2 & ((1L << 20) - 1)).toSet
      assert((0L to bins.max).forall(bins.contains), s"holes in $bins")
    }
    // identical assignment regardless of input partitioning
    assert(run(docs.repartition(7)).toSet == p.toSet)
  }

  test("prefixJaccardPairs = all-pairs exact at every threshold (complete)") {
    // sf0.001 slice: big enough for real shingle diversity, small enough
    // for the O(n^2) reference. Completeness of the prefix filter means
    // EXACT set equality with the verification-grade all-pairs operator.
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val ref = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == ref, s"threshold $t: prefix join lost or invented pairs")
    }
  }

  test("prefixJaccardPairs finds exact duplicates at threshold 1.0") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, base), (2L, base),
      (3L, "totally different words with no overlap at all whatsoever"),
      (4L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text")
    val pairs = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("sourceSimilarity MinHash estimate tracks the exact union Jaccard") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val est = TextAnalysis.sourceSimilarity(docs, k = 128).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val exact = TextAnalysis.sourceSimilarityExact(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.keySet == exact.keySet)
    // k=128 components -> se ~ sqrt(j(1-j)/128) <= 0.045; 0.15 is >3 sigma
    val worst = exact.map { case (k, j) => math.abs(est(k) - j) }.max
    assert(worst <= 0.15, s"minhash estimate off by $worst")
  }
}
