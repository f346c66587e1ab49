package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, RelationalOps}
import graft.queries.Catalog.QueryDef

/** Round-11 additions: the bounded-recursion class expressed through the
  * SQL front-end (Spark 4.1's WITH RECURSIVE — q69 shares d24's graph and
  * certifies the recursive-CTE execution path against the same DuckDB
  * fixpoint), the PRODUCTION Z-order write (q70: the layout q64 only
  * audited), and catalog wiring for the two previously-untested operators
  * (d26 sorted-neighborhood dedup, q71 OHLC downsampling).
  */
object R11 {

  /** q69: d24's 3-hop multi-source reachability, written as WITH
    * RECURSIVE through spark.sql — the front-end a SQL user would reach
    * for. Per-level DISTINCT keeps each iteration at most |V| rows (the
    * scalable BFS shape, not path enumeration); Spark 4.1 supports only
    * UNION ALL recursion, so the level-set dedup + final MIN(hops) does
    * the fixpoint's work, identically on both engines. d24's
    * driver-coordinated frontier loop (checkpointed edges, settled-set
    * anti-join) remains the 100 TB path; this certifies the SQL surface
    * against the same oracle shape. */
  private val q69 = QueryDef("q69_recursive_sql",
    (s, d) => {
      // raise the recursion SAFETY VALVE: the walk's cumulative row count
      // legitimately passes the 1M default at sf>=1 (level sets are
      // |V|-bounded, but V itself is millions). Monotone guardrail, not
      // semantics. The limit is read at EXECUTION, so the builder forces
      // the (bounded, ordered) recursion eagerly via localCheckpoint and
      // restores the conf in a finally — the raised valve never outlives
      // this build (s22's state-store-provider pattern; HygieneSpec pins
      // the restore).
      val conf = "spark.sql.cteRecursionRowLimit"
      val prev = s.conf.getOption(conf)
      s.conf.set(conf, "200000000")
      try {
        // Pin the edge relation ONCE (d24's "edges checkpointed" rule
        // applied to the SQL front-end): a plain CTE is inlined into the
        // recursive step, so `dir` as a CTE would re-scan lineitem and
        // re-run the DISTINCT shuffle on EVERY iteration — 4x the dominant
        // cost. Built eagerly here and registered as the view the
        // recursion joins, each iteration reads the materialized blocks.
        val e0 = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("a"),
            (lit(1000000000L) + col("l_partkey")).as("b"))
          .distinct()
        // mirror via explode (Graph.mirror): ONE distinct feeds both
        // directions — the union-of-two-projections form re-ran the
        // lineitem scan + distinct once per branch (r21 d28 profile).
        // Pins.pin (block-truth leaf stats), not bare localCheckpoint:
        // the explode's origin-plan estimate would otherwise trip the
        // sizing rule's activation band (SizingFlatAtGateSpec). A
        // columnar-cache pin was ALSO measured here (r21): the recursion
        // re-plans the step against the InMemoryRelation per level and
        // the wall DOUBLED (6.7s vs 3.2s best-of-3) — the row-block
        // checkpoint leaf stays.
        val dir = graft.plans.Pins.pin(graft.operators.Graph.mirror(
          e0.select(col("a").as("src"), col("b").as("dst"))))
        Catalog.scopedSql(s,
        Seq("graft_q69_dir" -> dir,
          "graft_q69_orders" -> Tables.orders(s, d)),
        """WITH RECURSIVE
           seeds AS (SELECT o_orderkey AS id FROM graft_q69_orders
                     WHERE o_totalprice > 495000),
           walk(id, hops) AS (
             SELECT id, 0 FROM seeds
             UNION ALL
             SELECT DISTINCT d.dst, w.hops + 1 FROM walk w
             JOIN graft_q69_dir d ON d.src = w.id WHERE w.hops < 3)
           SELECT id, CAST(MIN(hops) AS INT) AS hops FROM walk
           GROUP BY id ORDER BY id""").localCheckpoint(true)
      } finally prev match {
        case Some(p) => s.conf.set(conf, p)
        case None => s.conf.unset(conf)
      }
    },
    Some("""WITH RECURSIVE
            e0 AS (SELECT DISTINCT l_orderkey AS a,
                     1000000000 + l_partkey AS b FROM lineitem),
            dir AS (SELECT a AS src, b AS dst FROM e0
                    UNION ALL SELECT b, a FROM e0),
            seeds AS (SELECT o_orderkey AS id FROM orders
                      WHERE o_totalprice > 495000),
            walk(id, hops) AS (
              SELECT id, 0 FROM seeds
              UNION ALL
              SELECT DISTINCT dir.dst, w.hops + 1 FROM walk w
              JOIN dir ON dir.src = w.id WHERE w.hops < 3)
            SELECT id, CAST(MIN(hops) AS INT) AS hops FROM walk
            GROUP BY id ORDER BY id"""), bench = true)

  /** q70: the PRODUCTION Z-order write (Layout.zorderWrite — q64 audits
    * this clustering, this query actually writes it): events
    * range-partitioned + sorted on the Morton key of (user_id,
    * floor(value)), written to parquet, read back. The oracle certifies
    * ROW-LEVEL ROUND-TRIP FIDELITY — every row survives the clustered
    * write bit-exactly; LayoutSpec pins the layout quality itself
    * (per-file bounding boxes, row-group pruning), which is engine-layout
    * territory no cross-engine oracle can see. Staging dir is removed
    * before returning (read-back pinned to executor storage). */
  private val q70 = QueryDef("q70_zorder_write",
    (s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_q70_")
      graft.operators.Layout.zorderWrite(Tables.events(s, d),
        col("user_id"), floor(col("value")), s"$dir/z", 8)
      val back = s.read.parquet(s"$dir/z").localCheckpoint(true)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
      back.select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          Catalog.centi(col("value")).as("value_centi"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, ts,
              CAST(ROUND(value * 100) AS BIGINT) AS value_centi
            FROM events ORDER BY event_id"""))

  /** d26: sorted-neighborhood near-duplicate pairs
    * (Dedup.sortedNeighborhoodPairs — Hernández–Stolfo SNM): corpus
    * ranked by 16-char normalized-text prefix via the two-pass
    * distributed rank, pairs within 10 rank positions verified by
    * 3-shingle word Jaccard. The oracle replays the blocking rank, the
    * window pairing AND every shingle-Jaccard verify, so the candidate
    * generation and the verification are both hash-certified. */
  private val d26 = QueryDef("d26_snm_pairs",
    (s, d) => Dedup.sortedNeighborhoodPairs(Tables.documents(s, d),
        "doc_id", "text", window = 10, shingleN = 3, threshold = 0.3)
      .orderBy("id_a", "id_b"),
    Some("""WITH n AS (SELECT doc_id,
                TRIM(regexp_replace(regexp_replace(LOWER(text),
                  '[^\p{L}\p{N} \t\n]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
              FROM documents),
            r AS (SELECT doc_id,
                ROW_NUMBER() OVER (ORDER BY substring(nt, 1, 16), doc_id)
                  AS rnk
              FROM n),
            w AS (SELECT doc_id, list_filter(
                regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'),
                x -> x <> '') AS w FROM documents),
            g AS (SELECT doc_id, list_distinct(list_transform(
                range(1, len(w)-1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM w),
            cand AS (SELECT a.doc_id AS ia, b.doc_id AS ib FROM r a
                     JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 10),
            j AS (SELECT ia, ib,
                FLOOR(len(list_intersect(x.sh, y.sh)) /
                      len(list_distinct(list_concat(x.sh, y.sh))) * 10000
                  + 0.5) / 10000 AS jaccard
              FROM cand JOIN g x ON x.doc_id = ia
                        JOIN g y ON y.doc_id = ib)
            SELECT LEAST(ia, ib) AS id_a, GREATEST(ia, ib) AS id_b, jaccard
            FROM j WHERE jaccard >= 0.3 ORDER BY id_a, id_b"""), bench = true)

  /** q71: OHLC bucket downsampling (RelationalOps.ohlcDownsample) — per
    * (user, day) the open/high/low/close/count of the value series in
    * (ts, event_id) order, one min_by/max_by hash aggregation, no window.
    * Values surface as exact centi-BIGINTs; the oracle re-derives
    * open/close with ordered FIRST aggregates, so the tie-break picks
    * are hash-certified. */
  private val q71 = QueryDef("q71_ohlc",
    (s, d) => RelationalOps.ohlcDownsample(Tables.events(s, d),
        "user_id", "ts", "value", "day", "event_id")
      .select(col("user_id"),
        col("bucket_ts").cast("timestamp_ntz").as("bucket_ts"),
        Catalog.centi(col("open")).as("open_centi"),
        Catalog.centi(col("high")).as("high_centi"),
        Catalog.centi(col("low")).as("low_centi"),
        Catalog.centi(col("close")).as("close_centi"),
        col("n"))
      .orderBy("user_id", "bucket_ts"),
    Some("""SELECT user_id, DATE_TRUNC('day', ts) AS bucket_ts,
              FIRST(CAST(ROUND(value * 100) AS BIGINT)
                    ORDER BY ts, event_id) AS open_centi,
              MAX(CAST(ROUND(value * 100) AS BIGINT)) AS high_centi,
              MIN(CAST(ROUND(value * 100) AS BIGINT)) AS low_centi,
              FIRST(CAST(ROUND(value * 100) AS BIGINT)
                    ORDER BY ts DESC, event_id DESC) AS close_centi,
              COUNT(*) AS n
            FROM events GROUP BY user_id, DATE_TRUNC('day', ts)
            ORDER BY user_id, bucket_ts"""), bench = true)

  /** s19: the message-bus connector seam (graft.sources.Bus — SURVEY
    * S9's `kafka` row, wire-protocol-independent half) run end-to-end
    * under the oracle: events produced into a 4-partition segment log,
    * streamed through the DSv2 micro-batch source into a checkpointed
    * parquet sink, the query KILLED between halves, restarted mid-log
    * from the committed (topic, partition, offset) positions. The oracle
    * is FULL record fidelity — not distinct-collapse: a double delivery
    * or a gap after restart is a row-count/hash mismatch, so the
    * exactly-once property itself is what's certified. BusSourceSpec
    * additionally pins dense per-partition offsets and late-partition
    * discovery. */
  private val s19 = QueryDef("s19_bus_connector",
    (s, d) => {
      val t0 = System.nanoTime()
      var streamNanos = 0L  // time INSIDE processAllAvailable
      var produceNanos = 0L // time writing segments into the log
      // decomposition of the drain (round-19 verdict task 4): summed
      // StreamingQueryProgress.durationMs across both halves —
      //   plan   = latestOffset + getBatch + queryPlanning (source
      //            discovery + per-batch plan)
      //   drain  = addBatch (read segments -> write sink files)
      //   commit = walCommit + commitOffsets (checkpoint WAL + sink log)
      val dur = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      var nBatches = 0L
      val base = java.nio.file.Files.createTempDirectory("graft_s19_")
      val (root, ck, sink) = (s"$base/log", s"$base/ck", s"$base/sink")
      val ev = Tables.events(s, d).select("event_id", "user_id", "event_type")
      val payload = concat(col("event_id"), lit(","),
        col("user_id"), lit(","), col("event_type"))
      def run(): Unit = {
        val q = s.readStream.format("graft-bus").option("path", root).load()
          .select(col("value").cast("string").as("v"))
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ck)
          .outputMode("append").start()
        val s0 = System.nanoTime()
        try { q.processAllAvailable()
          graft.streaming.EventStreams.assertDrained(q, "s19_bus")
        } finally {
          streamNanos += System.nanoTime() - s0
          q.recentProgress.foreach { p =>
            if (p.numInputRows > 0 || !p.durationMs.isEmpty) nBatches += 1
            p.durationMs.forEach((k, v) => dur(k) += v)
          }
          q.stop()
        }
      }
      def produce(half: org.apache.spark.sql.DataFrame): Unit = {
        val p0 = System.nanoTime()
        graft.sources.Bus.produce(half, root, "events", 4,
          col("event_id"), payload, col("event_id"))
        produceNanos += System.nanoTime() - p0
      }
      produce(ev.filter(col("event_id") % 2 === 0))
      run() // half the log, then a controlled kill
      produce(ev.filter(col("event_id") % 2 === 1))
      run() // restart: resume mid-log from checkpointed offsets
      val out = s.read.parquet(sink).localCheckpoint(true)
      val nIn = out.count() // full record fidelity: sink rows == produced records
      val streamSec = streamNanos / 1e9
      BenchAux.put("s19_bus_connector",
        "stream_sec" -> streamSec,
        "scaffold_sec" -> ((System.nanoTime() - t0) / 1e9 - streamSec),
        "produce_sec" -> produceNanos / 1e9,
        "plan_sec" -> ((dur("latestOffset") + dur("getBatch") +
          dur("queryPlanning")) / 1e3),
        "drain_sec" -> dur("addBatch") / 1e3,
        "commit_sec" -> ((dur("walCommit") + dur("commitOffsets")) / 1e3),
        "batches" -> nBatches.toDouble,
        "input_records" -> nIn.toDouble,
        "records_per_sec" -> (if (streamSec > 0) nIn / streamSec else 0.0))
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
      out.select(split(col("v"), ",").as("f"))
        .select(element_at(col("f"), 1).cast("long").as("event_id"),
          element_at(col("f"), 2).cast("long").as("user_id"),
          element_at(col("f"), 3).as("event_type"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type FROM events
            ORDER BY event_id"""), bench = true)

  /** d27: EXACT set-similarity self-join via prefix filtering
    * (Dedup.prefixJaccardPairs — the AllPairs/PPJoin family): every
    * document pair with 3-shingle Jaccard >= 0.5, found with no
    * all-pairs stage — candidates come only from shared rarest-first
    * prefix tokens plus the length filter, then exact verification.
    * Complements the approximate scale paths (d03 LSH banding, d26 SNM
    * windowing): this one is provably COMPLETE at the threshold. The
    * oracle enumerates every pair sharing >= 1 shingle (a superset of
    * any Jaccard > 0 pair) with its exact intersection via a
    * shingle-keyed join + group-count — so completeness of the prefix
    * filter itself is what the hash check certifies. */
  private val d27 = QueryDef("d27_prefix_jaccard",
    (s, d) => Dedup.prefixJaccardPairs(Tables.documents(s, d),
        "doc_id", "text", shingleN = 3, threshold = 0.5)
      .orderBy("id_a", "id_b"),
    Some("""WITH w AS (SELECT doc_id, list_filter(
                regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'),
                x -> x <> '') AS w FROM documents),
            g AS (SELECT doc_id, list_distinct(list_transform(
                range(1, len(w)-1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
              FROM w WHERE len(w) >= 3),
            tok AS (SELECT doc_id, UNNEST(sh) AS t, len(sh) AS sz FROM g),
            pair AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                COUNT(*) AS inter,
                ANY_VALUE(a.sz) AS sa, ANY_VALUE(b.sz) AS sb
              FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
              FLOOR(inter / (sa + sb - inter) * 10000 + 0.5) / 10000
                AS jaccard
            FROM pair
            WHERE FLOOR(inter / (sa + sb - inter) * 10000 + 0.5) / 10000
              >= 0.5
            ORDER BY id_a, id_b"""), bench = true)

  /** m04: video frame sampling through the codec kernel boundary
    * (Multimodal.sampleFrames — the brief's frame-sample stage): video
    * rows explode into one row per stride-2 frame, payload sliced by the
    * per-partition codec. Frames surface as (len, unsigned byte sum) so
    * the oracle re-derives every sampled byte from the generator's
    * portable arithmetic (byte j of id = (id*131 + j*31 + 128) % 256
    * unsigned, frame f = 16 bytes from offset (16f mod len)) — slicing,
    * striding and the modality filter are all hash-certified. */
  private val m04 = QueryDef("m04_frame_sample",
    (s, d) => {
      import graft.multimodal.Multimodal._
      import s.implicits._
      sampleFrames(generate(s, 120), stride = 2)
        .map(f => (f.media_id, f.frame_idx, f.frame_bytes.length,
          f.frame_bytes.foldLeft(0L)((a, b) => a + (b & 0xFF))))
        .toDF("media_id", "frame_idx", "frame_len", "frame_sum")
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH v AS (SELECT r.range AS id, 64 + r.range % 64 AS len
                       FROM range(120) r WHERE r.range % 3 = 2),
            f AS (SELECT id, len, UNNEST([0, 2, 4, 6]) AS fi FROM v),
            st AS (SELECT id, fi, len, (fi * 16) % len AS s0 FROM f)
            SELECT id AS media_id, CAST(fi AS INT) AS frame_idx,
              CAST(LEAST(16, len - s0) AS INT) AS frame_len,
              CAST(list_sum(list_transform(
                range(s0, s0 + LEAST(16, len - s0)),
                j -> (id * 131 + j * 31 + 128) % 256)) AS BIGINT)
                AS frame_sum
            FROM st ORDER BY media_id, frame_idx"""))

  val all: Seq[QueryDef] = Seq(q69, q70, d26, q71, s19, d27, m04)
}
