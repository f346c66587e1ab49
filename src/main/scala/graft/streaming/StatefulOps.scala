package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Spark 4 arbitrary-state streaming (SURVEY §2.10): the
  * `transformWithState` / `StatefulProcessor` API — the successor to
  * flatMapGroupsWithState, with typed named state cells, TTL and timers,
  * backed by the RocksDB state store. The engine exposes the classic API
  * too (StreamingSpec); this is the forward path for custom streaming
  * state at scale (state lives off-heap in RocksDB, not in executor
  * heap — the property that keeps a 100M-key session store alive).
  */
object StatefulOps {

  final case class UserRunningCount(user_id: Long, n_events: Long)

  /** Per-key running event counter: one ValueState[Long] per user,
    * updated every micro-batch, emitted in Update mode. */
  class RunningCounter extends StatefulProcessor[Long, (Long, Long), UserRunningCount] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timers: TimerValues): Iterator[UserRunningCount] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator(UserRunningCount(key, n))
    }
  }

  /** Wire the counter over a (user_id, event_id) dataset. Requires the
    * RocksDB state store provider (set by callers/tests):
    * spark.sql.streaming.stateStore.providerClass =
    *   org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider */
  def runningCounts(events: Dataset[(Long, Long)]): Dataset[UserRunningCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningCounter,
        TimeMode.None(), OutputMode.Update())
  }

  /** STREAMING SSINS match filter: the reference's signature iterative
    * algorithm (SURVEY §2.8) as an arbitrary-state streaming operator.
    *
    * INS cells arrive per micro-batch in any order/partitioning; a
    * ListState[InsCell] per (obsid, pol) accumulates the observation's
    * spectrum in RocksDB (off-heap — a night of observations holds state
    * for every in-flight obsid without heap pressure). An MWA observation
    * has a KNOWN spectrum shape (Ntimes x Nfreqs from the metafits), so
    * end-of-observation is completeness: when the accumulated cell count
    * reaches `expectedCells`, the greedy fixpoint (MatchFilter.run — the
    * SAME code as batch) runs once and emits the final flags, and the
    * state is dropped. Until then the key emits nothing (Append mode).
    * Emission is therefore exactly-once per observation and INVARIANT to
    * how the stream is micro-batched — which is what lets the streaming
    * path share mwa04's bit-exact SQL oracle (s06_stream_mf).
    */
  class MatchFilterProcessor(cfg: graft.mwa.GraftConfig, expectedCells: Int)
      extends StatefulProcessor[(Long, String),
        graft.mwa.MatchFilter.InsCell, graft.mwa.MatchFilter.FlagCell] {
    import graft.mwa.MatchFilter.InsCell
    @transient private var cells: ListState[InsCell] = _
    @transient private var nCells: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cells = getHandle.getListState[InsCell]("cells",
        Encoders.product[InsCell], TTLConfig.NONE)
      nCells = getHandle.getValueState[Long]("nCells",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: (Long, String), rows: Iterator[InsCell],
        timers: TimerValues): Iterator[graft.mwa.MatchFilter.FlagCell] = {
      // completeness rides a running counter so each micro-batch does
      // O(batch) work; the full ListState is materialized exactly once,
      // when the observation completes and the fixpoint runs
      var added = 0L
      rows.foreach { c => cells.appendValue(c); added += 1 }
      val n = (if (nCells.exists()) nCells.get() else 0L) + added
      if (n >= expectedCells) {
        val acc = cells.get().toSeq
        cells.clear(); nCells.clear()
        graft.mwa.MatchFilter.run(acc, cfg)
      } else {
        nCells.update(n)
        Iterator.empty
      }
    }
  }

  def matchFilterStream(ins: Dataset[graft.mwa.MatchFilter.InsCell],
                        cfg: graft.mwa.GraftConfig,
                        expectedCells: Int): Dataset[graft.mwa.MatchFilter.FlagCell] = {
    import ins.sparkSession.implicits._
    ins.groupByKey(c => (c.obsid, c.pol))
      .transformWithState(new MatchFilterProcessor(cfg, expectedCells),
        TimeMode.None(), OutputMode.Append())
  }

  /** An INS cell stamped with its event time, for the watermark-driven
    * variant below. */
  final case class InsCellTs(obsid: Long, time_idx: Int, freq_hz: Double,
                             pol: String, metric: Double, nsamples: Double,
                             ts: java.sql.Timestamp)

  /** WATERMARK-driven streaming match filter: where MatchFilterProcessor
    * closes an observation by its known spectrum shape, this variant
    * closes it by event-time silence — an EVENT-TIME TIMER re-registered
    * at (max event time seen + closeOutMs) on every batch; when the
    * watermark passes it (no new data for the observation within the
    * close-out window), the fixpoint runs once on the accumulated cells
    * and state is dropped. This is the production shape for instruments
    * whose observation length is NOT known a priori; the exactly-once
    * emission per key still holds because the timer only fires after the
    * watermark guarantees no more rows can arrive.
    *
    * Two windows govern correctness and must be sized to the instrument:
    * the WATERMARK delay bounds out-of-order arrival (event-time mode
    * DROPS rows older than the watermark before they reach state), and
    * `closeOutMs` bounds in-observation event-time silence. Undersizing
    * either truncates the accumulated spectrum — the spec exercises
    * both. */
  class MatchFilterTimerProcessor(cfg: graft.mwa.GraftConfig, closeOutMs: Long)
      extends StatefulProcessor[(Long, String),
        InsCellTs, graft.mwa.MatchFilter.FlagCell] {
    import graft.mwa.MatchFilter.{FlagCell, InsCell}
    @transient private var cells: ListState[InsCell] = _
    @transient private var deadline: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cells = getHandle.getListState[InsCell]("cells",
        Encoders.product[InsCell], TTLConfig.NONE)
      deadline = getHandle.getValueState[Long]("deadline",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: (Long, String), rows: Iterator[InsCellTs],
        timers: TimerValues): Iterator[FlagCell] = {
      var maxTs = Long.MinValue
      rows.foreach { c =>
        cells.appendValue(InsCell(c.obsid, c.time_idx, c.freq_hz, c.pol,
          c.metric, c.nsamples))
        maxTs = math.max(maxTs, c.ts.getTime)
      }
      val newDeadline = maxTs + closeOutMs
      if (deadline.exists()) {
        if (deadline.get() >= newDeadline) return Iterator.empty
        getHandle.deleteTimer(deadline.get())
      }
      getHandle.registerTimer(newDeadline)
      deadline.update(newDeadline)
      Iterator.empty
    }

    override def handleExpiredTimer(key: (Long, String), timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FlagCell] = {
      val acc = cells.get().toSeq
      cells.clear(); deadline.clear()
      if (acc.nonEmpty) graft.mwa.MatchFilter.run(acc, cfg) else Iterator.empty
    }
  }

  /** Wire the watermark-driven MF; `ins` must already carry a watermark on
    * `ts` (withWatermark before the groupByKey). */
  def matchFilterStreamEventTime(ins: Dataset[InsCellTs],
                                 cfg: graft.mwa.GraftConfig,
                                 closeOutMs: Long): Dataset[graft.mwa.MatchFilter.FlagCell] = {
    import ins.sparkSession.implicits._
    ins.groupByKey(c => (c.obsid, c.pol))
      .transformWithState(new MatchFilterTimerProcessor(cfg, closeOutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  final case class BucketItem(bucket: Long, item: String)
  final case class BucketItemCount(bucket: Long, item: String, cnt: Long)

  /** STREAMING Misra-Gries heavy hitters: one bounded MG sketch per hash
    * bucket, held in RocksDB ValueState as the SAME length-prefixed codec
    * and updated by the SAME counter arithmetic as the batch aggregate
    * (functions.MisraGriesAgg.updateOne/serializeSketch) — batch and
    * stream provably share the algorithm, which is what lets the streaming
    * query ride the batch oracle in the exact regime (s10).
    *
    * Buckets are hash-disjoint, so the per-bucket summaries union to the
    * global answer without a merge step, and the sketch bound is
    * k x nBuckets counters TOTAL regardless of stream length — the 100 TB
    * posture: state is O(k) per bucket, each micro-batch does
    * O(batch + sketch) work, and emission happens once per bucket at
    * completeness (`expected` occurrences seen — the s06 close-out
    * pattern; an event-time timer variant would close by silence instead,
    * as MatchFilterTimerProcessor does). */
  class MgTopKProcessor(k: Int, expected: Map[Long, Long])
      extends StatefulProcessor[Long, BucketItem, BucketItemCount] {
    import graft.functions.MisraGriesAgg
    @transient private var sketch: ValueState[Array[Byte]] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sketch = getHandle.getValueState[Array[Byte]]("sketch",
        Encoders.BINARY, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[BucketItem],
        timers: TimerValues): Iterator[BucketItemCount] = {
      val m = if (sketch.exists()) MisraGriesAgg.deserializeSketch(sketch.get())
        else scala.collection.mutable.HashMap.empty[String, Long]
      var added = 0L
      rows.foreach { r => MisraGriesAgg.updateOne(m, r.item, k); added += 1 }
      val n = (if (seen.exists()) seen.get() else 0L) + added
      if (n >= expected.getOrElse(key, Long.MaxValue)) {
        sketch.clear(); seen.clear()
        m.toSeq.sortBy { case (i, c) => (-c, i) }
          .map { case (i, c) => BucketItemCount(key, i, c) }.iterator
      } else {
        sketch.update(MisraGriesAgg.serializeSketch(m))
        seen.update(n)
        Iterator.empty
      }
    }
  }

  /** Wire the streaming MG sketch over (bucket, item) rows; `expected` is
    * the per-bucket close-out occurrence count. */
  def mgTopKStream(items: Dataset[BucketItem], k: Int,
                   expected: Map[Long, Long]): Dataset[BucketItemCount] = {
    import items.sparkSession.implicits._
    items.groupByKey(_.bucket)
      .transformWithState(new MgTopKProcessor(k, expected),
        TimeMode.None(), OutputMode.Append())
  }

  /** One tagged row of the streaming as-of join's merged input: reference
    * rows (`is_ref = true` — the quote/dimension side) update per-key
    * state; probe rows (`is_ref = false` — the trade/fact side) are
    * enriched and emitted. */
  final case class AsOfSideRow(user_id: Long, is_ref: Boolean,
                               ts: java.sql.Timestamp, event_id: Long,
                               value_centi: Long)

  /** An enriched probe row: the latest reference row at-or-before its
    * event time (LOCF), or nulls when none has occurred yet. */
  final case class AsOfOut(purchase_id: Long, user_id: Long,
                           ts: java.sql.Timestamp, view_id: Option[Long],
                           view_value_centi: Option[Long])

  /** STREAMING AS-OF JOIN (stream-stream temporal LOCF enrichment — the
    * trades⋈quotes shape; the temporal-join class Spark's built-in
    * interval stream-stream joins don't cover, J9's streaming execution).
    *
    * Both sides arrive merged and tagged per key. State per key is ONE
    * value — the latest reference row seen — because the delivery
    * contract is per-key event-time-monotone micro-batches (batch N's
    * rows precede batch N+1's in event time, the ordering a
    * watermark-gated ingestion or a time-bucketed bus replay provides;
    * Flink's temporal join places the same contract on its build side).
    * Under that contract a probe row's answer never needs a reference
    * OLDER than the newest already seen, so state is O(1) per key — not
    * a buffered history — and emission is eager (exactly-once per probe
    * row, invariant to how rows split across batches AT OR ABOVE the
    * contract's granularity).
    *
    * Within a batch, rows sort by (event time, references-first,
    * event_id), so the inclusive bound (ref.ts <= probe.ts) and the
    * equal-ts tie-break (largest event_id wins) are deterministic
    * regardless of arrival order — the exact tie contract of the batch
    * [[graft.operators.RelationalOps.asOfJoin]].
    */
  class StreamAsOfProcessor extends StatefulProcessor[Long, AsOfSideRow, AsOfOut] {
    @transient private var latest: ValueState[(java.sql.Timestamp, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[(java.sql.Timestamp, Long, Long)](
        "latest", Encoders.product[(java.sql.Timestamp, Long, Long)],
        TTLConfig.NONE)

    private def nanoKey(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos

    override def handleInputRows(key: Long, rows: Iterator[AsOfSideRow],
        timers: TimerValues): Iterator[AsOfOut] = {
      var cur: (java.sql.Timestamp, Long, Long) =
        if (latest.exists()) latest.get() else null
      val out = Seq.newBuilder[AsOfOut]
      // refs before probes at equal ts (inclusive bound), event_id
      // ascending so the last equal-ts ref processed is the tie winner
      rows.toArray.sortBy(r => (nanoKey(r.ts), !r.is_ref, r.event_id))
        .foreach { r =>
          if (r.is_ref) {
            val rk = nanoKey(r.ts)
            val newer = cur == null || rk > nanoKey(cur._1) ||
              (rk == nanoKey(cur._1) && r.event_id > cur._2)
            if (newer) cur = (r.ts, r.event_id, r.value_centi)
          } else out += AsOfOut(r.event_id, key, r.ts,
            Option(cur).map(_._2), Option(cur).map(_._3))
        }
      if (cur != null) latest.update(cur)
      out.result().iterator
    }
  }

  /** Wire the streaming as-of join over merged tagged rows keyed by
    * user. Requires the per-key event-time-monotone batch contract
    * documented on [[StreamAsOfProcessor]]. */
  def streamAsOfJoin(rows: Dataset[AsOfSideRow]): Dataset[AsOfOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .transformWithState(new StreamAsOfProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
