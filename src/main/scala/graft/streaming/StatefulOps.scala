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

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cells = getHandle.getListState[InsCell]("cells",
        Encoders.product[InsCell], TTLConfig.NONE)

    override def handleInputRows(key: (Long, String), rows: Iterator[InsCell],
        timers: TimerValues): Iterator[graft.mwa.MatchFilter.FlagCell] = {
      rows.foreach(cells.appendValue)
      val acc = cells.get().toSeq
      if (acc.length >= expectedCells) {
        cells.clear()
        graft.mwa.MatchFilter.run(acc, cfg)
      } else Iterator.empty
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
}
