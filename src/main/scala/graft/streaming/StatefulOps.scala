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
}
