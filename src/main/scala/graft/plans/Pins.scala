package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.graft.Bridge

/** Checkpoint pinning with HONEST leaf statistics (round-18 verdict
  * task 4, the root fix behind ExchangeSizing's poisoned-pin trust
  * check).
  *
  * `Dataset.localCheckpoint` snapshots the ORIGIN plan's Catalyst
  * statistics into the pinned LogicalRDD leaf. For a join/explode-derived
  * frame that estimate is multiplicative garbage baked in as leaf truth —
  * the r17 sf0.1 telemetry showed per-round pins claiming 107.7 GB on
  * ~100 MB of blocks, and the r18 artifact 252 trust-check rejections of
  * a recurring 5.8x-inflated iterative pin. Rejection downstream works
  * but is the wrong layer: the block manager KNOWS the pin's stored
  * bytes the moment it materializes, so the pin should carry them from
  * creation. [[pin]]/[[restamp]] rebuild the checkpointed frame around
  * the same RDD with `originStats = Statistics(storedBytes)`; the
  * sizing rule then sees a claim that equals block truth by
  * construction, and its 4x trust check degrades to the backstop it was
  * meant to be (fires ~never — policed by the per-round telemetry
  * artifact).
  *
  * Stats currency: stored block bytes (compressed columnar / serialized)
  * sit within the same band as the Catalyst estimates the sizing rule's
  * expansion factors were calibrated on (measured r16: 547 MB parquet
  * estimate vs 1.46 GB materialized columnar on the same 120M-edge
  * stream, a 2.7x spread vs the ~10x of deserialized runtime row stats)
  * — honest magnitude, same order, which is all the leaf-sum cap needs.
  */
object Pins {

  /** Eager localCheckpoint whose pinned leaf reports its REAL stored
    * bytes instead of the origin plan's estimate. Drop-in replacement
    * for `df.localCheckpoint(true)` at engine pin sites. */
  def pin(df: DataFrame): DataFrame = restamp(df.localCheckpoint(true))

  /** Chainable form: `df.pinned` == `Pins.pin(df)`. */
  implicit class PinSyntax(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = pin(df)
  }

  /** Re-stamp an already-MATERIALIZED checkpointed frame with its block
    * bytes. No-op (returns the input) when the frame is not a bare
    * LogicalRDD or its blocks are not registered yet — a LAZY
    * localCheckpoint must be materialized (e.g. by the convergence count
    * that follows it) before restamping, else the inherited estimate
    * stays and the sizing rule's trust check remains the guard. */
  def restamp(ck: DataFrame): DataFrame =
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val spark = ck.sparkSession
        spark.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => BigInt(i.memSize) + BigInt(i.diskSize))
          .filter(_ > 0) match {
          case Some(bytes) =>
            // Thread the origin constraints through (round-19 ADVICE):
            // localCheckpoint preserved the origin plan's inferred
            // constraints (non-null etc.) on the pinned leaf, and
            // lr.constraints exposes exactly that set — dropping it to
            // None would cost downstream filter inference at every
            // engine pin site.
            Bridge.ofRows(spark, LogicalRDD(lr.output, lr.rdd,
              lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
              lr.stream)(
              spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
              Some(Statistics(sizeInBytes = bytes)), Some(lr.constraints)))
          case None => ck
        }
      case _ => ck
    }
}
