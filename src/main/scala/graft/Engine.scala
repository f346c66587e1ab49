package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entry point (Verify, Bench, tests,
  * user code) runs with the same scale-aware defaults.
  *
  * Settings rationale (tuned for correctness parity with the DuckDB oracle
  * and for behavior that transfers to a real multi-executor cluster):
  *  - UTC session timezone: the oracle compares timestamps in UTC.
  *  - AQE on: runtime join-strategy switching, skew-join splitting and
  *    post-shuffle partition coalescing are the main levers that keep the
  *    same plans healthy at 1000x the data.
  *  - shuffle.partitions defaults to the local core count (the harness runs
  *    local[32]); on a real cluster this would be sized to ~128MB
  *    post-shuffle partitions instead.
  *  - nanosAsLong: the `events` table is written with parquet
  *    TIMESTAMP(NANOS) which Spark does not read natively; Tables.events
  *    rebuilds a proper microsecond timestamp column from the raw longs.
  */
object Engine {
  def session(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Tungsten sort/shuffle/agg buffers off-heap: the multi-million-row
      // window sorts otherwise churn the GC (observed 2-9s run-to-run
      // variance on the same query); off-heap pages take allocation out of
      // the heap entirely. Same setting a production cluster would run.
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the confs graft needs to an externally-created session (e.g. the
    * driver's). Dynamic confs only. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }
}
