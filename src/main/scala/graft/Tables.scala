package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * Every loader takes the scale-factor directory so the same query code runs
  * at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench). Filters and
  * projections applied on top of these reach the parquet scan (predicate
  * pushdown / column pruning) because the loads are plain declarative reads.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` normalization, robust to both testdata generations:
    *
    *  - parquet TIMESTAMP(NANOS): Spark rejects it natively; with
    *    spark.sql.legacy.parquet.nanosAsLong=true it reads as a raw Long of
    *    nanoseconds since epoch, rebuilt here via integer division (`DIV` —
    *    a double divide would lose microseconds at 1.7e18 ns magnitudes).
    *  - parquet TIMESTAMP(MICROS): reads natively as a timestamp type; only
    *    an NTZ cast is needed.
    *
    * All generated values are whole microseconds, so both paths are
    * lossless vs the DuckDB oracle.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    normalizeTs(raw)
  }

  /** Dtype-adaptive `ts` rebuild shared by the batch and stream readers. */
  def normalizeTs(df: DataFrame): DataFrame = {
    val tsCol = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    df.withColumn("ts", tsCol)
  }
}
