package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** The SQL-registered native function surface (GraftExtensions
  * .sqlFunctions): every function reachable from spark.sql text must be
  * bit-identical to its Column-API form, and literal-typed arguments
  * must fail with a typed message, not a ClassCastException. */
class SqlFunctionsSpec extends SparkSpec {

  private lazy val installed: Unit =
    graft.GraftExtensions.sqlFunctions
      .foreach(Bridge.registerSqlFunction(spark, _))

  private def fixture = {
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps over the quick brown dog"),
      (2L, "a b a b a b a b"),
      (3L, "lorem ipsum dolor sit amet")).toDF("id", "text")
  }

  test("SQL minhash_text / word_shingles match the Column API bit for bit") {
    installed
    fixture.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT id, minhash_text(text, 3, 16) AS sig,
                word_shingles(text, 3) AS sh
         FROM sqlfn_docs""").collect().map(r =>
      r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[String](2))).toMap
    val viaCol = fixture.select(col("id"),
        ArrayExprs.minhash_text(col("text"), 3, 16).as("sig"),
        ArrayExprs.word_shingles(col("text"), 3).as("sh"))
      .collect().map(r =>
        r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[String](2))).toMap
    assert(viaSql == viaCol)
  }

  test("SQL repetition_stats matches the Column API") {
    installed
    fixture.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT id, repetition_stats(text).dup_bigram AS b
         FROM sqlfn_docs""").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaCol = fixture.select(col("id"),
        ArrayExprs.repetition_stats(col("text")).getField("dup_bigram").as("b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaCol)
    // the a-b alternation is all duplicate bigrams after the first two
    assert(viaCol(2L) > 0.5)
  }

  test("non-literal size arguments fail with a typed message") {
    installed
    fixture.createOrReplaceTempView("sqlfn_docs")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_text(text, id + 1, 16) FROM sqlfn_docs")
        .collect()
    }
    assert(e.getMessage.contains("INT literal") ||
      Option(e.getCause).exists(_.getMessage.contains("INT literal")))
  }
}
