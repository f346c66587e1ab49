package graft

import org.apache.spark.sql.functions._

/** The driver contract surface: entry() smoke, facade registration. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("n_name", "revenue"))
  }

  test("every catalog query has distinct name; oracles reference its columns") {
    val names = graft.queries.Catalog.all.map(_.name)
    assert(names.distinct.size == names.size)
    // every oracled query name appears in oracleSql, none dangling
    val oracled = SparkEntry.oracleSql.keySet
    assert(oracled.subsetOf(names.toSet))
  }

  test("Graft.registerTables enables direct SQL over all tables") {
    Graft.registerTables(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) AS n FROM lineitem").head.getLong(0) == 6000L)
    // events view has the rebuilt microsecond timestamp
    val t = spark.sql("SELECT MIN(ts) FROM events").schema.head.dataType.typeName
    assert(t.startsWith("timestamp"))
    assert(spark.sql("SELECT count(*) FROM events WHERE ts >= TIMESTAMP'2024-01-01 00:00:00'")
      .head.getLong(0) == 1000L)
  }
}
