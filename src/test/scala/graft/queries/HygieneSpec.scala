package graft.queries

import graft.SparkSpec

/** Pins the session-hygiene contract for the query builders that touch
  * shared state: s18 must leave /tmp flat (its staging + stream
  * checkpoint dirs are transient), and q68 must not leave temp views —
  * and must never hijack a user-visible table name like "customer". */
class HygieneSpec extends SparkSpec {

  private def graftTmpDirs: Set[String] =
    Option(new java.io.File(System.getProperty("java.io.tmpdir")).list())
      .map(_.filter(_.startsWith("graft_")).toSet).getOrElse(Set.empty)
      // exclude the EXTERNAL harness workdirs (tools/fuzz_check.py keeps
      // its sql/out dirs for triage; OpFuzz creates-and-deletes per-draw
      // dirs): a concurrently running fuzz sweep is not an engine leak,
      // and its dirs appearing inside this test's before/after window
      // would fail the builders for someone else's files
      .filterNot(d => d.startsWith("graft_fuzz") || d.startsWith("graft_opfuzz"))

  test("temp-staging query builds leave /tmp flat") {
    // every builder that stages through a temp dir (TSV sinks, streaming
    // sources/sinks/checkpoints, the Z-order write, the bus log) must
    // remove it before returning — one dir leaked per verify/bench run
    // adds up to hundreds over a session (the round-9 audit's s18
    // finding, generalized in round 11)
    val before = graftTmpDirs
    for (q <- Seq("s18_stream_funnel", "q58_tsv_sink", "mwa13_spectrum_tsv",
        "q70_zorder_write", "s08_stream_restart", "s22_stream_asof",
        "s19_bus_connector")) {
      val n = Catalog.queries(q)(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$q returned no rows")
    }
    val leaked = graftTmpDirs -- before
    assert(leaked.isEmpty, s"leaked temp dirs: $leaked")
  }

  test("q69 restores the recursion safety valve after the build") {
    // the builder raises spark.sql.cteRecursionRowLimit to run the
    // recursion (executed eagerly inside the builder), and must put the
    // session-global safety valve back before returning — a later query's
    // runaway recursion must still hit the default 1M guard
    val conf = "spark.sql.cteRecursionRowLimit"
    val before = spark.conf.getOption(conf)
    val df = Catalog.queries("q69_recursive_sql")(spark,
      "/root/testdata/sf0.001")
    assert(df.count() > 0)
    assert(spark.conf.getOption(conf) == before,
      s"q69 left $conf = ${spark.conf.getOption(conf)} (was $before)")
    // and the returned frame stays executable AFTER the restore (it was
    // materialized inside the builder, not re-run lazily under the
    // restored limit)
    assert(df.count() > 0)
  }

  test("q68 drops its query-scoped views and never shadows user names") {
    // a user's own view named "customer" must survive a q68 build
    spark.range(1).createOrReplaceTempView("customer")
    val n = Catalog.queries("q68_lateral")(spark,
      "/root/testdata/sf0.001").count()
    assert(n > 0)
    val views = spark.catalog.listTables().collect().map(_.name).toSet
    assert(!views.exists(_.startsWith("graft_q68_")),
      s"q68 left query-scoped views: $views")
    assert(spark.table("customer").columns.sameElements(Array("id")),
      "q68 clobbered the user's own 'customer' view")
    spark.catalog.dropTempView("customer")
  }
}
