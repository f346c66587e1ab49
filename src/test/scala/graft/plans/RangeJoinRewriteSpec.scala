package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.SparkSpec

/** RangeJoinRewrite: an un-keyed interval join must (a) stop planning as a
  * nested-loop/cartesian product once the rule is active and (b) produce
  * exactly the naive join's rows. */
class RangeJoinRewriteSpec extends SparkSpec with BeforeAndAfterAll {

  // runtime injection path (Verify/Bench register the same rule through
  // spark.sql.extensions = graft.GraftExtensions). Installed per-suite and
  // RESTORED afterwards — the session is shared across suites in this JVM,
  // and leaking the rule would make other suites' plan assertions
  // order-dependent.
  private var saved: Seq[Rule[LogicalPlan]] = Nil
  override def beforeAll(): Unit = {
    super.beforeAll()
    saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == RangeJoinRewrite) :+ RangeJoinRewrite
  }
  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations = saved
    super.afterAll()
  }

  private def eventsDf = {
    import spark.implicits._
    // ts in epoch seconds as timestamps; ids dense
    (0 until 400).map { i =>
      (i.toLong, 1700000000L + (i * 37 % 1000), s"e$i")
    }.toDF("id", "sec", "tag")
      .withColumn("ts", timestamp_seconds(col("sec")))
  }

  test("un-keyed range join rewrites to a bucketed equi join") {
    val l = eventsDf.select(col("id").as("lid"), col("ts").as("lts"))
    val r = eventsDf.select(col("id").as("rid"), col("ts").as("rts"))
    val naive = l.join(r,
      col("rts") > col("lts") &&
        col("rts") <= col("lts") + expr("INTERVAL 10 SECONDS"))
    val phys = naive.queryExecution.executedPlan.toString
    assert(!phys.contains("NestedLoop") && !phys.contains("Cartesian"),
      s"rewrite did not fire:\n$phys")
    assert(phys.contains("Generate") || phys.contains("explode"),
      s"expected bucket explode in plan:\n$phys")
  }

  test("rewritten join returns exactly the naive result") {
    val rows = eventsDf.select("id", "sec").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (li, ls) <- rows
      (ri, rs) <- rows
      if rs > ls && rs <= ls + 10
    } yield (li, ri)).toSet

    val l = eventsDf.select(col("id").as("lid"), col("ts").as("lts"))
    val r = eventsDf.select(col("id").as("rid"), col("ts").as("rts"))
    val got = l.join(r,
        col("rts") > col("lts") &&
          col("rts") <= col("lts") + expr("INTERVAL 10 SECONDS"))
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == expected)
  }

  test("keyed range joins are left alone (hash join already bounds them)") {
    val l = eventsDf.select(col("id").as("lid"), (col("id") % 7).as("k"), col("ts").as("lts"))
    val r = eventsDf.select(col("id").as("rid"), (col("id") % 7).as("k2"), col("ts").as("rts"))
    val j = l.join(r,
      col("k") === col("k2") && col("rts") > col("lts") &&
        col("rts") <= col("lts") + expr("INTERVAL 10 SECONDS"))
    val opt = j.queryExecution.optimizedPlan.toString
    assert(!opt.contains("__graft_lb"), s"rule should not fire on keyed join:\n$opt")
  }

  test("TIMESTAMP_NTZ range join rewrites and matches naive") {
    val l = eventsDf.select(col("id").as("lid"),
      col("ts").cast("timestamp_ntz").as("lts"))
    val r = eventsDf.select(col("id").as("rid"),
      col("ts").cast("timestamp_ntz").as("rts"))
    val j = l.join(r,
      col("rts") > col("lts") &&
        col("rts") <= col("lts") + expr("INTERVAL 10 SECONDS"))
    val phys = j.queryExecution.executedPlan.toString
    assert(!phys.contains("NestedLoop") && !phys.contains("Cartesian"),
      s"rewrite did not fire:\n$phys")
    val rows = eventsDf.select("id", "sec").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val expected = (for {
      (li, ls) <- rows
      (ri, rs) <- rows
      if rs > ls && rs <= ls + 10
    } yield (li, ri)).toSet
    val got = j.select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == expected)
  }

  test("negative epochs (pre-1970) bucket correctly — no dropped matches") {
    import spark.implicits._
    // seconds straddling zero; truncating division would split bucket -1
    // incorrectly at the 0 boundary
    val df = (-50L to 50L by 3).map(s => (s, s)).toDF("id", "sec")
    val l = df.select(col("id").as("lid"), col("sec").as("lsec"))
    val r = df.select(col("id").as("rid"), col("sec").as("rsec"))
    val j = l.join(r,
      col("rsec") > col("lsec") && col("rsec") <= col("lsec") + lit(10L))
    val phys = j.queryExecution.executedPlan.toString
    assert(!phys.contains("NestedLoop") && !phys.contains("Cartesian"))
    val rows = df.collect().map(x => (x.getLong(0), x.getLong(1)))
    val expected = (for {
      (li, ls) <- rows; (ri, rs) <- rows
      if rs > ls && rs <= ls + 10
    } yield (li, ri)).toSet
    val got = j.select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == expected)
  }

  test("pure-NTZ join buckets on the local number line — DST fall-back safe") {
    import spark.implicits._
    // session zone with DST rules; 2025-11-02 02:00 local is the US
    // fall-back instant: NTZ values 8s apart across it map ~3608s apart in
    // session-zone epoch seconds, so session-zone bucketing would put them
    // >1 bucket apart and silently drop the match
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val df = (0 until 60).map(i => (i.toLong, i * 4L)).toDF("id", "off")
        .withColumn("ts", expr(
          "timestampadd(SECOND, off, TIMESTAMP_NTZ'2025-11-02 01:58:00')"))
      val l = df.select(col("id").as("lid"), col("off").as("loff"), col("ts").as("lts"))
      val r = df.select(col("id").as("rid"), col("off").as("roff"), col("ts").as("rts"))
      val j = l.join(r,
        col("rts") > col("lts") &&
          col("rts") <= col("lts") + expr("INTERVAL 10 SECONDS"))
      val phys = j.queryExecution.executedPlan.toString
      assert(!phys.contains("NestedLoop") && !phys.contains("Cartesian"),
        s"rewrite did not fire:\n$phys")
      // NTZ comparison semantics are pure local-line: expected from offsets
      val offs = df.select("id", "off").collect().map(x => (x.getLong(0), x.getLong(1)))
      val expected = (for {
        (li, ls) <- offs; (ri, rs) <- offs
        if rs > ls && rs <= ls + 10
      } yield (li, ri)).toSet
      val got = j.select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == expected,
        s"missing: ${expected -- got}; extra: ${got -- expected}")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("numeric (epoch-seconds) range join also rewrites") {
    val l = eventsDf.select(col("id").as("lid"), col("sec").as("lsec"))
    val r = eventsDf.select(col("id").as("rid"), col("sec").as("rsec"))
    val j = l.join(r,
      col("rsec") > col("lsec") && col("rsec") <= col("lsec") + lit(10L))
    val phys = j.queryExecution.executedPlan.toString
    assert(!phys.contains("NestedLoop") && !phys.contains("Cartesian"),
      s"rewrite did not fire:\n$phys")
    val rows = eventsDf.select("id", "sec").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val expected = (for {
      (li, ls) <- rows
      (ri, rs) <- rows
      if rs > ls && rs <= ls + 10
    } yield (li, ri)).toSet
    val got = j.select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == expected)
  }
}
