package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 verdict task 6: pin that the exchange-sizing rule leaves the
  * sf0.1 PROTOCOL plans untouched — zero Up decisions across the heavy
  * end of the bench catalog at PRODUCTION calibration — the strongest
  * form of the "flat by construction" claim behind the r17 A/B arm
  * (BENCH_MEDIANS_r17.json: rule-on vs rule-off inside session noise).
  *
  * The queries chosen are exactly the shapes the rule DOES resize at
  * sf10 (edge-family exchanges of d24/d28) plus the string/array shapes
  * it must never touch (d27) and the mixed pipeline — if the activation
  * band ever regresses to fire two decades early, this suite goes red
  * before any bench artifact does. Executed (not just planned): the rule
  * runs inside AQE re-optimization, so decisions only happen when query
  * stages actually materialize.
  */
/** Serialization gate for suites that clear/replace the JVM-wide default
  * SparkSession (this one and ExchangeSizingSpec): sbt runs suites in
  * parallel threads inside the forked test JVM, and two clearing suites
  * interleaving corrupts each other's session wiring (observed round 17:
  * the layer-2 executed-count tests read the wrong session's partitions
  * when both suites ran in one testOnly invocation). */
object ExclusiveSessionGate {
  val sem = new java.util.concurrent.Semaphore(1)
}

class SizingFlatAtGateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.1"

  private var prevDefault: Option[SparkSession] = None

  override def beforeAll(): Unit = {
    // suites that CLEAR the default session must not overlap (sbt runs
    // suites in parallel threads): serialize with ExchangeSizingSpec
    ExclusiveSessionGate.sem.acquire()
    super.beforeAll()
  }

  lazy val spark: SparkSession = {
    prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("graft-sizing-flat-gate")
      // the exact protocol posture: 32 shuffle partitions, AQE on,
      // DEFAULT sizing calibration (nothing shrunk)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions()(_))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = {
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    } finally ExclusiveSessionGate.sem.release()
    super.afterAll()
  }

  test("heavy sf0.1 catalog queries execute with ZERO sizing Up decisions") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val qmap = graft.SparkEntry.queries
    // the sf10-resized edge family + the string (d27) and pipeline
    // shapes — the exchanges with the largest sf0.1 estimates
    // d25 and d27 are the two queries whose poisoned checkpoint-pin
    // estimates DID fire Up(512) at sf0.1 before the round-17
    // block-manager trust check — they stay in this list as the
    // regression tripwire
    val heavy = Seq("d24_reachability", "d28_kcore", "d27_prefix_jaccard",
      "d25_shortest_paths", "d11_pipeline", "q69_recursive_sql")
    ExchangeSizing.upCount.set(0L)
    heavy.foreach { name =>
      // run TWICE with a cache clear between, mirroring Bench's
      // warmup+timed shape: cache/stage (runtime-flavor) estimates only
      // appear once a prior execution has materialized the pins
      qmap(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      qmap(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      assert(ExchangeSizing.upCount.get() == 0L,
        s"sizing rule took an Up decision during $name at sf0.1 — " +
          "the activation band regressed (protocol plans must be flat)")
    }
  }
}
