package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.io.File
import java.nio.file.Files

/** Single-source pin for the certified portable-twin contract (round-14
  * verdict task 7): the integer L2², the quantization formula, the md5
  * seed draw and the (distance, nn_id) top-k window are defined ONLY in
  * KmeansPortable — every twin (x12–x17) scores through those four
  * definitions, and the DuckDB oracles certify exactly those semantics.
  * A second copy appearing anywhere else could drift from the certified
  * one without any oracle noticing until the next full sweep, so this
  * spec greps the main source tree and fails on any fork of the
  * patterns. (Production ANN paths — cosine sim, float PQ ADC — keep
  * their own scoring on purpose; the patterns below are specific to the
  * integer-quantized twin contract.)
  */
class ContractPinSpec extends AnyFunSuite {

  // Resolve the source root independently of the process cwd (round-14
  // ADVICE): prefer an explicit -Dgraft.sourceRoot, else climb from
  // user.dir looking for src/main/scala/graft — sbt forks tests from the
  // build root, but an IDE or a nested-module runner may not.
  private val srcRoot: File = {
    val rel = "src/main/scala/graft"
    sys.props.get("graft.sourceRoot").map(new File(_)).orElse {
      Iterator.iterate(new File(sys.props("user.dir")).getAbsoluteFile)(_.getParentFile)
        .takeWhile(_ != null).take(6)
        .map(d => new File(d, rel)).find(_.isDirectory)
    }.getOrElse(new File(rel))
  }
  private val home = "KmeansPortable.scala"

  // Files OTHER than `home` where a needle is a legitimate non-contract
  // use (e.g. unrelated squared-difference arithmetic). Extend this —
  // with a justification comment — instead of weakening the needles.
  private val allow: Map[String, Set[String]] = Map.empty.withDefaultValue(Set.empty)

  private def scalaFiles(dir: File): Seq[File] = {
    val (dirs, files) = dir.listFiles.toSeq.partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaFiles)
  }

  // (label, literal substring that constitutes a re-definition, home file).
  // The integer L2 fold moved in r21 from a Column-level HOF in
  // KmeansPortable to the compiled loop ArrayExprs.l2sqLongCompute (the
  // codegen hot-path fix); KmeansPortable.l2 remains the single
  // Column-level entry every twin scores through, so the pin now tracks
  // BOTH layers: the compute loop may exist only in ArrayExprs.scala, and
  // the expression wrapper may be referenced only from ArrayExprs (its
  // definition) and KmeansPortable (the l2 contract site).
  private val patterns = Seq(
    ("integer L2 compiled loop", "l2sqLongCompute", Set("ArrayExprs.scala")),
    ("integer L2 expression wrapper", "vector_l2sq_long",
      Set("ArrayExprs.scala", "KmeansPortable.scala")),
    ("[0,255] quantization formula", "floor(x.cast(\"double\") * 256",
      Set(home)),
    ("md5(__id) seed draw", "md5(col(\"__id\")", Set(home)),
    ("per-query top-k window", "Window.partitionBy(col(\"__qid\")",
      Set(home)),
  )

  test("the certified twin contract has exactly one definition site") {
    assert(srcRoot.isDirectory, s"source root moved: $srcRoot")
    val sources = scalaFiles(srcRoot)
      .map(f => f -> new String(Files.readAllBytes(f.toPath), "UTF-8"))
    assert(sources.size > 30, "suspiciously few sources scanned")
    for ((label, needle, homes) <- patterns) {
      val hits = sources.collect { case (f, s) if s.contains(needle) => f.getName }
        .filterNot(allow(needle).contains)
      assert(hits.nonEmpty && hits.toSet == homes,
        s"$label ('$needle') must live ONLY in ${homes.mkString(", ")}; " +
          s"found in: " + hits.mkString(", ") +
          ". Route new twins through KmeansPortable.l2/quantize/seedRows/" +
          "topKByDist instead of copying the arithmetic.")
    }
  }
}
