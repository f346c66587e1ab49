package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import java.io.File
import java.nio.file.Files
import scala.sys.process._

/** Pins the round-14 d06/d11 oracle-candidate rewrite to the form it was
  * proven against (round-15 verdict task 6). The shingle-keyed self-join
  * replaced the all-pairs candidate stage after an A/B showed them
  * bit-identical at sf0.001/0.01/0.1 — but that A/B lived only in a JSON
  * note, so a future edit to the LIVE oracle could silently diverge from
  * the proven semantics. This spec re-runs the A/B on every test pass:
  * it pulls the live SQL from SparkEntry.oracleSql (the single source of
  * truth the driver certifies against), embeds the OLD all-pairs form as
  * the frozen reference, and asserts DuckDB emits bit-identical rows for
  * both at sf0.001. Completeness argument pinned here too: any pair with
  * Jaccard >= 0.7 > 0 shares at least one 3-shingle, so enumerating
  * same-shingle pairs loses nothing; inter/(sa+sb-inter) over
  * distinct-shingle counts is the same BIGINT division as
  * len(intersect)/len(distinct(concat)).
  *
  * Runs DuckDB through python3 (the sandbox's driver-side oracle
  * engine); the test is CANCELED, not failed, where python3+duckdb or
  * the sf0.001 testdata are absent.
  */
class OracleEquivalenceSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private val repoRoot: File =
    Iterator.iterate(new File(sys.props("user.dir")).getAbsoluteFile)(_.getParentFile)
      .takeWhile(_ != null).take(6)
      .find(d => new File(d, "tools/oracle_equivalence.py").isFile)
      .getOrElse(new File("."))

  private def duckdbAvailable: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  /** The PROVEN reference form of the d06 oracle: exact Jaccard over all
    * doc-id-ordered pairs (the form every pre-r14 certification ran).
    * Frozen verbatim from commit e86c2ce's parent — do not "improve". */
  private val oldD06 =
    """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '') AS w FROM documents),
            g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM w)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              FLOOR(len(list_intersect(a.sh, b.sh)) /
                    len(list_distinct(list_concat(a.sh, b.sh))) * 10000 + 0.5) / 10000 AS jaccard
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) /
                  len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7
            ORDER BY id_a, id_b"""

  /** The PROVEN reference form of the d11 pipeline oracle: identical to
    * the live one except the candidate stage `p`, which is the all-pairs
    * exact-Jaccard join (frozen from commit e86c2ce's parent). */
  private val oldD11 =
    """WITH RECURSIVE
            uniq AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
            u AS (SELECT dd.doc_id, dd.text FROM documents dd
                  JOIN uniq ON dd.doc_id = uniq.doc_id),
            w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '') AS w FROM u),
            g AS (SELECT doc_id, list_distinct(list_transform(
                    range(1, len(w)-1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM w),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM g a JOIN g b ON a.doc_id < b.doc_id
                  WHERE len(list_intersect(a.sh, b.sh)) /
                        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7),
            e AS (SELECT id_a AS a, id_b AS b FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
            reach(a, b) AS (SELECT a, b FROM e
                            UNION
                            SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
            lbl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
                    FROM reach GROUP BY a),
            kept AS (SELECT u.doc_id, u.text FROM u
                     LEFT JOIN lbl ON u.doc_id = lbl.doc_id
                     WHERE lbl.doc_id IS NULL OR lbl.doc_id = lbl.cluster_id),
            lw AS (SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'), x -> x <> '') AS w
                   FROM kept),
            b AS (SELECT doc_id, list_sort([
                 {'score': len(list_filter(w, x -> list_contains(
                    ['the','a','of','and','to','in','is','it','that','for'], x))),
                  'lang': 'en'},
                 {'score': len(list_filter(w, x -> list_contains(
                    ['der','die','das','und','ist','nicht','ein','mit','auf','zu'], x))),
                  'lang': 'de'},
                 {'score': len(list_filter(w, x -> list_contains(
                    ['el','la','de','que','y','en','un','es','no','por'], x))),
                  'lang': 'es'},
                 {'score': len(list_filter(w, x -> list_contains(
                    ['le','la','de','et','est','un','une','que','pour','dans'], x))),
                  'lang': 'fr'}])[4] AS best
               FROM lw),
            lang AS (SELECT doc_id,
                CASE WHEN struct_extract(best, 'score') > 0
                     THEN struct_extract(best, 'lang') ELSE 'und' END AS pred_lang
              FROM b),
            tok AS (SELECT doc_id,
                CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS INT) AS n_tokens
              FROM kept)
            SELECT lang.doc_id, lang.pred_lang, tok.n_tokens
            FROM lang JOIN tok ON lang.doc_id = tok.doc_id
            WHERE tok.n_tokens >= 5
            ORDER BY lang.doc_id"""

  private def check(name: String, oldForm: String): Unit = {
    assume(duckdbAvailable, "python3 + duckdb not available")
    // guard on the SPECIFIC parquet these oracles read (round-15 ADVICE:
    // an OR'd dir-exists guard let a present-but-incomplete sf dir reach
    // the tool, whose all-table view binding then failed with a
    // misleading "LIVE oracle diverged" FAIL instead of a cancel; the
    // tool now also binds views lazily, but the assume should name the
    // real prerequisite)
    assume(new File(s"$sfDir/documents.parquet").exists,
      s"$sfDir/documents.parquet not present")
    val tool = new File(repoRoot, "tools/oracle_equivalence.py")
    assume(tool.isFile, s"$tool not found")
    val live = graft.SparkEntry.oracleSql.getOrElse(name,
      fail(s"$name has no live oracle SQL"))
    val dir = Files.createTempDirectory("oracle_eq")
    val a = dir.resolve("live.sql"); Files.write(a, live.getBytes("UTF-8"))
    val b = dir.resolve("old.sql"); Files.write(b, oldForm.getBytes("UTF-8"))
    val out = new StringBuilder
    val code = Process(Seq("python3", tool.getAbsolutePath, sfDir,
      a.toString, b.toString)).!(ProcessLogger(s => out.append(s).append('\n')))
    assert(code == 0,
      s"$name: LIVE oracle diverged from the proven all-pairs form:\n$out")
    assert(out.toString.contains("identical"), s"unexpected tool output:\n$out")
  }

  test("d06 live oracle == proven all-pairs form (bit-identical in DuckDB)") {
    check("d06_minhash_neardup", oldD06)
  }

  test("d11 live oracle == proven all-pairs form (bit-identical in DuckDB)") {
    check("d11_pipeline", oldD11)
  }
}
