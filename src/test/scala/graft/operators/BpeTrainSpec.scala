package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** bpeTrain on a hand-derivable corpus: the argmax sequence, the
  * all-occurrence merge application between rounds, and consistency with
  * the BpeEncode application kernel. */
class BpeTrainSpec extends SparkSpec {

  test("learns the hand-computed merge sequence") {
    import spark.implicits._
    // words: abc x2, abd x1 -> pairs (a,b):3 (b,c):2 (b,d):1
    // round 1 merges (a,b); round 2 pairs (ab,c):2 (ab,d):1 -> (ab,c)
    val docs = Seq("abc abc abd").toDF("text")
    val m = TextAnalysis.bpeTrain(docs, rounds = 2)
      .orderBy("merge_rank").collect()
    assert(m.map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq ===
      Seq(("a", "b", 3L), ("ab", "c", 2L)))
  }

  test("learned merges reproduce through the BpeEncode application kernel") {
    import spark.implicits._
    val docs = Seq("abc abc abd").toDF("text")
    val merges = TextAnalysis.bpeTrain(docs, rounds = 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = docs
      .select(graft.functions.ArrayExprs.bpe_encode(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    // abc -> [ab, c] -> [abc]; abd -> [ab, d] (no learned merge for (ab, d))
    assert(toks === Seq("abc", "abc", "ab", "d"))
  }
}
