package graft.queries

import scala.collection.concurrent.TrieMap

/** Side-channel for bench interpretability: a query builder whose wall
  * clock is dominated by fixed scaffolding (temp dirs, checkpoint setup,
  * controlled kill/restart) records a breakdown here, and Bench emits it
  * as an `aux` object in the JSON artifact — so a 3.6 s streaming
  * headline is never mistaken for per-record cost. Keys are query names;
  * values are (field, value) pairs. The last run wins (Bench reruns each
  * builder warmup+5x; the steady-state split is what lands in the
  * artifact). Not consulted by any query logic.
  */
object BenchAux {
  private val m = TrieMap.empty[String, Seq[(String, Double)]]
  def put(name: String, fields: (String, Double)*): Unit = m.put(name, fields.toSeq)
  def get(name: String): Option[Seq[(String, Double)]] = m.get(name)
}
