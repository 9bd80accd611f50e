package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-driver-run memo for the gate family's deterministic inputs
  * (round-11 verdict item #1): the 19 `q_gate_*` keys deliberately run
  * an approximate operator AND its exact twin, and several gates share
  * the same twin (7 ANN gates re-rank against `q_similarity_topk`,
  * 3 dedup gates against `q_neardup`, the relations gate re-runs the
  * full exact discover). Re-computing each twin per gate cost 53.5 s —
  * 35% of the round-11 bench — for identical deterministic frames.
  *
  * Every frame cached here is either a top-k list, a pair list, a
  * per-group aggregate, or a fixture slice — small by the same bound
  * that makes the gates' driver-side collects safe. Materialization is
  * `localCheckpoint` (block-manager memory+disk), keyed by
  * (applicationId, sfDir, name) so a fresh session recomputes.
  *
  * SCOPE RULE (timing honesty): only `Gates` and fixture SYNTHESIS may
  * read this cache. Operator keys (`q_ann_ivf`, `q_neardup`, …) always
  * compute live — a gate warming the cache must never make an operator
  * key's benchmark timing look faster than its real plan.
  */
private[graft] object GateMemo {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Any]

  /** Memoize an arbitrary deterministic value (e.g. a trained k-means
    * model) for this (session, sfDir). */
  def value[A](s: SparkSession, d: String, name: String)(f: => A): A =
    cache.getOrElseUpdate((s.sparkContext.applicationId, d, name), f)
      .asInstanceOf[A]

  /** Memoize a deterministic DataFrame, materialized so every later
    * read (including driver-side collects in other gates) is a
    * block-cache scan, not a recomputation. */
  def frame(s: SparkSession, d: String, name: String)(f: => DataFrame): DataFrame =
    value(s, d, name)(f.localCheckpoint(true))
}
