package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Per-driver-run memo for the gate family's deterministic inputs
  * (round-11 verdict item #1): the `q_gate_*` keys deliberately run
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
  * localCheckpoint — NOT persist() — is load-bearing for timing
  * honesty: persist registers the plan with Catalyst's CacheManager,
  * which substitutes the cached relation into ANY later query whose
  * plan matches, so a gate-warmed cache would silently serve the
  * live-benchmarked operator key with the same plan (q_similarity_topk
  * runs AFTER the gate family in the bench's sorted order). A
  * localCheckpoint materializes blocks without registering anything.
  *
  * Lifetime (round-12 advice): entries for a DIFFERENT sfDir are
  * evicted — their checkpointed RDD blocks unpersisted — the moment a
  * new sfDir is first memoized, so a long-lived session that walks
  * several scale factors holds at most one sfDir's worth of cached
  * blocks; the memo can no longer grow without bound. Evicted frames
  * are dead (checkpoint truncates lineage, so an unpersisted one cannot
  * recompute), which is exactly the contract: nothing reads a memo
  * entry for an sfDir the run has moved past.
  *
  * SCOPE RULE (timing honesty): only `Gates` and fixture SYNTHESIS may
  * read this cache. Operator keys (`q_ann_ivf`, `q_neardup`, …) always
  * compute live — a gate warming the cache must never make an operator
  * key's benchmark timing look faster than its real plan.
  */
private[graft] object GateMemo {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Any]

  /** Root of every gate fixture's on-disk work area (the CDC feeds,
    * SnapshotStores, and streaming checkpoints the `q_gate_*` keys
    * build). One shared root so the bench can reclaim the WHOLE gate
    * family's disk footprint — file blocks still sitting in the OS
    * page cache included — in one rmrf at the gate-family boundary
    * (round-17 verdict item #1: `evictAll()` freed the memo's
    * block-manager fixtures but left ~the gates' store dirs on disk,
    * and their page-cache residue is the suspected mechanism behind
    * the recurring post-gate inflation of the checkpoint-heavy graph
    * keys). Each gate still rmrf's its own subdir on entry, so
    * reclaiming here never breaks a later re-run. */
  val WorkRoot = "/root/repo/target/gate_work"

  /** Delete the shared gate work root (see [[WorkRoot]]); called by
    * the bench at the gate-family boundary alongside [[evictAll]].
    * Safe mid-session: gates rebuild their subdirs from scratch. */
  private[graft] def evictWorkDirs(): Unit =
    graft.LocalFs.rmrf(new java.io.File(WorkRoot))

  /** Drop every entry whose sfDir differs from `keep`, unpersisting any
    * cached frame's checkpointed blocks. Cheap no-op when the cache
    * already holds only `keep` entries (the common single-sfDir run). */
  private def evictOtherDirs(keep: String): Unit =
    cache.keys.filter(_._2 != keep).foreach { k =>
      cache.remove(k).foreach {
        case ds: Dataset[_] => unpersistCheckpoint(ds)
        case _ => ()
      }
    }

  /** Drop EVERY entry, unpersisting cached frames' checkpointed blocks.
    * The bench calls this at the gate-family boundary (the registry
    * runs alphabetically, so every `q_gate_*` key precedes every later
    * operator key): the memo exists to amortize twins WITHIN the gate
    * family, but its checkpointed fixtures would otherwise occupy the
    * block manager for the entire rest of the capture — the round-15
    * driver capture showed the checkpoint-juggling graph keys paying
    * for that occupancy with 2x eviction-churn inflation. After the
    * last gate key nothing reads the memo again (the scope rule:
    * operator keys always compute live), so the blocks are pure dead
    * weight there. */
  private[graft] def evictAll(): Unit =
    cache.keys.foreach { k =>
      cache.remove(k).foreach {
        case ds: Dataset[_] => unpersistCheckpoint(ds)
        case _ => ()
      }
    }

  /** Free a localCheckpointed frame's blocks: the checkpoint's plan is
    * a LogicalRDD over the materialized RDD — unpersist that RDD; plans
    * of any other shape are left alone (defensive: nothing else is ever
    * stored). Shared with iterative operators (the k-core peel, the
    * graph family's end-of-key cleanup) that supersede a checkpointed
    * frame — the unpersisted frame is DEAD (checkpoint truncated its
    * lineage), so call this only once nothing will read it again. */
  private[graft] def unpersistCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Memoize an arbitrary deterministic value (e.g. a trained k-means
    * model) for this (session, sfDir). */
  def value[A](s: SparkSession, d: String, name: String)(f: => A): A = {
    evictOtherDirs(d)
    cache.getOrElseUpdate((s.sparkContext.applicationId, d, name), f)
      .asInstanceOf[A]
  }

  /** Memoize a deterministic DataFrame, materialized so every later
    * read (including driver-side collects in other gates) is a
    * block-cache scan, not a recomputation. */
  def frame(s: SparkSession, d: String, name: String)(f: => DataFrame): DataFrame =
    value(s, d, name)(f.localCheckpoint(true))
}
