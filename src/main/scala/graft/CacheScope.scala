package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for operator-cached intermediates.
  *
  * Several operator families persist an expensive intermediate that the
  * RETURNED LAZY PLAN reads more than once — the Ed-Join auto dispatcher's
  * prefix table (Fuzzy.editDistanceJoinAuto), the image-dedup phash table
  * (Multimodal.imageNearDup), the embedding signature table
  * (Similarity.embeddingNearDup), the curation funnel stages
  * (Curation.curate). None of them can unpersist inside the operator:
  * the consumer plan is still lazy, and an eager release would either
  * force materialization (breaking the lazy-plan contract FuzzySpec
  * locks) or evict the block before the consumer runs.
  *
  * Before this helper each family documented its own footgun ("release
  * with spark.catalog.clearCache() between corpora") and relied on the
  * caller remembering. Now every such cache registers HERE at pin time,
  * and the caller has one documented boundary:
  *
  *   - [[release]](spark) — unpersist every intermediate this session's
  *     operators pinned, once their consuming plans have been executed
  *     (between corpora in a loop, after a pipeline's outputs are
  *     written). Blocking=false: eviction is safe to overlap with
  *     unrelated work.
  *   - `spark.catalog.clearCache()` still works (pins go through the
  *     normal persist machinery) but also drops caches the CALLER made,
  *     and leaves this registry's entries behind — harmless (a later
  *     release() unpersists already-uncached plans as a no-op) but the
  *     entries themselves only clear on release(); a looping driver
  *     should call release() so neither blocks nor registry grow.
  *
  * Pinned entries default to MEMORY_AND_DISK (corpus-scale intermediates
  * must spill, not evict — losing a block mid-join re-runs the whole
  * producing stage). The registry holds plan references, not data;
  * entries of STOPPED sessions are pruned on every pin, so a driver
  * cycling sessions does not accumulate dead plans even if it never
  * calls release().
  */
object CacheScope {

  private val registry =
    mutable.Map.empty[SparkSession, mutable.Buffer[DataFrame]]

  /** Drop registry entries of stopped sessions — their executors (and
    * blocks) are gone, so the plans are dead weight on the driver heap.
    * Called opportunistically from pin(); must hold the registry lock.
    */
  private def pruneStopped(): Unit =
    registry.filterInPlace((s, _) => !s.sparkContext.isStopped)

  /** Persist `df` and register it for session-boundary release. Returns
    * `df` (still lazy — nothing is materialized here).
    */
  def pin(df: DataFrame,
          level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    registry.synchronized {
      pruneStopped()
      registry.getOrElseUpdate(df.sparkSession, mutable.Buffer.empty) += df
    }
    df
  }

  /** Unpersist `df` AND drop its registry entry — for dispatch branches
    * that release a pinned intermediate eagerly because nothing
    * downstream references it (editDistanceJoinAuto's segment regime).
    * A bare `unpersist` there would leave the dead plan reference in
    * the registry until a release() that may never come in a long-lived
    * session. Identity match (`eq`): unpin exactly the pinned plan
    * object, never an equal-looking sibling.
    */
  def unpin(df: DataFrame): Unit = {
    registry.synchronized {
      registry.get(df.sparkSession).foreach { buf =>
        val i = buf.indexWhere(_ eq df)
        if (i >= 0) buf.remove(i)
      }
    }
    df.unpersist(blocking = false)
  }

  /** Unpersist every intermediate operators pinned on `spark`. Call once
    * the consuming plans have executed — between corpora, or after a
    * pipeline's outputs are written.
    */
  def release(spark: SparkSession): Unit = {
    val pinned = registry.synchronized(registry.remove(spark))
    pinned.foreach(_.foreach(_.unpersist(blocking = false)))
  }

  /** Number of currently-registered pins for `spark` (observability +
    * spec hook).
    */
  def pinnedCount(spark: SparkSession): Int =
    registry.synchronized(registry.get(spark).map(_.size).getOrElse(0))
}
