package graft.util

import org.apache.spark.sql.DataFrame

/** Release handle for the persisted intermediates an operator keeps
  * alive past its return (e.g. [[graft.operators.GlobalIndex]]'s
  * range-materialized frame, [[graft.operators.Dedup.duplicatedSpans]]'s
  * span-hash frame). The returned DataFrame is lazy, so the operator
  * itself has no after-the-final-action hook to unpersist at; a
  * library caller composing operators in one session calls
  * `handle.release()` once it has consumed the result, instead of the
  * blunt `spark.catalog.clearCache()` (which evicts every unrelated
  * cache too). Releasing before the final action is safe — lineage is
  * intact, Spark just recomputes — it only forfeits the reuse the
  * persist existed for.
  */
final class CacheHandle private[graft] (
    private[util] val frames: Seq[DataFrame]) {
  def release(blocking: Boolean = false): Unit =
    frames.foreach(_.unpersist(blocking))
}

object CacheHandle {
  private[graft] def apply(frames: DataFrame*): CacheHandle =
    new CacheHandle(frames)
  /** For operators that fully release their own intermediates. */
  val none: CacheHandle = new CacheHandle(Nil)
  /** One handle releasing everything the given handles hold — for
    * operators composing several cache-holding stages. */
  private[graft] def combine(handles: CacheHandle*): CacheHandle =
    new CacheHandle(handles.flatMap(_.frames))
}
