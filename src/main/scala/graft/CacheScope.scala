package graft

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame

/** Ownership handles for operator-internal caches.
  *
  * Several operators persist intermediates that their RETURNED plan still
  * reads (DedupOps.hashedSets' shingle sets, the CC loop's star frame,
  * CorpusPipeline.curate's shared enrichment pass, ivfTrain's codebook).
  * The frames must stay cached until the caller's consuming action, so
  * the operator cannot unpersist them itself — but without a handle the
  * caller's only release lever was `spark.catalog.clearCache()`, which
  * nukes every cache in the session (hostile in a long-lived session
  * that holds unrelated cached tables).
  *
  * `capture` gives the caller precise ownership:
  * {{{
  *   val (pairs, release) = CacheScope.capture {
  *     DedupOps.minhashLshPairs(docs, "doc_id", "text")
  *   }
  *   pairs.write.parquet(out)   // caches live through the action
  *   release()                  // exactly the operator's caches dropped
  * }}}
  *
  * Mechanics: every operator-internal `persist` routes through
  * `register`, which notes the frame in the innermost active scope on
  * the CURRENT THREAD (plan construction is driver-side and
  * single-threaded per call; scopes are ThreadLocal so concurrent query
  * builders never see each other's frames). Outside any scope `register`
  * is a no-op passthrough — existing clearCache-based callers
  * (Bench/Verify) are unchanged. Nested captures own their frames
  * exclusively: an inner scope's frames belong to the inner release().
  *
  * `release()` is idempotent and safe on frames an operator already
  * unpersisted itself (loop intermediates): `unpersist` on a non-cached
  * frame is a Spark no-op.
  */
object CacheScope {

  private val current = new ThreadLocal[ListBuffer[DataFrame]]

  /** Route an operator-internal persist through the active scope (if
    * any). Returns the frame for chaining.
    */
  private[graft] def register(df: DataFrame): DataFrame = {
    val buf = current.get()
    if (buf != null) buf += df
    df
  }

  /** Run `body`, collecting every operator-internal persist it performs
    * on this thread. Returns (result, release): call release() after the
    * consuming action to drop exactly those caches (blocking=false).
    */
  def capture[T](body: => T): (T, () => Unit) = {
    val outer = current.get()
    val buf = ListBuffer.empty[DataFrame]
    current.set(buf)
    val result =
      try body
      catch {
        // the release handle is never returned on a failed build, so
        // frames the body already persisted would otherwise outlive it
        // with no owner — exactly the clearCache-only leak this class
        // exists to replace
        case t: Throwable =>
          buf.foreach(_.unpersist(false))
          throw t
      }
      finally current.set(outer)
    (result, () => buf.foreach(_.unpersist(false)))
  }

  /** Scoped convenience: build a frame, hand it to `use`, release the
    * operator caches afterwards even on failure.
    */
  def withScope[R, T](build: => R)(use: R => T): T = {
    val (built, release) = capture(build)
    try use(built)
    finally release()
  }
}
