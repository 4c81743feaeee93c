package graft.search

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Bounded FIFO registry for the per-call query broadcasts the heap-cut
  * batch plans ship (`VectorDistanceMulti`/`BatchTopKAgg` matrices ride
  * generated-class state via `addReferenceObj`, so ContextCleaner's
  * GC-based cleanup only fires once the caller's plan itself is garbage
  * — a serving loop issuing millions of batches accumulates driver and
  * executor broadcast blocks far ahead of any GC).
  *
  * Every heap-cut broadcast registers here; beyond
  * `spark.graft.batch.broadcastHandles` live handles (default 256) the
  * OLDEST is destroyed — block-manager blocks released on driver and
  * executors immediately, not at the next full GC. The bound is the max
  * number of in-flight batch plans: a plan older than `bound` newer
  * batch calls can no longer be re-executed (its matrix is gone), which
  * is the documented trade-off of a bounded registry — callers that
  * cache a batch DataFrame for re-execution beyond that window should
  * raise the bound (or set it to 0 = never destroy, the pre-r14
  * behavior).
  */
object BroadcastHandles {
  private val handles = new java.util.ArrayDeque[Broadcast[_]]()

  /** Live (not yet destroyed) handles registered by batch plans. */
  def liveCount: Int = synchronized { handles.size }

  /** Register a freshly-created per-call broadcast; destroys the oldest
    * registered handles beyond the configured bound. Returns `bc`. */
  def register[T](spark: SparkSession, bc: Broadcast[T]): Broadcast[T] = {
    val bound = spark.conf.getOption("spark.graft.batch.broadcastHandles")
      .map(_.toInt).getOrElse(256)
    if (bound > 0) synchronized {
      handles.addLast(bc)
      while (handles.size > bound) {
        // non-blocking destroy: the release is async, the handle is
        // immediately unusable — a stopped context makes this a no-op
        try handles.pollFirst().destroy()
        catch { case _: Exception => }
      }
    }
    bc
  }
}
