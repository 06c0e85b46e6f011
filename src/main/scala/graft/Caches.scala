package graft

import org.apache.spark.sql.Dataset

/** Registry for persisted intermediate frames with an explicit lifecycle.
  *
  * Operators that must materialize an intermediate (e.g. the range-
  * partitioned frame in [[graft.etl.Migration.surrogateKeysScaled]], whose
  * persist pins one evaluation of the range exchange so both consuming
  * branches see identical partition boundaries) register it here at
  * construction time. [[releaseAll]] unpersists every registered frame —
  * called by [[graft.ops.Dedup.clearCaches]], which the Verify/Bench mains
  * already invoke, so a long-lived session embedding this library releases
  * every operator cache through one entry point instead of leaking blocks
  * until GC + ContextCleaner happen to reclaim them (round-4 ADVICE).
  *
  * Contract: after `releaseAll()`, previously returned query plans remain
  * executable but re-evaluate their inputs uncached — callers re-running a
  * boundary-sensitive plan (surrogate keys, scaled ntile) should rebuild it
  * rather than re-execute a released one.
  */
object Caches {

  private val frames = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Register an already-persisted frame for later release; returns it. */
  def register[T <: Dataset[_]](df: T): T = synchronized {
    frames += df
    df
  }

  /** Unpersist and forget every registered frame. Blocking: the release is
    * a lifecycle boundary (end of a query batch), and a non-blocking release
    * here dumps the ContextCleaner/GC churn of the whole batch onto whatever
    * runs next — round-7 bench showed that churn landing on the head of the
    * following measurement pass and inflating unrelated queries 2-4×.
    */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = true))
    frames.clear()
  }
}
