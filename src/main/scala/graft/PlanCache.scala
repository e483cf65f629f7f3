package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Plan-keyed memo for expensive shared stages (the near-dup pair table,
  * the connected-component labels, the decontamination shingle frame).
  *
  * Lifecycle contract (VERDICT r5 #1/#5, ADVICE r5 #1):
  *
  *  - **Atomic find-or-compute.** The monitor is held across the compute,
  *    so two concurrent callers can never both miss and duplicate the
  *    expensive stage: the second blocks, then reads the first's entry.
  *    Blocking is the *desired* behavior here — every caller of a shared
  *    stage wants exactly the frame the first caller is building.
  *  - **Freshness.** Lookup compares the candidate's analyzed plan with
  *    `sameResult` (a different input directory is a different plan →
  *    distinct entry) and skips entries whose owning SparkContext has
  *    stopped — a session restart can therefore never resurface dead
  *    checkpoint RDDs.
  *  - **Bounded + explicitly released.** At most `capacity` live entries;
  *    eviction (capacity overflow, `evictAll`) actively frees the blocks:
  *    cached frames via `unpersist`, localCheckpoint frames by
  *    unpersisting the underlying `LogicalRDD`'s RDD (a plain
  *    `DataFrame.unpersist` is a no-op for those — they live in the
  *    block manager, not the CacheManager). `evictAll` is the hook a
  *    long-lived session calls between corpora; Bench/Verify sessions are
  *    one-shot so session end releases everything regardless.
  */
private[graft] final class PlanCache(capacity: Int) {

  private val entries =
    new scala.collection.mutable.ArrayBuffer[(LogicalPlan, DataFrame)]()

  /** Return the memoized frame equivalent to `fresh`'s plan, or run
    * `compute` (which must materialize — cache/localCheckpoint — its
    * result) and remember it. Key is `fresh`'s analyzed plan; the stored
    * value may be a different frame (e.g. labels computed FROM the pair
    * plan).
    */
  def getOrCompute(fresh: DataFrame)(compute: DataFrame => DataFrame): DataFrame =
    synchronized {
      val key = fresh.queryExecution.analyzed
      // drop dead-context entries first: their blocks died with the
      // context, and returning one would be a dead-RDD error downstream
      entries.filterInPlace { case (_, df) =>
        !df.sparkSession.sparkContext.isStopped
      }
      entries.find(_._1.sameResult(key)) match {
        case Some((_, df)) => df
        case None =>
          val built = compute(fresh)
          if (entries.sizeIs >= capacity) release(entries.remove(0)._2)
          entries += ((key, built))
          built
      }
    }

  /** Free every live entry's storage and clear the cache. */
  def evictAll(): Unit = synchronized {
    entries.foreach { case (_, df) =>
      if (!df.sparkSession.sparkContext.isStopped) release(df)
    }
    entries.clear()
  }

  private def release(df: DataFrame): Unit = {
    // a localCheckpoint-derived frame is (a projection over) a LogicalRDD
    // backed by block-manager storage; unpersist the leaf RDDs themselves
    // to actually free the blocks — DataFrame.unpersist only talks to the
    // CacheManager and is a no-op for checkpoint frames
    val checkpointLeaves = df.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    if (checkpointLeaves.nonEmpty) checkpointLeaves.foreach(_.unpersist(blocking = false))
    else df.unpersist(blocking = false)
  }
}
