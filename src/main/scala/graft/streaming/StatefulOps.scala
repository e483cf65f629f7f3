package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state for SURVEY.md §2.1.H `stream_stateful_custom`:
  * per-user running "events since last signup" counter, emitted per
  * event. The batch-declared equivalent (window formulation) is in
  * `operators.Streaming`; StreamingSpec asserts this streaming
  * implementation produces the identical rows run-to-completion.
  *
  * Scale notes: state is one Long per user, partitioned by user_id
  * across executors — O(distinct users) total, independent of event
  * volume. EventTimeTimeout + watermark would evict idle users in a
  * production deployment.
  */
object StatefulOps {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String)
  case class SinceSignup(event_id: Long, user_id: Long, events_since_signup: Long)

  /** Events within a micro-batch arrive as an Iterator in no guaranteed
    * order — sort by (ts, event_id) before folding, exactly the order the
    * batch window formulation uses.
    */
  def flatMapFn(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[Long]): Iterator[SinceSignup] = {
    var counter: Long = state.getOption.getOrElse(0L)
    val out = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
      if (e.event_type == "signup") counter = 0L
      else counter += 1L
      val emitted = SinceSignup(e.event_id, userId, counter)
      emitted
    }
    state.update(counter)
    out.iterator
  }

  /** Apply the stateful transform to a (possibly streaming) typed event
    * dataset.
    */
  def eventsSinceSignup(spark: SparkSession, events: Dataset[Event]): Dataset[SinceSignup] = {
    implicit val eventEnc = Encoders.product[Event]
    implicit val outEnc = Encoders.product[SinceSignup]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(flatMapFn)
  }

  /** The same counter on Spark 4's transformWithState API (arbitrary
    * stateful processing v2): explicit named ValueState, TTL-capable,
    * RocksDB-backed. StreamingRobustnessSpec proves it emits the same
    * rows as the flatMapGroupsWithState implementation.
    */
  class SinceSignupProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SinceSignup] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var counter: ValueState[Long] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      counter = getHandle.getValueState[Long](
        "since_signup", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        userId: Long,
        rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SinceSignup] = {
      var c: Long = if (counter.exists()) counter.get() else 0L
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        if (e.event_type == "signup") c = 0L else c += 1L
        SinceSignup(e.event_id, userId, c)
      }
      counter.update(c)
      out.iterator
    }
  }

  /** transformWithState variant (requires the RocksDB state store
    * provider on streaming input).
    */
  def eventsSinceSignupTws(spark: SparkSession, events: Dataset[Event]): Dataset[SinceSignup] = {
    import org.apache.spark.sql.streaming.TimeMode
    implicit val outEnc = Encoders.product[SinceSignup]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(new SinceSignupProcessor, TimeMode.None(), OutputMode.Append())
  }
}
