package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Exact._

/** C-block streaming (SURVEY §2 C3/C4): the same event computations as the
  * batch operators, expressed over Structured Streaming. Batch/stream parity
  * is pinned by StreamingSpec (stream result == Relational.eventsWindowAgg /
  * eventsSession on the same data).
  */
object Streams {

  /** C3 — tumbling-window count/sum with a 1-hour watermark: late data past
    * the watermark is dropped, windows finalize (and emit, in append mode)
    * once the watermark passes their end.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** Event with microsecond-precision epoch time (Timestamp round-trips
    * through ms and silently drops the µs the batch operators keep).
    */
  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class SessionState(start: Long, end: Long, n: Int)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** C4 — stateful sessionization with flatMapGroupsWithState: one open
    * session per user lives in the state store; events extend it or close it
    * (emitting the finished session). The same 30-minute gap rule as the
    * batch `events_session` operator.
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          val sorted = evs.map(_.ts_us).toArray.sorted
          var open: Option[SessionState] = state.getOption.flatMap(_.headOption)
          val closed = scala.collection.mutable.ArrayBuffer[SessionState]()
          sorted.foreach { t =>
            open match {
              case Some(sess) if t - sess.end <= GapUs =>
                open = Some(sess.copy(end = t, n = sess.n + 1))
              case Some(sess) =>
                closed += sess
                open = Some(SessionState(t, t, 1))
              case None =>
                open = Some(SessionState(t, t, 1))
            }
          }
          open match {
            case Some(sess) => state.update(List(sess))
            case None => state.remove()
          }
          closed.iterator.map(sess => SessionOut(userId, sess.start, sess.end, sess.n))
      }
  }
}
