package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events stream: watermarked
  * tumbling-window aggregation (the streaming form of the batch hourly
  * rollup, q10) and gap-based sessionization via custom keyed state
  * (`flatMapGroupsWithState`).
  *
  * Scale notes: windowed aggregation shuffles on (window, event_type) with
  * partial aggregation map-side; state store size is bounded by the
  * watermark horizon. Sessionization keeps one small state object per user;
  * event-time timeout evicts idle sessions, so state is proportional to
  * *active* users, not history.
  */
object EventStreams {

  /** Tumbling event-time window counts/sums with a late-data watermark. */
  def windowedAggregate(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Stream-stream interval join (the streaming attribution shape): every
    * left row paired with right rows of the same key whose event time lies
    * in [leftTs - before, leftTs + after]. Both sides carry watermarks and
    * the join predicate bounds BOTH event times, so Spark derives a state
    * watermark per side and evicts buffered rows once they can no longer
    * match — state is bounded by watermark + interval width, never by
    * stream length (the batch twin is [[graft.ops.TemporalJoin
    * .intervalJoin]]; at 100 TB/day the bounded state is the whole
    * point). Column names must be disjoint across sides apart from the
    * join key; the result carries left columns + `right`-prefixed
    * payload. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, before: String, after: String,
      watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= expr(s"l.$leftTs - INTERVAL $before") &&
        col(s"r.$rightTs") <= expr(s"l.$leftTs + INTERVAL $after"))
      .drop(col(s"r.$key"))
  }

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  // start/lastTs in MICROS: Timestamp.getTime is millis-truncating, and the
  // batch twin (q42) compares session bounds at unix_micros precision
  case class SessionState(start: Long, lastTs: Long, nEvents: Int, total: Double)
  case class Session(user_id: Long, start_ts: java.sql.Timestamp,
      end_ts: java.sql.Timestamp, n_events: Int, total_value: Double)

  private def toUs(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000
  }
  private def fromUs(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Gap-based sessionization: a session closes after `gapMs` of user
    * inactivity (event-time timeout). Emits one row per closed session. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, fromUs(s.start),
              fromUs(s.lastTs), s.nEvents, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => toUs(e.ts))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = toUs(e.ts)
              cur match {
                case Some(s) if t - s.lastTs <= gapUs =>
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, t),
                    nEvents = s.nEvents + 1, total = s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, fromUs(s.start),
                    fromUs(s.lastTs), s.nEvents, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp: a late event (ts behind the watermark) would otherwise
              // set a timeout in the past — setTimeoutTimestamp throws and
              // kills the whole streaming query. Timeout API is millis;
              // round the micros-precision deadline UP so a timeout can
              // never fire a fraction of a gap early.
              state.setTimeoutTimestamp(
                math.max(-Math.floorDiv(-(s.lastTs + gapUs), 1000L),
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Batch mirror of [[windowedAggregate]] for oracle-style comparison —
    * identical semantics on a bounded input. */
  def windowedAggregateBatch(events: DataFrame, window_ : String = "1 hour")
      : DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
}
