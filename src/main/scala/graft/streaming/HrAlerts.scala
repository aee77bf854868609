package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input reading for the alert operator (typed — custom state runs on a
  * Dataset, not a DataFrame).
  */
case class VitalReading(patient_id: String, hr: Int, ts: Timestamp)

/** Per-patient operator state: current streak of above-threshold readings
  * and its first event time. O(1) per key regardless of stream length.
  */
case class HrStreakState(streak: Int, firstTs: Timestamp, lastTs: Timestamp)

/** Emitted alert: `streakLen` consecutive readings above the threshold. */
case class HrAlert(patient_id: String, streak: Int, first_ts: Timestamp, last_ts: Timestamp)

/** Custom-state streaming: detect `streakLen` CONSECUTIVE above-threshold
  * heart-rate readings per patient — a pattern neither windowed aggregation
  * nor `session_window` can express (the condition is about ordered runs,
  * not time buckets). This is the `flatMapGroupsWithState` design point
  * (SURVEY.md §7.5): explicit per-key state with an event-time timeout.
  *
  * Scale properties: state is one small case class per ACTIVE patient;
  * the event-time timeout (watermark + `idleGap`) evicts keys that go
  * quiet, so state size tracks concurrently-active patients, not total
  * patients ever seen. One shuffle (groupByKey on patient).
  *
  * Within a micro-batch the iterator is sorted by event time before
  * folding — Spark does not order rows inside a group — and an alert fires
  * exactly once per crossing (at the reading that completes the streak;
  * the streak then keeps counting so a longer run fires once, not N times).
  */
object HrAlerts {

  def alerts(
      readings: Dataset[VitalReading],
      threshold: Int,
      streakLen: Int,
      lateness: String = "10 minutes",
      idleGap: String = "1 hour"): Dataset[HrAlert] = {
    val spark = readings.sparkSession
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(idleGap))
    // A calendar-month component has no fixed millisecond width; silently
    // contributing 0 here would make the timeout fire almost immediately
    // and evict live streak state. Day-time intervals only.
    require(gapMs.months == 0,
      s"idleGap '$idleGap' has a calendar-month component; use a day-time interval")
    val gapMillis = gapMs.days * 86400000L + gapMs.microseconds / 1000L

    def fold(
        patientId: String,
        rows: Iterator[VitalReading],
        state: GroupState[HrStreakState]): Iterator[HrAlert] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var st = state.getOption.getOrElse(HrStreakState(0, null, null))
        val out = Seq.newBuilder[HrAlert]
        sorted.foreach { r =>
          st =
            if (r.hr > threshold) {
              val first = if (st.streak == 0) r.ts else st.firstTs
              HrStreakState(st.streak + 1, first, r.ts)
            } else HrStreakState(0, null, null)
          if (st.streak == streakLen)
            out += HrAlert(patientId, st.streak, st.firstTs, r.ts)
        }
        state.update(st)
        sorted.lastOption.foreach(r =>
          state.setTimeoutTimestamp(r.ts.getTime + gapMillis))
        out.result().iterator
      }
    }

    readings
      .withWatermark("ts", lateness)
      .groupByKey(_.patient_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }
}
