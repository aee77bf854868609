package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the streaming form of the
  * batch fact⋈fact join (and the missing piece between `VitalsStream`'s
  * single-stream operators and `Scd2Sink`'s stream-to-table merge): vitals
  * readings join the admission event of the same patient that started
  * within the preceding `horizon`.
  *
  * Why the interval predicate matters at scale: a pure equi-join over two
  * unbounded streams would require unbounded state (every past admission
  * kept forever). The watermarks plus the `[adm_ts, adm_ts + horizon)`
  * bound give Spark a provable eviction rule — admission state older than
  * `watermark - horizon` and vitals state older than the watermark are
  * dropped — so executor state is O(events within horizon + lateness),
  * independent of stream length. Same declarative Column logic as batch;
  * incrementalization is Spark's.
  */
object StreamJoin {

  /** Inner interval join: vitals row at `ts` matches the admission with
    * equal patient_id whose `adm_ts` satisfies
    * `adm_ts <= ts < adm_ts + horizon`.
    *
    * @param lateness max event-time lateness tolerated on both streams
    * @param horizon  how long after admission a reading is attributed to it
    */
  def vitalsWithAdmission(
      vitals: DataFrame,
      admissions: DataFrame,
      lateness: String,
      horizon: String): DataFrame = {
    val v = vitals.withWatermark("ts", lateness)
    val a = admissions
      .select(col("admission_id"), col("patient_id").as("adm_patient_id"),
        col("adm_ts"), col("reason"))
      .withWatermark("adm_ts", lateness)
    v.join(a,
      col("patient_id") === col("adm_patient_id") &&
        col("adm_ts") <= col("ts") &&
        col("ts") < col("adm_ts") + expr(s"INTERVAL $horizon"))
      .drop("adm_patient_id")
  }
}
