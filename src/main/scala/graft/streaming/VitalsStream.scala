package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming variant of the vitals pipeline (SURVEY.md §7.5):
  * the reference's "incremental load" is a re-run batch MERGE; the true
  * streaming upgrade path is readStream → clean → watermark →
  * dedup-within-watermark → windowed aggregation → append sink.
  *
  * All transforms are the SAME Column expressions the batch pipeline uses
  * (graft.engine.Cleaning) — Structured Streaming's incrementalization is
  * what changes, not the logic. State is bounded by the watermark: late
  * events beyond `lateness` are dropped, and the dedup/window state for
  * closed windows is evicted — this is what keeps the operator memory
  * footprint flat on an unbounded stream.
  */
object VitalsStream {

  /** Clean a (possibly dirty) streaming vitals frame: same union-type
    * cleaning as batch silver (value | token | null → typed | null).
    */
  def clean(raw: DataFrame): DataFrame = {
    import graft.engine.Cleaning
    raw.select(
      col("vital_id"), col("patient_id"),
      Cleaning.cleanCast(col("temperature"), org.apache.spark.sql.types.DoubleType).as("temperature"),
      Cleaning.cleanCast(col("heart_rate"), org.apache.spark.sql.types.IntegerType).as("heart_rate"),
      Cleaning.cleanTimestamp(col("ts")).as("ts"))
      .na.drop(Seq("vital_id", "patient_id", "ts"))
  }

  /** Exactly-once-per-key within the watermark: duplicate vital_ids arriving
    * inside `lateness` are dropped (the streaming analogue of the batch
    * dropDuplicates, with bounded state).
    */
  def dedupWithinWatermark(cleaned: DataFrame, lateness: String): DataFrame =
    cleaned
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("vital_id")

  /** Per-patient tumbling-window vital aggregates (append mode: a window
    * emits once its watermark passes — deterministic, replayable output).
    */
  def windowedVitals(deduped: DataFrame, windowLen: String): DataFrame =
    deduped
      .groupBy(col("patient_id"), window(col("ts"), windowLen).as("w"))
      .agg(
        count(lit(1)).as("n_readings"),
        avg(col("heart_rate")).as("avg_hr"),
        max(col("temperature")).as("max_temp"))
      .select(
        col("patient_id"),
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("n_readings"), col("avg_hr"), col("max_temp"))

  /** Full logical pipeline: clean → dedup-in-watermark → windowed agg. */
  def pipeline(raw: DataFrame, lateness: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    windowedVitals(dedupWithinWatermark(clean(raw), lateness), windowLen)

  /** Gap-based SESSION windows per patient (the streaming twin of the batch
    * sessionize query): a session closes after `gap` of silence, emitting
    * once the watermark passes — session state is merged incrementally and
    * bounded by the watermark like any windowed aggregate.
    */
  def sessionVitals(deduped: DataFrame, gap: String): DataFrame =
    deduped
      .groupBy(col("patient_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_readings"), avg(col("heart_rate")).as("avg_hr"))
      .select(
        col("patient_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_readings"), col("avg_hr"))

  /** Simple anomaly flags on the cleaned stream (stateless — pure map). */
  def anomalies(cleaned: DataFrame): DataFrame = {
    val feverish: Column = col("temperature") > 103.0
    val tachy: Column = col("heart_rate") > 120
    cleaned.filter(feverish || tachy)
      .withColumn("anomaly",
        when(feverish && tachy, "fever+tachycardia")
          .when(feverish, "fever").otherwise("tachycardia"))
  }
}
