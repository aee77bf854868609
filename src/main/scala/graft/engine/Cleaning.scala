package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Error-token cleaning combinators — the workhorse of the reference's silver
  * layer (Silver Layer.py:26-57,188-210,297-303,399-416,507-517,590-610).
  *
  * The reference's raw data is a union type per dirty field:
  * typed-value | error-token | null (generate_hospital_data.py:26-36), which
  * Spark schema inference resolves to string. Every combinator here is a pure
  * `Column => Column` built from codegen'd built-ins (`when`/`isin`/`cast`/
  * `regexp_replace`) — no UDFs, so the whole clean stays inside
  * WholeStageCodegen and pushes through Catalyst untouched.
  */
object Cleaning {

  /** Tokens the reference treats as "bad" across entities:
    * "ERR" (Silver Layer.py:32,40), "EXP_ERR" (SL:298), "TEMP_ERR" (SL:592),
    * "COST_ERR" (SL:508), "BAD_AMOUNT" (SL:190), "-"/"null" (SL:54).
    */
  val DefaultBadTokens: Seq[String] =
    Seq("-", "null", "NULL", "ERR", "EXP_ERR", "TEMP_ERR", "COST_ERR", "BAD_AMOUNT", "N/A", "")

  /** value | token | null  →  value | null  (token→null). */
  def cleanTokens(c: Column, tokens: Seq[String] = DefaultBadTokens): Column =
    when(c.isNull.or(trim(c).isin(tokens: _*)), lit(null)).otherwise(c)

  /** Token-clean then cast; a failed cast yields null (try_cast semantics)
    * so the result is total: typed-value | null, never a leftover token.
    */
  def cleanCast(c: Column, dt: DataType, tokens: Seq[String] = DefaultBadTokens): Column =
    cleanTokens(c, tokens).try_cast(dt.sql)

  /** ISO date strings with error tokens → DateType (Silver Layer.py:30-43). */
  def cleanDate(c: Column, tokens: Seq[String] = DefaultBadTokens): Column =
    to_date(cleanTokens(c, tokens))

  /** ISO timestamp strings with error tokens → TimestampType (SL:607-610). */
  def cleanTimestamp(c: Column, tokens: Seq[String] = DefaultBadTokens): Column =
    to_timestamp(cleanTokens(c, tokens))

  /** Keep digits only — phone normalization (Silver Layer.py:413-416). */
  def digitsOnly(c: Column): Column = regexp_replace(c, "[^0-9]", "")

  /** Keep numeric chars (digits, '.', '-') — amount scrub (SL:184). */
  def numericScrub(c: Column): Column = regexp_replace(c, "[^0-9.\\-]", "")

  /** Scrub then cast to double, errors → `orElse` (reference uses 0.0
    * for billing amounts, SL:189-198).
    */
  def scrubbedDouble(c: Column, orElse: Column = lit(null)): Column =
    coalesce(numericScrub(c).try_cast("double"), orElse)

  /** Whitelist: value kept iff in `allowed`, else null (gender M/F/O,
    * Silver Layer.py:406-410).
    */
  def whitelist(c: Column, allowed: Seq[String]): Column =
    when(c.isin(allowed: _*), c).otherwise(lit(null))

  /** Cross-column sanity: end < start ⇒ end := null (discharge before
    * admission, Silver Layer.py:44-48).
    */
  def nullIfBefore(end: Column, start: Column): Column =
    when(end < start, lit(null)).otherwise(end)

  /** Text normalization used for `reason` (Silver Layer.py:49). */
  def titleTrim(c: Column): Column = initcap(trim(c))

  /** Quarantine split — the production upgrade of the reference's silent
    * `dropna` (SL:69): rows failing `required` non-null checks go to a
    * dead-letter frame (tagged with the reason) instead of vanishing, so
    * data loss is observable and replayable. Both frames derive from one
    * scan; Catalyst shares it when both are materialized in one action.
    */
  def quarantine(df: org.apache.spark.sql.DataFrame, required: Seq[String])
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val ok = required.map(col(_).isNotNull).reduce(_ && _)
    val reason = concat_ws(",",
      required.map(c => when(col(c).isNull, lit(c))): _*)
    (df.filter(ok), df.filter(!ok).withColumn("quarantine_reason", reason))
  }
}
