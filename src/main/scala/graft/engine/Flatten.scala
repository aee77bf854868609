package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nested-data flattening — reference: billing `line_items` explode +
  * struct-field extraction (Silver Layer.py:151-157).
  */
object Flatten {

  /** One output row per element of `arrayCol`; the element lands in
    * `as`. Rows with null/empty arrays are dropped (explode semantics,
    * matching the reference).
    */
  def explodeArray(df: DataFrame, arrayCol: Column, as: String): DataFrame =
    df.withColumn(as, explode(arrayCol))

  /** Like explodeArray but also emits the element's 0-based position —
    * needed whenever element order is meaningful (e.g. embedding dims).
    */
  def explodeWithPosition(df: DataFrame, arrayCol: Column, posAs: String, elemAs: String): DataFrame =
    df.select(col("*"), posexplode(arrayCol).as(Seq(posAs, elemAs)))

  /** Extract struct fields of `structCol` to top-level columns
    * (Silver Layer.py:156-157 pattern: `col("line_item.service")`).
    */
  def extractFields(df: DataFrame, structCol: String, fields: Seq[String]): DataFrame =
    fields.foldLeft(df)((d, f) => d.withColumn(f, col(s"$structCol.$f")))
}
