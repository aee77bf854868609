package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation via key salting (SURVEY.md §4 / builder prompt).
  *
  * AQE's skew-join handling (on by default in Spark 4) covers sort-merge
  * joins at runtime; these utilities cover the cases AQE does not:
  * aggregations over heavy-hitter keys, and joins where the skewed side
  * must pair with a replicable build side.
  *
  * Salts are derived from xxhash64 of designated spread columns —
  * deterministic (replayable plans, stable tests), no RNG state.
  */
object Skew {

  /** Deterministic salt in [0, buckets) spread by `spreadCols` (columns
    * that vary WITHIN a hot key — a row id, a timestamp…).
    */
  def saltCol(spreadCols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(spreadCols: _*), lit(buckets)).cast("int")

  /** Two-stage skew-proof SUM/COUNT aggregation: partial aggregate on
    * (keys + salt) — spreading a hot key over `buckets` reducers — then
    * final aggregate on keys. Identical result to a direct groupBy (sum and
    * count are associative); the map-side partial plus the salted exchange
    * bound any single reducer's load at 1/buckets of the hottest key.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      spreadCols: Seq[Column],
      buckets: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(spreadCols, buckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))

  /** Skew-proof inner equi-join: the big (skewed) side gets a salt from
    * `spreadCols`; the small side is replicated once per salt value so
    * every (key, salt) bucket finds its match. Join key cardinality grows
    * ×buckets, splitting a hot key's rows across `buckets` tasks. The
    * small side must tolerate ×buckets replication (dimension-sized).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      spreadCols: Seq[Column],
      buckets: Int = 16): DataFrame = {
    val bigS = big.withColumn("__salt", saltCol(spreadCols, buckets))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
