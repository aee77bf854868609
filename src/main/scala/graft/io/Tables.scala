package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.hadoop.fs.{FileSystem, Path}

/** Path-based "catalog" replacing the reference's Databricks metastore +
  * Delta tables (reference: Notebooks/Silver Layer.py:120, Gold Layer.py:16-21).
  *
  * No Delta jars ship with /opt/spark/jars, so atomicity is run-level: writes
  * go to a staging directory and are swapped in with a rename. At cluster
  * scale this maps onto an HDFS/object-store rename (O(1) on HDFS; on S3-style
  * stores a committer would replace the swap — the API boundary is here so
  * only this object changes).
  */
object Tables {

  /** Read one of the driver's testdata tables (TESTDATA.md).
    *
    * events.ts is written as parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects; with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench sessions) it arrives as epoch-nanos LongType and is
    * converted here to a microsecond TimestampType (integer `div`, not
    * double division — epoch nanos exceed 2^53).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Overwrite `path` atomically: write to `path.__staging__`, then swap.
    * Mirrors the reference's `mode("overwrite").saveAsTable`
    * (Silver Layer.py:120 etc.) without Delta's txn log.
    */
  def overwrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + ".__staging__")
    val target = new Path(path)
    val old = new Path(path + ".__old__")
    if (fs.exists(staging)) fs.delete(staging, true)
    val writer = df.write.mode("overwrite")
    val w = if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    w.parquet(staging.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(staging, target)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Partitioned fact sink — reference partitions facts by (year, month)
    * "for performance" (Gold Layer.py:152-156,183-186,221-224). Preserving
    * this layout is what makes partition pruning fire at 100 TB.
    */
  def overwritePartitioned(df: DataFrame, path: String, parts: Seq[String]): Unit =
    overwrite(df, path, parts)

  /** Bucketed managed-table sink: pre-shuffles rows into `numBuckets` files
    * by `bucketCols` so every later equi-join/aggregation on those keys is
    * exchange-free (Spark reads the bucket spec from the catalog and plans
    * a zero-shuffle sort-merge join). The 100 TB pattern for fact⋈fact
    * joins that repeat across a workload: pay the shuffle once at write.
    */
  def saveBucketed(df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
