package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** CLI: run the streaming vitals pipeline over a directory of NDJSON files
  * (file source = each new file is a micro-batch; drop new files into
  * <inDir> to see incremental output).
  *
  * Usage: runMain graft.streaming.RunVitalsStream <inDir> <outDir>
  * Writes windowed aggregates as parquet (append mode) and stops once the
  * available input is exhausted (Trigger.AvailableNow).
  */
object RunVitalsStream {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Streaming sources need a declared schema (no inference mid-stream);
    // dirty union-typed fields arrive as strings, same as batch silver.
    val schema = StructType(Seq(
      StructField("vital_id", StringType), StructField("patient_id", StringType),
      StructField("temperature", StringType), StructField("heart_rate", StringType),
      StructField("timestamp", StringType)))

    val raw = spark.readStream.schema(schema).json(inDir)
      .withColumnRenamed("timestamp", "ts")
    val q = VitalsStream.pipeline(raw, lateness = "10 minutes", windowLen = "1 hour")
      .writeStream
      .format("parquet")
      .option("path", s"$outDir/windowed")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.read.parquet(s"$outDir/windowed").count()
    println(s"[vitals-stream] windows_emitted=$n")
    spark.stop()
  }
}
