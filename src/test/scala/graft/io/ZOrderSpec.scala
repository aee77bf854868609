package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order clustering: per-file min/max ranges must be narrow on EVERY
  * clustered column (that's what makes stats-based skipping work on any
  * of them), where a lexicographic sort leaves the non-prefix column at
  * full range in every file. Also: row preservation and the degenerate
  * cases (constant column, nulls).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Mean per-file (max-min) fraction of the global range for `c`. */
  private def meanRangeFrac(dir: String, c: String): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(_.getAbsolutePath)
    assert(files.length > 4, s"want >4 files, got ${files.length}")
    val global = spark.read.parquet(dir)
      .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val span = global.getDouble(1) - global.getDouble(0)
    val fracs = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      (r.getDouble(1) - r.getDouble(0)) / span
    }
    fracs.sum / fracs.length
  }

  test("both clustered columns get narrow per-file ranges; lex sort does not") {
    // Two independent uniform dimensions — the worst case for a
    // single-column sort, the design case for the curve.
    val n = 100000
    val df = spark.range(n).select(
      (hash(col("id")) % 10000).as("x"),
      (hash(col("id") + 7) % 10000).as("y"))

    val zDir = java.nio.file.Files.createTempDirectory("zord").toString + "/t"
    ZOrder.zOrdered(df, Seq("x", "y"), bits = 8, numPartitions = 16)
      .write.parquet(zDir)
    val lexDir = java.nio.file.Files.createTempDirectory("lex").toString + "/t"
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x", "y")
      .write.parquet(lexDir)

    // Same rows either way.
    assert(spark.read.parquet(zDir).count() == n)
    assert(spark.read.parquet(zDir).select("x", "y").except(df).count() == 0)

    val zx = meanRangeFrac(zDir, "x")
    val zy = meanRangeFrac(zDir, "y")
    val lx = meanRangeFrac(lexDir, "x")
    val ly = meanRangeFrac(lexDir, "y")
    // 16 files over an 8-bit-per-dim curve: each file covers a compact
    // z-range -> roughly 1/4 of each dimension; the lex layout nails x
    // but leaves y at ~full range everywhere.
    assert(zx < 0.5, s"z-order x frac $zx")
    assert(zy < 0.5, s"z-order y frac $zy")
    assert(lx < 0.2, s"lex x frac $lx")
    assert(ly > 0.8, s"lex y frac $ly")
  }

  test("degenerate inputs: constant column, nulls, tiny frames") {
    val df = Seq((1L, Option(5.0)), (2L, None), (3L, Option(5.0)))
      .toDF("a", "b")
    val out = ZOrder.zOrdered(df, Seq("a", "b"), bits = 4, numPartitions = 2)
    assert(out.count() == 3) // nulls and a constant column survive
    val const = ZOrder.zOrdered(df.withColumn("a", lit(1L)), Seq("a"), bits = 4)
    assert(const.count() == 3)
  }

  test("managed write round-trips through the versioned sink") {
    val dir = java.nio.file.Files.createTempDirectory("zw").toString + "/t"
    val df = spark.range(1000).select(col("id").as("x"), (col("id") % 7).as("y"))
    ZOrder.write(df, dir, Seq("x", "y"), bits = 6, numPartitions = 4)
    assert(Tables.read(spark, dir).count() == 1000)
  }
}
