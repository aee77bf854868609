package graft.engine

import java.nio.file.Files

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** Materialize.pin in reliable mode: survives an outside
  * sc.setCheckpointDir hijack (re-installs the configured dir) and
  * never evicts a cache the CALLER created on the pinned frame.
  */
class MaterializeSpec extends SparkSpec {

  private def parquetless(dir: String): Long = {
    val d = new java.io.File(dir)
    if (!d.exists()) 0L
    else java.nio.file.Files.walk(d.toPath).filter(_.toFile.isFile).count()
  }

  test("external setCheckpointDir between pins does not hijack the reliable dir") {
    val dir = Files.createTempDirectory("mat_reliable").toString
    val hijack = Files.createTempDirectory("mat_hijack").toString
    spark.conf.set(Materialize.ReliableDirConf, dir)
    try {
      Materialize.pin(spark.range(10).toDF())
      val afterFirst = parquetless(dir)
      assert(afterFirst > 0, "first pin must checkpoint under the configured dir")
      // outside code points the context elsewhere (e.g. a graph library)
      spark.sparkContext.setCheckpointDir(hijack)
      Materialize.pin(spark.range(20).toDF())
      assert(parquetless(dir) > afterFirst,
        "pin after an external setCheckpointDir must re-install and land in the configured dir")
    } finally spark.conf.unset(Materialize.ReliableDirConf)
  }

  test("pinResetStats firewalls origin-plan stats in an iterative self-join loop") {
    import org.apache.spark.sql.functions._
    // The q61 shape: each round self-joins the previous round's pin. With
    // plain pin, checkpoint PRESERVES origin stats and the size-only join
    // estimate is the product of the children's sizeInBytes, so the
    // BigInt's bit length DOUBLES per round (measured driver-side
    // BigInteger.multiply blowup at sf10 — SCALING.md round-11). The
    // firewall must keep it constant.
    var plain = spark.range(100).select(col("id"), col("id").as("rep"))
      .localCheckpoint(true)
    var reset = Materialize.pinResetStats(
      spark.range(100).select(col("id"), col("id").as("rep")))
    def round(df: org.apache.spark.sql.DataFrame) = df
      .join(df.select(col("id").as("rep"), col("rep").as("rep2")), Seq("rep"), "left")
      .select(col("id"), coalesce(col("rep2"), col("rep")).as("rep"))
    def bits(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.stats.sizeInBytes.bigInteger.bitLength()
    val plainBits = (1 to 4).map { _ =>
      plain = round(plain).localCheckpoint(true); bits(plain)
    }
    val resetBits = (1 to 4).map { _ =>
      reset = Materialize.pinResetStats(round(reset)); bits(reset)
    }
    assert(plainBits.last > 2 * plainBits.head,
      s"expected the un-firewalled loop to compound stats (got $plainBits) — " +
        "if Spark stopped preserving checkpoint stats, pinResetStats may be droppable")
    assert(resetBits.distinct.size == 1 && resetBits.head <= 128,
      s"pinResetStats must keep stats bit length constant and small, got $resetBits")
    // and the data itself is unharmed
    assert(reset.count() == 100)
  }

  test("pin leaves a caller-created cache in place") {
    val dir = Files.createTempDirectory("mat_callercache").toString
    spark.conf.set(Materialize.ReliableDirConf, dir)
    val df = spark.range(30).toDF()
    df.persist(StorageLevel.MEMORY_ONLY)
    try {
      Materialize.pin(df)
      assert(df.storageLevel == StorageLevel.MEMORY_ONLY,
        "pin must not unpersist (or re-level) the caller's cache")
    } finally {
      df.unpersist()
      spark.conf.unset(Materialize.ReliableDirConf)
    }
  }
}
