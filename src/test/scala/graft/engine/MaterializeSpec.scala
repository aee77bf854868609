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
