package graft.io

import java.nio.file.Files
import graft.SparkSpec

/** Snapshot diff contract: added/removed/changed classification, null vs
  * empty-string discrimination, unchanged rows absent, and the
  * time-travel entry point over the versioned overwrite sink.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added/removed/changed; unchanged rows never appear") {
    val oldDf = Seq(
      (1L, "alpha", 10), (2L, "beta", 20), (3L, "gamma", 30), (4L, "delta", 40)
    ).toDF("id", "name", "v")
    val newDf = Seq(
      (1L, "alpha", 10),   // unchanged
      (2L, "beta", 21),    // changed
      (4L, "DELTA", 40),   // changed
      (5L, "eps", 50)      // added; 3 removed
    ).toDF("id", "name", "v")
    val out = SnapshotDiff.diff(oldDf, newDf, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(2L -> "changed", 3L -> "removed", 4L -> "changed", 5L -> "added"))
  }

  test("null and empty string digest differently; separator blocks smearing") {
    val oldDf = Seq((1L, Option.empty[String], "x"), (2L, Some("ab"), "c"))
      .toDF("id", "a", "b")
    val newDf = Seq((1L, Some(""), "x"), (2L, Some("a"), "bc"))
      .toDF("id", "a", "b")
    val out = SnapshotDiff.diff(oldDf, newDf, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "changed", 2L -> "changed"))
  }

  test("diffVersions reads two retained snapshots of the managed sink") {
    val path = Files.createTempDirectory("snapdiff").toString + "/t"
    Tables.overwriteKeeping(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)
    Tables.overwriteKeeping(
      Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s"), path)
    val vs = Tables.listVersions(spark, path) // newest first
    assert(vs.size >= 2)
    val out = SnapshotDiff.diffVersions(spark, path, vs(1), vs(0), Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(2L -> "changed", 3L -> "added"))
  }
}
