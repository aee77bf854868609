package graft.io

import java.nio.file.Files
import graft.SparkSpec

/** Version retention + time travel on the versioned-snapshot sink. */
class VersionsSpec extends SparkSpec {
  import spark.implicits._

  test("overwriteKeeping retains N snapshots, each readable by version name") {
    val path = Files.createTempDirectory("graft_versions").toString
    Seq("a", "b", "c", "d").zipWithIndex.foreach { case (v, i) =>
      Tables.overwriteKeeping(Seq((i, v)).toDF("gen", "v"), path, keepVersions = 3)
    }
    val versions = Tables.listVersions(spark, path)
    assert(versions == Seq("v00000004", "v00000003", "v00000002"), s"got $versions")

    // live read = newest; time travel reads the retained older snapshots
    assert(Tables.read(spark, path).as[(Int, String)].head() == ((3, "d")))
    assert(Tables.readVersion(spark, path, "v00000003").as[(Int, String)].head() == ((2, "c")))
    assert(Tables.readVersion(spark, path, "v00000002").as[(Int, String)].head() == ((1, "b")))
    intercept[IllegalArgumentException] {
      Tables.readVersion(spark, path, "v00000001") // GC'd
    }
  }

  test("default overwrite keeps live + one grace version (unchanged behavior)") {
    val path = Files.createTempDirectory("graft_versions2").toString
    (1 to 3).foreach(i => Tables.overwrite(Seq(i).toDF("x"), path))
    assert(Tables.listVersions(spark, path) == Seq("v00000003", "v00000002"))
  }

  test("retention policy persists: set once, honored by later plain overwrites") {
    val path = Files.createTempDirectory("graft_versions3").toString
    // deep retention set ONCE...
    Tables.overwriteKeeping(Seq(1).toDF("x"), path, keepVersions = 4)
    // ...then only plain overwrite calls — the persisted policy must hold
    (2 to 5).foreach(i => Tables.overwrite(Seq(i).toDF("x"), path))
    val versions = Tables.listVersions(spark, path)
    assert(versions == Seq("v00000005", "v00000004", "v00000003", "v00000002"),
      s"plain overwrite GC'd past the persisted retention: $versions")
    assert(Tables.readVersion(spark, path, "v00000002").as[Int].head() == 2)
  }
}
