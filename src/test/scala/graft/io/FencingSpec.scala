package graft.io

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Writer fencing: two interleaved writers — the one that started FIRST
  * but commits LAST (the zombie: stalled by GC pause / partition while a
  * newer writer ran) must fail LOUDLY, and the table must end in the
  * newer writer's state.
  */
class FencingSpec extends SparkSpec {
  import spark.implicits._

  private def fsRoot(path: String) = {
    val root = new Path(path)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  test("versioned sink: the stale of two interleaved writers fails loud; newer state survives") {
    val path = Files.createTempDirectory("graft_fence_tbl").toString
    Tables.overwrite(Seq((1, "v0")).toDF("k", "v"), path)

    // writer A starts (acquires its token)...
    val (fs, root) = fsRoot(path)
    val epochA = Fencing.acquire(fs, root)
    // ...then stalls while writer B starts AND commits
    Tables.overwrite(Seq((1, "writer-b")).toDF("k", "v"), path)
    // A resumes: its commit must abort, loudly
    val ex = intercept[java.io.IOException] {
      Tables.overwriteFenced(Seq((1, "zombie-a")).toDF("k", "v"), path, Nil, 0, epochA)
    }
    assert(ex.getMessage.contains("fencing violation"))
    assert(Tables.read(spark, path).select("v").as[String].head() == "writer-b",
      "table state is the newer writer's")
  }

  test("history sink: a superseded merge aborts before any pointer flip; state untouched") {
    val path = Files.createTempDirectory("graft_fence_hist").toString
    val keys = Seq("id")
    val compare = Seq("v")
    Scd2History.bootstrap(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      LocalDate.parse("2026-01-01"), path)

    // merge A starts, stalls; merge B starts and completes
    val (fs, root) = fsRoot(path)
    val epochA = Fencing.acquire(fs, root)
    Scd2History.merge(spark, path, Seq((1L, "b-version"), (2L, "b")).toDF("id", "v"),
      keys, compare, LocalDate.parse("2026-02-01"))
    // A resumes with its stale token: aborts before ANY pointer flip
    val ex = intercept[java.io.IOException] {
      Scd2History.mergeFenced(spark, path, Seq((1L, "zombie"), (2L, "b")).toDF("id", "v"),
        keys, compare, LocalDate.parse("2026-02-02"), epochA)
    }
    assert(ex.getMessage.contains("fencing violation"))
    // readers see NOTHING of the zombie: no 2026-02-02 rows, current is B's
    val all = Scd2History.readAll(spark, path)
    assert(all.filter(col("v") === "zombie").count() == 0)
    assert(all.filter(col("end_date") === lit("2026-02-02").cast("date")).count() == 0)
    assert(Scd2History.readCurrent(spark, path)
      .select("id", "v").as[(Long, String)].collect().toMap
      == Map(1L -> "b-version", 2L -> "b"))
  }

  test("epochs are unique and monotonic under interleaved acquires") {
    val path = Files.createTempDirectory("graft_fence_acq").toString
    val (fs, root) = fsRoot(path)
    val e1 = Fencing.acquire(fs, root)
    val e2 = Fencing.acquire(fs, root)
    val e3 = Fencing.acquire(fs, root)
    assert(e1 < e2 && e2 < e3)
    // the newest writer passes its own check; older ones fail
    Fencing.check(fs, root, e3)
    intercept[java.io.IOException](Fencing.check(fs, root, e1))
    // GC keeps the caller's marker and newer ones
    Fencing.gc(fs, root, e3)
    assert(Fencing.list(fs, root) == Seq(e3))
  }
}
