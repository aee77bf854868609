package graft.io

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution through the incremental SCD2 sink: batches may gain
  * (or lose) columns across loads without crashing the merge or producing
  * nondeterministic table schemas.
  */
class Scd2EvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("a batch with a new column evolves the table; old rows read back null") {
    val path = Files.createTempDirectory("graft_evo").toString
    Scd2History.bootstrap(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), LocalDate.parse("2026-01-01"), path)

    // batch 2 adds `score`; v changes for id=1
    Scd2History.merge(spark, path,
      Seq((1L, "a2", 0.5), (2L, "b", 0.7)).toDF("id", "v", "score"),
      keys = Seq("id"), compareCols = Seq("v", "score"), asOf = LocalDate.parse("2026-02-01"))

    val all = Scd2History.readAll(spark, path)
    assert(all.columns.contains("score"), "table schema gained the new column")

    // the expired id=1 row (written pre-evolution) reads back with null score
    val expired = all.filter(col("id") === 1L && !col("is_current"))
      .select("v", "score").as[(String, Option[Double])].collect().toSeq
    assert(expired == Seq(("a", None)))
    val current = all.filter(col("is_current"))
      .select("id", "v", "score").as[(Long, String, Option[Double])].collect().toSet
    // id=2: v unchanged but score null -> 0.7 is a change -> new version
    assert(current == Set((1L, "a2", Some(0.5)), (2L, "b", Some(0.7))))

    // deterministic schema: readCurrent agrees and scans ONLY the current
    // partition's live generation (directory-name pruning — closed days
    // are not even listed into the scan)
    val cur = Scd2History.readCurrent(spark, path)
    assert(cur.columns.sorted.sameElements(all.columns.sorted))
    val inputs = cur.inputFiles
    assert(inputs.nonEmpty &&
      inputs.forall(_.contains("end_date=__HIVE_DEFAULT_PARTITION__/gen=")),
      s"current read must target only the live current generation: ${inputs.mkString(", ")}")
  }

  test("a batch missing a column null-fills it (documented value->null change)") {
    val path = Files.createTempDirectory("graft_evo2").toString
    Scd2History.bootstrap(
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "n"), LocalDate.parse("2026-01-01"), path)
    Scd2History.merge(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      keys = Seq("id"), compareCols = Seq("v", "n"), asOf = LocalDate.parse("2026-02-01"))

    val all = Scd2History.readAll(spark, path)
    // n: value -> null is a real change: both keys expire and reinsert
    assert(all.filter(!col("is_current")).count() == 2)
    val current = all.filter(col("is_current"))
      .select("id", "n").as[(Long, Option[Int])].collect().toSet
    assert(current == Set((1L, None), (2L, None)))
  }
}
