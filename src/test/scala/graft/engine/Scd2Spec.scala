package graft.engine

import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-batch SCD2 scenarios from FIXTURES.md: unchanged, changed value,
  * brand-new key, NULL→value transition (the reference's single-pass MERGE
  * misses the re-insert and the NULL transition — SURVEY.md §2.6/§7.4).
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val d1 = LocalDate.parse("2024-01-01")
  private val d2 = LocalDate.parse("2024-06-01")

  private def batch1 = Seq(
    ("k1", Some(10), "x"), // unchanged in batch2
    ("k2", Some(20), "x"), // value changes
    ("k3", None, "x"),     // NULL → value transition
    ("k4", Some(40), "x")  // absent from batch2 (stays current)
  ).toDF("id", "v", "tag")

  private def batch2 = Seq(
    ("k1", Some(10), "x"),
    ("k2", Some(21), "x"),
    ("k3", Some(30), "x"),
    ("k5", Some(50), "x")  // brand-new key
  ).toDF("id", "v", "tag")

  private def merged = Scd2.merge(
    Scd2.bootstrap(batch1, d1), batch2,
    keys = Seq("id"), compareCols = Seq("v", "tag"), asOf = d2)

  test("row classification: expire+reinsert changed, insert new, keep rest") {
    val rows = merged
      .select(col("id"), col("v"), col("effective_date").cast("string"),
        col("end_date").cast("string"), col("is_current"))
      .as[(String, Option[Int], String, Option[String], Boolean)]
      .collect().toSet

    assert(rows == Set(
      ("k1", Some(10), "2024-01-01", None, true),               // unchanged
      ("k2", Some(20), "2024-01-01", Some("2024-06-01"), false), // expired
      ("k2", Some(21), "2024-06-01", None, true),               // new version
      ("k3", None, "2024-01-01", Some("2024-06-01"), false),    // NULL→value expired
      ("k3", Some(30), "2024-06-01", None, true),               // NULL→value inserted
      ("k4", Some(40), "2024-01-01", None, true),               // target-only
      ("k5", Some(50), "2024-06-01", None, true)                // brand-new
    ))
  }

  test("exactly one current row per key") {
    val counts = merged.filter(col("is_current"))
      .groupBy("id").count().as[(String, Long)].collect().toMap
    assert(counts == Map("k1" -> 1L, "k2" -> 1L, "k3" -> 1L, "k4" -> 1L, "k5" -> 1L))
  }

  test("idempotence: merging the same batch twice changes nothing") {
    val once = merged
    val twice = Scd2.merge(once, batch2, Seq("id"), Seq("v", "tag"), LocalDate.parse("2024-12-01"))
    val a = once.collect().map(_.toString).sorted.toSeq
    val b = twice.collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("third batch stacks history (two expirations for twice-changed key)") {
    val d3 = LocalDate.parse("2024-12-01")
    val batch3 = Seq(("k2", Some(22), "x")).toDF("id", "v", "tag")
    val third = Scd2.merge(merged, batch3, Seq("id"), Seq("v", "tag"), d3)
    val k2 = third.filter(col("id") === "k2")
      .select(col("v"), col("effective_date").cast("string"),
        col("end_date").cast("string"), col("is_current"))
      .as[(Option[Int], String, Option[String], Boolean)].collect().toSet
    assert(k2 == Set(
      (Some(20), "2024-01-01", Some("2024-06-01"), false),
      (Some(21), "2024-06-01", Some("2024-12-01"), false),
      (Some(22), "2024-12-01", None, true)))
    // keys absent from batch3 stay untouched and current
    assert(third.filter(col("is_current")).count() == 5)
  }

  test("snapshotAt returns the version valid on each date") {
    val before = Scd2.snapshotAt(merged, LocalDate.parse("2024-03-01"))
      .select("id", "v").as[(String, Option[Int])].collect().toSet
    // between d1 and d2: only batch1 keys, original values
    assert(before == Set(("k1", Some(10)), ("k2", Some(20)), ("k3", None), ("k4", Some(40))))
    val after = Scd2.snapshotAt(merged, LocalDate.parse("2024-07-01"))
      .select("id", "v").as[(String, Option[Int])].collect().toSet
    assert(after == Set(("k1", Some(10)), ("k2", Some(21)), ("k3", Some(30)),
      ("k4", Some(40)), ("k5", Some(50))))
    // before history begins: empty
    assert(Scd2.snapshotAt(merged, LocalDate.parse("2023-01-01")).count() == 0)
  }

  test("pointInTimeJoin matches each fact to its era's version") {
    val facts = Seq(
      ("f1", "k2", "2024-03-01"), // before change → v=20
      ("f2", "k2", "2024-08-01"), // after change → v=21
      ("f3", "k2", "2024-06-01"), // ON the change date → new version
      ("f4", "k5", "2024-03-01")  // key not yet born → dropped
    ).toDF("fact_id", "id", "d")
      .select(col("fact_id"), col("id"), to_date(col("d")).as("d"))
    val out = Scd2.pointInTimeJoin(facts, merged, Seq("id"), col("d"))
      .select("fact_id", "v").as[(String, Option[Int])].collect().toMap
    assert(out == Map("f1" -> Some(20), "f2" -> Some(21), "f3" -> Some(21)))
  }

  test("composite business key (billing_id+service pattern, SL:229-235)") {
    val t = Scd2.bootstrap(
      Seq(("b1", "ICU", 100.0), ("b1", "Surgery", 200.0)).toDF("bid", "svc", "amt"), d1)
    val src = Seq(("b1", "ICU", 150.0), ("b1", "Surgery", 200.0), ("b2", "ICU", 75.0))
      .toDF("bid", "svc", "amt")
    val out = Scd2.merge(t, src, Seq("bid", "svc"), Seq("amt"), d2)
    val cur = out.filter(col("is_current"))
      .select("bid", "svc", "amt").as[(String, String, Double)].collect().toSet
    assert(cur == Set(("b1", "ICU", 150.0), ("b1", "Surgery", 200.0), ("b2", "ICU", 75.0)))
    assert(out.filter(!col("is_current")).count() == 1)
  }
}
