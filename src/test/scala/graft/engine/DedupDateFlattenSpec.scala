package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact: one survivor per key subset (SL:175 pattern)") {
    val df = Seq(("a", 1, "x"), ("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z"))
      .toDF("k1", "k2", "payload")
    assert(Dedup.exact(df, Seq("k1", "k2")).count() == 3)
  }

  test("latestBy keeps the max-order row per key, deterministically") {
    val df = Seq(
      ("u1", 1L, "old"), ("u1", 3L, "new"), ("u1", 2L, "mid"),
      ("u2", 5L, "only")).toDF("user", "ver", "v")
    val out = Dedup.latestBy(df, Seq("user"), Seq(col("ver")))
      .select("user", "v").as[(String, String)].collect().toSet
    assert(out == Set(("u1", "new"), ("u2", "only")))
  }

  test("latestBy tiebreak via secondary order column") {
    val df = Seq(("u", 1L, 10L, "a"), ("u", 1L, 20L, "b")).toDF("user", "ver", "id", "v")
    val out = Dedup.latestBy(df, Seq("user"), Seq(col("ver"), col("id")))
      .select("v").as[String].collect().toSeq
    assert(out == Seq("b"))
  }

  test("latestByAgg equals latestBy (window vs max_by formulations)") {
    val df = Seq(
      ("u1", 1L, 10L, "a"), ("u1", 3L, 5L, "b"), ("u1", 3L, 9L, "c"),
      ("u2", 2L, 1L, "d")).toDF("user", "ver", "seq", "v")
    val order = Seq(col("ver"), col("seq"))
    val viaWindow = Dedup.latestBy(df, Seq("user"), order)
      .select("user", "v").as[(String, String)].collect().toSet
    val viaAgg = Dedup.latestByAgg(df, Seq("user"), order)
      .select("user", "v").as[(String, String)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg == Set(("u1", "c"), ("u2", "d")))
  }

  test("keyUnique: one deterministic survivor per key, column order preserved") {
    val df = Seq(
      ("k1", "b", 1), ("k1", "b", 1), // exact copies collapse
      ("k2", "x", 2), ("k2", "y", 1), // conflicting payloads: lexicographic max wins
      ("k3", "z", 9)).toDF("id", "name", "n")
    val out = Dedup.keyUnique(df, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "name", "n"))
    assert(out.as[(String, String, Int)].collect().toSet ==
      Set(("k1", "b", 1), ("k2", "y", 1), ("k3", "z", 9)))
  }

  test("exactByHash groups identical content and counts dups") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("id", "text")
    val out = Dedup.exactByHash(df, "text", "id")
      .select("id", "dup_count").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }
}

class DateDimSpec extends SparkSpec {
  import spark.implicits._

  test("fromRange covers every day inclusive with calendar attrs (GL:114-122)") {
    val dim = DateDim.fromRange(spark, "2024-02-27", "2024-03-02")
    val rows = dim.select(col("date").cast("string"), col("year"), col("month"),
      col("day"), col("weekday"), col("month_name"))
      .as[(String, Int, Int, Int, String, String)].collect().toSeq
    assert(rows.map(_._1) == Seq("2024-02-27", "2024-02-28", "2024-02-29", "2024-03-01", "2024-03-02"))
    assert(rows.head == ("2024-02-27", 2024, 2, 27, "Tue", "February"))
    assert(rows.last == ("2024-03-02", 2024, 3, 2, "Sat", "March"))
  }

  test("fromColumn bounds derive from data, fully in-plan (no collect)") {
    val df = Seq("2024-01-05", "2024-01-02", "2024-01-03").toDF("d")
      .select(to_date(col("d")).as("d"))
    val dim = DateDim.fromColumn(df, col("d"))
    assert(dim.count() == 4) // 01-02 .. 01-05 inclusive
  }
}

case class Item(service: String, amount: Double)

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  test("explodeArray + extractFields = billing line_items chain (SL:151-157)") {
    val df = Seq(
      ("b1", Seq(Item("ICU", 5.0), Item("Med", 2.0))),
      ("b2", Seq(Item("Lab", 1.0))),
      ("b3", Seq.empty[Item])).toDF("bid", "line_items")
    val out = Flatten.extractFields(
      Flatten.explodeArray(df, col("line_items"), "li"), "li", Seq("service", "amount"))
      .select("bid", "service", "amount").as[(String, String, Double)].collect().toSet
    // empty array row dropped, one row per element otherwise
    assert(out == Set(("b1", "ICU", 5.0), ("b1", "Med", 2.0), ("b2", "Lab", 1.0)))
  }

  test("explodeWithPosition preserves element order") {
    val df = Seq((1L, Seq(0.5f, 0.25f))).toDF("id", "vec")
    val out = Flatten.explodeWithPosition(df, col("vec"), "pos", "val")
      .select("pos", "val").as[(Int, Float)].collect().toSeq
    assert(out == Seq((0, 0.5f), (1, 0.25f)))
  }
}
