package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries freq_items: the heavy-hitter guarantee holds under every
  * partition/merge layout, state stays bounded by k, nulls are ignored,
  * and SQL/expr registration resolves.
  */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus: item i (1..50) appears 1000/i times, n ~ 4500. */
  private def zipf = {
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    rows.toDF("tok")
  }

  test("every item above n/(k+1) is among the candidates, any layout") {
    val df = zipf
    val n = df.count()
    val k = 8
    val exact = df.groupBy("tok").count()
      .filter($"count" > n / (k + 1.0))
      .select("tok").as[String].collect().toSet
    assert(exact.nonEmpty)
    for (parts <- Seq(1, 7, 32)) {
      val cand = df.repartition(parts)
        .agg(expr(s"freq_items($k, tok)").as("c"))
        .select(explode($"c").as("tok")).as[String].collect().toSet
      assert(cand.size <= k, s"parts=$parts: ${cand.size} > k")
      assert(exact.subsetOf(cand),
        s"parts=$parts: missing ${exact.diff(cand)}")
    }
  }

  test("state and output bounded by k under a uniform flood") {
    val flood = (1 to 9).flatMap(i => Seq.fill(1000)(s"u$i")).toDF("tok")
    val out = flood.repartition(16)
      .agg(expr("freq_items(2, tok)").as("c"))
      .select(size($"c")).head().getInt(0)
    assert(out <= 2)
  }

  test("nulls ignored; works for numeric element types") {
    val df = Seq(Some(1L), None, Some(1L), Some(2L), None, Some(1L)).toDF("v")
    val cand = df.agg(expr("freq_items(4, v)").as("c"))
      .select(explode($"c").as("v")).as[Long].collect().toSet
    assert(cand.contains(1L))
    assert(!cand.contains(0L)) // no null-derived artifacts
  }

  test("resolves from SQL text through the extension registration") {
    zipf.createOrReplaceTempView("zipf_toks")
    val rows = spark.sql("SELECT freq_items(4, tok) AS c FROM zipf_toks")
      .select(explode($"c")).collect()
    assert(rows.nonEmpty && rows.length <= 4)
  }
}
