package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{SimilarityFunctions => Sim}

/** Native `simhash16` == the tokenDigests + 16-fold chain, bit-for-bit,
  * on healthy and edge inputs — including the chain's own odd corners
  * (null → 0, zero tokens → all 16 bits set).
  */
class SimHash16Spec extends SparkSpec {
  import spark.implicits._

  private def compare(texts: Seq[Option[String]]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t.orNull) }
      .toDF("doc_id", "text")
    val rows = df
      .withColumn("td", Sim.tokenDigestsExpr("text"))
      .select(col("doc_id"), col("text"),
        expr("simhash16(text)").as("native"),
        Sim.simhash16FromDigests("td").as("fold"))
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3),
        s"both forms are non-null by construction: $r")
      assert(r.getInt(2) == r.getInt(3),
        s"simhash mismatch for text=${r.get(1)}: native=${r.get(2)} fold=${r.get(3)}")
    }
  }

  test("native == fold on healthy text") {
    compare((1 to 50).map(i =>
      Some((1 to (i % 7) + 1).map(j => s"tok${i * 31 + j}").mkString(" "))))
  }

  test("native == fold on edge shapes: spaces, unicode, empty, null") {
    compare(Seq(
      Some("a  b"),            // double space -> empty token filtered
      Some(" leading"),
      Some("trailing "),
      Some("   "),             // all spaces -> zero tokens -> 65535
      Some(""),                // empty -> zero tokens -> 65535
      Some("héllo wörld 日本語"), // multi-byte UTF-8
      Some("one"),
      None))                   // null -> 0
    // pin the documented edge values directly
    val v = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(expr("simhash16(text)").as("h")).as[Int].collect().toSeq
    assert(v == Seq(65535, 65535, 0))
  }
}
