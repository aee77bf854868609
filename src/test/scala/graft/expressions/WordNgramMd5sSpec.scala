package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native `word_ngram_md5s(text, w)` == the slice/concat_ws/md5 chain,
  * element for element at several widths — including the empty-token
  * shapes where the byte-window argument (each w-token window joined by
  * single spaces IS a contiguous text range) must hold, and the
  * BINARY(16) output contract (raw digest, not hex).
  */
class WordNgramMd5sSpec extends SparkSpec {
  import spark.implicits._

  private val shapes = Seq(
    "one two three four five six seven eight nine",
    "a  b c d e f g h",   // consecutive spaces -> empty middle token
    " lead b c d e f g",  // leading empty token
    "trail b c d e f g ", // trailing empty token
    "        ",           // all empty tokens
    "short text",         // < w tokens -> empty array
    "",                   // empty text -> empty array
    "héllo wörld 日本語 mixed a b c d") // multi-byte windows

  private def compare(w: Int): Unit = {
    val rows = shapes.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("text"),
        expr(s"word_ngram_md5s(text, $w)").as("native"),
        expr(
          s"case when size(toks) >= $w then " +
            s"transform(sequence(1, size(toks) - ${w - 1}), " +
            s"i -> unhex(md5(concat_ws(' ', slice(toks, i, $w))))) " +
            "else array() end").as("fold"))
      .collect()
    rows.foreach { r =>
      val native = r.getSeq[Array[Byte]](2).map(_.toSeq)
      val fold = r.getSeq[Array[Byte]](3).map(_.toSeq)
      assert(native == fold, s"w=$w digests mismatch for text='${r.get(1)}'")
    }
  }

  test("native == fold on healthy and empty-token shapes at w = 1, 2, 8") {
    Seq(1, 2, 8).foreach(compare)
    // null text -> empty array (the CASE-else branch), not null
    val v = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(expr("word_ngram_md5s(text, 8)").as("b")).head().getSeq[Array[Byte]](0)
    assert(v != null && v.isEmpty)
  }

  test("digests equal md5 of the reconstructed window strings") {
    val got = Seq((1L, "x yy zzz wwww")).toDF("doc_id", "text")
      .select(explode(expr("word_ngram_md5s(text, 3)")).as("h"))
      .as[Array[Byte]].collect().toSeq.map(_.toSeq)
    val want = Seq("x yy zzz", "yy zzz wwww").map(s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).toSeq)
    assert(got == want)
  }

  test("windows are NOT deduplicated (occurrence structure preserved)") {
    val got = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
      .select(expr("word_ngram_md5s(text, 2)").as("hs"))
      .select(size(col("hs")).as("n"), size(array_distinct(col("hs"))).as("d"))
      .as[(Int, Int)].head()
    assert(got._1 == 5 && got._2 == 2) // "a b","b a","a b","b a","a b"
  }
}
