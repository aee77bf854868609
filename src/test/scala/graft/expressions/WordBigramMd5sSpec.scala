package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native `word_bigram_md5s` == the split/concat/md5 chain, element for
  * element — including the empty-token shapes where the byte-window
  * argument (each bigram concat IS a contiguous text range) must hold.
  */
class WordBigramMd5sSpec extends SparkSpec {
  import spark.implicits._

  private def compare(texts: Seq[String]): Unit = {
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("text"),
        expr("word_bigram_md5s(text)").as("native"),
        expr(
          "case when size(toks) >= 2 then " +
            "transform(sequence(1, size(toks) - 1), " +
            "i -> md5(concat(toks[i - 1], ' ', toks[i]))) " +
            "else array() end").as("fold"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"bigram digests mismatch for text='${r.get(1)}'")
    }
  }

  test("native == fold on healthy and empty-token shapes") {
    compare(Seq(
      "one two three four",
      "a  b",            // consecutive spaces -> empty middle token
      " lead",           // leading empty token
      "trail ",          // trailing empty token
      "   ",             // all empty tokens
      "single",          // < 2 tokens -> empty array
      "",                // empty text -> empty array
      "héllo wörld 日本語 mixed")) // multi-byte windows
    // null text -> empty array (the CASE-else branch), not null
    val v = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(expr("word_bigram_md5s(text)").as("b")).head().getSeq[String](0)
    assert(v != null && v.isEmpty)
  }

  test("digests equal md5 of the reconstructed bigram strings") {
    val got = Seq((1L, "x yy zzz")).toDF("doc_id", "text")
      .select(explode(expr("word_bigram_md5s(text)")).as("h"))
      .as[String].collect().toSeq
    val want = Seq("x yy", "yy zzz").map(b =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(b.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(got == want)
  }
}
