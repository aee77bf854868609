package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q51: repetition fractions are exact on a hand-computed doc") {
    // "a a b c" → 4 words, 3 distinct, top=2; bigrams "a a","a b","b c" all distinct
    val out = Extensions.q51RepetitionStats(spark, dir)
    // every fraction is a valid probability and word_count positive
    val bad = out.filter(
      col("dup_word_frac") < 0 || col("dup_word_frac") > 1 ||
        col("top_word_frac") <= 0 || col("top_word_frac") > 1 ||
        col("dup_bigram_frac") < 0 || col("dup_bigram_frac") > 1 ||
        col("word_count") <= 0).count()
    assert(bad == 0)
    // identity on the formula for one known doc: recompute independently
    val doc = graft.io.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") === 1L).select("text").as[String].head()
    val toks = doc.split(" ").filter(_.nonEmpty).toSeq
    val expDup = 1.0 - toks.distinct.size.toDouble / toks.size
    val got = out.filter(col("doc_id") === 1L)
      .select("word_count", "dup_word_frac").as[(Int, Double)].head()
    assert(got._1 == toks.size)
    assert(math.abs(got._2 - math.floor(expDup * 1e4 + 0.5) / 1e4) < 1e-12)
  }

  test("q52: synthetic PII is found and scrubbed; clean docs untouched") {
    val out = Extensions.q52PiiScrub(spark, dir).cache()
    // %7 salt: one email + one 3-4-4 phone; %11 salt: one parenthesized +
    // one 3-3-4 phone (the widened pattern's new alternatives); %77: both
    assert(out.filter(col("doc_id") % 7 === 0 && col("doc_id") % 11 =!= 0 &&
      (col("email_count") =!= 1 || col("phone_count") =!= 1)).count() == 0)
    assert(out.filter(col("doc_id") % 11 === 0 && col("doc_id") % 7 =!= 0 &&
      (col("email_count") =!= 0 || col("phone_count") =!= 2)).count() == 0)
    assert(out.filter(col("doc_id") % 77 === 0 && col("doc_id") =!= 0 &&
      (col("email_count") =!= 1 || col("phone_count") =!= 3)).count() == 0)
    assert(out.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 11 =!= 0 &&
      (col("email_count") =!= 0 || col("phone_count") =!= 0)).count() == 0)
    // scrubbed text of an untouched doc hashes to the original text
    val raw = graft.io.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") === 1L).select(md5(col("text"))).as[String].head()
    assert(out.filter(col("doc_id") === 1L).select("clean_md5").as[String].head() == raw)
    // a salted doc's scrub equals the independently computed redaction
    val got7 = out.filter(col("doc_id") === 7L).select("clean_md5").as[String].head()
    val doc7 = graft.io.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") === 7L).select("text").as[String].head()
    val expected = (doc7 + " contact user7@example.com or 555-0107-4567 now")
      .replaceAll(Extensions.PiiEmailRe, "<EMAIL>")
      .replaceAll(Extensions.PiiPhoneRe, "<PHONE>")
    val expMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got7 == expMd5)
    // and the new formats: doc 11's paren + 3-3-4 numbers both redact
    val got11 = out.filter(col("doc_id") === 11L).select("clean_md5").as[String].head()
    val doc11 = graft.io.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") === 11L).select("text").as[String].head()
    val expected11 = (doc11 + " call (555) 123-4567 or 555-987-6543 soon")
      .replaceAll(Extensions.PiiEmailRe, "<EMAIL>")
      .replaceAll(Extensions.PiiPhoneRe, "<PHONE>")
    assert(expected11.contains("call <PHONE> or <PHONE> soon"), "both new formats matched")
    val expMd511 = java.security.MessageDigest.getInstance("MD5")
      .digest(expected11.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got11 == expMd511)
  }
}
