package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{SimilarityFunctions => Sim, TextFunctions => Txt}

/** Native `minhash_sigs` == the shingle/sample/md5/array_min chain,
  * bit-for-bit — including multi-byte text (the sampling key is
  * `ascii(first char)`, which must agree between the native code-point
  * decode and Spark's own ascii()).
  */
class MinhashSigsSpec extends SparkSpec {
  import spark.implicits._

  private val N = 8
  private val K = 8

  private def compare(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .filter(length(col("text")) >= N)
    val sampled = filter(Txt.charShinglesExpr("text", N),
      sh => pmod(ascii(substring(sh, 1, 1)), lit(2)) === 0)
    val folds = Sim.minhashFromDigests(col("digests"), K)
    val rows = df.withColumn("digests", Sim.shingleDigests(sampled))
      .withColumn("ms", expr(s"minhash_sigs(text, $N, $K)"))
      .select(col("doc_id") +: col("text") +:
        ((0 until K).map(j => element_at(col("ms"), j + 1).as(s"n_$j")) ++ folds): _*)
      .collect()
    rows.foreach { r =>
      (0 until K).foreach { j =>
        val native = r.get(2 + j)
        val fold = r.get(2 + K + j)
        assert(native == fold,
          s"slice $j mismatch for text='${r.get(1)}': native=$native fold=$fold")
      }
    }
    assert(rows.nonEmpty)
  }

  test("native == fold on ascii corpora") {
    compare((1 to 40).map(i =>
      s"document number $i with shared prefix and tail-${i * 31}"))
  }

  test("native == fold on multi-byte text, exact-length, and repeated shingles") {
    compare(Seq(
      "héllo wörld — ünïcode texte",   // 2-byte chars in shingles & sample keys
      "日本語のテキストです、これは。",    // 3-byte chars throughout
      "exactly8",                       // single shingle (length == N)
      "😀😃 emoji leads the shingles",  // 4-byte supplementary sample keys
      "aaaaaaaaaa"))                    // identical shingles
    // every shingle starts with an odd codepoint -> zero sampled ->
    // all slices null on both forms
    val v = Seq((1L, "acegikmoq")).toDF("doc_id", "text")
      .select(expr(s"minhash_sigs(text, $N, $K)").as("ms")).head().getSeq[String](0)
    assert(v.size == K && v.forall(_ == null))
  }
}
