package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => Txt}

/** Native text-scorer expressions == their composable chains,
  * bit-for-bit, on healthy, adversarial, and Unicode inputs:
  *
  *   - `lang_bigram_hits(text)` vs one `ngramProfileHits` chain per
  *     language (the q47 surface);
  *   - `quality_components(text)` vs q24's five-expression chain;
  *   - `norm_fingerprint(text)` vs `md5(trim(regexp_replace(...)))`
  *     (the q26 surface) — including the Unicode lowercase edge cases
  *     the native slow path must reproduce exactly (Kelvin K → k,
  *     İ → i + combining dot, ẞ → ß, fullwidth letters, emoji).
  *
  * The corpus mixes deterministic pseudo-random word soup (the testdata
  * shape), punctuation/uppercase noise, multi-byte text, and the
  * degenerate shapes (empty, all-space, single char, NULL) — every
  * mismatch class found during development came from an edge family
  * here, so keep additions additive.
  */
class NativeTextSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[Option[String]] = {
    val rnd = new scala.util.Random(421L)
    val words = Vector("the", "a", "and", "of", "to", "in", "is", "der",
      "die", "und", "le", "la", "de", "el", "los", "patient", "hospital",
      "thermal", "cheese", "Ether", "N0ise", "x")
    val soup = (1 to 120).map { _ =>
      Some((1 to rnd.nextInt(40) + 1).map(_ => words(rnd.nextInt(words.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  "))
    }
    val noisy = (1 to 40).map { _ =>
      Some((1 to rnd.nextInt(200) + 1).map(_ => (rnd.nextInt(95) + 32).toChar)
        .mkString)
    }
    val unicode = Seq(
      "héllo wörld thethe", "日本語 テキスト th", "Ѐ th er ch", "aKb",
      "İstanbul in the", "groẞe STRASSE", "mañana es la",
      "😀 emoji th😀e", "combining ȧ dot",
      "ＡＢ fullwidth", "mixed ASCII und 中文 der text").map(Some(_))
    val edges = Seq(Some(""), Some(" "), Some("   "), Some("a"), Some("th"),
      Some(" th "), Some("A"), Some("9"), Some("!"), Some("the"),
      Some("THE THE the"), None)
    soup ++ noisy ++ unicode ++ edges
  }

  private def df = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t.orNull) }
    .toDF("doc_id", "text")

  test("lang_bigram_hits == per-language ngramProfileHits chains") {
    val langs = Txt.CharBigramProfiles
    val rows = df
      .withColumn("ng", expr("lang_bigram_hits(text)"))
      .select(
        (col("text") +:
          langs.zipWithIndex.map { case ((_, _), j) =>
            element_at(col("ng"), j + 1).as(s"native_$j") }) ++
          langs.zipWithIndex.map { case ((_, p), j) =>
            Txt.ngramProfileHits("text", p).as(s"chain_$j") }: _*)
      .collect()
    rows.foreach { r =>
      langs.indices.foreach { j =>
        val n = r.get(1 + j)
        val c = r.get(1 + langs.size + j)
        assert(n == c,
          s"lang ${langs(j)._1} mismatch on text=${r.get(0)}: native=$n chain=$c")
      }
    }
  }

  test("quality_components == the q24 five-expression chain") {
    val toks = Txt.tokens(col("text"))
    val rows = df
      .withColumn("qc", expr("quality_components(text)"))
      .select(col("text"),
        col("qc.n_tokens"), col("qc.sum_len"), col("qc.punct_cnt"),
        col("qc.stop_occ"), col("qc.len"), col("qc.bpe_tokens"),
        size(toks).as("c_tokens"),
        expr("aggregate(filter(split(text, ' '), t -> t <> ''), 0, (acc, t) -> acc + length(t))").as("c_sum"),
        size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0))).as("c_punct"),
        Txt.stopwordOccurrences(toks, Txt.StopwordsByLang.head._2).as("c_stop"),
        length(col("text")).as("c_len"),
        Txt.tokenCountBpe(col("text")).as("c_bpe"))
      .collect()
    rows.foreach { r =>
      (0 until 6).foreach { k =>
        assert(r.get(1 + k) == r.get(7 + k),
          s"component $k mismatch on text=${r.get(0)}: " +
            s"native=${r.get(1 + k)} chain=${r.get(7 + k)}")
      }
    }
  }

  test("norm_fingerprint == md5(normalize) chain, ASCII and Unicode") {
    val rows = df
      .select(col("text"),
        expr("norm_fingerprint(text)").as("native"),
        Txt.fingerprint(col("text"), forceComposable = true).as("chain"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"fingerprint mismatch on text=${r.get(0)}: " +
          s"native=${r.get(1)} chain=${r.get(2)}")
    }
  }

  test("token_rep_stats == independent token/bigram multiset counts") {
    val rows = df.filter(col("text").isNotNull)
      .withColumn("rs", expr("token_rep_stats(text)"))
      .select(col("text"), col("rs.w_n"), col("rs.w_max"), col("rs.w_distinct"),
        col("rs.b_n"), col("rs.b_max"), col("rs.b_distinct"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val toks = text.split(" ", -1).filter(_.nonEmpty).toSeq
      val wc = toks.groupBy(identity).view.mapValues(_.size)
      val bgs = if (toks.size < 2) Seq.empty
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      val bc = bgs.groupBy(identity).view.mapValues(_.size)
      val expected = Seq(
        toks.size, if (wc.isEmpty) 0 else wc.values.max, wc.size,
        bgs.size, if (bc.isEmpty) 0 else bc.values.max, bc.size)
      val got = (1 to 6).map(r.getInt)
      assert(got == expected, s"rep stats mismatch on text=$text: " +
        s"native=$got expected=$expected")
    }
  }

  test("NULL text nulls every native output, like the chains") {
    val r = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(
        expr("lang_bigram_hits(text)").as("ng"),
        expr("quality_components(text)").as("qc"),
        expr("norm_fingerprint(text)").as("fp"),
        expr("token_rep_stats(text)").as("rs"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }
}
