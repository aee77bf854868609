package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity pins for the q20 fused expressions: `bigram_h60s` must equal
  * the composable tokenize → distinct-bigram → md5-prefix chain, and
  * `jac_band_keys` must equal the exploded 96-way packed-min aggregate
  * with the (k₁−2³¹)·2³² + k₂ key pack — on clean text, runs of spaces,
  * short/empty/null docs. These two ARE the oracle contract: DuckDB
  * replays the same arithmetic from the same JaccardLsh constants.
  */
class JaccardLshSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
    (2L, "a  b   c a  b"), // runs of spaces collapse to the same bigrams as single
    (3L, "one-token"),     // < 2 tokens -> no grams
    (4L, ""),
    (5L, "x y"),
    (6L, "répé tition répé tition über ascii")) // multi-byte UTF-8 tokens
    .toDF("doc_id", "text")

  private def fallbackGhs = {
    val grams = expr(
      """CASE WHEN size(filter(split(text, ' '), t -> t != '')) < 2
        |  THEN array()
        |  ELSE transform(sequence(1, size(filter(split(text, ' '), t -> t != '')) - 1),
        |    i -> concat(filter(split(text, ' '), t -> t != '')[i - 1], ' ',
        |                filter(split(text, ' '), t -> t != '')[i]))
        |END""".stripMargin)
    transform(array_distinct(grams),
      g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))
  }

  test("bigram_h60s equals the composable md5-prefix chain") {
    val rows = docs.select(col("doc_id"),
      expr("bigram_h60s(text)").as("native"), fallbackGhs.as("fold"))
      .collect()
    for (r <- rows) {
      val native = r.getSeq[Long](1)
      val fold = Option(r.getSeq[Long](2)).getOrElse(Seq.empty)
      assert(native === fold, s"doc ${r.getLong(0)}")
    }
  }

  test("ngram_h60s equals the composable wordShinglesExpr md5-prefix chain") {
    // Parity at w = 2 (must equal bigram_h60s exactly) and at the q20
    // signature width w = SigShingle, including the < w-token empty case.
    for (w <- Seq(2, JaccardLsh.SigShingle)) {
      val fold = {
        val toked = docs.withColumn("tk", expr("filter(split(text, ' '), t -> t != '')"))
        toked.select(col("doc_id"),
          transform(array_distinct(graft.functions.TextFunctions.wordShinglesExpr("tk", w)),
            g => conv(substring(md5(g), 1, 15), 16, 10).cast("long")).as("fold"))
      }
      val rows = docs.select(col("doc_id"), expr(s"ngram_h60s(text, $w)").as("native"))
        .join(fold, "doc_id").collect()
      for (r <- rows) {
        val native = r.getSeq[Long](1)
        val folded = Option(r.getSeq[Long](2)).getOrElse(Seq.empty)
        assert(native === folded, s"doc ${r.getLong(0)} w=$w")
      }
    }
    val w2 = docs.select(expr("ngram_h60s(text, 2)"), expr("bigram_h60s(text)")).collect()
    for (r <- w2) assert(r.getSeq[Long](0) === r.getSeq[Long](1))
  }

  test("jac_band_keys equals the exploded packed-min aggregate") {
    val hashed = docs.select(col("doc_id"), expr("bigram_h60s(text)").as("ghs"))
      .filter(size(col("ghs")) > 0)
    val native = hashed
      .select(col("doc_id"), posexplode(expr("jac_band_keys(ghs)")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val post = hashed.select(col("doc_id"), explode(col("ghs")).as("h60"))
      .withColumn("h32", expr("h60 div 268435456"))
    val mins = (0 until JaccardLsh.Bands * JaccardLsh.Rows).map { j =>
      min(((lit(JaccardLsh.a(j)) * col("h32") + lit(JaccardLsh.c(j))) %
        lit(2147483648L)) * lit(4294967296L) + col("h32")).as(s"m$j")
    }
    val keyCols = (0 until JaccardLsh.Bands).map { b =>
      struct(lit(b).as("band"),
        (((col(s"m${JaccardLsh.Rows * b}") % lit(4294967296L)) - lit(2147483648L)) *
          lit(4294967296L) +
          (col(s"m${JaccardLsh.Rows * b + 1}") % lit(4294967296L))).as("k"))
    }
    val agg = post.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), explode(array(keyCols: _*)).as("bh"))
      .collect().map(r => (r.getLong(0),
        r.getStruct(1).getInt(0), r.getStruct(1).getLong(1))).toSet
    assert(native === agg)
  }

  test("band keys collide for identical docs, not for disjoint ones") {
    val pair = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "uno dos tres cuatro cinco seis")).toDF("doc_id", "text")
    val keys = pair.select(col("doc_id"), posexplode(expr("jac_band_keys(bigram_h60s(text))")))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getLong(2))).toSet).toMap
    assert(keys(1L) === keys(2L), "identical docs must share every band key")
    assert(keys(1L).intersect(keys(3L)).isEmpty, "disjoint docs must share none")
  }

  test("sorted_inter_size equals size(array_intersect) on sorted distinct arrays") {
    // deterministic pseudo-random sorted-distinct pairs incl. edge shapes:
    // empty/empty, empty/full, identical, disjoint, interleaved overlap
    val pairs = spark.range(500)
      .withColumn("a", expr(
        "array_sort(array_distinct(transform(sequence(1, cast(id % 40 as int)), " +
          "j -> coalesce(cast((id * 37 + j * j * 13) % 97 as bigint), 0L))))"))
      .withColumn("b", expr(
        "array_sort(array_distinct(transform(sequence(1, cast((id * 7) % 40 as int)), " +
          "j -> coalesce(cast((id * 11 + j * j * 29) % 97 as bigint), 0L))))"))
    val diff = pairs.filter(
      expr("sorted_inter_size(a, b) != size(array_intersect(a, b))"))
    assert(diff.count() === 0L)
    // the merge walk is symmetric
    val sym = pairs.filter(expr("sorted_inter_size(a, b) != sorted_inter_size(b, a)"))
    assert(sym.count() === 0L)
  }
}
