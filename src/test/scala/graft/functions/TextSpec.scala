package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.{NumFunctions, TextFunctions => Txt}

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drops empty strings from repeated whitespace") {
    val out = Seq("a  b c ").toDF("text")
      .select(Txt.tokens(col("text")).as("t")).as[Seq[String]].collect()
    assert(out.head == Seq("a", "b", "c"))
  }

  test("tokenCountBpe: alpha runs + digit runs + punctuation singles") {
    val out = Seq("ab 12 cd!").toDF("text")
      .select(Txt.tokenCountBpe(col("text")).as("n")).as[Int].collect()
    assert(out.head == 4) // ab, 12, cd, !
  }

  test("charShinglesExpr yields len-n+1 shingles in order") {
    val out = Seq("abcdefg").toDF("text")
      .select(Txt.charShinglesExpr("text", 5).as("s")).as[Seq[String]].collect()
    assert(out.head == Seq("abcde", "bcdef", "cdefg"))
  }

  test("wordBigramsExpr over a pre-split token column") {
    val df = Seq("a b c d").toDF("text").withColumn("tk", Txt.tokens(col("text")))
    val out = df.select(Txt.wordBigramsExpr("tk").as("g")).as[Seq[String]].collect()
    assert(out.head == Seq("a b", "b c", "c d"))
  }

  test("normalize lowers, strips punctuation, collapses whitespace") {
    val out = Seq("  Hello,   WORLD!! 42 ").toDF("text")
      .select(Txt.normalize(col("text")).as("n")).as[String].collect()
    assert(out.head == "hello world 42")
  }

  test("fingerprint equal iff normalized forms equal") {
    val df = Seq((1L, "Hello, World!"), (2L, "hello   world"), (3L, "different")).toDF("id", "text")
    val fp = df.select(col("id"), Txt.fingerprint(col("text")).as("f")).as[(Long, String)]
      .collect().sortBy(_._1).map(_._2)
    assert(fp(0) == fp(1) && fp(0) != fp(2))
  }

  test("rollingHashExpr matches a reference JVM implementation") {
    val text = "hello world 42"
    var h = 0L
    text.foreach(c => h = (h * 31 + c.toInt) % 1000000007L)
    val out = Seq(text).toDF("text")
      .select(Txt.rollingHashExpr("text").as("h")).as[Long].collect()
    assert(out.head == h)
  }

  test("native rolling_hash31 equals the composable fold (incl. multi-byte, empty, null)") {
    val df = Seq(
      Some("hello world 42"),
      Some("répé tition über ascii"), // 2-byte UTF-8 code points
      Some(""),
      Some("x"),
      None: Option[String]).toDF("text")
    val both = df.select(
      Txt.rollingHashExpr("text").as("fast"),
      Txt.rollingHashExpr("text", forceComposable = true).as("slow"))
    assert(both.filter(!(col("fast") <=> col("slow"))).count() == 0L)
    // guard that the fast path actually resolved to the native expression
    assert(both.queryExecution.analyzed.toString.contains("rolling_hash31"),
      "native rolling_hash31 not picked up — registry probe broken")
  }

  test("stopword hits: distinct vs multiset semantics") {
    val df = Seq("the cat the dog").toDF("text").withColumn("tk", Txt.tokens(col("text")))
    val (dst, occ) = df.select(
      Txt.stopwordHits(col("tk"), Seq("the", "a")).as("d"),
      Txt.stopwordOccurrences(col("tk"), Seq("the", "a")).as("o"))
      .as[(Int, Int)].collect().head
    assert(dst == 1) // {the}
    assert(occ == 2) // the, the
  }

  test("ngramProfileHits counts every occurrence of profile bigrams") {
    val out = Seq("the then").toDF("text")
      .select(Txt.ngramProfileHits("text", Seq("th", "he")).as("n")).as[Int].collect()
    // bigrams: th he e_ _t th he en → th×2 + he×2 = 4
    assert(out.head == 4)
  }

  test("portableRound matches the IEEE floor-form formula bit-for-bit") {
    // The spec is NOT decimal half-up — it is the exact double expression
    // floor(v*100 + 0.5)/100, identical in any IEEE engine (e.g. 2.675*100
    // rounds to exactly 267.5, so r2(2.675) = 2.68 everywhere).
    val vals = Seq(2.675, 2.674, -1.005, 0.125, 123.4567)
    val want = vals.map(v => math.floor(v * 100 + 0.5) / 100)
    val out = vals.toDF("v").select(NumFunctions.r2(col("v")).as("r")).as[Double].collect()
    assert(out.toSeq == want)
  }
}
