package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions => Sim, TextFunctions => Txt}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: hand-checked values, sequential accumulation") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (Seq(1.0, 1.0), Seq(1.0, 1.0), 1.0),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0)).toDF("a", "b", "want")
    val got = df.select(Sim.cosine(col("a"), col("b")).as("c"), col("want"))
      .as[(Double, Double)].collect()
    got.foreach { case (c, want) => assert(math.abs(c - want) < 1e-12) }
  }

  test("minhash: identical texts share all components; disjoint texts differ") {
    val df = Seq((1L, "abcdefghij klmnop qrstu"), (2L, "abcdefghij klmnop qrstu"), (3L, "zzzzzzzzzzzzzz"))
      .toDF("doc_id", "text")
    val sig = df
      .withColumn("digests", Sim.shingleDigests(Txt.charShinglesExpr("text", 5)))
      .select(col("doc_id") +: Sim.minhashFromDigests(col("digests"), 4): _*)
      .as[(Long, String, String, String, String)].collect().sortBy(_._1)
    assert(sig(0)._2 == sig(1)._2 && sig(0)._5 == sig(1)._5) // identical docs: identical sigs
    assert(sig(0)._2 != sig(2)._2 || sig(0)._3 != sig(2)._3) // disjoint docs: differ somewhere
    sig.foreach(s => assert(s._2.length == Sim.SliceHex && s._5.length == Sim.SliceHex))
  }

  test("simhash16: deterministic, equal for equal text, in 16-bit range") {
    val df = Seq((1L, "spark scan join filter"), (2L, "spark scan join filter"), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val out = df.withColumn("td", Sim.tokenDigestsExpr("text"))
      .select(col("doc_id"), Sim.simhash16FromDigests("td").as("h"))
      .as[(Long, Int)].collect().sortBy(_._1)
    assert(out(0)._2 == out(1)._2)
    out.foreach { case (_, h) => assert(h >= 0 && h < (1 << 16)) }
  }

  test("hamming16 counts differing bits") {
    val out = Seq((0x0f0f, 0x0f0e)).toDF("a", "b")
      .select(Sim.hamming16(col("a"), col("b")).as("d")).as[Int].collect()
    assert(out.head == 1)
  }

  test("jaccard set semantics") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val out = df.select(Sim.jaccard(col("x"), col("y")).as("j")).as[Double].collect()
    assert(math.abs(out.head - 0.5) < 1e-12) // |{b,c}| / |{a,b,c,d}|
  }

  test("cosineKnn returns k nearest excluding self, ranked") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.9, 0.1)),   // closest to 0
      (2L, Seq(0.5, 0.5)),
      (3L, Seq(-1.0, 0.0))). // farthest
      toDF("vec_id", "vec")
    val out = Sim.cosineKnn(vecs.filter(col("vec_id") === 0), vecs, "vec_id", "vec", 2)
      .select("n_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((1L, 1), (2L, 2)))
  }

  test("hyperplanes are deterministic ±1 and lshBucket lands in range") {
    val p1 = Sim.hyperplanes(4, 8)
    val p2 = Sim.hyperplanes(4, 8)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(v => v == 1.0 || v == -1.0))
    val df = Seq((1L, Seq.fill(8)(0.5)), (2L, Seq.tabulate(8)(i => if (i % 2 == 0) 1.0 else -1.0)))
      .toDF("id", "vec")
    val out = df.select(Sim.lshBucket(col("vec"), p1).as("b")).as[Int].collect()
    out.foreach(b => assert(b >= 0 && b < 16))
  }
}
