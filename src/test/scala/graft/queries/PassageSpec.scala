package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q95 (duplicated sliding-window passages) and q96 (per-doc n-gram
  * novelty) against a from-scratch Scala recomputation of the same
  * semantics on sf0.001 — independent tokenizer, windowing, and md5, so a
  * digest/windowing/off-by-one regression in the engine plan cannot agree
  * with the recomputation by construction.
  */
class PassageSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val W = Extensions.PassageW

  /** Independent reference: doc_id -> distinct window digests (hex). */
  private lazy val reference: Map[Long, Set[String]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    graft.io.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        // split(text, ' ') keeps empty tokens — mirror exactly
        val toks = text.split(" ", -1)
        val wins =
          if (toks.length < W) Set.empty[String]
          else (0 to toks.length - W).map { i =>
            hex(md.digest(toks.slice(i, i + W).mkString(" ").getBytes("UTF-8")))
          }.toSet
        id -> wins
      }.toMap
  }

  test("q95: duplicated passages match an independent recomputation exactly") {
    val expected = reference.toSeq
      .flatMap { case (id, ws) => ws.map(h => (h, id)) }
      .groupBy(_._1)
      .map { case (h, rows) => (h, rows.map(_._2).distinct.size.toLong, rows.map(_._2).min) }
      .filter(_._2 >= Extensions.PassageMinDocs)
      .toSet
    val got = Extensions.q95DupPassages(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty, "testdata should contain injected near-dup passages")
  }

  test("q96: novelty matches the recomputation and the q95 cross-invariant") {
    val dfByWin = reference.toSeq
      .flatMap { case (id, ws) => ws.map(h => (h, id)) }
      .groupBy(_._1).map { case (h, rows) => h -> rows.map(_._2).distinct.size }
    val expected = reference.collect { case (id, ws) if ws.nonEmpty =>
      val novel = ws.count(h => dfByWin(h) == 1).toLong
      val novelty = math.floor(novel.toDouble / ws.size * 1e4 + 0.5) / 1e4
      (id, ws.size.toLong, novel, novelty)
    }.toSet
    val got = Extensions.q96NgramNovelty(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
    // cross-query conservation: every non-novel distinct window of every
    // doc is one unit of some duplicated shingle's df in q95.
    val sharedSum = Extensions.q96NgramNovelty(spark, dir)
      .agg(sum(col("n_windows") - col("n_novel"))).as[Long].head()
    val dfSum = Extensions.q95DupPassages(spark, dir)
      .agg(sum(col("df"))).as[Long].head()
    assert(sharedSum == dfSum)
  }

  test("q97: containment pairs match the recomputation exactly") {
    val dfByWin = reference.toSeq
      .flatMap { case (id, ws) => ws.map(h => (h, id)) }
      .groupBy(_._1).map { case (h, rows) => h -> rows.map(_._2).distinct }
    val live = dfByWin.filter { case (_, ds) =>
      ds.size >= Extensions.PassageMinDocs && ds.size <= Extensions.ContainCap
    }
    val expected = live.toSeq
      .flatMap { case (_, ds) =>
        for (a <- ds; b <- ds if a < b) yield (a, b)
      }
      .groupBy(identity).map { case ((a, b), hits) => (a, b, hits.size.toLong) }
      .filter(_._3 >= Extensions.ContainMinShared)
      .map { case (a, b, shared) =>
        val nwA = reference(a).size.toLong
        val nwB = reference(b).size.toLong
        val c = math.floor(shared.toDouble / math.min(nwA, nwB) * 1e4 + 0.5) / 1e4
        (a, b, shared, nwA, nwB, c)
      }.toSet
    val got = Extensions.q97Containment(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty, "testdata should contain injected containment pairs")
    // every reported containment is a valid ratio over the smaller side
    assert(got.forall { case (_, _, sh, na, nb, c) =>
      c > 0 && c <= 1.0 && sh <= math.min(na, nb)
    })
  }

  test("q99: contamination pairs match an independent recomputation on sf0.001") {
    val dfByWin = reference.toSeq
      .flatMap { case (id, ws) => ws.map(h => (h, id)) }
      .groupBy(_._1).map { case (h, rows) => h -> rows.map(_._2).distinct }
    val live = dfByWin.filter { case (_, ds) =>
      ds.size >= Extensions.PassageMinDocs && ds.size <= Extensions.ContainCap
    }
    val m = Extensions.ContamBenchMod
    val expected = live.toSeq
      .flatMap { case (_, ds) =>
        for (tr <- ds if tr % m != 0; be <- ds if be % m == 0) yield (tr, be)
      }
      .groupBy(identity).map { case ((tr, be), hits) => (tr, be, hits.size.toLong) }
      .filter(_._3 >= Extensions.ContainMinShared)
      .map { case (tr, be, shared) =>
        val nw = reference(tr).size.toLong
        val c = math.floor(shared.toDouble / nw * 1e4 + 0.5) / 1e4
        (tr, be, shared, nw, c)
      }.toSet
    val got = Extensions.q99ContaminationPairs(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("q99: a planted benchmark quotation is attributed to its bench doc") {
    // bench doc 22 (22 % 11 == 0) carries a rare 10-token run; train docs
    // 1 and 2 quote it (3 shared sliding windows each, df = 3 <= cap);
    // train doc 3 shares nothing.
    val run = (1 to Extensions.PassageW + 2).map(i => s"c$i").mkString(" ")
    val docsDf = Seq(
      (22L, s"$run b1a b1b b1c b1d b1e"),
      (1L, s"$run t1a t1b t1c t1d t1e"),
      (2L, s"t2x t2y $run t2a t2b"),
      (3L, "nothing shared here at all with anyone in this tiny corpus x y z")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("q99plant")
    try {
      docsDf.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = Extensions.q99ContaminationPairs(spark, tmp.toString)
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      // doc 1: 15 tokens -> 8 distinct windows; doc 2: 14 tokens -> 7;
      // each shares the quoted run's 3 windows with bench doc 22
      assert(got == Set((1L, 22L, 3L, 8L, 0.375), (2L, 22L, 3L, 7L, 0.4286)), got)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
  }

  test("q97: boilerplate windows above the df cap produce no pairs") {
    // The testdata never exercises the flood cap (max df = 4 at every
    // scale), so build a corpus where it BINDS: one 8-token boilerplate
    // window shared by ContainCap + 1 docs (above the cap -> excluded),
    // plus two docs sharing a rare 10-token run (3 windows, in-cap).
    val boiler = (1 to Extensions.PassageW).map(i => s"b$i").mkString(" ")
    val rare = (1 to Extensions.PassageW + 2).map(i => s"r$i").mkString(" ")
    val docsDf = {
      val flood = (0 until Extensions.ContainCap + 1).map { i =>
        (i.toLong, s"$boiler u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g")
      }
      val pair = Seq(
        (100L, s"$rare p1a p1b p1c p1d p1e"),
        (101L, s"$rare p2a p2b p2c p2d p2e"))
      (flood ++ pair).toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")))
    }
    val tmp = java.nio.file.Files.createTempDirectory("q97cap")
    try {
      docsDf.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = Extensions.q97Containment(spark, tmp.toString)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      // the flood docs share ONLY the boilerplate window (df = 17 > cap)
      // -> zero pairs among them; the rare run yields exactly (100, 101)
      // with its 3 sliding windows shared
      assert(out.map(p => (p._1, p._2)) == Set((100L, 101L)), out.toString)
      assert(out.head._3 == 3L, s"expected 3 shared windows: ${out.head}")
    } finally {
      // repeated runs must not accumulate /tmp dirs (r14 ADVICE)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
  }
}
