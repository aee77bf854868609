package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q100 context-window chunking against hand-computed chunk layouts and
  * an independent md5 recomputation — the window/stride arithmetic (one
  * chunk at or under the window, exact-coverage tails, overlap) is where
  * an off-by-one would hide.
  */
class ContextChunksSpec extends SparkSpec {
  import spark.implicits._

  private val W = Extensions.ChunkWin
  private val S = Extensions.ChunkStride

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def expectedChunks(id: Long, toks: IndexedSeq[String]) = {
    val n = toks.length
    val chunks = if (n <= W) 1 else math.ceil((n - W).toDouble / S).toInt + 1
    (0 until chunks).map { k =>
      val slice = toks.slice(k * S, math.min(k * S + W, n))
      (id, k.toLong, (k * S + 1).toLong, slice.length.toLong,
        md5hex(slice.mkString(" ")))
    }
  }

  test("chunk layout matches the closed form at the window boundaries") {
    // n = 5 (short: one chunk), W (exact window: one chunk), W+1 (first
    // straddle: two chunks, 33-token tail), W+S (two chunks, tail ends
    // exactly at n), W+S+1 (three chunks), 3W (dense overlap)
    val sizes = Seq(5, W, W + 1, W + S, W + S + 1, 3 * W)
    val docs = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(t => s"w${i}_$t").mkString(" "))
    }.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("q100chunks")
    try {
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = Extensions.q100ContextChunks(spark, tmp.toString)
        .as[(Long, Long, Long, Long, String)].collect().toSet
      val expected = sizes.zipWithIndex.flatMap { case (n, i) =>
        expectedChunks(i.toLong, (1 to n).map(t => s"w${i}_$t"))
      }.toSet
      assert(got == expected)
      // coverage invariant: every chunk's last token index never exceeds n,
      // and the final chunk always reaches exactly n
      for ((n, i) <- sizes.zipWithIndex) {
        val mine = got.filter(_._1 == i.toLong).toSeq.sortBy(_._2)
        assert(mine.last._3 + mine.last._4 - 1 == n.toLong,
          s"doc $i (n=$n): final chunk must end at the last token")
        assert(mine.forall { case (_, k, st, nt, _) => st == k * S + 1 && nt <= W })
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
  }

  test("sf0.001 chunks match an independent recomputation") {
    val expected = graft.io.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        expectedChunks(id, text.split(" ", -1).toIndexedSeq)
      }.toSet
    val got = Extensions.q100ContextChunks(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
