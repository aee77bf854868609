package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.KmeansCodebook
import graft.functions.{SimilarityFunctions => Sim}

/** IVF quality contract — the trained-quantizer twin of AnnRecallSpec's
  * LSH tests: probing more cells must monotonically improve recall@3
  * against brute-force ground truth, and the production probe count
  * (IvfNprobe = 3) must clear a nontrivial floor.
  *
  * Cell count is the same recall/candidate tradeoff as LSH bucket
  * count: at 500 vectors the production-style K=16 leaves ~31
  * vectors/cell, the geometry where a coarse quantizer has signal at
  * this scale (K ∝ √N sizing rule, SCALING.md).
  */
class IvfRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val K = 16

  private lazy val emb = graft.io.Tables.load(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    .cache()

  private lazy val cb = KmeansCodebook.train(emb, K, iters = 2).cache()

  private lazy val cells = emb.crossJoin(broadcast(cb))
    .withColumn("b", KmeansCodebook.bestByName(spark, "vec", "cbs"))
    .select(col("vec_id"), col("vec"), col("b.id").as("cell"))
    .cache()

  /** Each query's `n` best-scoring cells — q53's probe-selection shape. */
  private def probes(n: Int): DataFrame =
    emb.filter(col("vec_id") < 10).crossJoin(broadcast(cb))
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
        explode(col("cbs")).as("c"))
      .select(col("q_id"), col("q_vec"), col("c.cb_id").as("pcell"),
        Sim.dot(col("q_vec"), col("c.cb_vec")).as("dd"))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("dd").desc, col("pcell").asc)))
      .filter(col("prn") <= n)
      .select(col("q_id"), col("q_vec"), col("pcell"))

  private def retrieved(n: Int): Set[(Long, Long)] =
    cells.as("c")
      .join(broadcast(probes(n)),
        col("c.cell") === col("pcell") && col("q_id") =!= col("c.vec_id"))
      .select(col("q_id"), col("c.vec_id").as("n_id"),
        Sim.cosine(col("q_vec"), col("c.vec")).as("sim"))
      .groupBy("q_id").agg(expr("topk_pairs(3, sim, n_id)").as("t"))
      .select(col("q_id"), explode(col("t")).as("p"))
      .select(col("q_id"), col("p.id").as("n_id"))
      .as[(Long, Long)].collect().toSet

  private def candidateVolume(n: Int): Long =
    cells.as("c")
      .join(broadcast(probes(n)),
        col("c.cell") === col("pcell") && col("q_id") =!= col("c.vec_id"))
      .count()

  private lazy val truth = Extensions.q21KnnCosine(spark, dir).filter("rank <= 3")
    .select("q_id", "n_id").as[(Long, Long)].collect().toSet

  test("recall@3 is monotone in nprobe and nontrivial at the production setting") {
    val recalls = Seq(1, 3, 5).map { n =>
      val r = (truth intersect retrieved(n)).size.toDouble / truth.size
      n -> r
    }
    info(recalls.map { case (n, r) => f"nprobe=$n recall=$r%.2f" }.mkString("  ")
      + s"  (truth=${truth.size})")
    assert(recalls.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall must not degrade as nprobe grows: $recalls")
    val atProd = recalls.toMap.apply(Extensions.IvfNprobe)
    assert(atProd >= 0.5,
      f"nprobe=${Extensions.IvfNprobe} recall $atProd%.2f below the K=16 expectation")
  }

  test("probing is sublinear: nprobe=3 candidates are a fraction of brute force") {
    val brute = (emb.count() - 1) * 10 // 10 queries x (n-1) candidates
    val ivf = candidateVolume(3)
    info(f"candidates ivf=$ivf brute=$brute ratio=${ivf.toDouble / brute}%.2f")
    assert(ivf < brute / 2,
      s"nprobe=3 should prune most of the corpus (ivf=$ivf, brute=$brute)")
  }
}
