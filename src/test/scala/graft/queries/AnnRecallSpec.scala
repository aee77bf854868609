package graft.queries

import graft.SparkSpec
import graft.functions.{SimilarityFunctions => Sim}
import org.apache.spark.sql.functions._

/** ANN quality contract: probe expansion must monotonically improve recall
  * against brute-force ground truth.
  *
  * Plane count is a recall/candidate-set tradeoff: at 500 random vectors
  * the production setting (8 planes = 256 buckets) leaves ~2 vectors per
  * bucket and near-zero recall — correct behavior for that geometry, but
  * useless as a quality probe. This spec uses 4 planes (16 buckets,
  * ~31 candidates/bucket) where hyperplane LSH has signal at this scale;
  * the sizing rule (buckets ∝ n / wanted-candidates) is the point.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val planes = Sim.hyperplanes(4, 64)

  private lazy val emb = graft.io.Tables.load(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    .withColumn("bucket", Sim.lshBucket(col("vec"), planes))
    .cache()

  private def retrieved(probesOf: org.apache.spark.sql.Column): Set[(Long, Long)] = {
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
        explode(probesOf).as("pbucket"))
    emb.as("c")
      .join(q, col("c.bucket") === col("pbucket") && col("q_id") =!= col("c.vec_id"))
      .select(col("q_id"), col("c.vec_id").as("n_id"),
        Sim.cosine(col("q_vec"), col("c.vec")).as("sim"))
      .groupBy("q_id").agg(expr("topk_pairs(3, sim, n_id)").as("t"))
      .select(col("q_id"), explode(col("t")).as("p"))
      .select(col("q_id"), col("p.id").as("n_id"))
      .as[(Long, Long)].collect().toSet
  }

  private lazy val truth = Extensions.q21KnnCosine(spark, dir).filter("rank <= 3")
    .select("q_id", "n_id").as[(Long, Long)].collect().toSet

  private def candidateVolume(probesOf: org.apache.spark.sql.Column): Long = {
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), explode(probesOf).as("pbucket"))
    emb.as("c")
      .join(q, col("c.bucket") === col("pbucket") && col("q_id") =!= col("c.vec_id"))
      .count()
  }

  private def d1Probes = array(
    col("bucket") +: (0 until 4).map(j => col("bucket").bitwiseXOR(lit(1 << j))): _*)

  test("multi-probe recall >= single-probe recall, both nontrivial vs brute force") {
    val single = retrieved(array(col("bucket")))
    val multi = retrieved(d1Probes)
    val rSingle = (truth intersect single).size.toDouble / truth.size
    val rMulti = (truth intersect multi).size.toDouble / truth.size
    info(f"recall single-probe=$rSingle%.2f multi-probe=$rMulti%.2f (truth=${truth.size})")
    assert(rMulti >= rSingle)
    assert(rMulti > 0.3, s"multi-probe recall $rMulti below the 4-plane expectation")
  }

  test("query-directed probing: recall >= 0.8 within 3x the d1 schedule's candidate volume") {
    // the q50 schedule (ProbeFlipPattern over margin-ranked bits), at this
    // spec's 4-plane geometry
    val ms = Extensions.marginSortExpr(col("vec"), planes)
    val qdProbes = {
      val withMs = array(Extensions.probeMasks("ms").map(m => col("bucket").bitwiseXOR(m)): _*)
      withMs
    }
    // retrieved() references columns of emb + a computed ms column
    val embMs = emb.withColumn("ms", ms)
    val q = embMs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
        explode(qdProbes).as("pbucket"))
    val got = emb.as("c")
      .join(q, col("c.bucket") === col("pbucket") && col("q_id") =!= col("c.vec_id"))
      .select(col("q_id"), col("c.vec_id").as("n_id"),
        Sim.cosine(col("q_vec"), col("c.vec")).as("sim"))
      .groupBy("q_id").agg(expr("topk_pairs(3, sim, n_id)").as("t"))
      .select(col("q_id"), explode(col("t")).as("p"))
      .select(col("q_id"), col("p.id").as("n_id"))
      .as[(Long, Long)].collect().toSet
    val volume = q.join(emb.as("c"),
      col("c.bucket") === col("pbucket") && col("q_id") =!= col("c.vec_id")).count()
    val budget = 3 * candidateVolume(d1Probes)
    val recall = (truth intersect got).size.toDouble / truth.size
    info(f"query-directed recall=$recall%.2f candidates=$volume budget=$budget")
    assert(recall >= 0.8, f"query-directed recall $recall%.2f < 0.8")
    assert(volume <= budget, s"candidate volume $volume exceeds 3x d1 budget $budget")
  }

  /** The documented knob sweep (SCALING.md "ANN recall-vs-cost"): recall@3
    * and candidate volume per (plane count × probe schedule), against the
    * same brute-force truth. Run with
    * `sbt "testOnly graft.queries.AnnRecallSpec"` and read the info lines;
    * the table in SCALING.md is this output verbatim. The assertions pin
    * only the structural laws (more probes ⇒ recall never drops, fewer
    * planes ⇒ candidate volume never drops), not the point values — those
    * are measurements, not contracts.
    */
  test("recall-vs-cost sweep: planes x probe schedule (table for SCALING.md)") {
    val sweep = for (nPlanes <- Seq(4, 6, 8)) yield {
      val pl = Sim.hyperplanes(nPlanes, 64)
      val e = graft.io.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
        .withColumn("bucket", Sim.lshBucket(col("vec"), pl))
        .cache()
      def measure(probesOf: org.apache.spark.sql.Column, frame: org.apache.spark.sql.DataFrame) = {
        val q = frame.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
            explode(probesOf).as("pbucket"))
        val joined = e.as("c")
          .join(q, col("c.bucket") === col("pbucket") && col("q_id") =!= col("c.vec_id"))
        val got = joined
          .select(col("q_id"), col("c.vec_id").as("n_id"),
            Sim.cosine(col("q_vec"), col("c.vec")).as("sim"))
          .groupBy("q_id").agg(expr("topk_pairs(3, sim, n_id)").as("t"))
          .select(col("q_id"), explode(col("t")).as("p"))
          .select(col("q_id"), col("p.id").as("n_id"))
          .as[(Long, Long)].collect().toSet
        ((truth intersect got).size.toDouble / truth.size, joined.count())
      }
      val (rs, vs) = measure(array(col("bucket")), e)
      val d1 = array(col("bucket") +:
        (0 until nPlanes).map(j => col("bucket").bitwiseXOR(lit(1 << j))): _*)
      val (rd, vd) = measure(d1, e)
      val eMs = e.withColumn("ms", Extensions.marginSortExpr(col("vec"), pl))
      val qd = array(Extensions.probeMasks("ms").map(m => col("bucket").bitwiseXOR(m)): _*)
      val (rq, vq) = measure(qd, eMs)
      e.unpersist()
      info(f"| $nPlanes planes | single $rs%.2f @ $vs%4d | d1 $rd%.2f @ $vd%4d | query-directed $rq%.2f @ $vq%4d |")
      (nPlanes, (rs, vs), (rd, vd), (rq, vq))
    }
    sweep.foreach { case (_, (rs, vs), (rd, vd), (rq, _)) =>
      assert(rd >= rs, "d1 probing must not lose recall vs single-probe")
      assert(rq >= rs, "query-directed probing must not lose recall vs single-probe")
      assert(vd >= vs, "d1 probes at least the single-probe volume")
    }
    // more planes ⇒ smaller buckets ⇒ candidate volume shrinks
    val singleVolumes = sweep.map(_._2._2)
    assert(singleVolumes == singleVolumes.sorted.reverse,
      s"single-probe candidate volume should fall as planes rise: $singleVolumes")
  }
}
