package graft.expressions

import graft.SparkSpec
import graft.functions.{SimilarityFunctions => Sim}
import org.apache.spark.sql.functions._

class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  test("topk_pairs keeps the k best scores, ties to lower id, sorted desc") {
    val df = Seq(
      ("g", 0.5, 10L), ("g", 0.9, 11L), ("g", 0.7, 12L),
      ("g", 0.9, 5L), ("g", 0.1, 13L)).toDF("g", "s", "i")
    val out = df.groupBy("g")
      .agg(expr("topk_pairs(3, s, i)").as("top"))
      .select(explode(col("top")).as("p"))
      .select(col("p.score"), col("p.id"))
      .as[(Double, Long)].collect().toSeq
    assert(out == Seq((0.9, 5L), (0.9, 11L), (0.7, 12L)))
  }

  test("k must be a positive integral literal (analysis-time rejection, not runtime NoSuchElement)") {
    val df = Seq(("g", 0.5, 10L)).toDF("g", "s", "i")
    Seq("topk_pairs(0, s, i)", "topk_pairs(-1, s, i)", "topk_pairs(1.5, s, i)").foreach { bad =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.groupBy("g").agg(expr(bad)).collect()
      }
      assert(e.getMessage.contains("k must be"), s"$bad: ${e.getMessage}")
    }
  }

  test("partial-merge path (multi-partition input) gives same result") {
    val df = spark.range(0, 10000, 1, 8) // 8 partitions → real partial merges
      .select(lit("g").as("g"), (col("id") % 97).cast("double").as("s"), col("id").as("i"))
    val top = df.groupBy("g").agg(expr("topk_pairs(5, s, i)").as("t"))
      .select(explode(col("t")).as("p")).select(col("p.score"), col("p.id"))
      .as[(Double, Long)].collect().toSeq
    // best score is 96; first ids with s=96 are 96, 193, 290, 387, 484
    assert(top == Seq((96.0, 96L), (96.0, 193L), (96.0, 290L), (96.0, 387L), (96.0, 484L)))
  }

  test("aggregation KNN path matches the window-rank KNN") {
    val emb = graft.io.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    val sims = emb.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        expr("cosine_sim(q_vec, vec)").as("sim"))
    val viaAgg = sims.groupBy("q_id")
      .agg(expr("topk_pairs(5, sim, n_id)").as("t"))
      .select(col("q_id"), posexplode(col("t")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("n_id"), (col("pos") + 1).as("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val viaWindow = Sim.cosineKnn(q.select(col("q_id").as("vec_id"), col("q_vec").as("vec")), emb, "vec_id", "vec", 5)
      .select(col("q_id"), col("n_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(viaAgg == viaWindow)
  }
}
