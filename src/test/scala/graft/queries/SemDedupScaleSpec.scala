package graft.queries

import graft.SparkSpec
import graft.engine.KmeansCodebook
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale contract of the round-8 SemDeDup rework (q90) and its trained
  * coarse quantizer:
  *
  *  (a) FULL COVERAGE — no corpus truncation: with a cap at least as
  *      large as the biggest cell, the banded pairing is row-identical
  *      to exact within-cell SemDeDup (all pairs), and under a binding
  *      cap every doc still gets exactly min(rank−1, cap) candidates —
  *      work is bounded per doc, never silently skipped per doc.
  *  (b) BOUNDED CANDIDATES — the band equi-join's output is ≤ 2·cap per
  *      doc before the exact range filter, and the post-filter candidate
  *      count per doc is ≤ cap (proved here on a single hot cell, the
  *      round-7 failure mode).
  *  (c) MAP-ONLY ASSIGN — cell assignment adds NO shuffle and NO window
  *      over the corpus: every exchange in the assignment plan already
  *      exists in the codebook-training plan (the broadcast build side).
  */
class SemDedupScaleSpec extends SparkSpec {
  import spark.implicits._

  /** n synthetic 4-dim vectors; every vector identical within a group so
    * cosine = 1 ≥ any tau and dup structure is fully predictable.
    */
  private def identicalVecs(n: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      typedlit(Seq(1.0, 0.0, 0.0, 0.0)).as("vec"), lit(0).as("cell"))

  /** Naive reference: the oracle's rank-delta predicate, no banding. */
  private def naive(cells: DataFrame, cap: Int, tau: Double): DataFrame = {
    val rk = cells.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("cell")).orderBy(col("vec_id"))))
    rk.as("a").join(rk.as("b"),
        col("a.cell") === col("b.cell") &&
          col("b.rn") - col("a.rn") >= 1 && col("b.rn") - col("a.rn") <= cap)
      .select(col("b.vec_id").as("vec_id"), col("a.vec_id").as("a_id"),
        graft.functions.SimilarityFunctions.cosine(col("a.vec"), col("b.vec")).as("sim"))
      .filter(col("sim") >= tau)
      .groupBy(col("vec_id"))
      .agg(min(col("a_id")).as("dup_of"), count(lit(1)).as("n_dups"),
        graft.functions.NumFunctions.r4(max(col("sim"))).as("max_sim"))
  }

  private def asSet(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select(col("vec_id"), col("dup_of"), col("n_dups"), col("max_sim"))
      .as[(Long, Long, Long, Double)].collect().toSet

  /** Random-ish but deterministic multi-cell layout for equivalence runs. */
  private def randomCells(n: Int, nCells: Int): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      array((0 until 4).map(d => (pmod(hash(col("id") * 31 + d), lit(97)).cast("double") - 48.0) / 7.0): _*).as("vec"),
      pmod(hash(col("id")), lit(nCells)).cast("int").as("cell"))

  test("banded pairing == naive rank-delta predicate, cap binding and not") {
    val cells = randomCells(300, 5).cache()
    for (cap <- Seq(2, 7, 400)) { // binding, binding, non-binding (> cell size)
      val got = asSet(Extensions.semdedupFromCells(spark, cells, cap, tau = 0.2))
      val want = asSet(naive(cells, cap, tau = 0.2))
      assert(got == want, s"cap=$cap")
    }
  }

  test("full coverage: non-binding cap equals EXACT all-pairs within-cell SemDeDup") {
    val cells = randomCells(200, 3).cache()
    val exact = cells.withColumn("rn", lit(0)) // all-pairs, no rank involved
    val allPairs = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"), col("a.vec_id").as("a_id"),
        graft.functions.SimilarityFunctions.cosine(col("a.vec"), col("b.vec")).as("sim"))
      .filter(col("sim") >= 0.2)
      .groupBy(col("vec_id"))
      .agg(min(col("a_id")).as("dup_of"), count(lit(1)).as("n_dups"),
        graft.functions.NumFunctions.r4(max(col("sim"))).as("max_sim"))
    val got = asSet(Extensions.semdedupFromCells(spark, cells, cap = 10000, tau = 0.2))
    assert(got == asSet(allPairs))
  }

  test("hot cell: every doc covered, candidates per doc == min(rank-1, cap)") {
    // Round 7 truncated a hot cell at 128 rows and silently skipped the
    // rest; now a 100-row single cell with cap=5 must mark EVERY doc but
    // the first as a dup, each with exactly min(rank-1, cap) neighbors.
    val out = Extensions.semdedupFromCells(spark, identicalVecs(100), cap = 5, tau = 0.9)
      .select(col("vec_id"), col("dup_of"), col("n_dups"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 99) // all but vec_id 0
    out.foreach { case (id, dupOf, nDups) =>
      assert(dupOf == math.max(0L, id - 5), s"id=$id")
      assert(nDups == math.min(id, 5L), s"id=$id")
    }
  }

  test("assign is map-only: no window, no new exchange beyond codebook training") {
    val emb = spark.range(50).select(col("id").as("vec_id"),
      array((0 until 4).map(d =>
        (pmod(hash(col("id") * 17 + d), lit(89)).cast("double") - 44.0) / 5.0): _*).as("vec"))
      .localCheckpoint(true)
    val cb = KmeansCodebook.train(emb, k = 8, iters = 1)
    val assigned = emb.crossJoin(broadcast(cb))
      .select(col("vec_id"),
        KmeansCodebook.best(col("vec"), col("cbs")).getField("id").as("cell"))
    def count(df: DataFrame, node: String): Int =
      node.r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(count(assigned, "Window") == 0)
    // every shuffle in the assignment plan is one the codebook build
    // already pays; the corpus pass itself adds none
    assert(count(assigned, "Exchange hashpartitioning") ==
      count(cb, "Exchange hashpartitioning"))
    // cells survive as a real partition of the corpus: every vector lands
    // in exactly one live cell
    val n = assigned.count()
    assert(n == 50 && assigned.filter(col("cell") >= 0).count() == n)
  }
}
