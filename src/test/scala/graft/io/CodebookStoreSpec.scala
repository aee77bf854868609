package graft.io

import java.nio.file.Files
import graft.SparkSpec
import graft.engine.KmeansCodebook
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CodebookStore: persisted cells assign identically to in-plan training
  * (the cross-JOB determinism contract — an index built yesterday must
  * bucket today's corpus exactly like the building job did), provenance
  * round-trips, re-training replaces, and assignment of NEW vectors
  * (never seen at training) is well-defined.
  */
class CodebookStoreSpec extends SparkSpec {
  import spark.implicits._

  private def emb(n: Int, seed: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      array((0 until 8).map(d =>
        (pmod(hash(col("id") * seed + d), lit(101)).cast("double") - 50.0) / 9.0): _*).as("vec"))

  test("persisted codebook assigns bit-identically to in-plan training; meta round-trips") {
    val dir = Files.createTempDirectory("cbstore").toString + "/cb"
    val e = emb(300, 13).cache()
    CodebookStore.save(spark, dir, e, k = 8, iters = 2, builtFrom = "spec corpus")
    val (cb, meta) = CodebookStore.load(spark, dir)
    assert(meta == CodebookStore.Meta(8, 2, 300L, 8, "spec corpus"))
    val fromStore = CodebookStore.assign(e, cb)
      .select("vec_id", "cell", "cell_score").as[(Long, Int, Double)].collect().toSet
    val inPlanSet = e.crossJoin(broadcast(KmeansCodebook.train(e, 8, 2)))
      .withColumn("__b", KmeansCodebook.bestByName(spark, "vec", "cbs"))
      .select(col("vec_id"), col("__b.id"), col("__b.d"))
      .as[(Long, Int, Double)].collect().toSet
    assert(fromStore == inPlanSet)
  }

  test("new vectors assign against yesterday's cells; re-train replaces") {
    val dir = Files.createTempDirectory("cbstore2").toString + "/cb"
    CodebookStore.save(spark, dir, emb(200, 13), k = 8, iters = 1)
    val (cb, _) = CodebookStore.load(spark, dir)
    // a disjoint "today" batch: every row must land in exactly one live cell
    val today = emb(150, 29)
    val assigned = CodebookStore.assign(today, cb)
    assert(assigned.count() == 150)
    assert(assigned.filter(col("cell") < 0).count() == 0)
    // re-train on different data replaces the index
    CodebookStore.save(spark, dir, emb(250, 31), k = 4, iters = 1, builtFrom = "v2")
    val (_, meta2) = CodebookStore.load(spark, dir)
    assert(meta2.nVectors == 250L && meta2.k == 4 && meta2.builtFrom == "v2")
  }
}
