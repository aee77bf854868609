package graft.io

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-job Bloom persistence: the image survives a round-trip with its
  * provenance, probes with zero false negatives, equals the inline-built
  * image bit-for-bit (deterministic sketch), and re-saving replaces.
  */
class FilterStoreSpec extends SparkSpec {
  import spark.implicits._

  test("save → load round-trips image + provenance; probe has no false negatives") {
    val dir = Files.createTempDirectory("fstore").toString + "/orders_keys.bloom"
    val keys = (1L to 20000L).map(_ * 3).toDF("k")
    val built = FilterStore.save(spark, dir, keys, expected = 20000L,
      fpp = Some(0.01), builtFrom = "test: k = 3·i, i ≤ 20000")
    val (loaded, meta) = FilterStore.load(spark, dir)
    assert(java.util.Arrays.equals(built, loaded))
    assert(meta.nKeys == 20000L && meta.expected == 20000L)
    assert(meta.fpp.contains(0.01) && meta.builtFrom.contains("3·i"))
    // "another job": probe built from the LOADED image only
    val probe = spark.range(1, 60001).toDF("p")
      .filter(FilterStore.probe(loaded, col("p")))
    assert(probe.filter($"p" % 3 === 0).count() === 20000L) // no false negatives
    val fpr = (probe.count() - 20000L).toDouble / 40000L
    assert(fpr < 0.03, s"fpr $fpr way outside the 1% design point")
  }

  test("deterministic image: persisted equals inline bloom_agg build") {
    val dir = Files.createTempDirectory("fstore").toString + "/f.bloom"
    val keys = (1L to 5000L).toDF("k")
    FilterStore.save(spark, dir, keys, expected = 5000L)
    val (loaded, _) = FilterStore.load(spark, dir)
    val inline = keys.repartition(7) // different layout, same image (OR-merge)
      .agg(expr("bloom_agg(5000L, k)").as("bf")).head.getAs[Array[Byte]]("bf")
    assert(java.util.Arrays.equals(loaded, inline))
  }

  test("crash between park and publish: next save restores the survivor first") {
    val dir = Files.createTempDirectory("fstore").toString + "/f.bloom"
    FilterStore.save(spark, dir, (1L to 100L).toDF("k"), expected = 100L,
      builtFrom = "v1")
    // simulate the crash window: target parked, replacement never landed
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(dir)
    val parked = new org.apache.hadoop.fs.Path(
      target.getParent, s".${target.getName}.replaced")
    assert(fs.rename(target, parked))
    assert(!fs.exists(target) && fs.exists(parked))
    // the next save must recover the survivor before staging (so a
    // staging failure cannot lose the last good image) and then publish
    FilterStore.save(spark, dir, (1L to 200L).toDF("k"), expected = 200L,
      builtFrom = "v2")
    val (_, meta) = FilterStore.load(spark, dir)
    assert(meta.builtFrom == "v2" && meta.nKeys == 200L)
    assert(!fs.exists(parked))
  }

  test("handle-keyed probes reuse ONE broadcast across N probes; re-save rotates it") {
    def bcastOf(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftSqlBridge.expression(c)
        .asInstanceOf[graft.expressions.BloomContainsBroadcast].bcast
    val dir = Files.createTempDirectory("fstore").toString + "/f.bloom"
    FilterStore.save(spark, dir, (1L to 5000L).toDF("k"), expected = 5000L)
    val h = FilterStore.loadHandle(spark, dir)
    // N probes of one handle: all memo-hit the same broadcast (the key is
    // the snapshot id — a map lookup, no per-call content hash), so plan
    // rebuilds neither leak blocks nor pay O(image) to find that out.
    val bs = (1 to 5).map(_ => bcastOf(FilterStore.probeBroadcast(spark, h, col("p"))))
    assert(bs.forall(_ eq bs.head), "expected one shared broadcast across probes")
    // and the handle path agrees with the content-keyed path row-for-row
    val byHandle = spark.range(1, 10001).toDF("p")
      .filter(FilterStore.probeBroadcast(spark, h, col("p"))).count()
    val byContent = spark.range(1, 10001).toDF("p")
      .filter(FilterStore.probeBroadcast(spark, h.image, col("p"))).count()
    assert(byHandle === byContent)
    // re-save publishes a new snapshot: a fresh handle must get a fresh
    // broadcast, never the stale image. No sleep: the snapshot id is the
    // per-save publish_id UUID, so even a re-save inside the same
    // filesystem-mtime tick gets a distinct identity (round-10 advice).
    FilterStore.save(spark, dir, (9000L to 9100L).toDF("k"), expected = 200L)
    val h2 = FilterStore.loadHandle(spark, dir)
    assert(h2.snapshotId != h.snapshotId)
    assert(bcastOf(FilterStore.probeBroadcast(spark, h2, col("p"))) ne bs.head)
  }

  test("re-save replaces the stored filter") {
    val dir = Files.createTempDirectory("fstore").toString + "/f.bloom"
    FilterStore.save(spark, dir, (1L to 100L).toDF("k"), expected = 100L)
    FilterStore.save(spark, dir, (1000L to 1100L).toDF("k"), expected = 200L,
      builtFrom = "v2")
    val (img, meta) = FilterStore.load(spark, dir)
    assert(meta.nKeys == 101L && meta.expected == 200L && meta.builtFrom == "v2")
    // old keys are not all present in the new image (it is a new filter)
    val oldHits = spark.range(1, 101).toDF("p")
      .filter(FilterStore.probe(img, col("p"))).count()
    assert(oldHits < 50, s"$oldHits of 100 stale keys 'present' — replace did not happen")
  }
}
