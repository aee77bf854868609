package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-row cost floors for every custom Catalyst expression.
  *
  * Plan-shape auditing (exchange/join counting) provably cannot catch a
  * per-ROW cost bug: round 6's q79 had a perfect plan and a 1.7 ms/row
  * expression (per-row Bloom deserialization) that turned a 0.3 s query
  * into 981 s. This spec pins a rows/sec floor for each custom
  * expression, set ~20× below healthy local throughput — loose enough to
  * ignore machine noise, tight enough that any per-row pathology
  * (re-deserialization, per-row allocation storms, accidental O(state)
  * scans) fails the suite rather than the driver bench.
  *
  * Method: materialize the input first (cache + count), warm one run,
  * then time the second — so the measurement is the expression, not the
  * generator or JIT.
  */
class ExpressionThroughputSpec extends SparkSpec {
  import spark.implicits._

  /** Warm once, then MIN of two timed runs — the bench methodology in
    * miniature: a single sample on a loaded shared box can blow through
    * even a 20× margin (GC pause + neighbor spike), while the min of two
    * measures the code. Keeps the suite honest instead of training
    * developers to ignore intermittent reds.
    */
  private def timeRun(df: => DataFrame): Double = {
    df.count() // warm: codegen, JIT
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      df.count()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  private def assertFloor(name: String, rows: Long, sec: Double, floorRowsPerSec: Double): Unit = {
    val rate = rows / math.max(sec, 1e-9)
    assert(rate >= floorRowsPerSec,
      f"$name: $rate%.0f rows/s is below the $floorRowsPerSec%.0f floor " +
        f"($rows rows in $sec%.2f s) — per-row cost regressed")
  }

  test("bloom_contains: foldable-literal probe ≥ 200k rows/s") {
    val rows = 1000000L
    val image = (1L to 50000L).toDF("k")
      .agg(expr("bloom_agg(50000, k)").as("bf")).head.getAs[Array[Byte]]("bf")
    val input = spark.range(rows).repartition(4).toDF().cache()
    input.count()
    val sec = timeRun(input.filter(org.apache.spark.sql.GraftSqlBridge.column(
      BloomContains(
        org.apache.spark.sql.catalyst.expressions.Literal(
          image, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("id")))))
    input.unpersist()
    // The round-6 bug ran at ~600 rows/s; healthy is >4M rows/s.
    assertFloor("bloom_contains", rows, sec, 200000)
  }

  test("cosine_sim: 16-dim pairs ≥ 100k rows/s") {
    val rows = 500000L
    val input = spark.range(rows).repartition(4)
      .withColumn("a", expr("transform(sequence(1,16), j -> cast((id % 97) * j as double))"))
      .withColumn("b", expr("transform(sequence(1,16), j -> cast((id % 89) + j as double))"))
      .cache()
    input.count()
    val sec = timeRun(input.select(expr("cosine_sim(a, b)").as("s")).filter($"s" > 2.0))
    input.unpersist()
    assertFloor("cosine_sim", rows, sec, 100000)
  }

  test("topk_pairs: grouped aggregate update ≥ 100k rows/s") {
    val rows = 500000L
    val input = spark.range(rows).repartition(4)
      .withColumn("g", $"id" % 64)
      .withColumn("sim", ($"id" % 1000).cast("double") / 1000d)
      .cache()
    input.count()
    val sec = timeRun(input.groupBy("g").agg(expr("topk_pairs(3, sim, id)").as("top")))
    input.unpersist()
    assertFloor("topk_pairs", rows, sec, 100000)
  }

  test("bounded_sorted_list: grouped aggregate update ≥ 100k rows/s") {
    val rows = 500000L
    val input = spark.range(rows).repartition(4)
      .withColumn("g", $"id" % 64)
      .withColumn("v", concat(lit("item_"), $"id" % 10000))
      .cache()
    input.count()
    val sec = timeRun(input.groupBy("g").agg(expr("bounded_sorted_list(8, v)").as("l")))
    input.unpersist()
    assertFloor("bounded_sorted_list", rows, sec, 100000)
  }

  test("freq_items: grouped aggregate update ≥ 100k rows/s") {
    val rows = 500000L
    val input = spark.range(rows).repartition(4)
      .withColumn("g", $"id" % 64)
      .withColumn("v", $"id" % 1000)
      .cache()
    input.count()
    val sec = timeRun(input.groupBy("g").agg(expr("freq_items(8, v)").as("f")))
    input.unpersist()
    assertFloor("freq_items", rows, sec, 100000)
  }

  test("argmax_dot: 8-cell 16-dim assignment ≥ 100k rows/s") {
    val rows = 500000L
    val cb = spark.range(8)
      .select(col("id").cast("int").as("cb_id"),
        expr("transform(sequence(1,16), j -> cast((id * 7 + j) % 13 as double))").as("cb_vec"))
      .agg(sort_array(collect_list(struct($"cb_id", $"cb_vec"))).as("cbs"))
    val input = spark.range(rows).repartition(4)
      .withColumn("vec", expr("transform(sequence(1,16), j -> cast((id % 97) * j as double))"))
      .crossJoin(broadcast(cb))
      .cache()
    input.count()
    val sec = timeRun(input.select(expr("argmax_dot(vec, cbs)").as("b")).filter($"b.id" < 0))
    input.unpersist()
    assertFloor("argmax_dot", rows, sec, 100000)
  }

  test("pq_codes: 16-entry 4x4-subspace encode ≥ 50k rows/s") {
    val rows = 200000L
    val cb = spark.range(16)
      .select(col("id").cast("int").as("cb_id"),
        expr("transform(sequence(1,16), j -> cast((id * 11 + j) % 17 as double))").as("cb_vec"))
      .agg(sort_array(collect_list(struct($"cb_id", $"cb_vec"))).as("cbs"))
    val input = spark.range(rows).repartition(4)
      .withColumn("vec", expr("transform(sequence(1,16), j -> cast((id % 101) * j as double))"))
      .crossJoin(broadcast(cb))
      .cache()
    input.count()
    val sec = timeRun(input.select(expr("pq_codes(vec, cbs, 4, 4)").as("c"))
      .filter(expr("c[0].code") < 0))
    input.unpersist()
    // the m*k*subDim FMA loop: healthy is >1M rows/s at this geometry
    assertFloor("pq_codes", rows, sec, 50000)
  }

  test("simhash16: ~8-token docs ≥ 30k rows/s") {
    val rows = 200000L
    val input = spark.range(rows).repartition(4)
      .withColumn("text", expr(
        "concat_ws(' ', transform(sequence(1, 8), j -> concat('tok', cast(id * 13 + j as string))))"))
      .cache()
    input.count()
    val sec = timeRun(input.select(expr("simhash16(text)").as("h")).filter($"h" < 0))
    input.unpersist()
    // md5 per token dominates; healthy is >400k rows/s at 8 tokens/doc
    assertFloor("simhash16", rows, sec, 30000)
  }

  test("minhash_sigs: ~60-char docs ≥ 5k rows/s") {
    val rows = 50000L
    val input = spark.range(rows).repartition(4)
      .withColumn("text", expr(
        "concat('document body number ', cast(id as string), ' with a shared tail of text')"))
      .cache()
    input.count()
    val sec = timeRun(input.select(expr("minhash_sigs(text, 8, 8)").as("ms"))
      .filter(expr("ms[0] = 'zzzz'")))
    input.unpersist()
    // ~25 sampled md5s per doc dominate; healthy is >100k rows/s here
    assertFloor("minhash_sigs", rows, sec, 5000)
  }

  test("word_bigram_md5s: ~8-token docs ≥ 10k rows/s") {
    val rows = 100000L
    val input = spark.range(rows).repartition(4)
      .withColumn("text", expr(
        "concat_ws(' ', transform(sequence(1, 8), j -> concat('w', cast(id * 7 + j as string))))"))
      .cache()
    input.count()
    val sec = timeRun(input.select(expr("word_bigram_md5s(text)").as("b"))
      .filter(expr("b[0] = 'zz'")))
    input.unpersist()
    // 7 windowed md5s per doc dominate; healthy is >200k rows/s here
    assertFloor("word_bigram_md5s", rows, sec, 10000)
  }

  test("word_ngram_md5s: 16-token docs at w=8 ≥ 10k rows/s") {
    val rows = 100000L
    val input = spark.range(rows).repartition(4)
      .withColumn("text", expr(
        "concat_ws(' ', transform(sequence(1, 16), j -> concat('w', cast(id * 7 + j as string))))"))
      .cache()
    input.count()
    val sec = timeRun(input.select(expr("word_ngram_md5s(text, 8)").as("b"))
      .filter(expr("length(b[0]) = 99")))
    input.unpersist()
    // 9 windowed md5s per doc (each ~8 tokens of bytes); healthy is
    // >150k rows/s here — the floor catches a per-window allocation storm
    assertFloor("word_ngram_md5s", rows, sec, 10000)
  }

  test("bloom_agg: build-side update ≥ 100k rows/s") {
    val rows = 1000000L
    val input = spark.range(rows).repartition(4).toDF().cache()
    input.count()
    val sec = timeRun(input.agg(expr(s"bloom_agg($rows, id)").as("bf")))
    input.unpersist()
    assertFloor("bloom_agg", rows, sec, 100000)
  }

  test("bigram_h60s: ~8-token docs ≥ 10k rows/s") {
    val rows = 100000L
    val input = spark.range(rows).repartition(4)
      .withColumn("text", expr(
        "concat_ws(' ', transform(sequence(1, 8), j -> concat('w', cast(id * 7 + j as string))))"))
      .cache()
    input.count()
    val sec = timeRun(input.select(expr("bigram_h60s(text)").as("g"))
      .filter(expr("g[0] = -1")))
    input.unpersist()
    // 7 three-update md5s per doc dominate; healthy is >200k rows/s here
    assertFloor("bigram_h60s", rows, sec, 10000)
  }

  test("jac_band_keys: 32-gram arrays, 96 permutations ≥ 10k rows/s") {
    val rows = 100000L
    val input = spark.range(rows).repartition(4)
      .withColumn("ghs", expr(
        "transform(sequence(1, 32), j -> cast(id * 131 + j * 7919 as bigint))"))
      .cache()
    input.count()
    val sec = timeRun(input.select(expr("jac_band_keys(ghs)").as("k"))
      .filter(expr("k[0] = -1")))
    input.unpersist()
    // 96 mask-shift permutations x 32 grams per row; healthy is >300k rows/s
    assertFloor("jac_band_keys", rows, sec, 10000)
  }

  test("sorted_inter_size: 64-element sorted pairs ≥ 200k rows/s") {
    val rows = 1000000L
    val input = spark.range(rows).repartition(4)
      .withColumn("a", expr(
        "array_sort(transform(sequence(1, 64), j -> cast(id * 3 + j * 5 as bigint)))"))
      .withColumn("b", expr(
        "array_sort(transform(sequence(1, 64), j -> cast(id * 3 + j * 7 as bigint)))"))
      .cache()
    input.count()
    val sec = timeRun(input.filter(expr("sorted_inter_size(a, b) < 0")))
    input.unpersist()
    // one 128-step merge walk per row, no allocation; healthy is >4M rows/s
    // (the hash-set array_intersect it replaced in q20 runs ~10x slower at
    // this geometry)
    assertFloor("sorted_inter_size", rows, sec, 200000)
  }

  /** ~300-char docs — the testdata documents' shape — for the fused
    * text scorers (q47/q24/q26's hot path).
    */
  private def docInput(rows: Long) = {
    val input = spark.range(rows).repartition(4)
      .withColumn("text", expr(
        "concat_ws(' ', transform(sequence(1, 50), " +
          "j -> concat('word', cast((id * 31 + j) % 997 as string))))"))
      .cache()
    input.count()
    input
  }

  test("lang_bigram_hits: ~300-char docs ≥ 50k rows/s") {
    val rows = 500000L
    val input = docInput(rows)
    val sec = timeRun(input.filter(expr("element_at(lang_bigram_hits(text), 1) < 0")))
    input.unpersist()
    // one byte walk + a 16KB table lookup per position; healthy is
    // >1M rows/s (the chain it replaced: 4 languages x O(len^2) substr
    // shingle arrays through an interpreted filter)
    assertFloor("lang_bigram_hits", rows, sec, 50000)
  }

  test("quality_components: ~300-char docs ≥ 50k rows/s") {
    val rows = 500000L
    val input = docInput(rows)
    val sec = timeRun(input.filter(expr("quality_components(text).n_tokens < 0")))
    input.unpersist()
    // one byte walk for all five signals; healthy is >1M rows/s (the
    // chain: five separate passes incl. a regexp_extract_all match list)
    assertFloor("quality_components", rows, sec, 50000)
  }

  test("token_rep_stats: ~50-token docs ≥ 20k rows/s") {
    val rows = 300000L
    val input = docInput(rows)
    val sec = timeRun(input.filter(expr("token_rep_stats(text).w_n < 0")))
    input.unpersist()
    // two per-doc hash maps; healthy is >300k rows/s — and the floor
    // guards the per-row cost of an expression whose purpose is deleting
    // four corpus-wide exchanges (q51)
    assertFloor("token_rep_stats", rows, sec, 20000)
  }

  test("norm_fingerprint: ~300-char docs ≥ 30k rows/s") {
    val rows = 500000L
    val input = docInput(rows)
    val sec = timeRun(input.filter(expr("norm_fingerprint(text) = 'no'")))
    input.unpersist()
    // byte map + collapse + one md5 per doc; healthy is >500k rows/s
    // (the chain: two full-document java.util.regex replaces + md5)
    assertFloor("norm_fingerprint", rows, sec, 30000)
  }
}
