package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** bloom_agg + bloom_contains: no false negatives under any partition
  * layout, bounded false positives, string and long keys, null handling,
  * SQL registration, and the q79 contract (prefilter + exact confirm ≡
  * plain join).
  */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives, any merge layout; fpp stays bounded") {
    val keys = (1L to 5000L).map(_ * 7)
    for (parts <- Seq(1, 5, 32)) {
      val flt = keys.toDF("k").repartition(parts)
        .agg(expr("bloom_agg(5000, k)").as("bf"))
      val probe = (1L to 70000L).toDF("p")
        .crossJoin(broadcast(flt))
        .withColumn("hit", expr("bloom_contains(bf, p)"))
      val present = probe.filter($"p" % 7 === 0 && $"p" <= 35000)
      assert(present.filter(!$"hit").count() === 0, s"parts=$parts: false negative")
      val absent = probe.filter(!($"p" % 7 === 0 && $"p" <= 35000))
      val fpp = absent.filter($"hit").count().toDouble / absent.count()
      assert(fpp < 0.05, s"parts=$parts: fpp $fpp out of the 3%-design envelope")
    }
  }

  test("string keys; nulls ignored in build and null probes yield null") {
    val flt = Seq(Some("alpha"), Some("beta"), None).toDF("s")
      .agg(expr("bloom_agg(100, s)").as("bf"))
    val out = Seq(Some("alpha"), Some("beta"), Some("nope-zzz"), None).toDF("p")
      .crossJoin(broadcast(flt))
      .select($"p", expr("bloom_contains(bf, p)").as("hit"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(out("alpha") == true && out("beta") == true)
    assert(out(null) == null) // null probe → null, SQL three-valued logic
  }

  test("q79 contract: bloom prefilter + exact confirm equals the plain join") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.Extensions.q79BloomJoin(spark, dir)
    // The prefilter is really in the plan (the extension branch fired)…
    assert(q.queryExecution.executedPlan.toString.contains("bloom_contains"))
    val withBloom = q.orderBy("ship_year", "ship_month").collect().toSeq
    // …and is semantically invisible vs the inline plain join.
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT").select("o_orderkey")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(year($"l_shipdate").as("ship_year"), month($"l_shipdate").as("ship_month"))
      .agg(
        round(sum(($"l_extendedprice" * (lit(1d) - $"l_discount")).cast("decimal(18,6)")), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy("ship_year", "ship_month").collect().toSeq
    assert(withBloom == plain)
    assert(withBloom.nonEmpty)
  }

  test("deserializations scale with tasks, not rows (both filter forms)") {
    import graft.expressions.BloomContains
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val parts = 4
    val rows = 200000L
    val image = (1L to 5000L).toDF("k")
      .agg(expr("bloom_agg(5000, k)").as("bf")).head.getAs[Array[Byte]]("bf")
    // Foldable-literal form (the q79 plan shape): one readFrom per task.
    val before = BloomContains.deserializations.get()
    val lit = spark.range(rows).repartition(parts)
      .filter(org.apache.spark.sql.GraftSqlBridge.column(
        BloomContains(Literal(image, BinaryType), UnresolvedAttribute("id"))))
      .count()
    val afterLit = BloomContains.deserializations.get()
    assert(lit > 0)
    assert(afterLit - before <= parts * 2 + 2,
      s"literal form: ${afterLit - before} deserializations for $parts tasks — " +
        "the per-task contract is broken (round-6 q79 regressed to per-ROW: 981s at sf0.1)")
    // Column form (crossJoin broadcast): the exact-content cache must hold —
    // UnsafeRow.getBinary copies the bytes per row, so an identity-keyed
    // cache would deserialize all `rows` times here.
    val flt = (1L to 5000L).toDF("k").agg(expr("bloom_agg(5000, k)").as("bf"))
    val col = spark.range(rows).repartition(parts)
      .crossJoin(broadcast(flt))
      .filter(expr("bloom_contains(bf, id)"))
      .count()
    val afterCol = BloomContains.deserializations.get()
    assert(col === lit)
    assert(afterCol - afterLit <= parts * 2 + 2,
      s"column form: ${afterCol - afterLit} deserializations for $parts tasks — " +
        "the content cache is not hitting")
  }

  test("broadcast form: one deserialization per executor, plan size independent of image") {
    import graft.io.FilterStore
    val parts = 6
    val image = (1L to 5000L).toDF("k")
      .agg(expr("bloom_agg(5000, k)").as("bf")).head.getAs[Array[Byte]]("bf")
    val before = BloomContains.deserializations.get()
    val kept = spark.range(200000L).repartition(parts)
      .filter(FilterStore.probeBroadcast(spark, image, col("id")))
      .count()
    val after = BloomContains.deserializations.get()
    assert(kept > 0)
    // per-EXECUTOR (= per JVM in local mode), not per task: exactly one
    // readFrom no matter how many of the `parts` tasks probe
    assert(after - before == 1,
      s"broadcast form: ${after - before} deserializations for $parts tasks — want 1/executor")
    // exact no-false-negative agreement with the literal form
    val litKept = spark.range(200000L).repartition(parts)
      .filter(FilterStore.probe(image, col("id"))).count()
    assert(kept == litKept)
    // plan-size independence: the executed plan's serialized footprint
    // must not embed the image (the literal form's plan DOES)
    def planChars(c: org.apache.spark.sql.Column): Int =
      spark.range(10).filter(c).queryExecution.executedPlan.toString.length
    val small = planChars(FilterStore.probeBroadcast(spark, Array.fill(64)(1: Byte), col("id")))
    val big = planChars(FilterStore.probeBroadcast(spark, Array.fill(1 << 20)(1: Byte), col("id")))
    assert(math.abs(big - small) < 200,
      s"broadcast plan grew with image size: $small -> $big chars")
  }

  test("probe dispatch: literal below threshold, broadcast at and above") {
    import graft.io.FilterStore
    val img = (1L to 100L).toDF("k")
      .agg(expr("bloom_agg(100, k)").as("bf")).head.getAs[Array[Byte]]("bf")
    val litForm = FilterStore.probe(spark, img, col("id"))
    assert(org.apache.spark.sql.GraftSqlBridge.expression(litForm)
      .isInstanceOf[BloomContains])
    // pad an image to the threshold: dispatch must flip to broadcast
    // (contents do not matter for the dispatch decision)
    val bigImg = java.util.Arrays.copyOf(img, FilterStore.BroadcastThresholdBytes)
    val bcForm = FilterStore.probe(spark, bigImg, col("id"))
    assert(org.apache.spark.sql.GraftSqlBridge.expression(bcForm)
      .isInstanceOf[BloomContainsBroadcast])
  }

  test("resolves from SQL text through the extension registration") {
    (1L to 100L).toDF("k").createOrReplaceTempView("bloom_keys")
    val one = spark.sql(
      "SELECT bloom_contains(bloom_agg(100, k), 50L) AS hit FROM bloom_keys")
      .head().getBoolean(0)
    assert(one)
  }

  test("alternating images through one instance never cross-contaminate, even racing") {
    import org.apache.spark.util.sketch.BloomFilter
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BinaryType, LongType}
    def image(lo: Long, hi: Long): Array[Byte] = {
      val f = BloomFilter.create(hi - lo + 1)
      (lo to hi).foreach(f.putLong)
      val out = new java.io.ByteArrayOutputStream(); f.writeTo(out); out.toByteArray
    }
    val imgA = image(1, 5000)
    val imgB = image(100000, 105000)
    // non-foldable-shaped instance (left literal is NULL so the folded
    // fast path is off and every call goes through the content cache)
    val bc = graft.expressions.BloomContains(
      Literal(null, BinaryType), Literal(0L, LongType))
    // single-thread alternation: a stale (key, filter) pairing would
    // return a false NEGATIVE for a present key
    (1 to 200).foreach { i =>
      assert(bc.test(imgA, (i % 5000 + 1).toLong), s"A miss at $i")
      assert(bc.test(imgB, (100000 + i % 5000).toLong), s"B miss at $i")
    }
    // racing threads through the SAME instance: the immutable cache entry
    // may be overwritten (wasted work) but never mismatched
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        (1 to 500).foreach { i =>
          val (img, key) =
            if ((t + i) % 2 == 0) (imgA, (i % 5000 + 1).toLong)
            else (imgB, (100000 + i % 5000).toLong)
          if (!bc.test(img, key)) errs.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.get() === 0, s"${errs.get()} false negatives under racing alternation")
  }

  test("explicit fpp: tighter design rate costs a bigger image, never recall") {
    val df = (1L to 20000L).map(_ * 3).toDF("k")
    def image(call: String): Array[Byte] =
      df.agg(expr(call).as("bf")).head.getAs[Array[Byte]]("bf")
    val default = image("bloom_agg(20000, k)")       // library default 3 %
    val tight = image("bloom_agg(20000, k, 0.001d)") // ~14.4 bits/key
    // the natural spelling (bare decimal literal parses as DECIMAL, not
    // DOUBLE) must work too, and produce the identical image
    val tightPlain = image("bloom_agg(20000, k, 0.001)")
    assert(java.util.Arrays.equals(tight, tightPlain),
      "plain-decimal fpp literal rejected or drifted from the 0.001d form")
    // bits/key ≈ −1.44·log2(fpp): 0.1 % must be ~2× the 3 % image
    assert(tight.length > default.length * 3 / 2,
      s"fpp not applied: ${tight.length} vs ${default.length} bytes")
    // no false negatives at any fpp
    val flt = df.agg(expr("bloom_agg(20000, k, 0.001d)").as("bf"))
    val missing = (1L to 20000L).map(_ * 3).toDF("p")
      .crossJoin(broadcast(flt))
      .filter(!expr("bloom_contains(bf, p)")).count()
    assert(missing === 0)
    // invalid fpp rejected at analysis
    val bad = intercept[Exception](image("bloom_agg(100, k, 1.5d)"))
    assert(bad.getMessage.contains("fpp"))
  }
}
