package graft

/** The benchVariants contract: every variant shadows a real `queries`
  * entry (Bench resolves `benchVariants.getOrElse(name, queries(name))`
  * — an orphan key would silently never run), and each production plan
  * executes and produces rows at the smoke scale. The envelope/sketch
  * SPLIT itself (verify runs the envelope, bench the sketch) is the
  * point — this spec keeps the two surfaces from drifting apart
  * structurally: a variant must group by the same keys its envelope
  * groups by, or its timings would price a different result shape.
  */
class BenchVariantsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every variant key shadows a queries entry") {
    val orphans = SparkEntry.benchVariants.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"benchVariants keys not in queries: $orphans")
  }

  // The FULL group-key column set each variant must share with its
  // envelope (r16 ADVICE: comparing only columns.head let a variant
  // drift in grouping beyond the first key or in column order). Empty
  // = global aggregate: the variant must then match the envelope's
  // column list exactly, so Bench times the same result shape Verify
  // checks. Adding a benchVariants entry without a row here fails the
  // completeness assertion below.
  private val groupKeys: Map[String, Seq[String]] = Map(
    "q30_approx_distinct" -> Seq("l_returnflag"),
    "q36_profile_stats" -> Seq.empty,
    "q43_approx_percentiles" -> Seq("l_returnflag"),
    "q83_hll_union" -> Seq("l_returnflag"),
  )

  test("variants execute and keep their envelope's grouping columns") {
    assert(SparkEntry.benchVariants.keySet == groupKeys.keySet,
      "groupKeys table out of sync with SparkEntry.benchVariants: " +
        s"missing ${SparkEntry.benchVariants.keySet -- groupKeys.keySet}, " +
        s"stale ${groupKeys.keySet -- SparkEntry.benchVariants.keySet}")
    SparkEntry.benchVariants.foreach { case (name, fn) =>
      val prod = fn(spark, sf)
      val envelope = SparkEntry.queries(name)(spark, sf)
      val keys = groupKeys(name)
      if (keys.isEmpty)
        assert(prod.columns.toSeq == envelope.columns.toSeq,
          s"$name: global-agg variant columns ${prod.columns.toSeq} != " +
            s"envelope ${envelope.columns.toSeq}")
      else {
        assert(prod.columns.take(keys.size).toSeq == keys,
          s"$name: variant leads with ${prod.columns.take(keys.size).toSeq}, " +
            s"expected group keys $keys")
        assert(envelope.columns.take(keys.size).toSeq == keys,
          s"$name: envelope leads with ${envelope.columns.take(keys.size).toSeq}, " +
            s"expected group keys $keys")
      }
      assert(prod.count() > 0, s"$name: production variant returned 0 rows")
    }
  }
}
