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

  test("variants execute and keep their envelope's grouping columns") {
    SparkEntry.benchVariants.foreach { case (name, fn) =>
      val prod = fn(spark, sf)
      val envelope = SparkEntry.queries(name)(spark, sf)
      // the envelope's first column is the group key in both sketch
      // families (l_returnflag); the production plan must share it
      assert(prod.columns.head == envelope.columns.head,
        s"$name: variant groups by ${prod.columns.head}, " +
          s"envelope by ${envelope.columns.head}")
      assert(prod.count() > 0, s"$name: production variant returned 0 rows")
    }
  }
}
