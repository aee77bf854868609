package graft.queries

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Cleaning, DateDim, Dedup, Scd2}
import graft.functions.NumFunctions.{r2, r4}
import graft.io.Tables

/** Reference-parity operator family (SURVEY.md §2), phrased against the
  * driver's testdata star schema (TESTDATA.md). Each query maps 1:1 to an
  * operator inventory row and has an exact DuckDB oracle in
  * [[graft.queries.Oracles]].
  *
  * Numeric-determinism policy (so oracle hashes match bit-for-bit):
  *  - large double SUMs go through DECIMAL(18,6) (associative, exact);
  *  - AVGs and window prefix-sums stay double (accumulation order is
  *    identical on both engines) and are rounded;
  *  - timestamps are emitted as formatted strings or DATEs, never raw
  *    (the testdata mixes ms/ns parquet timestamp units).
  */
object Parity {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** HLL++ distinct estimate — the native single-buffer
    * `hllpp_distinct` when GraftExtensions is registered (bit-identical
    * estimates; see [[graft.expressions.HllppDistinct]] for why the
    * built-in's 2,731-field buffer costs ~0.3 s of codegen-source
    * generation PER TASK at rsd 0.01), `approx_count_distinct`
    * otherwise — the same optional-with-fallback contract as every other
    * native expression in the query surface.
    */
  private def hllppDistinct(s: SparkSession, column: String, rsd: Double): Column =
    if (s.catalog.functionExists("hllpp_distinct"))
      expr(s"hllpp_distinct($column, ${rsd}d)")
    else approx_count_distinct(col(column), rsd)

  /** P3/P4/P5/P8: error-token cleaning — whitelist, digit scrub, conditional
    * null-out (reference: Silver Layer.py:399-416).
    */
  def q01CleanTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      Cleaning.whitelist(col("event_type"), Seq("click", "view", "purchase")).as("event_type_clean"),
      Cleaning.digitsOnly(col("props")).try_cast("int").as("k_val"),
      when(col("value") < 0, lit(null)).otherwise(col("value")).as("value_clean"))

  /** F1/F6/P8: date parsing + calendar derivations (SL:26-43, GL:169-181). */
  def q02CleanDates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      to_date(col("o_orderdate")).cast("string").as("order_date"),
      year(col("o_orderdate")).as("order_year"),
      month(col("o_orderdate")).as("order_month"),
      quarter(col("o_orderdate")).as("order_quarter"))

  /** P6/P7: essential-column dropna + row filter (SL:69, GL:30). */
  def q03FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .na.drop(Seq("text", "lang"))
      .filter(col("n_chars") >= 200)
      .select("doc_id", "lang", "source", "n_chars")

  /** A1: subset dedup (SL:175 etc.) — projected to the key so the result is
    * deterministic (dropDuplicates keeps an arbitrary survivor row).
    */
  def q04DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(
      t(s, dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))

  /** Window latest-row dedup — the scalable deterministic alternative to A1
    * (SURVEY.md §7.5).
    */
  def q05DedupLatest(s: SparkSession, dir: String): DataFrame =
    Dedup.latestBy(t(s, dir, "events"), Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select(
        col("user_id"), col("event_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))

  /** O15/§2.6: SCD Type-2 merge — the reference's signature operator, run
    * over a deterministic two-batch split of `customer`:
    * batch1 = keys with c_custkey % 5 != 0 (as-of 2024-01-01);
    * batch2 = all keys, with c_acctbal + 100 for c_custkey % 3 == 0
    * (as-of 2024-06-01). Exercises unchanged/changed-expire+reinsert/
    * brand-new classification with null-safe change detection.
    */
  private def scd2History(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val batch1 = cust.filter(col("c_custkey") % 5 =!= 0)
    val batch2 = cust.withColumn(
      "c_acctbal",
      when(col("c_custkey") % 3 === 0, col("c_acctbal") + 100.0).otherwise(col("c_acctbal")))
    val target = Scd2.bootstrap(batch1, LocalDate.parse("2024-01-01"))
    Scd2.merge(target, batch2,
      keys = Seq("c_custkey"),
      compareCols = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      asOf = LocalDate.parse("2024-06-01"))
  }

  def q06Scd2Merge(s: SparkSession, dir: String): DataFrame =
    scd2History(s, dir)
      // dates as ISO strings: comparator-proof across engines' date types
      .withColumn("effective_date", col("effective_date").cast("string"))
      .withColumn("end_date", col("end_date").cast("string"))

  /** As-of (point-in-time) join over the q06 SCD2 history: each order is
    * stamped with a synthetic inquiry date (before the 2024-06-01 merge for
    * even keys, after it for odd keys) and joined to the customer VERSION
    * valid on that date — even-key orders see pre-change balances, odd-key
    * orders see post-change ones.
    */
  def q42AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val history = scd2History(s, dir)
    val facts = t(s, dir, "orders")
      .select(
        col("o_orderkey"), col("o_custkey").as("c_custkey"),
        when(col("o_orderkey") % 2 === 0, lit("2024-03-15"))
          .otherwise(lit("2024-09-15")).cast("date").as("inquiry_date"))
    Scd2.pointInTimeJoin(facts, history, Seq("c_custkey"), col("inquiry_date"))
      .select(
        col("o_orderkey"), col("c_custkey"),
        col("inquiry_date").cast("string").as("inquiry_date"), col("c_acctbal"),
        col("effective_date").cast("string").as("effective_date"), col("is_current"))
  }

  /** N1/N2: array explode with position (billing line_items pattern,
    * SL:151-157, applied to the embedding column).
    */
  def q07ExplodePos(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))

  /** N3/F6/F7/F9: calendar dimension via sequence+explode (GL:84-125),
    * bounds taken fully in-plan from orders.o_orderdate.
    */
  def q08DateDim(s: SparkSession, dir: String): DataFrame =
    DateDim.fromColumn(t(s, dir, "orders"), col("o_orderdate"))
      .withColumn("date", col("date").cast("string"))

  /** A4: grouped SUM/COUNT — agg_revenue_month shape (GL:262-271).
    * SUM through DECIMAL for cross-engine exactness.
    */
  def q09AggMonthRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(
        round(sum(col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").as("total_revenue"),
        count(lit(1)).as("orders_count"))

  /** A5: grouped COUNT/AVG — agg_admissions_reason_month shape (GL:277-287). */
  def q10AggPriorityMonth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("order_year"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("orders_count"),
        r2(avg(col("o_totalprice"))).as("avg_price"))

  /** Star-schema join: fact ⋈ dims with broadcast small sides — the query
    * shape the reference's gold layer exists to serve (SURVEY.md §2.7).
    * nation/region are broadcast explicitly; customer is left to AQE.
    */
  def q11StarJoin(s: SparkSession, dir: String): DataFrame =
    q11StarJoinFrom(
      t(s, dir, "lineitem"), t(s, dir, "orders"), t(s, dir, "customer"),
      t(s, dir, "nation"), t(s, dir, "region"))

  /** q11's join/agg over CALLER-SUPPLIED inputs — the seam that lets the
    * same flagship query run over raw parquet (the bench shape above) or
    * over bucketed catalog tables (`tools.BucketedStar`: lineitem+orders
    * bucketed on orderkey → the fact⋈fact sort-merge join plans with NO
    * Exchange and NO per-query Sort on either side; the shuffle was paid
    * once at `Tables.saveBucketed` write time). At 100 TB fact⋈fact on
    * orderkey is THE bucketing use case — a workload that repeats this
    * join amortizes one bucketed write across every subsequent run.
    */
  def q11StarJoinFrom(li: DataFrame, ord: DataFrame, cust: DataFrame,
      nat: DataFrame, reg: DataFrame): DataFrame =
    li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("line_count"))

  /** Anti join (used inside Scd2Merge for brand-new rows; SURVEY.md §2.7). */
  def q12AntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Semi join: suppliers with at least one lineitem. */
  def q13SemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")

  /** Sort + limit (top-k) with total tie-break. */
  def q14TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")

  /** Window running aggregate per key (prefix sum — accumulation order is
    * frame-defined, so double is deterministic cross-engine).
    */
  def q15WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events").select(
      col("user_id"), col("event_id"),
      r2(sum(col("value")).over(w)).as("running_value"))
  }

  /** ROLLUP aggregate — beyond-reference OLAP staple; l_quantity is
    * integral-valued so its double SUM is exact and associative.
    */
  def q28RollupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))

  /** Exact distinct counts per group (the exact twin of the
    * approx_count_distinct sketch extension).
    */
  def q29DistinctCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_suppkey")).as("supps"))

  /** HLL++ sketch distinct counts (SURVEY.md §7.5 extension): at 100 TB the
    * sketch replaces the exact distinct's full shuffle of the key space
    * with fixed-size mergeable state.
    *
    * Oracle-checkable ENVELOPE formulation (raw estimates can't hash-match:
    * Spark's HLL++ and DuckDB's HLL are different sketches): the query
    * emits the exact counts plus booleans asserting its OWN sketch lands
    * within the promised envelope; the DuckDB oracle does the same with
    * ITS sketch. Both sides deterministically emit `true` whenever their
    * sketch honors its bound, so the driver hash-checks the error
    * envelope itself instead of recording rows-only. (The exact twin runs
    * inside the query purely as the validation harness; production use at
    * scale runs the sketch alone — that's q29/q30's split.)
    */
  def q30ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    def withinPct(approx: Column, exact: Column, bound: Double): Column =
      abs(approx.cast("double") - exact.cast("double")) / exact.cast("double") <= bound
    // The sketch and the exact twin run as SEPARATE aggregates joined on
    // the 3-row group key. Fusing them looks cheaper but is quadratic in
    // the key domain: RewriteDistinctAggregates expands each row once per
    // distinct set and keys the first partial aggregate by
    // (flag, gid, partkey, suppkey) — and the ~12 KB rsd=0.01 HLL buffer
    // is allocated for EVERY such group, so the fused plan materializes
    // |distinct keys| × 12 KB of sketch state (70+ GB at sf10; measured
    // wedged in HyperLogLogPlusPlus.merge). Split, the sketch aggregate
    // holds 3 buffers total and the exact aggregate shuffles bare keys.
    val li = t(s, dir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_suppkey")).as("supps"))
    val sketch = li.groupBy(col("l_returnflag"))
      .agg(
        hllppDistinct(s, "l_partkey", 0.01).as("pa"),
        hllppDistinct(s, "l_suppkey", 0.01).as("sa"))
    exact.join(broadcast(sketch), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("parts"), col("supps"),
        withinPct(col("pa"), col("parts"), 0.05).as("parts_within_5pct"),
        withinPct(col("sa"), col("supps"), 0.05).as("supps_within_5pct"))
  }

  /** TPC-H Q6 shape: tight-range filter + single global sum — the query
    * whose whole cost is scan + pushed predicates (explain shows the range
    * and value filters at the parquet scan).
    */
  def q48TpchQ6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
      .agg(round(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,6)")), 2)
        .cast("double").as("revenue"))

  /** TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem, top-10
    * unshipped orders by revenue (group + decimal sum + total-order top-k).
    */
  def q49TpchQ3(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1997-06-30").cast("timestamp"))
      .join(t(s, dir, "orders").filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).cast("string").as("order_date"))
      .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  /** Set operations over key subsets: customers with orders vs high-balance
    * customers — union (distinct), intersect, except, each tagged. One
    * output frame so the whole family rides a single oracle.
    */
  def q45SetOps(s: SparkSession, dir: String): DataFrame = {
    val withOrders = t(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
    val highBal = t(s, dir, "customer")
      .filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
    withOrders.union(highBal).distinct().select(lit("union").as("op"), col("k"))
      .unionByName(withOrders.intersect(highBal).select(lit("intersect").as("op"), col("k")))
      .unionByName(withOrders.except(highBal).select(lit("except").as("op"), col("k")))
  }

  /** Time-based (RANGE-frame) rolling aggregate: each event's count and
    * sum over the trailing hour for its user — the frame is bounded by a
    * VALUE interval on event time, not a row count (the batch twin of a
    * sliding stream window).
    */
  def q44WindowRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsec"))
      .rangeBetween(-3600L, 0L)
    t(s, dir, "events")
      .withColumn("tsec", col("ts").cast("long"))
      .select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("events_1h"),
        r2(sum(col("value")).over(w)).as("value_1h"))
  }

  /** Gap-based sessionization — the canonical event-pipeline operator:
    * a new session starts after a 30-minute silence; the session id is the
    * running count of session starts (two layered windows, both on the
    * same (user_id, ts) ordering → a single sort+shuffle).
    */
  def q39Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val newSession = when(
      col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long") > 1800, 1)
      .otherwise(lit(0))
    val withSession = t(s, dir, "events")
      .withColumn("new_s", coalesce(newSession, lit(0)))
      .withColumn("session_no", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSession
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("duration_s"),
        r2(sum(col("value"))).as("session_value"))
  }

  /** Pivot: per-user event counts spread across event-type columns
    * (fixed value list → deterministic schema; compiles to one grouped
    * conditional aggregation, not N passes).
    */
  def q40Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0) // empty cells: 0, matching conditional-aggregation SQL

  /** Exact percentiles per group (the approx twin at scale is
    * approx_percentile, mirroring q29/q30's exact/sketch split).
    *
    * Round 17: computed via [[graft.engine.ExactQuantiles.byCounts]]
    * (distribution aggregation) instead of Spark's `percentile`
    * aggregate. The built-in buffers a value→count map PER GROUP and
    * merges every partial map single-threaded on the group's one
    * reducer — with 3 groups over 600 M rows that serial tail measured
    * 211.6 s at sf100, the suite's worst row. The distribution plan
    * (groupBy(flag, price).count → range-sliced two-phase cumulative →
    * pick + interpolate) returns the bit-identical exact answer with
    * every stage parallel and spill-safe — including the cumulative,
    * whose round-18 two-phase form sorts value RANGES (parallelism =
    * partition count) instead of whole groups (parallelism = 3); the
    * former distinct-value state
    * bound (SCALING.md r16) is gone with the map. Results reproduce
    * `Percentile`'s interpolation exactly (ExactQuantilesSpec), so the
    * DuckDB `quantile_cont` oracle is unchanged.
    */
  def q41Percentiles(s: SparkSession, dir: String): DataFrame =
    graft.engine.ExactQuantiles.byCounts(
        t(s, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice")),
        "l_returnflag", "l_extendedprice",
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .select(col("l_returnflag"),
        r4(col("p50")).as("p50"), r4(col("p90")).as("p90"),
        r4(col("p99")).as("p99"))

  /** Sketch accuracy for the q43 percentile family: rank error =
    * 1/this. 1000 (0.1 % rank) is still an order tighter than the 2 %
    * VALUE envelope the oracle checks, and it matters enormously that
    * this is NOT Spark's default 10000: the GK summary's per-row
    * compress cost grows with summary width, and at the default the
    * "approx" sketch was measured SLOWER than q41's exact sort at sf100
    * (249.6 s vs 194.5 s, r16 min-of-2) — inverting the sketch's reason
    * to exist. At 1000 the same two percentiles price in the tens of
    * seconds. Shared by the envelope and the production variant so the
    * correctness evidence covers exactly the configuration production
    * runs.
    */
  val PercentileSketchAccuracy = 1000

  /** Sketch percentiles (q41's scale twin): approx_percentile trades the
    * exact version's full per-group sort for fixed-size mergeable state.
    * Same envelope formulation as q30 (raw t-digest/KLL estimates differ
    * across engines): the query emits exact p50/p90 plus booleans binding
    * its own sketch to a 2 % relative envelope, which the DuckDB oracle
    * reproduces with its own approx_quantile — the driver hash-checks the
    * envelope, not the sketch internals. Both percentiles come from ONE
    * sketch (the array form): two scalar approx_percentile calls would
    * each build their own summary over the same column.
    */
  def q43ApproxPercentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.9)").as("e90"),
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D), " +
          s"$PercentileSketchAccuracy)").as("aa"))
      .select(col("l_returnflag"),
        r4(col("e50")).as("p50"), r4(col("e90")).as("p90"),
        (abs(element_at(col("aa"), 1) - col("e50")) / col("e50") <= 0.02)
          .as("p50_within_2pct"),
        (abs(element_at(col("aa"), 2) - col("e90")) / col("e90") <= 0.02)
          .as("p90_within_2pct"))

  /** q43's PRODUCTION/BENCH surface: the sketch alone. The envelope
    * formulation above is the VERIFICATION twin — it exists to let the
    * driver hash-check the sketch against DuckDB, but it computes exact
    * `percentile` beside the sketch, and that exact arm is precisely the
    * cost `approx_percentile` exists to avoid (its per-group value map
    * was 385 s at sf100 — the whole suite's worst row — while the sketch
    * is fixed-size mergeable state). So the split (the q29/q30 pattern,
    * round-15 verdict lead item): Verify runs [[q43ApproxPercentiles]]
    * (envelope, oracle-hash-green at sf0.01 where exact is cheap); Bench
    * and production run THIS — the plan a 100 TB job would actually
    * submit. Raw sketch estimates can't hash-match across engines, which
    * is WHY the correctness evidence lives on the envelope twin instead.
    * Wired via [[graft.SparkEntry.benchVariants]].
    */
  def q43ProductionSketch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D), " +
          s"$PercentileSketchAccuracy)").as("aa"))
      .select(col("l_returnflag"),
        element_at(col("aa"), 1).as("a50"),
        element_at(col("aa"), 2).as("a90"))

  /** q30's PRODUCTION/BENCH surface: the HLL sketch alone — same split
    * as [[q43ProductionSketch]] (the exact `countDistinct` twin in the
    * envelope query shuffles the bare key space; 105 s of q30's sf100
    * wall was the twin, not the sketch). Verification stays on
    * [[q30ApproxDistinct]]'s envelope oracle.
    */
  def q30ProductionSketch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        hllppDistinct(s, "l_partkey", 0.01).as("pa"),
        hllppDistinct(s, "l_suppkey", 0.01).as("sa"))

  /** Semi-structured JSON column extraction — the in-row twin of the
    * billing NDJSON scan (S2/S3): schema-on-read over a string column via
    * from_json, plus the path-extraction form. Both codegen'd, no UDF.
    */
  def q38JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      from_json(col("props"), "k INT", Map.empty[String, String]).getField("k").as("k_struct"),
      get_json_object(col("props"), "$.k").try_cast("int").as("k_path"))

  /** Table profiling — the data-quality sweep every ingest pipeline runs
    * first: row count, per-column null counts, distinct cardinalities,
    * numeric ranges. One pass, one row out (all aggregates fuse into a
    * single HashAggregate).
    */
  def q36ProfileStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("d_orderkey"),
      countDistinct(col("l_returnflag")).as("d_returnflag"),
      count(when(col("l_returnflag").isNull, 1)).as("nulls_returnflag"),
      count(when(col("l_shipdate").isNull, 1)).as("nulls_shipdate"),
      round(sum(col("l_quantity").cast("decimal(18,6)")), 2).cast("double").as("sum_qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))

  /** q36's PRODUCTION/BENCH surface: the same one-pass profile with the
    * two exact `countDistinct`s swapped for `approx_count_distinct` —
    * the q30/q43/q83 envelope split. A profiling sweep rarely needs
    * `d_orderkey` exact; at 100 TB the distinct-key shuffle it forces
    * (expand per countDistinct column, then the bare key space on the
    * wire) is the row's whole cost, while HLL++ partials keep the plan a
    * single map-side-combined pass like every other aggregate here.
    * Verify keeps hashing [[q36ProfileStats]]'s exact envelope (exact
    * profile output is a defensible contract and DuckDB can only
    * hash-match exact values); Bench and production submit this. Wired
    * via [[graft.SparkEntry.benchVariants]]. Column names/order match
    * the envelope one-for-one so the timed shape is the checked shape.
    */
  def q36ProductionSketch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      hllppDistinct(s, "l_orderkey", 0.01).as("d_orderkey"),
      hllppDistinct(s, "l_returnflag", 0.01).as("d_returnflag"),
      count(when(col("l_returnflag").isNull, 1)).as("nulls_returnflag"),
      count(when(col("l_shipdate").isNull, 1)).as("nulls_shipdate"),
      round(sum(col("l_quantity").cast("decimal(18,6)")), 2).cast("double").as("sum_qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))

  /** Multi-level aggregation via CUBE + grouping_id (q28's rollup widened
    * to the full lattice): one pass emits per-(lang,source), per-lang,
    * per-source, and grand-total document stats, with `gid` disambiguating
    * a genuinely-NULL dimension value from an aggregated-away one — the
    * standard OLAP summary shape. Spark expands the cube at the logical
    * level into a single Expand + hash aggregate: 4 grouping sets cost one
    * shuffle of 4× the (tiny) group cardinality, not 4 scans of the
    * corpus. Counts and the int64 char sum are exact, so no rounding
    * policy is needed.
    */
  def q75CubeAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .cube(col("lang"), col("source"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))

  /** Wide→long unpivot (the inverse of q40's pivot): a per-year metrics
    * frame melted into (order_year, metric, value) rows — the shape
    * metric stores and plotting layers want. The unpivot itself is a
    * map-only Expand (k output rows per input row, no shuffle, no
    * UNION-of-scans); the only shuffle is the upstream aggregation. The
    * double SUM goes through DECIMAL(18,6) per the determinism policy;
    * counts cast to double exactly (they are far below 2^53).
    */
  def q76Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        round(sum(col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").as("revenue"),
        count(lit(1)).cast("double").as("n_orders"),
        countDistinct(col("o_custkey")).cast("double").as("n_custs"))
      .unpivot(
        Array(col("order_year")),
        Array(col("revenue"), col("n_orders"), col("n_custs")),
        "metric", "value")

  /** Explicit GROUPING SETS (beyond q75's cube / q28's rollup): the
    * (priority × year), (year), () lattice — the exact roll-ups a report
    * needs, WITHOUT the 2ᵏ-set blowup a cube pays at 100 TB. Same
    * execution shape as cube: one scan, one Expand (3 output rows per
    * input row here, vs 4 for the cube), one shuffle — the set list is a
    * plan-time constant, so adding a grouping set never adds a pass over
    * the data. grouping_id() disambiguates the all-null rows, matching
    * DuckDB's GROUPING() bit order (MSB = leftmost column, verified by
    * the hash oracle).
    */
  def q82GroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("order_year")),
          Seq(col("order_year")), Seq()),
        col("o_orderpriority"), col("order_year"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").as("revenue"))

  /** One SQL text, two engines: q86 runs THIS string verbatim on Spark
    * (over temp views named like the tables) and as its DuckDB oracle —
    * the subquery surface (correlated EXISTS, uncorrelated scalar
    * subquery, IN-subquery) demonstrated with zero translation. The
    * scalar threshold is `0.5 * max(...)`: max is order-independent and
    * 0.5 a power of two, so the comparison is bit-deterministic without
    * the decimal detour. Spark decorrelates the EXISTS into a semi-join
    * and plans the IN as a broadcast semi-join — subqueries are plan
    * sugar, not per-row re-execution.
    */
  val SubqueriesSql: String =
    """SELECT c_mktsegment, count(*) AS n_cust
      |FROM customer c
      |WHERE EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_totalprice > (SELECT 0.5 * max(o2.o_totalprice) FROM orders o2))
      |  AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
      |GROUP BY c_mktsegment""".stripMargin

  def q86Subqueries(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "nation")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(SubqueriesSql)
  }

  /** SQL-text entry shape (GL:260-288 runs its aggregates as SQL strings):
    * same engine lifecycle, parsed instead of built.
    */
  def q31SqlText(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base,
        |  count(*) AS cnt
        |FROM v_lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }
}
