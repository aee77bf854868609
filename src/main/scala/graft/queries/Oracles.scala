package graft.queries

import graft.functions.{NumFunctions, SimilarityFunctions => Sim, TextFunctions => Txt}

/** DuckDB oracle SQL for every query in [[Parity]]/[[Extensions]].
  *
  * The driver registers each testdata parquet as a view named after the
  * table, runs these against the same sf directory, and hash-compares
  * (rows sorted, columns sorted by name) with the Spark result — so column
  * NAMES and TYPES must line up exactly:
  *   - Spark int  ↔ CAST(... AS INTEGER) (DuckDB date-part fns return BIGINT)
  *   - doubles rounded with the portable floor-form on BOTH sides
  *   - big SUMs through DECIMAL(18,6) on BOTH sides
  * Programmatic fragments (minhash/simhash/LSH planes/stopwords) are
  * generated from the same Scala constants the Spark plans use, so the two
  * sides cannot drift.
  */
object Oracles {

  private def r(expr: String, digits: Int): String = NumFunctions.roundSql(expr, digits)

  // ---- shared generated fragments ----

  /** DuckDB twin of Sim.shingleDigests + minhashFromDigests: one digest
    * list per doc (one md5 per shingle), signature j = min of hex slice
    * [j*SliceHex+1, SliceHex].
    */
  private val digestsCte: String = {
    val sh = s"substr(text, CAST(i AS INTEGER) + 1, ${Extensions.ShingleN})"
    // `if ascii(...) % 2 = 0`: the content-deterministic shingle sampling
    // (see Extensions.sigFrame)
    s"""dg AS (
       |  SELECT doc_id,
       |    [md5($sh) for i in range(0, len(text) - ${Extensions.ShingleN - 1})
       |     if ascii(substr($sh, 1, 1)) % 2 = 0] AS digests
       |  FROM documents WHERE len(text) >= ${Extensions.ShingleN})""".stripMargin
  }

  private val sigCols: String =
    (0 until Extensions.MinhashK)
      .map(j => s"list_min([substr(d, ${j * Sim.SliceHex + 1}, ${Sim.SliceHex}) for d in digests]) AS sig_$j")
      .mkString(",\n    ")

  /** DuckDB 16-bit simhash (= Sim.tokenDigests + simhash16FromDigests;
    * the md5-per-bit inlining is fine here — DuckDB evaluates it once per
    * comprehension element and the oracle runs at sf0.01 only).
    */
  private val simhashSql: String = {
    val bits = (0 until 16).map { j =>
      s"(CASE WHEN list_sum([CASE WHEN strpos('13579bdf', substr(md5(t), ${j + 1}, 1)) > 0 " +
        s"THEN 1 ELSE -1 END for t in str_split(text, ' ') if t != '']) >= 0 THEN ${1 << j} ELSE 0 END)"
    }
    s"CAST(${bits.mkString(" + ")} AS INTEGER)"
  }

  private def stoplistSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private val toksSql = "[t for t in str_split(text, ' ') if t != '']"

  /** DuckDB ±1 hyperplane literal for plane j (= Extensions.Planes(j)). */
  private def planeSql(j: Int): String =
    Sim.hyperplanes(Extensions.LshPlanes, Extensions.EmbeddingDim)(j)
      .map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** LSH bucket id over a DOUBLE[] column (= Sim.lshBucket). */
  private def bucketSql(vec: String): String =
    (0 until Extensions.LshPlanes).map { j =>
      s"(CASE WHEN list_dot_product($vec, ${planeSql(j)}) >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS INTEGER)")

  /** Explicit cosine with the same accumulation order as cosine_sim. */
  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** DuckDB twin of [[graft.engine.KmeansCodebook.train]]: from a prior
    * CTE `e(vec_id, vec DOUBLE[])`, build `cb(cb_id, cb_vec)` — the
    * codebook after KmeansIters Lloyd iterations seeded by the
    * K = clamp(⌈√N⌉, 16, 65536) lowest-id vectors (the same data-derived
    * knob as `Extensions.kmeansK`, via a scalar-subquery LIMIT). Same DECIMAL(28,14) centroid sums, same r4
    * floor-form rounding, same strict-argmax tie-break (ORDER BY dd DESC,
    * cb_id ≡ the Spark fold's "strict > keeps first"), so the two
    * engines' codebooks are bit-identical at every iteration.
    *
    * Argmax shape (round 13): TWO-PASS PRIMITIVE argmax — `max(dd)` per
    * vec, then a join-back on the bit-identical double picking
    * `min(cb_id)` — the q63 shape (round 12, commit 921e22f),
    * ported here BEFORE the wall it dodges bites this family: the r11
    * streaming `max(struct_pack(dd, -cb_id))` form keeps struct min/max
    * states that DuckDB allocates OUTSIDE the tracked pool, fatal at
    * ~16 M groups (q63 at sf100: RSS 112 GB at a 12 GB cap) — this
    * family's ≤ 2 M-group queries passed at sf100 but would hit the
    * identical wall at sf1000. (The still-older row_number window form
    * sorts the whole N×K cross join: 48 GB OOM at sf10.) Tie-break
    * unchanged: max dd, then min cb_id.
    *
    * Memory/compute trade vs q63's oracle: q63 MATERIALIZES its x
    * (256 M rows / ~7 GB at sf100 — fits the spill quota), but the
    * kmeans x here is N×K ≈ 2.8 B rows at sf100 (~56 GB, over the box's
    * ~47 GB spill disk) — so x stays an INLINE CTE evaluated twice
    * (once under max(dd), once under the join-back; per-row
    * list_dot_product is deterministic, so both evaluations agree
    * bit-identically), and only the tiny per-vec max frame `m$i`
    * (N rows) and the K-row codebooks `cb$i` are MATERIALIZED — the
    * codebook materialization also stops DuckDB 1.0's multi-reference
    * CTE inlining from re-deriving the whole previous iteration under
    * EACH x evaluation (2^iters blowup).
    *
    * NULL guard: max(dd) skips NULLs and the dd-equality join-back never
    * matches one, but the x/tx CTEs keep the `dd IS NOT NULL` filter —
    * it shrinks x and keeps the semantics explicit for a future
    * nullable-vec source.
    */
  private val kmeansCtes: String = {
    def one(i: Int, prev: String): String =
      s"""x$i AS (SELECT e.vec_id, c.cb_id, list_dot_product(e.vec, c.cb_vec) AS dd
         |        FROM e CROSS JOIN $prev c WHERE list_dot_product(e.vec, c.cb_vec) IS NOT NULL),
         |m$i AS MATERIALIZED (SELECT vec_id, max(dd) AS dd FROM x$i GROUP BY vec_id),
         |a$i AS (SELECT w.vec_id, e.vec, CAST(w.cell AS INTEGER) AS cell
         |        FROM (SELECT x.vec_id, min(x.cb_id) AS cell
         |              FROM x$i x JOIN m$i m ON m.vec_id = x.vec_id AND x.dd = m.dd
         |              GROUP BY x.vec_id) w JOIN e USING (vec_id)),
         |g$i AS (SELECT cell, CAST(i AS INTEGER) AS dim, vec[CAST(i AS INTEGER)] AS v
         |        FROM a$i CROSS JOIN unnest(generate_series(1, ${Extensions.EmbeddingDim})) AS t(i)),
         |u$i AS (SELECT cell, dim,
         |          ${r("CAST(sum(CAST(v AS DECIMAL(28,14))) AS DOUBLE) / count(*)", 4)} AS c
         |        FROM g$i GROUP BY cell, dim),
         |cb$i AS MATERIALIZED (SELECT cell AS cb_id, list(c ORDER BY dim) AS cb_vec FROM u$i GROUP BY cell)"""
        .stripMargin
    val iters = (1 to Extensions.KmeansIters)
      .map(i => one(i, s"cb${i - 1}")).mkString(",\n")
    s"""cb0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cb_id,
       |               vec AS cb_vec
       |        FROM (SELECT vec_id, vec FROM e WHERE vec_id IS NOT NULL
       |              ORDER BY vec_id
       |              -- K = clamp(ceil(sqrt(N)), 16, 65536), the same
       |              -- data-derived knob as Extensions.kmeansK: both
       |              -- engines compute K from the same row count, so the
       |              -- codebooks stay bit-identical at every sf
       |              LIMIT (SELECT LEAST(GREATEST(CAST(ceil(sqrt(count(*))) AS BIGINT), 16), 65536)
       |                     FROM e))),
       |$iters,
       |cb AS (SELECT * FROM cb${Extensions.KmeansIters})""".stripMargin
  }

  /** Trained-cell assignment of every `e` row against `cb`:
    * `cells(vec_id, vec, cell, dd)` — argmax dot, lowest cb_id on ties
    * (same two-pass primitive-argmax shape as [[kmeansCtes]]).
    */
  private val kmeansAssignCte: String =
    s"""tx AS (SELECT e.vec_id, c.cb_id, list_dot_product(e.vec, c.cb_vec) AS dd
       |       FROM e CROSS JOIN cb c WHERE list_dot_product(e.vec, c.cb_vec) IS NOT NULL),
       |tm AS MATERIALIZED (SELECT vec_id, max(dd) AS dd FROM tx GROUP BY vec_id),
       |cells AS (SELECT w.vec_id, e.vec, CAST(w.cell AS INTEGER) AS cell, w.dd
       |       FROM (SELECT x.vec_id, min(x.cb_id) AS cell, m.dd
       |             FROM tx x JOIN tm m ON m.vec_id = x.vec_id AND x.dd = m.dd
       |             GROUP BY x.vec_id, m.dd) w JOIN e USING (vec_id))""".stripMargin

  /** q18's banded-LSH pair CTEs + final select, shared with the q61
    * connected-components oracle (which wraps them in WITH RECURSIVE).
    */
  private val lshPairCtes: String = {
    val nBands = Extensions.MinhashK / Extensions.BandRows
    val bandSelects = (0 until nBands).map { b =>
      val slice = (b * Extensions.BandRows until (b + 1) * Extensions.BandRows)
        .map(j => s"sig_$j").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($slice) AS h FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""$digestsCte,
       |sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM dg),
       |bands AS (
       |  $bandSelects)""".stripMargin
  }

  private val lshPairSelect: String =
    // cap-aware (HotBucketCap smallest doc_ids per bucket — the bounded
    // aggregate's keep rule; a no-op at bucket sizes the banding admits
    // on this data, load-bearing if a bucket ever concentrates)
    s"""SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |FROM (SELECT * FROM (SELECT doc_id, band, h,
      |        row_number() OVER (PARTITION BY band, h ORDER BY doc_id) AS rn
      |      FROM bands) WHERE rn <= ${Extensions.HotBucketCap}) a
      |JOIN (SELECT * FROM (SELECT doc_id, band, h,
      |        row_number() OVER (PARTITION BY band, h ORDER BY doc_id) AS rn
      |      FROM bands) WHERE rn <= ${Extensions.HotBucketCap}) b
      |  ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id""".stripMargin

  /** q06's SCD2 end-state, shared with the as-of join oracle (q42). */
  private val scd2Sql: String =
    """WITH b1 AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 5 <> 0),
      |b2 AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment
      |  FROM customer)
      |SELECT b1.c_custkey, b1.c_name, b1.c_nationkey, b1.c_acctbal, b1.c_mktsegment,
      |       '2024-01-01' AS effective_date, CAST(NULL AS VARCHAR) AS end_date, TRUE AS is_current
      |FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey WHERE b1.c_acctbal = b2.c_acctbal
      |UNION ALL
      |SELECT b1.c_custkey, b1.c_name, b1.c_nationkey, b1.c_acctbal, b1.c_mktsegment,
      |       '2024-01-01', '2024-06-01', FALSE
      |FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey WHERE b1.c_acctbal <> b2.c_acctbal
      |UNION ALL
      |SELECT b2.c_custkey, b2.c_name, b2.c_nationkey, b2.c_acctbal, b2.c_mktsegment,
      |       '2024-06-01', CAST(NULL AS VARCHAR), TRUE
      |FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey WHERE b1.c_acctbal <> b2.c_acctbal
      |UNION ALL
      |SELECT b2.c_custkey, b2.c_name, b2.c_nationkey, b2.c_acctbal, b2.c_mktsegment,
      |       '2024-06-01', CAST(NULL AS VARCHAR), TRUE
      |FROM b2 LEFT JOIN b1 ON b1.c_custkey = b2.c_custkey WHERE b1.c_custkey IS NULL""".stripMargin

  val all: Map[String, String] = Map(
    "q01_clean_tokens" ->
      """SELECT event_id,
        |  CASE WHEN event_type IN ('click','view','purchase') THEN event_type ELSE NULL END AS event_type_clean,
        |  TRY_CAST(regexp_replace(props, '[^0-9]', '', 'g') AS INTEGER) AS k_val,
        |  CASE WHEN value < 0 THEN NULL ELSE value END AS value_clean
        |FROM events""".stripMargin,

    "q02_clean_dates" ->
      """SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        |  CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter
        |FROM orders""".stripMargin,

    "q03_filter_project" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE text IS NOT NULL AND lang IS NOT NULL AND n_chars >= 200""".stripMargin,

    "q04_dedup_exact" ->
      "SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem",

    "q05_dedup_latest" ->
      """SELECT user_id, event_id, event_type, value, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1""".stripMargin,

    "q06_scd2_merge" -> scd2Sql,

    "q42_asof_join" ->
      s"""WITH hist AS (
         |$scd2Sql),
         |f AS (
         |  SELECT o_orderkey, o_custkey AS c_custkey,
         |    CAST(CASE WHEN o_orderkey % 2 = 0 THEN '2024-03-15' ELSE '2024-09-15' END AS DATE) AS inquiry_date
         |  FROM orders)
         |SELECT f.o_orderkey, f.c_custkey, CAST(f.inquiry_date AS VARCHAR) AS inquiry_date,
         |       h.c_acctbal, h.effective_date, h.is_current
         |FROM f JOIN hist h ON f.c_custkey = h.c_custkey
         |WHERE CAST(h.effective_date AS DATE) <= f.inquiry_date
         |  AND (h.end_date IS NULL OR f.inquiry_date < CAST(h.end_date AS DATE))""".stripMargin,

    "q07_explode_pos" ->
      """SELECT vec_id, CAST(unnest(range(0, len(embedding))) AS INTEGER) AS pos,
        |  unnest(embedding) AS val
        |FROM embeddings""".stripMargin,

    "q08_date_dim" ->
      """WITH bounds AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS s, CAST(max(o_orderdate) AS DATE) AS e FROM orders),
        |d AS (SELECT unnest(generate_series(s, e, INTERVAL 1 DAY)) AS gs FROM bounds)
        |SELECT CAST(CAST(gs AS DATE) AS VARCHAR) AS "date",
        |  CAST(year(gs) AS INTEGER) AS year, CAST(month(gs) AS INTEGER) AS month,
        |  CAST(day(gs) AS INTEGER) AS day, CAST(week(gs) AS INTEGER) AS week,
        |  strftime(gs, '%a') AS weekday, monthname(CAST(gs AS DATE)) AS month_name
        |FROM d""".stripMargin,

    "q09_agg_month_revenue" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
        |  count(*) AS orders_count
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "q10_agg_priority_month" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, o_orderpriority,
         |  count(*) AS orders_count,
         |  ${r("avg(o_totalprice)", 2)} AS avg_price
         |FROM orders GROUP BY 1, 2""".stripMargin,

    "q11_star_join" ->
      """SELECT r_name, n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q12_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q13_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""".stripMargin,

    "q14_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "q15_window_running" ->
      s"""SELECT user_id, event_id,
         |  ${r("sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS running_value
         |FROM events""".stripMargin,

    "q16_dedup_hash" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS doc_id, count(*) AS dup_count
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "q17_minhash_sig" ->
      s"""WITH $digestsCte
         |SELECT doc_id,
         |    $sigCols
         |FROM dg""".stripMargin,

    "q18_lsh_pairs" ->
      s"""WITH $lshPairCtes
         |$lshPairSelect""".stripMargin,

    "q19_simhash" ->
      s"SELECT doc_id, $simhashSql AS simhash FROM documents",

    "q37_simhash_pairs" -> {
      // The pigeonhole banding is EXACT (any hamming<=2 pair shares a
      // segment), so the oracle needs no bands — but the per-bucket
      // HotBucketCap is part of the operator's semantics and BINDS at
      // sf>=0.1 (correlated simhashes concentrate segment buckets), so it
      // is mirrored: a pair survives iff both sides are among some shared
      // bucket's `HotBucketCap` smallest (doc_id, simhash) members — the
      // bounded aggregate's exact keep rule.
      val segs = Seq((0, 6), (6, 5), (11, 5)).zipWithIndex.map { case ((shift, width), i) =>
        s"SELECT doc_id, source, simhash, $i AS seg, (simhash >> $shift) & ${(1 << width) - 1} AS v FROM h"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH h AS (SELECT doc_id, source, $simhashSql AS simhash FROM documents),
         |segs AS (
         |  $segs),
         |kept AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY source, seg, v ORDER BY doc_id, simhash) AS rn
         |  FROM segs) WHERE rn <= ${Extensions.HotBucketCap})
         |SELECT DISTINCT a.source AS source, a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |FROM kept a JOIN kept b
         |  ON a.source = b.source AND a.seg = b.seg AND a.v = b.v AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2""".stripMargin
    },

    "q20_jaccard_pairs" -> {
      // Mirror of the LSH-blocked exact-verified similarity join: same
      // md5-prefix gram hashes, same multiply-add-mod-2³² permutations
      // (identical constants interpolated from Extensions.jacA/jacC),
      // same banded argmin keys, same HotBucketCap smallest-ids bucket
      // cap, then exact Jaccard over the full hashed-BIGRAM sets. Since
      // round 12 the SIGNATURE runs over word-JacShingle-shingles (the
      // closed-vocabulary slot fix — JaccardLsh.SigShingle); the verify
      // predicate stays exact bigram Jaccard, so the sig chain hashes
      // SHINGLES while the bgh postings (bigram hashes) feed verify.
      val bigrams = s"list_distinct([tk[i] || ' ' || tk[i + 1] for i in range(1, len(tk))])"
      val w = Extensions.JacShingle
      val shingleBody = (0 until w).map(j => s"tk[i + $j]").mkString(" || ' ' || ")
      val shingles =
        s"list_distinct([$shingleBody for i in range(1, len(tk) - ${w - 2})])"
      // (perm, h32) packed into ONE BIGINT (perm·2³² + h32, perm mod
      // 2³¹ — bit-identical to the engine's packed-long min; list- or
      // struct-valued min states are unspillable in DuckDB and off the
      // primitive codegen path in Spark, so BOTH engines min plain
      // 64-bit integers).
      val minsSql = (0 until Extensions.JacBands * Extensions.JacRows).map { j =>
        s"min(((${Extensions.jacA(j)} * h32 + ${Extensions.jacC(j)}) % 2147483648)" +
          s" * 4294967296 + h32) AS m$j"
      }.mkString(",\n    ")
      // band key = (k₁ − 2³¹)·2³² + k₂ over the two argmin h32s — spans
      // exactly the signed 64-bit range, so checked BIGINT arithmetic
      // replays the engine's packed key bit-identically
      val bandSql = (0 until Extensions.JacBands).map { b =>
        s"SELECT source, doc_id, $b AS band, " +
          s"((m${Extensions.JacRows * b} % 4294967296) - 2147483648) * 4294967296 + " +
          s"(m${Extensions.JacRows * b + 1} % 4294967296) AS k FROM sig"
      }.mkString("\n  UNION ALL\n  ")
      // Streaming restructure (round 12): the original shape built three
      // multi-referenced LIST CTEs (g: grams+shingles, hg: hashed-bigram
      // lists joined twice in verify) — DuckDB materializes a CTE per
      // extra reference, and at sf100 (5 M docs) the resident list columns
      // blew past the untracked-allocation headroom (bad_alloc at
      // DUCKDB_MEM=80GB on a 128 GB box). Same finding class as r11's
      // kmeans-oracle OOM: the oracle has to scale with the engine. Now:
      //   - the signature chain is SINGLE-reference projections into the
      //     128-min aggregate (min is duplicate-insensitive, so the
      //     unnested shingle postings stream straight in; only the 5 M ×
      //     128-BIGINT group state is resident, and it spills);
      //   - verify is a POSTINGS JOIN, not list_intersect: bgh = one row
      //     per (doc, distinct-bigram) — `count(*)` per doc IS len(grams),
      //     `count(DISTINCT h)` over the pair join IS the dedup'd
      //     list_intersect length (bit-identical under 60-bit hash
      //     collisions too). Every blocking state left is a spillable
      //     aggregate/join/window; no list survives a pipeline breaker.
      // AS MATERIALIZED on every multi-referenced CTE is LOAD-BEARING:
      // DuckDB 1.0 inlines plain CTEs per reference — the 64 band
      // branches each recomputed the whole signature aggregate (EXPLAIN
      // showed 64 unnest+md5+min pipelines; ~2 min of signature work ×64
      // ≈ hours at sf100), and bgh's billion-row posting build would run
      // 3×. Materialized: sig ≈ 5.5 GB, bgh ≈ 30 GB, capped tiny — all
      // tracked, all spillable.
      s"""WITH sig AS MATERIALIZED (
         |  SELECT source, doc_id,
         |    $minsSql
         |  FROM (SELECT doc_id, source,
         |          CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) // 268435456 AS h32
         |        FROM (SELECT doc_id, source, unnest(shingles) AS s
         |              FROM (SELECT doc_id, source, $shingles AS shingles
         |                    FROM (SELECT doc_id, source, $toksSql AS tk FROM documents))))
         |  GROUP BY source, doc_id),
         |bands AS (
         |  $bandSql),
         |capped AS MATERIALIZED (SELECT * FROM (
         |  SELECT source, band, k, doc_id,
         |    count(*) OVER (PARTITION BY source, band, k) AS n
         |  FROM bands) WHERE n > 1 AND n <= ${Extensions.HotBucketCap}),
         |cand AS (
         |  SELECT DISTINCT a.source, a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM capped a JOIN capped b
         |    ON a.source = b.source AND a.band = b.band
         |   AND a.k = b.k AND a.doc_id < b.doc_id),
         |bgh AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS h
         |  FROM (SELECT doc_id, source, unnest(grams) AS g
         |        FROM (SELECT doc_id, source, $bigrams AS grams
         |              FROM (SELECT doc_id, source, $toksSql AS tk FROM documents)))),
         |gsz AS (SELECT doc_id, source, count(*) AS gsz FROM bgh GROUP BY doc_id, source),
         |v AS (
         |  SELECT cand.source, a_id, b_id, count(DISTINCT pa.h) AS inter
         |  FROM cand
         |  JOIN bgh pa ON pa.source = cand.source AND pa.doc_id = cand.a_id
         |  JOIN bgh pb ON pb.source = cand.source AND pb.doc_id = cand.b_id
         |               AND pb.h = pa.h
         |  GROUP BY cand.source, a_id, b_id),
         |p AS (
         |  SELECT v.source, a_id, b_id,
         |    CAST(inter AS DOUBLE) / CAST(ga.gsz + gb.gsz - inter AS DOUBLE) AS jac
         |  FROM v
         |  JOIN gsz ga ON ga.source = v.source AND ga.doc_id = v.a_id
         |  JOIN gsz gb ON gb.source = v.source AND gb.doc_id = v.b_id)
         |SELECT source, a_id, b_id, ${r("jac", 4)} AS jaccard FROM p WHERE jac >= 0.2""".stripMargin
    },

    "q21_knn_cosine" -> {
      val dot = "list_dot_product(q.vec, c.vec) / (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(c.vec, c.vec)))"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         |s AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id, $dot AS sim
         |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |rr AS (SELECT q_id, n_id, sim,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
         |SELECT q_id, n_id, CAST(rank AS INTEGER) AS rank, ${r("sim", 4)} AS sim
         |FROM rr WHERE rank <= 5""".stripMargin
    },

    "q22_ann_lsh_bucket" ->
      s"SELECT vec_id, ${bucketSql("CAST(embedding AS DOUBLE[])")} AS bucket FROM embeddings",

    "q32_cosine_neardup" ->
      // cap-aware bucket membership, mirroring bounded_sorted_list (see q37)
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         |  ${bucketSql("CAST(embedding AS DOUBLE[])")} AS bucket FROM embeddings),
         |e AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
         |  FROM e0) WHERE rn <= ${Extensions.HotBucketCap}),
         |p AS (
         |  SELECT a.vec_id AS keep_id, b.vec_id AS dup_id, ${cosSql("a.vec", "b.vec")} AS sim
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT keep_id, dup_id, ${r("sim", 4)} AS sim FROM p WHERE sim >= 0.3""".stripMargin,

    "q35_ann_multiprobe" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         |  ${bucketSql("CAST(embedding AS DOUBLE[])")} AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS q_id, vec AS q_vec,
         |  unnest([bucket] || [xor(bucket, ${(0 until Extensions.LshPlanes).map(j => 1 << j).mkString("), xor(bucket, ")})]) AS pbucket
         |  FROM e WHERE vec_id < 10),
         |s AS (
         |  SELECT q.q_id, c.vec_id AS n_id, ${cosSql("q.q_vec", "c.vec")} AS sim
         |  FROM e c JOIN q ON c.bucket = q.pbucket AND q.q_id <> c.vec_id),
         |rr AS (SELECT q_id, n_id, sim,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
         |SELECT q_id, n_id, CAST(rank AS INTEGER) AS rank, ${r("sim", 4)} AS sim
         |FROM rr WHERE rank <= 3""".stripMargin,

    "q50_ann_query_directed" -> {
      // margin-sorted (|dot|, plane) structs + probe masks, generated from
      // the SAME ProbeFlipPattern constant as the Spark plan
      val msSql = (0 until Extensions.LshPlanes)
        .map(j => s"{'m': abs(list_dot_product(vec, ${planeSql(j)})), 'j': $j}")
        .mkString("list_sort([", ", ", "])")
      val maskSqls = Extensions.ProbeFlipPattern.map(fl =>
        fl.map(i => s"(1 << ms[$i].j)").foldLeft("0")((a, b) => s"($a | $b)"))
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         |  ${bucketSql("CAST(embedding AS DOUBLE[])")} AS bucket FROM embeddings),
         |qm AS (SELECT vec_id, vec, bucket, $msSql AS ms
         |  FROM e WHERE vec_id < 10),
         |q AS (SELECT vec_id AS q_id, vec AS q_vec,
         |  unnest([${maskSqls.map(m => s"xor(bucket, CAST($m AS INTEGER))").mkString(", ")}]) AS pbucket
         |  FROM qm),
         |s AS (
         |  SELECT q.q_id, c.vec_id AS n_id, ${cosSql("q.q_vec", "c.vec")} AS sim
         |  FROM e c JOIN q ON c.bucket = q.pbucket AND q.q_id <> c.vec_id),
         |rr AS (SELECT q_id, n_id, sim,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
         |SELECT q_id, n_id, CAST(rank AS INTEGER) AS rank, ${r("sim", 4)} AS sim
         |FROM rr WHERE rank <= 3""".stripMargin
    },

    "q54_multimodal_frames" -> {
      val n = Extensions.MultimodalFrameCount
      // ASCII corpus ⇒ DuckDB's char-based substr == the byte windows the
      // Spark stub reads; the rolling hash is exact integer arithmetic.
      s"""WITH d AS (SELECT doc_id, text, strlen(text) AS L FROM documents),
         |fr AS (SELECT doc_id, text, L, greatest(1, L // $n) AS stride,
         |  unnest(range(0, least($n, L))) AS f FROM d),
         |h AS (SELECT doc_id, CAST(f AS INTEGER) AS frame_no,
         |  CAST(f * stride AS INTEGER) AS byte_offset,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      [CAST(ord(substr(text, CAST(i AS INTEGER) + 1, 1)) AS BIGINT)
         |       for i in range(f * stride, least(L, f * stride + stride))]),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS frame_hash
         |  FROM fr)
         |SELECT doc_id, frame_no, byte_offset, frame_hash FROM h""".stripMargin
    },

    "q55_char_diversity" ->
      s"""WITH ch AS (SELECT doc_id, unnest([c for c in str_split_regex(text, '') if c != '']) AS ch
         |  FROM documents),
         |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
         |st AS (SELECT doc_id, sum(c) AS n, count(*) AS d, sum(c * c) AS ss
         |  FROM cc GROUP BY doc_id)
         |SELECT doc_id, CAST(n AS INTEGER) AS char_count,
         |  CAST(d AS INTEGER) AS distinct_chars,
         |  ${r("(1.0 - CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))", 4)} AS simpson_diversity
         |FROM st""".stripMargin,

    "q51_repetition_stats" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |w AS (SELECT doc_id, unnest(tk) AS t FROM tok),
         |wc AS (SELECT doc_id, t, count(*) AS c FROM w GROUP BY doc_id, t),
         |ws AS (SELECT doc_id, sum(c) AS n, max(c) AS mx, count(*) AS d FROM wc GROUP BY doc_id),
         |bgl AS (SELECT doc_id, [tk[i] || ' ' || tk[i + 1] for i in range(1, len(tk))] AS bg
         |  FROM tok WHERE len(tk) >= 2),
         |b AS (SELECT doc_id, unnest(bg) AS t FROM bgl),
         |bc AS (SELECT doc_id, t, count(*) AS c FROM b GROUP BY doc_id, t),
         |bs AS (SELECT doc_id, sum(c) AS n, max(c) AS mx, count(*) AS d FROM bc GROUP BY doc_id)
         |SELECT ws.doc_id, CAST(ws.n AS INTEGER) AS word_count,
         |  ${r("(1.0 - CAST(ws.d AS DOUBLE) / CAST(ws.n AS DOUBLE))", 4)} AS dup_word_frac,
         |  ${r("(CAST(ws.mx AS DOUBLE) / CAST(ws.n AS DOUBLE))", 4)} AS top_word_frac,
         |  ${r("COALESCE(1.0 - CAST(bs.d AS DOUBLE) / CAST(bs.n AS DOUBLE), 0.0)", 4)} AS dup_bigram_frac
         |FROM ws LEFT JOIN bs USING (doc_id)""".stripMargin,

    "q52_pii_scrub" -> {
      val email = Extensions.PiiEmailRe
      val phone = Extensions.PiiPhoneRe
      s"""WITH s7 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0
         |      THEN text || ' contact user' || doc_id || '@example.com or 555-01' ||
         |           lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-4567 now'
         |      ELSE text END AS t7
         |  FROM documents),
         |salted AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 0
         |      THEN t7 || ' call (555) 123-4567 or 555-987-6543 soon'
         |      ELSE t7 END AS t
         |  FROM s7)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$email')) AS INTEGER) AS email_count,
         |  CAST(len(regexp_extract_all(t, '$phone')) AS INTEGER) AS phone_count,
         |  md5(regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
         |      '$phone', '<PHONE>', 'g')) AS clean_md5
         |FROM salted""".stripMargin
    },

    "q48_tpch_q6" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q49_tpch_q3" ->
      """SELECT l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
        |WHERE l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
        |GROUP BY l_orderkey, order_date
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q45_set_ops" ->
      """WITH wo AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |hb AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        |SELECT 'union' AS op, k FROM (SELECT k FROM wo UNION SELECT k FROM hb)
        |UNION ALL
        |SELECT 'intersect' AS op, k FROM (SELECT k FROM wo INTERSECT SELECT k FROM hb)
        |UNION ALL
        |SELECT 'except' AS op, k FROM (SELECT k FROM wo EXCEPT SELECT k FROM hb)""".stripMargin,

    "q44_window_range" ->
      s"""WITH x AS (SELECT user_id, event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events)
         |SELECT user_id, event_id,
         |  count(*) OVER w AS events_1h,
         |  ${r("sum(value) OVER w", 2)} AS value_1h
         |FROM x
         |WINDOW w AS (PARTITION BY user_id ORDER BY tsec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q39_sessionize" ->
      s"""WITH x AS (
         |  SELECT user_id, event_id, value, ts, CAST(floor(epoch(ts)) AS BIGINT) AS tsec
         |  FROM events),
         |y AS (
         |  SELECT *, CASE WHEN tsec - lag(tsec) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
         |    THEN 1 ELSE 0 END AS new_s
         |  FROM x),
         |z AS (
         |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
         |  FROM y)
         |SELECT user_id, session_no, count(*) AS n_events,
         |  max(tsec) - min(tsec) AS duration_s,
         |  ${r("sum(value)", 2)} AS session_value
         |FROM z GROUP BY user_id, session_no""".stripMargin,

    "q40_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'view') AS view,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY user_id""".stripMargin,

    "q41_percentiles" ->
      s"""SELECT l_returnflag,
         |  ${r("quantile_cont(l_extendedprice, 0.5)", 4)} AS p50,
         |  ${r("quantile_cont(l_extendedprice, 0.9)", 4)} AS p90,
         |  ${r("quantile_cont(l_extendedprice, 0.99)", 4)} AS p99
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q38_json_extract" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct,
        |  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path
        |FROM events""".stripMargin,

    "q36_profile_stats" ->
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS d_orderkey,
        |  count(DISTINCT l_returnflag) AS d_returnflag,
        |  count(*) FILTER (WHERE l_returnflag IS NULL) AS nulls_returnflag,
        |  count(*) FILTER (WHERE l_shipdate IS NULL) AS nulls_shipdate,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,

    "q34_ivf_assign" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         |$kmeansCtes,
         |$kmeansAssignCte
         |SELECT vec_id, cell, ${r("dd", 4)} AS cell_score FROM cells""".stripMargin,

    "q53_ivf_search" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         |$kmeansCtes,
         |$kmeansAssignCte,
         |qd AS (SELECT e.vec_id AS q_id, e.vec AS q_vec, c.cb_id AS pcell,
         |         list_dot_product(e.vec, c.cb_vec) AS dd
         |       FROM e CROSS JOIN cb c WHERE e.vec_id < 10),
         |q AS (SELECT q_id, q_vec, pcell FROM (
         |       SELECT q_id, q_vec, pcell,
         |         row_number() OVER (PARTITION BY q_id ORDER BY dd DESC, pcell) AS prn
         |       FROM qd) WHERE prn <= ${Extensions.IvfNprobe}),
         |s AS (
         |  SELECT q.q_id, c.vec_id AS n_id, ${cosSql("q.q_vec", "c.vec")} AS sim
         |  FROM cells c JOIN q ON c.cell = q.pcell AND q.q_id <> c.vec_id),
         |rr AS (SELECT q_id, n_id, sim,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
         |SELECT q_id, n_id, CAST(rank AS INTEGER) AS rank, ${r("sim", 4)} AS sim
         |FROM rr WHERE rank <= 3""".stripMargin,

    "q33_ann_search" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         |  ${bucketSql("CAST(embedding AS DOUBLE[])")} AS bucket FROM embeddings),
         |s AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id, ${cosSql("q.vec", "c.vec")} AS sim
         |  FROM e q JOIN e c ON q.vec_id < 10 AND q.bucket = c.bucket AND c.vec_id <> q.vec_id),
         |rr AS (SELECT q_id, n_id, sim,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
         |SELECT q_id, n_id, CAST(rank AS INTEGER) AS rank, ${r("sim", 4)} AS sim
         |FROM rr WHERE rank <= 3""".stripMargin,

    "q47_lang_id_ngram" -> {
      val hitCols = Txt.CharBigramProfiles.map { case (l, p) =>
        val lits = p.map(x => s"'$x'").mkString("[", ", ", "]")
        s"CAST(len([g for g in [substr(text, CAST(i AS INTEGER) + 1, 2) for i in range(0, len(text) - 1)] " +
          s"if list_contains($lits, g)]) AS INTEGER) AS ${l}_ng"
      }.mkString(",\n  ")
      s"""WITH h AS (SELECT doc_id,
         |  $hitCols
         |FROM documents)
         |SELECT doc_id, en_ng, es_ng, fr_ng, de_ng,
         |  CASE WHEN en_ng >= es_ng AND en_ng >= fr_ng AND en_ng >= de_ng THEN 'en'
         |       WHEN es_ng >= fr_ng AND es_ng >= de_ng THEN 'es'
         |       WHEN fr_ng >= de_ng THEN 'fr'
         |       ELSE 'de' END AS detected_lang
         |FROM h""".stripMargin
    },

    "q23_lang_id" -> {
      val hitCols = Txt.StopwordsByLang.map { case (l, sw) =>
        s"CAST(len(list_intersect($toksSql, ${stoplistSql(sw)})) AS INTEGER) AS ${l}_hits"
      }.mkString(",\n  ")
      s"""WITH h AS (SELECT doc_id,
         |  $hitCols
         |FROM documents)
         |SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
         |  CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
         |       WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
         |       WHEN fr_hits >= de_hits THEN 'fr'
         |       ELSE 'de' END AS detected_lang
         |FROM h""".stripMargin
    },

    "q24_quality_score" -> {
      val en = stoplistSql(Txt.StopwordsByLang.head._2)
      s"""WITH b AS (SELECT doc_id,
         |  CAST(len($toksSql) AS INTEGER) AS n_tokens,
         |  CAST(list_sum([len(t) for t in str_split(text, ' ') if t != '']) AS INTEGER) AS sum_len,
         |  CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS INTEGER) AS punct_cnt,
         |  CAST(len([t for t in str_split(text, ' ') if t != '' AND list_contains($en, t)]) AS INTEGER) AS stop_occ,
         |  CAST(len(text) AS INTEGER) AS len
         |FROM documents)
         |SELECT doc_id, n_tokens,
         |  ${r("sum_len / n_tokens", 4)} AS avg_token_len,
         |  ${r("punct_cnt / len", 4)} AS punct_ratio,
         |  ${r("stop_occ / n_tokens", 4)} AS stop_ratio,
         |  ${r("(CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) " +
             "+ CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - punct_cnt / len) " +
             "+ CAST(0.3 AS DOUBLE) * (stop_occ / n_tokens)", 4)} AS quality
         |FROM b""".stripMargin
    },

    "q25_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS INTEGER) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '${Txt.BpePattern}')) AS INTEGER) AS bpe_tokens,
         |  CAST(len(text) AS INTEGER) AS n_chars_m
         |FROM documents""".stripMargin,

    "q46_term_freq" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents)
         |SELECT term, count(*) AS occurrences, count(DISTINCT doc_id) AS doc_freq
         |FROM tok GROUP BY term
         |ORDER BY occurrences DESC, term ASC LIMIT 20""".stripMargin,

    "q26_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(substr(text, CAST(i AS INTEGER) + 1, 1)) AS BIGINT) for i in range(0, len(text))]),
        |    (x, y) -> (x * 31 + y) % 1000000007) AS rhash
        |FROM documents""".stripMargin,

    "q27_multimodal_meta" ->
      """WITH h AS (SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(substr(text, CAST(i AS INTEGER) + 1, 1)) AS BIGINT) for i in range(0, len(text))]),
        |    (x, y) -> (x * 31 + y) % 1000000007) AS rh
        |FROM documents)
        |SELECT doc_id, n_bytes,
        |  CAST(rh % 1024 + 1 AS INTEGER) AS width,
        |  CAST((rh // 1024) % 768 + 1 AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels
        |FROM h""".stripMargin,

    "q28_rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q29_distinct_count" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS parts, count(DISTINCT l_suppkey) AS supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // q30/q43 envelope oracles: each engine runs ITS OWN sketch and its own
    // exact twin, emitting booleans that the sketch honors the promised
    // bound — deterministically `true` on both sides, so the driver
    // hash-checks the error envelope (the raw estimates themselves can
    // never match across different sketch implementations).
    "q30_approx_distinct" ->
      """WITH g AS (
        |  SELECT l_returnflag,
        |    count(DISTINCT l_partkey) AS parts, count(DISTINCT l_suppkey) AS supps,
        |    approx_count_distinct(l_partkey) AS pa, approx_count_distinct(l_suppkey) AS sa
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, parts, supps,
        |  abs(CAST(pa AS DOUBLE) - CAST(parts AS DOUBLE)) / CAST(parts AS DOUBLE) <= 0.05 AS parts_within_5pct,
        |  abs(CAST(sa AS DOUBLE) - CAST(supps AS DOUBLE)) / CAST(supps AS DOUBLE) <= 0.05 AS supps_within_5pct
        |FROM g""".stripMargin,

    "q43_approx_percentiles" ->
      s"""WITH g AS (
         |  SELECT l_returnflag,
         |    quantile_cont(l_extendedprice, 0.5) AS e50,
         |    quantile_cont(l_extendedprice, 0.9) AS e90,
         |    approx_quantile(l_extendedprice, 0.5) AS a50,
         |    approx_quantile(l_extendedprice, 0.9) AS a90
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, ${r("e50", 4)} AS p50, ${r("e90", 4)} AS p90,
         |  abs(a50 - e50) / e50 <= 0.02 AS p50_within_2pct,
         |  abs(a90 - e90) / e90 <= 0.02 AS p90_within_2pct
         |FROM g""".stripMargin,

    "q63_pq_encode" -> {
      // Round-12 sf100 finding: the streaming struct-max argmax
      // (max(struct_pack(d, -cb_id)), the r11 kmeans-family form) is
      // itself a memory wall when the GROUP count is vec×subspace — at
      // 16 M groups DuckDB's struct min/max states allocated ~100 GB
      // OUTSIDE the tracked pool (RSS 112 GB at a 12 GB cap, OOM-killed
      // in minutes; the ≤ 2 M-group kmeans oracles passed at sf100 but
      // were one decade from the same wall — ported to this shape in
      // round 13, see kmeansCtes). Two-pass argmax instead: a
      // PRIMITIVE max(d) aggregate (tracked, spillable), then a
      // join-back on the bit-identical double to pick min(cb_id) — the
      // same highest-d-then-lowest-code tie-break, row-identical at
      // sf0.01/sf0.1/sf1, hash-green at sf100 in under 2 min at a 40 GB
      // cap. x is re-read by the join-back and is AS MATERIALIZED
      // (DuckDB 1.0 INLINES plain multi-referenced CTEs — without the
      // hint the 256 M dot products compute twice): ~7 GB of
      // (vec_id, s, cb_id, d) rows, tracked and spillable; nothing
      // per-group survives off the tracked path.
      val sub = Extensions.PqSubDim
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         |cb AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cb_id,
         |               vec AS cb_vec
         |        FROM (SELECT vec_id, vec FROM e WHERE vec_id IS NOT NULL
         |              ORDER BY vec_id LIMIT ${Extensions.PqK})),
         |sub AS (SELECT CAST(i AS INTEGER) AS s
         |        FROM unnest(generate_series(0, ${Extensions.PqM - 1})) AS t(i)),
         |x AS MATERIALIZED (SELECT e.vec_id, sub.s, cb.cb_id,
         |        list_dot_product(list_slice(e.vec, sub.s*$sub+1, sub.s*$sub+$sub),
         |                         list_slice(cb.cb_vec, sub.s*$sub+1, sub.s*$sub+$sub)) AS d
         |      FROM e CROSS JOIN cb CROSS JOIN sub),
         |m AS (SELECT vec_id, s, max(d) AS d FROM x GROUP BY vec_id, s),
         |b AS (SELECT x.vec_id, x.s, min(x.cb_id) AS code, m.d AS d
         |      FROM x JOIN m ON m.vec_id = x.vec_id AND m.s = x.s AND x.d = m.d
         |      GROUP BY x.vec_id, x.s, m.d)
         |SELECT vec_id, s AS subspace, CAST(code AS INTEGER) AS code, ${r("b.d", 4)} AS score
         |FROM b""".stripMargin
    },

    "q64_ivfpq_search" -> {
      val sub = Extensions.PqSubDim
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         |$kmeansCtes,
         |$kmeansAssignCte,
         |pqcb AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cb_id,
         |                vec AS cb_vec
         |         FROM (SELECT vec_id, vec FROM e WHERE vec_id IS NOT NULL
         |               ORDER BY vec_id LIMIT ${Extensions.PqK})),
         |sub AS (SELECT CAST(i AS INTEGER) AS s
         |        FROM unnest(generate_series(0, ${Extensions.PqM - 1})) AS t(i)),
         |x AS MATERIALIZED (SELECT e.vec_id, sub.s, pqcb.cb_id,
         |        list_dot_product(list_slice(e.vec, sub.s*$sub+1, sub.s*$sub+$sub),
         |                         list_slice(pqcb.cb_vec, sub.s*$sub+1, sub.s*$sub+$sub)) AS dd
         |      FROM e CROSS JOIN pqcb CROSS JOIN sub),
         |-- two-pass primitive argmax (q63's shape — struct-max states are
         |-- an untracked memory wall at the 16 M vec x subspace groups):
         |xm AS (SELECT vec_id, s, max(dd) AS dd FROM x GROUP BY vec_id, s),
         |codes AS (SELECT x.vec_id, x.s, CAST(min(x.cb_id) AS INTEGER) AS code
         |        FROM x JOIN xm ON xm.vec_id = x.vec_id AND xm.s = x.s AND x.dd = xm.dd
         |        GROUP BY x.vec_id, x.s),
         |qd AS (SELECT e.vec_id AS q_id, e.vec AS q_vec, c.cb_id AS pcell,
         |         list_dot_product(e.vec, c.cb_vec) AS dd
         |       FROM e CROSS JOIN cb c WHERE e.vec_id < 10),
         |q AS (SELECT q_id, q_vec, pcell FROM (
         |       SELECT q_id, q_vec, pcell,
         |         row_number() OVER (PARTITION BY q_id ORDER BY dd DESC, pcell) AS prn
         |       FROM qd) WHERE prn <= ${Extensions.IvfNprobe}),
         |pr AS (SELECT q.q_id, q.q_vec, c.vec_id AS n_id
         |       FROM cells c JOIN q ON c.cell = q.pcell AND q.q_id <> c.vec_id),
         |pa AS (SELECT pr.q_id, pr.n_id,
         |         CAST(list_dot_product(
         |           list_slice(pr.q_vec, co.s*$sub+1, co.s*$sub+$sub),
         |           list_slice(pqcb.cb_vec, co.s*$sub+1, co.s*$sub+$sub)) AS DECIMAL(28,14)) AS pd
         |       FROM pr JOIN codes co ON co.vec_id = pr.n_id
         |               JOIN pqcb ON pqcb.cb_id = co.code),
         |ad AS (SELECT q_id, n_id, CAST(sum(pd) AS DOUBLE) AS adc FROM pa GROUP BY q_id, n_id),
         |rr AS (SELECT q_id, n_id, adc,
         |  row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS rank FROM ad)
         |SELECT q_id, n_id, CAST(rank AS INTEGER) AS rank, ${r("adc", 4)} AS adc
         |FROM rr WHERE rank <= 3""".stripMargin
    },

    "q56_kmeans_step" -> {
      val dots = (0 until Extensions.LshPlanes)
        .map(j => s"list_dot_product(vec, ${planeSql(j)})")
        .mkString("[", ",\n    ", "]")
      s"""WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         |e AS (SELECT vec_id, vec, $dots AS dots FROM d),
         |a AS (SELECT vec, CAST(list_indexof(dots, list_max(dots)) - 1 AS INTEGER) AS cell FROM e),
         |x AS (SELECT cell, CAST(i AS INTEGER) AS dim, vec[CAST(i AS INTEGER)] AS v
         |      FROM a CROSS JOIN unnest(generate_series(1, ${Extensions.EmbeddingDim})) AS t(i))
         |SELECT cell, dim, count(*) AS n,
         |  ${r("CAST(sum(CAST(v AS DECIMAL(28,14))) AS DOUBLE) / count(*)", 4)} AS centroid
         |FROM x GROUP BY cell, dim""".stripMargin
    },

    "q61_dedup_clusters" -> {
      // Connected components as STAGED min-label propagation + pointer
      // jumping, not recursive all-pairs reachability: the original
      // `reach(id, r)` CTE materializes Σ component² rows — fine at the
      // driver's sf0.01, but the sf10 corpus chains one 75k-doc component
      // through the saturated band keys (5.6e9 reach rows, wedged). Each
      // stage halves label-path lengths (propagate one hop, then follow
      // the label pointer), so 24 stages cover any component this side of
      // 2^24 hops of diameter. A convergence guard poisons every rep to
      // NULL if any edge is label-inconsistent or any label is not a
      // fixpoint — an under-iterated oracle FAILS the compare instead of
      // silently passing.
      // r14: STAGED EDGE CONTRACTION, the SQL analogue of the engine's
      // per-round contraction loop (Extensions.connectedComponentsWithRounds,
      // measured 2× at sf10 and sf100): each stage rewrites the edge set
      // to current reps, drops self-loops, and dedups, so edge-width work
      // decays geometrically (Σ|e_k| ≈ 2|E|) instead of all 24 stages
      // propagating over the FULL edge frame (24·|E| — the term that made
      // the sf100 replay a 31-min/45-GB solo-protocol job and the named
      // sf1000 blocker, SCALING.md round 13). The per-stage node-width
      // passes (min-propagate + pointer jump over lab) stay — they ARE
      // the mapping composition — and the convergence guard below still
      // poisons the output on any non-fixpoint, so under-iteration fails
      // the compare loudly, exactly as before.
      val stages = (1 to 24).map { k =>
        val pl = if (k == 1) "lab0" else s"j${k - 1}"
        val pe = if (k == 1) "edges" else s"e${k - 1}"
        s"""p$k AS MATERIALIZED (SELECT id, min(rep) AS rep FROM (
           |  SELECT id, rep FROM $pl
           |  UNION ALL
           |  SELECT e.dst AS id, l.rep FROM $pe e JOIN $pl l ON l.id = e.src
           |) GROUP BY id),
           |j$k AS MATERIALIZED (SELECT a.id, b.rep FROM p$k a JOIN p$k b ON b.id = a.rep),
           |e$k AS MATERIALIZED (SELECT DISTINCT la.rep AS src, lb.rep AS dst
           |  FROM $pe e JOIN j$k la ON la.id = e.src JOIN j$k lb ON lb.id = e.dst
           |  WHERE la.rep <> lb.rep)""".stripMargin
      }.mkString(",\n")
      s"""WITH $lshPairCtes,
         |pairs AS (
         |  $lshPairSelect),
         |edges AS MATERIALIZED (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION
         |  SELECT b_id AS src, a_id AS dst FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |lab0 AS (SELECT id, id AS rep FROM nodes),
         |$stages,
         |lab AS (SELECT id, rep FROM j24),
         |bad AS (
         |  SELECT (SELECT count(*) FROM edges e
         |            JOIN lab la ON la.id = e.src JOIN lab lb ON lb.id = e.dst
         |            WHERE la.rep <> lb.rep)
         |       + (SELECT count(*) FROM lab a JOIN lab b ON b.id = a.rep
         |            WHERE a.rep <> b.rep) AS n),
         |sz AS (SELECT rep, count(*) AS cluster_size FROM lab GROUP BY rep)
         |SELECT lab.id AS doc_id,
         |  CASE WHEN (SELECT n FROM bad) = 0 THEN lab.rep END AS cluster_rep,
         |  sz.cluster_size
         |FROM lab JOIN sz USING (rep)""".stripMargin
    },

    "q62_seq_packing" -> {
      val tokCount = "len([t for t in str_split(text, ' ') if t != ''])"
      s"""WITH d AS (SELECT source, doc_id, CAST($tokCount AS INTEGER) AS tokens FROM documents),
         |c AS (SELECT source, doc_id, tokens,
         |  COALESCE(sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
         |  FROM d)
         |SELECT source, doc_id, tokens,
         |  CAST(floor(bef / ${Extensions.PackCapacity}) AS INTEGER) AS chunk_id
         |FROM c""".stripMargin
    },

    "q57_hash_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(text), 1, 4) <
        |  CASE WHEN ascii(substr(source, 1, 1)) % 2 = 0 THEN '4000' ELSE '8000' END""".stripMargin,

    "q58_tfidf_topk" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (SELECT doc_id, term, CAST(tf * n_docs AS DOUBLE) / df AS score
         |      FROM tf JOIN df USING (term), n),
         |rr AS (SELECT doc_id, term, score,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM s)
         |SELECT doc_id, term, CAST(rank AS INTEGER) AS rank, ${r("score", 4)} AS score
         |FROM rr WHERE rank <= 3""".stripMargin,

    "q59_length_clip" ->
      """WITH l AS (SELECT source, CAST(len(text) AS INTEGER) AS len FROM documents),
        |b AS (SELECT source, quantile_cont(len, 0.05) AS lo, quantile_cont(len, 0.95) AS hi
        |      FROM l GROUP BY source),
        |k AS (SELECT l.source AS source, len FROM l JOIN b USING (source)
        |      WHERE len >= lo AND len <= hi)
        |SELECT source, count(*) AS n_kept, min(len) AS min_len, max(len) AS max_len
        |FROM k GROUP BY source""".stripMargin,

    "q60_time_pairs" ->
      """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events)
        |SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id,
        |  abs(a.tsec - b.tsec) AS dt_s
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(a.tsec - b.tsec) <= 300""".stripMargin,

    "q31_sql_text" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base,
        |  count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q65_asof_native" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT event_id AS v_event_id, user_id AS v_user_id, ts AS v_ts, value AS v_value
        |  FROM events WHERE event_type = 'view')
        |SELECT event_id, user_id, ts_s, v_event_id, v_value FROM (
        |  SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |         v.v_event_id, v.v_value,
        |         row_number() OVER (PARTITION BY p.event_id
        |           ORDER BY v.v_ts DESC NULLS LAST, v.v_event_id DESC NULLS LAST) AS rn
        |  FROM p LEFT JOIN v ON p.user_id = v.v_user_id AND v.v_ts <= p.ts) q
        |WHERE rn = 1""".stripMargin,

    "q66_line_dedup" -> {
      val k = Extensions.ChunkTokens
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d),
         |ch AS (SELECT doc_id, i AS pos,
         |         array_to_string(list_slice(toks, i*$k + 1, i*$k + $k), ' ') AS chunk
         |       FROM tok, unnest(generate_series(0,
         |         CAST(ceil(len(toks) / $k.0) AS BIGINT) - 1)) AS t(i)),
         |fl AS (SELECT chunk FROM ch GROUP BY chunk
         |       HAVING count(DISTINCT doc_id) >= ${Extensions.BoilerplateMinDocs}),
         |kept AS (SELECT * FROM ch WHERE chunk NOT IN (SELECT chunk FROM fl)),
         |rb AS (SELECT doc_id, count(*) AS n_kept,
         |         string_agg(chunk, ' ' ORDER BY pos) AS text_clean
         |       FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id,
         |          CAST(ceil(len(string_split(text, ' ')) / $k.0) AS BIGINT) AS n_chunks
         |        FROM d)
         |SELECT d.doc_id, rb.text_clean, coalesce(rb.n_kept, 0) AS n_kept,
         |       tot.n_chunks - coalesce(rb.n_kept, 0) AS n_dropped
         |FROM d JOIN tot USING (doc_id) LEFT JOIN rb USING (doc_id)""".stripMargin
    },

    "q67_decontaminate" -> {
      val g = Extensions.DecontamGram
      val m = Extensions.BenchmarkMod
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |grams AS (SELECT doc_id,
         |            array_to_string(list_slice(toks, i, i + $g - 1), ' ') AS g
         |          FROM d, unnest(generate_series(1, len(toks) - $g + 1)) AS t(i)),
         |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % $m = 0),
         |hits AS (SELECT doc_id, count(*) AS n FROM grams
         |         WHERE doc_id % $m <> 0 AND g IN (SELECT g FROM bench)
         |         GROUP BY doc_id)
         |SELECT d2.doc_id, coalesce(h.n, 0) AS n_hits, coalesce(h.n, 0) > 0 AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % $m <> 0) d2
         |LEFT JOIN hits h USING (doc_id)""".stripMargin
    },

    "q68_robust_outliers" ->
      s"""WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
         |m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
         |      FROM e GROUP BY event_type),
         |s AS (SELECT e.event_type, m.med,
         |        quantile_cont(abs(e.value - m.med), 0.5) AS mad
         |      FROM e JOIN m USING (event_type) GROUP BY e.event_type, m.med)
         |SELECT e.event_type, ${r("s.med", 4)} AS med, ${r("s.mad", 4)} AS mad,
         |  count(*) AS n,
         |  CAST(sum(CASE WHEN abs(e.value - s.med) > 3.0 * s.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM e JOIN s USING (event_type)
         |GROUP BY e.event_type, s.med, s.mad""".stripMargin,

    "q69_asof_forward" ->
      """WITH v AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT event_id AS p_event_id, user_id AS p_user_id, ts AS p_ts, value AS p_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id, ts_s, p_event_id, p_ts_s, p_value FROM (
        |  SELECT v.event_id, v.user_id, strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |         p.p_event_id, strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts_s, p.p_value,
        |         row_number() OVER (PARTITION BY v.event_id
        |           ORDER BY p.p_ts ASC NULLS LAST, p.p_event_id ASC NULLS LAST) AS rn
        |  FROM v JOIN p ON v.user_id = p.p_user_id AND p.p_ts >= v.ts) q
        |WHERE rn = 1""".stripMargin,

    "q70_bigram_fluency" -> {
      val rare = Extensions.RareMaxDocs
      s"""WITH tok AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
         |  FROM tok, unnest(generate_series(1, len(toks) - 1)) AS t(i)
         |  WHERE len(toks) >= 2),
         |bdf AS (
         |  SELECT g, count(DISTINCT doc_id) AS bdf FROM g GROUP BY g),
         |sc AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    CAST(sum(bdf.bdf) AS DOUBLE) AS sum_df,
         |    CAST(sum(CASE WHEN bdf.bdf <= $rare THEN 1 ELSE 0 END) AS DOUBLE) AS n_rare
         |  FROM g JOIN bdf USING (g) GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         |  ${r("sum_df / n_bigrams", 4)} AS avg_df,
         |  ${r("n_rare / n_bigrams", 4)} AS rare_frac
         |FROM sc""".stripMargin
    },

    "q71_range_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS psec
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, CAST(ts AS DATE) AS i_day,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS vsec
        |  FROM events WHERE event_type = 'view'),
        |iv AS (
        |  SELECT user_id AS i_user_id, i_day, min(vsec) AS s_sec,
        |    max(vsec) AS e_sec, count(*) AS n_views
        |  FROM v GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.psec,
        |  strftime(iv.i_day, '%Y-%m-%d') AS day_s, iv.n_views,
        |  p.psec - iv.s_sec AS into_session_s
        |FROM p JOIN iv ON p.user_id = iv.i_user_id
        |  AND p.psec BETWEEN iv.s_sec AND iv.e_sec""".stripMargin,

    "q72_interval_overlap" -> {
      val m = Extensions.TransitModDays
      s"""WITH iv AS (
         |  SELECT l_orderkey * 8 + l_linenumber AS id, l_suppkey AS supp,
         |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s
         |  FROM lineitem WHERE year(l_shipdate) = 1996),
         |ive AS (
         |  SELECT id, supp, s, s + 7 + (id % $m) AS e FROM iv)
         |SELECT a.supp, a.id AS a_id, b.id AS b_id,
         |  least(a.e, b.e) - greatest(a.s, b.s) + 1 AS overlap_days
         |FROM ive a JOIN ive b
         |  ON a.supp = b.supp AND a.id < b.id
         |  AND a.s <= b.e AND b.s <= a.e""".stripMargin
    },

    "q73_heavy_hitters" -> {
      val k1 = Extensions.HeavyK + 1
      s"""WITH t AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
         |n AS (SELECT count(*) AS n FROM t)
         |SELECT tok, cnt FROM c, n WHERE cnt > n / $k1.0""".stripMargin
    },

    "q77_balanced_sample" -> {
      val k = Extensions.SampleK
      s"""SELECT lang, source, doc_id, h FROM (
         |  SELECT lang, source, doc_id,
         |    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h,
         |    row_number() OVER (PARTITION BY lang, source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || text) ASC,
         |               doc_id ASC) AS rn
         |  FROM documents) q
         |WHERE rn <= $k""".stripMargin
    },

    "q78_mixture_weights" ->
      s"""WITH per AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
         |  FROM documents GROUP BY source),
         |per2 AS (
         |  SELECT source, n_docs, tokens,
         |    CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS wint
         |  FROM per),
         |tot AS (
         |  SELECT CAST(sum(tokens) AS BIGINT) AS ttok,
         |    CAST(sum(wint) AS BIGINT) AS twint
         |  FROM per2)
         |SELECT source, n_docs, tokens,
         |  ${r("CAST(tokens AS DOUBLE) / CAST(ttok AS DOUBLE)", 6)} AS share,
         |  ${r("CAST(wint AS DOUBLE) / CAST(twint AS DOUBLE)", 6)} AS weight,
         |  ${r("(CAST(wint AS DOUBLE) / CAST(twint AS DOUBLE)) / (CAST(tokens AS DOUBLE) / CAST(ttok AS DOUBLE))", 4)} AS boost
         |FROM per2, tot""".stripMargin,

    // The oracle is the PLAIN join — the Bloom prefilter must be
    // semantically invisible (no false negatives; fpp removed by the
    // confirm join).
    "q79_bloom_join" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |  CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1, 2""".stripMargin,

    // Plain join+group-by: salting must be semantically invisible.
    "q80_salted_join" ->
      """SELECT c_mktsegment, event_type,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
        |  count(*) AS n_events
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,

    // Generated from Extensions.Bm25Terms; the integer-exact fraction and
    // the left-associated term sum mirror the Spark expression tree
    // step-for-step (see q81's scaladoc).
    "q81_bm25" -> {
      val dfCols = Extensions.Bm25Terms.map(t =>
        s"""    CAST(sum(CASE WHEN list_contains(tk, '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df_$t""")
        .mkString(",\n")
      val tfCols = Extensions.Bm25Terms.map(t =>
        s"""    CAST(len(list_filter(tk, x -> x = '$t')) AS BIGINT) AS tf_$t""")
        .mkString(",\n")
      def term(t: String) =
        s"(CAST(22*tf_$t*slen*(2*n - 2*df_$t + 1) AS DOUBLE) / " +
          s"CAST((10*tf_$t*slen + 3*slen + 9*dl*n)*(2*df_$t + 1) AS DOUBLE))"
      val score = Extensions.Bm25Terms.map(term).reduce((a, b) => s"($a + $b)")
      s"""WITH d AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |d2 AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS dl FROM d),
         |st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS slen,
         |$dfCols
         |  FROM d2),
         |tf AS (
         |  SELECT doc_id, dl,
         |$tfCols
         |  FROM d2)
         |SELECT doc_id, ${Extensions.Bm25Terms.map(t => s"tf_$t").mkString(", ")},
         |  ${r(score, 6)} AS bm25
         |FROM tf, st""".stripMargin
    },

    "q82_grouping_sets" ->
      """WITH o AS (
        |  SELECT o_orderpriority,
        |    CAST(year(o_orderdate) AS INTEGER) AS order_year, o_totalprice
        |  FROM orders)
        |SELECT o_orderpriority, order_year,
        |  CAST(GROUPING(o_orderpriority, order_year) AS BIGINT) AS gid,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM o
        |GROUP BY GROUPING SETS ((o_orderpriority, order_year), (order_year), ())""".stripMargin,

    // q30's envelope contract: each engine validates ITS OWN sketch
    // against its own exact twin (DuckDB has no sketch-merge surface; the
    // merge losslessness is pinned Spark-side by HllSketchSpec).
    "q83_hll_union" ->
      """WITH g AS (
        |  SELECT l_returnflag,
        |    count(DISTINCT l_partkey) AS parts,
        |    approx_count_distinct(l_partkey) AS pa
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, parts,
        |  abs(CAST(pa AS DOUBLE) - CAST(parts AS DOUBLE)) / CAST(parts AS DOUBLE) <= 0.05 AS parts_within_5pct
        |FROM g""".stripMargin,

    "q84_funnel" ->
      """WITH a AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t_view
        |  FROM events),
        |b AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
        |    OVER (PARTITION BY user_id) AS t_click
        |  FROM a),
        |c AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
        |    OVER (PARTITION BY user_id) AS t_purchase
        |  FROM b)
        |SELECT user_id, epoch_us(min(t_view)) AS t_view_us,
        |  epoch_us(min(t_click)) AS t_click_us,
        |  epoch_us(min(t_purchase)) AS t_purchase_us
        |FROM c GROUP BY user_id""".stripMargin,

    "q85_retention_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort_d FROM e GROUP BY 1)
        |SELECT cohort_d, CAST(e.d - f.cohort_d AS INTEGER) AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,

    // Verbatim shared text — see Parity.SubqueriesSql.
    "q86_subqueries" -> Parity.SubqueriesSql,

    // Window form IS the oracle: the distributed ranking must match the
    // single-task sort bit-for-bit.
    "q87_deciles" ->
      """WITH r AS (
        |  SELECT o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk,
        |    count(*) OVER () AS n_total
        |  FROM orders)
        |SELECT CAST(floor(((rk - 1) * 10.0) / n_total) AS INTEGER) + 1 AS decile,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM r GROUP BY 1""".stripMargin,

    // Exact decimal moments, then the same fixed double expression tree
    // as the Spark side (see q88's scaladoc).
    "q88_portable_stats" -> {
      val varQ = "(nd*sqqd - sqd*sqd) / (nd*(nd - 1.0))"
      val varP = "(nd*sppd - spd*spd) / (nd*(nd - 1.0))"
      val cov = "(nd*sqpd - sqd*spd) / (nd*(nd - 1.0))"
      s"""WITH m AS (
         |  SELECT l_returnflag, count(*) AS n,
         |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS sq,
         |    sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS sp,
         |    -- DECIMAL(19,6) operands force int128 arithmetic in DuckDB
         |    -- (18-width operands multiply in int64 and overflow on
         |    -- price^2); result DECIMAL(38,12) is still exact.
         |    sum(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS sqq,
         |    sum(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS spp,
         |    sum(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sqp
         |  FROM lineitem GROUP BY 1),
         |m2 AS (
         |  SELECT l_returnflag, n,
         |    CAST(n AS DOUBLE) AS nd, CAST(sq AS DOUBLE) AS sqd, CAST(sp AS DOUBLE) AS spd,
         |    CAST(sqq AS DOUBLE) AS sqqd, CAST(spp AS DOUBLE) AS sppd, CAST(sqp AS DOUBLE) AS sqpd
         |  FROM m)
         |SELECT l_returnflag, n,
         |  ${r("sqd / nd", 4)} AS mean_qty,
         |  ${r(s"sqrt($varQ)", 4)} AS std_qty,
         |  ${r(s"($cov) / (sqrt($varQ) * sqrt($varP))", 4)} AS corr_qty_price
         |FROM m2""".stripMargin
    },

    "q89_train_split" ->
      """WITH d AS (
        |  SELECT substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS h,
        |    len(string_split(text, ' ')) AS tok
        |  FROM documents)
        |SELECT CASE WHEN h < '0800' THEN 'val'
        |            WHEN h < '1000' THEN 'test'
        |            ELSE 'train' END AS split,
        |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS tokens
        |FROM d GROUP BY 1""".stripMargin,

    // The oracle states the per-doc neighbor cap DIRECTLY as a rank-delta
    // range predicate; the Spark plan's band-key equi-join + exact range
    // filter must be pair-identical to it (the band algebra proof lives in
    // the q90 scaladoc; SemDedupScaleSpec pins equivalence).
    "q90_semdedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         |$kmeansCtes,
         |$kmeansAssignCte,
         |rk AS (SELECT vec_id, vec, cell,
         |  row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn FROM cells),
         |p AS (
         |  SELECT b.vec_id AS vec_id, a.vec_id AS a_id, ${cosSql("a.vec", "b.vec")} AS sim
         |  FROM rk a JOIN rk b ON a.cell = b.cell
         |    -- cap = clamp(4*ceil(sqrt(N)), 64, 4096) = Extensions.semDedupCap
         |    AND b.rn - a.rn BETWEEN 1
         |      AND (SELECT LEAST(GREATEST(4 * CAST(ceil(sqrt(count(*))) AS BIGINT), 64), 4096)
         |           FROM e))
         |SELECT vec_id, min(a_id) AS dup_of, count(*) AS n_dups,
         |  ${r("max(sim)", 4)} AS max_sim
         |FROM p WHERE sim >= ${Extensions.SemDedupTau} GROUP BY vec_id""".stripMargin,

    // The oracle is the NAIVE per-source cumulative-sum window — the
    // bucketed two-pass must be row-identical (bucket = ordering-hash
    // prefix, so bucket-then-hash order IS global hash order).
    "q91_token_budget" ->
      """WITH d AS (
        |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |    md5(text) AS h
        |  FROM documents),
        |t AS (
        |  SELECT source, CAST(sum(tok) AS BIGINT) * 3 // 5 AS budget,
        |    CAST(sum(tok) AS BIGINT) AS total_tokens
        |  FROM d GROUP BY source),
        |c AS (
        |  SELECT source, tok, sum(tok) OVER (
        |    PARTITION BY source ORDER BY h, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT source, count(*) AS n_kept, CAST(sum(tok) AS BIGINT) AS tokens_kept,
        |  budget, total_tokens
        |FROM c JOIN t USING (source) WHERE cum <= budget
        |GROUP BY source, budget, total_tokens""".stripMargin,

    // The IDENTICAL sample (same md5 order, same k) then the same
    // interpolation — an approximate operator with an exact oracle.
    "q92_sample_quantiles" -> {
      // Round-12 sf100 finding: the bottom-K-by-hash window over the RAW
      // table sorts all 600 M (flag, 32-char md5, price) rows — DuckDB's
      // external window spill outran this box's 47 GB disk quota at any
      // memory cap. The K smallest hashes sit below any threshold ≥ the
      // K-th order statistic, so pre-filter on the md5's 60-bit prefix
      // at 32× the expected K-th quantile (prefix order refines the
      // string order, so the filter can only pass a superset of the
      // selected rows; P(K-th above 32× its expectation) is Chernoff-
      // negligible) and sort only the ~32·K survivors per group. The
      // `chk` guard replays q61's loud-fail convention: if a group's
      // survivor count ever lands under LEAST(K, n), every output column
      // poisons to NULL and the compare FAILS rather than silently
      // sampling from a truncated pool. Row-identical at sf0.01/sf0.1/
      // sf1; the 600 M-row sf100 sort becomes a ~24 k-row sort.
      val k = Extensions.SketchSampleK
      val guard = s"chk.m >= LEAST($k, chk.n)"
      s"""WITH d AS (
         |  SELECT l_returnflag,
         |    md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS h,
         |    l_extendedprice AS v
         |  FROM lineitem),
         |cnt AS MATERIALIZED (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag),
         |flt AS MATERIALIZED (
         |  SELECT d.l_returnflag, d.h, d.v
         |  FROM d JOIN cnt USING (l_returnflag)
         |  WHERE CAST(('0x' || substr(d.h, 1, 15)) AS BIGINT)
         |        < CAST(LEAST(1.8e18, 32.0 * $k * 1152921504606846976.0 / cnt.n) AS BIGINT)),
         |chk AS (
         |  SELECT f.l_returnflag, count(*) AS m, any_value(cnt.n) AS n
         |  FROM flt f JOIN cnt USING (l_returnflag) GROUP BY f.l_returnflag),
         |smp AS (
         |  SELECT l_returnflag, v FROM (
         |    SELECT l_returnflag, v,
         |      row_number() OVER (PARTITION BY l_returnflag ORDER BY h, v) AS rn
         |    FROM flt) WHERE rn <= $k)
         |SELECT s.l_returnflag,
         |  CASE WHEN $guard THEN count(*) END AS n_sample,
         |  CASE WHEN $guard THEN ${r("quantile_cont(v, 0.5)", 4)} END AS p50,
         |  CASE WHEN $guard THEN ${r("quantile_cont(v, 0.9)", 4)} END AS p90,
         |  CASE WHEN $guard THEN ${r("quantile_cont(v, 0.99)", 4)} END AS p99
         |FROM smp s JOIN chk USING (l_returnflag)
         |GROUP BY s.l_returnflag, chk.m, chk.n""".stripMargin
    },

    // q93: the Spark side ENCODES a real PNG per doc and DECODES it via
    // javax.imageio; the oracle recomputes the planted dimensions
    // arithmetically (no codec in DuckDB needed) — a decode regression
    // shows up as a value mismatch.
    "q93_real_decode" ->
      """SELECT doc_id,
        |  CAST(16 + doc_id % 32 AS INTEGER) AS width,
        |  CAST(16 + (doc_id * 7) % 32 AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels
        |FROM documents WHERE doc_id < 48""".stripMargin,

    // q94: the Spark side decodes the q93 PNGs IN FULL and computes
    // luma-grid sums + anchor-codebook assignment from the real pixels;
    // the oracle replays every pixel arithmetically (Multimodal.pngPixel
    // is closed-form in (doc_id, x, y)) and the anchor VALUES are
    // interpolated from the same Multimodal.anchor the executors run —
    // the two sides cannot drift. All compared columns are exact
    // integers; the only float (the argmax score) is one division of
    // exact integers by an exact-integer sqrt, bit-identical on both
    // engines, and ties break to the smaller k on both.
    "q94_real_features" -> {
      val g = graft.multimodal.Multimodal.LumaGrid
      val anchors = (0 until graft.multimodal.Multimodal.AnchorK)
        .flatMap(k => (0 until g * g).map(d =>
          s"($k, $d, ${graft.multimodal.Multimodal.anchor(k, d)})"))
        .mkString(", ")
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(16 + doc_id % 32 AS INTEGER) AS w,
         |    CAST(16 + (doc_id * 7) % 32 AS INTEGER) AS h
         |  FROM documents WHERE doc_id < 48),
         |px AS (
         |  SELECT d.doc_id, d.w, d.h,
         |    ((ys.range * $g) // d.h) * $g + ((xs.range * $g) // d.w) AS gd,
         |    ((d.doc_id * 2654435761 + xs.range * 131 + ys.range * 31) & 16777215) AS rgb
         |  FROM d, range(0, 47) xs, range(0, 47) ys
         |  WHERE xs.range < d.w AND ys.range < d.h),
         |cells AS (
         |  SELECT doc_id, w, h, gd,
         |    CAST(SUM((rgb // 65536) + ((rgb // 256) % 256) + (rgb % 256)) AS BIGINT) AS s
         |  FROM px GROUP BY 1, 2, 3, 4),
         |anchors(k, gd, a) AS (VALUES $anchors),
         |norms AS (SELECT k, CAST(SUM(a * a) AS BIGINT) AS nsq FROM anchors GROUP BY k),
         |dots AS (
         |  SELECT c.doc_id, c.w, c.h, an.k,
         |    CAST(SUM(c.s * an.a) AS BIGINT) AS dot
         |  FROM cells c JOIN anchors an ON an.gd = c.gd
         |  GROUP BY 1, 2, 3, 4),
         |scored AS (
         |  SELECT dt.doc_id, dt.w, dt.h, dt.k, dt.dot,
         |    row_number() OVER (PARTITION BY dt.doc_id
         |      ORDER BY dt.dot / sqrt(n.nsq) DESC, dt.k ASC) AS rn
         |  FROM dots dt JOIN norms n ON n.k = dt.k),
         |tot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS total_luma FROM cells GROUP BY 1)
         |SELECT sc.doc_id, sc.w AS width, sc.h AS height,
         |  CAST(sc.k AS INTEGER) AS cell, sc.dot AS top_dot, t.total_luma
         |FROM scored sc JOIN tot t ON t.doc_id = sc.doc_id
         |WHERE sc.rn = 1""".stripMargin
    },

    "q75_cube_agg" ->
      """SELECT lang, source, CAST(GROUPING(lang, source) AS BIGINT) AS gid,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY CUBE (lang, source)""".stripMargin,

    "q76_unpivot" ->
      """WITH w AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |    CAST(count(*) AS DOUBLE) AS n_orders,
        |    CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_custs
        |  FROM orders GROUP BY 1)
        |SELECT order_year, 'revenue' AS metric, revenue AS value FROM w
        |UNION ALL SELECT order_year, 'n_orders', n_orders FROM w
        |UNION ALL SELECT order_year, 'n_custs', n_custs FROM w""".stripMargin,

    "q74_asof_tolerance" ->
      """WITH p AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS psec
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT event_id AS v_event_id, user_id AS v_user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS vsec
        |  FROM events WHERE event_type = 'view')
        |SELECT event_id, user_id, psec, v_event_id, vsec FROM (
        |  SELECT p.event_id, p.user_id, p.psec, v.v_event_id, v.vsec,
        |         row_number() OVER (PARTITION BY p.event_id
        |           ORDER BY v.vsec DESC NULLS LAST, v.v_event_id DESC NULLS LAST) AS rn
        |  FROM p LEFT JOIN v ON p.user_id = v.v_user_id AND v.vsec <= p.psec
        |    AND v.vsec >= p.psec - 3600) q
        |WHERE rn = 1""".stripMargin,

    // q95/q96 shingle CTE: string_split keeps empty tokens exactly like
    // Spark's split(text, ' '), and array_to_string(list_slice(...), ' ')
    // reproduces concat_ws over the same slice — md5 therefore matches the
    // engine digest byte-for-byte. SELECT DISTINCT (doc_id, h) is the twin
    // of the engine's per-doc array_distinct.
    "q95_dup_passages" -> {
      val w = Extensions.PassageW
      s"""WITH tok AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    md5(array_to_string(list_slice(toks, i, i + ${w - 1}), ' ')) AS h
         |  FROM tok, unnest(generate_series(1, len(toks) - ${w - 1})) AS t(i)
         |  WHERE len(toks) >= $w)
         |SELECT h, count(*) AS df, min(doc_id) AS first_doc
         |FROM sh GROUP BY h
         |HAVING count(*) >= ${Extensions.PassageMinDocs}""".stripMargin
    },

    "q96_ngram_novelty" -> {
      val w = Extensions.PassageW
      s"""WITH tok AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    md5(array_to_string(list_slice(toks, i, i + ${w - 1}), ' ')) AS h
         |  FROM tok, unnest(generate_series(1, len(toks) - ${w - 1})) AS t(i)
         |  WHERE len(toks) >= $w),
         |per AS (SELECT doc_id, count(*) AS n_windows FROM sh GROUP BY doc_id),
         |u AS (
         |  SELECT min(doc_id) AS d FROM sh GROUP BY h HAVING count(*) = 1),
         |nv AS (SELECT d AS doc_id, count(*) AS n_novel FROM u GROUP BY d)
         |SELECT per.doc_id, per.n_windows,
         |  coalesce(nv.n_novel, 0) AS n_novel,
         |  ${r("CAST(coalesce(nv.n_novel, 0) AS DOUBLE) / per.n_windows", 4)} AS novelty
         |FROM per LEFT JOIN nv ON per.doc_id = nv.doc_id""".stripMargin
    },

    "q97_containment" -> {
      val w = Extensions.PassageW
      // sh AS MATERIALIZED is LOAD-BEARING at sf100: it is referenced
      // four times (per, live, and both sides of pr), and DuckDB
      // re-inlines plain CTEs per reference — four replays of the
      // 500 M-window DISTINCT build spilled past a 63 GB disk budget
      // even at DUCKDB_MEM=100GB. Materialized, the build runs once.
      // The posting sides join live BEFORE pairing so the pair join's
      // inputs are the ~10⁶-row rare-window postings, not the corpus.
      s"""WITH tok AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sh AS MATERIALIZED (
         |  SELECT DISTINCT doc_id,
         |    md5(array_to_string(list_slice(toks, i, i + ${w - 1}), ' ')) AS h
         |  FROM tok, unnest(generate_series(1, len(toks) - ${w - 1})) AS t(i)
         |  WHERE len(toks) >= $w),
         |per AS (SELECT doc_id, count(*) AS nw FROM sh GROUP BY doc_id),
         |live AS (
         |  SELECT h FROM sh GROUP BY h
         |  HAVING count(*) BETWEEN ${Extensions.PassageMinDocs}
         |    AND ${Extensions.ContainCap}),
         |po AS MATERIALIZED (
         |  SELECT doc_id, h FROM sh JOIN live USING (h)),
         |pr AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
         |  FROM po a JOIN po b USING (h)
         |  WHERE a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= ${Extensions.ContainMinShared})
         |SELECT pr.a_id, pr.b_id, pr.shared, pa.nw AS nw_a, pb.nw AS nw_b,
         |  ${r("CAST(pr.shared AS DOUBLE) / least(pa.nw, pb.nw)", 4)} AS containment
         |FROM pr JOIN per pa ON pr.a_id = pa.doc_id
         |JOIN per pb ON pr.b_id = pb.doc_id""".stripMargin
    },

    "q99_contamination_pairs" -> {
      val w = Extensions.PassageW
      val m = Extensions.ContamBenchMod
      // Same materialized-shingle discipline as q97 (sh referenced by
      // per, live, and both posting sides — DuckDB re-inlines plain CTEs
      // per reference).
      s"""WITH tok AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sh AS MATERIALIZED (
         |  SELECT DISTINCT doc_id,
         |    md5(array_to_string(list_slice(toks, i, i + ${w - 1}), ' ')) AS h
         |  FROM tok, unnest(generate_series(1, len(toks) - ${w - 1})) AS t(i)
         |  WHERE len(toks) >= $w),
         |per AS (SELECT doc_id, count(*) AS nw FROM sh GROUP BY doc_id),
         |live AS (
         |  SELECT h FROM sh GROUP BY h
         |  HAVING count(*) BETWEEN ${Extensions.PassageMinDocs}
         |    AND ${Extensions.ContainCap}),
         |po AS MATERIALIZED (
         |  SELECT doc_id, h FROM sh JOIN live USING (h)),
         |pr AS (
         |  SELECT tr.doc_id AS train_id, be.doc_id AS bench_id,
         |    count(*) AS shared
         |  FROM (SELECT doc_id, h FROM po WHERE doc_id % $m <> 0) tr
         |  JOIN (SELECT doc_id, h FROM po WHERE doc_id % $m = 0) be
         |  USING (h)
         |  GROUP BY 1, 2 HAVING count(*) >= ${Extensions.ContainMinShared})
         |SELECT pr.train_id, pr.bench_id, pr.shared, per.nw AS nw_train,
         |  ${r("CAST(pr.shared AS DOUBLE) / per.nw", 4)} AS contamination
         |FROM pr JOIN per ON pr.train_id = per.doc_id""".stripMargin
    },

    "q100_context_chunks" -> {
      val w = Extensions.ChunkWin
      val st = Extensions.ChunkStride
      s"""WITH d AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks FROM documents),
         |c AS (SELECT doc_id, len(toks) AS n, toks FROM d),
         |k AS (SELECT doc_id, n, toks, i FROM c,
         |  unnest(generate_series(0,
         |    GREATEST(CAST(ceil((n - $w) / $st.0) AS BIGINT), 0))) AS t(i))
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
         |  CAST(i * $st + 1 AS BIGINT) AS start_tok,
         |  CAST(LEAST($w, n - i * $st) AS BIGINT) AS n_toks,
         |  md5(array_to_string(list_slice(toks, i * $st + 1, i * $st + $w), ' ')) AS chunk_md5
         |FROM k""".stripMargin
    },
  )
}
