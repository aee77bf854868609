package graft.pipeline

import java.time.LocalDate
import scala.util.Try
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.DateDim
import graft.io.Tables

/** Silver→Gold star schema: reference parity for Notebooks/Gold Layer.py.
  *
  * Dimensions are current-snapshot projections (GL:26-80); facts are
  * date-derived and PARTITIONED BY (year, month) (GL:152-156,183-186,
  * 221-224 — the layout that gives partition pruning at scale); the two
  * aggregate tables mirror GL:260-288. fact_doctor_activity realizes the
  * reference's dead-code intent (GL:230-252) from admissions' doctor_id
  * (SURVEY.md §7.4).
  *
  * Schema-drift tolerance mirrors the reference's guards (GL:18-21,29,
  * 87-99,136-142,196-207): each table builder returns Either — Left is a
  * skip/degrade reason, logged by [[run]] instead of failing the whole
  * layer. Specifically:
  *  - a missing silver source skips the table ("Skipping X — not found");
  *  - a missing `is_current` column degrades to all rows (GL:29);
  *  - fact_billing checks its required column set and skips with the
  *    missing names (GL:136-142);
  *  - fact_vitals accepts any of several timestamp column spellings and
  *    skips when none is present (GL:196-207);
  *  - dim_date probes every (table, date-column) candidate that exists and
  *    parses (GL:87-99's try/except), falling back to 2020-01-01 (GL:101);
  *  - aggregates build only when their upstream fact built (GL:262,275).
  */
object Gold {

  def goldPath(warehouse: String, name: String): String = s"$warehouse/gold/$name"

  private def silverOpt(spark: SparkSession, warehouse: String, name: String): Either[String, DataFrame] = {
    val path = Silver.silverPath(warehouse, name)
    if (Tables.exists(spark, path)) Right(Tables.read(spark, path))
    else Left(s"source silver.$name not found")
  }

  /** GL:29: current SCD2 rows when the table is versioned, all rows when not.
    * When the table also carries `end_date` (always, for well-formed SCD2:
    * is_current ⇔ end_date IS NULL), the equivalent null test is added so
    * the filter SKIPS the closed history's files: in the
    * [[graft.io.Scd2History]] generation layout every closed file holds a
    * single non-null end_date, so its parquet null-count stat fails
    * `end_date IS NULL` and the file is pruned at the scan — gold builds
    * read only the current snapshot, never the accumulated history.
    */
  private def current(df: DataFrame): DataFrame =
    if (!df.columns.contains("is_current")) df
    else if (df.columns.contains("end_date"))
      df.filter(col("is_current") && col("end_date").isNull)
    else df.filter(col("is_current"))

  private def requireCols(df: DataFrame, table: String, required: Seq[String]): Either[String, DataFrame] = {
    val missing = required.filterNot(df.columns.contains)
    if (missing.isEmpty) Right(df)
    else Left(s"missing columns in silver.$table: ${missing.mkString(", ")}")
  }

  /** GL:26-54. */
  def dimPatient(spark: SparkSession, warehouse: String): Either[String, DataFrame] =
    silverOpt(spark, warehouse, "patients")
      .flatMap(requireCols(_, "patients",
        Seq("patient_id", "first_name", "last_name", "gender", "age", "email", "phone", "city")))
      .map(df => current(df)
        .select("patient_id", "first_name", "last_name", "gender", "age", "email", "phone", "city"))

  /** GL:57-80. */
  def dimDoctor(spark: SparkSession, warehouse: String): Either[String, DataFrame] =
    silverOpt(spark, warehouse, "doctors")
      .flatMap(requireCols(_, "doctors",
        Seq("doctor_id", "first_name", "last_name", "speciality", "experience_years")))
      .map(df => current(df)
        .select("doctor_id", "first_name", "last_name", "speciality", "experience_years"))

  /** The (table, candidate date columns) probe list, GL:90-92 — `ts` added
    * because this pipeline's silver vitals names its timestamp `ts`.
    */
  private val DateProbes: Seq[(String, Seq[String])] = Seq(
    "admissions" -> Seq("admission_date", "admission_date_key"),
    "billing" -> Seq("billing_date"),
    "procedures" -> Seq("performed_at"),
    "vitals" -> Seq("ts", "timestamp"))

  /** GL:84-125: calendar from the earliest silver date to asOf, fully
    * in-plan (the reference collects per-column mins to the driver).
    * Probes each candidate column that exists; a candidate whose type
    * cannot be read as a date is dropped (GL:96-99's try/except —
    * analysis errors via Try, runtime parse failures via try_to_date).
    * No usable candidate ⇒ the reference's 2020-01-01 fallback start.
    */
  def dimDate(spark: SparkSession, warehouse: String, asOf: LocalDate): DataFrame = {
    val starts = for {
      (table, cols) <- DateProbes
      df <- silverOpt(spark, warehouse, table).toSeq
      c <- cols.find(df.columns.contains).toSeq
      probed <- Try(current(df).select(expr(s"try_to_date(`$c`)").as("d"))).toOption.toSeq
    } yield probed
    val bounds = starts match {
      case Seq() =>
        spark.sql("SELECT date('2020-01-01') AS start") // GL:101 fallback
      case ss =>
        ss.reduce(_ unionByName _).na.drop()
          .agg(coalesce(min(col("d")), lit("2020-01-01").cast("date")).as("start"))
    }
    DateDim.withCalendarAttrs(
      bounds.withColumn("end", lit(asOf.toString).cast("date"))
        .select(explode(sequence(col("start"), col("end"))).as("date")))
  }

  /** GL:131-156. */
  def factBilling(spark: SparkSession, warehouse: String): Either[String, DataFrame] =
    silverOpt(spark, warehouse, "billing")
      .flatMap(requireCols(_, "billing",
        Seq("billing_id", "billing_date", "patient_id", "service", "amount")))
      .map(df => current(df)
        .na.drop(Seq("billing_date"))
        .select(
          col("billing_id"), col("patient_id"), col("service"), col("amount"),
          col("billing_date"),
          year(col("billing_date")).as("billing_year"),
          month(col("billing_date")).as("billing_month")))

  /** GL:160-186. */
  def factAdmissions(spark: SparkSession, warehouse: String): Either[String, DataFrame] =
    silverOpt(spark, warehouse, "admissions")
      .flatMap(requireCols(_, "admissions",
        Seq("admission_id", "patient_id", "doctor_id", "admission_date",
          "discharge_date", "reason", "room_no")))
      .map(df => current(df)
        .na.drop(Seq("admission_date"))
        .select(
          col("admission_id"), col("patient_id"), col("doctor_id"),
          col("admission_date"), col("discharge_date"), col("reason"), col("room_no"),
          datediff(col("discharge_date"), col("admission_date")).as("length_of_stay_days"),
          year(col("admission_date")).as("admission_year"),
          month(col("admission_date")).as("admission_month")))

  /** GL:196-207: accept the timestamp column under any of its spellings. */
  private val VitalsTsCandidates = Seq("ts", "timestamp", "vital_timestamp", "vital_date")

  /** GL:190-224. */
  def factVitals(spark: SparkSession, warehouse: String): Either[String, DataFrame] =
    silverOpt(spark, warehouse, "vitals").flatMap { df =>
      VitalsTsCandidates.find(df.columns.contains) match {
        case None =>
          Left(s"no timestamp column found in silver.vitals (expected one of ${VitalsTsCandidates.mkString("/")})")
        case Some(ts) =>
          Right(current(df)
            .na.drop(Seq(ts))
            .select(
              col("vital_id"), col("patient_id"),
              col(ts).cast("timestamp").as("timestamp"),
              to_date(col(ts)).as("vital_date"),
              col("heart_rate"), col("temperature"),
              year(col(ts)).as("vital_year"),
              month(col(ts)).as("vital_month")))
      }
    }

  /** GL:230-252 intent: per-doctor monthly admission activity. */
  def factDoctorActivity(spark: SparkSession, warehouse: String): Either[String, DataFrame] =
    factAdmissions(spark, warehouse).map(_
      .na.drop(Seq("doctor_id"))
      .groupBy(col("doctor_id"), col("admission_year"), col("admission_month"))
      .agg(
        count(lit(1)).as("admissions_count"),
        avg(col("length_of_stay_days")).as("avg_los_days")))

  /** GL:260-271. */
  def aggRevenueMonth(spark: SparkSession, warehouse: String): Either[String, DataFrame] =
    factBilling(spark, warehouse).map(_
      .groupBy(col("billing_year"), col("billing_month"))
      .agg(sum(col("amount")).as("total_revenue"), count(lit(1)).as("lines_count")))

  /** GL:275-288. */
  def aggAdmissionsReasonMonth(spark: SparkSession, warehouse: String): Either[String, DataFrame] =
    factAdmissions(spark, warehouse).map(_
      .groupBy(col("admission_year"), col("admission_month"), col("reason"))
      .agg(
        count(lit(1)).as("admissions_count"),
        avg(col("length_of_stay_days")).as("avg_los_days")))

  /** Register the WHOLE warehouse in the v2 catalog: after this,
    * `spark.table("<name>.gold.fact_billing")`, `"<name>.silver.doctors"`
    * etc. resolve through [[graft.catalog.PathCatalog]] — versioned dirs
    * read at their live snapshot, partitioned layouts (facts, SCD2
    * history) with partition discovery, all read-only (writes stay with
    * the sinks). One catalog name for every layer.
    */
  def registerWarehouseCatalog(spark: SparkSession, warehouse: String,
      name: String = "graft"): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.PathCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", warehouse)
  }

  /** The reference's SQL-form aggregates (GL:260-288), executed VERBATIM —
    * `CREATE OR REPLACE TABLE … AS SELECT`, with `USING parquet` standing
    * in for `USING DELTA` — against the registered
    * [[graft.catalog.PathCatalog]] (the session catalog rejects REPLACE for
    * file-source tables). Facts are exposed as temp views over the built
    * gold tables; each aggregate runs only when its upstream fact exists,
    * mirroring GL:262,275's tableExists guards. Returns skip reasons.
    */
  def runSqlAggregates(spark: SparkSession, warehouse: String,
      log: String => Unit = println): Seq[String] = {
    spark.conf.set("spark.sql.catalog.graft_gold", "graft.catalog.PathCatalog")
    spark.conf.set("spark.sql.catalog.graft_gold.warehouse", s"$warehouse/gold_sql")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_gold.gold_db")
    def runIfFact(fact: String, sql: String): Option[String] =
      if (Tables.exists(spark, goldPath(warehouse, fact))) {
        Tables.read(spark, goldPath(warehouse, fact)).createOrReplaceTempView(fact)
        spark.sql(sql)
        None
      } else {
        val msg = s"Skipping ${sql.linesIterator.next().trim} — $fact not built"
        log(msg)
        Some(msg)
      }
    Seq(
      runIfFact("fact_billing",
        // GL:262-271 verbatim (USING parquet for USING DELTA)
        """CREATE OR REPLACE TABLE graft_gold.gold_db.agg_revenue_month
          |USING parquet AS
          |SELECT
          |    billing_year,
          |    billing_month,
          |    SUM(amount) AS total_revenue,
          |    COUNT(*) AS lines_count
          |FROM fact_billing
          |GROUP BY billing_year, billing_month""".stripMargin),
      runIfFact("fact_admissions",
        // GL:275-288 verbatim
        """CREATE OR REPLACE TABLE graft_gold.gold_db.agg_admissions_reason_month
          |USING parquet AS
          |SELECT
          |    admission_year,
          |    admission_month,
          |    reason,
          |    COUNT(*) AS admissions_count,
          |    AVG(length_of_stay_days) AS avg_los_days
          |FROM fact_admissions
          |GROUP BY admission_year, admission_month, reason""".stripMargin),
    ).flatten
  }

  /** The partitioned facts, with what an incremental refresh needs to
    * know: the silver entity they derive from, the business-date column
    * that places a row in a (year, month) partition, and that partition
    * column pair.
    */
  private final case class FactSpec(
      name: String, entity: String, dateCol: String,
      yearCol: String, monthCol: String,
      build: (SparkSession, String) => Either[String, DataFrame])

  private val factSpecs = Seq(
    FactSpec("fact_billing", "billing", "billing_date",
      "billing_year", "billing_month", factBilling),
    FactSpec("fact_admissions", "admissions", "admission_date",
      "admission_year", "admission_month", factAdmissions),
    FactSpec("fact_vitals", "vitals", "ts",
      "vital_year", "vital_month", factVitals))

  /** Incremental gold refresh for the asOf load — the 100 TB fact-build
    * pattern: rebuild ONLY the (year, month) partitions the day's silver
    * delta touched, not the table. The change set is the day's expired
    * rows ([[graft.io.Scd2History.readExpiredOn]], directory-pruned) plus
    * the day's new current versions (`effective_date = asOf`); the months
    * their BUSINESS dates fall in — not the load date! a backdated
    * amendment touches last year's partition — are rebuilt from current
    * silver and dynamic-partition-overwritten in place. A month whose
    * rebuild comes back EMPTY (its last row's date was amended into a
    * different month) is deleted explicitly — dynamic overwrite only
    * replaces partitions it writes, and leaving the stale month behind
    * would resurrect the moved row.
    *
    * Facts therefore live in the PLAIN dynamic-partition layout here (the
    * per-table tradeoff [[graft.io.Tables.overwritePartitionsDynamic]]
    * documents: partition-level refresh for large facts, versioned
    * snapshots for dims/aggs); manage a given fact with EITHER [[run]]
    * (full versioned rebuild, reference parity) or this — not both.
    * Dims and the aggregate tables are current-snapshot-sized and rebuilt
    * whole, as in [[run]] (incremental AGGREGATE maintenance would need
    * mergeable partial state per month — the aggs here are small enough
    * that recomputation wins).
    */
  def runIncremental(spark: SparkSession, warehouse: String, asOf: LocalDate,
      log: String => Unit = println): Seq[String] = {
    import graft.io.Scd2History
    val asOfDate = lit(asOf.toString).cast("date")
    val factSkips = factSpecs.map { fs =>
      fs.build(spark, warehouse) match {
        case Left(reason) =>
          val msg = s"Skipping ${fs.name} — $reason"
          log(msg)
          Some(msg)
        case Right(df) =>
          val path = goldPath(warehouse, fs.name)
          val parts = Seq(fs.yearCol, fs.monthCol)
          if (!Tables.exists(spark, path)) {
            // first build: all months, same layout
            Tables.overwritePartitionsDynamic(df, path, parts)
          } else {
            val silver = Silver.silverPath(warehouse, fs.entity)
            val changed = Scd2History.readExpiredOn(spark, silver, asOf)
              .unionByName(Scd2History.readCurrent(spark, silver)
                .filter(col(graft.engine.Scd2.EffectiveDate) === asOfDate))
            val touched = changed
              .select(year(col(fs.dateCol)).as(fs.yearCol),
                month(col(fs.dateCol)).as(fs.monthCol))
              .na.drop().distinct()
              .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
            if (touched.nonEmpty) {
              val rebuilt = df.filter(touched.toSeq
                .map { case (y, m) => col(fs.yearCol) === y && col(fs.monthCol) === m }
                .reduce(_ || _))
              val nonEmpty = rebuilt
                .select(fs.yearCol, fs.monthCol).distinct()
                .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
              Tables.overwritePartitionsDynamic(rebuilt, path, parts)
              // emptied months: delete their partition dirs explicitly
              val fsys = new org.apache.hadoop.fs.Path(path)
                .getFileSystem(spark.sparkContext.hadoopConfiguration)
              (touched -- nonEmpty).foreach { case (y, m) =>
                fsys.delete(new org.apache.hadoop.fs.Path(
                  s"$path/${fs.yearCol}=$y/${fs.monthCol}=$m"), true)
              }
            }
          }
          None
      }
    }
    def build(name: String, table: Either[String, DataFrame]): Option[String] =
      table match {
        case Right(df) => Tables.overwrite(df, goldPath(warehouse, name)); None
        case Left(reason) =>
          val msg = s"Skipping $name — $reason"
          log(msg)
          Some(msg)
      }
    val rest = Seq(
      build("dim_patient", dimPatient(spark, warehouse)),
      build("dim_doctor", dimDoctor(spark, warehouse)),
      build("dim_date", Right(dimDate(spark, warehouse, asOf))),
      build("fact_doctor_activity", factDoctorActivity(spark, warehouse)),
      build("agg_revenue_month", aggRevenueMonth(spark, warehouse)),
      build("agg_admissions_reason_month", aggAdmissionsReasonMonth(spark, warehouse)),
    ).flatten
    factSkips.flatten ++ rest
  }

  /** Build all gold tables; facts keep the reference's (year, month)
    * partition layout. A table whose inputs are missing/drifted is skipped
    * with its reason logged (GL's print-and-continue), never a layer abort.
    * Returns the skip reasons (empty = everything built).
    */
  def run(spark: SparkSession, warehouse: String, asOf: LocalDate,
      log: String => Unit = println): Seq[String] = {
    def build(name: String, table: Either[String, DataFrame],
        partitionCols: Seq[String] = Nil): Option[String] = table match {
      case Right(df) =>
        if (partitionCols.isEmpty) Tables.overwrite(df, goldPath(warehouse, name))
        else Tables.overwritePartitioned(df, goldPath(warehouse, name), partitionCols)
        None
      case Left(reason) =>
        val msg = s"Skipping $name — $reason"
        log(msg)
        Some(msg)
    }
    val skipped = Seq(
      build("dim_patient", dimPatient(spark, warehouse)),
      build("dim_doctor", dimDoctor(spark, warehouse)),
      build("dim_date", Right(dimDate(spark, warehouse, asOf))),
      build("fact_billing", factBilling(spark, warehouse),
        Seq("billing_year", "billing_month")),
      build("fact_admissions", factAdmissions(spark, warehouse),
        Seq("admission_year", "admission_month")),
      build("fact_vitals", factVitals(spark, warehouse),
        Seq("vital_year", "vital_month")),
      build("fact_doctor_activity", factDoctorActivity(spark, warehouse)),
      build("agg_revenue_month", aggRevenueMonth(spark, warehouse)),
      build("agg_admissions_reason_month", aggAdmissionsReasonMonth(spark, warehouse)),
    ).flatten
    skipped
  }
}
