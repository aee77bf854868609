package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.internal.SQLConf

/** Native as-of (point-in-time, "aj") join: for every left row, attach the
  * LAST right row with the same key whose time is <= the left row's time —
  * the kdb `aj` / pandas `merge_asof` operator, which Spark's DataFrame
  * API lacks (the composed alternative is an exploding range join plus a
  * window, cf. `Scd2.pointInTimeJoin` which only works when validity
  * intervals are pre-materialized; reference analogue: the inquiry-date
  * lookups over SCD2 history, `Silver Layer.py:86-118`).
  *
  * This is the brief's custom-operator option (c): a logical node
  * ([[AsOfJoinNode]]), a planner strategy ([[AsOfJoinStrategy]], injected
  * via `graft.GraftExtensions`), and a physical operator
  * ([[AsOfJoinExec]]) that asks Catalyst for hash co-partitioning on the
  * keys and a (keys, time) sort on both sides, then streams the two sorted
  * iterators through a single forward merge pass per partition:
  * O(|L| + |R|) work, no candidate explosion, no window materialization.
  * At 100 TB this is one shuffle per side (both pruned to the join keys'
  * partitioning) and constant per-task state (one lookahead row + one
  * kept candidate) — the same scan shape as a sort-merge join but with
  * last-match-wins instead of all-matches semantics.
  *
  * Directions mirror pandas `merge_asof`: backward (default) picks the
  * last right row with time <= left time; forward picks the first with
  * time >= left time. `isLeftOuter` = true (default) keeps unmatched left
  * rows with nulls on the right payload; false drops them (inner).
  * Determinism: among right rows that share (key, time), backward keeps
  * the greatest and forward the least by `rightTies` (the caller supplies
  * a tiebreak column, e.g. a unique id), so results are stable under any
  * partitioning — required for the hash-checked oracle. Null times never
  * match: a null-time right row is skipped, a null-time left row emits
  * unmatched.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTies: Seq[Expression],
    direction: AsOfDirection = AsOfBackward,
    isLeftOuter: Boolean = true,
    tolerance: Option[Long] = None,
    allowExactMatches: Boolean = true)
  extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs at least one equi-key and matching key arity")
  require(tolerance.forall(_ >= 0), "as-of tolerance must be >= 0")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Match direction, mirroring pandas merge_asof: backward = last right row
  * with time <= left time; forward = first right row with time >= left
  * time. (Both resolve ties deterministically via the right tiebreak sort:
  * backward keeps the greatest tie, forward the least.)
  */
sealed trait AsOfDirection extends Serializable
case object AsOfBackward extends AsOfDirection
case object AsOfForward extends AsOfDirection

/** Planner rule mapping the logical as-of node to a physical operator:
  * [[BroadcastAsOfJoinExec]] when the right side's estimated size is under
  * `spark.sql.autoBroadcastJoinThreshold` (zero shuffle and zero sort on
  * the large left side — the only scalable plan when the left is 100 TB
  * and the right a dimension-sized lookup), else the co-partitioned
  * sort-merge [[AsOfJoinExec]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, ties, dir, outer, tol, exact) =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val exec =
        if (threshold > 0 && r.stats.sizeInBytes <= threshold)
          BroadcastAsOfJoinExec(lk, rk, lt, rt, ties, dir, outer, tol, exact,
            planLater(l), planLater(r))
        else
          AsOfJoinExec(lk, rk, lt, rt, ties, dir, outer, tol, exact,
            planLater(l), planLater(r))
      exec :: Nil
    case _ => Nil
  }
}

/** Numeric view of a single-column time row, for tolerance arithmetic —
  * internal representations of the supported types are numeric
  * (timestamps: microseconds; dates: days). Tolerance is therefore in the
  * column's INTERNAL unit.
  */
private[plans] object AsOfTime {
  import org.apache.spark.sql.types._
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  def asDouble(row: InternalRow, dt: DataType): Double = dt match {
    case LongType | TimestampType | TimestampNTZType => row.getLong(0).toDouble
    case IntegerType | DateType => row.getInt(0).toDouble
    case DoubleType => row.getDouble(0)
    case FloatType => row.getFloat(0).toDouble
    case ShortType => row.getShort(0).toDouble
    case ByteType => row.getByte(0).toDouble
    case other => throw new IllegalArgumentException(
      s"as-of tolerance unsupported for time type ${other.sql}")
  }
}

/** Physical sort-merge as-of join. Children are hash co-partitioned on the
  * equi-keys (Catalyst's EnsureRequirements inserts/aligns the exchanges
  * exactly as for a sort-merge join) and sorted by (keys, time[, ties]).
  * Each zipped partition pair is merged in one forward pass: the right
  * pointer advances while its key sorts below the left key or (key equal)
  * its time is <= the left time; the last advanced-over right row is the
  * match. Left rows within a key arrive in nondecreasing time order, so a
  * kept candidate stays valid until a later right row supersedes it or the
  * key changes.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTies: Seq[Expression],
    direction: AsOfDirection,
    isLeftOuter: Boolean,
    tolerance: Option[Long],
    allowExactMatches: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  require(tolerance.isEmpty || AsOfTime.supported(leftTime.dataType),
    s"as-of tolerance unsupported for time type ${leftTime.dataType.sql}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // The tiebreak columns only order the RIGHT side: sorted ascending, the
  // backward merge's last-qualifying-row-wins picks the max tie and the
  // forward merge's first-unconsumed-row-wins the min tie, deterministically.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTies)).map(SortOrder(_, Ascending)))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    // Rebind everything into locals: the zipPartitions closure must not
    // capture the SparkPlan (children hold RDD/driver state).
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val joinedOutput = output
    val forward = direction == AsOfForward
    val outer = isLeftOuter
    val tol = tolerance
    val exact = allowExactMatches
    val timeType = leftTime.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      // Bind against the NULLABLE view of the right schema: unmatched left
      // rows pair with an all-null right row, so the bound references must
      // null-check even when the right child's attributes are non-nullable.
      val resultProj = UnsafeProjection.create(
        joinedOutput, lOutput ++ rOutput.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOutput.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // Lookahead right row: valid until the next rIter.next() call
        // (shuffle/sort iterators reuse the row buffer), which only
        // happens once this row has been copied into `candidate` or
        // discarded — so no defensive copy here.
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var candidate: InternalRow = null // copy: survives rHead advances
        private var candidateKey: InternalRow = null
        private var candidateTime: InternalRow = null
        private var ready: InternalRow = null // next emitted row (inner skips)

        private def advanceRight(): Unit = {
          rHead = if (rIter.hasNext) rIter.next() else null
        }

        /** Tolerance gate on the matched pair's time distance (measured
          * toward the direction of the match; None = unbounded).
          */
        private def within(lT: InternalRow, rT: InternalRow): Boolean = tol match {
          case None => true
          case Some(t) =>
            val lv = AsOfTime.asDouble(lT, timeType)
            val rv = AsOfTime.asDouble(rT, timeType)
            (if (forward) rv - lv else lv - rv) <= t.toDouble
        }

        /** Backward: consume right rows with key < lKey or (key == lKey and
          * time <= lT), retaining the last as the (copied) candidate.
          * Forward: consume right rows with key < lKey or (key == lKey and
          * time < lT); the match is then the un-consumed rHead itself when
          * its key equals lKey (a later left row may need the same row).
          */
        private def matchFor(lKey: InternalRow, lT: InternalRow): InternalRow = {
          val lTimeNull = lT.isNullAt(0)
          var advancing = true
          while (advancing && rHead != null) {
            val rKey = rKeyProj(rHead)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              advanceRight()
            } else if (c == 0) {
              val rT = rTimeProj(rHead)
              if (rT.isNullAt(0)) {
                // Null-time right rows can never qualify for any left row.
                advanceRight()
              } else if (lTimeNull) {
                advancing = false
              } else if (!forward &&
                  (timeOrd.compare(rT, lT) < 0 ||
                    (exact && timeOrd.compare(rT, lT) == 0))) {
                candidate = rHead.copy()
                candidateKey = rKeyProj(candidate).copy()
                candidateTime = rT.copy()
                advanceRight()
              } else if (forward &&
                  (timeOrd.compare(rT, lT) < 0 ||
                    (!exact && timeOrd.compare(rT, lT) == 0))) {
                advanceRight()
              } else {
                advancing = false
              }
            } else {
              advancing = false
            }
          }
          if (lTimeNull) {
            null
          } else if (forward) {
            if (rHead != null && keyOrd.compare(rKeyProj(rHead), lKey) == 0 &&
              !rTimeProj(rHead).isNullAt(0) && within(lT, rTimeProj(rHead)))
              rHead else null
          } else {
            if (candidate != null && keyOrd.compare(candidateKey, lKey) == 0 &&
              within(lT, candidateTime))
              candidate else null
          }
        }

        private def computeNext(): Unit = {
          while (ready == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l) // projection buffer: compare before reuse
            val m = matchFor(lKey, lTimeProj(l))
            if (m != null) {
              numOutputRows += 1
              ready = resultProj(joined(l, m))
            } else if (outer) {
              numOutputRows += 1
              ready = resultProj(joined(l, nullRight))
            } // inner: skip unmatched left rows and keep scanning
          }
        }

        override def hasNext: Boolean = { computeNext(); ready != null }

        override def next(): InternalRow = {
          computeNext()
          val r = ready
          ready = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join: the right side is broadcast whole (Catalyst
  * inserts the BroadcastExchange for the required
  * [[BroadcastDistribution]]), each task builds a per-key index of
  * (time, ties)-sorted right rows from the broadcast array, and every
  * left row resolves its match with one hash lookup plus a binary search
  * on time. The left side needs NO exchange and NO sort — the operator is
  * map-only over the probe side and preserves its partitioning/ordering —
  * which at 100 TB is the difference between a full-table shuffle and a
  * scan, exactly as broadcast-hash vs sort-merge for equi-joins. The
  * per-task index build is O(|R| log |R|) on a right side already gated
  * small by the planner threshold (the BroadcastNestedLoopJoin pattern).
  *
  * Matching semantics are identical to [[AsOfJoinExec]]: the sort order
  * (time asc, ties asc) makes the greatest qualifying index the max tie
  * for backward and the least qualifying index the min tie for forward;
  * null-time right rows are dropped at index build; null-time left rows
  * emit unmatched (outer) or drop (inner).
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTies: Seq[Expression],
    direction: AsOfDirection,
    isLeftOuter: Boolean,
    tolerance: Option[Long],
    allowExactMatches: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  require(tolerance.isEmpty || AsOfTime.supported(leftTime.dataType),
    s"as-of tolerance unsupported for time type ${leftTime.dataType.sql}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Map-only over the left child: partitioning and ordering pass through.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rTies = rightTies
    val joinedOutput = output
    val forward = direction == AsOfForward
    val outer = isLeftOuter
    val tol = tolerance
    val exact = allowExactMatches
    val timeType = leftTime.dataType
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions({ lIter =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOutput)
      val rSortProj = UnsafeProjection.create(rTime +: rTies, rOutput)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val sortOrd = RowOrdering.createNaturalAscendingOrdering(
        (rTime +: rTies).map(_.dataType))
      val resultProj = UnsafeProjection.create(
        joinedOutput, lOutput ++ rOutput.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOutput.length)
      val joined = new JoinedRow

      // Per-key index over the broadcast rows: parallel arrays of the
      // 1-col time key and (time, ties) sort key (copied — projections
      // buffer-share) plus the full row (referenced — broadcast rows are
      // stable), sorted by (time, ties). Null-time rows never match:
      // dropped at build.
      final class Bucket {
        val times = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        private val sortKeys = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        def add(time: InternalRow, sortKey: InternalRow, row: InternalRow): Unit = {
          times += time; sortKeys += sortKey; rows += row
        }
        def sortInPlace(): Unit = {
          val order = sortKeys.indices.sortBy(sortKeys)(sortOrd)
          val ts = order.map(times).toArray
          val rs = order.map(rows).toArray
          times.clear(); times ++= ts
          rows.clear(); rows ++= rs
        }
      }
      val index = new java.util.HashMap[InternalRow, Bucket]()
      broadcastRows.value.foreach { raw =>
        val t = rTimeProj(raw)
        if (!t.isNullAt(0)) {
          val key = rKeyProj(raw).copy()
          var b = index.get(key)
          if (b == null) { b = new Bucket; index.put(key, b) }
          b.add(t.copy(), rSortProj(raw).copy(), raw)
        }
      }
      index.values.forEach(_.sortInPlace())

      // Backward: greatest i with times(i) <= lT (strict < when exact
      // matches are disallowed). Forward: least i with times(i) >= lT
      // (strict >). Returns -1 when no index qualifies.
      def search(b: Bucket, lT: InternalRow): Int = {
        var lo = 0
        var hi = b.times.length - 1
        var found = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val c = timeOrd.compare(b.times(mid), lT)
          val qualifies =
            if (forward) { if (exact) c >= 0 else c > 0 }
            else { if (exact) c <= 0 else c < 0 }
          if (qualifies) {
            found = mid
            if (forward) hi = mid - 1 else lo = mid + 1
          } else {
            if (forward) lo = mid + 1 else hi = mid - 1
          }
        }
        found
      }

      def within(lT: InternalRow, rT: InternalRow): Boolean = tol match {
        case None => true
        case Some(t) =>
          val lv = AsOfTime.asDouble(lT, timeType)
          val rv = AsOfTime.asDouble(rT, timeType)
          (if (forward) rv - lv else lv - rv) <= t.toDouble
      }

      lIter.flatMap { l =>
        val lT = lTimeProj(l)
        var m: InternalRow = null
        if (!lT.isNullAt(0)) {
          val b = index.get(lKeyProj(l))
          if (b != null) {
            val i = search(b, lT)
            if (i >= 0 && within(lT, b.times(i))) m = b.rows(i)
          }
        }
        if (m != null) {
          numOutputRows += 1
          Iterator.single(resultProj(joined(l, m)))
        } else if (outer) {
          numOutputRows += 1
          Iterator.single(resultProj(joined(l, nullRight)))
        } else Iterator.empty
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over [[AsOfJoinNode]]. Key/time/tiebreak columns
  * are given by NAME and resolved against each side's analyzed output
  * (keeps the API independent of Column internals and guarantees the node
  * is born resolved).
  */
object AsOf {

  /** As-of join: every `left` row picks the last `right` row with equal
    * keys and `rightTimeCol` <= `leftTimeCol` (backward, the default), or
    * the first with `rightTimeCol` >= `leftTimeCol` (forward). Ties are
    * broken by `rightTieCols` (backward keeps the greatest, forward the
    * least). `leftOuter` = false drops unmatched left rows instead of
    * null-padding. `tolerance` bounds the match's time distance in the
    * time column's INTERNAL unit (timestamps: microseconds; dates: days;
    * numerics: their own scale) — pandas merge_asof's tolerance;
    * `allowExactMatches` = false excludes equal times (strict
    * before/after). Output = left columns ++ right columns (right
    * nullable); disambiguate duplicate names before joining.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieCols: Seq[String] = Nil,
      direction: AsOfDirection = AsOfBackward,
      leftOuter: Boolean = true,
      tolerance: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def resolve(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(a => spark.sessionState.analyzer.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"as-of join: column '$name' not found on the $side side " +
            s"(have: ${plan.output.map(_.name).mkString(", ")})"))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      leftKeyCols.map(resolve(lPlan, _, "left")),
      rightKeyCols.map(resolve(rPlan, _, "right")),
      resolve(lPlan, leftTimeCol, "left"),
      resolve(rPlan, rightTimeCol, "right"),
      rightTieCols.map(resolve(rPlan, _, "right")),
      direction, leftOuter, tolerance, allowExactMatches)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }

  /** Sessions built without `graft.GraftExtensions` still plan the node:
    * the strategy is added (idempotently) through the public
    * `experimental.extraStrategies` hook — same graceful-degradation
    * contract as the function fallbacks in SimilarityFunctions.
    */
  private def ensureRegistered(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val registered =
      cs.sessionState.planner.strategies.contains(AsOfJoinStrategy) ||
        cs.experimental.extraStrategies.contains(AsOfJoinStrategy)
    if (!registered) {
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ AsOfJoinStrategy
    }
  }
}
