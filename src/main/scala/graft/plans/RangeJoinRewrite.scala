package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, AttributeReference, Cast, Divide, EqualTo, Explode,
  Expression, Floor, Greatest, If, LessThan, LessThanOrEqual, Literal,
  Or, RaiseError, Sequence, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite inner joins whose condition contains an
  * interval-containment pattern `s <= p AND p <= e` (any mix of `<`/`<=`,
  * `p` from one side, `s`/`e` from the other) into the binned range join
  * of [[graft.engine.RangeJoin]] — automatically. Without this, Spark
  * plans such theta-joins as broadcast-nested-loop or cartesian: O(|L|·|R|)
  * and the single most common accidental scale-killer in time-window SQL.
  * The rewrite replicates the interval side to its covered fixed-width
  * bins (Generate/explode over a bin sequence), stamps the point side
  * with its bin, and adds a bin-equality conjunct — turning the join
  * EQUI so the planner picks a hash join — while keeping every original
  * conjunct, so results are bit-identical: bin equality is implied by
  * containment (floor is monotone), and a point meets each replicated
  * interval in at most its own single bin, so no duplicates appear.
  *
  * OPT-IN: inactive until `spark.graft.rangejoin.binWidth` is set to a
  * positive bin width in the range columns' units (choose it near the
  * typical interval length). Replication is guarded the same way as the
  * explicit operator: an interval spanning more than
  * `spark.graft.rangejoin.maxBins` (default 1024) bins fails loudly
  * rather than silently materializing the blowup; inverted intervals
  * (e < s) replicate to one bin and (as before the rewrite) match
  * nothing. Only plain Inner joins are rewritten; the bin attributes are
  * tagged so the fixed-point optimizer batch cannot re-match its own
  * output.
  */
case class RangeJoinRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  import RangeJoinRewrite._

  private def binWidth: Option[Long] =
    Option(session.conf.get(BinWidthKey, null))
      .flatMap(v => scala.util.Try(v.toLong).toOption).filter(_ > 0)
  private def maxBins: Long =
    Option(session.conf.get(MaxBinsKey, null))
      .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(1024L)

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) if eligible(j, cond) =>
        rewrite(j, cond, w, maxBins).getOrElse(j)
    }
  }

  /** Numeric types floor-divide cleanly into bins (cast timestamps/dates
    * to epoch numbers upstream, as the explicit operator requires too).
    */
  private def binnable(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType => true
    case _ => false
  }

  private def eligible(j: Join, cond: Expression): Boolean =
    !cond.exists {
      case a: AttributeReference => a.name == PBin || a.name == IBin
      case _ => false
    }

  /** s <= p (or <): returns (lower bound side expr, point side expr). */
  private def asLe(c: Expression): Option[(Expression, Expression)] = c match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b) => Some((a, b))
    case _ => None
  }

  private def rewrite(j: Join, cond: Expression, w: Long, mb: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    val lRefs = j.left.outputSet
    val rRefs = j.right.outputSet

    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(lRefs)) Some(true)
      else if (refs.subsetOf(rRefs)) Some(false)
      else None
    }

    // Find conjuncts (s <= p, p <= e) with p one side, s/e the other.
    val bounds = conjuncts.flatMap(asLe)
    val pattern = (for {
      (s, p1) <- bounds
      (p2, e) <- bounds
      if p1.semanticEquals(p2) && !(s eq p2) && !(e eq p1)
      pSide <- sideOf(p1)
      sSide <- sideOf(s)
      eSide <- sideOf(e)
      if sSide == eSide && sSide != pSide
      if binnable(p1) && binnable(s) && binnable(e)
    } yield (p1, s, e, pSide)).headOption

    pattern.map { case (p, s, e, pointIsLeft) =>
      def bin(x: Expression): Expression =
        Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble)))

      val (pointPlan, intervalPlan) =
        if (pointIsLeft) (j.left, j.right) else (j.right, j.left)

      // Point side: project the bin alongside the original output.
      val pBinAlias = Alias(bin(p), PBin)()
      val point2 = Project(pointPlan.output :+ pBinAlias, pointPlan)

      // Interval side: replication guard (loud failure, rides a Filter so
      // pruning can't drop it), then explode the covered-bin sequence.
      // Inverted intervals collapse to one bin via Greatest — they match
      // nothing, exactly as before the rewrite.
      // AssertTrue can't be injected here — it's RuntimeReplaceable and
      // its replacement rule already ran in the finish-analysis batch —
      // so build the replacement shape directly: ok rows pass the filter,
      // a violating row raises at execution.
      val okCond = Or(LessThan(e, s),
        LessThanOrEqual(Subtract(Cast(e, DoubleType), Cast(s, DoubleType)),
          Literal(w.toDouble * mb)))
      val guard = Filter(
        If(okCond, Literal(true),
          Cast(new RaiseError(Literal(
            s"graft range-join rewrite: interval spans more than $mb bins " +
              s"of $w — raise $BinWidthKey/$MaxBinsKey or split upstream")),
            org.apache.spark.sql.types.BooleanType)),
        intervalPlan)
      val iBinAttr = AttributeReference(IBin, LongType, nullable = false)()
      // Sequence is TimeZoneAware (date sequences) — resolution requires
      // an explicit zone even for the pure-numeric form used here.
      val interval2 = Generate(
        Explode(Sequence(bin(s), Greatest(Seq(bin(e), bin(s))),
          Some(Literal(1L)), Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(iBinAttr), child = guard)

      val binEq = EqualTo(pBinAlias.toAttribute, iBinAttr)
      val (newLeft, newRight) =
        if (pointIsLeft) (point2, interval2) else (interval2, point2)
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(And(cond, binEq)), j.hint))
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}

object RangeJoinRewrite {
  val BinWidthKey = "spark.graft.rangejoin.binWidth"
  val MaxBinsKey = "spark.graft.rangejoin.maxBins"
  private[plans] val PBin = "__graft_pbin"
  private[plans] val IBin = "__graft_ibin"
}
