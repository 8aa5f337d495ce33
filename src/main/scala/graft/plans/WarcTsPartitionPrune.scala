package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}
import java.time.{Instant, ZoneOffset}

/** The one custom optimizer rule of the engine (SURVEY.md §4.2, §7.2):
  * Iceberg-style HIDDEN partition pruning emulated over parquet.
  *
  * The manifest table stores data under `p_day=yyyy-MM-dd/` directories where
  * p_day is DERIVED from warc_ts at write time; users filter on warc_ts and
  * should never mention p_day. This rule rewrites
  *
  *   Filter(warc_ts >= L && warc_ts <= U, scan)
  *     → Filter(warc_ts >= L && warc_ts <= U && p_day >= day(L) && p_day <= day(U), scan)
  *
  * whenever the child exposes BOTH columns, letting the parquet source turn
  * the p_day conjuncts into partition-directory pruning (visible as
  * PartitionFilters in the physical scan). Conservative: day bounds are
  * inclusive on both ends, so the rewrite never drops rows; the warc_ts
  * predicate still filters exactly.
  *
  * warc_ts is interpreted in UTC (the engine pins
  * spark.sql.session.timeZone=UTC; the writer derives p_day with
  * date_format under the same session).
  */
object WarcTsPartitionPrune extends Rule[LogicalPlan] {

  private def dayOfMicros(micros: Long): String =
    Instant.EPOCH.plusNanos(micros * 1000L).atZone(ZoneOffset.UTC).toLocalDate.toString

  private def attr(child: LogicalPlan, name: String): Option[Attribute] =
    child.output.find(_.name == name)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if attr(child, "p_day").isDefined && attr(child, "warc_ts").isDefined =>
      val pDay = attr(child, "p_day").get
      val alreadyPruned = cond.references.exists(_.name == "p_day")
      if (alreadyPruned || pDay.dataType != StringType) f
      else {
        val extra = scala.collection.mutable.ArrayBuffer.empty[Expression]
        def tsLit(e: Expression): Option[Long] = e match {
          case Literal(v: Long, TimestampType) => Some(v)
          case Cast(Literal(v: Long, TimestampType), _, _, _) => Some(v)
          case _ => None
        }
        def isWarcTs(e: Expression): Boolean = e match {
          case a: Attribute => a.name == "warc_ts"
          case Cast(a: Attribute, _, _, _) => a.name == "warc_ts"
          case _ => false
        }
        splitConjuncts(cond).foreach {
          case GreaterThanOrEqual(l, r) if isWarcTs(l) && tsLit(r).isDefined =>
            extra += GreaterThanOrEqual(pDay, Literal(dayOfMicros(tsLit(r).get)))
          case GreaterThan(l, r) if isWarcTs(l) && tsLit(r).isDefined =>
            extra += GreaterThanOrEqual(pDay, Literal(dayOfMicros(tsLit(r).get)))
          case LessThanOrEqual(l, r) if isWarcTs(l) && tsLit(r).isDefined =>
            extra += LessThanOrEqual(pDay, Literal(dayOfMicros(tsLit(r).get)))
          case LessThan(l, r) if isWarcTs(l) && tsLit(r).isDefined =>
            extra += LessThanOrEqual(pDay, Literal(dayOfMicros(tsLit(r).get)))
          case EqualTo(l, r) if isWarcTs(l) && tsLit(r).isDefined =>
            extra += EqualTo(pDay, Literal(dayOfMicros(tsLit(r).get)))
          // reversed operand order (literal first)
          case GreaterThanOrEqual(r, l) if isWarcTs(l) && tsLit(r).isDefined =>
            extra += LessThanOrEqual(pDay, Literal(dayOfMicros(tsLit(r).get)))
          case LessThanOrEqual(r, l) if isWarcTs(l) && tsLit(r).isDefined =>
            extra += GreaterThanOrEqual(pDay, Literal(dayOfMicros(tsLit(r).get)))
          case _ => ()
        }
        if (extra.isEmpty) f
        else Filter(extra.foldLeft(cond)(And(_, _)), child)
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }
}

/** spark-submit registration:
  * --conf spark.sql.extensions=graft.plans.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => WarcTsPartitionPrune)
}
