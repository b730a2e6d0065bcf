package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Bitmap-state registry: base table path → maintained block-bitmap table
  * (the [[graft.operators.Bitmaps.blockBitmaps]] layout: keys..., block,
  * bits over `idCol`). As with [[MaterializedAggRegistry]], registering
  * asserts the state is CURRENT — freshness belongs to whatever refresh
  * loop maintains the bitmaps (batch rebuild or the B155s streaming
  * processor's sink); the rewrite only exploits it. */
object BitmapStateRegistry {
  final case class Registration(basePath: String, statePath: String,
      keys: Seq[String], idCol: String)

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  def register(basePath: String, statePath: String, keys: Seq[String],
      idCol: String): Unit =
    reg.put(norm(basePath), Registration(basePath, statePath, keys, idCol))

  def unregister(basePath: String): Unit = reg.remove(norm(basePath))
  def clear(): Unit = reg.clear()
  def lookup(path: String): Option[Registration] = Option(reg.get(norm(path)))
}

/** The COUNT(DISTINCT) twin of [[MaterializedAggRewrite]] — the aggregate
  * that rule CANNOT serve, because distinct counts don't compose from
  * scalar partials. Block bitmaps DO compose (word-wise OR, B154), so an
  * `Aggregate(groupings ⊆ keys, count(DISTINCT idCol) ...)` over a
  * registered base table's file scan is answered from the maintained
  * bitmap table:
  *
  *   exact grouping  = keys: Σ popcount(bits) — blocks are disjoint rows
  *   coarser grouping:       OR-merge per (grouping, block), then
  *                           Σ popcount — the q224 re-aggregation, EXACT
  *
  * The 100 TB effect: distinct-user dashboards (per segment, per day,
  * totals) stop re-expanding the event stream per query — Spark's native
  * count-distinct plan is a two-stage re-shuffle of the raw ids EVERY
  * time — and instead read a (keys × occupied blocks) parquet.
  *
  * Safety gates (all must hold, mirroring the B112 contract): scan is
  * exactly the registered path (optionally under a pure-attribute
  * Project); every grouping expression is a bare key attribute; every
  * aggregate is count(DISTINCT idCol) with no FILTER; no Filter node in
  * between (partition pruning of the state would need predicate
  * translation — out of contract, so blocked). Original output exprIds
  * are preserved through an aliasing Project. */
class BitmapDistinctRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import BitmapStateRegistry._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      scanPath(agg.child).flatMap(lookup).flatMap(rewrite(agg, _)).getOrElse(agg)
  }

  private def scanPath(plan: LogicalPlan): Option[String] = plan match {
    case Project(ps, inner) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      scanPath(inner)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths match {
          case Seq(single) => Some(single.toString)
          case _ => None
        }
      case _ => None
    }
    case _ => None
  }

  private def rewrite(agg: Aggregate, r: Registration): Option[LogicalPlan] = {
    val keyNames = r.keys.toSet
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if keyNames(a.name) => a.name
      case _ => return None
    }
    var nDistinct = 0
    val outPlan: Seq[(NamedExpression, String)] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupNames.contains(a.name) => (a, a.name)
      case al @ Alias(ae: AggregateExpression, _)
          if ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(a: AttributeReference)) if a.name == r.idCol =>
            nDistinct += 1
            (al, "__bm0") // every count(DISTINCT id) maps to the same column
          case _ => return None
        }
      case _ => return None
    }
    if (nDistinct == 0) return None // plain aggregates belong to B112's rule
    val state = spark.read.parquet(r.statePath)
    val cnt = sum(graft.functions.BitmapExprs.bitCount(col("bits"))).as("__bm0")
    val grouped =
      if (groupNames.sorted == r.keys.sorted) {
        // fine grain: (keys, block) rows are disjoint — popcount sums directly
        state.groupBy(groupNames.map(col): _*).agg(cnt)
      } else if (groupNames.isEmpty) {
        // empty state: sum over zero rows is NULL, vanilla count(DISTINCT)
        // is 0 — coalesce so the rewrite is result-identical in that case
        state.groupBy(col("block"))
          .agg(graft.functions.BitmapExprs.bitmapMergeAgg(col("bits")).as("bits"))
          .agg(coalesce(sum(graft.functions.BitmapExprs.bitCount(col("bits"))),
            lit(0L)).as("__bm0"))
      } else {
        state.groupBy((groupNames :+ "block").map(col): _*)
          .agg(graft.functions.BitmapExprs.bitmapMergeAgg(col("bits")).as("bits"))
          .groupBy(groupNames.map(col): _*).agg(cnt)
      }
    val sub = grouped.queryExecution.optimizedPlan
    val byName = sub.output.map(a => a.name -> a).toMap
    val projections = outPlan.map { case (orig, tag) =>
      val src = byName(tag)
      val value: Expression =
        if (src.dataType == orig.dataType) src else Cast(src, orig.dataType)
      Alias(value, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
    }
    logInfo(s"graft: rewrote count-distinct over ${r.basePath} onto bitmap " +
      s"state ${r.statePath}")
    Some(Project(projections, sub))
  }
}
