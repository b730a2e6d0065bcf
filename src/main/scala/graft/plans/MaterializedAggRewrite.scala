package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Materialized-aggregate registry: base table path → maintained state
  * table (the [[graft.operators.Incremental]] contract: per-(keys) partials
  * n_docs / sum_chars / min_chars / max_chars over `valueCol`, kept
  * current by `refreshState`). Registering a pair asserts the state IS
  * current — the freshness contract belongs to the refresh loop, the
  * rewrite only exploits it. */
object MaterializedAggRegistry {
  final case class Registration(basePath: String, statePath: String,
      keys: Seq[String], valueCol: String)

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  def register(basePath: String, statePath: String, keys: Seq[String],
      valueCol: String): Unit =
    reg.put(norm(basePath), Registration(basePath, statePath, keys, valueCol))

  def unregister(basePath: String): Unit = reg.remove(norm(basePath))
  def clear(): Unit = reg.clear()
  def lookup(path: String): Option[Registration] = Option(reg.get(norm(path)))
}

/** The query-rewrite half of incremental aggregate maintenance (B58): an
  * optimizer rule that recognizes `Aggregate(groupings ⊆ keys,
  * {count(1) | sum(valueCol) | min(valueCol) | max(valueCol)})` over a
  * registered base table's file scan and answers it from the maintained
  * state table instead — count becomes Σ n_docs, sum becomes Σ sum_chars,
  * min/max re-minimize the partials. The 100 TB effect: a monitoring
  * dashboard's rollups stop scanning the corpus entirely; they read a
  * keys-cardinality parquet.
  *
  * Safety gates (no rewrite unless ALL hold): scan is exactly the
  * registered path (optionally under a pure-attribute Project); every
  * grouping expression is a bare key attribute; every aggregate is one of
  * the four mapped forms with no DISTINCT and no FILTER. Output
  * attributes keep the ORIGINAL exprIds through an aliasing Project, so
  * parents of the rewritten Aggregate never notice the swap. */
class MaterializedAggRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import MaterializedAggRegistry._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      scanPath(agg.child).flatMap(lookup).flatMap(rewrite(agg, _)).getOrElse(agg)
  }

  /** The registered path of the child scan, if the child is a plain file
    * scan (or a column-pruning Project over one). */
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
    // map each output position to either a grouping key or a state-side
    // aggregate Column; bail on anything outside the contract
    val stateAggs = scala.collection.mutable.ArrayBuffer.empty[(String, org.apache.spark.sql.Column)]
    val outPlan: Seq[(NamedExpression, String)] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupNames.contains(a.name) => (a, a.name)
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val mapped: org.apache.spark.sql.Column = ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null => sum(col("n_docs"))
          case Sum(a: AttributeReference, _) if a.name == r.valueCol =>
            sum(col("sum_chars"))
          case Min(a: AttributeReference) if a.name == r.valueCol =>
            min(col("min_chars"))
          case Max(a: AttributeReference) if a.name == r.valueCol =>
            max(col("max_chars"))
          case _ => return None
        }
        val tag = s"__mv${stateAggs.length}"
        stateAggs += tag -> mapped.as(tag)
        (al, tag)
      case _ => return None
    }
    val state = spark.read.parquet(r.statePath)
    val grouped =
      if (stateAggs.isEmpty) state.select(groupNames.map(col): _*).distinct()
      else if (groupNames.isEmpty)
        state.agg(stateAggs.head._2, stateAggs.tail.map(_._2).toSeq: _*)
      else state.groupBy(groupNames.map(col): _*)
        .agg(stateAggs.head._2, stateAggs.tail.map(_._2).toSeq: _*)
    val sub = grouped.queryExecution.optimizedPlan
    val byName = sub.output.map(a => a.name -> a).toMap
    // re-alias to the ORIGINAL output attributes (names + exprIds) so the
    // parent plan's references stay valid
    val projections = outPlan.map { case (orig, tag) =>
      val src = byName(tag)
      val value: Expression =
        if (src.dataType == orig.dataType) src else Cast(src, orig.dataType)
      Alias(value, orig.name)(exprId = orig.exprId,
        qualifier = orig.qualifier)
    }
    logInfo(s"graft: rewrote aggregate over ${r.basePath} onto maintained " +
      s"state ${r.statePath}")
    Some(Project(projections, sub))
  }
}
