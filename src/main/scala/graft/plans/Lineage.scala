package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}

/** Column-level lineage from the ANALYZED logical plan: for every output
  * column, which leaf-relation columns feed it — the impact-analysis /
  * governance question ("if `l_extendedprice` changes encoding, which
  * reports move?") answered from the plan itself, so it is always in sync
  * with the code and costs no run.
  *
  * Mechanics: one bottom-up pass accumulates `ExprId → root columns`.
  * A leaf node's attributes are their own roots (`<leaf>.<name>`); every
  * `NamedExpression` above (projections, aggregates, window aliases) maps
  * its id to the union of its referenced attributes' root sets; all other
  * operators pass attribute identities through unchanged (Catalyst keeps
  * `ExprId` stable across filters/joins/sorts). Columns fabricated from
  * literals/sequences have empty root sets, which is itself the answer
  * ("derived from nothing stored").
  */
object Lineage {

  /** `output column name → set of "leafRelation.column" roots`. */
  def columns(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val roots = scala.collection.mutable.Map[ExprId, Set[String]]()

    def leafName(l: LeafNode): String = l match {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.headOption.map(_.getName).getOrElse(lr.nodeName)
          case _ => lr.nodeName
        }
      case _ => l.nodeName
    }

    def exprRoots(e: Expression): Set[String] =
      e.collect { case a: Attribute => roots.getOrElse(a.exprId, Set.empty[String]) }
        .foldLeft(Set.empty[String])(_ ++ _)

    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p match {
        case l: LeafNode =>
          l.output.foreach(a => roots(a.exprId) = Set(s"${leafName(l)}.${a.name}"))
        case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
          // union output ids may be fresh: each output column derives from
          // the SAME position in every branch
          u.output.zipWithIndex.foreach { case (a, i) =>
            roots(a.exprId) = u.children
              .flatMap(c => roots.getOrElse(c.output(i).exprId, Set.empty[String]))
              .toSet ++ roots.getOrElse(a.exprId, Set.empty[String])
          }
        case other =>
          other.expressions.foreach { e =>
            e.foreach {
              case ne: NamedExpression if !ne.isInstanceOf[Attribute] =>
                roots(ne.exprId) = exprRoots(ne)
              case _ => ()
            }
          }
      }
    }
    walk(plan)
    plan.output.map(a => a.name -> roots.getOrElse(a.exprId, Set.empty[String])).toMap
  }
}
