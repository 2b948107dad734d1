package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** J3 — recursive filter trees (reference `convertRecordToQueryFilters`
  * graphkb.js:114-123 and the `{AND:[...]/OR:[...]}` query bodies,
  * graphkb.js:341-372, civic/therapy.js:66-77) compiled to Catalyst
  * `Column` predicates.
  *
  * The reference ships these trees to its REST API; here they compile
  * straight into the plan, so Catalyst pushes them into scans and join
  * conditions like any other predicate.
  */
object Filters {

  sealed trait Tree
  case class Eq(field: String, value: Any) extends Tree
  case class In(field: String, values: Seq[Any]) extends Tree
  case class And(children: Seq[Tree]) extends Tree
  case class Or(children: Seq[Tree]) extends Tree

  /** Record → AND-of-equalities over its defined (non-null) fields, keys
    * sorted for canonical shape (graphkb.js:117 sorts filter entries).
    */
  def fromRecord(record: Map[String, Any]): Tree =
    And(record.toSeq
      .filter(_._2 != null)
      .sortBy(_._1)
      .map { case (k, v) => Eq(k, v) })

  /** Compile to a Column predicate. Null-safe equality mirrors the
    * reference's null-padded fetch keys (K8).
    */
  def compile(tree: Tree): Column = tree match {
    case Eq(f, null) => col(f).isNull
    case Eq(f, v) => col(f) <=> lit(v)
    case In(f, vs) => col(f).isin(vs: _*)
    case And(cs) => cs.map(compile).reduceOption(_ && _).getOrElse(lit(true))
    case Or(cs) => cs.map(compile).reduceOption(_ || _).getOrElse(lit(false))
  }
}
