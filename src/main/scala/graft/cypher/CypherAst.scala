package graft.cypher

/** AST for the Cypher subset the reference actually uses (SURVEY.md §2.B,
  * Q1-Q13): MATCH/MERGE/SET/WITH/RETURN/WHERE/ORDER BY/LIMIT, node and
  * one-hop relationship patterns, property maps, named parameters, and the
  * `datetime()` scalar.
  */
object CypherAst {

  sealed trait Value
  final case class Param(name: String) extends Value
  final case class StrLit(v: String) extends Value
  final case class NumLit(v: Double, isInt: Boolean) extends Value
  final case class FnCall(name: String) extends Value // datetime()
  /** property reference on the comparison RHS, e.g. `a.link < b.link`. */
  final case class RefValue(ref: PropRef) extends Value

  final case class NodePat(variable: Option[String], label: Option[String],
    props: Map[String, Value])
  /** leftToRight: (a)-[:T]->(b) vs (a)<-[:T]-(b). Variable-length patterns
    * `-[:T*m..n]->` carry (minHops, maxHops); fixed single hop is (1, 1).
    * Bare `*` defaults to 1..5 (an unbounded expansion has no place in a
    * distributed plan — the bound is the blast-radius control). */
  final case class EdgePat(variable: Option[String], relType: Option[String],
    leftToRight: Boolean, minHops: Int = 1, maxHops: Int = 1)
  final case class PathPat(nodes: Seq[NodePat], edges: Seq[EdgePat])

  final case class PropRef(variable: String, prop: String)
  final case class Predicate(ref: PropRef, op: String, value: Value)

  sealed trait ReturnExpr
  final case class RetVar(variable: String) extends ReturnExpr
  final case class RetProp(ref: PropRef) extends ReturnExpr
  /** `count(*)` (arg None) or `count(v)` (arg Some(v)); Cypher groups
    * implicitly by every non-aggregate return item. */
  final case class RetCount(arg: Option[String]) extends ReturnExpr
  final case class ReturnItem(expr: ReturnExpr, alias: Option[String]) {
    def name: String = alias.getOrElse(expr match {
      case RetVar(v) => v
      case RetProp(PropRef(v, p)) => s"$v.$p"
      case RetCount(Some(v)) => s"count($v)"
      case RetCount(None) => "count(*)"
    })
  }
  final case class OrderItem(key: Either[String, PropRef], ascending: Boolean)

  sealed trait Statement

  /** optPaths: OPTIONAL MATCH patterns — left-join semantics, each must
    * start at a variable the mandatory paths bind. */
  final case class MatchStatement(paths: Seq[PathPat], where: Seq[Predicate],
    ret: Seq[ReturnItem], orderBy: Seq[OrderItem], limit: Option[Int],
    optPaths: Seq[PathPat] = Nil, distinct: Boolean = false) extends Statement

  sealed trait MutClause
  final case class MergeNode(pat: NodePat) extends MutClause
  final case class MergeEdge(srcVar: String, relType: String, dstVar: String) extends MutClause
  final case class SetItems(items: Seq[(PropRef, Value)]) extends MutClause
  final case class WithVars(vars: Seq[String]) extends MutClause
  final case class ReturnVars(items: Seq[ReturnItem]) extends MutClause

  final case class MutateStatement(clauses: Seq[MutClause]) extends Statement
}
