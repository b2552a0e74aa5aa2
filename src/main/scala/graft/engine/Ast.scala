package graft.engine

/** AST for the reference SQL dialect (SURVEY.md §2.3-§2.4, §3.1).
  *
  * The reference has no AST — it compiles the string directly into
  * executor fields (`OCommandExecutorSQLSelect.parse`,
  * `OSQLFilter.extractConditions`). We keep an explicit tree so the
  * translator to Catalyst `Column`s is a pure function of it.
  */
object Ast {

  // ---- expressions -------------------------------------------------
  sealed trait SqlExpr
  /** literal: String / Long / Double / Boolean / null */
  final case class Lit(v: Any) extends SqlExpr
  /** record id literal `10:3` (ORecordId.java:32-33) */
  final case class RidLit(clusterId: Int, pos: Long) extends SqlExpr
  /** `['European','Asiatic']` list literal (OSQLHelper.parseValue) */
  final case class ListLit(items: Seq[SqlExpr]) extends SqlExpr
  /** field path with optional method chain: `location.city.name`,
    * `name.toUpperCase().left(3)`, `any()`, `column(0)`, `@rid`,
    * `distance(x,y,1,2)` (head method = SQL function or chain op). */
  final case class Path(segs: List[Seg]) extends SqlExpr

  sealed trait Seg
  /** plain field hop */
  final case class FieldSeg(name: String) extends Seg
  /** `name(args…)` — chain method, SQL function (head position),
    * or the pseudo-fields any()/all()/column(n) */
  final case class MethodSeg(name: String, args: Seq[SqlExpr]) extends Seg
  /** `@rid @class @version @size @type @fields` (head only) */
  final case class AttrSeg(name: String) extends Seg

  // ---- conditions --------------------------------------------------
  sealed trait Cond
  final case class And(l: Cond, r: Cond) extends Cond
  final case class Or(l: Cond, r: Cond) extends Cond
  final case class Not(c: Cond) extends Cond
  /** binary comparison: = <> < <= > >= like matches in
    * containskey containsvalue containstext */
  final case class Cmp(left: SqlExpr, op: String, right: SqlExpr) extends Cond
  /** `field contains (inner)` / `containsall (inner)` — inner condition
    * evaluated against collection elements (OQueryOperatorContains) */
  final case class ContainsCond(left: Path, inner: Cond, all: Boolean) extends Cond
  /** IS [NOT] NULL */
  final case class IsNull(e: SqlExpr, negated: Boolean) extends Cond
  /** bare boolean expression used as a condition (`where active`);
    * kept distinct from an explicit `= true` so CONTAINS can tell a
    * parenthesized literal from an inner condition */
  final case class BareBool(e: SqlExpr) extends Cond
  /** `<left> traverse(start,end[,'f1,f2']) (inner)`
    * (OQueryOperatorTraverse.java:40-176) */
  final case class TraverseCond(left: Path, start: Int, end: Int,
      fields: Seq[String], inner: Cond) extends Cond

  // ---- statement ---------------------------------------------------
  sealed trait Stmt
  sealed trait Target
  final case class ClassTarget(name: String) extends Target
  final case class ClusterTarget(name: String) extends Target
  final case class RidsTarget(rids: Seq[RidLit]) extends Target
  /** `FROM fn(class, 'arg', 0.8)` — a pipeline table function (the
    * dialect surface over the SURVEY §8 operator layer; the reference
    * precedent is user-extensible SQL functions via
    * `OSQLEngine.registerFunction`, here lifted to TABLE position). */
  final case class PipelineTarget(fn: String,
      args: List[SqlExpr]) extends Target

  final case class Projection(expr: SqlExpr, alias: Option[String],
      flatten: Boolean = false)
  final case class OrderItem(expr: SqlExpr, asc: Boolean)

  final case class SelectStmt(
      projections: Seq[Projection], // empty = SELECT * (whole record)
      target: Target,
      where: Option[Cond],
      orderBy: Seq[OrderItem],
      range: Option[(RidLit, Option[RidLit])],
      limit: Option[Int]) extends Stmt

  // ---- DML (§2.9: INSERT / UPDATE SET|ADD|PUT|REMOVE / DELETE) -----
  sealed trait SetOp
  final case class SetField(field: String, value: SqlExpr) extends SetOp
  final case class AddToCollection(field: String, value: SqlExpr) extends SetOp
  final case class PutToMap(field: String, key: SqlExpr, value: SqlExpr)
      extends SetOp
  final case class RemoveFromCollection(field: String, value: Option[SqlExpr])
      extends SetOp

  final case class InsertStmt(cls: String, fields: Seq[String],
      values: Seq[SqlExpr]) extends Stmt
  final case class UpdateStmt(cls: String, ops: Seq[SetOp],
      where: Option[Cond]) extends Stmt
  final case class DeleteStmt(cls: String, where: Option[Cond]) extends Stmt

  // ---- DDL (§2.9) --------------------------------------------------
  final case class CreateClassStmt(name: String, superClass: Option[String])
      extends Stmt
  final case class RemoveClassStmt(name: String) extends Stmt
  final case class CreatePropertyStmt(cls: String, field: String,
      tpe: String, linked: Option[String]) extends Stmt
  final case class RemovePropertyStmt(cls: String, field: String) extends Stmt
  final case class CreateIndexStmt(cls: String, field: String, kind: String)
      extends Stmt
  final case class RemoveIndexStmt(cls: String, field: String) extends Stmt
  final case class CreateLinkStmt(name: Option[String], fromCls: String,
      fromField: String, toCls: String, toField: String, inverse: Boolean)
      extends Stmt
  /** GRANT/REVOKE <perm> ON <resource> TO <role> (§2.9 — role-based
    * security accepted into a thin ACL catalog, not enforced on the
    * analytic path). */
  final case class GrantStmt(perm: String, resource: String, role: String,
      revoke: Boolean) extends Stmt
}
