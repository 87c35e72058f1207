package graft.sparql

import graft.core.Term
import graft.engine.Bgp.Node

/** Abstract syntax for the SPARQL 1.1 query frontend.
  *
  * The reference keeps SPARQL in a companion engine and exposes only the BGP
  * DSL in core (`lib/rdf/query.ex:1-35` delegates everything past a basic
  * graph pattern); this frontend completes the composition story for the
  * Spark engine: query text parses to this AST, and [[Sparql]] translates
  * the AST onto the already-proven solution algebra
  * ([[graft.engine.Bgp]] execute/optional/union/minus/exists/closure) plus a
  * Column-compiled expression layer ([[SparqlExpr]]). Prefixed names and
  * relative IRIs are resolved AT PARSE TIME (the AST carries only absolute
  * [[graft.core.Term]]s), so translation needs no prologue context.
  */
object Ast {

  // ---------------------------------------------------------- property paths
  sealed trait Path
  /** A single forward predicate link. */
  final case class PLink(iri: Term) extends Path
  /** Inverse path `^p`. */
  final case class PInv(p: Path) extends Path
  /** Sequence `a/b`. */
  final case class PSeq(a: Path, b: Path) extends Path
  /** Alternative `a|b`. */
  final case class PAlt(a: Path, b: Path) extends Path
  /** Modified path `p?` / `p*` / `p+` (mod ∈ {'?','*','+'}). */
  final case class PMod(p: Path, mod: Char) extends Path
  /** Negated property set `!iri` / `!(i1|i2|...)`, forward links only. */
  final case class PNeg(iris: Seq[Term]) extends Path

  /** One triple pattern; the predicate position is either a plain node
    * (variable or bound term — the BGP engine's native shape) or a complex
    * property path. */
  final case class TP(s: Node, p: Either[Node, Path], o: Node)

  // ------------------------------------------------------------- expressions
  sealed trait Expr
  final case class EVar(name: String) extends Expr
  final case class EConst(t: Term) extends Expr
  /** Built-in or cast call; `fn` is the UPPERCASE builtin name or an
    * absolute datatype IRI (cast form `xsd:integer(?x)`). */
  final case class ECall(fn: String, args: Seq[Expr]) extends Expr
  /** Binary operator: one of `|| && = != < > <= >= + - * /`. */
  final case class EBin(op: String, l: Expr, r: Expr) extends Expr
  final case class ENot(e: Expr) extends Expr
  /** Unary numeric negation. */
  final case class ENeg(e: Expr) extends Expr
  final case class EIn(e: Expr, list: Seq[Expr], negated: Boolean) extends Expr
  final case class EExists(g: Group, negated: Boolean) extends Expr
  /** Aggregate: fn ∈ {COUNT SUM MIN MAX AVG SAMPLE GROUP_CONCAT};
    * arg None = `COUNT(*)`. */
  final case class EAgg(fn: String, distinct: Boolean, arg: Option[Expr],
                        separator: Option[String]) extends Expr

  // ----------------------------------------------------------- group pattern
  sealed trait Element
  /** A run of triple patterns (one basic graph pattern block). */
  final case class EBgp(tps: Seq[TP]) extends Element
  /** A braced sub-group `{ ... }` (scopes its own filters). */
  final case class EGroup(g: Group) extends Element
  final case class EOptional(g: Group) extends Element
  final case class EMinusG(g: Group) extends Element
  /** `{A} UNION {B} UNION {C}` — two or more alternatives. */
  final case class EUnion(alts: Seq[Group]) extends Element
  final case class EGraphG(name: Node, g: Group) extends Element
  final case class EFilter(e: Expr) extends Element
  final case class EBind(e: Expr, v: String) extends Element
  /** Inline data; `None` cells are UNDEF. */
  final case class EValues(vars: Seq[String], rows: Seq[Seq[Option[Term]]]) extends Element
  final case class ESubSelect(q: Select) extends Element

  final case class Group(elems: Seq[Element])

  // ------------------------------------------------------------------ queries
  sealed trait Query

  /** SELECT. `projection` empty means `*`; `mentionOrder` is the textual
    * first-mention order of variables (drives `*` column order). */
  final case class Select(distinct: Boolean, reduced: Boolean,
                          projection: Seq[(Expr, Option[String])],
                          where: Group,
                          groupBy: Seq[(Expr, Option[String])],
                          having: Seq[Expr],
                          orderBy: Seq[(Expr, Boolean)],
                          limit: Option[Long], offset: Option[Long],
                          mentionOrder: Seq[String]) extends Query

  final case class Ask(where: Group) extends Query

  /** A query with FROM / FROM NAMED dataset clauses: the inner query runs
    * over a dataset assembled from the data frame's named graphs —
    * default graph = RDF merge of `fromDefault`, named graphs restricted
    * to `fromNamed` (§13.2: when either clause appears, the dataset is
    * EXACTLY as specified). Only produced at the top level. */
  final case class Scoped(q: Query, fromDefault: Seq[Term],
                          fromNamed: Seq[Term]) extends Query

  /** CONSTRUCT; template bnode labels become per-solution fresh labels. */
  final case class Construct(template: Seq[(Node, Node, Node)], where: Group,
                             limit: Option[Long], offset: Option[Long]) extends Query

  /** DESCRIBE of explicit IRIs and/or variables bound by the WHERE group. */
  final case class Describe(vars: Seq[String], iris: Seq[Term],
                            where: Option[Group]) extends Query

  // ------------------------------------------------------------- update ops
  /** One template/data quad; `g` None = the default graph (or the
    * enclosing WITH graph). */
  final case class QuadPat(s: Node, p: Node, o: Node, g: Option[Node])

  sealed trait UpdateOp
  /** INSERT DATA — ground quads; bnode labels are fresh once per op. */
  final case class InsertData(quads: Seq[QuadPat]) extends UpdateOp
  /** DELETE DATA — ground quads, bnodes forbidden (spec §3.1.2). */
  final case class DeleteData(quads: Seq[QuadPat]) extends UpdateOp
  /** DELETE WHERE — the quad pattern is both the match and the template. */
  final case class DeleteWhere(quads: Seq[QuadPat]) extends UpdateOp
  /** DELETE/INSERT ... WHERE; `withGraph` is the WITH target (scopes the
    * WHERE and un-GRAPHed template quads). */
  final case class Modify(del: Seq[QuadPat], ins: Seq[QuadPat], where: Group,
                          withGraph: Option[Term]) extends UpdateOp
  /** CLEAR/DROP; target ∈ {GRAPH, DEFAULT, NAMED, ALL}. */
  final case class ClearOp(target: String, graph: Option[Term]) extends UpdateOp
  /** ADD / MOVE / COPY; None = DEFAULT graph. */
  final case class GraphCopy(op: String, from: Option[Term],
                             to: Option[Term]) extends UpdateOp

  /** A ';'-separated update request, applied left to right. */
  final case class UpdateScript(ops: Seq[UpdateOp])
}
