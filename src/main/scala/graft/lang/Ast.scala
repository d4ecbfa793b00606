package graft.lang

/** Untyped AST for the navigational language — the analogue of the
  * reference's `Syntax` tree (`src/htsql/core/syn/syntax.py`). Flow
  * operations (sieve/selection/quotient/locator/composition) and scalar
  * expressions share one node space; the binder assigns meaning, exactly as
  * the reference defers semantics to `tr/bind.py`.
  */
sealed trait Ast {
  /** Source offset of the token that introduced this node, −1 when the node
    * was synthesized by the binder (rewrites, wildcard expansion). Held
    * OUTSIDE the case-class fields so structural equality ignores positions:
    * the planner keys maps on expression structure (e.g. quotient kernels
    * matched against selection items parsed from different offsets).
    */
  private[this] var _pos: Int = -1
  def pos: Int = _pos
  def at(p: Int): this.type = { _pos = p; this }
}

object Ast {
  final case class NumberLit(value: String) extends Ast
  final case class StringLit(value: String) extends Ast
  final case class Ident(name: String) extends Ast
  /** `$name` reference to a definition in an enclosing scope. */
  final case class Ref(name: String) extends Ast
  /** `base . member` composition/navigation. */
  final case class Compose(base: Ast, member: Ast) extends Ast
  /** `f(args…)` function application (also desugared infix operators). */
  final case class Apply(name: String, args: Seq[Ast]) extends Ast
  /** `base ? predicate` sieve. */
  final case class Sieve(base: Ast, pred: Ast) extends Ast
  /** `base ^ kernel` quotient. */
  final case class Quotient(base: Ast, kernels: Seq[Ast]) extends Ast
  /** `^` — complement reference inside a quotient scope. A case class (not
    * an object) so each occurrence carries its own source position; all
    * instances stay structurally equal.
    */
  final case class Complement() extends Ast
  /** `base {items}` selection. */
  final case class Select(base: Ast, items: Seq[Item]) extends Ast
  /** `base [id1.id2…]` identity locator. */
  final case class Locator(base: Ast, ids: Seq[String]) extends Ast
  /** `base .sort(keys)` */
  final case class SortOp(base: Ast, keys: Seq[SortKey]) extends Ast
  /** `base .limit(n [, skip])` */
  final case class LimitOp(base: Ast, n: Int, skip: Int) extends Ast
  /** `define(name := expr, …)` attached to a flow. */
  final case class DefineOp(base: Ast, defs: Seq[(String, Ast)]) extends Ast

  /** `/link{…}` nested segment inside a selection — plural child rows
    * rendered as a list-of-records column (ListDomain(RecordDomain) output).
    */
  final case class Segment(flow: Ast) extends Ast

  /** Selection item: expression with optional alias (`alias := expr`) and
    * optional sort direction decorator (`expr+` / `expr-`).
    */
  // `alias` is the `name :=` scope binding; `title` is the `:as` output
  // header. They are DISTINCT (reference: the as() decorator in
  // src/htsql/core/tr/fn/bind.py only retitles the column — the := name
  // stays referenceable by later sieves/sorts).
  final case class Item(expr: Ast, alias: Option[String], direction: Option[Boolean],
                        title: Option[String] = None)
  final case class SortKey(expr: Ast, ascending: Boolean)
}
