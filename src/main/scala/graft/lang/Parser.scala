package graft.lang

import Ast._

final class ParseError(msg: String, val pos: Int) extends RuntimeException(s"$msg at position $pos")

/** Recursive-descent / operator-precedence parser for the navigational
  * language — the analogue of `src/htsql/core/syn/parse.py` over the
  * grammar in `src/htsql/core/syn/grammar.py`.
  *
  * Flow pipeline (applied left-to-right, loosest level):
  *   `/table ?pred ^kernel {items} [ids] .member .sort(k) .limit(n,m)`
  * Scalar expressions use conventional precedence:
  *   `| & ! (cmp: = != == !== < <= > >= ~ !~) (+ -) (* /) unary- postfix.`
  */
object Parser {

  def parse(input: String): Ast = {
    val p = new Parser(Lexer.tokenize(input), input)
    p.parseQuery()
  }

  /** Parse a COMMAND: a query plus an optional trailing format decorator
    * `/:json` / `/:csv` / `/:html` / `/:xml` / `/:txt` (reference: format
    * summons in `src/htsql/core/cmd/summon.py` — the decorator belongs to
    * the language, not to whoever strips suffixes off the string).
    */
  def parseCommand(input: String): (Ast, Option[String]) = {
    val p = new Parser(Lexer.tokenize(input), input)
    p.parseCommandQuery()
  }

  /** Parse an ETL command program (the POST surface — upstream invokes
    * `tweak.etl`'s insert/update/delete/merge/do through the same
    * produce() path as reads): `/do(insert(t := {c := v}), delete(t[id]))`
    * plus an optional trailing `/:fmt` decorator, same as queries.
    */
  def parseEtl(input: String): (Ast, Option[String]) = {
    val p = new Parser(Lexer.tokenize(input), input)
    p.parseEtlProgram()
  }
}

private final class Parser(tokens: Vector[Token], input: String) {
  private var pos = 0

  private def cur: Token = tokens(pos)
  private def advance(): Token = { val t = cur; pos += 1; t }

  private def isOp(v: String): Boolean = cur match {
    case Token.Op(`v`, _) => true
    case _ => false
  }
  private def eatOp(v: String): Unit =
    if (isOp(v)) pos += 1
    else throw new ParseError(s"expected '$v' but found ${describe(cur)}", cur.pos)

  private def describe(t: Token): String = t match {
    case Token.Ident(v, _) => s"identifier '$v'"
    case Token.Num(v, _) => s"number '$v'"
    case Token.Str(v, _) => s"string '$v'"
    case Token.Op(v, _) => s"'$v'"
    case Token.End(_) => "end of query"
  }

  def parseQuery(): Ast = parseCommandQuery() match {
    case (flow, None) => flow
    case (_, Some(fmt)) =>
      throw new ParseError(s"format decorator ':$fmt' is not allowed here", cur.pos)
  }

  def parseCommandQuery(): (Ast, Option[String]) = {
    eatOp("/")
    val flow = parsePipeline()
    // trailing `/:fmt` format decorator (`/:` lexes as one token)
    val fmt = cur match {
      case Token.Op("/:", _) => advance(); Some(parseIdent())
      case _ => None
    }
    cur match {
      case Token.End(_) => (flow, fmt)
      case t => throw new ParseError(s"unexpected ${describe(t)} after query", t.pos)
    }
  }

  // ---- flow pipeline ----------------------------------------------------

  /** ETL command program: one write command (or a `do(...)` of several),
    * then an optional `/:fmt`. Commands are a separate top-level grammar —
    * `:=` in command position assigns a RECORD to a flow target, which the
    * query grammar has no scalar position for.
    *
    *   command := do '(' command (',' command)* ')'
    *            | (insert|merge) '(' table ':=' record ')'
    *            | update '(' target ':=' record ')'
    *            | delete '(' target ')'
    *   target  := table | table '[' ids ']' | table '?' predicate
    *   record  := '{' name ':=' scalar (',' name ':=' scalar)* '}'
    */
  def parseEtlProgram(): (Ast, Option[String]) = {
    eatOp("/")
    val cmd = parseEtlCmd()
    val fmt = cur match {
      case Token.Op("/:", _) => advance(); Some(parseIdent())
      case _ => None
    }
    cur match {
      case Token.End(_) => (cmd, fmt)
      case t => throw new ParseError(s"unexpected ${describe(t)} after command", t.pos)
    }
  }

  private def parseEtlCmd(): Ast = cur match {
    case Token.Ident("do", p) =>
      advance(); eatOp("(")
      val cmds = Seq.newBuilder[Ast]
      var more = true
      while (more) {
        cmds += parseEtlCmd()
        if (isOp(",")) advance() else more = false
      }
      eatOp(")")
      Apply("__etl_do", cmds.result()).at(p)
    case Token.Ident(op, p) if op == "insert" || op == "merge" || op == "update" =>
      advance(); eatOp("(")
      val target = parsePipeline()
      eatOp(":=")
      val rec = parseEtlRecord()
      eatOp(")")
      Apply(s"__etl_$op", Seq(target, rec)).at(p)
    case Token.Ident("delete", p) =>
      advance(); eatOp("(")
      val target = parsePipeline()
      eatOp(")")
      Apply("__etl_delete", Seq(target)).at(p)
    case t =>
      throw new ParseError(
        s"expected an ETL command (insert/update/delete/merge/do) but found ${describe(t)}", t.pos)
  }

  private def parseEtlRecord(): Ast = {
    val p = cur.pos
    eatOp("{")
    val defs = Seq.newBuilder[Ast]
    var more = true
    while (more) {
      val np = cur.pos
      val name = parseIdent()
      eatOp(":=")
      defs += Apply("__def", Seq(StringLit(name).at(np), parseScalar())).at(np)
      if (isOp(",")) advance() else more = false
    }
    eatOp("}")
    Apply("__record", defs.result()).at(p)
  }

  def parsePipeline(): Ast = {
    var flow = parsePrimaryFlow()
    var continue = true
    while (continue) {
      cur match {
        case Token.Op("?", p) =>
          advance(); flow = Sieve(flow, parseScalar()).at(p)
        case Token.Op("^", p) =>
          advance()
          if (isOp("{")) { advance(); val items = parseItems("}"); flow = Quotient(flow, items.map(_.expr)).at(p) }
          else flow = Quotient(flow, Seq(parseScalar())).at(p)
        case Token.Op("{", p) =>
          advance(); flow = Select(flow, parseItems("}")).at(p)
        case Token.Op("[", p) =>
          advance(); flow = Locator(flow, parseLocatorIds()).at(p)
        case Token.Op(".", _) =>
          advance(); flow = parseFlowMember(flow)
        case _ => continue = false
      }
    }
    flow
  }

  private def parsePrimaryFlow(): Ast = cur match {
    case Token.Ident(name, p) =>
      advance()
      // `/count(region)` — a top-level scalar aggregate over the ROOT scope
      if (isOp("(")) { advance(); Apply(name, parseArgs()).at(p) }
      else Ident(name).at(p)
    // `/{…}` — selection in the ROOT scope (no table axis); the pipeline
    // loop consumes the braces as a Select over the root marker
    case Token.Op("{", p) => Ident("__root__").at(p)
    case Token.Op("(", _) => advance(); val inner = parsePipeline(); eatOp(")"); inner
    case t => throw new ParseError(s"expected a table or '(' but found ${describe(t)}", t.pos)
  }

  /** Member after `.` at flow level: navigation, or the flow methods
    * sort/limit/define.
    */
  private def parseFlowMember(base: Ast): Ast = cur match {
    case Token.Ident("sort", p) =>
      advance(); eatOp("("); val keys = parseSortKeys(); eatOp(")"); SortOp(base, keys).at(p)
    case Token.Ident("limit", p) =>
      advance(); eatOp("(")
      val n = parseIntLit()
      val skip = if (isOp(",")) { advance(); parseIntLit() } else 0
      eatOp(")")
      LimitOp(base, n, skip).at(p)
    case Token.Ident("define", p) =>
      advance(); eatOp("(")
      val defs = Seq.newBuilder[(String, Ast)]
      var more = true
      while (more) {
        val name = parseIdent()
        eatOp(":=")
        defs += name -> parseScalar()
        if (isOp(",")) advance() else more = false
      }
      eatOp(")")
      DefineOp(base, defs.result()).at(p)
    case Token.Ident(name, p) =>
      advance()
      if (isOp("(")) { advance(); val args = parseArgs(); Compose(base, Apply(name, args).at(p)).at(p) }
      else Compose(base, Ident(name).at(p)).at(p)
    // parenthesized group after `.` at flow level: `/nation.(customer?pred)`
    case Token.Op("(", p) =>
      advance(); val inner = parsePipeline(); eatOp(")")
      Compose(base, inner).at(p)
    case t => throw new ParseError(s"expected member name after '.' but found ${describe(t)}", t.pos)
  }

  private def parseIntLit(): Int = cur match {
    case Token.Num(v, _) if !v.contains('.') => advance(); v.toInt
    case t => throw new ParseError(s"expected integer but found ${describe(t)}", t.pos)
  }

  private def parseIdent(): String = cur match {
    case Token.Ident(v, _) => advance(); v
    case t => throw new ParseError(s"expected identifier but found ${describe(t)}", t.pos)
  }

  private def parseLocatorIds(): Seq[String] = {
    val ids = Seq.newBuilder[String]
    var more = true
    while (more) {
      cur match {
        case Token.Num(v, _) =>
          advance()
          // `[3.2]` lexes as the number 3.2 — dots separate identity fields
          ids ++= v.split('.')
        case Token.Str(v, _) => advance(); ids += v
        case Token.Ident(v, _) => advance(); ids += v
        case t => throw new ParseError(s"expected identity value but found ${describe(t)}", t.pos)
      }
      if (isOp(".")) advance() else more = false
    }
    eatOp("]")
    ids.result()
  }

  // ---- selection items / sort keys -------------------------------------

  private def parseItems(close: String): Seq[Item] = {
    val items = Seq.newBuilder[Item]
    if (!isOp(close)) {
      var more = true
      while (more) {
        items += parseItem()
        if (isOp(",")) advance() else more = false
      }
    }
    eatOp(close)
    items.result()
  }

  private def parseItem(): Item = {
    // nested segment: `/link{…}` inside a selection
    if (isOp("/")) {
      val p = cur.pos
      advance()
      return Item(Segment(parsePipeline()).at(p), None, None)
    }
    // wildcard `*`: all columns of the current scope (BindWildcard)
    if (isOp("*")) {
      val p = cur.pos
      advance()
      return Item(Ident("*").at(p), None, None)
    }
    // alias := expr
    val alias = (cur, tokens.lift(pos + 1)) match {
      case (Token.Ident(name, _), Some(Token.Op(":=", _))) =>
        advance(); advance(); Some(name)
      case _ => None
    }
    val expr = parseScalar()
    var direction: Option[Boolean] = cur match {
      case Token.Op("+", _) if peekIsItemEnd(1) => advance(); Some(true)
      case Token.Op("-", _) if peekIsItemEnd(1) => advance(); Some(false)
      case _ => None
    }
    // `:as title` decorator (reference: the `as()` decorator in
    // src/htsql/core/tr/fn/bind.py — sets the output column title ONLY);
    // the title may be a quoted string or a bare identifier. An `alias :=`
    // prefix keeps its scope binding alongside the title. A direction
    // decorator composes on either side.
    val title = cur match {
      case Token.Op(":", _) =>
        tokens.lift(pos + 1) match {
          case Some(Token.Ident("as", _)) =>
            advance(); advance()
            cur match {
              case Token.Str(s, p) => advance(); Some(s)
              case Token.Ident(n, p) => advance(); Some(n)
              case other => throw new ParseError(
                ":as needs a title (string or identifier)", other.pos)
            }
          case _ => None
        }
      case _ => None
    }
    if (direction.isEmpty) direction = cur match {
      case Token.Op("+", _) if peekIsItemEnd(1) => advance(); Some(true)
      case Token.Op("-", _) if peekIsItemEnd(1) => advance(); Some(false)
      case _ => None
    }
    Item(expr, alias, direction, title)
  }


  private def parseSortKeys(): Seq[SortKey] = {
    val keys = Seq.newBuilder[SortKey]
    var more = true
    while (more) {
      val expr = parseScalar()
      val asc = cur match {
        case Token.Op("+", _) if peekIsItemEnd(1) => advance(); true
        case Token.Op("-", _) if peekIsItemEnd(1) => advance(); false
        case _ => true
      }
      keys += SortKey(expr, asc)
      if (isOp(",")) advance() else more = false
    }
    keys.result()
  }

  private def peekIsItemEnd(offset: Int): Boolean = tokens.lift(pos + offset) match {
    case Some(Token.Op(",", _)) | Some(Token.Op("}", _)) | Some(Token.Op(")", _)) => true
    // a `:as` title decorator also ends the item expression, so a trailing
    // +/- before it reads as a direction decorator, not binary arithmetic
    case Some(Token.Op(":", _)) =>
      tokens.lift(pos + offset + 1) match {
        case Some(Token.Ident("as", _)) => true
        case _ => false
      }
    case _ => false
  }

  // ---- scalar expressions (Pratt) ---------------------------------------

  def parseScalar(): Ast = parseOr()

  private def parseOr(): Ast = {
    var e = parseAnd()
    while (isOp("|")) { val p = cur.pos; advance(); e = Apply("or", Seq(e, parseAnd())).at(p) }
    e
  }

  private def parseAnd(): Ast = {
    var e = parseNot()
    while (isOp("&")) { val p = cur.pos; advance(); e = Apply("and", Seq(e, parseNot())).at(p) }
    e
  }

  private def parseNot(): Ast =
    if (isOp("!")) { val p = cur.pos; advance(); Apply("not", Seq(parseNot())).at(p) }
    else parseCmp()

  private val cmpOps = Set("=", "!=", "==", "!==", "<", "<=", ">", ">=", "~", "!~")

  private def parseCmp(): Ast = {
    val e = parseAdd()
    cur match {
      case Token.Op(op, p) if cmpOps(op) =>
        advance(); Apply(op, Seq(e, parseAdd())).at(p)
      case _ => e
    }
  }

  private def parseAdd(): Ast = {
    var e = parseMul()
    var continue = true
    while (continue) {
      cur match {
        // a trailing +/- immediately before , } ) is a direction decorator
        // for the enclosing item list — leave it for the caller
        case Token.Op("+", p) if !peekIsItemEnd(1) => advance(); e = Apply("+", Seq(e, parseMul())).at(p)
        case Token.Op("-", p) if !peekIsItemEnd(1) => advance(); e = Apply("-", Seq(e, parseMul())).at(p)
        case _ => continue = false
      }
    }
    e
  }

  private def parseMul(): Ast = {
    var e = parseUnary()
    var continue = true
    while (continue) {
      cur match {
        case Token.Op("*", p) => advance(); e = Apply("*", Seq(e, parseUnary())).at(p)
        case Token.Op("/", p) => advance(); e = Apply("/", Seq(e, parseUnary())).at(p)
        case _ => continue = false
      }
    }
    e
  }

  private def parseUnary(): Ast =
    if (isOp("-")) { val p = cur.pos; advance(); Apply("neg", Seq(parseUnary())).at(p) }
    else parsePostfix()

  private def parsePostfix(): Ast = {
    var e = parseAtom()
    // literals don't navigate: `400000.sort(...)` must leave `.sort` to the
    // enclosing flow pipeline rather than compose onto the number
    e match {
      case NumberLit(_) | StringLit(_) => return e
      case _ =>
    }
    var continue = true
    while (continue) {
      cur match {
        case Token.Op(".", _) =>
          advance()
          val p = cur.pos
          // parenthesized group after `.`: `customer.(orders?pred)` binds
          // the sieve to the RIGHT-hand hop before composing (a sieve
          // after the spine would filter the composed flow instead)
          if (isOp("(")) {
            advance(); val inner = parseScalar(); eatOp(")")
            e = Compose(e, inner).at(p)
          } else {
          val name = parseIdent()
          // flow methods are recognized here too so `top(orders.sort(x-), 2)`
          // keeps direction decorators and produces proper SortOp nodes
          if (name == "sort" && isOp("(")) {
            advance(); val keys = parseSortKeys(); eatOp(")"); e = SortOp(e, keys).at(p)
          } else if (name == "limit" && isOp("(")) {
            advance()
            val n = parseIntLit()
            val skip = if (isOp(",")) { advance(); parseIntLit() } else 0
            eatOp(")")
            e = LimitOp(e, n, skip).at(p)
          } else if (isOp("(")) { advance(); e = Compose(e, Apply(name, parseArgs()).at(p)).at(p) }
          else e = Compose(e, Ident(name).at(p)).at(p)
          }
        case Token.Op("?", p) =>
          // sieve on a plural flow inside an aggregate: count(orders?p)
          advance(); e = Sieve(e, parseScalar()).at(p)
        case _ => continue = false
      }
    }
    e
  }

  private def parseArgs(): Seq[Ast] = {
    val args = Seq.newBuilder[Ast]
    if (!isOp(")")) {
      var more = true
      while (more) {
        args += parseArg()
        if (isOp(",")) advance() else more = false
      }
    }
    eatOp(")")
    args.result()
  }

  /** A call argument may be a scoped definition `name := expr` (or
    * `$name := expr`) — used by `given()` — otherwise a scalar expression.
    */
  private def parseArg(): Ast = {
    def assignAt(off: Int): Boolean = tokens.lift(pos + off) match {
      case Some(Token.Op(":=", _)) => true
      case _ => false
    }
    (cur, tokens.lift(pos + 1)) match {
      case (Token.Ident(name, p), _) if assignAt(1) =>
        advance(); advance()
        Apply("__def", Seq(StringLit(name).at(p), parseScalar())).at(p)
      case (Token.Op("$", p0), Some(Token.Ident(name, p))) if assignAt(2) =>
        advance(); advance(); advance()
        Apply("__def", Seq(StringLit(name).at(p), parseScalar())).at(p0)
      case _ => parseScalar()
    }
  }

  private def parseAtom(): Ast = cur match {
    case Token.Num(v, p) => advance(); NumberLit(v).at(p)
    case Token.Str(v, p) => advance(); StringLit(v).at(p)
    case Token.Op("^", p) => advance(); Complement().at(p)
    case Token.Op("$", p) => advance(); Ref(parseIdent()).at(p)
    // `@table` — detach: evaluate the flow from the ROOT scope, not the
    // current row's scope (reference: AttachSpace / the home class)
    case Token.Op("@", p) =>
      advance()
      val ip = cur.pos
      Apply("@", Seq(Ident(parseIdent()).at(ip))).at(p)
    case Token.Op("(", _) =>
      advance()
      val first = parseScalar()
      if (isOp(",")) {
        // parenthesized list: `x = ('a','b','c')` is HTSQL's IN idiom
        val items = Seq.newBuilder[Ast]
        items += first
        while (isOp(",")) { advance(); items += parseScalar() }
        eatOp(")")
        Apply("__list", items.result()).at(first.pos)
      } else { eatOp(")"); first }
    case Token.Ident(name, p) =>
      advance()
      if (isOp("(")) { advance(); Apply(name, parseArgs()).at(p) }
      else Ident(name).at(p)
    case t => throw new ParseError(s"unexpected ${describe(t)}", t.pos)
  }
}
