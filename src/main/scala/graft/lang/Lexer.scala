package graft.lang

/** Tokenizer for the navigational query language.
  *
  * Mirrors the reference's operator-precedence scanner
  * (`src/htsql/core/syn/scan.py`, token classes in
  * `src/htsql/core/syn/token.py`): identifiers, number/string literals, and
  * the sigil set `/ . { } ( ) [ ] ? ^ , := :` plus the operator table.
  * Hand-rolled (no parser-combinator dependency) and allocation-light.
  */
sealed trait Token { def pos: Int }
object Token {
  final case class Ident(value: String, pos: Int) extends Token
  final case class Num(value: String, pos: Int) extends Token
  final case class Str(value: String, pos: Int) extends Token
  final case class Op(value: String, pos: Int) extends Token
  final case class End(pos: Int) extends Token
}

final class LexError(msg: String, val pos: Int) extends RuntimeException(s"$msg at position $pos")

object Lexer {
  // longest-match-first operator table (reference: symbols recognized by
  // scan.py's grammar rules)
  private val operators = Seq(
    ":=", "!==", "==", "!=", "<=", ">=", "!~", "->",
    // `/:` is ONE token (the format-decorator marker): lexing it whole
    // removes the division-vs-decorator ambiguity in `…?x=0/:json`, where
    // the scalar parser would otherwise read `0/` as arithmetic
    "/:",
    "/", ".", "{", "}", "(", ")", "[", "]", "?", "^", ",", ":",
    "+", "-", "*", "=", "<", ">", "~", "&", "|", "!", "$", "@"
  )

  def tokenize(input: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        out += Token.Ident(input.substring(start, i), start)
      } else if (c.isDigit) {
        val start = i
        while (i < n && (input(i).isDigit)) i += 1
        // decimal part — but a '.' followed by a letter is navigation, and
        // inside a locator `[3.2]` the dot separates identity fields; the
        // parser decides. Lexer takes digits '.' digits as one number only
        // when the dot is followed by a digit.
        if (i + 1 < n && input(i) == '.' && input(i + 1).isDigit) {
          i += 1
          while (i < n && input(i).isDigit) i += 1
        }
        if (i < n && (input(i) == 'e' || input(i) == 'E')) {
          val mark = i
          i += 1
          if (i < n && (input(i) == '+' || input(i) == '-')) i += 1
          if (i < n && input(i).isDigit) { while (i < n && input(i).isDigit) i += 1 }
          else i = mark
        }
        out += Token.Num(input.substring(start, i), start)
      } else if (c == '\'') {
        val start = i
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          if (input(i) == '\'') {
            if (i + 1 < n && input(i + 1) == '\'') { sb += '\''; i += 2 } // '' escape
            else { closed = true; i += 1 }
          } else { sb += input(i); i += 1 }
        }
        if (!closed) throw new LexError("unterminated string literal", start)
        out += Token.Str(sb.toString, start)
      } else {
        operators.find(op => input.startsWith(op, i)) match {
          case Some(op) => out += Token.Op(op, i); i += op.length
          case None => throw new LexError(s"unexpected character '$c'", i)
        }
      }
    }
    out += Token.End(n)
    out.result()
  }
}
