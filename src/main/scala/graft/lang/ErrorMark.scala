package graft.lang

/** Render an error message with the offending query and a caret under the
  * source position — the analogue of the reference's marked spans
  * (`src/htsql/core/error.py`: `Mark.excerpt` draws the query with a
  * `^^^` underline). Position −1 (binder-synthesized nodes) degrades to
  * the plain query echo.
  *
  * {{{
  * unknown attribute 'customer.c_bogus'
  *   in query: /customer{c_bogus}
  *                       ^
  * }}}
  *
  * Multi-line queries echo every line (continuations aligned under the
  * first) and the caret lands under the line actually containing `pos`.
  */
object ErrorMark {
  private val indent = "  in query: "

  def apply(msg: String, query: String, pos: Int): String = {
    val pad = " " * indent.length
    val sb = new StringBuilder(msg)
    val lines = query.split("\n", -1)
    var offset = 0
    lines.zipWithIndex.foreach { case (line, i) =>
      sb.append('\n').append(if (i == 0) indent else pad).append(line)
      // caret belongs to this line when pos falls within it (the line's
      // trailing newline position counts as the line end)
      if (pos >= offset && pos <= offset + line.length && pos <= query.length)
        sb.append('\n').append(" " * (indent.length + (pos - offset))).append('^')
      offset += line.length + 1
    }
    sb.toString
  }
}
