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
  */
object ErrorMark {
  private val indent = "  in query: "

  def apply(msg: String, query: String, pos: Int): String = {
    val caret =
      if (pos < 0 || pos > query.length) ""
      else "\n" + (" " * (indent.length + pos)) + "^"
    s"$msg\n$indent$query$caret"
  }
}
