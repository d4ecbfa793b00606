package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HTSQL scalar-function semantics as Spark `Column` combinators.
  *
  * Every function here reproduces a signature from the reference's function
  * library (`src/htsql/core/tr/fn/signature.py`, bound in
  * `src/htsql/core/tr/fn/bind.py`) including the semantic traps
  * (SURVEY.md §2.8): string `+` treats NULL as empty, `~` is
  * case-insensitive containment, integer `/` never truncates, `head` /
  * `tail` / `slice` use python-style negative indexing.
  *
  * Everything is composed from `org.apache.spark.sql.functions._` built-ins
  * so the whole library stays inside whole-stage codegen — no UDFs.
  */
object Ht {

  /** String concatenation `a + b` — NULL behaves as `''`, and the result is
    * NULL only if... never: HTSQL concat of two NULLs is `''`.
    * Reference: `ConcatenateSig` in `src/htsql/core/tr/fn/signature.py`.
    */
  def concat(cols: Column*): Column =
    org.apache.spark.sql.functions.concat(cols.map(c => coalesce(c, lit(""))): _*)

  /** `s ~ t`: case-insensitive containment.
    * Reference: `ContainsSig` in `src/htsql/core/tr/fn/signature.py`.
    */
  def containsCI(s: Column, t: Column): Column =
    lower(s).contains(lower(t))

  /** `s !~ t`. */
  def notContainsCI(s: Column, t: Column): Column = !containsCI(s, t)

  /** `head(s, n)`: first `n` characters; negative `n` drops `-n` from the
    * end (python `s[:n]`). Default n=1.
    * Reference: `HeadSig` in `src/htsql/core/tr/fn/signature.py`.
    */
  def head(s: Column, n: Column): Column = {
    val len = length(s)
    val k = when(n >= 0, least(n, len)).otherwise(greatest(len + n, lit(0)))
    s.substr(lit(1), k)
  }
  def head(s: Column): Column = head(s, lit(1))

  /** `tail(s, n)`: last `n` characters; negative `n` drops `-n` from the
    * start (python `s[n:]` for n<0 ... `s[-n:]` shape). Default n=1.
    * Reference: `TailSig`.
    */
  def tail(s: Column, n: Column): Column = {
    val len = length(s)
    val k = when(n >= 0, least(n, len)).otherwise(greatest(len + n, lit(0)))
    s.substr(len - k + 1, k)
  }
  def tail(s: Column): Column = tail(s, lit(1))

  /** `slice(s, i, j)`: python-style `s[i:j]` with negative indices and NULL
    * meaning "open end". Reference: `SliceSig`.
    */
  def slice(s: Column, i: Column, j: Column): Column = {
    val len = length(s)
    // normalize python index -> 0-based clamped [0, len]
    def norm(ix: Column, openDefault: Column): Column =
      when(ix.isNull, openDefault)
        .when(ix >= 0, least(ix, len))
        .otherwise(greatest(len + ix, lit(0)))
    val lo = norm(i, lit(0))
    val hi = norm(j, len)
    val n = greatest(hi - lo, lit(0))
    s.substr(lo + 1, n)
  }

  /** HTSQL `/`: integer ÷ integer is exact (decimal), never truncating
    * integer division. Reference: `DivideSig` + the coercion matrix in
    * `src/htsql/core/tr/coerce.py`. We surface the result as double for
    * deterministic cross-engine comparison.
    */
  def div(a: Column, b: Column): Column =
    a.cast(DoubleType) / b.cast(DoubleType)

  /** Null-safe total equality `==` — reference `IsTotallyEqualSig`. */
  def totalEq(a: Column, b: Column): Column = a <=> b

  /** `if_null(x, y)` / `null_if(x, y)` — `IfNullSig`, `NullIfSig`. */
  def ifNull(a: Column, b: Column): Column = coalesce(a, b)
  def nullIf(a: Column, b: Column): Column = nullif(a, b)

  /** `if(p1, v1, [p2, v2, ...][, else])` — `IfSig`: first true branch. */
  def htIf(branches: Seq[(Column, Column)], orElse: Option[Column]): Column = {
    val base = branches.tail.foldLeft(when(branches.head._1, branches.head._2)) {
      case (acc, (p, v)) => acc.when(p, v)
    }
    orElse.fold(base)(base.otherwise)
  }

  /** `switch(x, c1, v1, ..., else)` — `SwitchSig`. NULL never matches. */
  def htSwitch(x: Column, cases: Seq[(Column, Column)], orElse: Option[Column]): Column =
    htIf(cases.map { case (c, v) => (x === c, v) }, orElse)

  /** Exact-sum of a double column: aggregate in decimal so the result is
    * independent of partition/merge order, then surface as double. At 100 TB
    * a float sum is non-deterministic across runs; decimal aggregation is
    * both deterministic and still map-side-combinable.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  /** Deterministic average (same decimal trick; IEEE double division). */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType) / count(c)
}
