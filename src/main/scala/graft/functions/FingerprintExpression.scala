package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint:
  * `h = fold over code points of (31·h + cp) mod 1e9+7`, `h₀ = 0`.
  *
  * Semantically identical to the previous composition
  * `aggregate(filter(split(text, ""), _ =!= ""), 0L, (acc, c) => (acc*31 + ascii(c)) % 1e9+7)`
  * — but that shape materializes a one-element-per-character array and runs
  * an interpreted lambda per element (the known ~10× constant factor). This
  * is the corresponding native kernel: a single whole-stage-codegen'd loop
  * over the UTF8String's bytes, decoding UTF-8 code points inline (for
  * ASCII, one branch per byte). No array, no lambda, no allocation.
  *
  * `(1e9+7)·31 + max-code-point < 2^35`, so the accumulator stays far from
  * Long overflow and the same fold is expressible in any engine with 64-bit
  * ints — the DuckDB oracle replicates it bit-for-bit.
  *
  * Null → null; empty string → 0.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"requires a string argument, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 < 0xe0) { cp = b0 & 0x1f; len = 2 }
      else if (b0 < 0xf0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < bytes.length) {
        cp = (cp << 6) | (bytes(i + j) & 0x3f)
        j += 1
      }
      acc = (acc * 31L + cp) % 1000000007L
      i += len
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b0 = ctx.freshName("b0")
      val cp = ctx.freshName("cp")
      val len = ctx.freshName("len")
      s"""
         |byte[] $bytes = $s.getBytes();
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $bytes.length; ) {
         |  int $b0 = $bytes[$i] & 0xff;
         |  int $cp; int $len = 1;
         |  if ($b0 < 0x80) { $cp = $b0; }
         |  else if ($b0 < 0xe0) { $cp = $b0 & 0x1f; $len = 2; }
         |  else if ($b0 < 0xf0) { $cp = $b0 & 0x0f; $len = 3; }
         |  else { $cp = $b0 & 0x07; $len = 4; }
         |  for (int $j = 1; $j < $len && $i + $j < $bytes.length; $j++) {
         |    $cp = ($cp << 6) | ($bytes[$i + $j] & 0x3f);
         |  }
         |  ${ev.value} = (${ev.value} * 31L + $cp) % 1000000007L;
         |  $i += $len;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
