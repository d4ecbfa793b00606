package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * codegen'd expression — the first step of corpus text canonicalization:
  * content-defined identity (fingerprints, exact dedup, overlap digests)
  * must not distinguish `e` + COMBINING ACUTE from the precomposed `é`,
  * or the same document re-crawled through a different encoder pipeline
  * counts as new content.
  *
  * Spark has no built-in for this, and the repo rule ranks a native
  * `Expression` above a UDF: this is one static JDK call
  * (`java.text.Normalizer`) per row inside whole-stage codegen, with an
  * `isNormalized` fast path so the (overwhelmingly common) already-NFC
  * row pays a scan, not an allocation. NFC is stable across Unicode
  * versions for assigned code points, so the JDK result matches any
  * other compliant implementation byte-for-byte — the DuckDB oracle's
  * `nfc_normalize` replays it exactly.
  *
  * Null → null; already-normalized strings return the input buffer
  * untouched.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"requires a string argument, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) {
      input
    } else {
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      // NOTE (codegen formatting rule): no generated line may begin with
      // a pipe — downstream templates re-stripMargin the assembled source.
      s"""
         |String $str = $s.toString();
         |if (java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $s;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($str, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
