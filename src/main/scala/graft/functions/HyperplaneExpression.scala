package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All random-hyperplane LSH signatures for one vector, as ONE native
  * kernel: `array<long>` of `numTables` signatures, bit p of table t =
  * sign of ⟨vec, plane_{t,p}⟩.
  *
  * WHY an Expression and not a composed column: the composed form
  * (`when(vector_dot(vec, lit(plane)) >= 0, 1L<<p)` summed over planes,
  * one `array(...)` over tables) inlines every plane as a LITERAL array —
  * at 40 planes × 16 tables × dim 64 that is 40,960 doubles of generated
  * Java source, which blows janino's method/constant-pool limits and
  * drops the whole stage to interpreted execution (measured at the sf1
  * bench: `InternalCompilerException` → fallback). Here the plane matrix
  * is a REFERENCE OBJECT (`ctx.addReferenceObj`) — the generated code is
  * three small loops regardless of plane count, and interpreted eval
  * shares the same matrix.
  *
  * Bit-identity contract (spec-pinned): plane p of table t draws the same
  * gaussians as `Similarity.hyperplaneBucket` — one
  * `java.util.Random(seed + 1000003·t)` stream per table, row-major
  * (plane-then-dim) fill — and the dot product folds sequentially over
  * `min(dim, vec.length)` exactly like the native `VectorDot`, so the
  * produced signature equals the composed construction bit for bit, and
  * the low-p-bits-of-a-wider-frame property is preserved.
  *
  * Null contract: NULL in → NULL out; element nulls read as 0.0 (dense
  * embedding columns, same as the other vector kernels).
  */
case class HyperplaneSigs(child: Expression, dim: Int, numPlanes: Int,
    numTables: Int, seed: Long) extends UnaryExpression {

  require(numPlanes >= 1 && numPlanes <= 62, s"numPlanes must be 1..62, got $numPlanes")
  require(numTables >= 1, s"numTables must be positive, got $numTables")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires an array<double> argument, got ${other.simpleString}")
  }

  /** Flat [table][plane][dim] plane matrix; deterministic from the seed,
    * so executors that re-derive it (interpreted path) and the driver
    * reference shipped to codegen are identical.
    */
  @transient private lazy val planes: Array[Double] = HyperplaneSigs
    .planeMatrix(dim, numPlanes, numTables, seed)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var sig = 0L
      var p = 0
      while (p < numPlanes) {
        val base = (t * numPlanes + p) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += planes(base + i) * x.getDouble(i); i += 1 }
        if (s >= 0.0) sig |= 1L << p
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("hyperplanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long[] $out = new long[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    int $base = ($t * $numPlanes + $p) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $mat[$base + $i] * $v.getDouble($i);
         |    }
         |    if ($s >= 0.0) $sig |= 1L << $p;
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSigs {
  /** The exact RNG contract `Similarity.hyperplaneBucket` uses: one
    * `Random(seed + 1000003·t)` per table, `Array.fill(numPlanes, dim)`
    * row-major — plane p's gaussians are independent of how many planes
    * follow (the low-bits escalation property).
    */
  private[graft] def planeMatrix(dim: Int, numPlanes: Int, numTables: Int,
      seed: Long): Array[Double] = {
    val out = new Array[Double](numTables * numPlanes * dim)
    var t = 0
    while (t < numTables) {
      val rnd = new java.util.Random(seed + 1000003L * t)
      var j = 0
      val base = t * numPlanes * dim
      while (j < numPlanes * dim) { out(base + j) = rnd.nextGaussian(); j += 1 }
      t += 1
    }
    out
  }
}
