package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-R nearest centroids for one vector, as ONE native kernel:
  * `array<int>` of the `r` cell ids (1-based) with the highest dot
  * product against a trained centroid matrix, ordered score-descending
  * with ties broken on the LOWER cell index.
  *
  * WHY an Expression and not a composed column: the composed form
  * (`array(centroids.map(ct => vector_dot(vec, lit(ct))))` + an
  * `array_sort`/`slice` over (score, cell) pairs) inlines one array
  * literal PER CENTROID — at a production-derived cell count
  * (nlist ≈ corpus/targetCell, thousands of cells) that is the same
  * janino constant-pool blowup [[HyperplaneSigs]] exists to prevent, and
  * it additionally materializes an nlist-wide score array per row in the
  * plan. Here the flat centroid matrix is a REFERENCE OBJECT
  * (`ctx.addReferenceObj`): generated code is two small loops plus an
  * R-slot selection, independent of cell count, and the per-row
  * intermediate state is one nlist-double scratch array.
  *
  * Bit-identity contract (spec-pinned): the per-cell score folds
  * sequentially over `min(dim, vec.length)` exactly like [[VectorDot]],
  * and the (score desc, cell asc) selection equals the composed
  * `array_sort` comparator order — so the produced cells match the
  * literal-composed construction element for element, and `r = 1` equals
  * `array_position(scores, array_max(scores))` (first-max tie rule).
  *
  * Null contract: NULL in → NULL out; element nulls read as 0.0 (dense
  * embedding columns, same as the other vector kernels).
  */
case class CentroidTopCells(child: Expression, centroids: Array[Double],
    dim: Int, r: Int) extends UnaryExpression {

  require(dim >= 1, s"dim must be positive, got $dim")
  require(r >= 1, s"r must be positive, got $r")
  require(centroids.length % dim == 0,
    s"flat centroid matrix length ${centroids.length} is not a multiple of dim $dim")

  private def nlist: Int = centroids.length / dim

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires an array<double> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    new GenericArrayData(CentroidTopCells.select(
      centroids, dim, r, x.numElements(), i => x.getDouble(i)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", centroids, "double[]")
    val k = nlist
    val take = math.min(r, k)
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val scores = ctx.freshName("scores")
      val cIdx = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      val pick = ctx.freshName("pick")
      val best = ctx.freshName("best")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |double[] $scores = new double[$k];
         |for (int $cIdx = 0; $cIdx < $k; $cIdx++) {
         |  int $base = $cIdx * $dim;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $mat[$base + $i] * $v.getDouble($i);
         |  }
         |  $scores[$cIdx] = $s;
         |}
         |int[] $out = new int[$take];
         |for (int $pick = 0; $pick < $take; $pick++) {
         |  int $best = -1;
         |  for (int $cIdx = 0; $cIdx < $k; $cIdx++) {
         |    if ($scores[$cIdx] == $scores[$cIdx] /* not consumed (NaN-marked) */
         |        && ($best < 0 || $scores[$cIdx] > $scores[$best])) {
         |      $best = $cIdx;
         |    }
         |  }
         |  $out[$pick] = $best + 1;
         |  $scores[$best] = Double.NaN;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidTopCells {
  /** Shared selection core for the interpreted path (and tests): scores
    * every centroid with a sequential fold, then R argmax passes with the
    * (score desc, cell asc) tie rule, consuming picked slots via NaN
    * (scores are real dots, never NaN, so the marker is unambiguous).
    * NOTE the codegen above is the same algorithm textually — keep the
    * two in lockstep.
    */
  private[functions] def select(mat: Array[Double], dim: Int, r: Int,
      vecLen: Int, vec: Int => Double): Array[Int] = {
    val k = mat.length / dim
    val n = math.min(dim, vecLen)
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val base = c * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += mat(base + i) * vec(i); i += 1 }
      scores(c) = s
      c += 1
    }
    val take = math.min(r, k)
    val out = new Array[Int](take)
    var pick = 0
    while (pick < take) {
      var best = -1
      var j = 0
      while (j < k) {
        if (!scores(j).isNaN && (best < 0 || scores(j) > scores(best))) best = j
        j += 1
      }
      out(pick) = best + 1
      scores(best) = Double.NaN
      pick += 1
    }
    out
  }
}
