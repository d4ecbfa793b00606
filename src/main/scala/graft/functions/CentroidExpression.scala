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

/** Two-level (grouped) variant of [[CentroidTopCells]] — the IVF
  * assignment that survives cell counts PROPORTIONAL to corpus size.
  *
  * Flat assignment is O(k·dim) per vector; when the cell count k is
  * derived from the corpus (k ≈ n·R/targetCell, the linear-pair-work
  * contract), that makes corpus assignment O(n²) overall — measured at
  * the 200k-vector ladder tier the flat path spent ~¾ of its wall in
  * centroid scoring. Here the k cells are pre-clustered (driver-side,
  * deterministic) into g ≈ √(p·k) GROUPS: a vector scores the g group
  * centroids, probes its top-p groups, and scores only their member
  * cells — O((g + p·k/g)·dim) ≈ O(√(p·k)·dim) per vector.
  *
  * Exactness contract (spec-pinned): with `groupProbes ≥ g` every cell
  * is scored and the result is IDENTICAL to [[CentroidTopCells]] (ties:
  * score desc, then lower ORIGINAL cell id — the flat kernel's index
  * rule). With fewer probes the top-r is taken over the probed subset —
  * the standard IVF recall trade; the semantic-dedup pair verify stays
  * exact either way.
  *
  * Layout: `cells` is the flat k×dim matrix REORDERED group-contiguously;
  * `offsets` (length g+1) delimits each group's slice; `ids(pos)` maps a
  * reordered position back to the 1-based original cell id.
  */
case class CentroidTopCellsNested(child: Expression, groups: Array[Double],
    cells: Array[Double], offsets: Array[Int], ids: Array[Int], dim: Int,
    groupProbes: Int, r: Int) extends UnaryExpression {

  require(dim >= 1, s"dim must be positive, got $dim")
  require(r >= 1 && groupProbes >= 1, s"r/groupProbes must be positive")
  require(groups.length % dim == 0 && cells.length % dim == 0,
    "flat matrices must be multiples of dim")
  require(offsets.length == groups.length / dim + 1 &&
    offsets.last == cells.length / dim && ids.length == cells.length / dim,
    "offsets/ids shape mismatch")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires an array<double> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    new GenericArrayData(CentroidTopCellsNested.select(groups, cells, offsets,
      ids, dim, groupProbes, r, x.numElements(), i => x.getDouble(i)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gMat = ctx.addReferenceObj("groupCentroids", groups, "double[]")
    val cMat = ctx.addReferenceObj("cellCentroids", cells, "double[]")
    val off = ctx.addReferenceObj("groupOffsets", offsets, "int[]")
    val idm = ctx.addReferenceObj("cellIds", ids, "int[]")
    val g = groups.length / dim
    val probe = math.min(groupProbes, g)
    val take = math.min(r, cells.length / dim)
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val gs = ctx.freshName("gs")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val bestG = ctx.freshName("bestG")
      val topS = ctx.freshName("topS")
      val topI = ctx.freshName("topI")
      val cnt = ctx.freshName("cnt")
      val p = ctx.freshName("p")
      val cIdx = ctx.freshName("c")
      val id = ctx.freshName("id")
      val pos = ctx.freshName("pos")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |double[] $gs = new double[$g];
         |for (int $i = 0; $i < $g; $i++) {
         |  int $base = $i * $dim;
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $s += $gMat[$base + $j] * $v.getDouble($j);
         |  }
         |  $gs[$i] = $s;
         |}
         |double[] $topS = new double[$take];
         |int[] $topI = new int[$take];
         |int $cnt = 0;
         |for (int $p = 0; $p < $probe; $p++) {
         |  int $bestG = -1;
         |  for (int $i = 0; $i < $g; $i++) {
         |    if ($gs[$i] == $gs[$i] && ($bestG < 0 || $gs[$i] > $gs[$bestG])) {
         |      $bestG = $i;
         |    }
         |  }
         |  $gs[$bestG] = Double.NaN;
         |  for (int $cIdx = $off[$bestG]; $cIdx < $off[$bestG + 1]; $cIdx++) {
         |    int $base = $cIdx * $dim;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $s += $cMat[$base + $j] * $v.getDouble($j);
         |    }
         |    int $id = $idm[$cIdx];
         |    int $pos = $cnt < $take ? $cnt : $take - 1;
         |    if ($cnt < $take || $s > $topS[$take - 1] ||
         |        ($s == $topS[$take - 1] && $id < $topI[$take - 1])) {
         |      while ($pos > 0 && ($topS[$pos - 1] < $s ||
         |          ($topS[$pos - 1] == $s && $topI[$pos - 1] > $id))) {
         |        $topS[$pos] = $topS[$pos - 1]; $topI[$pos] = $topI[$pos - 1];
         |        $pos--;
         |      }
         |      $topS[$pos] = $s; $topI[$pos] = $id;
         |      if ($cnt < $take) $cnt++;
         |    }
         |  }
         |}
         |int[] $out = new int[$cnt];
         |System.arraycopy($topI, 0, $out, 0, $cnt);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidTopCellsNested {
  /** Interpreted twin of the codegen above — keep in lockstep. Insertion
    * top-r over the probed groups' cells with the (score desc, original
    * id asc) tie rule. */
  private[functions] def select(groups: Array[Double], cells: Array[Double],
      offsets: Array[Int], ids: Array[Int], dim: Int, groupProbes: Int,
      r: Int, vecLen: Int, vec: Int => Double): Array[Int] = {
    val g = groups.length / dim
    val n = math.min(dim, vecLen)
    val gs = new Array[Double](g)
    var i = 0
    while (i < g) {
      val base = i * dim
      var s = 0.0
      var j = 0
      while (j < n) { s += groups(base + j) * vec(j); j += 1 }
      gs(i) = s
      i += 1
    }
    val probe = math.min(groupProbes, g)
    val take = math.min(r, cells.length / dim)
    val topS = new Array[Double](take)
    val topI = new Array[Int](take)
    var cnt = 0
    var p = 0
    while (p < probe) {
      var bestG = -1
      var q = 0
      while (q < g) {
        if (!gs(q).isNaN && (bestG < 0 || gs(q) > gs(bestG))) bestG = q
        q += 1
      }
      gs(bestG) = Double.NaN
      var c = offsets(bestG)
      while (c < offsets(bestG + 1)) {
        val base = c * dim
        var s = 0.0
        var j = 0
        while (j < n) { s += cells(base + j) * vec(j); j += 1 }
        val id = ids(c)
        if (cnt < take || s > topS(take - 1) ||
            (s == topS(take - 1) && id < topI(take - 1))) {
          var pos = if (cnt < take) cnt else take - 1
          while (pos > 0 && (topS(pos - 1) < s ||
              (topS(pos - 1) == s && topI(pos - 1) > id))) {
            topS(pos) = topS(pos - 1); topI(pos) = topI(pos - 1)
            pos -= 1
          }
          topS(pos) = s; topI(pos) = id
          if (cnt < take) cnt += 1
        }
        c += 1
      }
      p += 1
    }
    java.util.Arrays.copyOf(topI, cnt)
  }
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
