package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import Staging.Stageable

/** Trainable document-quality classifier — logistic regression over the
  * engine's own text metrics, trained by distributed batch gradient
  * descent (the "quality model" step of published pretraining pipelines:
  * a small linear model scores every document and a threshold or
  * pareto-sampling rule keeps the high end; GPT-3's corpus used exactly
  * this shape over reference-vs-web features).
  *
  * Built on the engine, not on MLlib: features are the already-verified
  * `TextAnalysis` column metrics, training is one partial-aggregating
  * job per iteration (only the d+1 gradient sums reach the driver — at
  * 100 TB each iteration is a corpus scan of the STAGED feature frame,
  * whose width is d doubles, not document text), and every gradient
  * component sums through DECIMAL (`DecimalType(30, 18)`) so training is
  * bit-deterministic under any partitioning — the same determinism rule
  * as `Ht.dsum` (an IEEE float sum is partition-order-dependent).
  */
object QualityModel {

  /** Fixed feature template over a text column: bias + bounded metrics,
    * all in [0, 1] so one learning rate fits. The top-unigram fraction
    * (Gopher's looping-phrase signal, ×4 to spread its useful sub-0.25
    * range across the unit interval) is the workhorse for
    * repetition-degradation; the rest give the model vocabulary-shape
    * signals. */
  def featuresFromTokens(text: Column, toks: Column): Column = array(
    lit(1.0d),
    // unigram "grams" ARE the tokens — feed the staged attribute straight
    // into the run-length fold (no re-tokenize per index)
    least(TextAnalysis.topNgramFractionFromGrams(toks) * lit(4.0d), lit(1.0d)),
    TextAnalysis.stopwordRatioFromTokens(toks),
    TextAnalysis.alphaRatio(text),
    least(TextAnalysis.meanTokenLengthFromTokens(toks) / lit(10.0d), lit(1.0d)),
    least(TextAnalysis.tokenCountFromTokens(toks).cast(DoubleType) / lit(256.0d),
      lit(1.0d)))

  /** One-shot convenience form — tokenizes inline; corpus scans stage
    * the token array first (the staging rule). */
  def features(text: Column): Column =
    featuresFromTokens(text, TextAnalysis.tokens(text))

  /** dot(w, x) for a literal weight vector. An explicit left-assoc sum of
    * `x[j] * w[j]` products — bit-identical to the HOF fold it replaces
    * (same `0.0 + x₀w₀ + x₁w₁ + …` IEEE sequence) but a plain codegen'd
    * arithmetic tree: the zip_with/aggregate form evaluated INTERPRETED
    * (higher-order functions have no codegen), and during training it sat
    * inside every gradient expression of every iteration's fresh plan —
    * the guide's "eliminate non-codegen expressions in the hot path".
    */
  def margin(x: Column, w: Array[Double]): Column =
    w.zipWithIndex.foldLeft(lit(0.0d): Column) { case (acc, (wj, j)) =>
      acc + element_at(x, j + 1) * lit(wj)
    }

  /** P(quality | x) under trained weights. */
  def score(x: Column, w: Array[Double]): Column =
    lit(1.0d) / (lit(1.0d) + exp(-margin(x, w)))

  /** Batch-GD training. `df` rows carry (featCol: array<double>,
    * labelCol ∈ {0,1}). Returns the weight vector. Deterministic:
    * decimal gradient sums, fixed iteration count, no sampling. */
  def trainLogistic(df: DataFrame, featCol: Column, labelCol: Column,
      dim: Int, iters: Int = 30, lr: Double = 2.0): Array[Double] = {
    // the staged frame is (x, y) only — the text pipeline runs ONCE, every
    // iteration reads d doubles per row from the cache
    val staged = df.select(featCol.as("x"), labelCol.cast(DoubleType).as("y"))
      .stagePersist()
    // Malformed rows (null x, wrong-length x, null elements, null label)
    // would make zip_with/margin yield null residuals, silently dropping
    // them from the gradient — fail loudly instead of training skewed.
    // One pass over the staged frame: (total, bad) together.
    val shape = staged.agg(
      count(lit(1)).as("n"),
      count(when(col("x").isNull || size(col("x")) =!= dim ||
        exists(col("x"), _.isNull) || col("y").isNull, 1)).as("bad")).head()
    val n = shape.getLong(0).toDouble
    require(n > 0, "empty training frame")
    require(shape.getLong(1) == 0L,
      s"${shape.getLong(1)} of ${shape.getLong(0)} training rows have a null " +
        s"label or a feature vector that is null, contains nulls, or has " +
        s"size != $dim — these would be silently dropped from the gradient")
    val w = Array.fill(dim)(0.0)
    for (_ <- 0 until iters) {
      val m = margin(col("x"), w)
      val resid = (lit(1.0d) / (lit(1.0d) + exp(-m))) - col("y")
      // residual computed ONCE in a projection below the aggregate: the
      // old form inlined the full margin tree into every one of the dim
      // gradient sums, so each iteration planned (and evaluated) the
      // sigmoid dim times per row — same numbers, dim× the expression
      // tree and the per-row flops (§1.2 per-task work)
      val proj = staged.select(resid.as("r"), col("x"))
      val gradAggs = (0 until dim).map { j =>
        sum((col("r") * element_at(col("x"), j + 1)).cast(DecimalType(30, 18)))
          .cast(DoubleType).as(s"g$j")
      }
      val g = proj.agg(gradAggs.head, gradAggs.tail: _*).head()
      var j = 0
      while (j < dim) { w(j) -= lr / n * g.getDouble(j); j += 1 }
    }
    w
  }
}
