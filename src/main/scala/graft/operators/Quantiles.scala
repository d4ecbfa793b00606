package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine's PUBLIC percentile surface — approximate only.
  *
  * Spark's exact `percentile` aggregate is an ObjectHashAggregate over a
  * full per-group value buffer: at 100 TB one hot group is billions of
  * doubles on a single executor — a scale-killer regardless of plan shape.
  * The public operator therefore plans ONLY `percentile_approx` (KLL-style
  * constant-memory sketch, rank error ≤ 1/accuracy, mergeable across
  * partitions so partial aggregation applies). The exact aggregate exists
  * solely inside gate harnesses that judge the sketch at bounded gate
  * scale (StreamQueries `q_percentile` / `q_percentile_approx`);
  * OperatorSpec pins both the sketch-only plan here and the confinement
  * there.
  */
object Quantiles {

  /** Per-group percentiles via the constant-memory sketch. Output:
    * (group, percentiles array) — one row per group, one sketch merge
    * tree, no per-group value buffering anywhere in the plan.
    */
  def groupPercentiles(df: DataFrame, groupCol: Column, valueCol: Column,
      ps: Seq[Double], accuracy: Int = 1000): DataFrame =
    df.groupBy(groupCol.as("group"))
      .agg(percentile_approx(valueCol, array(ps.map(lit): _*), lit(accuracy))
        .as("percentiles"))

  /** Global (ungrouped) percentiles — same sketch, one output row. */
  def percentiles(df: DataFrame, valueCol: Column, ps: Seq[Double],
      accuracy: Int = 1000): DataFrame =
    df.agg(percentile_approx(valueCol, array(ps.map(lit): _*), lit(accuracy))
      .as("percentiles"))
}
