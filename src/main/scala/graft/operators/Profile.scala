package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the schema/data-drift detection step of a production
  * ingest pipeline: per-column row/null/distinct counts and min/max, one
  * row per profiled column. Upstream has no analogue (its `tweak.meta`
  * exposes CATALOG metadata; this profiles the DATA); the design target is
  * the "stats pass" every large-scale corpus build runs before training.
  *
  * Two surfaces, mirroring [[Quantiles]]:
  *
  *   - [[profile]] — EXACT distinct counts. Spark plans the multi-column
  *     `count(distinct)` via a single Expand + two-stage partial aggregate:
  *     rows multiply ×(cols+1) map-side but each expanded row carries ONE
  *     column's value, and partial distinct aggregation collapses them
  *     before the exchange, so shuffle bytes are Σ per-column distincts,
  *     not row count. The oracle-checked gate key.
  *   - [[profileApprox]] — HLL++ distinct (`approx_count_distinct`), one
  *     narrow pass with NO Expand: the 100 TB default, where a few-percent
  *     distinct error is immaterial to drift detection but Σ distincts can
  *     approach row count (e.g. an id column).
  *
  * Both compute everything in ONE aggregate job over a single scan; min and
  * max are cast to string so heterogeneous column types share one output
  * schema (int/string casts are engine-portable; profile columns must be
  * atomic types).
  */
object Profile {

  private def aggsFor(c: String, exact: Boolean): Seq[Column] = Seq(
    count(col(c)).as(s"__cnt_$c"),
    (if (exact) countDistinct(col(c))
     else approx_count_distinct(col(c))).as(s"__nd_$c"),
    min(col(c)).cast("string").as(s"__min_$c"),
    max(col(c)).cast("string").as(s"__max_$c"))

  private def profileWith(df: DataFrame, cols: Seq[String],
      exact: Boolean): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(aggsFor(_, exact))
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the 1-row wide aggregate map-side: one struct per column
    val rows = array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }: _*)
    wide.select(explode(rows).as("p")).select("p.*")
  }

  /** Exact per-column profile; see class doc. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, exact = true)

  /** Approx-distinct profile — the 100 TB path; see class doc. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, exact = false)
}
