package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the data-versioning primitive of a production corpus:
  * given two snapshots of the same table (yesterday's crawl vs today's),
  * report every row that was added, removed, or changed, with the exact
  * set of changed columns. This is how a pipeline decides what to
  * re-process (only `changed`/`added` rows re-enter dedup/indexing) and
  * how drift monitoring attributes a metric jump to a column.
  *
  * 100 TB shape: ONE co-partitioned join on the key — both snapshots
  * shuffle exactly once on the same key (or zero times if both are
  * bucketed on it, `sources.Bucketing`), every column comparison is a
  * codegen'd null-safe equality in the join's projection, and unchanged
  * rows (the overwhelming majority of a daily snapshot pair) are dropped
  * before anything downstream sees them. Nothing is collected; output
  * size is the churn, not the corpus.
  */
object Diff {

  /** Rows in `next` not in `prev` (`added`), in `prev` not in `next`
    * (`removed`), and in both with any non-key column differing
    * (`changed`), keyed by `keys`. Output: the key columns, `change`,
    * and `changed_cols` — a comma-joined sorted list of differing column
    * names (empty for added/removed). Identical rows are absent.
    *
    * Column comparison is null-safe (`<=>`): null → value and
    * value → null both count as a change, null → null does not. Both
    * inputs must share the schema; non-key columns are taken from
    * `prev`'s column order.
    */
  def snapshotDiff(prev: DataFrame, next: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(prev.columns.sorted.sameElements(next.columns.sorted),
      s"snapshot schemas differ: ${prev.columns.mkString(",")} vs " +
        s"${next.columns.mkString(",")} — align columns before diffing " +
        "(schema evolution is a separate, intentional step)")
    keys.foreach(k => require(prev.columns.contains(k), s"missing key column $k"))
    val valueCols = prev.columns.filterNot(keys.contains).toSeq
    // presence markers survive the outer join even when every data column
    // is null-able; key columns coalesce across sides
    val l = prev.withColumn("_in_prev", lit(true))
    val r0 = next.withColumn("_in_next", lit(true))
    val r = valueCols.foldLeft(r0)((df, c) => df.withColumnRenamed(c, s"_n_$c"))
      .withColumnsRenamed(keys.map(k => k -> s"_k_$k").toMap)

    val joined = l.join(r,
      keys.map(k => col(k) <=> col(s"_k_$k")).reduce(_ && _), "full_outer")

    val changedCols: Column = {
      val diffs = valueCols.map(c =>
        when(!(col(c) <=> col(s"_n_$c")), lit(c)))
      array_join(array_sort(filter(array(diffs: _*), _.isNotNull)), ",")
    }

    joined
      .select(
        keys.map(k => coalesce(col(k), col(s"_k_$k")).as(k)) ++ Seq(
          when(col("_in_prev").isNull, lit("added"))
            .when(col("_in_next").isNull, lit("removed"))
            .otherwise(lit("changed")).as("change"),
          when(col("_in_prev").isNotNull && col("_in_next").isNotNull, changedCols)
            .otherwise(lit("")).as("changed_cols")): _*)
      .filter(col("change") =!= "changed" || col("changed_cols") =!= "")
  }
}
