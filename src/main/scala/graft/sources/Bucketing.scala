package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed storage — the co-location lever for repeated big joins.
  *
  * A join between two large fact tables shuffles BOTH sides every query.
  * Writing them bucketed (and sorted) by the join key pays one shuffle at
  * write time; every subsequent equi-join or aggregation on that key then
  * plans WITHOUT an Exchange on the bucketed side(s) — at 100 TB this
  * turns the recurring dominant cost of a fact↔fact join into a one-time
  * layout decision. Bucket counts should divide evenly into executor
  * parallelism; match counts on both sides so Spark can zip buckets 1:1.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. Bucket files are
    * hash-partitioned on `keys`, rows sorted within each bucket, so
    * joins get both co-location AND the sort side of sort-merge free.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
}
