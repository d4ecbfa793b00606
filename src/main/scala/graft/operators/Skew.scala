package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregation — the explicit scale path when
  * AQE's skew handling isn't enough (e.g. a single key holding >1% of a
  * 100 TB table would hot-spot one reducer).
  *
  * Two-stage salted aggregation: stage 1 groups on (key, salt) so a hot
  * key's rows spread over `saltBuckets` reducers; stage 2 merges the
  * partial aggregates per key. Only algebraic aggregates (count/sum/min/
  * max — with decimal-exact sums also avg) decompose this way, which is
  * exactly the set the engine's linked aggregates use.
  */
object Skew {

  /** Salted count+sum per key, exactly equal to
    * `df.groupBy(keys).agg(count, dsum)` but skew-resistant.
    * The sum runs through exact decimal so the two-stage merge is
    * bit-identical to the single-stage result regardless of partitioning.
    */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltBuckets: Int = 16, scale: Int = 2): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        sum(col(valueCol).cast(s"decimal(30,$scale)")).as("__sum"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__cnt")).as("n"),
        sum(col("__sum")).cast("double").as("sum"))
  }

  /** Salted distinct count per key: stage 1 dedups (key, salt-bucketed
    * value) pairs, stage 2 counts per key — the shuffle never carries a
    * hot key's full value set to one reducer.
    */
  def saltedCountDistinct(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    df.select((keyCols :+ valueCol).map(col): _*)
      .distinct() // (key, value) dedup spreads by hash of BOTH columns
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_distinct"))
}
