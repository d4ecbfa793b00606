package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join: pairs of rows sharing key columns whose event
  * times lie within ± tolerance — the "what happened around this event"
  * primitive (error↔nearby clicks, trade↔surrounding quotes).
  *
  * Spark-first shape: a raw `|l.ts − r.ts| ≤ tol` condition is a theta
  * join Catalyst can only plan as broadcast-nested-loop (quadratic at
  * scale). Bucketizing both sides by the tolerance makes it an EQUI join:
  * a qualifying pair's buckets differ by at most 1, so the left side
  * explodes to its (b−1, b, b+1) buckets and joins the right's single
  * bucket on (keys, bucket) — shuffle is O(3·rows), the exact range
  * filter prunes the corners, and no pair is produced twice (the right
  * bucket matches exactly one of the three). Bucket ids use integral
  * `div` on epoch-micros so boundary rounding can't misplace a bucket.
  */
object RangeJoin {

  /** Inner pairs within the tolerance. Output: all left columns plus the
    * right timestamp/payload columns renamed with `prefix`.
    */
  def pairsWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsLeft: String, tsRight: String, toleranceSec: Long,
      rightCols: Seq[String] = Seq.empty, prefix: String = "r_"): DataFrame = {
    val tolUs = toleranceSec * 1000000L
    val l = left
      .withColumn("__us_l", unix_micros(col(tsLeft)))
      .withColumn("__b", explode(array(
        expr(s"(__us_l div $tolUs) - 1"),
        expr(s"__us_l div $tolUs"),
        expr(s"(__us_l div $tolUs) + 1"))))
    val r = right
      .select((keys.map(col) :+ unix_micros(col(tsRight)).as("__us_r")) ++
        rightCols.map(c => col(c).as(s"$prefix$c")): _*)
      .withColumn("__b", expr(s"__us_r div $tolUs"))
    l.join(r, keys :+ "__b")
      .filter(abs(col("__us_l") - col("__us_r")) <= tolUs)
      .withColumn(s"${prefix}ts_us", col("__us_r"))
      .drop("__b", "__us_l", "__us_r")
  }
}
