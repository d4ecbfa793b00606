package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join — for each left row, the most recent right row
  * with `right.ts <= left.ts` sharing the key. The event-stream enrichment
  * primitive (trade↔quote, purchase↔last-view) the reference's equi-only
  * navigation can't express.
  *
  * Spark-first shape: NO range-condition join (Catalyst would plan a
  * broadcast-nested-loop or explode a range bucket). Instead both sides
  * union into one frame tagged by side, and a running `last(…, ignoreNulls)`
  * window fills each left row with the latest preceding right payload:
  * exactly ONE shuffle on the key + a per-partition sort — the same cost
  * as a sort-merge join, linear at 100 TB, skew-bounded by the key.
  *
  * The right payload rides in a single struct so all its columns come from
  * the SAME matched row. Ties (`right.ts == left.ts`) match, mirroring
  * `ASOF JOIN … ON l.ts >= r.ts`. Precondition: (key, ts) unique per side,
  * or pass `tieBreak` to totalize the order.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightCols: Seq[String], prefix: String = "asof_",
      tieBreak: Option[String] = None): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val rStructType = struct(rightCols.map(c => right(c)): _*)

    val lSide = left.select(
      (keys.map(col) :+ col(tsCol) :+ lit(1).as("__side")) ++
        leftPayload.map(col) :+
        lit(null).cast(right.select(rStructType).schema.head.dataType).as("__r"): _*)
    val rSide = right.select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)

    // right (side 0) sorts before left (side 1) at equal ts → ties match
    val order: Seq[Column] = (col(tsCol).asc +: col("__side").asc +:
      tieBreak.map(c => col(c).asc).toSeq)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.union(rSide)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((keys.map(col) :+ col(tsCol)) ++ leftPayload.map(col) ++
        rightCols.map(c => col(s"__r.$c").as(s"$prefix$c")): _*)
  }
}
