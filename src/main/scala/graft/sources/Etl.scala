package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ETL write commands over a directory of parquet tables — the analogue of
  * the reference's `tweak.etl` addon (`src/htsql/tweak/etl/cmd/insert.py`
  * (ProduceInsert), `update.py`, `delete.py`, `merge.py`, `copy.py`).
  *
  * Parquet is immutable, so every mutating command is COPY-ON-WRITE: plan
  * the post-state declaratively (the write itself is a distributed job —
  * nothing ever collects), write it to a shadow directory, then swap the
  * directories in one filesystem rename. The swap is a driver-side
  * metadata operation, O(1) regardless of table size; readers that opened
  * the old files keep a consistent snapshot (POSIX/HDFS rename semantics).
  * A production deployment would layer a transactional table format's
  * commit log over the same shape; the sandbox has no such dependency, so
  * this is the minimal honest equivalent — single-writer, last-swap-wins,
  * no isolation between concurrent writers (documented, like the
  * reference's autocommit ETL).
  *
  * Tables live at `<workDir>/<name>.parquet` — the same layout
  * `graft.model.Tables` reads, so an Etl working directory IS a queryable
  * data directory.
  */
final class Etl(val spark: SparkSession, val workDir: String) {

  private def tablePath(name: String): String = s"$workDir/$name.parquet"

  def read(name: String): DataFrame = spark.read.parquet(tablePath(name))

  /** Bulk load (`copy.py`): materialize `df` as table `name`. */
  def copy(name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(tablePath(name))

  /** Rewrite `name` with the post-state `df` via shadow-dir + rename —
    * Spark refuses to overwrite a path that is also an input of the same
    * plan, and a partial in-place overwrite could torch the table.
    */
  private def rewrite(name: String, df: DataFrame): Unit = {
    val path = new Path(tablePath(name))
    val shadow = new Path(tablePath(name) + ".swap")
    df.write.mode("overwrite").parquet(shadow.toString)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
    if (!fs.rename(shadow, path))
      throw new IllegalStateException(s"swap failed for $name")
  }

  /** Align `rows` to the table's column set by NAME (the reference's
    * insert validates fields against the catalog and rejects unknowns —
    * `src/htsql/tweak/etl/cmd/insert.py`, BuildExtractNode).
    */
  private def aligned(cur: DataFrame, rows: DataFrame): DataFrame = {
    val unknown = rows.columns.toSet -- cur.columns.toSet
    require(unknown.isEmpty, s"unknown columns: ${unknown.mkString(", ")}")
    val missing = cur.columns.toSet -- rows.columns.toSet
    require(missing.isEmpty, s"missing columns: ${missing.mkString(", ")}")
    rows.select(cur.columns.map(c => col(c).cast(cur.schema(c).dataType)): _*)
  }

  /** `insert.py`: append rows (schema-aligned, type-coerced). */
  def insert(name: String, rows: DataFrame): Unit = {
    val cur = read(name)
    rewrite(name, cur.unionByName(aligned(cur, rows)))
  }

  /** `update.py`: SET col := expr for rows matching `condition`; every
    * other row and column passes through unchanged.
    */
  def update(name: String, condition: Column, assignments: Map[String, Column]): Unit = {
    val cur = read(name)
    val unknown = assignments.keySet -- cur.columns.toSet
    require(unknown.isEmpty, s"unknown columns: ${unknown.mkString(", ")}")
    rewrite(name, cur.select(cur.columns.map { c =>
      assignments.get(c)
        .map(v => when(condition, v.cast(cur.schema(c).dataType)).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }: _*))
  }

  /** `delete.py`: drop rows matching `condition`. */
  def delete(name: String, condition: Column): Unit = {
    val cur = read(name)
    rewrite(name, cur.filter(!coalesce(condition, lit(false))))
  }

  /** `merge.py`: key-based upsert — matched rows are REPLACED by the
    * source row, unmatched source rows append (delete-matching + union:
    * one anti join, broadcast-able when the change set is small — the
    * common case — so the table shuffles zero rows).
    */
  def merge(name: String, source: DataFrame, keys: Seq[String]): Unit = {
    val cur = read(name)
    rewrite(name, Etl.mergedState(cur, aligned(cur, source), keys))
  }
}

object Etl {
  /** The merge post-state plan, exposed for plan-shape tests: table-side
    * rows pass through a BROADCAST anti join (the table never shuffles)
    * and the source appends.
    */
  private[graft] def mergedState(cur: DataFrame, src: DataFrame,
      keys: Seq[String]): DataFrame =
    cur.join(broadcast(src.select(keys.map(col): _*)), keys, "left_anti")
      .unionByName(src)
}
