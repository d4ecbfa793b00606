package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Compaction for the persisted incremental indices ([[IncrementalDedup]],
  * [[IncrementalAnn]]) — the small-files countermeasure every append-only
  * store needs at production cadence: N daily increments leave N parquet
  * append sets per store, so scan task count (and open/footer overhead)
  * grows linearly with ingest HISTORY rather than data size. At 10¹⁰ docs
  * × 365 increments the band scan would plan ~10⁵ splits of a few MB each.
  *
  * `compact*Index` rewrites each store to `ceil(bytes / targetFileBytes)`
  * files, hash-clustered on its join key (band / sig) and sorted within
  * partitions, and DEDUPS replayed append rows (the crash-recovery
  * contract lets a re-run append duplicate a batch — queries tolerate the
  * duplicates; compaction is where they physically leave). Query results
  * are bit-identical before and after (spec-pinned): the stores hold the
  * same logical rows, just fewer files.
  *
  * The swap is crash-safe by WRITE-AHEAD MARKER, the same roll-forward
  * protocol as [[graft.sources.Etl]] scoped to one store directory:
  *
  *   1. the compacted store is fully written to `<store>.compact`;
  *   2. `_compact_<store>` publishes (create tmp + atomic rename) — the
  *      commit point;
  *   3. live store deletes, staged renames over it, marker deletes.
  *
  * [[heal]] makes any crash state consistent: marker present → roll the
  * swap forward (the staged store is complete by protocol); marker absent
  * → a stray `.compact` dir is uncommitted debris and deletes. Both
  * modules' `readParams` heal before reading, so a reader never sees a
  * half-swapped store; single writer at a time, like the append contract.
  */
object IndexMaintenance {

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def stagedPath(root: String, store: String) = new Path(s"$root/$store.compact")
  private def markerPath(root: String, store: String) = new Path(s"$root/_compact_$store")

  /** Roll forward (marker present) or clean up (marker absent) one
    * store's interrupted compaction. Idempotent; cheap when idle.
    */
  def heal(spark: SparkSession, root: String, store: String): Unit = {
    val f = fs(spark)
    val live = new Path(s"$root/$store")
    val staged = stagedPath(root, store)
    val marker = markerPath(root, store)
    if (f.exists(marker)) {
      if (f.exists(staged)) {
        if (f.exists(live)) f.delete(live, true)
        if (!f.rename(staged, live))
          throw new IllegalStateException(s"compaction heal: rename failed for $staged")
      }
      f.delete(marker, false)
    } else if (f.exists(staged)) {
      f.delete(staged, true) // uncommitted debris — commit point never reached
    }
  }

  /** Heal every store of an index directory (called by readers). */
  def healAll(spark: SparkSession, root: String, stores: Seq[String]): Unit =
    stores.foreach(heal(spark, root, _))

  /** The ONE copy of the crash-safe staged-store swap, shared by every
    * compaction (incl. [[CorpusCompare.compactGramIndex]], which folds by
    * aggregation rather than dedup): heals any prior interrupted state,
    * has `writeStaged` materialize the replacement at `<store>.compact`,
    * then publishes the write-ahead marker and swaps. A crash anywhere
    * leaves a state [[heal]] makes consistent.
    */
  def swapCompacted(spark: SparkSession, root: String, store: String)(
      writeStaged: String => Unit): Unit = {
    heal(spark, root, store)
    val f = fs(spark)
    val live = new Path(s"$root/$store")
    val staged = stagedPath(root, store)
    writeStaged(staged.toString)
    // commit point: marker publishes via create-then-rename
    val marker = markerPath(root, store)
    val tmp = new Path(marker.toString + ".tmp")
    val out = f.create(tmp, true)
    try out.writeBytes(store) finally out.close()
    if (!f.rename(tmp, marker))
      throw new IllegalStateException(s"compaction commit: marker rename failed for $store")
    // roll forward (identical to heal's marker branch)
    f.delete(live, true)
    if (!f.rename(staged, live))
      throw new IllegalStateException(s"compaction swap: rename failed for $staged")
    f.delete(marker, false)
  }

  /** Size-derived file count for a store rewrite. */
  def targetFileCount(spark: SparkSession, root: String, store: String,
      targetFileBytes: Long): Int = {
    val bytes = fs(spark).getContentSummary(new Path(s"$root/$store")).getLength
    math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
  }

  /** Rewrite one store: `ceil(bytes/targetFileBytes)` files, clustered on
    * `clusterCols`, sorted by `sortCols`, exact-duplicate rows dropped.
    */
  private def compactStore(spark: SparkSession, root: String, store: String,
      clusterCols: Seq[Column], sortCols: Seq[Column], dedupCols: Seq[String],
      targetFileBytes: Long): Unit = {
    heal(spark, root, store)
    val nFiles = targetFileCount(spark, root, store, targetFileBytes)
    val df = spark.read.parquet(s"$root/$store")
      .dropDuplicates(dedupCols.head, dedupCols.tail: _*)
      .repartition(nFiles, clusterCols: _*)
      .sortWithinPartitions(sortCols: _*)
    swapCompacted(spark, root, store) { staged =>
      df.write.mode("overwrite").parquet(staged)
    }
  }

  /** Compact an [[IncrementalDedup]] index: `bands` clusters on the band
    * join key, `shingles` on id (one row per doc — replayed appends drop
    * here).
    */
  def compactDedupIndex(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    compactStore(spark, path, "bands",
      clusterCols = Seq(col("band")),
      sortCols = Seq(col("band"), col("band_sig"), col("id")),
      dedupCols = Seq("id", "band", "band_sig"),
      targetFileBytes = targetFileBytes)
    compactStore(spark, path, "shingles",
      clusterCols = Seq(col("id")),
      sortCols = Seq(col("id")),
      dedupCols = Seq("id"),
      targetFileBytes = targetFileBytes)
  }

  /** Compact an [[IncrementalAnn]] index: `sigs` clusters on the signature
    * (bucket keys are its low bits — co-located at any banding width),
    * `vecs` on id.
    */
  def compactAnnIndex(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    compactStore(spark, path, "sigs",
      clusterCols = Seq(col("sig")),
      sortCols = Seq(col("tbl"), col("sig"), col("id")),
      dedupCols = Seq("id", "tbl", "sig"),
      targetFileBytes = targetFileBytes)
    compactStore(spark, path, "vecs",
      clusterCols = Seq(col("id")),
      sortCols = Seq(col("id")),
      dedupCols = Seq("id"),
      targetFileBytes = targetFileBytes)
  }
}
