package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{IncrementalAnn, IncrementalDedup, IvfIndex, Staging}
import graft.operators.Staging.Stageable

/** CONTINUOUS embedding-side hygiene — the VECTOR twin of
  * [[CorpusIngest]]: arriving embedding files drain through the
  * incremental ANN engine, each micro-batch near-dup-dedups against the
  * PERSISTED signature index ([[IncrementalAnn]] — history is never
  * re-projected against the hyperplanes), and the batch's survivors are
  * appended to the signature index, the durable sink, and (optionally)
  * the standing IVF-cell store — so BOTH ANN routes stay never more than
  * one batch stale while the corpus grows. The 100 TB embedding-pipeline
  * shape: per-arrival cost is the arrival's own projections + one
  * column-pruned 20 B/row signature scan, never a corpus re-projection.
  *
  * Same construction and guarantees as the document ingest:
  *
  *   - checkpointed `foreachBatch` over a file source (a restart never
  *     re-reads acknowledged input);
  *   - the sink write is `overwrite` into a `batch=<id>` partition, so
  *     an at-least-once replay overwrites its own output;
  *   - the index appends are replay-SAFE: duplicated sig/vec/cell rows
  *     collapse in candidate generation and compaction, and the
  *     keep-list recomputed against the post-append index is identical
  *     (a batch vector never pairs with its own indexed copy — id
  *     equality is excluded — and batch-internal pairs resolve by the
  *     same min-id rule either way);
  *   - dedup semantics are GREEDY FIRST-FIT, like the document ingest:
  *     a new vector drops iff its exact cosine vs a previously KEPT
  *     vector (or a lower-id batch vector) reaches `threshold`.
  *
  * The first surviving batch BOOTSTRAPS the signature index at an
  * explicit `numPlanes` (adaptive sizing needs a corpus to measure;
  * bootstrap has none — the caller pins the width, and corpus growth
  * big enough to need a wider banding is a rebuild, the
  * [[IncrementalAnn]] params contract). The optional `ivfPath` store
  * must be PRE-BUILT ([[IvfIndex.buildIndex]] — its codebook freezes at
  * training; the ingest assigns survivors under it), which is the
  * frozen-quantizer production posture.
  */
object EmbeddingIngest {

  /** Drain every available embedding file under `srcDir` (one file per
    * micro-batch, arrival order) through the incremental ANN dedup, then
    * return the accumulated sink contents. Re-running with the same
    * checkpoint after new files arrive processes ONLY the new files.
    */
  def runIngestAvailableNow(spark0: SparkSession, srcDir: String,
      indexPath: String, sinkPath: String, checkpointPath: String,
      dim: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.9, numPlanes: Int = 18, numTables: Int = 16,
      shufflePartitions: Option[Int] = None,
      ivfPath: Option[String] = None): DataFrame = {
    require(numPlanes >= 1 && numPlanes <= 62,
      s"bootstrap needs an explicit banding width in [1, 62], got $numPlanes")
    val spark = shufflePartitions.fold(spark0) { n =>
      val s = spark0.newSession()
      s.conf.set("spark.sql.shuffle.partitions", n.toString)
      s
    }
    ivfPath.foreach(p => IvfIndex.readParams(spark, p)) // pre-built, loudly
    val schema = spark.read.parquet(srcDir).schema
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, indexPath, sinkPath, idCol, vecCol,
          dim, threshold, numPlanes, numTables, ivfPath)
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    CorpusIngest.survivors(spark, sinkPath, schema)
  }

  /** One micro-batch: dedup against the signature index, publish
    * survivors idempotently, append them to every maintained store.
    * Package-visible so the spec can replay a committed batch.
    */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
      indexPath: String, sinkPath: String, idCol: String, vecCol: String,
      dim: Int, threshold: Double, numPlanes: Int, numTables: Int,
      ivfPath: Option[String]): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(indexPath, "params")))
      IncrementalAnn.buildIndex(batch.limit(0), idCol, vecCol, dim,
        indexPath, numPlanes = numPlanes, numTables = numTables)
    try {
      // exact-cosine-verified pairs of the batch vs the index and within
      // the batch; the greedy keep-list derivation is SHARED with the
      // document ingest (it only consumes (id_a, id_b) pairs)
      val pairs = IncrementalAnn.newBatchPairs(batch, idCol, vecCol,
        indexPath, threshold).stagePersist()
      IncrementalDedup.keepListFromPairs(batch, idCol, pairs)
        .write.mode("overwrite").parquet(s"$sinkPath/batch=$batchId")
      // survivors re-read from the sink (the materialization point —
      // the document ingest's measured rule)
      val kept = spark.read.parquet(s"$sinkPath/batch=$batchId")
      if (!kept.isEmpty) {
        IncrementalAnn.appendBatch(kept, idCol, vecCol, indexPath)
        ivfPath.foreach(p => IvfIndex.appendBatch(kept, idCol, vecCol, p))
      }
    } finally Staging.releaseAll()
  }
}
