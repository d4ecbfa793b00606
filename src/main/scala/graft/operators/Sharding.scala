package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Deterministic sharded export — the final materialization step of a
  * training-data build: split the corpus into `n` content-addressed
  * shards, write one directory per shard, and emit a MANIFEST (per-shard
  * row count + order-independent checksum + id range) that a downstream
  * loader can verify before training starts.
  *
  * Shard membership is a pure function of the row's content fingerprint —
  * the same contract as `Sampling`: stable under repartitioning, retries,
  * topology, and re-runs, so a re-export after a crash reproduces byte-
  * identical shard membership. The mix constant differs from
  * `Sampling.uniformBucket`'s scramble so shard id is DECORRELATED from
  * the sample/split decision (otherwise shard 0 would be all-train, etc.).
  *
  * 100 TB shape: shard assignment is a codegen'd expression fused into
  * the scan (no shuffle); the write shuffles once on `shard` so each
  * shard's files are written by the executors that own its rows; the
  * manifest is a tiny n-row aggregate. The checksum is a bit_xor fold —
  * order-independent AND overflow-free, so it is identical no matter how
  * 10^10 rows are partitioned (a sum would wrap i64 at corpus scale).
  */
object Sharding {

  /** Deterministic shard id in [0, n) from a content fingerprint
    * (`TextAnalysis.fingerprint`, < 1e9+7). The affine remix keeps every
    * intermediate inside i64 for ANY long input (modulo first), and is
    * exactly replicable in ANSI SQL for the oracle.
    */
  def assignShard(fp: Column, n: Int): Column = {
    require(n > 0, s"shard count must be positive, got $n")
    pmod(pmod(fp, lit(1000000007L)) * lit(40503L) + lit(2654435761L), lit(n.toLong))
  }

  /** Per-shard manifest: row count, order-independent fingerprint
    * checksum, and id range. `id` is any total-order column (doc_id).
    */
  def manifest(df: DataFrame, fp: Column, id: Column, n: Int): DataFrame =
    df.select(assignShard(fp, n).as("shard"), fp.as("_fp"), id.as("_id"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(_fp)").as("checksum"),
        min("_id").as("min_id"), max("_id").as("max_id"))

  /** Write `df` into `path` as one directory per shard
    * (`shard=<k>/part-*.parquet`), plus the manifest at
    * `path/_manifest`. Returns the manifest. The data write repartitions
    * on `shard` so each shard's rows land in files owned by one task
    * wave; the manifest is written AFTER the data commits, so a reader
    * that sees the manifest sees complete shards (and can verify them by
    * recomputing the same aggregate from what it read).
    */
  def writeShards(df: DataFrame, fp: Column, id: Column, n: Int,
      path: String, shuffled: Boolean = false): DataFrame = {
    val sharded = df.withColumn("shard", assignShard(fp, n))
      .withColumn("_fp", fp)
    val arranged = sharded.repartition(col("shard"))
    // shuffled=true writes each shard in deterministic PSEUDO-RANDOM row
    // order (scrambled-hash sort within the shard's partition) — the
    // training-time read order, baked in at export so the loader streams
    // sequentially instead of random-accessing 10^10 rows. A different
    // scramble than the shard key, or the order would correlate with it.
    // shard FIRST in the sort key: the dynamic-partition writer requires
    // rows sorted by the partition column and would otherwise insert its
    // own (unstable) sort on top, destroying the shuffle order
    (if (shuffled)
      arranged.sortWithinPartitions(col("shard"),
        pmod(pmod(col("_fp") * lit(48271L), lit(1000000007L)), lit(1000000L)))
    else arranged)
      .write.mode(SaveMode.Overwrite).partitionBy("shard")
      .parquet(path)
    // manifest from the WRITTEN files, not the input plan: re-running the
    // upstream plan would both scan the corpus a second time and — if the
    // plan is not perfectly stable between the two actions — certify rows
    // the write never materialized. Reading back shard + _fp + id is a
    // column-pruned pass over what is actually on disk.
    val m = df.sparkSession.read.parquet(path)
      .withColumn("shard", col("shard").cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(_fp)").as("checksum"),
        min(id).as("min_id"), max(id).as("max_id"))
    m.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/_manifest")
    m
  }

  /** Recompute the manifest from a written shard directory and return
    * rows where it disagrees with the stored manifest — the loader-side
    * verification step (empty result = intact export).
    */
  def verifyShards(spark: org.apache.spark.sql.SparkSession, path: String,
      id: Column): DataFrame = {
    val stored = spark.read.parquet(s"$path/_manifest")
    // partition discovery infers `shard=<k>` dirs as int — align with the
    // manifest's long before the set compare
    val recomputed = spark.read.parquet(path)
      .withColumn("shard", col("shard").cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(_fp)").as("checksum"),
        min(id).as("min_id"), max(id).as("max_id"))
    stored.exceptAll(recomputed).unionAll(recomputed.exceptAll(stored))
  }
}
