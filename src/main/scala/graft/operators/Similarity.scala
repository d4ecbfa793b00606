package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (one broadcast of the
  * query set, no shuffle of the corpus); the LSH-bucketed variant is the
  * scale path: random-hyperplane signatures bucket the corpus so each query
  * only scores its own bucket — corpus-side work drops from O(N·Q) to
  * O(N + Q·bucket). All arithmetic is double (`cast(array<double>)`) and
  * folds are sequential (`aggregate`), so scores are bit-deterministic.
  */
object Similarity {

  /** Sequential-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, v) => acc + v)

  /** L2 norm of a double-array column. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0d), (acc, v) => acc + v))

  /** cosine(a, b) = dot / (norm(a) * norm(b)). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded). Queries broadcast; ranking is a window
    * per query id with a total tie-break on neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    VectorFunctions.ensureRegistered(corpus.sparkSession)
    // persist the cast frames and precompute norms once per vector —
    // otherwise the float→double cast and the norm fold re-run per PAIR
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).cast("array<double>").as("n_vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
      .withColumn("n_norm", norm(col("n_vec")))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
      .withColumn("q_norm", norm(col("q_vec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", VectorFunctions.vector_dot(col("q_vec"), col("n_vec"))
        / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cos")
  }

  /** Random-hyperplane LSH signature: bit p = sign of ⟨vec, plane_p⟩.
    * Planes come from a fixed-seed driver-side RNG (deterministic across
    * runs and executors) and ship as literals inside the expression —
    * effectively a broadcast of numPlanes×dim doubles.
    */
  def hyperplaneBucket(vec: Column, dim: Int, numPlanes: Int, seed: Long): Column = {
    val rnd = new java.util.Random(seed)
    val planes = Array.fill(numPlanes, dim)(rnd.nextGaussian())
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(vec, planeCol) >= 0d, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: score only corpus vectors sharing the query's
    * hyperplane bucket. Recall trades off with numPlanes; candidates within
    * the bucket are ranked by exact cosine.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, numPlanes: Int = 8,
      seed: Long = 42L): DataFrame = {
    VectorFunctions.ensureRegistered(corpus.sparkSession)
    val bucket = (v: Column) => hyperplaneBucket(v, dim, numPlanes, seed)
    // persist the cast frame first: bucket bits run numPlanes dot products
    // over the vector, which must be an attribute, not a re-cast expression
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).cast("array<double>").as("n_vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
      .withColumn("bucket", bucket(col("n_vec")))
      .withColumn("n_norm", norm(col("n_vec")))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
      .withColumn("bucket", bucket(col("q_vec")))
      .withColumn("q_norm", norm(col("q_vec")))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", VectorFunctions.vector_dot(col("q_vec"), col("n_vec"))
        / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cos")
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket the corpus against
    * itself, verify with exact cosine ≥ threshold. The bucket join bounds
    * the pair space; at 100 TB this is the only corpus×corpus shape that
    * doesn't shuffle quadratically.
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    VectorFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
      .withColumn("bucket", hyperplaneBucket(col("vec"), dim, numPlanes, seed))
      .withColumn("nrm", norm(col("vec")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = c.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = c.select(col("bucket").as("bucket_r"), col("id").as("id_b"), col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    a.join(b, col("bucket") === col("bucket_r") && col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.vector_dot(col("vec_a"), col("vec_b"))
        / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
