package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: stage-level timing of the semantic-dedup pair pipeline
  * at an arbitrary data dir (`runMain graft.tools.SemProbe <sfDir>
  * [nlist] [replicas]`). Prints cell-frame partitioning and wall time
  * per materialized stage — the pinned-nlist gate regime at 10× is
  * where the r9 SMJ/broadcast planning defects hid, so this probe keeps
  * the join-side decision observable.
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nlist = if (args.length > 1) args(1).toInt else 8
    val repl = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = new graft.model.Tables(spark, dir).embeddings

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semprobe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val scan = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
    println(s"[semprobe] scan partitions = ${scan.rdd.getNumPartitions}, " +
      s"files = ${emb.inputFiles.length}")

    val (pairs, k) = timed("plan build") {
      graft.operators.Similarity.semanticNearDupPairsChosen(
        emb, "vec_id", "embedding", threshold = 0.2,
        nlist = nlist, assignReplicas = repl)
    }
    println(s"[semprobe] k = $k")
    val n1 = timed("pairs count #1")(pairs.count())
    val n2 = timed("pairs count #2 (warm)")(pairs.count())
    println(s"[semprobe] pairs = $n1 / $n2")
    graft.operators.Staging.releaseAll()

    // full driver-gate query, bench-style: warm + 2 measured runs with
    // the staging cache retained across runs (exactly Bench.pass)
    def forceAll(df: DataFrame): Unit = {
      val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
      hashed.agg(bit_xor(col("h")).as("x")).collect()
      ()
    }
    (1 to 3).foreach { i =>
      timed(s"gate run #$i")(
        forceAll(graft.SparkEntry.queries("q_dedup_semantic")(spark, dir)))
    }
    graft.operators.Staging.releaseAll()
    spark.stop()
  }
}
