package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** Scale-study runner: times a set of contract queries on an arbitrary
  * data directory and reports per-query wall seconds plus a task-skew
  * proxy (p100/p50 of task durations across the query's stages). Feeds
  * SCALE.md: run at two generated scales and compare ratios. Not part of
  * the driver contract.
  *
  * Usage: runMain graft.tools.ScaleBench <dir> [key ...]
  */
object ScaleBench {

  private final class TaskStats extends SparkListener {
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null) durations.add(t.taskInfo.duration)
    def reset(): Unit = durations.clear()
    def skew(): (Int, Double) = {
      import scala.jdk.CollectionConverters._
      val ds = durations.asScala.toArray.sorted
      if (ds.isEmpty) (0, 0.0)
      else (ds.length, ds.last.toDouble / math.max(ds(ds.length / 2), 1L))
    }
  }

  private def force(df: DataFrame): Unit = {
    val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
    hashed.agg(bit_xor(col("h")).as("x")).collect()
    ()
  }

  val defaultKeys: Seq[String] = Seq(
    "q_pipeline_hygiene", "q_dedup_clusters", "q_pipeline", "q_dedup_ngram",
    "q_dedup_substring", "q_dedup_minhash", "q_dedup_simhash", "q_dedup_text",
    "q_dedup_embed", "q_sim_lsh", "q_sim_ivf", "q_dedup_exact",
    "q_decontaminate", "q_quality_rep", "q_text_stats",
    "q_stream_tumble", "q_stream_session", "q_redact")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale/sf0.1")
    val keys = if (args.length > 1) args.drop(1).toSeq else defaultKeys
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)
    val out = keys.map { name =>
      val fn = graft.SparkEntry.queries(name)
      System.err.println(s"[scale] running $name")
      try {
        force(fn(spark, dir)) // warm: plan + staging caches
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          force(fn(spark, dir))
          (System.nanoTime() - t0) / 1e9
        }
        stats.reset()
        val t0 = System.nanoTime()
        force(fn(spark, dir))
        val cold = (System.nanoTime() - t0) / 1e9
        val (nTasks, skew) = stats.skew()
        val warm = times.min
        f"""{"key":"$name","sec":${warm}%.3f,"sec_last":${cold}%.3f,"tasks":$nTasks,"skew_p100_p50":${skew}%.2f}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[scale] FAILED $name: ${e.getMessage}")
          s"""{"key":"$name","sec":-1}"""
      } finally graft.operators.Staging.releaseAll()
    }
    println(out.mkString("[", ",\n", "]"))
    spark.stop()
  }
}
