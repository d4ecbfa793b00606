package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: prints the q_dedup_semantic gate row (n_strong,
  * precision_ok, recall_ok) for a data dir — the recall/precision
  * contract check at scales the driver's oracle never visits.
  */
object SemGate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q_dedup_semantic")(spark, dir).collect()
      .foreach(println)
    graft.operators.Staging.releaseAll()
    spark.stop()
  }
}
