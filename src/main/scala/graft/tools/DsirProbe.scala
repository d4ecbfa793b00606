package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-cost probe for dsirSelect (kept out of the contract). */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale/rareC")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = new graft.model.Tables(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val docs = graft.operators.Staging.widen(t.documents)
    time("tokenize+count") {
      docs.select(size(graft.operators.TextAnalysis.tokens(col("text"))).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
    }
    time("explode grams") {
      docs.select(graft.operators.TextAnalysis.tokens(col("text")).as("_t"))
        .select(explode(graft.operators.Dedup.ngramsFromTokens(col("_t"), 2)).as("g"))
        .count()
    }
    time("explode grams + fp + bucket") {
      docs.select(graft.operators.TextAnalysis.tokens(col("text")).as("_t"))
        .select(explode(graft.operators.Dedup.ngramsFromTokens(col("_t"), 2)).as("g"))
        .select(pmod(graft.operators.TextAnalysis.fingerprint(col("g")), lit(4096L)).as("b"))
        .groupBy("b").count().count()
    }
    time("token fp arr (no concat)") {
      docs.select(transform(graft.operators.TextAnalysis.tokens(col("text")),
          tk => graft.operators.TextAnalysis.fingerprint(tk)).as("_f"))
        .select(explode(col("_f")).as("f")).agg(sum("f")).collect()(0).getLong(0)
    }
    spark.stop()
  }
}
