package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: is LM transition-count construction O(tokens) per document?
  *
  * Holds the TOTAL token count fixed (~4M) while growing the per-document
  * length L — an O(len) construction shows flat wall time across rows; an
  * O(len²) one (the pre-r13 `element_at(tokenize(...), i)`-in-lambda form,
  * or any form that re-evaluates the tokenizer expression per element)
  * grows linearly in L. Synthetic corpus: deterministic pseudo-words so
  * the model tables stay small and the measurement isolates the
  * construction pass. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.LmLongDoc [len ...]   (default 500 2000 8000)
  */
object LmLongDoc {
  def main(args: Array[String]): Unit = {
    val lens = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(500, 2000, 8000)
    val totalTokens = 4L * 1000 * 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    lens.foreach { len =>
      val nDocs = (totalTokens / len).toInt
      // ~1000-word vocabulary, position-dependent so bigrams vary
      val docs = spark.range(nDocs.toLong).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(len - 1)),
          i => concat(lit("w"), pmod(col("id") * 31 + i * 7, lit(997)).cast("string"))))
          .as("text"))
        .repartition(cpus.toInt)
      // warm (staging cache + codegen), then two measured runs → min
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.operators.LanguageModel.lmScore(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
        graft.operators.Staging.releaseAll()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val s = Seq(run(), run()).min
      println(f"len=$len%5d docs=$nDocs%7d lmScore_sec=$s%.3f")
    }
    spark.stop()
  }
}
