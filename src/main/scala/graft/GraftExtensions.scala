package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, Fingerprint64, NfcNormalize, SimHash64, UnicodeNormalize, VectorDot}

/** SparkSessionExtensions hook — the analogue of the reference's addon
  * system (`src/htsql/core/addon.py`): drop-in registration of the engine's
  * native functions into any Spark session, including plain `spark.sql`.
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Also registrable via config:
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VectorDot].getName, null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash of an array of token hashes"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((
      FunctionIdentifier("fingerprint64"),
      info("fingerprint64", "fingerprint64(text) - rolling-hash document fingerprint mod 1e9+7"),
      (args: Seq[Expression]) => Fingerprint64(args.head)))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition"),
      (args: Seq[Expression]) => NfcNormalize(args.head)))
    e.injectFunction((
      FunctionIdentifier("nfkc_normalize"),
      info("nfkc_normalize", "nfkc_normalize(text) - Unicode NFKC compatibility composition"),
      (args: Seq[Expression]) => UnicodeNormalize(args.head, "NFKC")))
  }
}
