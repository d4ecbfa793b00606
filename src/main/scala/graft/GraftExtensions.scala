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
    // shape-arg kernels (the temp-function registry's remaining entries,
    // mirrored here so pure-SQL sessions get the FULL native kit): shape
    // args must be foldable literals, evaluated once at bind time
    e.injectFunction((
      FunctionIdentifier("hyperplane_sigs"),
      info("hyperplane_sigs",
        "hyperplane_sigs(vec, dim, numPlanes, numTables, seed) - per-table LSH signature array"),
      (args: Seq[Expression]) => graft.functions.HyperplaneSigs(args(0),
        args(1).eval().asInstanceOf[Int],
        args(2).eval().asInstanceOf[Int],
        args(3).eval().asInstanceOf[Int],
        args(4).eval().asInstanceOf[Long])))
    e.injectFunction((
      FunctionIdentifier("centroid_top_cells"),
      info("centroid_top_cells",
        "centroid_top_cells(vec, flatCentroids, dim, r) - top-r nearest-centroid cell ids"),
      (args: Seq[Expression]) => graft.functions.CentroidTopCells(args(0),
        args(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        args(2).eval().asInstanceOf[Int],
        args(3).eval().asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("centroid_top_cells_nested"),
      info("centroid_top_cells_nested",
        "centroid_top_cells_nested(vec, groups, cells, offsets, ids, dim, probes, r) - two-level top-r cells"),
      (args: Seq[Expression]) => graft.functions.CentroidTopCellsNested(args(0),
        args(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        args(2).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        args(3).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toIntArray(),
        args(4).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toIntArray(),
        args(5).eval().asInstanceOf[Int],
        args(6).eval().asInstanceOf[Int],
        args(7).eval().asInstanceOf[Int])))
  }
}
