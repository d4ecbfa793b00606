package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
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

  /** Shape arguments arrive as whatever literal the SQL author typed —
    * `42` binds as IntegerType where the kernel wants a Long, `array(1.0,
    * 0.0)` can carry DECIMAL elements — so raw asInstanceOf would throw
    * bare ClassCastExceptions on perfectly natural spellings (and a wrong
    * argument count a raw IndexOutOfBounds mid-analysis). Each shape arg
    * is therefore checked foldable and COERCED through Cast at bind time;
    * violations raise a message that names the function and position.
    */
  private def checkArity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")

  private def foldTo(name: String, args: Seq[Expression], pos: Int,
      dt: DataType): Any = {
    val arg = args(pos)
    if (!arg.foldable)
      throw new IllegalArgumentException(
        s"$name argument ${pos + 1} must be a literal (shape args are " +
          "evaluated once at bind time)")
    val v = Cast(arg, dt).eval()
    if (v == null)
      throw new IllegalArgumentException(
        s"$name argument ${pos + 1} is not castable to ${dt.simpleString}")
    v
  }

  private def foldInt(name: String, args: Seq[Expression], pos: Int): Int =
    foldTo(name, args, pos, IntegerType).asInstanceOf[Int]

  private def foldLong(name: String, args: Seq[Expression], pos: Int): Long =
    foldTo(name, args, pos, LongType).asInstanceOf[Long]

  private def foldDoubleArray(name: String, args: Seq[Expression],
      pos: Int): Array[Double] =
    foldTo(name, args, pos, ArrayType(DoubleType))
      .asInstanceOf[ArrayData].toDoubleArray()

  private def foldIntArray(name: String, args: Seq[Expression],
      pos: Int): Array[Int] =
    foldTo(name, args, pos, ArrayType(IntegerType))
      .asInstanceOf[ArrayData].toIntArray()

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
      (args: Seq[Expression]) => {
        val n = "hyperplane_sigs"
        checkArity(n, args, 5)
        graft.functions.HyperplaneSigs(args(0),
          foldInt(n, args, 1),
          foldInt(n, args, 2),
          foldInt(n, args, 3),
          foldLong(n, args, 4))
      }))
    e.injectFunction((
      FunctionIdentifier("centroid_top_cells"),
      info("centroid_top_cells",
        "centroid_top_cells(vec, flatCentroids, dim, r) - top-r nearest-centroid cell ids"),
      (args: Seq[Expression]) => {
        val n = "centroid_top_cells"
        checkArity(n, args, 4)
        graft.functions.CentroidTopCells(args(0),
          foldDoubleArray(n, args, 1),
          foldInt(n, args, 2),
          foldInt(n, args, 3))
      }))
    e.injectFunction((
      FunctionIdentifier("centroid_top_cells_nested"),
      info("centroid_top_cells_nested",
        "centroid_top_cells_nested(vec, groups, cells, offsets, ids, dim, probes, r) - two-level top-r cells"),
      (args: Seq[Expression]) => {
        val n = "centroid_top_cells_nested"
        checkArity(n, args, 8)
        graft.functions.CentroidTopCellsNested(args(0),
          foldDoubleArray(n, args, 1),
          foldDoubleArray(n, args, 2),
          foldIntArray(n, args, 3),
          foldIntArray(n, args, 4),
          foldInt(n, args, 5),
          foldInt(n, args, 6),
          foldInt(n, args, 7))
      }))
  }
}
