package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.lang.{Parser, Planner}
import graft.model.Catalog

/** Public API — the analogue of the reference's embedded entry point
  * (`src/htsql/__init__.py` (HTSQL class): `HTSQL('pgsql:db')
  * .produce('/school')`).
  *
  * {{{
  * val g = Graft(spark, "/root/testdata/sf0.001")
  * g.query("/region{r_name, count(nation)}").show()
  * g.toJson(g.query("/nation.limit(3)"))
  * }}}
  */
final case class Graft(spark: SparkSession, dir: String, catalog: Catalog = Catalog.default) {

  /** Compile a navigational query to a DataFrame plan (lazy — no action). */
  def query(text: String): DataFrame =
    new Planner(spark, dir, catalog).planQuery(Parser.parse(text))

  /** Render a result the way the reference's JSON formatter does
    * (`src/htsql/core/fmt/json.py`): a list of records. Schema-driven —
    * nested segments (array-of-struct columns) nest naturally.
    */
  def toJson(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  /** CSV rendering (`src/htsql/core/fmt/csv.py`): header + rows. */
  def toCsv(df: DataFrame): String = {
    val header = df.columns.mkString(",")
    val rows = df.collect().map(_.toSeq.map {
      case null => ""
      case s: String if s.contains(",") || s.contains("\"") =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case v => v.toString
    }.mkString(","))
    (header +: rows).mkString("\n")
  }

  /** Plain-text table (`src/htsql/core/fmt/text.py`). */
  def toText(df: DataFrame, maxRows: Int = 100): String = {
    val rows = df.limit(maxRows).collect().map(_.toSeq.map {
      case null => ""
      case v => v.toString
    })
    val header = df.columns.toSeq
    val widths = (header +: rows.toSeq).transpose.map(_.map(_.length).max)
    def fmt(cells: Seq[String]) =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString(" | ")
    val sep = widths.map("-" * _).mkString("-+-")
    (fmt(header) +: sep +: rows.toSeq.map(fmt)).mkString("\n")
  }
}
