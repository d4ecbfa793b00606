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
final case class Graft(spark: SparkSession, dir: String, catalog: Catalog = Catalog.default,
    autoLimit: Option[Int] = None, format: String = "parquet") {

  /** Compile a navigational query to a DataFrame plan (lazy — no action).
    * `autoLimit` mirrors the reference's `tweak.autolimit` addon: an
    * implicit LIMIT injected into every query (interactive safety net).
    */
  def query(text: String): DataFrame = {
    val df = compile(text, Parser.parse(text))
    autoLimit.fold(df)(df.limit)
  }

  /** Plan with positioned errors: parse/bind failures re-throw with the
    * query text and a caret under the offending token (ErrorMark), so
    * errors are self-contained in logs and REPL transcripts.
    */
  private def compile(text: String, ast: graft.lang.Ast): DataFrame =
    try new Planner(spark, dir, catalog, format).planQuery(ast)
    catch {
      case e: graft.lang.PlanError =>
        throw new graft.lang.PlanError(
          graft.lang.ErrorMark(e.getMessage, text, e.pos), e.pos)
    }

  /** Render a result the way the reference's JSON formatter does
    * (`src/htsql/core/fmt/json.py`): a list of records. Schema-driven —
    * nested segments (array-of-struct columns) nest naturally. `maxRows`
    * bounds the driver-side collect like the other renderers; full exports
    * go through [[writeJson]], which never collects.
    */
  def toJson(df: DataFrame, maxRows: Int = 10000): String =
    df.limit(maxRows).toJSON.collect().mkString("[", ",", "]")

  /** CSV rendering (`src/htsql/core/fmt/csv.py`): header + rows. Bounded by
    * `maxRows` (full exports: [[writeCsv]]).
    */
  def toCsv(df: DataFrame, maxRows: Int = 10000): String = {
    val header = df.columns.mkString(",")
    val rows = df.limit(maxRows).collect().map(_.toSeq.map {
      case null => ""
      case s: String if s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r') =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case v => v.toString
    }.mkString(","))
    (header +: rows).mkString("\n")
  }

  /** Full-result JSON-lines export — distributed `df.write`, nothing ever
    * reaches the driver (the scale path the in-memory renderers cap away).
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Full-result CSV export (header included), distributed like
    * [[writeJson]]. Nested segment columns are JSON-encoded first — Spark's
    * CSV sink rejects array/struct columns.
    */
  def writeCsv(df: DataFrame, path: String): Unit = {
    val flat = df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType =>
          d.withColumn(f.name, org.apache.spark.sql.functions.to_json(df(f.name)))
        case _ => d
      }
    }
    flat.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** Queryable model catalog — the analogue of the reference's `tweak.meta`
    * addon (catalog-as-database): tables, columns, and links as DataFrames
    * you can join and filter like any other data.
    */
  def metaTables: DataFrame = {
    import spark.implicits._
    catalog.tables.map(t => (t.name, t.primaryKey.mkString(",")))
      .toDF("table_name", "primary_key")
  }

  def metaColumns: DataFrame = {
    import spark.implicits._
    val tables = new graft.model.Tables(spark, dir, format) // handles events ts nanos
    catalog.tables.flatMap { t =>
      tables(t.name).schema.fields.map { f =>
        (t.name, f.name, f.dataType.simpleString, f.nullable)
      }
    }.toDF("table_name", "column_name", "data_type", "nullable")
  }

  def metaLinks: DataFrame = {
    import spark.implicits._
    catalog.links.map(l => (l.childTable, l.childCols.mkString(","),
      l.parentTable, l.parentCols.mkString(","), l.directLabel, l.reverseLabel))
      .toDF("child_table", "child_columns", "parent_table", "parent_columns",
        "direct_label", "reverse_label")
  }

  /** HTML table rendering (`src/htsql/core/fmt/html.py`): a minimal
    * standalone page with the result as a styled table, values escaped.
    */
  def toHtml(df: DataFrame, maxRows: Int = 10000): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val head = df.columns.map(c => s"<th>${esc(c)}</th>").mkString
    val body = df.limit(maxRows).collect().map { r =>
      r.toSeq.map {
        case null => "<td class=\"null\"></td>"
        case v => s"<td>${esc(v.toString)}</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>graft result</title>
       |<style>table{border-collapse:collapse}td,th{border:1px solid #999;padding:2px 6px}td.null{background:#eee}</style>
       |</head><body><table>
       |<thead><tr>$head</tr></thead>
       |<tbody>
       |$body
       |</tbody></table></body></html>""".stripMargin
  }

  /** XML rendering: `<result><row><col>v</col>…</row>…</result>`, values
    * escaped; NULL renders as a self-closed tag with `null="true"` so it
    * stays distinguishable from the empty string.
    */
  def toXml(df: DataFrame, maxRows: Int = 10000): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val cols = df.columns
    val rows = df.limit(maxRows).collect().map { r =>
      cols.zip(r.toSeq).map {
        case (c, null) => s"  <$c null=\"true\"/>"
        case (c, v) => s"  <$c>${esc(v.toString)}</$c>"
      }.mkString(" <row>\n", "\n", "\n </row>")
    }.mkString("\n")
    s"<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<result>\n$rows\n</result>"
  }

  /** Run a query WITH its optional format decorator (`/query/:json`) and
    * render — the parser owns the decorator (reference: `summon.py`
    * format commands), not the caller.
    */
  def render(text: String): String = renderWithFormat(text)._1

  /** [[render]] with a caller-supplied DEFAULT format (the HTTP server's
    * Accept-header fallback) and the chosen format returned alongside the
    * body — the parser-owned `/:fmt` decorator always wins over the
    * default.
    */
  def renderWithFormat(text: String, defaultFmt: String = "txt"): (String, String) = {
    val (ast, fmt) = Parser.parseCommand(text)
    val df = {
      val d = compile(text, ast)
      autoLimit.fold(d)(d.limit)
    }
    renderDf(df, fmt.getOrElse(defaultFmt))
  }

  /** Execute an ETL command program (the POST surface — upstream routes
    * `tweak.etl` writes through the same produce() path as reads) and
    * render the per-command summary. One program = ONE transaction
    * against this engine's own data directory.
    */
  def renderEtl(text: String, defaultFmt: String = "txt"): (String, String) = {
    val (ast, fmt) = Parser.parseEtl(text)
    val df =
      try graft.sources.EtlCommands.execute(spark, dir, catalog, ast)
      catch {
        case e: graft.lang.PlanError =>
          // same caret-marked excerpt the read path attaches in compile()
          throw new graft.lang.PlanError(
            graft.lang.ErrorMark(e.getMessage, text, e.pos), e.pos)
      }
    renderDf(df, fmt.getOrElse(defaultFmt))
  }

  private def renderDf(df: DataFrame, fmt: String): (String, String) =
    fmt match {
      case "json" => (toJson(df), "json")
      case "csv" => (toCsv(df), "csv")
      case "html" => (toHtml(df), "html")
      case "xml" => (toXml(df), "xml")
      case "txt" | "text" => (toText(df), "txt")
      case other => throw new graft.lang.ParseError(s"unknown format ':$other'", 0)
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
