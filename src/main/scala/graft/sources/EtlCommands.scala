package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lang.{Ast, PlanError}
import graft.lang.Ast._
import graft.model.Catalog

/** Executor for the HTTP ETL command surface — the analogue of invoking
  * the reference's `tweak.etl` commands through the same `produce()` path
  * as reads (`src/htsql/tweak/etl/cmd/command.py`): a POSTed program like
  *
  *   /do(insert(region := {r_regionkey := 100, r_name := 'X'}),
  *       update(region?r_regionkey=0 := {r_comment := 'patched'}),
  *       delete(region[3]))
  *
  * runs as ONE [[Etl.transact]] transaction (one shadow generation, one
  * commit marker — later commands see earlier effects through the
  * overlay) and returns a per-command summary frame for the renderer.
  *
  * Command-position expressions are deliberately RESTRICTED to the
  * upstream surface's dominant shape: record fields take literal values,
  * targets take a bare table, a primary-key locator `t[id]`, or a sieve
  * of column ⋈ literal comparisons (`&`/`|`/`!` composable). Full
  * expression-valued updates go through the embedded [[Etl]] API — the
  * HTTP surface trades expressiveness for a value grammar whose plans
  * never need the planner's row scope.
  */
object EtlCommands {

  def isEtlAst(ast: Ast): Boolean = ast match {
    case Apply(n, _) => n.startsWith("__etl_")
    case _ => false
  }

  /** Execute one parsed command program as one transaction. */
  def execute(spark: SparkSession, dir: String, catalog: Catalog, ast: Ast): DataFrame = {
    val etl = new Etl(spark, dir)
    val done = scala.collection.mutable.ListBuffer[(String, String)]()
    etl.transact { tx => exec(spark, catalog, tx, ast, done) }
    import spark.implicits._
    done.toSeq.toDF("command", "table_name")
  }

  private def exec(spark: SparkSession, catalog: Catalog, tx: EtlTx, ast: Ast,
      done: scala.collection.mutable.ListBuffer[(String, String)]): Unit = ast match {
    case Apply("__etl_do", cmds) => cmds.foreach(exec(spark, catalog, tx, _, done))
    case Apply("__etl_insert", Seq(target, rec)) =>
      val t = bareTable(catalog, target)
      tx.insert(t, recordRow(spark, rec))
      done += (("insert", t))
    case Apply("__etl_merge", Seq(target, rec)) =>
      val t = bareTable(catalog, target)
      val keys = catalog.primaryKey(t)
      if (keys.isEmpty)
        throw new PlanError(s"merge needs a primary key on '$t'", target.pos)
      tx.merge(t, recordRow(spark, rec), keys)
      done += (("merge", t))
    case Apply("__etl_update", Seq(target, rec)) =>
      val (t, cond) = targetCondition(catalog, target)
      tx.update(t, cond, recordAssignments(rec))
      done += (("update", t))
    case Apply("__etl_delete", Seq(target)) =>
      val (t, cond) = targetCondition(catalog, target)
      tx.delete(t, cond)
      done += (("delete", t))
    case other => throw new PlanError("expected an ETL command", other.pos)
  }

  private def bareTable(catalog: Catalog, target: Ast): String = target match {
    case Ident(t) if catalog.isTable(t) => t
    case Ident(t) => throw new PlanError(s"unknown table '$t'", target.pos)
    case _ => throw new PlanError(
      "insert/merge target must be a bare table (rows are the record)", target.pos)
  }

  /** (table, row condition) for update/delete targets. */
  private def targetCondition(catalog: Catalog, target: Ast): (String, Column) =
    target match {
      case Ident(t) if catalog.isTable(t) => (t, lit(true))
      case Locator(Ident(t), ids) if catalog.isTable(t) =>
        val pk = catalog.primaryKey(t)
        if (pk.length != ids.length)
          throw new PlanError(
            s"locator arity ${ids.length} != primary key (${pk.mkString(", ")})", target.pos)
        // same string-space comparison the query locator uses: ids arrive
        // as text, the column casts to it (int pk 3 matches '3')
        (t, pk.zip(ids).map { case (k, v) => col(k).cast("string") === lit(v) }
          .reduce(_ && _))
      case Sieve(Ident(t), pred) if catalog.isTable(t) =>
        (t, condition(pred))
      case Ident(t) => throw new PlanError(s"unknown table '$t'", target.pos)
      case _ => throw new PlanError(
        "target must be a table, a locator t[id], or a sieve t?col=value", target.pos)
    }

  private def condition(pred: Ast): Column = pred match {
    case Apply("and", Seq(a, b)) => condition(a) && condition(b)
    case Apply("or", Seq(a, b)) => condition(a) || condition(b)
    case Apply("not", Seq(a)) => !condition(a)
    case Apply(op, Seq(l, r)) if cmp.contains(op) => cmp(op)(operand(l), operand(r))
    case _ => throw new PlanError(
      "ETL conditions are column/literal comparisons composed with &, |, !", pred.pos)
  }

  private val cmp: Map[String, (Column, Column) => Column] = Map(
    "=" -> (_ === _), "==" -> (_ === _),
    "!=" -> (_ =!= _), "!==" -> (_ =!= _),
    "<" -> (_ < _), "<=" -> (_ <= _), ">" -> (_ > _), ">=" -> (_ >= _))

  private def operand(ast: Ast): Column = ast match {
    case Ident(c) => col(c)
    case other => literal(other)
  }

  /** The restricted value grammar: literals only (typed casts happen at
    * the table seam — [[Etl.aligned]] for rows, `Column.cast` in update).
    */
  private def literal(ast: Ast): Column = ast match {
    case NumberLit(v) =>
      if (v.contains('.') || v.contains('e') || v.contains('E')) lit(v.toDouble)
      else lit(v.toLong)
    case StringLit(s) => lit(s)
    case Apply("neg", Seq(inner)) => -literal(inner)
    case Apply("true", Seq()) => lit(true)
    case Apply("false", Seq()) => lit(false)
    case Apply("null", Seq()) => lit(null)
    case other =>
      throw new PlanError("ETL record values must be literals", other.pos)
  }

  private def recordDefs(rec: Ast): Seq[(String, Ast)] = rec match {
    case Apply("__record", defs) => defs.map {
      case Apply("__def", Seq(StringLit(n), v)) => n -> v
      case other => throw new PlanError("record fields are 'name := value'", other.pos)
    }
    case other => throw new PlanError("expected a {name := value, ...} record", other.pos)
  }

  private def recordRow(spark: SparkSession, rec: Ast): DataFrame = {
    val defs = recordDefs(rec)
    spark.range(1).select(defs.map { case (n, v) => literal(v).as(n) }: _*)
  }

  private def recordAssignments(rec: Ast): Map[String, Column] =
    recordDefs(rec).map { case (n, v) => n -> literal(v) }.toMap
}
