package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Foreign-key link between two tables.
  *
  * Mirrors the reference's link model: `src/htsql/core/entity.py`
  * (`ForeignKeyEntity`, `DirectJoin`, `ReverseJoin`) — a direct join is the
  * child→parent (singular) traversal, the reverse join is parent→child
  * (plural). Labels are derived the way `src/htsql/core/classify.py`
  * (`classify`) derives them from FK names (FIXTURES.md §3 declares them
  * explicitly because parquet carries no FK metadata).
  *
  * @param nullable if the FK column is nullable the singular traversal is a
  *                 LEFT OUTER join, else INNER (reference: `JoinTerm.is_left`
  *                 in `src/htsql/core/tr/term.py`).
  */
final case class Link(
    childTable: String,
    childCols: Seq[String],
    parentTable: String,
    parentCols: Seq[String],
    directLabel: String,
    reverseLabel: String,
    nullable: Boolean = false
)

/** Table metadata: name + primary key (asserted, not enforced — reference:
  * `PrimaryKeyEntity` in `src/htsql/core/entity.py`).
  */
final case class TableDef(name: String, primaryKey: Seq[String])

/** Enum column declaration (reference: `EnumDomain` in
  * `src/htsql/core/domain.py` — a text column restricted to a label list).
  * Parquet has no enum metadata, so labels are declared here; the binder
  * validates string literals compared against the column at bind time.
  */
final case class EnumDef(table: String, column: String, labels: Seq[String])

/** The engine's catalog/model graph: tables, primary keys, FK links.
  *
  * Replaces the reference's introspection + model graph
  * (`src/htsql/core/introspect.py`, `src/htsql/core/model.py` — `TableNode`,
  * `TableArc`, `ChainArc`, `ColumnArc`). Spark's own catalog has no FK
  * metadata, which HTSQL navigation requires, so we keep our own registry.
  * Column types come from parquet footers at load time.
  */
final class Catalog(val tables: Seq[TableDef], val links: Seq[Link],
    val enums: Seq[EnumDef] = Seq.empty) {
  private val byName: Map[String, TableDef] = tables.map(t => t.name -> t).toMap
  private val enumsByCol: Map[(String, String), Seq[String]] =
    enums.map(e => (e.table, e.column) -> e.labels).toMap

  /** Labels of a declared enum column, if any. */
  def enumLabels(table: String, column: String): Option[Seq[String]] =
    enumsByCol.get((table, column))

  def table(name: String): TableDef =
    byName.getOrElse(name, throw new IllegalArgumentException(s"unknown table: $name"))

  def primaryKey(name: String): Seq[String] = table(name).primaryKey

  /** Singular (child→parent) link reachable from `table` under `label`. */
  def directLink(table: String, label: String): Option[Link] =
    links.find(l => l.childTable == table && l.directLabel == label)

  /** Plural (parent→child) link reachable from `table` under `label`. */
  def reverseLink(table: String, label: String): Option[Link] =
    links.find(l => l.parentTable == table && l.reverseLabel == label)

  def isTable(name: String): Boolean = byName.contains(name)
}

/** The fixed catalog over the driver's parquet tables (FIXTURES.md §2-3). */
object Catalog {
  val default: Catalog = new Catalog(
    tables = Seq(
      TableDef("region", Seq("r_regionkey")),
      TableDef("nation", Seq("n_nationkey")),
      TableDef("customer", Seq("c_custkey")),
      TableDef("supplier", Seq("s_suppkey")),
      TableDef("part", Seq("p_partkey")),
      TableDef("orders", Seq("o_orderkey")),
      TableDef("lineitem", Seq("l_orderkey", "l_linenumber")),
      TableDef("events", Seq("event_id")),
      TableDef("documents", Seq("doc_id")),
      TableDef("embeddings", Seq("vec_id"))
    ),
    links = Seq(
      Link("nation", Seq("n_regionkey"), "region", Seq("r_regionkey"), "region", "nation"),
      Link("customer", Seq("c_nationkey"), "nation", Seq("n_nationkey"), "nation", "customer"),
      Link("supplier", Seq("s_nationkey"), "nation", Seq("n_nationkey"), "nation", "supplier"),
      Link("orders", Seq("o_custkey"), "customer", Seq("c_custkey"), "customer", "orders"),
      Link("lineitem", Seq("l_orderkey"), "orders", Seq("o_orderkey"), "order", "lineitem"),
      Link("lineitem", Seq("l_partkey"), "part", Seq("p_partkey"), "part", "lineitem"),
      Link("lineitem", Seq("l_suppkey"), "supplier", Seq("s_suppkey"), "supplier", "lineitem"),
      Link("events", Seq("user_id"), "customer", Seq("c_custkey"), "customer", "events")
    ),
    enums = Seq(
      EnumDef("orders", "o_orderstatus", Seq("F", "O", "P")),
      EnumDef("customer", "c_mktsegment",
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
      EnumDef("lineitem", "l_returnflag", Seq("A", "N", "R")),
      EnumDef("lineitem", "l_linestatus", Seq("F", "O"))
    )
  )
}

/** Lazy table loader over a scale-factor directory of data files.
  *
  * Replaces the reference's backend connection (`src/htsql/core/connect.py`)
  * — instead of a DBAPI socket, tables are columnar scans that Catalyst
  * prunes and pushes filters into. At cluster scale each table is a
  * directory of many files; `spark.read` parallelizes per file-split, so
  * nothing here assumes single-file inputs.
  *
  * `format` = "parquet" (default) or "csv" — the csv path is the analogue
  * of the reference's `tweak.filedb` addon (mount CSV files as a database,
  * `src/htsql/tweak/filedb/`): header row + schema inference.
  */
final class Tables(val spark: SparkSession, val dir: String,
    val format: String = "parquet") {
  // Native-kernel registration is idempotent and cheap; doing it here means
  // every query path that touches data has the engine's functions in scope.
  graft.functions.VectorFunctions.ensureRegistered(spark)

  private val cache = scala.collection.mutable.HashMap.empty[String, DataFrame]

  def apply(name: String): DataFrame =
    cache.getOrElseUpdate(name, format match {
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(s"$dir/$name.csv")
      case "json" => // JSON-lines mounts (tweak.filedb analogue, like csv)
        spark.read.json(s"$dir/$name.jsonl")
      case _ =>
        if (name == "events")
          Tables.normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
        else spark.read.parquet(s"$dir/$name.parquet")
    })

  def region: DataFrame = apply("region")
  def nation: DataFrame = apply("nation")
  def customer: DataFrame = apply("customer")
  def supplier: DataFrame = apply("supplier")
  def part: DataFrame = apply("part")
  def orders: DataFrame = apply("orders")
  def lineitem: DataFrame = apply("lineitem")
  def events: DataFrame = apply("events")
  def documents: DataFrame = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}

object Tables {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Normalize `events.ts` to session-zoned TimestampType whatever the
    * parquet encoding was. Fixture generators have shipped this column
    * three ways: plain INT64 epoch-nanos (and TIMESTAMP(NANOS) read under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which also surfaces as
    * LongType) → truncate to micros with integral `div` (an epoch-nanos
    * value exceeds double precision); TIMESTAMP(MICROS, isAdjustedToUTC
    * =false) → TIMESTAMP_NTZ under Spark's NTZ inference, cast to
    * TimestampType (sessions run UTC, so wall-clock == instant and the
    * DuckDB oracle's `epoch(ts)` agrees); already-zoned timestamps pass
    * through. Downstream code sees one type regardless of fixture vintage.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }
}
