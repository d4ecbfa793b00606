package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.functions.Ht

/** The reference's scalar-function library (SURVEY.md §2.8), grouped into
  * one benchmark query per category.
  *
  * Signatures from `src/htsql/core/tr/fn/signature.py`, bindings from
  * `src/htsql/core/tr/fn/bind.py`. All semantic traps are exercised here:
  * string `+` treats NULL as '', `~` is case-insensitive containment,
  * `head`/`tail`/`slice` take python-style negative indices, integer `/`
  * never truncates, `==` is null-safe. Everything composes codegen'd
  * built-ins — one narrow projection per query, no UDFs, so each stays a
  * single WholeStageCodegen span over the scan.
  */
object FunctionQueries extends QueryModule {

  def queries: Map[String, Q] = Map(
    // String kit: ConcatenateSig (NULL→''), UpperSig/LowerSig, LengthSig,
    // TrimSig, ReplaceSig, HeadSig/TailSig/SliceSig, ContainsSig (`~`).
    "q_fn_string" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.customer.select(
        col("c_custkey"),
        Ht.concat(col("c_name"), lit("|"), col("c_mktsegment")).as("tagged"),
        upper(col("c_mktsegment")).as("seg_up"),
        lower(col("c_name")).as("name_lo"),
        length(col("c_name")).as("name_len"),
        Ht.head(col("c_name"), lit(8)).as("head8"),
        Ht.tail(col("c_name"), lit(3)).as("tail3"),
        Ht.slice(col("c_name"), lit(9), lit(-3)).as("mid"),
        Ht.head(col("c_name"), lit(-10)).as("head_neg"),
        regexp_replace(col("c_name"), lit("Customer#"), lit("C")).as("short_name"),
        Ht.containsCI(col("c_mktsegment"), lit("Ware")).as("has_ware")
      ).orderBy("c_custkey")
    },

    // Date kit: TodaySig-family extractors (ExtractYearSig …), date
    // arithmetic (date ± int days, date − date → int). UTC everywhere.
    "q_fn_date" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.orders.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yy"),
        month(col("o_orderdate")).as("mm"),
        dayofmonth(col("o_orderdate")).as("dd"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).as("days_since"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30")
      ).orderBy("o_orderkey")
    },

    // Math kit: AddSig/SubtractSig/MultiplySig/DivideSig (int/int → exact,
    // never truncating — the §7.5 trap), RoundToSig (half away from zero via
    // exact decimal), abs/floor/ceil/sqrt/mod.
    "q_fn_math" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.lineitem.select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("net"),
        round(col("l_extendedprice").cast("decimal(18,4)"), 1).cast("double").as("price_r1"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        abs(col("l_quantity") - 25d).as("q_dev"),
        sqrt(col("l_quantity")).as("q_sqrt"),
        (col("l_partkey") % 7L).as("pk_mod"),
        Ht.div(col("l_orderkey"), col("l_linenumber")).as("int_ratio")
      ).orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    },

    // Null kit: IsNullSig, IfNullSig, NullIfSig; sieve-null semantics are
    // covered by q_sieve (NULL predicate drops the row).
    "q_fn_null" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val nb = nullif(col("c_mktsegment"), lit("BUILDING"))
      t.customer.select(
        col("c_custkey"),
        nb.isNull.as("was_building"),
        coalesce(nb, lit("NONE")).as("seg_or_none"),
        nullif(col("c_nationkey"), lit(3)).as("nat_not3"),
        (coalesce(nb, lit("")) === "").as("empty_eq")
      ).orderBy("c_custkey")
    },

    // Conditional kit: IfSig / SwitchSig → CASE chains; boolean 3VL ops
    // (AndSig/OrSig/NotSig) and null-safe total equality (`==`).
    "q_fn_cond" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val nb = nullif(col("o_orderstatus"), lit("O"))
      t.orders.select(
        col("o_orderkey"),
        Ht.htIf(
          Seq((col("o_totalprice") > 400000d, lit("big")),
            (col("o_totalprice") > 150000d, lit("mid"))),
          Some(lit("small"))).as("bucket"),
        Ht.htSwitch(col("o_orderpriority"),
          Seq(lit("1-URGENT") -> lit(1), lit("2-HIGH") -> lit(2)),
          Some(lit(9))).as("prio_code"),
        (nb.isNotNull && col("o_totalprice") > 250000d).as("and3vl"),
        (nb === "F" || col("o_totalprice") <= 250000d).as("or3vl"),
        Ht.totalEq(nb, lit(null).cast("string")).as("ns_eq_null")
      ).orderBy("o_orderkey")
    },

    // Time kit: TimeDomain (`time()` cast + hour/minute/second extractors)
    // as normalized 'HH:mm:ss' text — through the FULL language pipeline,
    // since time() is a binder feature. events.ts is µs-truncated
    // identically on both engines (Tables loader / DuckDB nanos read).
    "q_fn_time" -> { (s, dir) =>
      graft.Graft(s, dir).query(
        "/events{event_id, t := time(ts), h := hour(time(ts)), " +
          "m := minute(time(ts)), sec := second(time(ts)), " +
          "lt := time('07:08:09'), lh := hour(time('07:08:09'))}.sort(event_id)")
    },

    // Cast kit: BindCast family — text()/integer()/date() conversions.
    // (No double→text casts: engines format floats differently.)
    "q_fn_cast" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.orders.select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_txt"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("prio_int"),
        to_date(col("o_orderdate")).as("as_date"),
        col("o_totalprice").cast("long").as("price_int")
      ).orderBy("o_orderkey")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT c_custkey,
           coalesce(c_name,'') || '|' || coalesce(c_mktsegment,'') AS tagged,
           upper(c_mktsegment) AS seg_up,
           lower(c_name) AS name_lo,
           length(c_name) AS name_len,
           substr(c_name, 1, least(8, length(c_name))) AS head8,
           substr(c_name, length(c_name) - least(3, length(c_name)) + 1,
                  least(3, length(c_name))) AS tail3,
           substr(c_name, least(9, length(c_name)) + 1,
                  greatest(greatest(length(c_name) - 3, 0) - least(9, length(c_name)), 0)) AS mid,
           substr(c_name, 1, greatest(length(c_name) - 10, 0)) AS head_neg,
           replace(c_name, 'Customer#', 'C') AS short_name,
           contains(lower(c_mktsegment), lower('Ware')) AS has_ware
         FROM customer ORDER BY c_custkey""",
    "q_fn_date" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yy,
           CAST(month(o_orderdate) AS INTEGER) AS mm,
           CAST(day(o_orderdate) AS INTEGER) AS dd,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
           CAST(o_orderdate AS DATE) + 30 AS plus30
         FROM orders ORDER BY o_orderkey""",
    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           l_extendedprice * (1.0 - l_discount) AS net,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)), 1) AS DOUBLE) AS price_r1,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           abs(l_quantity - 25.0) AS q_dev,
           sqrt(l_quantity) AS q_sqrt,
           l_partkey % 7 AS pk_mod,
           CAST(l_orderkey AS DOUBLE) / CAST(l_linenumber AS DOUBLE) AS int_ratio
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",
    "q_fn_null" ->
      """SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') IS NULL AS was_building,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS seg_or_none,
           nullif(c_nationkey, 3) AS nat_not3,
           coalesce(nullif(c_mktsegment, 'BUILDING'), '') = '' AS empty_eq
         FROM customer ORDER BY c_custkey""",
    "q_fn_cond" ->
      """SELECT o_orderkey,
           CASE WHEN o_totalprice > 400000 THEN 'big'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                ELSE 9 END AS prio_code,
           (nullif(o_orderstatus,'O') IS NOT NULL AND o_totalprice > 250000) AS and3vl,
           (nullif(o_orderstatus,'O') = 'F' OR o_totalprice <= 250000) AS or3vl,
           (nullif(o_orderstatus,'O') IS NOT DISTINCT FROM NULL) AS ns_eq_null
         FROM orders ORDER BY o_orderkey""",
    "q_fn_time" ->
      """SELECT event_id,
           strftime(ts, '%H:%M:%S') AS t,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(minute(ts) AS INTEGER) AS m,
           CAST(second(ts) AS INTEGER) AS sec,
           '07:08:09' AS lt,
           CAST(7 AS INTEGER) AS lh
         FROM events ORDER BY event_id""",
    "q_fn_cast" ->
      """SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_txt,
           CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_int,
           CAST(o_orderdate AS DATE) AS as_date,
           CAST(trunc(o_totalprice) AS BIGINT) AS price_int
         FROM orders ORDER BY o_orderkey"""
  )
}
