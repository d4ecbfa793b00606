package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables
import graft.functions.Ht

/** The reference's core relational operator inventory (SURVEY.md §2.1–2.7),
  * re-expressed Spark-first.
  *
  * Each query is the Spark plan the reference's compiler pipeline
  * (bind → encode → compile, `src/htsql/core/tr/`) would produce for the
  * corresponding navigational query, built declaratively on the public
  * DataFrame API so Catalyst owns pushdown/pruning/join strategy:
  * dimension joins broadcast automatically, linked aggregates become
  * partial+final hash aggregates, top-k becomes `TakeOrderedAndProject`.
  */
object CoreQueries extends QueryModule {

  def queries: Map[String, Q] = Map(
    // ---- §2.1 scans -----------------------------------------------------
    // `/lineitem` — TableArc → TableTerm (src/htsql/core/tr/term.py
    // (TableTerm)). A bare parquet scan; ordering only for the oracle diff.
    "q_scan_table" -> { (s, dir) =>
      val t = new Tables(s, dir)
      // NOTE: (l_orderkey, l_linenumber) is not unique in the synthetic data;
      // adding (l_partkey, l_suppkey) gives a verified total order.
      t.lineitem.orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    },

    // ---- §2.2 projection / sieve / calc ---------------------------------
    // `/customer{c_custkey, c_name, c_acctbal}` — SelectionBinding
    // (src/htsql/core/tr/binding.py (SelectionBinding)).
    "q_select" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.customer.select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey")
    },

    // `/orders?o_totalprice>400000` — SieveBinding → FilteredSpace →
    // FilterTerm; NULL predicate drops the row, same as Spark `filter`.
    "q_sieve" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.orders
        .filter(col("o_totalprice") > 400000d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
    },

    // `define(net := o_totalprice*(1-0.05)) /orders{o_orderkey, net}?net>380000`
    // — BindDefine / calculated attributes (src/htsql/core/tr/bind.py
    // (BindDefine)); the definition is inlined into the plan, so Catalyst
    // still pushes the derived predicate down to the scan.
    "q_calc" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.orders
        .withColumn("net", col("o_totalprice") * lit(0.95d))
        .filter(col("net") > 380000d)
        .select("o_orderkey", "net")
        .orderBy("o_orderkey")
    },

    // ---- §2.3 joins (navigation) ----------------------------------------
    // `/lineitem{l_orderkey, l_linenumber, order.o_orderdate}` — DirectJoin
    // child→parent (src/htsql/core/entity.py (DirectJoin)); FK is non-null
    // so the reference emits INNER. orders is the small side at any scale
    // ratio Catalyst sees; AQE/broadcast handles strategy.
    "q_join_singular" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_orderdate")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // `/region{r_name, count(nation)}` — the flagship slice (SURVEY.md §7.2):
    // ReverseJoin plural navigation + linked aggregate (AggregateUnit in
    // src/htsql/core/tr/space.py). Pattern: aggregate the child on its FK
    // (map-side partial agg), then left-join back to the parent and
    // null-fill — the parent side broadcasts.
    "q_join_plural_agg" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val agg = t.nation.groupBy(col("n_regionkey")).agg(count(lit(1)).as("cnt"))
      t.region
        .join(agg, col("r_regionkey") === col("n_regionkey"), "left")
        .select(col("r_regionkey"), col("r_name"),
          coalesce(col("cnt"), lit(0L)).as("n_nations"))
        .orderBy("r_regionkey")
    },

    // `/customer{c_name, nation.region.r_name}` — ChainArc multi-hop
    // (src/htsql/core/model.py (ChainArc)): one equi-join per hop; both
    // dims broadcast, so the chain costs zero shuffles.
    "q_join_chain" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "c_name", "r_name")
        .orderBy("c_custkey")
    },

    // `/customer?exists(events)` — ExistsSig quantifier → correlated unit
    // (src/htsql/core/tr/fn/signature.py (ExistsSig)); decorrelated to a
    // LEFT SEMI join rather than the reference's EXISTS subquery.
    "q_semijoin" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.customer
        .join(t.events.select(col("user_id")), col("c_custkey") === col("user_id"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // `/customer?!exists(events)` — NOT EXISTS → LEFT ANTI join.
    "q_antijoin" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.customer
        .join(t.events.select(col("user_id")), col("c_custkey") === col("user_id"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // `/part?p_retailprice > avg(fork(p_brand).p_retailprice)` — ForkedSpace
    // (src/htsql/core/tr/space.py (ForkedSpace)): correlate a flow with a
    // copy of itself on the same axis. A window aggregate avoids the
    // self-join entirely — one shuffle on the kernel instead of two.
    "q_fork" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val w = Window.partitionBy(col("p_brand"))
      val brandAvg = (sum(col("p_retailprice").cast("decimal(30,2)")).over(w)
        .cast("double") / count(lit(1)).over(w))
      t.part
        .withColumn("brand_avg", brandAvg)
        .filter(col("p_retailprice") > col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    },

    // `/nation[7]{n_nationkey, n_name}` — identity locator
    // (src/htsql/core/tr/bind.py (BindLocator), IdentityDomain in
    // src/htsql/core/domain.py): PK-equality filter, pushed to the scan.
    "q_locator" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.nation.filter(col("n_nationkey") === 7).select("n_nationkey", "n_name")
    },

    // Composite-PK locator `/lineitem[3.2]` (IdentityDomain dotted literal).
    "q_locator_composite" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.lineitem
        .filter(col("l_orderkey") === 3L && col("l_linenumber") === 2)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    },

    // ---- §2.4 linked aggregates & quotient ------------------------------
    // `/customer{c_custkey, count(orders)}` — CountSig linked aggregate:
    // every HTSQL aggregate is grouped by the enclosing scope's axis.
    "q_agg_count" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val agg = t.orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      t.customer
        .join(agg, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
        .orderBy("c_custkey")
    },

    // `/nation{n_name, sum/avg/min/max(customer.c_acctbal)}` — SumSig /
    // AvgSig / MinMaxSig. Empty plural → NULL (not 0) for sum/avg/min/max,
    // which the left join preserves. Decimal-exact sums: see Ht.dsum.
    "q_agg_sum_avg" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val agg = t.customer.groupBy(col("c_nationkey")).agg(
        Ht.dsum(col("c_acctbal")).as("sum_bal"),
        Ht.davg(col("c_acctbal")).as("avg_bal"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"))
      t.nation
        .join(agg, col("n_nationkey") === col("c_nationkey"), "left")
        .select("n_nationkey", "n_name", "sum_bal", "avg_bal", "min_bal", "max_bal")
        .orderBy("n_nationkey")
    },

    // `exists/any/every` boolean quantifiers over a plural flow
    // (QuantifySig family): empty plural ⇒ exists/any = false, every = true.
    "q_agg_exists_every_any" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val agg = t.orders.groupBy(col("o_custkey")).agg(
        bool_or(col("o_totalprice") > 400000d).as("b_any"),
        bool_and(col("o_orderstatus") === "F").as("b_every"),
        count(lit(1)).as("cnt"))
      t.customer
        .join(agg, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("cnt") > 0, lit(false)).as("has_orders"),
          coalesce(col("b_any"), lit(false)).as("any_big"),
          coalesce(col("b_every"), lit(true)).as("every_final"))
        .orderBy("c_custkey")
    },

    // `/(orders^o_orderpriority){o_orderpriority, count(^), sum(^.o_totalprice)}`
    // — QuotientSpace/ComplementSpace (src/htsql/core/tr/space.py
    // (QuotientSpace, KernelUnit)): the quotient row IS the group; complement
    // aggregates are ordinary aggregates in the same groupBy — a single
    // partial+final hash aggregate, no join-back needed.
    "q_quotient" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.orders
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), Ht.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },

    // `distinct(orders{o_orderpriority})` — function form of the quotient
    // (src/htsql/core/tr/fn/bind.py (BindDistinct)).
    "q_distinct" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.orders.select("o_orderpriority").distinct().orderBy("o_orderpriority")
    },

    // ---- §2.5 per-group top-k ------------------------------------------
    // `top(orders.sort(o_totalprice-), 2)` per customer — BindTop
    // (src/htsql/core/tr/fn/bind.py (BindTop)); rank-filter over a window,
    // exactly the shape the reference's Oracle backend emits for LIMIT
    // emulation (src/htsql_oracle/core/tr/dump.py).
    "q_topk_group" -> { (s, dir) =>
      val t = new Tables(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t.orders
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    },

    // ---- §2.6 sort / limit ----------------------------------------------
    // `/part.sort(p_retailprice-)` — OrderedSpace → OrderTerm; tie-broken
    // by PK for a total order (SURVEY.md §5 determinism rule).
    "q_sort" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.part
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    },

    // `/part.sort(p_retailprice-).limit(10, 5)` — limit+skip on an ordered
    // flow; Catalyst plans global sort+limit as TakeOrderedAndProject (no
    // full sort materialization).
    "q_limit" -> { (s, dir) =>
      val t = new Tables(s, dir)
      t.part
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        .offset(5)
        .limit(10)
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_scan_table" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey",
    "q_select" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey",
    "q_sieve" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
         FROM orders WHERE o_totalprice > 400000 ORDER BY o_orderkey""",
    "q_calc" ->
      """SELECT o_orderkey, o_totalprice * 0.95 AS net FROM orders
         WHERE o_totalprice * 0.95 > 380000 ORDER BY o_orderkey""",
    "q_join_singular" ->
      """SELECT l_orderkey, l_linenumber, o_orderdate
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ORDER BY l_orderkey, l_linenumber""",
    "q_join_plural_agg" ->
      """SELECT r_regionkey, r_name, count(n_nationkey) AS n_nations
         FROM region LEFT JOIN nation ON n_regionkey = r_regionkey
         GROUP BY r_regionkey, r_name ORDER BY r_regionkey""",
    "q_join_chain" ->
      """SELECT c_custkey, c_name, r_name
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "q_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
         ORDER BY c_custkey""",
    "q_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
         ORDER BY c_custkey""",
    "q_fork" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM (
           SELECT p_partkey, p_brand, p_retailprice,
             CAST(sum(CAST(p_retailprice AS DECIMAL(30,2))) OVER (PARTITION BY p_brand) AS DOUBLE)
               / count(*) OVER (PARTITION BY p_brand) AS brand_avg
           FROM part)
         WHERE p_retailprice > brand_avg ORDER BY p_partkey""",
    "q_locator" ->
      "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey = 7",
    "q_locator_composite" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
         WHERE l_orderkey = 3 AND l_linenumber = 2
         ORDER BY l_orderkey, l_linenumber, l_partkey""",
    "q_agg_count" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_agg_sum_avg" ->
      """SELECT n_nationkey, n_name,
           CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS sum_bal,
           CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / count(c_acctbal) AS avg_bal,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal
         FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
         GROUP BY n_nationkey, n_name ORDER BY n_nationkey""",
    "q_agg_exists_every_any" ->
      """SELECT c_custkey,
           coalesce(count(o_orderkey) > 0, false) AS has_orders,
           coalesce(bool_or(o_totalprice > 400000), false) AS any_big,
           coalesce(bool_and(o_orderstatus = 'F'), true) AS every_final
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_quotient" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    "q_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders)
         WHERE rk <= 2 ORDER BY o_custkey, rk""",
    "q_sort" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         ORDER BY p_retailprice DESC, p_partkey ASC""",
    "q_limit" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10 OFFSET 5"""
  )
}
