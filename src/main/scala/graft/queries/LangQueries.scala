package graft.queries

import org.apache.spark.sql.functions._
import graft.Graft

/** Driver-checked queries that run through the FULL language pipeline —
  * query text → lexer → parser → binder/planner → DataFrame — rather than
  * hand-built DataFrame code. These lock the navigational language itself
  * to the DuckDB oracle, the way the reference's regression suite locks
  * query text to golden rows (`test/regress.yaml`).
  */
object LangQueries extends QueryModule {

  private def q(text: String): Q = (s, dir) => Graft(s, dir).query(text)

  def queries: Map[String, Q] = Map(
    // the §7.2 flagship slice through the language front end
    "q_htsql_flagship" -> q(
      "/region{r_regionkey, r_name, n_nations := count(nation)}.sort(r_regionkey)"),

    "q_htsql_sieve" -> q(
      "/orders?o_totalprice>400000{o_orderkey, o_custkey, o_totalprice}.sort(o_orderkey)"),

    "q_htsql_chain" -> q(
      "/customer{c_custkey, c_name, r_name := nation.region.r_name}.sort(c_custkey)"),

    "q_htsql_filtered_agg" -> q(
      "/customer{c_custkey, n_big := count(orders?o_totalprice>400000)}.sort(c_custkey)"),

    "q_htsql_quotient" -> q(
      "/(orders^o_orderpriority){o_orderpriority, n_orders := count(^), " +
        "sum_price := sum(^.o_totalprice)}.sort(o_orderpriority)"),

    "q_htsql_exists" -> q(
      "/customer?exists(events){c_custkey, c_name}.sort(c_custkey)"),

    "q_htsql_define" -> q(
      "/orders.define(net := o_totalprice*0.95)?net>380000{o_orderkey, net}.sort(o_orderkey)"),

    "q_htsql_twohop_agg" -> q(
      "/region{r_regionkey, n_cust := count(nation.customer), " +
        "avg_bal := avg(nation.customer.c_acctbal)}.sort(r_regionkey)"),

    // given(): expression-local scoped let (reference: BindGiven)
    "q_htsql_given" -> q(
      "/customer{c_custkey, n_big := given(count(orders?o_totalprice>$cap), " +
        "cap := 400000)}.sort(c_custkey)"),

    // @: detached (root-scope) flow inside an aggregate — uncorrelated
    // global aggregate broadcast onto the axis (reference: AttachSpace)
    "q_htsql_attach" -> q(
      "/region{r_regionkey, r_name, n_here := count(nation), " +
        "n_all := count(@nation), " +
        "n_big_orders := count(@orders?o_totalprice>400000)}.sort(r_regionkey)"),

    // root-scope query: scalar aggregates with no table axis
    "q_htsql_root" -> q(
      "/{n_regions := count(region), n_big := count(orders?o_totalprice>400000), " +
        "total := sum(orders.o_totalprice)}"),

    // id() + singular-link-as-identity, driver-checked
    "q_htsql_id" -> q(
      "/customer{c_custkey, key := id(), nat := nation}.sort(c_custkey)"),

    // post-projection scopes carry the FULL scalar-function surface
    // (unified binder): scalar kit inside a sieve AFTER `{…}`, and a
    // computed sort key over the projected columns (round-3 item #1)
    "q_htsql_postproj" -> q(
      "/customer{c_custkey, nm := upper(c_name), seg := lower(c_mktsegment)}" +
        "?length(nm)>12&seg!='building'" +
        ".sort(replace(nm,'CUSTOMER#',''))"),

    // selection decorates output, the scope SURVIVES (round-4 parity):
    // the sieve references an UN-selected base column and navigates a
    // singular chain AFTER `{…}` — both only visible because the table
    // scope outlives the selection, as in the reference
    "q_htsql_selscope" -> q(
      "/customer{c_custkey, seg := c_mktsegment}" +
        "?c_acctbal>0&nation.region.r_name='ASIA'.sort(c_custkey)"),

    // round-5 alias semantics, driver-gated end-to-end: a self-referencing
    // alias applies ONCE, a cross-referencing item binds at the selection
    // site, and a later define() drives the sieve without rewriting the
    // chosen output (the selector binds where it appears). The sort sits
    // BEFORE the define: after it, b rebinds through a=0 to a constant
    // and the order would fold away (live-scope binding, by design).
    "q_htsql_aliasing" -> q(
      "/region{a := r_regionkey+1, b := a*10}.sort(b).define(a := 0)?a=0"),

    // sorted+limited nested segment, flattened for the driver gate
    "q_segment_sorted" -> { (s, dir) =>
      Graft(s, dir)
        .query("/region{r_regionkey, /nation.sort(n_name-).limit(2){n_nationkey, n_name}}")
        .select(col("r_regionkey"), posexplode(col("nation")).as(Seq("pos", "n")))
        .select(col("r_regionkey"), col("pos").cast("long").as("pos"),
          col("n.n_nationkey").as("n_nationkey"), col("n.n_name").as("n_name"))
        .orderBy("r_regionkey", "pos")
    },

    // nested segment /link{…} — the signature HTSQL output shape — made
    // driver-checkable by flattening the list-of-records column with
    // posexplode (pos = array_sort rank by child key)
    "q_segment" -> { (s, dir) =>
      Graft(s, dir)
        .query("/region{r_regionkey, r_name, /nation{n_nationkey, n_name}}")
        .select(col("r_regionkey"), col("r_name"),
          posexplode(col("nation")).as(Seq("pos", "n")))
        .select(col("r_regionkey"), col("r_name"),
          col("pos").cast("long").as("pos"),
          col("n.n_nationkey").as("n_nationkey"), col("n.n_name").as("n_name"))
        .orderBy("r_regionkey", "pos")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_htsql_flagship" ->
      """SELECT r_regionkey, r_name, count(n_nationkey) AS n_nations
         FROM region LEFT JOIN nation ON n_regionkey = r_regionkey
         GROUP BY r_regionkey, r_name ORDER BY r_regionkey""",
    "q_htsql_sieve" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_totalprice > 400000 ORDER BY o_orderkey""",
    "q_htsql_chain" ->
      """SELECT c_custkey, c_name, r_name FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "q_htsql_filtered_agg" ->
      """SELECT c_custkey,
           count(CASE WHEN o_totalprice > 400000 THEN 1 END) AS n_big
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_htsql_quotient" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_htsql_exists" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
         ORDER BY c_custkey""",
    "q_htsql_define" ->
      """SELECT o_orderkey, o_totalprice * 0.95 AS net FROM orders
         WHERE o_totalprice * 0.95 > 380000 ORDER BY o_orderkey""",
    "q_htsql_given" ->
      """SELECT c_custkey,
           count(CASE WHEN o_totalprice > 400000 THEN 1 END) AS n_big
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_htsql_attach" ->
      """SELECT r_regionkey, r_name,
           count(n_nationkey) AS n_here,
           (SELECT count(*) FROM nation) AS n_all,
           (SELECT count(*) FROM orders WHERE o_totalprice > 400000) AS n_big_orders
         FROM region LEFT JOIN nation ON n_regionkey = r_regionkey
         GROUP BY r_regionkey, r_name ORDER BY r_regionkey""",
    "q_htsql_root" ->
      """SELECT (SELECT count(*) FROM region) AS n_regions,
              (SELECT count(*) FROM orders WHERE o_totalprice > 400000) AS n_big,
              (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                 FROM orders) AS total""",
    "q_htsql_id" ->
      """SELECT c_custkey, c_custkey AS "key", c_nationkey AS nat
         FROM customer ORDER BY c_custkey""",
    "q_htsql_postproj" ->
      """SELECT c_custkey, upper(c_name) AS nm, lower(c_mktsegment) AS seg
         FROM customer
         WHERE length(upper(c_name)) > 12 AND lower(c_mktsegment) <> 'building'
         ORDER BY replace(upper(c_name), 'CUSTOMER#', '')""",
    "q_htsql_selscope" ->
      """SELECT c_custkey, c_mktsegment AS seg
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE c_acctbal > 0 AND r_name = 'ASIA'
         ORDER BY c_custkey""",
    "q_htsql_aliasing" ->
      """SELECT CAST(r_regionkey + 1 AS BIGINT) AS a,
              CAST((r_regionkey + 1) * 10 AS BIGINT) AS b
         FROM region ORDER BY b""",
    "q_segment_sorted" ->
      """SELECT r_regionkey, pos, n_nationkey, n_name FROM (
           SELECT r_regionkey,
             CAST(row_number() OVER (PARTITION BY r_regionkey
                   ORDER BY n_name DESC, n_nationkey) - 1 AS BIGINT) AS pos,
             n_nationkey, n_name
           FROM region JOIN nation ON n_regionkey = r_regionkey)
         WHERE pos < 2
         ORDER BY r_regionkey, pos""",
    "q_segment" ->
      """SELECT r_regionkey, r_name,
           CAST(row_number() OVER (PARTITION BY r_regionkey ORDER BY n_nationkey) - 1 AS BIGINT) AS pos,
           n_nationkey, n_name
         FROM region JOIN nation ON n_regionkey = r_regionkey
         ORDER BY r_regionkey, pos""",
    "q_htsql_twohop_agg" ->
      """SELECT r_regionkey,
           coalesce(count(c_custkey), 0) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / count(c_acctbal) AS avg_bal
         FROM region
         LEFT JOIN nation ON n_regionkey = r_regionkey
         LEFT JOIN customer ON c_nationkey = n_nationkey
         GROUP BY r_regionkey ORDER BY r_regionkey"""
  )
}
