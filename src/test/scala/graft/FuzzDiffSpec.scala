package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** DIFFERENTIAL fuzzing — the complement of FuzzSpec's totality fuzzing:
  * generate random VALID navigational queries and, from the same random
  * draw, an independent ANSI-SQL rendering (correlated subqueries for
  * navigation/aggregates, GROUP BY for quotients). The language text goes
  * through the full Lexer → Parser → Planner pipeline (the system under
  * test); the SQL goes through Spark's own SQL parser over plain temp
  * views — two fully separate front ends that must agree row-for-row.
  *
  * This is the generative analogue of the reference's regression suite
  * (`test/regress.yaml` pins hand-picked queries; this pins N random
  * points of the combined select/sieve/navigate/aggregate/quotient/sort/
  * limit space per run). Seeds are fixed so failures reproduce; every
  * failure message carries both query texts for direct replay.
  *
  * The same generator is reused by `tools/fuzz_dump.sh` to cross-check
  * against DuckDB (a second ENGINE, not just a second front end).
  */
object QueryGen {

  final case class FCol(name: String, kind: Char, lits: Seq[String] = Nil,
      lo: Int = 0, hi: Int = 0)
  final case class FLink(label: String, table: String, childFk: String, parentPk: String)
  final case class FTable(name: String, key: FCol, cols: Seq[FCol],
      parent: Option[FLink], child: Option[FLink])

  private val region = FTable("region",
    FCol("r_regionkey", 'i', lo = 0, hi = 4),
    Seq(FCol("r_regionkey", 'i', lo = 0, hi = 4),
      FCol("r_name", 's', Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))),
    None, Some(FLink("nation", "nation", "n_regionkey", "r_regionkey")))

  private val nation = FTable("nation",
    FCol("n_nationkey", 'i', lo = 0, hi = 24),
    Seq(FCol("n_nationkey", 'i', lo = 0, hi = 24),
      FCol("n_name", 's', (0 to 9).map(i => s"NATION_$i")),
      FCol("n_regionkey", 'i', lo = 0, hi = 4)),
    Some(FLink("region", "region", "n_regionkey", "r_regionkey")),
    Some(FLink("customer", "customer", "c_nationkey", "n_nationkey")))

  private val customer = FTable("customer",
    FCol("c_custkey", 'i', lo = 1, hi = 150),
    Seq(FCol("c_custkey", 'i', lo = 1, hi = 150),
      FCol("c_name", 's'),
      FCol("c_nationkey", 'i', lo = 0, hi = 24),
      FCol("c_acctbal", 'd', lo = -800, hi = 9900),
      FCol("c_mktsegment", 's',
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))),
    Some(FLink("nation", "nation", "c_nationkey", "n_nationkey")),
    Some(FLink("orders", "orders", "o_custkey", "c_custkey")))

  private val orders = FTable("orders",
    FCol("o_orderkey", 'i', lo = 1, hi = 6000),
    Seq(FCol("o_orderkey", 'i', lo = 1, hi = 6000),
      FCol("o_custkey", 'i', lo = 1, hi = 150),
      FCol("o_orderstatus", 's', Seq("F", "O", "P")),
      FCol("o_totalprice", 'd', lo = 1000, hi = 450000),
      FCol("o_orderpriority", 's',
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
      FCol("o_orderdate", 't')),
    Some(FLink("customer", "customer", "o_custkey", "c_custkey")),
    None)

  val tables: Seq[FTable] = Seq(region, nation, customer, orders)
  private val byName: Map[String, FTable] = tables.map(t => t.name -> t).toMap

  /** One generated case: the navigational text, the independent SQL, and a
    * short shape tag for failure triage.
    */
  final case class Case(ht: String, sql: String, shape: String)

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** A numeric comparison literal inside [lo, hi], weighted toward the
    * middle so sieves keep a non-trivial fraction of rows.
    */
  private def numLit(rnd: scala.util.Random, c: FCol): String = {
    val span = math.max(1, c.hi - c.lo)
    (c.lo + rnd.nextInt(span + 1)).toString
  }

  private def numCols(t: FTable): Seq[FCol] = t.cols.filter(c => c.kind == 'i' || c.kind == 'd')
  private def litStrCols(t: FTable): Seq[FCol] = t.cols.filter(c => c.kind == 's' && c.lits.nonEmpty)

  /** Scalar predicate over `t`'s columns; `alias` qualifies the SQL side.
    * Depth ≤ 2: leaves are numeric comparisons / string (in)equality,
    * combined with `&` `|` `!` — rendered with explicit parens on both
    * sides so the two grammars can't disagree on precedence.
    */
  private def genPred(rnd: scala.util.Random, t: FTable, alias: String, depth: Int): (String, String) = {
    def leaf(): (String, String) =
      if (litStrCols(t).nonEmpty && rnd.nextInt(3) == 0) {
        val c = litStrCols(t)(rnd.nextInt(litStrCols(t).size))
        val v = c.lits(rnd.nextInt(c.lits.size))
        val op = if (rnd.nextBoolean()) "=" else "!="
        (s"${c.name}$op${q(v)}", s"$alias.${c.name} ${if (op == "=") "=" else "<>"} ${q(v)}")
      } else {
        val c = numCols(t)(rnd.nextInt(numCols(t).size))
        val op = Seq("<", "<=", ">", ">=", "=", "!=")(rnd.nextInt(6))
        val lit = numLit(rnd, c)
        (s"${c.name}$op$lit", s"$alias.${c.name} ${if (op == "!=") "<>" else op} $lit")
      }
    if (depth == 0) leaf()
    else rnd.nextInt(4) match {
      case 0 =>
        val (h1, s1) = genPred(rnd, t, alias, depth - 1); val (h2, s2) = genPred(rnd, t, alias, depth - 1)
        (s"($h1)&($h2)", s"(($s1) AND ($s2))")
      case 1 =>
        val (h1, s1) = genPred(rnd, t, alias, depth - 1); val (h2, s2) = genPred(rnd, t, alias, depth - 1)
        (s"($h1)|($h2)", s"(($s1) OR ($s2))")
      case 2 =>
        val (h, s) = genPred(rnd, t, alias, depth - 1)
        (s"!($h)", s"(NOT ($s))")
      case _ => leaf()
    }
  }

  /** One selection item over scope `t` (SQL side qualified by t0): a plain
    * column, scalar arithmetic / string functions, a singular navigation
    * (1–2 hops to a parent), or an aggregate over the plural child link
    * (count/sum/avg/min/max, optionally sieved).
    */
  private def genItem(rnd: scala.util.Random, t: FTable, fresh: () => Int): (String, String) =
    rnd.nextInt(6) match {
      case 0 => // plain column
        val c = t.cols(rnd.nextInt(t.cols.size))
        (c.name, s"t0.${c.name}")
      case 1 => // arithmetic on a numeric column
        val c = numCols(t)(rnd.nextInt(numCols(t).size))
        val lit = 1 + rnd.nextInt(9)
        val op = Seq("+", "-", "*")(rnd.nextInt(3))
        (s"${c.name}$op$lit", s"t0.${c.name} $op $lit")
      case 2 => // string function
        val strs = t.cols.filter(_.kind == 's')
        val c = strs(rnd.nextInt(strs.size))
        rnd.nextInt(3) match {
          case 0 => (s"upper(${c.name})", s"upper(t0.${c.name})")
          case 1 => (s"lower(${c.name})", s"lower(t0.${c.name})")
          case _ => (s"length(${c.name})", s"length(t0.${c.name})")
        }
      case 3 if t.parent.isDefined => // singular navigation, 1–2 hops
        val l1 = t.parent.get
        val p1 = byName(l1.table)
        if (p1.parent.isDefined && rnd.nextBoolean()) {
          val l2 = p1.parent.get
          val p2 = byName(l2.table)
          val c = p2.cols(rnd.nextInt(p2.cols.size))
          val (a1, a2) = (s"p${fresh()}", s"p${fresh()}")
          (s"${l1.label}.${l2.label}.${c.name}",
            s"(SELECT $a2.${c.name} FROM ${p1.name} $a1, ${p2.name} $a2 " +
              s"WHERE $a1.${l1.parentPk} = t0.${l1.childFk} AND $a2.${l2.parentPk} = $a1.${l2.childFk})")
        } else {
          val c = p1.cols(rnd.nextInt(p1.cols.size))
          val a = s"p${fresh()}"
          (s"${l1.label}.${c.name}",
            s"(SELECT $a.${c.name} FROM ${p1.name} $a WHERE $a.${l1.parentPk} = t0.${l1.childFk})")
        }
      case 4 | 5 if t.child.isDefined => // aggregate over the plural link
        val l = t.child.get
        val ch = byName(l.table)
        val a = s"s${fresh()}"
        val sieve = rnd.nextBoolean()
        val (hp, sp) = if (sieve) genPred(rnd, ch, a, rnd.nextInt(2)) else ("", "")
        val corr = s"$a.${l.childFk} = t0.${l.parentPk}" + (if (sieve) s" AND ($sp)" else "")
        rnd.nextInt(5) match {
          case 0 =>
            val flow = if (sieve) s"${l.label}?$hp" else l.label
            (s"count($flow)", s"(SELECT count(*) FROM ${ch.name} $a WHERE $corr)")
          case k =>
            val c = numCols(ch)(rnd.nextInt(numCols(ch).size))
            val fn = Seq("sum", "avg", "min", "max")(k - 1)
            val flow = if (sieve) s"(${l.label}?$hp).${c.name}" else s"${l.label}.${c.name}"
            (s"$fn($flow)", s"(SELECT $fn($a.${c.name}) FROM ${ch.name} $a WHERE $corr)")
        }
      case _ =>
        val c = t.cols(rnd.nextInt(t.cols.size))
        (c.name, s"t0.${c.name}")
    }

  /** Select/sieve/navigate/aggregate case over a random base table, sorted
    * by the (unique) primary key so an optional limit/offset stays
    * deterministic on both sides.
    */
  def genSelectCase(rnd: scala.util.Random): Case = {
    var n = 0
    val fresh = () => { n += 1; n }
    val t = tables(rnd.nextInt(tables.size))
    val nItems = 2 + rnd.nextInt(3)
    val items = (s"x0 := ${t.key.name}", s"t0.${t.key.name} AS x0") +: (1 to nItems).map { i =>
      val (h, s) = genItem(rnd, t, fresh)
      (s"x$i := $h", s"$s AS x$i")
    }
    // base sieve: scalar pred, exists(child?...), or count(child?...) > k
    val sieve: Option[(String, String)] =
      if (rnd.nextInt(3) == 0) None
      else if (t.child.isDefined && rnd.nextInt(3) == 0) {
        val l = t.child.get
        val ch = byName(l.table)
        val a = s"w${fresh()}"
        val (hp, sp) = genPred(rnd, ch, a, rnd.nextInt(2))
        if (rnd.nextBoolean())
          Some((s"exists(${l.label}?$hp)",
            s"EXISTS (SELECT 1 FROM ${ch.name} $a WHERE $a.${l.childFk} = t0.${l.parentPk} AND ($sp))"))
        else {
          val k = rnd.nextInt(4)
          Some((s"count(${l.label}?$hp)>$k",
            s"(SELECT count(*) FROM ${ch.name} $a WHERE $a.${l.childFk} = t0.${l.parentPk} AND ($sp)) > $k"))
        }
      } else Some(genPred(rnd, t, "t0", 1 + rnd.nextInt(2)))
    val desc = rnd.nextBoolean()
    val limit: Option[(Int, Int)] =
      if (rnd.nextInt(3) == 0) Some((1 + rnd.nextInt(20), if (rnd.nextBoolean()) rnd.nextInt(5) else 0))
      else None
    val ht = new StringBuilder("/").append(t.name)
    sieve.foreach { case (h, _) => ht.append("?").append(h) }
    ht.append(items.map(_._1).mkString("{", ", ", "}"))
    ht.append(s".sort(x0${if (desc) "-" else ""})")
    limit.foreach { case (l, o) => ht.append(if (o > 0) s".limit($l,$o)" else s".limit($l)") }
    val sql = new StringBuilder("SELECT ").append(items.map(_._2).mkString(", "))
    sql.append(s" FROM ${t.name} t0")
    sieve.foreach { case (_, s) => sql.append(" WHERE ").append(s) }
    sql.append(s" ORDER BY x0${if (desc) " DESC" else ""}")
    limit.foreach { case (l, o) =>
      sql.append(s" LIMIT $l"); if (o > 0) sql.append(s" OFFSET $o")
    }
    Case(ht.toString, sql.toString, s"select:${t.name}")
  }

  /** Two-hop plural aggregate case over region→nation→customer or
    * nation→customer→orders: `count(mid.leaf)` aggregates the COMPOSED
    * plural flow (all leaf rows of all mid rows), optionally sieving
    * either hop — the planner must thread the correlation through both
    * links and apply the sieve at the right depth.
    */
  def genTwoHopAggCase(rnd: scala.util.Random): Case = {
    var n = 0
    val fresh = () => { n += 1; n }
    val t = if (rnd.nextBoolean()) byName("region") else byName("nation")
    val l1 = t.child.get
    val mid = byName(l1.table)
    val l2 = mid.child.get
    val leaf = byName(l2.table)
    val (aMid, aLeaf) = (s"m${fresh()}", s"l${fresh()}")
    // sieve neither hop, the mid hop, or the leaf hop
    val hop = rnd.nextInt(3)
    val (midHt, midCorrExtra) =
      if (hop == 1) {
        val (hp, sp) = genPred(rnd, mid, aMid, rnd.nextInt(2))
        (s"(${l1.label}?$hp)", s" AND ($sp)")
      } else (l1.label, "")
    val (leafHt, leafCorrExtra) =
      if (hop == 2) {
        val (hp, sp) = genPred(rnd, leaf, aLeaf, rnd.nextInt(2))
        (s"(${l2.label}?$hp)", s" AND ($sp)")
      } else (l2.label, "")
    val corr = s"$aMid.${l1.childFk} = t0.${l1.parentPk}$midCorrExtra" +
      s" AND $aLeaf.${l2.childFk} = $aMid.${l2.parentPk}$leafCorrExtra"
    val (aggHt, aggSql) = rnd.nextInt(5) match {
      case 0 =>
        (s"count($midHt.$leafHt)",
          s"(SELECT count(*) FROM ${mid.name} $aMid, ${leaf.name} $aLeaf WHERE $corr)")
      case k =>
        val c = numCols(leaf)(rnd.nextInt(numCols(leaf).size))
        val fn = Seq("sum", "avg", "min", "max")(k - 1)
        (s"$fn($midHt.$leafHt.${c.name})",
          s"(SELECT $fn($aLeaf.${c.name}) FROM ${mid.name} $aMid, ${leaf.name} $aLeaf WHERE $corr)")
    }
    val ht = s"/${t.name}{x0 := ${t.key.name}, x1 := $aggHt}.sort(x0)"
    val sql = s"SELECT t0.${t.key.name} AS x0, $aggSql AS x1 FROM ${t.name} t0 ORDER BY x0"
    Case(ht, sql, s"twohop:${t.name}.${l1.label}.${l2.label}:h$hop")
  }

  /** Parent-navigation sieve case: the base flow is filtered on an
    * attribute reached through 1–2 SINGULAR hops
    * (`customer?nation.region.r_name='ASIA'`) — the planner must plan the
    * lookup join before the filter while keeping base cardinality.
    */
  def genNavSieveCase(rnd: scala.util.Random): Case = {
    val t = Seq(byName("customer"), byName("orders"), byName("nation"))(rnd.nextInt(3))
    val l1 = t.parent.get
    val p1 = byName(l1.table)
    val twoHop = p1.parent.isDefined && rnd.nextBoolean()
    val (navHt, navSqlOf) =
      if (twoHop) {
        val l2 = p1.parent.get
        val p2 = byName(l2.table)
        val c = (numCols(p2) ++ litStrCols(p2)) (rnd.nextInt(numCols(p2).size + litStrCols(p2).size))
        (s"${l1.label}.${l2.label}.${c.name}",
          (c, s"(SELECT a2.${c.name} FROM ${p1.name} a1, ${p2.name} a2 " +
            s"WHERE a1.${l1.parentPk} = t0.${l1.childFk} AND a2.${l2.parentPk} = a1.${l2.childFk})"))
      } else {
        val c = (numCols(p1) ++ litStrCols(p1)) (rnd.nextInt(numCols(p1).size + litStrCols(p1).size))
        (s"${l1.label}.${c.name}",
          (c, s"(SELECT a1.${c.name} FROM ${p1.name} a1 WHERE a1.${l1.parentPk} = t0.${l1.childFk})"))
      }
    val (c, navSql) = navSqlOf
    val (predHt, predSql) =
      if (c.kind == 's') {
        val v = c.lits(rnd.nextInt(c.lits.size))
        val eq = rnd.nextBoolean()
        (s"$navHt${if (eq) "=" else "!="}${q(v)}", s"$navSql ${if (eq) "=" else "<>"} ${q(v)}")
      } else {
        val op = Seq("<", "<=", ">", ">=", "=")(rnd.nextInt(5))
        val lit = numLit(rnd, c)
        (s"$navHt$op$lit", s"$navSql $op $lit")
      }
    val ht = s"/${t.name}?$predHt{x0 := ${t.key.name}}.sort(x0)"
    val sql = s"SELECT t0.${t.key.name} AS x0 FROM ${t.name} t0 WHERE $predSql ORDER BY x0"
    Case(ht, sql, s"navsieve:${t.name}${if (twoHop) ":2hop" else ""}")
  }

  private val forkPool = Seq(
    ("customer", "c_nationkey"), ("customer", "c_mktsegment"),
    ("orders", "o_orderstatus"), ("orders", "o_orderpriority"))

  /** fork() window case: a per-kernel aggregate correlating a flow with a
    * copy of itself — in a selection item and, half the time, driving the
    * base sieve (`?v > avg(fork(k).v)`), against SQL window functions.
    */
  def genForkCase(rnd: scala.util.Random): Case = {
    val (tn, k) = forkPool(rnd.nextInt(forkPool.size))
    val t = byName(tn)
    val v = numCols(t)(rnd.nextInt(numCols(t).size))
    val fn = Seq("sum", "avg", "min", "max")(rnd.nextInt(4))
    val asSieve = rnd.nextBoolean()
    if (asSieve) {
      val ht = s"/$tn?${v.name} > $fn(fork($k).${v.name})" +
        s"{x0 := ${t.key.name}}.sort(x0)"
      val sql = s"SELECT x0 FROM (SELECT ${t.key.name} AS x0, ${v.name} AS v, " +
        s"$fn(${v.name}) OVER (PARTITION BY $k) AS w FROM $tn) WHERE v > w ORDER BY x0"
      Case(ht, sql, s"fork-sieve:$tn^$k")
    } else {
      val ht = s"/$tn{x0 := ${t.key.name}, x1 := $fn(fork($k).${v.name})}.sort(x0)"
      val sql = s"SELECT ${t.key.name} AS x0, $fn(${v.name}) OVER (PARTITION BY $k) AS x1 " +
        s"FROM $tn ORDER BY x0"
      Case(ht, sql, s"fork:$tn^$k")
    }
  }

  /** Detached `@table` aggregate case: an uncorrelated whole-table
    * aggregate (optionally sieved) referenced from another table's scope,
    * against an uncorrelated scalar subquery.
    */
  def genDetachCase(rnd: scala.util.Random): Case = {
    val t = tables(rnd.nextInt(tables.size))
    val o = tables(rnd.nextInt(tables.size)) // detached target, any table
    val sieve: Option[(String, String)] =
      if (rnd.nextBoolean()) Some(genPred(rnd, o, "d0", rnd.nextInt(2))) else None
    val where = sieve.map { case (_, sp) => s" WHERE $sp" }.getOrElse("")
    val (aggHt, aggSql) = rnd.nextInt(5) match {
      case 0 =>
        val flow = sieve.map { case (hp, _) => s"@${o.name}?$hp" }.getOrElse(s"@${o.name}")
        (s"count($flow)", s"(SELECT count(*) FROM ${o.name} d0$where)")
      case j =>
        val c = numCols(o)(rnd.nextInt(numCols(o).size))
        val fn = Seq("sum", "avg", "min", "max")(j - 1)
        val flow = sieve.map { case (hp, _) => s"(@${o.name}?$hp).${c.name}" }
          .getOrElse(s"@${o.name}.${c.name}")
        (s"$fn($flow)", s"(SELECT $fn(${c.name}) FROM ${o.name} d0$where)")
    }
    val ht = s"/${t.name}{x0 := ${t.key.name}, x1 := $aggHt}.sort(x0)"
    val sql = s"SELECT ${t.key.name} AS x0, $aggSql AS x1 FROM ${t.name} ORDER BY x0"
    Case(ht, sql, s"detach:${t.name}@${o.name}")
  }

  /** define() chain case: chained calculated columns (later defines read
    * earlier ones) used by the sieve and the selection, against inline SQL
    * expressions.
    */
  def genDefineCase(rnd: scala.util.Random): Case = {
    val t = tables(rnd.nextInt(tables.size))
    val c = numCols(t)(rnd.nextInt(numCols(t).size))
    val (m1, a1, m2) = (1 + rnd.nextInt(5), rnd.nextInt(100), 1 + rnd.nextInt(3))
    val d1Sql = s"(${c.name} * $m1 + $a1)"
    val d2Sql = s"($d1Sql * $m2)"
    val op = Seq("<", "<=", ">", ">=")(rnd.nextInt(4))
    val lit = numLit(rnd, c).toInt * m1 * m2
    val ht = s"/${t.name}.define(d1 := ${c.name}*$m1+$a1, d2 := d1*$m2)?d2$op$lit" +
      s"{x0 := ${t.key.name}, x1 := d1, x2 := d2}.sort(x0)"
    val sql = s"SELECT ${t.key.name} AS x0, $d1Sql AS x1, $d2Sql AS x2 " +
      s"FROM ${t.name} WHERE $d2Sql $op $lit ORDER BY x0"
    Case(ht, sql, s"define:${t.name}")
  }

  /** Quotient case: `/(T^kernel){kernel, aggs over ^}` against a plain
    * GROUP BY — the kernel is a low-cardinality column so groups are
    * non-trivial at sf0.001.
    */
  def genQuotientCase(rnd: scala.util.Random): Case = {
    val pool = Seq(
      ("orders", "o_orderstatus"), ("orders", "o_orderpriority"),
      ("customer", "c_mktsegment"), ("customer", "c_nationkey"),
      ("nation", "n_regionkey"))
    val (tn, k) = pool(rnd.nextInt(pool.size))
    val t = byName(tn)
    // optionally sieve the quotient BASE: groups form over the filtered flow
    val baseSieve: Option[(String, String)] =
      if (rnd.nextInt(3) == 0) Some(genPred(rnd, t, "t0", rnd.nextInt(2))) else None
    val nAggs = 1 + rnd.nextInt(3)
    val aggs = (1 to nAggs).map { i =>
      // optionally sieve the COMPLEMENT flow inside the aggregate:
      // count(^?p) / sum((^?p).c) ≡ SQL FILTER (WHERE p)
      val compSieve: Option[(String, String)] =
        if (rnd.nextInt(3) == 0) Some(genPred(rnd, t, "t0", rnd.nextInt(2))) else None
      val filt = compSieve.map { case (_, sp) => s" FILTER (WHERE $sp)" }.getOrElse("")
      rnd.nextInt(5) match {
        case 0 =>
          val flow = compSieve.map { case (hp, _) => s"^?$hp" }.getOrElse("^")
          (s"x$i := count($flow)", s"count(*)$filt AS x$i")
        case j =>
          val c = numCols(t)(rnd.nextInt(numCols(t).size))
          val fn = Seq("sum", "avg", "min", "max")(j - 1)
          val flow = compSieve.map { case (hp, _) => s"(^?$hp).${c.name}" }.getOrElse(s"^.${c.name}")
          (s"x$i := $fn($flow)", s"$fn(${c.name})$filt AS x$i")
      }
    }
    val desc = rnd.nextBoolean()
    val baseHt = baseSieve.map { case (hp, _) => s"($tn?$hp)" }.getOrElse(tn)
    val ht = s"/($baseHt^$k){x0 := $k, ${aggs.map(_._1).mkString(", ")}}" +
      s".sort(x0${if (desc) "-" else ""})"
    val where = baseSieve.map { case (_, sp) => s" WHERE $sp" }.getOrElse("")
    val sql = s"SELECT $k AS x0, ${aggs.map(_._2).mkString(", ")} FROM $tn t0$where " +
      s"GROUP BY $k ORDER BY x0${if (desc) " DESC" else ""}"
    Case(ht, sql, s"quotient:$tn^$k${if (baseSieve.isDefined) ":sieved" else ""}")
  }
  /** Scalar-function kit case: selection items drawn from the function
    * library — string slicing with python-style negative indices,
    * conditionals, null functions, `~` containment, IN-lists, rounding,
    * casts, and date arithmetic — each with an independently rendered SQL
    * twin reproducing the documented HTSQL semantics (SURVEY §2.8 traps)
    * rather than re-using the engine's own combinators. This is the
    * differential net for the part of the language only golden tests
    * pinned before.
    */
  def genScalarFnCase(rnd: scala.util.Random): Case = {
    val t = tables(rnd.nextInt(tables.size))
    val strCols = t.cols.filter(_.kind == 's')
    val tsCols = t.cols.filter(_.kind == 't')

    def sCol() = strCols(rnd.nextInt(strCols.size))
    def nCol() = numCols(t)(rnd.nextInt(numCols(t).size))

    // a needle guaranteed to sometimes hit: a random slice of a lit value
    def needle(): String = {
      val pool = litStrCols(t)
      if (pool.isEmpty) "x"
      else {
        val v = { val c = pool(rnd.nextInt(pool.size)); c.lits(rnd.nextInt(c.lits.size)) }
        val from = rnd.nextInt(math.max(1, v.length - 2))
        v.substring(from, math.min(v.length, from + 2 + rnd.nextInt(2)))
      }
    }

    // python-index helpers rendered as explicit SQL (the twin must NOT
    // reuse Ht's combinators — independence is the point)
    def sqlLen(s: String) = s"length($s)"
    def sqlClamp(n: Int, s: String): String =
      if (n >= 0) s"least($n, ${sqlLen(s)})" else s"greatest(${sqlLen(s)} + $n, 0)"

    def shape(): (String, String) = rnd.nextInt(12) match {
      case 0 => // concat with separators — HTSQL `+` (NULL-as-'' is moot on
        // non-null fixture cols; the trap case is pinned in LangSpec)
        val (a, b) = (sCol(), sCol())
        (s"upper(${a.name})+'-'+lower(${b.name})",
          s"concat(upper(t0.${a.name}), '-', lower(t0.${b.name}))")
      case 1 => // head/tail with a possibly-negative count
        val c = sCol(); val n = rnd.nextInt(9) - 4
        if (rnd.nextBoolean())
          (s"head(${c.name},$n)", s"substr(t0.${c.name}, 1, ${sqlClamp(n, s"t0.${c.name}")})")
        else {
          val k = sqlClamp(n, s"t0.${c.name}")
          (s"tail(${c.name},$n)",
            s"substr(t0.${c.name}, ${sqlLen(s"t0.${c.name}")} - $k + 1, $k)")
        }
      case 2 => // python slice, closed or open ends
        val c = sCol(); val s = s"t0.${c.name}"
        val i = rnd.nextInt(7) - 3; val j = rnd.nextInt(7) - 3
        val openLo = rnd.nextInt(4) == 0; val openHi = rnd.nextInt(4) == 0
        val lo = if (openLo) "0" else sqlClamp(i, s)
        val hi = if (openHi) sqlLen(s) else sqlClamp(j, s)
        (s"slice(${c.name},${if (openLo) "null()" else i.toString},${if (openHi) "null()" else j.toString})",
          s"substr($s, $lo + 1, greatest($hi - $lo, 0))")
      case 3 => // case-insensitive containment as a boolean item
        val c = sCol(); val nd = needle()
        val neg = rnd.nextBoolean()
        (s"${if (neg) "!" else ""}(${c.name}~${q(nd)})",
          s"${if (neg) "NOT " else ""}contains(lower(t0.${c.name}), lower(${q(nd)}))")
      case 4 => // IN-list (HTSQL `= (…)` idiom) with 2-3 members
        val pool = litStrCols(t)
        if (pool.isEmpty) shape()
        else {
          val c = pool(rnd.nextInt(pool.size))
          val vals = rnd.shuffle(c.lits).take(2 + rnd.nextInt(2))
          val neg = rnd.nextBoolean()
          (s"${c.name}${if (neg) "!=" else "="}(${vals.map(q).mkString(",")})",
            s"t0.${c.name} ${if (neg) "NOT IN" else "IN"} (${vals.map(q).mkString(", ")})")
        }
      case 5 => // if(): 2 or 3 branches, with and without else
        val c = nCol(); val lit = numLit(rnd, c)
        val withElse = rnd.nextBoolean()
        if (withElse)
          (s"if(${c.name}>$lit,'hi',${c.name}=$lit,'eq','lo')",
            s"CASE WHEN t0.${c.name} > $lit THEN 'hi' WHEN t0.${c.name} = $lit THEN 'eq' ELSE 'lo' END")
        else
          (s"if(${c.name}>$lit,'hi')",
            s"CASE WHEN t0.${c.name} > $lit THEN 'hi' END")
      case 6 => // switch() on an enum column
        val pool = litStrCols(t)
        if (pool.isEmpty) shape()
        else {
          val c = pool(rnd.nextInt(pool.size))
          val vs = rnd.shuffle(c.lits).take(2)
          val withElse = rnd.nextBoolean()
          (s"switch(${c.name},${q(vs(0))},1,${q(vs(1))},2${if (withElse) ",0" else ""})",
            s"CASE t0.${c.name} WHEN ${q(vs(0))} THEN 1 WHEN ${q(vs(1))} THEN 2" +
              s"${if (withElse) " ELSE 0" else ""} END")
        }
      case 7 => // null chain: if_null(null_if(c, v), w)
        val pool = litStrCols(t)
        if (pool.isEmpty) shape()
        else {
          val c = pool(rnd.nextInt(pool.size))
          val v = c.lits(rnd.nextInt(c.lits.size))
          (s"if_null(null_if(${c.name},${q(v)}),'zz')",
            s"coalesce(nullif(t0.${c.name}, ${q(v)}), 'zz')")
        }
      case 8 => // rounding family over an exact-division result
        val c = nCol(); val d = 3 + rnd.nextInt(7)
        val dv =
          if (c.kind == 'i') s"CAST(t0.${c.name} AS DOUBLE) / CAST($d AS DOUBLE)"
          else s"t0.${c.name} / $d"
        rnd.nextInt(3) match {
          case 0 => (s"round(${c.name}/$d,2)", s"round($dv, 2)")
          case 1 => (s"trunc(${c.name}/$d,2)",
            s"CAST(($dv) * 100.0D AS BIGINT) / 100.0D")
          case _ => (s"abs(0-${c.name})", s"abs(0 - t0.${c.name})")
        }
      case 9 => // casts
        val c = nCol()
        rnd.nextInt(3) match {
          case 0 => (s"text(${c.name})", s"CAST(t0.${c.name} AS STRING)")
          case 1 => (s"integer(${c.name})", s"CAST(t0.${c.name} AS BIGINT)")
          case _ => (s"decimal(${c.name})", s"CAST(t0.${c.name} AS DECIMAL(38,18))")
        }
      case 10 if tsCols.nonEmpty => // date extraction + arithmetic
        val c = tsCols(rnd.nextInt(tsCols.size))
        rnd.nextInt(4) match {
          case 0 => (s"year(${c.name})", s"year(t0.${c.name})")
          case 1 => (s"month(${c.name})*100+day(${c.name})",
            s"month(t0.${c.name}) * 100 + day(t0.${c.name})")
          case 2 =>
            val k = 1 + rnd.nextInt(60)
            (s"date(${c.name})+$k", s"date_add(CAST(t0.${c.name} AS DATE), $k)")
          case _ =>
            (s"date(${c.name})-date('1995-06-15')",
              s"datediff(CAST(t0.${c.name} AS DATE), DATE '1995-06-15')")
        }
      case _ => // replace / trim round-trip
        val c = sCol(); val nd = needle()
        if (rnd.nextBoolean())
          (s"replace(${c.name},${q(nd)},'#')", s"replace(t0.${c.name}, ${q(nd)}, '#')")
        else
          (s"length(trim(${c.name}))", s"length(trim(t0.${c.name}))")
    }

    val nItems = 3 + rnd.nextInt(2)
    val items = (s"x0 := ${t.key.name}", s"t0.${t.key.name} AS x0") +: (1 to nItems).map { i =>
      val (h, s) = shape()
      (s"x$i := $h", s"$s AS x$i")
    }
    // function-driven sieve half the time: containment or length guard
    val sieve: Option[(String, String)] =
      if (rnd.nextBoolean()) None
      else if (litStrCols(t).nonEmpty && rnd.nextBoolean()) {
        val nd = needle(); val c = litStrCols(t)(rnd.nextInt(litStrCols(t).size))
        Some((s"${c.name}~${q(nd)}", s"contains(lower(t0.${c.name}), lower(${q(nd)}))"))
      } else {
        val c = sCol(); val k = 5 + rnd.nextInt(15)
        Some((s"length(${c.name})>$k", s"length(t0.${c.name}) > $k"))
      }
    val ht = new StringBuilder("/").append(t.name)
    sieve.foreach { case (h, _) => ht.append("?").append(h) }
    ht.append(items.map(_._1).mkString("{", ", ", "}")).append(".sort(x0)")
    val sql = new StringBuilder("SELECT ").append(items.map(_._2).mkString(", "))
    sql.append(s" FROM ${t.name} t0")
    sieve.foreach { case (_, s) => sql.append(" WHERE ").append(s) }
    sql.append(" ORDER BY x0")
    Case(ht.toString, sql.toString, s"scalarfn:${t.name}")
  }
}

class FuzzDiffSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val dir = "/root/testdata/sf0.001"
  lazy val g = Graft(spark, dir)

  private val selectN = sys.env.getOrElse("GRAFT_FUZZDIFF_SELECT_N", "120").toInt
  private val quotientN = sys.env.getOrElse("GRAFT_FUZZDIFF_QUOTIENT_N", "40").toInt

  private def registerViews(): Unit =
    Seq("region", "nation", "customer", "orders").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }

  /** Canonical rows: full-precision cell strings, sorted by row. Every
    * case's first item x0 is the (unique) primary key / kernel, so the
    * sort aligns rows identically on both sides; numeric cells then
    * compare with a relative tolerance (the two plans may sum
    * floating-point values in different orders, and the engine's
    * decimal-exact sum/avg is deliberately NOT bit-identical to a
    * double-accumulated one).
    */
  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => "null"
      case b: java.math.BigDecimal => b.stripTrailingZeros.toPlainString
      case v => v.toString
    }).sortBy(_.mkString("|"))

  private def cellsMatch(a: String, b: String): Boolean =
    a == b || (try {
      val x = BigDecimal(a); val y = BigDecimal(b)
      (x - y).abs <= x.abs.max(y.abs).max(BigDecimal(1)) * 1e-9
    } catch { case _: NumberFormatException => false })

  private def rowsMatch(a: Seq[Seq[String]], b: Seq[Seq[String]]): Boolean =
    a.size == b.size && a.zip(b).forall { case (ra, rb) =>
      ra.size == rb.size && ra.zip(rb).forall { case (ca, cb) => cellsMatch(ca, cb) }
    }

  private def check(c: QueryGen.Case, i: Int): Unit = {
    val got =
      try canon(g.query(c.ht))
      catch { case e: Throwable =>
        fail(s"case $i [${c.shape}] engine failed\n  ht:  ${c.ht}\n  sql: ${c.sql}\n  ${e.getClass.getName}: ${e.getMessage}")
      }
    val exp =
      try canon(spark.sql(c.sql))
      catch { case e: Throwable =>
        fail(s"case $i [${c.shape}] SQL rendering failed (generator bug)\n  ht:  ${c.ht}\n  sql: ${c.sql}\n  ${e.getMessage}")
      }
    if (!rowsMatch(exp, got)) {
      val es = exp.map(_.mkString("|")); val gs = got.map(_.mkString("|"))
      fail(s"case $i [${c.shape}] DIVERGED (${exp.size} vs ${got.size} rows)\n" +
        s"  ht:  ${c.ht}\n  sql: ${c.sql}\n  missing: ${es.diff(gs).take(3)}\n  extra:   ${gs.diff(es).take(3)}")
    }
  }

  test(s"$selectN random select/sieve/navigate/aggregate queries match an independent SQL rendering") {
    registerViews()
    val rnd = new scala.util.Random(20260813)
    (1 to selectN).foreach(i => check(QueryGen.genSelectCase(rnd), i))
  }

  test(s"$quotientN random quotient queries match GROUP BY SQL") {
    registerViews()
    val rnd = new scala.util.Random(814)
    (1 to quotientN).foreach(i => check(QueryGen.genQuotientCase(rnd), i))
  }

  test("60 random two-hop plural aggregates match double-correlated SQL") {
    registerViews()
    val rnd = new scala.util.Random(2813)
    (1 to 60).foreach(i => check(QueryGen.genTwoHopAggCase(rnd), i))
  }

  test("60 random parent-navigation sieves match scalar-subquery SQL") {
    registerViews()
    val rnd = new scala.util.Random(5309)
    (1 to 60).foreach(i => check(QueryGen.genNavSieveCase(rnd), i))
  }

  test("40 random fork() window aggregates match SQL window functions") {
    registerViews()
    val rnd = new scala.util.Random(4242)
    (1 to 40).foreach(i => check(QueryGen.genForkCase(rnd), i))
  }

  test("40 random detached @table aggregates match uncorrelated subquery SQL") {
    registerViews()
    val rnd = new scala.util.Random(777)
    (1 to 40).foreach(i => check(QueryGen.genDetachCase(rnd), i))
  }

  test("80 random scalar-function-kit queries match independent SQL renderings") {
    registerViews()
    val rnd = new scala.util.Random(90210)
    (1 to 80).foreach(i => check(QueryGen.genScalarFnCase(rnd), i))
  }

  test("40 random define() chains match inline-expression SQL") {
    registerViews()
    val rnd = new scala.util.Random(1618)
    (1 to 40).foreach(i => check(QueryGen.genDefineCase(rnd), i))
  }
}
