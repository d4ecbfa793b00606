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
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))),
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

  test("40 random define() chains match inline-expression SQL") {
    registerViews()
    val rnd = new scala.util.Random(1618)
    (1 to 40).foreach(i => check(QueryGen.genDefineCase(rnd), i))
  }
}
