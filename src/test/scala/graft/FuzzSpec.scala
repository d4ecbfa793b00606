package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.lang.{LexError, ParseError, Parser, PlanError}

/** Totality hardening: hostile or random input must surface as the
  * language's own error types (with positions), never as NPEs, stack
  * overflows, or hangs — the binder analogue of the reference's
  * syntax-error regression tests. Seeds are fixed, so failures reproduce.
  */
class FuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val dir = "/root/testdata/sf0.001"

  private val parserN = sys.env.getOrElse("GRAFT_FUZZ_PARSER_N", "3000").toInt
  private val binderN = sys.env.getOrElse("GRAFT_FUZZ_BINDER_N", "400").toInt

  test("parser is total: random character soup never escapes Parse/LexError") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abz019_ ./{}()[]?^,:=+-*<>!~&|'$@\"\\%#"
    (1 to parserN).foreach { i =>
      val s = "/" + Iterator.fill(rnd.nextInt(48))(alphabet(rnd.nextInt(alphabet.length))).mkString
      try { Parser.parse(s); () } catch {
        case _: ParseError | _: LexError => ()
        case e: StackOverflowError => fail(s"stack overflow on [$s]")
        case e: Throwable => fail(s"iteration $i: [$s] threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("binder is total: recombined fragments never escape the error types") {
    val g = Graft(spark, dir)
    val rnd = new scala.util.Random(7)
    val frags = Vector(
      "region", "nation", "customer", "orders", "nosuch",
      "{r_name}", "{c_custkey, count(orders)}", "{*}", "{n := count(nation)}",
      "?o_totalprice>400000", "?exists(events)", "?c_name~'a'",
      ".sort(c_custkey)", ".sort(bogus)", ".limit(3)", ".limit(3,1)",
      ".nation", ".region", ".define(x := 1)", "^o_orderstatus",
      "{count(^)}", "[7]", "[3.2]", "{top(orders, 2)}",
      "{given(count(orders?o_totalprice>$c), c := 1)}", "{count(@region)}",
      "{/nation{n_name}}", "{c_acctbal+1}", "{upper(c_name)}", "{$missing}",
      "{where(1+1, x := 2)}", "{/orders.sort(o_totalprice-).limit(2){o_orderkey}}",
      "{/events{event_id}}", "{count(@nosuch)}", "{n := count(@orders?o_totalprice>1)}",
      "{top(orders.sort(o_totalprice-), 2)}", "?count(orders)>2",
      "?c_acctbal>avg(@customer.c_acctbal)", ".limit(2,1)",
      // round-4 surface: time kit, enum literals, surviving-selection scope
      "{t := time('12:34:56')}", "{h := hour(time('12:34:56'))}",
      "?o_orderstatus='F'", "?o_orderstatus='X'", "?c_mktsegment=('BUILDING','BOGUS')",
      "{c_custkey}?c_acctbal>0", "{c_custkey}.sort(c_acctbal-)", "{c_name}[1]",
      "{k := id()}", ".define(o_orderstatus := 'X')?o_orderstatus='X'",
      // round-5 surface: self-referencing / chaining selection aliases,
      // decorated self-references, define-after-selection rebinds
      "{c_acctbal := c_acctbal+1}", "{k := c_acctbal}{k := k*2}",
      "{c_acctbal := c_acctbal*2 -}", ".define(c_acctbal := c_acctbal+1)",
      "{k := c_acctbal}.define(k := k+1)?k>0", "{k := upper(k)}",
      "{c_name :as 'Title'}", "{c_acctbal- :as bal}", "{x := c_acctbal :as y}")
    (1 to binderN).foreach { i =>
      val q = "/" + frags(rnd.nextInt(5)) +
        Iterator.fill(rnd.nextInt(4))(frags(rnd.nextInt(frags.length))).mkString
      try { g.query(q).schema; () } catch {
        case _: ParseError | _: LexError => ()
        case e: PlanError =>
          // every binder error must carry a usable source position (the
          // planQuery wrapper guarantees at least the root node's offset)
          assert(e.pos >= 0 && e.pos <= q.length,
            s"iteration $i: [$q] PlanError without position: ${e.getMessage}")
        case e: org.apache.spark.sql.AnalysisException =>
          fail(s"iteration $i: [$q] leaked AnalysisException: ${e.getMessage}")
        case e: Throwable =>
          fail(s"iteration $i: [$q] threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("command parser is total over format-decorator tails (/: is one token)") {
    val rnd = new scala.util.Random(11)
    val bases = Vector(
      "/region", "/nation?n_regionkey=0", "/customer?c_acctbal>0.5",
      "/orders?o_totalprice>400000", "/region{r_name}", "/customer{c_custkey+1}",
      "/nation.limit(3)", "/customer?c_custkey=1+0", "/region{r_name}.sort(r_name)")
    val tails = Vector(
      "/:json", "/:csv", "/:html", "/:xml", "/:txt", "/:bogus", "/:", "/::",
      "/:json/:csv", "/ :json", "/: json", ":json", "//:json", "/:json?x>0")
    (1 to 300).foreach { i =>
      val q = bases(rnd.nextInt(bases.length)) + tails(rnd.nextInt(tails.length))
      try { Parser.parseCommand(q); () } catch {
        case _: ParseError | _: LexError => ()
        case e: Throwable =>
          fail(s"iteration $i: [$q] threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // the decorator composes with a numeric sieve tail (the division
    // ambiguity the single-token lex removes): both must parse
    assert(Parser.parseCommand("/nation?n_regionkey=0/:json")._2.contains("json"))
    assert(Parser.parseCommand("/customer?c_acctbal>0.5/:csv")._2.contains("csv"))
  }
}
