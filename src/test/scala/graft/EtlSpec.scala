package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Etl

/** Golden round-trip tests for the ETL write commands (upstream
  * `tweak.etl`): every command is a distributed rewrite + atomic
  * directory swap, and the post-state must read back exactly.
  */
class EtlSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  val dir = "/root/testdata/sf0.001"

  private def freshEtl(): Etl = {
    val work = java.nio.file.Files.createTempDirectory("graft_etl_spec_").toString
    val etl = new Etl(spark, work)
    etl.copy("region", spark.read.parquet(s"$dir/region.parquet")
      .select(col("r_regionkey"), col("r_name"), lit("orig").as("r_comment")))
    etl
  }

  test("copy + read round-trips exactly") {
    val etl = freshEtl()
    val orig = spark.read.parquet(s"$dir/region.parquet")
      .select(col("r_regionkey"), col("r_name"), lit("orig").as("r_comment"))
      .collect().map(_.toSeq).toSet
    assert(etl.read("region").collect().map(_.toSeq).toSet == orig)
  }

  test("insert appends aligned rows; unknown/missing columns are rejected") {
    import spark.implicits._
    val etl = freshEtl()
    etl.insert("region", Seq((99, "NEW", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    assert(etl.read("region").count() == 6)
    assert(etl.read("region").filter(col("r_regionkey") === 99).count() == 1)
    intercept[IllegalArgumentException] {
      etl.insert("region", Seq((1, "x")).toDF("r_regionkey", "bogus"))
    }
    intercept[IllegalArgumentException] {
      etl.insert("region", Seq(1).toDF("r_regionkey")) // missing columns
    }
  }

  test("update rewrites only matching rows and only assigned columns") {
    val etl = freshEtl()
    val before = etl.read("region").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    etl.update("region", col("r_regionkey") === 2, Map("r_comment" -> lit("patched")))
    val after = etl.read("region").collect()
    assert(after.filter(_.getInt(0) == 2).forall(_.getString(2) == "patched"))
    assert(after.filter(_.getInt(0) != 2).forall(r => r.getString(2) != "patched"))
    // names untouched
    assert(after.map(r => r.getInt(0) -> r.getString(1)).toMap == before)
  }

  test("delete drops matching rows only") {
    val etl = freshEtl()
    etl.delete("region", col("r_regionkey") >= 3)
    val keys = etl.read("region").collect().map(_.getInt(0)).toSet
    assert(keys == Set(0, 1, 2))
  }

  test("merge replaces matched keys and appends new ones") {
    import spark.implicits._
    val etl = freshEtl()
    etl.merge("region",
      Seq((0, "REPLACED", "m"), (77, "APPENDED", "m"))
        .toDF("r_regionkey", "r_name", "r_comment"),
      Seq("r_regionkey"))
    val rows = etl.read("region").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows(0) == "REPLACED")
    assert(rows(77) == "APPENDED")
    assert(rows.size == 6)
  }

  test("a failed swap never leaves a half-written table visible") {
    // the shadow write happens BEFORE the live dir is touched: force a
    // write failure (schema mismatch passes alignment but the plan throws
    // at execution) and confirm the table still reads its old state
    val etl = freshEtl()
    val n = etl.read("region").count()
    intercept[Exception] {
      etl.update("region", col("r_regionkey") === 0,
        Map("r_regionkey" -> expr("raise_error('boom')")))
    }
    assert(etl.read("region").count() == n)
  }
}
