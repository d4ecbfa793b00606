package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of driver-checkable queries: each key maps to a Spark
  * implementation and (where SQL-expressible) a DuckDB oracle with matching
  * column names — the driver hash-compares the two at sf0.01.
  *
  * This mirrors the reference's golden-test regime
  * (`src/htsql/ctl/regress.py` + `test/regress.yaml`): every operator is
  * locked down end-to-end by a recorded-equivalence check rather than unit
  * mocks. Determinism rule (SURVEY.md §5): every query ends in a total-order
  * `orderBy`, and float aggregation goes through exact decimal so results are
  * independent of partition/merge order.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]
}
