package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.sources.Etl

/** ETL write-command contract key (SURVEY §2.1 — upstream `tweak.etl`).
  *
  * The Spark side PHYSICALLY exercises the write path: copy `region` into
  * a fresh working directory, then insert / update / delete / merge
  * against the parquet files (each step a distributed rewrite + atomic
  * swap), and read the final state back. The oracle reproduces the same
  * post-state relationally from the original tables — so the driver's
  * hash verifies the whole write → swap → read-back loop, not just a
  * DataFrame expression.
  */
object EtlQueries extends QueryModule {

  def queries: Map[String, Q] = Map(
    "q_etl_pipeline" -> { (s, dir) =>
      import s.implicits._
      val t = new Tables(s, dir)
      val work = java.nio.file.Files.createTempDirectory("graft_etl_").toString
      val etl = new Etl(s, work)
      // copy: bulk-load the 5-row region table (plus a synthesized comment
      // column — the fixture has none) into the working dir
      etl.copy("region", t.region.select(col("r_regionkey"), col("r_name"),
        lit("orig").as("r_comment")))
      // insert: three rows derived from nation, keyed past the existing range
      etl.insert("region", t.nation.filter(col("n_nationkey") < 3)
        .select((col("n_nationkey") + 100).as("r_regionkey"),
          col("n_name").as("r_name"), lit("inserted").as("r_comment")))
      // update + delete + merge run as ONE transaction (upstream `do()`):
      // one shadow generation, one commit marker, one swap
      etl.transact { tx =>
        // update: rewrite the comment of even-keyed rows only
        tx.update("region", col("r_regionkey") % 2 === 0,
          Map("r_comment" -> concat(lit("U:"), col("r_name"))))
        // delete: drop one row
        tx.delete("region", col("r_regionkey") === 3)
        // merge: upsert — key 1 exists (replaced), key 200 is new (appended)
        tx.merge("region",
          Seq((1, "MERGED1", "m"), (200, "MERGED200", "m"))
            .toDF("r_regionkey", "r_name", "r_comment"),
          Seq("r_regionkey"))
      }
      // materialize the read-back (the driver's hash still verifies the
      // whole write → swap → read-back loop), then remove the working dir
      // so repeated runs leave no /tmp residue — in a finally, and
      // best-effort: a failed collect must not leak the dir, and a
      // cleanup hiccup must not fail an already-correct result
      try {
        val result = etl.read("region").orderBy("r_regionkey")
        val rows = result.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
      } finally
        try {
          val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(work))
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.delete(p))
          finally walk.close()
        } catch {
          case e: java.io.IOException =>
            System.err.println(s"[etl] temp-dir cleanup failed for $work: ${e.getMessage}")
        }
    }
  )

  def oracleSql: Map[String, String] = Map(
    // the same post-state, derived relationally: copy → insert (union) →
    // update (case) → delete (filter) → merge (anti-join + union)
    "q_etl_pipeline" ->
      """WITH w1 AS (
           SELECT r_regionkey, r_name, 'orig' AS r_comment FROM region
           UNION ALL
           SELECT n_nationkey + 100, n_name, 'inserted'
           FROM nation WHERE n_nationkey < 3),
         w2 AS (
           SELECT r_regionkey, r_name,
             CASE WHEN r_regionkey % 2 = 0 THEN 'U:' || r_name
                  ELSE r_comment END AS r_comment
           FROM w1),
         w3 AS (SELECT * FROM w2 WHERE r_regionkey <> 3),
         src(r_regionkey, r_name, r_comment) AS (
           VALUES (CAST(1 AS INTEGER), 'MERGED1', 'm'),
                  (CAST(200 AS INTEGER), 'MERGED200', 'm')),
         w4 AS (
           SELECT * FROM w3
           WHERE r_regionkey NOT IN (SELECT r_regionkey FROM src)
           UNION ALL
           SELECT * FROM src)
         SELECT r_regionkey, r_name, r_comment FROM w4 ORDER BY r_regionkey"""
  )
}
