package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ETL write commands over a directory of parquet tables — the analogue of
  * the reference's `tweak.etl` addon (`src/htsql/tweak/etl/cmd/insert.py`
  * (ProduceInsert), `update.py`, `delete.py`, `merge.py`, `copy.py`, and
  * the multi-command `do()` routine in `src/htsql/tweak/etl/cmd/command.py`).
  *
  * Parquet is immutable, so every mutating command is COPY-ON-WRITE: plan
  * the post-state declaratively (the write itself is a distributed job —
  * nothing ever collects), write it to a shadow directory, then swap the
  * directories. The swap is driver-side metadata work, O(1) regardless of
  * table size.
  *
  * CRASH ATOMICITY is a write-ahead commit-marker protocol — a directory
  * is self-healing at every step:
  *
  *   1. STAGE    every post-state writes to `<name>.parquet.swap`;
  *               the live directories are never touched.
  *   2. COMMIT   a `_txn_commit` marker naming the staged tables is
  *               published with a create-then-rename (atomic on
  *               POSIX/HDFS). This is the commit point.
  *   3. SWAP     per table: rename live → `.bak`, rename `.swap` → live,
  *               then drop the `.bak`s and the marker.
  *
  * Recovery (run before every commit and by any read that finds a marker
  * or a missing live dir): if the marker exists, every shadow it names was
  * fully written, so the transaction ROLLS FORWARD — each listed swap is
  * completed idempotently. Without a marker the commit point was never
  * reached, so stray `.swap` dirs are uncommitted debris (deleted) and a
  * `.bak` without its live dir restores. At no step can a crash lose the
  * pre-state AND the post-state.
  *
  * A production deployment would layer a transactional table format's
  * commit log over the same shape; the sandbox has no such dependency, so
  * this is the minimal honest equivalent. CONCURRENT WRITERS are DETECTED,
  * not isolated: a commit (a) takes a fail-loud lease (`_txn_lock`,
  * atomic create — a second writer inside the lease window aborts loudly
  * instead of silently interleaving swaps), and (b) verifies the
  * directory GENERATION (`_txn_gen`, bumped by every commit and stamped
  * with the committing writer's id in the `_txn_commit` header) still
  * matches the snapshot its transaction read — a writer that committed in
  * between fails the other transaction loudly (lost-update detection)
  * rather than letting it overwrite state it never saw. A lease older
  * than `leaseMs` is a crashed writer: recovery heals the directory and
  * the lease is reclaimed.
  *
  * Tables live at `<workDir>/<name>.parquet` — the same layout
  * `graft.model.Tables` reads, so an Etl working directory IS a queryable
  * data directory.
  */
final class Etl(val spark: SparkSession, val workDir: String,
    val leaseMs: Long = 10 * 60 * 1000L) {

  /** This writer's identity — stamped into the lease and the commit
    * marker so interleaved writers are attributable in the failure.
    */
  val writerId: String = java.util.UUID.randomUUID().toString.take(8)

  private def tablePath(name: String): String = s"$workDir/$name.parquet"
  private def livePath(name: String) = new Path(tablePath(name))
  private def swapPath(name: String) = new Path(tablePath(name) + ".swap")
  private def bakPath(name: String) = new Path(tablePath(name) + ".bak")
  private val markerPath = new Path(s"$workDir/_txn_commit")
  private val markerTmpPath = new Path(s"$workDir/_txn_commit.tmp")
  private val lockPath = new Path(s"$workDir/_txn_lock")
  private val genPath = new Path(s"$workDir/_txn_gen")
  private val genTmpPath = new Path(s"$workDir/_txn_gen.tmp")

  private def fs: FileSystem =
    new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read table `name`, healing any interrupted commit first. The fast
    * path (live dir present, no marker) costs two existence checks.
    */
  def read(name: String): DataFrame = {
    val f = fs
    if (f.exists(markerPath) || !f.exists(livePath(name))) recover(f)
    spark.read.parquet(tablePath(name))
  }

  /** `copy.py`: materialize `df` as table `name` (replacing any previous
    * state atomically).
    */
  def copy(name: String, df: DataFrame): Unit = transact(_.copy(name, df))

  /** `insert.py`: append rows (schema-aligned, type-coerced). */
  def insert(name: String, rows: DataFrame): Unit = transact(_.insert(name, rows))

  /** `update.py`: SET col := expr for rows matching `condition`; every
    * other row and column passes through unchanged.
    */
  def update(name: String, condition: Column, assignments: Map[String, Column]): Unit =
    transact(_.update(name, condition, assignments))

  /** `delete.py`: drop rows matching `condition`. */
  def delete(name: String, condition: Column): Unit = transact(_.delete(name, condition))

  /** `merge.py`: key-based upsert — matched rows are REPLACED by the
    * source row, unmatched source rows append (delete-matching + union:
    * one anti join, broadcast-able when the change set is small — the
    * common case — so the table shuffles zero rows).
    */
  def merge(name: String, source: DataFrame, keys: Seq[String]): Unit =
    transact(_.merge(name, source, keys))

  /** The reference's `do()` command: run several write commands as ONE
    * transaction. Commands inside `f` see each other's effects (reads go
    * through the overlay) but stage NO bytes until `f` returns; then all
    * post-states write to one shadow generation and commit at a single
    * marker. An exception anywhere inside `f` — validation, a failed
    * shadow write, a crash — leaves every live table in its pre-`f` state.
    */
  def transact(f: EtlTx => Unit): Unit = {
    val fsys = fs
    recover(fsys)
    // snapshot the generation BEFORE the transaction reads anything: the
    // commit verifies it under the lease, so a writer that commits while
    // this transaction is running fails THIS commit loudly (lost update)
    // instead of letting it clobber state it never observed
    val genAtStart = readGen(fsys)
    val tx = new EtlTx(this)
    f(tx)
    val staged = tx.staged
    if (staged.nonEmpty) commit(staged, genAtStart)
  }

  // ---- commit protocol --------------------------------------------------

  private def readGen(f: FileSystem): Long =
    if (!f.exists(genPath)) 0L
    else {
      val in = f.open(genPath)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.trim.split("\\s+").head.toLong
    }

  private def writeGen(f: FileSystem, gen: Long): Unit = {
    val out = f.create(genTmpPath, true)
    try out.write(s"$gen $writerId".getBytes("UTF-8")) finally out.close()
    f.delete(genPath, false)
    if (!f.rename(genTmpPath, genPath))
      throw new IllegalStateException(s"generation publish failed in $workDir")
  }

  /** Fail-loud lease: atomic create wins or throws. A lease older than
    * `leaseMs` belongs to a crashed writer — heal the directory and
    * reclaim it; a FRESH foreign lease means a live concurrent writer,
    * which this protocol rejects by design (single-writer, detected).
    */
  private def acquireLock(f: FileSystem): Unit = {
    def tryCreate(): Boolean =
      try {
        val out = f.create(lockPath, false)
        try out.write(writerId.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val age = try System.currentTimeMillis() - f.getFileStatus(lockPath).getModificationTime
        catch { case _: java.io.FileNotFoundException => Long.MaxValue }
      if (age < leaseMs)
        throw new IllegalStateException(
          s"concurrent ETL writer holds the lease on $workDir " +
            s"(lock age ${age}ms < lease ${leaseMs}ms) — refusing to interleave commits")
      // stale lease: the holder crashed; heal whatever it left behind,
      // reclaim, and retry the atomic create once
      recover(f)
      f.delete(lockPath, false)
      if (!tryCreate())
        throw new IllegalStateException(
          s"concurrent ETL writer raced the stale-lease takeover on $workDir")
    }
  }

  private def commit(staged: Seq[(String, DataFrame)], expectedGen: Long): Unit = {
    val f = fs
    acquireLock(f)
    var committed = false
    try {
      recover(f)
      val gen = readGen(f)
      if (gen != expectedGen)
        throw new IllegalStateException(
          s"concurrent ETL writer committed generation $gen under this " +
            s"transaction (writer $writerId read generation $expectedGen) — " +
            "aborting instead of overwriting state this transaction never saw")
      // 1. STAGE: distributed writes to the shadow dirs; live dirs
      //    untouched. A failure here leaves only debris recover() deletes.
      staged.foreach { case (n, df) =>
        df.write.mode("overwrite").parquet(swapPath(n).toString)
      }
      // 2. COMMIT POINT: publish the marker (create tmp + atomic rename);
      //    header = "<writerId> <generation>", then one staged name per line
      val out = f.create(markerTmpPath, true)
      try out.write((s"$writerId ${gen + 1}" +: staged.map(_._1)).mkString("\n")
        .getBytes("UTF-8"))
      finally out.close()
      if (!f.rename(markerTmpPath, markerPath))
        throw new IllegalStateException(s"commit-marker publish failed in $workDir")
      committed = true
      // 3. SWAP each table; every step is idempotently re-runnable
      staged.foreach { case (n, _) => rollForward(f, n) }
      writeGen(f, gen + 1)
      f.delete(markerPath, false)
    } finally {
      // pre-commit-point failures leave only debris; the marker (if
      // published) survives the lock release so recovery rolls forward
      if (!committed) staged.foreach { case (n, _) =>
        if (!f.exists(markerPath)) f.delete(swapPath(n), true)
      }
      f.delete(lockPath, false)
    }
  }

  /** Complete one table's swap; callable any number of times from any
    * intermediate state (commit path and recovery share it).
    */
  private def rollForward(f: FileSystem, name: String): Unit = {
    val live = livePath(name); val swap = swapPath(name); val bak = bakPath(name)
    if (f.exists(swap)) {
      if (f.exists(live)) {
        if (f.exists(bak)) f.delete(live, true) // bak already holds the pre-state
        else if (!f.rename(live, bak))
          throw new IllegalStateException(s"backup rename failed for $name")
      }
      if (!f.rename(swap, live))
        throw new IllegalStateException(s"swap rename failed for $name")
    } else if (!f.exists(live) && f.exists(bak)) {
      // defensive: cannot arise from this protocol, but never strand data
      f.rename(bak, live)
    }
    if (f.exists(live) && f.exists(bak)) f.delete(bak, true)
  }

  /** Heal the directory after any interruption (see class doc). */
  private def recover(f: FileSystem): Unit = {
    val base = new Path(workDir)
    if (!f.exists(base)) return
    if (f.exists(markerPath)) {
      // commit point was reached → every named shadow is complete: roll
      // FORWARD. Line 1 is the "<writerId> <generation>" header — finish
      // the generation bump too, so a crash between swap and gen-publish
      // still advances the generation other writers validate against.
      val in = f.open(markerPath)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = text.split("\n").iterator.filter(_.nonEmpty).toSeq
      val header = lines.head.split("\\s+")
      lines.tail.foreach(rollForward(f, _))
      if (header.length >= 2 && readGen(f) < header(1).toLong)
        writeGen(f, header(1).toLong)
      f.delete(markerPath, false)
    }
    // no marker → commit point never reached: live dirs are pristine,
    // leftover shadows are uncommitted debris, a live-less .bak restores
    f.listStatus(base).foreach { st =>
      val p = st.getPath
      if (p.getName == markerTmpPath.getName) f.delete(p, false)
      else if (p.getName.endsWith(".parquet.swap")) f.delete(p, true)
      else if (p.getName.endsWith(".parquet.bak")) {
        val live = new Path(base, p.getName.stripSuffix(".bak"))
        if (f.exists(live)) f.delete(p, true)
        else f.rename(p, live)
      }
    }
  }
}

/** The overlay a `transact` block mutates: reads see staged post-states,
  * writes replace them — nothing touches disk until the block completes.
  */
final class EtlTx private[sources] (etl: Etl) {
  private val dirty = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]

  private[sources] def staged: Seq[(String, DataFrame)] = dirty.toSeq

  /** Current state of `name` as this transaction sees it. */
  def read(name: String): DataFrame = dirty.getOrElse(name, etl.read(name))

  def copy(name: String, df: DataFrame): Unit = dirty(name) = df

  def insert(name: String, rows: DataFrame): Unit = {
    val cur = read(name)
    dirty(name) = cur.unionByName(Etl.aligned(cur, rows))
  }

  def update(name: String, condition: Column, assignments: Map[String, Column]): Unit = {
    val cur = read(name)
    val unknown = assignments.keySet -- cur.columns.toSet
    require(unknown.isEmpty, s"unknown columns: ${unknown.mkString(", ")}")
    dirty(name) = cur.select(cur.columns.map { c =>
      assignments.get(c)
        .map(v => when(condition, v.cast(cur.schema(c).dataType)).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }: _*)
  }

  def delete(name: String, condition: Column): Unit = {
    val cur = read(name)
    dirty(name) = cur.filter(!coalesce(condition, lit(false)))
  }

  def merge(name: String, source: DataFrame, keys: Seq[String]): Unit = {
    val cur = read(name)
    dirty(name) = Etl.mergedState(cur, Etl.aligned(cur, source), keys)
  }
}

object Etl {
  /** The merge post-state plan, exposed for plan-shape tests: table-side
    * rows pass through a BROADCAST anti join (the table never shuffles)
    * and the source appends.
    */
  private[graft] def mergedState(cur: DataFrame, src: DataFrame,
      keys: Seq[String]): DataFrame =
    cur.join(broadcast(src.select(keys.map(col): _*)), keys, "left_anti")
      .unionByName(src)

  /** Align `rows` to the table's column set by NAME (the reference's
    * insert validates fields against the catalog and rejects unknowns —
    * `src/htsql/tweak/etl/cmd/insert.py`, BuildExtractNode).
    */
  private[sources] def aligned(cur: DataFrame, rows: DataFrame): DataFrame = {
    val unknown = rows.columns.toSet -- cur.columns.toSet
    require(unknown.isEmpty, s"unknown columns: ${unknown.mkString(", ")}")
    val missing = cur.columns.toSet -- rows.columns.toSet
    require(missing.isEmpty, s"missing columns: ${missing.mkString(", ")}")
    rows.select(cur.columns.map(c => col(c).cast(cur.schema(c).dataType)): _*)
  }
}
