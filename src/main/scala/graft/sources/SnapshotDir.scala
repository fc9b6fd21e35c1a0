package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Commit-marker snapshot protocol for a directory of table versions —
  * the plain-parquet answer to "overwrite a table readers are using".
  *
  * Layout: `<root>/<prefix>NNNNNNNN/` per version; a version is visible
  * iff its `_committed` marker file exists. Publishing is ONE atomic
  * file create — no directory rename anywhere (renames are not atomic
  * on object stores, and a rename swap has an instant where the live
  * path is missing). Readers resolve the highest committed version at
  * scan time; an in-flight reader that resolved version v keeps
  * reading v's files because [[gc]] retains `grace` previous committed
  * versions. A writer that crashes before its marker leaves an
  * invisible directory the next GC sweeps — the live table is never
  * touched. This is the degenerate single-table form of the snapshot
  * commit that table formats (Iceberg, Delta) build manifest layers
  * on top of; swap this object for one of them on a lakehouse
  * deployment and the calling code is unchanged.
  *
  * Single WRITER per root (a plain filesystem has no compare-and-swap
  * to arbitrate two committers); any number of concurrent readers.
  * [[withWriterLock]] enforces that assumption best-effort: every
  * version-claiming writer runs its claim→write→commit span under a
  * create-fail lock marker, so two concurrent committers fail loudly
  * instead of silently racing version numbers. */
private[graft] object SnapshotDir {

  private val CommitMarker = "_committed"
  private val WriterLock = "_writer.lock"

  /** Run `body` holding the root's writer lock — the guard for the
    * single-writer contract. Best-effort by design on stores without
    * an atomic conditional create (the documented limit of a plain-FS
    * protocol; a lakehouse table format replaces this with a real CAS
    * commit), but every best-effort edge is narrowed:
    *
    *  - acquisition on `file://` uses `File.createNewFile` (O_EXCL —
    *    Hadoop's RawLocalFileSystem `create(overwrite=false)` is a
    *    non-atomic exists-then-create); other schemes use the FS
    *    create-fail;
    *  - the lock carries an owner TOKEN; contended acquisition and
    *    release verify ownership, so a reclaim race cannot end with
    *    two silent holders (the loser throws) and a finishing writer
    *    never deletes a usurper's live lock;
    *  - a heartbeat thread re-touches the lock every `staleMs / 3`, so
    *    a body running longer than the stale window keeps ownership
    *    (only a CRASHED writer's lock goes stale);
    *  - a lock older than `staleMs` is crash debris: it is reclaimed
    *    (delete guarded by a modtime re-check of the exact lock
    *    observed) with ONE retry, so a crashed writer delays the next
    *    one by at most the stale window instead of deadlocking the
    *    store;
    *  - a write failure AFTER a successful create releases the
    *    half-stamped lock and rethrows, instead of silently leaving an
    *    orphan that blocks every writer for the stale window.
    *
    * A live conflicting writer throws — loud beats racing. */
  def withWriterLock[T](spark: SparkSession, root: String,
      staleMs: Long = 15 * 60 * 1000L)(body: => T): T = {
    val (fs, _) = fsOf(spark, root)
    val lock = new Path(root, WriterLock)
    val token = java.util.UUID.randomUUID().toString
    def stampToken(): Unit =
      try {
        val out = fs.create(lock, true) // we hold the slot; stamp it
        try out.write(token.getBytes("UTF-8")) finally out.close()
      } catch {
        case e: java.io.IOException =>
          // we created a lock we cannot stamp: release it rather than
          // leave an anonymous orphan blocking the root for staleMs
          try fs.delete(lock, false)
          catch { case _: java.io.IOException => () }
          throw e
      }
    def tryAcquire(): Boolean = {
      val created =
        if (Option(fs.getUri.getScheme).forall(_ == "file")) {
          val f = new java.io.File(lock.toUri.getPath)
          Option(f.getParentFile).foreach(_.mkdirs())
          try f.createNewFile()
          catch { case _: java.io.IOException => false }
        } else
          try { fs.create(lock, false).close(); true }
          catch { case _: java.io.IOException => false }
      if (created) stampToken()
      created
    }
    def ownsLock(): Boolean =
      try {
        val in = fs.open(lock)
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          n > 0 && new String(buf, 0, n, "UTF-8").startsWith(token)
        } finally in.close()
      } catch { case _: java.io.IOException => false }
    if (!tryAcquire()) {
      val seen =
        try Some(fs.getFileStatus(lock).getModificationTime)
        catch { case _: java.io.IOException => None } // vanished
      val now = System.currentTimeMillis()
      if (seen.forall(now - _ > staleMs)) {
        // reclaim crash debris — delete only the exact lock observed
        // (a fresh lock racing in between must survive)
        try seen.foreach { m =>
          if (fs.getFileStatus(lock).getModificationTime == m)
            fs.delete(lock, false)
        } catch { case _: java.io.IOException => () }
        tryAcquire()
      }
      // contended path: we hold the lock ONLY if it carries our token
      // (two reclaimers can both "succeed" transiently; one wins here)
      if (!ownsLock())
        throw new IllegalStateException(
          s"concurrent writer holds $lock — SnapshotDir roots are " +
            "single-writer; serialize committers or remove a stale " +
            "lock left by a crashed writer")
    }
    // heartbeat: a long body must not age into the stale window
    val hb = new Thread(() => {
      try while (!Thread.currentThread().isInterrupted) {
        Thread.sleep(math.max(staleMs / 3, 50L))
        // Exception, not just IOException: an FS without setTimes
        // (some object stores) throws UnsupportedOperationException,
        // which must not kill the heartbeat thread — the lock then
        // simply has no renewal there, the pre-heartbeat behavior
        try fs.setTimes(lock, System.currentTimeMillis(), -1)
        catch { case _: Exception => () }
      } catch { case _: InterruptedException => () }
    }, s"snapshotdir-lock-heartbeat")
    hb.setDaemon(true)
    hb.start()
    try body finally {
      hb.interrupt()
      // release only OUR lock — never a usurper's live one
      try if (ownsLock()) fs.delete(lock, false)
      catch { case _: java.io.IOException => () }
    }
  }

  private def fsOf(spark: SparkSession, p: String) = {
    val hp = new Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  def name(prefix: String, v: Long): String = f"$prefix$v%08d"

  /** All version numbers under `root` with the given prefix, paired
    * with their committed flag. Uncommitted = crash debris (never
    * read, but their numbers are never reused). */
  def versions(spark: SparkSession, root: String,
      prefix: String): Seq[(Long, Boolean)] = {
    val (fs, hp) = fsOf(spark, root)
    if (!fs.exists(hp)) Seq.empty
    else fs.listStatus(hp).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap { s =>
        scala.util.Try(
          s.getPath.getName.stripPrefix(prefix).toLong).toOption
          .map(v => v -> fs.exists(new Path(s.getPath, CommitMarker)))
      }
  }

  /** Directory of the highest COMMITTED version, if any. */
  def current(spark: SparkSession, root: String,
      prefix: String): Option[String] = {
    val committed = versions(spark, root, prefix).filter(_._2).map(_._1)
    if (committed.isEmpty) None
    else Some(s"$root/${name(prefix, committed.max)}")
  }

  /** Directory of a SPECIFIC committed version — the time-travel read.
    * None if the version was never committed or has been GC'd; callers
    * surface that as "pin expired", never silently fall back to
    * current. */
  def atVersion(spark: SparkSession, root: String, prefix: String,
      v: Long): Option[String] = {
    val (fs, _) = fsOf(spark, root)
    val dir = new Path(s"$root/${name(prefix, v)}")
    if (fs.exists(new Path(dir, CommitMarker))) Some(dir.toString)
    else None
  }

  /** Next version number: above every existing dir, committed or not. */
  def next(spark: SparkSession, root: String, prefix: String): Long =
    versions(spark, root, prefix).map(_._1).foldLeft(0L)(math.max) + 1

  /** Publish a fully-written version: the atomic commit point. */
  def commit(spark: SparkSession, root: String, prefix: String,
      v: Long): Unit = {
    val (fs, _) = fsOf(spark, root)
    val out = fs.create(
      new Path(s"$root/${name(prefix, v)}/$CommitMarker"), true)
    try out.write(
      String.valueOf(System.currentTimeMillis()).getBytes("UTF-8"))
    finally out.close()
  }

  /** Drop old versions, keeping the current plus `grace` previous
    * committed ones as the in-flight-reader window (a scan holding
    * version v must survive until its job ends — one maintenance cycle
    * of retention, the plain-parquet form of snapshot expiry).
    * Uncommitted dirs below the current version are crash debris and
    * go too. Returns true once more than `grace` committed versions
    * exist — the signal that any pre-protocol legacy layout under the
    * root has aged out of its own grace window and may be removed by
    * the caller. */
  def gc(spark: SparkSession, root: String, prefix: String,
      grace: Int = 1): Boolean = {
    val (fs, _) = fsOf(spark, root)
    val all = versions(spark, root, prefix)
    val committed = all.filter(_._2).map(_._1)
      .sorted(Ordering[Long].reverse)
    val keep = committed.take(1 + grace).toSet
    all.filter { case (v, _) => !keep.contains(v) }
      .filter { case (v, isCommitted) =>
        isCommitted || committed.headOption.exists(v < _) }
      .foreach { case (v, _) =>
        fs.delete(new Path(s"$root/${name(prefix, v)}"), true) }
    committed.size > grace
  }
}
