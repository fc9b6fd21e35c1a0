package graft.sources

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** VERSION-PINNED store clone — the maintenance/test device that copies
  * a persisted store to a fresh root so experiments (takedown drills,
  * append idempotency, compaction probes) never mutate the pristine
  * warm store. Production never copies a 100 TB store; this exists so
  * every drill starts from identical bytes.
  *
  * Why not a plain recursive root copy: a live root is a MOVING TARGET
  * — a concurrent writer's half-written version dir, a GC racing the
  * walk, or an in-place append lands a clone that no committed version
  * ever described (torn clones were the prime suspect behind the one
  * non-reproducing driver-sweep red of r12). This clone is structurally
  * incapable of tearing, twice over:
  *
  *  1. It resolves WHAT to copy from the store's own commit metadata
  *     FIRST: per version lineage (main and every branch prefix), only
  *     the CURRENT COMMITTED version dir, plus — for manifest stores —
  *     only the segment dirs that version's manifest references, plus
  *     root-level sidecar files (recipe markers, legacy schema
  *     sidecars). Uncommitted debris, aged-out versions, and orphan
  *     segments are never copied, so identical store states clone to
  *     identical content regardless of what garbage sits next to them.
  *  2. The resolve-and-copy runs under the SOURCE's writer lock, so no
  *     writer can commit, GC, or vacuum between the pin and the last
  *     byte — every copied file is immutable for the duration (commit
  *     protocols never modify a committed version in place).
  *
  * The clone is a valid store of the same protocol at `dst`: version
  * numbering continues from the pinned version, manifests'
  * root-relative segment paths resolve against the new root, and the
  * writer lock is NOT copied (a clone starts unlocked). History is
  * intentionally NOT cloned — pinned time-travel reads on a clone fail
  * loudly, exactly like a pin that aged out of the GC grace window. */
object StoreClone {

  /** `<prefix><version>` dir names, branch prefixes included (greedy
    * prefix keeps `fp-b-exp-` + digits intact). Same shape as
    * [[StoreCatalog]]'s discovery, widened past 8 digits. */
  private val VersionDir = "^(.+-)(\\d{8,})$".r

  /** Clone the CURRENT COMMITTED state of the store at `src` to `dst`
    * (clobbering `dst`). See the object doc for the pin + lock
    * guarantees. A live writer on `src` is POLLED out (up to
    * `lockWaitMs`, [[Branches.commitWindow]]'s discipline) rather
    * than failed: a clone is a reader-shaped maintenance step and
    * writers hold the lock only across their commit, so waiting is
    * almost always milliseconds. */
  def cloneStore(spark: SparkSession, src: String, dst: String,
      lockWaitMs: Long = 60000L): Unit = {
    val (fs, srcP) = StoreFiles.fsOf(spark, src)
    require(fs.exists(srcP), s"no store to clone at $src")
    val dstP = new Path(dst)
    if (fs.exists(dstP)) fs.delete(dstP, true)
    val conf = spark.sparkContext.hadoopConfiguration
    def copy(from: Path, to: Path): Unit =
      FileUtil.copy(fs, from, fs, to, false, true, conf)
    // Segment payloads are IMMUTABLE once committed (appends add new
    // segment dirs, compaction writes new files, GC/vacuum only
    // unlink), so on a local filesystem the clone can HARDLINK the
    // data files instead of copying their bytes — the dominant clone
    // cost drops to directory metadata. Unlinking either side later
    // (vacuum, re-clone clobber) never touches the other inode's
    // content. Root-level sidecars (recipe markers) are deliberately
    // NOT linked: `writeText` rewrites them IN PLACE, which through a
    // shared inode would corrupt the source — they stay byte-copies.
    val localRoot: Option[java.io.File] = fs.getScheme match {
      case "file" => Some(new java.io.File("/"))
      case _ => None
    }
    def linkTree(from: Path, to: Path): Unit = localRoot match {
      case None => copy(from, to)
      case Some(_) =>
        val src = new java.io.File(from.toUri.getPath)
        val dst = new java.io.File(to.toUri.getPath)
        def walk(s: java.io.File, d: java.io.File): Unit =
          if (s.isDirectory) {
            d.mkdirs()
            val kids = s.listFiles()
            if (kids != null) kids.foreach(k =>
              walk(k, new java.io.File(d, k.getName)))
          } else {
            try java.nio.file.Files.createLink(d.toPath, s.toPath)
            catch { // cross-device or unsupported: plain byte copy
              case _: java.io.IOException |
                  _: UnsupportedOperationException =>
                copy(new Path(s.getAbsolutePath),
                  new Path(d.getAbsolutePath))
            }
          }
        walk(src, dst)
    }
    // the copy set is resolved BEFORE any byte moves (and the lock
    // freezes it), so the per-entry copies are independent — run them
    // on a bounded pool instead of serially: the clone is pure
    // driver-side I/O latency and was the measured fixed cost of every
    // clone-based lifecycle query (r14 §1 profile)
    def copyAll(entries: Seq[(Path, Path)],
        via: (Path, Path) => Unit = copy): Unit = {
      if (entries.size <= 1) entries.foreach { case (f, t) => via(f, t) }
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, entries.size))
        try {
          val futs = entries.map { case (f, t) =>
            pool.submit(new java.util.concurrent.Callable[Unit] {
              def call(): Unit = via(f, t)
            })
          }
          futs.foreach(_.get()) // propagate the first failure loudly
        } finally pool.shutdown()
      }
    }
    val deadline = System.nanoTime() + lockWaitMs * 1000000L
    def locked[T](body: => T): T = {
      while (true) {
        try return SnapshotDir.withWriterLock(spark, src)(body)
        catch {
          case e: IllegalStateException
              if e.getMessage != null &&
                e.getMessage.contains("concurrent writer") =>
            if (System.nanoTime() > deadline) throw e
            Thread.sleep(50L)
        }
      }
      throw new IllegalStateException("unreachable")
    }
    locked {
      fs.mkdirs(dstP)
      val entries = fs.listStatus(srcP).toSeq
      // one current committed version per lineage prefix; everything
      // else version-shaped is debris or aged history — not cloned
      val committed = entries.filter(_.isDirectory).flatMap { st =>
        st.getPath.getName match {
          case VersionDir(prefix, num)
              if fs.exists(new Path(st.getPath, "_committed")) =>
            Some((prefix, num.toLong, st.getPath))
          case _ => None
        }
      }
      val current = committed.groupBy(_._1).values
        .map(_.maxBy(_._2)).toSeq
      // committed version dirs are immutable in place (the header
      // contract above) — link-clone them like segment payloads
      copyAll(current.map { case (_, _, p) =>
        (p, new Path(dstP, p.getName))
      }, via = linkTree)
      // manifest stores: copy exactly the segment uids the pinned
      // manifests reference (a uid's relations committed together, so
      // the whole uid dir is referenced content)
      val refUids = current.flatMap { case (_, _, p) =>
        ManifestDir.tryRead(spark, p.toString).toSeq
          .flatMap(_.relations.values.flatten)
          .flatMap(_.split("/") match {
            case Array("seg", uid, _*) => Some(uid)
            case _ => None
          })
      }.toSet
      copyAll(refUids.toSeq.map(uid =>
        (new Path(s"$src/seg/$uid"), new Path(s"$dst/seg/$uid"))),
        via = linkTree)
      // root-level sidecar files (recipe markers, legacy schema
      // sidecars) — but never the writer lock: a clone starts unlocked
      entries.filter(_.isFile)
        .filterNot(_.getPath.getName.startsWith("_writer.lock"))
        .foreach(st => copy(st.getPath,
          new Path(dstP, st.getPath.getName)))
      // legacy pre-protocol data dirs (an unversioned root layout has
      // no commit metadata to pin; the lock still freezes it)
      entries.filter(_.isDirectory).foreach { st =>
        val n = st.getPath.getName
        val versionShaped = VersionDir.pattern.matcher(n).matches()
        if (!versionShaped && n != "seg")
          copy(st.getPath, new Path(dstP, n))
      }
    }
    spark.catalog.refreshByPath(dst)
  }
}
