package graft.sources

import org.apache.spark.sql.SparkSession

/** Shared sidecar-file I/O + the marker-gate protocol every persisted
  * store uses (IVFPQ index, fingerprint store, Z-order layout, ORC
  * fixture): small text files through the Hadoop FS API (so any
  * scheme works), and build-once gating where the recipe marker is
  * written LAST — a crash mid-build leaves no marker, so the next
  * ensure rebuilds instead of serving a half-written store. One copy,
  * one thing to keep correct. */
private[graft] object StoreFiles {

  def fsOf(spark: SparkSession, p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  /** Run independent Spark write actions concurrently on a bounded
    * pool (guide §2.6: the scheduler happily runs several jobs at once
    * — actions are only serial because caller code calls them
    * serially). Callers must ensure shared upstream frames are cached
    * AND already materialized (or cheap), so concurrent first-compute
    * does not duplicate expensive work. First failure propagates. */
  def inParallel(thunks: Seq[() => Unit]): Unit =
    if (thunks.size <= 1) thunks.foreach(_.apply())
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(4, thunks.size))
      try {
        val futs = thunks.map(t =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = t()
          }))
        futs.foreach(_.get()) // propagate the first failure loudly
      } finally pool.shutdown()
    }

  def writeText(spark: SparkSession, p: String, s: String): Unit = {
    val (fs, hp) = fsOf(spark, p)
    val out = fs.create(hp, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  def readText(spark: SparkSession, p: String): Option[String] = {
    val (fs, hp) = fsOf(spark, p)
    if (!fs.exists(hp)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(hp).getLen.toInt)
      val in = fs.open(hp)
      try in.readFully(0, buf) finally in.close()
      Some(new String(buf, "UTF-8"))
    }
  }

  /** Run `build` unless `path/_built.json` already records `recipe`;
    * marker written after the build lands. Returns build seconds, or
    * None when warm. */
  def markerGate(spark: SparkSession, path: String, recipe: String)(
      build: => Unit): Option[Double] = {
    val marker = s"$path/_built.json"
    if (readText(spark, marker).contains(recipe)) None
    else {
      val t0 = System.nanoTime()
      build
      writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }
}
