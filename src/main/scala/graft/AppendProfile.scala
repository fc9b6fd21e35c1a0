package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profile of the `x_neardup_append` lifecycle — the r13→r14
  * residue diagnostic (idle-min moved 4.5 → 5.9 s across the
  * store-clone migration, and the verdict asked WHICH phase pays):
  * times ensure-base (warm), version-pinned clone, the admission
  * append (candidate gen + verify + 3 segment writes + ONE manifest
  * commit), and the serve read, each phase separately, min-of-N.
  * Also counts the store's FS footprint (files copied per clone) —
  * the clone is file-by-file under the source lock, so its cost is
  * footprint-shaped, not data-shaped. */
object AppendProfile {

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.ExtQueries._
    val e = graft.Tables.embeddings(spark, d)
    val base = e.filter(
      col("vec_id") % AppendHoldoutMod =!= AppendHoldoutMod - 1)
    val batch = e.filter(
      col("vec_id") % AppendHoldoutMod === AppendHoldoutMod - 1)
    val basePath = java.nio.file.Paths
      .get(sys.props("java.io.tmpdir"), "graft-appendprof-base")
      .toString
    def timed(what: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[prof] $what%-14s $s%7.3f s")
      s
    }
    def countFiles(p: String): Int = {
      val root = new java.io.File(p)
      if (!root.exists()) 0
      else {
        def walk(f: java.io.File): Int =
          if (f.isFile) 1
          else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        walk(root)
      }
    }
    // cold ensure once, then warm phases min-of-N
    graft.sources.EdgeStore.ensureNearDupPairs(base, basePath,
      CosineThreshold, bands = NearDupBands, rowsPerBand = NearDupRows,
      dim = EmbeddingDim)
    val mins = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(Double.MaxValue)
    (1 to runs).foreach { _ =>
      val work = java.nio.file.Files
        .createTempDirectory("graft-appendprof-work").toString
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(work))
      Seq(
        "ensure_warm" -> timed("ensure_warm")(
          graft.sources.EdgeStore.ensureNearDupPairs(base, basePath,
            CosineThreshold, bands = NearDupBands,
            rowsPerBand = NearDupRows, dim = EmbeddingDim)),
        "clone" -> timed("clone")(
          graft.sources.StoreClone.cloneStore(spark, basePath, work)),
        "append" -> timed("append") {
          graft.sources.EdgeStore.appendBatch(batch, e, work,
            CosineThreshold, bands = NearDupBands,
            rowsPerBand = NearDupRows, dim = EmbeddingDim)
          ()
        },
        "read" -> timed("read")(
          graft.sources.EdgeStore.read(spark, work)
            .agg(bit_xor(xxhash64(struct(col("id_a"), col("id_b"),
              col("cos"))))).collect())
      ).foreach { case (k, v) => mins(k) = math.min(mins(k), v) }
      System.err.println(s"[prof] clone footprint: " +
        s"${countFiles(basePath)} base files -> " +
        s"${countFiles(work)} cloned files")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(work))
    }
    val total = Seq("ensure_warm", "clone", "append", "read")
      .map(mins).sum
    println(s"""{"metric":"neardup_append_profile","unit":"sec",""" +
      Seq("ensure_warm", "clone", "append", "read")
        .map(k => s""""$k":${f"${mins(k)}%.3f"}""").mkString(",") +
      s""","phase_total":${f"$total%.3f"},"runs":$runs,"sf":"$d"}""")
    spark.stop()
  }
}
