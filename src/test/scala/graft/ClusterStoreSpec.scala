package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, ExtQueries}
import graft.sources.{ClusterStore, EdgeStore}

/** The persisted cluster-label table: build-once correctness,
  * incremental maintenance ≡ full relabel, batch-sized label commits,
  * and the crash-window repair. */
class ClusterStoreSpec extends SparkSpec {
  import spark.implicits._

  private def assignSet(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def fileInventory(root: String): Map[String, (Long, Long)] = {
    val base = java.nio.file.Paths.get(root)
    val s = java.nio.file.Files.walk(base)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .filter(p => !p.getFileName.toString.contains("_SUCCESS"))
        .map(p => base.relativize(p).toString ->
          (java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
    } finally s.close()
  }

  test("incremental label maintenance equals the from-scratch relabel") {
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val batch = e.filter(pmod(col("vec_id"), lit(10)) === 9)
    val path = java.nio.file.Files
      .createTempDirectory("graft-cluster-admit").toString
    EdgeStore.ensureNearDupPairs(base, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows, dim = ExtQueries.EmbeddingDim)
    // labels BEFORE the admission — the append must take the
    // incremental-maintain path
    assert(ClusterStore.ensureLabels(spark, path).isDefined)
    assert(ClusterStore.ensureLabels(spark, path).isEmpty) // warm
    // base labels match a direct propagation over the base pairs
    val baseExpected = assignSet(Dedup.clusterAssignments(
      base, EdgeStore.read(spark, path), idCol = "vec_id"))
    assert(assignSet(
      ClusterStore.assignments(base, path, "vec_id")) === baseExpected)
    val labelInvBefore = fileInventory(path)
    EdgeStore.appendBatch(batch, e, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows, dim = ExtQueries.EmbeddingDim)
    val labelInvAfter = fileInventory(path)
    // batch-sized label commit: every pre-append DATA file (segment
    // parquet — pairs, bands, labels) is byte-untouched; only new
    // segments plus a new manifest version appear (version-dir
    // metadata beyond the GC grace window may age out, which is why
    // the immutability pin is scoped to seg/)
    labelInvBefore.filter(_._1.startsWith("seg/"))
      .foreach { case (f, sig) =>
        assert(labelInvAfter.get(f) === Some(sig),
          s"label maintenance rewrote base file $f")
      }
    assert(labelInvAfter.count(_._1.startsWith("seg/")) >
      labelInvBefore.count(_._1.startsWith("seg/")))
    // the store-served assignment over the FULL corpus equals the
    // from-scratch relabel over the union's pairs — bit for bit
    val fullExpected = assignSet(Dedup.clusterAssignments(
      e, EdgeStore.read(spark, path), idCol = "vec_id"))
    assert(assignSet(
      ClusterStore.assignments(e, path, "vec_id")) === fullExpected)
    // redelivery: zero fresh pairs, labels byte-identical
    val invBeforeRedeliver = fileInventory(path)
    assert(EdgeStore.appendBatch(batch, e, path,
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim) === 0L)
    assert(fileInventory(path) === invBeforeRedeliver)
    // compact: labels carried into the new version, one resolved row
    // per endpoint, identical assignments
    EdgeStore.compact(spark, path)
    val labels = ClusterStore.readLabels(spark, path)
    assert(labels.groupBy(col("id")).count()
      .filter(col("count") > 1).isEmpty)
    assert(assignSet(
      ClusterStore.assignments(e, path, "vec_id")) === fullExpected)
  }

  test("signature repair: a pairs-only manifest commit never serves " +
      "stale labels") {
    // toy graph: components {1,2} and {3,4} via pairs. Atomic manifest
    // commits rule out admission-time skew, so the remaining stale-
    // label hazard is a pairs-only commit from OUTSIDE appendBatch
    // (manual surgery, a migration tool) — simulated here by
    // hand-committing a manifest that adds a bridge pair segment
    // without touching labels or the signature. The mismatch must
    // repair on the next label read, never serve stale clusters.
    val pairs = Seq((1L, 2L, 0.99), (3L, 4L, 0.98))
      .toDF("id_a", "id_b", "cos")
    val bands = Seq((1L, 0, "x"), (2L, 0, "x"), (3L, 0, "y"),
      (4L, 0, "y")).toDF("id", "band", "bkey")
    val path = java.nio.file.Files
      .createTempDirectory("graft-cluster-repair").toString
    EdgeStore.writePairs(pairs, bands, path)
    ClusterStore.ensureLabels(spark, path)
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("vec_id")
    assert(assignSet(ClusterStore.assignments(verts, path, "vec_id")) ===
      Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L)))
    // the rogue commit: a bridge 2-3 lands as a new pair segment in a
    // hand-built manifest, labels and signature untouched
    val m = graft.sources.ManifestDir.current(spark, path, "edges-").get
    val seg = graft.sources.ManifestDir.segDir(
      graft.sources.ManifestDir.newSegmentId(), "pairs")
    Seq((2L, 3L, 0.97)).toDF("id_a", "id_b", "cos")
      .write.parquet(s"$path/$seg")
    graft.sources.ManifestDir.commit(spark, path, "edges-",
      m.withSegment("pairs", seg))
    // served labels REPAIR to the merged component, never stale
    assert(assignSet(ClusterStore.assignments(verts, path, "vec_id")) ===
      Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L)))
  }

  test("x_cluster_store: the registered query matches the inline relabel") {
    val e = Tables.embeddings(spark, sf0001)
    val got = ExtQueries.queries("x_cluster_store")(spark, sf0001)
    val expected = Dedup.clusterAssignments(e,
      graft.operators.Similarity.nearDupPairsLsh(e,
        ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
        rowsPerBand = ExtQueries.NearDupRows,
        dim = ExtQueries.EmbeddingDim), idCol = "vec_id")
    assert(assignSet(got) === assignSet(expected))
  }
}
