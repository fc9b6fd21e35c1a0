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
    // batch-sized label commit: every pre-append file untouched except
    // the meta sidecar (a signature checkpoint, rewritten per admit)
    labelInvBefore.filterNot(_._1.contains("_labels_meta.json"))
      .foreach { case (f, sig) =>
        assert(labelInvAfter.get(f) === Some(sig),
          s"label maintenance rewrote base file $f")
      }
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

  test("crash-window repair: pairs landed, labels did not") {
    // toy graph: components {1,2} and {3,4} via pairs; a crashed
    // writer's pair file then bridges 2-3 WITHOUT label maintenance —
    // the signature mismatch must repair on the next label read
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
    // the crash: a pair file appears with no label maintenance
    val cur = graft.sources.SnapshotDir.current(spark, path, "edges-").get
    Seq((2L, 3L, 0.97)).toDF("id_a", "id_b", "cos")
      .write.mode("append").parquet(cur)
    spark.catalog.refreshByPath(cur)
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
