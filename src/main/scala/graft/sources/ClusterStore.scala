package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.StoreFiles.{readText, writeText}

/** Persisted connected-component labels of the similarity graph — the
  * derived artifact one rung above the [[EdgeStore]] pair list. Pairs
  * persist so consumers stop re-running the LSH chain; labels persist
  * so consumers stop re-running LABEL PROPAGATION over the stored
  * pairs (O(log diameter) rounds of endpoint-sized joins, paid per
  * query before this store). Cluster census, SemDeDup keep-best, and
  * the dedup-group assignment all serve off ONE committed label table.
  *
  * Storage rides INSIDE the edge store's committed version directory
  * (`<version>/_labels`), not a separate [[SnapshotDir]] root: labels
  * are a pure function of exactly one pair-table version, and a
  * separate version line could skew (labels of version 3 serving next
  * to pairs of version 4). Committing them together means
  * [[EdgeStore.compact]]'s version swap, the GC grace window, and a
  * directory clone all carry the labels atomically with their pairs.
  *
  * Table: `(id, label)` for edge ENDPOINTS only — every other vertex
  * is a singleton whose cluster is its own id, resolved by the
  * consumer-side left join ([[assignments]]); the corpus never enters
  * the store. Labels are component-MIN ids, and components only ever
  * GROW (the edge store has no pair deletion), so a vertex's label is
  * monotonically non-increasing across admissions. That monotonicity
  * is the storage trick: the table is APPEND-ONLY and a read resolves
  * `min(label)` per id — an incremental merge appends only the
  * CORRECTED rows of the components it touched (plus the batch's new
  * endpoints), never rewriting the label table, and re-appending the
  * same delta is a no-op under min. File-count hygiene happens inside
  * [[EdgeStore.compact]], which collapses the resolved table to one
  * row per id in the next version.
  *
  * Staleness detection: a meta sidecar records the pair-table file
  * signature (count + bytes of the version's pair files — pair files
  * are immutable once written, so the signature is exact) at the last
  * time labels were maintained. A reader finding a mismatched
  * signature — a writer died between its pair append and its label
  * maintenance — REPAIRS by appending the full fresh endpoint labels
  * (endpoint-sized, monotone-safe: fresh labels are ≤ any under-merged
  * stored label, so min-resolution lands on the fresh value) instead
  * of serving silently-stale clusters. */
object ClusterStore {

  private val LabelsSub = "_labels"
  private val MetaSub = "_labels_meta.json"

  private def labelsDir(versionDir: String) = s"$versionDir/$LabelsSub"
  private def metaPath(versionDir: String) = s"$versionDir/$MetaSub"

  /** Signature of the version's PAIR data files (directly under the
    * version dir; `_bands`/`_labels`/markers excluded). Pair files are
    * append-only and immutable, so (count, total bytes) identifies the
    * pair-table state exactly. */
  private def pairFileSig(spark: SparkSession, versionDir: String)
      : String = {
    val (fs, hp) = StoreFiles.fsOf(spark, versionDir)
    val files = fs.listStatus(hp).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") &&
      !s.getPath.getName.startsWith("."))
    s"${files.length}:${files.map(_.getLen).sum}"
  }

  private def labelsFresh(spark: SparkSession, versionDir: String)
      : Boolean =
    readText(spark, metaPath(versionDir))
      .contains(pairFileSig(spark, versionDir))

  /** Full endpoint labels of `pairs` — component-min ids, the same
    * label propagation every inline consumer ran
    * ([[graft.operators.Dedup.clusterAssignments]]: adaptive local
    * union-find under the documented edge threshold, distributed
    * O(log diameter) path-halving above it). */
  private def fullEndpointLabels(pairs: DataFrame): DataFrame = {
    val endpoints = pairs.select(explode(array(
        col("id_a"), col("id_b"))).as("id")).distinct()
    graft.operators.Dedup.clusterAssignments(endpoints, pairs,
        idCol = "id")
      .select(col("id"), col("cluster_id").as("label"))
  }

  /** Make the committed labels current for the edge store's pair
    * table: first touch builds them; a signature mismatch (crash
    * between a pair append and its label maintenance) repairs by
    * appending the full fresh endpoint labels. Fast path is one
    * file-listing plus one sidecar read — no lock, no Spark job.
    * Returns the build/repair seconds, or None when warm (the
    * `index_build_sec` accounting every serving store reports). */
  def ensureLabels(spark: SparkSession, edgePath: String)
      : Option[Double] = {
    val cur0 = SnapshotDir.current(spark, edgePath, "edges-").getOrElse(
      throw new IllegalStateException(
        s"no committed edge store under $edgePath"))
    if (labelsFresh(spark, cur0)) None
    else SnapshotDir.withWriterLock(spark, edgePath) {
      // re-resolve + re-check inside the lock: a racing writer may
      // have committed a new version or finished the same repair
      val cur = SnapshotDir.current(spark, edgePath, "edges-").get
      if (labelsFresh(spark, cur)) None
      else {
        val t0 = System.nanoTime()
        val sig = pairFileSig(spark, cur)
        fullEndpointLabels(spark.read.parquet(cur))
          .write.mode(SaveMode.Append).parquet(labelsDir(cur))
        writeText(spark, metaPath(cur), sig)
        spark.catalog.refreshByPath(labelsDir(cur))
        Some((System.nanoTime() - t0) / 1e9)
      }
    }
  }

  /** The resolved label table `(id, label)`: one row per edge
    * endpoint, `min` over the append-accumulated rows (monotone labels
    * make min the correct resolution — see the object doc). */
  def readLabels(spark: SparkSession, edgePath: String): DataFrame = {
    ensureLabels(spark, edgePath)
    val cur = SnapshotDir.current(spark, edgePath, "edges-").get
    spark.read.parquet(labelsDir(cur))
      .groupBy(col("id")).agg(min(col("label")).as("label"))
  }

  /** Cluster assignment for every vertex: committed labels for edge
    * endpoints, own id for singletons — `(idCol, cluster_id)`, the
    * exact frame the inline label propagation produced, served from
    * the store. */
  def assignments(vertices: DataFrame, edgePath: String,
      idCol: String): DataFrame = {
    val spark = vertices.sparkSession
    val labels = readLabels(spark, edgePath)
      .select(col("id").as(idCol), col("label"))
    vertices.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("label"), col(idCol)).as("cluster_id"))
  }

  /** Incremental maintenance — called by [[EdgeStore.appendBatch]]
    * inside its writer-lock critical section AFTER the batch's pairs
    * landed. No-op until [[ensureLabels]] first built the table (a
    * store that never served labels pays nothing). All work is
    * batch- or touched-component-sized except one endpoint-sized read
    * of the resolved label table:
    *
    *  1. the batch pairs' endpoints look up their current labels
    *     (left join; absent = new endpoint, label = own id);
    *  2. the pairs project onto the label QUOTIENT graph — one edge
    *     `(label_a, label_b)` per pair — and a driver-side union-find
    *     merges them (bounded by 2·|batch pairs| nodes, the same
    *     driver budget as the documented local union-find rung);
    *  3. the remap (old label → merged min) rewrites only stored rows
    *     whose component was touched (broadcast join against the
    *     remap) plus the batch's new endpoints — appended, never
    *     rewriting a file.
    *
    * Appending the identical delta twice is harmless (min-resolution),
    * so a redelivered admit — which [[EdgeStore.appendBatch]] already
    * reduces to zero fresh pairs — cannot corrupt labels. The meta
    * signature is written LAST: a crash anywhere earlier leaves a
    * mismatch the next [[ensureLabels]] repairs. */
  private[sources] def maintain(spark: SparkSession, versionDir: String,
      newPairs: DataFrame): Unit = {
    val (fs, labelsHp) = StoreFiles.fsOf(spark, labelsDir(versionDir))
    if (!fs.exists(labelsHp)) return
    val stored = graft.operators.CacheRegistry.tracked(
      spark.read.parquet(labelsDir(versionDir))
        .groupBy(col("id")).agg(min(col("label")).as("label")))
    val eps = newPairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
      .join(stored, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("lbl"),
        col("label").isNotNull.as("was_stored"))
    val epMap = graft.operators.CacheRegistry.tracked(eps)
    // quotient-graph edges: one per pair, labels instead of vertices
    val labelEdges = newPairs
      .join(epMap.select(col("id").as("id_a"), col("lbl").as("la")),
        Seq("id_a"))
      .join(epMap.select(col("id").as("id_b"), col("lbl").as("lb")),
        Seq("id_b"))
      .select(col("la"), col("lb")).distinct()
      .collect()
    val parent = new java.util.HashMap[Long, java.lang.Long]()
    def find(x: Long): Long = {
      var r = x
      while ({ val pr = parent.get(r); pr != null && pr != r })
        r = parent.get(r)
      var c = x
      while ({ val pc = parent.get(c); pc != null && pc != c }) {
        val nx: Long = parent.get(c); parent.put(c, r); c = nx
      }
      r
    }
    labelEdges.foreach { row =>
      val ra = find(row.getLong(0))
      val rb = find(row.getLong(1))
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    import scala.jdk.CollectionConverters._
    val remapRows = parent.keySet.asScala.toSeq
      .map(l => (l.toLong, find(l))).filter { case (f, t) => f != t }
    import spark.implicits._
    val remap = remapRows.toDF("from", "to")
    // stored rows of TOUCHED components get their merged min; the
    // broadcast is remap-sized (≤ quotient-node count)
    val delta1 = stored.join(broadcast(remap),
        col("label") === col("from"))
      .select(col("id"), col("to").as("label"))
    // batch endpoints: new ids always get a row (their component min);
    // already-stored ones only when their label changed (delta1 has
    // them already — emitting both would be harmless, just larger)
    val remapApplied = epMap.join(broadcast(remap),
        col("lbl") === col("from"), "left")
      .select(col("id"), coalesce(col("to"), col("lbl")).as("label"),
        col("was_stored"))
    val delta2 = remapApplied.filter(!col("was_stored"))
      .select(col("id"), col("label"))
    // EAGER localCheckpoint before appending into the path the delta's
    // own lineage reads — the same write-invalidates-cache hazard
    // [[EdgeStore.appendBatch]] documents for its pair append
    delta1.unionByName(delta2).localCheckpoint()
      .write.mode(SaveMode.Append).parquet(labelsDir(versionDir))
    writeText(spark, metaPath(versionDir), pairFileSig(spark, versionDir))
    spark.catalog.refreshByPath(labelsDir(versionDir))
  }

  /** Carry labels into a freshly-compacted version dir — called by
    * [[EdgeStore.compact]] after the new version's pair files are
    * written (so the recorded signature matches them). Collapses the
    * append-accumulated rows to one resolved row per id. No-op when
    * the old version never built labels. */
  private[sources] def compactInto(spark: SparkSession, oldDir: String,
      newDir: String): Unit = {
    val (fs, labelsHp) = StoreFiles.fsOf(spark, labelsDir(oldDir))
    if (!fs.exists(labelsHp)) return
    spark.read.parquet(labelsDir(oldDir))
      .groupBy(col("id")).agg(min(col("label")).as("label"))
      .write.mode(SaveMode.Overwrite).parquet(labelsDir(newDir))
    writeText(spark, metaPath(newDir), pairFileSig(spark, newDir))
  }
}
