package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Takedown propagation — the compliance sweep every production corpus
  * eventually needs: given the ids of removed documents / vectors /
  * facts, rewrite EVERY persisted family so no serve path returns
  * them again. The derived stores exist precisely because recomputing
  * them per query is unaffordable; the flip side is that a removal
  * must chase the data into each of them.
  *
  * Per family the action is the store's own takedown primitive, each
  * committing through its own snapshot/manifest protocol — ATOMIC PER
  * STORE (a reader never observes a half-removed id inside one
  * store), with the multi-store sweep as a plain driver loop over
  * batch-sized jobs. A crash mid-sweep leaves a prefix of stores
  * done; the sweep is safe to RE-RUN whole, UNCONDITIONALLY: the
  * anti-join and tombstone forms are naturally idempotent, and the
  * count retractions (the non-idempotent algebra) record
  * `takedownTag` in a DURABLE applied-tag set carried by every later
  * version's manifest — a replayed tag is skipped even when OTHER
  * commits (a scheduled ingest append) landed between the original
  * sweep and the re-run, the window where a current-version tag
  * comparison would silently double-subtract. Backstop: an
  * over-retraction that slips past the guard aborts on the stores'
  * negative-count invariant instead of committing.
  *
  * What each family does:
  *  - fingerprints: buckets + arrays anti-join, every lineage, one
  *    manifest commit each ([[FingerprintStore.takedown]]);
  *  - edges: pairs/bands anti-join + touched-group label repair
  *    (components can SPLIT — [[ClusterStore.repairAfterRemoval]]),
  *    Louvain L1 dropped for rebuild ([[EdgeStore.takedown]]);
  *  - ANN indexes: tombstones ([[VectorIndexStore.deleteIvfPq]] — no
  *    list rewrite at delete time; compaction folds them in);
  *  - rollups: exact algebraic subtraction of the removed facts'
  *    partial contributions ([[AggStore.retractDelta]]);
  *  - language models: exact count subtraction
  *    ([[LmStore.retractDocs]] — bigrams never span documents, so
  *    retraction equals a retrain over the filtered corpus).
  *
  * Sketch states: the Count-Min frequency windows retract EXACTLY
  * (linear sketch — [[graft.operators.CountMin.retractedSketch]]
  * subtracts the removed docs' sketch, bit-equal to the filtered
  * rebuild); Misra-Gries states are NOT invertible (their error
  * admissions are stream-order state, not sums) and rebuild instead.
  *
  *  - dimension history ([[Scd2Store]]): removal is per SUBJECT — a
  *    history table's content is the subject's timeline, so the sweep
  *    drops every row of the removed keys (anti-join republish);
  *  - layout stores ([[HilbertStore]]/[[ZOrderStore]]): anti-join
  *    republish of the clustered rows — a layout store persists the
  *    FACT ROWS it clusters (content, not just arrangement), so the
  *    sweep rewrites them like any other persisted copy of the data;
  *  - tokenizers: REBUILD, not algebra — a BPE vocabulary is a top-V
  *    cut whose merges can move under any count change, so the sweep
  *    retrains on the SURVIVING corpus (`retrainCorpus`, which only
  *    the caller can supply — removed ids can't reconstruct it) on a
  *    branch, then promotes: the documented non-algebraic pattern,
  *    and the last persisted family embedding removed documents'
  *    text ([[TokenizerStore]] merges/vocab derive from it). The
  *    retrain reuses the store's OWN recipe hyperparameters
  *    ([[TokenizerStore.recipeMerges]]).
  *
  * History: each store's PRE-takedown version remains readable until
  * the normal GC grace window ages it out — retention policy, not
  * this sweep, governs hard-deletion of old versions (run the
  * store's gc/vacuum with the grace the policy dictates). */
object Takedown {

  /** One sweep over every affected family. Any target may be empty.
    * `docIds` are the removed document ROWS: the fingerprint stores
    * key on `doc_id` alone, but the LM retraction needs `textCol` too
    * (negative counts come from the text) — validated UP FRONT, so an
    * ids-only frame fails before any store commits rather than
    * mid-sweep. `vecIds` key the vector-side stores (`vec_id`);
    * `removedFacts` are the fact ROWS leaving the rollups (the
    * retraction needs their values). `takedownTag` names this
    * takedown for replay-safety of the count retractions (it joins
    * the stores' durable applied-tag sets) — REQUIRED whenever a
    * rollup or LM store is swept; pass the ticket/batch id.
    * `tokenizerStores` retrain on `retrainCorpus` (the SURVIVING
    * document rows including `textCol`) via branch-then-promote —
    * required together, validated up front. */
  def sweep(spark: SparkSession,
      docIds: Option[DataFrame] = None,
      vecIds: Option[DataFrame] = None,
      removedFacts: Option[DataFrame] = None,
      fingerprintStores: Seq[String] = Nil,
      edgeStores: Seq[String] = Nil,
      vectorIndexes: Seq[String] = Nil,
      aggStores: Seq[String] = Nil,
      lmStores: Seq[String] = Nil,
      tokenizerStores: Seq[String] = Nil,
      retrainCorpus: Option[DataFrame] = None,
      hilbertStores: Seq[String] = Nil,
      zorderStores: Seq[String] = Nil,
      layoutIdCol: String = "event_id",
      scd2Stores: Seq[String] = Nil,
      subjectIds: Option[DataFrame] = None,
      subjectIdCol: String = "user_id",
      takedownTag: Option[String] = None,
      textCol: String = "text"): Unit = {
    // validate EVERYTHING before touching the first store: a sweep
    // that dies on a malformed argument after committing a prefix of
    // stores is technically re-runnable but operationally a mess
    require(takedownTag.isDefined ||
        (aggStores.isEmpty && lmStores.isEmpty),
      "takedownTag is required when sweeping rollup/LM stores: the " +
        "count retractions are replay-guarded by the tag")
    if (lmStores.nonEmpty)
      for (ids <- docIds) require(ids.columns.contains(textCol),
        s"LM retraction needs the removed document ROWS including " +
          s"'$textCol' — docIds has [${ids.columns.mkString(", ")}]")
    if (aggStores.nonEmpty)
      for (facts <- removedFacts) {
        val need = Seq("ts", "event_type", "value")
        val missing = need.filterNot(facts.columns.contains)
        require(missing.isEmpty,
          s"rollup retraction needs the removed fact ROWS with " +
            s"[${need.mkString(", ")}] (AggStore.partials re-derives " +
            s"the negated contributions from them) — removedFacts is " +
            s"missing [${missing.mkString(", ")}]")
      }
    if (hilbertStores.nonEmpty || zorderStores.nonEmpty) {
      require(removedFacts.isDefined,
        "layout-store takedown needs removedFacts — the layout " +
          "stores persist the fact rows they cluster")
      for (facts <- removedFacts)
        require(facts.columns.contains(layoutIdCol),
          s"layout takedown keys on '$layoutIdCol' — removedFacts " +
            s"has [${facts.columns.mkString(", ")}]")
    }
    if (scd2Stores.nonEmpty) {
      require(subjectIds.isDefined,
        "scd2 takedown removes SUBJECTS (whole per-key timelines) — " +
          "pass subjectIds")
      for (ids <- subjectIds)
        require(ids.columns.contains(subjectIdCol),
          s"scd2 takedown keys on '$subjectIdCol' — subjectIds has " +
            s"[${ids.columns.mkString(", ")}]")
    }
    if (tokenizerStores.nonEmpty) {
      require(retrainCorpus.isDefined,
        "tokenizer takedown is a RETRAIN over the surviving corpus — " +
          "pass retrainCorpus (removed ids alone cannot rebuild a " +
          "top-V vocabulary)")
      for (c <- retrainCorpus) require(c.columns.contains(textCol),
        s"tokenizer retrain needs the surviving document ROWS with " +
          s"'$textCol' — retrainCorpus has [${c.columns.mkString(", ")}]")
      for (p <- tokenizerStores)
        require(TokenizerStore.recipeMerges(spark, p).isDefined,
          s"tokenizer store $p carries no recipe marker — its " +
            "original merge count is unknown; retrain it explicitly")
    }
    for (ids <- docIds; p <- fingerprintStores)
      FingerprintStore.takedown(spark, p, ids)
    for (ids <- vecIds; p <- edgeStores)
      EdgeStore.takedown(spark, p, ids)
    for (ids <- vecIds; p <- vectorIndexes)
      VectorIndexStore.deleteIvfPq(spark, p, ids)
    for (facts <- removedFacts; p <- aggStores)
      AggStore.retractDelta(spark, p, facts, takedownTag)
    for (docs <- docIds; p <- lmStores)
      LmStore.retractDocs(spark, p, docs, textCol,
        batchTag = takedownTag)
    // layout stores persist the clustered FACT ROWS themselves —
    // anti-join republish, idempotent like the other anti-join forms
    for (facts <- removedFacts; p <- hilbertStores)
      HilbertStore.takedown(spark, p, facts, layoutIdCol)
    for (facts <- removedFacts; p <- zorderStores)
      ZOrderStore.takedown(spark, p, facts, layoutIdCol)
    // dimension history removes whole SUBJECT timelines
    for (ids <- subjectIds; p <- scd2Stores)
      Scd2Store.takedown(spark, p, ids, subjectIdCol)
    // non-algebraic rebuild: retrain on the surviving corpus on a
    // BRANCH, promote, drop — main serves either the full pre-sweep
    // model or the full retrained one, never a half state. Re-runs are
    // content-idempotent (deterministic trainer over the same corpus);
    // a crashed prior attempt's leftover branch is dropped first (its
    // lineage is stale or incomplete by definition).
    for (corpus <- retrainCorpus; p <- tokenizerStores) {
      val merges = TokenizerStore.recipeMerges(spark, p).get
      val br = "takedown_" + takedownTag.getOrElse("sweep")
        .toLowerCase.replaceAll("[^a-z0-9_]", "_")
      if (TokenizerStore.branches(spark, p).contains(br))
        TokenizerStore.dropBranch(spark, p, br)
      TokenizerStore.createBranch(spark, p, br)
      TokenizerStore.writeVocab(corpus, p, merges, textCol,
        branch = Some(br))
      TokenizerStore.promoteBranch(spark, p, br)
      TokenizerStore.dropBranch(spark, p, br)
    }
  }
}
