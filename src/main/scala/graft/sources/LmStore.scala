package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.sources.StoreFiles.{readText, writeText}

/** Persisted bigram language model — the serving half of the
  * perplexity quality filter (the CCNet lifecycle: the model trains
  * ONCE on a curated target-domain sample, then every crawl snapshot
  * scores against the frozen model; retraining per corpus would make
  * scores incomparable across snapshots). Counts persist as parquet
  * under the [[SnapshotDir]] commit protocol (versioned, atomically
  * published, writer-locked, time-travelable), same as the tokenizer
  * vocabulary and the ANN index.
  *
  * Two relations per version, both bounded by VOCABULARY size:
  *  - unigram counts `(term, ucnt)` — the conditional's denominator
  *    and the model vocabulary (V = row count);
  *  - `_bigrams` `(bg, bcnt)` — the numerator counts.
  *
  * Scale shape: scoring a 100 TB corpus is one codegen'd bigram
  * explode, two vocabulary-sized joins (AQE broadcasts them while
  * they fit; past that they shuffle on the word key, which is
  * correct), and one per-doc aggregate. Out-of-model material scores
  * at the add-α smoothing floor instead of being dropped — the
  * behavior that makes a frozen model usable on unseen crawls. */
object LmStore {

  private val Prefix = "lm-"
  val FormatVersion = 1

  private def currentDir(spark: SparkSession, path: String): String =
    SnapshotDir.current(spark, path, Prefix).getOrElse(
      throw new IllegalStateException(
        s"no committed language model under $path"))

  /** Train on `docs` and publish the count relations as the next
    * committed version. */
  def writeModel(docs: DataFrame, path: String,
      textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val (bcnt, uni) = graft.operators.CorpusStats
      .bigramModel(docs, textCol)
    SnapshotDir.withWriterLock(spark, path) {
      val next = SnapshotDir.next(spark, path, Prefix)
      val vdir = s"$path/${SnapshotDir.name(Prefix, next)}"
      uni.write.mode(SaveMode.Overwrite).parquet(vdir)
      bcnt.write.mode(SaveMode.Overwrite).parquet(s"$vdir/_bigrams")
      SnapshotDir.commit(spark, path, Prefix, next)
    }
    SnapshotDir.gc(spark, path, Prefix)
  }

  /** [[writeModel]] gated by a recipe marker (marker last; a recipe
    * mismatch or missing committed version rebuilds). Returns the
    * training seconds, or None when warm. */
  def ensureModel(docs: DataFrame, path: String,
      textCol: String = "text"): Option[Double] = {
    val spark = docs.sparkSession
    val marker = s"$path/_built.json"
    val recipe = s"""{"v":$FormatVersion,"text":"$textCol"}"""
    if (readText(spark, marker).contains(recipe) &&
        SnapshotDir.current(spark, path, Prefix).isDefined) None
    else {
      val t0 = System.nanoTime()
      writeModel(docs, path, textCol)
      writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  /** TAKEDOWN on the language model: SUBTRACT the removed docs'
    * unigram/bigram contributions — counts are additive across
    * documents (bigrams never span a doc boundary), so the retracted
    * model is row-identical to a retrain over the filtered corpus
    * (spec-pinned), with zero-count terms dropped. This is the one
    * derived-model family where hard deletion is exact WITHOUT a
    * retrain; the tokenizer vocabularies are not algebraic (a count
    * change can move the top-V cut), so their takedown story is an
    * explicit retrain, documented there. Retraction is not naturally
    * idempotent (subtracting twice double-removes), so `batchTag`
    * rides the version commit and a replayed tag is skipped —
    * [[AggStore.retractDelta]]'s discipline. */
  def retractDocs(spark: SparkSession, path: String,
      removed: DataFrame, textCol: String = "text",
      batchTag: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions._
    SnapshotDir.withWriterLock(spark, path) {
      val cur = currentDir(spark, path)
      if (batchTag.isDefined &&
          readText(spark, s"$cur/_batch_tag") == batchTag) ()
      else {
        val (bneg, uneg) = graft.operators.CorpusStats
          .bigramModel(removed, textCol)
        val uni = spark.read.parquet(cur)
          .unionByName(uneg.select(col("term"),
            (-col("ucnt")).as("ucnt")))
          .groupBy(col("term")).agg(sum(col("ucnt")).as("ucnt"))
          .filter(col("ucnt") =!= 0L)
        val big = spark.read.parquet(s"$cur/_bigrams")
          .unionByName(bneg.select(col("bg"),
            (-col("bcnt")).as("bcnt")))
          .groupBy(col("bg")).agg(sum(col("bcnt")).as("bcnt"))
          .filter(col("bcnt") =!= 0L)
        val next = SnapshotDir.next(spark, path, Prefix)
        val vdir = s"$path/${SnapshotDir.name(Prefix, next)}"
        uni.write.mode(SaveMode.Overwrite).parquet(vdir)
        big.write.mode(SaveMode.Overwrite).parquet(s"$vdir/_bigrams")
        batchTag.foreach(t => writeText(spark, s"$vdir/_batch_tag", t))
        SnapshotDir.commit(spark, path, Prefix, next)
      }
    }
    SnapshotDir.gc(spark, path, Prefix)
  }

  /** Stored unigram counts `(term, ucnt)` of the current version. */
  def readUnigrams(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(currentDir(spark, path))

  /** Stored bigram counts `(bg, bcnt)`. */
  def readBigrams(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"${currentDir(spark, path)}/_bigrams")

  /** Score `docs` against the STORED model — identical output to
    * [[graft.operators.CorpusStats.bigramLogProb]] over the training
    * corpus (counts round-trip parquet exactly); on a LATER corpus,
    * out-of-model bigrams score at the smoothing floor under the
    * model's frozen vocabulary size. */
  def scoreFromStore(spark: SparkSession, path: String,
      docs: DataFrame, alpha: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    graft.operators.CorpusStats.bigramScoreWithModel(docs,
      readBigrams(spark, path), readUnigrams(spark, path), alpha,
      idCol, textCol)
}
