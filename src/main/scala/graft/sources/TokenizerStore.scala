package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.sources.StoreFiles.{readText, writeText}

/** Persisted BPE tokenizer — the serving half of the tokenizer
  * lifecycle. Training ([[graft.operators.CorpusStats.bpeTrainVocab]])
  * runs ONCE per tokenizer and its cost amortizes across every corpus
  * the merge table ever encodes; this store makes that amortization
  * real: the trained artifacts persist as parquet under the
  * [[SnapshotDir]] commit protocol (versioned, atomically published,
  * writer-locked, time-travelable like the state store), and encoding
  * any later corpus is one scan + a broadcast join against the stored
  * vocabulary — no retraining, no corpus-dependence on the training
  * data being reachable.
  *
  * Two relations per version:
  *  - the VOCABULARY `(w, freq, syms)` — every training-corpus word
  *    with its fully-merged symbol sequence (the encode join input;
  *    dimension-sized, broadcast at encode time);
  *  - `_merges` `(merge_rank, left, right, cnt)` — the ordered merge
  *    list, the tokenizer's portable definition (what you'd export to
  *    any other runtime; sufficient to re-derive `syms` for unseen
  *    words, which this corpus encoder does not need because OOV
  *    words tokenize as themselves).
  *
  * Scale shape: the vocabulary is bounded by the training corpus's
  * distinct-word count, not its size — it rides one broadcast. A 100 TB
  * encode is embarrassingly parallel: scan, broadcast-hash join, one
  * per-doc aggregate. */
object TokenizerStore {

  private val Prefix = "vocab-"
  val FormatVersion = 2 // v2: unigram scores via exact-integer fixLogScore

  private def currentDir(spark: SparkSession, path: String): String =
    SnapshotDir.current(spark, path, Prefix).getOrElse(
      throw new IllegalStateException(
        s"no committed tokenizer vocabulary under $path"))

  /** Train on `docs` and publish the vocabulary + merge list as the
    * next committed version. */
  def writeVocab(docs: DataFrame, path: String, nMerges: Int,
      textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val (merges, vocab) = graft.operators.CorpusStats
      .bpeTrainVocab(docs, nMerges, textCol)
    SnapshotDir.withWriterLock(spark, path) {
      val next = SnapshotDir.next(spark, path, Prefix)
      val vdir = s"$path/${SnapshotDir.name(Prefix, next)}"
      vocab.write.mode(SaveMode.Overwrite).parquet(vdir)
      merges.write.mode(SaveMode.Overwrite).parquet(s"$vdir/_merges")
      SnapshotDir.commit(spark, path, Prefix, next)
    }
    SnapshotDir.gc(spark, path, Prefix)
  }

  /** [[writeVocab]] gated by a recipe marker (same protocol as the
    * other stores: marker last, any recipe mismatch rebuilds, a
    * missing committed version rebuilds even under a live marker).
    * Returns the training seconds, or None when warm. */
  def ensureVocab(docs: DataFrame, path: String, nMerges: Int,
      textCol: String = "text"): Option[Double] = {
    val spark = docs.sparkSession
    val marker = s"$path/_built.json"
    val recipe = s"""{"v":$FormatVersion,"merges":$nMerges,""" +
      s""""text":"$textCol"}"""
    if (readText(spark, marker).contains(recipe) &&
        SnapshotDir.current(spark, path, Prefix).isDefined) None
    else {
      val t0 = System.nanoTime()
      writeVocab(docs, path, nMerges, textCol)
      writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  /** The stored vocabulary `(w, freq, syms)` of the current version. */
  def readVocab(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(currentDir(spark, path))

  /** The stored merge list `(merge_rank, left, right, cnt)`. */
  def readMerges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"${currentDir(spark, path)}/_merges")

  /** Encode `docs` against the STORED vocabulary — identical output to
    * [[graft.operators.CorpusStats.bpeEncode]] over the training
    * corpus (the vocabulary round-trips parquet exactly), without the
    * training passes. */
  def encodeFromStore(spark: SparkSession, path: String,
      docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    graft.operators.CorpusStats.encodeWithVocab(docs,
      readVocab(spark, path), textCol, idCol)

  // ------------------------------------------------ unigram family

  private val UniPrefix = "uvocab-"

  /** Persist the UNIGRAM piece table `(piece, cnt, s)` — the
    * SentencePiece-family counterpart of the BPE vocabulary above,
    * same commit protocol. sTot (the Viterbi normalizer) derives from
    * the stored counts at encode time, so the table IS the whole
    * model: integer counts and integer scores round-trip parquet
    * exactly, making the stored encode bit-equal to the in-query one. */
  def writeUnigramVocab(docs: DataFrame, path: String, vocabSize: Int,
      maxPieceLen: Int, textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val vocab = graft.operators.CorpusStats
      .unigramVocabFrame(docs, vocabSize, maxPieceLen, textCol)
    SnapshotDir.withWriterLock(spark, path) {
      val next = SnapshotDir.next(spark, path, UniPrefix)
      vocab.write.mode(SaveMode.Overwrite)
        .parquet(s"$path/${SnapshotDir.name(UniPrefix, next)}")
      SnapshotDir.commit(spark, path, UniPrefix, next)
    }
    SnapshotDir.gc(spark, path, UniPrefix)
    ()
  }

  /** [[writeUnigramVocab]] behind the recipe marker; returns training
    * seconds or None when warm. */
  def ensureUnigramVocab(docs: DataFrame, path: String, vocabSize: Int,
      maxPieceLen: Int, textCol: String = "text"): Option[Double] = {
    val spark = docs.sparkSession
    val marker = s"$path/_built.json"
    val recipe = s"""{"v":$FormatVersion,"kind":"unigram",""" +
      s""""size":$vocabSize,"maxlen":$maxPieceLen,"text":"$textCol"}"""
    if (readText(spark, marker).contains(recipe) &&
        SnapshotDir.current(spark, path, UniPrefix).isDefined) None
    else {
      val t0 = System.nanoTime()
      writeUnigramVocab(docs, path, vocabSize, maxPieceLen, textCol)
      writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  /** The stored unigram piece table `(piece, cnt, s)`. */
  def readUnigramVocab(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(SnapshotDir.current(spark, path, UniPrefix)
      .getOrElse(throw new IllegalStateException(
        s"no committed unigram vocabulary under $path")))

  /** Encode `docs` against the STORED unigram vocabulary — identical
    * output to [[graft.operators.CorpusStats.unigramTokenEncode]] over
    * the training corpus, without the vocab-seeding passes. */
  def encodeUnigramFromStore(spark: SparkSession, path: String,
      docs: DataFrame, maxPieceLen: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val vocab = readUnigramVocab(spark, path)
      .orderBy(org.apache.spark.sql.functions.col("piece"))
      .collect() // bounded metadata: the tokenizer model itself
      .map(r => graft.operators.CorpusStats.UnigramPiece(
        r.getAs[String]("piece"), r.getAs[Long]("cnt"),
        r.getAs[Long]("s")))
      .toSeq
    graft.operators.CorpusStats.unigramEncodeBody(docs,
      graft.operators.CorpusStats.unigramSegmentedWithVocab(docs,
        vocab, maxPieceLen, textCol), textCol, idCol)
  }
}
