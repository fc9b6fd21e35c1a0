package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID (stopword n-gram heuristic), quality scoring,
  * and document fingerprinting. All pure `Column` combinators (codegen'd,
  * shuffle-free per row) so they run at scan speed over 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenization, lower-cased. */
  def words(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column =
    size(words(text))

  /** BPE-ish subword token estimate, engine-reproducible: split into
    * letter runs / digit runs / single punctuation marks, then charge
    * ceil(len/4) per letter run (BPE averages ~4 chars per subword for
    * English), ceil(len/3) per digit run, 1 per mark. Linear per row —
    * a scan-speed stand-in for a real tokenizer's token budget. */
  def bpeTokenCount(text: Column): Column = {
    val pieces = regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]+|[^ \\t\\n\\rA-Za-z0-9]"), lit(0))
    aggregate(
      transform(pieces, p =>
        when(p.rlike("^[A-Za-z]+$"), ceil(length(p) / 4.0))
          .when(p.rlike("^[0-9]+$"), ceil(length(p) / 3.0))
          .otherwise(lit(1L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash dedup.
    * A codegen'd single-pass kernel ([[graft.plans.WordShingles]]): the
    * HOF form below computes the same array but interpreted per element,
    * which dominated the dedup family's runtime under CPU contention. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.plans.TextExpressions.wordShingles(text, n)

  /** The original higher-order-function shingle pipeline. Kept as the
    * executable spec for [[shingles]] — ExtSpec asserts both forms agree
    * on the document corpus. */
  private[graft] def shinglesHof(text: Column, n: Int = 3): Column = {
    val ws = words(text)
    array_distinct(
      when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n), i =>
          concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** Every shingle OCCURRENCE in document order (NOT deduplicated) —
    * the unit for boilerplate-coverage measurement, where a phrase that
    * repeats inside one document must count each time it appears.
    * [[shingles]] deduplicates because Jaccard is a set measure; this
    * keeps multiplicity because coverage is a mass measure. Codegen'd
    * kernel: the HOF form below re-splits the row PER ELEMENT when
    * interpreted (9 s → 0.3 s on the boilerplate query at sf0.1). */
  def shingleOccurrences(text: Column, n: Int = 3): Column =
    graft.plans.TextExpressions.wordShingleOccurrences(text, n)

  /** HOF spec for [[shingleOccurrences]] — parity-asserted in ExtSpec. */
  private[graft] def shingleOccurrencesHof(text: Column, n: Int = 3)
      : Column = {
    val ws = words(text)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Stopword tables for the language-ID heuristic (top function words). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for",
      "with"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "se", "un",
      "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den",
      "im", "für"),
    "fr" -> Seq("le", "les", "des", "et", "une", "dans", "pour", "est",
      "du", "au"))

  /** Distinct-stopword hit count for one language. */
  def stopwordHits(text: Column, lang: String): Column = {
    val stops = Stopwords.toMap.apply(lang)
    size(array_intersect(words(text), lit(stops.toArray)))
  }

  /** Language-ID: argmax of stopword hits, ties broken by table order,
    * all-zero → "unknown". */
  def langId(text: Column): Column = {
    val scores = Stopwords.map { case (l, _) => l -> stopwordHits(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // fold right so earlier table entries win ties
    scores.foldRight(lit("unknown"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality score in [0,1]: length, alpha ratio, stopword ratio, mean
    * token length — the usual cheap pre-filter heuristics. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val alphaChars =
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val enHits = stopwordHits(text, "en").cast("double")
    val lenScore = least(nChars / lit(500.0), lit(1.0))
    val alphaRatio = alphaChars / greatest(nChars, lit(1.0))
    val stopScore = least(enHits / lit(5.0), lit(1.0))
    val meanTok = nChars / greatest(nTokens, lit(1.0))
    val tokScore =
      when(meanTok.between(3.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    // integer basis points, not round(_, 4): a 4-decimal half-tie like
    // .49625 is not a dyadic rational, so the double sits just BELOW it
    // (.49624999…) — but its SHORTEST REPR is "0.49625", so Spark's
    // repr-based round sees an exact tie and goes UP while a value-based
    // engine goes DOWN (observed at sf0.1, doc 1418). After ·10000 the
    // repr must spell out the sub-tie digits ("4962.4999…"), so both
    // engines round the same way; /10000.0 is then exact.
    round((lit(0.25) * lenScore + lit(0.25) * alphaRatio +
      lit(0.25) * stopScore + lit(0.25) * tokScore) * 10000) / 10000.0
  }

  /** Content fingerprint: md5 over whitespace-normalized lower-cased text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing fingerprint (the MOSS scheme): hash every character
    * k-gram with the md5-seeded rolling family, keep the minimum of each
    * window of `w` consecutive hashes, and digest the sorted distinct
    * survivors. Robust to local edits — an edit only perturbs the
    * windows it touches — where [[fingerprint]] flips entirely. No
    * shuffle, engine-reproducible; a codegen'd one-pass kernel
    * ([[graft.plans.WinnowFp]]) replaces the three interpreted HOF
    * layers of [[winnowFingerprintHof]]. */
  def winnowFingerprint(text: Column, k: Int = 5, w: Int = 4): Column =
    graft.plans.TextExpressions.winnowFingerprint(text, k, w)

  /** The original HOF winnowing pipeline — the executable spec for
    * [[winnowFingerprint]] (parity asserted in ExtSpec). */
  private[graft] def winnowFingerprintHof(text: Column, k: Int = 5,
      w: Int = 4): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    val grams = when(length(norm) >= k,
      transform(sequence(lit(1), length(norm) - (k - 1)),
        i => substr(norm, i, lit(k))))
      .otherwise(array().cast("array<string>"))
    val hashes = transform(grams, g => Dedup.seededHash(g, 0))
    val nh = size(hashes)
    val mins = when(nh >= w,
      array_distinct(transform(sequence(lit(0), nh - w),
        j => array_min(slice(hashes, j + 1, lit(w))))))
      .otherwise(when(nh > 0, array(array_min(hashes)))
        .otherwise(array().cast("array<bigint>")))
    md5(concat_ws(",", transform(array_sort(mins), h => h.cast("string"))))
  }

  /** Deflate compression ratio of the text (compressed/raw bytes) — the
    * "too repetitive" pretraining filter: templated or looping text
    * compresses far below natural prose (ratio near 0), near-random
    * noise sits near or above 1.0. One codegen'd Deflater pass per row
    * ([[graft.plans.TextExpressions.deflateRatio]]); zlib has no SQL
    * replay, so the driver check is rows-only and the spec bounds the
    * signal on crafted fixtures. Rounded to 4 decimals for a stable
    * repr. */
  def compressionRatio(text: Column): Column =
    round(graft.plans.TextExpressions.deflateRatio(text), 4)

  /** [[compressionRatio]] with its functional contract checked IN the
    * result — the auditable shape. zlib has no SQL replay, so the raw
    * ratio can never hash-match an external oracle; what CAN is what
    * this projects: the UTF-8 byte length (any engine replays it) and
    * two booleans an oracle expects to be always-TRUE, so a broken
    * Deflater wiring flips a hashed value instead of hiding behind a
    * rows-only count:
    *
    *  - `ratio_ok`: empty text is exactly 1.0 (the convention); any
    *    other text compresses to a positive size at most `raw + 5
    *    bytes per 64 KiB stored block + 64` — zlib's worst-case
    *    stored-block expansion bound, which only a wrong ratio
    *    denominator or corrupted stream can violate.
    *  - `rep_detect`: the repetition-detection property itself —
    *    deflating `text ‖ text` must cost at most the single-copy
    *    size plus back-reference overhead (≤ 8 bytes per 258-byte
    *    max-match + 512 block/tree slack) whenever the first copy fits
    *    the 32 KiB window (checked for raw ≤ 16000; larger rows pass
    *    vacuously). A compressor that failed to exploit duplication —
    *    the exact signal the filter sells — fails this row-by-row, on
    *    real corpus text, with no crafted fixture needed.
    *
    * Cost: one extra Deflater pass over 2× the bytes, scan-local, no
    * extra shuffle — the audit runs at corpus scale or on a sample. */
  def compressionSelfCheck(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val raw = octet_length(col(textCol)).cast("long")
    val r1 = graft.plans.TextExpressions.deflateRatio(col(textCol))
    val r2 = graft.plans.TextExpressions.deflateRatio(
      concat(col(textCol), col(textCol)))
    docs.select(col(idCol), raw.as("raw_len"), r1.as("r1"), r2.as("r2"))
      .select(col(idCol), col("raw_len"),
        when(col("raw_len") === 0, col("r1") === 1.0)
          .otherwise(col("r1") > 0.0 &&
            col("r1") * col("raw_len") <= col("raw_len") +
              ceil(col("raw_len") / 65535.0) * 5.0 + 64.0)
          .as("ratio_ok"),
        (col("raw_len") === 0 || col("raw_len") > 16000 ||
          col("r2") * col("raw_len") * 2.0 <=
            col("r1") * col("raw_len") +
              ceil(col("raw_len") / 258.0) * 8.0 + 512.0)
          .as("rep_detect"))
  }

  /** fastText-style hashed-feature linear scorer — the SERVING path of
    * the "Bag of Tricks" classifier (Joulin et al. 2016), the standard
    * learned quality filter in LLM data pipelines: features are the
    * document's unigrams plus word bigrams (duplicates kept — term
    * frequency weighting), each hashed into one of `buckets` weight
    * slots (the hashing trick — no vocabulary table to ship), the
    * document's raw margin is the sum of its buckets' weights, and
    * `keep` is the sign. Everything a production deployment does at
    * inference time — tokenize, hash, gather, sum, threshold — in one
    * codegen'd scan + a doc-keyed map-side-combined aggregate; no
    * broadcast, no vocabulary join.
    *
    * The weight TABLE is where training would plug in; here it is the
    * fixed reproducible stand-in `(bucket · 2654435761) mod 1001 − 500`
    * (Knuth's multiplicative constant), making the whole pipeline
    * all-integer and engine-replayable — the oracle recomputes every
    * margin exactly, so the driver hashes real values, not just row
    * shapes. The feature hash is the suite's seeded-md5 construction
    * (seed 0), the same buckets any engine replays. Documents with ZERO
    * features (empty text) produce no row — the filter has nothing to
    * score. */
  def hashedNgramScore(docs: DataFrame, buckets: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        explode(concat(
          array_remove(words(col(textCol)), ""),
          shingleOccurrences(col(textCol), 2))).as("f"))
      .select(col(idCol),
        pmod(Dedup.seededHash(col("f"), 0), lit(buckets.toLong))
          .as("bucket"))
      .select(col(idCol),
        (pmod(col("bucket") * lit(2654435761L), lit(1001L)) - lit(500L))
          .as("wgt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("wgt")).as("score_raw"))
      .withColumn("keep", col("score_raw") > 0L)

  /** CALIBRATION of the learned scorer against the rule-based filter —
    * the curation QA readout: bin [[hashedNgramScore]]'s margin into
    * fixed-width buckets and measure, per bin, how often
    * [[CorpusStats.gopherRules]] agrees the document is keepable. A
    * well-calibrated scorer shows keep_rate rising monotonically with
    * the bin — a flat profile means the learned margin carries no
    * quality signal and its threshold is theater. The reliability
    * diagram every learned filter should face before it gates data.
    *
    * Exactness: margins and bin ids are integers (floor over an
    * integer-valued double — a long `div` would truncate negatives
    * toward zero in Spark but floor in value engines), per-bin counts
    * and score sums exact longs, two closing divisions 6dp. One
    * doc-keyed join of two scan-speed frames, then a bins-sized
    * aggregate. */
  def scorerCalibration(docs: DataFrame, buckets: Int = 4096,
      binWidth: Long = 2000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sc = hashedNgramScore(docs, buckets, idCol, textCol)
      .select(col(idCol), col("score_raw"))
    val gk = CorpusStats.gopherRules(docs)
      .select(col(idCol), col("keep"))
    sc.join(gk, Seq(idCol))
      .withColumn("bin",
        floor(col("score_raw").cast("double") / lit(binWidth.toDouble))
          .cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(col("score_raw")).as("sum_score"))
      .select(col("bin"), col("n_docs"), col("n_keep"),
        col("sum_score"),
        round(col("n_keep").cast("double") /
          col("n_docs").cast("double"), 6).as("keep_rate"),
        round(col("sum_score").cast("double") /
          col("n_docs").cast("double"), 6).as("mean_score"))
  }
}
