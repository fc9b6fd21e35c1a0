package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the text-analysis hot loops.
  *
  * The built-in route for shingling / winnowing is a chain of higher-order
  * functions (`transform` over `sequence`, `array_min` over `slice`):
  * Catalyst evaluates every lambda element interpreted — closure dispatch
  * and boxed intermediates per array element — and the HOF node breaks
  * whole-stage codegen for the enclosing stage. One tight JVM loop per row
  * does the same work 10-50× faster and keeps the stage codegen'd. Each
  * kernel is a bit-exact mirror of the Column combinator it replaces
  * (same trim/lower/split/substring semantics, same md5-derived hashes),
  * so the DuckDB oracles and every downstream plan are unchanged —
  * [[graft.operators.TextAnalysis]] keeps the HOF forms as
  * spec-checked parity references.
  */
object TextKernels {
  private val Ws = Pattern.compile("\\s+")
  private val Md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val md = Md5.get(); md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Mirror of `Dedup.seededHash(g, 0)`: first 15 md5 hex chars of
    * `g + "#0"` parsed as a 60-bit long. */
  private def seededHash0(g: String): Long =
    java.lang.Long.parseLong(md5Hex(g + "#0").substring(0, 15), 16)

  /** Mirror of the HOF pipeline `array_distinct(when(size(ws) >= n,
    * transform(sequence(0, size(ws)-n), i => concat_ws(" ", ws[i..i+n-1])))
    * .otherwise(array()))` with `ws = split(lower(trim(text)), "\\s+")`.
    * UTF8String.toLowerCase/trim are the exact `lower()`/`trim()`
    * semantics (trim strips 0x20 only). */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val words = Ws.split(text.toLowerCase.trim.toString, -1)
    if (words.length < n) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    val last = words.length - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder(words(i))
      var k = 1
      while (k < n) { sb.append(' ').append(words(i + k)); k += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** [[shingles]] without the dedup: every shingle OCCURRENCE in document
    * order — the boilerplate-coverage unit, where multiplicity counts. */
  def shingleOccurrences(text: UTF8String, n: Int): ArrayData = {
    val words = Ws.split(text.toLowerCase.trim.toString, -1)
    if (words.length < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](words.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var k = 1
      while (k < n) { sb.append(' ').append(words(i + k)); k += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Mirror of `TextAnalysis.winnowFingerprintHof`: md5 over the sorted
    * distinct window-minima of md5-seeded character k-gram hashes.
    * Substrings count code points exactly like Catalyst `substr`. */
  def winnowFingerprint(text: UTF8String, k: Int, w: Int): UTF8String = {
    val norm = Ws.matcher(text.toLowerCase.trim.toString).replaceAll(" ")
    val cps = norm.codePoints().toArray
    val nGrams = if (cps.length >= k) cps.length - k + 1 else 0
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = seededHash0(new String(cps, i, k))
      i += 1
    }
    val mins = new java.util.TreeSet[java.lang.Long]
    if (nGrams >= w) {
      var j = 0
      val lastW = nGrams - w
      while (j <= lastW) {
        var m = hashes(j)
        var t = 1
        while (t < w) { if (hashes(j + t) < m) m = hashes(j + t); t += 1 }
        mins.add(m)
        j += 1
      }
    } else if (nGrams > 0) {
      var m = hashes(0)
      i = 1
      while (i < nGrams) { if (hashes(i) < m) m = hashes(i); i += 1 }
      mins.add(m)
    }
    val sb = new java.lang.StringBuilder
    val it = mins.iterator()
    while (it.hasNext) {
      if (sb.length > 0) sb.append(',')
      sb.append(it.next().longValue())
    }
    UTF8String.fromString(md5Hex(sb.toString))
  }

  /** Mirror of the aggregate-based SimHash (`Dedup.simhashAgg`): split
    * into words, term-frequency map, each distinct word's 60-bit
    * md5-seeded hash votes ±tf per bit, sign of the summed votes becomes
    * the bit. Whole signature in one pass over the row — the aggregate
    * formulation shuffles an exploded (id, word) table and runs 60
    * conditional sums for the same number. */
  def simhash(text: UTF8String, bits: Int): Long = {
    val words = Ws.split(text.toLowerCase.trim.toString, -1)
    val tf = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < words.length) {
      tf.merge(words(i), 1, (a, b) => a + b)
      i += 1
    }
    val sums = new Array[Long](bits)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = seededHash0(e.getKey)
      val c = e.getValue.toLong
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) sums(b) += c else sums(b) -= c
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Mirror of Spark's `round(d, 4)` on doubles (BigDecimal HALF_UP). */
  /** Value-based basis-point rounding — NOT BigDecimal.valueOf, whose
    * shortest-repr HALF_UP diverges from value-based engines on
    * non-dyadic half-ties (the class documented at
    * TextAnalysis.qualityScore); Math.round(x·10⁴) matches the Spark
    * expression `round(x * 10000) / 10000.0` and DuckDB bit-for-bit for
    * the non-negative fractions this kernel emits. */
  private def round4(d: Double): Double =
    Math.round(d * 10000.0) / 10000.0

  /** Both repetition signals in one pass: the fraction of bigram
    * occurrences held by the most frequent bigram (0.0 below two words)
    * and the duplicate-word fraction `1 − distinct/total`. Mirrors the
    * aggregate formulation (`CorpusStats.repetitionSignalsAgg`) —
    * explode → two-level groupBy → join — which shuffles one row per
    * distinct (doc, bigram) for numbers this kernel reads off two local
    * hash maps. Returns [top_bigram_frac, dup_word_frac]. */
  def repSignals(text: UTF8String): ArrayData = {
    val words = Ws.split(text.toLowerCase.trim.toString, -1)
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < words.length) { distinct.add(words(i)); i += 1 }
    val dup = round4(1.0 -
      distinct.size.toDouble / math.max(words.length, 1).toDouble)
    if (words.length < 2)
      return new GenericArrayData(Array[Any](0.0, dup))
    val counts = new java.util.HashMap[String, Int]()
    var max = 0
    i = 0
    while (i < words.length - 1) {
      val bg = words(i) + " " + words(i + 1)
      val c = counts.merge(bg, 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    new GenericArrayData(Array[Any](
      round4(max.toDouble / (words.length - 1).toDouble), dup))
  }

  /** All ordered pairs (ids[i], ids[j]), i < j, of a sorted long array —
    * the per-shingle pair expansion for exact Jaccard. One allocation of
    * the exact output size; n is bounded by the shingle df cap. */
  def pairCombos(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = org.apache.spark.sql.catalyst.InternalRow(a, ids.getLong(j))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  /** Deflate (zlib level 6, raw stream) compression ratio of the UTF-8
    * bytes: compressed_len / raw_len. The classic "too repetitive"
    * pretraining filter — templated/repeated text compresses far below
    * natural prose, near-random noise sits near (or above) 1.0. Pure
    * JVM Deflater, deterministic for a given input; empty input → 1.0
    * by convention. */
  // Deflater wraps native zlib state: allocating one per row is
  // measurable overhead on a corpus-wide scan, so each task thread
  // reuses a single instance via reset(). The ThreadLocal lives for
  // the executor thread's lifetime (Spark task threads are pooled),
  // which is the same lifecycle executor-side caches use.
  private val localDeflater =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(6, true)
    }

  def deflateRatio(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.length == 0) return 1.0
    val d = localDeflater.get()
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length
    } finally d.reset() // reusable for the next row even after a throw
  }

  /** Greedy left-to-right single-pass application of one BPE merge
    * `(l, r) → l+r` over a symbol array (non-overlapping: after a
    * merge the scan resumes AFTER the merged token). Equivalent to
    * merge-first-occurrence-until-fixpoint — the (l, r) pair can never
    * recur THROUGH a merged token, since `l+r = l` needs an empty `r`
    * and `l+r = r` an empty `l` — which is what the DuckDB oracle's
    * recursive rewrite computes. */
  /** Candidate start positions are capped at this many CODE POINTS —
    * a "word" longer than 128 code points is binary junk, a URL, or a
    * concatenation artifact, not tokenizer-vocabulary material, and an
    * unbounded enumeration would let one pathological token dominate
    * the candidate frame. The generated DuckDB oracle unrolls the same
    * bound (`range(0, 128)` over substring starts), so the two engines
    * enumerate the identical candidate set by construction. */
  val UnigramMaxWordStarts = 128

  /** All substrings of `w` with length 1..maxLen starting in the first
    * [[UnigramMaxWordStarts]] positions, document order, multiplicity
    * kept — the unigram-tokenizer candidate generator (runs over the
    * DISTINCT-WORD frame, not the corpus). Positions, lengths, and
    * substring boundaries count UNICODE CODE POINTS, not UTF-16 units:
    * the oracle's `substr`/`length` count code points, and a non-BMP
    * character (emoji, rare CJK) under UTF-16 indexing would split
    * surrogate pairs and enumerate a different candidate set. */
  def charGrams(word: UTF8String, maxLen: Int): ArrayData = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    val out = new java.util.ArrayList[AnyRef](
      math.min(n, UnigramMaxWordStarts) * maxLen)
    var st = 0
    while (st < n && st < UnigramMaxWordStarts) {
      var l = 1
      while (l <= maxLen && st + l <= n) {
        out.add(UTF8String.fromString(new String(cps, st, l)))
        l += 1
      }
      st += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-thread cache of the Viterbi piece map, keyed by the vocab
    * ArrayData's reference identity: the pieces/scores arrays arrive
    * as ONE Literal per plan (codegen references the same instance on
    * every row), so the map builds once per task, not per word. A
    * non-literal caller just rebuilds per row — correct either way. */
  private val ViterbiVocab = new ThreadLocal[(ArrayData,
    java.util.HashMap[String, java.lang.Long])]

  /** Viterbi-best unigram segmentation of `word` (Kudo 2018): maximize
    * Σ(s_piece − sTot) over covers by vocab pieces of length ≤ maxLen —
    * s and sTot are INTEGER-scaled log-frequencies (⌊1e6·ln(c)⌉), so
    * every DP comparison is exact long arithmetic and both engines
    * agree on the argmax bit-for-bit (the only transcendental is the
    * per-piece score rounding, vocab-sized exposure, mirrored in the
    * oracle). Ties prefer the LONGER final piece (l iterated
    * descending, strict improvement required). Returns null when no
    * cover exists (impossible when the vocab carries every corpus
    * character; callers coalesce to the whole word). */
  def unigramViterbi(word: UTF8String, pieces: ArrayData,
      scores: ArrayData, maxLen: Int, sTot: Long): ArrayData = {
    val cached = ViterbiVocab.get()
    val map: java.util.HashMap[String, java.lang.Long] =
      if (cached != null && (cached._1 eq pieces)) cached._2
      else {
        val m = new java.util.HashMap[String, java.lang.Long](
          pieces.numElements() * 2)
        var i = 0
        while (i < pieces.numElements()) {
          m.put(pieces.getUTF8String(i).toString,
            java.lang.Long.valueOf(scores.getLong(i)))
          i += 1
        }
        ViterbiVocab.set((pieces, m))
        m
      }
    // the DP indexes CODE POINTS (like [[charGrams]] and the oracle's
    // substr/length): UTF-16 indexing would run the recurrence over a
    // different position space for any non-BMP character
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(new Array[AnyRef](0))
    val Unreach = java.lang.Long.MIN_VALUE
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) { best(i) = Unreach; i += 1 }
    i = 1
    while (i <= n) {
      var l = math.min(maxLen, i)
      while (l >= 1) {
        if (best(i - l) != Unreach) {
          val s = map.get(new String(cps, i - l, l))
          if (s != null) {
            val cand = best(i - l) + s.longValue() - sTot
            if (best(i) == Unreach || cand > best(i)) {
              best(i) = cand
              back(i) = l
            }
          }
        }
        l -= 1
      }
      i += 1
    }
    if (best(n) == Unreach) return null
    var k = n
    var cnt = 0
    while (k > 0) { cnt += 1; k -= back(k) }
    val out = new Array[AnyRef](cnt)
    k = n
    var j = cnt - 1
    while (k > 0) {
      out(j) = UTF8String.fromString(new String(cps, k - back(k),
        back(k)))
      j -= 1
      k -= back(k)
    }
    new GenericArrayData(out)
  }

  def bpeMergePair(syms: ArrayData, l: UTF8String,
      r: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (i + 1 < n && l.equals(syms.getUTF8String(i)) &&
          r.equals(syms.getUTF8String(i + 1))) {
        out(m) = UTF8String.concat(l, r); i += 2
      } else { out(m) = syms.getUTF8String(i); i += 1 }
      m += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

}

/** Codegen'd word n-gram shingle set (distinct, first-occurrence order) —
  * the single-call replacement for the interpreted HOF chain. The loop
  * lives in [[TextKernels.shingles]]; codegen just emits the static call,
  * which keeps the enclosing stage inside whole-stage codegen. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got " +
        child.dataType.simpleString)

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.shingles($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

/** Codegen'd word n-gram shingle OCCURRENCES (document order, duplicates
  * kept) — the boilerplate-coverage unit; same single-pass kernel shape
  * as [[WordShingles]] minus the LinkedHashSet. */
case class WordShingleOccurrences(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingle_occurrences"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingle_occurrences expects a string column, got " +
        child.dataType.simpleString)

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleOccurrences(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.shingleOccurrences($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): WordShingleOccurrences = copy(child = newChild)
}

/** Codegen'd winnowing (MOSS) fingerprint — one JVM pass instead of three
  * interpreted HOF layers (gram transform, hash transform, window-min
  * transform). */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"window sizes must be >= 1, got k=$k w=$w")

  override def dataType: DataType = StringType
  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint expects a string column, got " +
        child.dataType.simpleString)

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.winnowFingerprint(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.winnowFingerprint($c, $k, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFp = copy(child = newChild)
}

/** Codegen'd per-row SimHash signature — replaces an explode + shuffle +
  * 60-column aggregation with a scan-speed expression. */
case class SimhashSig(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 60, s"simhash bits must be in [1,60], got $bits")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.simhash($c, $bits);")

  override protected def withNewChildInternal(
      newChild: Expression): SimhashSig = copy(child = newChild)
}

/** Codegen'd per-row repetition signals
  * `[top_bigram_frac, dup_word_frac]` — replaces an explode + two-level
  * aggregation + join with a scan-speed expression. */
case class RepSignals(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.DoubleType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rep_signals"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rep_signals expects a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.repSignals(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.repSignals($c);")

  override protected def withNewChildInternal(
      newChild: Expression): RepSignals = copy(child = newChild)
}

/** Codegen'd pair expansion: a sorted `array<bigint>` of document ids →
  * `array<struct<a,b>>` of all C(n,2) ordered pairs. Exploding this from
  * per-shingle id lists replaces the inverted-index SELF-JOIN of the exact
  * Jaccard path — one aggregation instead of a sort-merge join, and the
  * pair rows are generated inside the stage rather than shuffled twice. */
case class PairCombos(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pair_combos"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pair_combos expects array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.pairCombos(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.pairCombos($c);")

  override protected def withNewChildInternal(
      newChild: Expression): PairCombos = copy(child = newChild)
}

/** Codegen'd deflate compression ratio of a string column — one
  * Deflater pass per row, scan-speed, no UDF. */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.DoubleType

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects a string column, got " +
        child.dataType.simpleString)

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.deflateRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.deflateRatio($c);")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateRatio = copy(child = newChild)
}

/** Codegen'd single-merge BPE rewrite of a symbol array: every
  * left-to-right non-overlapping occurrence of the adjacent pair
  * `(l, r)` becomes the fused symbol `l+r`. The pair arrives as
  * ordinary (runtime) expressions so the training loop can feed it
  * from the broadcast argmax row — no per-iteration literal plans. */
case class BpeMergePair(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  // null elements pass through the kernel untouched (UTF8String.equals
  // never matches them), so element nullability follows the input's
  override def dataType: DataType = ArrayType(StringType,
    containsNull = first.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })
  override def prettyName: String = "bpe_merge_pair"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_pair expects (array<string>, string, string), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override protected def nullSafeEval(syms: Any, l: Any, r: Any): Any =
    TextKernels.bpeMergePair(syms.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l, r) =>
      s"${ev.value} = graft.plans.TextKernels.bpeMergePair($s, $l, $r);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeMergePair =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Codegen'd candidate-piece generator: every substring of length
  * 1..maxLen, multiplicity kept — unigram-tokenizer vocabulary seeding
  * over the distinct-word frame. */
case class CharGrams(child: Expression, maxLen: Int)
    extends UnaryExpression {
  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")

  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)
  override def prettyName: String = "char_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_grams expects a string column, got " +
        child.dataType.simpleString)

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.charGrams(input.asInstanceOf[UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernels.charGrams($c, $maxLen);")

  override protected def withNewChildInternal(
      newChild: Expression): CharGrams = copy(child = newChild)
}

/** Codegen'd Viterbi-best unigram segmentation (Kudo 2018) of a word
  * against a literal (pieces, scores) vocabulary — integer-scaled log
  * scores keep every DP comparison exact long arithmetic. NULL result
  * = no cover (callers coalesce to the whole word). */
case class UnigramViterbi(first: Expression, second: Expression,
    third: Expression, maxLen: Int, sTot: Long)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")

  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_viterbi"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _),
          ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "unigram_viterbi expects (string, array<string>, " +
          s"array<bigint>), got (${a.simpleString}, ${b.simpleString}, " +
          s"${c.simpleString})")
    }

  override protected def nullSafeEval(w: Any, p: Any, s: Any): Any =
    TextKernels.unigramViterbi(w.asInstanceOf[UTF8String],
      p.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], maxLen, sTot)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, p, s) =>
      s"""${ev.value} = graft.plans.TextKernels.unigramViterbi(
         |  $w, $p, $s, $maxLen, ${sTot}L);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): UnigramViterbi =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TextExpressions {
  /** All i<j pairs of a sorted `array<bigint>` as `array<struct<a,b>>`. */
  def pairCombos(ids: Column): Column =
    GraftBridge.column(PairCombos(GraftBridge.expression(ids)))

  /** Codegen'd distinct word n-gram shingles of a string column. */
  def wordShingles(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))

  /** Codegen'd shingle occurrences (duplicates kept, document order). */
  def wordShingleOccurrences(text: Column, n: Int): Column =
    GraftBridge.column(
      WordShingleOccurrences(GraftBridge.expression(text), n))

  /** Codegen'd winnowing fingerprint of a string column. */
  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFp(GraftBridge.expression(text), k, w))

  /** Codegen'd per-row SimHash signature of a string column. */
  def simhash(text: Column, bits: Int): Column =
    GraftBridge.column(SimhashSig(GraftBridge.expression(text), bits))

  /** Codegen'd `[top_bigram_frac, dup_word_frac]` of a string column. */
  def repSignals(text: Column): Column =
    GraftBridge.column(RepSignals(GraftBridge.expression(text)))

  /** Codegen'd deflate compression ratio of a string column. */
  def deflateRatio(text: Column): Column =
    GraftBridge.column(DeflateRatio(GraftBridge.expression(text)))

  /** Codegen'd single-merge BPE rewrite of a symbol-array column. */
  def bpeMergePair(syms: Column, l: Column, r: Column): Column =
    GraftBridge.column(BpeMergePair(GraftBridge.expression(syms),
      GraftBridge.expression(l), GraftBridge.expression(r)))

  /** Codegen'd 1..maxLen substring candidates of a string column. */
  def charGrams(word: Column, maxLen: Int): Column =
    GraftBridge.column(CharGrams(GraftBridge.expression(word), maxLen))

  /** Codegen'd Viterbi-best unigram segmentation against a literal
    * vocabulary (exact integer DP — see [[UnigramViterbi]]). */
  def unigramViterbi(word: Column, pieces: Column, scores: Column,
      maxLen: Int, sTot: Long): Column =
    GraftBridge.column(UnigramViterbi(GraftBridge.expression(word),
      GraftBridge.expression(pieces), GraftBridge.expression(scores),
      maxLen, sTot))
}
