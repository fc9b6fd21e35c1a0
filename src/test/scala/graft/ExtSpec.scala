package graft

import graft.operators.{Contamination, CorpusStats, Dedup, Similarity, Temporal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Extension-track semantics: dedup family agreement, similarity search
  * sanity, text analysis on crafted inputs. */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "completely different words about spark shuffles and partitions"),
    (4L, "el perro de la casa y el gato de la calle en un patio"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeper is min id") {
    val g = Dedup.exactGroups(docs).filter($"n_docs" > 1).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("keeper_id") === 0L)
    assert(g.head.getAs[Long]("n_docs") === 2L)
  }

  test("ngram jaccard: identical=1.0, near-dup high, unrelated absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, 0.1)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs((0L, 2L)) > 0.7 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("codegen'd shingles match the HOF construction bit-for-bit") {
    val corpus = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .union(Seq((9001L, ""), (9002L, "   "), (9003L, "one two"),
        (9004L, "a  b\tc\nd a  b\tc")).toDF("doc_id", "text"))
    val diff = corpus.select(
        TextAnalysis.shingles($"text", 3).as("fast"),
        TextAnalysis.shinglesHof($"text", 3).as("hof"))
      .filter(not($"fast" <=> $"hof"))
    assert(diff.count() === 0)
    val occDiff = corpus.select(
        TextAnalysis.shingleOccurrences($"text", 3).as("fast"),
        TextAnalysis.shingleOccurrencesHof($"text", 3).as("hof"))
      .filter(not($"fast" <=> $"hof"))
    assert(occDiff.count() === 0)
  }

  test("codegen'd winnow fingerprint matches the HOF construction") {
    // the HOF side runs interpreted at O(grams·window) PER ROW — a dozen
    // corpus docs + the edge cases carry the parity evidence at ~1/5 the
    // suite cost of the full sf0.001 table; every 4th doc, not a prefix,
    // so the sample spans the corpus's length/content range
    val corpus = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .filter($"doc_id" % 4 === 0)
      .union(Seq((9001L, ""), (9002L, "tiny"), (9003L, "exactly5"),
        (9004L, "just over the gram size")).toDF("doc_id", "text"))
    val diff = corpus.select(
        TextAnalysis.winnowFingerprint($"text").as("fast"),
        TextAnalysis.winnowFingerprintHof($"text").as("hof"))
      .filter(not($"fast" <=> $"hof"))
    assert(diff.count() === 0)
  }

  test("codegen'd per-row simhash matches the aggregate construction") {
    val corpus = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .union(Seq((9001L, ""), (9002L, "word"), (9003L, "a a a b"))
        .toDF("doc_id", "text"))
    val fast = Dedup.simhash(corpus).as[(Long, Long)].collect().toMap
    val agg = Dedup.simhashAgg(corpus).as[(Long, Long)].collect().toMap
    assert(fast === agg)
  }

  test("minhash LSH finds the exact and near duplicates") {
    val got = Dedup.minhashLshPairs(docs, 0.1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L))) // identical docs: identical signatures
    val all = Dedup.ngramJaccardPairs(docs, 0.1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(all)) // LSH never invents pairs
  }

  test("simhash: identical docs at hamming 0, near-dups close") {
    val sigs = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(sigs(0L) === sigs(1L))
    val ham02 = java.lang.Long.bitCount(sigs(0L) ^ sigs(2L))
    val ham03 = java.lang.Long.bitCount(sigs(0L) ^ sigs(3L))
    assert(ham02 < ham03) // one-word change beats disjoint vocabulary
  }

  test("simhash banding is exhaustive at any threshold (pigeonhole)") {
    assert(Dedup.bandsFor(3) === 4)   // classic 4×15
    assert(Dedup.bandsFor(4) === 5)
    assert(Dedup.bandsFor(7) === 10)  // 8 doesn't divide 60 → next divisor
    val docs = Tables.documents(spark, sf0001).limit(120).cache()
    val sigs = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    val expect = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 7
    } yield (a, b, h)).toSet
    val got = Dedup.simhashPairs(docs, maxHamming = 7)
      .select($"id_a", $"id_b", $"hamming".cast("long"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b, h.toInt) }.toSet
    assert(got === expect) // every qualifying pair found, none invented
  }

  test("brute-force top-k is exact and self-excluding") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, 2)
      .orderBy($"rank").select($"match_id").as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L)) // nearest first, never itself
  }

  test("recall eval: honest denominator and ceil-floored gate") {
    val tiny = Seq(
      (1L, Array.fill(4)(1.0f)),
      (2L, Array(1.0f, 0.9f, 1.0f, 1.0f)),
      (3L, Array(-1.0f, 1.0f, 0.0f, 0.5f))).toDF("vec_id", "embedding")
    // k=10 over a 3-vector corpus: each query has only 2 exact
    // neighbors — the denominator must be 2, not k
    val exact = Similarity.bruteForceTopK(tiny, tiny, 10)
    val approx = exact.filter($"rank" === 1) // half the neighbors back
    val r = Similarity.recallEval(approx, exact, 0.5)
      .collect().map(x => x.getAs[Long]("query_id") -> x).toMap
    assert(r.size === 3)
    r.values.foreach { x =>
      assert(x.getAs[Long]("n_exact") === 2L)
      assert(x.getAs[Long]("n_hit") === 1L)
      assert(x.getAs[Double]("recall_at_k") === 0.5)
      assert(x.getAs[Boolean]("recall_ok")) // ceil(0.5*2)=1 <= 1
    }
    // a tighter floor flips the gate: ceil(0.6*2)=2 > 1
    assert(Similarity.recallEval(approx, exact, 0.6)
      .filter($"recall_ok").count() === 0)
    // perfect approximation scores 1.0 everywhere
    assert(Similarity.recallEval(exact, exact, 0.99)
      .filter(!$"recall_ok" || $"recall_at_k" =!= 1.0).count() === 0)
  }

  test("LSH top-k returns a subset consistent with brute-force scores") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(q, e, 10)
      .select($"query_id", $"match_id", $"cos").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.lshTopK(q, e, 10, planes = 6)
      .select($"query_id", $"match_id", $"cos").as[(Long, Long, Double)]
      .collect()
    assert(lsh.nonEmpty)
    // every LSH hit scores exactly what brute force scored it
    lsh.foreach { case (qid, m, c) => assert(brute.get((qid, m)).forall(_ === c) ||
      !brute.contains((qid, m))) }
    val lshPairs = lsh.map(r => (r._1, r._2)).toSet
    val recall = lshPairs.count(brute.contains).toDouble /
      brute.size.toDouble
    assert(recall > 0.0) // bucketing trades recall for scan locality
  }

  test("IVF top-k scores exactly within probed lists, never self-matches") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(q, e, 10)
      .select($"query_id", $"match_id", $"cos").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val ivf = Similarity.ivfTopK(q, e, 10)
      .select($"query_id", $"match_id", $"cos").as[(Long, Long, Double)]
      .collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (qid, m, c) =>
      assert(qid !== m)
      // a probed hit scores exactly what brute force scored it (or the
      // pair fell below brute force's top-k cut — then it can't be tested)
      brute.get((qid, m)).foreach(b => assert(b === c))
    }
  }

  test("random-projection refine: recall-gated vs brute force, deterministic") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(q, e, 10)
      .select($"query_id", $"match_id").as[(Long, Long)].collect().toSet
    val rp = Similarity.rpRefineTopK(q, e, 10, rDim = 32,
        shortlist = 150)
      .select($"query_id", $"match_id", $"rank")
      .as[(Long, Long, Int)].collect()
    val perQuery = rp.groupBy(_._1)
    assert(perQuery.values.forall(_.length === 10))
    rp.foreach { case (qid, m, _) => assert(qid !== m) }
    // JL 64→32 with a 150-candidate shortlist must surface most of the
    // true top-10 (the rung's whole claim; this synthetic corpus is
    // near-uniform — JL's hardest case — observed 0.86). Gate leaves
    // headroom so distribution noise can't flake it.
    val recall = rp.count { case (qid, m, _) =>
      brute.contains((qid, m)) }.toDouble / brute.size
    assert(recall >= 0.75, s"recall $recall")
    // deterministic: the sign matrix is content-addressed, the cuts are
    // totally ordered — a second run is identical
    val again = Similarity.rpRefineTopK(q, e, 10, rDim = 32,
        shortlist = 150)
      .select($"query_id", $"match_id", $"rank")
      .as[(Long, Long, Int)].collect()
    assert(rp.sortBy(r => (r._1, r._3)).toSeq ===
      again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("k-means IVF recall is quality-gated against brute force") {
    // A clustered corpus (8 well-separated centers + small noise) — the
    // regime IVF is FOR: trained centroids must place a query's true
    // neighbors in its nearest lists, so nprobe=2 of 8 recovers ≥ 0.9
    // of the exact top-k. (On isotropic random vectors — the parquet
    // fixture — neighbors scatter uniformly across lists and NO coarse
    // index reaches 0.9 at real pruning; a gate there measures the
    // data, not the trainer. Measured: 0.43 on the random fixture.)
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val c = i % 8
      val v = Seq.tabulate(64)(j =>
        (if (j == c * 8) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, v)
    }
    val e = rows.toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" % 20 === 0)
    val cents = Similarity.kmeansCentroids(e, numCentroids = 8)
    val ivf = Similarity.ivfTopKWith(q, e, 10, cents, nprobe = 2)
      .select($"query_id", $"match_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(q, e, 10)
      .select($"query_id", $"match_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf).toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("k-means IVF shares the search path and scores exactly") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" % 50 === 0)
    val cents = Similarity.kmeansCentroids(e, numCentroids = 8)
    assert(cents.count() === 8)
    val ivf = Similarity.ivfTopKWith(q, e, 10, cents)
      .select($"query_id", $"match_id", $"cos").as[(Long, Long, Double)]
      .collect()
    assert(ivf.nonEmpty)
    val brute = Similarity.bruteForceTopK(q, e, 10)
      .select($"query_id", $"match_id", $"cos").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    ivf.foreach { case (qid, m, c) =>
      assert(qid !== m)
      brute.get((qid, m)).foreach(b => assert(b === c))
    }
  }

  test("LSH near-dup pairs are a subset of exact pairs with equal scores") {
    val e = Tables.embeddings(spark, sf0001)
    val exact = Similarity.nearDupPairsExact(e, 0.4)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.nearDupPairsLsh(e, 0.4)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)]
      .collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (a, b, c) =>
      assert(exact.get((a, b)).contains(c)) // never invents, never rescores
    }
    // 32 bands × 6 bits is tuned for ≥ 92% recall at this threshold
    val kept = lsh.map(r => (r._1, r._2)).toSet
    val recall = exact.keys.count(kept).toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
  }

  test("derived LSH geometry: key space tracks n, bands hold design " +
      "recall, identity below saturation, recall held past it") {
    // integer-exact rowsPerBand: smallest r in [6,16] with 32·2^r ≥ n
    assert(Similarity.derivedRowsPerBand(500L) === 6)
    assert(Similarity.derivedRowsPerBand(2048L) === 6)
    assert(Similarity.derivedRowsPerBand(2049L) === 7)
    assert(Similarity.derivedRowsPerBand(20000L) === 10) // the sf1 fix
    assert(Similarity.derivedRowsPerBand(Long.MaxValue) === 16)
    // the EXPLICIT recall-buy-back knob: at (0.4, 6) the design-recall
    // formula reproduces the original fixed default exactly (the
    // default 32 IS the r=6 design point); at r=10 it names the n^ρ
    // price of holding that recall at scale
    assert(Similarity.derivedBands(
      graft.operators.ExtQueries.CosineThreshold, 6) ===
      graft.operators.ExtQueries.NearDupBands)
    assert(Similarity.derivedBands(
      graft.operators.ExtQueries.CosineThreshold, 10) === 207)
    val e = Tables.embeddings(spark, sf0001)
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b", $"cos")
        .collect().map(_.toString).toSet
    assert(pset(Similarity.nearDupPairsLsh(e, 0.4)) ===
      pset(Similarity.nearDupPairsLsh(e, 0.4,
        bands = 32, rowsPerBand = 6)),
      "auto geometry must equal the fixed default below saturation")
    // PAST saturation: 5 scaled copies of the corpus (scaling keeps
    // every direction, so near-dup structure replicates) → n = 2500 →
    // derived r=7 at the fixed 32 bands. Candidates shrink (that is
    // the point); recall vs exact must stay near the design level —
    // the quantified trade of the scale-aware default.
    val big = (0 until 5).map(k =>
      e.select(($"vec_id" * 5 + k).as("vec_id"),
        transform($"embedding",
          x => x * lit(1.0f + k * 0.01f)).as("embedding")))
      .reduce(_ unionByName _)
    assert(Similarity.derivedRowsPerBand(big.count()) === 7)
    val exact = Similarity.nearDupPairsExact(big, 0.4)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.nearDupPairsLsh(big, 0.4)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact))
    val recall = exact.count(got).toDouble / exact.size
    assert(recall >= 0.7, s"derived-geometry recall $recall")
  }

  test("per-dimension embedding stats: hand-computed mean and std") {
    val e = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embedDimStats(e, dim = 2)
      .as[(Int, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0) === ((0, 2L, 2.0, 1.0))) // (1,3): mean 2, std 1
    assert(got(1) === ((1, 2L, 2.0, 2.0))) // (0,4): mean 2, std 2
  }

  test("embedding dedup clusters group colinear vectors") {
    // v1 = 2·v0 and v3 = 3·v2: identical directions → identical
    // hyperplane signs (certain band collision) and cos = 1; the two
    // directions are orthogonal, so exactly two 2-clusters emerge
    val dim = 8
    def vec(axis: Int, scale: Float) =
      Array.tabulate(dim)(i => if (i == axis) scale else 0.0f)
    val e = Seq(
      (0L, vec(0, 1f)), (1L, vec(0, 2f)),
      (2L, vec(3, 1f)), (3L, vec(3, 3f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Dedup.clusterAssignments(e,
        Similarity.nearDupPairsLsh(e, 0.9, dim = dim),
        idCol = "vec_id")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("local and distributed cluster paths agree on the real corpus") {
    val e = Tables.embeddings(spark, sf0001)
    val pairs = Similarity.nearDupPairsLsh(e, 0.4)
    val local = graft.operators.Dedup
      .clusterAssignments(e, pairs, idCol = "vec_id")
      .as[(Long, Long)].collect().toMap
    val dist = graft.operators.Dedup
      .clusterAssignments(e, pairs, idCol = "vec_id",
        localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local === dist)
    assert(local.exists { case (id, c) => c != id }) // non-trivial merge
  }

  test("LSH signature raises on mismatched embedding dimensionality") {
    val bad = Seq((1L, Array.fill(32)(0.5))).toDF("vec_id", "embedding")
    val ex = intercept[Throwable] {
      bad.select(Similarity.lshSignature($"embedding", 12, 64).as("sig"))
        .collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") +
        messages(t.getCause)
    assert(messages(ex).contains("LSH dim mismatch"))
  }

  test("operator caches are tracked and released by unpersistAll") {
    graft.operators.CacheRegistry.unpersistAll()
    Dedup.minhashLshPairs(docs, 0.1).count()
    assert(graft.operators.CacheRegistry.size > 0)
    graft.operators.CacheRegistry.unpersistAll()
    assert(graft.operators.CacheRegistry.size === 0)
  }

  test("BPE-ish token estimate charges subwords, digits, and punctuation") {
    val got = spark.range(1).select(TextAnalysis.bpeTokenCount(
      lit("Hello, extraordinary 12345!")).as("n")).as[Long].collect().head
    // Hello→2 (ceil 5/4), ','→1, extraordinary→4 (ceil 13/4),
    // 12345→2 (ceil 5/3), '!'→1
    assert(got === 10L)
    val empty = spark.range(1).select(TextAnalysis.bpeTokenCount(lit(""))
      .as("n")).as[Long].collect().head
    assert(empty === 0L)
  }

  test("winnowing fingerprint: deterministic, edit-sensitive, edge-safe") {
    def fp(s: String): String =
      spark.range(1).select(TextAnalysis.winnowFingerprint(lit(s)).as("f"))
        .as[String].collect().head
    assert(fp("the quick brown fox") === fp("the  QUICK  brown fox "))
    assert(fp("the quick brown fox") !== fp("the quick brown cat"))
    assert(fp("") === fp("   "))     // both: empty gram set digest
    assert(fp("abc").nonEmpty)       // shorter than k: single-min path
  }

  test("language id picks Spanish for Spanish function words") {
    val got = TextAnalysis.langId(lit("el gato y el perro de la casa"))
    val lang = docs.sparkSession.range(1).select(got).collect().head
      .getString(0)
    assert(lang === "es")
  }

  test("connected components: chains converge, singletons keep their id") {
    val verts = (1L to 12L).toDF("doc_id")
    // a 5-chain (needs >1 propagation round), a 2-clique, singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.clusterAssignments(verts, pairs)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(got(_) === 1L))
    assert(got(10L) === 10L && got(11L) === 10L)
    assert(Seq(6L, 7L, 8L, 9L, 12L).forall(v => got(v) === v))
  }

  test("connected components converge in O(log diameter) rounds") {
    val n = 33L // a 33-chain: diameter 32, the worst case for propagation
    val verts = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (df, rounds) = Dedup.clusterAssignmentsWithRounds(verts, pairs)
    val got = df.as[(Long, Long)].collect().toMap
    assert((1L to n).forall(got(_) === 1L))
    // path halving reaches 2^k − 1 hops after k rounds, so the min label
    // crosses diameter d within ⌈log₂ d⌉ + 1 progress rounds — plain
    // propagation would need all 32
    val bound = math.ceil(math.log((n - 1).toDouble) / math.log(2)).toInt + 1
    assert(rounds <= bound, s"rounds $rounds > bound $bound")
  }

  test("connected components agree with union-find on random graphs") {
    // seeded randomized cross-check against an in-memory reference:
    // attach-max-root-under-min keeps every component's root at its
    // minimum id — exactly the cluster_id contract
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val edges0 = Seq.fill(rnd.nextInt(60))(
          (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter(p => p._1 != p._2)
        .map(p => (p._1 min p._2, p._1 max p._2)).distinct
      // never empty: count 0 is not > threshold 0, so an empty draw
      // would silently fall back to the local path and test nothing
      val edges = if (edges0.nonEmpty) edges0 else Seq((1L, 2L))
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      val expect = (1 to n).map(v => v.toLong -> find(v).toLong).toMap
      // threshold 0 forces the DISTRIBUTED rounds — comparing the local
      // union-find front end against a union-find reference would be
      // circular
      val got = Dedup.clusterAssignments(
          (1L to n.toLong).toDF("doc_id"), edges.toDF("id_a", "id_b"),
          localEdgeThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      assert(got === expect, s"trial $trial n=$n edges=${edges.size}")
      // and the local path must agree with both
      val gotLocal = Dedup.clusterAssignments(
          (1L to n.toLong).toDF("doc_id"), edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(gotLocal === expect, s"local trial $trial")
    }
  }

  test("quantization error bound holds on random vectors") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 50).map(i =>
        (i.toLong, Seq.fill(16)((rnd.nextDouble() * 4 - 2).toFloat)))
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(vecs)
      .as[(Long, Double, Double, Seq[Int], Double)].collect()
    assert(got.length === 50)
    got.foreach { case (_, qmin, qmax, codes, err) =>
      assert(codes.forall(c => c >= 0 && c <= 255))
      val step = (qmax - qmin) / 255.0
      assert(err <= step / 2 + 1e-6) // half a step + output rounding
    }
  }

  test("connected components survive a hub-heavy (skewed) pair list") {
    // a 20k-spoke star: the propagate join's hottest key carries the
    // whole component — the shape AQE skew handling (plus map-side
    // partial min) must absorb at scale
    val n = 20000L
    val verts = spark.range(1, n + 1).select($"id".as("doc_id"))
    val pairs = spark.range(2, n + 1)
      .select(lit(1L).as("id_a"), $"id".as("id_b"))
    val t0 = System.nanoTime()
    val (df, rounds) = Dedup.clusterAssignmentsWithRounds(verts, pairs)
    val wrong = df.filter($"cluster_id" =!= 1L).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(wrong === 0)
    assert(rounds <= 2, s"rounds $rounds") // star diameter is 2
    assert(secs < 60.0, s"hub fixture took $secs s")
  }

  test("sessionize: gap splits sessions, end is last event + gap") {
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      (1L, ts(0), 10.0), (1L, ts(1), 20.0),  // one session (gap 1h < 4h)
      (1L, ts(8), 5.0),                      // 7h silence → new session
      (2L, ts(0), 1.0))                      // other user, own session
      .toDF("user_id", "ts", "value")
    val got = Temporal.sessionize(ev, "4 hours")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, ts(0))) === ((ts(5), 2L, 30.0))) // end = 01:00 + 4h
    assert(got((1L, ts(8))) === ((ts(12), 1L, 5.0)))
    assert(got((2L, ts(0))) === ((ts(4), 1L, 1.0)))
    assert(got.size === 3)
  }

  test("as-of join: backward inclusive, max id wins equal-ts ties") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val clicks = Seq((100L, 1L, ts(1)), (101L, 1L, ts(5)), (102L, 2L, ts(3)))
      .toDF("event_id", "user_id", "ts")
    val buys = Seq((200L, 1L, ts(5)), (201L, 1L, ts(5)), (202L, 1L, ts(2)))
      .toDF("event_id", "user_id", "ts")
    val got = Temporal.asofJoinBackward(clicks, buys, "user_id", "ts",
        "event_id", "event_id")
      .select($"l_id", $"asof_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(100L) === None)        // click before any purchase
    assert(got(101L) === Some(201L))  // equal-ts inclusive, max id wins
    assert(got(102L) === None)        // other user: no purchases at all
  }

  test("decontamination shuffled fallback equals the broadcast path") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter($"doc_id" % 50 =!= 0)
    val bench = docs.filter($"doc_id" % 50 === 0)
    val viaBroadcast = Contamination.ngramOverlap(corpus, bench, n = 5)
    val viaShuffle = Contamination.ngramOverlap(corpus, bench, n = 5,
      broadcastIndex = false)
    assert(viaShuffle.count() === viaBroadcast.count())
    assert(viaShuffle.exceptAll(viaBroadcast).count() === 0)
  }

  test("decontamination flags only docs sharing a benchmark n-gram") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // shares 5-grams
      (2L, "totally unrelated words in this document here"))
      .toDF("doc_id", "text")
    val bench = Seq((50L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val got = Contamination.ngramOverlap(corpus, bench, n = 5)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((1L, 50L))))
  }

  test("PII scrub redacts emails, urls, and long digit runs") {
    val row = Seq("mail a.b@c.org or https://x.io/p?q=1 or 5551234567 ok")
      .toDF("t")
      .select(Contamination.piiCount($"t").as("n"),
        Contamination.piiScrub($"t").as("s"))
      .as[(Int, String)].collect().head
    assert(row._1 === 3)
    assert(row._2 === "mail <EMAIL> or <URL> or <NUM> ok")
  }

  test("length histogram: exact power-of-two buckets, no log2 drift") {
    // n_subwords for these: "" → 0 → bucket 0; "word" → 1 → bucket 1;
    // 7×"word " → 7 → bucket 3 (n+1 = 8, the log2 boundary float math
    // gets wrong); 8×"word " → 8 → bucket 3
    val d = Seq(
      (0L, ""), (1L, "word"),
      (2L, Seq.fill(7)("word").mkString(" ")),
      (3L, Seq.fill(8)("word").mkString(" ")))
      .toDF("doc_id", "text")
    val got = CorpusStats.lengthHistogram(d)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(0L) === ((1L, 0L)))
    assert(got(1L) === ((1L, 1L)))
    assert(got(3L) === ((2L, 15L))) // docs with 7 and 8 tokens
  }

  test("gopher rules: bounds and alpha fraction gate the keep flag") {
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "one two"),                       // too few words
      (2L, "1234 5678 9012 3456 7890 2345"), // no alphabetic words
      (3L, "a b c d e f g h i j"))           // mean word length 1 < 3
      .toDF("doc_id", "text")
    val got = CorpusStats.gopherRules(d, minWords = 5)
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._5 && got(0L)._3 === 4.0)
    assert(!got(1L)._5 && got(1L)._2 === 2L)
    assert(!got(2L)._5 && got(2L)._4 === 0.0)
    assert(!got(3L)._5 && got(3L)._3 === 1.0)
  }

  test("quality score is bounded and penalizes junk") {
    val scores = Seq(
      ("good", "the quick brown fox jumps over a lazy dog with style and " +
        "grace for everyone involved in this fine sentence"),
      ("junk", "@@@@ #### 1234 %%%% ^^^^ &&&& **** (((( )))) ____"))
      .toDF("k", "text")
      .select($"k", TextAnalysis.qualityScore($"text").as("s"))
      .as[(String, Double)].collect().toMap
    assert(scores("good") > scores("junk"))
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("per-row repetition kernel matches the aggregate construction") {
    val corpus = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .union(Seq((9001L, ""), (9002L, "solo"), (9003L, "a a a a"),
        (9004L, "x y x y x")).toDF("doc_id", "text"))
    val fast = CorpusStats.repetitionSignals(corpus)
    val agg = CorpusStats.repetitionSignalsAgg(corpus)
    assert(fast.count() === agg.count())
    assert(fast.exceptAll(agg).count() === 0)
  }

  test("repetition signals: boilerplate scores high, varied text low") {
    val d = Seq(
      (0L, "buy now buy now buy now buy now"), // one bigram dominates
      (1L, "every word here appears exactly once today"),
      (2L, "solo")) // < 2 words → 0.0 bigram signal
      .toDF("doc_id", "text")
    val got = CorpusStats.repetitionSignals(d)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // "buy now" fills 4 of 7 bigram slots; 6 of 8 words are repeats
    assert(math.abs(got(0L)._1 - 4.0 / 7) < 1e-3)
    assert(got(0L)._2 === 0.75)
    assert(got(1L)._1 < 0.2 && got(1L)._2 === 0.0)
    assert(got(2L) === ((0.0, 0.0)))
  }

  test("split assignment is deterministic, complete, and ~80/10/10") {
    val d = Tables.documents(spark, sf0001)
    val (bucket, split) = CorpusStats.splitAssign($"doc_id")
    val counts = d.select(split.as("s")).groupBy($"s").count()
      .as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    // same id always lands in the same bucket (rerun = same frame)
    val b1 = d.select($"doc_id", bucket.as("b")).as[(Long, Long)]
      .collect().toMap
    val b2 = d.select($"doc_id", bucket.as("b")).as[(Long, Long)]
      .collect().toMap
    assert(b1 === b2)
    assert(b1.values.forall(b => b >= 0 && b < 100))
  }

  test("vocab top-df orders by df desc then token, counts documents") {
    val d = Seq(
      (0L, "alpha beta beta"), (1L, "alpha beta"), (2L, "alpha zeta"))
      .toDF("doc_id", "text")
    val got = CorpusStats.vocabTopDf(d, 2).as[(String, Long)].collect()
    // beta appears twice IN one doc but df counts documents: alpha 3, beta 2
    assert(got.toSeq === Seq(("alpha", 3L), ("beta", 2L)))
  }

  test("sq8 refine: exact re-rank scores match brute force pairwise") {
    val e = Tables.embeddings(spark, sf0001)
    val queries = e.filter($"vec_id" % 50 === 0)
    val refined = Similarity.sq8RefineTopK(queries, e, 5)
    val brute = Similarity.bruteForceTopK(queries, e, 50)
    // stage 2 is exact: every refined (query, match) cos equals the
    // brute-force cos for that pair
    val joined = refined.select($"query_id", $"match_id", $"cos")
      .join(brute.select($"query_id", $"match_id", $"cos".as("bcos")),
        Seq("query_id", "match_id"))
    assert(joined.count() === refined.count())
    assert(joined.filter($"cos" =!= $"bcos").count() === 0)
    // shortlist recall on this corpus: top-1 per query survives SQ8
    val top1 = brute.filter($"rank" === 1)
      .select($"query_id", $"match_id")
    val kept = refined.join(top1, Seq("query_id", "match_id"), "left_semi")
    assert(kept.count() >= top1.count() * 9 / 10)
  }

  test("knn classify: majority vote, tie-break, own-label purity") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(0.9f, 0.1f), 1),
      (2L, Seq(0.8f, 0.2f), 2),
      (3L, Seq(0.0f, 1.0f), 2),
      (10L, Seq(0.95f, 0.05f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity
      .knnClassify(vecs.filter($"vec_id" === 10), vecs, 3)
      .as[(Long, Int, Int, Long, Long)].collect().head
    // query 10's top-3 neighbors are 1, 0, 2 → labels (1, 1, 2):
    // predicted 1 with 2 votes; its own label 2 has 1 agreeing neighbor
    assert(got === ((10L, 2, 1, 2L, 1L)))
  }

  test("centroid classify: argmax over unit label means") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 1),
      (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f), 2),
      (3L, Seq(0.0f, 0.1f, 0.9f, 0.0f), 2),
      (10L, Seq(0.95f, 0.05f, 0.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidClassify(
        vecs.filter($"vec_id" === 10), vecs, dim = 4)
      .as[(Long, Int, Int, Double)].collect().head
    // query points along axis 0 → label 1's centroid direction wins,
    // even though the query's own label is 2 (a mislabel candidate)
    assert(got._1 === 10L && got._2 === 2 && got._3 === 1)
    assert(got._4 > 0.9 && got._4 <= 1.0)
  }

  test("pq adc: exact final scores, tiny codes, no self-matches") {
    val e = Tables.embeddings(spark, sf0001)
    val queries = e.filter($"vec_id" % 50 === 0)
    val pq = Similarity.pqAdcTopK(queries, e, 5)
      .select($"query_id", $"match_id", $"cos", $"rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(pq.nonEmpty)
    pq.foreach { case (q, m, _, r) =>
      assert(q !== m)
      assert(r >= 1 && r <= 5)
    }
    // stage 2 is exact: wherever a PQ hit also appears in brute force,
    // the cosines agree bit-for-bit
    val brute = Similarity.bruteForceTopK(queries, e, 50)
      .select($"query_id", $"match_id", $"cos").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    pq.foreach { case (q, m, c, _) =>
      brute.get((q, m)).foreach(b => assert(b === c))
    }
    // the code table is m rows per sampled centroid vector — the 32×
    // memory story the operator exists for
    val nSamples = e.filter($"vec_id" % 41 === 0).count()
    assert(Similarity.pqCodebooks(e).count() === nSamples * 8)
  }

  test("ivfpq: probed-list subset of pq, exact scores, no self-match") {
    val e = Tables.embeddings(spark, sf0001)
    val queries = e.filter($"vec_id" % 50 === 0)
    val ivfpq = Similarity.ivfPqTopK(queries, e, 5)
      .select($"query_id", $"match_id", $"cos").as[(Long, Long, Double)]
      .collect()
    assert(ivfpq.nonEmpty)
    ivfpq.foreach { case (q, m, _) => assert(q !== m) }
    // the exact stage scores identically to brute force for any pair
    // both surface
    val brute = Similarity.bruteForceTopK(queries, e, 50)
      .select($"query_id", $"match_id", $"cos").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    ivfpq.foreach { case (q, m, c) =>
      brute.get((q, m)).foreach(b => assert(b === c))
    }
    // probing restricts candidates: a query's IVFPQ hits never exceed
    // its unrestricted PQ hits in count
    val pqCounts = Similarity.pqAdcTopK(queries, e, 5)
      .groupBy($"query_id").count().as[(Long, Long)].collect().toMap
    val ivfpqCounts = ivfpq.groupBy(_._1).map { case (k, v) => k -> v.size }
    ivfpqCounts.foreach { case (q, n) =>
      assert(n <= pqCounts.getOrElse(q, 0L))
    }
  }

  test("int8 quantization: error within half a step, constants exact") {
    val vecs = Seq(
      (0L, Seq(0.0f, 1.0f, 0.5f, 0.25f)),
      (1L, Seq(2.0f, 2.0f, 2.0f, 2.0f)), // constant → all-zero codes
      (2L, Seq(-1.0f, 1.0f, 0.0f, 0.998f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(vecs)
      .as[(Long, Double, Double, Seq[Int], Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L)._4 === Seq(0, 255, 128, 64))
    // half a quantization step, plus the 6-decimal output rounding
    assert(got(0L)._5 <= 0.5 / 255 + 5e-7)
    assert(got(1L)._4 === Seq(0, 0, 0, 0) && got(1L)._5 === 0.0)
    assert(got(2L)._2 === -1.0 && got(2L)._3 === 1.0)
    assert(got(2L)._4.forall(c => c >= 0 && c <= 255))
  }

  test("top-k per group: ranked by score desc, ties by id, k enforced") {
    val d = Seq(
      ("web", 1L, "aa"), ("web", 2L, "aaaa"), ("web", 3L, "aaaa"),
      ("book", 4L, "a"))
      .toDF("source", "doc_id", "text")
    val got = CorpusStats.topKPerGroup(d, 2, "source", length($"text"))
      .as[(String, Long, Int, Int)].collect().toSet
    // web: docs 2 and 3 tie at length 4 → lower id ranks first
    assert(got === Set(("web", 2L, 4, 1), ("web", 3L, 4, 2),
      ("book", 4L, 1, 1)))
  }

  test("salted top-k per group equals the unsalted operator") {
    val d = Tables.documents(spark, sf0001)
    val score = TextAnalysis.qualityScore($"text")
    val plain = CorpusStats.topKPerGroup(d, 5, "source", score)
    val salted = CorpusStats.topKPerGroupSalted(d, 5, "source", score)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("tfidf: rare term outranks common term within a doc") {
    val d = Seq(
      (0L, "common common zebra"),
      (1L, "common words only"),
      (2L, "common words again"))
      .toDF("doc_id", "text")
    val got = CorpusStats.tfidfTopTerms(d, 2)
      .as[(Long, String, Double, Int)].collect()
      .filter(_._1 == 0L).sortBy(_._4)
    // zebra: df=1 → idf ln(3); common: tf=2 but df=3 → idf 0 → score 0
    assert(got.head._2 === "zebra")
    assert(got.head._3 === math.round(math.log(3.0) * 1e6) / 1e6)
    assert(got.last._3 <= got.head._3)
  }

  test("mixture sample: rates follow weights, membership is stable") {
    val d = Tables.documents(spark, sf0001)
    val weights = graft.operators.ExtQueries.MixtureWeights
    val got = CorpusStats.mixtureSample(d, weights, 2000L)
    val rates = got.select($"source", $"rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates.nonEmpty)
    // one rate per source; within [0,1]; heavier sources sample more
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0))
    val bySrc = rates.toSeq.collect {
      case (s, r) if weights.getOrElse(s, 0.0) == 0.08 => ("hi", r)
      case (s, r) => ("lo", r)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    if (bySrc.contains("hi") && bySrc.contains("lo"))
      assert(bySrc("hi") >= bySrc("lo"))
    // rerun returns the identical doc set (deterministic membership)
    val again = CorpusStats.mixtureSample(d, weights, 2000L)
    assert(got.exceptAll(again).count() === 0)
    assert(again.count() === got.count())
  }

  test("json props: typed extraction, malformed and absent keys → NULL") {
    val ev = Seq(
      ("click", """{"k": 7}"""),
      ("click", """not json at all"""),
      ("click", """{"other": 1}"""),
      ("view", """{"k": 3}"""))
      .toDF("event_type", "props")
    val got = graft.operators.SemiStructured.propsStats(ev)
      .as[(String, Long, Long, Double, Option[Int])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("click")._2 === 3L) // all rows counted...
    assert(got("click")._3 === 1L) // ...but only one parsed k
    assert(got("click")._4 === 7.0 && got("click")._5 === Some(7))
    assert(got("view")._5 === Some(3))
  }

  test("source stats: counts, volume, and nearest-rank percentiles") {
    val d = Seq(
      ("web", "en", 10L, "one two three"),
      ("web", "en", 20L, "one two three four five"),
      ("book", "en", 5L, "one"))
      .toDF("source", "lang", "n_chars", "text")
    val got = CorpusStats.sourceStats(d)
      .as[(String, String, Long, Long, Double, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val web = got(("web", "en"))
    assert(web._3 === 2L && web._4 === 30L && web._5 === 4.0)
    // nearest-rank (discrete): p50 of (3, 5) is the value at rank
    // ⌈n/2⌉ = 1 → 3; p90 at rank ⌈0.9·2⌉ = 2 → 5. No interpolation.
    assert(web._6 === 3L && web._7 === 5L)
    assert(got(("book", "en"))._6 === 1L)
    assert(got(("book", "en"))._7 === 1L)
  }

  test("unigram cross-entropy: tf-weighted mean of -ln P(w)") {
    val d = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    val got = CorpusStats.unigramLogProb(d)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // corpus: a:2 b:2 c:1, total 5
    assert(got(0L)._2 === 3L)
    assert(got(0L)._3 === 0.9163) // all tokens have P=2/5 → ln 2.5
    assert(got(1L)._2 === 2L)
    assert(got(1L)._3 === 1.2629) // (ln 2.5 + ln 5) / 2
  }

  test("quality tiers: ntile 3/2/2 split, best doc is head") {
    val d = (0L to 6L).map(i =>
        (i, "en", ("word " * (10 + 40 * i.toInt)).trim))
      .toDF("doc_id", "lang", "text")
    val got = CorpusStats.qualityBuckets(d)
      .as[(Long, String, Double, Int, String)].collect()
    assert(got.count(_._5 == "head") === 3) // first tile takes 7 mod 3
    assert(got.count(_._5 == "middle") === 2)
    assert(got.count(_._5 == "tail") === 2)
    val best = got.maxBy(r => (r._3, -r._1))
    assert(best._5 === "head")
  }

  test("approx quality tiers: no window in the plan, agreement up to boundary ties") {
    val d = Tables.documents(spark, sf0001)
    val approx = CorpusStats.qualityBucketsApprox(d)
    // the scale claim itself: threshold assignment runs without any
    // window/sort — one aggregate plus a broadcast join
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "approx path must not sort-window")
    assert(plan.contains("BroadcastHashJoin"),
      "threshold assignment must be a broadcast join")
    val exact = CorpusStats.qualityBuckets(d)
      .select($"doc_id", $"lang", $"q", $"tile".as("tile_e"))
    val j = exact.join(
        approx.select($"doc_id", $"tile".as("tile_a")), Seq("doc_id"))
      .select($"lang", $"q", $"tile_e", $"tile_a")
      .as[(String, Double, Int, Int)].collect()
    assert(j.nonEmpty)
    // disagreements can only be adjacent-tier
    assert(j.forall { case (_, _, e, a) => math.abs(e - a) <= 1 })
    // and only from boundary placement: value ties across an ntile cut
    // (+1 rank of ceil-vs-split arithmetic per cut). Bound per lang:
    // (buckets-1) * (max q-multiplicity + 1).
    j.groupBy(_._1).foreach { case (lang, rows) =>
      val maxMult = rows.groupBy(_._2).values.map(_.size).max
      val disagree = rows.count(r => r._3 != r._4)
      assert(disagree <= 2 * (maxMult + 1),
        s"$lang: $disagree disagreements vs multiplicity $maxMult")
    }
    // overall the two paths are the same operator
    assert(j.count(r => r._3 == r._4).toDouble / j.length >= 0.9)
  }

  test("sketch profile self-validation: bounds hold and exact columns are exact") {
    val d = Tables.documents(spark, sf0001)
    val got = CorpusStats.sketchProfileValidated(d).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Boolean]("unique_within_rsd"),
        s"${r.getAs[String]("source")}: HLL bound failed")
      assert(r.getAs[Boolean]("p50_within_rank_tol"),
        s"${r.getAs[String]("source")}: p50 rank bound failed")
      assert(r.getAs[Boolean]("p90_within_rank_tol"),
        s"${r.getAs[String]("source")}: p90 rank bound failed")
    }
    // the exact columns really are exact (independent recompute)
    val brute = d.select($"source", md5(lower(trim($"text"))).as("fp"))
      .groupBy($"source").agg(countDistinct($"fp").as("u"))
      .as[(String, Long)].collect().toMap
    got.foreach { r =>
      assert(r.getAs[Long]("exact_unique") ===
        brute(r.getAs[String]("source")))
    }
  }

  test("compression self-check: contract booleans hold on crafted shapes and corpus") {
    val rep = ("ab " * 400).trim
    val prose = "the quality of mercy is not strained it droppeth as " +
      "the gentle rain from heaven upon the place beneath"
    val noise = (0 until 4000).map(i =>
      graft.operators.Dedup.getClass.getName.hashCode * (i + 7)).mkString(" ")
    val longText = ("xyz " * 8000).trim // > 16000 bytes: vacuous rep case
    val df = Seq((0L, rep), (1L, prose), (2L, noise), (3L, ""),
        (4L, longText))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.compressionSelfCheck(df)
      .as[(Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    got.values.foreach { case (id, _, ratioOk, repDetect) =>
      assert(ratioOk, s"doc $id ratio_ok")
      assert(repDetect, s"doc $id rep_detect")
    }
    assert(got(3L)._2 === 0L) // empty text has zero bytes
    assert(got(4L)._2 > 16000L)
    // and on the real corpus, every row satisfies the contract
    val corpus = graft.operators.TextAnalysis.compressionSelfCheck(
      Tables.documents(spark, sf0001))
    assert(corpus.filter(!$"ratio_ok" || !$"rep_detect").count() === 0)
  }

  test("boilerplate coverage counts occurrences, not distinct shingles") {
    val d = Seq(
      (0L, "a b c a b c"), // "a b c" occurs twice of 4 occurrences
      (1L, "a b c x y z"),
      (2L, "a b c q r s"),
      (3L, "a b c t u v"),
      (4L, "m n o p"), // no common shingles
      (5L, "xx yy")) // too short to shingle
      .toDF("doc_id", "text")
    val got = CorpusStats.boilerplateCoverage(d, minDf = 4,
        maxCoverage = 0.4)
      .as[(Long, Long, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, 4L, 2L, 0.5, false)))
    assert(got(1L) === ((1L, 4L, 1L, 0.25, true)))
    assert(got(4L) === ((4L, 2L, 0L, 0.0, true)))
    assert(got(5L) === ((5L, 0L, 0L, 0.0, true)))
  }

  test("chunk windows: stride overlap, short tail kept") {
    // 40 words, width 24, stride 16 → chunks at 0 (24 words) and
    // 16 (24 words) and 32 (8-word tail)
    val d = Seq((0L, (1 to 40).map("w" + _).mkString(" ")),
      (1L, "a b")).toDF("doc_id", "text")
    val got = CorpusStats.chunkWindows(d, width = 24, stride = 16)
      .as[(Long, Int, Int, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map((0L, 0) -> 24, (0L, 1) -> 24, (0L, 2) -> 8,
      (1L, 0) -> 2))
  }

  test("sequence packing bins by the first token's budget multiple") {
    // budget 10: doc0 (6 toks, cum 0) → bin 0; doc1 (6, cum 6) → bin 0;
    // doc2 (3, cum 12) → bin 1
    val d = Seq((0L, "a b c d e f"), (1L, "g h i j k l"),
      (2L, "m n o")).toDF("doc_id", "text")
    val got = CorpusStats.packSequences(d, budget = 10)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, 2L, 12L, 1.2)))
    assert(got(1L) === ((1L, 1L, 3L, 0.3)))
  }

  test("head+tail truncation keeps ends, short docs untouched") {
    val long = (1 to 10).map("w" + _).mkString(" ")
    val d = Seq((0L, long), (1L, "a b c")).toDF("doc_id", "text")
    val got = CorpusStats.truncateHeadTail(d, maxToks = 6, headToks = 4,
        tailToks = 2)
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(got(0L)._2 === 10 && got(0L)._3 === 6)
    // kept = first 4 + last 2
    val expectFp = java.security.MessageDigest.getInstance("MD5")
      .digest("w1 w2 w3 w4 w9 w10".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(0L)._4 === expectFp)
    assert(got(1L)._2 === 3 && got(1L)._3 === 3)
  }

  test("bpe pair counts are frequency-weighted over the vocabulary") {
    val d = Seq((0L, "abc abc ab"), (1L, "x")).toDF("doc_id", "text")
    val got = CorpusStats.bpePairCounts(d, 10)
      .as[(String, Long)].collect().toMap
    // abc (freq 2) → ab, bc; ab (freq 1) → ab; x dropped (len < 2)
    assert(got === Map("ab" -> 3L, "bc" -> 2L))
  }

  test("unigram tokenizer: hand-computed Viterbi DP, EM recount, encode") {
    // corpus "ab ab cd": words ab(2), cd(1). candidate counts:
    // a=2, b=2, ab=2, c=1, d=1, cd=1 → tot=9... recomputed below:
    // actually Σcnt = 2+2+2+1+1+1 = 9; sTot = round(1e6·ln 9).
    // s(ab)=s(a)=s(b)=round(1e6·ln2)=693147; s(c)=s(d)=s(cd)=0.
    // "ab": [ab] = 693147 − sTot  beats [a,b] = 2·693147 − 2·sTot
    //   (since sTot = 2197225 > 693147) → one piece.
    // "cd": [cd] = −sTot beats [c,d] = −2·sTot → one piece.
    val d = Seq((0L, "ab ab cd")).toDF("doc_id", "text")
    val em = CorpusStats.unigramTokenEm(d, vocabSize = 50,
      maxPieceLen = 4)
      .collect().map(r => r.getAs[String]("piece") ->
        (r.getAs[Long]("cnt_seed"), r.getAs[Long]("score_seed"),
          r.getAs[Long]("cnt_em"))).toMap
    assert(em.keySet === Set("a", "b", "ab", "c", "d", "cd"))
    assert(em("ab") === ((2L, 693147L, 2L)))
    assert(em("cd") === ((1L, 0L, 1L)))
    // chars are never used by the best segmentations here
    Seq("a", "b", "c", "d").foreach(p => assert(em(p)._3 === 0L))
    val enc = CorpusStats.unigramTokenEncode(d, vocabSize = 50,
      maxPieceLen = 4).collect().head
    assert(enc.getAs[Long]("n_words") === 3L)
    assert(enc.getAs[Long]("n_pieces") === 3L)
    // frequency flips the optimum: "aa aa" → a appears 4×, aa 2×,
    // tot 6; [a,a] = 2·ln4·1e6 − 2·sTot = −810930 beats
    // [aa] = ln2·1e6 − sTot = −1098612 → two pieces per word
    val d2 = Seq((0L, "aa aa")).toDF("doc_id", "text")
    val enc2 = CorpusStats.unigramTokenEncode(d2, vocabSize = 50,
      maxPieceLen = 4).collect().head
    assert(enc2.getAs[Long]("n_words") === 2L)
    assert(enc2.getAs[Long]("n_pieces") === 4L)
    val em2 = CorpusStats.unigramTokenEm(d2, vocabSize = 50,
      maxPieceLen = 4)
      .collect().map(r => r.getAs[String]("piece") ->
        r.getAs[Long]("cnt_em")).toMap
    assert(em2("a") === 4L && em2("aa") === 0L)
    // tie-break prefers the LONGER piece: single word "xy" makes
    // every candidate count 1 (score 0): [xy] = −sTot ties... no —
    // [x,y] = −2·sTot is strictly worse, so [xy] wins on score; the
    // genuine tie needs equal piece counts, which equal-length covers
    // of equal scores give: "xyxy" with pieces {xy, xyxy, ...}: the
    // 4-char piece [xyxy] = −sTot beats any 2-piece cover → longer
    // piece chosen when scores make it optimal
    val d3 = Seq((0L, "xyxy")).toDF("doc_id", "text")
    val enc3 = CorpusStats.unigramTokenEncode(d3, vocabSize = 50,
      maxPieceLen = 4).collect().head
    assert(enc3.getAs[Long]("n_pieces") === 1L)
    // charGrams kernel: document order, multiplicity kept
    val grams = spark.range(1)
      .select(graft.plans.TextExpressions.charGrams(lit("aba"), 2)
        .as("g")).as[Seq[String]].head()
    assert(grams === Seq("a", "ab", "b", "ba", "a"))
    // coverage guarantee: every corpus char is in the vocab even at a
    // tiny top-V cut, so no word ever falls back
    val d4 = Seq((0L, "zq zq qqqq unusual")).toDF("doc_id", "text")
    val em4 = CorpusStats.unigramTokenEm(d4, vocabSize = 2,
      maxPieceLen = 4).collect()
    val covered = em4.map(_.getAs[Long]("cnt_em")).sum
    assert(covered > 0L)
    val enc4 = CorpusStats.unigramTokenEncode(d4, vocabSize = 2,
      maxPieceLen = 4).collect().head
    assert(enc4.getAs[Long]("n_words") === 4L)
  }

  test("fixLogScore: exact on powers of two, monotone, libm-free") {
    import graft.operators.CorpusStats.fixLogScore
    // 2^k has a zero fractional log2 → s is exactly k·⌊1e6·ln2⌋
    (0 to 62).foreach(k =>
      assert(fixLogScore(1L << k) === k * 693147L, s"2^$k"))
    // within 9 ppm-units of the real thing, and monotone (truncation
    // preserves order) — the properties the Viterbi argmax relies on
    var prev = Long.MinValue
    (1L to 2000L) ++ Seq(12345L, 999999937L, (1L << 40) + 17L,
      Long.MaxValue) foreach { c =>
      val s = fixLogScore(c)
      // truncation error grows with the exponent (20 steps × ≤2⁻³⁰
      // mantissa loss, scaled by 1e6·ln2); ~13 units at 2⁶³
      assert(math.abs(s - 1e6 * math.log(c.toDouble)) < 16.0, s"c=$c")
      assert(s >= prev, s"monotonicity at $c")
      prev = s
    }
  }

  test("unigram kernels index code points and cap candidate starts") {
    // 🌊 (U+1F30A) is one code point, two UTF-16 units: UTF-16
    // indexing would emit surrogate halves as 'pieces'
    val w = "a🌊b"
    val grams = spark.range(1)
      .select(graft.plans.TextExpressions.charGrams(lit(w), 2)
        .as("g")).as[Seq[String]].head()
    assert(grams === Seq("a", "a🌊", "🌊",
      "🌊b", "b"))
    // the DP segments the same 3-code-point space: whole-word cover
    // exists from the char pieces; no surrogate is ever split
    val d = Seq((0L, s"$w $w")).toDF("doc_id", "text")
    val enc = CorpusStats.unigramTokenEncode(d, vocabSize = 50,
      maxPieceLen = 4).collect().head
    assert(enc.getAs[Long]("n_words") === 2L)
    assert(enc.getAs[Long]("n_pieces") === 2L) // the whole word is a piece
    // starts cap: a 200-char word enumerates grams from the first 128
    // positions only (the oracle's range(0, 128) mirrored)
    val long = "x" * 130 + "y" * 70
    val capped = spark.range(1)
      .select(graft.plans.TextExpressions.charGrams(lit(long), 1)
        .as("g")).as[Seq[String]].head()
    assert(capped.length === 128)
    assert(!capped.contains("y"), "grams must stop at start 128")
  }

  test("unigram em2: prune keeps used pieces + floored chars, fixpoint holds") {
    val d = Seq((0L, "ab ab cd")).toDF("doc_id", "text")
    val em2 = CorpusStats.unigramTokenEm2(d, vocabSize = 50,
      maxPieceLen = 4)
      .collect().map(r => r.getAs[String]("piece") ->
        (r.getAs[Long]("cnt_r1"), r.getAs[Long]("cnt_r2"))).toMap
    // round 1 used only {ab, cd}; chars survive pruning at floor 1
    assert(em2.keySet === Set("ab", "cd", "a", "b", "c", "d"))
    // the used pieces are a FIXPOINT: round 2 re-selects them with the
    // renormalized scores, so usage is unchanged
    assert(em2("ab") === ((2L, 2L)))
    assert(em2("cd") === ((1L, 1L)))
    Seq("a", "b", "c", "d").foreach(p => assert(em2(p) === ((1L, 0L))))
  }

  test("bpe training learns merges in argmax order with exact counts") {
    // hand-computed: abab×2 + aab×3 + bb×1.
    // pairs: ab = 2·2 + 3 = 7, aa = 3, ba = 2, bb = 1 → merge 1 (a,b,7).
    // after: [ab,ab]×2, [a,ab]×3, [b,b]×1 → (a,ab) = 3 beats
    // (ab,ab) = 2 ('a' < 'ab' never ties here; counts differ) →
    // merge 2 (a,ab,3); then (ab,ab) = 2 → merge 3 fuses to abab.
    val d = Seq((0L, "abab abab aab aab aab bb"))
      .toDF("doc_id", "text")
    val got = CorpusStats.bpeTrainMerges(d, 3)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "b", 7L), (2, "a", "ab", 3L),
      (3, "ab", "ab", 2L)))
    // greedy left-to-right non-overlap in the kernel: aaaa + (a,a)
    // must give [aa][aa], never [a][aa][a]
    val syms = spark.range(1)
      .select(graft.plans.TextExpressions.bpeMergePair(
        split(lit("a a a a"), " "), lit("a"), lit("a")).as("s"))
      .as[Seq[String]].head()
    assert(syms === Seq("aa", "aa"))
    // real corpus: chosen counts never increase with rank (merging
    // only removes occurrences of existing pairs, and a new pair's
    // occurrences each witness one merged-pair occurrence)
    val real = CorpusStats.bpeTrainMerges(
      Tables.documents(spark, sf0001), 6)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect()
    assert(real.length === 6)
    assert(real.map(_._4).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("binned range join equals the theta join and plans no nested loop") {
    val e = Tables.events(spark, sf0001)
    val hot = e.filter($"event_type" === "purchase")
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n")).filter($"n" >= 2)
      .select(($"h" - expr("INTERVAL 30 MINUTES")).as("wstart"),
        ($"h" + expr("INTERVAL 90 MINUTES")).as("wend"), $"n")
    val binned = graft.operators.Temporal.binnedRangeJoin(e, hot, 1800)
      .select($"event_id", $"wstart")
    // ground truth: the naive theta join (exactly the predicate the
    // bin meet is an implementation of)
    val naive = e.join(hot, $"ts" >= $"wstart" && $"ts" < $"wend")
      .select($"event_id", $"wstart")
    assert(binned.count() === naive.count() && naive.count() > 0)
    assert(binned.exceptAll(naive).count() === 0)
    // each qualifying pair meets in exactly ONE bucket — no dup rows
    assert(binned.count() === binned.distinct().count())
    // the plan is an ordinary equi-join on the bucket key; the naive
    // predicate-only join is the nested loop this operator exists to
    // avoid
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("binned range join keeps pairs in an interval's final sub-second") {
    // regression: a seconds-truncating bin cast computed the exclusive
    // end 20.5s as last-bin floor((20-1)/10)=1 while a 20.3s point
    // bins to 2 — containment held but the pair never met
    def ts(micros: Long) = new java.sql.Timestamp(micros / 1000) {
      setNanos(((micros % 1000000) * 1000).toInt)
    }
    val points = Seq((1L, ts(20300000L))).toDF("event_id", "ts")
    val ivs = Seq((ts(10500000L), ts(20500000L), 7L))
      .toDF("wstart", "wend", "n")
    val got = graft.operators.Temporal
      .binnedRangeJoin(points, ivs, binSeconds = 10)
      .select($"event_id", $"n").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 7L)))
    // and the exclusive end stays exclusive at exact equality
    val atEnd = Seq((2L, ts(20500000L))).toDF("event_id", "ts")
    assert(graft.operators.Temporal
      .binnedRangeJoin(atEnd, ivs, binSeconds = 10).count() === 0L)
  }

  test("pmi collocations rank dependent pairs above frequent ones") {
    // 5× each: "new york", "new foo", "york bar" — all pairs co-occur
    // every time, but foo/bar are rarer parts, so their PMI is higher:
    // pmi(new foo) = ln((5/15)/((10/30)·(5/30))) = ln 6,
    // pmi(new york) = ln((5/15)/((10/30)²) ) = ln 3
    val docs = (0 until 15).map { i =>
      (i.toLong, Seq("new york", "new foo", "york bar")(i % 3))
    }.toDF("doc_id", "text")
    val got = CorpusStats.pmiCollocations(docs, 10, 5)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got === Seq(
      ("new foo", 5L, 10L, 5L, r6(math.log(6.0))),
      ("york bar", 5L, 10L, 5L, r6(math.log(6.0))),
      ("new york", 5L, 10L, 10L, r6(math.log(3.0)))))
  }

  test("unigram drift flags over-represented words, zero when equal") {
    val a = Seq((0L, "aa aa aa bb")).toDF("doc_id", "text")
    val b = Seq((1L, "bb bb cc")).toDF("doc_id", "text")
    val got = CorpusStats.unigramDrift(a, b, 10)
      .as[(String, Long, Long, Double)].collect().toSeq
    // union vocab {aa,bb,cc}: v=3, na=4, nb=3; smoothed
    // p_a = (c_a+1)/7, p_b = (c_b+1)/6; term = p_a·ln(p_a/p_b)
    def term(ca: Long, cb: Long) = {
      val pa = (ca + 1.0) / 7; val pb = (cb + 1.0) / 6
      math.rint(pa * math.log(pa / pb) * 1e6) / 1e6
    }
    assert(got.head === ("aa", 3L, 0L, term(3, 0))) // new-in-A tops
    assert(got.map(_._1).toSet === Set("aa", "bb", "cc"))
    got.foreach { case (w, ca, cb, t) => assert(t === term(ca, cb)) }
    // identical halves → every contribution is exactly zero
    val same = CorpusStats.unigramDrift(a, a, 10)
      .select($"kl_term").as[Double].collect()
    assert(same.forall(_ === 0.0))
  }

  test("orc ingest fills pre-evolution shards with NULL by name") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-orc").toString
    val docs = Tables.documents(spark, sf0001)
    graft.sources.OrcCorpus.ensureEvolvedFixture(docs, path, "lang")
    val back = graft.sources.OrcCorpus.read(spark, docs.schema,
      s"$path/legacy", s"$path/current")
    // lossless round-trip: every doc survives, text byte-identical
    assert(back.count() === docs.count())
    assert(back.select($"doc_id", md5($"text"))
      .exceptAll(docs.select($"doc_id", md5($"text"))).count() === 0)
    // the legacy generation (even ids) reads lang as NULL; the current
    // one keeps its values — name-based, not positional, evolution
    // (the legacy shard's column ORDER differs from the full schema
    // once `lang` is dropped, so positional matching would misalign)
    val byGen = back.groupBy(($"doc_id" % 2 === 0).as("legacy"))
      .agg(count(lit(1)).as("n"),
        sum($"lang".isNull.cast("long")).as("nulls"))
      .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byGen(true)._1 === byGen(true)._2) // all legacy NULL
    assert(byGen(false)._2 === 0L) // no current NULL
    // a second ensure is a no-op (marker short-circuits the rebuild)
    assert(graft.sources.OrcCorpus
      .ensureEvolvedFixture(docs, path, "lang").isEmpty)
  }

  test("avro ingest: reader-schema resolution backfills, quarantines, stays lossless") {
    import graft.sources.AvroCorpus
    val path = java.nio.file.Files
      .createTempDirectory("graft-avro").toString
    val docs = Tables.documents(spark, sf0001)
    AvroCorpus.ensureEvolvedFixture(docs, path, "lang")
    val (clean, quarantine) = AvroCorpus.readDocs(spark,
      s"$path/legacy", s"$path/current", s"$path/lenient")
    // lossless round-trip: every contract-valid doc survives with
    // byte-identical text; the lenient shard's null-id record does NOT
    // reach the clean frame
    assert(clean.count() === docs.count())
    assert(clean.select($"doc_id", md5($"text"))
      .exceptAll(docs.select($"doc_id", md5($"text"))).count() === 0)
    // field-default backfill: the legacy generation (even ids) was
    // written BEFORE `lang` existed — the reader schema's null default
    // fills it; current keeps values (resolution is by name)
    val byGen = clean.groupBy(($"doc_id" % 2 === 0).as("legacy"))
      .agg(count(lit(1)).as("n"),
        sum($"lang".isNull.cast("long")).as("nulls"))
      .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byGen(true)._1 === byGen(true)._2) // all legacy backfilled
    assert(byGen(false)._2 === 0L)
    // union-null contract: the lenient writer's null id resolved fine
    // but violates the pipeline contract → quarantined with its record
    val q = quarantine.collect()
    assert(q.length === 1)
    assert(q.head.getAs[String]("motivo_rechazo") === "missing doc_id")
    assert(q.head.getAs[String]("raw_record").contains("without an id"))
    // nasty text round-trips byte-for-byte through the container
    val nasty = Seq((1L, "tab\there\nnewline \\ quote\" end", "en",
      "web", 29L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    AvroCorpus.write(nasty, s"$path/nasty")
    val back = AvroCorpus.read(spark,
      AvroCorpus.avroSchemaFor(nasty.schema), s"$path/nasty")
    assert(back.select($"text").as[String].head() ===
      "tab\there\nnewline \\ quote\" end")
    // the loud failure mode: a reader-only field with NO default is a
    // resolution error at open — Avro's contract, kept deliberately
    val strict = org.apache.avro.SchemaBuilder.record("row")
      .namespace("graft").fields()
      .requiredLong("doc_id").requiredString("text")
      .requiredString("lang").requiredString("source")
      .requiredLong("n_chars").requiredString("added_no_default")
      .endRecord()
    intercept[org.apache.spark.SparkException] {
      AvroCorpus.read(spark, strict, s"$path/current").count()
    }
    // marker short-circuit
    assert(AvroCorpus.ensureEvolvedFixture(docs, path, "lang").isEmpty)
  }

  test("weighted reservoir sampling favors heavy weights, size-biased") {
    // k=1 per group: a doc with a 10^6× weight must win its group
    // (its |ln u|/w priority is ~0 while every unit-weight rival sits
    // near -1) — the A-ES inclusion-∝-weight property, deterministic
    // here because priorities derive from id hashes
    val d = (1L to 40L)
      .map(i => (i, if (i == 20L || i == 39L) 1000000L else 1L,
        s"s${i % 2}"))
      .toDF("doc_id", "w", "source")
    val got = CorpusStats
      .weightedSamplePerGroup(d, 1, $"w", "source", "doc_id")
      .select($"source", $"doc_id").as[(String, Long)].collect().toMap
    assert(got === Map("s0" -> 20L, "s1" -> 39L))
    // size-biased on the real corpus: the sampled docs' mean weight
    // exceeds the corpus mean (inclusion ∝ n_chars)
    val docs = Tables.documents(spark, sf0001)
    val sampled = CorpusStats
      .weightedSamplePerGroup(docs, 10, $"n_chars")
      .join(docs.select($"doc_id", $"n_chars"), Seq("doc_id"))
      .agg(avg($"n_chars")).head().getDouble(0)
    val corpus = docs.agg(avg($"n_chars")).head().getDouble(0)
    assert(sampled > corpus,
      s"sampled mean $sampled should exceed corpus mean $corpus")
  }

  test("z-order layout clusters 2-D rectangles into skippable files") {
    import graft.plans.LayoutKernels
    val path = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString
    val g = Tables.events(spark, sf0001)
      .select($"event_id", ($"user_id" % 256).as("za"),
        ($"event_id" % 256).as("zb"))
    graft.sources.ZOrderStore.writeZOrdered(g, path, "za", "zb", 8, 16)
    // the layout lands as a committed SnapshotDir version
    val vdir = graft.sources.SnapshotDir.current(spark, path, "z-").get
    val files = new java.io.File(vdir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 8)
    // range-partitioned on zval → per-file intervals are disjoint
    // (equal zvals land in one partition), i.e. the curve locality
    // actually reached the file layout
    val iv = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min($"zval"), max($"zval")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(iv.sliding(2).forall {
      case Array(a, b) => a._2 <= b._1
      case _ => true
    })
    // the rectangle's z-interval must leave some files untouched —
    // the whole point of the layout (bounds sized to sf0.001's
    // user_id range of 0..14)
    val zLo = LayoutKernels.interleave(2, 32, 8)
    val zHi = LayoutKernels.interleave(9, 159, 8)
    val touched = iv.count { case (lo, hi) => hi >= zLo && lo <= zHi }
    assert(touched < files.length,
      s"rectangle touched all ${files.length} files")
    // scan correctness: z-range prefilter + exact residuals equal the
    // plain exact rectangle
    val scan = graft.sources.ZOrderStore.zRangeScan(spark, path,
      "za", "zb", 2, 9, 32, 159, 8)
    val got = scan.select("event_id").as[Long].collect().toSet
    val expect = g.filter($"za".between(2, 9) &&
      $"zb".between(32, 159)).select("event_id").as[Long].collect().toSet
    assert(got === expect && got.nonEmpty)
    // the zval range predicate is pushed to the parquet scan (that is
    // what does the file/row-group skipping at scale)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(zval"))
  }

  test("layout-store time travel: pinned z-order and hilbert scans " +
      "survive later rewrites; expired pins fail loudly") {
    import graft.sources.{HilbertStore, ZOrderStore}
    val g = Tables.events(spark, sf0001)
      .select($"event_id", ($"user_id" % 256).as("za"),
        ($"event_id" % 256).as("zb"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id").as[Long].collect().toSet
    // ---- z-order: each rewrite is a version; the pin reads EXACTLY
    // the layout the run consumed, not whatever replaced it
    val zp = java.nio.file.Files
      .createTempDirectory("graft-z-pin").toString
    val half = g.filter($"event_id" % 2 === 0)
    ZOrderStore.writeZOrdered(half, zp, "za", "zb", 8, 4)
    val zv1 = ZOrderStore.committedVersions(spark, zp).max
    def zScanAt(v: Long) = ids(ZOrderStore.zRangeScanAt(spark, zp, v,
      "za", "zb", 0, 255, 0, 255, 8))
    val pinnedZ = zScanAt(zv1)
    assert(pinnedZ === ids(half))
    ZOrderStore.writeZOrdered(g, zp, "za", "zb", 8, 4) // v2: full grid
    assert(zScanAt(zv1) === pinnedZ,
      "the pin must keep serving the replaced layout")
    assert(ids(ZOrderStore.zRangeScan(spark, zp,
      "za", "zb", 0, 255, 0, 255, 8)) === ids(g))
    ZOrderStore.writeZOrdered(half, zp, "za", "zb", 8, 4) // v3 ages v1
    intercept[IllegalStateException](zScanAt(zv1))
    // ---- hilbert: pin a clustered∪tail state, append after, optimize
    val hp = java.nio.file.Files
      .createTempDirectory("graft-h-pin").toString
    val base = g.filter($"event_id" % 3 === 0)
    val b1 = g.filter($"event_id" % 3 === 1)
    val b2 = g.filter($"event_id" % 3 === 2)
    HilbertStore.ensureHilbert(base, hp, "za", "zb", 8, 4)
    HilbertStore.appendTail(b1, hp, "za", "zb", 8)
    val hv = HilbertStore.committedVersions(spark, hp).max
    def hScanAt(v: Long) = ids(HilbertStore.rectScanAt(spark, hp, v,
      "za", "zb", 0, 255, 0, 255, 8))
    assert(hScanAt(hv) === ids(base.unionByName(b1)))
    HilbertStore.appendTail(b2, hp, "za", "zb", 8)
    assert(hScanAt(hv) === ids(base.unionByName(b1)),
      "the pinned state must exclude batches appended after the pin")
    assert(ids(HilbertStore.rectScan(spark, hp,
      "za", "zb", 0, 255, 0, 255, 8)) === ids(g))
    HilbertStore.optimize(spark, hp, 4) // next commit ages the pin out
    intercept[IllegalStateException](hScanAt(hv))
    assert(ids(HilbertStore.rectScan(spark, hp,
      "za", "zb", 0, 255, 0, 255, 8)) === ids(g),
      "optimize must not change served rows")
  }

  test("hilbert tail width guard: appends auto-OPTIMIZE past the " +
      "segment bound, served rows unchanged") {
    import graft.sources.HilbertStore
    val g = Tables.events(spark, sf0001)
      .select($"event_id", ($"user_id" % 256).as("za"),
        ($"event_id" % 256).as("zb"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-h-width").toString + "/h"
    HilbertStore.ensureHilbert(g.filter($"event_id" % 7 === 0), path,
      "za", "zb", 8, 4)
    // six appends with a bound of 3: tail segments (one scan branch
    // each, zero skipping power) must never exceed the bound — the
    // guard folds clustered ∪ tail back in as part of the admission
    (1 to 6).foreach { k =>
      HilbertStore.appendTail(g.filter($"event_id" % 7 === k), path,
        "za", "zb", 8, maxTailSegments = 3)
      val cur = graft.sources.SnapshotDir.current(spark, path, "hilb-")
      val m = graft.sources.ManifestDir.read(spark, cur.get)
      assert(m.segments("tail").size <= 3,
        s"tail width ${m.segments("tail").size} exceeds the bound")
    }
    val got = HilbertStore.rectScan(spark, path,
        "za", "zb", 0, 255, 0, 255, 8)
      .select("event_id").as[Long].collect().toSet
    assert(got === g.select("event_id").as[Long].collect().toSet,
      "auto-optimize must not change served rows")
  }

  test("hilbert curve: bijective, unit-step adjacent, covering ranges exact") {
    import graft.plans.LayoutKernels
    // the definitive Hilbert check on the full 16×16 grid: xy2d is a
    // bijection onto 0..255 and CONSECUTIVE indices are always grid
    // neighbors (|Δx|+|Δy| = 1) — the locality property the Z-curve
    // lacks and the whole reason this layout exists
    val inv = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield LayoutKernels.hilbertD(x, y, 4) -> ((x, y))).toMap
    assert(inv.size === 256 && inv.keys.min === 0L &&
      inv.keys.max === 255L)
    (0L until 255L).foreach { d =>
      val (x0, y0) = inv(d); val (x1, y1) = inv(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L,
        s"jump at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
    // covering ranges with no coarsening cap are EXACT: their union
    // over the grid equals the rectangle's index set
    val rectSet = (for (x <- 3L to 11L; y <- 5L to 13L)
      yield LayoutKernels.hilbertD(x, y, 4)).toSet
    val exact = graft.sources.HilbertStore
      .coveringRanges(3, 11, 5, 13, 4, maxRanges = 1000)
    assert(exact.flatMap { case (lo, hi) => lo to hi }.toSet === rectSet)
    // coarsened to few ranges: still a SUPERSET, never drops a point
    val coarse = graft.sources.HilbertStore
      .coveringRanges(3, 11, 5, 13, 4, maxRanges = 3)
    assert(coarse.length <= 3)
    val coarseSet = coarse.flatMap { case (lo, hi) => lo to hi }.toSet
    assert(rectSet.subsetOf(coarseSet))
  }

  test("hilbert layout: connected files, pushed prefilter, scan parity") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-hilbert").toString
    val g = Tables.events(spark, sf0001)
      .select($"event_id", ($"user_id" % 256).as("za"),
        ($"event_id" % 256).as("zb"))
    assert(graft.sources.HilbertStore.ensureHilbert(g, path,
      "za", "zb", 8, 16).isDefined)
    assert(graft.sources.HilbertStore.ensureHilbert(g, path,
      "za", "zb", 8, 16).isEmpty) // warm
    val scan = graft.sources.HilbertStore.rectScan(spark, path,
      "za", "zb", 2, 9, 32, 159, 8)
    val got = scan.select("event_id").as[Long].collect().toSet
    val expect = g.filter($"za".between(2, 9) &&
      $"zb".between(32, 159)).select("event_id").as[Long].collect().toSet
    assert(got === expect && got.nonEmpty)
    // the covering-range OR-of-BETWEEN reaches the parquet footer
    // stats — the predicate that does the file skipping at scale
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("hval"), s"no pushed hval prefilter:\n$plan")
  }

  test("hilbert tail lifecycle: batch-sized append, scan parity, " +
      "optimize re-sorts the tail into a new version") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-hilbert-tail").toString
    val g = Tables.events(spark, sf0001)
      .select($"event_id", ($"user_id" % 256).as("za"),
        ($"event_id" % 256).as("zb"))
    val base = g.filter($"event_id" % 10 =!= 7)
    val batch = g.filter($"event_id" % 10 === 7)
    graft.sources.HilbertStore.ensureHilbert(base, path,
      "za", "zb", 8, 16)
    def inventory() = {
      val dir = java.nio.file.Paths.get(path, "seg")
      val s = java.nio.file.Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .filter(p => !p.getFileName.toString.contains("_SUCCESS"))
          .map(p => dir.relativize(p).toString ->
            (java.nio.file.Files.size(p),
              java.nio.file.Files.getLastModifiedTime(p).toMillis))
          .toMap
      } finally s.close()
    }
    val clusteredBefore = inventory()
    assert(clusteredBefore.keys.forall(_.contains("/clustered/")))
    graft.sources.HilbertStore.appendTail(batch, path, "za", "zb", 8)
    val afterAppend = inventory()
    // batch-sized append: every clustered file byte-untouched, the
    // new files all land as a tail SEGMENT of the next manifest
    clusteredBefore.foreach { case (f, sig) =>
      assert(afterAppend.get(f) === Some(sig),
        s"tail append rewrote clustered file $f") }
    assert(afterAppend.keys.filterNot(clusteredBefore.contains)
      .forall(_.contains("/tail/")))
    assert(afterAppend.count(_._1.contains("/tail/")) > 0)
    def rows() = graft.sources.HilbertStore.rectScan(spark, path,
        "za", "zb", 2, 191, 32, 159, 8)
      .select("event_id", "hval").as[(Long, Long)].collect().toSet
    val expect = g.filter($"za".between(2, 191) &&
        $"zb".between(32, 159))
      .select($"event_id",
        graft.plans.LayoutExpressions.hilbertValue(
          $"za".cast("long"), $"zb".cast("long"), 8).as("h"))
      .as[(Long, Long)].collect().toSet
    assert(rows() === expect, "clustered ∪ tail must scan exactly")
    graft.sources.HilbertStore.optimize(spark, path, 16)
    // a NEW committed version exists (build v1, append v2, optimize
    // v3 — every write is a manifest commit now), its manifest has no
    // tail relation, rows unchanged
    val cur = graft.sources.SnapshotDir.current(spark, path, "hilb-").get
    assert(cur.endsWith("hilb-00000003"))
    assert(graft.sources.ManifestDir.read(spark, cur)
      .segments("tail").isEmpty)
    assert(rows() === expect, "scan parity must survive optimize")
    // idempotent: no tail → optimize is a no-op, no new version
    graft.sources.HilbertStore.optimize(spark, path, 16)
    assert(graft.sources.SnapshotDir.current(spark, path, "hilb-")
      .get === cur)
  }

  test("hilbert optimistic tail appends: concurrent writers — a " +
      "same-lineage loser fails loudly and lands on retry") {
    import graft.sources.HilbertStore
    val path = java.nio.file.Files
      .createTempDirectory("graft-hilbert-optim").toString
    val g = Tables.events(spark, sf0001)
      .select($"event_id", ($"user_id" % 256).as("za"),
        ($"event_id" % 256).as("zb"))
    val base = g.filter($"event_id" % 3 === 0)
    val b1 = g.filter($"event_id" % 3 === 1)
    val b2 = g.filter($"event_id" % 3 === 2)
    HilbertStore.ensureHilbert(base, path, "za", "zb", 8, 16)
    // two optimistic appenders race on ONE lineage: segments write
    // lock-free; at most one commit window wins per claimed version,
    // the loser throws ConcurrentModificationException and RETRIES
    // against the new current (tail appends are additive, so the
    // retry is a fresh claim + re-publish)
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    def appender(df: org.apache.spark.sql.DataFrame) = new Thread(() => {
      var done = false
      while (!done) {
        try {
          HilbertStore.appendTailOptimistic(df, path, "za", "zb", 8)
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException =>
            failures.incrementAndGet(); ()
        }
      }
    })
    val (t1, t2) = (appender(b1), appender(b2))
    t1.start(); t2.start(); t1.join(); t2.join()
    // both batches landed exactly once, whatever the interleaving
    val got = HilbertStore.rectScan(spark, path, "za", "zb",
      0, 255, 0, 255, 8).select("event_id").as[Long].collect().toSet
    assert(got === g.select("event_id").as[Long].collect().toSet)
  }

  test("bpe encode applies the trained vocab with OOV char fallback") {
    // merges learned from this doc (see the training fixture):
    // (a,b), (a,ab), (ab,ab) → abab = 1 token, aab = 1 token,
    // bb = [b, b] (pair (b,b) never won), x = OOV single char
    val d = Seq((7L, "abab abab aab aab aab bb x"))
      .toDF("doc_id", "text")
    val got = CorpusStats.bpeEncode(d, 3)
      .as[(Long, Long, Long, String)].collect().toSeq
    val expectStream = "abab abab aab aab aab b b x"
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(expectStream.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got === Seq((7L, 7L, 8L, fp)))
  }

  test("scorer calibration: bins partition the corpus, rates bounded, " +
      "bins equal the component recompute") {
    val docs = Tables.documents(spark, sf0001)
    val cal = TextAnalysis.scorerCalibration(docs).collect()
    assert(cal.map(_.getAs[Long]("n_docs")).sum === docs.count())
    cal.foreach { r =>
      assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n_docs"))
      val kr = r.getAs[Double]("keep_rate")
      assert(kr >= 0.0 && kr <= 1.0)
    }
    // the composition equals re-deriving bins from the two component
    // operators directly (same floor-over-double binning)
    val direct = TextAnalysis.hashedNgramScore(docs)
      .select(col("doc_id"), col("score_raw"))
      .join(CorpusStats.gopherRules(docs)
        .select(col("doc_id"), col("keep")), Seq("doc_id"))
      .withColumn("bin",
        floor(col("score_raw").cast("double") / lit(2000.0))
          .cast("long"))
      .groupBy(col("bin")).count()
      .collect().map(r => r.getAs[Long]("bin") ->
        r.getAs[Long]("count")).toMap
    assert(cal.map(r => r.getAs[Long]("bin") ->
      r.getAs[Long]("n_docs")).toMap === direct)
    // a negative margin must land in a NEGATIVE bin (floor, not
    // truncate-toward-zero)
    assert(cal.exists(_.getAs[Long]("bin") < 0L),
      "fixture corpus should populate negative margin bins")
  }

  test("rank metrics: hand-computed MRR/NDCG, misses zero, perfect is 1") {
    import graft.operators.Similarity
    val t = Similarity.dcgPpmTable(10)
    val it = Similarity.idcgPpmTable(10)
    // q=1: relevant {10,11,12}; approx ranks: irrelevant@1, 11@2, 10@3
    // q=2: relevant {20}; approx has no relevant row at all
    // q=3: relevant {30,31}; approx nails ranks 1,2 → perfect
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L),
      (3L, 30L), (3L, 31L)).toDF("query_id", "match_id")
    val approx = Seq((1L, 99L, 1), (1L, 11L, 2), (1L, 10L, 3),
      (2L, 98L, 1), (3L, 30L, 1), (3L, 31L, 2))
      .toDF("query_id", "match_id", "rank")
    val out = Similarity.rankMetrics(approx, exact, 10)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    val q1 = out(1L)
    assert(q1.getAs[Long]("n_exact") === 3L && q1.getAs[Long]("n_hit") === 2L)
    assert(q1.getAs[Long]("first_rel_rank") === 2L)
    assert(q1.getAs[Long]("rr_x2520") === 1260L)
    assert(q1.getAs[Double]("rr") === 0.5)
    assert(q1.getAs[Long]("dcg_ppm") === t(1) + t(2))
    assert(q1.getAs[Long]("idcg_ppm") === it(2))
    val expNdcg = BigDecimal((t(1) + t(2)).toDouble / it(2).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q1.getAs[Double]("ndcg_at_k") === expNdcg)
    val q2 = out(2L)
    assert(q2.getAs[Long]("n_hit") === 0L)
    assert(q2.isNullAt(q2.fieldIndex("first_rel_rank")))
    assert(q2.getAs[Long]("rr_x2520") === 0L)
    assert(q2.getAs[Double]("rr") === 0.0)
    assert(q2.getAs[Double]("ndcg_at_k") === 0.0)
    val q3 = out(3L)
    assert(q3.getAs[Long]("rr_x2520") === 2520L)
    assert(q3.getAs[Double]("rr") === 1.0)
    assert(q3.getAs[Double]("ndcg_at_k") === 1.0)
    // the discount table is monotone decreasing and anchored at 1e6
    assert(t.head === 1000000L)
    assert(t.sliding(2).forall(w => w(0) > w(1)))
  }

  test("unigram store: stored-vocab encode equals in-query bit-for-bit; " +
      "frozen model segments later corpora") {
    import graft.sources.TokenizerStore
    val docs = Tables.documents(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-unistore").toString + "/uni"
    assert(TokenizerStore.ensureUnigramVocab(docs, path, 200, 4)
      .isDefined)
    val stored = TokenizerStore
      .encodeUnigramFromStore(spark, path, docs, 4)
    val direct = CorpusStats.unigramTokenEncode(docs, 200, 4)
    assert(stored.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(stored).count() === 0)
    // warm marker is a no-op; a different recipe retrains
    assert(TokenizerStore.ensureUnigramVocab(docs, path, 200, 4)
      .isEmpty)
    assert(TokenizerStore.ensureUnigramVocab(docs, path, 100, 4)
      .isDefined)
    // a LATER corpus encodes under the FROZEN model: in-vocab pieces
    // segment, never-seen words fall back to themselves whole (no
    // coverage guarantee off the training corpus — by contract)
    val later = Seq((999L, "zzqqxx")).toDF("doc_id", "text")
    val enc = TokenizerStore
      .encodeUnigramFromStore(spark, path, later, 4).collect().head
    assert(enc.getAs[Long]("n_words") === 1L)
    assert(enc.getAs[Long]("n_pieces") >= 1L)
  }

  test("lm store: stored-model scoring equals in-query, OOV floors") {
    import graft.sources.LmStore
    val docs = Tables.documents(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-lmstore").toString + "/lm"
    assert(LmStore.ensureModel(docs, path).isDefined)
    // in-model scoring replays the in-query computation bit-for-bit
    val stored = LmStore.scoreFromStore(spark, path, docs)
    val direct = CorpusStats.bigramLogProb(docs)
    assert(stored.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(stored).count() === 0)
    // a LATER corpus scores under the FROZEN model: fully out-of-model
    // material lands exactly at the smoothing floor ln(Vα/α) = ln(V)
    // (unseen history: (0 + Vα) / (0 + α)) instead of being dropped
    val v = LmStore.readUnigrams(spark, path).count().toDouble
    val later = Seq((888L, "zzqx1 zzqx2 zzqx3")).toDF("doc_id", "text")
    val oov = LmStore.scoreFromStore(spark, path, later).collect().head
    assert(oov.getAs[Long]("n_big") === 2L)
    assert(math.abs(oov.getAs[Double]("xent2") -
      BigDecimal(math.log(v)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // warm marker is a no-op
    assert(LmStore.ensureModel(docs, path).isEmpty)
  }

  test("tokenizer store: stored-vocab encode equals in-query train+encode") {
    import graft.sources.TokenizerStore
    val docs = Tables.documents(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bpevocab").toString + "/vocab"
    // cold build pays training; the stored encode then replays the
    // in-query train+encode bit-for-bit (vocab round-trips parquet)
    assert(TokenizerStore.ensureVocab(docs, path, 3).isDefined)
    val stored = TokenizerStore.encodeFromStore(spark, path, docs)
    val direct = CorpusStats.bpeEncode(docs, 3)
    assert(stored.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(stored).count() === 0)
    // the portable merge list round-trips with ranks intact
    val m = TokenizerStore.readMerges(spark, path)
      .orderBy($"merge_rank").collect()
    assert(m.map(_.getAs[Int]("merge_rank")).toSeq === Seq(1, 2, 3))
    // a LATER corpus encodes against the frozen store — trained words
    // use their merged syms, unseen words tokenize as themselves
    val later = Seq((999L, "zzz-never-trained zzz-also-new"))
      .toDF("doc_id", "text")
    val enc = TokenizerStore.encodeFromStore(spark, path, later)
      .collect().head
    assert(enc.getAs[Long]("n_words") === 2L)
    assert(enc.getAs[Long]("n_subwords") === 2L) // OOV = 1 token each
    // warm marker is a no-op; a recipe change retrains
    assert(TokenizerStore.ensureVocab(docs, path, 3).isEmpty)
    assert(TokenizerStore.ensureVocab(docs, path, 4).isDefined)
  }

  test("tokenizer branches: retrain on 'exp' only; main untouched; " +
      "promote fast-forwards") {
    import graft.sources.TokenizerStore
    val docs = Tables.documents(spark, sf0001)
    val slice = docs.filter($"doc_id" % 10 =!= 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft-tokbranch").toString + "/vocab"
    TokenizerStore.ensureVocab(docs, path, 3)
    def merges(b: Option[String]) = TokenizerStore
      .readMerges(spark, path, b).collect().map(_.toString).sorted.toSeq
    val mainBefore = merges(None)
    TokenizerStore.createBranch(spark, path, "exp")
    // the takedown-retrain lands on the branch: main is untouched
    TokenizerStore.writeVocab(slice, path, 3, branch = Some("exp"))
    assert(merges(None) === mainBefore, "main must be isolated")
    // the branch equals a direct retrain over the filtered corpus
    val want = graft.operators.CorpusStats.bpeTrainVocab(slice, 3)
      ._1.collect().map(_.toString).sorted.toSeq
    assert(merges(Some("exp")) === want)
    // encode against the branch vocabulary serves the branch model
    val encExp = TokenizerStore.encodeFromStore(spark, path,
      slice.limit(20), branch = Some("exp"))
    assert(encExp.count() === 20L)
    // promote publishes the branch model as main (fast-forward)
    TokenizerStore.promoteBranch(spark, path, "exp")
    assert(merges(None) === want)
    assert(TokenizerStore.branches(spark, path).isEmpty)
  }

  test("ivfpq served from the persisted index replays the in-query build") {
    val e = Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-eq").toString
    graft.sources.VectorIndexStore.writeIvfPq(e, path)
    val q = e.filter($"vec_id" % 50 === 0)
    val direct = Similarity.ivfPqTopK(q, e, 10)
      .collect().map(_.toString).sorted
    val served = graft.sources.VectorIndexStore
      .ivfPqTopKFromIndex(spark, path, q, e, 10)
      .collect().map(_.toString).sorted
    assert(direct.length === served.length && direct.sameElements(served))
  }

  test("ivfpq append width guard: the codes relation auto-compacts " +
      "past the segment bound, results unchanged") {
    import graft.sources.VectorIndexStore
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter($"vec_id" % 10 < 5)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-width").toString
    VectorIndexStore.writeIvfPq(base, path)
    // five appends with a bound of 3: plan width (one scan branch per
    // codes segment) must never exceed the bound — the guard folds the
    // relation back inside the SAME locked admission
    (5 until 10).foreach { k =>
      VectorIndexStore.appendIvfPq(spark, path,
        e.filter($"vec_id" % 10 === k), maxCodesSegments = 3)
      val m = VectorIndexStore.currentManifest(spark, path)
      assert(m.segments("codes").size <= 3,
        s"codes segments ${m.segments("codes").size} exceed the bound")
    }
    val q = e.filter($"vec_id" % 50 === 0)
    val served = VectorIndexStore
      .ivfPqTopKFromIndex(spark, path, q, e, 10)
      .collect().map(_.toString).sorted
    val whole = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-width2").toString
    VectorIndexStore.writeIvfPq(base, whole)
    // same admissions, no auto-compaction — identical serving rows
    (5 until 10).foreach(k => VectorIndexStore.appendIvfPq(spark, whole,
      e.filter($"vec_id" % 10 === k)))
    val loose = VectorIndexStore
      .ivfPqTopKFromIndex(spark, whole, q, e, 10)
      .collect().map(_.toString).sorted
    assert(served.sameElements(loose),
      "auto-compaction must not change served results")
  }

  test("ivfpq append equals the in-memory frozen-metadata composition") {
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter($"vec_id" % 10 =!= 9)
    val batch = e.filter($"vec_id" % 10 === 9)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-app").toString
    graft.sources.VectorIndexStore.writeIvfPq(base, path)
    graft.sources.VectorIndexStore.appendIvfPq(spark, path, batch)
    val q = e.filter($"vec_id" % 50 === 0)
    val served = graft.sources.VectorIndexStore
      .ivfPqTopKFromIndex(spark, path, q, e, 10)
      .collect().map(_.toString).sorted
    val ix = Similarity.buildIvfPqIndex(base)
    val composed = ix.copy(codes = () => ix.codes().unionByName(
      Similarity.encodeForIndex(batch, ix.cents, ix.codebooks, 8, 64,
        "vec_id", "embedding")))
    val direct = Similarity.ivfPqSearch(composed, q, e, 10, 2, 8, 64, 3,
        "vec_id", "embedding")
      .collect().map(_.toString).sorted
    assert(direct.length === served.length && direct.sameElements(served))
  }

  test("ivfpq compaction rewrites lists to one file, results unchanged") {
    import graft.sources.VectorIndexStore
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter($"vec_id" % 10 =!= 9)
    val batch = e.filter($"vec_id" % 10 === 9)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-compact").toString
    VectorIndexStore.writeIvfPq(base, path)
    VectorIndexStore.appendIvfPq(spark, path, batch)
    val q = e.filter($"vec_id" % 50 === 0)
    def serve() = VectorIndexStore
      .ivfPqTopKFromIndex(spark, path, q, e, 10)
      .collect().map(_.toString).sorted
    def segDirs() = VectorIndexStore.codesSegmentDirs(spark, path)
    // parquet files per LIST, summed across the manifest's segments
    def filesPerList(): Map[String, Int] = segDirs()
      .flatMap(seg => Option(new java.io.File(seg).listFiles())
        .toSeq.flatten
        .filter(d => d.isDirectory && d.getName.startsWith("cent_id="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val before = serve()
    assert(segDirs().size === 2, "append commits its own codes segment")
    assert(filesPerList().values.exists(_ > 1), "append should add files")
    // an in-flight reader that resolved the PRE-compaction manifest...
    val inFlight = VectorIndexStore.readCodes(spark, path)
    val preSegs = segDirs()
    VectorIndexStore.compactIvfPq(spark, path)
    assert(segDirs().size === 1, "compaction folds to one segment")
    assert(filesPerList().values.forall(_ === 1))
    val after = serve()
    assert(after.sameElements(before))
    // ...still reads its snapshot: GC keeps the previous committed
    // manifest as a grace window, and the vacuum spares every segment
    // a retained manifest references
    assert(preSegs.forall(d => new java.io.File(d).exists),
      "pre-compaction segments must survive one compaction as grace")
    assert(inFlight.count() > 0)
    // a second compaction ages the old manifest out; its now-orphan
    // segments are vacuumed
    VectorIndexStore.compactIvfPq(spark, path)
    assert(preSegs.forall(d => !new java.io.File(d).exists),
      "GC keeps exactly one previous committed version; vacuum sweeps")
    assert(serve().sameElements(before))
  }

  test("ivfpq deletes: shade immediately, compact drops physically, re-insert shadowed until compact") {
    import graft.sources.VectorIndexStore
    val e = Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-del").toString
    VectorIndexStore.writeIvfPq(e, path)
    val q = e.filter($"vec_id" % 50 === 0)
    def served() = VectorIndexStore
      .ivfPqTopKFromIndex(spark, path, q, e, 10)
      .select($"match_id").as[Long].collect().toSet
    val victims = served().take(3) // ids that DO appear in results
    assert(victims.nonEmpty)
    // pin the pre-delete version: a delete is a NEW committed version,
    // so the pinned snapshot must stay frozen across it
    val preVersion = VectorIndexStore.currentVersion(spark, path).get
    val prePinned = VectorIndexStore
      .readCodesAt(spark, path, preVersion)
      .select($"match_id").as[Long].collect().toSet
    assert((prePinned & victims).nonEmpty)
    VectorIndexStore.deleteIvfPq(spark, path,
      victims.toSeq.toDF("vec_id"))
    // shade is immediate — no compaction yet, no list rewritten
    val afterDelete = served()
    assert((afterDelete & victims).isEmpty)
    // ...while the PINNED pre-delete read is unchanged (the tombstone
    // rode a LATER version's manifest; committed versions are
    // immutable)
    assert(VectorIndexStore.readCodesAt(spark, path, preVersion)
      .select($"match_id").as[Long].collect().toSet === prePinned)
    // re-inserting a deleted id stays SHADOWED until a compaction
    // absorbs the tombstone (the documented contract)
    val reinsert = e.filter($"vec_id".isin(victims.toSeq: _*))
    VectorIndexStore.appendIvfPq(spark, path, reinsert)
    assert((served() & victims).isEmpty)
    // compaction materializes the shaded view: rows physically gone,
    // no tombstone relation in the new manifest...
    VectorIndexStore.compactIvfPq(spark, path)
    assert(VectorIndexStore.currentManifest(spark, path)
      .segments("tombstones").isEmpty)
    assert((served() & victims).isEmpty)
    // ...and a post-compaction re-insert genuinely resurfaces
    VectorIndexStore.appendIvfPq(spark, path, reinsert)
    assert((served() & victims).nonEmpty)
  }

  test("ivfpq torn delete is invisible: an uncommitted tombstone " +
      "segment never shades; vacuum sweeps it") {
    import graft.sources.{ManifestDir, VectorIndexStore}
    val e = Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-torn").toString
    VectorIndexStore.writeIvfPq(e, path)
    val q = e.filter($"vec_id" % 50 === 0)
    def served() = VectorIndexStore
      .ivfPqTopKFromIndex(spark, path, q, e, 10)
      .select($"match_id").as[Long].collect().toSet
    val before = served()
    // simulate a delete that died AFTER writing its tombstone segment
    // but BEFORE its manifest commit: the segment is an orphan no
    // manifest references
    val seg = ManifestDir.segDir(ManifestDir.newSegmentId(),
      "tombstones")
    before.take(2).toSeq.toDF("match_id")
      .select($"match_id".cast("long").as("match_id"))
      .write.parquet(s"$path/$seg")
    assert(served() === before,
      "an uncommitted tombstone segment must not shade anything")
    // the next maintenance vacuum sweeps the orphan (single-threaded
    // spec stands in for the lock-holding caller)
    assert(ManifestDir.vacuum(spark, path, Seq("vix-")) === 1L)
    assert(!new java.io.File(s"$path/$seg").exists)
    assert(served() === before)
  }

  test("salted codes write bounds files per list, results and schema unchanged") {
    import graft.sources.VectorIndexStore
    val e = Tables.embeddings(spark, sf0001)
    val plain = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-plain").toString
    val salted = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-salt").toString
    VectorIndexStore.writeIvfPq(e, plain)
    VectorIndexStore.writeIvfPq(e, salted, saltFilesPerList = 3)
    def filesPerList(p: String): Seq[Int] =
      VectorIndexStore.codesSegmentDirs(spark, p)
        .flatMap(seg => new java.io.File(seg).listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("cent_id="))
          .toSeq
          .map(_.listFiles().count(_.getName.endsWith(".parquet"))))
    // each (list, salt) pair lands in exactly one task → at most salt
    // files per list directory (vs exactly 1 unsalted)
    assert(filesPerList(plain).forall(_ === 1))
    assert(filesPerList(salted).forall(_ <= 3))
    val q = e.filter($"vec_id" % 50 === 0)
    def serve(p: String) = VectorIndexStore
      .ivfPqTopKFromIndex(spark, p, q, e, 10)
      .collect().map(_.toString).sorted
    assert(serve(plain).sameElements(serve(salted)))
    // the manifest's schema meta pins the partition-column round-trip:
    // cent_id reads back as the written bigint, not an inferred int
    val man = VectorIndexStore.currentManifest(spark, salted)
    val pinned = org.apache.spark.sql.types.DataType.fromJson(
        man.meta("codes_schema"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(pinned("cent_id").dataType ===
      org.apache.spark.sql.types.LongType)
    // the metadata relations are versioned WITH the codes (one commit
    // marker publishes the whole manifest)
    Seq("cents", "codebooks", "crosst").foreach(n =>
      assert(man.segments(n).nonEmpty, n))
    val saltedCodes = VectorIndexStore
      .codesSegmentDirs(spark, salted).head
    val centType = spark.read.schema(pinned)
      .parquet(saltedCodes).schema("cent_id").dataType
    assert(centType === org.apache.spark.sql.types.LongType)
    // whereas bare inference would have narrowed it
    assert(spark.read.parquet(saltedCodes).schema("cent_id")
      .dataType === org.apache.spark.sql.types.IntegerType)
  }

  test("ensureIvfPq builds once per recipe and rebuilds on recipe change") {
    val e = Tables.embeddings(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-ensure").toString
    val first = graft.sources.VectorIndexStore.ensureIvfPq(e, path)
    val second = graft.sources.VectorIndexStore.ensureIvfPq(e, path)
    assert(first.isDefined, "cold path must build (and report seconds)")
    assert(second.isEmpty, "warm path must reuse the persisted index")
    // a different recipe (salt) invalidates the marker and rebuilds
    val changed = graft.sources.VectorIndexStore.ensureIvfPq(e, path,
      saltFilesPerList = 2)
    assert(changed.isDefined, "recipe change must rebuild")
    // and the rebuilt index still serves identically to a direct build
    val q = e.filter($"vec_id" % 50 === 0)
    val served = graft.sources.VectorIndexStore
      .ivfPqTopKFromIndex(spark, path, q, e, 10)
      .collect().map(_.toString).sorted
    val direct = Similarity.ivfPqTopK(q, e, 10)
      .collect().map(_.toString).sorted
    assert(served.sameElements(direct))
  }

  test("sketch profile: estimates bounded by exact answers, partition-invariant") {
    val d = Tables.documents(spark, sf0001)
    val prof = CorpusStats.sketchProfile(d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val exact = d.select($"source",
        md5(lower(trim($"text"))).as("fp"),
        graft.operators.TextAnalysis.tokenCount($"text").cast("long")
          .as("toks"))
      .groupBy($"source")
      .agg(countDistinct($"fp").as("uniq"),
        expr("percentile(toks, 0.4)").as("p40"),
        expr("percentile(toks, 0.6)").as("p60"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(prof.keySet === exact.keySet)
    for ((src, r) <- prof) {
      val e = exact(src)
      val approx = r.getAs[Long]("approx_unique").toDouble
      val uniq = e.getAs[Long]("uniq").toDouble
      assert(math.abs(approx - uniq) / uniq <= 0.1,
        s"$src: approx_unique $approx vs exact $uniq")
      val p50 = r.getAs[Long]("approx_p50_tokens").toDouble
      assert(p50 >= e.getAs[Double]("p40") && p50 <= e.getAs[Double]("p60"),
        s"$src: approx p50 $p50 outside [p40, p60]")
    }
    // sketch merges are order/partitioning-independent: the profile of
    // the same multiset through different partitionings is identical
    val a = CorpusStats.sketchProfile(d.repartition(7))
      .collect().map(_.toString).sorted
    val b = CorpusStats.sketchProfile(d.repartition(3))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("compression ratio separates repetitive text from prose and noise") {
    val rep = ("ab " * 400).trim
    val prose = "the quality of mercy is not strained it droppeth as " +
      "the gentle rain from heaven upon the place beneath it is twice " +
      "blest it blesseth him that gives and him that takes"
    val noise = (0 until 200).map(i =>
      graft.operators.Dedup.getClass.getName.hashCode * (i + 7)).mkString(" ")
    val df = Seq((0L, rep), (1L, prose), (2L, noise), (3L, ""))
      .toDF("doc_id", "text")
      .select($"doc_id",
        graft.operators.TextAnalysis.compressionRatio($"text").as("r"))
    val r = df.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) < 0.05, s"repetitive should crush: ${r(0L)}")
    assert(r(1L) > r(0L) * 4, s"prose must sit well above repetitive")
    assert(r(2L) > r(0L), "numeric noise above repetitive")
    assert(r(3L) === 1.0, "empty input is 1.0 by convention")
    // determinism: a second evaluation is bit-identical
    val again = df.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(again === r)
  }

  // ---- incremental dedup: the persisted fingerprint store ------------

  test("incremental dedup flags batch near-dups of the stored corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (3L, "completely different words about spark shuffles and joins"),
      (5L, "el perro de la casa y el gato de la calle en un patio"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // exact copy of corpus doc 1 → jaccard 1.0
      (10L, "the quick brown fox jumps over the lazy dog near the river"),
      // near-dup of corpus doc 3 (one word changed)
      (12L, "completely different words about spark shuffles and sorts"),
      // novel text → must survive
      (14L, "astronomy tables chart the motion of seven wandering stars"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-fp-basic").toString
    graft.sources.FingerprintStore.writeFingerprints(corpus, path)
    val r = graft.sources.FingerprintStore
      .dedupBatchAgainst(spark, path, batch, 0.1)
      .collect().map(x => x.getAs[Long]("batch_id") -> x).toMap
    assert(r(10L).getAs[Long]("n_dups") === 1L)
    assert(r(10L).getAs[Long]("dup_of") === 1L)
    assert(r(10L).getAs[Double]("best_jaccard") === 1.0)
    assert(!r(10L).getAs[Boolean]("survived"))
    assert(r(12L).getAs[Long]("dup_of") === 3L)
    assert(r(12L).getAs[Double]("best_jaccard") > 0.5)
    assert(r(14L).getAs[Long]("n_dups") === 0L)
    assert(r(14L).getAs[Boolean]("survived"))
    assert(r(14L).isNullAt(r(14L).fieldIndex("dup_of")))
  }

  test("fingerprint append: a redelivered batch is fully rejected") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-fp-app").toString
    graft.sources.FingerprintStore.writeFingerprints(corpus, path)
    val first = graft.sources.FingerprintStore
      .dedupBatchAgainst(spark, path, batch, 0.1).cache()
    val survivors = batch.join(
      first.filter($"survived").select($"batch_id".as("doc_id")),
      Seq("doc_id"), "left_semi")
    assert(survivors.count() > 0, "fixture needs surviving docs")
    graft.sources.FingerprintStore.appendBatch(spark, path, survivors)
    // redelivery: every batch doc with shingles now matches the store —
    // survivors match their own appended fingerprints (jaccard 1.0),
    // prior dups still match their original corpus near-dup
    val second = graft.sources.FingerprintStore
      .dedupBatchAgainst(spark, path, batch, 0.1)
    val shingled = Dedup.minhashSignatures(batch)
      .select($"id".as("batch_id"))
    val redelivered = second.join(shingled, Seq("batch_id"), "left_semi")
    assert(redelivered.filter($"survived").count() === 0,
      "no shingled batch doc may survive redelivery after append")
    // an identity match reports itself: jaccard exactly 1.0 somewhere
    assert(redelivered.filter($"best_jaccard" === 1.0).count() > 0)
    first.unpersist()
  }

  test("fingerprint branches: zero-copy create, isolated append, " +
      "committed-only listing, ref-aware vacuum, promote") {
    import graft.sources.{Branches, FingerprintStore, ManifestDir,
      SnapshotDir}
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-fp-branch").toString
    FingerprintStore.writeFingerprints(corpus, path)
    def bucketSet(b: Option[String]) = FingerprintStore
      .readBuckets(spark, path, b).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("band"),
        r.getAs[String]("key"))).toSet
    def segFiles(): Long = {
      val seg = java.nio.file.Paths.get(path, "seg")
      val s = java.nio.file.Files.walk(seg)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .count(java.nio.file.Files.isRegularFile(_)).toLong
      } finally s.close()
    }
    val baseBuckets = bucketSet(None)
    // a PHANTOM branch (createBranch that died before its manifest
    // commit = an uncommitted version dir) must not list — listing a
    // name that read(branch=...) then throws on is how a crashed
    // create poisons the catalog
    val phantom = s"$path/${SnapshotDir.name(
      Branches.branchPrefix("fp-", "ghost"), 1L)}"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(phantom))
    assert(FingerprintStore.branches(spark, path).isEmpty,
      "an uncommitted branch lineage is crash debris, not a branch")
    // zero-copy creation: one manifest commit, no segment files
    val segBefore = segFiles()
    FingerprintStore.createBranch(spark, path, "exp")
    assert(segFiles() === segBefore, "branch create must copy no data")
    assert(FingerprintStore.branches(spark, path) === Seq("exp"))
    assert(bucketSet(Some("exp")) === baseBuckets)
    // the batch admits into the branch lineage ONLY
    FingerprintStore.appendBatch(spark, path, batch,
      branch = Some("exp"))
    val expBuckets = bucketSet(Some("exp"))
    assert(expBuckets.size > baseBuckets.size)
    assert(bucketSet(None) === baseBuckets,
      "main must not see branch appends")
    // the branch lineage serves admission checks against its own state
    val verdicts = FingerprintStore.dedupBatchAgainst(spark, path,
      batch, 0.1, branch = Some("exp"))
    assert(verdicts.filter($"best_jaccard" === 1.0).count() > 0,
      "branch-admitted docs must match themselves on the branch")
    // multi-lineage vacuum on the fp root: every segment is referenced
    // by main or the branch — nothing sweeps
    assert(Branches.vacuum(spark, path, "fp-") === 0L)
    assert(bucketSet(Some("exp")) === expBuckets)
    // fast-forward promote: main becomes the branch state, lineage gone
    FingerprintStore.promoteBranch(spark, path, "exp")
    assert(bucketSet(None) === expBuckets)
    assert(FingerprintStore.branches(spark, path).isEmpty)
    // drop sweeps branch-only segments on a fresh branch
    FingerprintStore.createBranch(spark, path, "exp2")
    FingerprintStore.appendBatch(spark, path,
      docs.filter($"doc_id" % 10 === 3), branch = Some("exp2"))
    val withBranch = segFiles()
    FingerprintStore.dropBranch(spark, path, "exp2")
    assert(segFiles() < withBranch, "drop must sweep branch-only segs")
    assert(bucketSet(None) === expBuckets)
    // the phantom debris never became readable state
    assert(ManifestDir.tryRead(spark, phantom).isEmpty)
  }

  test("pipeline e2e: quarantined, duplicate, and contaminated docs " +
      "never reach a shard") {
    import graft.operators.ExtQueries
    val docs = Tables.documents(spark, sf0001)
    val (quarantine, st) = ExtQueries.pipelineStages(spark, sf0001)
    // exactly the 2 injected bad lines quarantine; every real doc
    // ingests (quarantined rows have no valid id — they can't even
    // enter the flow)
    assert(quarantine.count() === 2L)
    assert(st("ingest").count() === docs.count())
    val shardIds = st("sharded").select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(shardIds.nonEmpty, "fixture must shard something")
    // benchmark rows are excluded wholesale
    assert(shardIds.forall(_ % ExtQueries.DecontamMod != 0))
    // docs the admission flagged as near-dups of the corpus never shard
    val rejected = graft.sources.FingerprintStore.dedupBatchAgainst(
        spark, ExtQueries.fpStorePath(sf0001),
        docs.filter($"doc_id" % ExtQueries.IncrBatchMod === 0),
        ExtQueries.JaccardThreshold)
      .filter(!$"survived").select($"batch_id").collect()
      .map(_.getLong(0)).toSet
    assert(rejected.nonEmpty, "fixture must reject some duplicates")
    assert(shardIds.intersect(rejected).isEmpty)
    // benchmark-contaminated docs (exact 5-gram overlap) never shard
    val contaminated = graft.operators.Contamination.ngramOverlap(
        docs.filter($"doc_id" % ExtQueries.DecontamMod =!= 0),
        docs.filter($"doc_id" % ExtQueries.DecontamMod === 0),
        n = ExtQueries.DecontamN)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(shardIds.intersect(contaminated).isEmpty)
    // stages only ever narrow
    val order = Seq("batch", "admitted", "quality", "decontam", "mixed")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(st(b).count() <= st(a).count(), s"$b must not widen $a") }
    assert(st("sharded").count() === st("mixed").count())
  }

  test("takedown: a removed id vanishes from EVERY store's serve path; " +
      "the sweep is replay-safe") {
    import graft.sources._
    import graft.operators.ExtQueries
    val docs = Tables.documents(spark, sf0001)
    val e = Tables.embeddings(spark, sf0001)
    val events = Tables.events(spark, sf0001)
    val docDel = docs.filter($"doc_id" % 10 === 3)
    val vecDel = e.filter($"vec_id" % 10 === 3)
    val factDel = events.filter($"event_id" % 10 === 3)
    val root = java.nio.file.Files
      .createTempDirectory("graft-takedown").toString
    FingerprintStore.writeFingerprints(docs, s"$root/fp")
    // pin the pre-takedown state for the time-travel check below
    val preBuckets = FingerprintStore.readBuckets(spark, s"$root/fp")
      .collect().map(_.toString).sorted.toSeq
    LmStore.writeModel(docs, s"$root/lm")
    EdgeStore.ensureNearDupPairs(e, s"$root/edges",
      ExtQueries.CosineThreshold, bands = ExtQueries.NearDupBands,
      rowsPerBand = ExtQueries.NearDupRows,
      dim = ExtQueries.EmbeddingDim)
    ClusterStore.ensureLabels(spark, s"$root/edges")
    VectorIndexStore.writeIvfPq(e, s"$root/ann")
    AggStore.writeState(events, s"$root/agg")
    TokenizerStore.ensureVocab(docs, s"$root/tok", 6)
    val survivors = docs.filter($"doc_id" % 10 =!= 3)
    // layout stores persist the clustered fact rows — the sweep must
    // rewrite them like any other persisted copy of the data
    val grid = events.select($"event_id",
      ($"user_id" % 256).as("za"), ($"event_id" % 256).as("zb"))
    HilbertStore.ensureHilbert(grid, s"$root/hilb", "za", "zb", 8, 4)
    ZOrderStore.ensureZOrdered(grid, s"$root/zord", "za", "zb", 8, 4)
    // dimension history: removal is per SUBJECT (whole timelines)
    Scd2Store.ensureState(events, s"$root/scd2")
    val userDel = events.filter($"user_id" % 5 === 2)
      .select($"user_id")
    Takedown.sweep(spark, docIds = Some(docDel), vecIds = Some(vecDel),
      removedFacts = Some(factDel), fingerprintStores = Seq(s"$root/fp"),
      edgeStores = Seq(s"$root/edges"),
      vectorIndexes = Seq(s"$root/ann"), aggStores = Seq(s"$root/agg"),
      lmStores = Seq(s"$root/lm"),
      tokenizerStores = Seq(s"$root/tok"),
      retrainCorpus = Some(survivors),
      hilbertStores = Seq(s"$root/hilb"),
      zorderStores = Seq(s"$root/zord"),
      scd2Stores = Seq(s"$root/scd2"),
      subjectIds = Some(userDel), takedownTag = Some("spec-1"))
    def noDeleted(df: org.apache.spark.sql.DataFrame,
        c: String, what: String): Unit =
      assert(df.filter(col(c) % 10 === 3).count() === 0L,
        s"deleted id survives in $what.$c")
    noDeleted(FingerprintStore.readBuckets(spark, s"$root/fp"), "id",
      "fp buckets")
    noDeleted(FingerprintStore.readArrays(spark, s"$root/fp"), "id",
      "fp arrays")
    val pairs = EdgeStore.read(spark, s"$root/edges")
    noDeleted(pairs, "id_a", "pairs"); noDeleted(pairs, "id_b", "pairs")
    noDeleted(EdgeStore.readBands(spark, s"$root/edges"), "id", "bands")
    val labels = ClusterStore.readLabels(spark, s"$root/edges")
    noDeleted(labels, "id", "labels")
    noDeleted(labels, "label", "labels") // a removed min must not
    // survive as anyone's label value
    val topk = VectorIndexStore.ivfPqTopKFromIndex(spark, s"$root/ann",
      e.filter($"vec_id" % ExtQueries.QueryMod === 0), e,
      ExtQueries.TopK)
    noDeleted(topk, "match_id", "ann topk")
    // the rollup equals the filtered recompute, row for row
    val got = AggStore.readState(spark, s"$root/agg")
      .withColumn("total", $"total".cast("double"))
      .collect().map(_.toString).sorted.toSeq
    val want = AggStore.partials(
        events.filter($"event_id" % 10 =!= 3))
      .withColumn("total", $"total".cast("double"))
      .collect().map(_.toString).sorted.toSeq
    assert(got === want)
    // the LM retraction equals a retrain over the filtered corpus,
    // row for row (bigrams never span documents — additivity)
    val (wantBig, wantUni) = {
      val m = graft.operators.CorpusStats.bigramModel(survivors)
      (m._1.collect().map(_.toString).sorted.toSeq,
        m._2.collect().map(_.toString).sorted.toSeq)
    }
    def lmState() = (
      LmStore.readBigrams(spark, s"$root/lm")
        .collect().map(_.toString).sorted.toSeq,
      LmStore.readUnigrams(spark, s"$root/lm")
        .collect().map(_.toString).sorted.toSeq)
    assert(lmState() === ((wantBig, wantUni)))
    // the tokenizer takedown is a REBUILD (top-V cuts aren't
    // algebraic): post-sweep merges equal a retrain over the filtered
    // corpus with the store's OWN recipe merges, and the work landed
    // on a promoted-then-dropped branch (main serves it, branch gone)
    val wantMerges = graft.operators.CorpusStats
      .bpeTrainVocab(survivors, 6)._1
      .collect().map(_.toString).sorted.toSeq
    def tokMerges() = TokenizerStore.readMerges(spark, s"$root/tok")
      .collect().map(_.toString).sorted.toSeq
    assert(tokMerges() === wantMerges,
      "swept tokenizer must equal the filtered-corpus retrain")
    assert(TokenizerStore.branches(spark, s"$root/tok").isEmpty,
      "the takedown branch must be promoted and dropped")
    // layout stores: swept rows equal the filtered grid exactly (rows
    // and curve values), no deleted event_id in any serve path
    val gridKeep = grid.filter($"event_id" % 10 =!= 3)
      .select("event_id").as[Long].collect().toSet
    def hilbRows() = HilbertStore.rectScan(spark, s"$root/hilb",
        "za", "zb", 0, 255, 0, 255, 8)
      .select("event_id").as[Long].collect().toSet
    def zordRows() = ZOrderStore.zRangeScan(spark, s"$root/zord",
        "za", "zb", 0, 255, 0, 255, 8)
      .select("event_id").as[Long].collect().toSet
    assert(hilbRows() === gridKeep,
      "swept hilbert layout must equal the filtered grid")
    assert(zordRows() === gridKeep,
      "swept z-order layout must equal the filtered grid")
    // scd2: the removed subjects' timelines are gone WHOLE, and the
    // survivors' history is byte-identical to a recompute over the
    // surviving subjects' events (whole-subject removal commutes with
    // per-subject windowing)
    def scd2Rows() = Scd2Store.readState(spark, s"$root/scd2")
      .collect().map(_.toString).sorted.toSeq
    val scd2Want = Scd2Store
      .compact(events.filter($"user_id" % 5 =!= 2))
      .collect().map(_.toString).sorted.toSeq
    assert(scd2Rows() === scd2Want,
      "swept scd2 history must equal the surviving-subject recompute")
    // TIME TRAVEL: the pre-takedown fingerprint version still pins —
    // "which exact fingerprint state admitted this corpus" survives
    // the takedown until retention GC ages it out
    assert(FingerprintStore
      .readBucketsAt(spark, s"$root/fp", 1L)
      .collect().map(_.toString).sorted.toSeq === preBuckets)
    intercept[IllegalStateException](
      FingerprintStore.readBucketsAt(spark, s"$root/fp", 99L))
    // REPLAY the whole sweep (same tag): anti-joins no-op, the
    // retractions are tag-guarded — state is unchanged
    Takedown.sweep(spark, docIds = Some(docDel), vecIds = Some(vecDel),
      removedFacts = Some(factDel), fingerprintStores = Seq(s"$root/fp"),
      edgeStores = Seq(s"$root/edges"),
      vectorIndexes = Seq(s"$root/ann"), aggStores = Seq(s"$root/agg"),
      lmStores = Seq(s"$root/lm"),
      tokenizerStores = Seq(s"$root/tok"),
      retrainCorpus = Some(survivors),
      hilbertStores = Seq(s"$root/hilb"),
      zorderStores = Seq(s"$root/zord"),
      scd2Stores = Seq(s"$root/scd2"),
      subjectIds = Some(userDel), takedownTag = Some("spec-1"))
    assert(AggStore.readState(spark, s"$root/agg")
      .withColumn("total", $"total".cast("double"))
      .collect().map(_.toString).sorted.toSeq === want,
      "a replayed retraction must not double-subtract")
    assert(lmState() === ((wantBig, wantUni)),
      "a replayed LM retraction must not double-subtract")
    assert(EdgeStore.read(spark, s"$root/edges")
      .collect().map(_.toString).sorted.toSeq
      === pairs.collect().map(_.toString).sorted.toSeq)
    assert(tokMerges() === wantMerges,
      "a replayed tokenizer rebuild is content-idempotent")
    assert(hilbRows() === gridKeep && zordRows() === gridKeep,
      "replayed layout takedowns are idempotent (anti-join form)")
    assert(scd2Rows() === scd2Want,
      "a replayed scd2 takedown is idempotent")
  }

  test("takedown sweep validates EVERY argument before the first " +
      "store commits") {
    import graft.sources.Takedown
    // rollup sweep without the fact VALUES: fails up front, not after
    // a prefix of stores already rewrote
    val badFacts = Seq(1L).toDF("event_id")
    intercept[IllegalArgumentException](Takedown.sweep(spark,
      removedFacts = Some(badFacts), aggStores = Seq("/nonexistent"),
      takedownTag = Some("t")))
    // tokenizer sweep without the surviving corpus: a retrain cannot
    // come from removed ids alone
    intercept[IllegalArgumentException](Takedown.sweep(spark,
      tokenizerStores = Seq("/nonexistent")))
    // tokenizer sweep against a store with no recipe marker: the
    // original hyperparameters are unknown
    intercept[IllegalArgumentException](Takedown.sweep(spark,
      tokenizerStores = Seq("/nonexistent-no-marker"),
      retrainCorpus = Some(Seq((1L, "a b")).toDF("doc_id", "text"))))
    // rollup/LM sweep without a tag: the count retractions would be
    // replay-unsafe
    intercept[IllegalArgumentException](Takedown.sweep(spark,
      removedFacts = Some(badFacts), aggStores = Seq("/nonexistent")))
  }

  test("x_takedown is DETERMINISTIC: a warm repeat and a scratch-root " +
      "rebuild produce identical (rel, col, n_rows, hashx, vmin, " +
      "vmax) rows") {
    import graft.operators.ExtQueries
    // spec-local roots so the drill never touches the shared warm
    // stores other suites read
    val root = java.nio.file.Files
      .createTempDirectory("graft-takedown-det").toString
    val base = ExtQueries.TakedownStoreKeys
      .map(k => k -> s"$root/base-$k").toMap
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.toString).orNull,
          r.getString(4), r.getString(5)))).toMap
    def run(tag: String) = keyed(ExtQueries
      .takedownSummary(spark, sf0001, base, k => s"$root/$tag-$k")
      .collect())
    val first = run("w1")
    val second = run("w2") // warm repeat: bases reused, fresh clones
    // scratch: every base store rebuilt from the inputs at a new root
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-takedown-det2").toString
    val scratch = keyed(ExtQueries.takedownSummary(spark, sf0001,
        base.map { case (k, _) => k -> s"$root2/base-$k" },
        k => s"$root2/work-$k")
      .collect())
    // diff per relation so a red NAMES the store that moved
    assert(first.keySet === second.keySet)
    assert(first.keySet === scratch.keySet)
    first.keySet.toSeq.sorted.foreach { rel =>
      assert(first(rel) === second(rel),
        s"warm repeat moved relation '$rel': " +
          s"${first(rel)} -> ${second(rel)}")
      assert(first(rel) === scratch(rel),
        s"scratch rebuild moved relation '$rel': " +
          s"${first(rel)} -> ${scratch(rel)}")
    }
  }

  test("retention closure: after takedown + retention expiry the " +
      "pre-takedown pin FAILS and its bytes are gone from history") {
    import graft.sources.FingerprintStore
    val docs = Tables.documents(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-retention-close").toString
    FingerprintStore.writeFingerprints(docs, path)
    // a branch makes the sweep multi-lineage — expiry must close BOTH
    FingerprintStore.createBranch(spark, path, "exp")
    val preSegs = new java.io.File(s"$path/seg").listFiles()
      .map(_.getAbsolutePath).toSet
    assert(preSegs.nonEmpty)
    FingerprintStore.takedown(spark, path,
      docs.filter($"doc_id" % 10 === 3))
    // pre-expiry: the takedown rewrote serve paths, but version 1 (the
    // pre-takedown state) is still pinned-readable — retention policy,
    // not the sweep, governs history
    assert(FingerprintStore.readBucketsAt(spark, path, 1L)
      .filter($"id" % 10 === 3).count() > 0L,
      "grace window must keep the pre-takedown version readable")
    FingerprintStore.expireRetention(spark, path, grace = 0)
    // the pin now fails LOUDLY — removed from history, not just from
    // serving...
    intercept[IllegalStateException](
      FingerprintStore.readBucketsAt(spark, path, 1L))
    // ...and the pre-takedown segments are physically deleted on every
    // lineage (the removed docs' fingerprints have no surviving bytes)
    preSegs.foreach(d => assert(!new java.io.File(d).exists,
      s"pre-takedown segment survived retention expiry: $d"))
    // both lineages still serve, without the removed ids
    Seq(None, Some("exp")).foreach { b =>
      val served = FingerprintStore.readBuckets(spark, path, b)
      assert(served.count() > 0L)
      assert(served.filter($"id" % 10 === 3).count() === 0L)
    }
  }

  test("StoreClone under a concurrent writer: every clone is a " +
      "committed consistent state, never a torn copy") {
    import graft.sources.{FingerprintStore, StoreClone}
    val docs = Tables.documents(spark, sf0001)
    val root = java.nio.file.Files
      .createTempDirectory("graft-clone-race").toString
    val src = s"$root/src"
    FingerprintStore.writeFingerprints(
      docs.filter($"doc_id" % 4 === 0), src)
    // writer thread: three more batch admissions while clones run —
    // retried on contention, since the locked append fails fast when
    // a clone holds the root lock (loud beats racing is the store
    // contract; the retry IS the documented serialization)
    val writer = new Thread(() => (1 to 3).foreach { i =>
      var done = false
      while (!done) {
        try {
          FingerprintStore.appendBatch(spark, src,
            docs.filter($"doc_id" % 4 === i))
          done = true
        } catch {
          case e: IllegalStateException
              if e.getMessage.contains("concurrent writer") =>
            Thread.sleep(50L)
        }
      }
    })
    writer.start()
    try {
      (1 to 3).foreach { i =>
        val dst = s"$root/clone-$i"
        StoreClone.cloneStore(spark, src, dst)
        // a committed fp manifest always carries bucket and array
        // segments of the SAME batches: the id sets must match — a
        // torn copy (buckets without arrays) breaks this
        val b = FingerprintStore.readBuckets(spark, dst)
          .select($"id").distinct().collect().map(_.getLong(0)).toSet
        val a = FingerprintStore.readArrays(spark, dst)
          .select($"id").distinct().collect().map(_.getLong(0)).toSet
        assert(b === a,
          s"clone $i tore: banded ids without verify arrays (or vice " +
            s"versa); diff=${(b diff a) ++ (a diff b)}")
      }
    } finally writer.join()
    // and the final source state is intact: all four batches admitted
    writer.join()
    assert(FingerprintStore.readBuckets(spark, src)
      .select($"id").distinct().count() === docs.count())
  }

  test("takedown label repair SPLITS components and equals the " +
      "from-scratch rebuild") {
    import graft.sources._
    // path graph 1-2-3-4-5: one component labeled 1. Removing the
    // bridge vertex 3 splits it into {1,2} and {4,5} — and 4/5's
    // label must INCREASE from 1 to 4, which the append-only
    // min-resolution could never express (why takedown REPLACES).
    val path = java.nio.file.Files
      .createTempDirectory("graft-takedown-split").toString
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (3L, 4L, 0.9),
      (4L, 5L, 0.9), (10L, 11L, 0.8))
      .toDF("id_a", "id_b", "cos")
    val bands = Seq((1L, 0, 1L), (2L, 0, 1L), (3L, 0, 1L),
      (4L, 0, 1L), (5L, 0, 1L), (10L, 0, 2L), (11L, 0, 2L))
      .toDF("id", "band", "bkey")
    EdgeStore.writePairs(pairs, bands, path)
    ClusterStore.ensureLabels(spark, path)
    val del = Seq(3L).toDF("vec_id")
    EdgeStore.takedown(spark, path, del)
    val got = ClusterStore.readLabels(spark, path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      10L -> 10L, 11L -> 10L),
      "split components must relabel; untouched ones carry over")
    // the repaired table is exactly the from-scratch rebuild of the
    // surviving pairs (labels stay fresh — sig matches the new segs)
    val surviving = EdgeStore.read(spark, path)
    assert(surviving.count() === 3L) // (1,2), (4,5), (10,11)
    // deleting the MIN of a component: labels increase again
    EdgeStore.takedown(spark, path, Seq(1L).toDF("vec_id"))
    val got2 = ClusterStore.readLabels(spark, path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(got2 === Map(4L -> 4L, 5L -> 4L, 10L -> 10L, 11L -> 10L),
      "vertex 2 lost its last pair and must drop to singleton serving")
  }

  test("optimistic lineage writers: concurrent main- and branch-append " +
      "both land; a same-lineage stale claim loses loudly") {
    import graft.sources.{Branches, FingerprintStore, ManifestDir,
      SnapshotDir}
    val docs = Tables.documents(spark, sf0001)
    // the two batches must be DISJOINT from the base corpus (and each
    // other) for the isolation asserts to mean anything
    val corpus = docs.filter($"doc_id" % 10 =!= 0 &&
      $"doc_id" % 10 =!= 7)
    val mainBatch = docs.filter($"doc_id" % 10 === 0)
    val branchBatch = docs.filter($"doc_id" % 10 === 7)
    val path = java.nio.file.Files
      .createTempDirectory("graft-fp-optim").toString
    FingerprintStore.writeFingerprints(corpus, path)
    FingerprintStore.createBranch(spark, path, "exp")
    def ids(b: Option[String]) = FingerprintStore
      .readBuckets(spark, path, b).select($"id").distinct()
      .collect().map(_.getLong(0)).toSet
    val base = ids(None)
    // two writers, DIFFERENT lineages, racing through one root: the
    // segment writes overlap freely; only the commit windows
    // serialize on the (briefly held, polled-out) root lock
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val gate = new java.util.concurrent.CountDownLatch(1)
    def writer(body: => Unit) = new Thread(() => {
      gate.await()
      try body catch { case t: Throwable => errs.add(t) }
    })
    val t1 = writer(FingerprintStore.appendBatchOptimistic(spark, path,
      mainBatch))
    val t2 = writer(FingerprintStore.appendBatchOptimistic(spark, path,
      branchBatch, branch = Some("exp")))
    t1.start(); t2.start(); gate.countDown()
    t1.join(300000); t2.join(300000)
    assert(errs.isEmpty, s"concurrent cross-lineage appends must both " +
      s"land, got: ${Option(errs.peek()).map(_.toString)}")
    val mainIds = ids(None)
    val expIds = ids(Some("exp"))
    val mainBatchIds = mainBatch.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    val branchBatchIds = branchBatch.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    // shingle-less docs band nothing; both lineages must hold exactly
    // base + their OWN batch's banded ids and none of the other's
    assert(mainIds.intersect(branchBatchIds).isEmpty)
    assert(expIds.intersect(mainBatchIds).isEmpty)
    assert((mainIds -- base).subsetOf(mainBatchIds) &&
      (mainIds -- base).nonEmpty)
    assert((expIds -- base).subsetOf(branchBatchIds) &&
      (expIds -- base).nonEmpty)
    // AGE-GUARDED vacuum: a young unreferenced segment (what an
    // in-flight optimistic writer's half looks like) must be SPARED
    // by a windowed sweep and swept by the strict one — the sweep
    // shape that may be scheduled while optimistic writers run
    val orphan = java.nio.file.Paths.get(path, "seg",
      "inflight-uid", "buckets")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-0.parquet"),
      Array[Byte](1, 2, 3))
    assert(Branches.vacuum(spark, path, "fp-",
      minAgeMs = 60L * 60 * 1000) === 0L,
      "a windowed vacuum must presume young orphans in-flight")
    assert(java.nio.file.Files.exists(orphan))
    assert(Branches.vacuum(spark, path, "fp-") === 1L,
      "the strict vacuum sweeps the same orphan")
    assert(!java.nio.file.Files.exists(orphan))
    // SAME-lineage conflict: a claim captured before another commit
    // is stale — the window must refuse loudly, never last-write-win
    val stale = SnapshotDir.versions(spark, path, "fp-")
      .filter(_._2).map(_._1).max
    FingerprintStore.appendBatch(spark, path,
      docs.filter($"doc_id" % 10 === 4)) // advances main
    val ex = intercept[java.util.ConcurrentModificationException](
      Branches.commitWindow(spark, path, "fp-", stale)(m =>
        ManifestDir.commit(spark, path, "fp-", m)))
    assert(ex.getMessage.contains("stale"))
  }

  test("fingerprint compact folds appends, serving unchanged, GC bounded") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-fp-compact").toString
    graft.sources.FingerprintStore.writeFingerprints(corpus, path)
    graft.sources.FingerprintStore.appendBatch(spark, path,
      batch.limit(20))
    def serve() = graft.sources.FingerprintStore
      .dedupBatchAgainst(spark, path, batch, 0.1)
      .collect().map(_.toString).sorted
    val before = serve()
    val preVersion = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("fp-"))
      .map(_.getName).max
    graft.sources.FingerprintStore.compact(spark, path)
    assert(serve().sameElements(before),
      "compaction must not change dedup verdicts")
    // previous version survives as the in-flight-reader grace window
    assert(new java.io.File(s"$path/$preVersion").exists)
    graft.sources.FingerprintStore.compact(spark, path)
    assert(!new java.io.File(s"$path/$preVersion").exists,
      "GC keeps exactly one previous committed version")
    assert(serve().sameElements(before))
  }

  test("shuffle-mode batch admission equals the broadcast path") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-fp-shuffle").toString
    graft.sources.FingerprintStore.writeFingerprints(corpus, path)
    val viaBroadcast = graft.sources.FingerprintStore
      .dedupBatchAgainst(spark, path, batch, 0.1)
      .collect().map(_.toString).sorted
    val viaShuffle = graft.sources.FingerprintStore
      .dedupBatchAgainst(spark, path, batch, 0.1,
        broadcastBatch = false)
      .collect().map(_.toString).sorted
    assert(viaBroadcast.sameElements(viaShuffle))
  }

  test("uncommitted fingerprint versions are invisible crash debris") {
    val corpus = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 10 =!= 0)
    val batch = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 10 === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-fp-crash").toString
    graft.sources.FingerprintStore.writeFingerprints(corpus, path)
    val before = graft.sources.FingerprintStore
      .dedupBatchAgainst(spark, path, batch, 0.1)
      .collect().map(_.toString).sorted
    // a writer that crashed mid-rewrite: higher-numbered dir, junk
    // content, NO commit marker — readers must keep resolving v1
    val debris = new java.io.File(path, "fp-00000002")
    debris.mkdirs()
    java.nio.file.Files.write(
      debris.toPath.resolve("part-junk.parquet"),
      Array.fill[Byte](16)(0x7f))
    val after = graft.sources.FingerprintStore
      .dedupBatchAgainst(spark, path, batch, 0.1)
      .collect().map(_.toString).sorted
    assert(after.sameElements(before),
      "an uncommitted version must never be read")
    // the next real compaction commits v3 and sweeps the debris
    graft.sources.FingerprintStore.compact(spark, path)
    graft.sources.FingerprintStore.compact(spark, path)
    assert(!debris.exists, "GC must sweep crash debris")
  }

  test("fingerprint admission is atomic: orphan segments are invisible " +
      "and swept; verdicts never see a half-admitted batch") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-fp-atomic").toString
    graft.sources.FingerprintStore.writeFingerprints(corpus, path)
    def serve() = graft.sources.FingerprintStore
      .dedupBatchAgainst(spark, path, batch, 0.1)
      .collect().map(_.toString).sorted.toSeq
    val before = serve()
    // THE CRASH DRILL: a writer dies after its segment writes but
    // before the manifest commit — under the v1 layout this was the
    // banded-but-unverifiable window (buckets visible, arrays
    // missing → candidate pairs silently dropped at the Jaccard
    // join); under manifests the orphans are invisible
    val segId = graft.sources.ManifestDir.newSegmentId()
    val m = graft.sources.ManifestDir.current(spark, path, "fp-").get
    val storedBuckets = spark.read.parquet(
      graft.sources.ManifestDir
        .relationDirs(path, m, "buckets").head)
    storedBuckets.limit(5)
      .withColumn("id", $"id" + 1000000L)
      .write.parquet(s"$path/seg/$segId/buckets")
    assert(serve() === before, "orphan segments must never be read")
    // compact's vacuum sweeps exactly the orphan; verdicts unchanged
    graft.sources.FingerprintStore.compact(spark, path)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "seg", segId)),
      "vacuum must sweep the crashed admit's segments")
    assert(serve() === before)
  }

  test("empty benchmark builds an empty bloom filter, flags nothing") {
    val clean = Seq((1L, "five words of clean text here")).toDF(
      "doc_id", "text")
    val bloom = Contamination.benchmarkNgramBloom(
      clean.filter($"doc_id" < 0), n = 5)
    val flagged = clean.select(
      Contamination.bloomContaminated(bloom, $"text", 5).as("hit"))
    assert(flagged.filter($"hit").count() === 0)
  }

  test("ensureFingerprints builds once per recipe, rebuilds on change") {
    val corpus = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 10 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-fp-ensure").toString
    assert(graft.sources.FingerprintStore
      .ensureFingerprints(corpus, path).isDefined, "cold build")
    assert(graft.sources.FingerprintStore
      .ensureFingerprints(corpus, path).isEmpty, "warm skip")
    assert(graft.sources.FingerprintStore
      .ensureFingerprints(corpus, path, n = 4).isDefined,
      "recipe change rebuilds")
  }

  test("span scrub drops only aligned hot spans, reassembles in order") {
    val boiler = "terms and conditions"
    val base = (0 until 6).map(i =>
      (i.toLong, s"$boiler tail$i alpha beta"))
    val extra = Seq(
      (6L, boiler), // all-boilerplate → scrubbed to empty
      (7L, "totally unique words here plus tail"), // untouched, ragged tail
      (8L, ""), // empty input
      // contains the hot WORDS but not boundary-aligned → kept
      (9L, s"prefix $boiler suffix wordx wordy"))
    val df = (base ++ extra).toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedSpans(df, width = 3, maxDf = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[String]("clean_text") === "tail0 alpha beta")
    assert(out(0L).getAs[Long]("n_spans") === 2L)
    assert(out(0L).getAs[Long]("n_removed") === 1L)
    assert(out(6L).getAs[String]("clean_text") === "")
    assert(out(6L).getAs[Long]("n_removed") === 1L)
    assert(out(7L).getAs[String]("clean_text") ===
      "totally unique words here plus tail")
    assert(out(7L).getAs[Long]("n_spans") === 2L,
      "ragged tail span must be kept as its own span")
    assert(out(8L).getAs[Long]("n_spans") === 0L)
    assert(out(8L).getAs[String]("clean_text") === "")
    assert(out(9L).getAs[String]("clean_text") ===
      s"prefix $boiler suffix wordx wordy",
      "unaligned occurrences are different spans and survive")
    // sub-width remainders are NEVER candidates: 6 docs share a 1-word
    // ragged tail, which must survive (common short runs are language,
    // not boilerplate)
    val tails = (20L to 25L).map(i => (i, s"uniq$i word$i also$i tail"))
      .toDF("doc_id", "text")
    val t = Dedup.scrubRepeatedSpans(tails, width = 3, maxDf = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(t(20L).getAs[String]("clean_text") ===
      "uniq20 word20 also20 tail")
    assert(t(20L).getAs[Long]("n_removed") === 0L)
  }

  test("phased span scrub catches a boundary-straddling repeat") {
    // "P Q R" starts at word 2: pass 1's width-3 grid cuts it across
    // [a? P Q][R x? y?] — each cut span is doc-unique, so the single
    // pass keeps everything. Pass 2's offset-1 grid segments as
    // [a?][P Q R][x? y?]: the straddler is now aligned and hot.
    val df = Seq(
      (1L, "a1 P Q R x1 y1"),
      (2L, "a2 P Q R x2 y2"),
      (3L, "u1 u2 u3")) // control: untouched by both passes
      .toDF("doc_id", "text")
    val single = Dedup.scrubRepeatedSpans(df, width = 3, maxDf = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(single(1L).getAs[String]("clean_text") === "a1 P Q R x1 y1",
      "the aligned single pass must MISS the straddling repeat")
    assert(single(1L).getAs[Long]("n_removed") === 0L)
    val phased = Dedup.scrubRepeatedSpansPhased(df, width = 3, maxDf = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(phased(1L).getAs[String]("clean_text") === "a1 x1 y1")
    assert(phased(1L).getAs[Long]("n_removed_p1") === 0L)
    assert(phased(1L).getAs[Long]("n_removed_p2") === 1L)
    assert(phased(2L).getAs[String]("clean_text") === "a2 x2 y2")
    assert(phased(3L).getAs[String]("clean_text") === "u1 u2 u3")
    assert(phased(3L).getAs[Long]("n_removed_p2") === 0L)
    // pass-1 behavior is untouched inside the phased composition:
    // grid-ALIGNED repeats still go in pass 1
    val aligned = (10L to 15L).map(i => (i, s"P Q R tail$i more$i"))
      .toDF("doc_id", "text")
    val ph2 = Dedup.scrubRepeatedSpansPhased(aligned, width = 3,
        maxDf = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(ph2(10L).getAs[String]("clean_text") === "tail10 more10")
    assert(ph2(10L).getAs[Long]("n_removed_p1") === 1L)
    // pass 2's 1-word offset HEAD is not a candidate: every document
    // contributes its first word as a head span, so a shared leading
    // word must survive instead of being scrubbed corpus-wide
    val heads = (30L to 36L).map(i => (i, s"the uniq$i tok$i plus$i"))
      .toDF("doc_id", "text")
    val ph3 = Dedup.scrubRepeatedSpansPhased(heads, width = 3,
        maxDf = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(ph3(30L).getAs[String]("clean_text") ===
      "the uniq30 tok30 plus30",
      "a shared leading word is language, not boilerplate")
    assert(ph3(30L).getAs[Long]("n_removed_p2") === 0L)
  }

  test("exact substring dedup: finds the off-grid repeat both scrub " +
      "phases miss; merges maximal spans; counts self-repeats") {
    // "P Q R" starts at word 2 ≡ 2 (mod 3): pass 1's width-3 grid cuts
    // [z? f? P][Q R t?] and pass 2's offset-1 grid cuts [z?][f? P Q]
    // [R t? …] — NO phase of the w/2 composition isolates the repeat,
    // so the phased scrub provably keeps it. The exact operator keys
    // every window and cannot be phase-blinded.
    val df = Seq(
      (1L, "z1 f1 P Q R t1"),
      (2L, "z2 f2 P Q R t2"),
      (3L, "c1 c2 c3 c4 c5 c6")) // control: no duplicated gram
      .toDF("doc_id", "text")
    val phased = Dedup.scrubRepeatedSpansPhased(df, width = 3,
        maxDf = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(phased(1L).getAs[String]("clean_text") === "z1 f1 P Q R t1",
      "the two-phase grid must MISS the off-grid repeat")
    assert(phased(1L).getAs[Long]("n_removed_p1") === 0L)
    assert(phased(1L).getAs[Long]("n_removed_p2") === 0L)
    val spans = Dedup.duplicatedSubstrings(df, width = 3, minCount = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_pos"),
        r.getAs[Long]("end_pos"), r.getAs[Long]("span_len"),
        r.getAs[Long]("n_dup_starts"))).toSet
    assert(spans === Set((1L, 2L, 5L, 3L, 1L), (2L, 2L, 5L, 3L, 1L)),
      "the exact operator must flag exactly the off-grid repeat")
    // maximal merge: a shared 5-token run yields ONE island from its
    // three overlapping width-3 starts (2,3,4), not three spans
    val long = Seq(
      (10L, "h1 h2 A B C D E w1"),
      (11L, "k1 k2 A B C D E m1 m2")).toDF("doc_id", "text")
    val merged = Dedup.duplicatedSubstrings(long, width = 3,
        minCount = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_pos"),
        r.getAs[Long]("end_pos"), r.getAs[Long]("n_dup_starts"))).toSet
    assert(merged === Set((10L, 2L, 7L, 3L), (11L, 2L, 7L, 3L)))
    // a WITHIN-doc repeat is duplication too (Lee et al. count any
    // second occurrence): both occurrences in the single doc flag
    val selfRep = Seq((20L, "S T U g1 g2 S T U"),
      (21L, "n1 n2 n3 n4")).toDF("doc_id", "text")
    val self = Dedup.duplicatedSubstrings(selfRep, width = 3,
        minCount = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_pos"),
        r.getAs[Long]("end_pos"))).toSet
    assert(self === Set((20L, 0L, 3L), (20L, 5L, 8L)))
    // short and empty docs emit nothing and crash nothing
    val edge = Seq((30L, "one two"), (31L, "")).toDF("doc_id", "text")
    assert(Dedup.duplicatedSubstrings(edge, width = 3,
      minCount = 2).isEmpty)
    // the APPLY form drops exactly the covered tokens and reassembles
    // in order; untouched and empty docs still emit rows
    val scrubbed = Dedup.scrubDuplicatedSubstrings(
        df.unionByName(Seq((4L, "")).toDF("doc_id", "text")),
        width = 3, minCount = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_removed"))).toMap
    assert(scrubbed(1L) === (("z1 f1 t1", 6L, 3L)))
    assert(scrubbed(2L) === (("z2 f2 t2", 6L, 3L)))
    assert(scrubbed(3L) === (("c1 c2 c3 c4 c5 c6", 6L, 0L)))
    assert(scrubbed(4L) === (("", 0L, 0L)))
  }

  test("jsonl reader: lossless round-trip, quarantine catches both kinds") {
    val docs = Tables.documents(spark, sf0001)
    val root = java.nio.file.Files
      .createTempDirectory("graft-jsonl").toString
    graft.sources.JsonlCorpus.write(docs, s"$root/data")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/data/bad.json"),
      ("{{{ broken\n" +
        """{"text": "no id here", "lang": "en"}""" + "\n").getBytes("UTF-8"))
    val (clean, quarantine) = graft.sources.JsonlCorpus
      .read(spark, s"$root/data")
    // clean is exactly the original table (schema'd read, text intact)
    assert(clean.count() === docs.count())
    assert(clean.exceptAll(docs.select(clean.columns.map(col): _*))
      .count() === 0)
    // one malformed + one contract-violating line, reasons distinct
    val q = quarantine.collect()
    assert(q.length === 2)
    assert(q.map(_.getAs[String]("motivo_rechazo")).sorted.toSeq ===
      Seq("malformed json", "missing doc_id"))
    assert(q.exists(_.getAs[String]("raw_line").contains("broken")))
    assert(q.exists(_.getAs[String]("raw_line").contains("no id here")))
  }

  test("sketch states survive parquet and merge losslessly") {
    val docs = Tables.documents(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft-sketch-state").toString + "/states"
    // persist per-part states as an incremental pipeline would (one
    // write per ingested batch), then reload and merge at read time
    CorpusStats.sketchState(docs, pmod($"doc_id", lit(3)))
      .write.parquet(path)
    val reloaded = CorpusStats
      .mergeSketchStates(spark.read.parquet(path))
      .select($"source",
        hll_sketch_estimate($"sketch").as("est"), $"n_docs")
    val whole = docs
      .select($"source", md5(lower(trim($"text"))).as("fp"))
      .groupBy($"source")
      .agg(hll_sketch_estimate(hll_sketch_agg($"fp")).as("est_w"),
        count(lit(1)).as("n_w"))
    val j = reloaded.join(whole, Seq("source"))
    assert(j.filter($"est" =!= $"est_w" || $"n_docs" =!= $"n_w")
      .count() === 0,
      "reloaded merged estimate must equal the whole-corpus sketch")
    // the audit query's contract holds on real data
    val audit = CorpusStats.sketchMergeProfile(docs, parts = 4)
    assert(audit.filter(!$"merge_lossless" || !$"within_bound")
      .count() === 0)
    assert(audit.count() > 0)
  }

  test("lloyd refinement: unit centroids, objective never degrades") {
    val e = Tables.embeddings(spark, sf0001)
    def meanBestCos(cents: org.apache.spark.sql.DataFrame): Double =
      e.select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .crossJoin(broadcast(cents))
        .select($"vec_id",
          Similarity.cosine($"v", $"centv").as("c"))
        .groupBy($"vec_id").agg(max($"c").as("best"))
        .agg(avg($"best")).head().getDouble(0)
    val seeds = e.filter($"vec_id" % 37 === 0)
      .select($"vec_id".as("cent_id"),
        $"embedding".cast("array<double>").as("centv"))
    val refined = Similarity.lloydRefineCentroids(e, 37, iters = 2).cache()
    // refined centroids are round-6 unit vectors: check the SQUARED
    // NORM against 1 (self-cosine is identically 1 for any non-zero
    // vector — the original assertion here was vacuous and passed even
    // with the normalizer removed); round-6 components put the norm
    // within ~4e-6 of 1, never further
    val norms = refined.select(
        abs(graft.plans.VectorExpressions
          .dotProduct($"centv", $"centv") - 1.0).as("d"))
      .agg(max($"d")).head().getDouble(0)
    assert(norms < 1e-5, s"centroid squared norm off 1 by $norms")
    // spherical Lloyd improves (or preserves) mean best-centroid cosine
    val before = meanBestCos(seeds)
    val after = meanBestCos(refined)
    assert(after >= before - 1e-6,
      s"objective degraded: $before -> $after")
    // determinism: a second training run is bit-identical
    val again = Similarity.lloydRefineCentroids(e, 37, iters = 2)
    assert(refined.exceptAll(again).count() === 0)
    refined.unpersist()
  }

  test("diversity sample caps per cluster and spreads across clusters") {
    val e = Tables.embeddings(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val cents = Similarity.lloydRefineCentroids(e, 37, iters = 2)
    val out = Similarity
      .diversitySample(docs, e, cents, perCluster = 3).cache()
    val perCluster = out.groupBy($"cent_id").agg(count(lit(1)).as("n"))
    assert(perCluster.filter($"n" > 3).count() === 0)
    val nClusters = perCluster.count()
    assert(nClusters > 5, s"need real cluster spread, got $nClusters")
    // balanced selection touches more clusters than the same-size
    // global quality cut — the point of the operator
    val k = out.count().toInt
    val globalTop = docs
      .select($"doc_id",
        graft.operators.TextAnalysis.qualityScore($"text").as("s"))
      .orderBy($"s".desc, $"doc_id").limit(k)
    val globalClusters = globalTop
      .join(Similarity.assignToCentroids(e, cents)
        .withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .select($"cent_id").distinct().count()
    assert(nClusters >= globalClusters,
      s"balanced=$nClusters clusters vs global=$globalClusters")
    out.unpersist()
  }

  test("shard order is a deterministic permutation with contiguous ranks") {
    val docs = Tables.documents(spark, sf0001)
    val out = CorpusStats.shardOrder(docs, 8).cache()
    assert(out.count() === docs.count())
    assert(out.filter($"shard" < 0 || $"shard" >= 8).count() === 0)
    // (shard, pos) is a key: every doc gets a unique slot
    assert(out.select($"shard", $"pos").distinct().count() === out.count())
    // ranks are contiguous from 1 per shard
    val byShard = out.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("lo"), max($"pos").as("hi"))
      .collect()
    assert(byShard.forall(r => r.getAs[Int]("lo") === 1 &&
      r.getAs[Int]("hi").toLong === r.getAs[Long]("n")))
    // independent of the split-assign hash: seeds differ
    val again = CorpusStats.shardOrder(docs, 8)
    assert(out.exceptAll(again).count() === 0)
    out.unpersist()
  }

  // ---- bloom decontamination -----------------------------------------

  test("bloom decontamination never misses an exactly-contaminated doc") {
    val docs = Tables.documents(spark, sf0001)
    val out = Contamination.bloomDecontamSelfCheck(
      docs.filter($"doc_id" % 50 =!= 0),
      docs.filter($"doc_id" % 50 === 0), n = 5)
    assert(out.filter(!$"no_false_negative").count() === 0)
    assert(out.filter($"contaminated").count() > 0,
      "fixture needs real contamination to make the check non-vacuous")
  }

  test("bloom per-shingle false-positive rate stays near the configured fpp") {
    // one 5-gram per doc so the doc-level flag IS the shingle-level
    // probe; 4000 clean probes against a 500-shingle benchmark
    val words = (0 until 9).map(i => s"w$i")
    def gram(tag: String, i: Int) =
      s"$tag$i ${words(i % 9)} x${i % 31} y${i % 17} z${i % 13}"
    val bench = (0 until 500).map(i => (i.toLong, gram("bench", i)))
      .toDF("doc_id", "text")
    val clean = (0 until 4000).map(i => (i.toLong, gram("clean", i)))
      .toDF("doc_id", "text")
    val bloom = Contamination.benchmarkNgramBloom(bench, n = 5,
      expectedItems = 500, fpp = 0.01)
    val flagged = clean.select(
        Contamination.bloomContaminated(bloom, $"text", 5).as("hit"))
      .filter($"hit").count()
    // E[flagged] = 40 at fpp=0.01; 3x covers sampling noise without
    // masking a broken filter (a degenerate all-set filter flags 4000)
    assert(flagged <= 120, s"observed FP count $flagged of 4000")
    // determinism: bloom merge is bitwise OR — rebuild is bit-identical
    val again = Contamination.benchmarkNgramBloom(bench, n = 5,
      expectedItems = 500, fpp = 0.01)
    assert(java.util.Arrays.equals(bloom, again))
  }

  test("heavy hitters: sketch contract holds under purge pressure and any partitioning") {
    // 3 true heavy tokens over a 600-token distinct tail with a small
    // 64-counter sketch, so purges actually fire (600 >> 64) and the
    // error bounds are live, not vacuous
    val rows = (0 until 200).map { i =>
      (i.toLong, s"alpha beta gamma tail${3 * i} tail${3 * i + 1} tail${3 * i + 2}")
    }
    val df = rows.toDF("doc_id", "text")
    for (parts <- Seq(1, 7)) {
      val got = CorpusStats.heavyHittersValidated(df.repartition(parts),
          maxMapSize = 64, phi = 8)
        .collect().map(r => r.getAs[String]("item") -> r).toMap
      // n = 1200, threshold n/8 = 150 < 200 = each heavy count;
      // tail tokens have count 1 each
      assert(got.keySet === Set("alpha", "beta", "gamma"))
      got.values.foreach { r =>
        assert(r.getAs[Long]("exact_cnt") === 200L)
        assert(r.getAs[Long]("n_tokens") === 1200L)
        assert(r.getAs[Boolean]("reported"), s"${r} not reported")
        assert(r.getAs[Boolean]("bounds_hold"), s"${r} bounds failed")
      }
    }
  }

  test("heavy hitters: corpus run is green and exact side matches brute force") {
    val d = graft.Tables.documents(spark, sf0001)
    val got = CorpusStats.heavyHittersValidated(d).collect()
    assert(got.nonEmpty, "no token above n/64 in the corpus fixture")
    got.foreach { r =>
      assert(r.getAs[Boolean]("reported"))
      assert(r.getAs[Boolean]("bounds_hold"))
    }
    val brute = d.select(explode(TextAnalysis.words($"text")).as("t"))
      .filter($"t" =!= "").groupBy($"t").count()
      .as[(String, Long)].collect().toMap
    val n = brute.values.sum
    val expectHeavy = brute.filter { case (_, c) => c * 64 > n }.keySet
    assert(got.map(_.getAs[String]("item")).toSet === expectHeavy)
  }

  test("heavy hitters sketch branch: no token-level explode, object-hash aggregated") {
    val d = graft.Tables.documents(spark, sf0001)
    // the raw aggregate (before the one-row candidate explode): the
    // sketch consumes the per-doc token ARRAY inside the aggregate, so
    // the only rows crossing the exchange are partition sketches
    val plan = d.select(graft.plans.SketchFunctions
        .freqItemsAgg(TextAnalysis.words($"text"), 1024).as("cand"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("Generate"),
      s"token-level explode leaked into the sketch branch:\n$plan")
  }

  test("grouped heavy hitters: per-source thresholds and contracts, distinct per group") {
    // source A: "alpha" heavy only there; source B: "beta" heavy only
    // there; a shared tail keeps both groups above trivial vocab size
    val rows =
      (0 until 100).map(i => (i.toLong, "A", s"alpha tailA$i x$i")) ++
      (0 until 100).map(i => (500L + i, "B", s"beta tailB$i y$i"))
    val df = rows.toDF("doc_id", "source", "text")
    val got = CorpusStats.heavyHittersBySourceValidated(df,
        maxMapSize = 64, phi = 8)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("item")) -> r)
      .toMap
    assert(got.keySet === Set(("A", "alpha"), ("B", "beta")),
      s"got ${got.keySet}")
    got.values.foreach { r =>
      assert(r.getAs[Long]("exact_cnt") === 100L)
      assert(r.getAs[Long]("n_tokens") === 300L)
      assert(r.getAs[Boolean]("reported"))
      assert(r.getAs[Boolean]("bounds_hold"))
    }
  }

  test("bigram xent: flags improbable token order that unigram xent cannot see") {
    // 30 docs in natural order + 1 shuffled doc with the SAME bag of
    // words: unigram stats identical, bigram stats should separate them
    val natural = (0 until 30).map(i =>
      (i.toLong, "the cat sat on the mat"))
    val shuffled = Seq((99L, "mat the on sat cat the"))
    val df = (natural ++ shuffled).toDF("doc_id", "text")
    val x2 = CorpusStats.bigramLogProb(df)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val x1 = CorpusStats.unigramLogProb(df)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("xent")).toMap
    assert(x2(99L) > x2(0L) + 1.0,
      s"shuffled doc not flagged: ${x2(99L)} vs ${x2(0L)}")
    assert(math.abs(x1(99L) - x1(0L)) < 1e-9,
      "unigram xent should NOT separate same-bag docs")
  }

  test("freq-sketch states survive parquet and the merged contract holds under purges") {
    // same purge-pressure corpus as the direct sketch test, but split
    // into 5 batch states, written to parquet, reloaded, and merged —
    // the incremental path must honor the same contract
    val rows = (0 until 200).map { i =>
      (i.toLong, s"alpha beta gamma tail${3 * i} tail${3 * i + 1} tail${3 * i + 2}")
    }
    val df = rows.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-freq-state").toString + "/states"
    CorpusStats.freqState(df, pmod($"doc_id", lit(5)), maxMapSize = 64)
      .write.mode("overwrite").parquet(dir)
    val states = spark.read.parquet(dir)
    assert(states.count() === 5)
    val merged = CorpusStats.mergeFreqStates(states, maxMapSize = 64)
    assert(merged.select($"n_tokens").as[Long].head() === 1200L)
    val cand = merged.select(explode($"cand").as("c"))
      .select($"c.item".as("item"), $"c.est".as("est"),
        $"c.lb".as("lb"), $"c.ub".as("ub"))
      .collect().map(r => r.getAs[String]("item") -> r).toMap
    // every true heavy item (200 each, > merged error line) is present
    // with valid bounds
    Seq("alpha", "beta", "gamma").foreach { t =>
      val r = cand.getOrElse(t, fail(s"merged sketch lost heavy item $t"))
      assert(r.getAs[Long]("lb") <= 200L && 200L <= r.getAs[Long]("ub"),
        s"$t bounds [${r.getAs[Long]("lb")}, ${r.getAs[Long]("ub")}]")
    }
    // and the full audit form is green end-to-end
    val audit = CorpusStats.freqMergeValidated(df, parts = 5,
      maxMapSize = 64, phi = 8).collect()
    assert(audit.map(_.getAs[String]("item")).toSet ===
      Set("alpha", "beta", "gamma"))
    audit.foreach { r =>
      assert(r.getAs[Boolean]("reported") && r.getAs[Boolean]("bounds_hold"))
    }
  }

  test("tsv corpus: nasty text round-trips losslessly, both quarantine kinds fire") {
    val nasty = Seq(
      (1L, "plain text", "en", "web", 10L),
      (2L, "tab\there and\nnewline and\rcr", "en", "web", 26L),
      (3L, "literal backslash \\ and \\t sequence and \\\\n", "en",
        "web", 43L),
      (4L, "", "en", "web", 0L),
      (5L, "\"starts with a quote\tand has tabs\" inside", "en",
        "web", 41L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tsv-spec").toString + "/data"
    graft.sources.TsvCorpus.write(
      nasty.toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.tsv"),
      "xyz\tgarbage id\ten\tweb\t1\n\tno id\ten\tweb\t2\n".getBytes("UTF-8"))
    val (clean, quarantine) = graft.sources.TsvCorpus.read(spark, dir)
    // every written record is one physical line (line-splittable scan)
    val lines = clean.count()
    assert(lines === 5)
    val got = clean.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    nasty.foreach { case (id, text, _, _, _) =>
      assert(got(id) === text, s"doc $id round-trip")
    }
    val q = quarantine.collect()
      .map(r => r.getAs[String]("motivo_rechazo"))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(q === Map("malformed tsv" -> 1, "missing doc_id" -> 1))
    // forensic contract: the missing-id line's raw_line IS the physical
    // line — the empty doc_id slot renders as "" (leading tab kept, no
    // concat_ws null-skip shortening) and text stays escaped
    val noId = quarantine.collect()
      .find(_.getAs[String]("motivo_rechazo") == "missing doc_id").get
    assert(noId.getAs[String]("raw_line") === "\tno id\ten\tweb\t2")
  }

  test("tsv write keeps a null field's column slot (no field shift)") {
    // regression: concat_ws SKIPS nulls (separator included) — an
    // uncoalesced null lang emitted a 4-field line and the read
    // silently shifted source into lang instead of quarantining
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tsv-null").toString + "/data"
    val rows = Seq((1L, "has null lang", null, "web", 13L),
      (2L, null, "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.sources.TsvCorpus.write(rows, dir)
    val (clean, quarantine) = graft.sources.TsvCorpus.read(spark, dir)
    assert(quarantine.count() === 0)
    val got = clean.orderBy("doc_id")
      .as[(Long, String, String, String, Long)].collect().toSeq
    // null renders as "" but every column stays in its slot
    assert(got === Seq((1L, "has null lang", "", "web", 13L),
      (2L, "", "en", "web", 0L)))
  }

  test("funnel: strict step order, window cut, dropouts keep their prefix") {
    def ev(u: Long, t: String, ty: String) = (u, t, ty)
    val rows = Seq(
      // u1 completes in order
      ev(1, "2024-01-01 00:00:00", "view"),
      ev(1, "2024-01-01 01:00:00", "click"),
      ev(1, "2024-01-01 02:00:00", "purchase"),
      // u2's click lands past the 7-day window → depth 1
      ev(2, "2024-01-01 00:00:00", "view"),
      ev(2, "2024-01-09 00:00:00", "click"),
      // u3's purchase precedes its click → not counted → depth 2
      ev(3, "2024-01-01 00:00:00", "view"),
      ev(3, "2024-01-01 01:00:00", "purchase"),
      ev(3, "2024-01-01 02:00:00", "click"),
      // u4 never opened the funnel → no row
      ev(4, "2024-01-01 00:00:00", "click"),
      ev(4, "2024-01-01 01:00:00", "purchase"))
    val df = rows.toDF("user_id", "t", "event_type")
      .withColumn("ts", to_timestamp($"t")).drop("t")
    val got = Temporal.funnel(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L).getAs[Int]("depth") === 3)
    assert(got(2L).getAs[Int]("depth") === 1)
    assert(got(2L).getAs[java.sql.Timestamp]("t2") === null)
    assert(got(3L).getAs[Int]("depth") === 2)
    assert(got(3L).getAs[java.sql.Timestamp]("t3") === null)
  }

  test("retention cohorts: pre-signup activity excluded, offsets counted per cohort") {
    def ev(u: Long, t: String, ty: String) = (u, t, ty)
    val rows = Seq(
      ev(1, "2024-01-01 08:00:00", "signup"),
      ev(1, "2024-01-01 09:00:00", "click"),
      ev(1, "2024-01-02 09:00:00", "view"),
      ev(1, "2024-01-04 09:00:00", "view"),
      ev(2, "2024-01-01 10:00:00", "signup"),
      ev(2, "2024-01-02 11:00:00", "click"),
      // u3 was active BEFORE signing up — that day must not count
      ev(3, "2024-01-01 07:00:00", "view"),
      ev(3, "2024-01-02 08:00:00", "signup"),
      ev(3, "2024-01-03 08:00:00", "click"))
    val df = rows.toDF("user_id", "t", "event_type")
      .withColumn("ts", to_timestamp($"t")).drop("t")
    val got = Temporal.retentionCohorts(df)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_date").toString,
        r.getAs[Int]("day_offset")) -> r.getAs[Long]("n_active"))
      .toMap
    assert(got === Map(
      ("2024-01-01", 0) -> 2L, // u1, u2 on signup day
      ("2024-01-01", 1) -> 2L, // u1, u2 next day
      ("2024-01-01", 3) -> 1L, // u1 only
      ("2024-01-02", 0) -> 1L, // u3 signup day
      ("2024-01-02", 1) -> 1L)) // u3 next day
  }

  test("bigram xent: matches hand-computed model on a tiny corpus; short docs drop") {
    // corpus: d0 = "a b a b", d1 = "a b", d2 = "a" (no bigrams)
    val df = Seq((0L, "a b a b"), (1L, "a b"), (2L, "a"))
      .toDF("doc_id", "text")
    val got = CorpusStats.bigramLogProb(df)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(2L), "doc with < 2 tokens must emit no row")
    // counts: B(a b)=3, B(b a)=1; U(a)=4, U(b)=3; V=2; α=0.5
    val pAB = (3 + 0.5) / (4 + 0.5 * 2) // P(b|a)
    val pBA = (1 + 0.5) / (3 + 0.5 * 2) // P(a|b)
    val d0 = -(2 * math.log(pAB) + math.log(pBA)) / 3
    val d1 = -math.log(pAB)
    assert(got(0L)._2 === 3L)
    assert(math.abs(got(0L)._3 - d0) < 5e-5, s"${got(0L)._3} vs $d0")
    assert(got(1L)._2 === 1L)
    assert(math.abs(got(1L)._3 - d1) < 5e-5, s"${got(1L)._3} vs $d1")
  }

  test("theta sketches: exact mode, estimation bounds, set algebra") {
    import graft.plans.ThetaFunctions
    import graft.plans.ThetaFunctions.thetaSketchAgg
    // exact mode: below nomEntries distinct keys, θ = 1 and the
    // estimate IS the exact count (bounds collapse onto it)
    val small = (0L until 100L).toDF("k")
    val skSmall = ThetaFunctions.wrap(small
      .agg(thetaSketchAgg($"k", 256).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk"))
    assert(skSmall.getEstimate === 100.0)
    assert(skSmall.getLowerBound(3) === 100.0)
    assert(skSmall.getUpperBound(3) === 100.0)
    // estimation mode: 40k keys through a 256-entry sketch — the
    // exact count sits inside the 3σ bounds and within the published
    // ~1/√k relative error (generous 5/√k gate)
    val big = (0L until 40000L).toDF("k")
    val skBig = ThetaFunctions.wrap(big
      .agg(thetaSketchAgg($"k", 256).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk"))
    assert(skBig.getLowerBound(3) <= 40000.0 &&
      40000.0 <= skBig.getUpperBound(3))
    assert(math.abs(skBig.getEstimate - 40000.0) / 40000.0 <
      5.0 / math.sqrt(256.0))
    // partitioning invariance: the retained-hash set is a function of
    // the key SET, so any layout yields the IDENTICAL estimate
    val skBig7 = ThetaFunctions.wrap(big.repartition(7)
      .agg(thetaSketchAgg($"k", 256).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk"))
    assert(skBig7.getEstimate === skBig.getEstimate)
    // set algebra on overlapping ranges: [0, 40k) ∩ [30k, 70k) =
    // 10k, ∪ = 70k — both inside their own 3σ bounds
    val other = (30000L until 70000L).toDF("k")
    val skOther = ThetaFunctions.wrap(other
      .agg(thetaSketchAgg($"k", 256).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk"))
    val inter = ThetaFunctions.intersect(skBig, skOther)
    val uni = ThetaFunctions.union(skBig, skOther, 256)
    assert(inter.getLowerBound(3) <= 10000.0 &&
      10000.0 <= inter.getUpperBound(3))
    assert(uni.getLowerBound(3) <= 70000.0 &&
      70000.0 <= uni.getUpperBound(3))
    // difference closes the algebra: |A \ B| = 30k
    val diff = ThetaFunctions.aNotB(skBig, skOther)
    assert(diff.getLowerBound(3) <= 30000.0 &&
      30000.0 <= diff.getUpperBound(3))
  }

  test("theta state rows survive parquet and union within bounds") {
    import graft.operators.SketchAlgebra
    import graft.plans.ThetaFunctions
    val keys = (0L until 5000L).toDF("user_id")
    val path = java.nio.file.Files
      .createTempDirectory("graft-theta-state").toString + "/states"
    // persist per-part sketch states as an incremental pipeline would
    SketchAlgebra.thetaState(keys, parts = 4, nomEntries = 256)
      .write.parquet(path)
    val reloaded = spark.read.parquet(path)
      .agg(ThetaFunctions.thetaUnionAgg($"sk", 256).as("u"))
      .collect().head.getAs[Array[Byte]]("u")
    val merged = ThetaFunctions.wrap(reloaded)
    // the published contract survives the parquet round-trip + merge
    assert(merged.getLowerBound(3) <= 5000.0 &&
      5000.0 <= merged.getUpperBound(3))
    // serialization is lossless: the same union without the disk hop
    // lands the identical estimate
    val direct = ThetaFunctions.wrap(
      SketchAlgebra.thetaState(keys, parts = 4, nomEntries = 256)
        .agg(ThetaFunctions.thetaUnionAgg($"sk", 256).as("u"))
        .collect().head.getAs[Array[Byte]]("u"))
    assert(direct.getEstimate === merged.getEstimate)
    // the audit query's contract holds end to end
    val audit = SketchAlgebra.thetaMergeProfile(keys, parts = 4,
      nomEntries = 256).collect().head
    assert(audit.getAs[Long]("exact_keys") === 5000L)
    assert(audit.getAs[Boolean]("merged_in_bounds"))
  }

  test("audience overlap audit: exact sizes and empty-side degenerate") {
    import graft.operators.SketchAlgebra
    val ev = Seq(
      (1L, "buy", 90.0), (2L, "buy", 95.0), (3L, "buy", 10.0),
      (1L, "err", 5.0), (4L, "err", 1.0))
      .toDF("user_id", "event_type", "value")
    val r = SketchAlgebra.audienceOverlap(ev, "a", "b",
      $"event_type" === "buy" && $"value" > 80.0,
      $"event_type" === "err", nomEntries = 16).collect().head
    // A = {1, 2}, B = {1, 4}: inter {1}, union {1, 2, 4}
    assert(r.getAs[Long]("exact_a") === 2L)
    assert(r.getAs[Long]("exact_b") === 2L)
    assert(r.getAs[Long]("exact_inter") === 1L)
    assert(r.getAs[Long]("exact_union") === 3L)
    // exact mode → every bound collapses onto the exact value
    assert(Seq("a_in_bounds", "b_in_bounds", "inter_in_bounds",
      "union_in_bounds").forall(r.getAs[Boolean]))
    // an audience nobody matches degenerates cleanly (empty sketch)
    val e = SketchAlgebra.audienceOverlap(ev, "a", "none",
      $"event_type" === "buy", $"event_type" === "nope",
      nomEntries = 16).collect().head
    assert(e.getAs[Long]("exact_b") === 0L)
    assert(e.getAs[Long]("exact_inter") === 0L)
    assert(e.getAs[Boolean]("b_in_bounds") &&
      e.getAs[Boolean]("inter_in_bounds"))
  }

  test("containment: doc-in-doc scores 1.0 where jaccard stays low") {
    // doc 20 is a verbatim snippet of doc 21 (page = snippet + filler):
    // containment must be 1.0 with contained_id = 20, while symmetric
    // jaccard on the same pair is well under 0.5
    val snippet = "alpha beta gamma delta epsilon zeta eta theta"
    val page = snippet + " " +
      (1 to 40).map(i => s"filler$i word$i").mkString(" ")
    val dd = Seq((20L, snippet), (21L, page)).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(dd, 0.9).collect()
    assert(c.length === 1)
    assert(c.head.getAs[Double]("containment") === 1.0)
    assert(c.head.getAs[Long]("contained_id") === 20L)
    val j = Dedup.ngramJaccardPairs(dd, 0.0)
      .filter($"id_a" === 20L).collect().head
    assert(j.getAs[Double]("jaccard") < 0.5)
    // unrelated docs never pair (no shared shingle → no candidate)
    assert(Dedup.containmentPairs(docs, 0.9)
      .filter($"id_a" === 3L || $"id_b" === 3L).count() === 0L)
  }

  test("component stats: singleton/dup-cluster census over CC labels") {
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("vec_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val clusters = Dedup.clusterAssignments(verts, pairs, idCol = "vec_id")
    val r = clusters.groupBy($"cluster_id")
      .agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_components"),
        sum(when($"sz" === 1, 1L).otherwise(0L)).as("n_singletons"),
        max($"sz").as("max_size"),
        sum(when($"sz" > 1, $"sz").otherwise(0L)).as("n_in_dup_clusters"))
      .collect().head
    assert(r.getAs[Long]("n_components") === 3L) // {1,2,3} {4,5} {6}
    assert(r.getAs[Long]("n_singletons") === 1L)
    assert(r.getAs[Long]("max_size") === 3L)
    assert(r.getAs[Long]("n_in_dup_clusters") === 5L)
  }

  test("keep-best per cluster: quality wins, ties break low, singletons") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1))
      .toDF("doc_id", "score")
    val r = Dedup.keepBestPerCluster(clusters, scores)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_members"), x.getAs[Boolean]("keep")))).toMap
    // 2 and 3 tie at 0.9 → the LOWER id keeps; the singleton keeps itself
    assert(r === Map(1L -> ((3L, false)), 2L -> ((3L, true)),
      3L -> ((3L, false)), 4L -> ((1L, true))))
  }

  test("temperature sample: rarest group keeps all, head subsamples") {
    import graft.operators.CorpusStats
    // skew 4:1 — group 'big' has 80 docs, 'small' has 20
    val dd = ((1L to 80L).map(i => (i, s"doc $i", "big")) ++
      (81L to 100L).map(i => (i, s"doc $i", "small")))
      .toDF("doc_id", "text", "source")
    val kept = CorpusStats.temperatureSample(dd)
    val rates = kept.select($"source", $"q_ppm").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("small") === 1000000L) // √(20/20) → keeps everything
    assert(rates("big") === 500000L) // √(20/80) = 1/2 exactly
    val counts = kept.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("small") === 20L)
    // md5 is uniform: the 50% rate keeps SOME but not all of 80
    assert(counts("big") > 20L && counts("big") < 80L)
    // deterministic replay: same rows every run
    assert(kept.collect().map(_.toString).sorted.toSeq ===
      CorpusStats.temperatureSample(dd).collect()
        .map(_.toString).sorted.toSeq)
  }

  test("compaction plan: bin boundaries, oversized item, stable prefix") {
    import graft.operators.CorpusStats
    // bytes [100, 100, 250, 100], target 200 → cum-before 0/100/200/450
    // → bins 0, 0, 1, 2: the oversized 250-byte item keeps its own bin
    // (overflow by one item is the compaction contract)
    val rows = Seq(("s", 1L, "a" * 100), ("s", 2L, "b" * 100),
      ("s", 3L, "c" * 250), ("s", 4L, "d" * 100))
    val items = rows.toDF("source", "doc_id", "text")
    val bins = CorpusStats.compactionPlan(items, 200L)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("bytes"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toMap
    assert(bins === Map(0L -> ((2L, 200L, 1L, 2L)),
      1L -> ((1L, 250L, 3L, 3L)), 2L -> ((1L, 100L, 4L, 4L))))
    // appending an item re-plans only the tail: bins 0..2 unchanged
    val more = CorpusStats.compactionPlan(
        (rows :+ (("s", 5L, "e" * 80))).toDF("source", "doc_id", "text"),
        200L)
      .collect().map(r => r.getAs[Long]("bin") ->
        r.getAs[Long]("n_files")).toMap
    assert(more(0L) === 2L && more(1L) === 1L)
    assert(more(2L) === 2L) // the tail bin absorbs the 80-byte append
    // UTF-8 BYTES, not chars: 100 two-byte chars fill a 200-byte bin
    val utf = CorpusStats.compactionPlan(
      Seq(("s", 1L, "é" * 100), ("s", 2L, "x"))
        .toDF("source", "doc_id", "text"), 200L).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("first_doc")).toMap
    assert(utf === Map(0L -> 1L, 1L -> 2L))
    // a zero/negative target must fail loudly, never NULL-bin silently
    intercept[IllegalArgumentException] {
      CorpusStats.compactionPlan(items, 0L)
    }
  }

  test("dim-truncate recall: full prefix is perfect, short prefix bounded") {
    val e = Tables.embeddings(spark, sf0001)
    // truncating to the FULL width is the identity ranking: recall
    // must be exactly 10⁶ for every query
    val ident = Similarity.dimTruncateRecall(e, k = 5, queryMod = 50,
      truncDim = 64).collect()
    assert(ident.nonEmpty)
    assert(ident.forall(_.getAs[Long]("recall_ppm") === 1000000L))
    // a 16-dim prefix: recall in [0, 10⁶], hits within k, exact ppm
    val short = Similarity.dimTruncateRecall(e, k = 5, queryMod = 50,
      truncDim = 16).collect()
    assert(short.map(_.getAs[Long]("query_id")).toSet ===
      ident.map(_.getAs[Long]("query_id")).toSet)
    short.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0L && hits <= 5L)
      assert(r.getAs[Long]("recall_ppm") === 1000000L * hits / 5L)
    }
  }

  test("hard negatives: below the near-dup band, never self, k-cut") {
    val e = Tables.embeddings(spark, sf0001)
    val neg = Similarity.hardNegatives(e, k = 5, queryMod = 50,
      threshold = 0.935).collect()
    assert(neg.nonEmpty)
    neg.foreach { r =>
      assert(r.getAs[Double]("cos") < 0.935) // near-dups excluded
      assert(r.getAs[Long]("query_id") !== r.getAs[Long]("match_id"))
      assert(r.getAs[Int]("rank") <= 5)
    }
    // the negatives are the HARDEST remaining: per query, rank order
    // follows cosine descending
    neg.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("stratified sample: exact largest-remainder quotas, deterministic fill") {
    // strata a:5, b:3, c:3 (N=11), total=10: bases 4,2,2 (Σ=8),
    // remainders 6,8,8 → the two +1 seats go to b and c (rem desc,
    // name asc) → quotas 4,3,3 and EXACTLY 10 rows
    val docs = ((0 until 5).map(i => (i.toLong, "a")) ++
      (10 until 13).map(i => (i.toLong, "b")) ++
      (20 until 23).map(i => (i.toLong, "c")))
      .map { case (id, g) => (id, g, s"text $id") }
      .toDF("doc_id", "lang", "text")
    val got = CorpusStats.stratifiedSample(docs, total = 10)
    assert(got.count() === 10L)
    val quotas = got.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quotas === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // per-stratum quota column is the allocation, rk fills it 1..q
    assert(got.collect().forall(r =>
      r.getAs[Int]("rk") <= r.getAs[Long]("quota")))
    // deterministic: the same call selects the same ids
    assert(got.select("doc_id").as[Long].collect().sorted ===
      CorpusStats.stratifiedSample(docs, total = 10)
        .select("doc_id").as[Long].collect().sorted)
  }

  test("bpe roundtrip: gluing subwords reproduces every word") {
    val d = Seq((7L, "abab abab aab aab aab bb x"),
      (8L, "abab aab"))
      .toDF("doc_id", "text")
    val r = CorpusStats.bpeRoundtrip(d, 3).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), x.getAs[Long]("n_subwords"),
          x.getAs[Boolean]("lossless"))).toMap
    // doc 7: 7 words; abab/aab 1 token each, bb → [b, b], x OOV → 1:
    // 2·1 + 3·1 + 2 + 1 = 8 subwords; every glue-back is exact
    assert(r(7L) === ((7L, 8L, true)))
    assert(r(8L) === ((2L, 2L, true)))
  }

  test("rrf fusion: hand-computed ppm scores, single-system docs survive") {
    import graft.operators.SparseSim
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2))
      .toDF("qid", "nid", "rk")
    val den = Seq((1L, 11L, 1), (1L, 12L, 2))
      .toDF("query_id", "match_id", "rank")
    val got = SparseSim.rrfFuse(lex, den, k = 10).collect()
      .map(r => r.getAs[Long]("match_id") ->
        (r.getAs[Long]("rrf_ppm"), r.getAs[Int]("fused_rk"))).toMap
    // doc 11 in both systems: 10⁶//61 + 10⁶//62 = 16393 + 16129;
    // doc 10 lex-only rank 1: 16393; doc 12 dense-only rank 2: 16129
    assert(got === Map(11L -> ((32522L, 1)), 10L -> ((16393L, 2)),
      12L -> ((16129L, 3))))
    // absent ranks are NULL, not sentinel values
    val nulls = SparseSim.rrfFuse(lex, den, k = 10).collect()
      .map(r => r.getAs[Long]("match_id") ->
        (r.isNullAt(r.fieldIndex("lex_rk")),
          r.isNullAt(r.fieldIndex("dense_rk")))).toMap
    assert(nulls(10L) === ((false, true)))
    assert(nulls(12L) === ((true, false)))
  }

  test("hashed ngram scorer: feature count, margin replay, empty text drops") {
    val df = Seq((1L, "a b c"), (2L, "solo"), (3L, " "), (4L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.hashedNgramScore(df, buckets = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Long]("score_raw"),
          r.getAs[Boolean]("keep"))).toMap
    // "a b c": 3 unigrams + 2 bigrams; "solo": 1 + 0; blank: no row
    assert(got.keySet === Set(1L, 2L, 4L))
    assert(got(1L)._1 === 5L && got(2L)._1 === 1L)
    // identical text → identical margin (deterministic serving path)
    assert(got(1L) === got(4L))
    assert(got(1L)._3 === (got(1L)._2 > 0L))
    // margin replays from the declarative md5 construction the oracle
    // uses — an independent Spark-SQL recomputation, feature by feature
    val wantDoc1 = Seq("a", "b", "c", "a b", "b c").toDF("f")
      .select((pmod(pmod(conv(substring(md5(concat($"f", lit("#0"))),
        1, 15), 16, 10).cast("long"), lit(64L)) * 2654435761L,
        lit(1001L)) - 500L).as("w"))
      .agg(sum($"w")).as[Long].head()
    assert(got(1L)._2 === wantDoc1)
  }

  test("cms bucket hash matches the Spark-SQL seeded-md5 construction") {
    // the cross-engine contract: CmsSketch.bucket (JVM) ≡ the
    // conv(substr(md5(item || '#' || r/2)))-style expression any SQL
    // engine replays — pin the Spark-expression side here (the DuckDB
    // side is pinned by the driver's oracle compare)
    val items = Seq("alpha", "beta", "two words", "Ünïcode-ß", "x")
    for (r <- 0 until 3) {
      val sqlBuckets = items.toDF("item")
        .select(col("item"),
          pmod(conv(substring(md5(concat(col("item"),
            lit(s"#${r / 2}"))), 1 + (r % 2) * 16, 15), 16, 10)
            .cast("long"), lit(1024)).as("b"))
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      items.foreach { it =>
        assert(graft.plans.CmsSketch.bucket(it, r, 1024) ===
          sqlBuckets(it).toInt, s"bucket mismatch for '$it' row $r")
      }
    }
  }

  test("cms: merge is lossless, estimates never underestimate, states ride parquet") {
    import graft.operators.CountMin
    val rows = (0 until 120).map { i =>
      (i.toLong, s"alpha beta tail${i % 40} tail${(i + 7) % 40}")
    }
    val df = rows.toDF("doc_id", "text")
    // split-and-merge equals single-pass BIT-FOR-BIT (the lossless
    // property Misra-Gries lacks), through a parquet round-trip
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cms-state").toString + "/states"
    CountMin.cmsState(df, pmod($"doc_id", lit(5)), 3, 256)
      .write.mode("overwrite").parquet(dir)
    val merged = CountMin.mergedSketch(
      spark.read.parquet(dir), 3, 256)
    val single = CountMin.mergedSketch(
      CountMin.cmsState(df, lit(0), 3, 256), 3, 256)
    assert(java.util.Arrays.equals(merged.counters, single.counters))
    assert(merged.n === single.n && merged.n === 480L)
    // deterministic guarantee on every distinct token, and exactness
    // where the audit fixture is collision-free by construction
    val exact = df.select(explode(TextAnalysis.words($"text")).as("t"))
      .groupBy($"t").count().as[(String, Long)].collect().toMap
    exact.foreach { case (t, c) =>
      assert(merged.estimate(t) >= c, s"cms underestimated '$t'")
    }
    assert(merged.estimate("alpha") >= 120L)
    // the distributed estimate expression agrees with the driver-side
    // lookup (codegen'd path vs direct call)
    val viaExpr = exact.keys.toSeq.toDF("item")
      .select($"item", graft.plans.CmsFunctions
        .cmsEstimate($"item", merged).as("est"))
      .as[(String, Long)].collect().toMap
    exact.keys.foreach { t =>
      assert(viaExpr(t) === merged.estimate(t))
    }
    // full audit forms are green end-to-end on the fixture
    // phi=5: alpha/beta hold 120/480 = 1/4 of the stream each, so the
    // STRICT cnt·phi > n heavy line needs phi > 4 to admit them
    val audit = CountMin.cmsMergeValidated(df, parts = 5, depth = 3,
      width = 256, phi = 5).collect()
    assert(audit.map(_.getAs[String]("item")).toSet ===
      Set("alpha", "beta"))
    assert(audit.forall(_.getAs[Boolean]("merge_lossless")))
    assert(audit.forall(_.getAs[Boolean]("no_underest")))
  }

  test("cms retraction is exact: subtract equals the filtered rebuild; " +
      "removed-only tokens vanish") {
    import graft.operators.CountMin
    // doc 3 is the takedown target and sole carrier of 'gone'
    val d = Seq(
      (1L, "alpha alpha beta"), (2L, "alpha beta beta"),
      (3L, "gone gone gone alpha"), (4L, "beta alpha")).toDF(
      "doc_id", "text")
    // filtered corpus = alpha×4 + beta×4 over 8 tokens; phi=3 makes
    // both heavy (4·3 > 8)
    val out = CountMin.cmsRetractValidated(d, $"doc_id" === 3L,
      depth = 3, width = 64, phi = 3)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // the byte-compare held: subtraction IS the filtered rebuild
    assert(rows.forall(_.getAs[Boolean]("retract_exact")))
    assert(rows.forall(_.getAs[Boolean]("no_underest")))
    // the heavy set is the FILTERED corpus's: 'gone' cannot appear,
    // and alpha's exact count has doc 3's occurrence removed
    val byItem = rows.map(r => r.getAs[String]("item") ->
      r.getAs[Long]("exact_cnt")).toMap
    assert(!byItem.contains("gone"))
    assert(byItem("alpha") === 4L)
    // a removed-only token's estimate drops to the collision floor:
    // with this tiny vocabulary the sketch answers 0 for 'gone'
    // unless some survivor hashes onto all three of its counters
    val est = out.sparkSession.range(1).select(
      graft.plans.CmsFunctions.cmsEstimate(lit("gone"),
        CountMin.retractedSketch(d, $"doc_id" === 3L, 3, 64))
        .as("e")).collect().head.getLong(0)
    assert(est >= 0L && est <= 1L)
  }

  test("cms drift: one-sided tokens top the movers; estimates stay above truth") {
    import graft.operators.CountMin
    // even half "aaa bbb", odd half "aaa ccc": aaa has identical rate
    // in both halves (diff 0); bbb/ccc are one-sided at rate 1/2 →
    // diff 500000 ppm each, tie broken by item name
    val docs = (0 until 40).map(i =>
      (i.toLong, if (i % 2 == 0) "aaa bbb" else "aaa ccc"))
      .toDF("doc_id", "text")
    val got = CountMin.cmsDriftValidated(docs, depth = 3, width = 256,
      k = 2).collect()
    assert(got.map(_.getAs[String]("item")).toSeq === Seq("bbb", "ccc"))
    got.foreach { r =>
      assert(r.getAs[Long]("rate_diff_ppm") === 500000L)
      assert(r.getAs[Boolean]("no_underest"))
    }
    val bbb = got.find(_.getAs[String]("item") == "bbb").get
    assert(bbb.getAs[Long]("cnt_a") === 20L &&
      bbb.getAs[Long]("cnt_b") === 0L)
  }

  test("join advisor: single-key joins estimate exactly; min estimate chosen") {
    import graft.operators.CountMin
    // one distinct key per side → the only occupied buckets hold that
    // key alone, so the inner product IS the exact cardinality
    def keyed(n: Int, k: Long) = (0 until n)
      .map(i => (i.toLong, k)).toDF("row_id", "key")
    val small = CountMin.joinSizeProfile("small", keyed(10, 1L), "key",
      keyed(3, 1L), "key", depth = 3, width = 256)
    val big = CountMin.joinSizeProfile("big", keyed(5, 2L), "key",
      keyed(100, 2L), "key", depth = 3, width = 256)
    val rows = CountMin.joinSizeAdvisor(Seq(small, big)).collect()
      .map(r => r.getAs[String]("join_name") ->
        (r.getAs[Long]("exact_rows"), r.getAs[Long]("est_rows"),
          r.getAs[Boolean]("no_underest"), r.getAs[Boolean]("chosen")))
      .toMap
    assert(rows("small") === ((30L, 30L, true, true)))
    assert(rows("big") === ((500L, 500L, true, false)))
  }

  test("cms self-join size: exact on a single key, bounded below by F2 always") {
    import graft.operators.CountMin
    // one key: the only occupied buckets hold that key alone, so the
    // inner-product estimate IS the exact F2 = 7²
    val one = Seq.fill(7)(42L).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("event_id", "user_id")
    val r1 = CountMin.cmsSelfJoinProfile(one, depth = 3, width = 256)
      .collect().head
    assert(r1.getAs[Long]("exact_self_join") === 49L)
    assert(r1.getAs[Long]("est_self_join") === 49L)
    assert(r1.getAs[Boolean]("no_underest"))
    // skewed multi-key: estimate >= exact, exact replay of Σ cnt²
    val skew = ((0 until 50).map(i => (i.toLong, 1L)) ++
      (50 until 60).map(i => (i.toLong, i.toLong)))
      .toDF("event_id", "user_id")
    val r2 = CountMin.cmsSelfJoinProfile(skew, depth = 3, width = 256)
      .collect().head
    assert(r2.getAs[Long]("exact_self_join") === 2500L + 10L)
    assert(r2.getAs[Long]("est_self_join") >=
      r2.getAs[Long]("exact_self_join"))
    assert(r2.getAs[Long]("n_keys") === 11L)
  }

  test("compact BandKeys/MatVec match the literal-DSL construction " +
      "bit-for-bit") {
    // the r14 planning-cost fix replaced the column-DSL band-key /
    // matrix-projection trees (one lit() array per plane) with single
    // reference-object expressions — this pins the key/value parity the
    // swap promised, plane order and sign test included
    import graft.plans.VectorExpressions.{bandKeys, dotProduct, matVec}
    val dim = 16
    val rowsPerBand = 3
    val bands = 4
    val mat = Array.tabulate(bands * rowsPerBand)(p =>
      Array.tabulate(dim)(i =>
        if ((p * 31 + i * 7) % 5 < 2) 1.0 else -1.0))
    val vecs = Seq(
      (1L, Array.tabulate(dim)(i => math.sin(i + 1.0))),
      (2L, Array.tabulate(dim)(i => -0.25 * (i % 3))),
      (3L, Array.fill(dim)(0.0)), // all-zero: every dot == 0, no bit set
      (4L, Array.tabulate(dim)(i => if (i % 2 == 0) 1e-9 else -1e9)))
      .toDF("id", "v")
    val dslKeys = array((0 until bands).map { b =>
      (0 until rowsPerBand).map { r =>
        when(dotProduct($"v", lit(mat(b * rowsPerBand + r))) > 0,
          shiftleft(lit(1L), r)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }: _*)
    val keyDiff = vecs.select(
        bandKeys($"v", mat, rowsPerBand).as("fast"),
        dslKeys.as("dsl"))
      .filter(not($"fast" <=> $"dsl"))
    assert(keyDiff.count() === 0)
    val dslProj = array((0 until bands * rowsPerBand).map(j =>
      dotProduct($"v", lit(mat(j)))): _*)
    val projDiff = vecs.select(
        matVec($"v", mat).as("fast"), dslProj.as("dsl"))
      .filter(not($"fast" <=> $"dsl"))
    assert(projDiff.count() === 0)
  }

  test("centroid argmax kernels match the crossJoin+max_by " +
      "construction bit-for-bit") {
    // the r15 assignment-pass fix replaced crossJoin(broadcast(cents))
    // + round-6 score + max_by argmax with per-row reference-object
    // kernels — this pins score arithmetic (all three norm modes),
    // Spark-round-6 parity, the ties→lowest-id rule (a duplicated
    // centroid under two ids), and the fused residual, against the
    // legacy column-DSL construction
    import graft.plans.CentroidKernels
    import graft.plans.CentroidKernels.{nearestCentroid, nearestResidual, pqEncodeCodes}
    import graft.plans.VectorExpressions.dotProduct
    val dim = 8
    // deliberately UNSORTED ids; cents(3) duplicates cents(0) under a
    // HIGHER id, so whenever that direction wins the tie must go to 7
    val cids = Array(7L, 3L, 20L, 11L)
    val cents = Array(
      Array.tabulate(dim)(i => math.cos(i * 1.7) + 0.3),
      Array.tabulate(dim)(i => math.sin(i * 0.9) - 0.1),
      Array.tabulate(dim)(i => 0.25 * ((i % 4) - 1.5)),
      Array.tabulate(dim)(i => math.cos(i * 1.7) + 0.3))
    val vecs = Seq(
      (1L, Array.tabulate(dim)(i => math.sin(i + 1.0))),
      (2L, Array.tabulate(dim)(i => -0.25 * (i % 3) + 0.01)),
      (3L, Array.tabulate(dim)(i => 1e-7 * (i - 3.0))),
      (4L, Array.tabulate(dim)(i => if (i % 2 == 0) 2.0 else -1.0)))
      .toDF("id", "v")
    val centsDf = cids.zip(cents).toSeq.toDF("cent_id", "centv")
    val dsl = Map[Int, org.apache.spark.sql.Column](
      CentroidKernels.NormNone ->
        round(dotProduct($"v", $"centv"), 6),
      CentroidKernels.NormCent ->
        round(dotProduct($"v", $"centv") /
          sqrt(dotProduct($"centv", $"centv")), 6),
      CentroidKernels.NormFull ->
        round(dotProduct($"v", $"centv") /
          (sqrt(dotProduct($"v", $"v")) *
            sqrt(dotProduct($"centv", $"centv"))), 6))
    dsl.foreach { case (norm, score) =>
      val legacy = vecs.crossJoin(broadcast(centsDf))
        .withColumn("cdot", score)
        .groupBy($"id")
        .agg(max_by($"cent_id", struct($"cdot", -$"cent_id"))
          .as("cent_id"), max($"cdot").as("cos"))
      val fast = vecs.select($"id",
        nearestCentroid($"v", cids, cents, norm).as("p"))
        .select($"id", $"p.cent_id".as("cent_id"), $"p.cos".as("cos"))
      val diff = legacy.as("l").join(fast.as("f"), Seq("id"))
        .filter(not($"l.cent_id" <=> $"f.cent_id") ||
          not($"l.cos" <=> $"f.cos"))
      assert(diff.count() === 0, s"norm mode $norm diverged")
      // cents(3) duplicates cents(0) under id 11 vs id 7: whenever that
      // direction wins, the tie must go to the LOWER id — 11 never wins
      assert(fast.filter($"cent_id" === 11L).count() === 0)
    }
    // fused residual: argmax (plain dot) + elementwise v − c_win
    val legacyRes = vecs.crossJoin(broadcast(centsDf))
      .withColumn("cdot", round(dotProduct($"v", $"centv"), 6))
      .groupBy($"id")
      .agg(max_by(struct($"cent_id".as("cid"), $"centv".as("cv0")),
        struct($"cdot", -$"cent_id")).as("a"), first($"v").as("v"))
      .select($"id", $"a.cid".as("cent_id"),
        zip_with($"v", $"a.cv0", (x, c) => x - c).as("res"))
    val fastRes = vecs.select($"id",
        nearestResidual($"v", cids, cents).as("a"))
      .select($"id", $"a.cent_id".as("cent_id"), $"a.v".as("res"))
    val resDiff = legacyRes.as("l").join(fastRes.as("f"), Seq("id"))
      .filter(not($"l.cent_id" <=> $"f.cent_id") ||
        not($"l.res" <=> $"f.res"))
    assert(resDiff.count() === 0)
    // PQ encode: per-subspace argmin over the codebook, stored cn2
    // carried through; entries 0 and 2 of subspace 0 are identical so
    // the code tie must go to the lower id
    val m = 2
    val sub = dim / m
    val codeIds = Array(5L, 2L, 9L)
    val subcs = Array(
      Array(Array.tabulate(sub)(i => 0.5 - 0.2 * i),
        Array.tabulate(sub)(i => math.sin(i * 2.1)),
        Array.tabulate(sub)(i => 0.5 - 0.2 * i)),
      Array(Array.tabulate(sub)(i => -0.3 + 0.1 * i),
        Array.tabulate(sub)(i => math.cos(i * 1.3)),
        Array.tabulate(sub)(i => 0.05 * i * i)))
    def selfDot(a: Array[Double]) = a.map(x => x * x).sum
    val cn2s = subcs.map(_.map(selfDot))
    val cbDf = (0 until m).flatMap(j => codeIds.indices.map(k =>
      (j, codeIds(k), subcs(j)(k), cn2s(j)(k))))
      .toDF("j", "cent_id", "subc", "cn2")
    val legacyPq = vecs
      .select($"id", posexplode(array((0 until m).map(j =>
        slice($"v", j * sub + 1, sub)): _*)).as(Seq("j", "subv")))
      .join(broadcast(cbDf), Seq("j"))
      .withColumn("d2", round(dotProduct($"subv", $"subv")
        - lit(2.0) * dotProduct($"subv", $"subc") + $"cn2", 6))
      .groupBy($"id", $"j")
      .agg(max_by(struct($"cent_id".as("code"), $"cn2"),
        struct(-$"d2", -$"cent_id")).as("c"))
      .select($"id", $"j", $"c.code".as("code"), $"c.cn2".as("cn2"))
    val fastPq = vecs.select($"id",
        explode(pqEncodeCodes($"v", codeIds, subcs, cn2s, sub)).as("e"))
      .select($"id", $"e.j".as("j"), $"e.code".as("code"),
        $"e.cn2".as("cn2"))
    val pqDiff = legacyPq.as("l")
      .join(fastPq.as("f"), Seq("id", "j"))
      .filter(not($"l.code" <=> $"f.code") ||
        not($"l.cn2" <=> $"f.cn2"))
    assert(pqDiff.count() === 0)
    assert(fastPq.count() === vecs.count() * m)
    // ids 5 and 9 share subc in subspace 0: 9 can never win there
    // (it either loses outright or ties-loses to the lower id 5)
    assert(fastPq.filter($"j" === 0 && $"code" === 9L).count() === 0)
  }

  test("ensureBucketed: data lands once, catalog re-registers per call, " +
      "recipe change rebuilds") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-bkt-spec").toString
    val df = (1L to 40L).map(k => (k, k * 10)).toDF("k", "x")
    val first = graft.sources.BucketedStore.ensureBucketed(
      df, "graft_spec_bkt", "k", 4, s"$root/t")
    assert(first.isDefined) // cold: built, build seconds reported
    val rows1 = spark.table("graft_spec_bkt").orderBy($"k")
      .as[(Long, Long)].collect().toSeq
    // drop the catalog entry to prove the warm path re-registers it
    // (one session benches several dataset dirs under one table name)
    spark.sql("DROP TABLE `graft_spec_bkt`")
    val second = graft.sources.BucketedStore.ensureBucketed(
      df, "graft_spec_bkt", "k", 4, s"$root/t")
    assert(second.isEmpty) // warm: no data write
    val rows2 = spark.table("graft_spec_bkt").orderBy($"k")
      .as[(Long, Long)].collect().toSeq
    assert(rows1 === rows2)
    // a recipe change (bucket count) must rebuild, not serve stale files
    val rebuilt = graft.sources.BucketedStore.ensureBucketed(
      df, "graft_spec_bkt", "k", 8, s"$root/t")
    assert(rebuilt.isDefined)
    spark.sql("DROP TABLE IF EXISTS `graft_spec_bkt`")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
