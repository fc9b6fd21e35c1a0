package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
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
}
