package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.plans.SimHashImpl
import org.apache.spark.unsafe.types.UTF8String

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different text about spark query engines and distributed joins"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),   // exact dup of 0
    (4L, "short text"),
  ).toDF("doc_id", "text")

  test("exactGroups collapses exact duplicates") {
    val g = Dedup.exactGroups(corpus, col("doc_id"), col("text"))
    assert(g.count() == 4) // 0&3 share a hash
    val dup = g.where(col("n_copies") === 2).collect()(0)
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("shingles + jaccard") {
    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("s"))
    val m = sh.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(0L).head == "the quick brown")
    assert(m(4L).isEmpty) // 2 tokens < 3
    val j = corpus.as("a").where(col("doc_id") === 0)
      .crossJoin(corpus.as("b").where(col("b.doc_id") === 1))
      .select(Dedup.jaccard(
        Dedup.shingles(col("a.text"), 3), Dedup.shingles(col("b.text"), 3)))
      .collect()(0).getDouble(0)
    assert(j > 0.7 && j < 1.0)
  }

  test("minhashNearDups finds the near-dup pair and not the unrelated ones") {
    val pairs = Dedup.minhashNearDups(corpus, col("doc_id"), col("text"),
      shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L))) // exact dup → jaccard 1
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("shingleHashes: hash-set Jaccard equals string-set Jaccard; sorted distinct") {
    import graft.plans.MinHashExprs
    import graft.functions.TextExprs
    val withSets = corpus.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"),
      MinHashExprs.shingleHashes(TextExprs.cleanText(col("text")), 3).as("shh"))
    val m = withSets.collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[Long](2))).toMap
    // same cardinality per doc, sorted ascending, no dups
    m.values.foreach { case (sh, shh) =>
      assert(sh.toSet.size == shh.length)
      assert(shh == shh.sorted && shh.distinct.length == shh.length)
    }
    // pairwise jaccard equal (hash collisions would need 2^-64 luck)
    val pair = withSets.as("a").where(col("doc_id") === 0)
      .crossJoin(withSets.as("b").where(col("b.doc_id") === 1))
      .select(
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("js"),
        MinHashExprs.jaccardSorted(col("a.shh"), col("b.shh")).as("jh"))
      .collect()(0)
    assert(math.abs(pair.getDouble(0) - pair.getDouble(1)) < 1e-12)
  }

  test("minhashSignature: deterministic, near-dups collide on more bands than strangers") {
    import graft.plans.MinHashExprs
    import graft.functions.TextExprs
    val sigs = corpus.select(col("doc_id"),
        MinHashExprs.minhashSignature(
          MinHashExprs.shingleHashes(TextExprs.cleanText(col("text")), 3), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(3L)) // exact dup → identical signature
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(0L), sigs(1L)) > agree(sigs(0L), sigs(2L))) // near-dup >> unrelated
  }

  test("ngramJaccardPairs finds the near-dup pair via min-shingle blocking") {
    val pairs = Dedup.ngramJaccardPairs(corpus, col("doc_id"), col("text"),
      shingleLen = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("native cosine/dot match the HOF fold bit-for-bit") {
    import graft.functions.VectorExprs
    import graft.plans.VectorNative
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet").limit(50)
      .select(col("vec_id"), col("embedding"))
    val a = vecs.as("a"); val b = vecs.as("b")
    val hofCos = {
      val na = VectorExprs.norm(col("a.embedding")); val nb = VectorExprs.norm(col("b.embedding"))
      val dot = org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.zip_with(
          VectorExprs.toDouble(col("a.embedding")), VectorExprs.toDouble(col("b.embedding")),
          (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      org.apache.spark.sql.functions.when(na === 0.0 || nb === 0.0, lit(0.0))
        .otherwise(dot / (na * nb))
    }
    val diffs = a.crossJoin(b)
      .select(hofCos.as("h"), VectorNative.cosine(col("a.embedding"), col("b.embedding")).as("n"))
      .where(col("h") =!= col("n"))
    assert(diffs.count() == 0)
  }

  test("simhash: identical → distance 0; near-dup → small hamming; unrelated → large") {
    def h(s: String) = SimHashImpl.simhash64(UTF8String.fromString(s))
    assert(h("a b c") == h("a b c"))
    val d01 = java.lang.Long.bitCount(h(corpus.collect()(0).getString(1)) ^ h(corpus.collect()(1).getString(1)))
    val d02 = java.lang.Long.bitCount(h(corpus.collect()(0).getString(1)) ^ h(corpus.collect()(2).getString(1)))
    assert(d01 < d02)
    val pairs = Dedup.simhashNearDups(corpus, col("doc_id"), col("text"), maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("SimHash expression survives codegen and matches eval") {
    val viaExpr = corpus.select(graft.plans.SimHash.simhash(col("text"))).collect().map(_.getLong(0))
    val direct = corpus.collect().map(r => SimHashImpl.simhash64(UTF8String.fromString(r.getString(1))))
    assert(viaExpr.toSeq == direct.toSeq)
  }

  test("simhashMd5: single-shingle signature IS the md5 prefix; big-endian bit order") {
    // one 3-token doc = one shingle = every vote is that shingle's bit, so
    // the signature must equal md5's first 8 bytes read big-endian — pins
    // the exact bit convention the DuckDB oracle twin reproduces
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("a b c".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val expected = (0 until 8).foldLeft(0L)((h, i) => (h << 8) | (d(i) & 0xFFL))
    assert(SimHashImpl.simhashMd5(UTF8String.fromString("a b c"), 3) == expected)
  }

  test("SimHashMd5 expression survives codegen and matches eval") {
    val viaExpr = corpus
      .select(graft.plans.SimHash.simhashMd5Shingled(col("text"), 3)).collect().map(_.getLong(0))
    val direct = corpus.collect().map(r => SimHashImpl.simhashMd5(UTF8String.fromString(r.getString(1)), 3))
    assert(viaExpr.toSeq == direct.toSeq)
  }

  test("simhashNearDupsExact equals brute-force all-pairs (pigeonhole completeness)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val blocked = Dedup.simhashNearDupsExact(docs, col("doc_id"), col("text"),
        maxHamming = 7, shingleLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = docs
      .select(col("doc_id"), graft.functions.TextExprs.cleanText(col("text")).as("cln"))
      .where(size(split(col("cln"), " ")) >= 3)
      .select(col("doc_id"), graft.plans.SimHash.simhashMd5Shingled(col("cln"), 3).as("sig"))
    val brute = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("h"))
      .where(col("h") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == brute)
    assert(brute.nonEmpty, "test corpus should contain at least one near-dup pair")
  }

  test("Curate: drops exact dup, near-dup (higher id), and filler; keeps canonical docs") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today and more text follows here to pass quality"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight and more text follows here to pass quality"), // near-dup of 0
      (2L, "a completely different story about spark engines with many long words that should be kept in the corpus for training runs"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank today and more text follows here to pass quality"), // exact dup of 0
      (4L, "n/a"), // filler → und/low quality
    ).toDF("doc_id", "text")
    val curated = graft.operators.Curate.curate(docs, col("doc_id"), col("text"),
        minQuality = 0.3, langs = Seq("en"), nearDupThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated.contains(0L) && curated.contains(2L))
    assert(!curated.contains(3L), "exact dup must collapse to min id")
    assert(!curated.contains(1L), "near-dup higher id must drop")
    assert(!curated.contains(4L), "filler/low-quality must drop")
  }

  test("embeddingNearDups finds planted duplicate vectors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (1L, Array(0.99f, 0.01f, 0.0f, 0.1f)), // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    ).toDF("id", "v")
    val pairs = Dedup.embeddingNearDups(vecs, col("id"), col("v"),
      threshold = 0.95, nPlanes = 8, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("bruteForceTopK: self is rank 1 with cos ~ 1") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val top = Similarity.bruteForceTopK(emb.where(col("id") < 3), emb, 3)
    val r1 = top.where(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("corpus_id")).toMap
    assert(r1 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    assert(top.where(col("rank") === 1).select(min("cos")).collect()(0).getDouble(0) > 0.999999)
  }

  test("bruteForceTopKAgg == bruteForceTopK; partial aggregation combines map-side") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val q = emb.where(col("id") < 5)
    val viaAgg = Similarity.bruteForceTopKAgg(q, emb, 3)
      .select("query_id", "corpus_id", "rank")
    val viaWindow = Similarity.bruteForceTopK(q, emb, 3)
      .select("query_id", "corpus_id", "rank")
    assert(viaAgg.except(viaWindow).count() == 0 && viaWindow.except(viaAgg).count() == 0)
    // two ObjectHashAggregate nodes = partial (pre-shuffle, bounded to k
    // rows per key) + final — the whole point of the custom Aggregator
    val plan = Similarity.bruteForceTopKAgg(q, emb, 3).queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan.take(1200))
  }

  test("ivfTopK with full probe = brute force; partial probe has decent recall") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val q = emb.where(col("id") < 5)
    val bf = Similarity.bruteForceTopK(q, emb, 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val fullProbe = Similarity.ivfTopK(q, emb, 3, nCells = 8, nProbe = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    assert(fullProbe == bf) // probing every cell == exact
    val partial = Similarity.ivfTopK(q, emb, 3, nCells = 8, nProbe = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    assert(partial.intersect(bf).size >= bf.size / 2)
  }
}
