package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.plans.{GraftFunctions, MinHashImpl, SimHashImpl}

/** The engine's native expressions exposed as SQL functions (registered via
  * SparkSessionExtensions on session creation, or GraftFunctions.registerAll
  * on a live session). */
class GraftSqlSpec extends SparkSpec {

  GraftFunctions.registerAll(spark)

  test("simhash SQL = direct impl; shingled form takes the n argument") {
    val r = spark.sql("SELECT simhash('a b c') AS s1, simhash('a b c', 2) AS s2").collect()(0)
    assert(r.getLong(0) == SimHashImpl.simhash64(UTF8String.fromString("a b c")))
    assert(r.getLong(1) == SimHashImpl.simhash64(UTF8String.fromString("a b c"), 2))
    assert(r.getLong(0) != r.getLong(1))
  }

  test("shingle_hashes + minhash_signature + jaccard_sorted compose in SQL") {
    val r = spark.sql(
      """SELECT
        |  size(shingle_hashes('the quick brown fox', 3)) AS n_sh,
        |  size(minhash_signature(shingle_hashes('the quick brown fox', 3), 16)) AS n_sig,
        |  jaccard_sorted(shingle_hashes('a b c d', 2), shingle_hashes('a b c e', 2)) AS j
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2)  // 4 tokens, 3-gram → 2 shingles
    assert(r.getInt(1) == 16)
    // shingles(2): {a b, b c, c d} vs {a b, b c, c e} → 2/4
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
  }

  test("vec_dot / vec_cosine over SQL array literals") {
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c1,
        |  vec_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c0
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2)) < 1e-12)
  }

  test("nfc_normalize SQL function: composes decomposed sequences, NFC-stable") {
    // 'cafe' + combining acute (decomposed, 5 codepoints) -> composed 4
    val r = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') AS c, nfc_normalize('caf\u00e9') AS d, " +
        "length(nfc_normalize('cafe\u0301')) AS n, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS z").collect()(0)
    assert(r.getString(0) == "caf\u00e9")
    assert(r.getString(1) == "caf\u00e9")
    assert(r.getInt(2) == 4)
    assert(r.isNullAt(3))
  }

  test("clean_text / contains_any SQL functions") {
    val r = spark.sql(
      "SELECT clean_text('  hola \t mundo  ') AS c, " +
        "contains_any('we love it', 'love|great|good') AS hit, " +
        "contains_any('meh', 'love|great|good') AS miss").collect()(0)
    assert(r.getString(0) == "hola mundo")
    assert(r.getBoolean(1) && !r.getBoolean(2))
  }

  test("near-dup pipeline expressible in pure SQL over the documents table") {
    spark.read.parquet(sf() + "/documents.parquet").createOrReplaceTempView("docs_sql")
    val n = spark.sql(
      """WITH d AS (SELECT doc_id,
        |    shingle_hashes(trim(regexp_replace(regexp_replace(trim(text),
        |      '[\\x{10000}-\\x{10FFFF}]', ''), '\\s+', ' ')), 3) AS shh
        |  FROM docs_sql),
        |f AS (SELECT * FROM d WHERE size(shh) > 0)
        |SELECT count(*) FROM f""".stripMargin).collect()(0).getLong(0)
    assert(n > 0)
  }

  test("JaccardBoundRule injects the implied size bound; results and semantics unchanged") {
    import org.apache.spark.sql.functions._
    import graft.plans.{JaccardBoundRule, MinHashExprs}
    import graft.functions.TextExprs
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"),
        MinHashExprs.shingleHashes(TextExprs.cleanText(col("text")), 3).as("shh"))
      .where(size(col("shh")) > 0)
    val pairs = docs.as("a").crossJoin(docs.as("b").withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("shh", "shh_b"))
      .where(col("doc_id") < col("doc_b")).limit(500)
      .where(MinHashExprs.jaccardSorted(col("shh"), col("shh_b")) >= 0.7)
    val before = pairs.queryExecution.optimizedPlan
    val after = JaccardBoundRule(before)
    assert(after.toString.contains("size("), "size bound must be conjoined")
    assert(JaccardBoundRule(after).fastEquals(after), "rule must be idempotent")
    val viaRule = org.apache.spark.sql.graft.ColumnBridge.ofRows(spark, after)
      .select("doc_id", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = pairs.select("doc_id", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaRule == direct)
  }

  test("jaccardSorted impl: disjoint, identical, empty edge cases") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Long*) = new GenericArrayData(xs.toArray)
    assert(MinHashImpl.jaccardSorted(arr(1L, 2L), arr(3L, 4L)) == 0.0)
    assert(MinHashImpl.jaccardSorted(arr(1L, 2L), arr(1L, 2L)) == 1.0)
    assert(MinHashImpl.jaccardSorted(arr(), arr()) == 0.0)
    assert(MinHashImpl.jaccardSorted(arr(), arr(1L)) == 0.0)
  }
}
