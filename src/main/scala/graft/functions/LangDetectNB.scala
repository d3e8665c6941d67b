package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Charset n-gram Naive-Bayes language ID — the langdetect algorithm
  * (Shuyo Nakatani's language-detection library; survey_analysis.py:95-103
  * calls its Python port as a print-only diagnostic) re-expressed
  * deterministically on the PUBLISHED profile data:
  *
  *  - profiles (1..3-gram frequency maps + per-order totals) load at
  *    runtime from the langdetect package directory, exactly like the VADER
  *    lexicon — published data, never baked into the binary;
  *  - detection is a log-space NB over ALL extracted grams with langdetect's
  *    additive smoothing (alpha / BASE_FREQ = 0.5 / 10000 = 5e-5), instead
  *    of the library's 7 gaussian-jittered random-sampling trials — the
  *    deterministic limit of the same scorer (no seed, no trial variance);
  *  - text is case-folded and restricted to Latin-1 letters before gram
  *    extraction (the library keeps case as a capitalization feature; the
  *    fold trades that signal for an engine-neutral normalization both
  *    Spark and DuckDB reproduce bit-for-bit);
  *  - per-gram log-likelihoods are ×10⁶-pinned to exact LONGs ONCE on the
  *    driver and materialized as a model parquet that BOTH engines read —
  *    the lexicon-twin pattern, so scores are order-free integer sums and
  *    the DuckDB oracle never re-derives a logarithm.
  *
  * At 100 TB the model is a ~100k-row broadcast table and scoring is one
  * executor-side pass per document — no shuffle carries text.
  */
object LangDetectNB {

  /** langdetect's smoothing weight: alpha / BASE_FREQ. */
  private val Smooth = 0.5 / 10000.0
  /** Detection cap, both engines (the library caps at 10k; 4k keeps the
    * oracle's position table bounded). */
  val MaxChars = 4000
  /** Profile languages loaded (label 'zh' ← profile 'zh-cn'). */
  val Langs: Seq[(String, String)] = Seq(
    "de" -> "de", "en" -> "en", "es" -> "es", "fr" -> "fr",
    "it" -> "it", "nl" -> "nl", "pt" -> "pt", "zh" -> "zh-cn")

  def profilesDir: String = sys.env.getOrElse("GRAFT_LANGDETECT_PROFILES",
    "/root/reference/.venv/lib/python3.9/site-packages/langdetect/profiles")

  def modelPath: String = sys.env.getOrElse("GRAFT_LANGNB_MODEL",
    "/root/repo/target/langnb/model.parquet")

  /** One profile: gram → count, plus the three per-order totals. */
  private case class Profile(freq: Map[String, Long], nWords: Array[Long])

  private def loadProfile(path: String): Profile = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File(path))
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    val it = root.get("freq").fields()
    while (it.hasNext) { val e = it.next(); freq(e.getKey) = e.getValue.asLong() }
    val nw = root.get("n_words")
    Profile(freq.toMap, Array(nw.get(0).asLong, nw.get(1).asLong, nw.get(2).asLong))
  }

  /** The dense integer model: every union gram × every language, weight =
    * round(ln(Smooth + freq/n_words[|g|−1]) · 1e6). Computed once per JVM. */
  lazy val model: (Array[String], Map[String, Array[Long]]) = {
    val profiles = Langs.map { case (label, file) =>
      label -> loadProfile(s"$profilesDir/$file")
    }
    val langs = profiles.map(_._1).toArray
    val grams = profiles.iterator.flatMap(_._2.freq.keysIterator).toSet
    val m = grams.iterator.map { g =>
      val ws = profiles.map { case (_, p) =>
        val prob = p.freq.getOrElse(g, 0L).toDouble / p.nWords(g.length - 1)
        math.round(math.log(Smooth + prob) * 1e6)
      }.toArray
      g -> ws
    }.toMap
    (langs, m)
  }

  /** Materialize the model for the DuckDB twin; one write per JVM (lazy —
    * concurrent queries in the bench warm-up pool serialize on it). */
  lazy val ensureModelWritten: String = synchronized {
    val spark = SparkSession.active
    val (langs, m) = model
    val rows = m.iterator.flatMap { case (g, ws) =>
      langs.indices.iterator.map(i => (g, langs(i), ws(i)))
    }.toSeq
    spark.createDataFrame(rows).toDF("gram", "lang", "w")
      .coalesce(1).write.mode("overwrite").parquet(modelPath)
    modelPath
  }

  /** Engine-neutral normalization: case-fold, keep Latin-1 letters, collapse
    * separators, cap, pad. MUST stay in lockstep with the SQL twin. */
  def normalize(text: String): String = {
    val core = Option(text).getOrElse("")
      .toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-zà-öø-ÿ]+", " ")
      .trim
    " " + core.take(MaxChars) + " "
  }

  /** All 1..3-gram OCCURRENCES with at most a leading space (the library's
    * buffer resets at word boundaries, so grams never carry interior or
    * trailing spaces). */
  def grams(s: String): Iterator[String] =
    (1 to 3).iterator.flatMap { n =>
      (0 to s.length - n).iterator.map(i => s.substring(i, i + n))
        .filter(g => g.charAt(g.length - 1) != ' ' && !g.substring(1).contains(' '))
    }

  /** Predict one document: (label, matched-gram occurrences). 'unknown'
    * when no gram is in the model; ties break to the smallest label. */
  def predict(text: String): (String, Long) = {
    val (langs, m) = model
    val scores = new Array[Long](langs.length)
    var matched = 0L
    grams(normalize(text)).foreach { g =>
      m.get(g) match {
        case Some(ws) =>
          matched += 1
          var i = 0
          while (i < ws.length) { scores(i) += ws(i); i += 1 }
        case None =>
      }
    }
    if (matched == 0) ("unknown", 0L)
    else {
      var best = 0
      var i = 1
      while (i < langs.length) {
        if (scores(i) > scores(best) ||
          (scores(i) == scores(best) && langs(i) < langs(best))) best = i
        i += 1
      }
      (langs(best), matched)
    }
  }

  /** Distributed prediction over (doc_id, lang, text): executor-side pass,
    * model ships once per executor via the closure (≈ a broadcast — the
    * lazy re-materializes from the profile files on each executor JVM; in
    * local mode it is shared). */
  def withPrediction(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    ensureModelWritten
    docs.select(col("doc_id").cast("long"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, lang, text) =>
        val (pred, n) = predict(text)
        (id, lang, pred, n)
      })
      .toDF("doc_id", "lang", "pred", "n_grams")
  }
}
