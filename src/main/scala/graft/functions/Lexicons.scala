package graft.functions

/** Classification lexicons, re-expressed from the reference's demo analyzer.
  *
  * Semantics derive from /root/reference/survey_analysis.py:
  *  - FILLER_VALUES        (survey_analysis.py:60)
  *  - DEMO_KEYWORDS        (survey_analysis.py:63-70)  ordered category table
  *  - fallback pos/neg     (survey_analysis.py:131-134) lexicon sentiment
  *  - SENTIMENT_ORDER      (survey_analysis.py:57)
  *
  * All matching is *substring* containment on the lowercased answer
  * (`k in low`), which we express as an unanchored regex alternation so the
  * whole classifier stays inside Catalyst codegen (no UDF). The same
  * alternation strings are reused verbatim to generate the DuckDB oracle SQL,
  * guaranteeing Spark/oracle parity by construction.
  */
object Lexicons {

  val SentimentOrder: Seq[String] = Seq("Positive", "Neutral", "Negative", "Mixed")

  /** survey_analysis.py:60 — values (after trim+lower) meaning "no feedback".
    * `""` and `" "` both reduce to `""` after trim. */
  val FillerValues: Seq[String] =
    Seq("", "n/a", "na", "no", "none", "null", "nan", "sin comentarios", "ninguno", "-")

  /** survey_analysis.py:63-70 — ordered (category, keywords); first hit wins. */
  val DemoKeywords: Seq[(String, Seq[String])] = Seq(
    "Price"    -> Seq("price", "expensive", "too expensive", "cheap", "cost", "pricing",
                      "value", "caro", "barato", "precio"),
    "Shipping" -> Seq("ship", "shipping", "delivery", "arrive", "delay", "delayed", "late",
                      "envío", "envio", "tarde", "demor", "entrega"),
    "Quality"  -> Seq("quality", "material", "durable", "break", "defect", "defecto", "calidad"),
    "Fit"      -> Seq("fit", "size", "sizing", "tight", "loose", "talla", "ajuste",
                      "grande", "chico"),
    "Design"   -> Seq("design", "style", "color", "look", "diseño", "estilo", "colores"),
    "Support"  -> Seq("support", "help", "service", "refund", "return", "soporte",
                      "atención", "atencion", "reembolso", "devolución", "devolucion"),
  )

  /** survey_analysis.py:131-132 — fallback positive lexicon. */
  val PositiveWords: Seq[String] = Seq(
    "love", "loved", "great", "liked it", "like it", "good", "so good", "excellent",
    "amazing", "encanta", "muy bueno", "bueno", "me gustó", "gustaron", "genial",
    "excelente")

  /** survey_analysis.py:133-134 — fallback negative lexicon. */
  val NegativeWords: Seq[String] = Seq(
    "bad", "poor", "terrible", "awful", "hate", "malo", "expensive", "too expensive",
    "caro", "carísimo", "tarde", "defecto", "delay", "delayed", "late")

  /** survey_analysis.py:126 — mixed-sentiment contrast markers. */
  val MixedMarkers: Seq[String] = Seq("but", "aunque", "pero")

  /** Unanchored alternation implementing `any(k in low for k in kws)`.
    * Keywords are plain letters/spaces/accents, so no regex escaping is
    * required; assert that so a future edit can't silently break it. */
  def alternation(words: Seq[String]): String = {
    require(words.forall(_.forall(c => c.isLetterOrDigit || c == ' ' || c == '/')),
      s"lexicon word needs regex escaping: ${words.find(!_.forall(c => c.isLetterOrDigit || c == ' ' || c == '/'))}")
    words.mkString("|")
  }

  val positiveAlt: String = alternation(PositiveWords)
  val negativeAlt: String = alternation(NegativeWords)
  val mixedAlt: String = alternation(MixedMarkers)
  val categoryAlts: Seq[(String, String)] = DemoKeywords.map { case (c, kws) => c -> alternation(kws) }

  // ---- Text-analysis lexicons (engine extensions; not from the reference) ----

  /** Tiny per-language stopword sets for the n-gram/stopword language-ID
    * heuristic. Deliberately small: the heuristic must be cheap enough to run
    * as a pure regex-count expression over 100 TB of text. */
  val StopwordsEn: Seq[String] = Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for")
  val StopwordsEs: Seq[String] = Seq("el", "la", "de", "que", "y", "los", "las", "una", "por", "como")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich")
  val StopwordsFr: Seq[String] = Seq("le", "les", "des", "est", "une", "dans", "pour", "que", "pas", "sur")

  def wordAlternation(words: Seq[String]): String = "\\b(" + words.mkString("|") + ")\\b"
}
