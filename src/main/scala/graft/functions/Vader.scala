package graft.functions

import java.util.Locale
import scala.collection.mutable.ArrayBuffer

/** VADER compound-sentiment scorer — Hutto & Gilbert, "VADER: A Parsimonious
  * Rule-based Model for Sentiment Analysis of Social Media Text" (ICWSM-14).
  *
  * The reference's demo sentiment branch scores each answer with VADER's
  * compound polarity (survey_analysis.py:118-127); the shipped golden
  * workbook and memo cache are VADER-scored. This is a from-the-paper port
  * of the published rule set (vaderSentiment 3.3.2 semantics) so offline
  * demo mode reproduces those artifacts bit-for-bit:
  *
  *  - token stream = whitespace split, leading/trailing punctuation stripped
  *    unless the stripped form is ≤ 2 chars (emoticon guard);
  *  - per-token valence from the lexicon, modified by: ALL-CAPS emphasis
  *    (±0.733 when the text mixes cases), up-to-3-preceding booster words
  *    (±0.293, dampened ×0.95/×0.9 by distance), negations (×-0.74,
  *    including "no"-chains, n't contractions, "never so/this" ×1.25),
  *    special idioms, trailing "least";
  *  - contrastive "but": valences before ×0.5, after ×1.5;
  *  - punctuation emphasis: "!"×0.292 (≤4), "??"-"???" ×0.18, 4+ → 0.96;
  *  - compound = sum / sqrt(sum² + 15), clamped to [-1, 1].
  *
  * Quirk fidelity (kept deliberately — the artifacts were produced by them):
  * the but-rescale resolves each value to its FIRST occurrence index, so
  * duplicate valences rescale the first duplicate repeatedly; the
  * "never so/this" check at distance 3 fires on "so"/"this" at distance 1
  * regardless of "never". The emoji→description pass (vaderSentiment.py:
  * 238-252) is ported for the keys that can actually fire: the Python loop
  * probes the emoji dict one CODEPOINT at a time, so only single-codepoint
  * keys ever match (1212 of 3569 entries; the multi-codepoint rest are
  * dead). The pipeline's clean_text strips astral codepoints before
  * sentiment runs, but 169 single-codepoint keys are BMP (☺ ❤ ✌ …) and
  * survive it — those convert exactly as the reference does.
  *
  * The LEXICON is data, not code: 7.5k published (word → mean-valence)
  * ratings loaded at runtime via [[loadLexicon]] and shipped to executors
  * inside the expression (one ~100 KB reference object per plan, not per
  * row — same posture as a broadcast dimension).
  */
object Vader {

  val BIncr = 0.293
  val BDecr = -0.293
  val CIncr = 0.733
  val NScalar = -0.74

  private val Negate: Set[String] = Set(
    "aint", "arent", "cannot", "cant", "couldnt", "darent", "didnt", "doesnt",
    "ain't", "aren't", "can't", "couldn't", "daren't", "didn't", "doesn't",
    "dont", "hadnt", "hasnt", "havent", "isnt", "mightnt", "mustnt", "neither",
    "don't", "hadn't", "hasn't", "haven't", "isn't", "mightn't", "mustn't",
    "neednt", "needn't", "never", "none", "nope", "nor", "not", "nothing", "nowhere",
    "oughtnt", "shant", "shouldnt", "uhuh", "wasnt", "werent",
    "oughtn't", "shan't", "shouldn't", "uh-uh", "wasn't", "weren't",
    "without", "wont", "wouldnt", "won't", "wouldn't", "rarely", "seldom", "despite")

  private val BoosterDict: Map[String, Double] = {
    val incr = Seq(
      "absolutely", "amazingly", "awfully", "completely", "considerable", "considerably",
      "decidedly", "deeply", "effing", "enormous", "enormously", "entirely", "especially",
      "exceptional", "exceptionally", "extreme", "extremely", "fabulously", "flipping",
      "flippin", "frackin", "fracking", "fricking", "frickin", "frigging", "friggin",
      "fully", "fuckin", "fucking", "fuggin", "fugging", "greatly", "hella", "highly",
      "hugely", "incredible", "incredibly", "intensely", "major", "majorly", "more",
      "most", "particularly", "purely", "quite", "really", "remarkably", "so",
      "substantially", "thoroughly", "total", "totally", "tremendous", "tremendously",
      "uber", "unbelievably", "unusually", "utter", "utterly", "very")
    val decr = Seq(
      "almost", "barely", "hardly", "just enough", "kind of", "kinda", "kindof",
      "kind-of", "less", "little", "marginal", "marginally", "occasional",
      "occasionally", "partly", "scarce", "scarcely", "slight", "slightly",
      "somewhat", "sort of", "sorta", "sortof", "sort-of")
    (incr.map(_ -> BIncr) ++ decr.map(_ -> BDecr)).toMap
  }

  private val SpecialCases: Map[String, Double] = Map(
    "the shit" -> 3, "the bomb" -> 3, "bad ass" -> 1.5, "badass" -> 1.5,
    "bus stop" -> 0.0, "yeah right" -> -2, "kiss of death" -> -1.5,
    "to die for" -> 3, "beating heart" -> 3.5)

  /** word → mean valence (plus the single-codepoint emoji → description
    * dict); serializable, shipped inside the expression. */
  final class Lexicon(val valence: java.util.HashMap[String, java.lang.Double],
      val emoji: java.util.HashMap[String, String])
      extends Serializable {
    def this(valence: java.util.HashMap[String, java.lang.Double]) =
      this(valence, new java.util.HashMap[String, String]())
    @inline def get(w: String): java.lang.Double = valence.get(w)
    @inline def contains(w: String): Boolean = valence.containsKey(w)
    override def toString: String =
      s"VaderLexicon(${valence.size} words, ${emoji.size} emojis)"
  }

  /** Parse the published lexicon format: `word\tmeasure\t...` per line.
    * If a sibling `emoji_utf8_lexicon.txt` exists next to the word lexicon
    * (it ships in the same package directory), its emoji dict loads too. */
  def loadLexicon(path: String): Lexicon = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().foreach { line =>
      val l = line.trim
      if (l.nonEmpty) {
        val parts = l.split("\t")
        if (parts.length >= 2) m.put(parts(0), parts(1).toDouble)
      }
    } finally src.close()
    val sibling = new java.io.File(
      new java.io.File(path).getParentFile, "emoji_utf8_lexicon.txt")
    val e = if (sibling.isFile) loadEmojiLexicon(sibling.getPath)
            else new java.util.HashMap[String, String]()
    new Lexicon(m, e)
  }

  /** Parse `emoji\tdescription` per line, keeping only SINGLE-CODEPOINT
    * keys: the reference's conversion loop (vaderSentiment.py:241-242)
    * probes the dict one codepoint at a time, so multi-codepoint entries
    * can never match and are dead weight. */
  def loadEmojiLexicon(path: String): java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().foreach { line =>
      val l = line.trim
      if (l.nonEmpty) {
        val parts = l.split("\t")
        if (parts.length >= 2 && parts(0).codePointCount(0, parts(0).length) == 1)
          m.put(parts(0), parts(1).trim)
      }
    } finally src.close()
    m
  }

  /** The reference's emoji→description pass (vaderSentiment.py:238-252):
    * each codepoint with a dict entry is replaced by its description, a
    * space inserted before it unless the previous emitted char is a space;
    * `prev_space` is reset to false after a description, so back-to-back
    * emojis come out space-separated. Mirrored per codepoint (Python
    * strings iterate codepoints, not UTF-16 units). */
  private def convertEmojis(text: String, emoji: java.util.HashMap[String, String]): String = {
    if (emoji.isEmpty) return text
    val sb = new java.lang.StringBuilder(text.length)
    var prevSpace = true
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val n = Character.charCount(cp)
      val key = text.substring(i, i + n)
      val desc = emoji.get(key)
      if (desc != null) {
        if (!prevSpace) sb.append(' ')
        sb.append(desc)
        prevSpace = false
      } else {
        sb.append(key)
        prevSpace = cp == ' '
      }
      i += n
    }
    sb.toString
  }

  private val Punct = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".toSet

  /** Python `str.isupper`: has cased chars and none lowercase. */
  private def isUpperPy(s: String): Boolean = {
    var hasCased = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLowerCase(c) || Character.getType(c) == Character.TITLECASE_LETTER)
        return false
      if (Character.isUpperCase(c)) hasCased = true
      i += 1
    }
    hasCased
  }

  private def stripPuncIfWord(token: String): String = {
    var a = 0
    var b = token.length
    while (a < b && Punct(token.charAt(a))) a += 1
    while (b > a && Punct(token.charAt(b - 1))) b -= 1
    val stripped = token.substring(a, b)
    if (stripped.length <= 2) token else stripped
  }

  private def wordsAndEmoticons(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty).map(stripPuncIfWord)

  private def allcapDifferential(words: Array[String]): Boolean = {
    val allcap = words.count(isUpperPy)
    val diff = words.length - allcap
    0 < diff && diff < words.length
  }

  private def negatedWord(w: String): Boolean =
    Negate.contains(w) || w.contains("n't")

  private def scalarIncDec(word: String, valence: Double, isCapDiff: Boolean): Double = {
    val low = word.toLowerCase(Locale.ROOT)
    BoosterDict.get(low) match {
      case None => 0.0
      case Some(b) =>
        var scalar = if (valence < 0) -b else b
        if (isUpperPy(word) && isCapDiff)
          scalar += (if (valence > 0) CIncr else -CIncr)
        scalar
    }
  }

  private def negationCheck(valenceIn: Double, low: Array[String],
      startI: Int, i: Int): Double = {
    var valence = valenceIn
    if (startI == 0) {
      if (negatedWord(low(i - 1))) valence *= NScalar
    }
    if (startI == 1) {
      if (low(i - 2) == "never" && (low(i - 1) == "so" || low(i - 1) == "this"))
        valence *= 1.25
      else if (low(i - 2) == "without" && low(i - 1) == "doubt")
        ()
      else if (negatedWord(low(i - 2))) valence *= NScalar
    }
    if (startI == 2) {
      // published precedence quirk: the distance-1 "so"/"this" alternative
      // fires without "never" — kept (see scaladoc)
      if ((low(i - 3) == "never" && (low(i - 2) == "so" || low(i - 2) == "this")) ||
          (low(i - 1) == "so" || low(i - 1) == "this"))
        valence *= 1.25
      else if (low(i - 3) == "without" && (low(i - 2) == "doubt" || low(i - 1) == "doubt"))
        ()
      else if (negatedWord(low(i - 3))) valence *= NScalar
    }
    valence
  }

  private def specialIdiomsCheck(valenceIn: Double, low: Array[String], i: Int): Double = {
    var valence = valenceIn
    val onezero = s"${low(i - 1)} ${low(i)}"
    val twoonezero = s"${low(i - 2)} ${low(i - 1)} ${low(i)}"
    val twoone = s"${low(i - 2)} ${low(i - 1)}"
    val threetwoone = s"${low(i - 3)} ${low(i - 2)} ${low(i - 1)}"
    val threetwo = s"${low(i - 3)} ${low(i - 2)}"
    Seq(onezero, twoonezero, twoone, threetwoone, threetwo)
      .collectFirst { case s if SpecialCases.contains(s) => SpecialCases(s) }
      .foreach(valence = _)
    if (low.length - 1 > i) {
      val zeroone = s"${low(i)} ${low(i + 1)}"
      if (SpecialCases.contains(zeroone)) valence = SpecialCases(zeroone)
    }
    if (low.length - 1 > i + 1) {
      val zeroonetwo = s"${low(i)} ${low(i + 1)} ${low(i + 2)}"
      if (SpecialCases.contains(zeroonetwo)) valence = SpecialCases(zeroonetwo)
    }
    Seq(threetwoone, threetwo, twoone).foreach { g =>
      BoosterDict.get(g).foreach(b => valence += b)
    }
    valence
  }

  private def leastCheck(valenceIn: Double, low: Array[String], i: Int,
      lex: Lexicon): Double = {
    var valence = valenceIn
    if (i > 1 && !lex.contains(low(i - 1)) && low(i - 1) == "least") {
      if (low(i - 2) != "at" && low(i - 2) != "very") valence *= NScalar
    } else if (i > 0 && !lex.contains(low(i - 1)) && low(i - 1) == "least")
      valence *= NScalar
    valence
  }

  private def sentimentValence(wes: Array[String], low: Array[String], i: Int,
      isCapDiff: Boolean, lex: Lexicon): Double = {
    val itemLow = low(i)
    if (!lex.contains(itemLow)) 0.0
    else {
      var valence: Double = lex.get(itemLow)
      // "no" before a lexicon word negates it instead of scoring itself
      if (itemLow == "no" && i != wes.length - 1 && lex.contains(low(i + 1)))
        valence = 0.0
      if ((i > 0 && low(i - 1) == "no") ||
          (i > 1 && low(i - 2) == "no") ||
          (i > 2 && low(i - 3) == "no" && (low(i - 1) == "or" || low(i - 1) == "nor")))
        valence = lex.get(itemLow) * NScalar
      if (isUpperPy(wes(i)) && isCapDiff)
        valence += (if (valence > 0) CIncr else -CIncr)
      var startI = 0
      while (startI < 3) {
        if (i > startI && !lex.contains(low(i - (startI + 1)))) {
          var s = scalarIncDec(wes(i - (startI + 1)), valence, isCapDiff)
          if (startI == 1 && s != 0) s *= 0.95
          if (startI == 2 && s != 0) s *= 0.9
          valence += s
          valence = negationCheck(valence, low, startI, i)
          if (startI == 2) valence = specialIdiomsCheck(valence, low, i)
        }
        startI += 1
      }
      leastCheck(valence, low, i, lex)
    }
  }

  /** Python-list-faithful but-rescale: values resolve to their FIRST equal
    * occurrence (see scaladoc quirk note). */
  private def butCheck(low: Array[String], sentiments: ArrayBuffer[Double]): Unit = {
    val bi = low.indexOf("but")
    if (bi >= 0) {
      var k = 0
      while (k < sentiments.length) {
        val s = sentiments(k)
        val si = sentiments.indexOf(s)
        if (si < bi) sentiments(si) = s * 0.5
        else if (si > bi) sentiments(si) = s * 1.5
        k += 1
      }
    }
  }

  private def punctuationEmphasis(text: String): Double = {
    val ep = math.min(text.count(_ == '!'), 4) * 0.292
    val qm = text.count(_ == '?')
    val qmAmp = if (qm > 1) { if (qm <= 3) qm * 0.18 else 0.96 } else 0.0
    ep + qmAmp
  }

  /** The compound polarity in [-1, 1]; 0.0 for empty/valence-free text. */
  def compound(textIn: String, lex: Lexicon): Double = {
    if (textIn == null) return 0.0
    val text = convertEmojis(textIn, lex.emoji).trim
    val wes = wordsAndEmoticons(text)
    if (wes.isEmpty) return 0.0
    val low = wes.map(_.toLowerCase(Locale.ROOT))
    val isCapDiff = allcapDifferential(wes)
    val sentiments = new ArrayBuffer[Double](wes.length)
    var i = 0
    while (i < wes.length) {
      if (BoosterDict.contains(low(i))) sentiments += 0.0
      else if (i < wes.length - 1 && low(i) == "kind" && low(i + 1) == "of")
        sentiments += 0.0
      else sentiments += sentimentValence(wes, low, i, isCapDiff, lex)
      i += 1
    }
    butCheck(low, sentiments)
    var sum = 0.0
    sentiments.foreach(sum += _)
    val amp = punctuationEmphasis(text)
    if (sum > 0) sum += amp else if (sum < 0) sum -= amp
    val norm = sum / math.sqrt(sum * sum + 15.0)
    math.max(-1.0, math.min(1.0, norm))
  }
}
