package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions hook: registers the engine's native expressions as
  * SQL functions, so `spark.sql("SELECT simhash(text) ...")` works anywhere
  * the DataFrame API does. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (cluster-wide) or
  * `builder.withExtensions(new GraftExtensions)` — or inject into an already
  * running session with [[GraftFunctions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => JaccardBoundRule)
  }
}

object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, info, builder) for every engine-native SQL function. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash", info("simhash",
      "simhash(text[, n]) - 64-bit SimHash of the word n-gram features (n defaults to 1)"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => SimHash(c)
        case Seq(c, n) => SimHash(c, intLit(n, "simhash n-gram length"))
        case _ => throw new IllegalArgumentException("simhash expects 1 or 2 arguments")
      }),
    ("shingle_hashes", info("shingle_hashes",
      "shingle_hashes(cleaned_text, n) - sorted distinct 64-bit hashes of word n-gram shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(c, n) => ShingleHashes(c, intLit(n, "shingle length"))
        case _ => throw new IllegalArgumentException("shingle_hashes expects 2 arguments")
      }),
    ("minhash_signature", info("minhash_signature",
      "minhash_signature(hash_array, num_perm) - MinHash signature over shingle hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(c, p) => MinHashSignature(c, intLit(p, "numPerm"))
        case _ => throw new IllegalArgumentException("minhash_signature expects 2 arguments")
      }),
    ("jaccard_sorted", info("jaccard_sorted",
      "jaccard_sorted(a, b) - exact Jaccard of two sorted distinct array<long>"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => JaccardSorted(a, b)
        case _ => throw new IllegalArgumentException("jaccard_sorted expects 2 arguments")
      }),
    ("vec_dot", info("vec_dot",
      "vec_dot(a, b) - dot product of two array<float|double> vectors"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("vec_dot expects 2 arguments")
      }),
    ("vec_cosine", info("vec_cosine",
      "vec_cosine(a, b) - cosine similarity of two array<float|double> vectors"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CosineSim(a, b)
        case _ => throw new IllegalArgumentException("vec_cosine expects 2 arguments")
      }),
    ("nfc_normalize", info("nfc_normalize",
      "nfc_normalize(text) - Unicode canonical composition (NFC) of the string"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => NfcNormalize(c)
        case _ => throw new IllegalArgumentException("nfc_normalize expects 1 argument")
      }),
    ("clean_text", info("clean_text",
      "clean_text(text) - strip, drop astral codepoints, collapse whitespace (single scan)"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => CleanText(c)
        case _ => throw new IllegalArgumentException("clean_text expects 1 argument")
      }),
    ("jaro_winkler", info("jaro_winkler",
      "jaro_winkler(a, b) - Jaro-Winkler similarity (standard 0.7-threshold prefix boost)"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => JaroWinkler(a, b)
        case _ => throw new IllegalArgumentException("jaro_winkler expects 2 arguments")
      }),
    ("contains_any", info("contains_any",
      "contains_any(text, 'p1|p2|...') - true iff any literal pattern is a substring"),
      (args: Seq[Expression]) => args match {
        case Seq(c, p) => p match {
          case Literal(u: org.apache.spark.unsafe.types.UTF8String, _) =>
            ContainsAny(c, u.toString.split('|').toSeq)
          case other => throw new IllegalArgumentException(
            s"contains_any patterns must be a string literal, got $other")
        }
        case _ => throw new IllegalArgumentException("contains_any expects 2 arguments")
      }),
  )

  /** Register into a live session (tests / spark-shell after startup). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, name, i, builder)
    }
}
