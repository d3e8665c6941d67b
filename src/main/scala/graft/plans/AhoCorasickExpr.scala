package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton over raw UTF-8 bytes — the scan
  * engine for BLOCKLIST-SIZED pattern sets (canary scans, contamination
  * phrase lists, PII keyword sweeps). [[ContainsAny]] probes each pattern
  * independently (O(n·k) for k patterns — right for the classifier's
  * ~dozen-lexeme lexicons); a 10k-entry blocklist at 100 TB needs the
  * automaton's O(n + matches), independent of k.
  *
  * Construction (driver-side, once per plan, in the companion factory so
  * only the finished tables are instance fields — the serialized form
  * shipped to executors carries gotoTab/outTab/patLens and nothing of the
  * build): byte-trie + BFS failure links with goto-table completion, so
  * the matching loop is a single array index per input byte — no
  * failure-chasing at scan time. Nodes are dense 256-way int arrays:
  * Σ|pattern| nodes × 1 KiB; fine into the tens of thousands of patterns
  * (a 10k × 20-byte list is ~200 MiB — past that, swap the node store for
  * a banded/double-array layout; the expression contract doesn't change).
  * The automaton ships to executors as a per-plan reference object, zero
  * per-row allocation except one long-array visit bitmap (count) or
  * int-array match map (redact) per row.
  *
  * Byte-level matching is exact for UTF-8: a pattern matches iff its
  * byte sequence appears, and UTF-8 is self-synchronizing for whole-
  * pattern byte matches (no false positives across code-point
  * boundaries for byte-identical needles).
  */
final class AcAutomaton private (
    private val gotoTab: Array[Array[Int]],
    private val outTab: Array[Array[Int]],
    private val patLens: Array[Int]) extends Serializable {

  def nPatterns: Int = patLens.length

  /** Number of DISTINCT patterns occurring in `u`. */
  def countDistinct(u: UTF8String): Int = {
    val bytes = u.getBytes
    val seen = new Array[Long]((nPatterns + 63) >> 6)
    var found = 0
    var s = 0
    var i = 0
    while (i < bytes.length && found < nPatterns) {
      s = gotoTab(s)(bytes(i) & 0xff)
      val out = outTab(s)
      var j = 0
      while (j < out.length) {
        val pid = out(j)
        if ((seen(pid >> 6) & (1L << (pid & 63))) == 0L) {
          seen(pid >> 6) |= 1L << (pid & 63)
          found += 1
        }
        j += 1
      }
      i += 1
    }
    found
  }

  /** LEFTMOST-LONGEST non-overlapping redaction: every greedy match is
    * replaced by `mask`, scanning resumes after the match (the regex-
    * engine / Hyperscan leftmost-longest policy). Two passes, O(n +
    * matches): pass 1 runs the automaton once recording, per start
    * offset, the LONGEST pattern starting there (matches surface at their
    * END state; start = end − len + 1); pass 2 walks left to right,
    * jumping over each chosen match. Replacement never rescans `mask`
    * bytes, so a mask containing a pattern cannot cascade. */
  def redact(u: UTF8String, mask: Array[Byte]): UTF8String = {
    val bytes = u.getBytes
    val n = bytes.length
    val best = new Array[Int](n) // longest match length starting at i
    var s = 0
    var i = 0
    var any = false
    while (i < n) {
      s = gotoTab(s)(bytes(i) & 0xff)
      val out = outTab(s)
      var j = 0
      while (j < out.length) {
        val len = patLens(out(j))
        val st = i - len + 1
        if (len > best(st)) { best(st) = len; any = true }
        j += 1
      }
      i += 1
    }
    if (!any) return u
    val buf = new java.io.ByteArrayOutputStream(n)
    i = 0
    while (i < n) {
      if (best(i) > 0) { buf.write(mask, 0, mask.length); i += best(i) }
      else { buf.write(bytes(i)); i += 1 }
    }
    UTF8String.fromBytes(buf.toByteArray)
  }

  /** TYPED leftmost-longest non-overlapping redaction: same greedy policy
    * as [[redact]], but each chosen match is replaced by ITS OWN pattern's
    * mask (`masks(pid)`) — the per-class scrub (`<EMAIL>` vs `<PHONE>`)
    * that lets downstream token accounting distinguish scrub types. The
    * per-offset winner additionally records WHICH pattern won; equal-
    * length ties at one offset are byte-identical patterns (impossible
    * under distinct patterns), so length alone decides. Same two passes,
    * same O(n + matches), mask bytes never rescanned. */
  def redactTyped(u: UTF8String, masks: Array[Array[Byte]]): UTF8String = {
    val bytes = u.getBytes
    val n = bytes.length
    val best = new Array[Int](n) // longest match length starting at i
    val who = new Array[Int](n)  // pattern id of that longest match
    var s = 0
    var i = 0
    var any = false
    while (i < n) {
      s = gotoTab(s)(bytes(i) & 0xff)
      val out = outTab(s)
      var j = 0
      while (j < out.length) {
        val pid = out(j)
        val len = patLens(pid)
        val st = i - len + 1
        if (len > best(st)) { best(st) = len; who(st) = pid; any = true }
        j += 1
      }
      i += 1
    }
    if (!any) return u
    val buf = new java.io.ByteArrayOutputStream(n)
    i = 0
    while (i < n) {
      if (best(i) > 0) {
        val m = masks(who(i))
        buf.write(m, 0, m.length)
        i += best(i)
      } else { buf.write(bytes(i)); i += 1 }
    }
    UTF8String.fromBytes(buf.toByteArray)
  }
}

object AcAutomaton {
  /** Build in a local scope: the mutable trie (next/outs/fail) dies here;
    * the returned automaton serializes only the completed goto/output
    * tables and pattern lengths (ADVICE r14: the build-time buffers were
    * instance fields, doubling the bytes shipped to every executor). */
  def apply(patterns: Array[Array[Byte]]): AcAutomaton = {
    val next = scala.collection.mutable.ArrayBuffer(new Array[Int](256))
    val outs = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    java.util.Arrays.fill(next(0), -1)
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xff
        if (next(s)(c) == -1) {
          next(s)(c) = next.size
          val row = new Array[Int](256); java.util.Arrays.fill(row, -1)
          next += row; outs += Nil
        }
        s = next(s)(c)
      }
      outs(s) = pid :: outs(s)
    }
    // BFS failure links; complete the goto function in place so the scan
    // never chases failures
    val fail = new Array[Int](next.size)
    val q = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      val t = next(0)(c)
      if (t == -1) next(0)(c) = 0
      else { fail(t) = 0; q.enqueue(t) }
    }
    while (q.nonEmpty) {
      val s = q.dequeue()
      outs(s) = outs(s) ::: outs(fail(s))
      (0 until 256).foreach { c =>
        val t = next(s)(c)
        if (t == -1) next(s)(c) = next(fail(s))(c)
        else { fail(t) = next(fail(s))(c); q.enqueue(t) }
      }
    }
    new AcAutomaton(next.toArray, outs.map(_.toArray).toArray, patterns.map(_.length))
  }
}

/** `ac_count_matches(text, patterns)` — number of DISTINCT literal
  * patterns that occur as substrings, via one Aho–Corasick pass. */
case class AcCountMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "ac_count_matches needs at least one pattern")

  @transient private lazy val ac: AcAutomaton =
    AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ac_count_matches requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    ac.countDistinct(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, "graft.plans.AcAutomaton")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $acRef.countDistinct($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): AcCountMatches =
    copy(child = newChild)
  override def prettyName: String = "ac_count_matches"
}

object AcCountMatches {
  import org.apache.spark.sql.graft.ColumnBridge
  def acCountMatches(c: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcCountMatches(ColumnBridge.expression(c), patterns))
}

/** `ac_redact(text, patterns, mask)` — the scrub a curation pipeline
  * actually APPLIES (counting alone flags rows; redaction rewrites them):
  * every leftmost-longest non-overlapping occurrence of any blocklist
  * pattern is replaced by `mask`, in one Aho–Corasick pass independent of
  * blocklist size. Codegen'd like [[AcCountMatches]]: the automaton is a
  * per-plan reference object, the per-row call is a single virtual
  * dispatch inside whole-stage codegen. */
case class AcRedact(child: Expression, patterns: Seq[String], mask: String)
    extends UnaryExpression {
  require(patterns.nonEmpty, "ac_redact needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "ac_redact patterns must be non-empty")

  @transient private lazy val ac: AcAutomaton =
    AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)
  @transient private lazy val maskBytes: Array[Byte] = mask.getBytes("UTF-8")

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ac_redact requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    ac.redact(v.asInstanceOf[UTF8String], maskBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, "graft.plans.AcAutomaton")
    val maskRef = ctx.addReferenceObj("mask", maskBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $acRef.redact($c, $maskRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): AcRedact =
    copy(child = newChild)
  override def prettyName: String = "ac_redact"
}

object AcRedact {
  import org.apache.spark.sql.graft.ColumnBridge
  def acRedact(c: Column, patterns: Seq[String], mask: String): Column =
    ColumnBridge.column(AcRedact(ColumnBridge.expression(c), patterns, mask))
}

/** `ac_redact_typed(text, patterns, masks)` — per-pattern-CLASS redaction
  * (ADVICE/VERDICT r15 gap #3): the leftmost-longest one-pass policy of
  * [[AcRedact]], but match i is replaced by `masks(i)` — `<EMAIL>` for the
  * email patterns, `<PHONE>` for the phone patterns — so a scrubbed corpus
  * still carries WHAT was scrubbed for downstream token accounting and
  * per-class audit (q342). Codegen'd identically: automaton + mask table
  * ride as per-plan reference objects, one virtual dispatch per row inside
  * whole-stage codegen. */
case class AcRedactTyped(child: Expression, patterns: Seq[String],
    masks: Seq[String]) extends UnaryExpression {
  require(patterns.nonEmpty, "ac_redact_typed needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "ac_redact_typed patterns must be non-empty")
  require(patterns.length == masks.length,
    "ac_redact_typed needs exactly one mask per pattern")
  require(patterns.distinct.length == patterns.length,
    "ac_redact_typed patterns must be distinct (equal-length ties would be ambiguous)")

  @transient private lazy val ac: AcAutomaton =
    AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)
  @transient private lazy val maskBytes: Array[Array[Byte]] =
    masks.map(_.getBytes("UTF-8")).toArray

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ac_redact_typed requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    ac.redactTyped(v.asInstanceOf[UTF8String], maskBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, "graft.plans.AcAutomaton")
    val masksRef = ctx.addReferenceObj("masks", maskBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $acRef.redactTyped($c, $masksRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): AcRedactTyped =
    copy(child = newChild)
  override def prettyName: String = "ac_redact_typed"
}

object AcRedactTyped {
  import org.apache.spark.sql.graft.ColumnBridge
  def acRedactTyped(c: Column, patterns: Seq[String], masks: Seq[String]): Column =
    ColumnBridge.column(AcRedactTyped(ColumnBridge.expression(c), patterns, masks))
}
