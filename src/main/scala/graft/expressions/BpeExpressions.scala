package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-driven BPE segmentation kernel: GPT-2 pre-tokenization plus the
  * classic lowest-rank-pair merge loop per pre-token. This is the
  * SCALABLE application path for learned/loaded merge tables: the
  * replace-chain form ([[graft.operators.Bpe.applyMerges]]) inlines one
  * `replace` NODE per merge into the plan, which is codegen-friendly for
  * small tables but overflows the analyzer stack near ~1000 merges and
  * could never hold the published 50k-merge GPT-2 table; here the table
  * is a runtime reference object and the plan stays depth-1 regardless
  * of table size. Parity between the two paths (and the trainer's
  * incremental segmentation) is pinned in Gpt2MergesSpec — the rank
  * loop is equivalent to applying merges in rank order because a
  * merge's operand symbols can only be produced by LOWER-ranked merges.
  */
object BpeKernels {

  /** Compiled merge table: rank per raw symbol pair (keys are
    * `a + NUL + b` — symbols never contain NUL). Built once per
    * executor from the serialized wrapped-pair list. */
  final class Table(wrappedMerges: Seq[String]) extends Serializable {
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](wrappedMerges.size * 2)
      wrappedMerges.zipWithIndex.foreach { case (w, i) =>
        val parts = w.stripPrefix("{").stripSuffix("}").split("\\}\\{", -1)
        require(parts.length == 2, s"malformed wrapped merge: '$w'")
        m.putIfAbsent(parts(0) + "\u0000" + parts(1), i)
      }
      m
    }
    @transient lazy val prePattern: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(graft.functions.TextFunctions.Gpt2PrePattern)
  }

  /** Segment one pre-token with the classic loop: find the lowest-rank
    * adjacent pair, fuse all its occurrences left-to-right, repeat. */
  private def segmentWord(t: Table, word: String,
      out: java.util.ArrayList[UTF8String]): Unit = {
    var syms = new java.util.ArrayList[String](word.length)
    // seed symbols per CODE POINT, not UTF-16 char: the chain path's
    // regexp_replace("(?s)(.)") splits per code point, and per-char
    // seeding would shear supplementary chars (emoji, astral CJK) into
    // lone-surrogate symbols — invalid UTF8Strings and a path divergence
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      syms.add(new String(Character.toChars(cp)))
      ci += Character.charCount(cp)
    }
    var go = syms.size > 1
    while (go) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.size - 1) {
        val r = t.ranks.get(syms.get(i) + "\u0000" + syms.get(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) go = false
      else {
        val next = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          if (j < syms.size - 1 && {
            val r = t.ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
            r != null && r == best
          }) { next.add(syms.get(j) + syms.get(j + 1)); j += 2 }
          else { next.add(syms.get(j)); j += 1 }
        }
        syms = next
        go = syms.size > 1
      }
    }
    var k = 0
    while (k < syms.size) { out.add(UTF8String.fromString(syms.get(k))); k += 1 }
  }

  private def isAllSpaces(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) != ' ') return false; i += 1 }
    true
  }

  /** Pre-tokenize `text` (same pattern + drop-blank rule as
    * `TextFunctions.gpt2PreTokens`) and BPE-segment each pre-token. */
  def segmentText(t: Table, text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String](s.length / 3 + 4)
    val m = t.prePattern.matcher(s)
    while (m.find()) {
      val tok = m.group()
      // drop rule must replicate the chain path's Spark trim EXACTLY:
      // Spark trim strips only ASCII spaces, so a token is dropped iff
      // it is all-spaces. Java String.trim (the old form) also strips
      // \n/\t/etc — text with newlines segmented differently once the
      // table crossed ChainLimit (a silent behavior switch).
      if (!isAllSpaces(tok)) segmentWord(t, tok, out)
    }
    new GenericArrayData(out.toArray)
  }
}

/** `array<string>` of BPE subword symbols for a text column under a
  * fixed merge table — plan depth 1 for any table size; the table rides
  * along as a codegen reference object (the RegExpReplace pattern
  * idiom), so whole-stage codegen spans are preserved. */
case class BpeSegmentExpr(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  @transient private lazy val table = new BpeKernels.Table(merges)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"
  override def nullSafeEval(input: Any): Any =
    BpeKernels.segmentText(table, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeKernels.Table].getName)
    defineCodeGen(ctx, ev, in =>
      s"graft.expressions.BpeKernels.segmentText($ref, $in)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeSegmentExpr =
    copy(child = newChild)
}
