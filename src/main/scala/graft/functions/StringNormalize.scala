package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode-normalization kernels (`graft_nfc`, `graft_nfkc`,
  * `graft_strip_accents`) — the canonicalization pass a text-dedup pipeline
  * runs BEFORE hashing/shingling, so that composed ("é" U+00E9) and
  * decomposed ("e"+U+0301) spellings of the same text dedupe together
  * instead of surviving as spurious "distinct" documents.
  *
  * Spark ships no normalization builtin (reference behavior:
  * the stage projection models canonicalize names before joins), so this is
  * the custom-`Expression` escape hatch of SURVEY.md §7.3: a null-safe unary
  * over UTF8String with whole-stage codegen (`doGenCode` emits a static call
  * — no lambda, no UDF serialization, stays inside the codegen'd stage).
  * The hot path delegates to `java.text.Normalizer` (ICU-equivalent NFC/NFKC
  * tables shipped with the JDK); accent stripping is NFD + combining-mark
  * removal, matching DuckDB's `strip_accents` (utf8proc) on the Latin range
  * the oracle pins.
  */
object StringNormalize {
  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  def nfkc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFKC))

  def stripAccents(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val c = d.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }
}

abstract class StringNormalizeExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument")
    }

  /** Static method on [[StringNormalize]] the codegen call sites target. */
  protected def kernel: String

  override protected def nullSafeEval(input: Any): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringNormalize.$kernel($c)")
}

case class NfcNormalize(child: Expression) extends StringNormalizeExpression {
  override def prettyName: String = "graft_nfc"
  override protected def kernel: String = "nfc"
  override protected def nullSafeEval(input: Any): Any =
    StringNormalize.nfc(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

case class NfkcNormalize(child: Expression) extends StringNormalizeExpression {
  override def prettyName: String = "graft_nfkc"
  override protected def kernel: String = "nfkc"
  override protected def nullSafeEval(input: Any): Any =
    StringNormalize.nfkc(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): NfkcNormalize = copy(child = c)
}

case class StripAccents(child: Expression) extends StringNormalizeExpression {
  override def prettyName: String = "graft_strip_accents"
  override protected def kernel: String = "stripAccents"
  override protected def nullSafeEval(input: Any): Any =
    StringNormalize.stripAccents(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): StripAccents = copy(child = c)
}
