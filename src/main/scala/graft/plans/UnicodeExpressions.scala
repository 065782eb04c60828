package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels (NFC/NFKC + accent strip) — the
  * standard pre-hash normalization for multilingual corpora: without
  * it, composed ("é") and decomposed ("e" + U+0301) spellings of the
  * same text hash to different dedup keys. Native codegen'd
  * expressions around java.text.Normalizer; no UDF.
  *
  * Reference surface: polars' `str` namespace has no normalizer, so
  * users call Python `unicodedata` row-by-row
  * (polars_dataset.py:74-78 forwards everything); here it stays
  * scan-local inside whole-stage codegen.
  */
object UnicodeNorm {

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  def nfkc(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFKC))

  /** NFD → drop non-spacing marks → NFC: "Café" → "Cafe", "ø"/"æ"/"ß"
    * (no combining decomposition) pass through untouched — the same
    * contract as DuckDB/utf8proc strip_accents, which the q_normalize
    * oracle pins. Code-point iteration so non-BMP marks strip too. */
  def stripAccents(s: UTF8String): UTF8String = {
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}

/** form ∈ {NFC, NFKC}: canonical (always) / compatibility (also folds
  * ligatures, full-width forms, ℕ-style styled letters) composition. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(form == "NFC" || form == "NFKC", s"unsupported form $form")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    if (form == "NFC") UnicodeNorm.nfc(input.asInstanceOf[UTF8String])
    else UnicodeNorm.nfkc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (form == "NFC") "nfc" else "nfkc"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UnicodeNorm$$.MODULE$$.$m($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UnicodeNorm$$.MODULE$$.stripAccents($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeColumns {
  def nfc(c: Column): Column =
    GraftShim.column(UnicodeNormalize(GraftShim.expression(c), "NFC"))
  def nfkc(c: Column): Column =
    GraftShim.column(UnicodeNormalize(GraftShim.expression(c), "NFKC"))
  def stripAccents(c: Column): Column =
    GraftShim.column(StripAccents(GraftShim.expression(c)))
}
