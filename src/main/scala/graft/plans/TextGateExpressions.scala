package graft.plans

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native quality gate (SURVEY.md §4): the Column
  * formulation in [[graft.functions.TextFunctions.filterReason]] runs a
  * regexp_replace + split chain PER SIGNAL per document — four regex
  * scans of every document in the hottest pure-CPU query. This kernel
  * derives the identical signals in ONE code-point loop:
  *
  *  - word count = non-whitespace runs (== split("\\s+") minus empties),
  *  - mean word length = non-ws code points / max(words, 1)
  *    (== length(regexp_replace(text, "\\s+", ""))-based ratio),
  *  - symbol ratio = code points outside [a-zA-Z0-9\s] / max(len, 1),
  *  - stopword hits = exact token membership in the broadcast set,
  *
  * then applies the same rule order. Whitespace is Java's \s class
  * ([ \t\n\x0B\f\r]) and lengths count CODE POINTS (Spark's length()
  * semantics), so results are bit-identical to the Column form —
  * spec-pinned on real documents and generated edge cases.
  */
object TextGate {

  private val Ok = UTF8String.fromString("ok")
  private val TooShort = UTF8String.fromString("too_short")
  private val TooLong = UTF8String.fromString("too_long")
  private val WordLen = UTF8String.fromString("word_len")
  private val Symbols = UTF8String.fromString("symbols")
  private val NoStopwords = UTF8String.fromString("no_stopwords")

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'

  private def isAlnum(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9')

  /** The kernel — called from both interpreted eval and generated code. */
  def reason(
      input: UTF8String,
      minWords: Int, maxWords: Int,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxSymbolRatio: Double,
      stopwords: java.util.HashSet[String]): UTF8String = {
    val s = input.toString
    var totalCp = 0
    var nonWsCp = 0
    var symCp = 0
    var nWords = 0
    var stopHits = 0
    val token = new java.lang.StringBuilder(16)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      totalCp += 1
      if (isWs(cp)) {
        if (token.length > 0) {
          nWords += 1
          if (stopwords.contains(token.toString)) stopHits += 1
          token.setLength(0)
        }
      } else {
        nonWsCp += 1
        if (!isAlnum(cp)) symCp += 1
        token.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    if (token.length > 0) {
      nWords += 1
      if (stopwords.contains(token.toString)) stopHits += 1
    }
    val mwl = nonWsCp.toDouble / math.max(nWords, 1).toDouble
    val sym = symCp.toDouble / math.max(totalCp, 1).toDouble
    if (nWords < minWords) TooShort
    else if (nWords > maxWords) TooLong
    else if (mwl < minMeanWordLen || mwl > maxMeanWordLen) WordLen
    else if (sym > maxSymbolRatio) Symbols
    else if (stopHits == 0) NoStopwords
    else Ok
  }

  private def isPunct(cp: Int): Boolean =
    cp == '.' || cp == '!' || cp == '?' || cp == ',' || cp == ';' || cp == ':'

  /** The [[graft.operators.QualityModel]] feature vector in ONE
    * code-point pass — the Column formulation runs a regexp_replace or
    * split chain PER FEATURE per document (measured ~5× this kernel on
    * the sf0.1 documents). Same counters as [[reason]] plus the
    * punctuation-class count; every ratio reproduces its Column twin's
    * arithmetic bit-for-bit (int counts, the same max(·, 1) guards,
    * the same division order — spec-pinned in QualityFeaturesSpec):
    *
    *  0. length score   = min(words / 200.0, 1.0)
    *  1. punct ratio    = chars in [.!?,;:] / max(len, 1)
    *  2. stopword ratio = stopword tokens / max(words, 1)
    *  3. symbol ratio   = chars outside [a-zA-Z0-9\s] / max(len, 1)
    *  4. mean word len  = (non-ws chars / max(words, 1)) / 10.0
    */
  def features(
      input: UTF8String,
      stopwords: java.util.HashSet[String])
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = input.toString
    var totalCp = 0
    var nonWsCp = 0
    var symCp = 0
    var punctCp = 0
    var nWords = 0
    var stopHits = 0
    val token = new java.lang.StringBuilder(16)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      totalCp += 1
      if (isWs(cp)) {
        if (token.length > 0) {
          nWords += 1
          if (stopwords.contains(token.toString)) stopHits += 1
          token.setLength(0)
        }
      } else {
        nonWsCp += 1
        if (!isAlnum(cp)) symCp += 1
        if (isPunct(cp)) punctCp += 1
        token.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    if (token.length > 0) {
      nWords += 1
      if (stopwords.contains(token.toString)) stopHits += 1
    }
    val len = math.max(totalCp, 1).toDouble
    val words = math.max(nWords, 1).toDouble
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(
      math.min(nWords.toDouble / 200.0, 1.0),
      punctCp.toDouble / len,
      stopHits.toDouble / words,
      symCp.toDouble / len,
      (nonWsCp.toDouble / words) / 10.0))
  }
}

case class FilterReason(
    child: Expression,
    minWords: Int,
    maxWords: Int,
    minMeanWordLen: Double,
    maxMeanWordLen: Double,
    maxSymbolRatio: Double,
    stopwords: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.length * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any =
    TextGate.reason(v.asInstanceOf[UTF8String], minWords, maxWords,
      minMeanWordLen, maxMeanWordLen, maxSymbolRatio, stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stops", stopSet, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextGate.reason($c, $minWords, $maxWords, " +
        s"$minMeanWordLen, $maxMeanWordLen, $maxSymbolRatio, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class QualityFeatures(
    child: Expression,
    stopwords: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = false)

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.length * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any =
    TextGate.features(v.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stops", stopSet, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c => s"graft.plans.TextGate.features($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextGateColumns {
  def filterReason(
      text: Column,
      minWords: Int, maxWords: Int,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxSymbolRatio: Double,
      stopwords: Seq[String]): Column =
    GraftShim.column(FilterReason(GraftShim.expression(text), minWords, maxWords,
      minMeanWordLen, maxMeanWordLen, maxSymbolRatio, stopwords))

  def qualityFeatures(text: Column, stopwords: Seq[String]): Column =
    GraftShim.column(QualityFeatures(GraftShim.expression(text), stopwords))
}
