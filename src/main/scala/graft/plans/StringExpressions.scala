package graft.plans

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-literal replacement (the polars
  * `str.replace_many` operation, reference surface via
  * polars_dataset.py:74-78 forwarding).
  *
  * A chained `replace(replace(...))` scans the document once PER
  * PATTERN — O(n · |patterns|), the same shape that made the literal
  * BPE chain impractical at a 50k merge table. This kernel walks a
  * prefix trie instead: one left-to-right pass, O(maxPatternLen) work
  * per position, INDEPENDENT of pattern count — a 10k-entry
  * blocklist costs the same scan as a 3-entry one.
  *
  * Match semantics: leftmost match wins; at the same start position
  * the LONGEST pattern wins; matches never overlap (scanning resumes
  * after the replaced span); on duplicate patterns the first binding
  * wins. For pattern sets whose matches cannot overlap (no nonempty
  * suffix of one pattern is a prefix of another, no pattern contains
  * another) this is bit-identical to the chained-replace formulation —
  * the property the q_replace_many oracle pins.
  */
final class TrieReplacer(patterns: Array[String], replacements: Array[String])
    extends Serializable {
  require(patterns.length == replacements.length,
    "patterns and replacements must align")
  require(patterns.nonEmpty, "at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern would match everywhere")

  // flat trie: per-node char→child maps + the replacement index that
  // ends at this node (-1 = none). Built once driver-side, broadcast
  // with the expression; ~O(total pattern chars) memory.
  private val children = new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
  private val outs = new java.util.ArrayList[Integer]()
  private def newNode(): Int = {
    children.add(new java.util.HashMap[Character, Integer]())
    outs.add(Integer.valueOf(-1))
    children.size() - 1
  }
  locally {
    newNode() // root = 0
    var p = 0
    while (p < patterns.length) {
      val pat = patterns(p)
      var node = 0
      var i = 0
      while (i < pat.length) {
        val c = Character.valueOf(pat.charAt(i))
        var next = children.get(node).get(c)
        if (next == null) {
          next = Integer.valueOf(newNode())
          children.get(node).put(c, next)
        }
        node = next.intValue()
        i += 1
      }
      if (outs.get(node).intValue() < 0) outs.set(node, Integer.valueOf(p))
      p += 1
    }
  }

  def replaceAll(input: UTF8String): UTF8String = {
    val s = input.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      // longest match starting at i: walk the trie until it dead-ends
      var node = 0
      var j = i
      var best = -1
      var bestEnd = -1
      var walking = true
      while (walking && j < s.length) {
        val next = children.get(node).get(Character.valueOf(s.charAt(j)))
        if (next == null) walking = false
        else {
          node = next.intValue()
          j += 1
          val o = outs.get(node).intValue()
          if (o >= 0) { best = o; bestEnd = j }
        }
      }
      if (best >= 0) { sb.append(replacements(best)); i = bestEnd }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Extraction dual of [[replaceAll]]: the ordered list of matches
    * under the SAME walk (leftmost, longest-at-position,
    * non-overlapping) — so a pattern set behaves identically whether
    * it is being redacted out or surveyed. */
  def extractAll(input: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = input.toString
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < s.length) {
      var node = 0
      var j = i
      var best = -1
      var bestEnd = -1
      var walking = true
      while (walking && j < s.length) {
        val next = children.get(node).get(Character.valueOf(s.charAt(j)))
        if (next == null) walking = false
        else {
          node = next.intValue()
          j += 1
          val o = outs.get(node).intValue()
          if (o >= 0) { best = o; bestEnd = j }
        }
      }
      if (best >= 0) { out.add(UTF8String.fromString(patterns(best))); i = bestEnd }
      else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  /** Boolean membership probe under the same automaton: does ANY
    * pattern occur? EARLY-EXITS on the first hit — a blocklist scan
    * over clean documents walks the whole text, but a hit near the
    * head costs only the prefix, unlike counting every match. A
    * "first match at position i" here is exactly "extractAll
    * non-empty" (any match implies a first one), so the two kernels
    * cannot disagree. */
  def containsAny(input: UTF8String): Boolean = {
    val s = input.toString
    var i = 0
    while (i < s.length) {
      var node = 0
      var j = i
      var walking = true
      while (walking && j < s.length) {
        val next = children.get(node).get(Character.valueOf(s.charAt(j)))
        if (next == null) walking = false
        else {
          node = next.intValue()
          j += 1
          if (outs.get(node).intValue() >= 0) return true
        }
      }
      i += 1
    }
    false
  }
}

/** Catalyst face of [[TrieReplacer]]: the automaton is built once and
  * shipped as a codegen reference object, so the generated code is a
  * single virtual call per row — whole-stage codegen stays intact. */
case class ReplaceMany(
    child: Expression,
    patterns: Seq[String],
    replacements: Seq[String]) extends UnaryExpression {

  @transient private lazy val replacer =
    new TrieReplacer(patterns.toArray, replacements.toArray)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    replacer.replaceAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trieReplacer", replacer,
      classOf[TrieReplacer].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.replaceAll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** polars `str.extract_many`: every trie match in document order as
  * an array<string> — keyword surveying / blocklist auditing with the
  * same one-pass cost shape as [[ReplaceMany]] (O(maxPatternLen) per
  * position, independent of pattern count). */
case class ExtractMany(
    child: Expression,
    patterns: Seq[String]) extends UnaryExpression {

  @transient private lazy val replacer =
    new TrieReplacer(patterns.toArray, patterns.toArray)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    replacer.extractAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trieExtractor", replacer,
      classOf[TrieReplacer].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.extractAll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Boolean trie probe (polars `str.contains_any`): one automaton walk
  * with early exit on the first hit — a 10k-phrase blocklist costs
  * what 3 phrases do, and a match near the document head costs only
  * the prefix. */
case class ContainsAny(
    child: Expression,
    patterns: Seq[String]) extends UnaryExpression {

  @transient private lazy val replacer =
    new TrieReplacer(patterns.toArray, patterns.toArray)

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    replacer.containsAny(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trieProber", replacer,
      classOf[TrieReplacer].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.containsAny($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringColumns {
  /** Ordered (pattern → replacement) pairs — a Seq, not a Map, so
    * duplicate-pattern priority is explicit and deterministic. */
  def replaceMany(c: Column, pairs: Seq[(String, String)]): Column =
    GraftShim.column(ReplaceMany(
      GraftShim.expression(c), pairs.map(_._1), pairs.map(_._2)))

  /** All matches of a literal set in document order (leftmost,
    * longest-at-position, non-overlapping — the [[replaceMany]]
    * walk). */
  def extractMany(c: Column, patterns: Seq[String]): Column =
    GraftShim.column(ExtractMany(GraftShim.expression(c), patterns))

  /** Does the text contain ANY of the literals? (polars
    * `str.contains_any`) — early-exit boolean dual of
    * [[extractMany]]. */
  def containsAny(c: Column, patterns: Seq[String]): Column =
    GraftShim.column(ContainsAny(GraftShim.expression(c), patterns))
}
