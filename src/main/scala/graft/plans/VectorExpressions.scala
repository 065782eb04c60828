package graft.plans

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two array<float|double> columns
  * (SURVEY.md §4): one tight loop per row accumulating dot product and
  * both norms in double precision, element order — numerically
  * identical to the three sequential HOF folds in
  * [[graft.functions.VectorFunctions.cosine]] (and to DuckDB's
  * list_cosine_similarity on DOUBLE[]), but ~20× faster than
  * interpreted lambda evaluation on million-pair dedup joins.
  * Implements doGenCode (same loop, generated), so dedup/ANN scoring
  * projections stay inside whole-stage codegen instead of falling back
  * to interpreted evaluation for the hottest expression in the plan.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def get(arr: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${get(a, elemType(left) == FloatType)};
         |  double $y = ${get(b, elemType(right) == FloatType)};
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native symmetric int8 quantization over array<float|double> —
  * numerically identical to the HOF formulation in
  * [[graft.functions.VectorFunctions.int8Quantize]]
  * (floor(x · (127/max|x|) + 0.5), zero/empty vectors → zeros) but two
  * passes per row instead of the HOF's per-ELEMENT re-evaluation of the
  * max|x| subexpression (O(d²) interpreted work per row, the dominant
  * cost of quantization-heavy plans). Codegen'd, so quantization stays
  * inside whole-stage codegen.
  */
case class Int8Quantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
      if (x > ma) ma = x
      i += 1
    }
    val out = new Array[Long](n)
    if (ma > 0) {
      val scale = 127.0 / ma
      i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = math.floor(x * scale + 0.5).toLong
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ma = ctx.freshName("ma")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val scale = ctx.freshName("scale")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $ma = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs($get);
         |  if ($x > $ma) $ma = $x;
         |}
         |long[] $out = new long[$n];
         |if ($ma > 0) {
         |  double $scale = 127.0 / $ma;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (long) java.lang.Math.floor($get * $scale + 0.5);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native integer dot product over two array<long> columns — exact long
  * accumulation in element order, the scoring kernel of the int8 ANN
  * recall stage (the HOF zip_with+aggregate form evaluates two
  * interpreted lambdas per element per candidate pair). */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  // null on length mismatch — the zip_with+aggregate HOF this replaces
  // null-pads mismatched arrays to a NULL score; silently truncating
  // would turn a dimension bug into a plausible-but-wrong number
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native random-hyperplane signature: bit p = sign of dot(v, plane p),
  * all planes in one pass over the vector per row. The HOF form pays an
  * interpreted zip_with+aggregate PER PLANE per row (planes × dim
  * lambda calls); here the plane matrix rides along as a referenced
  * object and the double loop is generated code. */
case class HyperplaneBits(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Int](planes.length)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val d = math.min(n, plane.length)
      var dot = 0.0
      var i = 0
      while (i < d) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        dot += x * plane(i)
        i += 1
      }
      out(p) = if (dot >= 0) 1 else 0
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val plane = ctx.freshName("plane")
      val out = ctx.freshName("out")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |int[] $out = new int[$planesRef.length];
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double[] $plane = $planesRef[$p];
         |  int $d = java.lang.Math.min($n, $plane.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $dot += $get * $plane[$i];
         |  }
         |  $out[$p] = ($dot >= 0) ? 1 : 0;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorColumns {
  def cosine(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a), GraftShim.expression(b)))

  def hyperplaneBits(v: Column, planes: Array[Array[Double]]): Column =
    GraftShim.column(HyperplaneBits(GraftShim.expression(v), planes))

  def int8Quantize(v: Column): Column =
    GraftShim.column(Int8Quantize(GraftShim.expression(v)))

  def dotLong(a: Column, b: Column): Column =
    GraftShim.column(DotLong(GraftShim.expression(a), GraftShim.expression(b)))
}
