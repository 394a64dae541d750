package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * Re-expresses the distance kernels of the reference's hnswlib index
  * (reference: src/database/vector_index.py:107-210 — cosine / l2 / ip
  * spaces) as codegen'd Spark expressions: sequential left-to-right
  * double accumulation, which is both fast (no boxing, whole-stage
  * codegen) and bit-reproducible against an unrolled SQL oracle.
  */
trait VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  /** Codegen element accessor, e.g. `a.getFloat(i)`. */
  protected def cGet(v: String, t: DataType, i: String): String = t match {
    case FloatType => s"(double) $v.getFloat($i)"
    case _         => s"$v.getDouble($i)"
  }
}

/** dot(a, b) accumulated in double, left-to-right. */
case class DotD(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += get(a, ta, i) * get(b, tb, i); i += 1 }
    dot
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ta, tb) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += (${cGet(a, ta, i)}) * (${cGet(b, tb, i)});
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Asymmetric sign-quantized dot: Σ_i (a_i >= 0 ? +b_i : −b_i) — the
  * scalar twin of BinaryQuant.asymLut/asymScore (query stays float,
  * corpus contributes only sign bits). Accumulation is BYTE-BLOCKED to
  * match the LUT path bit-exactly: terms group in 8s (j-ascending
  * inside a group), groups fold in ascending order — the same
  * parenthesization the byte-LUT serve path and the SQL twin use. */
case class AsymSignDotD(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var blk = 0
    while (blk < n) {
      val end = math.min(blk + 8, n)
      var g = 0.0; var j = blk
      while (j < end) {
        val x = get(a, ta, j); val y = get(b, tb, j)
        g += (if (x >= 0.0) y else -y)
        j += 1
      }
      acc += g; blk += 8
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ta, tb) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val blk = ctx.freshName("blk")
      val end = ctx.freshName("end"); val j = ctx.freshName("j")
      val g = ctx.freshName("g"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $blk = 0; $blk < $n; $blk += 8) {
         |  int $end = java.lang.Math.min($blk + 8, $n);
         |  double $g = 0.0;
         |  for (int $j = $blk; $j < $end; $j++) {
         |    double $x = ${cGet(a, ta, j)}; double $y = ${cGet(b, tb, j)};
         |    $g += ($x >= 0.0) ? $y : -$y;
         |  }
         |  $acc += $g;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine similarity = dot/(||a||·||b||), one fused pass. */
case class CosineSimD(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, ta, i); val y = get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ta, tb) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${cGet(a, ta, i)}; double $y = ${cGet(b, tb, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** squared L2 distance = Σ (a_i − b_i)². hnswlib's 'l2' space returns
  * the squared distance (reference: vector_index.py:141 converts it via
  * 1/(1+d)). */
case class L2SqD(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = get(a, ta, i) - get(b, tb, i); s += d * d; i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ta, tb) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (${cGet(a, ta, i)}) - (${cGet(b, tb, i)});
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** FP16 round-trip of a float vector — the reference's storage
  * compression (vector_index.py:87-97: float32→float16→float32 before
  * indexing). JDK17 has no Float.floatToFloat16, so the IEEE 754
  * binary16 conversion (round-to-nearest-even) is implemented here.
  */
object Fp16 {
  def floatToHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val e = (bits >>> 23) & 0xff
    val m = bits & 0x7fffff
    if (e == 0xff) { // Inf / NaN
      (sign | 0x7c00 | (if (m != 0) 0x200 | (m >> 13) else 0)).toShort
    } else {
      val newExp = e - 127 + 15
      if (newExp >= 0x1f) (sign | 0x7c00).toShort // overflow → ±Inf
      else if (newExp <= 0) {
        if (newExp < -10) sign.toShort // underflow → ±0
        else {
          val mm = m | 0x800000
          val shift = 14 - newExp
          val half = mm >>> shift
          val rem = mm & ((1 << shift) - 1)
          val halfway = 1 << (shift - 1)
          val r = if (rem > halfway || (rem == halfway && (half & 1) == 1)) half + 1 else half
          (sign | r).toShort
        }
      } else {
        val half = (newExp << 10) | (m >> 13)
        val rem = m & 0x1fff
        val r = if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) half + 1 else half
        (sign | r).toShort // mantissa carry rolls into the exponent correctly
      }
    }
  }

  def halfToFloat(h: Short): Float = {
    val hh = h & 0xffff
    val e = (hh >> 10) & 0x1f
    val m = hh & 0x3ff
    if (e == 0) {
      val v = m * 5.9604645e-8f // subnormal: m × 2⁻²⁴
      if ((hh & 0x8000) != 0) -v else v
    } else if (e == 0x1f) {
      if (m == 0) { if ((hh & 0x8000) != 0) Float.NegativeInfinity else Float.PositiveInfinity }
      else Float.NaN
    } else {
      java.lang.Float.intBitsToFloat(((hh & 0x8000) << 16) | ((e - 15 + 127) << 23) | (m << 13))
    }
  }

  def round(f: Float): Float = halfToFloat(floatToHalf(f))
}

/** array<float> → array<float> with each element FP16-round-tripped. */
case class Fp16RoundArr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = Fp16.round(a.getFloat(i)); i += 1 }
    new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fp16 = Fp16.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $fp16.round($a.getFloat($i));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** INT8 affine quantization round-trip (reference: base_embedder.py
  * QuantizationType.INT8): per-vector min/max affine map to 0..255 and
  * back — 4× storage compression simulation, max error (max−min)/510.
  */
case class Int8RoundArr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    new GenericArrayData(Int8RoundArr.round(a))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Int8RoundArr.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cls.round($a));")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Int8RoundArr {
  def round(a: ArrayData): Array[Float] = {
    val n = a.numElements()
    val out = new Array[Float](n)
    if (n == 0) return out
    var mn = Float.MaxValue; var mx = Float.MinValue
    var i = 0
    while (i < n) {
      val x = a.getFloat(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    if (mx == mn) {
      i = 0; while (i < n) { out(i) = mn; i += 1 }
      return out
    }
    val scale = (mx - mn) / 255.0f
    i = 0
    while (i < n) {
      // explicit floor(v + 0.5f) (all float32) rather than Math.round:
      // JDK9+ Math.round is exact nearest-int, which a SQL oracle
      // cannot reproduce; floor-after-float-add is identical to
      // DuckDB's floor((x-mn)/scale + 0.5::REAL) by construction
      val q = math.floor(((a.getFloat(i) - mn) / scale) + 0.5f).toInt
      out(i) = mn + q * scale
      i += 1
    }
    out
  }
}

/** array<float|double> → array<long> sign-bit code: bit j of word
  * j/64 is set iff v(j) >= 0 — the 8-bytes-per-64-dims column a
  * deployment PERSISTS next to (or instead of) the float embedding.
  * Identical packing to BinaryQuant.signCode, so codes written by this
  * expression replay through the same byte-LUT / AsymCodeDotD scoring. */
case class SignCodeL(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      if (x >= 0.0) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val w = ctx.freshName("w")
      s"""
         |int $n = $a.numElements();
         |long[] $w = new long[($n + 63) >>> 6];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (((double) $a.$getter($i)) >= 0.0) $w[$i >>> 6] |= 1L << ($i & 63);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Asymmetric sign dot read DIRECTLY from a persisted code word
  * (array<long>, SignCodeL packing): Σ_i (bit i of code ? +q_i : −q_i),
  * byte-blocked exactly like AsymSignDotD / BinaryQuant.asymScore —
  * terms group in 8s (j-ascending inside), groups fold b-ascending —
  * so a candidate scan over the 8-byte code column is bit-equal to the
  * float-path asym score and the same SQL twin grades both. */
case class AsymCodeDotD(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private def qIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val code = l.asInstanceOf[ArrayData]; val q = r.asInstanceOf[ArrayData]
    val n = math.min(q.numElements(), code.numElements() << 6)
    var acc = 0.0; var blk = 0
    while (blk < n) {
      val end = math.min(blk + 8, n)
      var g = 0.0; var j = blk
      while (j < end) {
        val y = if (qIsFloat) q.getFloat(j).toDouble else q.getDouble(j)
        g += (if (((code.getLong(j >>> 6) >>> (j & 63)) & 1L) == 1L) y else -y)
        j += 1
      }
      acc += g; blk += 8
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (qIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val blk = ctx.freshName("blk")
      val end = ctx.freshName("end"); val j = ctx.freshName("j")
      val g = ctx.freshName("g"); val y = ctx.freshName("y")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($b.numElements(), $a.numElements() << 6);
         |double $acc = 0.0;
         |for (int $blk = 0; $blk < $n; $blk += 8) {
         |  int $end = java.lang.Math.min($blk + 8, $n);
         |  double $g = 0.0;
         |  for (int $j = $blk; $j < $end; $j++) {
         |    double $y = (double) $b.$getter($j);
         |    $g += ((($a.getLong($j >>> 6) >>> ($j & 63)) & 1L) == 1L) ? $y : -$y;
         |  }
         |  $acc += $g;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API entry points. */
object VectorOps {
  private def col(e: Expression): Column = Shims.column(e)
  private def ex(c: Column): Expression = Shims.expression(c)

  def dot(a: Column, b: Column): Column = col(DotD(ex(a), ex(b)))
  def asymSignDot(a: Column, b: Column): Column = col(AsymSignDotD(ex(a), ex(b)))
  def signCode(a: Column): Column = col(SignCodeL(ex(a)))
  def asymCodeDot(code: Column, q: Column): Column = col(AsymCodeDotD(ex(code), ex(q)))
  def cosineSim(a: Column, b: Column): Column = col(CosineSimD(ex(a), ex(b)))
  def l2Sq(a: Column, b: Column): Column = col(L2SqD(ex(a), ex(b)))
  def fp16(a: Column): Column = col(Fp16RoundArr(ex(a)))
  def int8(a: Column): Column = col(Int8RoundArr(ex(a)))
}
