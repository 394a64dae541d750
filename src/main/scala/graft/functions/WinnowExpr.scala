package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): rolling FNV hashes of character k-grams; keep the
  * minimum hash of each sliding window of w consecutive k-gram hashes
  * (rightmost minimum). The selected set is a position-robust
  * fingerprint — the rolling-hash variant of document fingerprinting
  * alongside the md5 exact fingerprint (text_fingerprint).
  */
case class WinnowHashArr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(WinnowHashArr.fingerprints(v.asInstanceOf[UTF8String], k, w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowHashArr.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cls.fingerprints($t, $k, $w));")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowHashArr {
  /** Sorted distinct winnowed fingerprint hashes. */
  def fingerprints(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return Array(hashRange(bytes, 0, n))
    val nGrams = n - k + 1
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { grams(i) = hashRange(bytes, i, i + k); i += 1 }
    if (nGrams <= w) {
      var m = grams(0); i = 1
      while (i < nGrams) { if (grams(i) <= m) m = grams(i); i += 1 }
      return Array(m)
    }
    // winnow: rightmost minimum of each window of w grams
    val sel = new scala.collection.mutable.ArrayBuffer[Long]()
    var prevPos = -1
    var start = 0
    while (start + w <= nGrams) {
      var mPos = start
      var j = start + 1
      while (j < start + w) { if (grams(j) <= grams(mPos)) mPos = j; j += 1 }
      if (mPos != prevPos) { sel += grams(mPos); prevPos = mPos }
      start += 1
    }
    val out = sel.toArray
    java.util.Arrays.sort(out)
    var wr = 0; var r = 0
    while (r < out.length) {
      if (wr == 0 || out(r) != out(wr - 1)) { out(wr) = out(r); wr += 1 }
      r += 1
    }
    if (wr == out.length) out else java.util.Arrays.copyOf(out, wr)
  }

  private def hashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = TextHash.FnvOffset
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= TextHash.FnvPrime; i += 1 }
    h
  }
}

object WinnowOps {
  def winnow(text: Column, k: Int = 5, w: Int = 4): Column =
    Shims.column(WinnowHashArr(Shims.expression(text), k, w))
}
