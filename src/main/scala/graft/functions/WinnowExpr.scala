package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): hashes of character k-grams; keep the minimum hash of
  * each sliding window of w consecutive k-gram hashes (rightmost
  * minimum, unsigned order). The selected set is a position-robust
  * fingerprint — the k-gram variant of document fingerprinting
  * alongside the md5 exact fingerprint (text_fingerprint).
  *
  * K-grams are CHARACTER substrings hashed by md5Lower64 and compared
  * unsigned — exactly `md5_number_lower(substr(text, i, k))` under
  * UBIGINT order in DuckDB, so the whole construction has a bit-exact
  * SQL twin (textWinnowSql).
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
    val n = s.numChars()
    if (n < k) return Array(TextHash.md5Lower64(s.getBytes))
    val nGrams = n - k + 1
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      grams(i) = TextHash.md5Lower64(s.substring(i, i + k).getBytes)
      i += 1
    }
    if (nGrams <= w) {
      var m = grams(0); i = 1
      while (i < nGrams) {
        if (java.lang.Long.compareUnsigned(grams(i), m) <= 0) m = grams(i)
        i += 1
      }
      return Array(m)
    }
    // winnow: rightmost minimum (unsigned) of each window of w grams
    val sel = new scala.collection.mutable.ArrayBuffer[Long]()
    var prevPos = -1
    var start = 0
    while (start + w <= nGrams) {
      var mPos = start
      var j = start + 1
      while (j < start + w) {
        if (java.lang.Long.compareUnsigned(grams(j), grams(mPos)) <= 0) mPos = j
        j += 1
      }
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
}

object WinnowOps {
  def winnow(text: Column, k: Int = 5, w: Int = 4): Column =
    Shims.column(WinnowHashArr(Shims.expression(text), k, w))
}
