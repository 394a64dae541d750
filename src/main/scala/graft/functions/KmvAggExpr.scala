package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Bottom-k DISTINCT values of a long (hash) column per group — the KMV
  * (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM'02; Beyer et al., SIGMOD'07): keep the k smallest distinct
  * hash values; the k-th smallest estimates the distinct count as
  * (k−1)·2⁶³ div h_k over a [0, 2⁶³) hash space — all-integer, so the
  * whole sketch (and its estimate) is exactly reproducible in a SQL
  * twin, unlike HLL's float registers.
  *
  * Why an aggregate and not a window rank: this is the 100 TB shape —
  * each task folds its partition into a ≤k-long buffer (map-side
  * partial), partials MERGE associatively (bottom-k of a union = merged
  * bottom-ks), and only vocabulary-of-groups × k longs ever shuffle.
  * `count(DISTINCT x)` at the same scale shuffles every distinct value;
  * the sketch shuffles k per group, with the k-th-hash certificate of
  * what it kept. Buffer ops are O(log k) search + O(k) move on the
  * (tiny, primitive) sorted array — no boxing, no hash set.
  */
case class KmvBottomKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBottomKAgg.Buf] {
  import KmvBottomKAgg.Buf

  require(k > 0, "kmv sketch size must be positive")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Buf = Buf(new Array[Long](k), 0)

  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v == null) return b
    insert(b, v.asInstanceOf[Long])
    b
  }

  private def insert(b: Buf, h: Long): Unit = {
    if (b.n == k && h >= b.vals(k - 1)) return // can't enter the bottom-k
    val pos = java.util.Arrays.binarySearch(b.vals, 0, b.n, h)
    if (pos >= 0) return // already present: DISTINCT semantics
    val ins = -pos - 1
    val last = if (b.n < k) b.n else k - 1
    var i = last
    while (i > ins) { b.vals(i) = b.vals(i - 1); i -= 1 }
    b.vals(ins) = h
    if (b.n < k) b.n += 1
  }

  override def merge(b: Buf, o: Buf): Buf = {
    var i = 0
    while (i < o.n) { insert(b, o.vals(i)); i += 1 }
    b
  }

  override def eval(b: Buf): Any =
    new GenericArrayData(java.util.Arrays.copyOf(b.vals, b.n))

  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val vals = new Array[Long](k)
    var i = 0
    while (i < n) { vals(i) = bb.getLong; i += 1 }
    Buf(vals, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvBottomKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvBottomKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KmvBottomKAgg {
  /** Sorted ascending prefix vals[0, n); n ≤ k. */
  case class Buf(vals: Array[Long], var n: Int)
}

object KmvOps {
  /** Bottom-k distinct longs of `h` per group, sorted ascending. */
  def kmvBottomK(h: Column, k: Int): Column =
    Shims.column(KmvBottomKAgg(Shims.expression(h), k).toAggregateExpression())
}

/** Bounded TOP-K (score desc, id asc) aggregate — the 100 TB shape for
  * "the k best per group": each task folds its partition into a ≤k
  * buffer (map-side partial), partials merge associatively (the global
  * top-k of a union is the top-k of merged top-ks — unique because
  * (score, id) is a total order), and only groups × k rows shuffle. A
  * window row_number over the same input shuffles EVERY candidate row
  * to sort it; this shuffles k. Output: array<struct<score,vid>> in
  * rank order, so rank = position. */
case class TopKScoreAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKScoreAgg.Buf] {
  import TopKScoreAgg.Buf

  require(k > 0, "top-k size must be positive")
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("vid", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Buf =
    Buf(new Array[Double](k), new Array[Long](k), 0)

  override def update(b: Buf, row: InternalRow): Buf = {
    val s = score.eval(row); val i = id.eval(row)
    if (s == null || i == null) return b
    insert(b, s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  /** Keep b sorted by (score desc, id asc); O(k) move per entering row,
    * O(1) reject once full. */
  private def insert(b: Buf, s: Double, i: Long): Unit = {
    if (b.n == k) {
      val ws = b.sc(k - 1); val wi = b.id(k - 1)
      if (s < ws || (s == ws && i > wi)) return
    }
    var pos = b.n
    while (pos > 0 && (s > b.sc(pos - 1) || (s == b.sc(pos - 1) && i < b.id(pos - 1)))) pos -= 1
    val last = if (b.n < k) b.n else k - 1
    var j = last
    while (j > pos) { b.sc(j) = b.sc(j - 1); b.id(j) = b.id(j - 1); j -= 1 }
    if (pos < k) { b.sc(pos) = s; b.id(pos) = i }
    if (b.n < k) b.n += 1
  }

  override def merge(b: Buf, o: Buf): Buf = {
    var i = 0
    while (i < o.n) { insert(b, o.sc(i), o.id(i)); i += 1 }
    b
  }

  override def eval(b: Buf): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = InternalRow(b.sc(i), b.id(i)); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.sc(i)); bb.putLong(b.id(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val sc = new Array[Double](k); val id = new Array[Long](k)
    var i = 0
    while (i < n) { sc(i) = bb.getDouble; id(i) = bb.getLong; i += 1 }
    Buf(sc, id, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKScoreAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKScoreAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

object TopKScoreAgg {
  /** Rank-ordered prefix (score desc, id asc) of length n ≤ k. */
  case class Buf(sc: Array[Double], id: Array[Long], var n: Int)
}

object TopKAggOps {
  /** Top-k (score desc, id asc) per group as a rank-ordered struct
    * array — rank = 1 + position. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Shims.column(TopKScoreAgg(Shims.expression(score), Shims.expression(id), k)
      .toAggregateExpression())
}
