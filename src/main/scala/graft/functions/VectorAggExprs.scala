package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Elementwise mean of a vector column per group — the distributed
  * Lloyd-update primitive: `assigned.groupBy("centroid")
  * .agg(vector_avg($"embedding"))` recomputes IVF centroids with a
  * map-side-combined shuffle of one (sum, count) buffer per partition
  * per group, never materializing group members.
  */
case class VectorAvgAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvgAgg.Buf] {
  import VectorAvgAgg.Buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Buf = Buf(null, 0L)

  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v == null) return b
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val elemFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val sums = if (b.sums == null) new Array[Double](n) else b.sums
    val d = math.min(n, sums.length)
    var i = 0
    while (i < d) {
      sums(i) += (if (elemFloat) a.getFloat(i).toDouble else a.getDouble(i))
      i += 1
    }
    Buf(sums, b.count + 1)
  }

  override def merge(b: Buf, o: Buf): Buf = {
    if (o.sums == null) return b
    if (b.sums == null) return o
    // bound by both lengths: partitions may have first seen vectors of
    // different dims (update() guards the same way with math.min)
    val d = math.min(b.sums.length, o.sums.length)
    var i = 0
    while (i < d) { b.sums(i) += o.sums(i); i += 1 }
    Buf(b.sums, b.count + o.count)
  }

  override def eval(b: Buf): Any =
    if (b.sums == null || b.count == 0L) null
    else new GenericArrayData(b.sums.map(_ / b.count))

  override def serialize(b: Buf): Array[Byte] = {
    val n = if (b.sums == null) 0 else b.sums.length
    val bb = ByteBuffer.allocate(4 + 8 + 8 * n)
    bb.putInt(n).putLong(b.count)
    var i = 0
    while (i < n) { bb.putDouble(b.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val count = bb.getLong
    if (n == 0) Buf(null, count)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = bb.getDouble; i += 1 }
      Buf(sums, count)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object VectorAvgAgg {
  case class Buf(sums: Array[Double], count: Long)
}

object VectorAggOps {
  def vectorAvg(v: Column): Column =
    Shims.column(VectorAvgAgg(Shims.expression(v)).toAggregateExpression())
}
