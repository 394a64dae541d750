package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fp16, VectorOps}

class VectorExprsSpec extends SparkTestBase {
  import spark.implicits._

  def refDot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  val a = Seq(1.0f, 2.5f, -3.25f, 0.125f)
  val b = Seq(-0.5f, 4.0f, 2.0f, 8.0f)

  test("DotD matches sequential double accumulation") {
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(VectorOps.dot(col("a"), col("b"))).head.getDouble(0)
    assert(got == refDot(a, b))
  }

  test("CosineSimD = dot/(|a||b|), exact on unit directions") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(2.0f, 0.0f))).toDF("x", "y", "z")
    assert(df.select(VectorOps.cosineSim(col("x"), col("y"))).head.getDouble(0) == 0.0)
    assert(df.select(VectorOps.cosineSim(col("x"), col("z"))).head.getDouble(0) == 1.0)
  }

  test("L2SqD is the squared euclidean distance") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(4.0f, 6.0f))).toDF("a", "b")
    assert(df.select(VectorOps.l2Sq(col("a"), col("b"))).head.getDouble(0) == 25.0)
  }

  test("expressions accept double arrays too") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    assert(df.select(VectorOps.dot(col("a"), col("b"))).head.getDouble(0) == 11.0)
  }

  test("fp16 round-trip: exact for representable values, bounded error otherwise") {
    // exactly representable in binary16
    for (v <- Seq(0.0f, 1.0f, -1.0f, 0.5f, 2.0f, 0.25f, 65504.0f))
      assert(Fp16.round(v) == v, s"$v should be fp16-exact")
    // relative error ≤ 2^-11 for normal range
    for (v <- Seq(0.1f, 3.14159f, -123.456f, 0.0007f)) {
      val r = Fp16.round(v)
      assert(math.abs(r - v) / math.abs(v) <= math.pow(2, -11) + 1e-7, s"$v → $r")
    }
    // overflow → infinity; NaN preserved
    assert(Fp16.round(1e6f).isInfinite)
    assert(Fp16.round(Float.NaN).isNaN)
    // round-to-nearest-even: 1 + 2^-11 is halfway between 1.0 and 1+2^-10
    assert(Fp16.round(1.0f + math.pow(2, -11).toFloat) == 1.0f)
    // signed zero preserved; half-subnormal magnitudes survive
    assert(java.lang.Float.floatToRawIntBits(Fp16.round(-0.0f)) ==
      java.lang.Float.floatToRawIntBits(-0.0f))
    assert(Fp16.round(5.96e-8f) > 0f) // smallest half subnormal ≈ 5.96e-8
    assert(Fp16.round(1e-9f) == 0f)   // below subnormal range → flush
  }

  test("int8 quantization: bounded error, idempotent, constant vectors exact") {
    import graft.functions.VectorOps
    val v = Seq(0.1f, -0.9f, 0.52f, 0.0f, 0.77f)
    val df = Seq(Tuple1(v)).toDF("v")
    val out = df.select(VectorOps.int8(col("v"))).head.getSeq[Float](0)
    val maxErr = (v.max - v.min) / 255.0f / 2.0f + 1e-6f
    v.zip(out).foreach { case (x, q) => assert(math.abs(x - q) <= maxErr, s"$x → $q") }
    // idempotent: re-quantizing the quantized vector is a no-op
    val again = Seq(Tuple1(out)).toDF("v")
      .select(VectorOps.int8(col("v"))).head.getSeq[Float](0)
    assert(again == out)
    // constant vector reproduces exactly
    val const = Seq(Tuple1(Seq(0.5f, 0.5f))).toDF("v")
      .select(VectorOps.int8(col("v"))).head.getSeq[Float](0)
    assert(const == Seq(0.5f, 0.5f))
    // search on the int8 corpus still self-matches at rank 1
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), VectorOps.int8(col("embedding")).as("embedding"))
    val top1 = graft.operators.Knn.topK(emb, emb.filter(col("vec_id") < 3), 3)
      .filter(col("rank") === 1).select("qid", "vec_id")
      .as[(Long, Long)].collect()
    top1.foreach { case (q, id) => assert(q == id) }
  }

  test("Fp16RoundArr column expression round-trips an array") {
    val df = Seq(Tuple1(Seq(1.0f, 0.1f, -65504.0f))).toDF("v")
    val out = df.select(VectorOps.fp16(col("v"))).head.getSeq[Float](0)
    assert(out(0) == 1.0f && out(2) == -65504.0f)
    assert(math.abs(out(1) - 0.1f) <= 0.1f * math.pow(2, -11))
  }
}
