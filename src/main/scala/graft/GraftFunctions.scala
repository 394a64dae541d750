package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL surface for the graft expressions: register once, then use
  * `cosine_sim`, `dot_d`, `l2_sq`, `fp16_round`, `simhash64`,
  * `minhash_sig`, `shingle_hashes`, `winnow_fp`, `sorted_jaccard`
  * from `spark.sql(...)` / `selectExpr`.
  *
  * Two entry points: `GraftExtensions` for
  * `spark.sql.extensions=graft.GraftExtensions` at session build, and
  * `GraftFunctions.register(spark)` for an existing session.
  */
object GraftFunctions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name)

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", "cosine similarity of two float/double arrays",
      (e: Seq[Expression]) => CosineSimD(e(0), e(1))),
    ("dot_d", "double-accumulated dot product",
      (e: Seq[Expression]) => DotD(e(0), e(1))),
    ("l2_sq", "squared L2 distance",
      (e: Seq[Expression]) => L2SqD(e(0), e(1))),
    ("fp16_round", "FP16 round-trip of a float array",
      (e: Seq[Expression]) => Fp16RoundArr(e(0))),
    ("simhash64", "64-bit SimHash of a string array",
      (e: Seq[Expression]) => SimHash64(e(0))),
    ("minhash_sig", "MinHash signature of pre-hashed shingles (k=128)",
      (e: Seq[Expression]) => MinHashSigLong(e(0), 128)),
    ("shingle_hashes", "sorted distinct 3-word shingle hashes of a text",
      (e: Seq[Expression]) => ShingleHashArr(e(0))),
    ("winnow_fp", "winnowing fingerprint hashes of a text (k=5, w=4)",
      (e: Seq[Expression]) => WinnowHashArr(e(0), 5, 4)),
    ("sorted_jaccard", "Jaccard of two sorted distinct long arrays",
      (e: Seq[Expression]) => SortedJaccardD(e(0), e(1))),
    ("int8_round", "INT8 affine quantization round-trip of a float array",
      (e: Seq[Expression]) => Int8RoundArr(e(0))),
    ("md5_lower64", "low 64 bits of MD5 (DuckDB md5_number_lower convention)",
      (e: Seq[Expression]) => Md5Lower64(e(0))),
    ("vector_avg", "elementwise mean of a vector column (aggregate)",
      (e: Seq[Expression]) => VectorAvgAgg(e.head)),
    ("kmv_bottomk", "KMV distinct sketch: bottom-64 distinct long hashes (aggregate)",
      (e: Seq[Expression]) => KmvBottomKAgg(e.head, 64)))

  /** Register into an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.graftshim.Shims.registerFunction(
        spark, FunctionIdentifier(name), info(name, usage), builder)
    }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` — the complete
  * integration point: SQL functions, the VectorTopK planner strategy,
  * and the graft optimizer rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.VectorTopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.Fp16Idempotence)
    ext.injectOptimizerRule(_ => graft.plans.VectorTopKRewrite)
  }
}
