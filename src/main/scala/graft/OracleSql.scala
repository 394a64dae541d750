package graft

/** Generators for DuckDB oracle SQL that is BIT-IDENTICAL to the Scala
  * kernels: vector reductions are unrolled into left-associated `+`
  * chains (t1 + t2 + … + tN), which IEEE-754 matches a sequential
  * double accumulation loop exactly — no rounding tolerance needed.
  * Monetary aggregates use scaled-integer (cents) arithmetic so sums
  * are order-independent and exact in both engines.
  */
object OracleSql {
  /** Embedding dimensionality of the testdata `embeddings` table. */
  val Dim = 64

  private def terms(dim: Int)(t: Int => String): String =
    (1 to dim).map(t).mkString("(", " + ", ")")

  /** Unrolled Σ a[i]·b[i] in double. */
  def dot(a: String, b: String, dim: Int = Dim): String =
    terms(dim)(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")

  /** Unrolled Σ a[i]² then sqrt. */
  def norm(a: String, dim: Int = Dim): String = s"sqrt(${dot(a, a, dim)})"

  /** cosine similarity, same association as CosineSimD / Knn loops. */
  def cosine(a: String, b: String, dim: Int = Dim): String =
    s"(${dot(a, b, dim)} / (${norm(a, dim)} * ${norm(b, dim)}))"

  /** Unrolled Σ (a[i]−b[i])². */
  def l2sq(a: String, b: String, dim: Int = Dim): String =
    terms(dim)(i =>
      s"(CAST($a[$i] AS DOUBLE)-CAST($b[$i] AS DOUBLE))*(CAST($a[$i] AS DOUBLE)-CAST($b[$i] AS DOUBLE))")
}
