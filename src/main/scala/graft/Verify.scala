package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet // dev-only: restrict to named queries
    // Refuse to grade while SURVEY §2 and the registry disagree — a
    // query registered without its inventory line aborts the dump
    // loudly instead of shipping an undocumented green (the drift the
    // test-time gate can only detect after the fact).
    SurveyInventory.driftMessage(SparkEntry.queries.keySet)
      .foreach(m => throw new IllegalStateException(m))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Gate-compat schema guard: the driver hashes CANONICAL STRINGS of
    // each value; DuckDB's pandas bridge renders DECIMAL(38,0) as
    // float64 ('19863.0') while Spark's parquet decimal128 arrives as
    // Decimal('19863') — identical values, divergent hashes (the exact
    // trap events_corr fell into at r12). Wide decimal arithmetic
    // stays INTERNAL to a query; graded outputs are long/double. A
    // decimal column in any dump aborts the whole dump loudly.
    def hasDecimal(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.DecimalType => true
      case s: org.apache.spark.sql.types.StructType  => s.fields.exists(f => hasDecimal(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType   => hasDecimal(a.elementType)
      case m: org.apache.spark.sql.types.MapType     => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _ => false
    }
    final class GateSchemaViolation(msg: String) extends IllegalStateException(msg)
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val dec = df.schema.fields.filter(f => hasDecimal(f.dataType)).map(_.name)
        if (dec.nonEmpty) throw new GateSchemaViolation(
          s"[verify] $name emits DecimalType column(s) ${dec.mkString(", ")} — " +
            "graded outputs must be long/double (decimal hashes diverge " +
            "between Spark decimal128 and DuckDB float64 rendering)")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch {
        case e: GateSchemaViolation => throw e
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // certification-only twin overrides (prefix-filtered doc-pair
    // oracles); the driver's gate never reads this file
    val scaled = SparkEntry.oracleSqlScaled
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql_scaled.json"), scaled)
    spark.stop()
  }
}
