package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * All queries read through here so projection pruning / predicate
  * pushdown reach the parquet scan uniformly.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // Some testdata drops write events.ts as TIMESTAMP(NANOS) parquet,
      // which Spark rejects by default; this conf surfaces those as raw
      // nanos-since-epoch longs.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType != LongType) {
      // Newer testdata drops write ts as TIMESTAMP(MICROS) instead, which
      // Spark reads as TIMESTAMP_NTZ. The engine contract is that ts is
      // ALWAYS ns-since-epoch (LongType) — integer nanos arithmetic is
      // exactly reproducible against the DuckDB twins, which read the
      // same instants through epoch_ns(ts)/epoch_us(ts) whatever the
      // file's physical precision. Interpret the naive value as UTC
      // (every entry point runs its session in UTC; pinned here too so
      // the NTZ->LTZ cast below cannot drift) and widen us -> ns.
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      df.withColumn("ts", expr("unix_micros(cast(ts as timestamp_ltz)) * 1000L"))
    } else df
  }

  /** Register every table as a temp view (for spark.sql paths / tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
