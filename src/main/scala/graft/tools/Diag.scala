package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHashOps
import graft.operators.Dedup

/** Dev diagnostic: dedup candidate-volume statistics at a given SF. */
object Diag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = Tables.load(spark, dir, "documents")
    val t = d.select(col("doc_id"), col("source"), Dedup.shingleHashes3(col("text")).as("sh"))

    // 1. posting-list document frequencies (per source block)
    val posting = t.select(col("source"), explode(col("sh")).as("shh"))
    val df = posting.groupBy("source", "shh").count()
    val pairEvents = df.selectExpr("sum(count*(count-1)/2) as pe").collect()(0)
    println(s"[diag] ngram inverted-index pair-events: $pairEvents")
    df.selectExpr("max(count) as max_df", "avg(count) as avg_df").show()

    // 2. minhash bucket sizes
    val sig = t.withColumn("sig", TextHashOps.minhashSigLong(col("sh"), Dedup.NumHashes))
    val bandKeys = sig.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), lit(Dedup.Bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * Dedup.RowsPerBand + 1, lit(Dedup.RowsPerBand))))))
    val buckets = bandKeys.groupBy("pos", "col").count()
    buckets.selectExpr("max(count) as max_bucket", "avg(count) as avg_bucket",
      "sum(count*(count-1)/2) as pair_events").show()

    spark.stop()
  }
}
