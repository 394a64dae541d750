package graft

class SqlFunctionsSpec extends SparkTestBase {

  test("registered SQL functions evaluate through spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
        |  dot_d(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |        array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS dp,
        |  l2_sq(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l2,
        |  simhash64(array('a', 'b', 'a')) AS sh,
        |  sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j
        |""".stripMargin).head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 4.0)
    assert(r.getDouble(2) == 25.0)
    assert(r.getLong(3) == r.getLong(3)) // deterministic long
    assert(r.getDouble(4) == 0.5)
  }

  test("md5_lower64 pins the DuckDB md5_number_lower byte convention") {
    GraftFunctions.register(spark)
    // DuckDB: SELECT md5_number_lower('hello') = 10575884659879408057
    // (digest bytes 8..15 little-endian); as a signed long that is
    // 10575884659879408057 - 2^64
    val got = spark.sql("SELECT md5_lower64('hello')").head.getLong(0)
    assert(got == java.lang.Long.parseUnsignedLong("10575884659879408057"),
      s"md5_lower64('hello') = $got")
  }

  test("shingle_hashes and winnow_fp over the documents table in SQL") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      """SELECT sum(size(shingle_hashes(text))) AS s,
        |       sum(size(winnow_fp(text))) AS w,
        |       sum(size(minhash_sig(shingle_hashes(text)))) AS m
        |FROM documents""".stripMargin).head
    assert(n.getLong(0) > 0 && n.getLong(1) > 0)
    assert(n.getLong(2) == 500L * 128L) // fixed-width signatures
  }

  test("vector_avg works from SQL") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val r = spark.sql(
      "SELECT size(vector_avg(embedding)) AS d FROM embeddings").head
    assert(r.getInt(0) == 64)
  }

  test("kmv_bottomk works from SQL and matches the Column-API aggregate") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val sqlRes = spark.sql(
      """SELECT event_type, kmv_bottomk(
        |  shiftrightunsigned(md5_lower64(concat('kmv:', cast(user_id as string))), 1)) AS bk
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    val colRes = operators.Sketches.sketchDistinctKmv(spark, sfDir)
      .select("event_type", "kth_hash").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(sqlRes.nonEmpty && sqlRes.map(_._1).sameElements(colRes.map(_._1)))
    sqlRes.zip(colRes).foreach { case ((_, bk), (_, kth)) =>
      if (bk.size == operators.Sketches.K) assert(bk.last == kth)
    }
  }

  test("kNN chunking: many-query batch equals single-batch result") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val qs = emb.filter(col("vec_id") < 30)
    val whole = operators.Knn.topK(emb, qs, 3)
      .select($"qid", $"rank", $"vec_id").as[(Long, Int, Long)].collect().toSet
    // force chunking by shrinking the broadcast cap via a small wrapper:
    // run chunks of 7 manually and union
    val chunked = (0L until 30L).grouped(7).map { ids =>
      operators.Knn.topK(emb, emb.filter(col("vec_id").isInCollection(ids)), 3)
    }.reduce(_ unionAll _)
      .select($"qid", $"rank", $"vec_id").as[(Long, Int, Long)].collect().toSet
    assert(chunked == whole)
  }
}
