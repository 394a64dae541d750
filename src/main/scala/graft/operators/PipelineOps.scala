package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data pipeline operators beyond the reference surface:
  * deterministic global shuffle + sharding, model-based quality
  * filtering, and PII redaction — the prep steps between "deduped
  * corpus" and "training shards" that a 100 TB pipeline runs last.
  */
object PipelineOps {

  // ------------------------------------------------------- global_shuffle

  /** Rows per output shard (graded value; a real pipeline passes its
    * own — e.g. docs-per-tfrecord). */
  val ShardSize = 100L

  /** Deterministic pseudo-random global shuffle + sharding: order the
    * corpus by md5(doc_id) (a fixed keyed permutation — rerun-stable,
    * seedable by salting the key), then assign each doc its shard and
    * within-shard position. The training-data "shuffle then shard"
    * step (every LLM data pipeline ends with one).
    *
    * Scale shape: the order is realized as a RANGE exchange on the
    * hash (sampled bounds — Spark's total sort, no single reducer) and
    * the global rank as the classic two-pass zipWithIndex: count rows
    * per sorted partition (a tiny driver array), exclusive-prefix-sum
    * the offsets, then stream each partition once adding its offset.
    * No global window function — a `row_number() OVER (ORDER BY h)`
    * would collapse 100 TB onto one task. The sorted layout is
    * persisted between the two passes so both read the same range
    * bounds. */
  def globalShuffle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sorted = Tables.load(s, dir, "documents")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .repartitionByRange(32, col("h"))
      .sortWithinPartitions("h")
      .as[(Long, String)]
      .persist()
    try {
      val counts = sorted.mapPartitions { it =>
        Iterator.single((TaskContext.getPartitionId(), it.size.toLong))
      }.collect().toMap
      val nPart = counts.keys.max + 1
      val offsets = Array.ofDim[Long](nPart)
      var acc = 0L
      for (p <- 0 until nPart) { offsets(p) = acc; acc += counts.getOrElse(p, 0L) }
      val ranked = sorted.mapPartitions { it =>
        var r = offsets(TaskContext.getPartitionId())
        it.map { case (id, h) =>
          val rank = r; r += 1
          (id, h, (rank / ShardSize).toInt, (rank % ShardSize).toInt)
        }
      }.toDF("doc_id", "h", "shard", "pos")
      graft.Mat.detach(ranked.orderBy("h"))
    } finally sorted.unpersist(blocking = true)
  }

  val globalShuffleSql: String =
    s"""SELECT doc_id, h,
       | CAST((rn - 1) // $ShardSize AS INT) AS shard,
       | CAST((rn - 1) % $ShardSize AS INT) AS pos
       |FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
       |        row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
       |      FROM documents)
       |ORDER BY h""".stripMargin

  // --------------------------------------------------- quality_classifier

  /** Fixed linear-classifier weights (exactly-representable doubles —
    * the graded stand-in for a trained fasttext/logreg quality model;
    * a real pipeline loads its own). Feature order:
    * length, stop_ratio, digit_ratio, mean_word_len. */
  val QcBias = -1.25
  val QcWLen = 2.0
  val QcWStop = 1.5
  val QcWDigit = -3.0
  val QcWMwl = 0.5

  /** Model-based quality filter: a linear classifier over the
    * text_quality features (capped length, stopword ratio, digit
    * ratio, capped mean word length) → logit, a bounded score
    * logit/(1+|logit|) (rational squash — exact IEEE ops on both
    * engines, unlike exp), and the keep decision at logit ≥ 0.
    * The classifier-filter step every curated corpus applies after
    * heuristic gates (cf. CCNet / fasttext quality filtering); scoring
    * is one narrow projection over the feature pass — no shuffle. */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val f = TextOps.textQuality(s, dir)
    val f1 = least(lit(1.0), col("n_tokens").cast("double") / lit(50.0))
    val f4 = least(lit(1.0), col("mean_word_len") / lit(8.0))
    // left-associated: (((b + w1·f1) + w2·f2) + w3·f3) + w4·f4
    val logit = lit(QcBias) + lit(QcWLen) * f1 +
      lit(QcWStop) * col("stop_ratio") +
      lit(QcWDigit) * col("digit_ratio") +
      lit(QcWMwl) * f4
    f.select(col("doc_id"), logit.as("logit"))
      .withColumn("score", col("logit") / (lit(1.0) + abs(col("logit"))))
      .withColumn("keep", col("logit") >= 0.0)
      .orderBy("doc_id")
  }

  val qualityClassifierSql: String = {
    import graft.OracleSql.dlit
    val logit = s"(((${dlit(QcBias)} + ${dlit(QcWLen)} * least(1.0e0, CAST(n_tokens AS DOUBLE)/50.0e0))" +
      s" + ${dlit(QcWStop)} * stop_ratio)" +
      s" + ${dlit(QcWDigit)} * digit_ratio)" +
      s" + ${dlit(QcWMwl)} * least(1.0e0, mean_word_len/8.0e0)"
    s"""SELECT doc_id, logit, logit/(1.0e0 + abs(logit)) AS score, logit >= 0.0e0 AS keep
       |FROM (SELECT doc_id, $logit AS logit FROM (${TextOps.textQualitySql}))
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------- pii_redact

  /** Regex subset chosen to behave identically under Java regex
    * (Spark) and RE2 (DuckDB): character classes, bounded/unbounded
    * greedy repetition — no backrefs, no lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9 ()-]{6,}[0-9]"

  /** PII redaction with per-doc counts. The testdata corpus carries no
    * PII, so the graded query PLANTS deterministic emails/phones first
    * (doc_id-derived — the oracle replays the same planting), then
    * counts and redacts: emails first, then phones, so a phone scan
    * never matches digits inside an address. One narrow projection —
    * codegen regexp ops, no UDF, no shuffle. */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.load(s, dir, "documents").withColumn("txt",
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com for details")))
        .when(pmod(col("doc_id"), lit(11)) === 3,
          concat(col("text"), lit(" or call +1 555 "),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .otherwise(col("text")))
    planted.select(col("doc_id"),
        regexp_count(col("txt"), lit(EmailRe)).as("n_email"),
        regexp_count(col("txt"), lit(PhoneRe)).as("n_phone"),
        regexp_replace(regexp_replace(col("txt"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("redacted"))
      .orderBy("doc_id")
  }

  val piiRedactSql: String = {
    // Scala "\\." is the 2-char sequence `\.`; DuckDB standard strings
    // pass backslashes through to RE2 untouched, so interpolate as-is.
    val email = EmailRe
    val phone = PhoneRe
    s"""SELECT doc_id,
       | CAST(len(regexp_extract_all(txt, '$email')) AS INT) AS n_email,
       | CAST(len(regexp_extract_all(txt, '$phone')) AS INT) AS n_phone,
       | regexp_replace(regexp_replace(txt, '$email', '<EMAIL>', 'g'),
       |   '$phone', '<PHONE>', 'g') AS redacted
       |FROM (SELECT doc_id,
       |  CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com for details'
       |       WHEN doc_id % 11 = 3 THEN text || ' or call +1 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |       ELSE text END AS txt
       | FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------- text_normalize

  /** Unicode NFC normalization — the normalize-before-hash step:
    * decomposed and precomposed renderings of the same visible text
    * (e + U+0301 vs é) hash to DIFFERENT md5 fingerprints, so every
    * hash-keyed stage downstream (exact dedup, MinHash, fingerprints)
    * silently misses duplicates unless the corpus is canonicalized
    * first. The testdata is pure-ASCII, so the graded query PLANTS
    * deterministic decomposed sequences (doc_id-derived; the oracle
    * replants with chr() and normalizes with DuckDB's nfc_normalize).
    * NfcNormalize is a codegen Expression with an allocation-free
    * already-normalized fast path — one scan projection, no shuffle. */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.load(s, dir, "documents").withColumn("txt",
      when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" cafe\u0301 blend")))
        .when(pmod(col("doc_id"), lit(5)) === 1, concat(col("text"), lit(" zu\u0308rich mix")))
        .otherwise(col("text")))
    planted.select(col("doc_id"), col("txt"),
        graft.functions.TextHashOps.nfcNormalize(col("txt")).as("norm"))
      .select(col("doc_id"), (col("norm") =!= col("txt")).as("changed"),
        md5(col("norm")).as("fp"), col("norm"))
      .orderBy("doc_id")
  }

  val textNormalizeSql: String =
    """SELECT doc_id, nfc <> txt AS changed, md5(nfc) AS fp, nfc AS norm
      |FROM (SELECT doc_id, txt, nfc_normalize(txt) AS nfc
      |      FROM (SELECT doc_id,
      |        CASE WHEN doc_id % 5 = 0 THEN text || ' cafe' || chr(769) || ' blend'
      |             WHEN doc_id % 5 = 1 THEN text || ' zu' || chr(776) || 'rich mix'
      |             ELSE text END AS txt
      |       FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "global_shuffle" -> (globalShuffle _),
    "quality_classifier" -> (qualityClassifier _),
    "pii_redact" -> (piiRedact _),
    "text_normalize" -> (textNormalize _))

  def oracles: Map[String, String] = Map(
    "global_shuffle" -> globalShuffleSql,
    "quality_classifier" -> qualityClassifierSql,
    "pii_redact" -> piiRedactSql,
    "text_normalize" -> textNormalizeSql)
}
