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

  // -------------------------------------------------------- pipeline_e2e

  /** The composed LLM-training-data pipeline as ONE DataFrame chain —
    * the DAG a real curation run executes, with no action between
    * stages: normalize → dedup_exact → decontaminate (bloom prefilter
    * + exact verify) → quality classifier → per-source token budget →
    * sequence packing. Every stage is an already-graded operator; what
    * this key grades is that they COMPOSE without collect()-shaped
    * seams: building the chain launches zero Spark jobs (pinned in
    * PipelineE2eSpec), text is carried only as far as the quality
    * features (the budget/packing tail moves integers), and each
    * stage's semantics are bit-identical to its standalone twin —
    * the oracle is one statement with each stage a nested CTE.
    *
    * Scale shape: the chain is scans + one hash-partition exchange per
    * keyed stage (dedup's fingerprint, decontamination's gram join
    * against a BROADCAST eval side, the per-source budget window);
    * the only global window is the packing tail, which at 100 TB runs
    * per shard (doc_packing's documented contract). */
  def pipelineE2e(s: SparkSession, dir: String): DataFrame =
    pipelineE2eOver(Tables.load(s, dir, "documents"))

  /** Stages 1-4 + the budget key: the normalized/deduped/decontaminated/
    * quality-kept survivors as (doc_id, source, n_tokens, h) — the
    * pre-budget set. Exposed so PipelineE2eSpec can recompute the
    * corpus-derived budget independently and assert the budget-filter
    * invariant against it. */
  private[graft] def pipelineKept(docs: DataFrame,
      persistShingles: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 1. normalize (text_normalize's planting + NFC canonicalization)
    val planted = docs.withColumn("txt",
      when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" cafe\u0301 blend")))
        .when(pmod(col("doc_id"), lit(5)) === 1, concat(col("text"), lit(" zu\u0308rich mix")))
        .otherwise(col("text")))
    val norm = planted.select(col("doc_id"), col("source"),
      graft.functions.TextHashOps.nfcNormalize(col("txt")).as("norm"))
    // 2. exact dedup on the NORMALIZED fingerprint: canonical = min id
    val dd = norm
      .withColumn("canon", min(col("doc_id")).over(Window.partitionBy(md5(col("norm")))))
      .filter(col("doc_id") === col("canon")).drop("canon")
    // 3. decontamination: eval docs (id < evalMaxId) leave the corpus;
    // train docs sharing any shingle with the eval set drop. The bloom
    // is the prefilter; n_shared is its exact verify, so the twin can
    // check raw-shingle intersection directly (no bloom replay —
    // no false negatives by construction, false positives verified away)
    val contaminated = Dedup.decontaminateBloom(dd, "doc_id", "norm",
        persistBase = persistShingles)
      .filter(col("n_shared") > 0).select(col("train_id").as("doc_id"))
    val clean = dd.filter(col("doc_id") >= Dedup.DecontamEvalMaxId)
      .join(contaminated, Seq("doc_id"), "left_anti")
    // 4. quality classifier over the normalized text (text_quality's
    // features, quality_classifier's weights and squash-free keep rule)
    val tk = split(trim(col("norm")), "\\s+")
    val feat = clean.select(col("doc_id"), col("source"),
        length(col("norm")).as("n_chars"),
        size(tk).as("n_tokens"),
        TextOps.markCount(tk, TextOps.MarkEn).as("n_stop"),
        regexp_count(col("norm"), lit("[0-9]")).as("n_digit"),
        aggregate(transform(tk, t => length(t)), lit(0), (a, b) => a + b)
          .as("sum_tok_len"))
    val nt = col("n_tokens").cast("double")
    val withRatios = feat
      .withColumn("mean_word_len",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("sum_tok_len").cast("double") / nt))
      .withColumn("stop_ratio",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("n_stop").cast("double") / nt))
      .withColumn("digit_ratio",
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(col("n_digit").cast("double") / col("n_chars").cast("double")))
    val logit = lit(QcBias) + lit(QcWLen) * least(lit(1.0), nt / lit(50.0)) +
      lit(QcWStop) * col("stop_ratio") +
      lit(QcWDigit) * col("digit_ratio") +
      lit(QcWMwl) * least(lit(1.0), col("mean_word_len") / lit(8.0))
    val kept = withRatios.withColumn("logit", logit).filter(col("logit") >= 0.0)
    kept.select(col("doc_id"), col("source"),
      col("n_tokens").cast("long").as("n_tokens"),
      graft.functions.TextHashOps
        .md5Lower64(concat(lit("tb:"), col("doc_id")))
        .bitwiseAND(lit(4294967295L)).as("h"))
  }

  private[graft] def pipelineE2eOver(docs: DataFrame,
      persistShingles: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 5. per-source token budget (data_token_budget's hash-order fill)
    val withTok = pipelineKept(docs, persistShingles)
    val budget = withTok.agg(
      expr("sum(n_tokens) div (2 * count(distinct source))").as("budget"))
    val wSrc = Window.partitionBy("source").orderBy(col("h").asc, col("doc_id").asc)
    val budgeted = withTok.crossJoin(broadcast(budget))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wSrc))
      .filter(col("cum_tokens") <= col("budget"))
    // 6. pack the surviving docs (doc_packing's longest-first greedy)
    val wPack = Window.orderBy(col("n_tokens").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    budgeted
      .withColumn("cum", sum(col("n_tokens")).over(wPack))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"),
        expr(s"(cum - n_tokens) div ${TextOps.PackBudget}").as("pack_id"))
      .orderBy("doc_id")
  }

  val pipelineE2eSql: String = {
    import graft.OracleSql.dlit
    val stops = TextOps.MarkEn.map(w => s"'$w'").mkString(",")
    val logit = s"(((${dlit(QcBias)} + ${dlit(QcWLen)} * least(1.0e0, CAST(n_tokens AS DOUBLE)/50.0e0))" +
      s" + ${dlit(QcWStop)} * stop_ratio)" +
      s" + ${dlit(QcWDigit)} * digit_ratio)" +
      s" + ${dlit(QcWMwl)} * least(1.0e0, mean_word_len/8.0e0)"
    s"""WITH planted AS (SELECT doc_id, source,
       |    CASE WHEN doc_id % 5 = 0 THEN text || ' cafe' || chr(769) || ' blend'
       |         WHEN doc_id % 5 = 1 THEN text || ' zu' || chr(776) || 'rich mix'
       |         ELSE text END AS txt
       |  FROM documents),
       |nrm AS (SELECT doc_id, source, nfc_normalize(txt) AS norm FROM planted),
       |dd AS (SELECT doc_id, source, norm FROM (
       |   SELECT *, min(doc_id) OVER (PARTITION BY md5(norm)) AS canon FROM nrm)
       |  WHERE doc_id = canon),
       |tok AS (SELECT doc_id, list_filter(string_split(norm, ' '), x -> x <> '') AS w FROM dd),
       |sh AS (SELECT doc_id,
       |   CASE WHEN len(w) >= 3 THEN
       |     list_distinct(list_transform(range(1, len(w)-1),
       |       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
       |   ELSE [array_to_string(w, ' ')] END AS sh FROM tok),
       |eg AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id < ${Dedup.DecontamEvalMaxId}),
       |contam AS (SELECT DISTINCT t.doc_id FROM (
       |   SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id >= ${Dedup.DecontamEvalMaxId}) t
       |  JOIN eg USING (g)),
       |clean AS (SELECT * FROM dd
       |  WHERE doc_id >= ${Dedup.DecontamEvalMaxId}
       |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
       |q AS (SELECT doc_id, source, n_tokens, $logit AS logit
       |  FROM (SELECT doc_id, source, n_tokens,
       |     CASE WHEN n_tokens = 0 THEN 0.0e0
       |          ELSE CAST(sum_tok_len AS DOUBLE)/CAST(n_tokens AS DOUBLE) END AS mean_word_len,
       |     CASE WHEN n_tokens = 0 THEN 0.0e0
       |          ELSE CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) END AS stop_ratio,
       |     CASE WHEN n_chars = 0 THEN 0.0e0
       |          ELSE CAST(n_digit AS DOUBLE)/CAST(n_chars AS DOUBLE) END AS digit_ratio
       |    FROM (SELECT doc_id, source,
       |       CAST(length(norm) AS INT) AS n_chars,
       |       CAST(len(toks) AS INT) AS n_tokens,
       |       CAST(len(list_filter(toks, t -> t IN ($stops))) AS INT) AS n_stop,
       |       CAST(len(regexp_extract_all(norm, '[0-9]')) AS INT) AS n_digit,
       |       CAST(list_sum(list_transform(toks, t -> length(t))) AS INT) AS sum_tok_len
       |      FROM (SELECT *, regexp_split_to_array(trim(norm), '\\s+') AS toks FROM clean)))),
       |kept AS (SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       |    (md5_number_lower('tb:' || doc_id) & 4294967295) AS h
       |  FROM q WHERE logit >= 0.0e0),
       |b AS (SELECT sum(n_tokens) // (2 * count(DISTINCT source)) AS budget FROM kept),
       |c AS (SELECT doc_id, source, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum_tokens
       |  FROM kept),
       |bd AS (SELECT c.* FROM c, b WHERE cum_tokens <= budget),
       |p AS (SELECT doc_id, source, n_tokens, cum_tokens,
       |    CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id ASC
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM bd)
       |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       |  (cum - n_tokens) // ${TextOps.PackBudget} AS pack_id
       |FROM p ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "global_shuffle" -> (globalShuffle _),
    "quality_classifier" -> (qualityClassifier _),
    "pii_redact" -> (piiRedact _),
    "text_normalize" -> (textNormalize _),
    "pipeline_e2e" -> (pipelineE2e _))

  def oracles: Map[String, String] = Map(
    "global_shuffle" -> globalShuffleSql,
    "quality_classifier" -> qualityClassifierSql,
    "pii_redact" -> piiRedactSql,
    "text_normalize" -> textNormalizeSql,
    "pipeline_e2e" -> pipelineE2eSql)
}
