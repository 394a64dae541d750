package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pre-training corpus composition operators beyond the reference
  * surface: target-mixture domain sampling (the Pile/Dolma/GLaM
  * recipe — re-weight heterogeneous sources to a declared mixture
  * before training) and a bigram-LM quality filter (the CCNet/KenLM
  * recipe — score each document by how well a corpus-trained language
  * model predicts it, drop the tail).
  *
  * Both are exact-integer formulations so the DuckDB twin is bit-equal:
  * the sampler's keep test is cross-multiplied into int64 (no float
  * rate ever computed), and the LM score is parts-per-million integer
  * division (the textRepetition idiom — no float log/divide).
  */
object DataMix {

  // ---------------------------------------------------------------
  // data_domain_mix — hash-deterministic sampling to a target mixture.
  //
  // Each source s declares an integer weight w_s (here derived
  // deterministically from the source name; a real pipeline passes a
  // map). Target share of source s is w_s/ΣW; with T total chars and
  // C_s chars in source s, the per-doc keep rate is
  //   rate_s = min(1, (w_s/ΣW) · T / C_s)
  // and a doc is kept iff md5-hash-fraction(doc_id) < rate_s. The test
  // runs entirely in int64 via cross-multiplication:
  //   hash32 · (ΣW · C_s)  <  w_s · T · 2^32
  // (rate ≥ 1 degenerates to always-true since hash32 < 2^32), exact
  // as long as ΣW·C_s < 2^31 — fine to corpus sizes of ~10^7 chars per
  // source; a petabyte deployment widens to 128-bit or pre-reduces the
  // fraction. Scale shape: per-source stats are a tiny aggregate
  // (map-side combine) broadcast back onto the scan — the corpus
  // itself never shuffles, and the keep test is one codegen'd
  // comparison per row.
  // ---------------------------------------------------------------

  /** w_s = (digit(source)·3) mod 5 + 1 — spans capped (rate≥1) and
    * fractional sources on the graded corpus. */
  private def weightCol(source: Column): Column =
    (expr("CAST(substring(source, 4, 18) AS BIGINT)") * 3) % 5 + 1

  def dataDomainMix(s: SparkSession, dir: String): DataFrame =
    domainMixOn(Tables.load(s, dir, "documents"))

  def domainMixOn(docs: DataFrame): DataFrame = {
    val w = docs.groupBy("source")
      .agg(count(lit(1)).as("n_in"), sum("n_chars").as("chars_in"))
      .withColumn("wt", weightCol(col("source")))
    val tot = w.agg(sum("wt").as("wtot"), sum("chars_in").as("ctot"))
    // both sides of the join are per-source rows — broadcast, no shuffle
    val stats = broadcast(w.crossJoin(broadcast(tot)))

    val h = graft.functions.TextHashOps
      .md5Lower64(concat(lit("mix:"), col("doc_id")))
      .bitwiseAND(lit(4294967295L))
    val kept = docs.join(stats, "source")
      .filter(h * (col("wtot") * col("chars_in")) <
        col("wt") * col("ctot") * lit(4294967296L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))

    w.join(kept, Seq("source"), "left")
      .select(col("source"), col("wt"), col("n_in"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("chars_kept"), lit(0L)).as("chars_kept"))
      .orderBy("source")
  }

  val dataDomainMixSql: String =
    """WITH w AS (SELECT source,
      |    (CAST(substr(source, 4) AS BIGINT) * 3) % 5 + 1 AS wt,
      |    count(*) AS n_in, sum(n_chars) AS chars_in
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT sum(wt) AS wtot, sum(chars_in) AS ctot FROM w),
      |keep AS (SELECT d.source, d.n_chars
      |  FROM documents d JOIN w USING (source), tot
      |  WHERE (md5_number_lower('mix:' || d.doc_id) & 4294967295)
      |          * (tot.wtot * w.chars_in)
      |        < w.wt * tot.ctot * 4294967296),
      |ks AS (SELECT source, count(*) AS n_kept, sum(n_chars) AS chars_kept
      |  FROM keep GROUP BY 1)
      |SELECT w.source, CAST(w.wt AS BIGINT) AS wt,
      |  CAST(w.n_in AS BIGINT) AS n_in,
      |  CAST(coalesce(ks.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(coalesce(ks.chars_kept, 0) AS BIGINT) AS chars_kept
      |FROM w LEFT JOIN ks USING (source) ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // text_bigram_lm — corpus-trained bigram LM quality score, exact ppm.
  //
  // Train: global bigram counts c(w1,w2) and continuation totals
  // c(w1) = Σ_w2 c(w1,w2) — both wordcount-shaped aggregations with
  // map-side combine. Score: each bigram occurrence contributes
  // floor(c(w1,w2)·10^6 / c(w1)) ppm (its ML conditional probability),
  // and the doc score is the floor-average over its bigrams — a doc of
  // formulaic, high-probability continuations scores high; gibberish
  // scores low. keep = score ≥ threshold (CCNet keeps the
  // low-perplexity head). All arithmetic is integer → order-free.
  //
  // Scale shape: the shuffles are keyed by bigram (counts, then the
  // score join) — bounded by corpus token count, never by document
  // payloads; the per-doc fold is an int sum with map-side combine.
  // A petabyte deployment trains the counts on a fixed sample and
  // broadcasts a pruned top-V table instead of the exact self-join;
  // the exact formulation here is what makes the DuckDB gate bit-equal.
  // ---------------------------------------------------------------

  /** Keep iff lm_ppm ≥ this (measured sf0.01 spread 30322–49077,
    * median 34530 — the cut splits the graded corpus). */
  val LmKeepPpm = 34000L

  def textBigramLm(s: SparkSession, dir: String): DataFrame =
    bigramLmOn(Tables.load(s, dir, "documents"))

  def bigramLmOn(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      expr("filter(split(text, ' '), x -> x != '')").as("w"))
    val bg = toks.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-2), i -> struct(w[i] AS w1, w[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
    val c1 = c12.groupBy("w1").agg(sum("n12").as("n1"))
    val per = bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("doc_id"), expr("(n12 * 1000000L) div n1").as("ppm"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), expr("sum(ppm) div count(1)").as("lm_ppm"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_ppm"), lit(0L)).as("lm_ppm"))
      .withColumn("keep", col("lm_ppm") >= LmKeepPpm)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  // text_collocations — PMI-ranked bigram collocations, integer-exact.
  //
  // The corpus-stats table a tokenizer/phrase-mining pass wants: which
  // adjacent word pairs co-occur far above chance. True PMI is
  // log(c12·N/(c1·c2)) — but log is monotone, so RANKING by the exact
  // rational (c12·N·10⁶) div (c1·c2) ranks identically to PMI with no
  // libm anywhere: the score is a pure integral division of
  // DECIMAL-widened products (safe at any corpus size), the marginals
  // c1 (w1-as-first) / c2 (w2-as-second) and the total N all derive
  // from the ONE bigram-count aggregate (no second corpus scan — the
  // bm25 single-tokenize discipline), and the top-20 cut is a unique
  // total order (score desc, w1, w2) so the limit is deterministic.
  // Scale shape: wordcount-shaped shuffles keyed by bigram/word only;
  // the global-top-20 executes as TakeOrderedAndProject (per-partition
  // partial top-k, never a single-partition global sort).
  // ---------------------------------------------------------------
  val CollocMin = 5L    // min bigram support
  val CollocTopN = 20

  def textCollocations(s: SparkSession, dir: String): DataFrame =
    collocationsOn(Tables.load(s, dir, "documents"))

  def collocationsOn(docs: DataFrame): DataFrame = {
    val bg = docs.select(expr("filter(split(text, ' '), x -> x != '')").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w)-2), i -> struct(w[i] AS w1, w[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1"), col("b.w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
    val c1 = c12.groupBy("w1").agg(sum("n12").as("n1"))
    val c2 = c12.groupBy("w2").agg(sum("n12").as("n2"))
    c12.filter(col("n12") >= CollocMin)
      .join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(c12.agg(sum("n12").as("nb"))))
      .select(col("w1"), col("w2"), col("n12"),
        expr("cast(n12 as decimal(38,0)) * nb * 1000000" +
          " div (cast(n1 as decimal(38,0)) * n2)").as("pmi_ppm"))
      .orderBy(col("pmi_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(CollocTopN)
  }

  val textCollocationsSql: String =
    s"""WITH toks AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |bg AS (SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
       |  FROM toks WHERE len(w) >= 2),
       |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c12 GROUP BY 1),
       |c2 AS (SELECT w2, CAST(sum(n12) AS BIGINT) AS n2 FROM c12 GROUP BY 1),
       |nbt AS (SELECT CAST(sum(n12) AS BIGINT) AS nb FROM c12)
       |SELECT w1, w2, n12,
       |  CAST((n12::HUGEINT * nb * 1000000) // (n1::HUGEINT * n2) AS BIGINT) AS pmi_ppm
       |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nbt
       |WHERE n12 >= $CollocMin
       |ORDER BY pmi_ppm DESC, w1, w2 LIMIT $CollocTopN""".stripMargin

  val textBigramLmSql: String =
    s"""WITH toks AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |bg AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1,
       |         unnest(w[2:len(w)]) AS w2
       |  FROM toks WHERE len(w) >= 2),
       |c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT w1, sum(n12) AS n1 FROM c12 GROUP BY 1),
       |per AS (SELECT bg.doc_id, count(*) AS n_bigrams,
       |    sum((c12.n12 * 1000000) // c1.n1) // count(*) AS lm_ppm
       |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
       |  GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  CAST(coalesce(per.lm_ppm, 0) AS BIGINT) AS lm_ppm,
       |  coalesce(per.lm_ppm, 0) >= $LmKeepPpm AS keep
       |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // data_token_budget — fill a per-source TOKEN budget (not a doc
  // count): the mixture-construction primitive when the training run
  // is sized in tokens (every modern pretraining recipe). Docs within
  // a source are taken in hash order (md5 of doc_id — a deterministic
  // shuffle both engines reproduce) while the inclusive running token
  // total stays within the budget; budget = corpus tokens div
  // (2·n_sources) — half an average source's mass, derived from the
  // corpus itself so the operator is scale-free. Emits the kept docs
  // with their rank and running total — output bounded by
  // n_sources·budget, NOT by corpus size.
  //
  // Scale shape: one scan computes (tokens, hash) per doc; the scalar
  // budget broadcasts as one row; the cumulative sum is one window per
  // source (shuffle keyed by source, sort by 8-byte hash — text never
  // moves). A pathologically hot source salts into hash-range chunks
  // with per-chunk offsets (the two-pass global_shuffle pattern) — at
  // this corpus' source cardinality the plain window is the right plan.
  // ---------------------------------------------------------------
  def dataTokenBudget(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(s, dir, "documents").select(
      col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
      graft.functions.TextHashOps
        .md5Lower64(concat(lit("tb:"), col("doc_id")))
        .bitwiseAND(lit(4294967295L)).as("h"))
    val b = d.agg(expr("sum(n_tokens) div (2 * count(distinct source))")
      .as("budget"))
    val w = Window.partitionBy("source").orderBy(col("h").asc, col("doc_id").asc)
    d.crossJoin(broadcast(b))
      .withColumn("rk", row_number().over(w))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("source"), col("rk"), col("doc_id"), col("n_tokens"),
        col("cum_tokens"), col("budget"))
      .orderBy("source", "rk")
  }

  val dataTokenBudgetSql: String =
    """WITH d AS (SELECT doc_id, source,
      |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
      |    AS n_tokens,
      |  (md5_number_lower('tb:' || doc_id) & 4294967295) AS h
      | FROM documents),
      |b AS (SELECT sum(n_tokens) // (2 * count(DISTINCT source)) AS budget
      | FROM d),
      |c AS (SELECT source,
      |  row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk,
      |  doc_id, n_tokens,
      |  sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id)
      |    AS cum_tokens FROM d)
      |SELECT source, CAST(rk AS INT) AS rk, doc_id, n_tokens,
      |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
      |  CAST(budget AS BIGINT) AS budget
      |FROM c, b WHERE cum_tokens <= budget ORDER BY source, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "data_domain_mix" -> (dataDomainMix _),
    "text_bigram_lm" -> (textBigramLm _),
    "text_collocations" -> (textCollocations _),
    "data_token_budget" -> (dataTokenBudget _))

  val oracles: Map[String, String] = Map(
    "data_domain_mix" -> dataDomainMixSql,
    "text_bigram_lm" -> textBigramLmSql,
    "text_collocations" -> textCollocationsSql,
    "data_token_budget" -> dataTokenBudgetSql)
}
