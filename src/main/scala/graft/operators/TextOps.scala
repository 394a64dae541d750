package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{OracleSql, Tables}

/** Text-analysis + deduplication operators over the `documents` table —
  * the LLM-data-pipeline surface (SURVEY.md §2). All SQL-expressible
  * variants are oracle-checked bit-exactly: ratios stay as raw
  * int/int double divisions (single IEEE op — no rounding tolerance
  * needed), counts stay integral.
  *
  * Scale notes: everything here is a narrow projection over `text`
  * (column pruning reaches the scan); dedup candidate generation is
  * blocked (by source / label) so the quadratic verify step only runs
  * inside blocks — the unblocked scale path is MinHash-LSH
  * (dedup_minhash_lsh) / SimHash, spec'd separately.
  */
object TextOps {
  private def toks: Column = split(trim(col("text")), "\\s+")

  // Deterministic language-marker sets (shared with the SQL twins).
  val MarkEn = Seq("the", "a", "or", "and", "of")
  val MarkEs = Seq("el", "la", "de", "los", "que")
  val MarkDe = Seq("der", "die", "und", "das", "ist")
  val MarkFr = Seq("le", "les", "des", "et", "un")

  private[operators] def markCount(ts: Column, set: Seq[String]): Column =
    size(filter(ts, t => t.isInCollection(set)))
  private def sqlMarkCount(set: Seq[String]): String =
    s"CAST(len(list_filter(toks, t -> t IN (${set.map(w => s"'$w'").mkString(",")}))) AS INT)"

  /** Token counting: whitespace tokens + a BPE-ish segmentation count. */
  def textTokens(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).as("n_chars_text"),
        size(toks).as("n_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+")).as("n_bpe_ish"))
      .orderBy("doc_id")

  val textTokensSql: String =
    """SELECT doc_id, CAST(length(text) AS INT) AS n_chars_text,
      | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
      | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INT) AS n_bpe_ish
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Rule-based language ID via marker-stopword counts (deterministic
    * argmax with a fixed tie-break chain). */
  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").withColumn("toks", toks)
    val (en, es, de, fr) = (col("s_en"), col("s_es"), col("s_de"), col("s_fr"))
    d.select(col("doc_id"), col("lang"),
        markCount(col("toks"), MarkEn).as("s_en"),
        markCount(col("toks"), MarkEs).as("s_es"),
        markCount(col("toks"), MarkDe).as("s_de"),
        markCount(col("toks"), MarkFr).as("s_fr"))
      .withColumn("predicted_lang",
        when(en >= es && en >= de && en >= fr, "en")
          .when(es >= de && es >= fr, "es")
          .when(de >= fr, "de")
          .otherwise("fr"))
      .orderBy("doc_id")
  }

  val textLangidSql: String =
    s"""SELECT doc_id, lang, s_en, s_es, s_de, s_fr,
       | CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |      WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |      WHEN s_de >= s_fr THEN 'de'
       |      ELSE 'fr' END AS predicted_lang
       |FROM (SELECT doc_id, lang,
       |  ${sqlMarkCount(MarkEn)} AS s_en,
       |  ${sqlMarkCount(MarkEs)} AS s_es,
       |  ${sqlMarkCount(MarkDe)} AS s_de,
       |  ${sqlMarkCount(MarkFr)} AS s_fr
       | FROM (SELECT *, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** Quality scoring: token/char stats, stopword ratio, digit ratio,
    * and a composite score — all exact IEEE ops over integers. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").withColumn("toks", toks)
    val nt = col("n_tokens").cast("double")
    d.select(col("doc_id"),
        length(col("text")).as("n_chars_text"),
        size(col("toks")).as("n_tokens"),
        markCount(col("toks"), MarkEn).as("n_stop"),
        regexp_count(col("text"), lit("[0-9]")).as("n_digit"),
        aggregate(transform(col("toks"), t => length(t)), lit(0), (a, b) => a + b)
          .as("sum_tok_len"))
      // zero-token/zero-char guards: Spark's x/0 is NULL while DuckDB's
      // is NaN/Inf — define all ratios as 0.0 on empty docs (both sides)
      .withColumn("mean_word_len",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("sum_tok_len").cast("double") / nt))
      .withColumn("stop_ratio",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("n_stop").cast("double") / nt))
      .withColumn("digit_ratio",
        when(col("n_chars_text") === 0, lit(0.0))
          .otherwise(col("n_digit").cast("double") / col("n_chars_text").cast("double")))
      .withColumn("quality_score",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(lit(0.5) * least(lit(1.0), nt / lit(50.0)) +
            lit(0.5) * (col("n_stop").cast("double") / nt)))
      .orderBy("doc_id")
  }

  val textQualitySql: String =
    s"""SELECT doc_id, n_chars_text, n_tokens, n_stop, n_digit, sum_tok_len,
       | CASE WHEN n_tokens = 0 THEN 0.0e0
       |      ELSE CAST(sum_tok_len AS DOUBLE)/CAST(n_tokens AS DOUBLE) END AS mean_word_len,
       | CASE WHEN n_tokens = 0 THEN 0.0e0
       |      ELSE CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) END AS stop_ratio,
       | CASE WHEN n_chars_text = 0 THEN 0.0e0
       |      ELSE CAST(n_digit AS DOUBLE)/CAST(n_chars_text AS DOUBLE) END AS digit_ratio,
       | CASE WHEN n_tokens = 0 THEN 0.0e0
       |      ELSE 0.5 * least(1.0, CAST(n_tokens AS DOUBLE)/50.0)
       |        + 0.5 * (CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE)) END AS quality_score
       |FROM (SELECT doc_id, CAST(length(text) AS INT) AS n_chars_text,
       |  CAST(len(toks) AS INT) AS n_tokens,
       |  ${sqlMarkCount(MarkEn)} AS n_stop,
       |  CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digit,
       |  CAST(list_sum(list_transform(toks, t -> length(t))) AS INT) AS sum_tok_len
       | FROM (SELECT *, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** Document fingerprint: md5 of the normalized text (exact-dup key;
    * the rolling-hash winnowing variant lives in Fingerprint.scala). */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fingerprint"))
      .orderBy("doc_id")

  val textFingerprintSql: String =
    """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Exact dedup: canonical doc per text-hash group (map-side combine;
    * at 100 TB this is the cheap first pass before MinHash). */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("dup_count"))
      .orderBy("text_hash")

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS canonical_id,
      | CAST(count(*) AS BIGINT) AS dup_count
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** N-gram Jaccard near-dup pairs, blocked by source: distinct 3-word
    * shingles, |A∩B|/|A∪B| ≥ 0.5 — served by the LOSSLESS
    * prefix-filtered inverted index (jaccardPrefixPairs below).
    * History: through round 11 this key carried a df-capped postings
    * self-join (pair events Σ df², bounded by dropping shingles with
    * df > 10000 — lossy beyond the cap). The prefix machinery computes
    * the same pair set with NO cap and pair work bounded by Σ
    * prefix-df² (near-dup density, not token skew), so the capped
    * variant is retired and both graded keys ride the exact path;
    * dedup_minhash_lsh remains the approximate-candidate sibling. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    jaccardPrefixPairs(Tables.load(s, dir, "documents")).orderBy("doc_a", "doc_b")

  val dedupNgramJaccardSql: String =
    """WITH tok AS (SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |t AS (SELECT doc_id, source,
      |  list_distinct(list_transform(range(1, len(w)-1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      | FROM tok WHERE len(w) >= 3)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.source,
      | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |   / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
      |FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |   / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5
      |ORDER BY 1, 2""".stripMargin

  /** Exact τ-threshold n-gram Jaccard all-pairs via a PREFIX-FILTERED
    * inverted index (the AllPairs / PPJoin prefix principle — Bayardo
    * et al., WWW'07; Xiao et al., ICDE'08): the lossless scale path
    * for the quadratic-pair-event shape dedup_ngram_jaccard carries.
    *
    * Order every doc's shingle set by GLOBAL rarity (df asc, hash asc
    * — one total order both engines derive identically) and index only
    * each doc's first `n − ⌈τ·n⌉ + 1` shingles. Prefix lemma: a pair
    * with J ≥ τ has overlap o ≥ τ·max(|A|,|B|) (since the union is at
    * least the larger set), and two sets whose overlap is ≥ α must
    * share an element inside their first `size − α + 1` elements under
    * any common total order — so every qualifying pair collides on
    * some indexed prefix shingle, and candidate generation over the
    * PREFIX postings alone misses nothing. The candidate pair set then
    * verifies EXACTLY (one merge-pass Jaccard over the two sorted hash
    * arrays — same integer inter/union as the quadratic form, same
    * single IEEE division), so the result is bit-equal to the
    * brute-force operator — the graded twin IS the quadratic oracle,
    * making losslessness a gate property, not a comment.
    *
    * Scale shape: the shuffles are wordcount-shaped (postings, df,
    * per-doc prefix rank) plus a candidate-bounded verify join; the
    * prefix keeps only each doc's RAREST shingles, so stop-shingles
    * (the df² pair-event melt that forces dedup_ngram_jaccard's lossy
    * df cap) never enter the index — no cap, no recall loss. Pair
    * events are Σ_shingle pdf·(pdf−1)/2 over PREFIX df, which tracks
    * the true near-dup density rather than the token distribution; a
    * corpus where that is still quadratic has quadratic OUTPUT. */
  def dedupJaccardPrefix(s: SparkSession, dir: String): DataFrame =
    jaccardPrefixPairs(Tables.load(s, dir, "documents")).orderBy("doc_a", "doc_b")

  /** Shingle sets (sorted distinct hashes) of the ≥3-token docs.
    * Fanned out before the shingle-hash map (guide §2.5 — the scan is
    * one task on a single-row-group shard; the md5 pass is the cost). */
  private[graft] def shingled(d0: DataFrame): DataFrame =
    graft.Mat.fanout(d0)
      .filter(expr("size(filter(split(text, ' '), x -> x != '')) >= 3"))
      .select(col("doc_id"), col("source"), Dedup.shingleHashes3(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))

  /** Prefix-postings candidate pairs (exposed for pruning specs): every
    * pair that shares an indexed PREFIX shingle within its source block
    * — a superset of the τ-qualifying pairs by the prefix lemma. */
  private[graft] def prefixCandidates(t: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val posting = t.select(col("doc_id"), col("source"), col("n"), explode(col("sh")).as("shh"))
    val dfT = posting.groupBy("source", "shh").agg(count(lit(1)).as("df"))
    // τ = 1/2 ⟹ prefix length = n − ⌈n/2⌉ + 1 = (n div 2) + 1, all-integer
    val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("shh").asc)
    val prefix = posting.join(dfT, Seq("source", "shh"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= expr("(n div 2) + 1"))
      .select("doc_id", "source", "shh")
    prefix.alias("x").join(prefix.alias("y"),
        col("x.shh") === col("y.shh") && col("x.source") === col("y.source") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.source").as("source"))
      .distinct()
  }

  /** ASYMMETRIC containment join: pairs (A, B) with
    * |A∩B| / |A| ≥ τ_c — "almost every shingle of A occurs in B" —
    * the quote / boilerplate / subset-duplicate detector symmetric
    * Jaccard misses (a short doc quoted inside a long one has tiny
    * J but containment ≈ 1; the standard curation complement to the
    * near-dup pass). Same prefix-filter machinery as
    * dedup_jaccard_prefix but ONE-SIDED: C ≥ τ ⟹ |A∩B| ≥ ⌈τ·|A|⌉, so
    * A's first |A| − ⌈τ·|A|⌉ + 1 globally-rarest shingles must contain
    * a shared element (pigeonhole) — only the CONTAINED side indexes a
    * prefix; the containing side keeps full postings, which is what
    * makes the direction asymmetric and the join lossless. A stop
    * shingle present everywhere never enters any non-trivial doc's
    * rarity prefix, so the df² melt is pruned exactly as in the
    * symmetric join (a doc whose ENTIRE shingle set is stop shingles
    * legitimately IS contained everywhere — that output is the
    * semantics, not a blowup). Candidates verify with exact integer
    * |A∩B| over the sorted hash arrays; one IEEE division. */
  // τ_c as an EXACT rational: every prefix cutoff (engine filter and
  // scaled certification twin) derives ⌈τ·n⌉ from these integers, so
  // lowering the threshold can never silently leave a stale hardcoded
  // cutoff behind (a too-short prefix drops true pairs — lossy, and
  // only caught by re-running the equivalence mode)
  private[graft] val ContainTauNum = 9
  private[graft] val ContainTauDen = 10
  /** A-prefix length n − ⌈τ·n⌉ + 1 in integer SQL (Spark `div` /
    * DuckDB `//` spell the operator differently; caller passes it). */
  private def containPrefixCut(intDiv: String): String =
    s"n - (($ContainTauNum * n + ${ContainTauDen - 1}) $intDiv $ContainTauDen) + 1"
  val ContainTau: Double = ContainTauNum.toDouble / ContainTauDen
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    containmentPairs(Tables.load(s, dir, "documents")).orderBy("doc_a", "doc_b")

  private[graft] def containmentPairs(d0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = shingled(d0)
    val posting = t.select(col("doc_id"), col("source"), col("n"), explode(col("sh")).as("shh"))
    val dfT = posting.groupBy("source", "shh").agg(count(lit(1)).as("df"))
    // A-prefix length = n − ⌈τ·n⌉ + 1, all-integer, derived from the
    // same rational constants as the verify threshold
    val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("shh").asc)
    val prefixA = posting.join(dfT, Seq("source", "shh"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= expr(containPrefixCut("div")))
      .select(col("doc_id").as("doc_a"), col("source"), col("shh"))
    val cand = prefixA
      .join(posting.select(col("doc_id").as("doc_b"), col("source"), col("shh")),
        Seq("source", "shh"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b", "source").distinct()
    cand
      .join(t.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("na")), "doc_a")
      .join(t.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / col("na").cast("double"))
      .filter(col("containment") >= ContainTau)
      .select("doc_a", "doc_b", "source", "containment")
  }

  /** Quadratic containment twin (same role as the Jaccard twin: the
    * gate certifies the one-sided prefix filter lossless). */
  val dedupContainmentSql: String =
    s"""WITH tok AS (SELECT doc_id, source,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |t AS (SELECT doc_id, source,
       |  list_distinct(list_transform(range(1, len(w)-1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       | FROM tok WHERE len(w) >= 3)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.source,
       | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(a.sh) AS DOUBLE)
       |   AS containment
       |FROM t a JOIN t b ON a.source = b.source AND a.doc_id <> b.doc_id
       |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(a.sh) AS DOUBLE)
       |   >= $ContainTau
       |ORDER BY 1, 2""".stripMargin

  // ------------------------- scaled twins (large-SF certification)

  /** Source-blocked prefix-filtered twin of dedupNgramJaccardSql for
    * the large-SF certification (the graded oracle stays quadratic —
    * see Dedup.oraclesScaled's doc comment for the two-stage argument).
    * Same shingle sets, same exact Jaccard verify; candidates from a
    * rarity-prefix self-join under DuckDB's STRING order — an order and
    * representation the engine's hash-based prefix index never sees. */
  val dedupNgramJaccardScaledSql: String =
    """WITH tok AS (SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |t AS MATERIALIZED (SELECT doc_id, source,
      |  list_distinct(list_transform(range(1, len(w)-1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      | FROM tok WHERE len(w) >= 3),
      |post AS MATERIALIZED (SELECT doc_id, source, len(sh) AS n, unnest(sh) AS g FROM t),
      |dfq AS (SELECT source, g, count(*) AS df FROM post GROUP BY 1, 2),
      |pre AS MATERIALIZED (SELECT doc_id, source, g FROM (
      |    SELECT p.doc_id, p.source, p.g, p.n,
      |      row_number() OVER (PARTITION BY p.doc_id ORDER BY d.df ASC, p.g ASC) AS r
      |    FROM post p JOIN dfq d ON d.source = p.source AND d.g = p.g)
      |  WHERE r <= n // 2 + 1),
      |cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db, x.source
      |  FROM pre x JOIN pre y
      |    ON x.source = y.source AND x.g = y.g AND x.doc_id < y.doc_id)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, c.source,
      | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |   / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
      |FROM cand c JOIN t a ON a.doc_id = c.da JOIN t b ON b.doc_id = c.db
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |   / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5
      |ORDER BY 1, 2""".stripMargin

  /** One-sided prefix-filtered twin of dedupContainmentSql: only the
    * CONTAINED side (A) indexes its n − ⌈τ·n⌉ + 1 rarest shingles; the
    * containing side keeps full postings — C ≥ τ ⟹ |A∩B| ≥ ⌈τ·|A|⌉ ⟹
    * a shared shingle sits inside A's prefix (pigeonhole), so the
    * candidate join is lossless; verify is the same exact division. */
  val dedupContainmentScaledSql: String =
    s"""WITH tok AS (SELECT doc_id, source,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |t AS MATERIALIZED (SELECT doc_id, source,
       |  list_distinct(list_transform(range(1, len(w)-1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       | FROM tok WHERE len(w) >= 3),
       |post AS MATERIALIZED (SELECT doc_id, source, len(sh) AS n, unnest(sh) AS g FROM t),
       |dfq AS (SELECT source, g, count(*) AS df FROM post GROUP BY 1, 2),
       |preA AS (SELECT doc_id, source, g FROM (
       |    SELECT p.doc_id, p.source, p.g, p.n,
       |      row_number() OVER (PARTITION BY p.doc_id ORDER BY d.df ASC, p.g ASC) AS r
       |    FROM post p JOIN dfq d ON d.source = p.source AND d.g = p.g)
       |  WHERE r <= ${containPrefixCut("//")}),
       |cand AS (SELECT DISTINCT preA.doc_id AS da, post.doc_id AS db, preA.source
       |  FROM preA JOIN post
       |    ON post.source = preA.source AND post.g = preA.g
       |   AND post.doc_id <> preA.doc_id)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, c.source,
       | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(a.sh) AS DOUBLE)
       |   AS containment
       |FROM cand c JOIN t a ON a.doc_id = c.da JOIN t b ON b.doc_id = c.db
       |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(a.sh) AS DOUBLE)
       |   >= $ContainTau
       |ORDER BY 1, 2""".stripMargin

  /** Certification-only twin overrides (see Dedup.oraclesScaled). */
  val oraclesScaled: Map[String, String] = Map(
    "dedup_ngram_jaccard" -> dedupNgramJaccardScaledSql,
    "dedup_jaccard_prefix" -> dedupNgramJaccardScaledSql,
    "dedup_containment" -> dedupContainmentScaledSql)

  private[graft] def jaccardPrefixPairs(d0: DataFrame): DataFrame = {
    val t = shingled(d0)
    prefixCandidates(t)
      .join(t.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(t.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        graft.functions.JaccardOps.sortedJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "source", "jaccard")
  }

  /** Embedding-cosine near-dup pairs, blocked by label (the LSH-blocked
    * variant at scale; exact within blocks here). */
  val NearDupTau = 0.4
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps
    val e = Tables.load(s, dir, "embeddings")
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"), col("embedding").as("emb_b"))
    a.join(b, "label")
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("score", VectorOps.cosineSim(col("emb_a"), col("emb_b")))
      .filter(col("score") >= NearDupTau)
      .select("vec_a", "vec_b", "label", "score")
      .orderBy("vec_a", "vec_b")
  }

  /** Salted variant of the label-blocked near-dup join: block keys with
    * few distinct values (10 labels here) skew one shuffle partition
    * per label. Salting splits each block R ways — side A keyed by
    * (label, id mod R), side B replicated R× — so work spreads across
    * R·|labels| reducers. Output is identical (spec'd in DedupSpec).
    */
  def dedupEmbeddingSalted(s: SparkSession, dir: String, r: Int = 4): DataFrame = {
    import graft.functions.VectorOps
    val e = Tables.load(s, dir, "embeddings")
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("embedding").as("emb_a"))
      .withColumn("salt", (col("vec_a") % r).cast("int"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"), col("embedding").as("emb_b"))
      .withColumn("salt", explode(array((0 until r).map(lit): _*)))
    a.join(b, Seq("label", "salt"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("score", VectorOps.cosineSim(col("emb_a"), col("emb_b")))
      .filter(col("score") >= NearDupTau)
      .select("vec_a", "vec_b", "label", "score")
      .orderBy("vec_a", "vec_b")
  }

  val dedupEmbeddingSql: String =
    s"""WITH nrm AS (SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding")}) AS nm
       |             FROM embeddings)
       |SELECT vec_a, vec_b, label, score FROM (
       | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
       |   ${OracleSql.dot("a.embedding", "b.embedding")} / (na.nm * nb.nm) AS score
       | FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
       |   JOIN nrm na ON a.vec_id = na.vec_id
       |   JOIN nrm nb ON b.vec_id = nb.vec_id)
       |WHERE score >= $NearDupTau
       |ORDER BY 1, 2""".stripMargin

  /** Winnowing fingerprints (rolling-hash variant): per-doc fingerprint
    * count and a containment-style near-dup check against the planted
    * duplicates is spec'd; here the per-doc stats form the query. */
  def textWinnow(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.WinnowOps.winnow(col("text")).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fingerprints"))
      .orderBy("doc_id")

  /** Deterministic hash-based train/val/test split (90/5/5): assignment
    * by the first two hex chars of md5(doc_id) — content-independent,
    * engine-independent (md5 hex compares lexicographically =
    * numerically at fixed width), stable under re-partitioning and
    * incremental reruns — the standard split discipline for training
    * pipelines. */
  def dataSplit(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 2).as("h"))
      .withColumn("split",
        when(col("h") < "e6", "train").when(col("h") < "f2", "val").otherwise("test"))
      .select("doc_id", "split")
      .orderBy("doc_id")

  val dataSplitSql: String =
    """SELECT doc_id,
      | CASE WHEN h < 'e6' THEN 'train' WHEN h < 'f2' THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Sequence packing for training batches: docs ordered longest-first
    * are packed greedily into fixed token budgets via a running-total
    * bucket (linear packing) — pack_id = (cumulative − own) div budget.
    * All-integer arithmetic → engine-exact. The global ordering window
    * is single-partition here (exactness for the oracle); at 100 TB
    * packing runs per shard (partitionBy(split/shard) on the window),
    * which preserves the budget invariant without a global sort. */
  val PackBudget = 2048L
  def docPacking(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $PackBudget").as("pack_id"))
      .orderBy("doc_id")
  }

  val docPackingSql: String =
    s"""SELECT doc_id, n_tokens, (cum - n_tokens) // $PackBudget AS pack_id
       |FROM (SELECT doc_id, n_tokens,
       |  CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id ASC
       |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       | FROM (SELECT doc_id,
       |   CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** Corpus-wide top-20 token frequencies (map-side-combined explode +
    * count — the classic wordcount shape). */
  def textTopWords(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  val textTopWordsSql: String =
    """SELECT word, CAST(count(*) AS BIGINT) AS n
      |FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents)
      |GROUP BY 1 ORDER BY n DESC, word LIMIT 20""".stripMargin

  /** Winnow twin: k-gram hashes are md5_number_lower(substr(text,i,5))
    * (character k-grams, unsigned order — exactly WinnowHashArr's
    * construction), window minima via least() over 4 consecutive
    * grams. n_fingerprints = count of DISTINCT window minima: the
    * engine's rightmost-tie/consecutive-position rules only affect
    * which POSITION is selected, never the selected value set. Texts
    * with <2 windows (length ≤ 8) emit exactly one fingerprint. */
  val textWinnowSql: String =
    """WITH h AS (SELECT doc_id, length(text) AS n,
      |    list_transform(range(1, length(text) - 3),
      |      i -> md5_number_lower(substr(text, i, 5))) AS g
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(CASE WHEN n <= 8 THEN 1
      |       ELSE len(list_distinct(list_transform(range(1, len(g) - 2),
      |            s -> least(g[s], g[s+1], g[s+2], g[s+3])))) END AS INT) AS n_fingerprints
      |FROM h ORDER BY doc_id""".stripMargin

  /** TF-IDF-ranked top terms per document with INTEGER-EXACT scoring:
    * score_ppm = (tf · 1e6) div df is monotone in tf/df, fully
    * deterministic, and identical across engines (no log(), whose libm
    * implementations differ bit-wise between JVM and DuckDB). The
    * document-frequency table is vocabulary-sized → broadcast. */
  def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
    val tf = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_ppm").desc, col("word").asc)
    tf.join(broadcast(df), "word")
      .withColumn("score_ppm", expr("(tf * 1000000) div df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("word"), col("score_ppm"), col("rk").cast("int").as("rk"))
      .orderBy("doc_id", "rk")
  }

  val textTfidfSql: String =
    """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      |            FROM documents),
      |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |sc AS (SELECT tf.doc_id, tf.word, (tf.tf * 1000000) // df.df AS score_ppm,
      |         row_number() OVER (PARTITION BY tf.doc_id
      |                            ORDER BY (tf.tf * 1000000) // df.df DESC, tf.word ASC) AS rk
      |       FROM tf JOIN df ON tf.word = df.word)
      |SELECT doc_id, word, CAST(score_ppm AS BIGINT) AS score_ppm, CAST(rk AS INT) AS rk
      |FROM sc WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Overlapping fixed-length token chunking — the embedding-pipeline
    * splitter (chunk length L tokens, stride S): chunk i covers tokens
    * [i·S, i·S+L). Emits per chunk the token span plus an md5
    * fingerprint of the chunk text (tokens joined by single spaces) —
    * the downstream dedup/embedding key. Chunk count = 1 for docs with
    * ≤L tokens, else ceil((n−L)/S)+1 — pure integer arithmetic; the
    * last chunk is the only one allowed to be short. */
  val ChunkLen = 64
  val ChunkStride = 48
  def docChunking(s: SparkSession, dir: String): DataFrame = {
    val L = ChunkLen; val S = ChunkStride
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("w"))
      .withColumn("n_tok", size(col("w")))
      .withColumn("n_chunks",
        when(col("n_tok") <= L, lit(1L))
          .otherwise(expr(s"(n_tok - $L + $S - 1) div $S") + 1L))
      .select(col("doc_id"), col("w"), col("n_tok"),
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        (col("chunk_id") * S).cast("long").as("start_tok"),
        least(col("chunk_id") * S + L, col("n_tok")).cast("long").as("end_tok"),
        md5(expr(s"cast(array_join(slice(w, chunk_id * $S + 1, $L), ' ') as binary)"))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  val docChunkingSql: String = {
    val L = ChunkLen; val S = ChunkStride
    s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |           FROM documents),
       |c AS (SELECT doc_id, w, len(w) AS n_tok,
       |        CASE WHEN len(w) <= $L THEN 1
       |             ELSE (len(w) - $L + $S - 1) // $S + 1 END AS n_chunks
       |      FROM t)
       |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       |  CAST(chunk_id * $S AS BIGINT) AS start_tok,
       |  CAST(least(chunk_id * $S + $L, n_tok) AS BIGINT) AS end_tok,
       |  md5(array_to_string(list_slice(w, chunk_id * $S + 1, chunk_id * $S + $L), ' ')) AS chunk_md5
       |FROM (SELECT doc_id, w, n_tok, unnest(range(0, n_chunks)) AS chunk_id FROM c)
       |ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** Classifier evaluation surface: confusion counts of the rule-based
    * language ID against the labeled `lang` column (integer-exact). */
  def textLangidConfusion(s: SparkSession, dir: String): DataFrame =
    textLangid(s, dir)
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted_lang")

  val textLangidConfusionSql: String =
    s"""SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
       |FROM (${textLangidSql.replace("ORDER BY doc_id", "")}) t
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Deterministic hash-Bernoulli corpus sampling (reproducible
    * downsampling, the sibling of data_split): keep a doc iff the low
    * 32 bits of md5("sample:"+doc_id) fall under rate·2³² — content-
    * independent, engine-independent, stable under repartitioning and
    * incremental reruns. Emits the kept rows + the per-lang keep
    * counts that a pipeline audit records. */
  val SampleRate = 0.2
  def dataSampleStratified(s: SparkSession, dir: String): DataFrame = {
    val threshold = (SampleRate * 4294967296.0).toLong
    Tables.load(s, dir, "documents")
      .withColumn("h",
        graft.functions.TextHashOps.md5Lower64(concat(lit("sample:"), col("doc_id")))
          .bitwiseAND(lit(4294967295L)))
      .filter(col("h") < threshold)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_kept"))
      .orderBy("lang")
  }

  val dataSampleStratifiedSql: String = {
    val threshold = (SampleRate * 4294967296.0).toLong
    s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       | CAST(min(doc_id) AS BIGINT) AS first_kept
       |FROM documents
       |WHERE (md5_number_lower('sample:' || doc_id) & 4294967295) < $threshold
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** FIXED-SIZE mergeable uniform sample per group — bottom-k-by-hash
    * (the KMV sketch machinery reused as a SAMPLER): keep the
    * SampleBkK docs with the smallest content-independent hashes per
    * lang. Unlike the Bernoulli sample (fixed RATE, unbounded size),
    * the bottom-k sample has fixed SIZE at any corpus scale and still
    * folds losslessly across shards (bottom-k of a union == merge of
    * bottom-ks) — the property that lets a 100 TB ingest keep a live
    * per-slice exemplar set: sample every shard, merge. State and
    * shuffle are ≤ k longs per group (the bounded
    * TypedImperativeAggregate); ids come back through a broadcast
    * membership join on the collision-free 63-bit hash. */
  val SampleBkK = 8
  def dataSampleBottomk(s: SparkSession, dir: String): DataFrame = {
    val h = Tables.load(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        shiftrightunsigned(graft.functions.TextHashOps.md5Lower64(
          concat(lit("bksamp:"), col("doc_id"))), 1).as("h"))
    val bk = h.groupBy("lang")
      .agg(graft.functions.KmvOps.kmvBottomK(col("h"), SampleBkK).as("bk"))
    h.join(broadcast(bk), "lang")
      .filter(array_contains(col("bk"), col("h")))
      .select(col("lang"), col("doc_id"), expr("array_position(bk, h)").as("rn"))
      .orderBy("lang", "rn")
  }

  val dataSampleBottomkSql: String =
    s"""SELECT lang, doc_id, rn FROM (
       |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang ORDER BY h ASC) AS rn
       |  FROM (SELECT lang, doc_id,
       |          CAST((md5_number_lower('bksamp:' || doc_id) >> 1) AS BIGINT) AS h
       |        FROM documents))
       |WHERE rn <= $SampleBkK ORDER BY lang, rn""".stripMargin

  /** Repetition-based quality filter (the Gopher-rules family, Rae et
    * al. 2021 §A1.1: repetition thresholds drop boilerplate/spam):
    * per doc — type-token ratio, duplicate word-3-gram fraction, top
    * word dominance, all in EXACT parts-per-million integer arithmetic
    * (ratio*1e6 div n — no float divergence), plus the composite keep
    * flag. Array-native metrics stay inside one narrow projection; top
    * word dominance is a wordcount-shaped groupBy (map-side combine,
    * shuffles (doc_id, word) pairs only — never text). Thresholds
    * chosen to split this corpus (measured: ttr 276k-1M ppm median
    * 462k, top 51k-300k ppm median 93k, dup3 0-71k ppm). */
  val RepTtrMin = 450000L   // keep iff type-token ratio >= 45%
  val RepTopMax = 150000L   // and top word <= 15% of tokens
  val RepDup3Max = 50000L   // and <= 5% duplicate 3-grams
  val RepMinTokens = 20L
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    textRepetitionOn(Tables.load(s, dir, "documents"))

  /** Operator body over an arbitrary documents frame (doc_id, text) so
    * tests can drive the real expressions on planted corpora. */
  def textRepetitionOn(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("w"))).cast("long"))
      .withColumn("n_dgrams", when(col("n_tokens") < 3, lit(0L)).otherwise(
        size(array_distinct(expr(
          "transform(sequence(0, size(w)-3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")))
          .cast("long")))
    val top = base.select(col("doc_id"), explode(col("w")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_cnt"))
    base.join(top, Seq("doc_id"), "left")
      .withColumn("top_cnt", coalesce(col("top_cnt"), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") === 0, lit(0L)).otherwise(
          expr("(n_distinct * 1000000) div n_tokens")).as("ttr_ppm"),
        when(col("n_tokens") < 3, lit(0L)).otherwise(
          expr("((n_tokens - 2 - n_dgrams) * 1000000) div (n_tokens - 2)")).as("dup3_ppm"),
        when(col("n_tokens") === 0, lit(0L)).otherwise(
          expr("(top_cnt * 1000000) div n_tokens")).as("top_ppm"))
      .withColumn("keep",
        col("n_tokens") >= RepMinTokens && col("ttr_ppm") >= RepTtrMin &&
          col("top_ppm") <= RepTopMax && col("dup3_ppm") <= RepDup3Max)
      .orderBy("doc_id")
  }

  val textRepetitionSql: String =
    s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |           FROM documents),
       |m AS (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS nd,
       |        CASE WHEN len(w) < 3 THEN 0 ELSE len(list_distinct(
       |          list_transform(range(len(w)-2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])))
       |        END AS ndg
       |      FROM t),
       |tw AS (SELECT doc_id, max(c) AS top_cnt FROM (
       |         SELECT doc_id, count(*) AS c
       |         FROM (SELECT doc_id, unnest(w) AS word FROM t) GROUP BY doc_id, word)
       |       GROUP BY doc_id)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, ttr_ppm, dup3_ppm, top_ppm,
       |  (n_tokens >= $RepMinTokens AND ttr_ppm >= $RepTtrMin
       |   AND top_ppm <= $RepTopMax AND dup3_ppm <= $RepDup3Max) AS keep
       |FROM (SELECT m.doc_id, n_tokens,
       |        CAST(CASE WHEN n_tokens = 0 THEN 0
       |          ELSE (nd * 1000000) // n_tokens END AS BIGINT) AS ttr_ppm,
       |        CAST(CASE WHEN n_tokens < 3 THEN 0
       |          ELSE ((n_tokens - 2 - ndg) * 1000000) // (n_tokens - 2) END AS BIGINT) AS dup3_ppm,
       |        CAST(CASE WHEN n_tokens = 0 THEN 0
       |          ELSE (coalesce(top_cnt, 0) * 1000000) // n_tokens END AS BIGINT) AS top_ppm
       |      FROM m LEFT JOIN tw ON m.doc_id = tw.doc_id)
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------- RAKE keywords

  /** RAKE keyword extraction (Rose et al. 2010 — Rapid Automatic
    * Keyword Extraction): candidate PHRASES are the maximal runs of
    * non-stopword tokens (stopwords and empty tokens are the phrase
    * delimiters; the stoplist is the union of the engine's langid
    * marker sets, shared with the SQL twin), each word scores
    * deg(w)/freq(w) — freq = occurrences across all phrase instances,
    * deg = Σ of the containing phrase's length (co-occurrence degree,
    * self included) — and a phrase scores the SUM of its words'
    * scores. Integer-exact: word score is the rational
    * (deg·10⁶) div freq and the phrase score a sum of longs (order
    * independent), so the top-20 table reproduces digit-for-digit
    * under the unique order (score DESC, phrase ASC).
    *
    * Scale shape: phrase assembly is one window pass per doc
    * (gaps-and-islands on the token positions — shuffle keyed by
    * doc_id, text never moves again after tokenize); word stats are
    * vocabulary-sized; distinct-phrase scoring joins the phrase's own
    * words back against the broadcastable word-score table; the final
    * cut is TakeOrdered (partial top-k per partition, no global
    * sort). */
  val RakeStops: Seq[String] = MarkEn ++ MarkEs ++ MarkDe ++ MarkFr
  val RakeTopN = 20

  def textRake(s: SparkSession, dir: String): DataFrame =
    rakeOn(Tables.load(s, dir, "documents").select(col("doc_id"), col("text")))

  private[graft] def rakeOn(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val words = docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+")))
      .withColumnRenamed("col", "word")
      .filter(!col("word").isInCollection(RakeStops) && col("word") =!= "")
    val islands = words.withColumn("grp", col("pos") - row_number().over(w))
    val phraseInst = islands.groupBy("doc_id", "grp")
      .agg(sort_array(collect_list(struct(col("pos").as("p"), col("word").as("w"))))
        .as("pw"))
      .select(expr("transform(pw, x -> x.w)").as("ws"))
      .select(array_join(col("ws"), " ").as("phrase"),
        size(col("ws")).cast("long").as("len"))
    val memb = phraseInst.select(col("len"), explode(split(col("phrase"), " ")).as("word"))
    val wscore = memb.groupBy("word")
      .agg(count(lit(1)).as("freq"), sum("len").as("deg"))
      .select(col("word"), expr("(deg * 1000000) div freq").as("wscore"))
    val dp = phraseInst.groupBy("phrase")
      .agg(count(lit(1)).as("n_occ"), min("len").as("n_words"))
    val scored = dp.select(col("phrase"), explode(split(col("phrase"), " ")).as("word"))
      .join(broadcast(wscore), "word")
      .groupBy("phrase").agg(sum("wscore").as("score_ppm"))
      .join(dp, "phrase")
      .orderBy(col("score_ppm").desc, col("phrase").asc)
      .limit(RakeTopN)
    val rw = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_ppm").desc, col("phrase").asc)
    scored.withColumn("rank", row_number().over(rw).cast("long"))
      .select("rank", "phrase", "n_words", "n_occ", "score_ppm")
      .orderBy("rank")
  }

  val textRakeSql: String = {
    val stops = RakeStops.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
       |           FROM documents),
       |wd AS (SELECT doc_id, p, w[CAST(p AS INT) + 1] AS word
       |       FROM t, unnest(range(0, len(w))) u(p)),
       |ct AS (SELECT doc_id, p, word FROM wd
       |       WHERE word NOT IN ($stops) AND word <> ''),
       |isl AS (SELECT doc_id, p, word,
       |         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |        FROM ct),
       |ph AS MATERIALIZED (SELECT doc_id, grp,
       |        string_agg(word, ' ' ORDER BY p) AS phrase,
       |        CAST(count(*) AS BIGINT) AS len FROM isl GROUP BY 1, 2),
       |memb AS (SELECT len, unnest(string_split(phrase, ' ')) AS word FROM ph),
       |ws AS (SELECT word, (CAST(sum(len) AS BIGINT) * 1000000)
       |         // CAST(count(*) AS BIGINT) AS wscore FROM memb GROUP BY 1),
       |dp AS MATERIALIZED (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
       |        CAST(min(len) AS BIGINT) AS n_words FROM ph GROUP BY 1),
       |dpw AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS word FROM dp),
       |sc AS (SELECT dpw.phrase, CAST(sum(ws.wscore) AS BIGINT) AS score_ppm
       |       FROM dpw JOIN ws USING (word) GROUP BY 1),
       |rr AS (SELECT dp.phrase, dp.n_words, dp.n_occ, sc.score_ppm,
       |         row_number() OVER (ORDER BY sc.score_ppm DESC, dp.phrase ASC) AS rank
       |       FROM dp JOIN sc USING (phrase))
       |SELECT CAST(rank AS BIGINT) AS rank, phrase, n_words, n_occ, score_ppm
       |FROM rr WHERE rank <= $RakeTopN ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_rake" -> (textRake _),
    "text_repetition" -> (textRepetition _),
    "data_sample_stratified" -> (dataSampleStratified _),
    "data_sample_bottomk" -> (dataSampleBottomk _),
    "text_langid_confusion" -> (textLangidConfusion _),
    "doc_chunking" -> (docChunking _),
    "text_tfidf" -> (textTfidf _),
    "data_split" -> (dataSplit _),
    "doc_packing" -> (docPacking _),
    "text_top_words" -> (textTopWords _),
    "text_winnow" -> (textWinnow _),
    "text_tokens" -> (textTokens _),
    "text_langid" -> (textLangid _),
    "text_quality" -> (textQuality _),
    "text_fingerprint" -> (textFingerprint _),
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_jaccard_prefix" -> (dedupJaccardPrefix _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_embedding" -> (dedupEmbedding _))

  val oracles: Map[String, String] = Map(
    "text_rake" -> textRakeSql,
    "text_repetition" -> textRepetitionSql,
    "data_sample_stratified" -> dataSampleStratifiedSql,
    "data_sample_bottomk" -> dataSampleBottomkSql,
    "text_langid_confusion" -> textLangidConfusionSql,
    "doc_chunking" -> docChunkingSql,
    "text_tfidf" -> textTfidfSql,
    "text_winnow" -> textWinnowSql,
    "data_split" -> dataSplitSql,
    "doc_packing" -> docPackingSql,
    "text_top_words" -> textTopWordsSql,
    "text_tokens" -> textTokensSql,
    "text_langid" -> textLangidSql,
    "text_quality" -> textQualitySql,
    "text_fingerprint" -> textFingerprintSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    // the prefix-filtered operator grades against the QUADRATIC twin:
    // the gate certifies the prefix candidate generation is lossless
    "dedup_jaccard_prefix" -> dedupNgramJaccardSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_embedding" -> dedupEmbeddingSql)
}
