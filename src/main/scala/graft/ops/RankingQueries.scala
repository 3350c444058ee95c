package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.Tables.{basisPoints, exactDiv, load}

/** Relevance scoring over `documents` — the retrieval side of a training-data
  * pipeline (corpus statistics → per-document term weights → ranked results).
  *
  * Scale posture: corpus statistics (document frequency, avg doc length) are
  * tiny relative to the corpus — vocabulary-sized and single-row — so they
  * broadcast; the corpus itself is touched by exactly one tokenize+aggregate
  * pass per query (one explode shuffle), never a per-term rescan.
  *
  * Cross-engine float rules (graft.Tables): scores are floor-scaled to basis
  * points PER TERM and integer-summed across terms, so aggregation order can
  * never move a rank; BM25's idf uses the log-free odds form
  * (N−df+0.5)/(df+0.5) because ln() is the one operation whose low bits
  * differ between libm implementations.
  */
object RankingQueries {

  /** TF-IDF: top-3 terms per document (deterministic doc subset), with
    * df/N computed over the full corpus. The score is the exact integer
    * `tf · 10000 · N div df` — floor division in both engines — so ranking
    * ties break identically everywhere.
    */
  val textTfidf = QueryDef(
    "text_tfidf",
    (spark, dir) => {
      val docs = load(spark, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.filter(col("doc_id") % 25 === 0)
        .join(broadcast(df), "term")
        .crossJoin(broadcast(n))
        .withColumn("score", expr("(tf * 10000 * n_docs) DIV df"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("term"), col("score"))
        .orderBy(col("doc_id"), col("rn"))
    },
    Some("""
      WITH tfc AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY doc_id, term),
      dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, term, (tf * 10000 * n_docs) // df AS score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY (tf * 10000 * n_docs) // df DESC, term) AS rn
        FROM tfc JOIN dfc USING (term), n
        WHERE doc_id % 25 = 0)
      SELECT doc_id, rn, term, score FROM scored WHERE rn <= 3
      ORDER BY doc_id, rn"""))

  private val BmQuery = Seq("join", "scan", "merge")
  private val K1 = 1.2
  private val B = 0.75

  /** BM25 ranking of the whole corpus against a fixed 3-term query; top 20.
    *
    * Per-term scores are floor-scaled to basis points and integer-summed per
    * document — exact, order-free — then ranked (score desc, doc_id) via
    * TakeOrderedAndProject. idf is the log-free odds form (see object doc).
    */
  val textBm25 = QueryDef(
    "text_bm25",
    (spark, dir) => {
      val docs = load(spark, dir, "documents")
      val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term").isin(BmQuery: _*))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val stats = docs
        .select(size(split(col("text"), " ")).as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        .withColumn("avgdl", exactDiv(col("sum_dl"), col("n_docs")))
      val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
      val denom = col("tf") + lit(K1) * (lit(1 - B) + (lit(B) * col("dl")) / col("avgdl"))
      val perTerm = tf
        .join(broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          basisPoints((idf * (col("tf") * lit(K1 + 1))) / denom).as("sbp"))
      perTerm.groupBy(col("doc_id"))
        .agg(sum(col("sbp")).as("score_bp"))
        .orderBy(col("score_bp").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""
      WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        WHERE term IN (${BmQuery.map(t => s"'$t'").mkString(", ")})
        GROUP BY doc_id, term),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
                       CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
                FROM dl),
      per_term AS (
        SELECT doc_id,
               CAST(floor(((((n_docs - df) + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                           * (tf * ${K1 + 1}::DOUBLE))
                          / (tf + $K1::DOUBLE * (${1 - B}::DOUBLE + ($B::DOUBLE * dl) / avgdl))
                          * 10000 + 0.5) AS BIGINT) AS sbp
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats)
      SELECT doc_id, CAST(SUM(sbp) AS BIGINT) AS score_bp
      FROM per_term
      GROUP BY doc_id
      ORDER BY score_bp DESC, doc_id
      LIMIT 20"""))

  /** Feature-hashing vectorizer ("hashing trick"): every document becomes a
    * 32-bucket token-count vector via `rolling_hash(tok) mod 32` — a model-
    * free text embedding computed entirely on the aggregate path (explode →
    * two-key groupBy; the "vector" never materializes as an array). Reports
    * per-doc sparsity, exact L2 norm (integer Σcnt² + one IEEE sqrt), and
    * cosine similarity to document 0's vector (exact integer dot product) —
    * the building blocks of hash-kernel classifiers and cheap near-dup
    * blocking at corpus scale.
    */
  val textHashEmbed = QueryDef(
    "text_hash_embed",
    (spark, dir) => {
      import graft.functions.RollingHash
      val buckets = load(spark, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), (RollingHash(col("tok")) % 1048573 % 32).as("b"))
        .groupBy(col("doc_id"), col("b"))
        .agg(count(lit(1)).as("cnt"))
      val doc0 = buckets.filter(col("doc_id") === 0)
        .select(col("b"), col("cnt").as("cnt0"))
      val norm0 = doc0.agg(sum(col("cnt0") * col("cnt0")).as("n2_0"))
      buckets.filter(col("doc_id") % 25 === 0)
        .join(broadcast(doc0), Seq("b"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nnz"),
          sum(col("cnt") * col("cnt")).as("n2"),
          sum(col("cnt") * coalesce(col("cnt0"), lit(0L))).as("dot0"))
        .crossJoin(broadcast(norm0))
        .select(col("doc_id"), col("nnz"),
          graft.Tables.basisPoints(sqrt(col("n2").cast("double"))).as("norm_bp"),
          graft.Tables.basisPoints(
            col("dot0") / sqrt((col("n2") * col("n2_0")).cast("double"))).as("cos0_bp"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok
        FROM documents),
      buckets AS (
        SELECT doc_id,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(list_filter(string_split(tok, ''), c -> c <> ''),
                                  c -> CAST(unicode(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % 100000000000000000) % 1048573 % 32 AS b,
               COUNT(*) AS cnt
        FROM toks GROUP BY doc_id, b),
      doc0 AS (SELECT b, cnt AS cnt0 FROM buckets WHERE doc_id = 0),
      norm0 AS (SELECT SUM(cnt0 * cnt0) AS n2_0 FROM doc0)
      SELECT doc_id, COUNT(*) AS nnz,
             CAST(floor(sqrt(CAST(SUM(cnt * cnt) AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS norm_bp,
             CAST(floor(SUM(cnt * COALESCE(cnt0, 0))
                        / sqrt(CAST(SUM(cnt * cnt) * n2_0 AS DOUBLE))
                        * 10000 + 0.5) AS BIGINT) AS cos0_bp
      FROM buckets LEFT JOIN doc0 USING (b), norm0
      WHERE doc_id % 25 = 0
      GROUP BY doc_id, n2_0
      ORDER BY doc_id"""))

  /** Per-language keyword extraction by lift: how over-represented is a term
    * in one language's slice vs the whole corpus? lift = (share in lang) /
    * (share overall), computed as one exact integer expression
    * `cnt_lang·total_all·10000 div (cnt_all·total_lang)` — the class-based
    * keyword shape (feature selection / corpus drift reports). Frequency
    * floor keeps rare-term noise out of the ranking.
    */
  val textKeywords = QueryDef(
    "text_keywords",
    (spark, dir) => {
      val toks = load(spark, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      val perLang = toks.groupBy(col("lang"), col("term"))
        .agg(count(lit(1)).as("cnt_lang"))
      val langTotals = toks.groupBy(col("lang")).agg(count(lit(1)).as("total_lang"))
      val global = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt_all"))
      val totalAll = toks.agg(count(lit(1)).as("total_all"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("lift_bp").desc, col("term"))
      perLang.filter(col("cnt_lang") >= 50)
        .join(broadcast(langTotals), "lang")
        .join(broadcast(global), "term")
        .crossJoin(broadcast(totalAll))
        .withColumn("lift_bp",
          expr("(cnt_lang * total_all * 10000) DIV (cnt_all * total_lang)"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("lang"), col("rn"), col("term"), col("lift_bp"))
        .orderBy(col("lang"), col("rn"))
    },
    Some("""
      WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
      per_lang AS (SELECT lang, term, COUNT(*) AS cnt_lang
                   FROM toks GROUP BY lang, term),
      lang_totals AS (SELECT lang, COUNT(*) AS total_lang FROM toks GROUP BY lang),
      global AS (SELECT term, COUNT(*) AS cnt_all FROM toks GROUP BY term),
      total_all AS (SELECT COUNT(*) AS total_all FROM toks),
      lifted AS (
        SELECT lang, term,
               (cnt_lang * total_all * 10000) // (cnt_all * total_lang) AS lift_bp
        FROM per_lang
        JOIN lang_totals USING (lang)
        JOIN global USING (term), total_all
        WHERE cnt_lang >= 50),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY lift_bp DESC, term) AS rn FROM lifted)
      SELECT lang, rn, term, lift_bp FROM r WHERE rn <= 3
      ORDER BY lang, rn"""))

  /** Count-min-sketch heavy hitters: estimate token frequencies from a
    * 3×256-counter CMS (bucket = universal-hash permutation of the token
    * hash, one shuffle to 768 counter rows) and evaluate the exact top-10
    * tokens against it — estimate = min over the 3 rows, overcount =
    * est − exact ≥ 0 (CMS never undercounts). Unlike HLL/GK, every CMS
    * counter is a plain SUM, so the sketch is merge-order-INdependent and
    * the whole query — sketch, probe, error — hash-matches an exact DuckDB
    * oracle. Scale shape: the sketch is O(d·w) regardless of corpus size,
    * candidates probe it via an equi join on (seed, bucket) after a 3-way
    * explode; at 100 TB the same CMS would be built by partial aggregation
    * with no extra shuffle vs a plain count.
    */
  val topkSketch = QueryDef(
    "topk_sketch",
    (spark, dir) => {
      import DedupQueries.{perm, tokHash}
      val W = 256
      val toks = load(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
      val hashed = toks.withColumn("h", tokHash(col("tok")))
      val cms = (0 until 3).map { s =>
        hashed.groupBy((perm(col("h"), s) % W).as("bucket"))
          .agg(count(lit(1)).as("c")).withColumn("seed", lit(s))
      }.reduce(_ unionByName _)
      val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("tok")).limit(10)
        .withColumn("h", tokHash(col("tok")))
      val probes = top.select(col("tok"), col("exact_n"), explode(array(
        (0 until 3).map(s => struct(lit(s).as("seed"),
          (perm(col("h"), s) % W).as("bucket"))): _*)).as("p"))
        .select(col("tok"), col("exact_n"), col("p.seed"), col("p.bucket"))
      probes.join(broadcast(cms), Seq("seed", "bucket"))
        .groupBy(col("tok"), col("exact_n"))
        .agg(min(col("c")).as("cms_est"))
        .select(col("tok"), col("exact_n"), col("cms_est"),
          (col("cms_est") - col("exact_n")).as("overcount"))
        .orderBy(col("exact_n").desc, col("tok"))
    },
    Some {
      import DedupQueries.{permA, permB, tokHashSql, P}
      val bucketSelects = (0 until 3).map { s =>
        s"SELECT $s AS seed, ((${permA(s)} * h + ${permB(s)}) % $P) % 256 AS bucket FROM hashed"
      }.mkString("\n    UNION ALL\n    ")
      val probeSelects = (0 until 3).map { s =>
        s"SELECT tok, exact_n, $s AS seed, ((${permA(s)} * h + ${permB(s)}) % $P) % 256 AS bucket FROM top"
      }.mkString("\n    UNION ALL\n    ")
      s"""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |hashed AS (
         |  SELECT tok, ${tokHashSql("tok")} AS h FROM toks),
         |cms AS (
         |  SELECT seed, bucket, COUNT(*) AS c FROM (
         |    $bucketSelects)
         |  GROUP BY seed, bucket),
         |top AS (
         |  SELECT tok, exact_n, ${tokHashSql("tok")} AS h FROM (
         |    SELECT tok, COUNT(*) AS exact_n FROM toks
         |    GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 10)),
         |probes AS (
         |    $probeSelects)
         |SELECT p.tok, p.exact_n, MIN(c.c) AS cms_est,
         |       MIN(c.c) - p.exact_n AS overcount
         |FROM probes p JOIN cms c ON c.seed = p.seed AND c.bucket = p.bucket
         |GROUP BY p.tok, p.exact_n
         |ORDER BY exact_n DESC, tok""".stripMargin
    })

  /** Inverted-index build (posting lists): token → sorted document list +
    * document frequency — the structure behind every keyword search system.
    * Postings are `sort_array(collect_set(...))` (collect order is
    * partition-dependent; the sort pins it) rendered to a string head of 15
    * ids, with SUM(DISTINCT doc_id) as the full-list checksum so the head
    * truncation can't hide a wrong tail. Scale shape: one explode + one
    * shuffle on the token; per-token posting lists are the natural bucketed
    * layout at corpus scale (and the head-truncation here is what a real
    * index does with impact-ordered postings).
    */
  val textPostings = QueryDef(
    "text_postings",
    (spark, dir) => {
      load(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"), col("doc_id"))
        .groupBy(col("tok"))
        .agg(countDistinct(col("doc_id")).as("df"),
          sum_distinct(col("doc_id")).as("doc_sum"),
          concat_ws(",", slice(sort_array(collect_set(col("doc_id"))), 1, 15))
            .as("postings_head"))
        .orderBy(col("df").desc, col("tok"))
        .limit(20)
    },
    Some("""
      SELECT tok, COUNT(DISTINCT doc_id) AS df,
             CAST(SUM(DISTINCT doc_id) AS BIGINT) AS doc_sum,
             array_to_string(list_sort(list(DISTINCT doc_id))[1:15], ',')
               AS postings_head
      FROM (SELECT unnest(string_split(text, ' ')) AS tok, doc_id FROM documents)
      GROUP BY tok
      ORDER BY df DESC, tok
      LIMIT 20"""))

  /** Model-score quality filtering — the fastText/DCLM-style linear
    * classifier pass every production LLM-curation pipeline runs (score
    * each document with a frozen model, keep above threshold, audit the
    * score distribution). The heuristic `text_quality` gates on surface
    * stats; this is the learned-model shape.
    *
    * The "model" is a 64-entry integer-bp weight vector over hashed token
    * features (the `text_hash_embed` bucketing: rolling-hash mod 64). The
    * weights here are a frozen deterministic stand-in — derived from the
    * bucket id so the oracle can rebuild them — because nothing in the
    * plumbing depends on where the numbers came from: swap the `range(64)`
    * for a real trained weight table and every other line stands. A doc's
    * score is the exact-integer mean feature weight (fastText's
    * average-of-embeddings with a linear head, collapsed to 1 dimension).
    *
    * Scale design, the part that matters at 100 TB:
    *  - the corpus is touched by ONE explode → broadcast-join(weights) →
    *    doc-keyed aggregate pass; the weight table is O(buckets), always
    *    broadcast, so scoring never shuffles anything corpus-sized except
    *    the per-doc partial sums (map-side combined);
    *  - the decile boundaries come from the score HISTOGRAM: scores are
    *    integers in [0, 2000], so the rank window runs over ≤2001 rows
    *    regardless of corpus size — never a global sort of the corpus.
    *    Each histogram row's decile is `(docs_below · 10) div n_docs`;
    *  - the keep/drop audit (threshold 1000 bp = the weight midpoint) is
    *    a rollup of the deciled histogram — docs AND token counts, so the
    *    attrition report shows both document and token survival.
    * Everything is exact BIGINT end-to-end; the DuckDB oracle rebuilds
    * weights, scores, deciles, and rollup from the same formulas.
    */
  val textQualityScore = QueryDef(
    "text_quality_score",
    (spark, dir) => {
      import graft.functions.RollingHash
      val weights = spark.range(64).select(col("id").as("b"),
        expr("((id + 7) * 2654435761) % 1000003 % 2001").as("w_bp"))
      val scored = load(spark, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), (RollingHash(col("tok")) % 1048573 % 64).as("b"))
        .join(broadcast(weights), "b")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"), sum(col("w_bp")).as("sum_w"))
        .select(col("doc_id"), col("n_toks"),
          expr("sum_w div n_toks").as("score_bp"))
      val hist = scored.groupBy(col("score_bp"))
        .agg(count(lit(1)).as("nd"), sum(col("n_toks")).as("nt"))
      // both the running count and the total come from ONE window over the
      // histogram (≤2001 rows) — a separate total aggregate would re-run
      // the whole corpus pass as a second plan branch
      val wOrd = Window.orderBy(col("score_bp"))
      val deciled = hist
        .withColumn("c_lt", coalesce(sum(col("nd")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n_docs", sum(col("nd")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("score_bp"), col("nd"), col("nt"),
          expr("(c_lt * 10) div n_docs").as("decile"))
      deciled
        .groupBy(col("decile"), (col("score_bp") >= 1000).as("keep"))
        .agg(sum(col("nd")).as("n_docs"), sum(col("nt")).as("n_tokens"),
          min(col("score_bp")).as("min_score_bp"),
          max(col("score_bp")).as("max_score_bp"))
        .orderBy(col("decile"), col("keep"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      bk AS (
        SELECT doc_id,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(list_filter(string_split(tok, ''), c -> c <> ''),
                                  c -> CAST(unicode(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % 100000000000000000) % 1048573 % 64 AS b
        FROM toks),
      w AS (SELECT CAST(t.i AS BIGINT) AS b,
                   ((t.i + 7) * 2654435761) % 1000003 % 2001 AS w_bp
            FROM UNNEST(range(0, 64)) AS t(i)),
      scored AS (
        SELECT doc_id, COUNT(*) AS n_toks,
               CAST(SUM(w_bp) // COUNT(*) AS BIGINT) AS score_bp
        FROM bk JOIN w USING (b)
        GROUP BY doc_id),
      hist AS (
        SELECT score_bp, COUNT(*) AS nd, CAST(SUM(n_toks) AS BIGINT) AS nt
        FROM scored GROUP BY score_bp),
      cum AS (
        SELECT score_bp, nd, nt,
               COALESCE(SUM(nd) OVER (ORDER BY score_bp
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_lt,
               SUM(nd) OVER () AS n_docs
        FROM hist),
      dec AS (
        SELECT score_bp, nd, nt,
               CAST((c_lt * 10) // n_docs AS BIGINT) AS decile
        FROM cum)
      SELECT decile, score_bp >= 1000 AS keep,
             CAST(SUM(nd) AS BIGINT) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS n_tokens,
             MIN(score_bp) AS min_score_bp,
             MAX(score_bp) AS max_score_bp
      FROM dec
      GROUP BY decile, keep
      ORDER BY decile, keep"""),
    notes = "linear-classifier quality scoring: broadcast weight vector, one corpus pass, histogram-bounded deciles, keep/drop audit")

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): LEARN per-feature
    * importance weights from a target slice vs the raw pool over hashed
    * n-gram (unigram + bigram) features, score every document by its mean
    * weight, and audit selection by decile. [[textQualityScore]] is the
    * frozen linear classifier; this is the learned companion — the weights
    * come from the data itself (target = `lang = 'en'`, the slice the
    * curator wants more of; raw = the whole pool, target included, the
    * simplest consistent estimator), so the pipeline ships no model
    * artifact at all.
    *
    * Exact-integer transliteration of DSIR's log-ratio: the per-feature
    * weight is the Laplace-smoothed importance RATIO in bp,
    * `w_f = (10⁴·ŝ_t) div max(1, ŝ_r)` with `ŝ_x = (10⁶(x_f+1)) div (n_x+B)`
    * the 10⁻⁶-precision smoothed shares, capped at 10× (10⁵ bp) the way
    * DSIR implementations clip extreme log-ratios. A RATIO, not a share
    * delta, because rare-but-target-loaded features are exactly the signal
    * — an absolute delta drowns them in the bulk (measured: delta scores
    * collapsed the corpus into a 9-bp band; ratios spread it over ~10³ bp).
    * Every operand is non-negative by construction — defense in depth for
    * the integer divisions: measured, BOTH engines truncate toward zero
    * ((−7)//2 = −3 in DuckDB, same as Spark `div`), but on non-negative
    * operands the query is correct under either floor or trunc semantics,
    * so a dialect drift can't silently flip a score. A doc's score is the
    * mean weight over its features — the additive analog of Σ log(p_t/p_r),
    * ranking target-like documents the same way while staying BIGINT end
    * to end. Overflow bound: `10⁶·(r_f+1)` caps the exact form at ~9·10¹²
    * features (≈ tens of TB of text); past that, widen the share multiplies
    * to DECIMAL(38,0) — the structure is unchanged.
    *
    * Scale: feature stats are ONE corpus pass collapsing to B=256 hash
    * buckets (map-side combine; BOTH distributions fall out of the same
    * pass via a conditional sum — no second target scan); the weight
    * table is O(B) and broadcast; scoring is one more pass + doc-keyed
    * agg; deciles ride the ≤2·10⁴+1-row score histogram, never a
    * corpus-sized sort. Unigrams and bigrams share one explode, spread
    * off the single-file scan before the row-local hashing.
    */
  val textDsirSelect = QueryDef(
    "text_dsir_select",
    (spark, dir) => {
      import graft.functions.RollingHash
      val feats = graft.Tables.spreadIfNarrow(load(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text")))
        .select(col("doc_id"), (col("lang") === "en").as("tgt"),
          split(col("text"), " ").as("t"))
        // r17: index-form unigram+bigram explode — i ≤ n is the unigram
        // t[i], i > n the bigram t[i−n] ⊔ t[i−n+1] (for n = 1 the sequence
        // is just [1], so 1-token docs emit their unigram only, exactly
        // like the old empty slice()). The old concat(t, transform(...))
        // HOF built the whole feature array per row INTERPRETED
        // (CodegenFallback); this stays inside whole-stage codegen. Both
        // consumers (stats, scoring) recompute it: measured faster than
        // checkpointing the 500 k-row feature frame (see
        // pipeline_curate_v2's grams note).
        .select(col("doc_id"), col("tgt"), col("t"),
          explode(expr("sequence(1, 2 * size(t) - 1)")).as("i"))
        .select(col("doc_id"), col("tgt"), expr(
          """CASE WHEN i <= size(t) THEN element_at(t, i)
             ELSE concat(element_at(t, i - size(t)), ' ',
                         element_at(t, i - size(t) + 1)) END""").as("f"))
        .select(col("doc_id"), col("tgt"),
          (RollingHash(col("f")) % 1048573 % 256).as("b"))
      val stats = feats.groupBy(col("b"))
        .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("t_f"),
          count(lit(1)).as("r_f"))
      val totals = stats.agg(sum(col("t_f")).as("n_t"), sum(col("r_f")).as("n_r"))
      val weights = stats.crossJoin(broadcast(totals))
        .select(col("b"),
          least(lit(100000L), expr(
            """(10000L * ((1000000L * (t_f + 1)) div (n_t + 256)))
               div greatest(1L, (1000000L * (r_f + 1)) div (n_r + 256))"""))
            .as("w_bp"))
      val scored = feats.join(broadcast(weights), "b")
        .groupBy(col("doc_id"), col("tgt"))
        .agg(count(lit(1)).as("n_f"), sum(col("w_bp")).as("sw"))
        .select(col("doc_id"), col("tgt"), col("n_f"),
          expr("sw div n_f").as("score_bp"))
      val hist = scored.groupBy(col("score_bp"))
        .agg(count(lit(1)).as("nd"),
          sum(when(col("tgt"), 1L).otherwise(0L)).as("ntg"),
          sum(col("n_f")).as("nf"))
      val wOrd = Window.orderBy(col("score_bp"))
      hist
        .withColumn("c_lt", coalesce(sum(col("nd")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n_all", sum(col("nd")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("score_bp"), col("nd"), col("ntg"), col("nf"),
          expr("(c_lt * 10) div n_all").as("decile"))
        .groupBy(col("decile"))
        .agg(sum(col("nd")).as("n_docs"), sum(col("ntg")).as("n_target_docs"),
          sum(col("nf")).as("n_features"),
          min(col("score_bp")).as("min_score_bp"),
          max(col("score_bp")).as("max_score_bp"))
        .select(col("decile"), (col("decile") >= 8).as("keep"), col("n_docs"),
          col("n_target_docs"), col("n_features"),
          col("min_score_bp"), col("max_score_bp"))
        .orderBy(col("decile"))
    },
    Some("""
      WITH base AS (
        SELECT doc_id, lang = 'en' AS tgt, string_split(text, ' ') AS t
        FROM documents),
      feats AS (
        SELECT doc_id, tgt,
               unnest(list_concat(t,
                 list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])))
                 AS f
        FROM base),
      bk AS (
        SELECT doc_id, tgt,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(list_filter(string_split(f, ''), c -> c <> ''),
                                  c -> CAST(unicode(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % 100000000000000000) % 1048573 % 256 AS b
        FROM feats),
      stats AS (
        SELECT b, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS t_f, COUNT(*) AS r_f
        FROM bk GROUP BY b),
      totals AS (
        SELECT CAST(SUM(t_f) AS BIGINT) AS n_t, CAST(SUM(r_f) AS BIGINT) AS n_r
        FROM stats),
      weights AS (
        SELECT b,
               LEAST(100000,
                 (10000 * ((1000000 * (t_f + 1)) // (n_t + 256)))
                 // GREATEST(1, (1000000 * (r_f + 1)) // (n_r + 256))) AS w_bp
        FROM stats CROSS JOIN totals),
      scored AS (
        SELECT doc_id, tgt, COUNT(*) AS n_f,
               CAST(SUM(w_bp) // COUNT(*) AS BIGINT) AS score_bp
        FROM bk JOIN weights USING (b)
        GROUP BY doc_id, tgt),
      hist AS (
        SELECT score_bp, COUNT(*) AS nd,
               SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ntg,
               CAST(SUM(n_f) AS BIGINT) AS nf
        FROM scored GROUP BY score_bp),
      cum AS (
        SELECT score_bp, nd, ntg, nf,
               COALESCE(SUM(nd) OVER (ORDER BY score_bp
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_lt,
               SUM(nd) OVER () AS n_all
        FROM hist),
      dec AS (
        SELECT score_bp, nd, ntg, nf,
               CAST((c_lt * 10) // n_all AS BIGINT) AS decile
        FROM cum)
      SELECT decile, decile >= 8 AS keep,
             CAST(SUM(nd) AS BIGINT) AS n_docs,
             CAST(SUM(ntg) AS BIGINT) AS n_target_docs,
             CAST(SUM(nf) AS BIGINT) AS n_features,
             MIN(score_bp) AS min_score_bp,
             MAX(score_bp) AS max_score_bp
      FROM dec
      GROUP BY decile
      ORDER BY decile"""),
    notes = "DSIR importance resampling: target-vs-raw hashed n-gram ratios learned in one pass, broadcast O(B) weights, histogram-bounded deciles")

  /** TRAINED model-based quality filter — the missing third of the quality
    * triad (r14 verdict): [[textQualityScore]] scores with a FROZEN
    * stand-in weight vector (the plumbing), [[textDsirSelect]] learns
    * importance weights against a *language* target; this one TRAINS a
    * linear quality classifier the fastText/DCLM way — weak supervision:
    *
    *   1. label every document with the heuristic `text_quality` "natural"
    *      rule (≥30 tokens, distinct-ratio ≥ 2500 bp, stopword ratio in
    *      [200, 2500] bp) — the proxy-label trick production pipelines use
    *      (train on Wikipedia-vs-CommonCrawl, score everything);
    *   2. learn per-feature weights from that label in ONE corpus pass:
    *      w_f = Laplace-smoothed LIFT of the feature's share among good
    *      docs vs the whole pool (the [[textKeywords]] class-lift
    *      construction under [[textDsirSelect]]'s exact-integer bp scheme,
    *      capped at 10× — a naive-Bayes log-odds analog kept additive);
    *   3. score every document as its mean feature weight and audit the
    *      keep/drop decision by decile — n_docs, n_good (label agreement),
    *      and the per-decile good-RATE, the enrichment curve a curator
    *      reads before trusting the filter (gated monotone in
    *      TextRulesSpec).
    *
    * Features are hashed unigrams+bigrams (the [[textDsirSelect]]
    * construction, B = 256 buckets): bigrams matter because quality is
    * phrasal — "of the" is a good-doc feature even where "of" alone is
    * neutral. Every number is BIGINT basis points; both engines make
    * bit-identical train AND score decisions.
    *
    * Scale: label + featurize ride ONE corpus scan (the label is a
    * row-local expression over the token array — no second pass, no join
    * back); bucket stats collapse map-side to B rows; the weight table is
    * O(B) broadcast; scoring is one more pass; deciles ride the integer
    * score histogram (≤ 10⁵+1 rows), never a corpus sort — the same
    * shuffle budget as text_dsir_select, measured flat at 100× there.
    */
  val textQualityClassifier = QueryDef(
    "text_quality_classifier",
    (spark, dir) => {
      import graft.functions.RollingHash
      val stop = Seq("the", "a", "and", "of", "in")
      val t = split(col("text"), " ")
      // codegen'd occurrence sum, not filter(isin) — the r17 interpreted
      // lambdafunction replayed in every consumer subtree (r17 verdict
      // item 2); rationale and exactness argument at Tables.occurrenceCount
      val nStop = graft.Tables.occurrenceCount(t, stop).cast("long")
      val labeled = graft.Tables.spreadIfNarrow(load(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .select(col("doc_id"), t.as("t"),
          size(t).cast("long").as("n_tok"),
          size(array_distinct(t)).cast("long").as("n_dis"),
          nStop.as("n_stop"))
        .select(col("doc_id"), col("t"),
          (col("n_tok") >= 30 &&
            expr("(n_dis * 10000) div n_tok") >= 2500 &&
            expr("(n_stop * 10000) div n_tok").between(200, 2500)).as("good"))
      // r17: same index-form unigram+bigram explode as text_dsir_select —
      // and, as there, `feats` is deliberately recomputed by its consumers
      // (the stats aggregate and the scoring join) rather than
      // checkpointed; the label expressions above are codegen'd row-local
      // work, and the replayed aggregate exchange dedupes at runtime
      // (ReusedExchange — see plans/r18)
      val feats = labeled
        .select(col("doc_id"), col("good"), col("t"),
          explode(expr("sequence(1, 2 * size(t) - 1)")).as("i"))
        .select(col("doc_id"), col("good"), expr(
          """CASE WHEN i <= size(t) THEN element_at(t, i)
             ELSE concat(element_at(t, i - size(t)), ' ',
                         element_at(t, i - size(t) + 1)) END""").as("f"))
        .select(col("doc_id"), col("good"),
          (RollingHash(col("f")) % 1048573 % 256).as("b"))
      val stats = feats.groupBy(col("b"))
        .agg(sum(when(col("good"), 1L).otherwise(0L)).as("g_f"),
          count(lit(1)).as("r_f"))
      val totals = stats.agg(sum(col("g_f")).as("n_g"), sum(col("r_f")).as("n_r"))
      val weights = stats.crossJoin(broadcast(totals))
        .select(col("b"),
          least(lit(100000L), expr(
            """(10000L * ((1000000L * (g_f + 1)) div (n_g + 256)))
               div greatest(1L, (1000000L * (r_f + 1)) div (n_r + 256))"""))
            .as("w_bp"))
      val scored = feats.join(broadcast(weights), "b")
        .groupBy(col("doc_id"), col("good"))
        .agg(count(lit(1)).as("n_f"), sum(col("w_bp")).as("sw"))
        .select(col("doc_id"), col("good"), expr("sw div n_f").as("score_bp"))
      val hist = scored.groupBy(col("score_bp"))
        .agg(count(lit(1)).as("nd"),
          sum(when(col("good"), 1L).otherwise(0L)).as("ng"))
      val wOrd = Window.orderBy(col("score_bp"))
      hist
        .withColumn("c_lt", coalesce(sum(col("nd")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n_all", sum(col("nd")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("score_bp"), col("nd"), col("ng"),
          expr("(c_lt * 10) div n_all").as("decile"))
        .groupBy(col("decile"))
        .agg(sum(col("nd")).as("n_docs"), sum(col("ng")).as("n_good_docs"),
          min(col("score_bp")).as("min_score_bp"),
          max(col("score_bp")).as("max_score_bp"))
        .select(col("decile"), (col("decile") >= 2).as("keep"), col("n_docs"),
          col("n_good_docs"),
          expr("(n_good_docs * 10000) div n_docs").as("good_rate_bp"),
          col("min_score_bp"), col("max_score_bp"))
        .orderBy(col("decile"))
    },
    Some("""
      WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      labeled AS (
        SELECT doc_id, t,
               len(t) >= 30
               AND (CAST(len(list_distinct(t)) AS BIGINT) * 10000)
                   // CAST(len(t) AS BIGINT) >= 2500
               AND (CAST(len(list_filter(t,
                     x -> list_contains(['the','a','and','of','in'], x)))
                     AS BIGINT) * 10000) // CAST(len(t) AS BIGINT)
                   BETWEEN 200 AND 2500 AS good
        FROM base),
      feats AS (
        SELECT doc_id, good,
               unnest(list_concat(t,
                 list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])))
                 AS f
        FROM labeled),
      bk AS (
        SELECT doc_id, good,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(list_filter(string_split(f, ''), c -> c <> ''),
                                  c -> CAST(unicode(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % 100000000000000000) % 1048573 % 256 AS b
        FROM feats),
      stats AS (
        SELECT b, SUM(CASE WHEN good THEN 1 ELSE 0 END) AS g_f, COUNT(*) AS r_f
        FROM bk GROUP BY b),
      totals AS (
        SELECT CAST(SUM(g_f) AS BIGINT) AS n_g, CAST(SUM(r_f) AS BIGINT) AS n_r
        FROM stats),
      weights AS (
        SELECT b,
               LEAST(100000,
                 (10000 * ((1000000 * (g_f + 1)) // (n_g + 256)))
                 // GREATEST(1, (1000000 * (r_f + 1)) // (n_r + 256))) AS w_bp
        FROM stats CROSS JOIN totals),
      scored AS (
        SELECT doc_id, good,
               CAST(SUM(w_bp) // COUNT(*) AS BIGINT) AS score_bp
        FROM bk JOIN weights USING (b)
        GROUP BY doc_id, good),
      hist AS (
        SELECT score_bp, COUNT(*) AS nd,
               SUM(CASE WHEN good THEN 1 ELSE 0 END) AS ng
        FROM scored GROUP BY score_bp),
      cum AS (
        SELECT score_bp, nd, ng,
               COALESCE(SUM(nd) OVER (ORDER BY score_bp
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_lt,
               SUM(nd) OVER () AS n_all
        FROM hist),
      dec AS (
        SELECT score_bp, nd, ng,
               CAST((c_lt * 10) // n_all AS BIGINT) AS decile
        FROM cum)
      SELECT decile, decile >= 2 AS keep,
             CAST(SUM(nd) AS BIGINT) AS n_docs,
             CAST(SUM(ng) AS BIGINT) AS n_good_docs,
             (CAST(SUM(ng) AS BIGINT) * 10000) // CAST(SUM(nd) AS BIGINT)
               AS good_rate_bp,
             MIN(score_bp) AS min_score_bp,
             MAX(score_bp) AS max_score_bp
      FROM dec
      GROUP BY decile
      ORDER BY decile"""),
    notes = "weak-supervision quality classifier: heuristic proxy label, class-lift weights over hashed unigram+bigram features learned in one pass, broadcast O(B) weights, per-decile enrichment audit")

  /** CCNet-style LM cross-entropy bucketing (Wenzek et al. 2020) — the
    * remaining canonical curation stage: train a language model on a
    * TARGET corpus, score every document by its per-token cross-entropy
    * under that LM, and split each language into head/middle/tail
    * TERCILES (CCNet keeps head+middle, drops tail). The quality triad
    * filters on labels and lift; this filters on MODEL SURPRISAL — docs a
    * target-trained LM finds predictable rank low (head), gibberish and
    * off-domain text rank high (tail).
    *
    * The LM is add-one-smoothed bigrams trained on the `lang = 'en'`
    * slice (the dsir target convention): p(b|a) = (n_pair+1)/(n_a+V).
    * The house rule bans transcendentals (`text_bigram_lm`'s -log p
    * note: float log drifts across engines), so the negative log is
    * computed EXACTLY in whole bits: for BIGINT x ≥ 1, floor(log₂ x) =
    * length(bin(x)) − 1 in Spark = length(format('{:b}', x)) − 1 in
    * DuckDB — integer string ops, bit-identical. Per transition,
    * nlp_bits = floor(log₂((n_a+V) div (n_pair+1))) — the integer-div-
    * then-log lower bound of the true -log₂ p, deterministic in both
    * engines; unseen history rows coalesce to the uniform backoff
    * log₂(V). A doc's score is centibits per transition,
    * (Σ nlp·100) div n_bigrams; 1-token docs carry no transition and are
    * excluded up front (the text_bigram_lm guard).
    *
    * Terciles are PER LANGUAGE over the integer score histogram (CCNet
    * buckets per language): cumulative counts ride a lang-partitioned
    * window over ≤ histogram-many rows, never a corpus sort.
    *
    * Scale: training is one explode + two aggregates over the target
    * slice; scoring shuffle-joins the corpus transitions against the LM
    * on (a, b) — vocabulary-scale tables, so NOT broadcast (at
    * production scale CCNet prunes the LM to top-k n-grams; the join
    * shape is unchanged). V rides a broadcast 1-row scalar.
    */
  val textCcnetBucket = QueryDef(
    "text_ccnet_bucket",
    (spark, dir) => {
      val t = split(col("text"), " ")
      val base = graft.Tables.spreadIfNarrow(load(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text")))
        .select(col("doc_id"), col("lang"), t.as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), col("lang"), col("t"),
          size(col("t")).cast("long").as("n_tok"))
      // r17: index-form bigram explode — explode(sequence) + element_at
      // stays inside whole-stage codegen; the struct-HOF transform(...)
      // form evaluates interpreted via CodegenFallback (measured ~15
      // task-seconds per pass at sf0.1, ~7 after the rewrite). The LM
      // build and the scored join each re-run the explode by design:
      // materializing the gram frame was measured SLOWER (row-granular
      // cache reads cost more than the codegen recompute — see
      // pipeline_curate_v2's grams comment).
      val grams = base.select(col("doc_id"), col("lang"), col("n_tok"),
          col("t"), explode(expr("sequence(1, size(t) - 1)")).as("i"))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          expr("element_at(t, i)").as("a"),
          expr("element_at(t, i + 1)").as("b"))
      val lm = grams.filter(col("lang") === "en")
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_pair"))
      val lmA = lm.groupBy(col("a")).agg(sum(col("n_pair")).as("n_a"))
      val vRow = lm.agg(countDistinct(col("b")).as("v"))
      val scored = grams
        .join(lm, Seq("a", "b"), "left")
        .join(lmA, Seq("a"), "left")
        .crossJoin(broadcast(vRow))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          (length(bin(expr(
            "(coalesce(n_a, 0L) + v) div (coalesce(n_pair, 0L) + 1L)")))
            - 1).cast("long").as("nlp_bits"))
        .groupBy(col("doc_id"), col("lang"), col("n_tok"))
        .agg(count(lit(1)).as("n_big"), sum(col("nlp_bits")).as("snlp"))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          expr("(snlp * 100) div n_big").as("score_cb"))
      val hist = scored.groupBy(col("lang"), col("score_cb"))
        .agg(count(lit(1)).as("nd"), sum(col("n_tok")).as("nt"))
      val wOrd = Window.partitionBy(col("lang")).orderBy(col("score_cb"))
      hist
        .withColumn("c_lt", coalesce(sum(col("nd")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n_lang", sum(col("nd")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("lang"), col("nd"), col("nt"), col("score_cb"),
          expr("(c_lt * 3) div n_lang").as("bucket"))
        .groupBy(col("lang"), col("bucket"))
        .agg(sum(col("nd")).as("n_docs"), sum(col("nt")).as("n_tokens"),
          min(col("score_cb")).as("min_score_cb"),
          max(col("score_cb")).as("max_score_cb"))
        .select(col("lang"),
          when(col("bucket") === 0, lit("head"))
            .when(col("bucket") === 1, lit("middle"))
            .otherwise(lit("tail")).as("bucket"),
          col("n_docs"), col("n_tokens"),
          col("min_score_cb"), col("max_score_cb"))
        .orderBy(col("lang"), col("bucket"))
    },
    Some("""
      WITH base AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
      grams AS (
        SELECT doc_id, lang, n_tok, t[i] AS a, t[i + 1] AS b
        FROM (SELECT doc_id, lang, n_tok, t,
                     unnest(generate_series(1, len(t) - 1)) AS i
              FROM base)),
      lm AS (
        SELECT a, b, COUNT(*) AS n_pair FROM grams
        WHERE lang = 'en' GROUP BY a, b),
      lm_a AS (
        SELECT a, CAST(SUM(n_pair) AS BIGINT) AS n_a FROM lm GROUP BY a),
      v AS (SELECT COUNT(DISTINCT b) AS v FROM lm),
      scored AS (
        SELECT doc_id, lang, n_tok,
               CAST((SUM(length(format('{:b}',
                      (COALESCE(n_a, 0) + v.v) // (COALESCE(n_pair, 0) + 1)))
                     - 1) * 100) // COUNT(*) AS BIGINT) AS score_cb
        FROM grams
        LEFT JOIN lm USING (a, b)
        LEFT JOIN lm_a USING (a)
        CROSS JOIN v
        GROUP BY doc_id, lang, n_tok),
      hist AS (
        SELECT lang, score_cb, COUNT(*) AS nd,
               CAST(SUM(n_tok) AS BIGINT) AS nt
        FROM scored GROUP BY lang, score_cb),
      cum AS (
        SELECT lang, score_cb, nd, nt,
               COALESCE(SUM(nd) OVER (PARTITION BY lang ORDER BY score_cb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_lt,
               SUM(nd) OVER (PARTITION BY lang) AS n_lang
        FROM hist),
      dec AS (
        SELECT lang, nd, nt, score_cb,
               CAST((c_lt * 3) // n_lang AS BIGINT) AS bucket
        FROM cum)
      SELECT lang,
             CASE bucket WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
                  ELSE 'tail' END AS bucket,
             CAST(SUM(nd) AS BIGINT) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS n_tokens,
             MIN(score_cb) AS min_score_cb,
             MAX(score_cb) AS max_score_cb
      FROM dec
      GROUP BY lang, bucket
      ORDER BY lang, bucket"""),
    notes = "CCNet cross-entropy bucketing: add-one bigram LM trained on the target slice, exact integer-bit -log2 scoring (no transcendentals), per-language head/middle/tail terciles over the score histogram")

  val all: Seq[QueryDef] = Seq(textTfidf, textBm25, textHashEmbed, textKeywords,
    topkSketch, textPostings, textQualityScore, textDsirSelect,
    textQualityClassifier, textCcnetBucket)
}
