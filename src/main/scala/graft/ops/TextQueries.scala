package graft.ops

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.Tables.load
import graft.functions.RollingHash

/** Text-analysis + exact/approximate dedup operators over `documents`
  * (north-star extension surface: the operations a large-scale training-data
  * pipeline needs — language ID, quality scoring, token counting,
  * fingerprinting, duplicate detection).
  */
object TextQueries {

  private val Stopwords = Seq("the", "a", "and", "of", "in")

  /** Token counting + quality metrics, aggregated per language. All counts
    * are exact ints; ratios are single divisions of exact ints (see
    * [[graft.Tables]] float rules).
    */
  val textStats = QueryDef(
    "text_stats",
    (spark, dir) => {
      val docs = load(spark, dir, "documents")
      val toks = split(col("text"), " ")
      docs
        .select(
          col("lang"), col("n_chars"),
          size(toks).as("n_tok"),
          size(array_distinct(toks)).as("n_distinct"),
          // codegen'd occurrence sum, not filter(isin) — see occurrenceCount
          Tables.occurrenceCount(toks, Stopwords).as("n_stop"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tokens"),
          sum(col("n_distinct")).as("sum_distinct"),
          sum(col("n_stop")).as("sum_stopwords"),
          sum(col("n_chars")).as("sum_chars"))
        .withColumn("avg_tokens", Tables.exactDiv(col("sum_tokens"), col("n_docs")))
        .withColumn("stopword_ratio", Tables.exactDiv(col("sum_stopwords"), col("sum_tokens")))
        .orderBy(col("lang"))
    },
    Some(s"""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
             CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS sum_distinct,
             CAST(SUM(len(list_filter(string_split(text, ' '),
               t -> list_contains([${Stopwords.map(s => s"'$s'").mkString(", ")}], t)))) AS BIGINT) AS sum_stopwords,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tokens,
             CAST(SUM(len(list_filter(string_split(text, ' '),
               t -> list_contains([${Stopwords.map(s => s"'$s'").mkString(", ")}], t)))) AS DOUBLE)
               / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS stopword_ratio
      FROM documents
      GROUP BY lang
      ORDER BY lang"""))

  /** Heuristic language ID: stopword-profile hit counts with a fixed
    * tie-break cascade — the n-gram-profile technique in miniature, fully
    * expression-based so it stays inside whole-stage codegen (no UDF).
    */
  val textLangid = QueryDef(
    "text_langid",
    (spark, dir) => {
      val docs = load(spark, dir, "documents")
      val toks = split(col("text"), " ")
      def hits(ws: Seq[String]) = Tables.occurrenceCount(toks, ws)
      val en = hits(Seq("the", "a", "of"))
      val qry = hits(Seq("query", "join", "filter"))
      val dat = hits(Seq("data", "row", "table"))
      docs
        .withColumn("predicted",
          when(en >= qry && en >= dat && en > 0, lit("en"))
            .when(qry >= dat && qry > 0, lit("qry"))
            .when(dat > 0, lit("dat"))
            .otherwise(lit("unk")))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    },
    Some("""
      WITH scored AS (
        SELECT lang,
               len(list_filter(string_split(text, ' '), t -> list_contains(['the','a','of'], t))) AS en,
               len(list_filter(string_split(text, ' '), t -> list_contains(['query','join','filter'], t))) AS qry,
               len(list_filter(string_split(text, ' '), t -> list_contains(['data','row','table'], t))) AS dat
        FROM documents)
      SELECT lang,
             CASE WHEN en >= qry AND en >= dat AND en > 0 THEN 'en'
                  WHEN qry >= dat AND qry > 0 THEN 'qry'
                  WHEN dat > 0 THEN 'dat'
                  ELSE 'unk' END AS predicted,
             COUNT(*) AS n
      FROM scored
      GROUP BY 1, 2
      ORDER BY lang, predicted"""))

  /** Exact dedup: hash-groupBy on content (md5 fingerprint), keeping the
    * lowest doc_id per group — the scalable exact-dedup shape (one shuffle
    * on the fingerprint, never a pairwise compare).
    */
  val dedupExact = QueryDef(
    "dedup_exact",
    (spark, dir) => {
      load(spark, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy(col("keeper"))
    },
    Some("""
      SELECT md5(text) AS fp, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
      FROM documents
      GROUP BY md5(text)
      ORDER BY keeper"""))

  /** Token-set Jaccard near-dup on a deterministic blocking subset
    * (doc_id % 20 = 0, same-language pairs): distinct-token explode →
    * self-join on token → |A∩B| / |A∪B|.
    *
    * Scale note: a raw token self-join is quadratic within each
    * (token, lang) posting list — fine for a blocked subset, ruinous for the
    * full corpus; the full-corpus path is MinHash LSH
    * ([[DedupQueries.dedupMinhashLsh]]), which bounds candidate generation
    * by band-bucket, not by vocabulary frequency.
    */
  val dedupJaccardTokens = QueryDef(
    "dedup_jaccard_tokens",
    (spark, dir) => {
      val d = load(spark, dir, "documents")
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"), col("lang"),
          array_distinct(split(col("text"), " ")).as("toks"))
      val e = d.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
      val n = d.select(col("doc_id"), size(col("toks")).as("n"))
      val pairs = e.as("a").join(e.as("b"),
          col("a.tok") === col("b.tok") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("common"))
      pairs
        .join(n.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
        .join(n.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
        .select(col("a_id"), col("b_id"),
          Tables.basisPoints(col("common") / (col("na") + col("nb") - col("common")))
            .as("jaccard_bp"))
        .filter(col("jaccard_bp") >= 5000)
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""
      WITH d AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
                 FROM documents WHERE doc_id % 20 = 0),
           e AS (SELECT doc_id, lang, unnest(toks) AS tok FROM d),
           c AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
                 FROM e a JOIN e b ON a.tok = b.tok AND a.lang = b.lang
                                   AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
           n AS (SELECT doc_id, len(toks) AS n FROM d)
      SELECT a_id, b_id,
             CAST(floor(common / (na.n + nb.n - common) * 10000 + 0.5) AS BIGINT) AS jaccard_bp
      FROM c JOIN n na ON c.a_id = na.doc_id JOIN n nb ON c.b_id = nb.doc_id
      WHERE CAST(floor(common / (na.n + nb.n - common) * 10000 + 0.5) AS BIGINT) >= 5000
      ORDER BY a_id, b_id"""))

  /** Document fingerprinting via the custom codegen'd [[RollingHash]]
    * Catalyst expression — same fold expressed as a DuckDB list_reduce.
    */
  val textFingerprint = QueryDef(
    "text_fingerprint",
    (spark, dir) => {
      load(spark, dir, "documents")
        .select(col("doc_id"), RollingHash(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                                c -> CAST(unicode(c) AS BIGINT))),
               (a, c) -> (a * 31 + c) % 100000000000000000) AS fp
      FROM documents
      ORDER BY doc_id"""))

  /** 3-gram shingle Jaccard (the canonical near-dup shingle pipeline shape)
    * on the same blocked subset: shingle sets are far sparser than token sets
    * (tiny shared vocabulary → high token overlap, low phrase overlap), so
    * the threshold is low; one shared shingle in ~100 is already signal here.
    */
  val dedupJaccardShingles = QueryDef(
    "dedup_jaccard_shingles",
    (spark, dir) => {
      // Perf notes (measured, not guessed):
      // - tokenize into a projected column before the lambda references it;
      //   an expression embedded in a transform() body re-evaluates per
      //   element (≈300 re-tokenizations per row here);
      // - repartition: the source parquet is one file → one partition, and
      //   higher-order-function eval is interpreted — spread it;
      // - explode the shingle expression DIRECTLY: `select(sh.as("x"))` then
      //   `explode(col("x"))` goes through an alias hop that costs ~4× in
      //   the Generate path.
      val base = load(spark, dir, "documents")
        .filter(col("doc_id") % 20 === 0)
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      // <3-token docs: sequence(1, size-2) counts DOWN (Spark defaults to
      // step -1 when start > stop), its i=0 makes element_at throw, and
      // under the session's ANSI default even i=1's +2 lookup is
      // out-of-bounds — so the whole shingle expression sits behind a lazy
      // when(): CaseWhen evaluates only the taken branch, and the empty
      // otherwise matches the oracle's empty generate_series(1, len-2)
      val shExpr = when(size(col("toks")) >= 3,
        array_distinct(transform(
          sequence(lit(1), size(col("toks")) - 2),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))))
        .otherwise(array().cast("array<string>"))
      // bucket-pair formulation instead of a self-join: group doc ids per
      // shingle, expand in-bucket pairs — candidate generation is bounded by
      // bucket size, never a full relation self-join
      val e = base.select(col("doc_id"), col("lang"), explode(shExpr).as("s"))
      val n = base.select(col("doc_id"), size(shExpr).as("n"))
      val buckets = e.groupBy(col("s"), col("lang"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
      buckets
        .select(explode(col("ids")).as("a_id"), col("ids"))
        .select(col("a_id"), explode(col("ids")).as("b_id"))
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("common"))
        .join(n.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
        .join(n.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
        .select(col("a_id"), col("b_id"),
          Tables.basisPoints(col("common") / (col("na") + col("nb") - col("common")))
            .as("jaccard_bp"))
        .filter(col("jaccard_bp") >= 50)
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""
      WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
                 FROM documents WHERE doc_id % 20 = 0),
           d AS (SELECT doc_id, lang,
                        list_distinct(list_transform(
                          generate_series(1, len(toks) - 2),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
                 FROM t),
           e AS (SELECT doc_id, lang, unnest(sh) AS s FROM d),
           c AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
                 FROM e a JOIN e b ON a.s = b.s AND a.lang = b.lang
                                   AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
           n AS (SELECT doc_id, len(sh) AS n FROM d)
      SELECT a_id, b_id,
             CAST(floor(common / (na.n + nb.n - common) * 10000 + 0.5) AS BIGINT) AS jaccard_bp
      FROM c JOIN n na ON c.a_id = na.doc_id JOIN n nb ON c.b_id = nb.doc_id
      WHERE CAST(floor(common / (na.n + nb.n - common) * 10000 + 0.5) AS BIGINT) >= 50
      ORDER BY a_id, b_id"""))

  val all: Seq[QueryDef] = Seq(textStats, textLangid, dedupExact,
    dedupJaccardTokens, dedupJaccardShingles, textFingerprint)
}
