package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.QueryDef
import graft.Tables.{cents, load}

/** Sixth-wave operator coverage: the remaining logical-plan shapes — native
  * session windows, unpivot (wide→long), LATERAL correlated joins, explicit
  * GROUPING SETS with grouping_id, the window navigation-function battery
  * (lead / first_value / nth_value / last_value with explicit frames), and
  * positional explode.
  */
object CoverageQueries {

  private def view(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): Unit =
    load(spark, dir, name).createOrReplaceTempView(name)

  /** Typed row for [[typedEvents]] (top-level: encoder derivation needs a
    * TypeTag, which method-local case classes don't get).
    */
  final case class Ev(event_id: Long, user_id: Long, value: Double)

  /** Native session windows: `session_window(ts, gap)` merges per-user event
    * runs separated by <30 min — Spark's SessionWindow operator (merging
    * state, not a fixed grid). The oracle rebuilds identical sessions with
    * the gaps-and-islands idiom (lag → gap flag → running session ordinal).
    * Scale: one shuffle on user_id; session merge is per-key streaming state.
    */
  val eventsSessionWindow = QueryDef(
    "events_session_window",
    (spark, dir) => {
      load(spark, dir, "events")
        .filter(col("user_id") < 50)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("value_cents"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""
      -- gap arithmetic on epoch_us, not raw ts: under an ns-preserving
      -- DuckDB a gap of exactly 30min at us precision could carry an ns
      -- residue and flip the >= threshold vs Spark's us-truncated events
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents,
               CASE WHEN epoch_us(ts)
                         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                         >= 1800000000
                    OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events WHERE user_id < 50),
      s AS (
        SELECT user_id, tus, v_cents,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus
                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM e)
      SELECT user_id,
             strftime(make_timestamp(MIN(tus)), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(make_timestamp(MAX(tus) + 1800000000), '%Y-%m-%d %H:%M:%S') AS session_end,
             COUNT(*) AS n_events,
             CAST(SUM(v_cents) AS BIGINT) AS value_cents
      FROM s
      GROUP BY user_id, session_id
      ORDER BY user_id, session_start"""))

  /** Unpivot (wide→long): per-user event-type counts pivoted wide, then
    * melted back with `Dataset.unpivot` — zero-count cells survive as
    * explicit rows (the semantic difference from just grouping long-form).
    */
  val eventsUnpivot = QueryDef(
    "events_unpivot",
    (spark, dir) => {
      val wide = load(spark, dir, "events")
        .filter(col("user_id") < 100)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("click"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("view"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchase"))
      wide.unpivot(Array(col("user_id")),
          Array(col("click"), col("view"), col("purchase")),
          "event_type", "n_events")
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""
      WITH wide AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS click,
               SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS view,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase
        FROM events WHERE user_id < 100 GROUP BY user_id)
      SELECT user_id, t.event_type, CAST(t.n_events AS BIGINT) AS n_events
      FROM wide,
           LATERAL (VALUES ('click', click), ('view', view),
                    ('purchase', purchase)) t(event_type, n_events)
      ORDER BY user_id, event_type"""))

  /** LATERAL correlated join: top-2 suppliers per nation by (balance, key),
    * written as SQL LATERAL with ORDER BY + LIMIT inside the correlated
    * subquery — the per-row-subquery plan shape (Spark decorrelates to a
    * ranked window under the hood; DuckDB runs it as a lateral join).
    */
  val joinLateral = QueryDef(
    "join_lateral",
    (spark, dir) => {
      view(spark, dir, "nation"); view(spark, dir, "supplier")
      spark.sql("""
        SELECT n_name, l.s_suppkey, l.s_name, l.bal_cents
        FROM nation,
        LATERAL (SELECT s_suppkey, s_name,
                        CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
                 FROM supplier
                 WHERE s_nationkey = n_nationkey
                 ORDER BY bal_cents DESC, s_suppkey
                 LIMIT 2) l
        ORDER BY n_name, bal_cents DESC, s_suppkey""")
    },
    Some("""
      SELECT n_name, l.s_suppkey, l.s_name, l.bal_cents
      FROM nation,
      LATERAL (SELECT s_suppkey, s_name,
                      CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
               FROM supplier
               WHERE s_nationkey = n_nationkey
               ORDER BY bal_cents DESC, s_suppkey
               LIMIT 2) l
      ORDER BY n_name, bal_cents DESC, s_suppkey"""))

  /** Explicit GROUPING SETS — region level, region×nation level, and grand
    * total in one pass, with GROUPING() flags distinguishing "NULL because
    * rolled up" from data nulls. Same partial-aggregate expansion machinery
    * as rollup/cube but with a hand-picked set list.
    */
  val aggGroupingSets = QueryDef(
    "agg_grouping_sets",
    (spark, dir) => {
      view(spark, dir, "region"); view(spark, dir, "nation")
      view(spark, dir, "supplier")
      spark.sql("""
        SELECT r_name, n_name,
               CAST(GROUPING(r_name) AS BIGINT) AS g_region,
               CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
               COUNT(*) AS n_supp,
               CAST(SUM(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        ORDER BY g_region DESC, g_nation DESC, r_name NULLS FIRST, n_name NULLS FIRST""")
    },
    Some("""
      SELECT r_name, n_name,
             CAST(GROUPING(r_name) AS BIGINT) AS g_region,
             CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
             COUNT(*) AS n_supp,
             CAST(SUM(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
      ORDER BY g_region DESC, g_nation DESC, r_name NULLS FIRST, n_name NULLS FIRST"""))

  /** Window navigation battery: lead / first_value / last_value / nth_value
    * over per-user event-time order, with an explicit ROWS frame for the
    * running last (default RANGE frames differ between engines on ties —
    * event times are unique per user in this data, but pin ROWS anyway).
    */
  val windowNavigation = QueryDef(
    "window_navigation",
    (spark, dir) => {
      val byTs = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val running = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      load(spark, dir, "events")
        .filter(col("user_id") < 30)
        .select(col("user_id"), col("event_id"),
          lead(col("event_id"), 1).over(byTs).as("next_event_id"),
          lead(col("event_id"), 2, -1L).over(byTs).as("next2_or_default"),
          first(col("event_id")).over(byTs).as("first_event_id"),
          last(col("event_id")).over(running).as("running_last_id"),
          nth_value(col("event_id"), 3).over(running).as("third_event_id"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      -- window order on epoch_us, not raw ts: an ns-preserving DuckDB would
      -- rank same-us events by their ns residue before the event_id tiebreak
      SELECT user_id, event_id,
             LEAD(event_id, 1) OVER w AS next_event_id,
             LEAD(event_id, 2, -1) OVER w AS next2_or_default,
             FIRST_VALUE(event_id) OVER w AS first_event_id,
             LAST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS UNBOUNDED PRECEDING) AS running_last_id,
             NTH_VALUE(event_id, 3) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS UNBOUNDED PRECEDING) AS third_event_id
      FROM events
      WHERE user_id < 30
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      ORDER BY user_id, event_id"""))

  /** Positional explode: posexplode of the token array (Generate with
    * ordinal) — the order-preserving flatten every sequence-labeling
    * pipeline needs. DuckDB twin: parallel unnest of the list and its index
    * range (both unnests zip positionally in one SELECT).
    */
  val arrayExplodePos = QueryDef(
    "array_explode_pos",
    (spark, dir) => {
      load(spark, dir, "documents")
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
          col("col").as("tok"))
        .filter(col("pos") < 20)
        .orderBy(col("doc_id"), col("pos"))
    },
    Some("""
      SELECT doc_id, pos, tok
      FROM (SELECT doc_id,
                   unnest(range(len(string_split(text, ' ')))) AS pos,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
            WHERE doc_id % 50 = 0)
      WHERE pos < 20
      ORDER BY doc_id, pos"""))

  /** Fuzzy near-dup by edit distance: candidate pairs blocked on a SimHash
    * LSH band (shared machinery with `dedup_simhash`), then scored with
    * levenshtein on a 40-char prefix — the character-level complement to
    * token Jaccard (catches small in-place edits). Scale posture:
    * levenshtein is O(m·n) per pair, so it only ever runs on band-bucketed
    * candidates — the block key is (band, band-value, lang), so even a
    * corpus dominated by one language subdivides into content-fingerprint
    * buckets and the candidate join stays equi-keyed and near-linear, never
    * the raw same-language cross product.
    */
  val dedupLevenshtein = QueryDef(
    "dedup_levenshtein",
    (spark, dir) => {
      val d = load(spark, dir, "documents").filter(col("doc_id") % 10 === 0)
      val cand = DedupQueries.bandCandidatePairs(
        DedupQueries.simhashBands(DedupQueries.simhashFingerprints(d)))
      val pre = d.select(col("doc_id"), substring(col("text"), 1, 40).as("prefix"))
      cand
        .join(pre.select(col("doc_id").as("a_id"), col("prefix").as("a_prefix")), "a_id")
        .join(pre.select(col("doc_id").as("b_id"), col("prefix").as("b_prefix")), "b_id")
        .select(col("a_id"), col("b_id"),
          levenshtein(col("a_prefix"), col("b_prefix")).cast(LongType).as("edit_dist"))
        .filter(col("edit_dist") <= 28)
        .orderBy(col("a_id"), col("b_id"))
    },
    Some(s"""
      WITH ${DedupQueries.simhashBandsSql("WHERE doc_id % 10 = 0")},
      pre AS (
        SELECT doc_id, substr(text, 1, 40) AS prefix
        FROM documents WHERE doc_id % 10 = 0),
      cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bv = b.bv AND a.lang = b.lang
         AND a.doc_id < b.doc_id)
      SELECT a_id, b_id,
             CAST(levenshtein(pa.prefix, pb.prefix) AS BIGINT) AS edit_dist
      FROM cand
      JOIN pre pa ON pa.doc_id = a_id
      JOIN pre pb ON pb.doc_id = b_id
      WHERE levenshtein(pa.prefix, pb.prefix) <= 28
      ORDER BY a_id, b_id"""))

  /** Multiset set operations — INTERSECT ALL / EXCEPT ALL keep duplicate
    * cardinality (the distinct variants are `setops`). Spark plans these as
    * aggregate+generate replication rather than a dedup; the counts pin the
    * bag semantics.
    */
  val setopsAll = QueryDef(
    "setops_all",
    (spark, dir) => {
      view(spark, dir, "lineitem")
      spark.sql("""
        WITH y95 AS (SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q
                     FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                       AND l_shipdate < TIMESTAMP '1996-01-01' AND l_orderkey % 10 = 0),
             y96 AS (SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q
                     FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                       AND l_shipdate < TIMESTAMP '1997-01-01' AND l_orderkey % 10 = 0)
        SELECT 'common_bag' AS bucket, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sum_q
        FROM (SELECT q FROM y95 INTERSECT ALL SELECT q FROM y96)
        UNION ALL
        SELECT 'only95_bag' AS bucket, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sum_q
        FROM (SELECT q FROM y95 EXCEPT ALL SELECT q FROM y96)
        ORDER BY bucket""")
    },
    Some("""
      WITH y95 AS (SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q
                   FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                     AND l_shipdate < TIMESTAMP '1996-01-01' AND l_orderkey % 10 = 0),
           y96 AS (SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q
                   FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate < TIMESTAMP '1997-01-01' AND l_orderkey % 10 = 0)
      SELECT 'common_bag' AS bucket, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sum_q
      FROM (SELECT q FROM y95 INTERSECT ALL SELECT q FROM y96)
      UNION ALL
      SELECT 'only95_bag' AS bucket, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sum_q
      FROM (SELECT q FROM y95 EXCEPT ALL SELECT q FROM y96)
      ORDER BY bucket"""))

  /** Typed Dataset[T] pipeline: case-class encoder → typed filter →
    * `groupByKey` → `mapGroups` with arbitrary Scala per group. This is the
    * escape hatch for logic Catalyst can't express; the cost is real
    * (object serialization, no codegen through the lambda), which is why
    * every other query in this engine stays on the Column API — this one
    * exists to pin that the typed path produces identical results. Only
    * order-insensitive statistics are computed (mapGroups iterator order is
    * not defined).
    */
  val typedEvents = QueryDef(
    "typed_events",
    (spark, dir) => {
      import spark.implicits._
      val ds = load(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
        .as[Ev]
        .filter((e: Ev) => e.value > 0.0 && e.user_id % 15 == 0)
      ds.groupByKey((e: Ev) => e.user_id)
        .mapGroups { (uid: Long, it: Iterator[Ev]) =>
          var n = 0L; var sumCents = 0L; var maxId = Long.MinValue
          it.foreach { e =>
            n += 1
            sumCents += math.floor(e.value * 100 + 0.5).toLong
            if (e.event_id > maxId) maxId = e.event_id
          }
          (uid, n, sumCents, maxId)
        }
        .toDF("user_id", "n_events", "sum_cents", "max_event_id")
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
             MAX(event_id) AS max_event_id
      FROM events
      WHERE value > 0.0 AND user_id % 15 = 0
      GROUP BY user_id
      ORDER BY user_id"""))

  /** explode_outer semantics: generate over a frequently-EMPTY array (tokens
    * 100..104, which most documents don't have) — the outer variant must
    * keep one null row per empty array instead of dropping the document.
    * The aggregate pins total rows, null rows, and document preservation;
    * the oracle derives all three arithmetically from the array lengths.
    */
  val arrayExplodeOuter = QueryDef(
    "array_explode_outer",
    (spark, dir) => {
      val tail5 = slice(split(col("text"), " "), 100, 5)
      load(spark, dir, "documents")
        .select(col("doc_id"), explode_outer(tail5).as("tok"))
        .agg(count(lit(1)).as("n_rows_outer"),
          sum(col("tok").isNull.cast("long")).as("n_null_rows"),
          countDistinct(col("doc_id")).as("n_docs_preserved"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
               GREATEST(LEAST(5, len(string_split(text, ' ')) - 99), 0) AS tail_len
        FROM documents)
      SELECT CAST(SUM(GREATEST(tail_len, 1)) AS BIGINT) AS n_rows_outer,
             CAST(SUM(CASE WHEN tail_len = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_rows,
             COUNT(DISTINCT doc_id) AS n_docs_preserved
      FROM d"""))

  /** Nested array-of-structs round trip: fold each order's lines into a
    * deterministically-sorted `array<struct>` (`sort_array(collect_list(
    * struct(...)))` — collect order is partition-dependent, the sort pins
    * it), then flatten back with the `inline` generator. The oracle is the
    * IDENTITY over the base rows, which is exactly the property worth
    * pinning: nest → inline loses nothing and invents nothing. This is the
    * document-model surface (orders with embedded line items) that nested
    * parquet pipelines rely on.
    */
  val arrayInline = QueryDef(
    "array_inline",
    (spark, dir) => {
      val nested = load(spark, dir, "lineitem")
        .filter(col("l_orderkey") % 500 === 0)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").cast(LongType).as("lineno"),
          cents(col("l_extendedprice")).as("price_cents")))).as("lines"))
      nested.select(col("l_orderkey"), inline(col("lines")))
        .orderBy(col("l_orderkey"), col("lineno"), col("price_cents"))
    },
    Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS lineno,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM lineitem
      WHERE l_orderkey % 500 = 0
      ORDER BY l_orderkey, lineno, price_cents"""))

  final case class TypedEv(event_id: Long, user_id: Long, ms: Long)

  /** Typed `cogroup` — the two-sided keyed escape hatch [[typedEvents]]'s
    * `mapGroups` can't express: each user's purchases and clicks arrive as
    * two SEPARATE sorted iterators in one function call, the shape for
    * merge-style per-key logic (conversion matching, interval diffing)
    * without materializing a join's row pairs. Here: per-user purchase/click
    * counts plus how many purchases have ANY preceding click — one pass over
    * each side, no pairwise blow-up however hot the user. The oracle states
    * the same facts relationally (min-click-ms comparison).
    */
  val typedCogroup = QueryDef(
    "typed_cogroup",
    (spark, dir) => {
      import spark.implicits._
      val ev = load(spark, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ms"), col("event_type"))
      def side(t: String) = ev.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"), col("ms")).as[TypedEv]
      side("purchase").groupByKey(_.user_id)
        .cogroup(side("click").groupByKey(_.user_id)) {
          (uid: Long, ps: Iterator[TypedEv], cs: Iterator[TypedEv]) =>
            val purchases = ps.toSeq
            val clicks = cs.toSeq
            if (purchases.isEmpty && clicks.isEmpty) Iterator.empty
            else {
              val minClick = if (clicks.isEmpty) Long.MaxValue else clicks.map(_.ms).min
              Iterator.single((uid, purchases.size.toLong, clicks.size.toLong,
                purchases.count(_.ms >= minClick).toLong))
            }
        }
        .toDF("user_id", "n_purchases", "n_clicks", "n_converted")
        .orderBy(col("user_id"))
    },
    Some("""
      WITH p AS (SELECT user_id, epoch_ms(ts) AS ms FROM events
                 WHERE event_type = 'purchase'),
      c AS (SELECT user_id, epoch_ms(ts) AS ms FROM events
            WHERE event_type = 'click'),
      users AS (SELECT user_id FROM p UNION SELECT user_id FROM c),
      pa AS (SELECT user_id, COUNT(*) AS n_purchases FROM p GROUP BY user_id),
      ca AS (SELECT user_id, COUNT(*) AS n_clicks, MIN(ms) AS min_click
             FROM c GROUP BY user_id),
      conv AS (SELECT p.user_id, COUNT(*) AS n_converted
               FROM p JOIN ca ON ca.user_id = p.user_id
               WHERE p.ms >= ca.min_click
               GROUP BY p.user_id)
      SELECT u.user_id,
             COALESCE(pa.n_purchases, 0) AS n_purchases,
             COALESCE(ca.n_clicks, 0) AS n_clicks,
             COALESCE(conv.n_converted, 0) AS n_converted
      FROM users u
      LEFT JOIN pa USING (user_id)
      LEFT JOIN ca USING (user_id)
      LEFT JOIN conv USING (user_id)
      ORDER BY u.user_id"""),
    notes = "typed two-sided keyed merge (Dataset.cogroup); no pairwise join blow-up")

  /** Market-basket association rules (directed brand pairs with support /
    * confidence / lift) — the frequent-itemset shape, done as plain
    * relational algebra: baskets dedup to (order, brand), the pair join is
    * basket ⋈ basket on the order key, and all three rule metrics stay in
    * exact integer basis points — conf_bp = 10⁴·n_ab div n_a, lift_bp =
    * 10⁴·n_ab·N div (n_a·n_b) — so the oracle hash-compares (`div` trunc
    * == DuckDB `//` floor: all operands nonnegative counts). The scale
    * posture: per-order pair fan-out is C(brands-per-basket, 2) — bounded
    * by basket width, never by catalog size — and the two side tables
    * (per-brand counts, the grand total) broadcast as 1-row / |brands|-row
    * aggregates. Largest intermediate product 10⁴·n_ab·N overflows BIGINT
    * only past ~10¹⁴ basket rows; document, don't wrap.
    */
  val assocRules = QueryDef(
    "assoc_rules",
    (spark, dir) => {
      val basket = load(spark, dir, "lineitem")
        .join(load(spark, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .distinct()
      val nOrders = basket.select(col("ok")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val brandCnt = basket.groupBy(col("brand"))
        .agg(count(lit(1)).as("n_brand"))
      val pairs = basket.as("x").join(basket.as("y"),
          col("x.ok") === col("y.ok") && col("x.brand") =!= col("y.brand"))
        .groupBy(col("x.brand").as("a"), col("y.brand").as("b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(brandCnt.select(col("brand").as("a"),
          col("n_brand").as("n_a"))), "a")
        .join(broadcast(brandCnt.select(col("brand").as("b"),
          col("n_brand").as("n_b"))), "b")
        .crossJoin(broadcast(nOrders))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          expr("(10000L * n_ab) div n_a").as("conf_bp"),
          expr("(10000L * n_ab * n_orders) div (n_a * n_b)").as("lift_bp"))
        .orderBy(col("lift_bp").desc, col("a"), col("b"))
        .limit(100)
    },
    Some("""
      WITH basket AS (
        SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM basket),
      bc AS (SELECT brand, COUNT(*) AS n_brand FROM basket GROUP BY 1),
      pr AS (
        SELECT x.brand AS a, y.brand AS b, COUNT(*) AS n_ab
        FROM basket x JOIN basket y
          ON x.ok = y.ok AND x.brand <> y.brand
        GROUP BY 1, 2)
      SELECT a, b, n_ab,
             ba.n_brand AS n_a, bb.n_brand AS n_b,
             (10000 * n_ab) // ba.n_brand AS conf_bp,
             (10000 * n_ab * n_orders) // (ba.n_brand * bb.n_brand) AS lift_bp
      FROM pr JOIN bc ba ON pr.a = ba.brand
              JOIN bc bb ON pr.b = bb.brand
              CROSS JOIN n
      ORDER BY lift_bp DESC, a, b
      LIMIT 100"""),
    notes = "frequent-pair rules in integer bp; broadcast side tables, basket-width-bounded fan-out")

  /** Share-of-day decomposition shaped for EXCHANGE REUSE: the per-(day,
    * type) aggregate feeds both the result rows and the per-day totals, so
    * the (day, type) shuffle is planned once and the second consumer reads
    * the materialized exchange — Catalyst's ReuseExchange (ReusedExchange /
    * AQE stage reuse) instead of scanning and shuffling the fact twice.
    * At 100 TB "compute the base aggregate once" is the difference between
    * one pass and two; ExchangeReuseSpec pins the reuse node in the
    * EXECUTED plan so a refactor that breaks subplan identity (any
    * asymmetry between the two consumers' subtrees) fails loudly. Share is
    * exact integer bp; trunc==floor on nonnegative counts.
    */
  val aggExchangeReuse = QueryDef(
    "agg_exchange_reuse",
    (spark, dir) => {
      val daily = load(spark, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val totals = daily.groupBy(col("day")).agg(sum(col("n")).as("day_total"))
      daily.join(totals, "day")
        .select(col("day"), col("event_type"), col("n"),
          expr("(10000L * n) div day_total").as("share_bp"))
        .orderBy(col("day"), col("event_type"))
    },
    Some("""
      WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      totals AS (
        SELECT day, CAST(SUM(n) AS BIGINT) AS day_total FROM daily GROUP BY 1)
      SELECT daily.day, event_type, n, (10000 * n) // day_total AS share_bp
      FROM daily JOIN totals ON daily.day = totals.day
      ORDER BY daily.day, event_type"""),
    notes = "self-consuming aggregate; ReusedExchange pinned in spec — one fact pass, not two")

  val all: Seq[QueryDef] = Seq(eventsSessionWindow, eventsUnpivot, joinLateral,
    aggGroupingSets, windowNavigation, arrayExplodePos, arrayExplodeOuter,
    dedupLevenshtein, setopsAll, typedEvents, arrayInline, typedCogroup,
    assocRules, aggExchangeReuse)
}
