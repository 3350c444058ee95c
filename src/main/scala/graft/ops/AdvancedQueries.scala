package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.Tables.{basisPoints, cents, load}

/** Second-wave relational coverage: correlated subqueries (Catalyst
  * decorrelation), RANGE window frames, the full ranking-function battery,
  * pivot, and array/string scalar batteries.
  */
object AdvancedQueries {

  private def view(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): Unit =
    load(spark, dir, name).createOrReplaceTempView(name)

  /** Shared left/right frames for the as-of join family: purchases as
    * (purchase_id, user_id, p_ms) and views as (view_id, v_user, v_ms),
    * times as epoch-ms longs. The family's registry queries all join these
    * two frames under different as-of semantics; the projection must stay
    * identical across them so the family's oracles describe the same
    * inputs.
    */
  private def purchaseViewFrames(spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val ev = load(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_millis(col("ts")).as("p_ms"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        unix_millis(col("ts")).as("v_ms"))
    (p, v)
  }

  /** The FORWARD direction as a composition of the backward merge exec,
    * defined once for both its users (`join_asof_forward` and the forward
    * leg of `join_asof_nearest_native`): negate both time columns
    * (greatest −t_view < −t_purchase ⟺ smallest t_view > t_purchase) and
    * the tiebreak (so same-time ties resolve to the SMALLEST view id).
    * Output carries the original un-negated columns of both frames.
    */
  private def forwardAsofViews(spark: org.apache.spark.sql.SparkSession,
      p0: org.apache.spark.sql.DataFrame, v0: org.apache.spark.sql.DataFrame,
      leftOuter: Boolean): org.apache.spark.sql.DataFrame = {
    val p = p0.withColumn("neg_p_ms", -col("p_ms"))
    val v = v0.withColumn("neg_v_ms", -col("v_ms"))
      .withColumn("neg_view_id", -col("view_id"))
    graft.plans.AsOfJoinOps.asofJoin(spark, p, v,
      p("user_id"), v("v_user"), p("neg_p_ms"), v("neg_v_ms"),
      v("neg_view_id"), leftOuter = leftOuter)
  }

  /** TPC-H Q17-shaped correlated scalar subqueries, expressed in SQL so the
    * plan exercises Catalyst's subquery decorrelation (the DataFrame API
    * cannot write a correlated scalar subquery). The small-quantity
    * threshold (q < ½·avg) is algebraized to exact integers:
    * 2·q_cents·n < sum_cents — no float average, no boundary flakiness.
    */
  val subqueryScalar = QueryDef(
    "subquery_scalar",
    (spark, dir) => {
      view(spark, dir, "lineitem"); view(spark, dir, "part")
      spark.sql("""
        SELECT p_brand,
               COUNT(*) AS n_small,
               CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) * 2 *
                (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
              < (SELECT CAST(SUM(CAST(floor(l3.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 FROM lineitem l3 WHERE l3.l_partkey = lineitem.l_partkey)
        GROUP BY p_brand
        ORDER BY p_brand""")
    },
    Some("""
      SELECT p_brand,
             COUNT(*) AS n_small,
             CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) * 2 *
              (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
            < (SELECT CAST(SUM(CAST(floor(l3.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
               FROM lineitem l3 WHERE l3.l_partkey = lineitem.l_partkey)
      GROUP BY p_brand
      ORDER BY p_brand"""))

  /** TPC-H Q4-shaped correlated EXISTS, decorrelated by Catalyst to a semi
    * join.
    */
  val subqueryExists = QueryDef(
    "subquery_exists",
    (spark, dir) => {
      view(spark, dir, "lineitem"); view(spark, dir, "orders")
      spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_late
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_late
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** RANGE window frame: per-user rolling 24-hour event count and value over
    * event-time ms — value-based frames, not row-based.
    */
  val windowRange = QueryDef(
    "window_range24h",
    (spark, dir) => {
      val ev = load(spark, dir, "events")
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"),
          cents(col("value")).as("value_cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
        .rangeBetween(-86400000L, Window.currentRow)
      ev.select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_24h"),
          sum(col("value_cents")).over(w).as("cents_24h"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id,
             COUNT(*) OVER w AS n_24h,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS cents_24h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                   RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** Ranking-function battery: rank / dense_rank / percent_rank / cume_dist /
    * ntile — all over one deterministic (cents, orderkey) ordering; the two
    * fractional ranks are single divisions of exact integers.
    */
  val windowRanks = QueryDef(
    "window_ranks",
    (spark, dir) => {
      val ord = load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          cents(col("o_totalprice")).as("price_cents"))
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("price_cents").desc, col("o_orderkey"))
      ord.select(col("o_orderkey"), col("o_orderstatus"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"),
          ntile(4).over(w).as("quartile"))
        .filter(col("rnk") <= 50)
        .orderBy(col("o_orderstatus"), col("rnk"))
    },
    Some("""
      SELECT o_orderkey, o_orderstatus, rnk, drnk, prnk, cdist, quartile
      FROM (SELECT o_orderkey, o_orderstatus,
                   RANK() OVER w AS rnk,
                   DENSE_RANK() OVER w AS drnk,
                   PERCENT_RANK() OVER w AS prnk,
                   CUME_DIST() OVER w AS cdist,
                   NTILE(4) OVER w AS quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_orderstatus
                         ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey))
      WHERE rnk <= 50
      ORDER BY o_orderstatus, rnk"""))

  /** Pivot with an explicit value list (deterministic output schema);
    * oracled as conditional aggregation.
    */
  val eventsPivot = QueryDef(
    "events_pivot",
    (spark, dir) => {
      load(spark, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "purchase", "error", "signup", "view"))
        .agg(count(lit(1)))
        .select(col("user_id"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("error"), lit(0L)).as("n_error"),
          coalesce(col("signup"), lit(0L)).as("n_signup"),
          coalesce(col("view"), lit(0L)).as("n_view"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
             COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
             COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  /** Array-function battery over embeddings: max/min (exact comparisons),
    * predicate counts via filter, exists/forall, sliced fold (fixed order →
    * deterministic, floor-scaled).
    */
  val arrayFuncs = QueryDef(
    "array_funcs",
    (spark, dir) => {
      val e = load(spark, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
      e.select(col("vec_id"),
          basisPoints(array_max(col("v"))).as("max_bp"),
          basisPoints(array_min(col("v"))).as("min_bp"),
          size(filter(col("v"), x => x > 0)).as("n_pos"),
          exists(col("v"), x => x > 0.25).cast("int").as("any_big"),
          forall(col("v"), x => abs(x) < 1.0).cast("int").as("all_unit"),
          basisPoints(aggregate(slice(col("v"), 1, 8), lit(0.0), (acc, x) => acc + x))
            .as("head8_sum_bp"))
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT vec_id,
             CAST(floor(list_max(v) * 10000 + 0.5) AS BIGINT) AS max_bp,
             CAST(floor(list_min(v) * 10000 + 0.5) AS BIGINT) AS min_bp,
             len(list_filter(v, x -> x > 0)) AS n_pos,
             CAST(len(list_filter(v, x -> x > 0.25)) > 0 AS INTEGER) AS any_big,
             CAST(len(list_filter(v, x -> abs(x) >= 1.0)) = 0 AS INTEGER) AS all_unit,
             CAST(floor(list_reduce(list_prepend(0.0, v[1:8]), (a, x) -> a + x) * 10000 + 0.5) AS BIGINT) AS head8_sum_bp
      FROM e
      ORDER BY vec_id"""))

  /** String-function battery over part names (functions with exact DuckDB
    * twins only — initcap, soundex etc. have no portable equivalent).
    */
  val stringFuncs = QueryDef(
    "string_funcs",
    (spark, dir) => {
      load(spark, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          lpad(col("p_brand"), 12, "*").as("brand_padded"),
          substring_index(col("p_type"), " ", 1).as("type_head"),
          translate(col("p_name"), "aeiou", "AEIOU").as("name_vowels"),
          reverse(col("p_brand")).as("brand_rev"),
          length(col("p_name")).cast("long").as("name_len"),
          instr(col("p_type"), "a").cast("long").as("first_a"),
          regexp_replace(col("p_name"), "[0-9]+", "#").as("name_masked"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
             upper(p_brand) AS brand_upper,
             lpad(p_brand, 12, '*') AS brand_padded,
             split_part(p_type, ' ', 1) AS type_head,
             translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
             reverse(p_brand) AS brand_rev,
             CAST(length(p_name) AS BIGINT) AS name_len,
             CAST(strpos(p_type, 'a') AS BIGINT) AS first_a,
             regexp_replace(p_name, '[0-9]+', '#', 'g') AS name_masked
      FROM part
      ORDER BY p_partkey"""))

  /** The same backward as-of join as `join_asof`, through the engine's
    * native operator ([[graft.plans.AsOfJoinExec]]: LogicalPlan + Strategy +
    * streaming-merge physical exec) instead of the union+window composition.
    * Shares `join_asof`'s oracle — three independent formulations (window,
    * native exec, DuckDB join+rank) must agree cell-exact.
    */
  val joinAsofNative = QueryDef(
    "join_asof_native",
    (spark, dir) => {
      val (p, v) = purchaseViewFrames(spark, dir)
      graft.plans.AsOfJoinOps.asofJoin(spark, p, v,
          p("user_id"), v("v_user"), p("p_ms"), v("v_ms"), v("view_id"))
        .select(col("purchase_id"), col("user_id"),
          col("view_id").as("prior_view_id"), (col("p_ms") - col("v_ms")).as("gap_ms"))
        .orderBy(col("purchase_id"))
    },
    RelationalQueries.joinAsof.oracle)

  /** The native as-of join on its INTERPRETED-ORDERING path: STRING key +
    * TIMESTAMP time (the fast path needs BOTH long-backed; a string key
    * forces the boxed merge with per-candidate UnsafeRow copies). Same
    * semantics and same oracle as [[joinAsofNative]] — the key mapping
    * u<id> is bijective and the merge needs only a consistent total order
    * per side, so the output is identical; what changes is the code path,
    * making this the slow path's standing correctness + scale + A/B
    * anchor (fast-vs-boxed = `join_asof_native` vs this, same rows, same
    * fixture, recorded in BASELINE.md). Timestamp strict-less runs at µs
    * where the oracle compares ms — equivalent on this fixture because no
    * per-user same-ms collisions exist (pinned by TestdataSchemaSpec's ts
    * contract note).
    */
  val joinAsofStringNative = QueryDef(
    "join_asof_string_native",
    (spark, dir) => {
      val ev = load(spark, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          concat(lit("u"), col("user_id")).as("p_key"),
          col("ts").as("p_ts"), unix_millis(col("ts")).as("p_ms"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"),
          concat(lit("u"), col("user_id")).as("v_key"),
          col("ts").as("v_ts"), unix_millis(col("ts")).as("v_ms"))
      graft.plans.AsOfJoinOps.asofJoin(spark, p, v,
          p("p_key"), v("v_key"), p("p_ts"), v("v_ts"), v("view_id"))
        .select(col("purchase_id"), col("user_id"),
          col("view_id").as("prior_view_id"),
          (col("p_ms") - col("v_ms")).as("gap_ms"))
        .orderBy(col("purchase_id"))
    },
    RelationalQueries.joinAsof.oracle,
    notes = "native as-of forced onto the interpreted path (string key + timestamp time); output identical to join_asof_native, so the pair is a standing fast-vs-boxed A/B")

  /** The native as-of join with a 30-minute TOLERANCE (pandas merge_asof's
    * staleness bound): a purchase only matches its latest prior view if that
    * view is at most 30 min old — stale matches drop inside the merge pass
    * (zero extra cost: one subtraction per emitted row). The oracle states
    * the same semantics independently as join+rank+filter.
    */
  val joinAsofTolerance = QueryDef(
    "join_asof_tolerance",
    (spark, dir) => {
      val (p, v) = purchaseViewFrames(spark, dir)
      graft.plans.AsOfJoinOps.asofJoin(spark, p, v,
          p("user_id"), v("v_user"), p("p_ms"), v("v_ms"), v("view_id"),
          tolerance = Some(30L * 60 * 1000))
        .select(col("purchase_id"), col("user_id"),
          col("view_id").as("prior_view_id"), (col("p_ms") - col("v_ms")).as("gap_ms"))
        .orderBy(col("purchase_id"))
    },
    Some("""
      WITH p AS (
        SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS p_ms
        FROM events WHERE event_type = 'purchase'),
      v AS (
        SELECT event_id AS view_id, user_id, epoch_ms(ts) AS v_ms
        FROM events WHERE event_type = 'view'),
      ranked AS (
        SELECT p.purchase_id, p.user_id, v.view_id, p.p_ms - v.v_ms AS gap_ms,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                 ORDER BY v.v_ms DESC, v.view_id DESC) AS rn
        FROM p JOIN v ON v.user_id = p.user_id AND v.v_ms < p.p_ms)
      SELECT purchase_id, user_id, view_id AS prior_view_id, gap_ms
      FROM ranked
      WHERE rn = 1 AND gap_ms <= 1800000
      ORDER BY purchase_id"""))

  /** As-of join, NEAREST direction (merge_asof direction='nearest' with a
    * 30-min tolerance): each purchase matches the view whose timestamp is
    * CLOSEST in either direction, ties to the earlier view then the smaller
    * id. Completes the as-of direction set (backward = `join_asof`/
    * `join_asof_native`, backward+tolerance = `join_asof_tolerance`).
    * The join condition is an equi key (user) + symmetric band
    * (|gap| ≤ 30 min), so it plans as a hash join on user with the band as
    * residual — candidates stay bounded by the tolerance window, never a
    * per-user cross product.
    */
  val joinAsofNearest = QueryDef(
    "join_asof_nearest",
    (spark, dir) => {
      val (p, v) = purchaseViewFrames(spark, dir)
      val w = Window.partitionBy(col("purchase_id"))
        .orderBy(col("abs_gap_ms"), col("v_ms"), col("view_id"))
      p.join(v, col("v_user") === col("user_id") &&
          abs(col("v_ms") - col("p_ms")) <= lit(1800000L))
        .withColumn("abs_gap_ms", abs(col("v_ms") - col("p_ms")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("purchase_id"), col("user_id"),
          col("view_id").as("nearest_view_id"),
          (col("p_ms") - col("v_ms")).as("gap_ms"), col("abs_gap_ms"))
        .orderBy(col("purchase_id"))
    },
    Some("""
      WITH p AS (
        SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS p_ms
        FROM events WHERE event_type = 'purchase'),
      v AS (
        SELECT event_id AS view_id, user_id, epoch_ms(ts) AS v_ms
        FROM events WHERE event_type = 'view'),
      ranked AS (
        SELECT p.purchase_id, p.user_id, v.view_id,
               p.p_ms - v.v_ms AS gap_ms, abs(v.v_ms - p.p_ms) AS abs_gap_ms,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                 ORDER BY abs(v.v_ms - p.p_ms), v.v_ms, v.view_id) AS rn
        FROM p JOIN v ON v.user_id = p.user_id
          AND abs(v.v_ms - p.p_ms) <= 1800000)
      SELECT purchase_id, user_id, view_id AS nearest_view_id, gap_ms, abs_gap_ms
      FROM ranked
      WHERE rn = 1
      ORDER BY purchase_id"""),
    notes = "merge_asof direction=nearest; equi+band join, tie to earlier view")

  /** The native as-of join in its LEFT OUTER shape — pandas merge_asof's
    * default join semantics: EVERY purchase emits exactly one row, with the
    * view columns null when no prior view exists. Exercises
    * [[graft.plans.AsOfJoinExec]]'s outer path (null-extended right side
    * built inside the same single merge pass — zero extra shuffle or join
    * vs inner). The oracle states the semantics independently as LEFT
    * JOIN + rank, where the unmatched left row survives as the rn=1
    * null-view row.
    */
  val joinAsofOuter = QueryDef(
    "join_asof_outer",
    (spark, dir) => {
      val (p, v) = purchaseViewFrames(spark, dir)
      graft.plans.AsOfJoinOps.asofJoin(spark, p, v,
          p("user_id"), v("v_user"), p("p_ms"), v("v_ms"), v("view_id"),
          leftOuter = true)
        .select(col("purchase_id"), col("user_id"),
          col("view_id").as("prior_view_id"),
          (col("p_ms") - col("v_ms")).as("gap_ms"))
        .orderBy(col("purchase_id"))
    },
    Some("""
      WITH p AS (
        SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS p_ms
        FROM events WHERE event_type = 'purchase'),
      v AS (
        SELECT event_id AS view_id, user_id, epoch_ms(ts) AS v_ms
        FROM events WHERE event_type = 'view'),
      ranked AS (
        SELECT p.purchase_id, p.user_id, v.view_id, p.p_ms - v.v_ms AS gap_ms,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                 ORDER BY v.v_ms DESC, v.view_id DESC) AS rn
        FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.v_ms < p.p_ms)
      SELECT purchase_id, user_id, view_id AS prior_view_id,
             CAST(gap_ms AS BIGINT) AS gap_ms
      FROM ranked
      WHERE rn = 1
      ORDER BY purchase_id"""),
    notes = "native as-of join, LEFT OUTER (merge_asof default shape): one output row per purchase, null view when no prior exists; same single merge pass as inner")

  /** As-of join, FORWARD direction (merge_asof direction='forward' with
    * allow_exact_matches=False — this whole family is strict, pandas'
    * default also matches equal timestamps): each purchase matches the
    * EARLIEST view strictly after it — "what did the
    * user look at next". No new operator: the backward merge exec runs on
    * NEGATED time columns (greatest −t_view < −t_purchase ⟺ smallest
    * t_view > t_purchase), and the negated tiebreak keeps ties resolving to
    * the smallest view id — direction is a composition property of the
    * backward exec, exactly how a library user should get it. Completes the
    * pandas direction set: backward (`join_asof`/`_native`), backward +
    * tolerance, nearest, left-outer, and now forward.
    */
  val joinAsofForward = QueryDef(
    "join_asof_forward",
    (spark, dir) => {
      val (p0, v0) = purchaseViewFrames(spark, dir)
      forwardAsofViews(spark, p0, v0, leftOuter = false)
        .select(col("purchase_id"), col("user_id"),
          col("view_id").as("next_view_id"),
          (col("v_ms") - col("p_ms")).as("gap_ms"))
        .orderBy(col("purchase_id"))
    },
    Some("""
      WITH p AS (
        SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS p_ms
        FROM events WHERE event_type = 'purchase'),
      v AS (
        SELECT event_id AS view_id, user_id, epoch_ms(ts) AS v_ms
        FROM events WHERE event_type = 'view'),
      ranked AS (
        SELECT p.purchase_id, p.user_id, v.view_id, v.v_ms - p.p_ms AS gap_ms,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                 ORDER BY v.v_ms ASC, v.view_id ASC) AS rn
        FROM p JOIN v ON v.user_id = p.user_id AND v.v_ms > p.p_ms)
      SELECT purchase_id, user_id, view_id AS next_view_id, gap_ms
      FROM ranked
      WHERE rn = 1
      ORDER BY purchase_id"""),
    notes = "merge_asof direction=forward (allow_exact_matches=False; family-wide strict semantics) via the backward merge exec on negated times — direction as a composition property, no new operator code")

  /** As-of join, NEAREST direction, composed from the NATIVE merge exec —
    * the last as-of direction still running on the window-over-band plan
    * (`join_asof_nearest`) gets its merge-join shape: a backward pass
    * (latest strict prior view) and a forward pass (earliest strict next
    * view, via the negated-column composition), both LEFT OUTER so every
    * purchase carries its per-direction best candidate, then a 1:1 equi
    * join on purchase_id keeps the smaller |gap| (tie → the earlier, i.e.
    * backward, view) and the 30-min tolerance filters inner-style. Nearest
    * is exactly best-of(backward, forward) because the closest view overall
    * is the closest view in its own direction. Two semantic deltas vs the
    * window variant, both on equal timestamps: (1) this composition is
    * STRICT in both directions (a view at exactly the purchase time never
    * matches, consistent with the rest of the strict family), while the
    * window variant's |gap| ≤ tolerance band matches it at gap 0; (2)
    * same-time ties among CANDIDATES follow each direction's exec tiebreak
    * (backward keeps the largest view id among equal times, forward the
    * smallest) rather than the window variant's smallest-id rule. The
    * oracle states the composition semantics exactly.
    *
    * Scale: two shuffle-on-user merge passes + one equi join on the
    * purchase primary key — no band join, no per-purchase candidate set, so
    * cost tracks rows even when the tolerance window holds thousands of
    * views (where the band plan's candidate blow-up is quadratic-in-rate).
    */
  val joinAsofNearestNative = QueryDef(
    "join_asof_nearest_native",
    (spark, dir) => {
      val (pb, vb) = purchaseViewFrames(spark, dir)
      val b = graft.plans.AsOfJoinOps.asofJoin(spark, pb, vb,
          pb("user_id"), vb("v_user"), pb("p_ms"), vb("v_ms"), vb("view_id"),
          leftOuter = true)
        .select(col("purchase_id"), col("user_id"),
          col("view_id").as("b_view_id"),
          (col("p_ms") - col("v_ms")).as("b_gap"))
      val (pf0, vf0) = purchaseViewFrames(spark, dir)
      val f = forwardAsofViews(spark, pf0, vf0, leftOuter = true)
        .select(col("purchase_id").as("f_purchase_id"),
          col("view_id").as("f_view_id"),
          (col("v_ms") - col("p_ms")).as("f_gap"))
      val useB = col("b_view_id").isNotNull &&
        (col("f_view_id").isNull || col("b_gap") <= col("f_gap"))
      b.join(f, col("purchase_id") === col("f_purchase_id"))
        .withColumn("nearest_view_id",
          when(useB, col("b_view_id")).otherwise(col("f_view_id")))
        .withColumn("gap_ms", when(useB, col("b_gap")).otherwise(-col("f_gap")))
        .withColumn("abs_gap_ms", when(useB, col("b_gap")).otherwise(col("f_gap")))
        .filter(col("nearest_view_id").isNotNull &&
          col("abs_gap_ms") <= lit(1800000L))
        .select(col("purchase_id"), col("user_id"), col("nearest_view_id"),
          col("gap_ms"), col("abs_gap_ms"))
        .orderBy(col("purchase_id"))
    },
    Some("""
      WITH p AS (
        SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS p_ms
        FROM events WHERE event_type = 'purchase'),
      v AS (
        SELECT event_id AS view_id, user_id, epoch_ms(ts) AS v_ms
        FROM events WHERE event_type = 'view'),
      b AS (
        SELECT purchase_id, user_id, view_id AS b_view_id, p_ms - v_ms AS b_gap
        FROM (SELECT p.purchase_id, p.user_id, v.view_id, p.p_ms, v.v_ms,
                     ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                       ORDER BY v.v_ms DESC, v.view_id DESC) AS rn
              FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.v_ms < p.p_ms)
        WHERE rn = 1),
      f AS (
        SELECT purchase_id, view_id AS f_view_id, v_ms - p_ms AS f_gap
        FROM (SELECT p.purchase_id, v.view_id, p.p_ms, v.v_ms,
                     ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                       ORDER BY v.v_ms ASC, v.view_id ASC) AS rn
              FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.v_ms > p.p_ms)
        WHERE rn = 1),
      c AS (
        SELECT b.purchase_id, b.user_id,
               CASE WHEN b_view_id IS NOT NULL
                         AND (f_view_id IS NULL OR b_gap <= f_gap)
                    THEN b_view_id ELSE f_view_id END AS nearest_view_id,
               CASE WHEN b_view_id IS NOT NULL
                         AND (f_view_id IS NULL OR b_gap <= f_gap)
                    THEN b_gap ELSE -f_gap END AS gap_ms,
               CASE WHEN b_view_id IS NOT NULL
                         AND (f_view_id IS NULL OR b_gap <= f_gap)
                    THEN b_gap ELSE f_gap END AS abs_gap_ms
        FROM b JOIN f USING (purchase_id))
      SELECT purchase_id, user_id, nearest_view_id, gap_ms, abs_gap_ms
      FROM c
      WHERE nearest_view_id IS NOT NULL AND abs_gap_ms <= 1800000
      ORDER BY purchase_id"""),
    notes = "merge_asof direction=nearest on the native merge exec: best-of(backward, forward) composition + tolerance post-filter; strict in both directions (equal-time views never match, unlike the window variant's inclusive band) and same-timestamp candidate ties follow each direction's exec tiebreak")

  /** Explicit join-strategy control: SHUFFLE_HASH hint forces a shuffled
    * hash join where the planner would otherwise broadcast or sort-merge —
    * the knob for dimension tables too big to broadcast but cheap to hash.
    */
  val joinShuffleHash = QueryDef(
    "join_shuffle_hash",
    (spark, dir) => {
      val li = load(spark, dir, "lineitem")
      val part = load(spark, dir, "part").hint("shuffle_hash")
      li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice"))).as("price_cents"))
        .orderBy(col("p_brand"))
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n_items,
             CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand"""))

  /** Bloom-filter runtime join pruning, made an explicit operator: the
    * build side (urgent orders) reduces to ONE ~1 MB bloom sketch via
    * Spark's own `BloomFilterAggregate`, delivered to every probe-side scan
    * task as a scalar subquery, and `BloomFilterMightContain(xxhash64(key))`
    * drops non-matching lineitem rows BEFORE the shuffle — at 100 TB the
    * shuffle write shrinks by the build side's selectivity (~1/5 here) for the
    * cost of broadcasting one sketch, which is the entire value proposition
    * of Spark's InjectRuntimeFilter, surfaced so a pipeline can apply it
    * where the optimizer's heuristics (creation-side size thresholds)
    * decline to. False positives are harmless: the exact shuffled hash join
    * that follows removes them, so the result — and the oracle, a plain
    * join — is exact regardless of sketch size.
    */
  val joinBloom = QueryDef(
    "join_bloom",
    (spark, dir) => {
      import org.apache.spark.sql.GraftSqlBridge
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      def urgent = load(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val bloomDf = urgent.select(GraftSqlBridge.column(
        new BloomFilterAggregate(
          new XxHash64(Seq(GraftSqlBridge.expression(col("o_orderkey")))))
          .toAggregateExpression()).as("bloom"))
      val mightContain = GraftSqlBridge.column(BloomFilterMightContain(
        ScalarSubquery(GraftSqlBridge.analyzedPlan(bloomDf)),
        new XxHash64(Seq(GraftSqlBridge.expression(col("l_orderkey"))))))
      load(spark, dir, "lineitem")
        .filter(mightContain)
        .join(urgent.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(month(col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
        .orderBy(col("order_month"))
    },
    Some("""
      SELECT CAST(month(o_orderdate) AS INT) AS order_month,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1
      ORDER BY 1"""),
    notes = "explicit BloomFilterAggregate/MightContain runtime filter; FP-safe, oracle = plain join")

  /** Array set-operation battery (union/intersect/except/flatten/position/
    * contains) over document token arrays — scalar outputs only, so the
    * oracle compares exactly. Spark `array_position` returns 0 for absent
    * where DuckDB `list_position` returns NULL → COALESCE on the oracle side.
    */
  val arraySetops = QueryDef(
    "array_setops",
    (spark, dir) => {
      val toks = split(col("text"), " ")
      val a = array_distinct(slice(toks, 1, 15))
      val b = array_distinct(slice(toks, 10, 15))
      load(spark, dir, "documents")
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          size(array_union(a, b)).as("n_union"),
          size(array_intersect(a, b)).as("n_intersect"),
          size(array_except(a, b)).as("n_except"),
          size(flatten(array(a, b))).as("n_flat"),
          array_position(toks, "the").cast("long").as("pos_the"),
          array_contains(a, "data").cast("int").as("has_data"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               list_distinct(string_split(text, ' ')[1:15]) AS a,
               list_distinct(string_split(text, ' ')[10:24]) AS b
        FROM documents WHERE doc_id % 10 = 0)
      SELECT doc_id,
             len(list_distinct(list_concat(a, b))) AS n_union,
             len(list_intersect(a, b)) AS n_intersect,
             len(list_filter(a, x -> NOT list_contains(b, x))) AS n_except,
             len(flatten([a, b])) AS n_flat,
             CAST(COALESCE(list_position(toks, 'the'), 0) AS BIGINT) AS pos_the,
             CAST(list_contains(a, 'data') AS INTEGER) AS has_data
      FROM d
      ORDER BY doc_id"""))

  /** Conditional/null-handling battery: NULLIF / COALESCE-fill / NVL2-shaped
    * presence test / LEAST-GREATEST — the null algebra every cleansing layer
    * leans on, with a nullable output column to pin null-vs-value compare.
    */
  val conditionalFuncs = QueryDef(
    "conditional_funcs",
    (spark, dir) => {
      load(spark, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_filled"),
          when(nullif(col("o_orderstatus"), lit("O")).isNotNull, lit("closedish"))
            .otherwise(lit("open")).as("nvl2_shape"),
          least(col("o_orderkey") % 7, col("o_custkey") % 7, lit(3L)).as("least3"),
          greatest(col("o_orderkey") % 7, col("o_custkey") % 7, lit(3L)).as("greatest3"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             NULLIF(o_orderstatus, 'O') AS status_or_null,
             COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled,
             CASE WHEN NULLIF(o_orderstatus, 'O') IS NOT NULL
                  THEN 'closedish' ELSE 'open' END AS nvl2_shape,
             LEAST(o_orderkey % 7, o_custkey % 7, 3) AS least3,
             GREATEST(o_orderkey % 7, o_custkey % 7, 3) AS greatest3
      FROM orders
      WHERE o_orderkey % 100 = 0
      ORDER BY o_orderkey"""))

  /** 2-D skyline (Pareto frontier: minimize price, maximize size) — the
    * dominance query whose naive form is an O(n²) inequality self-join. The
    * scalable form is sort-based: in (price asc) order a part is on the
    * skyline iff its size beats the running max size of all strictly
    * cheaper parts AND it is the max size within its own price tie-group.
    * The running max is NOT one global ORDER BY window: prices are
    * range-bucketed, the in-bucket RANGE window (UNBOUNDED..1 PRECEDING on
    * integer cents — exact tie semantics, no sort tie-break) runs
    * partitioned, and the cross-bucket carry is a cummax over the ~tiny
    * bucket table broadcast back — the same two-phase split as
    * `interval_sweep`. The oracle is the NOT EXISTS dominance definition —
    * a genuinely different algorithm, so the hash match checks the
    * sort-based reformulation itself.
    */
  val skylinePareto = QueryDef(
    "skyline_pareto",
    (spark, dir) => {
      val parts = load(spark, dir, "part")
        .select(col("p_partkey"), cents(col("p_retailprice")).as("price_cents"),
          col("p_size").cast("long").as("psize"))
        .withColumn("bucket", expr("price_cents div 10000"))
      val inBucket = parts.withColumn("run_max",
        max(col("psize")).over(Window.partitionBy(col("bucket"))
          .orderBy(col("price_cents"))
          .rangeBetween(Window.unboundedPreceding, -1)))
        .withColumn("tie_max",
          max(col("psize")).over(Window.partitionBy(col("price_cents"))))
      val carry = parts.groupBy(col("bucket"))
        .agg(max(col("psize")).as("bmax"))
        .withColumn("prev_max",
          max(col("bmax")).over(Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("bucket").as("bk"), col("prev_max"))
      inBucket.join(broadcast(carry), col("bucket") === col("bk"))
        .withColumn("strict_max",
          greatest(coalesce(col("run_max"), lit(Long.MinValue)),
            coalesce(col("prev_max"), lit(Long.MinValue))))
        .filter(col("psize") > col("strict_max") &&
          col("psize") === col("tie_max"))
        .select(col("p_partkey"), col("price_cents"), col("psize"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      WITH pts AS (
        SELECT p_partkey,
               CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
               CAST(p_size AS BIGINT) AS psize
        FROM part)
      SELECT p_partkey, price_cents, psize
      FROM pts p
      WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.price_cents <= p.price_cents AND q.psize >= p.psize
          AND (q.price_cents < p.price_cents OR q.psize > p.psize))
      ORDER BY p_partkey"""),
    notes = "sort-based skyline, bucket-partitioned windows + tiny cummax carry; oracle = NOT EXISTS dominance")

  val all: Seq[QueryDef] = Seq(subqueryScalar, subqueryExists, windowRange,
    windowRanks, eventsPivot, arrayFuncs, stringFuncs, arraySetops,
    conditionalFuncs, joinAsofNative, joinAsofStringNative, joinAsofTolerance,
    joinAsofNearest,
    joinAsofOuter, joinAsofForward, joinAsofNearestNative, joinShuffleHash,
    joinBloom, skylinePareto)
}
