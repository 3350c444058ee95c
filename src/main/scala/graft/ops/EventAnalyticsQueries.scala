package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.Tables.{cents, load}

/** Product-analytics shapes over the `events` stream table: ordered funnel
  * progression and weekly cohort retention — the two queries every event
  * warehouse runs daily, and classic scale traps when written naively
  * (per-user sorting, repeated self-joins on the raw fact).
  *
  * Scale posture: both queries reduce the fact table to per-user summaries
  * FIRST (one shuffle on user_id, partial aggregation map-side), then do all
  * sequencing logic on the per-user rows — never a self-join of raw events
  * against raw events.
  */
object EventAnalyticsQueries {

  /** One cached recursion child session per parent (see
    * [[eventsDecayRcte]]): the raised `spark.sql.cteRecursionRowLimit`
    * lives ONLY here, so Spark's runaway-recursion guard (default 10^6
    * cumulative rows) stays live on the shared session — the recursion
    * itself is depth-bounded by construction (rn ≤ 16, each level's join
    * strictly advances rn), so the guard cannot serve its purpose for it,
    * while at 100× events the 16 levels × users legitimately exceed the
    * default (found by the 100× scale harness, not speculation).
    */
  // WEAK keys: a static strong map would pin every parent session (and its
  // child's SessionState) for the JVM lifetime — a harness that creates and
  // stops many sessions would leak one pair per session. The child value
  // does not reference the parent session (only the shared SparkContext),
  // so entries die with their parent.
  private val recursionSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      org.apache.spark.sql.SparkSession, org.apache.spark.sql.SparkSession]())
  private def recursionSession(
      spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    recursionSessions.computeIfAbsent(spark, s => {
      val c = s.newSession()
      c.conf.set("spark.sql.cteRecursionRowLimit", "100000000")
      c
    })

  /** Ordered 3-stage funnel (signup → click → purchase, strictly increasing
    * timestamps): stage k's timestamp is the earliest qualifying event AFTER
    * the user's stage-(k−1) timestamp. Each stage is one conditional
    * min-aggregate on the user-keyed summary — the fact table is scanned
    * once per stage with a filter pushed to the scan, and each stage's
    * aggregate reuses the user_id shuffle (AQE exchange reuse).
    */
  val eventsFunnel = QueryDef(
    "events_funnel",
    (spark, dir) => {
      val ev = load(spark, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      val users = ev.select(col("user_id")).distinct()
      users
        .join(s1, Seq("user_id"), "left")
        .join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_users"),
          count(col("t1")).as("n_signup"),
          count(col("t2")).as("n_click_after_signup"),
          count(col("t3")).as("n_purchase_after_click"))
    },
    Some("""
      WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
      -- stage predicates on epoch_us, not raw ts: under an ns-physical
      -- fixture and an ns-preserving DuckDB, a raw-ts '>' could pass on
      -- sub-microsecond differences Spark has truncated away (SURVEY risk
      -- 6; the convention events_funnel_window already follows)
      s2 AS (SELECT e.user_id, MIN(epoch_us(ts)) AS t2
             FROM events e JOIN s1 USING (user_id)
             WHERE event_type = 'click' AND epoch_us(ts) > t1
             GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(epoch_us(ts)) AS t3
             FROM events e JOIN s2 USING (user_id)
             WHERE event_type = 'purchase' AND epoch_us(ts) > t2
             GROUP BY e.user_id),
      users AS (SELECT DISTINCT user_id FROM events)
      SELECT COUNT(*) AS n_users,
             COUNT(t1) AS n_signup,
             COUNT(t2) AS n_click_after_signup,
             COUNT(t3) AS n_purchase_after_click
      FROM users
      LEFT JOIN s1 USING (user_id)
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)"""))

  /** Weekly cohort retention: cohort = a user's first active week, then
    * distinct-user counts per (cohort, weeks-since-cohort). Weeks are exact
    * integer arithmetic off a fixed origin date (not date_trunc) so the
    * bucketing has no week-start or locale semantics to disagree on.
    * Two shuffles total: user_id for first-seen, (cohort, offset) for the
    * distinct count.
    */
  val eventsRetention = QueryDef(
    "events_retention",
    (spark, dir) => {
      val week = floor(
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / 7)
        .cast("long")
      val ev = load(spark, dir, "events")
        .select(col("user_id"), week.as("week"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id,
               CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS week
        FROM events),
      cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id)
      SELECT cohort_week, week - cohort_week AS week_offset,
             COUNT(DISTINCT user_id) AS n_users
      FROM ev JOIN cohort USING (user_id)
      GROUP BY cohort_week, week - cohort_week
      ORDER BY cohort_week, week_offset"""))

  /** Calendar densification: generate each user's full day range
    * (`sequence` + `explode` — the calendar-dimension generator), anti-join
    * the days the user was active, and report span/active/gap counts.
    * n_gaps could be derived arithmetically (span − active); the explicit
    * generate-and-anti-join is the point — it's the shape used to fill
    * sparse time series before windowed features, and it stays narrow per
    * user (the generated calendar never materializes beyond each row group).
    */
  val eventsCalendar = QueryDef(
    "events_calendar",
    (spark, dir) => {
      val ev = load(spark, dir, "events")
        .filter(col("user_id") % 10 === 0)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val active = ev.distinct()
      val span = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      val cal = span.select(col("user_id"),
        explode(sequence(col("first_day"), col("last_day"))).as("day"))
      val gaps = cal.join(active, Seq("user_id", "day"), "left_anti")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_gaps"))
      span
        .join(active.groupBy(col("user_id")).agg(count(lit(1)).as("n_active")), "user_id")
        .join(gaps, Seq("user_id"), "left")
        .select(col("user_id"),
          (datediff(col("last_day"), col("first_day")) + 1).cast("long").as("span_days"),
          col("n_active"),
          coalesce(col("n_gaps"), lit(0L)).as("n_gaps"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
                  WHERE user_id % 10 = 0),
      active AS (SELECT DISTINCT user_id, day FROM ev),
      span AS (SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day
               FROM ev GROUP BY user_id),
      cal AS (SELECT user_id,
                     unnest(generate_series(first_day, last_day,
                                            INTERVAL 1 DAY))::DATE AS day
              FROM span),
      gaps AS (SELECT c.user_id, COUNT(*) AS n_gaps
               FROM cal c LEFT JOIN active a
                 ON c.user_id = a.user_id AND c.day = a.day
               WHERE a.user_id IS NULL
               GROUP BY c.user_id)
      SELECT s.user_id,
             CAST(date_diff('day', first_day, last_day) + 1 AS BIGINT) AS span_days,
             n.n_active,
             COALESCE(g.n_gaps, 0) AS n_gaps
      FROM span s
      JOIN (SELECT user_id, COUNT(*) AS n_active FROM active GROUP BY user_id) n
        USING (user_id)
      LEFT JOIN gaps g ON s.user_id = g.user_id
      ORDER BY s.user_id"""))

  /** Time-series resample + forward fill: each sampled user's activity on a
    * dense DAILY grid spanning their observed range — missing days carry
    * the last observed daily total forward (`last(_, ignoreNulls)` over an
    * unbounded-preceding frame; DuckDB twin `LAST_VALUE ... IGNORE NULLS`).
    * The grid generates per user from a 2-column span aggregate
    * (`sequence(min_day, max_day, interval 1 day)` exploded lazily), so the
    * dense grid never materializes wider than (users × days) — the standard
    * gap-fill shape for feature time series at scale.
    */
  val eventsGapfill = QueryDef(
    "events_gapfill",
    (spark, dir) => {
      val daily = load(spark, dir, "events")
        .filter(col("user_id") % 30 === 0)
        .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("day_cents"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("day_cents"), ignoreNulls = true).over(w).as("filled_cents"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_events,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS day_cents
        FROM events WHERE user_id % 30 = 0
        GROUP BY user_id, date_trunc('day', ts)),
      grid AS (
        SELECT user_id, unnest(generate_series(min(day), max(day),
                 INTERVAL 1 DAY)) AS day
        FROM daily GROUP BY user_id)
      SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
             COALESCE(d.n_events, 0) AS n_events,
             LAST_VALUE(d.day_cents IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
      FROM grid g LEFT JOIN daily d
        ON d.user_id = g.user_id AND d.day = g.day
      ORDER BY g.user_id, day"""))

  /** CDC snapshot diff — the MERGE-feed generator: materialize the per-user
    * latest-state snapshot at two points in time (t1 = 60% through the
    * stream, t2 = end, both derived in exact integer epoch-ms arithmetic)
    * and emit the change feed between them: `insert` for users born after
    * t1, `update` for users whose head row moved. The two snapshots are
    * aggregate-path argmax (`max(struct(ms, id, cents))` — no sort), the
    * diff one equi join on the key; the 1-row bounds aggregate is broadcast
    * (allowlisted BNLJ).
    */
  /** Shared CDC scaffold: the events fact projected to (user_id, ms,
    * event_id[, extras], cents) with the exact-integer t1 split point —
    * 60% through the epoch-ms range, the "what counts as the earlier
    * snapshot" definition — broadcast onto every row. One definition for
    * both CDC queries so the split point cannot drift between them.
    */
  private def cdcWithT1(spark: org.apache.spark.sql.SparkSession, dir: String,
      extras: org.apache.spark.sql.Column*): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(Seq(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id")) ++ extras :+ cents(col("value")).as("cents"): _*)
    val bounds = ev.agg(min(col("ms")).as("lo"), max(col("ms")).as("hi"))
      .select(expr("lo + ((hi - lo) * 3) DIV 5").as("t1"))
    ev.crossJoin(broadcast(bounds))
  }

  val cdcDiff = QueryDef(
    "cdc_diff",
    (spark, dir) => {
      val withT1 = cdcWithT1(spark, dir)
      def snap(pred: org.apache.spark.sql.Column) = withT1.filter(pred)
        .groupBy(col("user_id"))
        .agg(max(struct(col("ms"), col("event_id"), col("cents"))).as("m"))
      val a = snap(col("ms") <= col("t1"))
        .select(col("user_id"), col("m.event_id").as("a_event_id"),
          col("m.cents").as("a_cents"))
      val b = snap(lit(true))
        .select(col("user_id"), col("m.event_id").as("b_event_id"),
          col("m.cents").as("b_cents"))
      // append-only source => no deletes; snapshot B's keys are a superset
      b.join(a, Seq("user_id"), "left")
        .withColumn("op", when(col("a_event_id").isNull, lit("insert"))
          .when(col("a_event_id") =!= col("b_event_id"), lit("update"))
          .otherwise(lit("unchanged")))
        .filter(col("op") =!= "unchanged")
        .select(col("user_id"), col("op"), col("b_event_id").as("new_event_id"),
          col("a_cents").as("old_cents"), col("b_cents").as("new_cents"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, epoch_ms(ts) AS ms, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
      bounds AS (
        SELECT MIN(ms) + ((MAX(ms) - MIN(ms)) * 3) // 5 AS t1 FROM ev),
      snapa AS (
        SELECT user_id, event_id AS a_event_id, cents AS a_cents
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY ms DESC, event_id DESC) AS rn
              FROM ev WHERE ms <= (SELECT t1 FROM bounds))
        WHERE rn = 1),
      snapb AS (
        SELECT user_id, event_id AS b_event_id, cents AS b_cents
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY ms DESC, event_id DESC) AS rn
              FROM ev)
        WHERE rn = 1)
      SELECT user_id,
             CASE WHEN a_event_id IS NULL THEN 'insert'
                  WHEN a_event_id <> b_event_id THEN 'update'
                  ELSE 'unchanged' END AS op,
             b_event_id AS new_event_id, a_cents AS old_cents,
             b_cents AS new_cents
      FROM snapb LEFT JOIN snapa USING (user_id)
      WHERE CASE WHEN a_event_id IS NULL THEN 'insert'
                 WHEN a_event_id <> b_event_id THEN 'update'
                 ELSE 'unchanged' END <> 'unchanged'
      ORDER BY user_id"""))

  /** MERGE-apply: the post-MERGE snapshot itself, not just the change
    * classification — the native stand-in for the reference's Delta MERGE
    * sink (`Spatially ETL test.py:237`, `USING DELTA`). A CDC feed derived
    * from the late 2/5 of the stream (per-user latest row; an `error`-typed
    * latest row is a DELETE tombstone, anything else an UPSERT) is applied
    * to the base snapshot with full MERGE semantics: matched+delete removes,
    * matched+upsert replaces, unmatched+upsert inserts, unmatched+delete is
    * a no-op. The apply is ONE full-outer shuffle join on the merge key plus
    * a projection — the scalable shape (at 100 TB both sides hash-partition
    * on user_id; no per-row lookups, no driver loop), exactly what an ACID
    * table format executes under the hood for a non-selective MERGE.
    */
  val cdcMergeApply = QueryDef(
    "cdc_merge_apply",
    (spark, dir) => {
      val withT1 = cdcWithT1(spark, dir, col("event_type"))
      def latest(pred: org.apache.spark.sql.Column) = withT1.filter(pred)
        .groupBy(col("user_id"))
        .agg(max(struct(col("ms"), col("event_id"), col("event_type"),
          col("cents"))).as("m"))
      val base = latest(col("ms") <= col("t1"))
        .select(col("user_id"), col("m.event_id").as("event_id"),
          col("m.cents").as("cents"))
      val changes = latest(col("ms") > col("t1"))
        .select(col("user_id"), col("m.event_id").as("c_event_id"),
          col("m.cents").as("c_cents"),
          when(col("m.event_type") === "error", lit("delete"))
            .otherwise(lit("upsert")).as("op"))
      base.join(changes, Seq("user_id"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "delete")
        .select(col("user_id"),
          when(col("op") === "upsert", col("c_event_id"))
            .otherwise(col("event_id")).as("event_id"),
          when(col("op") === "upsert", col("c_cents"))
            .otherwise(col("cents")).as("cents"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
      bounds AS (
        SELECT MIN(ms) + ((MAX(ms) - MIN(ms)) * 3) // 5 AS t1 FROM ev),
      base AS (
        SELECT user_id, event_id, cents
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY ms DESC, event_id DESC) AS rn
              FROM ev WHERE ms <= (SELECT t1 FROM bounds))
        WHERE rn = 1),
      changes AS (
        SELECT user_id, event_id AS c_event_id, cents AS c_cents,
               CASE WHEN event_type = 'error' THEN 'delete'
                    ELSE 'upsert' END AS op
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY ms DESC, event_id DESC) AS rn
              FROM ev WHERE ms > (SELECT t1 FROM bounds))
        WHERE rn = 1)
      SELECT user_id,
             CASE WHEN op = 'upsert' THEN c_event_id ELSE event_id END AS event_id,
             CASE WHEN op = 'upsert' THEN c_cents ELSE cents END AS cents
      FROM base FULL JOIN changes USING (user_id)
      WHERE op IS NULL OR op <> 'delete'
      ORDER BY user_id"""))

  /** Rolling z-score (trailing 7-row window per user over daily totals) —
    * the anomaly-scoring feature of event time series. Cross-engine float
    * determinism: the naive (x−μ)/σ chains divisions whose intermediate
    * rounding differs by formulation, so the score is computed as the
    * algebraically identical (n·x − Σx) / √(n·Σx² − (Σx)²) — both numerator
    * and the radicand are EXACT BIGINTs from cents sums, leaving one IEEE
    * sqrt and one division, which are correctly-rounded and bit-identical
    * in both engines. (At 100 TB, Σx² of raw cents would need DECIMAL or
    * centered accumulation; the window here is 7 rows, so it cannot.)
    */
  val eventsZscore = QueryDef(
    "events_zscore",
    (spark, dir) => {
      val daily = load(spark, dir, "events")
        .filter(col("user_id") % 30 === 0)
        .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("x"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s", sum(col("x")).over(w))
        .withColumn("ss", sum(col("x") * col("x")).over(w))
        .withColumn("rad", col("n") * col("ss") - col("s") * col("s"))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("x").as("day_cents"), col("n").as("n_window"),
          when(col("rad") > 0,
            (col("n") * col("x") - col("s")).cast("double") / sqrt(col("rad").cast("double")))
            .as("zscore"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE user_id % 30 = 0
        GROUP BY user_id, date_trunc('day', ts)),
      win AS (
        SELECT user_id, day, x,
               COUNT(*) OVER w AS n, SUM(x) OVER w AS s, SUM(x * x) OVER w AS ss
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT user_id, strftime(day, '%Y-%m-%d') AS day, x AS day_cents,
             CAST(n AS BIGINT) AS n_window,
             CASE WHEN n * ss - s * s > 0
                  THEN CAST(n * x - s AS DOUBLE) / sqrt(CAST(n * ss - s * s AS DOUBLE))
                  END AS zscore
      FROM win
      ORDER BY user_id, day"""))

  /** Robust (median/MAD) anomaly detection per event type — the outlier
    * filter that actually survives skewed value distributions, where the
    * mean/stddev z-score (`events_zscore`) gets dragged by the outliers it
    * is meant to find. Medians are LOWER medians computed by rank
    * (`value at row_number = (n+1) DIV 2`), not interpolated percentiles:
    * every intermediate stays an exact BIGINT, so both engines make
    * identical keep/flag decisions (interpolated medians and the 1.4826
    * normal-consistency factor are float and summation-order-dependent —
    * the integer 3×MAD fence trades the textbook constant for cross-engine
    * exactness).
    *
    * Scale shape — HISTOGRAM medians, not row rank-windows: a per-row
    * `row_number` over each event_type sorts the whole fact in |types|
    * tasks (measured 25 s at the 100× scale run, 32× growth — the
    * single-hot-partition trap). Instead the fact collapses to a
    * (type, value) → count histogram first (one parallel shuffle at
    * value-cardinality, ~10k distinct cents per type regardless of row
    * count), the rank-(n+1)/2 value is read off the histogram's running
    * cumsum (window over ~10k rows per type, not millions), the MAD repeats
    * the trick on the |v − median| histogram (derived from the SAME
    * histogram, no fact re-scan), and one final fact pass applies the
    * integer fence. Same exact results as the row-rank form — the oracle
    * states the row-rank semantics and both agree.
    */
  /** Histogram-cumsum rank machinery shared by [[eventsAnomalyMad]] and
    * [[eventsPercentiles]]: attach the running cumulative count and the
    * per-type total to a (event_type, valueCol, cnt) histogram; a value
    * sits at rank r iff `cum − cnt < r ≤ cum` ([[rankBracket]]). `div`
    * and the oracle `//` both truncate (measured r6) and every rank
    * operand is a count — structurally nonnegative, cross-engine exact.
    */
  private def histCum(h: DataFrame, valueCol: String): DataFrame = {
    val wCum = Window.partitionBy(col("event_type"))
      .orderBy(col(valueCol)).rowsBetween(Window.unboundedPreceding, 0)
    h.withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n",
        sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
  }

  private def rankBracket(rankExpr: String): Column =
    col("cum") - col("cnt") < expr(rankExpr) && col("cum") >= expr(rankExpr)

  val eventsAnomalyMad = QueryDef(
    "events_anomaly_mad",
    (spark, dir) => {
      val vCents = cents(col("value"))
      val ev = load(spark, dir, "events")
        .select(col("event_id"), col("event_type"), vCents.as("v"))
      val hist = ev.groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("cnt"))
      def histMedian(h: DataFrame, valueCol: String): DataFrame =
        histCum(h, valueCol)
          .filter(rankBracket("(n + 1) div 2"))
          .select(col("event_type"), col(valueCol).as("m"), col("n"))
      val med = histMedian(hist, "v")
        .select(col("event_type"), col("m").as("med"), col("n"))
      val devHist = hist.join(broadcast(med), "event_type")
        .groupBy(col("event_type"), abs(col("v") - col("med")).as("dev"))
        .agg(sum(col("cnt")).as("cnt"))
      val mad = histMedian(devHist, "dev")
        .select(col("event_type"), col("m").as("mad"))
      ev.join(broadcast(med), "event_type")
        .join(broadcast(mad), "event_type")
        .withColumn("dev", abs(col("v") - col("med")))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), max(col("med")).as("median_cents"),
          max(col("mad")).as("mad_cents"),
          sum(when(col("dev") > lit(3) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"),
          sum(when(col("dev") > lit(3) * col("mad"), col("event_id")))
            .as("outlier_id_sum"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY v, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM ev),
      med AS (
        SELECT event_type, v AS med, n FROM ranked WHERE rn = (n + 1) // 2),
      dev AS (
        SELECT ev.event_id, ev.event_type, ev.v, med.med, med.n,
               abs(ev.v - med.med) AS dev
        FROM ev JOIN med USING (event_type)),
      dranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY dev, event_id) AS rn
        FROM dev),
      mad AS (
        SELECT event_type, dev AS mad FROM dranked WHERE rn = (n + 1) // 2)
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(med) AS BIGINT) AS median_cents,
             CAST(MAX(mad.mad) AS BIGINT) AS mad_cents,
             CAST(SUM(CASE WHEN dev.dev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
             CAST(SUM(CASE WHEN dev.dev > 3 * mad.mad THEN event_id END) AS BIGINT)
               AS outlier_id_sum
      FROM dev JOIN mad USING (event_type)
      GROUP BY event_type
      ORDER BY event_type"""),
    notes = "integer-exact median/MAD outlier fence; window-rank lower medians")

  /** MATCH_RECOGNIZE-style adjacency pattern: a `click` whose NEXT event for
    * the same user is a `purchase` within 30 minutes (strict adjacency — an
    * intervening event of any type breaks the match; that is what separates
    * this from `events_funnel`'s any-later-event semantics). One `lead()`
    * window per user is the whole plan: at 100 TB this is a single shuffle
    * on user_id, and longer patterns (A B* C) compile to the same shape —
    * lead/lag chains or one `flatMapGroups` pass per user, never a
    * self-join of the fact against itself per pattern step.
    */
  val eventsSequencePattern = QueryDef(
    "events_sequence_pattern",
    (spark, dir) => {
      // everything in epoch-ms: Spark sees µs-truncated timestamps and DuckDB
      // ns ones, so ordering/adjacency at raw precision could disagree on
      // sub-ms ties — ms is the shared exact granularity (same rule as the
      // sessionize oracles)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      load(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("ms"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("next_ms", lead(col("ms"), 1).over(w))
        .withColumn("next_id", lead(col("event_id"), 1).over(w))
        .filter(col("event_type") === "click" && col("next_type") === "purchase" &&
          col("next_ms") <= col("ms") + lit(1800000L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matches"),
          min(col("ms")).as("first_click_ms"),
          sum(col("next_id")).as("purchase_id_sum"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
      seq AS (
        SELECT user_id, event_id, event_type, ms,
               LEAD(event_type) OVER w AS next_type,
               LEAD(ms) OVER w AS next_ms,
               LEAD(event_id) OVER w AS next_id
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
      SELECT user_id, COUNT(*) AS n_matches,
             MIN(ms) AS first_click_ms,
             CAST(SUM(next_id) AS BIGINT) AS purchase_id_sum
      FROM seq
      WHERE event_type = 'click' AND next_type = 'purchase'
        AND next_ms <= ms + 1800000
      GROUP BY user_id
      ORDER BY user_id"""),
    notes = "strict-adjacency event pattern (MATCH_RECOGNIZE shape) via one lead() window")

  /** Behavioral path mining: each user's ENTRY PATH (first five event types
    * in time order, joined `a>b>c`), then the cohort size per distinct path.
    * The order-SENSITIVE aggregation shape: `collect_list` alone is
    * nondeterministic under partition racing, so the list is collected as
    * (ms, event_id, type) structs and `array_sort`ed — lexicographic struct
    * ordering gives the deterministic time-then-id sequence on every run and
    * every partitioning (the DuckDB twin is `list(... ORDER BY ms,
    * event_id)`).
    *
    * Scale shape: one shuffle on user_id; per-user state is capped by the
    * slice (the sort is per-group, not global). For unbounded histories the
    * same result comes from a window row_number ≤ 5 pre-filter before the
    * collect — noted here because collect-then-slice on a hot user IS the
    * OOM shape at 100 TB.
    */
  val eventsPaths = QueryDef(
    "events_paths",
    (spark, dir) => {
      load(spark, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          col("event_id"), col("event_type"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          array_join(
            transform(
              slice(array_sort(collect_list(
                struct(col("ms"), col("event_id"), col("event_type")))), 1, 5),
              x => x.getField("event_type")), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("n_events"),
          min(col("user_id")).as("example_user"))
        .orderBy(col("n_users").desc, col("path"))
    },
    Some("""
      WITH per_user AS (
        SELECT user_id, COUNT(*) AS n_events,
               array_to_string(
                 list_slice(list(event_type ORDER BY epoch_ms(ts), event_id),
                            1, 5), '>') AS path
        FROM events
        GROUP BY user_id)
      SELECT path, COUNT(*) AS n_users,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             MIN(user_id) AS example_user
      FROM per_user
      GROUP BY path
      ORDER BY n_users DESC, path"""),
    notes = "deterministic ordered collect (struct array_sort); entry-path cohorts")

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next_type | type) as integer basis points (`10000 · n_pair DIV
    * n_from`). The estimation shape behind session simulation and
    * next-action prediction baselines. Same one-lead()-window plan as
    * [[eventsSequencePattern]] — the fact shuffles once on user_id, the
    * transition matrix is |types|² rows.
    */
  val eventsMarkov = QueryDef(
    "events_markov",
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      val wFrom = Window.partitionBy(col("event_type"))
      load(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("ms"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n_pair"))
        .withColumn("n_from", sum(col("n_pair")).over(wFrom))
        .select(col("event_type"), col("next_type"), col("n_pair"),
          // `div` and oracle `//` both truncate (measured r6); counts ≥ 0
          col("n_from"), expr("(10000L * n_pair) div n_from").as("p_bp"))
        .orderBy(col("event_type"), col("next_type"))
    },
    Some("""
      WITH seq AS (
        SELECT event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_ms(ts), event_id) AS next_type
        FROM events),
      pairs AS (
        SELECT event_type, next_type, COUNT(*) AS n_pair
        FROM seq
        WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type)
      SELECT event_type, next_type, n_pair,
             CAST(SUM(n_pair) OVER (PARTITION BY event_type) AS BIGINT) AS n_from,
             CAST((10000 * n_pair) //
               SUM(n_pair) OVER (PARTITION BY event_type) AS BIGINT) AS p_bp
      FROM pairs
      ORDER BY event_type, next_type"""),
    notes = "integer-bp Markov transition matrix from one lead() window")

  /** Exact per-group percentiles (P25/P50/P75/P95) via the SAME histogram-
    * cumsum pattern as [[eventsAnomalyMad]], generalized to arbitrary ranks:
    * the value at rank `ceil(p·n/100)` is read off the (type, value)→count
    * histogram's running total — nearest-rank percentiles, every
    * intermediate an exact BIGINT, value-cardinality-sized windows instead
    * of fact-sized sorts. The daily-latency-dashboard shape, scale-safe.
    */
  val eventsPercentiles = QueryDef(
    "events_percentiles",
    (spark, dir) => {
      val vCents = cents(col("value"))
      val hist = load(spark, dir, "events")
        .select(col("event_type"), vCents.as("v"))
        .groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("cnt"))
      val cum = histCum(hist, "v")
      def atRank(rankExpr: String): Column =
        max(when(rankBracket(rankExpr), col("v")))
      cum.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          atRank("(25 * n + 99) div 100").as("p25_cents"),
          atRank("(50 * n + 99) div 100").as("p50_cents"),
          atRank("(75 * n + 99) div 100").as("p75_cents"),
          atRank("(95 * n + 99) div 100").as("p95_cents"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH hist AS (
        SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
               COUNT(*) AS cnt
        FROM events
        GROUP BY 1, 2),
      cum AS (
        SELECT *,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM hist)
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             MAX(CASE WHEN cum - cnt < (25 * n + 99) // 100
                       AND cum >= (25 * n + 99) // 100 THEN v END) AS p25_cents,
             MAX(CASE WHEN cum - cnt < (50 * n + 99) // 100
                       AND cum >= (50 * n + 99) // 100 THEN v END) AS p50_cents,
             MAX(CASE WHEN cum - cnt < (75 * n + 99) // 100
                       AND cum >= (75 * n + 99) // 100 THEN v END) AS p75_cents,
             MAX(CASE WHEN cum - cnt < (95 * n + 99) // 100
                       AND cum >= (95 * n + 99) // 100 THEN v END) AS p95_cents
      FROM cum
      GROUP BY event_type
      ORDER BY event_type"""),
    notes = "nearest-rank percentiles off the value histogram; fact never sorted")

  /** Linear multi-touch attribution: each purchase's value splits EQUALLY
    * across the same user's clicks in the preceding hour, integer-exactly —
    * per-click share = value_cents DIV n_touches, with the division
    * REMAINDER credited to the earliest click (deterministic, and the
    * credits provably re-sum to every purchase's exact value). The batch
    * twin of `stream_attribution` upgraded from pairing to credit
    * assignment; same equi+interval join shape, bounded by the 1-hour
    * window. Division semantics: measured, BOTH Spark `div` and DuckDB
    * `//` truncate toward zero ((−7)//2 = −3 in DuckDB) — the oracle still
    * computes the quotient in the sign-safe (a − a%b) // b form, which is
    * exact for all signs under either floor or trunc semantics (both
    * engines' % is C-style), so a dialect drift can't break refunds. The
    * credit identity
    * Σcredits = value_cents holds for negative values (refunds) too.
    */
  val eventsAttributionLinear = QueryDef(
    "events_attribution_linear",
    (spark, dir) => {
      val ev = load(spark, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_millis(col("ts")).as("p_ms"),
          cents(col("value")).as("value_cents"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          unix_millis(col("ts")).as("c_ms"))
      val w = Window.partitionBy(col("purchase_id"))
      val wRank = Window.partitionBy(col("purchase_id"))
        .orderBy(col("c_ms"), col("click_id"))
      p.join(c, col("c_user") === col("user_id") &&
          col("c_ms") <= col("p_ms") && col("c_ms") >= col("p_ms") - lit(3600000L))
        .withColumn("n_touches", count(lit(1)).over(w))
        .withColumn("touch_rank", row_number().over(wRank))
        .select(col("purchase_id"), col("user_id"), col("click_id"),
          col("touch_rank"), col("n_touches"),
          (expr("value_cents div n_touches") +
            when(col("touch_rank") === 1, expr("value_cents % n_touches"))
              .otherwise(lit(0L))).as("credit_cents"))
        .orderBy(col("purchase_id"), col("touch_rank"))
    },
    Some("""
      WITH p AS (
        SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS p_ms,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
        FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT event_id AS click_id, user_id, epoch_ms(ts) AS c_ms
        FROM events WHERE event_type = 'click'),
      touches AS (
        SELECT p.purchase_id, p.user_id, c.click_id, p.value_cents, c.c_ms,
               COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touches,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                 ORDER BY c.c_ms, c.click_id) AS touch_rank
        FROM p JOIN c ON c.user_id = p.user_id
          AND c.c_ms <= p.p_ms AND c.c_ms >= p.p_ms - 3600000)
      SELECT purchase_id, user_id, click_id, touch_rank,
             CAST(n_touches AS BIGINT) AS n_touches,
             -- (a - a%b) // b = truncating division for ALL signs under
             -- either floor or trunc `//` semantics (measured: DuckDB //
             -- truncates like Spark div, but this form doesn't depend on
             -- it). Both engines' integer % is C-style (sign of dividend),
             -- so a - a%b is exactly trunc(a/b)*b and the // on it is exact.
             CAST((value_cents - (value_cents % n_touches)) // n_touches
                  + CASE WHEN touch_rank = 1 THEN value_cents % n_touches
                         ELSE 0 END AS BIGINT) AS credit_cents
      FROM touches
      ORDER BY purchase_id, touch_rank"""),
    notes = "integer-exact linear multi-touch credit; remainder to earliest click")

  /** Two-sample A/B comparison per event type (variant = user parity — the
    * deterministic stand-in for an assignment column): Welch z-statistic
    * computed entirely from exact integer sums (n, Σcents, Σcents²) with the
    * float division/sqrt applied once at the end in a fixed expression
    * order — the same cross-engine bit-exactness recipe as
    * [[eventsZscore]]. One aggregate over the fact (map-side partials);
    * the statistic is |types|×2 rows of arithmetic. The variance term
    * n·Σx² − (Σx)² is widened to DECIMAL(38,0) (oracle: HUGEINT) before the
    * products: on BIGINT it overflows once a group passes ~1e5 rows at
    * cents ~5e4, so the exact-sums claim now holds to ~1e38, i.e. any
    * realistic scale factor.
    */
  val eventsAbTest = QueryDef(
    "events_ab_test",
    (spark, dir) => {
      val vCents = cents(col("value"))
      val agg = load(spark, dir, "events")
        .select(col("event_type"), (col("user_id") % 2).as("variant"), vCents.as("x"))
        .groupBy(col("event_type"), col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(col("x") * col("x")).as("ss"))
      agg.groupBy(col("event_type"))
        .agg(
          max(when(col("variant") === 0, col("n"))).as("n_a"),
          max(when(col("variant") === 1, col("n"))).as("n_b"),
          max(when(col("variant") === 0, col("s"))).as("s_a"),
          max(when(col("variant") === 1, col("s"))).as("s_b"),
          max(when(col("variant") === 0, col("ss"))).as("ss_a"),
          max(when(col("variant") === 1, col("ss"))).as("ss_b"))
        .select(col("event_type"), col("n_a"), col("n_b"), col("s_a"), col("s_b"),
          (col("s_a").cast("double") / col("n_a").cast("double") -
            col("s_b").cast("double") / col("n_b").cast("double")).as("mean_diff"),
          ((col("s_a").cast("double") / col("n_a").cast("double") -
            col("s_b").cast("double") / col("n_b").cast("double")) /
            sqrt(
              // n*ss - s*s overflows BIGINT once a group passes ~1e5 rows at
              // cents ~5e4 (n*ss > 9.2e18): widen to DECIMAL(38,0) BEFORE the
              // products — exact to 1e38, cast to double once, matching the
              // oracle's exact HUGEINT arithmetic bit-for-bit.
              (col("n_a").cast("decimal(38,0)") * col("ss_a").cast("decimal(38,0)") -
                col("s_a").cast("decimal(38,0)") * col("s_a").cast("decimal(38,0)"))
                .cast("double") /
                (col("n_a").cast("double") * col("n_a").cast("double") *
                  (col("n_a").cast("double") - 1.0)) +
              (col("n_b").cast("decimal(38,0)") * col("ss_b").cast("decimal(38,0)") -
                col("s_b").cast("decimal(38,0)") * col("s_b").cast("decimal(38,0)"))
                .cast("double") /
                (col("n_b").cast("double") * col("n_b").cast("double") *
                  (col("n_b").cast("double") - 1.0)))).as("z"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH agg AS (
        SELECT event_type, user_id % 2 AS variant, COUNT(*) AS n,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                      * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS ss
        FROM events
        GROUP BY 1, 2),
      pivoted AS (
        SELECT event_type,
               MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
               MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
               MAX(CASE WHEN variant = 0 THEN s END) AS s_a,
               MAX(CASE WHEN variant = 1 THEN s END) AS s_b,
               MAX(CASE WHEN variant = 0 THEN ss END) AS ss_a,
               MAX(CASE WHEN variant = 1 THEN ss END) AS ss_b
        FROM agg GROUP BY event_type)
      SELECT event_type, n_a, n_b, s_a, s_b,
             CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_diff,
             (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt(
                 CAST(CAST(n_a AS HUGEINT) * ss_a - CAST(s_a AS HUGEINT) * s_a AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
               + CAST(CAST(n_b AS HUGEINT) * ss_b - CAST(s_b AS HUGEINT) * s_b AS DOUBLE)
                   / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))) AS z
      FROM pivoted
      ORDER BY event_type"""),
    notes = "Welch z from exact integer sums; one float expression in pinned order")

  /** Trailing-7-day EXACT distinct users per day — the sliding-window
    * distinct count that resists naive windowing (COUNT(DISTINCT) over a
    * moving frame cannot merge like a sum). The scalable exact form is
    * contribute-expansion: dedup to (day, user) pairs FIRST (the fact
    * never expands), then each pair contributes to the ≤7 target days it
    * is visible from, and one groupBy(target day) counts distinct users.
    * Work is bounded by window_length × |daily actives|, not window ×
    * |events| — the dedup-before-expand order is the whole trick. (The
    * approximate-at-scale alternative — mergeable per-day HLLs unioned
    * over the trailing window — is `agg_hll_setops`' machinery.)
    */
  val windowSlidingDistinct = QueryDef(
    "window_sliding_distinct",
    (spark, dir) => {
      val dayUser = load(spark, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
      dayUser
        .select(col("user_id"),
          explode(array((0 to 6).map(lit): _*)).as("i"),
          col("day"))
        .select(date_format(date_add(col("day"), col("i")), "yyyy-MM-dd")
          .as("day7"), col("user_id"))
        .groupBy(col("day7"))
        .agg(countDistinct(col("user_id")).as("n_users_7d"),
          count(lit(1)).as("n_day_user_pairs"))
        .orderBy(col("day7"))
    },
    Some("""
      WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      ex AS (
        SELECT day + CAST(i AS INTEGER) AS tday, user_id
        FROM du, (SELECT unnest(range(7)) AS i))
      SELECT strftime(tday, '%Y-%m-%d') AS day7,
             COUNT(DISTINCT user_id) AS n_users_7d,
             COUNT(*) AS n_day_user_pairs
      FROM ex GROUP BY 1 ORDER BY 1"""),
    notes = "exact sliding distinct via dedup-then-expand; work = 7 x daily actives")

  /** RFM segmentation — the marketing-warehouse classic: per user, recency
    * (days since last purchase, vs the corpus max day), frequency (purchase
    * count), monetary (cents total), each scored into quintiles, users
    * rolled up per 3-digit segment code. Quintile boundaries use ntile over
    * a FULLY deterministic order (metric, then user_id) — ntile ties are
    * assignment-order artifacts, so an explicit unique tie-break is the
    * difference between a reproducible segmentation and a flaky one. The
    * corpus max day is a 1-row broadcast; the per-user rollup is one
    * shuffle; the final segment table is ≤125 rows regardless of scale.
    * Honest caveat: the three global ntile windows sort the |users| table
    * in one partition — fine while users ≪ events (the usual 10³–10⁴×
    * reduction), and past that the quintile BOUNDARIES come from the exact
    * distributed percentile machinery (`quantiles_exact` /
    * `pipeline_shard_balance`'s two-phase rank) + a broadcast range join,
    * same result.
    */
  val eventsRfm = QueryDef(
    "events_rfm",
    (spark, dir) => {
      val purch = load(spark, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          cents(col("value")).as("vc"))
      val maxDay = purch.agg(max(col("day")).as("max_day"))
      val perUser = purch.groupBy(col("user_id"))
        .agg(max(col("day")).as("last_day"),
          count(lit(1)).as("freq"),
          sum(col("vc")).as("monetary_cents"))
        .crossJoin(broadcast(maxDay))
        .select(col("user_id"),
          datediff(col("max_day"), col("last_day")).as("recency_days"),
          col("freq"), col("monetary_cents"))
      val scored = perUser.select(col("user_id"),
        ntile(5).over(Window.orderBy(col("recency_days"), col("user_id")))
          .as("r"),
        ntile(5).over(Window.orderBy(col("freq").desc, col("user_id")))
          .as("f"),
        ntile(5).over(Window.orderBy(col("monetary_cents").desc,
          col("user_id"))).as("m"))
      scored.groupBy((col("r") * 100 + col("f") * 10 + col("m")).as("segment"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("segment"))
    },
    Some("""
      WITH purch AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        FROM events WHERE event_type = 'purchase'),
      per_user AS (
        SELECT user_id,
               date_diff('day', MAX(day), (SELECT MAX(day) FROM purch))
                 AS recency_days,
               COUNT(*) AS freq,
               CAST(SUM(vc) AS BIGINT) AS monetary_cents
        FROM purch GROUP BY user_id),
      scored AS (
        SELECT user_id,
               NTILE(5) OVER (ORDER BY recency_days, user_id) AS r,
               NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f,
               NTILE(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m
        FROM per_user)
      SELECT r * 100 + f * 10 + m AS segment, COUNT(*) AS n_users
      FROM scored GROUP BY 1 ORDER BY 1"""),
    notes = "RFM quintile segmentation; deterministic ntile tie-breaks, 1-row max-day broadcast")

  /** Linear interpolation of missing days (the resample-and-interpolate
    * timeseries shape; `events_gapfill` is the carry-forward sibling) over
    * a sparse daily series, in EXACT integer arithmetic: the interpolated
    * value is prev + ⌊Δvalue·Δdays / span⌋ where the floor division is
    * spelled (a − pmod(a,b)) div b on BOTH sides — Δvalue goes NEGATIVE on
    * falling segments, where plain `div` and DuckDB's `//` both truncate
    * toward zero (measured: (-7)//2 = -3 in DuckDB) and a mathematical
    * floor differs by 1; subtracting the nonnegative pmod first makes the
    * division exact, so trunc == floor in both engines by construction.
    * Calendar spans each type's own [min, max] day, so
    * every gap has both anchors; prev/next anchors come from
    * last/first(IGNORE NULLS) frames, one partitioned window pass each.
    */
  val eventsInterpolate = QueryDef(
    "events_interpolate",
    (spark, dir) => {
      val daily = load(spark, dir, "events")
        .filter(col("event_id") % 97 === 0) // sparse slice -> real gaps
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("c"))
      val cal = daily.groupBy(col("event_type"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("event_type"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val filled = cal.join(daily, Seq("event_type", "day"), "left_outer")
        .withColumn("prev_c", last(col("c"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("prev_d",
          last(when(col("c").isNotNull, col("day")), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("next_c", first(col("c"), ignoreNulls = true)
          .over(w.rowsBetween(0, Window.unboundedFollowing)))
        .withColumn("next_d",
          first(when(col("c").isNotNull, col("day")), ignoreNulls = true)
            .over(w.rowsBetween(0, Window.unboundedFollowing)))
      filled
        .withColumn("num",
          (col("next_c") - col("prev_c")) * datediff(col("day"), col("prev_d")))
        .withColumn("den", datediff(col("next_d"), col("prev_d")))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          when(col("c").isNotNull, col("c"))
            .otherwise(col("prev_c") +
              expr("(num - pmod(num, den)) div den")).as("cents"),
          col("c").isNull.cast("int").as("is_interp"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        FROM events WHERE event_id % 97 = 0
        GROUP BY 1, 2),
      cal AS (
        SELECT event_type,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
              FROM daily GROUP BY 1)),
      f AS (
        SELECT cal.event_type, cal.day, daily.c,
               last_value(c IGNORE NULLS) OVER wp AS prev_c,
               last_value(CASE WHEN c IS NOT NULL THEN cal.day END IGNORE NULLS)
                 OVER wp AS prev_d,
               first_value(c IGNORE NULLS) OVER wf AS next_c,
               first_value(CASE WHEN c IS NOT NULL THEN cal.day END IGNORE NULLS)
                 OVER wf AS next_d
        FROM cal LEFT JOIN daily
          ON cal.event_type = daily.event_type AND cal.day = daily.day
        WINDOW wp AS (PARTITION BY cal.event_type ORDER BY cal.day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY cal.event_type ORDER BY cal.day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      g AS (
        SELECT *, (next_c - prev_c) * date_diff('day', prev_d, day) AS num,
               date_diff('day', prev_d, next_d) AS den
        FROM f)
      -- (num - pmod(num, den)) // den: numerator is an exact multiple of
      -- den, so DuckDB's truncating // equals floor — same construction as
      -- the Spark side (DuckDB's plain // truncates toward zero on
      -- negatives, unlike a mathematical floor)
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
             CAST(CASE WHEN c IS NOT NULL THEN c
                  ELSE prev_c + (num - (((num % den) + den) % den)) // den
                  END AS BIGINT) AS cents,
             CAST(c IS NULL AS INTEGER) AS is_interp
      FROM g ORDER BY event_type, day"""),
    notes = "exact integer linear interpolation; pmod-floor div == DuckDB // on negative slopes")

  /** CUSUM changepoint detection per event type, at DAY granularity.
    *
    * Scale design: the raw fact reduces to a (type, day) histogram first —
    * one shuffle with map-side partial sums, output |types|·|days| rows
    * (hundreds) — and ALL cusum arithmetic runs on that tiny table. The
    * naive form (cumulative window over raw events partitioned by type)
    * is the single-hot-partition trap events_anomaly_mad hit at 100×;
    * day-level pre-aggregation makes the window cost independent of row
    * count, exactly like the histogram-median rewrite.
    *
    * Exactness: the textbook statistic S_k = Σ_{i≤k}(x_i − x̄) needs the
    * mean; multiplying through by D (the day count) gives
    * S'_k = D·cum_k − k·T with cum/T exact BIGINT cent sums — no division,
    * no floats, hash-stable across engines. Bound: |S'| ≤ D·T, so with
    * daily sums ≤ 2^40 cents and D ≤ 10⁴ days it stays far inside Int64.
    * Changepoint = earliest day attaining max |S'_k| (ties broken by day).
    */
  val eventsCusum = QueryDef(
    "events_cusum",
    (spark, dir) => {
      val daily = load(spark, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("s"))
      val seq = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val all = Window.partitionBy(col("event_type"))
      val scored = daily
        .withColumn("k", row_number().over(seq))
        .withColumn("cum", sum(col("s")).over(seq))
        .withColumn("t", sum(col("s")).over(all))
        .withColumn("d", count(lit(1)).over(all))
        .withColumn("sabs", abs(col("d") * col("cum") - col("k") * col("t")))
      scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("sabs").desc, col("day"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("day").as("cp_day"),
          col("sabs").as("max_abs_s"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s
        FROM events GROUP BY 1, 2),
      c AS (
        SELECT event_type, day,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
               SUM(s) OVER (PARTITION BY event_type ORDER BY day) AS cum,
               SUM(s) OVER (PARTITION BY event_type) AS t,
               COUNT(*) OVER (PARTITION BY event_type) AS d
        FROM daily),
      m AS (
        SELECT event_type, day, ABS(d * cum - k * t) AS sabs,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY ABS(d * cum - k * t) DESC, day) AS rn
        FROM c)
      SELECT event_type, day AS cp_day, CAST(sabs AS BIGINT) AS max_abs_s
      FROM m WHERE rn = 1 ORDER BY event_type"""),
    notes = "day-level CUSUM: D*cum - k*T integer statistic, window over the tiny daily histogram only")

  /** Seasonal-naive forecast backtest: predict each (type, day, hour)'s
    * cent sum by the LAST OBSERVED same-hour sum on an earlier day, and
    * report the per-type backtest error as exact integers (forecast count +
    * sum of absolute errors in cents — the MAE numerator/denominator,
    * division left to the caller so the result stays hash-exact).
    *
    * Scale design: same pre-aggregate-first doctrine as events_cusum — one
    * (type, day, hour) rollup with map-side combine, then lag() over
    * (type, hour) partitions of the tiny rollup. Gaps in the day sequence
    * fall back to the most recent observed same-hour value (lag over the
    * observed rows), which keeps the statistic well-defined without a
    * calendar fill.
    */
  val eventsForecast = QueryDef(
    "events_forecast",
    (spark, dir) => {
      val hourly = load(spark, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"),
          hour(col("ts")).cast("long").as("hr"))
        .agg(sum(cents(col("value"))).as("s"))
      val w = Window.partitionBy(col("event_type"), col("hr")).orderBy(col("day"))
      hourly
        .withColumn("fc", lag(col("s"), 1).over(w))
        .filter(col("fc").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_fc"),
          sum(abs(col("s") - col("fc"))).as("sae_cents"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH hourly AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
               SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s
        FROM events GROUP BY 1, 2, 3),
      f AS (
        SELECT event_type, s,
               LAG(s) OVER (PARTITION BY event_type, hr ORDER BY day) AS fc
        FROM hourly)
      SELECT event_type, COUNT(*) AS n_fc,
             CAST(SUM(ABS(s - fc)) AS BIGINT) AS sae_cents
      FROM f WHERE fc IS NOT NULL
      GROUP BY event_type ORDER BY event_type"""),
    notes = "seasonal-naive backtest on the (type,day,hour) rollup; exact integer MAE components")

  /** Burst detection via gaps-and-islands: maximal runs of CONSECUTIVE
    * minutes whose event count is at or above the per-minute average
    * (integer rule n·M ≥ T — no mean division). The classic islands trick:
    * minute − row_number() is constant exactly within a consecutive run.
    *
    * Scale posture: the fact first collapses to the per-minute histogram
    * (one shuffle, map-side combine). The islands window is a GLOBAL
    * sequence, but its input is time-bounded, not data-bounded — ≤525 600
    * rows per YEAR of wall-clock regardless of event volume, so the
    * single-partition window never grows with corpus size. (For multi-year
    * spans, partition by month and stitch boundary runs.)
    */
  val eventsIslands = QueryDef(
    "events_islands",
    (spark, dir) => {
      val m = load(spark, dir, "events")
        .groupBy(expr("unix_micros(ts) div 60000000").as("minute"))
        .agg(count(lit(1)).as("n"))
      val tot = m.agg(sum(col("n")).as("t"), count(lit(1)).as("mcnt"))
      val qual = m.crossJoin(broadcast(tot))
        .filter(col("n") * col("mcnt") >= col("t"))
      qual
        .withColumn("grp",
          col("minute") - row_number().over(Window.orderBy(col("minute"))))
        .groupBy(col("grp"))
        .agg(min(col("minute")).as("start_min"),
          max(col("minute")).as("end_min"),
          count(lit(1)).as("n_minutes"),
          sum(col("n")).as("n_events"))
        .select(col("start_min"), col("end_min"), col("n_minutes"),
          col("n_events"))
        .orderBy(col("start_min"))
    },
    Some("""
      WITH m AS (
        SELECT epoch_us(ts) // 60000000 AS minute, COUNT(*) AS n
        FROM events GROUP BY 1),
      s AS (SELECT SUM(n) AS t, COUNT(*) AS mcnt FROM m),
      qual AS (SELECT minute, n FROM m, s WHERE n * mcnt >= t),
      g AS (
        SELECT minute, n,
               minute - ROW_NUMBER() OVER (ORDER BY minute) AS grp
        FROM qual)
      SELECT MIN(minute) AS start_min, MAX(minute) AS end_min,
             COUNT(*) AS n_minutes, CAST(SUM(n) AS BIGINT) AS n_events
      FROM g GROUP BY grp ORDER BY start_min"""),
    notes = "above-average-minute islands; window input time-bounded (<=525600 rows/yr), not data-bounded")

  /** Cohort lifetime value: cumulative revenue cents per (cohort week,
    * weeks-since-acquisition) — the monetary completion of events_retention
    * (same cohort assignment, same per-user-summary-first shuffle). The
    * cumulative sum runs over the tiny cohort×offset matrix (≤ weeks²
    * rows, time-bounded like the islands window), never the fact; LTV
    * stays exact cents — the per-user average is the caller's one
    * division.
    */
  val eventsCohortLtv = QueryDef(
    "events_cohort_ltv",
    (spark, dir) => {
      val week = floor(
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / 7)
        .cast("long")
      val ev = load(spark, dir, "events")
        .select(col("user_id"), week.as("week"),
          cents(col("value")).as("cents"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      val cohortSizes = cohort.groupBy(col("cohort_week"))
        .agg(countDistinct(col("user_id")).as("cohort_users"))
      val cell = ev.join(cohort.select(col("user_id"), col("cohort_week")),
          "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(sum(col("cents")).as("week_cents"))
      cell
        .withColumn("cum_cents", sum(col("week_cents")).over(
          Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))))
        .join(broadcast(cohortSizes), Seq("cohort_week"))
        .select(col("cohort_week"), col("week_offset"), col("cohort_users"),
          col("week_cents"), col("cum_cents"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id,
               CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS week,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
      cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
      sizes AS (SELECT cohort_week, COUNT(DISTINCT user_id) AS cohort_users
                FROM cohort GROUP BY cohort_week),
      cell AS (
        SELECT cohort_week, week - cohort_week AS week_offset,
               CAST(SUM(cents) AS BIGINT) AS week_cents
        FROM ev JOIN cohort USING (user_id)
        GROUP BY cohort_week, week - cohort_week)
      SELECT cohort_week, week_offset, cohort_users, week_cents,
             CAST(SUM(week_cents) OVER (PARTITION BY cohort_week
               ORDER BY week_offset) AS BIGINT) AS cum_cents
      FROM cell JOIN sizes USING (cohort_week)
      ORDER BY cohort_week, week_offset"""),
    notes = "cumulative cohort revenue over the tiny cohort-by-offset matrix; exact cents, broadcast sizes")

  /** Time-constrained funnel: signup → click → purchase where EVERY later
    * stage must land within 24h of the user's FIRST signup — the
    * conversion-window semantics product analytics actually reports
    * (events_funnel's unconstrained ordering says "ever converted"; this
    * says "converted within the window"). Same scale shape as
    * events_funnel: per-stage conditional min-aggregates on the user key,
    * window bound folded into the stage predicate — the fact is never
    * self-joined, and all stage aggregates reuse the user_id shuffle.
    * Deadline arithmetic in exact epoch µs.
    */
  val eventsFunnelWindow = QueryDef(
    "events_funnel_window",
    (spark, dir) => {
      val ev = load(spark, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
      val dayUs = 86400000000L
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("us") > col("t1") && col("us") <= col("t1") + dayUs)
        .groupBy(col("user_id"))
        .agg(min(col("us")).as("t2"), max(col("t1")).as("t1b"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("us") > col("t2") && col("us") <= col("t1b") + dayUs)
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      val users = ev.select(col("user_id")).distinct()
      users
        .join(s1, Seq("user_id"), "left")
        .join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_users"),
          count(col("t1")).as("n_signup"),
          count(col("t2")).as("n_click_24h"),
          count(col("t3")).as("n_purchase_24h"))
    },
    Some("""
      WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(epoch_us(ts)) AS t2, MAX(t1) AS t1b
             FROM events e JOIN s1 USING (user_id)
             WHERE event_type = 'click'
               AND epoch_us(ts) > t1
               AND epoch_us(ts) <= t1 + 86400000000
             GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(epoch_us(ts)) AS t3
             FROM events e JOIN s2 USING (user_id)
             WHERE event_type = 'purchase'
               AND epoch_us(ts) > t2
               AND epoch_us(ts) <= t1b + 86400000000
             GROUP BY e.user_id),
      users AS (SELECT DISTINCT user_id FROM events)
      SELECT COUNT(*) AS n_users,
             COUNT(t1) AS n_signup,
             COUNT(t2) AS n_click_24h,
             COUNT(t3) AS n_purchase_24h
      FROM users
      LEFT JOIN s1 USING (user_id)
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)"""),
    notes = "24h conversion-window funnel; window bound folded into stage predicates, exact epoch-us arithmetic")

  /** Exponentially-decayed daily engagement (EMA stand-in) with DYADIC
    * weights: decay_t = Σ_{i=0..7} ⌊daily_{t−i} / 2^i⌋, i.e. each prior
    * day's revenue contributes at half the weight of the next — the shape
    * every feature store wants for "recent activity" scores. The usual EMA
    * recurrence s_t = αx_t + (1−α)s_{t−1} is sequential and float; the
    * dyadic truncated form is a CLOSED-FORM 8-term window sum of bit
    * shifts, so it is exact in BIGINT, order-free, and stays inside
    * whole-stage codegen (lag + shiftright — no UDF, no recursion).
    *
    * Scale: the fact collapses to (type, day) daily sums first — one
    * partial-aggregated shuffle, O(types·days) rows after — and the lag
    * window runs on that tiny series per type. Weights are per-OBSERVATION
    * (row offset), not per-calendar-day; compose with events_gapfill first
    * when calendar decay over sparse days is wanted.
    */
  val eventsEma = QueryDef(
    "events_ema",
    (spark, dir) => {
      val daily = load(spark, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          cents(col("value")).as("v"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("v")).as("day_cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val decay = (0 to 7)
        .map(i => coalesce(shiftright(lag(col("day_cents"), i).over(w), i),
          lit(0L)))
        .reduce(_ + _)
      daily.withColumn("decay_cents", decay)
        .orderBy(col("event_type"), col("day"))
    },
    Some {
      val terms = (0 to 7)
        .map(i => s"COALESCE((lag(day_cents, $i) OVER w) >> $i, 0)")
        .mkString(" + ")
      s"""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS day_cents
        FROM events GROUP BY event_type, CAST(ts AS DATE))
      SELECT event_type, day, day_cents,
             CAST($terms AS BIGINT) AS decay_cents
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
      ORDER BY event_type, day"""
    },
    notes = "dyadic-weight decayed daily revenue: closed-form 8-term lag/shiftright window, exact BIGINT")

  /** Kaplan–Meier churn/survival curve in integer basis points. Per user:
    * lifetime t = HOURS between first and last event; a user inactive for
    * ≥24 h before the corpus horizon is a CHURN (death) at t, anyone still
    * active inside that window is CENSORED at t — the textbook
    * right-censoring setup (hour granularity because the synthetic corpus
    * spans ~29 days with daily-active users; a day-based cutoff labels
    * nobody dead). Then S(t) = Π_{s≤t} (n_s − d_s)/n_s over the
    * per-lifetime death/censor counts, with the product kept EXACT by
    * folding in integer bp with truncating division (both engines `div`
    * toward zero; all operands nonnegative).
    *
    * Scale design: the fact reduces to one row per user (one user_id
    * shuffle), then to one row per DISTINCT LIFETIME (≤ observation span in
    * hours — hundreds of rows at any corpus size). The inherently
    * sequential KM product runs on that tiny series via collect_list + a
    * higher-order prefix fold (`aggregate(slice(...))`, O(T²) on T≈700 —
    * constant), so nothing sequential ever touches a per-user or per-event
    * row; the single-partition window and fold are bounded by the calendar,
    * not data volume. Oracle replays the identical truncated recurrence as
    * a recursive CTE.
    */
  val eventsSurvival = QueryDef(
    "events_survival",
    (spark, dir) => {
      val ev = load(spark, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 3600000000").as("hr"))
      val life = ev.groupBy(col("user_id"))
        .agg((max(col("hr")) - min(col("hr"))).as("t"),
          max(col("hr")).as("last_h"))
      val horizon = ev.agg(max(col("hr")).as("h"))
      val lab = life.crossJoin(broadcast(horizon))
        .select(col("t"),
          when(col("last_h") + 24 <= col("h"), 1L).otherwise(0L)
            .as("dead"))
      val perT = lab.groupBy(col("t"))
        .agg(sum(col("dead")).as("d_cnt"),
          sum(lit(1L) - col("dead")).as("c_cnt"))
      val tot = perT.agg(sum(col("d_cnt") + col("c_cnt")).as("n_tot"))
      val w = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val risk = perT.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("n_tot") -
            coalesce(sum(col("d_cnt") + col("c_cnt")).over(w), lit(0L)))
        .select(col("t"), col("d_cnt"), col("c_cnt"), col("n_risk"))
      risk
        .agg(sort_array(collect_list(struct(col("t"), col("d_cnt"),
          col("c_cnt"), col("n_risk")))).as("a"))
        .select(explode(expr(
          """transform(a, (x, i) -> named_struct(
               't', x.t, 'n_risk', x.n_risk,
               'd', x.d_cnt, 'c', x.c_cnt,
               'surv_bp', aggregate(slice(a, 1, i + 1),
                 CAST(10000 AS BIGINT),
                 (acc, y) -> (acc * (y.n_risk - y.d_cnt)) div y.n_risk)))"""))
          .as("r"))
        .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
          col("r.d").as("d"), col("r.c").as("c"),
          col("r.surv_bp").as("surv_bp"))
        .orderBy(col("t"))
    },
    Some("""
      WITH RECURSIVE ev AS (
        SELECT user_id, epoch_us(ts) // 3600000000 AS hr FROM events),
      life AS (
        SELECT user_id, CAST(MAX(hr) - MIN(hr) AS BIGINT) AS t,
               MAX(hr) AS last_h
        FROM ev GROUP BY user_id),
      h AS (SELECT MAX(hr) AS h FROM ev),
      lab AS (
        SELECT t, CASE WHEN last_h + 24 <= h THEN 1 ELSE 0 END AS dead
        FROM life, h),
      per_t AS (
        SELECT t, CAST(SUM(dead) AS BIGINT) AS d_cnt,
               CAST(SUM(1 - dead) AS BIGINT) AS c_cnt
        FROM lab GROUP BY t),
      tot AS (SELECT CAST(SUM(d_cnt + c_cnt) AS BIGINT) AS n_tot FROM per_t),
      risk AS (
        SELECT t, d_cnt, c_cnt,
               n_tot - COALESCE(CAST(SUM(d_cnt + c_cnt) OVER
                 (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
        FROM per_t, tot),
      seq AS (
        SELECT t, d_cnt, c_cnt, n_risk,
               ROW_NUMBER() OVER (ORDER BY t) AS rn
        FROM risk),
      rec AS (
        SELECT rn, t, d_cnt, c_cnt, n_risk,
               (10000 * (n_risk - d_cnt)) // n_risk AS s
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT seq.rn, seq.t, seq.d_cnt, seq.c_cnt, seq.n_risk,
               (rec.s * (seq.n_risk - seq.d_cnt)) // seq.n_risk
        FROM rec JOIN seq ON seq.rn = rec.rn + 1)
      SELECT t, n_risk, d_cnt AS d, c_cnt AS c, CAST(s AS BIGINT) AS surv_bp
      FROM rec ORDER BY t"""),
    notes = "right-censored Kaplan-Meier in integer bp; sequential product folded on the tiny per-lifetime aggregate")

  /** HOLT double exponential smoothing (level + trend) — the recursive
    * forecaster [[eventsForecast]]'s seasonal-naive baseline cannot
    * express: l_t = αx_t + (1−α)(l+b), b_t = β(l_t−l) + (1−β)b. With
    * α = β = ½ both recurrences are single truncating integer divisions
    * (`div` truncates toward zero in BOTH engines, including on the
    * negative trend values a falling series produces), so the whole
    * recursion stays exact BIGINT — no float smoothing drift between
    * engines. Output per event_type: final level, trend, and the
    * one-step-ahead forecast l+b.
    *
    * Scale shape: the fact collapses to (type, day) daily sums first (one
    * partial-aggregated shuffle); the inherently sequential recursion then
    * folds over each type's ≤O(days) array via collect_list + higher-order
    * `aggregate` — sequential work is bounded by the calendar, never by
    * data volume (same pattern as events_survival). Oracle replays the
    * identical recurrence as a recursive CTE stepping (type, rn).
    */
  val eventsHolt = QueryDef(
    "events_holt",
    (spark, dir) => {
      val daily = load(spark, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          cents(col("value")).as("v"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("v")).as("day_cents"))
      val fold = expr(
        """aggregate(
             transform(sort_array(collect_list(struct(day, day_cents))),
               s -> s.day_cents),
             named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
                          'i', CAST(0 AS BIGINT)),
             (s, x) -> IF(s.i = 0,
               named_struct('l', x, 'b', CAST(0 AS BIGINT),
                            'i', CAST(1 AS BIGINT)),
               named_struct(
                 'l', (x + s.l + s.b) div 2,
                 'b', (((x + s.l + s.b) div 2 - s.l) + s.b) div 2,
                 'i', s.i + 1)))""")
      daily.groupBy(col("event_type"))
        .agg(fold.as("st"))
        .select(col("event_type"), col("st.i").as("n_days"),
          col("st.l").as("level_cents"), col("st.b").as("trend_cents"),
          (col("st.l") + col("st.b")).as("forecast_cents"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS day_cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
      seq AS (
        SELECT event_type, day_cents,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily),
      rec AS (
        SELECT event_type, rn, n, day_cents AS l, CAST(0 AS BIGINT) AS b
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.rn, s.n,
               (s.day_cents + r.l + r.b) // 2,
               (((s.day_cents + r.l + r.b) // 2 - r.l) + r.b) // 2
        FROM rec r JOIN seq s
          ON s.event_type = r.event_type AND s.rn = r.rn + 1)
      SELECT event_type, CAST(n AS BIGINT) AS n_days,
             CAST(l AS BIGINT) AS level_cents,
             CAST(b AS BIGINT) AS trend_cents,
             CAST(l + b AS BIGINT) AS forecast_cents
      FROM rec WHERE rn = n
      ORDER BY event_type"""),
    notes = "Holt level+trend recursion, dyadic alpha=beta=1/2, exact integer fold on the tiny daily series")

  /** 7-day ROLLING MEDIAN of daily revenue per event type — the robust
    * rolling baseline (median ignores single-day spikes that wreck a
    * rolling mean; pairs with [[eventsAnomalyMad]]'s global fence). Exact
    * by construction: the frame's values are collected per row (≤7 longs),
    * sorted, and the LOWER NEAREST-RANK element ⌈n/2⌉ is picked — no
    * interpolation, no float, so both engines agree bit-for-bit (DuckDB's
    * own median() interpolates on even counts and would NOT hash-match;
    * the oracle therefore replays the same list_sort selection).
    *
    * Scale: the fact collapses to (type, day) first; the window then
    * carries a ≤7-element array per row over the tiny daily series —
    * constant state per row, bounded by the frame, not the data.
    */
  val eventsRollingMedian = QueryDef(
    "events_rolling_median",
    (spark, dir) => {
      val daily = load(spark, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          cents(col("value")).as("v"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("v")).as("day_cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      daily
        .withColumn("arr", sort_array(collect_list(col("day_cents")).over(w)))
        .select(col("event_type"), col("day"), col("day_cents"),
          element_at(col("arr"), ((size(col("arr")) + 1) / 2)
            .cast("int")).as("median7_cents"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS day_cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
      rolled AS (
        SELECT event_type, day, day_cents,
               list_sort(list(day_cents) OVER (PARTITION BY event_type
                 ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
                 AS arr
        FROM daily)
      SELECT event_type, day, day_cents,
             arr[CAST((len(arr) + 1) // 2 AS INT)] AS median7_cents
      FROM rolled
      ORDER BY event_type, day"""),
    notes = "rolling nearest-rank median over the daily series; exact integer, no interpolation")

  /** Autocorrelation of the daily event-count series at lags 1/2/3/7 — the
    * seasonality probe run before picking a forecast model (lag-7 high =
    * weekly cycle; lag-1 high = momentum). Exact integer Pearson sums: the
    * fact collapses to the O(days) daily series first, lead() pairs each day
    * with its lag-L successor, and per lag the query emits the six BIGINT
    * sums (n, Σx, Σy, Σxy, Σx², Σy²) plus the correlation in basis points
    * computed by ONE identical IEEE expression on both sides — exact longs
    * in, deterministic double out, so the hash compare holds.
    *
    * The global lead() window runs on the aggregated ~O(days) series (the
    * same post-collapse single-partition shape as events_holt/ema — fine at
    * any SF because days, not rows, bound it). Overflow bound: n·Σx² ≤
    * days²·max_cnt²; at 150 days this stays in BIGINT up to ~6e7 events/day
    * (sf0.1 is ~7e3/day) — beyond that, move the sums to DECIMAL(38,0) as
    * documented for agg_linreg.
    */
  val eventsAcf = QueryDef(
    "events_acf",
    (spark, dir) => {
      val daily = load(spark, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("day"))
      val pairs = daily
        .select(col("cnt"),
          lead(col("cnt"), 1).over(w).as("y1"),
          lead(col("cnt"), 2).over(w).as("y2"),
          lead(col("cnt"), 3).over(w).as("y3"),
          lead(col("cnt"), 7).over(w).as("y7"))
        .selectExpr("cnt",
          "stack(4, 1L, y1, 2L, y2, 3L, y3, 7L, y7) AS (lag, y)")
        .filter(col("y").isNotNull)
      pairs.groupBy(col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("cnt")).as("sx"), sum(col("y")).as("sy"),
          sum(col("cnt") * col("y")).as("sxy"),
          sum(col("cnt") * col("cnt")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        // zero-variance series (constant daily counts over a lag pairing)
        // → 0/0 = NaN → ANSI cast-to-long throws; emit NULL instead, the
        // same degenerate-series policy as events_zscore's rad guard
        .withColumn("acf_bp", when(
          col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("n") * col("syy") - col("sy") * col("sy") > 0,
          floor(
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
               sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
              * 10000 + 0.5).cast("long")))
        .orderBy(col("lag"))
    },
    Some("""
      WITH daily AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               COUNT(*) AS cnt
        FROM events GROUP BY 1),
      led AS (
        SELECT cnt,
               LEAD(cnt, 1) OVER w AS y1, LEAD(cnt, 2) OVER w AS y2,
               LEAD(cnt, 3) OVER w AS y3, LEAD(cnt, 7) OVER w AS y7
        FROM daily WINDOW w AS (ORDER BY day)),
      pairs AS (
        SELECT CAST(1 AS BIGINT) AS lag, cnt, y1 AS y FROM led WHERE y1 IS NOT NULL
        UNION ALL
        SELECT CAST(2 AS BIGINT), cnt, y2 FROM led WHERE y2 IS NOT NULL
        UNION ALL
        SELECT CAST(3 AS BIGINT), cnt, y3 FROM led WHERE y3 IS NOT NULL
        UNION ALL
        SELECT CAST(7 AS BIGINT), cnt, y7 FROM led WHERE y7 IS NOT NULL),
      sums AS (
        SELECT lag, COUNT(*) AS n,
               CAST(SUM(cnt) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(cnt * y) AS BIGINT) AS sxy,
               CAST(SUM(cnt * cnt) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs GROUP BY lag)
      SELECT lag, n, sx, sy, sxy, sxx, syy,
             CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
               THEN CAST(floor(
                 (CAST(n * sxy - sx * sy AS DOUBLE) /
                   (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                    sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
                 * 10000 + 0.5) AS BIGINT)
               ELSE NULL END AS acf_bp
      FROM sums
      ORDER BY lag"""),
    notes = "integer-exact ACF sums at lags 1/2/3/7; one IEEE correlation expression both sides")

  /** RECURSIVE CTE (Spark 4 `WITH RECURSIVE`) running a TRUE integer
    * recurrence along each user's event chain:
    * `s_k = (s_{k−1} div 2) + cents_k` — the exact decayed-engagement
    * score. This is the recurrence [[eventsEma]] deliberately avoids: its
    * closed-form dyadic window truncates at 8 terms because the floor
    * inside every step makes the exact value genuinely SEQUENTIAL — no
    * window function expresses it, only recursion (or a stateful stream).
    * Here the engine's own recursive-CTE operator runs it: Spark plans a
    * UnionLoop whose k-th iteration joins the ≤|users| live chain heads
    * against the rn-indexed event table — the frontier-join shape of the
    * manual graph loops, but driven by the SQL surface a warehouse user
    * writes. Spark 4 recursion is UNION ALL-only (dedup UNION unsupported)
    * with a default 100-level limit.
    *
    * Two measured design decisions:
    *  - each level costs a FIXED ~180 ms (job scheduling + frontier join;
    *    linear in levels, independent of data size — so at production
    *    scale it amortizes, but locally level count is the whole bill:
    *    64 levels ran 11.8 s warm, 16 run 2.4 s);
    *  - the recursion therefore runs over each user's LAST 16 events,
    *    which for THIS recurrence loses almost nothing: contributions
    *    halve every step, so the full-history score differs from the
    *    last-16 score by at most 1 cent (s_max/2^16 < 1 plus a floor
    *    carry). The oracle computes the same last-16 definition, so
    *    cross-engine exactness is unaffected by the truncation.
    * Non-negative `value` makes `div 2` exact under either floor or trunc
    * `//` semantics (measured: both engines truncate); the DuckDB oracle
    * runs the same recursion natively.
    */
  val eventsDecayRcte = QueryDef(
    "events_decay_rcte",
    (spark, dir) => {
      // The recursion-row-limit raise is scoped to a CHILD session
      // (newSession(): shared SparkContext + cached data, isolated
      // conf/catalog). Raising it on the caller's session would disable
      // Spark's runaway-recursion guard for every LATER query in a shared
      // Bench/Verify session, and set-and-restore can't work because
      // execution is lazy — the restore would land before the plan runs.
      // Builder-time confs (shuffle partitions, timezone) live in the
      // shared SparkConf, so the child inherits them. The child is CACHED
      // per parent: building a SessionState costs ~0.5 s (measured A/B at
      // sf0.1: 2.45 → 3.0 s min with a fresh session per call), so repeat
      // invocations reuse one dedicated recursion session.
      val sess = recursionSession(spark)
      // Materialize the rn-indexed chain table ONCE before the recursion:
      // the recursive plan re-evaluates its join side EVERY level, so an
      // inline windowed CTE would re-sort the whole fact once per level
      // (measured at sf0.1: 31 s warm inline vs 12 s materialized at the
      // same depth — the same reason the iterative graph loops checkpoint
      // their adjacency). Pre-partitioned on the join key so each level
      // shuffles only the shrinking chain-head frontier. rn re-bases each
      // user's LAST 16 events to 1..16 (greatest() keeps short chains
      // seeded at rn = 1).
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wAll = Window.partitionBy(col("user_id"))
      load(sess, dir, "events")
        .select(col("user_id"), row_number().over(w).as("rn0"),
          count(lit(1)).over(wAll).as("cnt"),
          cents(col("value")).as("cents"))
        .select(col("user_id"),
          (col("rn0") - greatest(col("cnt") - 16, lit(0L))).as("rn"),
          col("cents"))
        .filter(col("rn") >= 1)
        .repartition(col("user_id"))
        .localCheckpoint()
        .createOrReplaceTempView("rcte_chain")
      sess.sql("""
        WITH RECURSIVE
        decay AS (
          SELECT user_id, rn, cents AS s FROM rcte_chain WHERE rn = 1
          UNION ALL
          SELECT c.user_id, c.rn, (d.s DIV 2) + c.cents AS s
          FROM decay d JOIN rcte_chain c
            ON c.user_id = d.user_id AND c.rn = d.rn + 1)
        SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n_steps,
               MAX(s) AS max_decay_cents,
               MAX(STRUCT(rn, s)).s AS last_decay_cents
        FROM decay
        GROUP BY user_id
        ORDER BY user_id""")
    },
    Some("""
      WITH RECURSIVE
      base AS (
        SELECT user_id,
               -- epoch_us, not raw ts: an ns-preserving DuckDB would
               -- otherwise rank same-microsecond events by their ns
               -- residue while Spark ranks the truncated values, and the
               -- SEQUENTIAL decay fold amplifies any rank swap
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rn0,
               COUNT(*) OVER (PARTITION BY user_id) AS cnt,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
      chain AS (
        SELECT user_id, rn0 - GREATEST(cnt - 16, 0) AS rn, cents
        FROM base WHERE rn0 - GREATEST(cnt - 16, 0) >= 1),
      decay AS (
        SELECT user_id, rn, cents AS s FROM chain WHERE rn = 1
        UNION ALL
        SELECT c.user_id, c.rn, (d.s // 2) + c.cents AS s
        FROM decay d JOIN chain c
          ON c.user_id = d.user_id AND c.rn = d.rn + 1)
      SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n_steps,
             CAST(MAX(s) AS BIGINT) AS max_decay_cents,
             CAST(max_by(s, rn) AS BIGINT) AS last_decay_cents
      FROM decay
      GROUP BY user_id
      ORDER BY user_id"""),
    notes = "Spark 4 recursive CTE: exact sequential decay recurrence over each user's last 16 events, UnionLoop frontier join per level")

  val all: Seq[QueryDef] = Seq(eventsFunnel, eventsRetention, eventsCalendar,
    eventsGapfill, cdcDiff, cdcMergeApply, eventsZscore, eventsAnomalyMad,
    eventsSequencePattern, eventsPaths, eventsMarkov, eventsPercentiles,
    eventsAttributionLinear, eventsAbTest, windowSlidingDistinct, eventsRfm,
    eventsInterpolate, eventsCusum, eventsForecast, eventsIslands,
    eventsCohortLtv, eventsFunnelWindow, eventsEma, eventsSurvival,
    eventsHolt, eventsRollingMedian, eventsAcf, eventsDecayRcte)
}
