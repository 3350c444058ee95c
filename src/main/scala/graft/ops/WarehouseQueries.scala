package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.Tables.{cents, load}

/** Warehouse-operations shapes: declarative data-quality expectations (the
  * dbt-test / constraint-check pattern) and SCD2 snapshot construction from
  * a change log — the two jobs that bracket every warehouse load.
  */
object WarehouseQueries {

  /** Data-quality expectation suite over the star schema, one row per check:
    * null-rate, referential integrity, domain ranges, and set membership.
    * Each check is an independent aggregate (most are metadata-cheap scans
    * with pushed filters); the union is a tiny constant-row result however
    * large the input — the shape of a post-load quality gate at any scale.
    * The RI check is a left-anti join, not a NOT IN subquery: NOT IN's
    * null-semantics trap aside, anti join is the shape that stays a hash
    * join at 100 TB.
    */
  val qualityExpectations = QueryDef(
    "quality_expectations",
    (spark, dir) => {
      val li = load(spark, dir, "lineitem")
      val ord = load(spark, dir, "orders")
      def check(name: String, violations: org.apache.spark.sql.DataFrame) =
        violations.agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("check_name"), col("n_violations"))
      check("lineitem_discount_range",
          li.filter(col("l_discount") < 0 || col("l_discount") > 1))
        .unionAll(check("lineitem_orphan_orderkey",
          li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")))
        .unionAll(check("lineitem_quantity_positive",
          li.filter(col("l_quantity") <= 0)))
        .unionAll(check("lineitem_shipdate_null",
          li.filter(col("l_shipdate").isNull)))
        .unionAll(check("orders_priority_domain",
          ord.filter(!col("o_orderpriority").isin(
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))))
        .unionAll(check("orders_totalprice_positive",
          ord.filter(col("o_totalprice") <= 0)))
        .orderBy(col("check_name"))
    },
    Some("""
      SELECT 'lineitem_discount_range' AS check_name,
             (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1) AS n_violations
      UNION ALL
      SELECT 'lineitem_orphan_orderkey',
             (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
              ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
      UNION ALL
      SELECT 'lineitem_quantity_positive',
             (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
      UNION ALL
      SELECT 'lineitem_shipdate_null',
             (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL)
      UNION ALL
      SELECT 'orders_priority_domain',
             (SELECT COUNT(*) FROM orders WHERE o_orderpriority NOT IN
              ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'))
      UNION ALL
      SELECT 'orders_totalprice_positive',
             (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
      ORDER BY check_name"""))

  /** SCD2 snapshot from a change log: each user's 'view' events are attribute
    * changes; every change opens a version effective [ts, next change ts).
    * One window pass per user (row_number for the version, lead for the
    * close timestamp) — the standard slowly-changing-dimension build, with
    * the open version carrying a NULL valid_to. Event-id tiebreak makes
    * same-millisecond changes deterministic.
    */
  val scd2Snapshot = QueryDef(
    "scd2_snapshot",
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      load(spark, dir, "events")
        .filter(col("event_type") === "view" && col("user_id") % 20 === 0)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("version_no", row_number().over(w))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("version_no"),
          col("ts").as("valid_from"), col("valid_to"),
          (col("valid_to").isNull).cast("int").as("is_current"),
          cents(col("value")).as("value_cents"))
        .orderBy(col("user_id"), col("version_no"))
    },
    Some("""
      -- version order and emitted validity bounds on epoch_us, not raw ts:
      -- an ns-preserving DuckDB would rank same-us events by ns residue and
      -- emit ns-residue valid_from/valid_to Spark's us events cannot match
      WITH changes AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id, value
        FROM events
        WHERE event_type = 'view' AND user_id % 20 = 0)
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS version_no,
             make_timestamp(tus) AS valid_from,
             make_timestamp(LEAD(tus, 1) OVER (PARTITION BY user_id ORDER BY tus, event_id)) AS valid_to,
             CAST(LEAD(tus, 1) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL AS INTEGER) AS is_current,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
      FROM changes
      ORDER BY user_id, version_no"""))

  /** Point-in-time (AS OF) lookup against the [[scd2Snapshot]] dimension:
    * the version of each user valid at an anchor instant — `valid_from ≤ T`
    * and `(valid_to > T or open)`. THE temporal-table query (what `FOR
    * SYSTEM_TIME AS OF` compiles to), and the reason SCD2 carries interval
    * columns at all. Comparisons are in epoch-ms on both engines (µs-vs-ns
    * parquet precision would otherwise make boundary rows disagree).
    *
    * Scale shape: the snapshot build is one window pass per user; the AS OF
    * filter is a residual predicate on that output — no join. A fact-table
    * AS OF enrichment against this dimension is `join_range_interval` /
    * `join_asof` (already covered); this pins the dimension-side semantics.
    */
  val scd2Asof = QueryDef(
    "scd2_asof",
    (spark, dir) => {
      val asOfMs = 1705320000000L // 2024-01-15T12:00:00Z, mid-corpus
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      load(spark, dir, "events")
        .filter(col("event_type") === "view" && col("user_id") % 20 === 0)
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          col("event_id"), col("value"))
        .withColumn("version_no", row_number().over(w))
        .withColumn("valid_to_ms", lead(col("ms"), 1).over(w))
        .filter(col("ms") <= asOfMs &&
          (col("valid_to_ms").isNull || col("valid_to_ms") > asOfMs))
        .select(col("user_id"), col("version_no").cast("long").as("version_no"),
          col("ms").as("valid_from_ms"), col("valid_to_ms"),
          cents(col("value")).as("value_cents"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH changes AS (
        SELECT user_id, epoch_ms(ts) AS ms, event_id, value
        FROM events
        WHERE event_type = 'view' AND user_id % 20 = 0),
      versions AS (
        SELECT user_id, ms, event_id, value,
               ROW_NUMBER() OVER w AS version_no,
               LEAD(ms, 1) OVER w AS valid_to_ms
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
      SELECT user_id, CAST(version_no AS BIGINT) AS version_no,
             ms AS valid_from_ms, valid_to_ms,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
      FROM versions
      WHERE ms <= 1705320000000
        AND (valid_to_ms IS NULL OR valid_to_ms > 1705320000000)
      ORDER BY user_id"""),
    notes = "temporal AS OF point lookup over the SCD2 dimension")

  /** Incremental materialized-view maintenance — the delta-merge pattern a
    * 100 TB pipeline runs instead of recomputing its aggregate tables: the
    * MV state (per (event_type, day) count/sum/max from the historical
    * partition, `event_id % 7 != 0`) is merged with the new batch's
    * partial aggregate (`% 7 == 0`) via ONE full-outer join on the group
    * keys — count and sum add, max takes greatest, absent sides coalesce
    * to the other. The oracle aggregates the WHOLE table directly, pinning
    * the core MV-maintenance theorem: for distributive aggregates,
    * merge(agg(A), agg(B)) == agg(A ∪ B), exactly, at any split.
    *
    * Scale shape: in production the state side is a stored O(groups) table
    * (never rescanned — here it is computed in-query only because the gate
    * has no persisted state); each refresh touches |delta| rows plus an
    * O(groups) merge join, so refresh cost is independent of the base
    * table's size. AVG and other algebraic aggregates ride on (count, sum);
    * holistic ones (exact median) are the documented exception — that is
    * why the MV carries the sufficient statistics, not the derived values.
    */
  val mvIncrementalAgg = QueryDef(
    "mv_incremental_agg",
    (spark, dir) => {
      val ev = load(spark, dir, "events")
        .select(col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          cents(col("value")).as("vc"))
      def aggOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n"), sum(col("vc")).as("s"),
            max(col("vc")).as("mx"))
      val state = aggOf(ev.filter(col("event_id") % 7 =!= 0))
      val delta = aggOf(ev.filter(col("event_id") % 7 === 0))
      state.as("a").join(delta.as("b"), Seq("event_type", "day"), "full_outer")
        .select(col("event_type"), col("day"),
          (coalesce(col("a.n"), lit(0L)) + coalesce(col("b.n"), lit(0L)))
            .as("n_events"),
          (coalesce(col("a.s"), lit(0L)) + coalesce(col("b.s"), lit(0L)))
            .as("value_cents"),
          greatest(coalesce(col("a.mx"), col("b.mx")),
            coalesce(col("b.mx"), col("a.mx"))).as("max_cents"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
             MAX(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS max_cents
      FROM events
      GROUP BY event_type, day
      ORDER BY event_type, day"""),
    notes = "delta-merge MV refresh == full recompute, for distributive aggregates")

  /** Merkle-style replica reconciliation — how two 100 TB copies of a table
    * are compared WITHOUT moving row data: each side reduces to an
    * order-free per-bucket digest (row count + sum of per-row polynomial
    * hashes mod P), the O(buckets) digest tables are joined, and only
    * buckets whose digests differ are reported — row-level diffing
    * (`cdc_diff`) then runs on those buckets alone. The "replica" here is
    * the events table with two deterministic faults injected (rows dropped
    * where event_id % 997 = 0, values perturbed where % 773 = 0), so the
    * query must localize exactly those buckets.
    *
    * The row hash is the repo's universal-hash recipe (31-fold over
    * event_id, epoch-ms, cents, mod P = 2³¹−1) — every step stays in
    * checked BIGINT range and is identical in DuckDB, and the bucket
    * digest is a SUM of bounded terms, so it is partial-aggregatable
    * (map-side combine) and independent of row order — the property that
    * makes the digest exchangeable instead of the data.
    */
  val reconcileChecksum = QueryDef(
    "reconcile_checksum",
    (spark, dir) => {
      val P = 2147483647L
      val ev = load(spark, dir, "events")
        .select(col("event_id"), unix_millis(col("ts")).as("ms"),
          cents(col("value")).as("vc"))
      val rowHash =
        (((col("event_id") % P) * 31 + (col("ms") % P)) % P * 31 +
          (col("vc") % P)) % P
      def digest(df: org.apache.spark.sql.DataFrame) =
        df.groupBy((col("event_id") % 1024).as("bucket"))
          .agg(count(lit(1)).as("n"), sum(rowHash).as("ck"))
      val base = digest(ev)
      val repl = digest(ev
        .filter(col("event_id") % 997 =!= 0)
        .withColumn("vc", when(col("event_id") % 773 === 0, col("vc") + 1)
          .otherwise(col("vc"))))
      base.as("a").join(repl.as("b"), Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("a.n"), lit(0L)).as("n_base"),
          coalesce(col("b.n"), lit(0L)).as("n_replica"),
          coalesce(col("a.ck"), lit(-1L)).as("ck_base"),
          coalesce(col("b.ck"), lit(-1L)).as("ck_replica"))
        .filter(col("n_base") =!= col("n_replica") ||
          col("ck_base") =!= col("ck_replica"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, epoch_ms(ts) AS ms,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        FROM events),
      base AS (
        SELECT event_id % 1024 AS bucket, COUNT(*) AS n,
               CAST(SUM((((event_id % 2147483647) * 31 + (ms % 2147483647))
                 % 2147483647 * 31 + (vc % 2147483647)) % 2147483647) AS BIGINT) AS ck
        FROM ev GROUP BY 1),
      repl AS (
        SELECT event_id % 1024 AS bucket, COUNT(*) AS n,
               CAST(SUM((((event_id % 2147483647) * 31 + (ms % 2147483647))
                 % 2147483647 * 31 +
                 (CASE WHEN event_id % 773 = 0 THEN vc + 1 ELSE vc END
                   % 2147483647)) % 2147483647) AS BIGINT) AS ck
        FROM ev WHERE event_id % 997 <> 0 GROUP BY 1)
      SELECT COALESCE(base.bucket, repl.bucket) AS bucket,
             COALESCE(base.n, 0) AS n_base,
             COALESCE(repl.n, 0) AS n_replica,
             COALESCE(base.ck, -1) AS ck_base,
             COALESCE(repl.ck, -1) AS ck_replica
      FROM base FULL OUTER JOIN repl ON base.bucket = repl.bucket
      WHERE COALESCE(base.n, 0) <> COALESCE(repl.n, 0)
         OR COALESCE(base.ck, -1) <> COALESCE(repl.ck, -1)
      ORDER BY bucket"""),
    notes = "order-free bucket digests localize replica divergence; O(buckets) exchange")

  /** Interval-concurrency sweep — max orders simultaneously in flight
    * (placed, not yet fully shipped) per month, the +1/−1 boundary-point
    * technique behind every "peak concurrent X" dashboard. Two decisions
    * carry the 100 TB posture: (1) boundary points are pre-aggregated per
    * distinct timestamp (net delta), which both collapses the data and
    * removes start/end tie-ordering ambiguity — [start, end) semantics fall
    * out of arithmetic, not a sort tie-break; (2) the running sum is NOT
    * one global ORDER BY ts window (the single-partition sort trap) but the
    * two-phase split: per-month partitioned prefix sums plus a cumulative
    * month-offset computed over the ~tiny month table, then added back.
    * Identical result, and the big window is partitioned by month.
    */
  val intervalSweep = QueryDef(
    "interval_sweep",
    (spark, dir) => {
      val ends = load(spark, dir, "lineitem")
        .groupBy(col("l_orderkey").as("ok"))
        .agg(max(col("l_shipdate")).as("e"))
      val iv = load(spark, dir, "orders")
        .join(ends, col("o_orderkey") === col("ok"))
        .select(col("o_orderdate").as("s"), col("e"))
      val pts = iv.select(col("s").as("ts"), lit(1).as("d"))
        .unionAll(iv.select(col("e").as("ts"), lit(-1).as("d")))
      val byTs = pts.groupBy(col("ts"))
        .agg(sum(col("d")).as("net"),
          sum(when(col("d") > 0, 1L).otherwise(0L)).as("starts"))
        .withColumn("month", date_format(col("ts"), "yyyy-MM"))
      val monthNet = byTs.groupBy(col("month"))
        .agg(sum(col("net")).as("mnet"))
        .withColumn("offset",
          coalesce(sum(col("mnet")).over(Window.orderBy(col("month"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("month").as("m"), col("offset"))
      val withinMonth = byTs.withColumn("run",
        sum(col("net")).over(Window.partitionBy(col("month"))
          .orderBy(col("ts"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      withinMonth.join(broadcast(monthNet), col("month") === col("m"))
        .groupBy(col("month"))
        .agg(max(col("offset") + col("run")).as("max_inflight"),
          sum(col("starts")).as("n_started"))
        .orderBy(col("month"))
    },
    Some("""
      WITH ends AS (
        SELECT l_orderkey AS ok, MAX(l_shipdate) AS e
        FROM lineitem GROUP BY 1),
      iv AS (
        SELECT o_orderdate AS s, e
        FROM orders JOIN ends ON o_orderkey = ok),
      pts AS (
        SELECT s AS ts, 1 AS d FROM iv
        UNION ALL SELECT e, -1 FROM iv),
      byts AS (
        SELECT ts, SUM(d) AS net,
               SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS starts
        FROM pts GROUP BY ts),
      run AS (
        SELECT ts, starts, SUM(net) OVER (ORDER BY ts) AS cur FROM byts)
      SELECT strftime(ts, '%Y-%m') AS month,
             CAST(MAX(cur) AS BIGINT) AS max_inflight,
             CAST(SUM(starts) AS BIGINT) AS n_started
      FROM run GROUP BY 1 ORDER BY 1"""),
    notes = "sweep-line peak concurrency; two-phase partitioned prefix sum, no global sort")

  /** One-shuffle multi-column profiler (the ANALYZE TABLE / dbt-docs shape):
    * null count, exact distinct count, and Gini impurity per column, for k
    * columns in ONE aggregation pass — `stack` unpivots each row into
    * (col_name, value) pairs so all columns share a single
    * groupBy(col_name, value) shuffle instead of k separate scans+shuffles;
    * the second-level rollup to per-column stats is |distinct values| rows.
    * Values are profiled as exact strings (ints/dates rendered
    * canonically — no double-to-string formatting divergence), and Gini
    * stays rational: gini_bp = 10⁴·(n²−Σc²) div n², exact in BIGINT up to
    * ~10⁷ non-null rows per column (switch the squares to DECIMAL(38,0)
    * beyond; documented, not wrapped).
    */
  val profileColumns = QueryDef(
    "profile_columns",
    (spark, dir) => {
      val vals = load(spark, dir, "events").selectExpr(
        """stack(4,
             'event_type', event_type,
             'user_id',    cast(user_id as string),
             'day',        date_format(ts, 'yyyy-MM-dd'),
             'props',      props) as (col_name, v)""")
      val cnt = vals.filter(col("v").isNotNull)
        .groupBy(col("col_name"), col("v"))
        .agg(count(lit(1)).as("c"))
      val nulls = vals.groupBy(col("col_name"))
        .agg(sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"))
      cnt.groupBy(col("col_name"))
        .agg(sum(col("c")).as("n_nonnull"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") * col("c")).as("sum_c2"))
        .join(broadcast(nulls), Seq("col_name"))
        .select(col("col_name"), col("n_nonnull"), col("n_null"),
          col("n_distinct"),
          expr("(10000L * (n_nonnull * n_nonnull - sum_c2)) div (n_nonnull * n_nonnull)")
            .as("gini_bp"))
        .orderBy(col("col_name"))
    },
    Some("""
      WITH vals AS (
        SELECT 'event_type' AS col_name, event_type AS v FROM events
        UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
        UNION ALL SELECT 'day', strftime(ts, '%Y-%m-%d') FROM events
        UNION ALL SELECT 'props', props FROM events),
      cnt AS (
        SELECT col_name, v, COUNT(*) AS c FROM vals
        WHERE v IS NOT NULL GROUP BY 1, 2),
      nulls AS (
        SELECT col_name, SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_null
        FROM vals GROUP BY 1)
      SELECT cnt.col_name,
             CAST(SUM(c) AS BIGINT) AS n_nonnull,
             CAST(MAX(n_null) AS BIGINT) AS n_null,
             COUNT(*) AS n_distinct,
             CAST((10000 * (SUM(c) * SUM(c) - SUM(c * c)))
               // (SUM(c) * SUM(c)) AS BIGINT) AS gini_bp
      FROM cnt JOIN nulls ON cnt.col_name = nulls.col_name
      GROUP BY 1 ORDER BY 1"""),
    notes = "k-column profile in one shuffle via stack unpivot; exact distinct + rational Gini")

  /** Distribution-drift monitor (the data-quality check that catches a
    * schema-valid but statistically broken load): event-type composition of
    * the first half of the time range vs the second, scored per bin as the
    * SHARE DELTA in basis points — |10⁴aᵢ div n_a − 10⁴bᵢ div n_b| — i.e.
    * the per-bin contribution to total-variation distance, exact integers
    * throughout (no logs/floats like PSI or KL, and no big squares: every
    * intermediate is ≤ 10⁴·count, overflow-free at ANY row count — the
    * chi-square cross-product form dᵢ=aᵢ·n_b−bᵢ·n_a overflows BIGINT when
    * squared past ~50k rows per half, so it was rejected by design). The
    * split point is the midpoint timestamp from a 1-row aggregate computed
    * with the same `div` on both sides, so the check self-calibrates.
    */
  val qualityDrift = QueryDef(
    "quality_drift",
    (spark, dir) => {
      val ev = load(spark, dir, "events")
        .select(col("event_type"), unix_millis(col("ts")).as("ms"))
      val mid = ev.agg(min(col("ms")).as("mn"), max(col("ms")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid_ms"))
      val binned = ev.crossJoin(broadcast(mid))
        .groupBy(col("event_type"))
        .agg(sum(when(col("ms") < col("mid_ms"), 1L).otherwise(0L)).as("a"),
          sum(when(col("ms") >= col("mid_ms"), 1L).otherwise(0L)).as("b"))
      val totals = binned.agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"))
      binned.crossJoin(broadcast(totals))
        .select(col("event_type"), col("a"), col("b"),
          abs(expr("(10000L * a) div n_a") - expr("(10000L * b) div n_b"))
            .as("drift_bp"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH ev AS (
        SELECT event_type, epoch_ms(ts) AS ms FROM events),
      mid AS (
        SELECT (MIN(ms) + MAX(ms)) // 2 AS mid_ms FROM ev),
      binned AS (
        SELECT event_type,
               SUM(CASE WHEN ms < mid_ms THEN 1 ELSE 0 END) AS a,
               SUM(CASE WHEN ms >= mid_ms THEN 1 ELSE 0 END) AS b
        FROM ev CROSS JOIN mid GROUP BY 1),
      totals AS (
        SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b
        FROM binned)
      SELECT event_type, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
             CAST(abs((10000 * a) // n_a - (10000 * b) // n_b) AS BIGINT)
               AS drift_bp
      FROM binned CROSS JOIN totals
      ORDER BY event_type"""),
    notes = "total-variation share-delta drift in bp between time halves; overflow-free by design")

  /** BITEMPORAL lookup: valid time × transaction time, the full temporal-
    * table model ([[scd2Asof]] covers only the valid axis). Each change
    * carries its VALID-from instant (retro-dated `event_id % 5` days before
    * its record time — late-arriving corrections, the reason the second
    * axis exists) and its TRANSACTION instant (`ts`, when the warehouse
    * learned of it). The query answers "what did we believe at transaction
    * time T about the state effective at V?" for the same V under two
    * cutoffs T1 < T2 — rows where the two beliefs differ are exactly the
    * retroactive corrections that arrived in (T1, T2], i.e. history being
    * rewritten, which a valid-time-only SCD2 cannot even represent.
    *
    * Scale shape: each belief is one txn-cutoff filter (pushed to the
    * scan) + one window pass per user + a residual AS OF predicate — no
    * self-join of the change log; the two beliefs (≤1 row per user each)
    * meet in a full-outer join on the dimension key (null side = the user
    * whose first version itself arrived retroactively).
    */
  val scd2Bitemporal = QueryDef(
    "scd2_bitemporal",
    (spark, dir) => {
      val validAt = 1705320000000L // V: 2024-01-15T12:00Z, mid-corpus
      val tx1 = 1705536000000L // T1: 2024-01-18T00:00Z
      val tx2 = 1706659200000L // T2: 2024-01-31T00:00Z (all knowledge)
      val base = load(spark, dir, "events")
        .filter(col("event_type") === "view" && col("user_id") % 20 === 0)
        .select(col("user_id"), unix_millis(col("ts")).as("txn_ms"),
          col("event_id"), col("value"))
        .withColumn("eff_ms",
          col("txn_ms") - (col("event_id") % 5) * 86400000L)
      def belief(txCut: Long) = {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("eff_ms"), col("txn_ms"), col("event_id"))
        base.filter(col("txn_ms") <= txCut)
          .withColumn("version_no", row_number().over(w).cast("long"))
          .withColumn("next_eff", lead(col("eff_ms"), 1).over(w))
          .filter(col("eff_ms") <= validAt &&
            (col("next_eff").isNull || col("next_eff") > validAt))
          .select(col("user_id"), col("version_no"),
            cents(col("value")).as("value_cents"))
      }
      belief(tx1)
        .withColumnRenamed("version_no", "t1_version")
        .withColumnRenamed("value_cents", "t1_value_cents")
        .join(belief(tx2)
          .withColumnRenamed("version_no", "t2_version")
          .withColumnRenamed("value_cents", "t2_value_cents"),
          Seq("user_id"), "full_outer")
        .orderBy(col("user_id"))
    },
    Some("""
      WITH changes AS (
        SELECT user_id, epoch_ms(ts) AS txn_ms, event_id, value,
               epoch_ms(ts) - (event_id % 5) * 86400000 AS eff_ms
        FROM events
        WHERE event_type = 'view' AND user_id % 20 = 0),
      b1 AS (
        SELECT user_id, version_no AS t1_version,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS t1_value_cents
        FROM (
          SELECT user_id, value, eff_ms,
                 CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_no,
                 LEAD(eff_ms, 1) OVER w AS next_eff
          FROM changes WHERE txn_ms <= 1705536000000
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY eff_ms, txn_ms, event_id))
        WHERE eff_ms <= 1705320000000
          AND (next_eff IS NULL OR next_eff > 1705320000000)),
      b2 AS (
        SELECT user_id, version_no AS t2_version,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS t2_value_cents
        FROM (
          SELECT user_id, value, eff_ms,
                 CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_no,
                 LEAD(eff_ms, 1) OVER w AS next_eff
          FROM changes WHERE txn_ms <= 1706659200000
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY eff_ms, txn_ms, event_id))
        WHERE eff_ms <= 1705320000000
          AND (next_eff IS NULL OR next_eff > 1705320000000))
      SELECT COALESCE(b1.user_id, b2.user_id) AS user_id,
             t1_version, t1_value_cents, t2_version, t2_value_cents
      FROM b1 FULL OUTER JOIN b2 ON b1.user_id = b2.user_id
      ORDER BY user_id"""),
    notes = "valid-time x transaction-time bitemporal AS OF; differing rows = retroactive corrections in (T1, T2]")

  /** Incremental maintenance of a JOIN view — the two-sided delta rule
    * Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB that an IVM engine applies when
    * BOTH sides of a 100 TB join view receive inserts. The view here is the
    * per-(mktsegment, orderstatus) order count/revenue over orders⋈customer;
    * orders rows with o_orderkey % 13 == 0 and customers with
    * c_custkey % 11 == 0 play the insert batches. The query materializes the
    * old-state partial aggregate plus the three delta partial aggregates and
    * merges them by summing — the oracle aggregates the full join directly,
    * pinning the delta-join theorem exactly (insert-only deltas; deletes
    * would subtract with the same shapes).
    *
    * Scale shape: in production the A_old⋈B_old term IS the stored MV (never
    * recomputed — it is in-query here only because the gate has no persisted
    * state); each refresh costs the three delta joins, every one bounded by
    * |Δ| times join fan-out, independent of |A| and |B|. The two ΔA terms
    * reuse one shuffle of ΔA (Spark plans both joins off the same scan), and
    * the final merge moves only O(groups) partial rows.
    */
  val mvIncrementalJoin = QueryDef(
    "mv_incremental_join",
    (spark, dir) => {
      val ord = load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          cents(col("o_totalprice")).as("pc"))
      val cust = load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val ordHist = ord.filter(col("o_orderkey") % 13 =!= 0)
      val ordDelta = ord.filter(col("o_orderkey") % 13 === 0)
      val custHist = cust.filter(col("c_custkey") % 11 =!= 0)
      val custDelta = cust.filter(col("c_custkey") % 11 === 0)
      def partial(o: org.apache.spark.sql.DataFrame,
                  c: org.apache.spark.sql.DataFrame) =
        o.join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("pc")).as("s"))
      partial(ordHist, custHist)
        .unionByName(partial(ordDelta, custHist))
        .unionByName(partial(ordHist, custDelta))
        .unionByName(partial(ordDelta, custDelta))
        .groupBy(col("c_mktsegment"), col("o_orderstatus"))
        .agg(sum(col("n")).as("n_orders"), sum(col("s")).as("total_cents"))
        .orderBy(col("c_mktsegment"), col("o_orderstatus"))
    },
    Some("""
      SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n_orders,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS total_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderstatus
      ORDER BY c_mktsegment, o_orderstatus"""),
    notes = "two-sided delta-join IVM: merged old+delta partials == full recompute")

  val all: Seq[QueryDef] = Seq(qualityExpectations, scd2Snapshot, scd2Asof,
    mvIncrementalAgg, reconcileChecksum, intervalSweep, profileColumns,
    qualityDrift, scd2Bitemporal, mvIncrementalJoin)
}
