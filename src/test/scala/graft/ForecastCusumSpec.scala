package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases for the day-level CUSUM changepoint, the seasonal-naive
  * backtest, and the weighted-quantile histogram rule — hand-computed tiny
  * inputs, so the integer statistics are pinned independently of the DuckDB
  * oracle (which checks them again at sf0.01).
  */
class ForecastCusumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Write a tiny events-shaped parquet dir and return its path. */
  private def eventsDir(rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val dir = SparkTestSession.tempDir("graft-fc")
    rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "CAST(tss AS TIMESTAMP) AS ts0", "user_id",
        "event_type", "value", "props")
      // match Tables.load("events"): it reads ts as raw ns and rebuilds µs
      .selectExpr("event_id",
        "CAST(unix_micros(ts0) * 1000 AS LONG) AS ts", "user_id",
        "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(day: Int, hr: Int): String =
    f"2024-01-$day%02d $hr%02d:00:00"

  test("events_cusum finds the level-shift day") {
    // one type, 6 days at 1.00/day then jumping to 11.00/day on day 4:
    // daily cents s = [100,100,100,1100,1100,1100], T=3600, D=6
    // S'_k = 6*cum_k - k*3600 -> |S'| = [3000,6000,9000,6000,3000,0]
    // max at k=3 (day 3) — the last pre-shift day.
    val rows = (1 to 6).map { d =>
      val v = if (d <= 3) 1.00 else 11.00
      (d.toLong, ts(d, 10), 1L, "buy", v, "{}")
    }
    val out = ops.EventAnalyticsQueries.eventsCusum.fn(spark, eventsDir(rows))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[java.sql.Date]("cp_day").toString === "2024-01-03")
    assert(r.getAs[Long]("max_abs_s") === 9000L)
  }

  test("events_forecast scores the seasonal-naive lag exactly") {
    // hour 10 on days 1..3 with cents 100, 150, 150:
    //   forecasts: day2<-100 (err 50), day3<-150 (err 0) -> n_fc=2, sae=50
    // hour 11 only on day 2 -> no forecast rows.
    val rows = Seq(
      (1L, ts(1, 10), 1L, "buy", 1.00, "{}"),
      (2L, ts(2, 10), 1L, "buy", 1.50, "{}"),
      (3L, ts(3, 10), 1L, "buy", 1.50, "{}"),
      (4L, ts(2, 11), 1L, "buy", 9.99, "{}"))
    val out = ops.EventAnalyticsQueries.eventsForecast.fn(spark, eventsDir(rows))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_fc") === 2L)
    assert(out.head.getAs[Long]("sae_cents") === 50L)
  }

  test("quantiles_weighted picks the smallest value reaching p% cumulative weight") {
    val dir = SparkTestSession.tempDir("graft-wq")
    // one flag, quantities 1,2,3 with weights (cents) 100,100,200:
    // tw=400; cw: 100,200,400 -> wq25=1 (100*100>=25*400), wq50=2, wq75=3
    Seq((1.0, 1.00, "A"), (2.0, 1.00, "A"), (3.0, 2.00, "A"))
      .toDF("l_quantity", "l_extendedprice", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ops.PipelineQueries.quantilesWeighted.fn(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getAs[Long]("wq25"), r.getAs[Long]("wq50"), r.getAs[Long]("wq75"))
      === ((1L, 2L, 3L)))
  }

  test("text_bpe_step counts pairs weighted by word frequency") {
    val dir = SparkTestSession.tempDir("graft-bpe")
    // "ab ab abc" -> wf: ab->2, abc->1; pairs: (a,b)->3, (b,c)->1
    Seq((1L, "ab ab abc", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ops.TextQueries2.textBpeStep.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a", "b", 3L), ("b", "c", 1L)))
  }
}
