package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the temporal-alignment primitive a training
  * pipeline needs whenever per-entity facts must be joined "as of" an event
  * time (latest snapshot label, most recent page crawl per url, feature
  * value in effect at example time).
  *
  * Implemented WITHOUT a join node: both sides are unioned with a side
  * marker and the quote value is carried forward by a running
  * `last(..., ignoreNulls)` window over (ts, side, id). This is the
  * scale-correct shape for 10^12 rows — a range/theta join would either
  * cartesian within key or need a custom physical operator; the union form
  * is exactly ONE hash shuffle on the entity key plus a per-partition sort,
  * and Spark's window sort spills gracefully on skewed entities.
  *
  * Tie semantics are pinned and total: a quote AT the probe's timestamp is
  * visible (`quote.ts <= probe.ts` inclusive — quotes sort before probes at
  * equal ts), and among several quotes at the same (user, ts) the highest
  * event_id wins. The DuckDB oracle mirrors the same window algebra, so the
  * compare is bit-exact including ties.
  */
object AsOf {

  /** For each `probeType` event: the most recent `quoteType` event by the
    * same user at or before its timestamp. Probes with no prior quote emit
    * sentinel -1 (not null — null-free output keeps the cross-engine hash
    * compare trivial).
    */
  def asOfJoin(events: DataFrame, probeType: String = "click",
      quoteType: String = "view"): DataFrame = {
    val side = events
      .filter(col("event_type").isin(probeType, quoteType))
      // parquet stores TIMESTAMP_NTZ; session tz is UTC so the cast is
      // value-preserving (and unix_millis requires TIMESTAMP)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("user_id"),
        (col("event_type") === probeType).cast("int").as("is_probe"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    side
      // one select -> one Window node (chained withColumn leaves a Project
      // between two Window nodes that CollapseWindow can't merge, costing a
      // second pass over every partition)
      .select(col("event_id"), col("user_id"), col("ts"), col("is_probe"),
        last(when(col("is_probe") === 0, col("event_id")), ignoreNulls = true)
          .over(w).as("quote_id"),
        last(when(col("is_probe") === 0, col("ts")), ignoreNulls = true)
          .over(w).as("quote_ts"))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(col("quote_id"), lit(-1L)).as("quote_id"),
        coalesce(unix_millis(col("ts")) - unix_millis(col("quote_ts")), lit(-1L))
          .as("lag_ms"))
      .orderBy("event_id")
  }

  /** DuckDB mirror: identical union + IGNORE-NULLS running-last window. */
  def asOfJoinSql(table: String, probeType: String = "click",
      quoteType: String = "view"): String =
    s"""WITH u AS (
       |  SELECT event_id, ts, user_id,
       |    CASE WHEN event_type = '$probeType' THEN 1 ELSE 0 END AS is_probe
       |  FROM $table WHERE event_type IN ('$probeType', '$quoteType')),
       |w AS (
       |  SELECT event_id, user_id, ts, is_probe,
       |    last_value(CASE WHEN is_probe = 0 THEN event_id END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, is_probe, event_id
       |            ROWS UNBOUNDED PRECEDING) AS quote_id,
       |    last_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, is_probe, event_id
       |            ROWS UNBOUNDED PRECEDING) AS quote_ts
       |  FROM u)
       |SELECT event_id, user_id, ts,
       |  COALESCE(quote_id, -1) AS quote_id,
       |  COALESCE(epoch_ms(ts) - epoch_ms(quote_ts), -1) AS lag_ms
       |FROM w WHERE is_probe = 1 ORDER BY event_id""".stripMargin
}
