package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics (batch form of the streaming surface the reference
 * ingests via its Flink/DeltaStreamer pipelines — see SURVEY.md §1). The
 * streaming variants live in graft.streaming; these batch twins are what
 * the DuckDB oracle can check.
 */
object EventQueries {
  import AnalyticsQueries.Q

  /** Daily event rollup: count + value by day and type. */
  def qEventsDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      // value is 2-decimal money: integer-cents sum is order-independent
      .agg(count(lit(1)).as("n_events"), Exact.rnd(Exact.sumMoney(col("value")), 2).as("total_value"))
      .orderBy(col("day"), col("event_type"))

  /** Rank each user's events by recency; keep the latest 3. */
  def qEventsUserRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("event_type"), col("rn"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** Sessionization: a >30-minute gap starts a new session. Pure window
    * composition (lag → gap flag → cumulative sum), no stateful shuffle
    * beyond the single partitionBy(user) exchange. */
  def qEventsSessions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             timestamp_diff("MICROSECOND", col("prev_ts"), col("ts")) > 1800000000L, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** As-of join: each event matched to the user's most recent order at or
    * before the event time.
    *
    * CORPUS-LINEAR plan: union events+orders, sort per user by time, and
    * carry the latest order forward with `last(..., ignoreNulls)` over a
    * rows-preceding frame — never materializing an (event × earlier-order)
    * pair. The composed join+rank shape is correct but multiplies rows by
    * the per-user order count before the top-1 filter; for a power user
    * with 10⁴ orders that intermediate is 10⁴× events, degrading
    * super-linearly on skew. This shape is one shuffle on user and one
    * sort, independent of per-user order counts.
    *
    * Within one timestamp, orders sort BEFORE events (kind 0 < 1) so an
    * order dated exactly at the event time matches (`<=`), and equal-date
    * orders sort by key ascending so the carried row is the max-key one —
    * bit-identical to the reference top-1 tie-break (date DESC, key DESC).
    */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(
      col("user_id").as("u"), col("ts").as("t"), lit(1).as("kind"),
      col("event_id"))
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("u"), col("o_orderdate").cast("timestamp").as("t"),
      lit(0).as("kind"), col("o_orderkey").as("ok"), col("o_totalprice").as("op"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t"), col("kind"), col("ok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o, allowMissingColumns = true)
      // one atomic carry: both columns always come from the SAME order row
      // (a struct of nulls is non-null, so gate it on kind)
      .withColumn("last_o", last(when(col("kind") === 0,
        struct(col("ok"), col("op"))), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("u").as("user_id"),
        col("last_o.ok").as("o_orderkey"),
        when(col("last_o.op").isNotNull, Exact.rnd(col("last_o.op"), 2)).as("last_order_price"))
      .orderBy(col("event_id"))
  }

  val all: Map[String, Q] = Map(
    "q_events_daily" -> (qEventsDaily _),
    "q_events_user_rank" -> (qEventsUserRank _),
    "q_events_sessions" -> (qEventsSessions _),
    "q_asof_join" -> (qAsofJoin _)
  )

  val oracles: Map[String, String] = Map(
    "q_events_daily" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |  count(*) AS n_events, ${Exact.rndSql(Exact.sumMoneySql("value"), 2)} AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,
    "q_events_user_rank" ->
      """SELECT user_id, event_id, event_type, rn FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn <= 3
        |ORDER BY user_id, rn""".stripMargin,
    "q_events_sessions" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |           OR date_diff('microseconds', prev_ts, ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT user_id, ts,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events))
        |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id, user_id, o_orderkey, last_order_price FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    CASE WHEN o.o_totalprice IS NOT NULL
        |         THEN floor((o.o_totalprice) * 100 + 0.5) / 100 END AS last_order_price,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin
  )
}
