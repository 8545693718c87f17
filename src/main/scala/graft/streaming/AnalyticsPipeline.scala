package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.Tables.{davg, fround, tsStr}

/** The reference's end-to-end bidirectional cycle (README.md:63-127,
  * CLAUDE.md:105-117), Spark-first:
  *
  *   producer → trades topic → ingest → trades table
  *     → canonical analytics query → analytics topic → ingest
  *     → trade_analytics table → re-query.
  *
  * Mirrors `validation/e2e.sh`'s flow with our FileTopic/IngestJob stand-ins
  * for Redpanda/Iceberg.
  */
object AnalyticsPipeline {

  val tradeSchema: StructType = StructType(Seq(
    StructField("trade_id", StringType), StructField("symbol", StringType),
    StructField("price", DoubleType), StructField("qty", IntegerType),
    StructField("side", StringType), StructField("ts_event", TimestampType),
    StructField("notes", StringType)))

  val analyticsSchema: StructType = StructType(Seq(
    StructField("symbol", StringType), StructField("trade_count", LongType),
    StructField("avg_price", DoubleType), StructField("min_price", DoubleType),
    StructField("max_price", DoubleType), StructField("total_volume", LongType),
    StructField("buy_count", LongType), StructField("sell_count", LongType),
    StructField("first_trade_time", StringType), StructField("last_trade_time", StringType)))

  /** THE canonical query (duckdb/query_and_publish.py:107-122): the 10
    * aggregates per symbol, ordered by volume. Two-phase hash aggregate; the
    * only shuffled payload is 8 groups × 10 numbers. */
  def tradeStats(trades: DataFrame): DataFrame =
    trades.groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("trade_count"),
        fround(davg(col("price")), 2).as("avg_price"),
        round(min(col("price")), 2).as("min_price"),
        round(max(col("price")), 2).as("max_price"),
        sum(col("qty")).cast("long").as("total_volume"),
        count(when(col("side") === "BUY", 1)).as("buy_count"),
        count(when(col("side") === "SELL", 1)).as("sell_count"),
        tsStr(min(col("ts_event"))).as("first_trade_time"),
        tsStr(max(col("ts_event"))).as("last_trade_time"))
      .orderBy(desc("total_volume"))

  /** Continuous form of the analytics stage (the reference's
    * query_and_publish loop, `duckdb/query_and_publish.py`, as a Structured
    * Streaming job): per trigger, recompute the per-symbol stats over the
    * stream's running state and republish the full snapshot — the
    * reference's republish-per-cycle behavior, 8 messages per trigger. */
  def startContinuousAnalytics(
      spark: SparkSession,
      source: graft.streaming.TopicSource,
      sink: graft.streaming.TopicSink,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")) = {
    val parsed = source.readStream(spark)
      .select(from_json(col("value"), tradeSchema).as("data"))
      .select(col("data.*"))
      .filter(col("trade_id").isNotNull && col("symbol").isNotNull)
    tradeStats(parsed)
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.publish(Topics.envelope(batch, "symbol"))
        ()
      }
      .start()
  }

  /** Run the whole cycle synchronously (Trigger.AvailableNow ≈ "catch up to
    * the 10 s snapshot lag, then stop" — the e2e's bounded waits,
    * `validation/e2e.sh:120-121`). Returns the re-queried analytics table. */
  def runCycle(spark: SparkSession, workDir: String, nTrades: Long, seed: Long = 42L): DataFrame = {
    val tradesTopic = FileTopic(s"$workDir/topics/trades")
    val analyticsTopic = FileTopic(s"$workDir/topics/trade_analytics")

    // 1. producer (A1+A2)
    TradeGen.produce(spark, tradesTopic, nTrades, seed)

    // 2. ingest trades topic → table (A3)
    val q1 = IngestJob.start(spark, tradesTopic, s"$workDir/tables/trades",
      tradeSchema, Seq("trade_id", "symbol", "price", "qty", "side", "ts_event"),
      "ts_event", s"$workDir/ckpt/trades", Trigger.AvailableNow())
    q1.awaitTermination()

    // 3. canonical analytics query over the table (B1–B14)
    val analytics = tradeStats(IngestJob.readTable(spark, s"$workDir/tables/trades"))

    // 4. publish analytics keyed by symbol (query_and_publish.py:169-179)
    analyticsTopic.publish(Topics.envelope(analytics, "symbol"))

    // 5. ingest analytics topic → table (the bidirectional hop)
    val q2 = IngestJob.start(spark, analyticsTopic, s"$workDir/tables/trade_analytics",
      analyticsSchema, Seq("symbol", "trade_count", "avg_price", "total_volume"),
      "first_trade_time", s"$workDir/ckpt/trade_analytics", Trigger.AvailableNow())
    q2.awaitTermination()

    // 6. re-query (e2e.sh:158-177)
    IngestJob.readTable(spark, s"$workDir/tables/trade_analytics")
  }
}
