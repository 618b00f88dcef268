package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.2 #20): the event stream
  * consumed as an unbounded source with event-time windowing + a
  * watermark. The batch query Relational.eventsWindow computes the
  * identical result — StreamingSpec asserts they agree when the
  * parquet file is replayed through the stream.
  */
object EventStream {

  /** Parquet schema of events with ts as raw nanos (see Tables.events:
    * Spark's reader rejects TIMESTAMP(NANOS), so streams read the long
    * and convert to a microsecond timestamp).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Unbounded read of the events table (file-replay in tests; a real
    * deployment points this at a bucket/queue of arriving files).
    */
  def read(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour event-time windows per event_type with a 1-hour
    * watermark bounding state. Same output shape (and rounding) as
    * the batch Relational.eventsWindow.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), (round(sum(col("value")), 4) + lit(0.0)).as("sum_value"))
      .select(col("window.start").as("w"), col("event_type"), col("cnt"), col("sum_value"))
}
