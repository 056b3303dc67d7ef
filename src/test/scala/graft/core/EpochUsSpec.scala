package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tables.epochUs must yield identical exact microseconds for every
  * timestamp flavor the test corpus has shipped: nano-epoch longs (the
  * TIMESTAMP(NANOS) + nanosAsLong era, rebuilt by Tables.events),
  * instant TimestampType, and TIMESTAMP_NTZ (the current corpus). The
  * session timezone is pinned UTC (GraftSession/Verify), which makes the
  * NTZ interpretation equal DuckDB's epoch_us over a naive timestamp.
  */
class EpochUsSpec extends SparkSpec {

  test("identical micros across long-nanos, timestamp, and timestamp_ntz") {
    val s = spark
    import s.implicits._
    // epoch micros chosen to cover sub-second digits and a DST-sensitive
    // wall time (2026-03-29 02:30 Europe) — UTC pinning must make it moot
    val micros = Seq(0L, 1L, 999999L, 1774571400123456L, 1770000000000001L)
    val fromLongNanos = micros.map(_ * 1000L).toDF("ts")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val fromTimestamp = micros.toDF("us")
      .select(timestamp_micros($"us").as("ts"))
    val fromNtz = micros.toDF("us")
      .select(timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
    for ((df, flavor) <- Seq(fromLongNanos -> "long-nanos rebuild",
        fromTimestamp -> "timestamp", fromNtz -> "timestamp_ntz")) {
      assert(df.schema("ts").dataType.typeName.nonEmpty)
      val got = df.select(Tables.epochUs($"ts")).as[Long].collect().sorted
      assert(got.toSeq == micros.sorted, s"$flavor: got ${got.toSeq}")
    }
  }
}
