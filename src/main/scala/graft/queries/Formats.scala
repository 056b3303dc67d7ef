package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Source/sink format breadth (round 10): the engine's lake surface is
  * parquet-first, but a real pipeline ingests and emits ORC and JSONL
  * too. Each gate writes the events table through the format's REAL
  * writer into a temp layout, reads it back through the format's reader,
  * and aggregates — the oracle runs the same aggregate over the original
  * parquet, so any value corruption in the roundtrip (timestamp
  * precision, long/double coercion, string escaping) diverges. The
  * q141-style eager localCheckpoint pins each bounded result before the
  * temp layout is torn down.
  */
object Formats {

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Shared aggregate: per event_type, exact row count, distinct users,
    * and the integer-microsecond time span — sensitive to any timestamp
    * or id corruption in a roundtrip.
    */
  private val AggSql =
    """SELECT event_type, count(*)::BIGINT AS events,
      |  count(DISTINCT user_id)::BIGINT AS users,
      |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
      |  sum(event_id)::BIGINT AS id_sum
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  private def agg(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy($"event_type")
      .agg(count(lit(1)).as("events"),
        countDistinct($"user_id").as("users"),
        min($"ts_us").as("min_ts_us"), max($"ts_us").as("max_ts_us"),
        sum($"event_id").as("id_sum"))
      .smallOrdered($"event_type")
  }

  /** ORC roundtrip: Spark's native ORC writer/reader with timestamps
    * carried as proper TIMESTAMP columns (micros preserved end-to-end).
    */
  private val q149 = QueryDef.sql(
    "ORC sink+source roundtrip: events written and re-read through the ORC codec")(
    AggSql) { (s, dir) =>
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc-")
    try {
      val path = tmp.resolve("events_orc").toString
      Tables(s, dir).events
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .write.mode("overwrite").orc(path)
      agg(s.read.orc(path)
          .withColumn("ts_us", Tables.epochUs($"ts")))
        .localCheckpoint()
    } finally deleteRecursively(tmp.toFile)
  }

  /** JSONL roundtrip: newline-delimited JSON through Spark's real JSON
    * writer/reader with an explicit read schema (no inference — the
    * 100 TB shape: schema drift is rejected at the scan, not guessed).
    * Timestamps travel as integer epoch-microseconds, the lossless JSON
    * encoding.
    */
  private val q150 = QueryDef.sql(
    "JSONL sink+source roundtrip: events written and re-read as newline-delimited JSON")(
    AggSql) { (s, dir) =>
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl-")
    try {
      val path = tmp.resolve("events_jsonl").toString
      Tables(s, dir).events
        .select($"user_id", $"event_type",
          Tables.epochUs($"ts").as("ts_us"), $"event_id")
        .write.mode("overwrite").json(path)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts_us",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType)))
      agg(s.read.schema(schema).json(path)).localCheckpoint()
    } finally deleteRecursively(tmp.toFile)
  }

  /** Native PIVOT: order revenue by priority × order-year, through
    * Spark's `pivot` operator with an EXPLICIT value list (the 100 TB
    * rule — an unlisted pivot runs a distinct-scan job first and caps at
    * `spark.sql.pivotMaxValues`; listing the years keeps it one pass).
    * Compiles to a single aggregate with one conditional-sum column per
    * year — exactly the CASE-WHEN matrix the oracle spells out. Sums are
    * float-cast on both sides per the engine's float-parity rule.
    */
  private val q151 = QueryDef.sql(
    "native pivot: revenue by order priority x order year (explicit value list)")(
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN year(o_orderdate) = 1995 THEN o_totalprice END)
      |       AS REAL) AS "1995",
      |  CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN o_totalprice END)
      |       AS REAL) AS "1996",
      |  CAST(sum(CASE WHEN year(o_orderdate) = 1997 THEN o_totalprice END)
      |       AS REAL) AS "1997",
      |  CAST(sum(CASE WHEN year(o_orderdate) = 1998 THEN o_totalprice END)
      |       AS REAL) AS "1998"
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).orders
      .select($"o_orderpriority", year($"o_orderdate").as("yr"),
        $"o_totalprice")
      .groupBy($"o_orderpriority")
      .pivot("yr", Seq(1995, 1996, 1997, 1998))
      .agg(sum($"o_totalprice").cast("float"))
      .smallOrdered($"o_orderpriority")
  }

  /** Native UNPIVOT (melt): the four lineitem measures to (metric, value)
    * rows via Spark's `unpivot` operator — the long-form reshape every
    * profiling/plotting surface needs — then per-metric counts and
    * float-certified sums. The oracle replays the melt as a UNION ALL.
    */
  private val q152 = QueryDef.sql(
    "native unpivot: lineitem measures melted to long form, per-metric stats")(
    """SELECT metric, count(*)::BIGINT AS n, CAST(sum(v) AS REAL) AS sum_v
      |FROM (
      |  SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
      |  UNION ALL
      |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT 'l_discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT 'l_tax', l_tax FROM lineitem)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables(s, dir).lineitem
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice",
        $"l_discount", $"l_tax")
      .unpivot(
        ids = Array($"l_orderkey"),
        values = Array($"l_quantity", $"l_extendedprice", $"l_discount",
          $"l_tax"),
        variableColumnName = "metric",
        valueColumnName = "v")
      .groupBy($"metric")
      .agg(count(lit(1)).as("n"), sum($"v").cast("float").as("sum_v"))
      .smallOrdered($"metric")
  }

  /** Schema evolution under mergeSchema: a lake table whose writer grew a
    * column mid-history. Generation 1 (even user_ids) lands WITHOUT
    * event_id; generation 2 (odd) carries it. The merged read must union
    * the footers' schemas and null-fill the old files — count(event_id)
    * vs count(*) proves the null-fill reached exactly the gen-1 rows, and
    * sum(event_id) proves gen-2 values survived unmangled. mergeSchema is
    * opt-in per read (the 100 TB default stays single-footer planning;
    * evolved tables pay footer merging only where declared).
    */
  private val q154 = QueryDef.sql(
    "parquet schema evolution: two-generation layout read under mergeSchema")(
    """SELECT event_type, count(*)::BIGINT AS events,
      |  count(event_id)::BIGINT AS with_id, sum(event_id)::BIGINT AS id_sum
      |FROM (
      |  SELECT event_type, NULL::BIGINT AS event_id FROM events
      |  WHERE user_id % 2 = 0
      |  UNION ALL
      |  SELECT event_type, event_id FROM events WHERE user_id % 2 <> 0)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-evolve-")
    try {
      val base = tmp.resolve("events_evolved")
      val ev = Tables(s, dir).events
      ev.filter($"user_id" % 2 === 0)
        .select($"user_id", $"event_type")
        .write.mode("overwrite").parquet(base.resolve("gen=1").toString)
      ev.filter($"user_id" % 2 =!= 0)
        .select($"user_id", $"event_type", $"event_id")
        .write.mode("overwrite").parquet(base.resolve("gen=2").toString)
      s.read.option("mergeSchema", "true")
        .option("basePath", base.toString)
        .parquet(base.resolve("gen=1").toString, base.resolve("gen=2").toString)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("events"), count($"event_id").as("with_id"),
          sum($"event_id").as("id_sum"))
        .smallOrdered($"event_type")
        .localCheckpoint()
    } finally deleteRecursively(tmp.toFile)
  }

  /** CSV roundtrip: the reference's native ingest format (churn CSVs),
    * here gated over the events table through Spark's real CSV
    * writer/reader — header on, explicit read schema (inference is both a
    * second full scan and a correctness hazard at 100 TB), timestamps as
    * epoch-micros (CSV has no timestamp type; the integer encoding is the
    * lossless one). Exercises quoting/escaping on the string column and
    * long round-tripping on the ids.
    */
  private val q155 = QueryDef.sql(
    "CSV sink+source roundtrip: events written and re-read as headered CSV")(
    AggSql) { (s, dir) =>
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-csv-")
    try {
      val path = tmp.resolve("events_csv").toString
      Tables(s, dir).events
        .select($"user_id", $"event_type",
          Tables.epochUs($"ts").as("ts_us"), $"event_id")
        .write.mode("overwrite").option("header", "true").csv(path)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts_us",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType)))
      agg(s.read.schema(schema).option("header", "true").csv(path))
        .localCheckpoint()
    } finally deleteRecursively(tmp.toFile)
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q149_orc_roundtrip" -> q149,
    "q150_jsonl_roundtrip" -> q150,
    "q151_pivot_revenue" -> q151,
    "q152_unpivot_measures" -> q152,
    "q154_schema_evolution" -> q154,
    "q155_csv_roundtrip" -> q155
  )
}
