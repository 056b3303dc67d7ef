package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Per-micro-batch telemetry for the streaming gates (optimization round):
  * replays the q147 stream-stream-join drip and the q130 SCD2 drip exactly
  * as StreamGate does, then prints every micro-batch's durationMs breakdown
  * (triggerExecution = total; addBatch = execution; queryPlanning,
  * walCommit, commitOffsets, getBatch, latestOffset are the driver-side
  * fixed costs). This is guide §1 "measure first" for the one family whose
  * wall is not a batch plan: the knobs worth touching are whichever rows
  * dominate here.
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shuffleParts: Int = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "4").toInt
    val builder = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("profile-stream"),
      shuffleParts)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.execution.ui.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.default.parallelism", shuffleParts.toString)
      .config("spark.locality.wait", "0")
      // Mirror StreamGate.withDripConf (round 15): without these the tool
      // times Hadoop's forking checkpoint path (~300 ms/commit) that the
      // GATES no longer use — exactly the misleading read that stalled
      // this round's streaming investigation until spotted. Override via
      // SPARK_GRAFT_CONF to measure the unfixed path deliberately.
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.NioCheckpointFileManager")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ssjParts = sys.env.getOrElse("SPARK_GRAFT_SSJ_PARTS", "2").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt

    val typed = Tables(spark, sfDir).events
      .select($"user_id", $"event_type", Tables.epochUs($"ts").as("ts_us"),
        $"event_id")
      .collect()
      .map(r => graft.queries.StreamGate.JoinEv(r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
      .sortBy(e => (e.ts_us, e.event_id))
    val chunks = typed.grouped(math.max(typed.length / 6, 1)).toSeq

    (1 to reps).foreach { rep =>
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", ssjParts.toString)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-profstream-")
      val sink = "profstream_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val touchesIn = MemoryStream[graft.queries.StreamGate.JoinEv]
      val purchasesIn = MemoryStream[graft.queries.StreamGate.JoinEv]
      val touches = touchesIn.toDS()
        .filter($"event_type" =!= "purchase")
        .select($"user_id".as("t_user"), $"event_type".as("touch"),
          $"ts_us".as("t_us"), timestamp_micros($"ts_us").as("t_ets"))
        .withWatermark("t_ets", "6 days")
      val purchases = purchasesIn.toDS()
        .filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), $"event_id".as("p_id"),
          $"ts_us".as("p_us"), timestamp_micros($"ts_us").as("p_ets"))
        .withWatermark("p_ets", "6 days")
      val joined = touches.join(purchases,
        $"t_user" === $"p_user" &&
          $"t_ets" >= $"p_ets" - expr("INTERVAL 3 DAYS") &&
          $"t_ets" <= $"p_ets")
      val t0 = System.nanoTime()
      val q = joined
        .select($"t_user".as("user_id"), $"touch", $"p_id")
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try {
        chunks.foreach { c =>
          touchesIn.addData(c)
          purchasesIn.addData(c)
          q.processAllAvailable()
        }
      } finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"rep $rep q147-drip wall=$wall%.2f s  parts=$ssjParts")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        def g(k: String) = Option(d.get(k)).map(_.toString).getOrElse("-")
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${g("triggerExecution")} addBatch=${g("addBatch")} " +
          s"planning=${g("queryPlanning")} walCommit=${g("walCommit")} " +
          s"offsets=${g("commitOffsets")} getBatch=${g("getBatch")} " +
          s"latestOffset=${g("latestOffset")}")
        val ss = p.stateOperators
        ss.foreach(s => println(s"    state: commitMs=${s.commitTimeMs} " +
          s"rowsTotal=${s.numRowsTotal} memUsed=${s.memoryUsedBytes}"))
      }
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      def del(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(del)
        f.delete(): Unit
      }
      spark.catalog.dropTempView(sink)
      del(ckpt.toFile)
    }
    spark.stop()
  }
}
