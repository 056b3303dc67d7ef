package graft.churn

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming entry point (SURVEY.md §2.11, §2.1 S12): the reference's
  * S3-event → Lambda → Prefect trigger chain collapses into a Structured
  * Streaming file source watching input/ — each discovered file becomes one
  * pipeline run inside foreachBatch, checkpointed for exactly-once-per-file.
  *
  * The binaryFile source is used for *discovery only* (`path` column; the
  * content column is pruned away, so file bytes are never read here) — the
  * pipeline re-reads each file as CSV through the validated batch path,
  * matching the reference's per-file full-batch semantics. No watermarks or
  * event-time state: arrival-order, file-at-a-time, like the original.
  */
object ChurnStream {

  def start(
      spark: SparkSession,
      rootDir: String,
      pipeline: ChurnPipeline,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*")
      .load(s"$rootDir/input")
      .select("path")

    files.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // tiny driver-side list: one row per newly-dropped file
        val keys = batch.collect().map { r =>
          val p = r.getString(0)
          s"input/${p.split("/").last}"
        }.sorted
        keys.foreach(pipeline.run(_))
        ()
      }
      .start()
  }
}
