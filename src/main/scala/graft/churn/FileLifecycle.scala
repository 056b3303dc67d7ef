package graft.churn

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Folder state machine + per-file audit log (SURVEY.md §2.1 S4-S6):
  * input → processing → processed | errored, with an appended log line per
  * move in logs/{filename}.log.
  *
  * Driver-side Hadoop FileSystem ops (rename, not copy+delete — atomic on
  * HDFS/local, and the object-store copy+delete of the reference
  * (churn_prediction_pipeline.py:654-657) is exactly what rename compiles to
  * on s3a). The reference's S3 read-modify-write log append is racy at
  * scale (SURVEY.md §7 hard-parts); here the log is a true filesystem
  * append when supported, else read+rewrite on local FS — observable
  * content identical.
  */
final class FileLifecycle(rootDir: String, conf: Configuration = new Configuration()) {

  val FolderInput = "input"
  val FolderProcessing = "processing"
  val FolderProcessed = "processed"
  val FolderErrored = "errored"
  val FolderLogs = "logs"

  private val root = new Path(rootDir)
  private val fs: FileSystem = root.getFileSystem(conf)

  def path(folder: String, filename: String = ""): Path =
    if (filename.isEmpty) new Path(root, folder)
    else new Path(new Path(root, folder), filename)

  /** ISO-8601 UTC timestamp with offset, matching
    * `datetime.now(timezone.utc).isoformat()` up to the offset rendering.
    */
  private def isoNow(): String =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")
      .withZone(ZoneOffset.UTC).format(Instant.now())

  /** move_to_folder (churn_prediction_pipeline.py:643-680): move `key` into
    * `folder`, append the log line
    * `{iso} Moved {key} → {new_key}. {message}\n` to logs/{filename}.log,
    * return the new key (folder-relative path).
    */
  def moveToFolder(key: String, folder: String, message: String = ""): String = {
    val filename = key.split("/").last
    val newKey = s"$folder/$filename"
    val src = new Path(root, key)
    val dst = path(folder, filename)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"Failed to move $src to $dst")
    appendLog(filename, s"${isoNow()} Moved $key → $newKey. $message\n")
    newKey
  }

  /** Append one line to logs/{filename}.log (create if absent). */
  def appendLog(filename: String, line: String): Unit = {
    val logPath = path(FolderLogs, s"$filename.log")
    fs.mkdirs(logPath.getParent)
    val out =
      try fs.append(logPath)
      catch {
        case _: Throwable =>
          // local/raw FS without append support: read-modify-write like the
          // reference (churn_prediction_pipeline.py:669-678)
          val existing =
            if (fs.exists(logPath)) {
              val in = fs.open(logPath)
              try {
                val bytes = new Array[Byte](fs.getFileStatus(logPath).getLen.toInt)
                in.readFully(bytes); new String(bytes, "UTF-8")
              } finally in.close()
            } else ""
          val o = fs.create(logPath, true)
          o.write(existing.getBytes("UTF-8"))
          o
      }
    try out.write(line.getBytes("UTF-8")) finally out.close()
  }

  def readLog(filename: String): String = {
    val logPath = path(FolderLogs, s"$filename.log")
    if (!fs.exists(logPath)) return ""
    val in = fs.open(logPath)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(logPath).getLen.toInt)
      in.readFully(bytes); new String(bytes, "UTF-8")
    } finally in.close()
  }

  /** Delete a root-relative key (the reference's delete_object after an
    * atomic-replace write, churn_prediction_pipeline.py:252).
    */
  def deleteKey(key: String): Boolean =
    fs.delete(new Path(root, key), false)

  def exists(folder: String, filename: String): Boolean =
    fs.exists(path(folder, filename))

  def list(folder: String): Seq[String] = {
    val p = path(folder)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName).sorted
  }

  def mkdirs(): Unit =
    Seq(FolderInput, FolderProcessing, FolderProcessed, FolderErrored, FolderLogs)
      .foreach(f => fs.mkdirs(path(f)))
}
