package graft.churn

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.NoTypeHints
import org.json4s.jackson.Serialization

/** Report persistence (SURVEY.md §2.9 R7): the engine-native equivalent of
  * pushing an Evidently report run to a workspace UI
  * (churn_prediction_pipeline.py:329-346: RemoteWorkspace + get-or-create
  * project; 556-585: the project id memoized in a Variable block).
  *
  * Observable semantics mirrored exactly:
  *   - a variable store memoizes the project id across runs;
  *   - a memoized id that no longer resolves (workspace wiped) falls back
  *     to create-project + re-save, never fails the pipeline;
  *   - `addRun` appends an immutable report snapshot under the project.
  *
  * Hadoop-FS layout (any object store):
  *   projects/{id}/project.json       — {"id":…, "name":…}
  *   projects/{id}/runs/{runId}.json  — flattened report metric rows
  *   variables/{key}                  — memoized ids (the Variable analog)
  */
final class ReportWorkspace(root: String, conf: Configuration = new Configuration()) {

  val ProjectName = "mlops-churn-pipeline" // EVIDENTLY_PROJECT_NAME (PIPE:66)
  val ProjectIdVariable = "evidently_project_id"

  private implicit val formats: org.json4s.Formats = Serialization.formats(NoTypeHints)
  private val rootPath = new Path(root)
  private val fs: FileSystem = rootPath.getFileSystem(conf)

  private def variableFile(key: String) = new Path(rootPath, s"variables/$key")
  private def projectDir(id: String) = new Path(rootPath, s"projects/$id")
  private def runFile(projectId: String, runId: String) =
    new Path(projectDir(projectId), s"runs/$runId.json")

  private def writeString(p: Path, s: String): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes); new String(bytes, "UTF-8")
    } finally in.close()
  }

  // --- variable store (Prefect Variable analog, PIPE:556-585) -----------

  def getVariable(key: String): Option[String] =
    if (fs.exists(variableFile(key))) Some(readString(variableFile(key)))
    else None

  def saveVariable(key: String, value: String): Unit =
    writeString(variableFile(key), value)

  // --- projects ---------------------------------------------------------

  def createProject(name: String): String = {
    val id = UUID.randomUUID().toString
    writeString(new Path(projectDir(id), "project.json"),
      Serialization.write(Map("id" -> id, "name" -> name)))
    id
  }

  def projectExists(id: String): Boolean =
    fs.exists(new Path(projectDir(id), "project.json"))

  /** The reference's get-or-create flow (PIPE:332-346): reuse the memoized
    * id when it still resolves; otherwise create a fresh project and
    * re-memoize — a stale id must repair itself, not fail the pipeline.
    */
  def getOrCreateProject(name: String = ProjectName,
      variableKey: String = ProjectIdVariable): String =
    getVariable(variableKey) match {
      case Some(id) if projectExists(id) => id
      case _ =>
        val id = createProject(name)
        saveVariable(variableKey, id)
        id
    }

  // --- runs -------------------------------------------------------------

  /** workspace.add_run(project.id, report) (PIPE:347): persist one report
    * snapshot; returns the run id. Runs are immutable and listable.
    */
  def addRun(projectId: String, report: Seq[ReportMetric],
      createdAtMillis: Long): String = {
    require(projectExists(projectId), s"no project $projectId in $root")
    val runId = UUID.randomUUID().toString
    val payload = Map(
      "run_id" -> runId,
      "created_at" -> createdAtMillis,
      "metrics" -> report.map(m => Map(
        "metric_id" -> m.metricId,
        "scalar" -> m.scalar,
        "dict" -> m.dict)))
    writeString(runFile(projectId, runId), Serialization.write(payload))
    runId
  }

  def runIds(projectId: String): Seq[String] = {
    val dir = new Path(projectDir(projectId), "runs")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName.stripSuffix(".json")).sorted
  }

  def readRun(projectId: String, runId: String): Seq[ReportMetric] = {
    val json = org.json4s.jackson.JsonMethods.parse(
      readString(runFile(projectId, runId)))
    (json \ "metrics").extract[Seq[Map[String, Any]]].map { m =>
      ReportMetric(
        metricId = m("metric_id").asInstanceOf[String],
        scalar = m.get("scalar").flatMap {
          case null => None
          case d: Double => Some(d)
          case i: BigInt => Some(i.toDouble)
          case other => Some(other.toString.toDouble)
        },
        dict = m.get("dict") match {
          case Some(d: Map[_, _]) =>
            d.map { case (k, v) => k.toString -> v.toString.toDouble }
          case _ => Map.empty
        })
    }
  }
}
