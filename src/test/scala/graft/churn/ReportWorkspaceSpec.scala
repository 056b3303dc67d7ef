package graft.churn

import java.nio.file.Files

import graft.SparkSpec

class ReportWorkspaceSpec extends SparkSpec {

  private def sampleReport: Seq[ReportMetric] = Seq(
    ReportMetric("Accuracy()", scalar = Some(0.9)),
    ReportMetric("ValueDrift(column=age_group)", scalar = Some(0.03)),
    ReportMetric("DriftedColumnsCount(drift_share=0.5)",
      dict = Map("count" -> 1.0, "share" -> 1.0 / 12)))

  test("get-or-create memoizes the project id and repairs a stale one") {
    val ws = new ReportWorkspace(
      Files.createTempDirectory("graft-ws").toString)
    assert(ws.getVariable(ws.ProjectIdVariable).isEmpty)
    val id1 = ws.getOrCreateProject()
    // memoized: second call returns the same project, no new id
    assert(ws.getOrCreateProject() == id1)
    assert(ws.getVariable(ws.ProjectIdVariable).contains(id1))
    // stale id (workspace wiped): self-repairs with a fresh project + save
    ws.saveVariable(ws.ProjectIdVariable, "no-such-project")
    val id2 = ws.getOrCreateProject()
    assert(id2 != id1 && ws.projectExists(id2))
    assert(ws.getVariable(ws.ProjectIdVariable).contains(id2))
  }

  test("addRun persists immutable report snapshots that read back exactly") {
    val ws = new ReportWorkspace(
      Files.createTempDirectory("graft-ws2").toString)
    val pid = ws.getOrCreateProject()
    val r1 = ws.addRun(pid, sampleReport, createdAtMillis = 1000L)
    val r2 = ws.addRun(pid, sampleReport.take(1), createdAtMillis = 2000L)
    assert(ws.runIds(pid).toSet == Set(r1, r2))
    assert(ws.readRun(pid, r1) == sampleReport)
    assert(ws.readRun(pid, r2) == sampleReport.take(1))
    // unknown project fails loudly, mirroring the workspace API
    intercept[IllegalArgumentException](ws.addRun("missing", sampleReport, 0L))
  }
}
