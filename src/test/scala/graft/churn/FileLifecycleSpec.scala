package graft.churn

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class FileLifecycleSpec extends AnyFunSuite {

  private def freshRoot(): String =
    Files.createTempDirectory("graft-lifecycle").toString

  test("moveToFolder renames and appends the exact log line shape") {
    val root = freshRoot()
    val lc = new FileLifecycle(root)
    lc.mkdirs()
    Files.writeString(java.nio.file.Paths.get(root, "input", "f.csv"), "a,b\n1,2\n")

    val newKey = lc.moveToFolder("input/f.csv", lc.FolderProcessing)
    assert(newKey == "processing/f.csv")
    assert(lc.exists("processing", "f.csv"))
    assert(!lc.exists("input", "f.csv"))

    val log = lc.readLog("f.csv")
    // "{iso} Moved input/f.csv → processing/f.csv. \n"
    assert(log.matches(
      """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}\+00:00 Moved input/f\.csv → processing/f\.csv\. \n"""))
  }

  test("subsequent moves append to the same log with messages") {
    val root = freshRoot()
    val lc = new FileLifecycle(root)
    lc.mkdirs()
    Files.writeString(java.nio.file.Paths.get(root, "input", "g.csv"), "x\n")
    lc.moveToFolder("input/g.csv", lc.FolderProcessing)
    lc.moveToFolder("processing/g.csv", lc.FolderErrored, "boom happened")
    val lines = lc.readLog("g.csv").split("\n")
    assert(lines.length == 2)
    assert(lines(0).contains("Moved input/g.csv → processing/g.csv. "))
    assert(lines(1).endsWith("Moved processing/g.csv → errored/g.csv. boom happened"))
  }

  test("deleteKey removes a file") {
    val root = freshRoot()
    val lc = new FileLifecycle(root)
    lc.mkdirs()
    Files.writeString(java.nio.file.Paths.get(root, "processing", "h.csv"), "x\n")
    assert(lc.deleteKey("processing/h.csv"))
    assert(!lc.exists("processing", "h.csv"))
  }
}
