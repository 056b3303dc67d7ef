package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the NIO checkpoint file manager (optimization round
  * 14): the exact semantics `HDFSMetadataLog` and the HDFS-backed state
  * store rely on from `FileContextBasedCheckpointFileManager`, minus the
  * per-file process forks it exists to remove.
  */
class NioCheckpointFileManagerSpec extends AnyFunSuite {

  private def withMgr(f: (NioCheckpointFileManager, java.io.File) => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("nio-cfm-spec-").toFile
    try f(new NioCheckpointFileManager(new Path(dir.toURI), new Configuration()), dir)
    finally {
      def rec(x: java.io.File): Unit = {
        val kids = x.listFiles(); if (kids != null) kids.foreach(rec)
        x.delete(): Unit
      }
      rec(dir)
    }
  }

  private def write(m: NioCheckpointFileManager, p: Path, s: String,
      overwrite: Boolean): Unit = {
    val out = m.createAtomic(p, overwrite)
    out.write(s.getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  private def read(m: NioCheckpointFileManager, p: Path): String = {
    val in = m.open(p)
    try {
      val buf = new Array[Byte](1024)
      val n = in.read(buf)
      new String(buf, 0, math.max(n, 0), StandardCharsets.UTF_8)
    } finally in.close()
  }

  test("atomic create + read-back round trip") {
    withMgr { (m, dir) =>
      val p = new Path(new java.io.File(dir, "offsets/0").toURI)
      write(m, p, "v1-batch0", overwrite = false)
      assert(m.exists(p))
      assert(read(m, p) == "v1-batch0")
      // no temp or sibling files left behind (the .crc/.checksum classes)
      assert(new java.io.File(dir, "offsets").listFiles().map(_.getName).toSeq
        == Seq("0"))
    }
  }

  test("no-overwrite create of an existing target fails at close with " +
      "Hadoop's FileAlreadyExistsException and leaves the original intact") {
    withMgr { (m, dir) =>
      val p = new Path(new java.io.File(dir, "commits/5").toURI)
      write(m, p, "first-writer", overwrite = false)
      val out = m.createAtomic(p, overwriteIfPossible = false)
      out.write("second-writer".getBytes(StandardCharsets.UTF_8))
      intercept[FileAlreadyExistsException](out.close())
      assert(read(m, p) == "first-writer")
      assert(new java.io.File(dir, "commits").listFiles().map(_.getName).toSeq
        == Seq("5"))
    }
  }

  test("overwrite create replaces atomically; cancel leaves no trace") {
    withMgr { (m, dir) =>
      val p = new Path(new java.io.File(dir, "state/1.delta").toURI)
      write(m, p, "v1", overwrite = true)
      write(m, p, "v2", overwrite = true)
      assert(read(m, p) == "v2")
      val cancelled = m.createAtomic(p, overwriteIfPossible = true)
      cancelled.write("junk".getBytes(StandardCharsets.UTF_8))
      cancelled.cancel()
      assert(read(m, p) == "v2")
      assert(new java.io.File(dir, "state").listFiles().map(_.getName).toSeq
        == Seq("1.delta"))
    }
  }

  test("positioned reads and seeks (the state-store access pattern)") {
    withMgr { (m, dir) =>
      val p = new Path(new java.io.File(dir, "seekable").toURI)
      write(m, p, "0123456789", overwrite = false)
      val in = m.open(p)
      try {
        in.seek(4)
        assert(in.getPos == 4)
        assert(in.read() == '4'.toInt)
        val buf = new Array[Byte](3)
        in.readFully(7, buf)
        assert(new String(buf, StandardCharsets.UTF_8) == "789")
        // positioned read must not move the stream position
        assert(in.getPos == 5)
      } finally in.close()
    }
  }

  test("list filters and missing-dir semantics") {
    withMgr { (m, dir) =>
      val base = new java.io.File(dir, "log")
      m.mkdirs(new Path(base.toURI))
      write(m, new Path(new java.io.File(base, "1").toURI), "a", false)
      write(m, new Path(new java.io.File(base, "2").toURI), "b", false)
      val names = m.list(new Path(base.toURI)).map(_.getPath.getName).sorted
      assert(names.toSeq == Seq("1", "2"))
      intercept[java.io.FileNotFoundException](
        m.list(new Path(new java.io.File(dir, "absent").toURI)))
      m.delete(new Path(base.toURI))
      assert(!m.exists(new Path(base.toURI)))
      // delete of a missing path is silent (manager contract)
      m.delete(new Path(base.toURI))
    }
  }
}
