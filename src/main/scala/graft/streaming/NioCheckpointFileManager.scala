package graft.streaming

import java.io.{File, FileNotFoundException, FileOutputStream, RandomAccessFile}
import java.nio.file.{FileAlreadyExistsException => NioFileAlreadyExists, Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, Path, PathFilter, PositionedReadable, Seekable}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** Pure-`java.nio` [[CheckpointFileManager]] for LOCAL checkpoint
  * directories (optimization round 14, guide §1/§5 — measured, not
  * guessed): Spark's default `FileContextBasedCheckpointFileManager` rides
  * Hadoop's local `ChecksumFs`, whose `create`/`rename` **fork a child
  * process per file** on boxes without the native Hadoop library
  * (`FileUtil.readLink` shells `readlink` inside `FileSystem.rename`;
  * `RawLocalFileSystem.setPermission` shells `chmod`) and write a `.crc`
  * sibling per file. A streaming micro-batch commits offsets + commit log
  * + one delta per state store instance, so the per-batch floor of every
  * streaming gate was dominated by dozens of process forks — jstack
  * sampling during the q147 drip showed the `ChecksumCheckpointFileManager`
  * threads pinned in `ProcessImpl.forkAndExec`, and per-batch telemetry
  * (`graft.tools.ProfileStream`) attributed ~300 ms/batch to state commits
  * of a few MB of state.
  *
  * This manager performs the identical atomic-rename protocol with NIO
  * calls only (`Files.move(..., ATOMIC_MOVE)` on the same directory —
  * POSIX-atomic, same guarantee the default manager gets from
  * `FileContext.rename`), no forks, no `.crc` siblings. Scoped to the
  * streaming GATES via `StreamGate.withDripConf`
  * (`spark.sql.streaming.checkpointFileManagerClass`), whose checkpoints
  * are always fresh local temp dirs; a production deployment checkpoints
  * to HDFS/S3 and keeps Spark's default manager, so nothing
  * scale-relevant is bypassed. Measured effect: q147 drip wall
  * 6.8 → ~4.9 s, state commit 313 → <60 ms/batch (ProfileStream A/B).
  *
  * Semantics preserved from `FileContextBasedCheckpointFileManager`:
  * `createAtomic(_, overwriteIfPossible = false)` surfaces
  * [[FileAlreadyExistsException]] (Hadoop's) at `close()` when the target
  * exists — `HDFSMetadataLog` relies on exactly that signal for
  * concurrent-writer detection; `delete` is recursive and silent on
  * missing paths; `list` on a missing dir raises
  * [[FileNotFoundException]].
  */
class NioCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {

  private def toFile(p: Path): File = new File(p.toUri.getPath)

  override def isLocal: Boolean = true

  override def mkdirs(path: Path): Unit =
    Files.createDirectories(toFile(path).toPath): Unit

  override def exists(path: Path): Boolean = toFile(path).exists()

  override def delete(path: Path): Unit = {
    def rec(f: File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rec)
      f.delete(): Unit
    }
    rec(toFile(path))
  }

  override def createCheckpointDirectory(): Path = {
    mkdirs(root)
    root
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val dir = toFile(path)
    if (!dir.exists()) throw new FileNotFoundException(s"$path does not exist")
    val kids = Option(dir.listFiles()).getOrElse(Array.empty[File])
    kids.iterator.map { f =>
      new FileStatus(f.length(), f.isDirectory, 1, 33554432L, f.lastModified(),
        new Path(f.toURI))
    }.filter(st => filter.accept(st.getPath)).toArray
  }

  /** Random-access local read with the `Seekable`/`PositionedReadable`
    * surface `FSDataInputStream` requires (the state store seeks).
    */
  private final class NioInputStream(f: File) extends java.io.InputStream
      with Seekable with PositionedReadable {
    private val raf = new RandomAccessFile(f, "r")
    override def read(): Int = raf.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      raf.read(b, off, len)
    override def close(): Unit = raf.close()
    override def seek(pos: Long): Unit = raf.seek(pos)
    override def getPos: Long = raf.getFilePointer
    override def seekToNewSource(targetPos: Long): Boolean = false
    // positioned reads go through FileChannel.read(ByteBuffer, position),
    // which neither moves nor reads the channel/RAF position — honoring
    // Hadoop's PositionedReadable thread-safety contract (ADVICE r14: the
    // previous seek/restore dance would corrupt concurrent positioned
    // reads sharing one stream; Spark's current readers are
    // single-threaded per stream, but the contract says thread-safe)
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int =
      raf.getChannel.read(java.nio.ByteBuffer.wrap(buffer, offset, length),
        position)
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      var done = 0
      while (done < length) {
        val n = read(position + done, buffer, offset + done, length - done)
        if (n < 0) throw new java.io.EOFException(
          s"EOF at ${position + done} of $f")
        done += n
      }
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }

  override def open(path: Path): FSDataInputStream = {
    val f = toFile(path)
    if (!f.exists()) throw new FileNotFoundException(s"$path does not exist")
    // no buffering layer: every consumer (metadata logs, state store)
    // immediately wraps the stream in its own buffered/compressed reader,
    // and a buffer here would have to be invalidated on every seek
    new FSDataInputStream(new NioInputStream(f))
  }

  override def createAtomic(path: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val dest = toFile(path)
    Option(dest.getParentFile).foreach(p =>
      Files.createDirectories(p.toPath): Unit)
    val tmp = new File(dest.getParentFile,
      s".${dest.getName}.${UUID.randomUUID()}.tmp")
    val out = new FileOutputStream(tmp)
    new CancellableFSDataOutputStream(new java.io.BufferedOutputStream(out, 65536)) {
      @volatile private var terminated = false
      override def cancel(): Unit = if (!terminated) {
        terminated = true
        try underlyingStream.close() finally { tmp.delete(): Unit }
      }
      override def close(): Unit = if (!terminated) {
        terminated = true
        underlyingStream.close()
        // POSIX rename(2) — what ATOMIC_MOVE compiles to here — silently
        // replaces an existing target, so the no-overwrite contract needs
        // an explicit existence check (the same check-then-rename Hadoop's
        // local FileContext performs; single-writer per fresh checkpoint
        // makes the race window moot for the gates this manager serves)
        if (!overwriteIfPossible && dest.exists()) {
          tmp.delete()
          throw new FileAlreadyExistsException(
            s"Failed to rename $tmp to $path as destination already exists")
        }
        try Files.move(tmp.toPath, dest.toPath,
          StandardCopyOption.ATOMIC_MOVE): Unit
        catch {
          case _: NioFileAlreadyExists =>
            tmp.delete()
            throw new FileAlreadyExistsException(
              s"Failed to rename $tmp to $path as destination already exists")
        }
      }
    }
  }
}
