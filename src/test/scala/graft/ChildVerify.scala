package graft

import java.io.File

import org.apache.spark.sql.SparkSession

/** Shared harness for gates that fork a REAL child JVM around
  * `graft.Verify` (multi-JVM local-cluster gate, fault-injection gate):
  * CodeSource-derived classpath (works under sbt's forked test JVM and a
  * bare `java -cp` alike), JDK17 module opens, bounded wait, and the
  * canonical row encoding both gates compare with.
  */
object ChildVerify {

  /** Fork `graft.Verify sfDir outDir` with `env` overlaid; returns the
    * child's exit code and its combined output lines (also left on disk at
    * `outDir/__child.log` for post-mortems).
    */
  def fork(sfDir: String, outDir: File, env: Map[String, String],
      timeoutMinutes: Long = 20): (Int, Vector[String]) = {
    def codeSrc(c: Class[_]): File =
      new File(c.getProtectionDomain.getCodeSource.getLocation.toURI)
    val graftMain = codeSrc(classOf[graft.queries.QueryDef]) // main classes
    val sparkJars = codeSrc(classOf[SparkSession]).getParentFile
    val cp = graftMain.getPath + File.pathSeparator +
      sparkJars.getPath + File.separator + "*"
    val moduleOpens = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split(" ").filter(_.nonEmpty).toSeq
    val cmd = Seq(System.getProperty("java.home") + "/bin/java") ++
      moduleOpens ++ Seq("-Xmx6g", "-Xss8m",
      "-XX:ReservedCodeCacheSize=512m",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, "graft.Verify", sfDir, outDir.toString)
    val pb = new ProcessBuilder(cmd: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val logFile = new File(outDir, "__child.log")
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile)
    val p = pb.start()
    val finished =
      p.waitFor(timeoutMinutes, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) p.destroyForcibly()
    val rc = if (finished) p.exitValue() else -1
    (rc, scala.io.Source.fromFile(logFile).getLines().toVector)
  }

  /** Canonical row multiset: exact string encoding (the driver gate hashes
    * exactly too), columns sorted by name, rows sorted.
    */
  def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => cols.indices.map(i =>
        if (r.isNullAt(i)) "\u0000null" else {
          r.get(i) match {
            case d: Double      => java.lang.Double.toString(d)
            case f: Float       => java.lang.Float.toString(f)
            case a: Seq[_]      => a.mkString("[", ",", "]")
            case a: Array[Byte] => a.map("%02x".format(_)).mkString
            case a: Array[_]    => a.mkString("[", ",", "]")
            case v              => v.toString
          }
        }))
      .map(_.toSeq).toSeq.sorted(
        Ordering.Implicits.seqOrdering[Seq, String])
  }

  /** Compare every `names` query's child parquet against the in-process
    * build; returns human-readable divergence lines (empty = identical).
    */
  def diverged(spark: SparkSession, outDir: File, sfDir: String,
      names: Seq[String]): Seq[String] =
    names.sorted.flatMap { name =>
      val fn = SparkEntry.queries(name)
      val child = canon(spark.read.parquet(new File(outDir, name).getPath))
      val local = canon(fn(spark, sfDir))
      if (child == local) None
      else Some(s"$name: child ${child.length} rows vs " +
        s"in-process ${local.length}; first diff: " +
        child.zipAll(local, Seq("<absent>"), Seq("<absent>"))
          .find { case (a, b) => a != b }.map(_.toString).getOrElse(""))
    }

  def deleteRecursively(f: File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
