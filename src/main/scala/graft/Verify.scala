package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Multi-JVM gate (round 10, VERDICT r9 #1): SPARK_GRAFT_MASTER=
    // local-cluster[4,8,4096] runs the whole suite with four REAL executor
    // processes — closure serialization, broadcast transport, task-side
    // lazy statics and state-store placement all actually cross a process
    // boundary, which single-JVM local[N] never exercises. Default stays
    // local[cpus] (the driver's gate).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster"))
      graft.core.GraftSession.configureLocalCluster(builder, master)
    // Fault-injection gate (round 11, VERDICT r10 #1):
    // SPARK_GRAFT_FAULT_SCOPES=scan,rank,cc,stream enables the FaultOnce
    // probes (every covered task fails once on attempt 0) and raises
    // spark.task.maxFailures so the retries are absorbed. NOTE: in-process
    // local masters ignore the conf — pass a `local[N,4]` master alongside.
    sys.env.get("SPARK_GRAFT_FAULT_SCOPES").foreach { v =>
      builder.config("spark.graft.fault.scopes", v)
        .config("spark.task.maxFailures", "4")
    }
    // SPARK_GRAFT_KILL_AFTER=<n>: hard-halt one executor process after the
    // n-th query (sorted order) — executor-loss recovery mid-suite.
    val killAfter = sys.env.get("SPARK_GRAFT_KILL_AFTER").map(_.toInt)
    // Conf overlay (same contract as Bench's): the third fault mode —
    // aggressive SPECULATION (duplicate attempts racing every slow task,
    // exactly-once result/commit semantics under the gate) runs as
    // SPARK_GRAFT_CONF="spark.speculation=true;...". Generic on purpose.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    // INFO opt-in so fault-mode evidence runs can PROVE the fault fired
    // (e.g. TaskSetManager's "speculatable" lines) — default stays WARN
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    new java.io.File(outDir).mkdirs()
    // Local-iteration subset (same contract as Bench): the driver never
    // sets it, so the gate always dumps every query.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // SPARK_GRAFT_KILL_DURING=<query>:<delayMs>: destroy an executor
    // PROCESS (out-of-band, ProcessHandle) that many ms into the named
    // query — mid-job executor loss with in-flight tasks and live shuffle
    // blocks, the strongest re-execution probe.
    val killDuring = sys.env.get("SPARK_GRAFT_KILL_DURING").map { v =>
      val Array(q, ms) = v.split(":", 2); (q, ms.toLong)
    }
    // which query is running RIGHT NOW, for the kill thread's attribution:
    // the fire-and-forget timer used to outlive a fast target query and
    // land (unlogged) in a later one, mislabeling the committed evidence
    @volatile var current: String = ""
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .foreach { case ((name, fn), idx) =>
      if (killAfter.contains(idx)) {
        System.err.println(s"[fault] executor kill before query #$idx ($name)")
        graft.fault.FaultInjection.killOneExecutor(spark): Unit
      }
      val killer = killDuring.filter(_._1 == name).map { case (_, delayMs) =>
        val t = new Thread(() => {
          try {
            Thread.sleep(delayMs)
            // log the query ACTUALLY running when the kill lands — if the
            // target finished early this prints the mismatch instead of
            // silently mislabeling the run
            System.err.println(s"[fault] mid-query kill firing at ${delayMs}ms:" +
              s" scheduled=$name running=$current")
            graft.fault.FaultInjection.killExecutorProcess(): Unit
          } catch { case _: InterruptedException =>
            System.err.println(s"[fault] kill-during canceled: $name " +
              s"finished before the ${delayMs}ms delay — no kill fired")
          }
        }, "fault-kill-during")
        t.setDaemon(true)
        t.start()
        t
      }
      current = name
      val t0 = System.nanoTime()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      killer.foreach { t =>
        if (t.isAlive) t.interrupt()
        else System.err.println(f"[fault] kill window: $name ran " +
          f"${(System.nanoTime() - t0) / 1e3}%.0fus and the kill fired inside it")
      }
      // release per-query pinned frames (ParallelRank's bucketed exchanges
      // persist MEMORY_AND_DISK): over 173 queries the pins would otherwise
      // accumulate until ContextCleaner GC — same discipline as Bench's
      // per-rep clearCache
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the collapse class's transparent all-pairs definitions, for tooling
    // (tools/oracle_equiv_check.py) and inspection — the driver gate reads
    // only oracle_sql.json, which since round 14 carries the proven
    // scalable formulations directly (no patch step at any SF)
    val semantic = SparkEntry.semanticOracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql_semantic.json"), semantic)
    spark.stop()
  }
}
