package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration.
  *
  * Defaults are chosen for correctness-at-scale first: UTC session time zone
  * (the reference stamps all metric timestamps in UTC,
  * churn_prediction_pipeline.py:509,521), adaptive query execution on (runtime
  * shuffle-partition coalescing + skew-join splitting), and a shuffle
  * partition count sized for the local test harness. On a real cluster the
  * caller overrides `shufflePartitions` (rule of thumb: 2-3x total cores, or
  * let AQE coalesce from a higher initial number).
  */
object GraftSession {

  /** Apply the engine's standard configs to any builder. */
  def configure(
      b: SparkSession.Builder,
      shufflePartitions: Int = 32
  ): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Broadcast anything under 32 MiB: the dimension tables (region,
      // nation, supplier, part metadata) stay broadcast-able even at large
      // scale factors, keeping fact-table joins shuffle-free on one side.
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // The events table carries parquet TIMESTAMP(NANOS), which Spark's
      // vectorized reader rejects; read as long and rebuild a timestamp in
      // Tables.events (micros truncation).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Executor-process plumbing for `local-cluster[n,c,m]` masters (the
    * multi-JVM correctness gate): real executor JVMs need (a) a Spark home
    * to assemble their base classpath — `spark.test.home` is the public
    * escape hatch Spark's own suites use when SPARK_HOME isn't exported to
    * the worker threads, (b) the build's class output on their classpath
    * (derived from this class's CodeSource so it works from sbt, a bare
    * `java -cp`, and the test runner alike), and (c) the JDK17 module
    * opens `spark-submit` would normally inject. Idempotent; a no-op for
    * in-process masters.
    */
  def configureLocalCluster(b: SparkSession.Builder,
      master: String = ""): SparkSession.Builder = {
    val sparkHome = Option(System.getenv("SPARK_HOME")).getOrElse {
      // derive <spark-home> from any Spark jar's location: jars/ is its
      // immediate child in every distribution layout
      val jar = new java.io.File(classOf[SparkSession]
        .getProtectionDomain.getCodeSource.getLocation.toURI)
      jar.getParentFile.getParentFile.getPath
    }
    if (System.getProperty("spark.test.home") == null)
      System.setProperty("spark.test.home", sparkHome)
    val graftClasses = new java.io.File(getClass
      .getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    b.config("spark.executor.extraClassPath", graftClasses)
      // the Worker builds executor commands in-process (no spark-env.sh),
      // so the launcher's getScalaVersion() needs the env hint it would
      // otherwise read from the shell scripts; executorEnv.* flows into
      // the command environment the launcher consults first
      .config("spark.executorEnv.SPARK_SCALA_VERSION",
        scala.util.Properties.versionNumberString.split("\\.").take(2)
          .mkString("."))
      .config("spark.executor.extraJavaOptions",
        org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions())
      // one executor per worker slot: memory must fit under the worker's
      // local-cluster[n, c, memMB] grant, so claim exactly the grant
      .config("spark.executor.memory",
        "local-cluster\\[\\s*\\d+\\s*,\\s*\\d+\\s*,\\s*(\\d+)\\s*\\]".r
          .findFirstMatchIn(master).map(_.group(1) + "m").getOrElse("3g"))
  }

  /** Local session for tests and the bench/verify mains. */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = configure(
      SparkSession
        .builder()
        .master(s"local[$cores]")
        .appName(appName),
      shufflePartitions = cores
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
