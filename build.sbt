ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "churnmodelevaluationplatformspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession (SharedSpark); keep them sequential inside
// the forked JVM so a heavy fit (TrainingQualitySpec) can't race lighter
// suites for the session. This is sbt's default for forked tests — pinned
// explicitly so a future parallelization doesn't reintroduce the flake.
Test / testForkedParallel := false
run / fork := true
// Forked `run` output goes straight to this process's stdout/stderr instead
// of through sbt's logger, which prefixes every line with `[info] ` — the
// reason the driver's bench parser has read `parsed: null` since round 1
// (BENCH_r*.json archives `[info] {"metric":...}`, which is not JSON).
// Measurement-path unchanged: same forked JVM, same flags; only the pipe
// the contract line travels through. (VERDICT r14 "next round" #3.)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // deep GBT boosting chains deserialize deeply-nested closures
  "-Xss8m",
  // 63 gated queries x several codegen units x C2 can exhaust the default
  // 240m code cache mid-suite; when that happens HotSpot disables the JIT
  // and hot single-task stages run interpreted — the intermittent
  // single-thread ~100s burns the bench watchdog hunts. Headroom + a
  // loud flag if it ever fills anyway.
  "-XX:ReservedCodeCacheSize=1g",
) ++
  // A/B hook for JVM flags (GC experiments etc.) without editing the build:
  // SPARK_GRAFT_JVM="-XX:+UseParallelGC -Xmx24g" (read at sbt startup)
  sys.env.get("SPARK_GRAFT_JVM").map(_.split(" ").filter(_.nonEmpty).toSeq)
    .getOrElse(Nil)
