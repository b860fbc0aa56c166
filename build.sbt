ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "efrelodelasticsearchtoolsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// forked run output passes through UNPREFIXED (no "[info] ") — the bench
// driver machine-parses the one JSON line graft.Bench prints to stdout,
// and sbt's default logger prefix made that line unparseable as JSON
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
  // default heap raised 8g -> 16g for the optimization rounds: the r06
  // bench window showed 4-6x spikes on individual queries (e.g. b94_profile
  // 0.84s min vs 13.6s worst sample) consistent with ParallelGC full
  // collections under 32 allocation-heavy task threads; the box has 128 GiB
  // and the off-heap execution region (1 GiB/core) is separate. Still
  // parameterised via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // throughput collector: G1 falls behind the allocation rate of 32
  // concurrent tokenize/score tasks in local mode (measured: query phase 3x
  // slower at local[32] than local[8] with <1% host steal)
  "-XX:+UseParallelGC",
) ++
  // Optional Eden pin for GC experiments. VERDICT-round-2 finding: do NOT
  // pin by default — a large -Xmn starves the old gen that Spark's unified
  // memory (0.6 x heap) promotes into, causing full-GC thrash (paired
  // back-to-back at 2M docs, tmpfs source: postings chain 78.4 s with
  // default sizing vs 136.9 s with -Xmn28g/-Xmx40g; an earlier apparent
  // Xmn win was a host-noise confound).
  sys.env.get("SPARK_XMN").map(x => s"-Xmn$x").toSeq
