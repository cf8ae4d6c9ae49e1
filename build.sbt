ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "externalbenchmarksspark"
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
// The driver parses the LAST stdout line of `runMain graft.Bench` as JSON:
// route forked-run output straight to stdout (no "[info] " prefix) and
// drop sbt's trailing "[success] Total time" epilogue so the bench's
// final println IS the final line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // GC visibility for forked runs (tiny file; invaluable when a latency
  // tier stalls — pause times tell GC apart from scheduler contention)
  "-Xlog:gc:file=/tmp/graft_gc_%p.log:time,uptime",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local mode = one JVM; heap is the only memory knob that matters.
  // The box has 128 GiB — leave room for page cache (parquet IO) and sbt.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Pin the heap at Xmx and fault every page in at JVM startup. Without
  // this, G1 commits heap lazily and each expansion lands first-touch
  // page faults INSIDE evacuation pauses: the r8 GC logs show young
  // pauses of 0.5-1.5 s exactly on the commit bumps (26.9->35.8->41.2->
  // 44.4->46.4 GB) and 0.16-0.22 s for the same collections once the
  // heap stops growing. Pre-touch moves that cost to startup (untimed,
  // parallel), which is the right trade for a bench/latency JVM.
  // SPARK_GRAFT_NO_PRETOUCH=1 restores the FULL lazy-commit behavior for
  // A/Bs: it must drop BOTH flags — with Xms still pinned at Xmx the heap
  // never expands and the commit-bump pause mechanism cannot reproduce.
) ++ (if (sys.env.contains("SPARK_GRAFT_NO_PRETOUCH")) Seq()
      else Seq(s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
        "-XX:+AlwaysPreTouch")) ++ Seq(
  // G1 left to its default 200 ms target grows the young gen to many GB
  // under the commit path's allocation churn, then pays ~1 s evacuation
  // pauses — measured as 1-2.6 s commit stalls (and backlog spirals) in
  // the 200-QPS streaming tier. A tight pause target keeps young
  // collections small and frequent; throughput cost on the batch suite is
  // noise (<2%), latency win on the tier is the difference between
  // passing and failing the p95 bar.
  "-XX:MaxGCPauseMillis=50",
)
