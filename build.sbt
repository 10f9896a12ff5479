ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdataelectricityspark"
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
)

// ---- Test budget (r19, VERDICT r18 item 4) -------------------------------
// The functional suite outgrew the driver's verify window (r18:
// tests_ok=false on a tail of pure passes — the run was CUT, not broken;
// 1271 green in 25m52s per SURVEY). Two levers, no coverage deleted:
//  1. Soak/sweep suites (streaming scorecard soak, purge stress, PQ
//     training, MV-rewrite sweep, maintained-view streaming, CDC corpus
//     refresh) carry @org.scalatest.tags.Slow and are excluded from the
//     default `test` TASK only — `testOnly` still runs them, and the
//     `slowTests` alias runs exactly that set (kept green per round; see
//     OPTIMIZATION_r19.md).
//  2. The remaining suites fork FOUR concurrent JVMs, grouped by measured
//     suite cost (r19 full -oD run). Each group gets its OWN
//     java.io.tmpdir, so per-query scratch dirs (queries.Scratch keys on
//     query name under tmpdir) can never race across JVMs.
Test / test / testOptions +=
  Tests.Argument(TestFrameworks.ScalaTest, "-l", "org.scalatest.tags.Slow")
addCommandAlias("slowTests", "Test / testOnly * -- -n org.scalatest.tags.Slow")

// heaviest suites pinned for balance; everything else hashes across groups
val testGroupPins: Map[String, Int] = Map(
  "graft.QueriesSpec" -> 0,           // 364 s
  "graft.PlanShapeSpec" -> 1,         // 189 s
  "graft.SurvivalSpec" -> 2,          //  90 s
  "graft.VersionedTableSpec" -> 3,    //  62 s
  "graft.BucketedJoinSpec" -> 2,      //  43 s
  "graft.CorpusPipelineSpec" -> 3,    //  33 s
  "graft.MvSqlSpec" -> 1,             //  30 s
  "graft.BpeSpec" -> 2,               //  30 s
  "graft.TypedIndexSpec" -> 3,        //  27 s
  "graft.ExperimentReportSpec" -> 1,  //  26 s
)
val nTestGroups = 4
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value
  (0 until nTestGroups).map { g =>
    val dir = file(s"target/testtmp-g$g")
    IO.createDirectory(dir)
    val opts = ForkOptions().withRunJVMOptions(
      (baseOpts :+ s"-Djava.io.tmpdir=${dir.getAbsolutePath}").toVector)
    Tests.Group(
      s"g$g",
      tests.filter(t => testGroupPins.getOrElse(
        t.name, math.abs(t.name.hashCode) % nTestGroups) == g),
      Tests.SubProcess(opts))
  }
}
// REPLACE (not append) the default restrictions: sbt ships
// Tags.limit(ForkedTestGroup, 1) and the most-restrictive limit wins, so
// an appended higher limit is a no-op and the groups run sequentially
// (measured: 34m53s, i.e. no speedup, on the first grouped run).
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(8, nTestGroups + 2)),
  Tags.limit(Tags.ForkedTestGroup, nTestGroups),
)
