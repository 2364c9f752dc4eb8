ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kaggleecommerceetlspark"
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
// Pass the forked JVM's stdout through UNWRAPPED: the default strategy
// logs child output with an "[info] " prefix, which breaks any consumer
// that scans for a bare JSON line (the bench driver parses Bench's one
// JSON line from stdout — BENCH_r01/r02 both recorded parsed:null).
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
)
// The registry-wide plan lints execute all 350 queries in one JVM;
// give the test fork more headroom than the runMain default (last
// -Xmx wins).
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "12g")}"

// ---- parallel forked test groups ------------------------------------------
// One sequential JVM stopped fitting the driver's 30-minute verification
// budget (VERIFY_r14: tests_ok=false on a timeout at compile+30:00 with no
// failing test). Suites are split into a few forked JVMs that run
// CONCURRENTLY, each with its own local[4] SparkSession (TestSpark is
// per-JVM); groups are curated so the heavy suites spread instead of
// hash-landing together. 8 groups x local[4] = the box's 32 cores.
// Each fork gets its own derby.system.home so the in-memory-Derby suites
// never contend on ./derby.log.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value.toVector
  val nGroups = 8
  val pinned: Map[String, Int] = Map(
    "graft.ExtSpec" -> 0,
    "graft.StreamingSpec" -> 1,
    "graft.PropertySpec" -> 2,
    "graft.Rle8Spec" -> 2,
    "graft.PlanGuardSpec" -> 3,
    "graft.SqlApiSpec" -> 3,
    "graft.Ext2Spec" -> 4,
    "graft.CleanersSpec" -> 4,
    "graft.UnigramSpec" -> 4,
    "graft.Ext3Spec" -> 5,
    "graft.PpmSpec" -> 5,
    "graft.LayoutInvarianceSpec" -> 5,
    "graft.ArchiveIndexSpec" -> 6,
    "graft.AsofNativeSpec" -> 6,
    "graft.SchemaCanarySpec" -> 6,
    "graft.OpsSpec" -> 7,
    "graft.Analytics2Spec" -> 7,
    "graft.RetailSpec" -> 7,
    "graft.PgLoadSpec" -> 7,
  )
  tests.groupBy(t => pinned.getOrElse(t.name, math.abs(t.name.hashCode) % nGroups))
    .toSeq.sortBy(_._1).map { case (i, ts) =>
      Tests.Group(
        s"g$i",
        ts.sortBy(_.name),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(
          baseOpts :+ s"-Dderby.system.home=target/derby-g$i")))
    }
}
// let all 8 forked groups run at once (default caps concurrent forked
// test JVMs at 1); `Tags.limitAll` would also gate other tasks, so cap
// the test tag specifically
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8),
  Tags.limitAll(16),
)
