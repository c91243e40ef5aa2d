package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture tool for the optimization rounds: writes each named
  * query's `explain("formatted")` output to `plans/<tag>/<name>_<suffix>.txt`
  * so the before/after plan evidence the round deliverable asks for is
  * reproducible (`tools/run.sh graft.PlanDump <sfDir> <outDir> <suffix>
  * <query...>`). Building a query may EXECUTE its eager setup (index
  * builds, fit collects) — same contract as PlanSweep.
  *
  * Not a driver surface: no timing, no JSON line; purely a developer
  * tool, like PlanSweep.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <query...>")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $name ($suffix)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
