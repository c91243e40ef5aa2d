package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall seconds.
  *
  * Queries are forced through the `noop` sink so every column of every
  * operator is fully evaluated (a bare `count()` lets Catalyst prune the
  * projections that the engine is supposed to be computing).
  *
  * Args (optional): query names to run — default all of
  * SparkEntry.queries. Env: SPARK_GRAFT_SF_DIR (data dir),
  * SPARK_GRAFT_CPUS (local[N] + shuffle partitions, default 32),
  * SPARK_GRAFT_EXPLAIN=1 (print the formatted plan per query to stderr),
  * SPARK_GRAFT_RESTART_EVERY (stop + rebuild the SparkSession every N
  * queries, default 25).
  */
object Bench {

  private def makeSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed job: session/executor init and the noop-sink classload
    // land here instead of inside whichever query happens to run first
    // (map iteration order is hash-based, so without this the warmup tax
    // moves between queries across rounds and reads as a regression)
    spark.range(16).repartition(4).write.format("noop").mode("overwrite").save()
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    // at 157 queries a single JVM's accumulated heap/metaspace (codegen
    // classes, listener state, shuffle bookkeeping) inflates late queries
    // ~1.3-1.8× vs isolated runs (judged r5) — poisoning regression
    // detection. A periodic stop-and-rebuild resets that tax; the rebuild
    // cost lands in an untimed warmup job.
    val restartEvery =
      sys.env.getOrElse("SPARK_GRAFT_RESTART_EVERY", "25").toInt
    var spark = makeSession(cpus)
    val selected =
      if (args.nonEmpty) args.toSeq.map(n => n -> SparkEntry.queries(n))
      else SparkEntry.queries.toSeq.sortBy(_._1) // stable cross-round order
    val results = selected.zipWithIndex.map { case ((name, fn), i) =>
      if (i > 0 && restartEvery > 0 && i % restartEvery == 0) {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        System.gc()
        spark = makeSession(cpus)
      }
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        if (explain) {
          System.err.println(s"===== $name =====")
          System.err.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
        df.write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // drop per-query persisted intermediates (shingle indexes, SCD2
      // deltas) so queries are measured independently. clearCache only
      // covers catalog-cached plans; localCheckpoint blocks register as
      // persistent RDDs and otherwise accumulate until the ContextCleaner's
      // next GC-driven sweep — measured: they inflate later queries ~4×
      // across an 87-query run. The explicit GC lets the cleaner reap
      // everything the dropped plans still pin.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val longLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(longLine)
    // mechanical per-query regression gate (VERDICT r6 #1): feed the run
    // straight into tools/benchgate.py against the committed baseline so
    // every bench artifact carries the gate's pass/fail verdict
    val gate: String = {
      val base = new java.io.File("BENCH_BASELINE.json")
      val script = new java.io.File("tools/benchgate.py")
      if (!script.exists()) "absent"
      else try {
        val pb = new ProcessBuilder("python3", script.getPath, base.getPath, "-")
        pb.redirectErrorStream(true)
        val p = pb.start()
        p.getOutputStream.write(longLine.getBytes("UTF-8"))
        p.getOutputStream.close()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        val code = p.waitFor()
        out.linesIterator.foreach(l => println(s"[benchgate] $l"))
        code match {
          case 0 => "pass"
          case 1 => "fail"
          case _ => "no-baseline"
        }
      } catch { case scala.util.control.NonFatal(_) => "error" }
    }
    // the per-query line above has outgrown the driver's tail window (the
    // sbt [success] footer truncates it from the front → BENCH_r1-r4 all
    // record "parsed": null), so ALSO emit a compact summary LAST: the
    // tail then always ends with one short parseable JSON line — now
    // carrying the gate verdict so it reaches the round artifact even if
    // the [benchgate] lines scroll out of the window
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"gate":"$gate","sf":"$sfDir"}""")
    spark.stop()
  }
}
