package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class PollSourceSpec extends SparkSpec {

  private def rec(ts: String, t: Double, h: Double): String =
    s"""{"TimeZone":"UTC","Humidity":"$h","Temperature":"$t","Timestamp":"$ts"}"""

  // snapshot 1: A@10:00, B@11:00 (watermark), F missing-ts (epoch default)
  private val snap1 =
    s"""{"2024-03-02":{"10:00:00":${rec("2024-03-02 10:00:00", 21.0, 40.0)},
       |"11:00:00":${rec("2024-03-02 11:00:00", 22.0, 41.0)},
       |"no_ts":{"TimeZone":"UTC","Humidity":"9.0","Temperature":"9.0"}}}""".stripMargin
  // snapshot 2 = snap1 ∪ {C at the 11:00 boundary, D@12:00, E@09:00 late,
  // G missing-ts late} — only C and D are new-and-eligible
  private val snap2 =
    s"""{"2024-03-02":{"10:00:00":${rec("2024-03-02 10:00:00", 21.0, 40.0)},
       |"11:00:00":${rec("2024-03-02 11:00:00", 22.0, 41.0)},
       |"no_ts":{"TimeZone":"UTC","Humidity":"9.0","Temperature":"9.0"},
       |"11:00:01":${rec("2024-03-02 11:00:00", 23.0, 42.0)},
       |"12:00:00":${rec("2024-03-02 12:00:00", 24.0, 43.0)},
       |"09:00:00":${rec("2024-03-02 09:00:00", 19.0, 39.0)},
       |"no_ts_2":{"TimeZone":"UTC","Humidity":"8.0","Temperature":"8.0"}}}""".stripMargin

  // The file sink (not memory — it cannot resume a checkpoint) keeps the
  // landing exactly-once across the two runs via its _spark_metadata log.
  private def runOnce(transport: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format("graft-poll")
      .option("transport", transport)
      .option("pollIntervalMs", "0")
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("poll source lands the snapshot once, then only the >= delta minus the boundary record") {
    val f = new ScriptedSnapshot(snap1)
    TreeFetchers.register("spec-delta", f)
    try {
      val ckpt = Files.createTempDirectory("poll_ckpt").toString
      val out = Files.createTempDirectory("poll_out").toString
      runOnce("spec-delta", ckpt, out)
      def landed(): Set[(String, String)] = spark.read.parquet(out).collect()
        .map(r => (r.getString(1), r.getString(5))).toSet
      // batch 1: A, B, and the missing-ts record (epoch >= epoch threshold)
      assert(landed() === Set(
        ("10:00:00", "2024-03-02 10:00:00"),
        ("11:00:00", "2024-03-02 11:00:00"),
        ("no_ts", null)))

      f.snapshot = snap2
      runOnce("spec-delta", ckpt, out) // same checkpoint → resumes offset
      // delta adds C (new key AT the 11:00 watermark) and D; NOT B again
      // (boundary dedupe), NOT E (late, < watermark), NOT G (epoch < wm)
      assert(landed() === Set(
        ("10:00:00", "2024-03-02 10:00:00"),
        ("11:00:00", "2024-03-02 11:00:00"),
        ("no_ts", null),
        ("11:00:01", "2024-03-02 11:00:00"),
        ("12:00:00", "2024-03-02 12:00:00")))
    } finally TreeFetchers.unregister("spec-delta")
  }

  test("pollIntervalMs rate-limits the endpoint under a fast trigger") {
    val f = new ScriptedSnapshot(snap1)
    TreeFetchers.register("spec-rate", f)
    try {
      val ckpt = Files.createTempDirectory("poll_ckpt_rate").toString
      val q = spark.readStream.format("graft-poll")
        .option("transport", "spec-rate")
        .option("pollIntervalMs", "3600000") // one fetch per hour
        .load()
        .writeStream.format("memory").queryName("poll_rate_out")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("10 milliseconds"))
        .start()
      try {
        q.processAllAvailable()
        Thread.sleep(200) // many triggers elapse; interval admits no re-fetch
        q.processAllAvailable()
        assert(f.fetches.get() === 1)
        assert(spark.table("poll_rate_out").count() === 3)
      } finally q.stop()
    } finally TreeFetchers.unregister("spec-rate")
  }

  test("replayed offset range re-slices the live snapshot (restart recovery)") {
    val f = new ScriptedSnapshot(snap2)
    TreeFetchers.register("spec-replay", f)
    try {
      val stream = new PollMicroBatchStream(Map("transport" -> "spec-replay"))
      // checkpointed offsets from a lost run: batch (1 → 2] covered the
      // 11:00-watermark boundary key plus everything after 10:00
      val s = PollOffset(1L, "2024-03-02 10:00:00", Seq("2024-03-02|10:00:00"))
      val e = PollOffset(2L, "2024-03-02 11:00:00", Seq("2024-03-02|11:00:00", "2024-03-02|11:00:01"))
      val parts = stream.planInputPartitions(s, e)
      val keys = parts.flatMap(_.asInstanceOf[PollPartition].rows).map(_.timeKey).toSet
      assert(keys === Set("11:00:00", "11:00:01")) // not 10:00 (emitted), not 12:00 (> end)
    } finally TreeFetchers.unregister("spec-replay")
  }

  test("offset json round-trips and orders boundary keys deterministically") {
    val o = PollOffset(7L, "2024-03-02 11:00:00", Seq("b|2", "a|1"))
    val back = PollOffset.fromJson(o.json())
    assert(back.poll === 7L && back.watermark === o.watermark)
    assert(back.boundary === Seq("a|1", "b|2"))
    assert(PollOffset.fromJson(back.json()) === back)
  }

  test("http fetcher builds Firebase-style auth without leaking tokens into options") {
    val env = Map("FB_TOK" -> "s3cret").get _
    val param = new HttpTreeFetcher("https://x.example/db.json",
      authTokenEnv = Some("FB_TOK"), authMode = "param", env = env)
    assert(param.requestUri.toString === "https://x.example/db.json?auth=s3cret")
    val bearer = new HttpTreeFetcher("https://x.example/db.json",
      authTokenEnv = Some("FB_TOK"), authMode = "bearer", env = env)
    assert(bearer.requestUri.toString === "https://x.example/db.json")
    assert(bearer.buildRequest.headers().firstValue("Authorization").get() === "Bearer s3cret")
    val anon = new HttpTreeFetcher("https://x.example/db.json", env = env)
    assert(anon.requestUri.toString === "https://x.example/db.json")
    assert(!anon.buildRequest.headers().map().containsKey("Authorization"))
  }

  test("live poll stream feeds the SCD2 sink end-to-end (the reference's live pipeline)") {
    import org.apache.spark.sql.functions.col
    import java.sql.Timestamp
    val f = new ScriptedSnapshot(snap1)
    TreeFetchers.register("spec-e2e", f)
    try {
      val dir = Files.createTempDirectory("poll_e2e")
      val ckpt = dir.resolve("ckpt").toString
      val store = new graft.store.TableStore(spark, dir.resolve("store").toString)
      def runOnce(): Unit = {
        val landing = StreamingIngest.pollLandingStream(spark, "DEV01",
          Map("transport" -> "spec-e2e", "pollIntervalMs" -> "0"))
        StreamingIngest.scd2Sink(landing, store, "hist", ckpt,
          clock = () => Timestamp.valueOf("2024-06-01 00:00:00"),
          trigger = Trigger.AvailableNow()).awaitTermination()
      }
      runOnce()
      // snap1 lands A@10:00 and B@11:00. The missing-ts record reaches
      // the landing (null timestamp) but its null natural key drops at
      // the J4 re-attach equi-join — the same fate Oracle's `SRC.k =
      // EXT.k` deals it in the reference (null = null is not true), so
      // the historized count is 2, not 3.
      val after1 = store.read("hist")
      assert(after1.count() === 2)
      assert(after1.filter(col("da_current_flag") === "Y").count() === 2)

      f.snapshot = snap2 // delta = C (B's natural key, changed payload) and D@12:00
      runOnce()
      val after2 = store.read("hist")
      // C shares B's natural key (DEV01, 11:00) with a changed payload →
      // SCD2 'U': B's version closes, C's opens; D is a plain insert
      assert(after2.count() === 4)
      assert(after2.filter(col("da_current_flag") === "Y").count() === 3)
      val bRow = after2.filter(col("temperature") === "22.0").collect()
      assert(bRow.length === 1 && bRow.head.getAs[String]("da_current_flag") === "N")
      assert(after2.filter(col("temperature") === "23.0")
        .filter(col("da_current_flag") === "Y").count() === 1)
    } finally TreeFetchers.unregister("spec-e2e")
  }

  test("empty and all-late snapshots produce no batch (offset does not advance)") {
    val f = new ScriptedSnapshot("{}")
    TreeFetchers.register("edge-empty", f)
    try {
      val stream = new PollMicroBatchStream(
        Map("transport" -> "edge-empty", "pollintervalms" -> "0"))
      val o0 = stream.initialOffset().asInstanceOf[PollOffset]
      // empty tree → offset does not advance
      assert(stream.latestOffset(o0, null) === o0)
      // snapshot entirely below the restored watermark → still no batch
      f.snapshot = """{"2024-01-01":{"t1":{"Timestamp":"2024-01-01 00:00:00"}}}"""
      val restored = PollOffset(5L, "2030-01-01 00:00:00", Seq.empty)
      assert(stream.latestOffset(restored, null)
        .asInstanceOf[PollOffset].poll === 5L)
    } finally TreeFetchers.unregister("edge-empty")
  }

  test("tree parse tolerates malformed shapes") {
    assert(PollTreeJson.parse("null").isEmpty)
    assert(PollTreeJson.parse("[1,2]").isEmpty)
    assert(PollTreeJson.parse("""{"d":{"t":{}}}""").head.ts === null)
  }
}
