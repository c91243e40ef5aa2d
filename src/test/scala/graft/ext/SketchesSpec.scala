package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct estimate lands within the configured error of exact") {
    val li = graft.Tables.load(spark, sf("sf0.01"), "lineitem")
    val approx = Sketches.approxDistinctProfile(li, "l_returnflag", "l_partkey", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex < 0.1, s"$k: approx $ap vs exact $ex")
    }
  }

  test("approximate quantiles bracket the exact median") {
    val li = graft.Tables.load(spark, sf("sf0.01"), "lineitem")
    val qs = Sketches.quantileProfile(li, "l_quantity", Seq(0.5), relativeError = 0.01)
      .collect()(0).getSeq[Double](0)
    val exact = li.stat.approxQuantile("l_quantity", Array(0.5), 0.0)(0)
    assert(math.abs(qs.head - exact) <= 2.0, s"median ${qs.head} vs $exact")
  }

  test("KMV estimate lands within 3/sqrt(k) of exact, and is exact under k") {
    val ev = graft.Tables.load(spark, sf("sf0.01"), "events")
      .select($"event_type", $"user_id")
    val est = Sketches.kmvDistinct(ev, "event_type", "user_id", k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, ex) =>
      val rel = math.abs(est(g) - ex) / ex
      assert(rel < 3.0 / math.sqrt(64), s"$g: est ${est(g)} vs exact $ex")
    }
    // fewer distinct values than k: the sketch degrades to an exact count
    val tiny = Sketches.kmvDistinct(ev, "event_type", "event_type", k = 64)
      .collect()
    tiny.foreach { r =>
      assert(r.getDouble(3) === 1.0, s"under-k sketch not exact: $r")
    }
  }

  test("KMV excludes nulls, matching countDistinct (ADVICE r7 #1)") {
    // a nullable value column: null must neither rank (Spark windows sort
    // nulls FIRST, DuckDB LAST — a null hash silently diverges the kept
    // state across engines) nor count toward the estimate
    val rows = Seq(("a", "x"), ("a", "y"), ("a", null), ("a", null),
      ("b", null), ("b", "z"))
    val df = rows.toDF("g", "v")
    val hashes = Sketches.kmvHashes(df, "g", "v")
    assert(hashes.filter($"h".isNull).count() === 0L, "null hash leaked")
    val est = Sketches.kmvDistinct(df, "g", "v", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // under-k → exact, and exact means countDistinct semantics (no nulls)
    assert(est("a") === ((2L, 2.0)), s"nulls counted in a: $est")
    assert(est("b") === ((1L, 1.0)), s"nulls counted in b: $est")
  }

  test("KMV sketches merge: union of shard keeps = keep of the union") {
    val ev = graft.Tables.load(spark, sf("sf0.01"), "events")
      .select($"event_type", $"user_id")
    val whole = Sketches.kmvDistinct(ev, "event_type", "user_id", k = 32)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // shard by user parity, merge the kept hash sets, re-derive (n_kept, kth)
    val shards = Seq(0, 1).map { p =>
      val sh = ev.filter($"user_id" % 2 === p)
      sh.select($"event_type", Hashing.hexLong($"user_id".cast("string")).as("h"))
        .distinct().collect().map(r => r.getString(0) -> r.getLong(1))
    }
    val merged = shards.flatten.groupBy(_._1).map { case (g, hs) =>
      val keep = hs.map(_._2).distinct.sorted.take(32)
      (g, keep.size.toLong, keep.last)
    }.toSet
    assert(merged === whole)
  }

  test("rollup KMV profile: derived levels obey the 3/sqrt(k) bound vs exact") {
    // the composed path (VERDICT r7 #7): per-source and grand-total rows
    // are DERIVED from leaf keeps, so this checks the estimator's error
    // bound survives the merge chain, not just the direct sketch
    val docs = graft.Tables.load(spark, sf("sf0.01"), "documents")
    val prof = Curation.corpusReportKmv(docs, k = 64)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        (r.getLong(2), r.getDouble(4))).toMap
    def exact(df: org.apache.spark.sql.DataFrame): Long =
      df.select(countDistinct($"text")).collect()(0).getLong(0)
    val bound = 3.0 / math.sqrt(64)
    // grand total
    val exTot = exact(docs)
    val (nkTot, estTot) = prof((None, None))
    if (nkTot < 64) assert(estTot === exTot.toDouble)
    else assert(math.abs(estTot - exTot) / exTot < bound,
      s"total: est $estTot vs exact $exTot")
    // every per-source subtotal
    docs.select($"source").distinct().collect().map(_.getString(0)).foreach { s =>
      val ex = exact(docs.filter($"source" === s))
      val (nk, est) = prof((Some(s), None))
      if (nk < 64) assert(est === ex.toDouble, s"source $s under-k")
      else assert(math.abs(est - ex) / ex < bound,
        s"source $s: est $est vs exact $ex")
    }
  }

  test("lattice quantiles are true corpus values at ceil ranks; shards merge") {
    // group a: units 1..10 — p50 = 5th smallest = 5, p90 = 9th = 9,
    // p100 = 10 (the ceil contract at exactly-integral q·n); group b:
    // all mass on one unit — every quantile is that unit
    val rows = (1L to 10L).map(u => ("a", u)) ++ Seq.fill(3)(("b", 7L))
    val df = rows.toDF("g", "u")
    val qs = Seq("p50" -> 500000L, "p90" -> 900000L, "p100" -> 1000000L)
    val hist = Sketches.latticeHistogram(df, "g", $"u")
    def profile(h: org.apache.spark.sql.DataFrame) =
      Sketches.latticeQuantiles(h, "g", qs).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val p = profile(hist)
    assert(p("a") === ((10L, 5L, 9L, 10L)), s"wrong ranks: $p")
    assert(p("b") === ((3L, 7L, 7L, 7L)), s"point mass must dominate: $p")
    // merge law: histograms from disjoint shards fold to the same profile
    val s1 = Sketches.latticeHistogram(df.filter($"u" % 2 === 0), "g", $"u")
    val s2 = Sketches.latticeHistogram(df.filter($"u" % 2 =!= 0), "g", $"u")
    assert(profile(Sketches.mergeLatticeHistograms(Seq(s1, s2), "g")) === p)
    // overlapping shards also merge (counts ADD, they don't dedup)
    val h1 = Sketches.latticeHistogram(df, "g", $"u")
    val doubled = profile(Sketches.mergeLatticeHistograms(Seq(h1, h1), "g"))
    assert(doubled("a")._1 === 20L && doubled("a")._2 === 5L,
      s"doubling mass must double n and keep quantiles: $doubled")
  }

  test("CMS estimates are one-sided: never below exact, tight when uncrowded") {
    val vals = (Seq.fill(50)("hot") ++ Seq.fill(7)("warm") ++
      (0 until 30).map(i => s"cold$i"))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // width 4 forces collisions: estimates must still never undercount
    val narrow = Sketches.cmsBuild(df, "v", depth = 3, width = 4)
    val cand = df.select($"v").distinct()
    val estN = Sketches.cmsEstimate(narrow, cand, "v", depth = 3, width = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (v, n) =>
      assert(estN(v) >= n, s"undercount for $v: ${estN(v)} < $n")
    }
    // default width (1024) on 32 distinct values: no collisions, exact
    val wide = Sketches.cmsBuild(df, "v")
    val estW = Sketches.cmsEstimate(wide, cand, "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estW === exact)
    // absent candidate reads 0 through all-null joins
    val est0 = Sketches.cmsEstimate(wide, Seq("nope").toDF("v"), "v")
      .collect()
    assert(est0.length === 1 && est0(0).getLong(1) === 0L)
  }

  test("CMS shard sketches merge to the whole-corpus build") {
    val df = (0 until 200).map(i => (i.toLong, s"t${i % 13}")).toDF("id", "v")
    val shards = (0 until 4).map(k => Sketches.cmsBuild(
      df.filter($"id" % 4 === k), "v"))
    val merged = Sketches.cmsMerge(shards)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.cmsBuild(df, "v")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole)
  }

  test("heavy hitters finds the true top groups with exact counts") {
    val ev = graft.Tables.load(spark, sf("sf0.01"), "events")
    val top = Sketches.heavyHitters(ev, "event_type", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val all = ev.groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(t => (-t._2, t._1))
    assert(top.toSeq === all.take(3).toSeq)
  }

  test("portable HLL: registers are deterministic, estimate lands near exact") {
    val df = (0 until 5000).map(i => ("g", (i % 1300).toLong)).toDF("g", "v")
    val regs = Sketches.hllRegisters(df, "g", "v")
    // state is bounded by the bucket count and re-building reproduces it
    assert(regs.count() <= Sketches.hllBuckets)
    val again = Sketches.hllRegisters(df, "g", "v")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(regs.collect().map(r => (r.getLong(1), r.getLong(2))).toSet === again)
    val est = Sketches.hllEstimate(regs, "g").collect().head
      .getAs[Double]("est_distinct")
    // raw HLL with m=64 has rsd ~1.04/8 = 13%; allow 3 sigma
    assert(math.abs(est - 1300.0) / 1300.0 < 0.4, s"estimate $est vs 1300")
  }

  test("portable HLL: merge is register-wise max, idempotent under re-delivery") {
    val df = (0 until 3000).map(i => ("g", i.toLong)).toDF("g", "v")
    val shards = (0 until 3).map(k =>
      Sketches.hllRegisters(df.filter($"v" % 3 === k), "g", "v"))
    val whole = Sketches.hllRegisters(df, "g", "v")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val merged = Sketches.hllMerge(shards, "g")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(merged === whole)
    // re-delivering a shard cannot move the sketch (max is idempotent)
    val redelivered = Sketches.hllMerge(shards :+ shards.head, "g")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(redelivered === whole)
  }

  test("portable HLL: untouched registers read rho 0 and estimate stays finite") {
    val tiny = Seq(("g", 1L), ("g", 2L)).toDF("g", "v")
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(tiny, "g", "v"), "g").collect().head
    assert(est.getAs[Long]("n_zero") >= 60L) // 2 values touch ≤ 2 buckets
    assert(est.getAs[Double]("est_distinct") > 0.0)
  }
}
