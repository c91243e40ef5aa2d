package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate aggregates for corpus-scale profiling (engine capability
  * beyond reference parity — the reference's only aggregates are scalar
  * MAXes, SURVEY §2.4).
  *
  * These are the one-pass, fixed-memory summaries a 100 TB profile run
  * needs: HyperLogLog++ cardinalities and t-digest-style quantiles, both
  * map-side partial and mergeable (Spark's native sketch aggregates).
  * No DuckDB oracle — sketch internals differ across engines — so their
  * contracts are spec-tested against exact answers with error bounds
  * (SketchesSpec) instead of hash-compared.
  */
object Sketches {

  /** Distinct-count profile per group: HLL++ estimate next to the scan's
    * exact count, with relative standard deviation `rsd`. */
  def approxDistinctProfile(df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.02): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
        count(col(valueCol)).as("n_rows"))

  /** Quantile summary of a numeric column (single-pass, mergeable). */
  def quantileProfile(df: DataFrame, valueCol: String,
      quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
      relativeError: Double = 0.01): DataFrame =
    df.agg(percentile_approx(col(valueCol),
      typedlit(quantiles), lit((1.0 / relativeError).toInt)).as("quantiles"))

  /** Frequent-items sketch via count-min-style grouping: top-k heavy
    * hitters with exact counts after a candidate pass. One shuffle of
    * (value, partial count) pairs. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.groupBy(col(valueCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(valueCol))
      .limit(k)

  /** Count-min sketch (Cormode & Muthukrishnan 2005) in TABLE form:
    * depth×width counters as (r, bucket, cnt) rows. Like KMV, the hash
    * family is the portable md5 parity trick, so the sketch — and every
    * estimate read from it — is bit-reproducible in any engine, making
    * CMS the oracle-checkable sibling of the spec-only HLL profile.
    *
    * Estimate(v) = min over rows r of counter[r][h_r(v) mod width]; the
    * error is ONE-SIDED (never under the true count, over by ≤ 2N/width
    * w.p. 1−2^−depth) — the conservative direction for cap/quota
    * decisions: a term can look at most too hot, never too cold.
    *
    * Scale shape: the build explodes each value into `depth` (r, bucket)
    * pairs and aggregates — map-side combine collapses every partition
    * to ≤ depth·width rows before the exchange, so the shuffle is sketch-
    * sized, not corpus-sized, regardless of input volume. Shard sketches
    * merge by (r, bucket) sum ([[cmsMerge]]), the standard distributed
    * accumulation. */
  val cmsDepth = 4
  val cmsWidth = 1024

  /** Row-r bucket of a value: portable md5 hash, seeded by row index. */
  def cmsBucket(value: Column, r: Int, width: Int): Column =
    Hashing.hexInt(concat(lit(s"cms$r:"), value)) % width

  /** Build the (r, bucket, cnt) counter table over `valueCol`. */
  def cmsBuild(df: DataFrame, valueCol: String, depth: Int = cmsDepth,
      width: Int = cmsWidth): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(explode(array((0 until depth).map { r =>
        struct(lit(r).as("r"), cmsBucket(col(valueCol), r, width).as("bucket"))
      }: _*)).as("rb"))
      .groupBy(col("rb").getField("r").as("r"),
        col("rb").getField("bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge shard sketches built with the same depth/width. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `candidates`: min over depth rows; a bucket the
    * sketch never touched reads 0 (candidate absent from the build). */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame,
      valueCol: String, depth: Int = cmsDepth,
      width: Int = cmsWidth): DataFrame =
    candidates
      .select(col("*"), explode(array((0 until depth).map { r =>
        struct(lit(r).as("r"), cmsBucket(col(valueCol), r, width).as("bucket"))
      }: _*)).as("rb"))
      .select(col(valueCol), col("rb").getField("r").as("r"),
        col("rb").getField("bucket").as("bucket"))
      .join(sketch, Seq("r", "bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_n"))

  /** Domain of [[Hashing.hexLong]]: 15 md5 hex digits = 60 uniform bits. */
  val kmvHashDomain: Long = 1L << 60

  /** KMV (k-minimum-values) distinct sketch per group — the DETERMINISTIC
    * sibling of [[approxDistinctProfile]]. HLL internals differ across
    * engines, so that profile can only be spec-tested against error
    * bounds; KMV over a portable hash is reproducible bit-for-bit in any
    * engine, which makes the estimate itself oracle-checkable AND makes
    * repeated profile runs of the same corpus byte-stable (a property a
    * training-data audit trail wants from its cardinality numbers).
    *
    * Estimator (Bar-Yossef et al. 2002): hash each value uniformly into
    * [0, 2⁶⁰), keep the k smallest DISTINCT hashes; with U(k) the k-th
    * smallest, estimate = (k−1)·2⁶⁰/U(k). Fewer than k distinct hashes
    * means the sketch saw the whole set — the count is exact. The sketch
    * is mergeable (union = k smallest of the union of keeps), so partial
    * sketches from corpus shards combine without rescanning.
    *
    * Fixed-point arithmetic: (k−1)·2⁶⁰·10⁴ overflows int64, so the
    * estimate runs in decimal(38,0) (HUGEINT in the oracle) with the
    * engine-portable ⌊·⌋ spelling `(x − x mod d)/d`; the one
    * decimal→double cast of the ≤10⁴-scaled exact quotient is lossless.
    *
    * Scale shape: one map-side-combined distinct on (group, hash), then a
    * rank-filter window that Spark rewrites to a WindowGroupLimit — each
    * map task forwards at most k rows per group BEFORE the exchange, so
    * the shuffle carries O(groups·k), not the distinct-hash volume. The
    * final per-group agg is k rows each. Nothing global, no collect. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame =
    kmvProfile(kmvKeep(kmvHashes(df, groupCol, valueCol), groupCol, k),
      groupCol, k)

  /** The sketch's hash projection: (group, 60-bit portable hash). */
  def kmvHashes(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    kmvHashes(df, Seq(groupCol), valueCol)

  /** Multi-column-group variant (a rollup profile sketches on
    * (source, lang) leaves).
    *
    * Null values are EXCLUDED from the sketch (matching `countDistinct`,
    * which never counts nulls). Without the filter a null value hashes to
    * a null `h`, and Spark's rank window (ORDER BY h ASC) sorts nulls
    * FIRST while DuckDB's sorts them LAST — the kept states, and thus the
    * estimates, would silently diverge on any nullable column. */
  def kmvHashes(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        Hashing.hexLong(col(valueCol).cast("string")).as("h"): _*)

  /** Keep the k smallest distinct hashes per group — the sketch's whole
    * state, and its merge: `kmvKeep(keepA ∪ keepB)` IS the sketch of the
    * union (k-min of union = k-min of union of k-mins). The rank filter
    * compiles to a map-side WindowGroupLimit. */
  def kmvKeep(hashes: DataFrame, groupCol: String, k: Int): DataFrame =
    kmvKeep(hashes, Seq(groupCol), k)

  /** Multi-column-group variant. An EMPTY groupCols is the grand-total
    * sketch: the window goes global — safe only when the input is already
    * a kept-state union (O(groups·k) rows), which is exactly the merge
    * use-case that needs it. */
  def kmvKeep(hashes: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    hashes.select((groupCols.map(col) :+ col("h")): _*).distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select((groupCols.map(col) :+ col("h")): _*)
  }

  /** Collapse a [[kmvKeep]] state to the profile row
    * (group, n_kept, kth_hash, est_distinct). */
  def kmvProfile(kept: DataFrame, groupCol: String, k: Int): DataFrame =
    kmvProfile(kept, Seq(groupCol), k)

  /** Multi-column-group variant (empty groupCols = the grand total). */
  def kmvProfile(kept: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val dec = "decimal(38,0)"
    val scaled = lit(k - 1).cast(dec) * lit(kmvHashDomain).cast(dec) *
      lit(10000L).cast(dec)
    val kth = col("kth_hash").cast(dec)
    kept.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
      .select(groupCols.map(col) ++ Seq(col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k || col("kth_hash") === 0L,
            col("n_kept").cast("double"))
          .otherwise(((scaled - pmod(scaled, kth)) / kth).cast("double") /
            10000.0)
          .as("est_distinct")): _*)
  }

  // ------------------------------------------------------------- HLL
  /** Deterministic HyperLogLog (Flajolet et al. 2007) over the portable
    * 60-bit hash — the FIXED-STATE sibling of KMV: the sketch is always
    * exactly `hllBuckets` max-registers per group (KMV state grows to k
    * distinct hashes; HLL state is constant from the first row), and the
    * merge law is register-wise MAX — the idempotent, commutative,
    * re-delivery-proof fold a streaming/multi-shard cardinality pipeline
    * wants (adding the same shard twice cannot move an HLL, but CAN
    * corrupt a naive counter).
    *
    * Spark's own approx_count_distinct is HLL++ with non-portable
    * internals (spec-tested in [[approxDistinctProfile]]); this variant
    * is built from md5 bits, so registers AND estimate are bit-identical
    * in any engine — oracle-checkable like KMV.
    *
    * Layout of the 60-bit hash: bucket = h mod 64 (6 bits), the
    * remaining w = ⌊h/64⌋ is a 54-bit field, and the register update is
    * rho(w) = leading zeros of w in that field + 1 = 55 − bit_length(w)
    * (w = 0 ⇒ 55). bit_length goes through the BINARY-STRING length —
    * `length(bin(w))` — which both engines define identically for
    * nonnegative longs; no float log2 anywhere.
    *
    * Estimate on the q4 lattice with the standard α₆₄ fixed at the
    * rational 709/1000:
    *   est_q4 = ⌊709 · 64² · 2⁶⁰ · 10⁴ / (1000 · Σ_j 2^(60−M_j))⌋
    * (the indicator sum Σ2^(−M_j) scaled by 2⁶⁰ so it is an exact
    * integer; decimal(38,0) throughout). No small-range linear-counting
    * branch — that needs ln(), which hash-flakes; the raw estimate's
    * low-cardinality bias is visible next to `n_zero` (untouched
    * registers) and the exact count in the registered query, which is
    * the honest way to publish it.
    *
    * Scale shape: one map-side-combined (group, bucket) MAX shuffle —
    * ≤ 64 rows per group per map task cross the wire regardless of input
    * volume; the estimate runs over groups·64 rows. */
  val hllBuckets = 64

  /** Register table (group, bucket, m_j) — the sketch state. */
  def hllRegisters(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val h = Hashing.hexLong(col(valueCol).cast("string"))
    val m = lit(hllBuckets.toLong)
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), pmod(h, m).as("bucket"),
        // 64 = 2⁶, h ≥ 0: the shift IS ⌊h/64⌋, exactly (a long `/` would
        // detour through double and lose bits past 2⁵³)
        shiftright(h, 6).as("w"))
      .select(col(groupCol), col("bucket"),
        when(col("w") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("w")))).as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("m_j"))
  }

  /** Merge shard register tables: register-wise max (idempotent). */
  def hllMerge(sketches: Seq[DataFrame], groupCol: String): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col(groupCol), col("bucket")).agg(max(col("m_j")).as("m_j"))

  /** Collapse registers to (group, n_zero, est_distinct). Untouched
    * buckets read m_j = 0 via a dense 64-slot grid (broadcast cross of
    * the group list × bucket range). */
  def hllEstimate(registers: DataFrame, groupCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    // 709 · 64² · 2⁶⁰ · 10⁴, exact
    val numConst = BigInt(709) * 4096 * (BigInt(1) << 60) * 10000
    val groups = registers.select(col(groupCol)).distinct()
    val grid = groups.crossJoin(
      broadcast(registers.sparkSession.range(hllBuckets)
        .select(col("id").as("bucket"))))
    val full = grid.join(registers, Seq(groupCol, "bucket"), "left")
      .select(col(groupCol), coalesce(col("m_j"), lit(0L)).as("m_j"))
    val term = expr("cast(shiftleft(cast(1 as bigint), cast(60 - m_j as int)) " +
      s"as $dec)")
    val s = full.groupBy(col(groupCol))
      .agg(sum(when(col("m_j") === 0L, 1L).otherwise(0L)).as("n_zero"),
        sum(term).as("s"))
    val num = lit(new java.math.BigDecimal(numConst.bigInteger)).cast(dec)
    val den = lit(1000L).cast(dec) * col("s")
    s.select(col(groupCol), col("n_zero"),
      (((num - pmod(num, den)) / den).cast("double") / 10000.0)
        .as("est_distinct"))
  }

  /** Exact MERGEABLE quantile profile over a lattice-quantized value
    * column — the quantile sibling of the KMV sketch, and the
    * deterministic alternative to [[quantileProfile]]'s t-digest-style
    * sketch (whose internals aren't cross-engine portable). Works
    * whenever the value domain is lattice-quantized (money cents, sensor
    * ticks, token counts — most profile targets): the sketch STATE is
    * the exact per-(group, lattice-unit) count histogram, so
    *  - state size is bounded by the VALUE DOMAIN, not the row count;
    *  - merge is count addition (commutative monoid) — shard profiles
    *    and micro-batches fold without rescanning (the streaming face is
    *    [[graft.streaming.EventStreams.rollupSink]] keyed by
    *    (group, unit): its state already carries `cnt`);
    *  - the extracted quantile is a TRUE corpus value (smallest unit
    *    whose cumulative count reaches ⌈q·n⌉) — no interpolation, no
    *    floats, hash-identical in any engine.
    * Contrast with the order-statistics battery (`q_a6_quantiles`),
    * which sorts RAW rows per group: this form sorts only distinct
    * lattice units and is the shape that survives 100 TB and streams. */
  def latticeHistogram(df: DataFrame, groupCol: String,
      valueUnits: Column): DataFrame =
    df.select(col(groupCol), valueUnits.as("unit"))
      .groupBy(col(groupCol), col("unit"))
      .agg(count(lit(1)).as("cnt"))

  /** The merge law: histograms add. Union + re-reduce — the shuffle
    * moves state rows only, never history. */
  def mergeLatticeHistograms(hists: Seq[DataFrame],
      groupCol: String): DataFrame =
    hists.reduce(_.unionByName(_))
      .groupBy(col(groupCol), col("unit"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile extraction from a [[latticeHistogram]] state: for each
    * (name, q-in-ppm), the smallest unit with cum·10⁶ ≥ q_ppm·n — the
    * ceil(q·n) rank test spelled as a pure integer comparison
    * (decimal(38,0), so no division ever happens and no product can
    * overflow below 10³² rows). One per-group running-sum window over
    * DISTINCT units + one aggregate. */
  def latticeQuantiles(hist: DataFrame, groupCol: String,
      qsPpm: Seq[(String, Long)]): DataFrame = {
    require(qsPpm.nonEmpty, "need at least one quantile")
    val dec = "decimal(38,0)"
    // n via an UNORDERED window over the same partition as the running
    // sum — both windows share one exchange, so the histogram (and
    // whatever scan feeds it) is computed ONCE; a groupBy+join spelling
    // would evaluate the input twice (plan-audited)
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("unit"))
    val wAll = Window.partitionBy(col(groupCol))
    val withCum = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val aggs = qsPpm.map { case (name, ppm) =>
      min(when(col("cum").cast(dec) * lit(1000000L).cast(dec) >=
        lit(ppm).cast(dec) * col("n").cast(dec), col("unit"))).as(name)
    }
    withCum.groupBy(col(groupCol), col("n"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("n", "n_rows")
  }
}
