package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Hashing._

/** Training-mix curation operators (north star; no reference equivalent —
  * the reference has no text processing): deterministic stratified
  * sampling, tf-idf salient terms, PII redaction. Like the rest of
  * graft.ext, every operator is engine-checkable: hashing goes through
  * the md5-based [[Hashing.hexInt]] and floats are rounded before any
  * filter or ranking.
  */
object Curation {

  /** Deterministic per-stratum sampling: keep a row iff
    * `hexInt(stratum ':' id) % 100 < rate(stratum)`. Content-hash
    * sampling (never `rand()`): the decision is a pure projection —
    * reproducible across runs, engines, retries and partitionings, and
    * the scan-side filter means a 5 % sample reads like a 5 % table
    * downstream. This is how a 100 TB corpus takes a language-balanced
    * training mix without a shuffle. */
  def stratifiedSample(docs: DataFrame, stratum: Column,
      rates: Map[String, Int], defaultRate: Int,
      idCol: String = "doc_id"): DataFrame = {
    // The stratum can be an arbitrarily expensive tree (the flagship use
    // passes TextAnalysis.langId — tokenize + 4 HOF stopword filters),
    // and it is consumed 3+ places below (bucket hash, rate CASE, output
    // projection). A plain Project alias does NOT pin it to one
    // evaluation: PushPredicateThroughNonJoin inlines aliases into the
    // pushed filter unconditionally, and HOF lambdas defeat codegen
    // subexpression elimination — measured ~4× langId per row, the r12
    // bench regression. explode(array(x)) pins it: a Generate node is a
    // barrier to both CollapseProject and filter pushdown, evaluates x
    // exactly once per row, adds no shuffle, and stays in codegen.
    val once = docs.select(col(idCol),
      explode(array(stratum)).as("stratum"))
    val st = col("stratum")
    val bucket = hexInt(concat(st, lit(":"), col(idCol).cast("string"))) % 100
    val rate = rates.foldRight(lit(defaultRate): Column) { case ((s, r), acc) =>
      when(st === s, lit(r)).otherwise(acc)
    }
    once.select(col(idCol), st, bucket.as("bucket"))
      .filter(col("bucket") < rate)
  }

  /** Top-k salient terms per document by tf-idf.
    *
    * The score is the LOG-FREE variant `tf · N / df` (one integer product
    * + one IEEE division, rounded before ranking): `ln()` is not
    * guaranteed identically rounded across engines, a single division
    * is. Rankings tiebreak on the term itself.
    *
    * Shuffle structure at corpus scale: one exchange on (doc, term) for
    * tf (map-side combined), one much smaller exchange on term for df,
    * the 1-row corpus count broadcasts, and the final top-k window is
    * partitioned by document — nothing global. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = docs.select(col(idCol), explode(words(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    // fixed-point ⌊tf·N·10⁴/df⌋/10⁴ — tf·N/df is a rational; round(…,4)
    // is engine-dependent exactly at decimal midpoints, floor-div is not.
    // The product runs in decimal(38,0): tf·N·10⁴ exceeds int64 once
    // N·tf > ~9·10¹⁴ (a billion-doc corpus meets that with tf in the
    // thousands) and non-ANSI int64 would wrap silently; decimal keeps
    // the quotient exact, and the single decimal→double cast of the
    // exact integer quotient is correctly rounded in every engine.
    val dec = "decimal(38,0)"
    val dfDec = col("df").cast(dec)
    val scaled = col("tf").cast(dec) * col("n").cast(dec) * lit(10000L).cast(dec)
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"),
        (((scaled - pmod(scaled, dfDec)) / dfDec).cast("double") /
          lit(10000.0)).as("score"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"),
        col("rnk").cast("long").as("rnk"))
  }

  /** BM25-shaped retrieval: top-k documents per query, scored with
    * Okapi's tf-saturation and length normalization at k1 = 6/5 and
    * b = 3/4, on the EXACT rational lattice.
    *
    * Per matched query term,
    *   score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with avgdl = T/N (T total tokens, N docs). With the rational k1/b
    * this collapses to one integer fraction:
    *   44·tf·T·(2N − 2df + 1)
    *   ───────────────────────────────── ,
    *   (2df + 1)·(20·tf·T + 6·T + 18·dl·N)
    * where the idf is the Robertson–Sparck-Jones ratio
    * (N − df + ½)/(df + ½) WITHOUT the log — the same log-free choice as
    * [[tfidfTopTerms]], since `ln()` is not identically rounded across
    * engines. The linear idf keeps the logged form's exact df-monotonicity
    * (single-term rankings are identical); multi-term scores weight rare
    * terms more sharply, which this engine pins as the operator's
    * contract. Each term's fraction is floored onto a 10⁻⁶ grid and the
    * per-document score is the integer SUM of those fixed-point terms —
    * order-independent, hence identical under any shuffle and in any
    * engine. Numerators run in decimal(38,0) (HUGEINT in the oracle):
    * 44·tf·T·2N·10⁶ passes int64 already at millions of docs.
    *
    * Scale shape: tf is one map-side-combined shuffle on (doc, term) with
    * dl riding along (no per-doc re-join); df aggregates off tf (small)
    * and the ≤|vocab∩queries|-row result broadcasts back, as do the query
    * terms and the 1-row totals; the per-(query, doc) sum combines
    * map-side; the final top-k is a rank filter that compiles to a
    * map-side WindowGroupLimit. Nothing global, no product with the
    * corpus. */
  def bm25TopDocs(docs: DataFrame, queries: Seq[(Long, Seq[String])],
      k: Int = 10, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty), "empty query set")
    val dec = "decimal(38,0)"
    val base = docs.select(col(idCol), words(col(textCol)).as("ws"))
    val terms = base.select(col(idCol), size(col("ws")).cast("long").as("dl"),
      explode(col("ws")).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tot = base.agg(count(lit(1)).as("n"),
      sum(size(col("ws")).cast("long")).as("t"))
    val spark = docs.sparkSession
    val qTerms = spark.createDataFrame(
      queries.flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) })
      .toDF("query_id", "term")
    def d(x: Column): Column = x.cast(dec)
    val num = d(lit(44)) * d(col("tf")) * d(col("t")) *
      (d(lit(2)) * d(col("n")) - d(lit(2)) * d(col("df")) + d(lit(1))) *
      d(lit(1000000L))
    val den = (d(lit(2)) * d(col("df")) + d(lit(1))) *
      (d(lit(20)) * d(col("tf")) * d(col("t")) + d(lit(6)) * d(col("t")) +
        d(lit(18)) * d(col("dl")) * d(col("n")))
    // df over the FULL vocabulary is too wide to broadcast at corpus
    // scale — semi-join it down to the ≤|query terms| rows that matter
    val qDf = df.join(broadcast(qTerms.select(col("term")).distinct()),
      Seq("term"), "left_semi")
    val perTerm = tf.join(broadcast(qTerms), "term")
      .join(broadcast(qDf), "term")
      .crossJoin(broadcast(tot))
      .select(col("query_id"), col(idCol),
        ((num - pmod(num, den)) / den).cast("long").as("s_q6"))
    val perDoc = perTerm.groupBy(col("query_id"), col(idCol))
      .agg(sum(col("s_q6")).as("s_q6"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("s_q6").desc, col(idCol))
    perDoc.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col(idCol),
        (col("s_q6").cast("double") / 1000000.0).as("bm25"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Reciprocal-rank fusion of N ranked retrieval lists — the standard
    * hybrid-retrieval combiner (Cormack/Clarke/Buettcher, SIGIR'09):
    * score(d) = Σ_lists 1/(rrfK + rank_list(d)). Each input carries
    * (query_id, id, rnk); a document absent from a list simply
    * contributes nothing (no imputation), and `n_lists` reports how many
    * lists surfaced it.
    *
    * Exactness: each reciprocal is floored onto the 10⁻⁶ grid by INTEGER
    * division (`1000000 div (rrfK + rnk)` — DuckDB `//`), and the fused
    * score is the integer SUM of those fixed-point terms —
    * order-independent, so identical under any shuffle and in any
    * engine; `ln`/float division never enters.
    *
    * Scale shape: the inputs are already per-query top-k funnels
    * (O(queries·k) rows — metadata-sized no matter the corpus), so the
    * union + one (query_id, id) combine + per-query WindowGroupLimit
    * re-rank are all trivially small; ALL the heavy lifting stays in the
    * upstream retrieval operators. */
  def rrfFuse(ranked: Seq[DataFrame], k: Int = 10, rrfK: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    require(ranked.nonEmpty, "need at least one ranked list")
    val contribs = ranked.map { df =>
      // exact floor division on the integer lattice (the bm25TopDocs
      // pattern): (n - n mod d) is divisible by d and ≤ 10⁶, so the
      // double quotient is exact and the cast back to long is the floor
      val d = lit(rrfK.toLong) + col("rnk")
      df.select(col("query_id"), col(idCol),
        ((lit(1000000L) - pmod(lit(1000000L), d)) / d).cast("long").as("c_q6"))
    }
    val fused = contribs.reduce(_.unionByName(_))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("c_q6")).as("rrf_q6"),
        count(lit(1)).cast("long").as("n_lists"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_q6").desc, col(idCol))
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col(idCol),
        (col("rrf_q6").cast("double") / 1000000.0).as("rrf"),
        col("n_lists"), col("rnk"))
  }

  /** q6 fixed-point nDCG rank discounts ⌊10⁶ / log₂(r+1)⌋ for ranks
    * 1..k. Computed ONCE here and baked as literals into BOTH the Spark
    * plan and the DuckDB oracle (the literal-baked pattern the streaming
    * faces use), so the irrational log₂ never has to agree across
    * engines — only these integers do. */
  def ndcgDiscountsQ6(k: Int): Seq[(Int, Long)] =
    (1 to k).map { r =>
      r -> math.floor(1000000.0 / (math.log(r + 1.0) / math.log(2.0))).toLong
    }

  /** Graded relevance by query-term overlap: rel(q, d) = number of
    * DISTINCT terms of query q present in document d — the deterministic
    * stand-in for human labels that makes retrieval evaluation
    * oracle-checkable. Only rel > 0 rows are emitted (the sparse shape
    * real judgment sets have). One explode + broadcast join + map-side
    * combined count; document text never shuffles. */
  def termOverlapRelevance(docs: DataFrame, queries: Seq[(Long, Seq[String])],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val qTerms = spark.createDataFrame(
      queries.flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) })
      .toDF("query_id", "term")
    docs.select(col(idCol),
        explode(array_distinct(words(col(textCol)))).as("term"))
      .join(broadcast(qTerms), "term")
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("rel"))
  }

  /** nDCG@k of a ranked retrieval result against graded relevance
    * labels — the metric a retrieval/training pipeline gates index and
    * ranker changes on. `ranked` carries (query_id, id, rnk) (any
    * retrieval operator's output); `rels` carries (query_id, id, rel).
    * Per query: DCG = Σ rel·disc(rnk), IDCG = the same sum over the
    * ideal (rel-descending) ordering's top k, nDCG = DCG/IDCG.
    *
    * Exactness: discounts are the [[ndcgDiscountsQ6]] integer lattice,
    * DCG/IDCG are integer sums (order-independent), and the final ratio
    * is a 4-dp fixed-point floor — bit-identical across engines.
    *
    * Scale: `ranked` is already a per-query top-k funnel
    * (O(queries·k)); the ideal ranking windows over labeled (rel > 0)
    * docs only, partitioned per query — judgment sets are thousands of
    * rows per query at most, so no global funnel. A query with no
    * relevant docs reports ndcg 0. */
  def ndcgAtK(ranked: DataFrame, rels: DataFrame, k: Int = 10,
      idCol: String = "doc_id"): DataFrame = {
    val discs = ndcgDiscountsQ6(k)
    def disc(r: Column): Column =
      discs.tail.foldLeft(when(r === discs.head._1, lit(discs.head._2))) {
        case (acc, (rk, d)) => acc.when(r === rk, lit(d))
      }.otherwise(lit(0L))
    val rel = coalesce(col("rel"), lit(0L))
    val dcg = ranked.filter(col("rnk") <= k)
      .join(rels, Seq("query_id", idCol), "left")
      .groupBy(col("query_id"))
      .agg(sum(rel * disc(col("rnk"))).as("dcg_q6"))
    val wIdeal = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col(idCol))
    val idcg = rels.filter(col("rel") > 0)
      .withColumn("irnk", row_number().over(wIdeal))
      .filter(col("irnk") <= k)
      .groupBy(col("query_id"))
      .agg(sum(col("rel") * disc(col("irnk"))).as("idcg_q6"))
    val d6 = coalesce(col("dcg_q6"), lit(0L))
    val i6 = coalesce(col("idcg_q6"), lit(0L))
    val scaled = d6 * lit(10000L)
    dcg.join(idcg, Seq("query_id"), "full_outer")
      .select(col("query_id"),
        (d6.cast("double") / 1000000.0).as("dcg"),
        (i6.cast("double") / 1000000.0).as("idcg"),
        when(i6 > 0, ((scaled - pmod(scaled, i6)) / i6).cast("double") / 10000.0)
          .otherwise(lit(0.0)).as("ndcg"))
  }

  /** Deterministic k-per-group sample: md5-hash-order row_number within
    * each stratum — the reproducible "k examples per language" pull.
    * One shuffle on the stratum; the window is partitioned, so no global
    * funnel. Skewed strata (one language dominating a corpus) are the
    * known hazard — for eyeball-sized k the per-partition top-k stays
    * tiny, and a rate-based [[stratifiedSample]] is the volume path. */
  def samplePerGroup(docs: DataFrame, stratum: Column, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("stratum"))
      .orderBy(hexInt(col(idCol).cast("string")), col(idCol))
    docs.select(col(idCol), stratum.as("stratum"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Downsample a corpus to a TARGET MIXTURE of strata (the "40% web /
    * 30% code / 30% books" training-mix knob). Given integer weights, the
    * output is the LARGEST subset achieving those proportions without
    * upsampling: the binding stratum (smallest cᵥ/wᵥ) is kept whole and
    * every other stratum is hash-downsampled to match. Strata without a
    * weight are dropped; a weighted stratum absent from the data is simply
    * not in the counts, so the mixture renormalizes over present strata.
    *
    * All arithmetic is integer: T = min_s ⌊c_s·W/w_s⌋ is the feasible
    * total, keep_ppm_s = ⌊w_s·T·10⁶/(W·c_s)⌋ the per-stratum rate on a
    * parts-per-million grid, and a row survives iff
    * `hexInt(stratum ':' id) % 10⁶ < keep_ppm`. Content-hash selection —
    * reproducible across runs/engines/retries, no rand(). w·T·10⁶
    * overflows int64 at planet-scale corpus counts, so the rate runs in
    * decimal(38,0) (HUGEINT in the oracle).
    *
    * Scale shape: one map-side-combined count per stratum (a handful of
    * rows), the rate table broadcasts back, and the keep decision is a
    * projection — the corpus is never shuffled. */
  def resampleToMix(docs: DataFrame, stratum: Column,
      weights: Map[String, Int], idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"need positive weights, got $weights")
    val totalW = weights.values.sum.toLong
    val wCol = weights.foldRight(lit(0L): Column) { case ((s, wt), acc) =>
      when(col("stratum") === s, lit(wt.toLong)).otherwise(acc)
    }
    val tagged = docs.select(col(idCol), stratum.as("stratum"))
      .withColumn("w", wCol).filter(col("w") > 0)
    val counts = tagged.groupBy(col("stratum"), col("w"))
      .agg(count(lit(1)).as("c"))
    // caps in decimal(38,0) like keep_ppm below: a long/long Divide runs
    // in doubles, which silently loses low bits once c·W > 2^53 (ppm-
    // grained weights on a 10¹⁰-doc stratum) and diverges from the
    // oracle's exact integer division
    val dec = "decimal(38,0)"
    val cw = col("c").cast(dec) * lit(totalW).cast(dec)
    val wD = col("w").cast(dec)
    val caps = counts.withColumn("cap", (cw - pmod(cw, wD)) / wD)
    val tMin = caps.agg(min(col("cap")).cast("long").as("t"))
    val num = col("w").cast(dec) * col("t").cast(dec) * lit(1000000L).cast(dec)
    val den = lit(totalW).cast(dec) * col("c").cast(dec)
    val rates = caps.crossJoin(broadcast(tMin))
      .select(col("stratum"),
        ((num - pmod(num, den)) / den).cast("long").as("keep_ppm"))
    tagged.join(broadcast(rates), Seq("stratum"))
      .withColumn("bucket",
        hexInt(concat(col("stratum"), lit(":"), col(idCol).cast("string")))
          % 1000000L)
      .filter(col("bucket") < col("keep_ppm"))
      .select(col(idCol), col("stratum"), col("keep_ppm"))
  }

  /** Token-budget document chunking: each doc explodes into windows of
    * `chunkSize` whitespace tokens advancing by `stride` (overlap =
    * chunkSize - stride), the shape sequence-packing pipelines feed to
    * tokenizers. One Generate (explode) — no shuffle; 100 TB chunks at
    * scan speed. Chunk count uses floor((n - C + S - 1)/S) + 1 — double
    * division of exact small ints, identically rounded in both engines
    * (ceil-free on purpose). Empty docs yield no chunks. */
  def chunkTokens(docs: DataFrame, chunkSize: Int = 64, stride: Int = 48,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    chunkArray(docs, words(col(textCol)), " ", chunkSize, stride, idCol)

  /** [[chunkTokens]] in SUBWORD units: windows over the committed-BPE
    * token sequence (VERDICT r9 #5 — the unit a training pipeline's
    * context budget is actually denominated in). Chunk text re-joins the
    * subwords with the empty string (original inter-word spacing is a
    * pre-tokenizer casualty, as in any id-space pipeline). */
  def chunkBpe(docs: DataFrame, chunkSize: Int = 64, stride: Int = 48,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    chunkArray(docs, Bpe.tokens(col(textCol)), "", chunkSize, stride, idCol)

  /** The tokenizer-generic chunker: windows of `chunkSize` entries of
    * `tokensArr` advancing by `stride`. One Generate (explode) — no
    * shuffle; 100 TB chunks at scan speed. Chunk count uses
    * floor((n - C + S - 1)/S) + 1 — double division of exact small ints,
    * identically rounded in both engines (ceil-free on purpose). Empty
    * docs yield no chunks. */
  private def chunkArray(docs: DataFrame, tokensArr: Column, sep: String,
      chunkSize: Int, stride: Int, idCol: String): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    val n = col("n")
    val nChunks = when(n <= chunkSize, lit(1L))
      .otherwise(floor((n - chunkSize + (stride - 1)).cast("double") / stride)
        .cast("long") + 1L)
    val start = (col("chunk_id") * stride).cast("int") + 1
    val len = least(lit(chunkSize), n - col("chunk_id") * stride).cast("int")
    docs
      .select(col(idCol), tokensArr.as("ws"))
      .select(col(idCol), col("ws"), size(col("ws")).cast("long").as("n"))
      .filter(n > 0)
      .select(col(idCol), n, col("ws"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        len.cast("long").as("chunk_tokens"),
        concat_ws(sep, slice(col("ws"), start, len)).as("chunk_text"))
  }

  /** Deterministic sequence packing: assign whole documents to
    * fixed-token-budget bins — the front-end of packed pre-training
    * batches. Docs are spread across `buckets` by content hash, ordered
    * reproducibly within each bucket (hash, then id), and binned by the
    * running token offset: seq_id = ⌊start/budget⌋. A document lands
    * wholly in the bin where its start offset falls, so a bin overruns
    * its budget by at most one document — the standard declarative
    * approximation; EXACT first-fit packing is inherently sequential and
    * would serialize the corpus through one task.
    *
    * Scale shape: the only shuffle is the hash-bucket exchange; the
    * running sum is a window PARTITIONED by bucket (no global funnel —
    * compare the surrogate-minting discussion at Historizer.scala), and
    * every downstream batch reader can consume (bucket, seq_id) groups
    * independently. Zero-token docs carry nothing packable and drop. */
  def packSequences(docs: DataFrame, budgetTokens: Int = 2048,
      buckets: Int = 32, idCol: String = "doc_id",
      textCol: String = "text",
      // the budgeting unit is pluggable (VERDICT r9 #5): default
      // whitespace tokens; pass Bpe.tokenCount to pack in the subword
      // units a training pipeline actually budgets
      tokensOf: Column => Column = c => size(words(c)).cast("long")): DataFrame = {
    require(budgetTokens > 0 && buckets > 0,
      s"need positive budget/buckets, got $budgetTokens/$buckets")
    val idStr = col(idCol).cast("string")
    val d = docs.select(col(idCol),
        tokensOf(col(textCol)).as("tokens"),
        (hexInt(idStr) % buckets).as("bucket"))
      .filter(col("tokens") > 0)
    val w = Window.partitionBy(col("bucket"))
      .orderBy(hexInt(col(idCol).cast("string")), col(idCol))
    // inclusive running sum minus own tokens = exclusive start offset;
    // offsets stay < 2^53 per bucket for any feasible bucket, so the
    // long→double floor-div is exact
    val start = sum(col("tokens")).over(w) - col("tokens")
    val b = lit(budgetTokens.toLong)
    d.withColumn("start", start)
      .select(col(idCol), col("bucket"), col("tokens"),
        ((col("start") - pmod(col("start"), b)) / b).cast("long").as("seq_id"),
        pmod(col("start"), b).as("seq_offset"))
  }

  /** Keep the top `keepPpm/10⁶` fraction of each stratum by quality —
    * "train on the best 30% per language". EXACT form: per-stratum
    * rank over (q4 desc, id), keep iff `rank·10⁶ ≤ keepPpm·count` (int64
    * cross-multiply, products < 2^63 up to 10¹²-doc strata; no division).
    *
    * The per-stratum window SORTS each stratum — fine up to large strata,
    * but a 100 TB single-language corpus makes it the job's long pole.
    * [[topQualityPerGroupApprox]] is the scale path: a quantile-sketch
    * threshold turns the same gate into one scan + a pure filter. This
    * exact form doubles as its accuracy oracle. */
  def topQualityPerGroup(docs: DataFrame, stratum: Column, keepPpm: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(keepPpm > 0 && keepPpm <= 1000000L, s"keepPpm in (0,10⁶], got $keepPpm")
    val scored = docs.select(col(idCol), stratum.as("stratum"),
      TextAnalysis.qualityScoreQ4(col(textCol)).as("q4"))
    val counts = scored.groupBy(col("stratum")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("q4").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq("stratum"))
      .filter(col("rnk") * lit(1000000L) <= lit(keepPpm) * col("c"))
      .select(col(idCol), col("stratum"),
        (col("q4").cast("double") / 10000.0).as("quality"), col("rnk"))
  }

  /** The scale path for [[topQualityPerGroup]]: per-stratum quality
    * threshold from a mergeable quantile sketch (one aggregation pass,
    * fixed memory), then a pure filter — no per-stratum sort anywhere.
    * Approximation moves the cut line by at most the sketch's rank error
    * (`relativeError`); everything comfortably above it is kept exactly
    * as in the exact form. */
  def topQualityPerGroupApprox(docs: DataFrame, stratum: Column,
      keepPpm: Long, relativeError: Double = 0.001,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(keepPpm > 0 && keepPpm <= 1000000L, s"keepPpm in (0,10⁶], got $keepPpm")
    val scored = docs.select(col(idCol), stratum.as("stratum"),
      TextAnalysis.qualityScoreQ4(col(textCol)).as("q4"))
    val cut = scored.groupBy(col("stratum")).agg(
      percentile_approx(col("q4"), lit(1.0 - keepPpm / 1000000.0),
        lit((1.0 / relativeError).toInt)).as("q4_cut"))
    scored.join(broadcast(cut), Seq("stratum"))
      .filter(col("q4") >= col("q4_cut"))
      .select(col(idCol), col("stratum"),
        (col("q4").cast("double") / 10000.0).as("quality"))
  }

  /** Deterministic train/val/test assignment: bucket = md5-hash of the
    * salted id mod 100, split by cumulative percentage. The decision is a
    * pure projection of the id — reproducible across runs, engines,
    * retries and partitionings (never `rand()`, whose draw depends on
    * partition layout), and adding documents never reassigns existing
    * ones, so eval sets stay stable as the corpus grows. The salt keeps
    * independent experiments' splits uncorrelated. Zero shuffle. */
  def hashSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10,
      salt: String = "split", idCol: String = "doc_id"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100; got $trainPct/$valPct")
    val bucket = hexInt(concat(lit(s"$salt:"), col(idCol).cast("string"))) % 100
    docs.select(col(idCol), bucket.as("bucket"),
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** Absolute per-source volume cap (the C4/RefinedWeb "domain cap" that
    * stops one mega-site dominating the mix): keep at most `cap`
    * documents per stratum, preferring quality, id tiebreak. Differs
    * from [[topQualityPerGroup]] in being an absolute count, not a
    * fraction — the policy knob pipelines actually set per domain.
    *
    * Skew-guarded two-phase top-cap (VERDICT r4 item 8): a hot stratum
    * (one domain = 90 % of the corpus) would funnel into ONE window task.
    * Phase 1 ranks within (stratum, salt) — salt = xxhash64(id) mod
    * `saltFactor`, deterministic under retries — and keeps `cap` rows per
    * slice, spreading every stratum over `saltFactor` tasks; phase 2 runs
    * the exact window over the ≤ saltFactor·cap survivors per stratum.
    * EXACT by construction: a global top-cap row ranks ≤ cap inside its
    * own salt slice too, so phase 1 never drops a winner. Cost: the
    * corpus-sized shuffle keys change from stratum to (stratum, salt);
    * the phase-2 shuffle carries ≤ saltFactor·cap rows per stratum —
    * bounded regardless of corpus size. */
  /** Token/char-BUDGET greedy fill per stratum — the knob a mixture
    * schedule actually hands to ingestion ("8B tokens of web, 2B of
    * code"), complementing [[capPerGroup]]'s count cap: keep documents
    * in (quality desc, id) order until the stratum's cumulative `units`
    * (chars here; BPE token counts in a tokenized pipeline) reach
    * `budget`. Greedy-prefix rule: a doc is kept iff the units BEFORE
    * it are < budget — so the fill always overshoots by at most one
    * document and never undershoots while eligible docs remain.
    *
    * Same skew-guarded two-phase as [[capPerGroup]], and the phase-1
    * prune is exact by the same subset argument: a doc kept globally
    * has cum-before < budget over the WHOLE stratum, hence over the
    * subset in its salt slice — so phase 1 (per-slice budget-prefix,
    * spread over saltFactor tasks) never drops a winner, and phase 2
    * runs the exact window over ≤ saltFactor·(budget + 1 doc) units
    * per stratum. */
  def fillByBudget(docs: DataFrame, stratum: Column, budget: Long,
      unitCol: String = "n_chars", idCol: String = "doc_id",
      textCol: String = "text", saltFactor: Int = 16): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val scored = docs.select(stratum.as("stratum"), col(idCol),
      col(unitCol).cast("long").as("units"),
      TextAnalysis.qualityScoreQ4(col(textCol)).as("q4"))
    val w1 = Window.partitionBy(col("stratum"), col("__salt"))
      .orderBy(col("q4").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val survivors = scored
      .withColumn("__salt",
        pmod(xxhash64(col(idCol)), lit(saltFactor.toLong)).cast("int"))
      .withColumn("__cum", sum(col("units")).over(w1))
      .filter(col("__cum") - col("units") < budget)
      .drop("__salt", "__cum")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("q4").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    survivors.withColumn("cum_units", sum(col("units")).over(w))
      .filter(col("cum_units") - col("units") < budget)
      .select(col("stratum"), col(idCol),
        (col("q4").cast("double") / 10000.0).as("quality"),
        col("units"), col("cum_units"))
  }

  /** Cross-source quality CALIBRATION: restate each document's quality
    * as the fraction of its OWN stratum scoring strictly below it —
    * rank-normalization, the standard fix for 'keep top X%' gates when
    * raw score distributions differ per domain (a mediocre doc in a
    * high-quality source must not outrank a great doc in a noisy one).
    * pct = ⌊(#strictly-below)·10⁶ / n_stratum⌋ — exact, ties share a
    * percentile.
    *
    * Scale shape — the reason this is NOT a per-stratum percent_rank
    * window over the corpus: quality lives on the 10⁴-point q4 lattice,
    * so per-(stratum, score) counts are aggregated first (map-side
    * combined, output ≤ strata·10⁴ rows), the cumulative below-count
    * sweeps that lattice-sized frame, and the corpus is mapped by one
    * broadcastable equi-join on (stratum, score). The corpus is scanned
    * twice and never windowed. */
  def calibrateQuality(docs: DataFrame, stratum: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = docs.select(col(idCol), stratum.as("stratum"),
      TextAnalysis.qualityScoreQ4(col(textCol)).as("q4"))
    val counts = scored.groupBy(col("stratum"), col("q4"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("q4"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("below", sum(col("cnt")).over(w) - col("cnt"))
      .withColumn("n_stratum",
        sum(col("cnt")).over(Window.partitionBy(col("stratum"))))
    val s6 = col("below") * lit(1000000L)
    scored.join(broadcast(cum), Seq("stratum", "q4"))
      .select(col(idCol), col("stratum"),
        (col("q4").cast("double") / 10000.0).as("quality"),
        ((s6 - pmod(s6, col("n_stratum"))) / col("n_stratum"))
          .cast("double").divide(lit(1000000.0)).as("pct"))
  }

  /** CCNet-style head/middle/tail bucketing (Wenzek et al. 2020): per
    * group (CCNet: per language; here the caller picks), split the
    * score distribution at its terciles — "head" is the best-scoring
    * third, the slice CCNet keeps outright; "middle" is sampled; "tail"
    * dropped. Cutoffs are by VALUE, not rank: c_head = max v with
    * 3·count(score ≥ v) ≥ n, c_mid likewise at 2n/3 — ties land in one
    * bucket together (deterministic, no row_number coin flip), head is
    * the minimal value-closed set of at least n/3 docs.
    *
    * Scale shape (the [[calibrateQuality]] discipline, NOT a per-group
    * ntile window over the corpus): scores live on an integer lattice,
    * so per-(group, score) counts aggregate first (map-side combined),
    * the cumulative sweep runs on that lattice-sized frame, and the
    * corpus is bucketed by one broadcast equi-join on group + two
    * comparisons — the corpus itself is never sorted or windowed. */
  def headMiddleTail(df: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("n"))
    val wcum = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("n")).over(wcum))
      .withColumn("tot",
        sum(col("n")).over(Window.partitionBy(col(groupCol))))
    val cuts = cum.groupBy(col(groupCol)).agg(
      max(when(col("cum") * 3 >= col("tot"), col(scoreCol))).as("c_head"),
      max(when(col("cum") * 3 >= col("tot") * 2, col(scoreCol))).as("c_mid"))
    df.join(broadcast(cuts), Seq(groupCol))
      .withColumn("bucket",
        when(col(scoreCol) >= col("c_head"), "head")
          .when(col(scoreCol) >= col("c_mid"), "middle")
          .otherwise("tail"))
      .drop("c_head", "c_mid")
  }

  def capPerGroup(docs: DataFrame, stratum: Column, cap: Int,
      idCol: String = "doc_id", textCol: String = "text",
      saltFactor: Int = 16): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val scored = docs.select(col(idCol), stratum.as("stratum"),
      TextAnalysis.qualityScoreQ4(col(textCol)).as("q4"))
    val w1 = Window.partitionBy(col("stratum"), col("__salt"))
      .orderBy(col("q4").desc, col(idCol))
    val survivors = scored
      .withColumn("__salt",
        pmod(xxhash64(col(idCol)), lit(saltFactor.toLong)).cast("int"))
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= cap)
      .drop("__salt", "__r")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("q4").desc, col(idCol))
    survivors.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= cap)
      .select(col("stratum"), col(idCol),
        (col("q4").cast("double") / 10000.0).as("quality"), col("rnk"))
  }

  /** Per-source boilerplate detection: a gram is boilerplate for a
    * source when it appears in at least `ratioQ4/10⁴` of that source's
    * documents (template headers, navigation chrome, license footers —
    * the crawl-corpus noise floor). Reports each document's boilerplate
    * mass so a curation funnel can gate or strip.
    *
    * The threshold test is `df·10⁴ ≥ ratioQ4·n_docs` — pure int64
    * comparison, no division anywhere, so engine-exact at any scale
    * (products stay < 2^63 up to ~10¹⁴-doc sources). Scale shape: the
    * (source, gram) df table is vocabulary-sized, far smaller than the
    * corpus; per-source doc counts broadcast; the boilerplate probe is
    * one equi-join on (source, gram). */
  def boilerplateStats(docs: DataFrame, n: Int = 1, ratioQ4: Long = 5000L,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    // The exploded distinct-gram stream feeds THREE consumers (the df
    // table, per-doc totals, the boilerplate probe). Left as a lazy
    // plan, each consumer branch re-tokenizes the corpus — 3 full
    // tokenization passes, the slowest query in the r12 registry.
    // Checkpoint it once: 1 tokenization pass + cheap re-reads. The two
    // per-doc aggregates then collapse into ONE pass over g: tag each
    // gram with a boilerplate flag via a left join (boiler is
    // template-chrome-sized — grams in ≥ratio of a source's docs — so
    // AQE broadcasts it) and count total + flagged in a single
    // groupBy(id).
    val g = docs.select(col(idCol), col(sourceCol).as("src"),
        explode(array_distinct(ngrams(words(col(textCol)), n))).as("gram"))
      .localCheckpoint()
    val perSource = docs.groupBy(col(sourceCol).as("src"))
      .agg(count(lit(1)).as("nd"))
    val dfs = g.groupBy(col("src"), col("gram")).agg(count(lit(1)).as("df"))
    val boiler = dfs.join(broadcast(perSource), "src")
      .filter(col("df") * lit(10000L) >= lit(ratioQ4) * col("nd"))
      .select(col("src"), col("gram"), lit(1L).as("is_boiler"))
    val perDoc = g.join(boiler, Seq("src", "gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
    val t = coalesce(col("n_grams"), lit(0L))
    val b = coalesce(col("n_boiler"), lit(0L))
    val scaled = b * lit(10000L)
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), t.as("n_grams"), b.as("n_boiler"),
        when(t > 0, ((scaled - pmod(scaled, t)) / t).cast("double") / 10000.0)
          .otherwise(lit(0.0)).as("boiler_frac"))
  }

  /** Corpus profile with rollup totals: per (source, lang) — and per
    * source, and grand total — document count, token mass, distinct
    * content count, and mean quality. The mean sums
    * [[TextAnalysis.qualityScoreQ4]] (exact long addition, immune to the
    * float-summation-order divergence a mean of doubles would hit) and
    * floor-divides once per group. One shuffle on the grouping sets;
    * every aggregate is map-side combinable. */
  def corpusReport(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source",
      langCol: String = "lang"): DataFrame = {
    val base = docs.select(col(sourceCol).as("source"), col(langCol).as("lang"),
      size(words(col(textCol))).cast("long").as("toks"),
      TextAnalysis.qualityScoreQ4(col(textCol)).as("q4"),
      md5(col(textCol)).as("digest"))
    // decimal(38,0): Σq4 ≤ n·10⁴ exceeds double-exact 2^53 once a group
    // holds ~10¹² docs — the grand-total row of a planet-scale corpus
    val dec = "decimal(38,0)"
    val sumQ4 = sum(col("q4")).cast(dec)
    val nDocs = count(lit(1))
    val nD = nDocs.cast(dec)
    base.rollup(col("source"), col("lang"))
      .agg(nDocs.as("n_docs"), sum(col("toks")).as("n_tokens"),
        countDistinct(col("digest")).as("n_unique"),
        (((sumQ4 - pmod(sumQ4, nD)) / nD).cast("double") / 10000.0)
          .as("mean_quality"))
  }

  /** Corpus profile with KMV-estimated distinct content per rollup level
    * (VERDICT r7 #7): the deterministic-cardinality sibling of
    * [[corpusReport]]'s exact `countDistinct`. The output mirrors the
    * ROLLUP's three levels — (source, lang) leaves, per-source subtotals
    * (lang NULL), and the grand total (both NULL) — but only the LEAF
    * sketches ever touch the corpus: the per-source and grand-total
    * sketches are derived from the leaf keep-states by re-keeping
    * (k-min of a union = k-min of the union of k-mins — the
    * [[Sketches.kmvKeep]] merge law), which is exactly how a 100 TB
    * profile combines shard sketches without rescanning. Shuffle shape:
    * one map-side WindowGroupLimit funnel on (source, lang) carrying
    * O(groups·k); everything above it operates on kept states. */
  def corpusReportKmv(docs: DataFrame, k: Int = 64, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source",
      langCol: String = "lang"): DataFrame = {
    import graft.ext.Sketches._
    val hashes = kmvHashes(
      docs.select(col(sourceCol).as("source"), col(langCol).as("lang"),
        col(textCol).as("v")),
      Seq("source", "lang"), "v")
    val leafKeep = kmvKeep(hashes, Seq("source", "lang"), k)
    val srcKeep = kmvKeep(leafKeep.select(col("source"), col("h")),
      Seq("source"), k)
    val totKeep = kmvKeep(srcKeep.select(col("h")), Seq.empty, k)
    val leaf = kmvProfile(leafKeep, Seq("source", "lang"), k)
    val src = kmvProfile(srcKeep, Seq("source"), k)
      .withColumn("lang", lit(null).cast("string"))
    val tot = kmvProfile(totKeep, Seq.empty, k)
      .withColumn("source", lit(null).cast("string"))
      .withColumn("lang", lit(null).cast("string"))
    val cols = Seq(col("source"), col("lang"), col("n_kept"),
      col("kth_hash"), col("est_distinct"))
    leaf.select(cols: _*).unionByName(src.select(cols: _*))
      .unionByName(tot.select(cols: _*))
  }

  /** PII patterns kept to the syntax subset Java regex and RE2 (DuckDB)
    * interpret identically: explicit classes, no lookaround, `[0-9]`
    * over `\d`. */
  val emailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRegex = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Canonical text normalization for dedup/tokenizer front-ends:
    * lowercase, collapse all whitespace runs to single spaces, trim.
    * Pure projection — zero shuffle. Kept to transforms both engines
    * implement identically (no Unicode case folding — ASCII-safe
    * lower()). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Redact emails then phone numbers — pure projections, zero shuffle:
    * a 100 TB redaction pass is scan-speed. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(emailRegex), lit("[EMAIL]")),
      lit(phoneRegex), lit("[PHONE]"))

  def emailCount(text: Column): Column =
    regexp_count(text, lit(emailRegex)).cast("long")

  def phoneCount(text: Column): Column =
    regexp_count(text, lit(phoneRegex)).cast("long")

  /** Temperature-smoothed mixture schedule — the standard multi-domain
    * rebalancing (exponent-smoothed sampling in multilingual BERT /
    * GPT-3-style mixtures): a group's sampling mass ∝ n^α with α < 1, so
    * head domains shrink and tail domains grow relative to natural
    * proportions. α is FIXED at 1/2 because that is the exponent with an
    * exact integer form — s = isqrt(n), computed as floor(sqrt) plus a
    * ±1 integer correction, so the whole schedule (weights on the ppm
    * lattice, planned counts for a budget) is bit-identical in any
    * engine; a free-α pow() would hash-flake on libm ulps. One
    * map-side-combined count per group, a 1-row broadcast total — the
    * corpus is scanned once regardless of size.
    *
    * Output per group: n_docs, s_root = isqrt(n), w_ppm (floor share of
    * 10⁶), planned (floor share of `budget` samples). Feed `s_root` to
    * [[resampleToMix]] as the weight map to materialize the mix. */
  def temperatureSchedule(docs: DataFrame, groupCol: String = "source",
      budget: Long = 10000L): DataFrame = {
    val n = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val f = floor(sqrt(col("n_docs").cast("double"))).cast("long")
    // exact isqrt: double sqrt can land one off at perfect-square
    // boundaries; the integer correction makes both engines agree exactly
    val sExact = when((f + 1L) * (f + 1L) <= col("n_docs"), f + 1L)
      .when(f * f > col("n_docs"), f - 1L)
      .otherwise(f)
    val withS = n.withColumn("s_root", sExact)
    val tot = withS.agg(sum(col("s_root")).as("s_tot"))
    val dec = "decimal(38,0)"
    def fdiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    withS.crossJoin(broadcast(tot)).select(
      col(groupCol), col("n_docs"), col("s_root"),
      fdiv(col("s_root").cast(dec) * lit(1000000L).cast(dec),
        col("s_tot").cast(dec)).as("w_ppm"),
      fdiv(col("s_root").cast(dec) * lit(budget).cast(dec),
        col("s_tot").cast(dec)).as("planned"))
  }

  /** Weight-proportional sampling WITHOUT replacement, deterministic:
    * systematic (fixed-interval) sampling over the cumulative-weight
    * axis. Rows are laid end-to-end in `idCol` order, each covering a
    * weight interval [cw−w, cw); k equally spaced pointers
    * (0, step, 2·step, …, step = ⌊total/k⌋) each select the row whose
    * interval they land in. Long documents (big weights) are
    * proportionally more likely to be hit — the exact
    * sample-by-token-count draw a training mix wants — and a row heavier
    * than `step` is hit multiple times (`n_picks` > 1, the without-
    * replacement analog of expected multiplicity). No randomness: the
    * draw is a pure function of (ids, weights, k), reproducible across
    * engines, runs and retries. Standard systematic-sampling caveat: if
    * the weight sequence is PERIODIC in id order with period ≈ total/k,
    * the fixed stride aliases with it (all pointers land on one phase) —
    * pick k coprime to any known periodicity, or pre-shuffle ids by
    * hash.
    *
    * Scale: the cumulative sum never funnels into a single-task global
    * window. Rows bucket by id range (`buckets` monotone id slices);
    * intra-bucket prefix sums run as `buckets` parallel window
    * partitions, and bucket offsets come from a #buckets-row aggregate —
    * metadata-sized — cum-summed on the driver-side-free tiny window.
    * Two shuffles of (id, w) pairs total; text never moves. Zero-weight
    * rows can never be selected and are dropped up front. */
  def weightedSystematicSample(docs: DataFrame, weightCol: String, k: Int,
      idCol: String = "doc_id", buckets: Int = 1024): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val base = docs.select(col(idCol).as("id"),
        col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
    val bounds = base.agg(min(col("id")).as("lo"), max(col("id")).as("hi"),
      sum(col("w")).as("total"))
    // exact floor division on the decimal lattice: long `/` in Spark is
    // double division, which goes inexact past 2^53 — a planet-scale
    // cumulative token count
    val dec = "decimal(38,0)"
    def fdiv(a: Column, b: Column): Column = {
      val ad = a.cast(dec); val bd = b.cast(dec)
      ((ad - pmod(ad, bd)) / bd).cast("long")
    }
    val withB = base.crossJoin(broadcast(bounds))
      .withColumn("span",
        greatest(fdiv(col("hi") - col("lo") + lit(buckets.toLong),
          lit(buckets.toLong)), lit(1L)))
      .withColumn("bucket", fdiv(col("id") - col("lo"), col("span")))
    // intra-bucket inclusive prefix sum: parallel across buckets
    val wIntra = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // bucket offsets: exclusive prefix over the tiny per-bucket totals
    val wBuckets = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy(col("bucket")).agg(sum(col("w")).as("bw"))
      .withColumn("offset", coalesce(sum(col("bw")).over(wBuckets), lit(0L)))
      .select(col("bucket"), col("offset"))
    val cum = withB.withColumn("cw_local", sum(col("w")).over(wIntra))
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("cw", col("offset") + col("cw_local"))
      .withColumn("step", greatest(fdiv(col("total"), lit(k.toLong)), lit(1L)))
    // pointers j·step (j = 0..k−1) strictly below y, capped at k
    def pointersBelow(y: Column): Column = {
      val up = y + col("step") - 1L
      least(fdiv(up, col("step")), lit(k.toLong))
    }
    cum.withColumn("n_picks",
        pointersBelow(col("cw")) - pointersBelow(col("cw") - col("w")))
      .filter(col("n_picks") >= 1)
      .select(col("id").as(idCol), col("w"), col("cw"), col("n_picks"))
  }

  /** Deterministic weighted PRIORITY sample — bounded-k, mergeable: every
    * row gets an integer priority ⌊hash·10⁴ / w⌋ (hash = the salted
    * 32-bit content-free id hash; w > 0 the weight), and the sample is
    * the k smallest (priority, id) rows. Heavier rows divide their hash
    * by more, land lower, and enter the sample more often — the
    * deterministic-lattice analogue of Efraimidis–Spirakis u^(1/w)
    * priority sampling (DOCUMENTED approximation: h/w ordering is
    * weight-monotone but not exactly ES-distributed — the ln() an exact
    * ES key needs does not survive cross-engine integer determinism,
    * the same trade as Unigram's whole-bit costs).
    *
    * Why this shape matters operationally: top-k by a row-intrinsic
    * priority is a commutative, IDEMPOTENT monoid — merge(top-k(A),
    * top-k(B)) = top-k(A ∪ B), replays fold to themselves — so the same
    * rule runs as a TakeOrderedAndProject here (no global sort: per-
    * partition heaps + one k-row merge at the driver), a per-shard
    * pre-sample at 100 TB, and a streaming sink
    * ([[graft.streaming.EventStreams.prioritySampleSink]]) whose state
    * is exactly k rows. Zero/negative weights are unsampleable and drop
    * up front. */
  def prioritySample(docs: DataFrame, k: Int, weightCol: String,
      idCol: String = "doc_id", salt: String = "pri"): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val dec = "decimal(38,0)"
    val w = col(weightCol).cast("long")
    val h = hexInt(concat(lit(salt), lit(":"), col(idCol).cast("string")))
    val num = h.cast(dec) * lit(10000L)
    val pri = ((num - pmod(num, w.cast(dec))) / w.cast(dec)).cast("long")
    docs.filter(w > 0L)
      .select(col(idCol), w.as("weight"), pri.as("priority"))
      .orderBy(col("priority"), col(idCol)).limit(k)
  }

  /** Preference-pair construction (the DPO/RLHF data-prep step): within
    * every stratum, pair the highest-quality document (chosen) against
    * the lowest-quality one (rejected), with the quality gap as the
    * pair's margin. Ties are deterministic: equal-quality chosen picks
    * the smaller id, equal-quality rejected the larger, so the two ends
    * never collide unless the stratum has a single document. Pairs with
    * zero margin (stratum quality is flat) are dropped — they carry no
    * preference signal.
    *
    * Scale: two struct-max aggregates per stratum — map-side combined,
    * one shuffle of (stratum, q4, id) triples, no window funnel, text
    * never shuffles. */
  def preferencePairs(docs: DataFrame, strata: Seq[String] = Seq("source", "lang"),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val gCols = strata.map(col)
    val scored = docs.select(gCols ++ Seq(col(idCol).as("id"),
      TextAnalysis.qualityScoreQ4(col(textCol)).as("q4")): _*)
    scored.groupBy(gCols: _*)
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("q4"), (-col("id")).as("neg"))).as("ch"),
        min(struct(col("q4"), (-col("id")).as("neg"))).as("rj"))
      .filter(col("n_docs") > 1 && col("ch.q4") > col("rj.q4"))
      .select(gCols ++ Seq(
        (-col("ch.neg")).as("chosen_id"), (-col("rj.neg")).as("rejected_id"),
        (col("ch.q4").cast("double") / 10000.0).as("chosen_quality"),
        (col("rj.q4").cast("double") / 10000.0).as("rejected_quality"),
        ((col("ch.q4") - col("rj.q4")).cast("double") / 10000.0).as("margin")): _*)
  }

  /** Group-aware (leakage-safe) split: like [[hashSplit]], but the
    * bucket is hashed from a GROUP column (domain, source, author…), so
    * every document of a group lands in the same split — near-duplicates
    * within a crawl domain can't straddle train/test and leak. Same
    * zero-shuffle projection shape as hashSplit. */
  def hashSplitByGroup(docs: DataFrame, groupCol: String,
      trainPct: Int = 80, valPct: Int = 10, salt: String = "gsplit",
      idCol: String = "doc_id"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100; got $trainPct/$valPct")
    val bucket = hexInt(concat(lit(s"$salt:"), col(groupCol).cast("string"))) % 100
    docs.select(col(idCol), col(groupCol), bucket.as("bucket"),
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** Epoch plan for a target mixture: given a per-stratum weight and a
    * total character budget, how many EPOCHS (repeats) of each stratum's
    * available mass does the schedule call for? The data-budgeting table
    * behind "web ×0.6 epochs, wiki ×3.2 epochs" mixture specs — epochs
    * > 1 means upsampling by repetition, < 1 means the stratum is
    * subsampled. `weightOf` maps the stratum VALUE to its integer target
    * weight (shares are weights over the weight total, so callers never
    * pre-normalize).
    *
    * Exact lattice: target_chars = ⌊w·B/W⌋ and
    * epochs = ⌊w·B·10⁴/(W·chars)⌋/10⁴, all in decimal(38,0) floor
    * division (w·B·10⁴ overflows int64 once B reaches corpus scale).
    * One groupBy(stratum) over two longs + a 1-row weight-total
    * broadcast — output is O(strata). */
  def mixEpochs(df: DataFrame, stratum: Column, weightOf: Column => Column,
      budget: Long, charsCol: String = "n_chars"): DataFrame = {
    val dec = "decimal(38,0)"
    def fdiv(num: Column, den: Column): Column =
      (num.cast(dec) - pmod(num.cast(dec), den.cast(dec))) / den.cast(dec)
    val per = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(charsCol).cast("long")).as("n_chars"))
      .select(col("stratum"), col("n_docs"), col("n_chars"),
        weightOf(col("stratum")).cast("long").as("wt"))
    val tot = per.agg(sum(col("wt")).as("w_tot"))
    per.crossJoin(broadcast(tot)).select(
      col("stratum"), col("n_docs"), col("n_chars"), col("wt"),
      fdiv(col("wt").cast(dec) * lit(budget), col("w_tot")).cast("long")
        .as("target_chars"),
      // An all-empty stratum (n_chars = 0) would zero the denominator:
      // Spark decimal division yields null where DuckDB raises — guard
      // on BOTH sides (matching CASE in mixEpochsSql) so the engines
      // agree that a zero-char stratum gets 0.0 epochs.
      when(col("n_chars") > 0,
        fdiv(col("wt").cast(dec) * lit(budget) * lit(10000L),
          col("w_tot").cast(dec) * col("n_chars")).cast("double") / 10000.0)
        .otherwise(lit(0.0))
        .as("epochs"))
  }

  /** DSIR-style hashed-ngram importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw document by how much its hashed bag-of-words resembles a
    * target subcorpus (`isTarget` rows) relative to the raw corpus as a
    * whole, then keep the target-like ones.
    *
    * Bucket model: each word hashes ([[Hashing.hexInt]], engine-portable)
    * into one of `buckets` counters; `ct`/`cr` are target/raw bucket
    * counts, `nt`/`nr` the corpus totals. The published method scores a
    * doc by Σ log p̂_t(b)/p̂_r(b); a float `ln` would hash-flake on
    * last-ulp differences across engines (same reasoning as lmScore), so
    * the score here is the per-gram add-one LIKELIHOOD-RATIO mean on the
    * exact ppm lattice:
    *   r_ppm(b) = ⌊10⁶·(ct+1)·(nr+B) / ((cr+1)·(nt+B))⌋   (decimal(38,0))
    *   dsir_ppm(doc) = ⌊Σ r_ppm / n_grams⌋
    * r_ppm > 10⁶ ⇔ bucket b is more probable under the target than the
    * raw model, so `is_targetlike` = dsir_ppm > 10⁶ is the resampling
    * keep decision at acceptance ratio 1.
    *
    * Scale shape: one explode→groupBy(bucket) builds a B-row model
    * (B ≪ corpus; 10⁶ buckets in production), which broadcasts back onto
    * the gram stream — the corpus is scanned twice (checkpointed grams),
    * shuffled once on a key space of exactly B values, and the per-doc
    * aggregation is map-side-combinable. No all-pairs term anywhere.
    * Numeric bounds: r_ppm ≤ 10⁶·(nr+B) so Σ over a doc's grams fits
    * decimal(38,0) for any corpus that fits in int64 token counts. */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    dsirScore(docs, isTarget, docs, buckets, idCol, textCol)

  /** Frozen-model DSIR face: the bucket model trains on `modelDocs`
    * only, and `scoreDocs` are scored against it — the deployment shape
    * (Xie et al. fit importance weights on a held sample, then apply
    * them to the full stream), and the O(increment) incremental face:
    * new arrivals score against the committed model without touching a
    * byte of the base corpus. `dsirWeights` is the self-scored special
    * case. */
  def dsirScore(modelDocs: DataFrame, isTarget: Column,
      scoreDocs: DataFrame, buckets: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dec = "decimal(38,0)"
    val b0 = lit(buckets.toLong)
    def grams(df: DataFrame, extra: Seq[Column]): DataFrame =
      df.select(col(idCol) +: extra :+
          explode(words(lower(col(textCol)))).as("w"): _*)
        .withColumn("b", pmod(hexInt(col("w")), b0)).drop("w")
    // The model gram stream is deliberately NOT checkpointed even when
    // modelDocs eq scoreDocs: it is O(tokens) — materializing it would
    // write a corpus-sized spill at 100 TB, while recomputing costs one
    // extra codegen scan (hash+explode, no shuffle).
    val model = grams(modelDocs, Seq(isTarget.as("is_t")))
      .groupBy(col("b")).agg(
        sum(when(col("is_t"), lit(1L)).otherwise(lit(0L))).as("ct"),
        count(lit(1)).as("cr"))
    val tot = model.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val ratios = model.crossJoin(broadcast(tot)).select(col("b"), {
      val num = (col("ct") + lit(1L)).cast(dec) *
        (col("nr") + b0).cast(dec) * lit(1000000L)
      val den = (col("cr") + lit(1L)).cast(dec) * (col("nt") + b0).cast(dec)
      ((num - pmod(num, den)) / den).cast("long").as("r_ppm")
    })
    // An unseen bucket (possible when scoreDocs ⊄ modelDocs) scores as
    // the all-smoothing ratio ⌊10⁶·(nr+B)/((nt+B))⌋/… with ct=cr=0 — the
    // left join + coalesce below substitutes exactly that default.
    val dflt = broadcast(tot).select({
      val num = (col("nr") + b0).cast(dec) * lit(1000000L)
      val den = (col("nt") + b0).cast(dec)
      ((num - pmod(num, den)) / den).cast("long").as("r0")
    })
    val scored = grams(scoreDocs, Seq.empty)
      .join(broadcast(ratios), Seq("b"), "left")
      .crossJoin(broadcast(dflt))
      .select(col(idCol), coalesce(col("r_ppm"), col("r0")).as("r_ppm"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("r_ppm").cast(dec)).as("s"))
      .select(col(idCol), col("n_grams"),
        ((col("s") - pmod(col("s"), col("n_grams").cast(dec))) /
          col("n_grams").cast(dec)).cast("long").as("dsir_ppm"))
    scoreDocs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dsir_ppm"), lit(0L)).as("dsir_ppm"))
      .withColumn("is_targetlike",
        (col("dsir_ppm") > lit(1000000L)).cast("int").cast("long"))
  }

  /** Balanced output-shard assignment: size-descending round-robin (the
    * LPT heuristic without bin lookups) — global rank by (size desc, id)
    * via a range-partitioned sort + the gapless distributed zipWithIndex
    * (never a one-task corpus window), shard = (rank−1) mod n. Adjacent
    * ranks land in different shards, so shard totals differ by at most
    * one document per round-robin lap — the writer-side balance a 100 TB
    * export needs so no output file becomes the straggler. */
  def shardAssign(docs: DataFrame, nShards: Int, idCol: String = "doc_id",
      charsCol: String = "n_chars"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    graft.scd2.Historizer.withGaplessIndex(
        docs.select(col(idCol), col(charsCol).cast("long").as("n_chars"))
          .orderBy(col("n_chars").desc, col(idCol).asc), "__rk")
      .select(col(idCol), col("n_chars"),
        pmod(col("__rk") - lit(1L), lit(nShards.toLong)).as("shard"))
  }

  /** Export manifest: per-shard integrity digests for a corpus release —
    * row count, character mass, and an ORDER-INDEPENDENT content digest
    * (sum of per-doc 32-bit portable hashes, reduced mod 2⁶¹ so the
    * published digest is a plain int64 in any engine; the sum itself
    * runs in decimal(38,0) — 10¹⁰ docs × 2³² hashes passes int64).
    * The consumer re-derives the manifest from the shipped shards and
    * compares — any lost, duplicated, or corrupted document moves the
    * digest. Shard assignment is [[shardAssign]]'s LPT balance; the
    * digest aggregate is one map-side-combined groupBy. */
  val manifestMod = 1L << 61

  def exportManifest(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id", textCol: String = "text",
      charsCol: String = "n_chars"): DataFrame = {
    val dec = "decimal(38,0)"
    shardAssign(docs, nShards, idCol, charsCol)
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        pmod(sum(graft.ext.Hashing.hexInt(col(textCol)).cast(dec)),
          lit(manifestMod).cast(dec)).cast("long").as("content_mod"))
  }

  /** k-anonymity audit (Sweeney 2002): group by the quasi-identifier
    * columns, count each equivalence class, flag classes smaller than k
    * — the release gate a training-data pipeline runs before shipping
    * any quasi-identifiable slice (tiny classes re-identify their
    * members). Output is one row per CLASS (O(distinct combinations),
    * not O(rows)); one map-side-combinable groupBy is the whole cost, so
    * the audit is a single shuffle of class-count pairs at any corpus
    * size. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .select(quasiIds.map(col) :+ col("class_size") :+
        (col("class_size") < k).cast("int").cast("long")
          .as("is_violation"): _*)
}
