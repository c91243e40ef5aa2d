package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Hashing._

/** Text analysis for corpus curation (north star): token counting,
  * quality scoring, language ID, document fingerprinting. All pure
  * per-row projections — they run inside whole-stage codegen with zero
  * shuffle, which is exactly what a 100 TB curation scan needs.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(words(text)).cast("long")

  /** BPE-ish token count: letter runs, single digits, and isolated
    * punctuation — a cheap proxy for subword tokenizers. */
  val bpeTokenRegex = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeTokenRegex)).cast("long")

  /** Stopword lists per language (tiny n-gram-free heuristic — enough to
    * expose the mechanism; swap lists for production). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans"),
    "de" -> Seq("der", "die", "und", "das", "ein", "zu", "ist", "von"))

  def stopwordHits(ws: Column, lang: String): Column =
    size(filter(ws, w => w.isin(stopwords(lang).map(lit): _*))).cast("long")

  /** Language ID: most stopword hits wins, fixed priority on ties,
    * 'und' (undetermined) when nothing hits.
    *
    * Single-pass by construction: the obvious per-language formulation
    * (`greatest` over four `stopwordHits` + a CASE chain) references the
    * tokenized array ~24× in one expression tree, and Catalyst performs
    * NO subexpression elimination inside trees containing HOF lambdas —
    * measured 24 split+filter evaluations per row (the r12
    * q_sample_stratified bench regression). Here every subtree is
    * referenced exactly once: one tokenize, one `aggregate` fold
    * counting all four languages simultaneously, one argmax fold over
    * the 4-element count array. Ties break on list order (en, es, fr,
    * de) because the argmax keeps the FIRST strict maximum; counts of 0
    * never beat the "und" seed. Null text coalesces to the empty array
    * (→ "und"), matching the CASE chain's null fall-through. */
  private val langIdLangs = Seq("en", "es", "fr", "de")
  def langId(text: Column): Column = {
    val ws = coalesce(words(lower(text)), array())
    val zero = array(langIdLangs.map(_ => lit(0L)): _*)
    val counts = aggregate(ws, zero, (acc, w) =>
      zip_with(acc,
        array(langIdLangs.map(l =>
          when(w.isin(stopwords(l).map(lit): _*), 1L).otherwise(0L)): _*),
        (a, b) => a + b))
    val labeled = zip_with(counts,
      array(langIdLangs.map(lit): _*),
      (c, l) => struct(c.as("c"), l.as("l")))
    aggregate(labeled,
      struct(lit(0L).as("c"), lit("und").as("l")),
      (best, x) => when(x.getField("c") > best.getField("c"), x)
        .otherwise(best))
      .getField("l")
  }

  /** Quality score in [0,1]: length saturation, punctuation penalty,
    * stopword reward — the standard cheap pre-filter shape.
    *
    * score = (0.4·min(len,500)/500 + 0.3·(1 − punct/L) + 0.3·min(3·stops/T, 1))
    * with L = max(len,1), T = max(tokens,1), emitted on a FIXED 4-decimal
    * grid: q = ⌊num·10⁴ / den⌋ / 10⁴ over the exact integer numerator and
    * common denominator. No float summation (a three-term double sum
    * differs across engines by an ulp via FMA contraction) and no
    * `round()` (the rational often lands EXACTLY on decimal midpoints —
    * observed 0.57305 — where round-half rules are engine-dependent).
    * Integer floor-division is unambiguous everywhere. The numerator runs
    * in decimal(38,0): num·10⁴ is ~5·10⁷·len·tokens, which overflows a
    * silently-wrapping non-ANSI int64 for multi-MB documents; decimal
    * keeps every product exact (< 10³⁸ up to exabyte-sized strings), and
    * the one decimal→double cast of the exact quotient (≤ 10⁴) is
    * lossless. */
  def qualityScore(text: Column): Column =
    qualityScoreQ4(text).cast("double") / lit(10000.0)

  /** The score's exact fixed-point integer ⌊num·10⁴/den⌋ ∈ [0, 10⁴] —
    * what aggregations should sum (long addition is order-independent
    * where double summation is not; see [[graft.ext.Curation]]'s corpus
    * report). [[qualityScore]] is this over 10⁴. */
  def qualityScoreQ4(text: Column): Column = {
    val dec = "decimal(38,0)"
    val len = length(text).cast("long")
    val l = greatest(len, lit(1L))
    val p = regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("long")
    val h = stopwordHits(words(lower(text)), "en")
    // the tokenization is referenced FOUR times below (two num terms,
    // the stopword cap, the denominator); bindOnce pins it to one
    // split+filter per row (no HOF-tree subexpression elimination)
    bindOnce(greatest(size(words(text)).cast("long"), lit(1L))) { t =>
      val lD = l.cast(dec)
      val tD = t.cast(dec)
      val num = lit(4L).cast(dec) * least(len, lit(500L)).cast(dec) * lD * tD +
        lit(3L).cast(dec) * (l - p).cast(dec) * lit(500L).cast(dec) * tD +
        lit(3L).cast(dec) * least(lit(3L) * h, t).cast(dec) * lit(500L).cast(dec) * lD
      val den = lit(5000L).cast(dec) * lD * tD
      val scaled = num * lit(10000L).cast(dec)
      // (scaled - scaled mod den) is an exact multiple of den, so the decimal
      // division yields the exact integer quotient (≤ 10⁴)
      ((scaled - pmod(scaled, den)) / den).cast("long")
    }
  }

  /** Gopher-style repetition signals per document — the cheap "is this
    * text degenerate?" battery run before any model-based quality filter:
    * duplicate-word fraction, mean word length, and the mass of the single
    * most frequent word n-gram (boilerplate and keyword-stuffing light up
    * the last one).
    *
    * Scale shape: the word-level signals are pure projections (codegen,
    * zero shuffle). The top-gram signal explodes grams WITHOUT
    * deduplication (repetition is the point) and aggregates twice, both
    * map-side combined and keyed by doc id; the per-doc window for the
    * arg-max is partitioned by doc id — no global funnel. All fractions
    * sit on the fixed 4-decimal grid via integer floor-division (the
    * engine-independence argument of [[qualityScore]]); counts·10⁴ stay
    * < 2^63 for any document under ~10¹⁴ grams, so int64 is safe where
    * the quality score's len·tokens PRODUCT was not. Ties on the top gram
    * break lexicographically. Docs with fewer than n words report zero
    * grams and a null top gram. */
  def repetitionStats(docs: DataFrame, n: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def frac4(num: Column, den: Column): Column = {
      val scaled = num * lit(10000L)
      when(den > 0, ((scaled - pmod(scaled, den)) / den).cast("double") / 10000.0)
        .otherwise(lit(0.0))
    }
    val ws = words(col(textCol))
    val nWords = size(ws).cast("long")
    val perRow = docs.select(col(idCol),
      nWords.as("n_words"),
      frac4(nWords - size(array_distinct(ws)), nWords).as("dup_word_frac"),
      frac4(length(concat_ws("", ws)), nWords).as("mean_word_len"))
    val cnt = docs
      .select(col(idCol), explode(ngrams(words(col(textCol)), n)).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
    val totals = cnt.groupBy(col(idCol)).agg(sum(col("cnt")).as("n_ngrams"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cnt").desc, col("gram"))
    val top = cnt.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col(idCol), col("gram").as("top_gram"), col("cnt").as("top_gram_n"))
    perRow.join(totals, Seq(idCol), "left").join(top, Seq(idCol), "left")
      .select(col(idCol), col("n_words"), col("dup_word_frac"),
        col("mean_word_len"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        col("top_gram"),
        coalesce(col("top_gram_n"), lit(0L)).as("top_gram_n"),
        frac4(coalesce(col("top_gram_n"), lit(0L)),
          coalesce(col("n_ngrams"), lit(0L))).as("top_gram_frac"))
  }

  /** Corpus trigram-typicality score — the statistical shape of a
    * CCNet-style LM quality filter with the transcendental parts
    * removed: each document's DISTINCT character trigrams look up their
    * corpus DOCUMENT FREQUENCY, and the score is the mean df over the
    * doc's distinct trigrams. Gibberish, wrong-charset and
    * random-key documents score LOW (their trigrams are rare across the
    * corpus); typical prose scores high. Emitted as exact integer
    * sufficient statistics (n_tris, df_sum) plus ONE final double
    * division — no logs, so the score is bit-identical in any engine
    * (an actual log-perplexity would hash-flake on last-ulp `ln`
    * differences between engines).
    *
    * Plan shape (100 TB): explode positions (codegen Generate) → one
    * (doc, tri) DISTINCT shuffle → map-side-combined df counts → one
    * tri-keyed equi-join back → one per-doc aggregate. Every exchange is
    * key-partitioned; nothing quadratic, no driver state. The distinct
    * trigram set is pinned once (it feeds both the df aggregate and the
    * join). Docs shorter than 3 chars have no trigrams and drop — keep
    * them with a left join from the corpus if needed. */
  def trigramTypicality(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", carry: Seq[String] = Nil): DataFrame = {
    // `carry`: extra doc-FUNCTIONAL columns (one value per id) ridden
    // through the trigram pipeline so a caller needing both this score
    // and another per-doc signal pays ONE corpus text scan, not two
    // (VERDICT r14 #7 — q_eval_rankcorr's q4 leg). They join the
    // grouping key; cardinality is unchanged because they are
    // functionally determined by the id.
    val keyCols = (idCol +: carry).map(col)
    val tris = docs
      .filter(length(col(textCol)) >= 3)
      .select(keyCols :+
        explode(sequence(lit(1), length(col(textCol)) - 2)).as("p") :+
        col(textCol): _*)
      .select(keyCols :+ col(textCol).substr(col("p"), lit(3)).as("tri"): _*)
      .distinct()
      .localCheckpoint()
    val dfCounts = tris.groupBy(col("tri")).agg(count(lit(1)).as("df"))
    tris.join(dfCounts, Seq("tri"))
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_tris"), sum(col("df")).as("df_sum"))
      .select(keyCols ++ Seq(col("n_tris"), col("df_sum"),
        (col("df_sum").cast("double") / col("n_tris")).as("typicality")): _*)
  }

  /** Rolling-hash document fingerprint: minimum 32-bit hash over char
    * 5-grams (winnowing with window = whole doc), plus the distinct
    * 5-gram count. Content-defined ⇒ robust to whitespace-preserving
    * reorderings of unrelated docs; cheap equality prefilter. */
  val fpGram = 5
  /** One-pass [[graft.functions.MinGramHash32]]; equals
    * `array_min(transform(sequence(1, len-4), i -> hexInt(substr(text,i,5))))`
    * with a whole-text hash fallback for short texts, minus the per-gram
    * interpreted lambda dispatch. */
  def fingerprint(text: Column): Column =
    graft.functions.GramOps.minGramHash(text, fpGram)

  /** Distinct char 5-gram count — pairs with [[fingerprint]] as a cheap
    * containment prefilter. */
  def distinctGramCount(text: Column): Column =
    graft.functions.GramOps.distinctGramCount(text, fpGram)

  /** Feature-hashing document vectors (the hashing trick — Weinberger et
    * al. 2009): each word lands in bucket md5(word) mod `dim` with a
    * deterministic ±1 sign (md5 parity of a salted key — the signed
    * variant that keeps collision bias zero-mean), and the document's
    * vector is the per-bucket signed count. Pure integer arithmetic, so
    * the text → vector bridge is engine-exact end-to-end — the corpus
    * can be vectorized, quantized, indexed, and searched WITHOUT leaving
    * the engine (see `q_text_hashvec_knn`).
    *
    * Plan shape: explode words → one map-side-combined count keyed
    * (doc, bucket) → one per-doc collect of the SPARSE (bucket, v)
    * pairs into a map → dense assembly as a pure projection over the
    * dim-sized sequence (element_at per slot). The earlier form (r11)
    * materialized dim·|docs| rows through a shuffle join + a second
    * dim·|docs|-row collect; the sparse map form shuffles only the
    * nonzero buckets and was measured ~2× faster on the KNN chain.
    * Empty or null-text docs carry the zero vector. */
  def hashingVectors(docs: DataFrame, dim: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(words(col(textCol))).as("word"))
      .select(col(idCol), (hexInt(col("word")) % dim).as("bucket"),
        when(hexInt(concat(lit("s:"), col("word"))) % 2 === 0, 1L)
          .otherwise(-1L).as("sgn"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("sgn")).as("v"))
    val sparse = counts.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v"))))
        .as("m"))
    docs.select(col(idCol)).join(sparse, Seq(idCol), "left")
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          b => coalesce(element_at(col("m"), b), lit(0L))).as("vec"))
  }

  /** Gopher-style rule battery (Rae et al. 2021 §A1.1, thresholds
    * adapted to the short-doc synthetic corpus): the five independent
    * keep/drop flags a crawl-curation pass gates on, plus their
    * conjunction. Every rule is an INTEGER inequality on exact counts —
    * `mean word length ∈ [3, 10]` is tested as `3·T ≤ ΣL ≤ 10·T`, never
    * as a rounded division — so flags are engine-exact at any scale.
    * Pure projection over one pass of precomputed word stats: zero
    * shuffle, scan speed. */
  def gopherFlags(docs: DataFrame, minWords: Long = 10L,
      maxWords: Long = 100000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ws = words(col(textCol))
    val asFlag: Column => Column = c => when(c, 1L).otherwise(0L)
    val stats = docs.select(col(idCol),
      size(ws).cast("long").as("t"),
      length(concat_ws("", ws)).cast("long").as("sl"),
      regexp_count(col(textCol), lit("[^A-Za-z0-9\\s]")).cast("long").as("p"),
      length(col(textCol)).cast("long").as("l"),
      stopwordHits(words(lower(col(textCol))), "en").as("stops"),
      (size(ws) - size(array_distinct(ws))).cast("long").as("dups"))
    stats.select(col(idCol),
      asFlag(col("t") >= minWords && col("t") <= maxWords).as("f_nwords"),
      asFlag(lit(3L) * col("t") <= col("sl") &&
        col("sl") <= lit(10L) * col("t")).as("f_word_len"),
      asFlag(lit(10L) * col("p") <= col("l")).as("f_symbol"),
      asFlag(col("stops") >= 2L).as("f_stopwords"),
      asFlag(lit(2L) * col("dups") <= col("t")).as("f_dup_words"))
      .withColumn("keep",
        col("f_nwords") * col("f_word_len") * col("f_symbol") *
          col("f_stopwords") * col("f_dup_words"))
  }

  /** Add-one-smoothed bigram language-model score per document — the
    * LM-filter slot of a CCNet-shaped pipeline (Wenzek et al. 2020:
    * docs whose text the corpus LM finds improbable are boilerplate,
    * gibberish, or wrong-language): the corpus trains the model and
    * then every doc is scored against it, all inside the engine.
    *
    * Exact integer lattice (hash-stable in any engine): for each
    * bigram occurrence, P(w2|w1) is scored as
    * ppm = ⌊(c(w1,w2)+1)·10⁶ / (c(w1·)+V)⌋ — add-one smoothing over
    * the successor vocabulary V — and the doc score is the floor mean
    * ⌊Σ ppm / n_bigrams⌋. The product runs in decimal(38,0): c+1 can
    * exceed the int64·10⁶ window at corpus scale. A geometric-mean
    * (log-space) form would be the textbook perplexity but floats
    * flake across engines; the arithmetic ppm mean ranks documents
    * the same way for a filter threshold.
    *
    * Scale shape: ONE corpus bigram-count shuffle (map-side combined,
    * model is vocab²-bounded but heavy-tail small); c(w1·) derives
    * from the model by a vocab-sized aggregate; V is a 1-row
    * broadcast; scoring is one occurrences⋈model equi-join on the
    * bigram string (AQE skew-split handles hot function-word bigrams)
    * + one per-doc sum. Docs with < 2 words score 0 over 0 bigrams. */
  def lmScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val dec = "decimal(38,0)"
    // checkpointed: the occurrence stream feeds BOTH the model counts and
    // the scoring join — without the pin the corpus tokenizes twice
    // (the predictSelfTrained discipline)
    val b = docs.select(col(idCol),
      explode(ngrams(words(col(textCol)), 2)).as("bg"))
      .localCheckpoint(true)
    val c12 = b.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val c1 = c12
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val vocab = docs
      .select(explode(words(col(textCol))).as("w"))
      .agg(count_distinct(col("w")).as("vv"))
    val model = c12
      .join(c1, substring_index(col("bg"), " ", 1) === col("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("bg"), {
        val num = (col("c12") + lit(1L)).cast(dec) * lit(1000000L)
        val den = (col("c1") + col("vv")).cast(dec)
        floor(num / den).cast("long").as("ppm")
      })
    val scored = b.join(model, Seq("bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppm")).as("s"))
      .select(col(idCol), col("n_bigrams"),
        ((col("s") - pmod(col("s"), col("n_bigrams"))) / col("n_bigrams"))
          .cast("long").as("lm_ppm"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_ppm"), lit(0L)).as("lm_ppm"))
  }

  /** Interpolated Kneser–Ney bigram LM score — the standard n-gram
    * smoothing upgrade over [[lmScore]]'s add-one (Kneser & Ney 1995;
    * Chen & Goodman 1999 measure KN as the consistently best n-gram
    * smoother): probability mass discounted from seen bigrams is
    * redistributed by CONTINUATION counts (how many distinct contexts a
    * word follows), which stops high-frequency-but-context-bound words
    * ("Francisco") stealing mass from genuinely versatile ones.
    *
    * Exact integer lattice with discount d = 3/4: scaling counts by 4
    * makes the discounted numerator integral —
    *   P(w2|w1) = (c12−d)/c1 + d·N1+(w1·)/c1 · N1+(·w2)/N1+(··)
    *            = [(4·c12−3)·Nbi + 3·N1+(w1·)·N1+(·w2)] / (4·c1·Nbi)
    * (c12 ≥ 1 for every scored occurrence — the corpus trains the model
    * that scores it — so the max(·,0) clamp is vacuous and dropped).
    * ppm = the ⌊·10⁶⌋ lattice point of that rational; doc score is the
    * floor mean, as in [[lmScore]]. Products run in decimal(38,0).
    *
    * Scale shape identical to [[lmScore]]: ONE corpus bigram-count
    * shuffle; N1+(w1·), N1+(·w2) and Nbi are vocab-sized aggregates
    * DERIVED from the checkpointed bigram model (no second corpus
    * pass); scoring is one occurrences⋈model equi-join + per-doc sum. */
  def lmScoreKn(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // checkpointed occurrence stream: one corpus tokenization feeds both
    // the model counts and the scoring join (as in [[lmScore]])
    val b = docs.select(col(idCol),
      explode(ngrams(words(col(textCol)), 2)).as("bg"))
      .localCheckpoint(true)
    val c12 = b.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val scored = b.join(knPpmFromCounts(c12), Seq("bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppm")).as("s"))
      .select(col(idCol), col("n_bigrams"),
        ((col("s") - pmod(col("s"), col("n_bigrams"))) / col("n_bigrams"))
          .cast("long").as("kn_ppm"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_ppm"), lit(0L)).as("kn_ppm"))
  }

  /** The bigram-KN model from a (bg, c12) count table — (bg, ppm) on
    * the exact lattice. Shared by [[lmScoreKn]] (counts from this
    * corpus pass) and [[IncrementalLm]] (counts accumulated across
    * increments); the input must be pinned by the caller (it is read
    * four times: three derivation aggregates + the model join). */
  private[ext] def knPpmFromCounts(c12: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val w1of = substring_index(col("bg"), " ", 1)
    val w2of = substring_index(col("bg"), " ", -1)
    // context totals and type counts, all from the bigram model
    val left = c12.groupBy(w1of.as("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1w1"))
    val cont = c12.groupBy(w2of.as("w2"))
      .agg(count(lit(1)).as("n1w2"))
    val nbi = c12.agg(count(lit(1)).as("nbi"))
    c12
      .join(left, w1of === col("w1"))
      .join(cont, w2of === col("w2"))
      .crossJoin(broadcast(nbi))
      .select(col("bg"), {
        val num = ((col("c12") * 4 - 3).cast(dec) * col("nbi").cast(dec) +
          lit(3).cast(dec) * col("n1w1").cast(dec) * col("n1w2").cast(dec)) *
          lit(1000000L).cast(dec)
        val den = lit(4).cast(dec) * col("c1").cast(dec) * col("nbi").cast(dec)
        // exact floor: subtract the (exact) decimal remainder before the
        // division so no quotient rounding can cross a lattice point
        ((num - pmod(num, den)) / den).cast("long").as("ppm")
      })
  }

  /** Interpolated Kneser–Ney TRIGRAM LM score (VERDICT r14 #5) — the
    * recursion of [[lmScoreKn]] extended one level, which is the order
    * real perplexity filtering runs at (CCNet scores with a 5-gram
    * KenLM; n = 3 already separates phrase structure from word salad
    * where a bigram can't):
    *
    *   P(w3|w1w2) = (c123−d)/c12 + d·N1+(w1w2·)/c12 · P(w3|w2)
    *   P(w3|w2)   = (N1+(·w2w3)−d)/N1+(·w2·)
    *                + d·N1+(w2·)/N1+(·w2·) · N1+(·w3)/N1+(··)
    *
    * Every lower-order quantity is a CONTINUATION count (type counts,
    * not token counts — the Kneser–Ney insight), and every one derives
    * from the single trigram-count table: N1+(·w2w3) = distinct-w1
    * types per (w2,w3); N1+(·w2·) = trigram types with middle w2;
    * N1+(w2·) = distinct (w2,w3) types per w2; N1+(·w3) = distinct
    * (w2,w3) types per w3; N1+(··) = total (w2,w3) types. The corpus
    * trains the model that scores it, so c123 ≥ 1 and N1+(·w2w3) ≥ 1
    * for every scored occurrence — both max(·−d, 0) clamps are vacuous
    * and dropped.
    *
    * Exact integer lattice, d = 3/4 (4×-scaled as in [[lmScoreKn]]):
    *   ppm = ⌊10⁶·[(4·c123−3)·4·M·B + 3·N12·((4·N23−3)·B + 3·N2·N3)]
    *             / (16·c12·M·B)⌋
    * with M = N1+(·w2·), B = N1+(··). Products run in decimal(38,0):
    * the den term 16·c12·M·B·10⁶ stays inside 38 digits for per-shard
    * counts up to ~10¹⁰ — beyond that, train per language/source shard
    * (the shape a 100 TB perplexity filter has anyway: one LM per
    * language, never one LM over the union).
    *
    * Scale shape identical to [[lmScoreKn]]: ONE corpus trigram-count
    * shuffle; the four continuation tables are type-bounded aggregates
    * DERIVED from the checkpointed model (no second corpus pass); B is
    * a 1-row broadcast; scoring is one occurrences⋈model equi-join +
    * per-doc sum. Docs with < 3 words score 0 over 0 trigrams. */
  def lmScoreKn3(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // checkpointed occurrence stream: one corpus tokenization feeds both
    // the model counts and the scoring join
    val t = docs.select(col(idCol),
      explode(ngrams(words(col(textCol)), 3)).as("tg"))
      .localCheckpoint(true)
    val c123 = t.groupBy(col("tg")).agg(count(lit(1)).as("c123"))
      .localCheckpoint(true)
    val scored = t.join(kn3PpmFromCounts(c123), Seq("tg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("ppm")).as("s"))
      .select(col(idCol), col("n_trigrams"),
        ((col("s") - pmod(col("s"), col("n_trigrams"))) / col("n_trigrams"))
          .cast("long").as("kn3_ppm"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("kn3_ppm"), lit(0L)).as("kn3_ppm"))
  }

  /** The trigram-KN model from a (tg, c123) count table — (tg, ppm) on
    * the exact lattice; the five continuation tables derive inside.
    * Shared by [[lmScoreKn3]] and [[IncrementalLm.scoreIncrement3]];
    * the input must be pinned by the caller. */
  private[ext] def kn3PpmFromCounts(c123: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val w12of = substring_index(col("tg"), " ", 2)
    val w23of = substring_index(col("tg"), " ", -2)
    val w2of = substring_index(substring_index(col("tg"), " ", 2), " ", -1)
    val w3of = substring_index(col("tg"), " ", -1)
    // top-order context totals and type counts
    val top = c123.groupBy(w12of.as("w12"))
      .agg(sum(col("c123")).as("c12"), count(lit(1)).as("n12"))
    // (w2,w3) continuation types — checkpointed: feeds the mid/bottom
    // aggregates, the global type count, AND the model join
    val bt = c123.groupBy(w23of.as("w23")).agg(count(lit(1)).as("n23"))
      .localCheckpoint(true)
    val mid = bt.groupBy(substring_index(col("w23"), " ", 1).as("w2m"))
      .agg(sum(col("n23")).as("nmid2"), count(lit(1)).as("n2"))
    val bot = bt.groupBy(substring_index(col("w23"), " ", -1).as("w3b"))
      .agg(count(lit(1)).as("n3"))
    val nbb = bt.agg(count(lit(1)).as("nbb"))
    c123
      .join(top, w12of === col("w12"))
      .join(bt, w23of === col("w23"))
      .join(mid, w2of === col("w2m"))
      .join(bot, w3of === col("w3b"))
      .crossJoin(broadcast(nbb))
      .select(col("tg"), {
        val b = col("nbb").cast(dec)
        val pmidNum = (col("n23") * 4 - 3).cast(dec) * b +
          lit(3).cast(dec) * col("n2").cast(dec) * col("n3").cast(dec)
        val pmidDen = lit(4).cast(dec) * col("nmid2").cast(dec) * b
        val num = ((col("c123") * 4 - 3).cast(dec) * pmidDen +
          lit(3).cast(dec) * col("n12").cast(dec) * pmidNum) *
          lit(1000000L).cast(dec)
        val den = lit(4).cast(dec) * col("c12").cast(dec) * pmidDen
        // exact floor: subtract the decimal remainder before dividing
        ((num - pmod(num, den)) / den).cast("long").as("ppm")
      })
  }

  /** Terminator-run sentence split: `[.!?]+\s+`. Deliberately
    * lookbehind-free — RE2 engines (DuckDB) reject lookbehind, and the
    * oracle must split with the IDENTICAL pattern; each sentence's
    * trailing terminator run is consumed by the split, which both sides
    * then agree on. Empty fragments are dropped. */
  val sentenceSplitRegex = "[.!?]+\\s+"
  def sentences(text: Column): Column =
    filter(split(text, sentenceSplitRegex), s => length(s) > 0)

  /** Per-doc sentence-shape datasheet: count, mean chars (frac4 floor
    * lattice), max chars — the granularity readout sentence-boundary
    * chunking is tuned against. One scan, no shuffle. */
  def sentenceStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ss = sentences(col(textCol))
    val n = size(ss).cast("long")
    val totalChars = coalesce(
      aggregate(ss, lit(0L), (acc, s) => acc + length(s)), lit(0L))
    def frac4(num: Column, den: Column): Column = {
      val scaled = num * lit(10000L)
      when(den > 0, ((scaled - pmod(scaled, den)) / den).cast("double") / 10000.0)
        .otherwise(lit(0.0))
    }
    docs.select(col(idCol), n.as("n_sentences"),
      totalChars.as("total_chars"),
      frac4(totalChars, n).as("mean_sentence_chars"),
      coalesce(array_max(transform(ss, s => length(s).cast("long"))), lit(0L))
        .as("max_sentence_chars"))
  }

  /** Sentence-preserving chunking: sentences land in chunks by
    * cumulative-character bucket (`chunk_id = ⌊chars_before/budget⌋`) —
    * a sentence never splits across chunks, and chunk boundaries are a
    * pure function of the text. The cumulative sum windows PER DOC
    * (bounded input — a document's own sentences), never corpus-wide.
    * Output: (id, chunk_id, n_sentences, chunk_chars, chunk_text). */
  def chunkBySentences(docs: DataFrame, budget: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0, "chunkBySentences: budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val exploded = docs
      .select(col(idCol), posexplode(sentences(col(textCol)))
        .as(Seq("pos", "sentence")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    exploded
      .select(col(idCol), col("pos"), col("sentence"),
        coalesce(sum(length(col("sentence")).cast("long")).over(w), lit(0L))
          .as("before"))
      .select(col(idCol),
        ((col("before") - pmod(col("before"), lit(budget.toLong))) /
          lit(budget.toLong)).cast("long").as("chunk_id"),
        col("pos"), col("sentence"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(length(col("sentence")).cast("long")).as("chunk_chars"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("sentence")))),
          p => p.getField("sentence"))).as("chunk_text"))
  }

  /** Blocklist (bad-words) filter, C4-style (Raffel et al. 2020 dropped
    * any page containing a blocklisted word): per-doc count of
    * lowercased, punctuation-stripped tokens that hit the list, the hit
    * ratio on the frac4 lattice, and the drop decision
    * `is_blocked = n_flagged > 0`.
    *
    * Pure per-row projection against a literal array (the blocklist is a
    * plan constant, never a join side) — zero shuffle, whole-stage
    * codegen, exactly the shape a 100 TB pre-filter scan needs. Token
    * edges are stripped with `^[^a-z0-9]+|[^a-z0-9]+$` so "slow," and
    * "(slow)" match the entry "slow"; interior punctuation is kept
    * (entries can be multi-part like "don't"). */
  def blocklistStats(docs: DataFrame, blocklist: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bl = array(blocklist.map(w => lit(w.toLowerCase)): _*)
    // null text reads as empty (a null would thread size() = -1 through
    // every count below; a blank page is simply unblocked)
    val toks = words(lower(coalesce(col(textCol), lit(""))))
    val stripped = transform(toks,
      w => regexp_replace(w, "^[^a-z0-9]+|[^a-z0-9]+$", ""))
    val nw = size(toks).cast("long")
    val nf = size(filter(stripped, w => array_contains(bl, w))).cast("long")
    def frac4(num: Column, den: Column): Column = {
      val scaled = num * lit(10000L)
      when(den > 0,
        ((scaled - pmod(scaled, den)) / den).cast("double") / 10000.0)
        .otherwise(lit(0.0))
    }
    docs.select(col(idCol), nw.as("n_words"), nf.as("n_flagged"),
      frac4(nf, nw).as("flagged_ratio"),
      (nf > 0L).cast("int").cast("long").as("is_blocked"))
  }

  /** Heaps-law type-accumulation curve (Heaps 1978): split the corpus
    * into `buckets` equal doc-id prefix ranges and report, per bucket,
    * the token volume and the NEW word types first seen there, plus
    * both cumulative columns — the curve behind every type-bounded
    * claim in this engine (the tokenizer memo, the KN model state, the
    * distinct_words work counter all grow with cum_types, and Heaps'
    * law says that is ~O(cum_tokensᵝ), β<1). A flattening new_types
    * column IS the saturation the incremental faces bank on.
    *
    * Scale shape: one corpus tokenize to (bucket, word) pairs, ONE
    * type-keyed aggregate for first-seen bucket (map-side combined —
    * min is algebraic), one bucket-keyed count; the cumulative sums run
    * on the buckets-sized frame via a broadcast triangular join (no
    * global window, no corpus sort). Types are [[Bpe.pieces]] units —
    * the same alphabet the tokenizer memo and distinct_words counter
    * speak. */
  def heapsCurve(docs: DataFrame, buckets: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"need positive buckets, got $buckets")
    val mx = docs.agg((max(col(idCol)) + 1).as("mx"))
    val toks = docs.crossJoin(broadcast(mx))
      // integer `div`, not floor(double /): the oracle buckets with exact
      // integer division (doc_id * 20 // mx), and a double quotient of
      // id·buckets past 2^53 can round across a bucket boundary
      // (ADVICE r17) — `div` keeps the whole lattice in long arithmetic
      .select(expr(s"(`$idCol` * $buckets) div mx").as("b"),
        explode(Bpe.pieces(col(textCol))).as("w"))
      .localCheckpoint(true) // feeds first-seen AND per-bucket volume
    val newTypes = toks.groupBy(col("w")).agg(min(col("b")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("new_types"))
    val vol = toks.groupBy(col("b")).agg(count(lit(1)).as("n_tokens"))
    val curve = vol.join(newTypes, Seq("b"), "left")
      .select(col("b"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .localCheckpoint(true) // buckets-sized; read 3× by the cum join
    curve.as("l")
      .join(broadcast(curve.as("r")), col("r.b") <= col("l.b"))
      .groupBy(col("l.b").as("bucket"))
      .agg(max(col("l.n_tokens")).as("n_tokens"),
        max(col("l.new_types")).as("new_types"),
        sum(col("r.n_tokens")).as("cum_tokens"),
        sum(col("r.new_types")).as("cum_types"))
  }

  /** Type-token ratio per stratum — the classic lexical-diversity
    * readout (a low TTR stratum is template/boilerplate-heavy; TTR
    * collapse after dedup is the signal the dedup over-fired): distinct
    * lowercased words / total words on the frac4 lattice, one
    * map-side-combinable groupBy. The distinct count is EXACT (Spark's
    * count_distinct expand) — at 100 TB swap in the KMV sketch family
    * (q_kmv_distinct) when ±2 % suffices; this operator is the exact
    * gold those sketches are graded against. */
  def typeTokenRatio(docs: DataFrame, stratum: Column,
      textCol: String = "text"): DataFrame = {
    def frac4(num: Column, den: Column): Column = {
      val scaled = num * lit(10000L)
      when(den > 0,
        ((scaled - pmod(scaled, den)) / den).cast("double") / 10000.0)
        .otherwise(lit(0.0))
    }
    docs.select(stratum.as("stratum"),
        explode(words(lower(col(textCol)))).as("w"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_tokens"),
        count_distinct(col("w")).as("n_types"))
      .select(col("stratum"), col("n_tokens"), col("n_types"),
        frac4(col("n_types"), col("n_tokens")).as("ttr"))
  }

  /** LIX readability (Björnsson 1968) — the syllable-free readability
    * index (Flesch needs syllable counts no two engines agree on):
    *   LIX = words/sentence + 100 · longwords/words,  long = ≥ 7 chars,
    * emitted on the q4 floor lattice over the COMMON denominator s·w —
    *   lix_q4 = ⌊(w² + 100·lw·s)·10⁴ / (s·w)⌋
    * — one floor, never a sum of two separately-floored terms (which
    * would define a different, order-dependent value). The numerator
    * runs in decimal(38,0): w²·10⁴ wraps int64 on ~10⁸-word documents.
    * Pure codegen projection, zero shuffle; scriptless/empty docs score
    * 0. The canonical curation use: route >LIX-60 legalese and <LIX-25
    * fragment spam away from a readability-targeted mixture. */
  def readability(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val dec = "decimal(38,0)"
    val t = coalesce(col(textCol), lit(""))
    val ws = words(t)
    val ss = sentences(t)
    val w = size(ws).cast("long")
    val s = size(ss).cast("long")
    val lw = size(filter(ws, x => length(x) >= 7)).cast("long")
    val num = (w.cast(dec) * w.cast(dec) +
      lit(100L).cast(dec) * lw.cast(dec) * s.cast(dec)) *
      lit(10000L).cast(dec)
    val den = s.cast(dec) * w.cast(dec)
    docs.select(col(idCol), w.as("n_words"), s.as("n_sentences"),
      lw.as("n_long_words"),
      when(s > 0L && w > 0L,
        (((num - pmod(num, den)) / den).cast("double") / 10000.0))
        .otherwise(lit(0.0)).as("lix"))
  }

  /** Vocabulary frequency spectrum + Good–Turing unseen mass: word
    * types bucketed by count OCTAVE (octave = bit_length(count), the
    * log₂ histogram — computed via the binary-string-length trick, no
    * float log), with per-octave type and token mass; plus the
    * Good–Turing estimate of unseen probability mass p₀ = n₁/N (the
    * singleton-type token share, ppm floor) attached to every row —
    * the "how much vocabulary is this corpus still missing" readout
    * that decides whether more crawl is worth it, and the log-log
    * shape a Zipf eyeball reads, with none of log's cross-engine
    * flake. Two map-side-combined aggregates (word counts → octave
    * rollup); output is ≤ 64 rows. */
  def vocabSpectrum(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = docs
      .select(explode(words(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val spectrum = counts
      .groupBy(length(bin(col("c"))).as("octave"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"))
    val totals = spectrum.agg(
      sum(when(col("octave") === 1, col("n_types")).otherwise(0L))
        .as("n_singletons"),
      sum(col("n_tokens")).as("n_total"))
    val scaled = col("n_singletons").cast(dec) * lit(1000000L).cast(dec)
    val den = col("n_total").cast(dec)
    spectrum.crossJoin(broadcast(totals))
      .select(col("octave"), col("n_types"), col("n_tokens"),
        ((scaled - pmod(scaled, den)) / den).cast("long")
          .as("unseen_mass_ppm"))
  }

  /** Pairwise source-vocabulary overlap: Jaccard of the DISTINCT
    * lowercased word sets of every facet pair — the "are these two
    * providers the same corpus in different wrappers" audit that runs
    * before mixture weights are trusted. Postings shape: one distinct
    * (word, facet) projection; intersections via a word-keyed self-join
    * on facet < facet (vocab-bounded, never doc-bounded); sizes join
    * facet-sized. Jaccard on the q4 floor lattice. */
  def facetVocabOverlap(docs: DataFrame, facet: Column,
      textCol: String = "text"): DataFrame = {
    val post = docs
      .select(facet.as("f"), explode(words(lower(col(textCol)))).as("w"))
      .distinct()
      .localCheckpoint(true) // feeds sizes + both sides of the self-join
    val sizes = post.groupBy(col("f")).agg(count(lit(1)).as("sz"))
    val inter = post.as("a")
      .join(post.as("b"),
        col("a.w") === col("b.w") && col("a.f") < col("b.f"))
      .groupBy(col("a.f").as("f_a"), col("b.f").as("f_b"))
      .agg(count(lit(1)).as("n_common"))
    val scaled = col("n_common") * lit(10000L)
    val union = col("sz_a") + col("sz_b") - col("n_common")
    inter
      .join(sizes.select(col("f").as("f_a"), col("sz").as("sz_a")), Seq("f_a"))
      .join(sizes.select(col("f").as("f_b"), col("sz").as("sz_b")), Seq("f_b"))
      .select(col("f_a"), col("f_b"), col("n_common"), col("sz_a"),
        col("sz_b"),
        (((scaled - pmod(scaled, union)) / union).cast("double") / 10000.0)
          .as("jaccard"))
  }

  /** URL pattern in the Java∩RE2 subset (char classes + optional
    * non-capturing path — no lookaround), and its host-capture twin. */
  val urlRe = "https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9/._-]*)?"
  val urlHostRe = "https?://([A-Za-z0-9.-]+)"

  /** Per-domain provenance stats — the C4-style "which hosts feed this
    * corpus" readout a domain allow/block list is built from: extract
    * every URL, parse its host, count URLs and distinct documents per
    * domain. One Generate (explode of the per-row match list) + one
    * map-side-combined aggregate; the output is domain-sized. */
  def urlDomainStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), explode(regexp_extract_all(
        coalesce(col(textCol), lit("")), lit(urlRe), lit(0))).as("url"))
      .select(col(idCol),
        regexp_extract(col("url"), urlHostRe, 1).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col(idCol)).as("n_docs"))

  /** Unicode-script ranges as EXPLICIT codepoint classes — never
    * \p{script=...} properties, whose definitions drift across regex
    * engines and Unicode versions; a literal range means the same
    * codepoints in Java and RE2 forever. */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cjk" -> "[一-鿿]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "arabic" -> "[؀-ۿ]",
    "kana" -> "[぀-ヿ]")

  /** Per-document writing-script profile: character counts per script
    * class plus the dominant script (most chars wins; ties resolve by
    * the fixed [[scriptRanges]] order; no script chars → 'none') — the
    * routing signal script-specific tokenizers and the langid's
    * stoplist blind spots (zh/ja/ru have no Latin stopwords to hit)
    * need. Pure codegen projection, zero shuffle — scan speed on any
    * corpus. The synthetic corpus is Latin-only; the mechanism is
    * spec-proven on planted CJK/Cyrillic fixtures. */
  def scriptProfile(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val counts = scriptRanges.map { case (name, re) =>
      name -> regexp_count(t, lit(re)).cast("long")
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val dominant = counts.foldRight(lit("none"): Column) {
      case ((name, c), acc) => when(c > 0 && c === best, name).otherwise(acc)
    }
    docs.select(col(idCol) +: length(t).cast("long").as("n_chars") +:
      counts.map { case (name, c) => c.as(s"n_$name") } :+
      dominant.as("dominant"): _*)
  }

  /** Skip-gram co-occurrence counts (the word2vec training-pair
    * generator — Mikolov et al. 2013): ordered token pairs (w_i, w_{i+d})
    * for every distance d = 1..window, counted corpus-wide, rare pairs
    * (< minCount) dropped. Each distance's pairs are the two EXTREME
    * words of the (d+1)-grams — so the pair stream reuses the same
    * [[Hashing.ngrams]] generator (and the oracle the same
    * [[Hashing.ngramsSql]]) that every shingle operator is verified on.
    *
    * Scale shape: pure Generate (explode) over each doc's own tokens —
    * tokens·window pair occurrences, map-side combined down to the
    * distinct-pair vocabulary before the one (a,b)-keyed exchange.
    * Nothing joins, nothing windows; the hot path is codegen. */
  def skipgramPairs(docs: DataFrame, window: Int = 2, minCount: Long = 5L,
      textCol: String = "text"): DataFrame = {
    require(window >= 1, "skipgramPairs: window must be >= 1")
    val ws = words(lower(col(textCol)))
    val pairGrams = flatten(array((1 to window).map(d => ngrams(ws, d + 1)): _*))
    docs
      .select(explode(pairGrams).as("gram"))
      .select(substring_index(col("gram"), " ", 1).as("w_a"),
        substring_index(col("gram"), " ", -1).as("w_b"))
      .groupBy(col("w_a"), col("w_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minCount)
  }

  /** PMI collocation mining: adjacent bigrams scored by pointwise mutual
    * information on an exact integer lattice. True PMI is
    * log[ p(xy) / (p(x)·p(y)) ]; log is monotone, so ranking/thresholding
    * on the RATIO is ranking on PMI — and the ratio is exact integer
    * arithmetic where the log would hash-flake on last-ulp libm
    * differences between engines:
    *   pmi_ratio_q6 = ⌊ c_xy · N_u² · 10⁶ / (N_b · c_x · c_y) ⌋
    * (c_xy bigram count, N_b total bigrams, c_x/c_y unigram counts, N_u
    * total tokens; products run in decimal(38,0) — N_u²·10⁶ alone passes
    * int64 at ~3·10⁶ tokens). The floor is computed as
    * ⌊A/den⌋·10⁶ + ⌊(A mod den)·10⁶/den⌋ with A = c_xy·N_u², so the
    * A·10⁶ product never forms: exact while A < 10³⁸ (trillion-token
    * corpora with billion-count function-word bigrams included) and
    * while den·10⁶ < 10³⁸ (den = N_b·c_x·c_y < 10³² — only breached by
    * pairing two ≥10¹⁰-count words at ≥10¹²-token scale; shard the
    * corpus or pre-cap function words beyond that). Bigrams below
    * minCount are dropped BEFORE the unigram joins (the classic
    * low-count PMI blow-up filter).
    *
    * Scale shape: two map-side-combined counts (unigram vocab, bigram
    * vocab), two vocab-keyed equi-joins on the SURVIVING bigram types
    * (vocab-sized, never occurrence-sized), 1-row totals broadcast.
    * Hot function-word unigrams are join KEYS on the unigram side —
    * unique per key, so no skew fan-out. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5L,
      textCol: String = "text"): DataFrame = {
    val dec = "decimal(38,0)"
    val ws = words(lower(col(textCol)))
    val uni = docs.select(explode(ws).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds two joins + the N_u total
    val nu = uni.agg(sum(col("c")).as("n_uni"))
    val bg = docs.select(explode(ngrams(ws, 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_xy"))
      .localCheckpoint(true) // feeds the N_b total and the scored join
    val nb = bg.agg(sum(col("c_xy")).as("n_bi"))
    val survivors = bg.filter(col("c_xy") >= minCount)
      .select(substring_index(col("bg"), " ", 1).as("w_a"),
        substring_index(col("bg"), " ", -1).as("w_b"), col("c_xy"))
    val a = col("c_xy").cast(dec) * col("n_uni").cast(dec) *
      col("n_uni").cast(dec)
    val den = col("n_bi").cast(dec) * col("c_a").cast(dec) *
      col("c_b").cast(dec)
    val m = lit(1000000L).cast(dec)
    def floorDiv(x: Column, d: Column): Column = (x - pmod(x, d)) / d
    survivors
      .join(uni.select(col("w").as("w_a"), col("c").as("c_a")), Seq("w_a"))
      .join(uni.select(col("w").as("w_b"), col("c").as("c_b")), Seq("w_b"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("w_a"), col("w_b"), col("c_xy"), col("c_a"), col("c_b"),
        (floorDiv(a, den) * m + floorDiv(pmod(a, den) * m, den))
          .cast("long").as("pmi_ratio_q6"))
  }

  /** Character-concentration gibberish score: the Herfindahl index of
    * the doc's character unigram distribution on the exact ppm lattice,
    *   hhi_ppm = ⌊10⁶ · Σ c(ch)² / n²⌋,
    * where c(ch) is the count of each distinct character and n the doc
    * length in characters. Natural prose sits low (many characters share
    * the mass); repeated-character spam ("aaaa…", box-drawing filler)
    * drives the index toward 10⁶ — a log-free stand-in for character
    * entropy that cannot hash-flake (entropy's `ln` is not identically
    * rounded across engines; this is integer arithmetic end to end).
    *
    * Per-row projection over the doc's own characters — O(distinct·n)
    * per doc, zero shuffle. Counts square in decimal(38,0): n² overflows
    * int64·10⁶ already at ~3 MB docs. */
  def charConcentration(text: Column): Column = {
    val dec = "decimal(38,0)"
    val cs = transform(sequence(lit(1), greatest(length(text), lit(1))),
      i => text.substr(i, lit(1)))
    // Run-length fold over the SORTED characters — O(n log n) per row
    // where the naive distinct×scan is O(distinct·n) (a real difference
    // on large CJK docs whose alphabet runs to thousands). State:
    // (prev char, current run, Σ completed-run²); "" is a safe sentinel
    // (every element has length 1). The DuckDB oracle keeps the
    // distinct×filter form (no fold lambda there) — identical counts,
    // identical sum.
    val sorted = array_sort(cs)
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).cast(dec).as("acc"))
    val folded = aggregate(sorted, zero,
      (st, c) => {
        val samePrev = c === st.getField("prev")
        struct(c.as("prev"),
          when(samePrev, st.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          when(samePrev, st.getField("acc"))
            .otherwise(st.getField("acc") +
              (st.getField("run") * st.getField("run")).cast(dec)).as("acc"))
      },
      st => st.getField("acc") +
        (st.getField("run") * st.getField("run")).cast(dec))
    val n = length(text).cast("long")
    when(n > 0L, {
      val num = folded * lit(1000000L)
      val den = (n * n).cast(dec)
      ((num - pmod(num, den)) / den).cast("long")
    }).otherwise(lit(0L))
  }
}
