package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, the SentencePiece `--model_type=
  * unigram` family) — the Viterbi complement to [[Bpe]]'s greedy merges
  * (VERDICT r13 #4): a vocabulary of PIECES with per-piece costs, and
  * tokenization = the minimum-total-cost segmentation of each word.
  * Where BPE replays a fixed merge ORDER, unigram picks the globally
  * best segmentation under the model, which is why SentencePiece
  * defaults to it.
  *
  * Exactness (the whole point of this port): piece costs live on a
  * WHOLE-BIT surprisal lattice — cost(p) = ⌊log2(total/count_p)⌋,
  * computed on integers only (integer division, then exact bit length:
  * `63 − numberOfLeadingZeros` here, `len(printf('%b', x)) − 1` in the
  * DuckDB oracle). Viterbi then minimizes an integer sum with the fixed
  * tie rule (lower cost, then LONGER final piece), so all three
  * implementations — the distributed tokenizer, the driver-side EM
  * trainer, and the oracle's unrolled SQL — produce identical token
  * sequences, digest-checkable like every [[Bpe]] face. Quantizing
  * −log₂ p to whole bits is the documented price of cross-engine
  * exactness; ties the finer lattice would break fall to the
  * deterministic tie rule instead.
  *
  * Scale shape: tokenization runs per DISTINCT word, not per occurrence
  * — one corpus pass extracts (doc, pos, word) occurrences, the
  * Viterbi DP (a higher-order `aggregate` pair, the [[Eval.rougeL]]
  * pattern — O(len·maxPieceLen) per word) runs over the distinct-word
  * relation joined against the broadcast vocabulary, and tokens rejoin
  * occurrences by word. Type/token ratio does the amortizing, exactly
  * how a production tokenizer service memoizes. Training needs only
  * WORD WEIGHTS: the one corpus-wide job is the word-count aggregate;
  * the EM loop (segment → recount → re-estimate, with a prune in the
  * middle) runs driver-side over the collected vocabulary — the
  * [[Bpe.train]] bounded-collect discipline.
  */
object Unigram {

  /** Pieces longer than this never enter a vocabulary (bounds the DP's
    * inner loop and the substring-candidate space). */
  val maxPieceLen = 4

  /** Cost of a single character absent from the vocabulary — the UNK
    * floor that guarantees every string segments. */
  val unkCost = 24L

  /** Exact ⌊log₂ n⌋ for n ≥ 1. */
  def log2floor(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)

  /** The COMMITTED vocabulary — the analogue of a shipped .model file
    * (the [[Bpe.merges]] discipline): piece → whole-bit cost,
    * hand-assigned from English frequency classes. Single characters
    * cover the alphabet so segmentation always succeeds; characters
    * outside the table pay [[unkCost]]. */
  val pieces: Seq[(String, Long)] = Seq(
    // frequent words / suffixes
    "the" -> 9L, "and" -> 10L, "ing" -> 10L, "ion" -> 11L, "tion" -> 12L,
    "ent" -> 11L, "ati" -> 12L, "for" -> 11L, "that" -> 12L, "ter" -> 11L,
    "ers" -> 11L, "est" -> 11L, "ble" -> 12L, "ver" -> 12L, "all" -> 12L,
    // frequent bigrams
    "er" -> 8L, "in" -> 8L, "on" -> 8L, "at" -> 8L, "en" -> 8L, "es" -> 8L,
    "re" -> 8L, "an" -> 8L, "te" -> 9L, "ti" -> 9L, "st" -> 9L, "ar" -> 9L,
    "or" -> 9L, "ed" -> 9L, "of" -> 9L, "is" -> 9L, "it" -> 9L, "to" -> 9L,
    "al" -> 9L, "le" -> 9L, "se" -> 9L, "ou" -> 9L, "th" -> 9L, "he" -> 9L,
    "nd" -> 9L, "nt" -> 9L, "ne" -> 10L, "ro" -> 10L, "li" -> 10L,
    "ra" -> 10L, "co" -> 10L, "me" -> 10L, "di" -> 10L, "ic" -> 10L,
    "ce" -> 10L, "el" -> 10L, "ha" -> 10L, "ea" -> 10L, "ve" -> 10L,
    "ll" -> 10L, "de" -> 10L, "lo" -> 10L, "ur" -> 10L, "ma" -> 10L,
    "ri" -> 10L, "ta" -> 10L, "si" -> 10L, "wa" -> 11L, "ec" -> 11L,
    "ho" -> 11L, "ca" -> 11L,
    // single letters by frequency class
    "e" -> 12L, "t" -> 12L, "a" -> 12L, "o" -> 12L, "i" -> 12L, "n" -> 12L,
    "s" -> 13L, "h" -> 13L, "r" -> 13L, "d" -> 13L, "l" -> 13L,
    "c" -> 14L, "u" -> 14L, "m" -> 14L, "w" -> 14L, "f" -> 14L,
    "g" -> 14L, "y" -> 14L, "p" -> 14L, "b" -> 15L, "v" -> 15L,
    "k" -> 16L, "j" -> 18L, "x" -> 18L, "q" -> 18L, "z" -> 18L,
    // digits
    "0" -> 17L, "1" -> 17L, "2" -> 17L, "3" -> 17L, "4" -> 17L,
    "5" -> 17L, "6" -> 17L, "7" -> 17L, "8" -> 17L, "9" -> 17L)

  locally {
    val s = pieces.map(_._1)
    require(s.distinct.size == s.size, "duplicate piece in committed vocab")
    require(s.forall(p => p.nonEmpty && p.length <= maxPieceLen))
    require(pieces.forall(_._2 > 0L), "costs must be positive")
  }

  // -------------------------------------------------------- Viterbi DP
  // dp(j) = best (cost, piece length) for the length-j prefix; entry 0
  // is the empty prefix. Tie rule everywhere: lower cost wins, equal
  // cost prefers the LONGER final piece. The DP runs inside higher-order
  // aggregates (no UDF, no shuffle); dp and the back-walk are SEPARATE
  // projections so the dp expression is evaluated once (the HOF
  // subexpression-duplication lesson).

  private val BIG = Long.MaxValue / 4

  /** dp array for word `w` over `cands` (structs (j, l, cost), all
    * candidate pieces ENDING at j). */
  private def dpCol(w: Column, cands: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(0L).as("cost"), lit(0).as("l"))),
      (acc, j) => concat(acc, array(
        aggregate(
          filter(cands, c => c.getField("j") === j),
          struct(lit(BIG).as("cost"), lit(0).as("l")),
          (best, c) => {
            val t = element_at(acc, c.getField("j") - c.getField("l") + lit(1))
              .getField("cost") + c.getField("cost")
            when(t < best.getField("cost") ||
                (t === best.getField("cost") &&
                  c.getField("l") > best.getField("l")),
                struct(t.as("cost"), c.getField("l").as("l")))
              .otherwise(best)
          }))))

  /** Reconstruct the token list by walking the dp back from the end;
    * each step prepends the chosen piece, so the result reads left to
    * right. At most len(w) steps; exhausted steps no-op. */
  private def walkCol(w: Column, dp: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(length(w).as("pos"), array_repeat(lit(""), 0).as("out")),
      (st, _) => {
        val p = st.getField("pos")
        val l = element_at(dp, p + lit(1)).getField("l")
        when(p <= lit(0), st).otherwise(
          struct((p - l).as("pos"),
            concat(array(w.substr(p - l + lit(1), l)),
              st.getField("out")).as("out")))
      }).getField("out")

  /** (w, cands) per distinct word: every (end, len ≤ maxPieceLen)
    * substring that is in the vocabulary, plus the UNK fallback for
    * single chars outside it. The vocabulary is broadcast-joined — at
    * 100 TB a 32k-piece table is KBs. */
  private[ext] def candFrame(words: DataFrame, vocab: DataFrame,
      maxLen: Int = maxPieceLen): DataFrame = {
    val jl = explode(flatten(transform(
      sequence(lit(1), length(col("w"))),
      j => transform(sequence(lit(1), least(lit(maxLen), j)),
        l => struct(j.as("j"), l.as("l"))))))
    words.select(col("w"), jl.as("jl"))
      .select(col("w"), col("jl.j").as("j"), col("jl.l").as("l"),
        col("w").substr(col("jl.j") - col("jl.l") + lit(1), col("jl.l"))
          .as("piece"))
      .join(broadcast(vocab), Seq("piece"), "left")
      .filter(col("pcost").isNotNull || col("l") === lit(1))
      .select(col("w"), struct(col("j"), col("l"),
        coalesce(col("pcost"), lit(unkCost)).as("cost")).as("cand"))
      .groupBy(col("w"))
      .agg(sort_array(collect_list(col("cand"))).as("cands"))
  }

  /** The Viterbi segmenter as a frame transform: (w, cands) → (w, toks)
    * — the default `segment` of [[tokenizeWith]], exposed so the
    * incremental memoizer ([[IncrementalTokens]]) can run the identical
    * DP over just the NEW distinct words of an increment. */
  private[ext] def segmentFrame(cf: DataFrame): DataFrame = cf
    .withColumn("dp", dpCol(col("w"), col("cands")))
    .select(col("w"), walkCol(col("w"), col("dp")).as("toks"))

  /** Tokenize a corpus under a (piece, cost) vocabulary: (id, n_tokens,
    * tok_digest) — the same output contract as the [[Bpe]] faces (null
    * text → null digest; empty text → 0 tokens, md5 of ""). */
  def tokenize(docs: DataFrame, vocab: Seq[(String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenizeWith(docs, vocab, segmentFrame, idCol, textCol)

  /** One corpus pass: (id, pos, w) word occurrences, checkpointed —
    * it always feeds at least the distinct-word segmentation AND the
    * order-preserving rejoin. */
  private[ext] def occurrences(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = docs
    .select(col(idCol), posexplode(Bpe.pieces(col(textCol)))
      .as(Seq("pos", "w")))
    .localCheckpoint(true)

  /** The Bpe-contract projection over a (w, toks) relation: rejoin
    * occurrences by word, reassemble per-doc token streams in position
    * order, and emit (id, n_tokens, tok_digest). */
  private[ext] def contract(docs: DataFrame, occ: DataFrame,
      wordToks: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perDoc = occ.join(wordToks, Seq("w"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("toks"))
    docs.select(col(idCol), col(textCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        when(col("toks").isNull, lit(0L))
          .otherwise(size(col("toks")).cast("long")).as("n_tokens"),
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(md5(concat_ws(Bpe.sep,
            coalesce(col("toks"), array_repeat(lit(""), 0)))))
          .as("tok_digest"))
  }

  /** The shared occurrence/rejoin scaffolding around a pluggable
    * per-distinct-word segmenter (`segment`: (w, cands) → (w, toks)) —
    * [[WordPiece]] runs its greedy matcher through the same plan. */
  private[ext] def tokenizeWith(docs: DataFrame, vocab: Seq[(String, Long)],
      segment: DataFrame => DataFrame, idCol: String, textCol: String,
      maxLen: Int = maxPieceLen): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vdf = vocab.toDF("piece", "pcost")
    val occ = occurrences(docs, idCol, textCol)
    val seg = segment(candFrame(occ.select(col("w")).distinct(), vdf, maxLen))
    contract(docs, occ, seg, idCol, textCol)
  }

  // ---------------------------------------------------------- training
  // Kudo (2018) EM, hard-assignment variant on the integer lattice:
  // seed candidates = weighted substring counts; E-step = Viterbi
  // segmentation of the weighted word vocabulary under current costs;
  // M-step = whole-bit costs from the new usage counts; one prune to
  // the piece budget between the two EM rounds. Hard (Viterbi) E-steps
  // instead of forward-backward expectations is the documented
  // simplification that keeps every quantity an exact integer — soft
  // expectations are ratios of products of probabilities, which no
  // finite cross-engine lattice survives.

  /** Code-point split: Spark's length/substr and DuckDB's len/substr
    * both count CODE POINTS, Java's String counts UTF-16 units — the
    * driver DP must speak the engines' unit or a non-BMP character
    * desyncs the three implementations. */
  private[ext] def cps(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Driver-side Viterbi — the exact mirror of [[dpCol]]/[[walkCol]]
    * (same candidates, same tie rule), used by the EM loop. */
  def segmentWord(w: String, cost: collection.Map[String, Long])
      : List[String] = {
    val ch = cps(w)
    val n = ch.length
    val dpc = Array.fill(n + 1)(BIG)
    val dpl = new Array[Int](n + 1)
    dpc(0) = 0L
    var j = 1
    while (j <= n) {
      var bestC = BIG
      var bestL = 0
      var l = 1
      while (l <= math.min(maxPieceLen, j)) {
        val p = ch.slice(j - l, j).mkString
        val pc = cost.get(p)
          .orElse(if (l == 1) Some(unkCost) else None)
        pc.foreach { cc =>
          val t = dpc(j - l) + cc
          if (t < bestC || (t == bestC && l > bestL)) { bestC = t; bestL = l }
        }
        l += 1
      }
      dpc(j) = bestC; dpl(j) = bestL
      j += 1
    }
    var pos = n
    var out = List.empty[String]
    while (pos > 0) {
      val l = dpl(pos)
      out = ch.slice(pos - l, pos).mkString :: out
      pos -= l
    }
    out
  }

  private def countUses(vocab: Seq[(String, Long)],
      cost: collection.Map[String, Long]): Map[String, Long] = {
    val uses = collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (w, c) =>
      segmentWord(w, cost).foreach(p => uses(p) = uses.getOrElse(p, 0L) + c)
    }
    uses.toMap
  }

  /** Whole-bit costs from usage counts over a fixed piece set; zero
    * counts clamp to 1 (a kept-but-unused piece prices at the ceiling,
    * it never divides by zero). */
  private def costsOf(cnt: collection.Map[String, Long],
      ps: Seq[String]): Map[String, Long] = {
    val tot = ps.map(p => math.max(cnt.getOrElse(p, 0L), 1L)).sum
    ps.map(p => p -> log2floor(tot / math.max(cnt.getOrElse(p, 0L), 1L)))
      .toMap
  }

  /** Learn a unigram vocabulary from a corpus: `budget` multi-char
    * pieces (the q_bpe_train budget discipline — 12 matches the trained
    * BPE's merge count) on top of every seen character. Returns
    * (piece, cost, uses), piece-sorted. One distributed job (the word
    * count); everything after is driver-side over the collected
    * weighted vocabulary, like [[Bpe.train]]. */
  def train(docs: DataFrame, budget: Int = 12, seedCap: Int = 64,
      textCol: String = "text"): Seq[(String, Long, Long)] = {
    val vocab = docs.select(explode(Bpe.pieces(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    trainFromWordVocab(vocab, budget, seedCap)
  }

  /** The EM-prune loop over a collected weighted word vocabulary. */
  def trainFromWordVocab(vocab: Seq[(String, Long)], budget: Int = 12,
      seedCap: Int = 64): Seq[(String, Long, Long)] = {
    require(budget > 0 && seedCap >= budget)
    // seed: every substring occurrence up to maxPieceLen, word-weighted
    val seedCnt = collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (w, c) =>
      val ch = cps(w)
      var j = 1
      while (j <= ch.length) {
        var l = 1
        while (l <= math.min(maxPieceLen, j)) {
          val p = ch.slice(j - l, j).mkString
          seedCnt(p) = seedCnt.getOrElse(p, 0L) + c
          l += 1
        }
        j += 1
      }
    }
    val chars = seedCnt.keysIterator.filter(_.length == 1).toSeq.sorted
    val multi0 = seedCnt.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(seedCap).map(_._1)
    // EM round 1 over the seed set
    val cost0 = costsOf(seedCnt, chars ++ multi0)
    val uses1 = countUses(vocab, cost0)
    // prune to the budget by usage (ties: piece asc), drop unused
    val keepMulti = uses1.toSeq
      .filter { case (p, u) => p.length > 1 && u > 0L }
      .sortBy { case (p, u) => (-u, p) }.take(budget).map(_._1)
    val kept = chars ++ keepMulti
    // EM round 2 over the pruned vocabulary
    val cost1 = costsOf(uses1, kept)
    val uses2 = countUses(vocab, cost1)
    val cost2 = costsOf(uses2, kept)
    kept.sorted.map(p => (p, cost2(p), uses2.getOrElse(p, 0L)))
  }

  // ------------------------------------------------------------ oracle
  // DuckDB twins. The DP is the same list_reduce-pair shape as the
  // rougeL oracle: state and step share one element type (1-element
  // lists of structs), candidate filtering happens inside the lambda.
  // All CTE names carry a prefix so train + tokenize + composition with
  // other oracles can share one WITH.

  // DuckDB 1.0 list_reduce caveat (bisected on a two-row repro): a
  // lambda that returns the UNCHANGED state list through a whole-state
  // CASE misaligns rows when list lengths differ across the vector —
  // 'customer' walked out 'spark''s tokens. Both lambdas below therefore
  // construct a FRESH single-element state list every step; any CASE
  // yields a scalar (struct / inner list), never the state itself.

  private def dpSqlOf(w: String, cands: String): String =
    s"""list_reduce(
       |  list_concat([[{'cost': CAST(0 AS BIGINT), 'l': CAST(0 AS BIGINT)}]],
       |    list_transform(range(1, len($w) + 1),
       |      j -> [{'cost': CAST(0 AS BIGINT), 'l': j}])),
       |  (acc, el) -> list_append(acc,
       |    list_reduce(
       |      list_concat([[{'cost': CAST($BIG AS BIGINT), 'l': CAST(0 AS BIGINT)}]],
       |        list_transform(list_filter($cands, c -> c.j = el[1].l),
       |          c -> [{'cost': c.cost, 'l': c.l}])),
       |      (best, ce) -> [CASE
       |        WHEN acc[el[1].l - ce[1].l + 1].cost + ce[1].cost < best[1].cost
       |          OR (acc[el[1].l - ce[1].l + 1].cost + ce[1].cost = best[1].cost
       |              AND ce[1].l > best[1].l)
       |        THEN {'cost': acc[el[1].l - ce[1].l + 1].cost + ce[1].cost,
       |              'l': ce[1].l}
       |        ELSE best[1] END])[1]))""".stripMargin

  private def walkSqlOf(w: String, dp: String): String =
    s"""list_reduce(
       |  list_concat([[{'pos': CAST(len($w) AS BIGINT),
       |                 'out': CAST([] AS VARCHAR[])}]],
       |    list_transform(range(1, len($w) + 1),
       |      x -> [{'pos': CAST(0 AS BIGINT), 'out': CAST([] AS VARCHAR[])}])),
       |  (st, ig) -> [{'pos': st[1].pos - $dp[st[1].pos + 1].l,
       |    'out': list_concat(
       |      CASE WHEN st[1].pos <= 0 THEN CAST([] AS VARCHAR[])
       |        ELSE [substr($w,
       |          CAST(st[1].pos - $dp[st[1].pos + 1].l + 1 AS BIGINT),
       |          CAST($dp[st[1].pos + 1].l AS BIGINT))] END,
       |      st[1].out)}])[1].out""".stripMargin

  /** Exact ⌊log₂ n⌋ in DuckDB (binary digit count, no floats). */
  private def log2Sql(n: String): String =
    s"CAST(len(printf('%b', CAST($n AS BIGINT))) - 1 AS BIGINT)"

  /** Candidate-chain CTEs reading vocabulary CTE `vocabCte(piece,
    * pcost)`; emits `${p}occ(id, pos, w)` and `${p}cl(w, cands)` — the
    * shared front half of every distinct-word segmenter ([[WordPiece]]
    * reuses it). */
  private[ext] def candCtes(p: String, docsTable: String, idCol: String,
      textExpr: String, vocabCte: String,
      maxLen: Int = maxPieceLen): String =
    s"""${p}ps AS (SELECT $idCol AS id, ${Bpe.piecesSql(textExpr)} AS ps
       |  FROM $docsTable),
       |${p}occ AS (SELECT id, CAST(pos AS BIGINT) AS pos,
       |    ps[CAST(pos AS BIGINT)] AS w
       |  FROM (SELECT id, ps, unnest(range(1, len(ps) + 1)) AS pos
       |        FROM ${p}ps)),
       |${p}w AS (SELECT DISTINCT w FROM ${p}occ),
       |${p}jl AS (SELECT w, j, l FROM (
       |  SELECT w, j, unnest(range(1, least($maxLen, j) + 1)) AS l
       |  FROM (SELECT w, unnest(range(1, len(w) + 1)) AS j FROM ${p}w))),
       |${p}cd AS (SELECT c.w, {'j': c.j, 'l': c.l,
       |    'cost': coalesce(v.pcost, $unkCost)} AS cand
       |  FROM (SELECT w, j, l,
       |      substr(w, CAST(j - l + 1 AS BIGINT), CAST(l AS BIGINT)) AS piece
       |    FROM ${p}jl) c
       |  LEFT JOIN $vocabCte v USING (piece)
       |  WHERE v.pcost IS NOT NULL OR c.l = 1),
       |${p}cl AS (SELECT w, list(cand ORDER BY cand.j, cand.l) AS cands
       |  FROM ${p}cd GROUP BY w)""".stripMargin

  /** Order-preserving per-doc rejoin over `${p}sg(w, toks)`. */
  private[ext] def docCte(p: String): String =
    s"""${p}doc AS (SELECT o.id, flatten(list(s.toks ORDER BY o.pos)) AS toks
       |  FROM ${p}occ o JOIN ${p}sg s USING (w) GROUP BY o.id)""".stripMargin

  /** Tokenize-chain CTEs reading vocabulary CTE `vocabCte(piece,
    * pcost)`; emits `${p}doc(id, toks)`. */
  private def tokenizeCtes(p: String, docsTable: String, idCol: String,
      textExpr: String, vocabCte: String): String =
    s"""${candCtes(p, docsTable, idCol, textExpr, vocabCte)},
       |${p}dp AS (SELECT w, ${dpSqlOf("w", "cands")} AS dp FROM ${p}cl),
       |${p}sg AS (SELECT w, ${walkSqlOf("w", "dp")} AS toks FROM ${p}dp),
       |${docCte(p)}""".stripMargin

  /** Final per-doc projection over `${p}doc` (the Bpe output contract). */
  private[ext] def tokenizeSelect(p: String, docsTable: String, idCol: String,
      textExpr: String): String =
    s"""SELECT d.$idCol, CAST(coalesce(len(u.toks), 0) AS BIGINT) AS n_tokens,
       |  CASE WHEN $textExpr IS NULL THEN NULL
       |    ELSE coalesce(md5(array_to_string(u.toks, '${Bpe.sep}')), md5(''))
       |  END AS tok_digest
       |FROM $docsTable d LEFT JOIN ${p}doc u ON u.id = d.$idCol""".stripMargin

  /** One-statement oracle: tokenize under the COMMITTED vocabulary. */
  def tokenizeSqlOf(docsTable: String, idCol: String,
      textExpr: String): String = {
    val vals = pieces.sortBy(_._1)
      .map { case (pc, c) => s"('$pc', CAST($c AS BIGINT))" }.mkString(", ")
    s"""WITH ugv AS (SELECT * FROM (VALUES $vals) AS t(piece, pcost)),
       |${tokenizeCtes("ug", docsTable, idCol, textExpr, "ugv")}
       |${tokenizeSelect("ug", docsTable, idCol, textExpr)}""".stripMargin
  }

  /** Train-chain CTEs: seed counts → costs → E1 → prune → E2 → final
    * (piece, pcost, uses) in `${p}vf`. Mirrors [[trainFromWordVocab]]
    * step for step. */
  private def trainCtes(p: String, docsTable: String, textExpr: String,
      budget: Int, seedCap: Int): String = {
    // segmentation block over the weighted words ${p}v0 under a cost
    // CTE `costs(piece, pcost)` → usage counts (piece, u)
    def eStep(q: String, costCte: String): String =
      s"""${q}cd AS (SELECT c.w, {'j': c.j, 'l': c.l,
         |    'cost': coalesce(v.pcost, $unkCost)} AS cand
         |  FROM (SELECT w, j, l,
         |      substr(w, CAST(j - l + 1 AS BIGINT), CAST(l AS BIGINT)) AS piece
         |    FROM ${p}jl) c
         |  LEFT JOIN $costCte v USING (piece)
         |  WHERE v.pcost IS NOT NULL OR c.l = 1),
         |${q}cl AS (SELECT w, list(cand ORDER BY cand.j, cand.l) AS cands
         |  FROM ${q}cd GROUP BY w),
         |${q}dp AS (SELECT w, ${dpSqlOf("w", "cands")} AS dp FROM ${q}cl),
         |${q}sg AS (SELECT w, ${walkSqlOf("w", "dp")} AS toks FROM ${q}dp),
         |${q}u AS (SELECT piece, CAST(sum(c) AS BIGINT) AS u
         |  FROM (SELECT s.w, unnest(s.toks) AS piece FROM ${q}sg s) t
         |  JOIN ${p}v0 v ON v.w = t.w GROUP BY piece)""".stripMargin
    s"""${p}v0 AS (SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(${Bpe.piecesSql(textExpr)}) AS w
       |        FROM $docsTable) GROUP BY w),
       |${p}jl AS (SELECT w, j, l FROM (
       |  SELECT w, j, unnest(range(1, least($maxPieceLen, j) + 1)) AS l
       |  FROM (SELECT w, unnest(range(1, len(w) + 1)) AS j
       |        FROM (SELECT DISTINCT w FROM ${p}v0)))),
       |${p}sc AS (SELECT substr(w, CAST(j - l + 1 AS BIGINT),
       |      CAST(l AS BIGINT)) AS piece, CAST(sum(c) AS BIGINT) AS cnt
       |  FROM ${p}jl jl JOIN ${p}v0 v USING (w) GROUP BY 1),
       |${p}ch AS (SELECT piece, cnt FROM ${p}sc WHERE len(piece) = 1),
       |${p}m0 AS (SELECT piece, cnt FROM ${p}sc WHERE len(piece) > 1
       |  ORDER BY cnt DESC, piece LIMIT $seedCap),
       |${p}s0 AS (SELECT piece, cnt FROM ${p}ch
       |  UNION ALL SELECT piece, cnt FROM ${p}m0),
       |${p}c0 AS (SELECT piece,
       |    ${log2Sql(s"(SELECT sum(greatest(cnt, 1)) FROM ${p}s0) // greatest(cnt, 1)")}
       |    AS pcost FROM ${p}s0),
       |${eStep(s"${p}e1", s"${p}c0")},
       |${p}km AS (SELECT piece, u FROM ${p}e1u
       |  WHERE len(piece) > 1 AND u > 0
       |  ORDER BY u DESC, piece LIMIT $budget),
       |${p}kp AS (SELECT ch.piece, coalesce(u.u, 0) AS u
       |  FROM ${p}ch ch LEFT JOIN ${p}e1u u USING (piece)
       |  UNION ALL SELECT piece, u FROM ${p}km),
       |${p}c1 AS (SELECT piece,
       |    ${log2Sql(s"(SELECT sum(greatest(u, 1)) FROM ${p}kp) // greatest(u, 1)")}
       |    AS pcost FROM ${p}kp),
       |${eStep(s"${p}e2", s"${p}c1")},
       |${p}k2 AS (SELECT k.piece, coalesce(u.u, 0) AS u
       |  FROM ${p}kp k LEFT JOIN ${p}e2u u USING (piece)),
       |${p}vf AS (SELECT piece,
       |    ${log2Sql(s"(SELECT sum(greatest(u, 1)) FROM ${p}k2) // greatest(u, 1)")}
       |    AS pcost, u AS uses FROM ${p}k2)""".stripMargin
  }

  /** Learned-vocabulary oracle: (piece, cost, uses). */
  def trainSqlOf(docsTable: String, textExpr: String, budget: Int = 12,
      seedCap: Int = 64): String =
    s"""WITH ${trainCtes("ut", docsTable, textExpr, budget, seedCap)}
       |SELECT piece, pcost AS cost, uses FROM utvf""".stripMargin

  /** Train-then-tokenize oracle: the corpus tokenized under the
    * vocabulary the same statement just learned. */
  def tokenizeTrainedSqlOf(docsTable: String, idCol: String,
      textExpr: String, budget: Int = 12, seedCap: Int = 64): String =
    s"""WITH ${trainCtes("ut", docsTable, textExpr, budget, seedCap)},
       |${tokenizeCtes("uq", docsTable, idCol, textExpr, "utvf")}
       |${tokenizeSelect("uq", docsTable, idCol, textExpr)}""".stripMargin
}
