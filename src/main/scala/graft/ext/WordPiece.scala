package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece-style tokenizer (Schuster & Nakajima 2012; BERT's apply
  * rule): GREEDY LONGEST-MATCH segmentation — at each position take the
  * longest vocabulary piece that matches, advance, repeat. Completes the
  * engine's tokenizer trio: [[Bpe]] replays a merge ORDER, [[Unigram]]
  * solves for the min-cost segmentation, WordPiece takes the locally
  * longest piece — three deterministic answers to "how does this word
  * split", each oracle-checkable, and the greedy-vs-optimal gap is
  * itself a registry readout (`q_tokenizer_greedy_gap`).
  *
  * Documented simplifications vs BERT's tokenizer: no `##` continuation
  * marking (pieces are position-independent — the [[Unigram]]
  * convention, so the two tokenizers are comparable on the SAME
  * vocabulary) and single-character fallback instead of whole-word
  * [UNK] (lossless; the char either is in the vocabulary or pays its
  * way as itself). Matching is pure membership — costs on the shared
  * (piece, cost) vocabulary shape are ignored.
  *
  * Scale shape is inherited wholesale from [[Unigram.tokenizeWith]]:
  * one corpus pass, greedy matching per DISTINCT word over broadcast
  * vocabulary candidates, order-preserving rejoin. The greedy walk is a
  * single higher-order aggregate (no DP table needed — each step takes
  * max piece length among candidates starting at the cursor). */
object WordPiece {

  /** Long enough for any vocabulary this engine trains (12 BPE merges
    * chain to ≤ 13 chars); candidates above a word's length never
    * materialize, so the bound costs candidate rows, not correctness. */
  val maxLen = 16

  // ------------------------------------------------- BERT conventions
  /** The continuation marker and unknown-word sentinel of BERT's
    * shipped vocabularies (Devlin et al. 2018, tokenization.py). */
  val contMark = "##"
  val unk = "[UNK]"

  /** Committed continuation-length cutoff for [[bertPieces]]: real BERT
    * vocabularies carry shorter continuation pieces than word-initial
    * ones; pieces above this length are INITIAL-ONLY in the derived
    * vocabulary, which is exactly where the position-DEPENDENT rule
    * diverges from the position-independent one on the same pieces
    * (e.g. mid-word "tion" matches flat but not as `##tion`). */
  val maxContLen = 3

  /** The committed BERT-convention vocabulary — [[Unigram.pieces]]
    * re-shipped under the `##` convention: every piece word-initial,
    * pieces of length ≤ [[maxContLen]] also as continuations. Costs are
    * carried but ignored by matching (the WordPiece contract). */
  val bertPieces: Seq[(String, Long)] =
    Unigram.pieces ++ Unigram.pieces.collect {
      case (p, c) if p.length <= maxContLen => (contMark + p, c)
    }

  /** Split a ##-convention vocabulary into (word-initial set,
    * continuation set). A piece may be in both (listed bare AND with
    * `##`). */
  def bertSplit(vocab: Seq[(String, Long)])
      : (Set[String], Set[String]) = {
    val init = vocab.collect {
      case (p, _) if !p.startsWith(contMark) => p }.toSet
    val cont = vocab.collect {
      case (p, _) if p.startsWith(contMark) => p.drop(contMark.length) }.toSet
    (init, cont)
  }

  // ------------------------------------------------------ greedy walk
  /** Greedy longest-match over `cands` (structs (j, l, cost) — pieces
    * ENDING at j, so a piece STARTING at the cursor p has j − l = p).
    * Single-char fallback rows exist for every position, so the cursor
    * always advances and the walk terminates within len(w) steps. */
  private def greedyCol(w: Column, cands: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(lit(0).as("pos"), array_repeat(lit(""), 0).as("out")),
      (st, _) => {
        val p = st.getField("pos")
        val lmax = aggregate(
          filter(cands, c => c.getField("j") - c.getField("l") === p),
          lit(0), (m, c) => greatest(m, c.getField("l")))
        when(p >= length(w), st).otherwise(
          struct((p + lmax).as("pos"),
            concat(st.getField("out"),
              array(w.substr(p + lit(1), lmax))).as("out")))
      }).getField("out")

  /** Tokenize a corpus by greedy longest match under a vocabulary
    * (costs ignored): (id, n_tokens, tok_digest), the shared tokenizer
    * output contract. */
  def tokenize(docs: DataFrame, vocab: Seq[(String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Unigram.tokenizeWith(docs, vocab, cf => cf
      .select(col("w"), greedyCol(col("w"), col("cands")).as("toks")),
      idCol, textCol, maxLen)

  /** Driver mirror of [[greedyCol]] (same candidates, same rule). */
  def segmentGreedy(w: String, vocab: collection.Set[String])
      : List[String] = {
    val ch = Unigram.cps(w)
    val n = ch.length
    var pos = 0
    val out = List.newBuilder[String]
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      while (l > 1 && !vocab.contains(ch.slice(pos, pos + l).mkString))
        l -= 1
      out += ch.slice(pos, pos + l).mkString
      pos += l
    }
    out.result()
  }

  /** The standard BPE→WordPiece vocabulary conversion (what HF does
    * when it ships a BERT vocab trained as BPE): every corpus character
    * plus every merge output. One distributed word scan for the merge
    * training (inside [[Bpe.train]]) and one bounded character-distinct
    * collect — both [[Bpe.train]]-class. */
  def vocabFromBpe(docs: DataFrame, numMerges: Int = 12,
      textCol: String = "text"): Seq[(String, Long)] = {
    val merges = Bpe.train(docs, numMerges, textCol)
      .map { case (l, r, _) => l + r }
    val chars = docs
      .select(explode(Bpe.pieces(col(textCol))).as("w"))
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("c"))
      .distinct().collect().map(_.getString(0)).toSeq
    (chars ++ merges).distinct.sorted.map(p => p -> 0L)
  }

  // ------------------------------------------------------------ oracle

  /** Greedy walk in DuckDB — fresh-state list_reduce (the Unigram
    * list_reduce caveat applies verbatim: never return `st` through a
    * whole-state CASE). lmax is written twice (cursor advance + piece
    * slice); it is a candidate-list fold, lattice-bounded. */
  private def greedySqlOf(w: String, cands: String): String = {
    val lmax =
      s"""list_reduce(
         |  list_concat([[CAST(0 AS BIGINT)]],
         |    list_transform(list_filter($cands,
         |      c -> c.j - c.l = st[1].pos), c -> [c.l])),
         |  (m, x) -> [greatest(m[1], x[1])])[1]""".stripMargin
    s"""list_reduce(
       |  list_concat([[{'pos': CAST(0 AS BIGINT),
       |                 'out': CAST([] AS VARCHAR[])}]],
       |    list_transform(range(1, len($w) + 1),
       |      x -> [{'pos': CAST(0 AS BIGINT), 'out': CAST([] AS VARCHAR[])}])),
       |  (st, ig) -> [{'pos': CASE WHEN st[1].pos >= len($w) THEN st[1].pos
       |      ELSE st[1].pos + $lmax END,
       |    'out': list_concat(st[1].out,
       |      CASE WHEN st[1].pos >= len($w) THEN CAST([] AS VARCHAR[])
       |        ELSE [substr($w, CAST(st[1].pos + 1 AS BIGINT),
       |                CAST($lmax AS BIGINT))] END)}])[1].out""".stripMargin
  }

  private def vocabValues(vocab: Seq[(String, Long)]): String =
    vocab.sortBy(_._1)
      .map { case (pc, c) => s"('$pc', CAST($c AS BIGINT))" }.mkString(", ")

  /** One-statement oracle: greedy tokenize under the COMMITTED
    * [[Unigram.pieces]] vocabulary (costs ignored by matching). */
  def tokenizeSqlOf(docsTable: String, idCol: String,
      textExpr: String): String =
    s"""WITH wpv AS (SELECT * FROM (VALUES ${vocabValues(Unigram.pieces)})
       |  AS t(piece, pcost)),
       |${Unigram.candCtes("wp", docsTable, idCol, textExpr, "wpv", maxLen)},
       |wpsg AS (SELECT w, ${greedySqlOf("w", "cands")} AS toks FROM wpcl),
       |${Unigram.docCte("wp")}
       |${Unigram.tokenizeSelect("wp", docsTable, idCol, textExpr)}""".stripMargin

  /** Train-then-tokenize oracle: the BPE merge chain learns in SQL
    * (the q_bpe_train CTEs), its outputs plus every corpus character
    * form the vocabulary, greedy matching applies it. */
  def tokenizeTrainedSqlOf(docsTable: String, idCol: String,
      textExpr: String, numMerges: Int = 12): String = {
    val mergeSelects = (1 to numMerges)
      .map(k => s"SELECT l || r AS piece FROM m$k").mkString("\n  UNION ALL ")
    s"""WITH ${Bpe.trainStepsSql(docsTable, textExpr, numMerges)},
       |wpch AS (SELECT DISTINCT substr(w, CAST(x AS BIGINT), 1) AS piece
       |  FROM (SELECT w, unnest(range(1, len(w) + 1)) AS x FROM v0)),
       |wpv AS (SELECT DISTINCT piece, CAST(0 AS BIGINT) AS pcost FROM (
       |  SELECT piece FROM wpch
       |  UNION ALL $mergeSelects)),
       |${Unigram.candCtes("wp", docsTable, idCol, textExpr, "wpv", maxLen)},
       |wpsg AS (SELECT w, ${greedySqlOf("w", "cands")} AS toks FROM wpcl),
       |${Unigram.docCte("wp")}
       |${Unigram.tokenizeSelect("wp", docsTable, idCol, textExpr)}""".stripMargin
  }
}
