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

  /** The greedy matcher as a frame transform: (w, cands) → (w, toks) —
    * the WordPiece analogue of [[Unigram.segmentFrame]], shared by the
    * batch path and [[IncrementalTokens]]' memoized face. */
  private[ext] def segmentFrame(cf: DataFrame): DataFrame = cf
    .select(col("w"), greedyCol(col("w"), col("cands")).as("toks"))

  /** Tokenize a corpus by greedy longest match under a vocabulary
    * (costs ignored): (id, n_tokens, tok_digest), the shared tokenizer
    * output contract. */
  def tokenize(docs: DataFrame, vocab: Seq[(String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Unigram.tokenizeWith(docs, vocab, segmentFrame, idCol, textCol, maxLen)

  // -------------------------------------------- BERT-parity apply rule
  /** Position-DEPENDENT greedy walk (BERT's rule): at the word start
    * only word-initial pieces match, past it only `##` continuations;
    * a position with NO match fails the WHOLE word to `[UNK]` (there is
    * no single-char fallback — that is the flat variant's lossless
    * simplification this mode undoes). `cands` are structs
    * (j, l, ini, con) — vocabulary matches only. */
  private def greedyBertCol(w: Column, cands: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(lit(0).as("pos"), array_repeat(lit(""), 0).as("out"),
        lit(false).as("bad")),
      (st, _) => {
        val p = st.getField("pos")
        val lmax = aggregate(
          filter(cands, c => c.getField("j") - c.getField("l") === p &&
            when(p === 0, c.getField("ini")).otherwise(c.getField("con"))),
          lit(0), (m, c) => greatest(m, c.getField("l")))
        when(st.getField("bad") || p >= length(w), st)
          .otherwise(when(lmax === 0,
            struct(p.as("pos"), st.getField("out").as("out"),
              lit(true).as("bad")))
          .otherwise(struct((p + lmax).as("pos"),
            concat(st.getField("out"), array(concat(
              when(p === 0, lit("")).otherwise(lit(contMark)),
              w.substr(p + lit(1), lmax)))).as("out"),
            lit(false).as("bad"))))
      },
      st => when(st.getField("bad"), array(lit(unk)))
        .otherwise(st.getField("out")))

  /** (w, cands) for the BERT walk: vocabulary matches only (inner
    * join), each flagged word-initial/continuation; words with zero
    * matches keep an EMPTY candidate list (the walk fails them to
    * `[UNK]` on step one) — they must not drop from the rejoin. */
  private def candFrameBert(words: DataFrame, vocab: DataFrame)
      : DataFrame = {
    val jl = explode(flatten(transform(
      sequence(lit(1), length(col("w"))),
      j => transform(sequence(lit(1), least(lit(maxLen), j)),
        l => struct(j.as("j"), l.as("l"))))))
    val matched = words.select(col("w"), jl.as("jl"))
      .select(col("w"), col("jl.j").as("j"), col("jl.l").as("l"),
        col("w").substr(col("jl.j") - col("jl.l") + lit(1), col("jl.l"))
          .as("piece"))
      .join(broadcast(vocab), Seq("piece"))
      .select(col("w"), struct(col("j"), col("l"), col("ini"), col("con"))
        .as("cand"))
      .groupBy(col("w"))
      .agg(sort_array(collect_list(col("cand"))).as("cands"))
    words.join(matched, Seq("w"), "left")
      .select(col("w"), coalesce(col("cands"), array_repeat(
        struct(lit(0).as("j"), lit(0).as("l"), lit(false).as("ini"),
          lit(false).as("con")), 0)).as("cands"))
  }

  /** Tokenize under BERT conventions: `##`-marked continuations,
    * whole-word `[UNK]` on any unmatched position. Output adds
    * `n_unk_words` to the shared contract: (id, n_tokens, n_unk_words,
    * tok_digest). Same scale shape as [[Unigram.tokenizeWith]] (one
    * corpus pass, per-DISTINCT-word walk over broadcast vocabulary,
    * order-preserving rejoin) — inlined because of the extra output
    * column. */
  def tokenizeBert(docs: DataFrame, vocab: Seq[(String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (init, cont) = bertSplit(vocab)
    val vdf = (init ++ cont).toSeq.distinct.sorted
      .map(p => (p, init(p), cont(p))).toDF("piece", "ini", "con")
    val occ = docs
      .select(col(idCol), posexplode(Bpe.pieces(col(textCol)))
        .as(Seq("pos", "w")))
      .localCheckpoint(true)
    val seg = candFrameBert(occ.select(col("w")).distinct(), vdf)
      .select(col("w"), greedyBertCol(col("w"), col("cands")).as("toks"))
    val perDoc = occ.join(seg, Seq("w"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("toks"))
    docs.select(col(idCol), col(textCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        when(col("toks").isNull, lit(0L))
          .otherwise(size(col("toks")).cast("long")).as("n_tokens"),
        when(col("toks").isNull, lit(0L))
          .otherwise(size(filter(col("toks"), t => t === lit(unk)))
            .cast("long")).as("n_unk_words"),
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(md5(concat_ws(Bpe.sep,
            coalesce(col("toks"), array_repeat(lit(""), 0)))))
          .as("tok_digest"))
  }

  /** Driver mirror of [[greedyBertCol]] (same rule, same [UNK] law). */
  def segmentBert(w: String, init: collection.Set[String],
      cont: collection.Set[String]): List[String] = {
    val ch = Unigram.cps(w)
    val n = ch.length
    var pos = 0
    val out = List.newBuilder[String]
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      def ok(len: Int): Boolean = {
        val s = ch.slice(pos, pos + len).mkString
        if (pos == 0) init(s) else cont(s)
      }
      while (l > 0 && !ok(l)) l -= 1
      if (l == 0) return List(unk)
      out += (if (pos == 0) "" else contMark) +
        ch.slice(pos, pos + l).mkString
      pos += l
    }
    out.result()
  }

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

  /** BERT walk in DuckDB — position-dependent lmax (ini at pos 0, con
    * past it), fresh-state list_reduce (the list_reduce caveat: every
    * step builds a new single-element state list; CASE yields only
    * scalars/inner lists, never `st`). lmax is written four times
    * (advance, piece slice, fail tests) — candidate-list folds,
    * lattice-bounded. */
  private def greedyBertSqlOf(w: String, cands: String): String = {
    val lmax =
      s"""list_reduce(
         |  list_concat([[CAST(0 AS BIGINT)]],
         |    list_transform(list_filter($cands,
         |      c -> c.j - c.l = st[1].pos AND
         |        CASE WHEN st[1].pos = 0 THEN c.ini ELSE c.con END),
         |      c -> [c.l])),
         |  (m, x) -> [greatest(m[1], x[1])])[1]""".stripMargin
    s"""list_reduce(
       |  list_concat([[{'pos': CAST(0 AS BIGINT),
       |                 'out': CAST([] AS VARCHAR[]), 'bad': false}]],
       |    list_transform(range(1, len($w) + 1),
       |      x -> [{'pos': CAST(0 AS BIGINT),
       |             'out': CAST([] AS VARCHAR[]), 'bad': false}])),
       |  (st, ig) -> [{
       |    'pos': CASE WHEN st[1].bad OR st[1].pos >= len($w)
       |        OR $lmax = 0 THEN st[1].pos
       |      ELSE st[1].pos + $lmax END,
       |    'out': list_concat(st[1].out,
       |      CASE WHEN st[1].bad OR st[1].pos >= len($w) OR $lmax = 0
       |        THEN CAST([] AS VARCHAR[])
       |        ELSE [concat(
       |          CASE WHEN st[1].pos = 0 THEN '' ELSE '$contMark' END,
       |          substr($w, CAST(st[1].pos + 1 AS BIGINT),
       |               CAST($lmax AS BIGINT)))] END),
       |    'bad': st[1].bad OR
       |      ($lmax = 0 AND st[1].pos < len($w))}])[1]""".stripMargin
  }

  /** BERT-walk CTEs over vocabulary CTE `vocabCte(piece, ini, con)`:
    * emits `${p}sg(w, toks)` next to [[Unigram.candCtes]]'s `${p}occ`,
    * ready for [[Unigram.docCte]]'s rejoin. Words with zero vocabulary
    * matches keep an empty candidate list and fail to ['[UNK]']. */
  private def bertCtes(p: String, docsTable: String, idCol: String,
      textExpr: String, vocabCte: String): String =
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
       |    'ini': v.ini, 'con': v.con} AS cand
       |  FROM (SELECT w, j, l,
       |      substr(w, CAST(j - l + 1 AS BIGINT), CAST(l AS BIGINT)) AS piece
       |    FROM ${p}jl) c
       |  JOIN $vocabCte v USING (piece)),
       |${p}cl AS (SELECT ws.w, coalesce(m.cands, CAST([] AS
       |    STRUCT(j BIGINT, l BIGINT, ini BOOLEAN, con BOOLEAN)[])) AS cands
       |  FROM ${p}w ws LEFT JOIN
       |    (SELECT w, list(cand ORDER BY cand.j, cand.l) AS cands
       |     FROM ${p}cd GROUP BY w) m USING (w)),
       |${p}wk AS (SELECT w, ${greedyBertSqlOf("w", "cands")} AS wk
       |  FROM ${p}cl),
       |${p}sg AS (SELECT w, CASE WHEN wk.bad THEN ['$unk']
       |    ELSE wk.out END AS toks FROM ${p}wk)""".stripMargin

  private def bertVocabValues(vocab: Seq[(String, Long)]): String = {
    val (init, cont) = bertSplit(vocab)
    (init ++ cont).toSeq.distinct.sorted
      .map(p => s"('$p', ${init(p)}, ${cont(p)})").mkString(", ")
  }

  /** One-statement oracle for [[tokenizeBert]] under `vocab` (default
    * the committed [[bertPieces]]): (id, n_tokens, n_unk_words,
    * tok_digest). */
  def tokenizeBertSqlOf(docsTable: String, idCol: String,
      textExpr: String, vocab: Seq[(String, Long)] = bertPieces): String =
    s"""WITH wbv AS (SELECT * FROM (VALUES ${bertVocabValues(vocab)})
       |  AS t(piece, ini, con)),
       |${bertCtes("wb", docsTable, idCol, textExpr, "wbv")},
       |${Unigram.docCte("wb")}
       |SELECT d.$idCol,
       |  CAST(coalesce(len(u.toks), 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(len(list_filter(u.toks, t -> t = '$unk')), 0)
       |    AS BIGINT) AS n_unk_words,
       |  CASE WHEN $textExpr IS NULL THEN NULL
       |    ELSE coalesce(md5(array_to_string(u.toks, '${Bpe.sep}')), md5(''))
       |  END AS tok_digest
       |FROM $docsTable d LEFT JOIN wbdoc u ON u.id = d.$idCol""".stripMargin

  /** One-statement parity oracle: flat position-independent greedy vs
    * the BERT rule on the SAME bare pieces (flat ignores `##` entries by
    * construction — they never match a lowercase word), per source. */
  def bertParitySqlOf(docsTable: String, idCol: String,
      textExpr: String): String =
    s"""WITH wfv AS (SELECT * FROM (VALUES ${vocabValues(Unigram.pieces)})
       |  AS t(piece, pcost)),
       |${Unigram.candCtes("wf", docsTable, idCol, textExpr, "wfv", maxLen)},
       |wfsg AS (SELECT w, ${greedySqlOf("w", "cands")} AS toks FROM wfcl),
       |${Unigram.docCte("wf")},
       |wbv AS (SELECT * FROM (VALUES ${bertVocabValues(bertPieces)})
       |  AS t(piece, ini, con)),
       |${bertCtes("wb", docsTable, idCol, textExpr, "wbv")},
       |${Unigram.docCte("wb")}
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(coalesce(len(f.toks), 0)) AS BIGINT) AS n_tokens_flat,
       |  CAST(sum(coalesce(len(b.toks), 0)) AS BIGINT) AS n_tokens_bert,
       |  CAST(sum(coalesce(len(list_filter(b.toks, t -> t = '$unk')), 0))
       |    AS BIGINT) AS n_unk_words,
       |  CAST(sum(CASE WHEN coalesce(len(f.toks), 0) <>
       |    coalesce(len(b.toks), 0) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_differ
       |FROM $docsTable d
       |LEFT JOIN wfdoc f ON f.id = d.$idCol
       |LEFT JOIN wbdoc b ON b.id = d.$idCol
       |GROUP BY d.source""".stripMargin

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
