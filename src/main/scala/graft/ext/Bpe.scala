package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer over a COMMITTED merges
  * table (VERDICT r9 #5) — the unit a training pipeline's chunk / pack /
  * token-budget operators actually speak, replacing the whitespace and
  * regex proxies. Real pipelines ship a frozen tokenizer file; the
  * analogue here is [[merges]], a source-committed ranked pair list, and
  * both engines replay it exactly, so token counts, token sequences and
  * everything budgeted in them is oracle-checkable bit-for-bit.
  *
  * Algorithm (Sennrich et al. 2016 apply-time): pre-tokenize into letter
  * runs / single digits / single punctuation ([[TextAnalysis
  * .bpeTokenRegex]] over lowercased text), split each word into chars,
  * then apply every merge in rank order. A learned merges table is
  * well-formed — each part of a merge is a single char or the output of
  * an EARLIER merge — and for such tables applying each rule once,
  * globally, in rank order is exactly the reference priority-queue
  * apply: a rule's parts all exist before its turn, and no rule can
  * create a pair of any earlier rank.
  *
  * Encoding trick that makes one global `replace` per merge exact: the
  * working form wraps every token in sentinels, ` tok `, so
  * a merge pattern (the two wrapped parts, adjacent) shares NO
  * characters with an adjacent occurrence — left-to-right
  * non-overlapping replacement (which is what `replace` does in both
  * engines) merges exactly the occurrences BPE merges, with no
  * boundary-sharing misses. The fold is a chain of plain
  * `StringReplace`s inside one whole-stage-codegen projection: no
  * shuffle, no UDF, scan speed — the shape a 100 TB tokenize pass needs.
  *
  * Caveat: the sentinel chars (U+0001/U+0002) must not occur in the
  * corpus (true for any printable-text corpus; a binary-robust variant
  * would pre-filter them). */
object Bpe {

  private val S = "\u0001" // token start sentinel
  private val E = "\u0002" // token end sentinel
  /** Join separator for token-sequence digests ([[tokenDigest]]) —
    * cannot occur inside a token (tokens are printable). */
  val sep = "\u0003"

  /** The committed merges, rank order. Well-formed by construction:
    * every multi-char part appears as the output of an earlier merge
    * (asserted below), which is the property that makes sequential
    * global replacement exact. Hand-ranked from common English pair
    * frequencies — stands in for a learned tokenizer file. */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "r" -> "e", "o" -> "n", "a" -> "t", "e" -> "n", "o" -> "r",
    "e" -> "s", "s" -> "t", "a" -> "r", "o" -> "u", "i" -> "t",
    "i" -> "s", "o" -> "f", "a" -> "l", "e" -> "d", "i" -> "o",
    "l" -> "y", "an" -> "d", "in" -> "g", "io" -> "n", "en" -> "t",
    "er" -> "s", "c" -> "h", "s" -> "h", "w" -> "h", "q" -> "u",
    "l" -> "l", "o" -> "o", "e" -> "e", "s" -> "s", "t" -> "t",
    "ou" -> "t", "or" -> "e", "u" -> "s", "u" -> "r", "u" -> "n",
    "a" -> "s", "e" -> "l", "i" -> "l", "o" -> "l", "a" -> "m",
    "o" -> "m", "a" -> "b", "a" -> "c", "a" -> "d", "a" -> "g",
    "the" -> "r", "es" -> "t", "at" -> "e", "it" -> "y", "al" -> "ly",
    "c" -> "e", "c" -> "o", "d" -> "e", "d" -> "o", "p" -> "e",
    "p" -> "o", "m" -> "e", "n" -> "o", "w" -> "e")

  // well-formedness: each part is a single char or an earlier output,
  // and outputs are pairwise DISTINCT — a duplicated output would let a
  // later rule create token text an earlier-ranked rule's pair matches,
  // breaking the "no rule can create a pair of any earlier rank"
  // invariant the one-global-replace-per-merge argument rests on
  locally {
    val seen = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (l, r) =>
      require(l.length == 1 || seen(l), s"merge part '$l' not yet derivable")
      require(r.length == 1 || seen(r), s"merge part '$r' not yet derivable")
      require(!seen(l + r), s"duplicate merge output '${l + r}'")
      seen += (l + r)
    }
  }

  /** The merge fold over one word: wrap chars, replay the table. */
  private def folded(w: Column): Column = {
    val init = regexp_replace(w, "(.)", s"$S$$1$E")
    merges.foldLeft(init) { case (acc, (l, r)) =>
      replace(acc, lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E"))
    }
  }

  /** Shared pre-tokenizer (letter runs / single digits / single punct
    * over lowercased text) — [[Unigram]] reuses it so the two learned
    * tokenizers segment the same word stream. */
  private[ext] def pieces(text: Column): Column =
    regexp_extract_all(lower(text), lit(TextAnalysis.bpeTokenRegex), lit(0))

  /** Pre-token (word) count — `size([[pieces]])`: the word denominator
    * the OOV/fertility datasheets share with the DuckDB twin's
    * `len(piecesSql(..))`. This, not a raw-text regexp_count, is the
    * correct Spark face (ADVICE r17: `[A-Za-z]` counting over RAW text
    * agrees with the lowercased `[a-z]` pre-tokenizer on ASCII but
    * diverges on Unicode where lowercasing changes string length or
    * letter class, e.g. 'İ' → "i̇"). */
  def pieceCount(text: Column): Column = size(pieces(text)).cast("long")

  /** Distinct pre-token (word-TYPE) count of a corpus — the unit every
    * per-distinct-word segmenter/trainer pays per ([[Unigram]] DP,
    * [[WordPiece]] greedy walk, both vocab inductions). graft.Bench
    * records it untimed as the `distinct_words` draw-volume counter
    * (VERDICT r14 #1: a vocabulary-heavy re-roll is more work, not a
    * regression). */
  def distinctPieceCount(docs: DataFrame, textCol: String = "text"): Long =
    docs.select(explode(pieces(col(textCol))).as("w")).distinct().count()

  /** Subword tokens of `text` as an array<string>. */
  def tokens(text: Column): Column =
    flatten(transform(pieces(text),
      w => split(trim(folded(w), S + E), E + S)))

  /** Token count — the budgeting unit for chunk/pack operators. Counts
    * end-sentinels per word (no token-array materialization) and sums. */
  def tokenCount(text: Column): Column =
    coalesce(aggregate(
      transform(pieces(text), w =>
        (size(split(folded(w), E)) - 1).cast("long")),
      lit(0L), (acc, x) => acc + x), lit(0L))

  /** Order-sensitive digest of the token sequence — pins the exact
    * tokenization cross-engine, not just the count. NULL text → NULL
    * digest: Spark's concat_ws SKIPS null arrays (would yield md5(''))
    * while the oracle's array_to_string propagates NULL — gate the null
    * explicitly so both engines agree (same null-divergence class as
    * the r10 kmvHashes fix). */
  def tokenDigest(text: Column): Column =
    when(text.isNull, lit(null).cast("string"))
      .otherwise(md5(concat_ws(sep, tokens(text))))

  // ------------------------------------------------------- training
  // Sennrich et al. (2016) learn-time: greedily merge the most frequent
  // adjacent symbol pair, numMerges times. The committed [[merges]]
  // table stands in for a shipped tokenizer file; [[train]] is how such
  // a file is PRODUCED from a corpus.

  /** Learn `numMerges` BPE merges from a corpus. Returns (left, right,
    * pair weight at selection time) in rank order; ties break (weight
    * desc, left asc, right asc) so training is deterministic.
    *
    * Scale shape: BPE statistics only need WORD WEIGHTS, never the
    * corpus — the ONE corpus-wide Spark job is the word-count aggregate
    * (map-side combined, shuffles (word, count) pairs). The weighted
    * vocabulary is heavy-tailed-small (≈10⁷ distinct words at 100 TB —
    * hundreds of MB as (string, long) pairs), so it is collected ONCE
    * and the inherently-sequential greedy merge loop runs driver-side
    * in memory: pair-count map, pick max, rewrite dict, repeat. A real
    * 32k-merge vocabulary trains in seconds with zero further cluster
    * round-trips — versus one Spark job per merge (the shape
    * [[trainIterative]] keeps as a debug path), which at 32k merges is
    * hours of pure scheduling latency. BpeSpec pins both faces to the
    * same reference dict trainer. */
  def train(docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Seq[(String, String, Long)] = {
    require(numMerges > 0, s"need positive numMerges, got $numMerges")
    // the one distributed pass: corpus → weighted word vocabulary
    val vocab = docs.select(explode(pieces(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    trainFromVocab(vocab, numMerges)
  }

  /** The greedy merge loop over a collected weighted vocabulary —
    * pure driver-side, no Spark. Exposed so a pre-aggregated word-count
    * table (e.g. a committed corpus statistic) can be trained from
    * directly. */
  def trainFromVocab(vocab: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String, Long)] = {
    var dict: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => w.map(_.toString).toArray -> c }.toArray
    val learned = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (toks, c) =>
        var i = 0
        while (i + 1 < toks.length) {
          val p = (toks(i), toks(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // ties: weight desc, left asc, right asc (matches the
        // TakeOrdered ordering of the distributed debug path)
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        learned += ((l, r, c))
        dict = dict.map { case (toks, c) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += toks(i); i += 1 }
          }
          out.result() -> c
        }
        k += 1
      }
    }
    learned.result()
  }

  /** Debug face of [[train]]: the fully-distributed per-merge-job loop
    * (one pair-count aggregate + 1-row TakeOrdered collect per merge
    * over the cached vocabulary). Correct at any vocab size the cluster
    * holds, but pays one Spark job of scheduling latency PER MERGE —
    * use only to cross-check [[train]] on corpora whose vocabulary
    * cannot be collected. */
  def trainIterative(docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Seq[(String, String, Long)] = {
    require(numMerges > 0, s"need positive numMerges, got $numMerges")
    val v = docs.select(explode(pieces(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .select(regexp_replace(col("w"), "(.)", s"$S$$1$E").as("s"), col("c"))
      .cache()
    val learned = scala.collection.mutable.Buffer.empty[(String, String, Long)]
    try {
      var exhausted = false
      while (learned.size < numMerges && !exhausted) {
        val state = learned.foldLeft(col("s")) { case (acc, (l, r, _)) =>
          replace(acc, lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E"))
        }
        val toks = split(trim(state, S + E), E + S)
        // adjacent pairs, weighted by word count; sub-2-token words have
        // no pairs (the guard matters: sequence(0,-1) would DESCEND)
        val top = v.select(toks.as("t"), col("c"))
          .select(col("c"), explode(when(size(col("t")) >= 2,
            transform(sequence(lit(0), size(col("t")) - 2),
              j => struct(element_at(col("t"), j + 1).as("l"),
                element_at(col("t"), j + 2).as("r"))))
            .otherwise(array())).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("c")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else learned +=
          ((top(0).getString(0), top(0).getString(1), top(0).getLong(2)))
      }
    } finally v.unpersist()
    learned.toSeq
  }

  /** [[tokens]] under an arbitrary (well-formed or learned) merges list —
    * the apply face of [[train]]: the chain replays the exact per-rank
    * global replaces training performed, so train→apply round-trips. */
  def tokensWith(text: Column, m: Seq[(String, String)]): Column =
    flatten(transform(pieces(text), w => {
      val init = regexp_replace(w, "(.)", s"$S$$1$E")
      val f = m.foldLeft(init) { case (acc, (l, r)) =>
        replace(acc, lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E"))
      }
      split(trim(f, S + E), E + S)
    }))

  /** DuckDB twin of [[train]] as one static SELECT: `numMerges` unrolled
    * CTE steps, each computing the arg-max pair of the previous state
    * and applying it with a column-valued replace (the merge pattern is
    * DATA, not a literal — the oracle learns the same table the engine
    * does). A step with no pairs left carries the state through a
    * LEFT JOIN ON TRUE, mirroring the engine's early stop. */
  /** The learn-step CTE block shared by [[trainSqlOf]] and
    * [[tokenizeTrainedSqlOf]]: v0/s0 (weighted vocab, char state) then
    * per step k the pair count (p k), arg-max (m k) and updated state
    * (s k). */
  private[ext] def trainStepsSql(docsTable: String, textExpr: String,
      numMerges: Int): String = {
    val se = s"'$S$E'"   // trim set
    val es = s"'$E$S'"   // token separator
    val steps = (1 to numMerges).map { k =>
      s"""t$k AS (SELECT string_split(trim(s, $se), $es) AS t, c
         |  FROM s${k - 1}),
         |u$k AS (SELECT t, c, unnest(range(1, len(t))) AS i FROM t$k),
         |p$k AS (SELECT t[CAST(i AS INT)] AS l, t[CAST(i AS INT) + 1] AS r,
         |    CAST(sum(c) AS BIGINT) AS cnt
         |  FROM u$k GROUP BY 1, 2),
         |m$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |s$k AS (SELECT CASE WHEN m.l IS NULL THEN s.s
         |    ELSE replace(s.s, '$S' || m.l || '$E$S' || m.r || '$E',
         |      '$S' || m.l || m.r || '$E') END AS s, s.c
         |  FROM s${k - 1} s LEFT JOIN m$k m ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""v0 AS (SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(${piecesSql(textExpr)}) AS w FROM $docsTable)
       |  GROUP BY w),
       |s0 AS (SELECT regexp_replace(w, '(.)', '$S\\1$E', 'g') AS s, c
       |  FROM v0),
       |$steps""".stripMargin
  }

  def trainSqlOf(docsTable: String, textExpr: String, numMerges: Int): String = {
    val union = (1 to numMerges).map { k =>
      s"SELECT CAST(${k - 1} AS BIGINT) AS rank, l AS lhs, r AS rhs, " +
        s"cnt AS pair_count FROM m$k"
    }.mkString("\nUNION ALL ")
    s"""WITH ${trainStepsSql(docsTable, textExpr, numMerges)}
       |$union""".stripMargin
  }

  /** Corpus tokenization under the table the learn steps just produced:
    * the merges are scalar subquery VALUES (one 1-row CTE cross-joined
    * in), so the oracle learns and applies in a single statement. */
  def tokenizeTrainedSqlOf(docsTable: String, idCol: String,
      textExpr: String, numMerges: Int): String = {
    val mmCols = (1 to numMerges)
      .map(k => s"m$k.l AS l$k, m$k.r AS r$k").mkString(", ")
    val mmFrom = (1 to numMerges).map(k => s"m$k").mkString(", ")
    val foldedLearned = (1 to numMerges).foldLeft(
      s"regexp_replace(w, '(.)', '$S\\1$E', 'g')") { (acc, k) =>
      s"replace($acc, '$S' || l$k || '$E$S' || r$k || '$E', " +
        s"'$S' || l$k || r$k || '$E')"
    }
    val toks = s"flatten(list_transform(${piecesSql(textExpr)}, " +
      s"w -> string_split(trim($foldedLearned, '$S$E'), '$E$S')))"
    s"""WITH ${trainStepsSql(docsTable, textExpr, numMerges)},
       |mm AS (SELECT $mmCols FROM $mmFrom)
       |SELECT $idCol, CAST(len($toks) AS BIGINT) AS n_tokens,
       |  md5(array_to_string($toks, '$sep')) AS tok_digest
       |FROM $docsTable CROSS JOIN mm""".stripMargin
  }

  // ------------------------------------------------- byte-level face
  // GPT-2/tiktoken convention (Radford et al. 2019, encoder.py
  // bytes_to_unicode; VERDICT r15 #4): the working alphabet is the 256
  // UTF-8 BYTES, each aliased to a printable single codepoint, so ANY
  // string tokenizes with no [UNK] by construction — the alphabet is
  // closed at 256 regardless of what unicode the crawl throws at it.
  // The merge machinery (sentinel wrap, rank-ordered global replaces)
  // is tokensWith's scaffold verbatim, just over alias chars.

  /** The byte→printable-alias table, exactly GPT-2's `bytes_to_unicode`:
    * visually-printable latin-1 bytes (33–126, 161–172, 174–255) alias
    * to their own codepoint; the other 68 bytes get codepoints 256+k in
    * ascending byte order. 256 DISTINCT printable chars — index b holds
    * byte b's alias. */
  val byteAliases: IndexedSeq[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = -1
    (0 until 256).map { b =>
      if (keep(b)) b.toChar else { n += 1; (256 + n).toChar }
    }
  }
  private val aliasAlphabet: String = byteAliases.mkString

  /** A string's byte-alias form: UTF-8 bytes, each through
    * [[byteAliases]] — driver-side twin of [[byteAlias]], used to carry
    * the committed [[merges]] into alias space (ASCII parts alias to
    * themselves, so the char table IS a valid byte table). */
  private[ext] def aliasOf(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => byteAliases(b & 0xff)))

  /** Column form: word → alias string. encode → hex → 2-char groups →
    * base-16 `conv` → one substr into the alias alphabet — a pure
    * codegen projection, no UDF, no shuffle (the 100 TB tokenize-pass
    * discipline of the char face, kept). */
  private[ext] def byteAlias(w: Column): Column =
    array_join(transform(
      regexp_extract_all(hex(encode(w, "UTF-8")), lit(".."), lit(0)),
      p => lit(aliasAlphabet).substr(
        conv(p, 16, 10).cast("int") + 1, lit(1))), "")

  private lazy val aliasMerges: Seq[(String, String)] =
    merges.map { case (l, r) => aliasOf(l) -> aliasOf(r) }

  /** Byte-level subword tokens (alias space). Same pre-tokenizer as the
    * char face ([[pieces]]) and the same committed [[merges]] carried
    * through [[aliasOf]] — on ASCII text the two faces emit IDENTICAL
    * token sequences (alias of an ASCII char is itself), which
    * q_bpe_bytes_parity pins corpus-wide; on non-ASCII text the byte
    * face degrades to multiple byte tokens where the char face holds
    * one opaque char, never to [UNK]. */
  def tokensBytes(text: Column): Column =
    flatten(transform(pieces(text), w => {
      val init = regexp_replace(byteAlias(w), "(.)", s"$S$$1$E")
      val f = aliasMerges.foldLeft(init) { case (acc, (l, r)) =>
        replace(acc, lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E"))
      }
      split(trim(f, S + E), E + S)
    }))

  /** Byte-level token count — end-sentinels per word, summed (no token
    * array materialization), mirroring [[tokenCount]]. */
  def tokenCountBytes(text: Column): Column =
    coalesce(aggregate(
      transform(pieces(text), w => {
        val init = regexp_replace(byteAlias(w), "(.)", s"$S$$1$E")
        val f = aliasMerges.foldLeft(init) { case (acc, (l, r)) =>
          replace(acc, lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E"))
        }
        (size(split(f, E)) - 1).cast("long")
      }),
      lit(0L), (acc, x) => acc + x), lit(0L))

  /** Order-sensitive digest of the byte-level token sequence (alias
    * space) — same NULL gating as [[tokenDigest]]. */
  def tokenDigestBytes(text: Column): Column =
    when(text.isNull, lit(null).cast("string"))
      .otherwise(md5(concat_ws(sep, tokensBytes(text))))

  // byte-face DuckDB twins --------------------------------------------

  private def sqlQuote(s: String): String = s.replace("'", "''")

  /** DuckDB twin of [[byteAlias]]: hex(encode(w)) pairs → strpos
    * arithmetic (DuckDB has no base-16 conv) → substr into the same
    * alias-alphabet literal. */
  private def byteAliasSql(w: String): String = {
    val hx = "0123456789ABCDEF"
    s"array_to_string(list_transform(" +
      s"regexp_extract_all(hex(encode($w)), '..'), " +
      s"p -> substr('${sqlQuote(aliasAlphabet)}', " +
      s"(strpos('$hx', substr(p, 1, 1)) - 1) * 16 + " +
      s"strpos('$hx', substr(p, 2, 1)), 1)), '')"
  }

  private def foldedBytesSql(w: String): String = {
    val init = s"regexp_replace(${byteAliasSql(w)}, '(.)', '$S\\1$E', 'g')"
    aliasMerges.foldLeft(init) { case (acc, (l, r)) =>
      s"replace($acc, '${sqlQuote(s"$S$l$E$S$r$E")}', " +
        s"'${sqlQuote(s"$S$l$r$E")}')"
    }
  }

  /** list<varchar> of byte-level subword tokens (alias space). */
  def tokensBytesSqlOf(textExpr: String): String =
    s"flatten(list_transform(${piecesSql(textExpr)}, " +
      s"w -> string_split(trim(${foldedBytesSql("w")}, '$S$E'), '$E$S')))"

  /** BIGINT byte-level token count. */
  def tokenCountBytesSqlOf(textExpr: String): String =
    s"CAST(coalesce(list_sum(list_transform(${piecesSql(textExpr)}, " +
      s"w -> len(string_split(${foldedBytesSql("w")}, '$E')) - 1)), 0) AS BIGINT)"

  // ------------------------------------------------------------ oracle
  // DuckDB twins generated from the SAME merges table (single source of
  // truth): nested replace() chain, same sentinels, same regexes. The
  // sentinels are embedded as raw control chars in the SQL text; the
  // Verify JSON dump escapes them as \u00XX.

  private def foldedSql(w: String): String = {
    val init = s"regexp_replace($w, '(.)', '$S\\1$E', 'g')"
    merges.foldLeft(init) { case (acc, (l, r)) =>
      s"replace($acc, '$S$l$E$S$r$E', '$S$l$r$E')"
    }
  }

  def piecesSql(textExpr: String): String =
    s"regexp_extract_all(lower($textExpr), '[a-z]+|[0-9]|[^a-z0-9\\s]')"

  /** list<varchar> of subword tokens. */
  def tokensSqlOf(textExpr: String): String =
    s"flatten(list_transform(${piecesSql(textExpr)}, " +
      s"w -> string_split(trim(${foldedSql("w")}, '$S$E'), '$E$S')))"

  /** BIGINT token count. */
  def tokenCountSqlOf(textExpr: String): String =
    s"CAST(coalesce(list_sum(list_transform(${piecesSql(textExpr)}, " +
      s"w -> len(string_split(${foldedSql("w")}, '$E')) - 1)), 0) AS BIGINT)"
}
