package graft.ext

import org.apache.spark.sql.Column
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

  private def pieces(text: Column): Column =
    regexp_extract_all(lower(text), lit(TextAnalysis.bpeTokenRegex), lit(0))

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

  private def piecesSql(textExpr: String): String =
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
