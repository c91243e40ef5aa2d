package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash primitives shared by the dedup/similarity/text operators.
  *
  * Everything here must be computable IDENTICALLY in the DuckDB oracle, so
  * the base primitive is md5-hex → first 8 hex digits → BIGINT:
  *   Spark:  conv(substr(md5(s),1,8),16,10)::long
  *   DuckDB: CAST('0x' || substr(md5(s),1,8) AS BIGINT)
  * 32 bits of a cryptographic hash — plenty for shingle/minhash work, and
  * portable across engines (Spark's xxhash64/hash have no DuckDB twin).
  */
object Hashing {
  /** 32-bit integer hash of a string column (non-negative, fits a long). */
  def hexInt(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB rendering of [[hexInt]] over SQL fragment `s`. */
  def hexIntSql(s: String): String =
    s"CAST(('0x' || substr(md5($s), 1, 8)) AS BIGINT)"

  /** 60-bit hash (15 md5 hex digits): for keys where 32-bit collision
    * mass matters at corpus scale (10⁹ keys collide w.p. ~0.2 in 2³²,
    * ~4·10⁻⁴ in 2⁶⁰). 15 digits, not 16, so the value always fits a
    * SIGNED 64-bit int in both engines. */
  def hexLong(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hexLongSql(s: String): String =
    s"CAST(('0x' || substr(md5($s), 1, 15)) AS BIGINT)"

  /** MinHash parameters: k universal-hash functions
    * h_i(x) = (a_i * x + b_i) mod p over the 32-bit shingle hash.
    * p is the smallest prime > 2^32; a/b are fixed odd-ish constants so
    * both engines evaluate the same functions. a_i*x stays < 2^63. */
  val numHashes = 16
  val bands = 4
  val rowsPerBand = 4
  val prime = 4294967311L
  def hashA(i: Int): Long = (1000003L * (i + 1)) % prime
  def hashB(i: Int): Long = (7000037L * (i + 1) + 17L) % prime

  def minhashExpr(h: Column, i: Int): Column =
    (lit(hashA(i)) * h + lit(hashB(i))) % lit(prime)

  def minhashSql(h: String, i: Int): String =
    s"(${hashA(i)} * $h + ${hashB(i)}) % $prime"

  /** Expression-level let-binding: evaluate `v` ONCE per row and hand the
    * body a cheap reference to the result. Catalyst performs no
    * subexpression elimination inside trees containing HOF lambdas, so a
    * scalar helper that references an expensive subtree (a tokenization,
    * a lambda filter) k times in its returned Column evaluates it k
    * times per row — measured 24× inside the pre-r13 langId. A lambda
    * variable, by contrast, is a slot read: `transform` over a 1-element
    * array evaluates `v` exactly once, and the one-element array
    * allocation is noise next to a single saved re-tokenization. Works
    * in any projection/filter context (it is itself just an expression),
    * unlike the Generate-node pin, which needs a plan node. */
  def bindOnce(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), x => body(x)), 1)

  /** Words of a text: whitespace split, empties dropped (both engines
    * produce empty fragments around leading/trailing whitespace). */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  val wordsSql: String =
    """list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0)"""

  /** Parameterized twin of [[wordsSql]] — THE canonical DuckDB form of
    * [[words]]; every oracle that tokenizes must build from here so the
    * engine and SQL tokenizations cannot drift independently. */
  def wordsSqlOf(expr: String): String =
    s"""list_filter(string_split_regex($expr, '\\s+'), w -> len(w) > 0)"""

  /** Word n-grams (shingles): positions i=0..size-n, space-joined. */
  def ngrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(n)))))
      .otherwise(array())

  /** DuckDB n-grams over a list column `ws` via indexed list_transform
    * (1-based there, hence the shifted slice bounds). */
  def ngramsSql(ws: String, n: Int): String =
    s"""CASE WHEN len($ws) >= $n
       | THEN list_transform(range(1, len($ws) - ${n - 2}),
       |        i -> array_to_string(($ws)[i:i+${n - 1}], ' '))
       | ELSE [] END""".stripMargin
}
