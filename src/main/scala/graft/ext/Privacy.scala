package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release-gate privacy operators for a training-data pipeline: PII
  * scrubbing before any corpus ships, and the distribution audits
  * (k-anonymity lives in [[Curation.kAnonymity]]; l-diversity here)
  * that catch re-identifiable slices. No reference equivalent —
  * north-star extension surface.
  *
  * Every operator is a pure per-row projection or a single
  * map-side-combinable aggregate; nothing here shuffles corpus text.
  */
object Privacy {

  /** Patterns deliberately restricted to the regex subset Java
    * (Spark codegen) and RE2 (DuckDB oracle) interpret identically:
    * character classes, bounded repetition, `\b`/`\d` — no lookaround,
    * no backreferences. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val longNumRe = "\\d{4,}"

  /** PII scrub: redact emails, IPv4 literals, and 4+-digit number runs
    * (account/phone/SSN-shaped), in that order. Ordering is load-bearing
    * twice over: an email's local part may contain a 4+-digit run (so
    * numbers are counted on the ALREADY email-redacted string — one
    * conceptual hit per address, not two), and IPv4 octets are ≤3
    * digits (so the number pass cannot tear an address the IP pass
    * missed).
    *
    * Output keeps counts + the redacted length + a SHA-256 of the
    * redacted text: the hash pins byte-exact redaction in the oracle
    * compare without shipping the corpus through the verify artifact.
    *
    * Scale shape: one codegen projection per row, zero shuffle — the
    * scrubber runs at scan speed on any corpus size. */
  def piiRedact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t0 = coalesce(col(textCol), lit(""))
    val r1 = regexp_replace(t0, emailRe, "<EMAIL>")
    val r2 = regexp_replace(r1, ipv4Re, "<IP>")
    val r3 = regexp_replace(r2, longNumRe, "<NUM>")
    docs.select(col(idCol),
      regexp_count(t0, lit(emailRe)).cast("long").as("n_email"),
      regexp_count(r1, lit(ipv4Re)).cast("long").as("n_ipv4"),
      regexp_count(r2, lit(longNumRe)).cast("long").as("n_num"),
      length(r3).cast("long").as("red_chars"),
      sha2(r3, 256).as("red_hash"))
  }

  /** Right-to-erasure cascade audit (GDPR art. 17 shape): for each keyed
    * table AS STORED, count total rows, FORGET-KEYED rows still present
    * (one semi-join), and the rows an erasure rewrite keeps (one
    * anti-join). Two-phase protocol (see q_privacy_erasure):
    *  - run on the live tables to PLAN: `rows_forget_keyed` = what the
    *    rewrite must drop;
    *  - run again on the RE-READ of the rewritten tables to CERTIFY:
    *    `rows_forget_keyed` MUST be 0 — counted on what storage actually
    *    holds, so a rewrite that silently failed to drop rows FAILS this
    *    audit. (An earlier form counted a "residual" on the audit's own
    *    anti-joined frame — structurally always 0, certifying nothing.)
    *
    * Scale shape: per table, one semi-join + one anti-join against the
    * forget set (broadcast when small, shuffle otherwise — Spark's
    * planner decides from stats) and three count aggregates. Nothing
    * row-scaled beyond the joins; the audit output is |tables| rows. */
  def erasureAudit(tables: Seq[(String, DataFrame, String)],
      forget: DataFrame, forgetKey: String): DataFrame = {
    require(tables.nonEmpty, "erasureAudit: need at least one table")
    val audits = tables.map { case (name, df, keyCol) =>
      val fk = forget.select(col(forgetKey).as(keyCol))
      val before = df.agg(count(lit(1)).as("rows_before"))
      val present = df.join(fk, Seq(keyCol), "left_semi")
        .agg(count(lit(1)).as("rows_forget_keyed"))
      val after = df.join(fk, Seq(keyCol), "left_anti")
        .agg(count(lit(1)).as("rows_after"))
      before.crossJoin(broadcast(present)).crossJoin(broadcast(after))
        .select(lit(name).as("tbl"), col("rows_before"),
          col("rows_forget_keyed"), col("rows_after"))
    }
    audits.reduce(_ unionByName _)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): beyond class SIZE
    * (k-anonymity), each quasi-identifier equivalence class must carry
    * at least `l` DISTINCT sensitive values — a size-100 class whose
    * sensitive attribute is constant still leaks it for every member.
    * Output is one row per class (O(distinct quasi combinations), never
    * O(rows)); one exact-distinct aggregate is the whole cost. */
  def lDiversity(df: DataFrame, quasiIds: Seq[String],
      sensitiveCol: String, l: Long): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .select(quasiIds.map(col) :+ col("class_size") :+ col("l_distinct") :+
        (col("l_distinct") < l).cast("int").cast("long")
          .as("is_violation"): _*)

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the release-gate ladder: k-anonymity bounds class SIZE,
    * l-diversity bounds distinct sensitive values, but a size-1000
    * class that is 99% one diagnosis still leaks it probabilistically.
    * A class is t-close when the distance between its sensitive-value
    * distribution and the GLOBAL distribution is ≤ t; for categorical
    * sensitive attributes with unit ground distance the paper's EMD
    * reduces to total variation, which reduces to ONE exact integer
    * floor division on the q4 lattice (the [[Stats.histogramDrift]]
    * move — no `ln`, no float sums):
    *
    *   tvd_q4 = ⌊10⁴ · Σ_v |cnt_c(v)·N − cnt(v)·n_c| / (2·n_c·N)⌋
    *
    * with the Σ over the FULL value universe folded in closed form:
    * values absent from the class contribute cnt(v)·n_c, so their sum
    * is n_c·(N − Σ_{v∈class} cnt(v)) — no outer join against the
    * universe is ever built.
    *
    * Scale shape: ONE corpus aggregate to (class, value) counts; class
    * totals, global value counts and N all derive from that frame
    * (facet-sized, map-side combined); the value totals broadcast back.
    * Output is one row per class. */
  def tCloseness(df: DataFrame, quasiIds: Seq[String],
      sensitiveCol: String, tQ4: Long): DataFrame = {
    val dec = "decimal(38,0)"
    val q = quasiIds.map(col)
    val cv = df.groupBy(q :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("a"))
      .localCheckpoint(true) // feeds class totals, value totals, N, join
    val classTot = cv.groupBy(q: _*).agg(sum(col("a")).as("n_c"))
    val valTot = cv.groupBy(col(sensitiveCol)).agg(sum(col("a")).as("g"))
    val nAll = cv.agg(sum(col("a")).as("nn"))
    val present = cv
      .join(broadcast(classTot), quasiIds)
      .join(broadcast(valTot), Seq(sensitiveCol))
      .crossJoin(broadcast(nAll))
      .groupBy(q: _*)
      .agg(max(col("n_c")).as("n_c"), max(col("nn")).as("nn"),
        sum(abs(col("a").cast(dec) * col("nn").cast(dec) -
          col("g").cast(dec) * col("n_c").cast(dec))).as("present_term"),
        sum(col("g")).as("g_present"))
    val num = (col("present_term") +
      col("n_c").cast(dec) * (col("nn") - col("g_present")).cast(dec)) *
      lit(10000L).cast(dec)
    val den = lit(2L).cast(dec) * col("n_c").cast(dec) * col("nn").cast(dec)
    val tvd = ((num - pmod(num, den)) / den).cast("long")
    present.select(q :+ col("n_c").as("class_size") :+
      tvd.as("tvd_q4") :+
      (tvd > tQ4).cast("int").cast("long").as("is_violation"): _*)
  }
}
