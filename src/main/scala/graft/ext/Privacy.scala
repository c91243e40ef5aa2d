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

  /** Right-to-erasure cascade (GDPR art. 17 shape): given a forget-key
    * set, every keyed table drops its matching rows and the audit
    * certifies the result — per table: rows before, rows erased, rows
    * after, and the RESIDUAL (forget-keyed rows still present after the
    * rewrite, which must be 0). The residual is counted on the KEPT
    * frame the caller will persist — in a lake deployment that frame is
    * the re-read of the rewritten table, so the audit certifies storage,
    * not intent (see q_privacy_erasure, which routes through TableStore).
    *
    * Scale shape: per table, one anti-join + one semi-join against the
    * forget set (broadcast when small, shuffle otherwise — Spark's
    * planner decides from stats) and three count aggregates. Nothing
    * row-scaled beyond the joins; the audit output is |tables| rows. */
  def erasureAudit(tables: Seq[(String, DataFrame, String)],
      forget: DataFrame, forgetKey: String): DataFrame = {
    require(tables.nonEmpty, "erasureAudit: need at least one table")
    val audits = tables.map { case (name, df, keyCol) =>
      val fk = forget.select(col(forgetKey).as(keyCol))
      val kept = df.join(fk, Seq(keyCol), "left_anti")
      val before = df.agg(count(lit(1)).as("rows_before"))
      val after = kept.agg(count(lit(1)).as("rows_after"))
      val residual = kept.join(fk, Seq(keyCol), "left_semi")
        .agg(count(lit(1)).as("residual_after"))
      before.crossJoin(broadcast(after)).crossJoin(broadcast(residual))
        .select(lit(name).as("tbl"), col("rows_before"),
          (col("rows_before") - col("rows_after")).as("rows_erased"),
          col("rows_after"), col("residual_after"))
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
}
