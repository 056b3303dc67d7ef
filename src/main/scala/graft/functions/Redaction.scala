package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing column builders — the redaction pass of a training-data
  * pipeline (strip emails / phone-like digit runs / custom patterns before
  * a corpus ships to training).
  *
  * All builders are codegen'd `regexp_replace` / `regexp_count` built-ins:
  * one compiled scan per row, chainable in any select, batch or streaming.
  * Patterns stay in the portable character-class subset (no lookarounds, no
  * backreferences) so the exact same text runs under Java regex (Spark) and
  * RE2-style engines (DuckDB, ClickHouse) — which is also what makes the
  * operator SQL-oracle-checkable.
  */
object Redaction {

  /** Conservative email matcher (lowercase corpora). */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Digit runs — the phone/account-number surrogate. */
  val NumberPattern = "[0-9]+"

  /** Default scrub: emails first (so their digits don't half-match), then
    * digit runs.
    */
  val DefaultRules: Seq[(String, String)] =
    Seq(EmailPattern -> "<EMAIL>", NumberPattern -> "<NUM>")

  /** Apply `rules` (pattern -> replacement) left to right. */
  def scrub(c: Column, rules: Seq[(String, String)] = DefaultRules): Column =
    rules.foldLeft(c) { case (acc, (re, repl)) =>
      regexp_replace(acc, re, repl)
    }

  /** Number of replacements `scrub(c, rules)` actually performs. Rule i is
    * counted on the column AFTER rules 0..i-1 have been applied — mirroring
    * scrub's left-to-right order — so overlapping patterns don't
    * double-count (the digits inside an email are consumed by the email
    * rule and never seen by the digit-run rule). Assumes replacement
    * tokens don't themselves match later patterns (true of the defaults).
    */
  def redactionCount(c: Column, rules: Seq[(String, String)] =
      DefaultRules): Column =
    rules.foldLeft((c, lit(0L))) { case ((acc, cnt), (re, repl)) =>
      (regexp_replace(acc, re, repl),
        cnt + regexp_count(acc, lit(re)).cast("long"))
    }._2
}
