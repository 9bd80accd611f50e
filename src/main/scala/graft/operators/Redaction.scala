package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the scrub stage that closes the loop the profiler's
  * semantic classifier opens (Profile P3 labels 'Email Address' / 'URL'
  * columns; reference geminiService.ts:62 vocabulary): replace every
  * match of the detector patterns with a fixed placeholder token, so a
  * training corpus ships with PII masked rather than merely flagged.
  *
  * Pure map-side `regexp_replace` chains (codegen'd, no UDF, no
  * shuffle) — the cheapest possible shape at any corpus size. Patterns
  * deliberately use only syntax common to Java regex and RE2, so a
  * DuckDB oracle applies the IDENTICAL expressions (no lookarounds, no
  * backreferences).
  */
object Redaction {

  /** name → (pattern, replacement token). Order matters: URLs first so
    * an address inside a URL query string redacts as part of the URL. */
  val Patterns: Seq[(String, (String, String))] = Seq(
    "url" -> ("https?://[^ ]+" -> "<URL>"),
    "email" -> ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>"),
    // international-ish phone shapes: +CC then 8-12 digits with
    // optional separators; kept conservative to avoid eating plain ids
    "phone" -> ("\\+[0-9][0-9 ()-]{7,14}[0-9]" -> "<PHONE>"),
    // 13-19 digit runs with optional group separators (card-number
    // shape). RE2 parity rules out lookarounds, so the digit boundary
    // is a CAPTURED enclosing group: (^|[^0-9]) … ([^0-9]|$), restored
    // via $1/$3 in the replacement — a 20+-digit run or a plain long id
    // embedded in more digits no longer gets its first 13-19 digits
    // eaten mid-token. Known residual: two card numbers separated by a
    // SINGLE non-digit char redact only the first (the boundary char is
    // consumed by the match; fixing that needs lookbehind, which RE2
    // lacks).
    "card" -> ("(^|[^0-9])([0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{1,7})([^0-9]|$)"
      -> "$1<NUMBER>$3"))

  /** The redaction expression for one text column. */
  def redactCol(c: Column, kinds: Seq[String] = Patterns.map(_._1)): Column = {
    val wanted = Patterns.filter(p => kinds.contains(p._1))
    require(wanted.nonEmpty, s"no known redaction kinds in $kinds " +
      s"(known: ${Patterns.map(_._1).mkString(", ")})")
    wanted.foldLeft(c) { case (acc, (_, (re, tok))) =>
      regexp_replace(acc, re, tok)
    }
  }

  /** Redact `textCols` in place; every other column passes through. */
  def redact(df: DataFrame, textCols: Seq[String],
      kinds: Seq[String] = Patterns.map(_._1)): DataFrame =
    textCols.foldLeft(df)((d, c) => d.withColumn(c, redactCol(col(c), kinds)))

  /** The same chain as ANSI SQL over a column expression — the oracle
    * twin (the patterns are Java-regex ∩ RE2, so both engines match
    * identically). Replacement group refs differ by engine: Java
    * (Spark) spells them `$1`, RE2 (DuckDB) `\1` — translated here so
    * [[Patterns]] stays single-sourced in Java syntax. */
  def redactSql(expr: String, kinds: Seq[String] = Patterns.map(_._1)): String =
    Patterns.filter(p => kinds.contains(p._1)).foldLeft(expr) {
      case (acc, (_, (re, tok))) =>
        // standard SQL single-quoted strings pass backslashes through
        // verbatim — only quotes need escaping
        val sqlTok = tok.replaceAll("\\$(\\d)", "\\\\$1")
        s"regexp_replace($acc, '${re.replace("'", "''")}', '$sqlTok', 'g')"
    }
}
