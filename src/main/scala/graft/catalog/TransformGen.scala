package graft.catalog

/** Deterministic ETL-transform generation (SURVEY §2.2 P8): emit the
  * cleaning SQL a profiled table needs — the rule-engine replacement for
  * the reference's declared-but-stubbed LLM transform generator
  * (`geminiService.ts:150-159` returns "not yet implemented"; README.md
  * line 11 still advertises the capability). Input is the same
  * [[ColumnProfile]] rows every other catalog consumer reads; output is
  * one SELECT statement executable on the S8 passthrough surface — so
  * profile → generate → execute closes the reference's
  * catalog-then-clean loop end to end, deterministically.
  *
  * Rules (each keyed to a profile signal, every rule pure):
  *  - RENAME: column names normalize to snake_case (`"Order Key"` →
  *    `order_key`) — camel humps split, punctuation/whitespace collapse
  *    to `_`.
  *  - CAST: a string-typed column whose regex profile proved every
  *    non-null value parses as one menu type (P2) casts to the
  *    corresponding engine type (INTEGER→BIGINT, REAL→DOUBLE,
  *    BOOLEAN/DATE/TIMESTAMP as themselves). The profile's all-parse
  *    guarantee is what makes a plain CAST safe here.
  *  - NULL-FIX: an id-shaped column (`id`, `*_id`, `*key`) containing
  *    nulls filters them out — a row without identity cannot be keyed,
  *    merged, or deduplicated downstream. Non-key columns keep their
  *    nulls (flagged by P5, not silently rewritten).
  *  - DEDUP: an id-shaped column that is NEARLY unique (≥ 80% of
  *    non-null values distinct, but short of 100%) signals re-ingested
  *    duplicate rows, and the transform emits SELECT DISTINCT. The
  *    near-uniqueness floor keeps genuine foreign keys (low cardinality
  *    by nature) from triggering a spurious table-level dedup.
  *
  * The generated text is deliberately boring SQL-92 plus backtick
  * quoting (the Spark dialect of the S8 executor); CatalogSpec pins the
  * generated string golden and the `q_etl_transform` key hash-matches
  * the transformed ROWS against a DuckDB twin of the same rules.
  */
object TransformGen {

  /** One audit row per applied rule — the reviewable "what will this
    * transform do" record (kind ∈ rename/cast/null_filter/dedup). */
  final case class Step(kind: String, column: String, detail: String)

  /** `"Order Key"` → `order_key`, `"CustKey"` → `cust_key`: split camel
    * humps, map any non-alphanumeric run to one `_`, lowercase. */
  def snakeCase(name: String): String =
    name.replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
      .toLowerCase

  /** The 7-type profile menu → executable cast targets. TEXT and BLOB
    * return None: no cast (BLOB columns are excluded from profiling). */
  def castTarget(inferred: String): Option[String] = inferred match {
    case "INTEGER" => Some("BIGINT")
    case "REAL" => Some("DOUBLE")
    case "BOOLEAN" => Some("BOOLEAN")
    case "DATE" => Some("DATE")
    case "TIMESTAMP" => Some("TIMESTAMP")
    case _ => None
  }

  private def idShaped(snake: String): Boolean =
    snake == "id" || snake.endsWith("_id") || snake.endsWith("key")

  /** Collision-free output alias per source column, in profile order.
    * snakeCase is not injective (`Order Key` and `OrderKey` both map to
    * order_key); emitting the duplicate alias twice would make the
    * generated SELECT ambiguous or invalid downstream, so later
    * claimants of a taken alias get a `_2`, `_3`, … suffix (probing past
    * suffixed names that are themselves taken). First claimant keeps
    * the clean name — stable under appending columns to the profile. */
  def aliases(profile: Seq[ColumnProfile]): Map[String, String] = {
    val taken = scala.collection.mutable.Set[String]()
    profile.map { p =>
      val base = snakeCase(p.columnName)
      val alias =
        if (!taken(base)) base
        else Iterator.from(2).map(i => s"${base}_$i").find(!taken(_)).get
      taken += alias
      p.columnName -> alias
    }.toMap
  }

  /** Near-uniqueness floor for the dedup signal (see object doc). */
  val DedupFloor = 0.8

  /** The applied-rule audit for `profile` (stable: profile order). */
  def steps(profile: Seq[ColumnProfile]): Seq[Step] = {
    val alias = aliases(profile)
    val perColumn = profile.flatMap { p =>
      val snake = alias(p.columnName)
      val rename =
        if (snake != p.columnName)
          Seq(Step("rename", p.columnName, s"`${p.columnName}` -> $snake"))
        else Nil
      val cast =
        if (p.originalType == "string")
          castTarget(p.inferredSqlType).map(t =>
            Step("cast", p.columnName, s"CAST AS $t")).toSeq
        else Nil
      val nullFix =
        if (idShaped(snake) && p.nullCount > 0)
          Seq(Step("null_filter", p.columnName,
            s"drop ${p.nullCount} row(s) with null key"))
        else Nil
      rename ++ cast ++ nullFix
    }
    perColumn ++ dedupWitness(profile).map { p =>
      Step("dedup", p.columnName,
        s"near-unique key has ${p.rowCount - p.nullCount - p.distinctCount} " +
          "duplicate value(s): SELECT DISTINCT")
    }.toSeq
  }

  /** The column whose near-unique-but-duplicated values justify DISTINCT
    * (first such in profile order), if any. */
  private def dedupWitness(profile: Seq[ColumnProfile]): Option[ColumnProfile] =
    profile.find { p =>
      val nonNull = p.rowCount - p.nullCount
      idShaped(snakeCase(p.columnName)) && nonNull > 0 &&
        p.distinctCount < nonNull && p.distinctCount >= DedupFloor * nonNull
    }

  /** Backtick-quoted identifier with embedded backticks doubled (Spark
    * identifier escaping) — uploaded CSV headers are arbitrary text. */
  private def qid(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Single-quoted SQL string literal with embedded quotes doubled. */
  private def qlit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The cleaning SELECT for `table` under `profile` — columns in
    * profile order, Spark-dialect identifiers. Casts are TRY_CAST: the
    * profiler's regexes guarantee the VALUES parse shape-wise, but not
    * range (a 20-digit id matches ^-?[0-9]+$ yet overflows BIGINT) or
    * calendar validity ("2024-13-45" matches the date shape) — under
    * Spark's default ANSI mode a plain CAST would kill the whole
    * cleaning query on one such value; TRY_CAST nulls it, which the
    * quality report then surfaces. */
  def transformSql(table: String, profile: Seq[ColumnProfile]): String = {
    val alias = aliases(profile)
    val items = profile.map { p =>
      val snake = alias(p.columnName)
      val quoted = qid(p.columnName)
      val castExpr =
        if (p.originalType == "string") castTarget(p.inferredSqlType)
        else None
      castExpr match {
        case Some(t) => s"TRY_CAST($quoted AS $t) AS $snake"
        case None if snake != p.columnName => s"$quoted AS $snake"
        case None => quoted
      }
    }
    val preds = profile.collect {
      case p if idShaped(snakeCase(p.columnName)) && p.nullCount > 0 =>
        s"${qid(p.columnName)} IS NOT NULL"
    }
    val head = if (dedupWitness(profile).isDefined) "SELECT DISTINCT" else "SELECT"
    s"$head\n  " + items.mkString(",\n  ") +
      s"\nFROM ${qid(table)}" +
      (if (preds.isEmpty) "" else "\nWHERE " + preds.mkString(" AND "))
  }

  /** The rows [[transformSql]]'s null-key filter REJECTS, kept
    * addressable instead of silently vanishing — the self-healing
    * contract the parse-error [[graft.pipeline.Quarantine]] already
    * gives ingestion, extended to the transform stage: clean rows flow
    * on, rejected rows land in a reviewable side output with the reason
    * column. None when the transform filters nothing (then quarantine
    * is empty by construction and a caller need not run it). VALUES
    * pass through untransformed (no casts, no dedup — a quarantined row
    * is evidence); names normalize to the same snake_case as the clean
    * side, because raw names can carry characters the columnar sinks
    * refuse (a space in a parquet field name) and the quarantine output
    * must be sinkable anywhere the clean output is. */
  def quarantineSql(table: String, profile: Seq[ColumnProfile]): Option[String] = {
    val nullKeyed = profile.collect {
      case p if idShaped(snakeCase(p.columnName)) && p.nullCount > 0 =>
        p.columnName
    }
    val alias = aliases(profile)
    if (nullKeyed.isEmpty) None
    else Some(
      "SELECT\n  " + profile.map(p =>
        if (alias(p.columnName) == p.columnName) qid(p.columnName)
        else s"${qid(p.columnName)} AS ${alias(p.columnName)}").mkString(",\n  ") +
        s",\n  ${qlit(s"null key: ${nullKeyed.mkString(", ")}")} AS reason" +
        s"\nFROM ${qid(table)}" +
        "\nWHERE " + nullKeyed.map(c => s"${qid(c)} IS NULL").mkString(" OR "))
  }
}
