package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A14 sanitize/normalize text chain (reference:
  * src/llm_logparser/core/providers/openai/utils.py:33-88 —
  * `_sanitize_impl` / `_loose_parts_to_text`). Dead on the reference's
  * LIVE path (the adapter never calls it — verified in SURVEY.md §2
  * A14), provided as a declarative expression chain for provider-v2
  * parity, exactly as the survey planned.
  *
  * Semantics mirrored step-for-step (order matters — control chars,
  * including \t and \n, are STRIPPED before whitespace collapse, so
  * `"語\tテスト"` joins with no space, matching the reference quirk):
  *  1. NBSP → space
  *  2. remove control chars [\x00-\x1F\x7F]
  *  3. collapse whitespace runs to one space — Python's str \s is
  *     Unicode-aware (U+3000 etc.), hence the (?U) flag
  *  4. strip (after collapse, edge whitespace is always the plain
  *     space char, so SQL trim's space-only semantics suffice)
  *
  * All steps are built-in regexp_replace — codegen'd, no UDF.
  */
object Sanitize {

  def sanitizeText(c: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, "\\u00A0", " "),
          "[\\x00-\\x1F\\x7F]", ""),
        "(?U)\\s+", " "))

  /** `_loose_parts_to_text` over an array<string> parts column:
    * sanitize each part, join with single spaces (structured parts are
    * already flattened to their string payloads by the read schema). */
  def partsToText(parts: Column): Column =
    array_join(transform(parts, sanitizeText(_)), " ")
}
