package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection / redaction — the filter every pretraining corpus runs
  * before anything else. Regex-based (the production baseline; model-based
  * NER layers on top), pure narrow projections: zero shuffle, codegen'd.
  *
  * Patterns are deliberately conservative (precision over recall) and
  * documented: emails, URLs, international-ish phone numbers, and
  * 16-digit card-shaped numbers.
  */
object PiiScrub {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^\\s]+"
  val phoneRe = "\\+?[0-9][0-9()\\-\\s]{7,}[0-9]"
  val cardRe = "\\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\\b"

  /** Redact all recognized PII in `text` (stable placeholder tokens). */
  def scrub(text: Column): Column = {
    val noEmail = regexp_replace(text, emailRe, "[EMAIL]")
    val noUrl = regexp_replace(noEmail, urlRe, "[URL]")
    val noCard = regexp_replace(noUrl, cardRe, "[CARD]")
    regexp_replace(noCard, phoneRe, "[PHONE]")
  }

  /** Per-row PII hit counts (for filtering thresholds / audit). */
  def stats(df: DataFrame, textCol: String): DataFrame =
    df.select(
      col("*"),
      regexp_count(col(textCol), lit(emailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(urlRe)).as("n_urls"),
      regexp_count(col(textCol), lit(cardRe)).as("n_cards"))

  /** Scrub a set of string columns in place. */
  def scrubColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, scrub(col(c))))
}
