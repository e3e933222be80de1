package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** PII detection and redaction over the `documents` table — the
  * scrub-before-training stage every large-scale text pipeline runs
  * (emails, phone numbers, IP addresses → typed placeholder tokens).
  *
  * Everything is a single map-side pass: Spark's `regexp_extract_all` /
  * `regexp_replace` are codegen'd expressions, so detection and redaction
  * run inside whole-stage codegen with no shuffle at all for the per-doc
  * query and one partial-aggregated shuffle for the per-source rollup.
  * At 100 TB that is the ideal shape — the scan is the cost, and the
  * regex set is applied once per document as it streams through.
  *
  * The synthetic corpus contains no PII-shaped strings, so the query
  * first AUGMENTS each document with deterministic PII segments derived
  * from driver columns (`doc_id`, `source`, `n_chars`) — an email for
  * 2/3 of docs, a dotted-quad IP for every even doc, a phone number for
  * all — and both engines build the identical augmented text. The
  * detectors therefore see real matches with per-doc-varying counts, and
  * the oracle checks the full detect→count→redact chain value-for-value
  * (regex class syntax here is the common Java/RE2 subset, so both
  * engines compile the same automaton).
  */
object Pii {

  /** The common Java-regex/RE2 subset patterns (no backrefs, no
    * lookaround — portable across Spark and DuckDB). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+1-\\d{3}-\\d{4}"

  /** Deterministic PII-planting: text ++ (email | ip | phone) segments
    * keyed off driver columns, mirrored verbatim in the oracle SQL. */
  private def augmented(): Column =
    concat(col("text"),
      when(col("doc_id") % 3 =!= 0,
        concat(lit(" contact "), col("source"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 2 === 0,
        concat(lit(" ip 10."), (col("doc_id") % 200).cast("string"), lit("."),
               (col("n_chars") % 250).cast("string"), lit(".7")))
        .otherwise(lit("")),
      lit(" phone +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))

  private val augmentedSql: String =
    """text
      || CASE WHEN doc_id % 3 <> 0 THEN ' contact ' || source || '@example.com' ELSE '' END
      || CASE WHEN doc_id % 2 = 0 THEN ' ip 10.' || CAST(doc_id % 200 AS VARCHAR)
                || '.' || CAST(n_chars % 250 AS VARCHAR) || '.7' ELSE '' END
      || ' phone +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"""

  /** Per-document detection counts + the fully redacted text. */
  def redact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id", $"source", augmented().as("t"))
      .select($"doc_id", $"source",
        size(regexp_extract_all($"t", lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all($"t", lit(IpRe), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all($"t", lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace($"t", EmailRe, "[EMAIL]"),
            IpRe, "[IP]"),
          PhoneRe, "[PHONE]").as("redacted"))
      .orderBy($"doc_id")
  }

  /** Per-source rollup: total hits by kind + how many documents carry any
    * PII — the audit report a scrubbing run emits. */
  def stats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    redact(s, d)
      .groupBy($"source")
      .agg(sum($"n_emails").as("emails"),
           sum($"n_ips").as("ips"),
           sum($"n_phones").as("phones"),
           sum(when($"n_emails" + $"n_ips" + $"n_phones" > 0, 1L).otherwise(0L))
             .as("docs_with_pii"),
           count(lit(1)).as("n_docs"))
      .orderBy($"source")
  }

  /** K-anonymity audit — the privacy screen a release runs AFTER
    * redaction: under the quasi-identifier generalization (lang, source,
    * fixed 100-char length bucket — `n_chars div 100`, width-based, not a
    * quantile), how small do equivalence classes get? A class of
    * size 1 is a re-identifiable row; k-anonymity holds at the smallest
    * class size. Output is the class-size census in power-of-two bands
    * (`length(bin(size))`, the length-batches discipline — exact edges,
    * no float log2): per band, class count, row count, size envelope,
    * and each band's exact micro share of corpus rows.
    *
    * Scale shape: one (lang, source, bucket) hash aggregate collapses the
    * corpus to class-scale, a second aggregate collapses classes to ≤64
    * bands, and the corpus total for the share column comes from summing
    * the ALREADY-AGGREGATED class frame (crossJoin of a 1-row aggregate —
    * bounded metadata, never a second corpus scan). */
  def kAnonymity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val classes = documents(s, d)
      .groupBy($"lang", $"source", expr("n_chars div 100").as("len_bucket"))
      .agg(count(lit(1)).as("sz"))
    val total = classes.agg(sum($"sz").as("total"))
    classes
      .groupBy(length(bin($"sz")).cast("long").as("band"))
      .agg(count(lit(1)).as("n_classes"), sum($"sz").as("n_rows"),
           min($"sz").as("min_size"), max($"sz").as("max_size"))
      .crossJoin(total)
      .select($"band", $"n_classes", $"n_rows", $"min_size", $"max_size",
        expr("CAST(1000000 * CAST(n_rows AS DECIMAL(38,0)) div total AS BIGINT)")
          .as("row_share_micro"))
      .orderBy($"band")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nd_pii_redact" -> ((s: SparkSession, d: String) => redact(s, d)),
    "nd_pii_stats" -> ((s: SparkSession, d: String) => stats(s, d)),
    "nd_pii_kanon" -> (kAnonymity _))

  private val redactSql: String =
    s"""WITH aug AS (
          SELECT doc_id, source, $augmentedSql AS t
          FROM documents),
        det AS (
          SELECT doc_id, source,
                 CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
                 CAST(len(regexp_extract_all(t, '$IpRe')) AS BIGINT) AS n_ips,
                 CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(t, '$EmailRe', '[EMAIL]', 'g'),
                     '$IpRe', '[IP]', 'g'),
                   '$PhoneRe', '[PHONE]', 'g') AS redacted
          FROM aug)"""

  val oracle: Map[String, String] = Map(
    "nd_pii_redact" ->
      s"""$redactSql
          SELECT doc_id, source, n_emails, n_ips, n_phones, redacted
          FROM det ORDER BY doc_id""",
    "nd_pii_stats" ->
      s"""$redactSql
          SELECT source,
                 CAST(sum(n_emails) AS BIGINT) AS emails,
                 CAST(sum(n_ips) AS BIGINT) AS ips,
                 CAST(sum(n_phones) AS BIGINT) AS phones,
                 CAST(sum(CASE WHEN n_emails + n_ips + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
                 count(*) AS n_docs
          FROM det GROUP BY source ORDER BY source""",
    "nd_pii_kanon" ->
      """WITH cls AS (SELECT lang, source, n_chars // 100 AS len_bucket,
                             count(*) AS sz
                      FROM documents GROUP BY lang, source, len_bucket),
          tot AS (SELECT CAST(sum(sz) AS HUGEINT) AS total FROM cls)
          SELECT CAST(length(bin(sz)) AS BIGINT) AS band,
                 count(*) AS n_classes, CAST(sum(sz) AS BIGINT) AS n_rows,
                 CAST(min(sz) AS BIGINT) AS min_size,
                 CAST(max(sz) AS BIGINT) AS max_size,
                 CAST(1000000 * CAST(sum(sz) AS HUGEINT)
                      // (SELECT total FROM tot) AS BIGINT) AS row_share_micro
          FROM cls GROUP BY band ORDER BY band""")
}
