package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII scrubbing — the redaction pass every published pretraining
  * pipeline runs before training (emails/IPs/long ID numbers; the
  * C4/Dolma/RedPajama cleanup family). Reference scope note: the
  * reference (qwerdenkerXD/gus) has no text analytics; this extends
  * the generalized document surface like the rest of the pipeline
  * operators.
  *
  * The regex dialect is the Java/RE2 COMMON SUBSET — no lookaround,
  * no backreferences, no `\b`/`\d` shorthands — so Spark (java.util
  * .regex) and the DuckDB oracle (RE2) match byte-identically; the
  * cascade order (email → IPv4 → digit run) is part of the contract,
  * and each count is taken on the PREVIOUS stage's output, i.e. "what
  * this stage actually redacted".
  *
  * Shape for 100 TB: map-only — three codegen'd regexp passes per
  * row, zero shuffles; cost is linear in corpus bytes and fully
  * partition-parallel. The one real scan consideration is upstream:
  * project only (doc_id, text) so the scan never carries unused
  * columns.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val NumRe = "[0-9]{9,}"

  /** The reusable scrub: adds n_email/n_ip/n_num and text_redacted to
    * any frame with a `text` column. Counts are per-stage (email count
    * on the input, IP count after email removal, number count after IP
    * removal) so they sum to "strings redacted", never double-counting
    * digit runs inside an already-redacted IP. */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, NumRe, "<NUM>")
    df.withColumn("n_email", regexp_count(t0, lit(EmailRe)))
      .withColumn("n_ip", regexp_count(t1, lit(Ipv4Re)))
      .withColumn("n_num", regexp_count(t2, lit(NumRe)))
      .withColumn("text_redacted", t3)
  }

  /** q82: the oracle-gated scrub. The synthetic corpus is digit-free
    * by construction (TESTDATA.md), so the query first PLANTS a
    * deterministic contact line per row — same string built from
    * doc_id in both engines — then proves the scrubber removes
    * exactly it (a real deployment drops the planting stage and runs
    * [[redactPii]] directly). The hash compare therefore certifies
    * the Java and RE2 engines agree on every planted match AND leave
    * every other byte untouched. */
  def q82PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val planted = concat(col("text"),
      lit(" reach user"), id.cast("string"),
      lit("@example.com or 10."), (id % 200).cast("string"),
      lit("."), ((id * 7) % 250).cast("string"),
      lit("."), ((id * 13) % 250).cast("string"),
      lit(" ref 4111"), lpad((id % 100000).cast("string"), 12, "0"))
    val base = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), planted.as("text"))
    redactPii(base)
      .select(col("doc_id"),
        col("n_email").cast("long").as("n_email"),
        col("n_ip").cast("long").as("n_ip"),
        col("n_num").cast("long").as("n_num"),
        col("text_redacted"))
      .orderBy(col("doc_id"))
  }

  val q82PiiRedactOracle: String =
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    text || ' reach user' || CAST(doc_id AS VARCHAR)
       |      || '@example.com or 10.' || CAST(doc_id % 200 AS VARCHAR)
       |      || '.' || CAST((doc_id * 7) % 250 AS VARCHAR)
       |      || '.' || CAST((doc_id * 13) % 250 AS VARCHAR)
       |      || ' ref 4111' || lpad(CAST(doc_id % 100000 AS VARCHAR), 12, '0')
       |      AS text
       |  FROM documents),
       |s1 AS (
       |  SELECT doc_id, text,
       |    CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT)
       |      AS n_email,
       |    regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS t1
       |  FROM planted),
       |s2 AS (
       |  SELECT doc_id, n_email,
       |    CAST(len(regexp_extract_all(t1, '$Ipv4Re')) AS BIGINT) AS n_ip,
       |    regexp_replace(t1, '$Ipv4Re', '<IP>', 'g') AS t2
       |  FROM s1),
       |s3 AS (
       |  SELECT doc_id, n_email, n_ip,
       |    CAST(len(regexp_extract_all(t2, '$NumRe')) AS BIGINT) AS n_num,
       |    regexp_replace(t2, '$NumRe', '<NUM>', 'g') AS text_redacted
       |  FROM s2)
       |SELECT doc_id, n_email, n_ip, n_num, text_redacted
       |FROM s3 ORDER BY doc_id""".stripMargin
}
