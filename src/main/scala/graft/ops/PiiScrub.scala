package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora — the scrub stage the published
  * pipelines (CCNet/Dolma-style) run between quality filtering and
  * packing: replace emails / phone numbers / IPv4 addresses with stable
  * placeholder tokens so the model never memorizes them, and COUNT what
  * was redacted per document (the audit trail a release review wants).
  *
  * Everything is `regexp_replace` / `regexp_count` over builtin
  * expressions — whole-stage codegen, no UDF, embarrassingly row-local,
  * so the stage adds zero shuffles to any pipeline it joins. Patterns
  * are deliberately written in the common RE2/Java subset (no
  * backreferences, no lookaround) so an engine-external replay (the
  * DuckDB oracle, a Python spot-checker) matches byte-for-byte.
  *
  * This handles the STRUCTURED 90% (addresses with grammar). Free-form
  * names/addresses need an NER model — that path is
  * [[graft.ops.Multimodal]]-style batch inference, out of scope for the
  * codegen stage and documented here so nobody mistakes this for full
  * anonymization. */
object PiiScrub {

  /** Common-subset patterns (RE2 ∩ Java, case handled explicitly). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}([- ][0-9]{3,4})?"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def countPhones(text: Column): Column = regexp_count(text, lit(PhonePattern))
  def countIpv4(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))

  /** Redact in a fixed order (emails first: an email never contains a
    * phone/IP match after replacement, so the order is deterministic
    * and documented rather than accidental). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")
}
