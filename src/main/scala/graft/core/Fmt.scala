package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for the oracle contract (SURVEY.md §2.13):
  * timestamps/dates rendered as UTC strings, floating aggregates rounded
  * (4 decimals for large magnitudes where cross-engine float accumulation
  * noise can reach ~1e-7; 6 where magnitudes are small).
  */
object Fmt {
  /** Render a timestamp column as `yyyy-MM-dd HH:mm:ss` (UTC session tz). */
  def ts(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Render a date/timestamp column as `yyyy-MM-dd`. */
  def date(c: Column): Column = date_format(c, "yyyy-MM-dd")

  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)
}
