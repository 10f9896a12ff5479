package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the admission gate a corpus
  * passes before it may enter a training mix (the public reference point
  * is AWS Deequ: declare measures + bounds, compute them in one pass,
  * emit a verdict table).
  *
  * Every expectation is (name, measure, [lo, hi]): the measure is any
  * aggregate Column, so the whole audit compiles to ONE aggregation job
  * over the table — a single scan regardless of how many expectations are
  * declared (Catalyst fuses the aggregates; `count_distinct` measures add
  * their expand-distinct phase to the same job, they do not re-scan).
  * The one-row result unpivots to a (check, value, lo, hi, pass) report
  * via `stack` — no second pass, no driver-side evaluation.
  *
  * At 100 TB the audit costs exactly one table scan; report size is the
  * number of expectations. For continuous ingestion run it per increment
  * (e.g. over a [[graft.io.VersionedTable]] change feed) and alert on
  * `pass = false` rows. */
object Expectations {

  /** One declared expectation: `measure` must aggregate to a numeric
    * scalar; the check passes iff lo ≤ value ≤ hi (inclusive). */
  final case class Expectation(name: String, measure: org.apache.spark.sql.Column,
      lo: Double, hi: Double) {
    require(name.matches("[A-Za-z0-9_]+"), s"expectation name must be an identifier: $name")
    require(lo <= hi, s"$name: empty bound [$lo, $hi]")
  }

  /** Ratio-of-rows-satisfying helper: fraction of rows where `p` holds
    * (null counts as failing). */
  def ratio(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    avg(when(p, 1.0).otherwise(0.0))

  /** The verdict table: (check, value, lo, hi, pass), one row per
    * expectation, values rounded to 6 decimals so the report is
    * reproducible cross-engine. One aggregation job total. */
  def audit(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "no expectations declared")
    require(expectations.map(_.name).distinct.size == expectations.size,
      "duplicate expectation names")
    val one = df.agg(
      expectations.head.measure.cast("double").as(expectations.head.name),
      expectations.tail.map(e => e.measure.cast("double").as(e.name)): _*)
    val stacked = one.select(expr(
      s"stack(${expectations.size}, " +
        expectations.map(e => s"'${e.name}', round(`${e.name}`, 6)").mkString(", ") +
        ") as (check_name, value)"))
    val lo = expectations.foldLeft(lit(null).cast("double")) { (acc, e) =>
      when(col("check_name") === e.name, lit(e.lo)).otherwise(acc)
    }
    val hi = expectations.foldLeft(lit(null).cast("double")) { (acc, e) =>
      when(col("check_name") === e.name, lit(e.hi)).otherwise(acc)
    }
    stacked
      .withColumn("lo", lo)
      .withColumn("hi", hi)
      // an un-computable measure (null value, e.g. avg over an empty
      // table) must FAIL the gate, not escape it as pass = NULL
      .withColumn("pass",
        coalesce(col("value").between(col("lo"), col("hi")), lit(false)))
  }

  /** Adapter for the audited streaming sink
    * ([[graft.streaming.EventStreams.startAuditedVersionedSink]]'s
    * `audit` parameter): run the declared expectations against the
    * staged micro-batch and return the FAILING checks as violation
    * messages — one aggregation per batch, the same one-scan economics
    * as [[audit]]. */
  def asAudit(expectations: Seq[Expectation]): DataFrame => Seq[String] =
    df => audit(df, expectations)
      .filter(!col("pass"))
      .collect()
      .map(r => s"${r.getAs[String]("check_name")}=" +
        s"${r.getAs[Any]("value")} outside [${r.getDouble(2)}, ${r.getDouble(3)}]")
      .toSeq

  /** Profile-driven expectation SUGGESTION (Deequ's "constraint
    * suggestion" feature): one aggregation pass over the numeric columns
    * profiles completeness, value range, and distinctness, and emits the
    * concrete bounds a caller would freeze into an [[audit]] gate —
    * (column, check, value) with check ∈ completeness | min | max |
    * distinctness. Like [[audit]], the whole profile is ONE job no
    * matter how many columns (the countDistinct measures share the same
    * expand-distinct phase); values round to 6 decimals for
    * reproducibility. */
  def suggest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"), s"not an identifier: $c"))
    val aggs = Seq(count(lit(1)).cast("double").as("_n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"_cnt_$c"),
        min(col(c)).cast("double").as(s"_min_$c"),
        max(col(c)).cast("double").as(s"_max_$c"),
        countDistinct(col(c)).cast("double").as(s"_ndv_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.flatMap { c =>
      Seq(
        s"'$c', 'completeness', round(`_cnt_$c` / `_n`, 6)",
        s"'$c', 'min', round(`_min_$c`, 6)",
        s"'$c', 'max', round(`_max_$c`, 6)",
        s"'$c', 'distinctness', round(`_ndv_$c` / nullif(`_cnt_$c`, 0), 6)")
    }
    one.select(expr(
      s"stack(${rows.size}, ${rows.mkString(", ")}) as (column_name, check_name, value)"))
  }
}
