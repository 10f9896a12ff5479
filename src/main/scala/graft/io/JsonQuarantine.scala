package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL ingestion with quarantine routing — [[CsvQuarantine]]'s twin
  * for the other ubiquitous feed format, with JSON's extra failure mode
  * handled: a line can be SYNTACTICALLY malformed (no fields parse at
  * all), which CSV cannot express. PERMISSIVE JSON reads null just the
  * unparseable FIELDS of a well-formed line (unlike CSV, which nulls the
  * whole row), but both silently — and the corrupt-record column has the
  * same scan-pushdown trap as CSV's (filters on it evaluate before
  * parsing populates it).
  *
  * So, as with CSV: parse every line TWICE in the engine where pushdown
  * is safe — once against an all-string schema (captures each field's
  * raw text; null struct = malformed line) and once against the declared
  * schema. A field is corrupt when its raw text is present but its
  * typed value is null; a line is quarantined when it is malformed or
  * any field is corrupt. An ABSENT field yields nulls on both reads —
  * missing data, not corruption, same contract as CsvQuarantine's short
  * rows. Both frames plan off one text scan; nothing is cached. */
object JsonQuarantine {

  final case class Routed(good: DataFrame, bad: DataFrame)

  /** Read JSONL at `path` against `schema`; route malformed lines and
    * rows with unparseable fields to `bad` (raw line intact). */
  def read(spark: SparkSession, path: String, schema: StructType): Routed = {
    // the injected corrupt-record column must not collide with a declared
    // field — a duplicate field in rawSchema would make malformedness
    // detection read the user's data
    require(!schema.fieldNames.contains("_corrupt"),
      "declared schema must not contain a field named _corrupt (reserved for " +
        "the injected corrupt-record column)")
    // from_json never returns NULL for a malformed line — it yields a row
    // of nulls (indistinguishable from "{}") — so malformedness must come
    // from the corrupt-record column, which from_json (a per-row
    // expression over an already-read text column) populates without the
    // file-source scan-pushdown trap
    val rawSchema = StructType(
      schema.fields.map(_.copy(dataType = StringType)) :+
        org.apache.spark.sql.types.StructField("_corrupt", StringType))
    val opts = Map("columnNameOfCorruptRecord" -> "_corrupt")
    val lines = spark.read.text(path)
    val withBoth = lines
      .withColumn("_raw", from_json(col("value"), rawSchema, opts))
      .withColumn("_typed", from_json(col("value"), schema))
    // struct fields via getField, never `col("_raw.<name>")` — a field
    // name containing a dot would resolve as a NESTED path there and
    // silently mis-detect corruption
    def raw(n: String) = col("_raw").getField(n)
    def typed(n: String) = col("_typed").getField(n)
    val malformed = raw("_corrupt").isNotNull
    val fieldCorrupt = schema.fields
      .filterNot(_.dataType == StringType)
      .map(f => raw(f.name).isNotNull && typed(f.name).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    Routed(
      good = withBoth.filter(!malformed && !fieldCorrupt)
        .select(schema.fieldNames.map(n => typed(n).as(n)).toSeq: _*),
      bad = withBoth.filter(malformed || fieldCorrupt)
        .select(Seq(
          col("value").as("raw_line"),
          malformed.as("is_malformed")) ++
          schema.fieldNames.map(n => raw(n).as(s"raw_$n")): _*))
  }
}
