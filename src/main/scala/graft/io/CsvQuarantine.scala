package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV ingestion with quarantine routing — the production answer to the
  * reference's drop-or-crash choice on malformed rows (`Cleaning.scala`
  * nulls invalid casts; a real 100 TB feed needs the bad lines KEPT
  * somewhere auditable, not silently nulled or fatally thrown). Rows
  * whose every field type-checks land in `good` with the declared
  * schema; rows with any unparseable field land in `bad` with their raw
  * fields intact, ready for a quarantine sink and replay after the
  * upstream fix.
  *
  * Deliberately NOT built on Spark's PERMISSIVE corrupt-record column:
  * filters on that column push into the CSV scan and evaluate before
  * parsing populates it, silently mis-routing rows (the trap behind
  * Spark's "no corrupt-column-only queries" error — which catches the
  * obvious case and misses this one). Instead every field reads as a
  * STRING (always parseable), and `try_cast` against the declared schema
  * decides routing in the engine where pushdown is safe: a field is
  * corrupt when its raw text is present but its typed cast is null.
  * A short row (missing trailing fields) yields nulls, not corruption —
  * same as a null-typed source. Both frames plan off one scan shape;
  * nothing is cached. */
object CsvQuarantine {

  final case class Routed(good: DataFrame, bad: DataFrame)

  /** Read `path` against `schema`; route rows with unparseable fields. */
  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, sep: String = ","): Routed = {
    val rawSchema = StructType(schema.fields.map(_.copy(dataType = StringType)))
    val raw = spark.read
      .option("header", header.toString)
      .option("sep", sep)
      .schema(rawSchema)
      .csv(path)
    val corrupt = schema.fields
      .filterNot(_.dataType == StringType)
      .map(f => col(f.name).isNotNull &&
        expr(s"try_cast(${f.name} AS ${f.dataType.sql})").isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    Routed(
      good = raw.filter(!corrupt).select(schema.fields.map(f =>
        expr(s"try_cast(${f.name} AS ${f.dataType.sql})").as(f.name)): _*),
      bad = raw.filter(corrupt)
        .withColumn("raw_line", concat_ws(sep, schema.fieldNames.map(col): _*)))
  }
}
