package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated star-schema fixtures (TESTDATA.md).
  *
  * Parquet is the engine's primary format (columnar, predicate pushdown,
  * vectorized reader — SURVEY.md §1.3): schemas travel with the files, so
  * no re-inference happens per load (unlike the reference, which re-infers
  * CSV schemas on every run, `SQLOperations.scala:12-15`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` normalization — the fixture generator has shipped the
    * column two ways across rounds, and every registry query is verified
    * against a plain `TimestampType` (UTC session), so both arrivals are
    * canonicalized to it here:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
    *    [[GraftSession]] sets `spark.sql.legacy.parquet.nanosAsLong=true`
    *    session-wide, the column arrives as a raw long, and we truncate
    *    ns→µs — the same truncation DuckDB applies reading the file.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads it
    *    as TIMESTAMP_NTZ, which functions like `unix_micros` reject. The
    *    session timezone is pinned to UTC, so the NTZ→LTZ cast is
    *    value-preserving and matches DuckDB's naive-micros view.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** The ts canonicalization alone, for callers that read the fixture
    * through another channel (e.g. a file-source stream over a staged
    * copy) and need the identical policy. */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** SQL entry point (SURVEY §1.1; ref `SQLOperations.scala:25`
    * `createOrReplaceTempView`): registers all nine fixture tables as temp
    * views under their canonical names, so `spark.sql("... FROM lineitem
    * JOIN nation ...")` works directly — the same statements the DuckDB
    * oracle runs. Views are lazy (no data is read here); `events` goes
    * through the ns→µs normalization above, so SQL users see the same
    * timestamps the DataFrame API does. */
  def registerFixtures(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(n => load(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
    documents(s, d).createOrReplaceTempView("documents")
    embeddings(s, d).createOrReplaceTempView("embeddings")
  }
}
