package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Sessions built via [[GraftSession]] set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (session-wide, declared
    * once — not mutated here per-read), so the column arrives as a raw
    * long; truncate it to a microsecond timestamp — the same ns→µs
    * truncation DuckDB applies when it reads the file, so both engines see
    * identical instants.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
