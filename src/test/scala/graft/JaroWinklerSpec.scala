package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{JaroWinklerImpl, JaroWinklerSim}

/** [[JaroWinklerSim]] — textbook values (Winkler 1990), the DuckDB
  * conventions the q246 oracle relies on (empty→0, equal→1, boost only
  * above 0.7), and eval/codegen/SQL agreement. */
class JaroWinklerSpec extends SparkSuite {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook pairs (pinned against DuckDB's jaro_winkler_similarity)") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
  }

  test("conventions: empty scores 0, equal scores 1, disjoint scores 0") {
    assert(jw("", "") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("identical string", "identical string") == 1.0)
    assert(jw("ab", "cd") == 0.0)
  }

  test("Winkler boost applies only above the 0.7 threshold") {
    // shared 3-char prefix but jaro 0.5333 <= 0.7 -> NO boost (DuckDB-pinned)
    assert(math.abs(jw("abcdefghij", "abcxxxxxxx") - 0.5333333333333333) < 1e-12)
    // prefix capped at 4 even with longer common prefixes
    val boosted = jw("abcdefgh", "abcdefxx")
    val jaro = (6.0 / 8 + 6.0 / 8 + 1.0) / 3
    assert(math.abs(boosted - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12)
  }

  test("symmetry") {
    for ((a, b) <- Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("x", "xyz")))
      assert(jw(a, b) == jw(b, a))
  }

  test("codegen column path and SQL registration agree with direct eval") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", "x"), ("same", "same"))
      .toDF("a", "b")
    val viaColumn = df.select(JaroWinklerSim(col("a"), col("b"))).as[Double].collect()
    graft.functions.Registry.registerAll(spark)
    df.createOrReplaceTempView("jw_t")
    val viaSql = spark.sql("SELECT jaro_winkler_similarity(a, b) FROM jw_t")
      .as[Double].collect()
    val direct = Seq(jw("martha", "marhta"), jw("dixon", "dicksonx"), jw("", "x"), 1.0)
    assert(viaColumn.toSeq == direct)
    assert(viaSql.toSeq == direct)
  }

  test("null propagates") {
    val df = Seq((Option("a"), Option.empty[String])).toDF("a", "b")
    assert(df.select(JaroWinklerSim(col("a"), col("b"))).collect()(0).isNullAt(0))
  }
}
