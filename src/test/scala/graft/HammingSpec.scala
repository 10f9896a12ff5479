package graft

import org.apache.spark.sql.functions._

import graft.functions.HammingDistance

/** Fused Hamming-distance expression ([[HammingDistance]]): value
  * semantics vs an independent computation (codegen AND interpreted
  * paths), length-difference handling, SQL registration, type check. */
class HammingSpec extends SparkSuite {
  import spark.implicits._

  private def ref(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y } + math.abs(a.length - b.length)

  test("distance matches the independent reference on random bit-strings") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = (1 to 64).map(_ => if (rnd.nextBoolean()) '1' else '0').mkString
      val b = (1 to 64).map(_ => if (rnd.nextBoolean()) '1' else '0').mkString
      (a, b)
    }
    val got = rows.toDF("a", "b")
      .select(HammingDistance(col("a"), col("b")).as("d"))
      .as[Int].collect().toSeq
    assert(got == rows.map { case (a, b) => ref(a, b) })
  }

  test("interpreted eval agrees with codegen") {
    // non-deterministic wrapper is unnecessary: force eval via literal fold
    // (ConstantFolding runs the interpreted path at optimization time)
    val d = spark.sql("SELECT hamming_distance('10110', '10011') AS d").head().getInt(0)
    assert(d == 2)
  }

  test("unequal lengths count the missing tail as mismatches") {
    val d = Seq(("abc", "abcd")).toDF("a", "b")
      .select(HammingDistance(col("a"), col("b")).as("d")).as[Int].head()
    assert(d == 1)
    val d2 = spark.sql("SELECT hamming_distance('', '1111') AS d").head().getInt(0)
    assert(d2 == 4)
  }

  test("nulls propagate; non-string inputs are rejected at analysis") {
    val n = Seq((Option.empty[String], "x")).toDF("a", "b")
      .select(HammingDistance(col("a"), col("b")).as("d"))
      .collect().head
    assert(n.isNullAt(0))
    val e = intercept[Exception](
      spark.sql("SELECT hamming_distance(1, 2)").collect())
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
