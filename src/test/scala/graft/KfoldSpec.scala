package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Targeted check for q279 (one-pass k-fold CV): the output is
  * validated against the NAIVE method — actually holding out each fold
  * and averaging the rest — so the one-pass algebra (not just the
  * arithmetic) is what's under test.
  */
class KfoldSpec extends SparkSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q279: one-pass folds match the naive hold-one-fold-out computation") {
    val data = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity").collect()
      .map { r =>
        val key = s"cv-v1:${r.getLong(0)}:${r.getInt(1)}"
        (Integer.parseInt(md5hex(key).take(4), 16) % 5, r.getDouble(2))
      }
    val byFold = data.groupBy(_._1)
    val got = SparkEntry.queries("q279_kfold_cv")(spark, sf0001).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val fold = r.getAs[Int]("fold")
      val holdOut = byFold(fold).map(_._2)
      val train = data.filter(_._1 != fold).map(_._2)
      val mOut = train.sum / train.length
      val rmse = math.sqrt(holdOut.map(y => (y - mOut) * (y - mOut)).sum / holdOut.length)
      assert(r.getAs[Long]("n") == holdOut.length)
      assert(math.abs(r.getAs[Double]("mean_out") - mOut) < 1e-6, s"fold $fold mean")
      assert(math.abs(r.getAs[Double]("rmse") - rmse) < 1e-6, s"fold $fold rmse")
    }
  }

}
