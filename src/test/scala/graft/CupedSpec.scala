package graft

import org.apache.spark.sql.functions._

/** q297 CUPED — the closed-from-sums algebra against a from-scratch
  * driver recomputation (per-user pre/post sums, md5 arms, pooled θ,
  * residualized means/variances), plus the CUPED invariants: the
  * adjusted arm DIFFERENCE is unbiased and variance never increases. */
class CupedSpec extends SparkSuite {

  private def md5ArmOf(userId: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ab-v1:$userId".getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    Integer.parseInt(hex.substring(0, 4), 16) % 2
  }

  test("q297 matches a from-scratch recomputation; variance never increases") {
    val got = SparkEntry.queries("q297_cuped_ab")(spark, sf0001)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set(0, 1))

    // from scratch: collect the fixture events (sf0.001 — bounded)
    val ev = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        coalesce(col("value"), lit(0.0)).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      val x = rows.filter(_._2 < mid).map(_._3).sum
      val y = rows.filter(_._2 >= mid).map(_._3).sum
      (md5ArmOf(u), x, y)
    }.toSeq
    val nG = users.size.toDouble
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxy = users.map(t => t._2 * t._3).sum
    val sxx = users.map(t => t._2 * t._2).sum
    val theta = (sxy - sx * sy / nG) / (sxx - sx * sx / nG)
    for (arm <- Seq(0, 1)) {
      val us = users.filter(_._1 == arm)
      val n = us.size.toDouble
      val mx = us.map(_._2).sum / n; val my = us.map(_._3).sum / n
      val vy = us.map(t => t._3 * t._3).sum / n - my * my
      val covA = us.map(t => t._2 * t._3).sum / n - mx * my
      val vx = us.map(t => t._2 * t._2).sum / n - mx * mx
      val (gn, gMeanY, gMeanCuped, gVarY, gVarCuped, gRed) = got(arm)
      assert(gn == us.size)
      assert(math.abs(gMeanY - my) < 1e-5, s"arm $arm mean_y")
      assert(math.abs(gMeanCuped - (my - theta * (mx - sx / nG))) < 1e-5, s"arm $arm cuped")
      assert(math.abs(gVarY - vy) < 1e-3, s"arm $arm var_y")
      assert(math.abs(gVarCuped - (vy - 2 * theta * covA + theta * theta * vx)) < 1e-3)
      assert(math.abs(gRed - (2 * theta * covA - theta * theta * vx) / vy) < 1e-3)
    }

    // invariants: the arm DIFFERENCE of adjusted means equals the raw
    // difference shifted by theta*(mx0 - mx1) — i.e. both arms were
    // shifted with the SAME pooled theta (per-arm thetas would bias);
    // and CUPED can only help in aggregate (pooled theta is the OLS
    // argmin of pooled residual variance)
    val pooledVarY = {
      val my = users.map(_._3).sum / nG
      users.map(t => t._3 * t._3).sum / nG - my * my
    }
    val pooledVarCuped = {
      val adj = users.map(t => t._3 - theta * (t._2 - sx / nG))
      val m = adj.sum / nG
      adj.map(a => a * a).sum / nG - m * m
    }
    assert(pooledVarCuped <= pooledVarY + 1e-12)
  }
}
