package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** Systematic equivalence sweep for the MV rewriter: EVERY combination
  * of grouping ⊆ view keys × rewritable aggregate set × key filter —
  * flat, star, and rollup shapes — must both FIRE (fact scan gone) and
  * return results identical to the rule-off plan. The hand-picked
  * matrices in MvRewriteSpec/MvStarRewriteSpec/MvExpandRewriteSpec pin
  * the semantics; this sweep guards the cross-product no one
  * hand-writes. */
@org.scalatest.tags.Slow
class MvRewriteSweepSpec extends SparkSuite {

  private val ConfKey = "spark.graft.mvrewrite.enabled"

  private def scanRoots(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten.toSet

  private val aggMenu: Seq[(String, Column)] = Seq(
    "n" -> count(lit(1)).as("n"),
    "nv" -> count(col("v")).as("nv"),
    "s" -> sum("v").as("s"),
    "mn" -> min("v").as("mn"),
    "mx" -> max("v").as("mx"),
    "a" -> avg("v").as("a"))

  private def withFixture(test: (String, DataFrame) => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("mvsweep").toString
    val fact = tmp + "/fact"
    import spark.implicits._
    Seq(
      ("a", "x", Some(1)), ("a", "x", Some(3)), ("a", "y", None),
      ("b", "x", Some(7)), ("b", "y", Some(9)), ("b", "y", Some(11)),
      (null.asInstanceOf[String], "y", Some(5)), ("c", null.asInstanceOf[String], Some(2)),
      ("c", "x", None), ("b", "x", Some(-4)))
      .toDF("k1", "k2", "v")
      .write.mode("overwrite").parquet(fact)
    MvRewrite.materialize(spark, fact, Seq("k1", "k2"), "v", tmp + "/state")
    spark.conf.set(ConfKey, "true")
    val dim = Seq(("a", "east"), ("b", "west"), ("b", "north"), ("d", "south"))
      .toDF("k1", "region")
    try test(fact, dim)
    finally {
      spark.conf.set(ConfKey, "false")
      MvRewrite.clear()
    }
  }

  /** Runs the build twice (rule on / off), asserts identical sorted rows
    * and that the ON plan dropped the fact scan. */
  private def sweepCase(build: () => DataFrame, fact: String, label: String): Unit = {
    val onDf = build()
    assert(!scanRoots(onDf).exists(_.endsWith("/fact")),
      s"[$label] did not fire: ${scanRoots(onDf)}")
    val on = onDf.collect().map(_.toString).sorted.toSeq
    spark.conf.set(ConfKey, "false")
    val off = try build().collect().map(_.toString).sorted.toSeq
    finally spark.conf.set(ConfKey, "true")
    assert(on == off, s"[$label]\non =$on\noff=$off")
  }

  test("flat sweep: groupings x aggregates x key filters all fire and agree") {
    withFixture { (fact, _) =>
      val groupings = Seq(Seq.empty[String], Seq("k1"), Seq("k2"), Seq("k1", "k2"))
      val combos: Seq[Seq[(String, Column)]] =
        aggMenu.map(Seq(_)) :+ aggMenu // each single + all six
      val filters: Seq[(String, DataFrame => DataFrame)] = Seq(
        "nofilter" -> identity[DataFrame] _,
        "k2=y" -> ((df: DataFrame) => df.filter(col("k2") === "y")))
      for {
        g <- groupings
        c <- combos
        (fLabel, f) <- filters
      } sweepCase(() => {
        val base = f(spark.read.parquet(fact))
        val aggs = c.map(_._2)
        val grouped =
          if (g.isEmpty) base.agg(aggs.head, aggs.tail: _*)
          else base.groupBy(g.map(col): _*).agg(aggs.head, aggs.tail: _*)
        grouped
      }, fact, s"flat g=${g.mkString("+")} aggs=${c.map(_._1).mkString("+")} $fLabel")
    }
  }

  test("star sweep: dim/fact groupings x aggregates over the join fire and agree") {
    withFixture { (fact, dim) =>
      val groupings = Seq(Seq("region"), Seq("region", "k2"), Seq("k2"))
      val combos: Seq[Seq[(String, Column)]] = aggMenu.map(Seq(_)) :+ aggMenu
      for {
        g <- groupings
        c <- combos
      } sweepCase(() => {
        val aggs = c.map(_._2)
        spark.read.parquet(fact).join(dim, Seq("k1"))
          .groupBy(g.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }, fact, s"star g=${g.mkString("+")} aggs=${c.map(_._1).mkString("+")}")
    }
  }

  test("rollup/cube sweep: every grouping-set shape fires and agrees") {
    withFixture { (fact, _) =>
      val combos: Seq[Seq[(String, Column)]] = aggMenu.map(Seq(_)) :+ aggMenu
      for (c <- combos) {
        val aggs = c.map(_._2) :+ grouping_id().as("gid")
        sweepCase(() => spark.read.parquet(fact)
          .rollup("k1", "k2").agg(aggs.head, aggs.tail: _*),
          fact, s"rollup aggs=${c.map(_._1).mkString("+")}")
        sweepCase(() => spark.read.parquet(fact)
          .cube("k1", "k2").agg(aggs.head, aggs.tail: _*),
          fact, s"cube aggs=${c.map(_._1).mkString("+")}")
      }
    }
  }
}
