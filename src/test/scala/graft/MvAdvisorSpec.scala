package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite
import graft.tools.MvAdvisor

/** MV feedback loop ([[graft.tools.MvAdvisor]]): aggregate workloads
  * observed from plans alone must yield the covering view, and
  * materializing the top recommendation must make those same queries
  * rewrite to the state. */
class MvAdvisorSpec extends SparkSuite {

  private def scanRoots(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten.toSet

  private def withFact(test: String => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("mvadv").toString
    val fact = tmp + "/fact"
    import spark.implicits._
    Seq(
      ("a", "x", 1, 10.0), ("a", "y", 2, 20.0),
      ("b", "x", 3, 30.0), ("b", "y", 4, 40.0))
      .toDF("k1", "k2", "v", "w")
      .write.mode("overwrite").parquet(fact)
    MvAdvisor.clear()
    try test(fact)
    finally {
      MvAdvisor.clear()
      MvRewrite.clear()
      spark.conf.set("spark.graft.mvrewrite.enabled", "false")
    }
  }

  test("hot (keys, value) pair is recommended; key-filter columns join the key set") {
    withFact { fact =>
      val f = () => spark.read.parquet(fact)
      MvAdvisor.record(f().groupBy("k1").agg(sum("v").as("s")))
      MvAdvisor.record(f().groupBy("k1", "k2").agg(avg("v").as("a")))
      MvAdvisor.record(f().filter(col("k2") === "x")
        .groupBy("k1").agg(count(lit(1)).as("n"), min("v").as("mn")))
      val recs = MvAdvisor.recommend()
      assert(recs.nonEmpty, "no recommendation")
      val top = recs.head
      assert(top.valueCol == "v" && top.groupCols == Seq("k1", "k2"),
        top.toString)
      assert(top.covered == 3 && top.observed == 3, top.toString)
    }
  }

  test("non-rewritable shapes (distinct, expression aggs, multi-value) are not recorded") {
    withFact { fact =>
      val f = () => spark.read.parquet(fact)
      MvAdvisor.record(f().groupBy("k1").agg(countDistinct("v").as("nd")))
      MvAdvisor.record(f().groupBy("k1").agg(sum(col("v") * 2).as("s2")))
      MvAdvisor.record(f().groupBy("k1").agg(sum("v").as("s"), sum("w").as("sw")))
      assert(MvAdvisor.recommend().isEmpty, MvAdvisor.report())
    }
  }

  test("observe→recommend→materialize: the workload queries then rewrite to the state") {
    withFact { fact =>
      val f = () => spark.read.parquet(fact)
      def q1() = f().groupBy("k1").agg(sum("v").as("s")).orderBy("k1")
      def q2() = f().groupBy("k1", "k2").agg(avg("v").as("a")).orderBy("k1", "k2")
      MvAdvisor.record(q1()); MvAdvisor.record(q2())
      val state = fact + "_state"
      val mv = MvAdvisor.materializeTop(spark, fact, state)
      assert(mv.isDefined, MvAdvisor.report())
      spark.conf.set("spark.graft.mvrewrite.enabled", "true")
      val before1 = { spark.conf.set("spark.graft.mvrewrite.enabled", "false")
        val r = q1().collect().toSeq
        spark.conf.set("spark.graft.mvrewrite.enabled", "true"); r }
      assert(!scanRoots(q1()).exists(_.endsWith("/fact")), scanRoots(q1()))
      assert(!scanRoots(q2()).exists(_.endsWith("/fact")), scanRoots(q2()))
      assert(q1().collect().toSeq == before1)
    }
  }

  test("star workloads are observed: join keys become view keys, loop closes") {
    withFact { fact =>
      import spark.implicits._
      Seq(("a", "east"), ("b", "west")).toDF("k1", "region")
        .createOrReplaceTempView("adv_dim")
      spark.read.parquet(fact).createOrReplaceTempView("adv_fact")
      try {
        def q() = spark.sql(
          """SELECT region, sum(v) AS s, count(*) AS n
            |FROM adv_fact f JOIN adv_dim d ON f.k1 = d.k1
            |GROUP BY region""".stripMargin)
        MvAdvisor.record(q()); MvAdvisor.record(q())
        val recs = MvAdvisor.recommend()
        assert(recs.nonEmpty, "no star recommendation")
        assert(recs.head.valueCol == "v" && recs.head.groupCols == Seq("k1"),
          recs.head.toString)
        // close the loop: materialize, the star query itself rewrites
        val mv = MvAdvisor.materializeTop(spark, fact, fact + "_star_state")
        assert(mv.isDefined)
        spark.conf.set("spark.graft.mvrewrite.enabled", "true")
        assert(!scanRoots(q()).exists(_.endsWith("/fact")), scanRoots(q()))
        // a star query whose VALUE column is also the join key is not
        // servable and must not be recorded
        MvAdvisor.clear()
        MvAdvisor.record(spark.sql(
          """SELECT region, sum(f.v) AS s
            |FROM adv_fact f JOIN adv_dim d ON f.v = d.k1
            |GROUP BY region""".stripMargin))
        assert(MvAdvisor.recommend().isEmpty, MvAdvisor.report())
      } finally Seq("adv_dim", "adv_fact").foreach(spark.catalog.dropTempView)
    }
  }

  test("minShare gates one-off shapes; count-only workloads still recommend") {
    withFact { fact =>
      val f = () => spark.read.parquet(fact)
      // count-only queries: valueCol is empty, any key column can build
      // the state vector
      MvAdvisor.record(f().groupBy("k1").agg(count(lit(1)).as("n")))
      MvAdvisor.record(f().groupBy("k1", "k2").agg(count(lit(1)).as("n")))
      val recs = MvAdvisor.recommend()
      assert(recs.nonEmpty && recs.head.valueCol.isEmpty && recs.head.covered == 2,
        MvAdvisor.report())
      val mv = MvAdvisor.materializeTop(spark, fact, fact + "_state2")
      assert(mv.isDefined && mv.get.groupCols.sorted == Seq("k1", "k2"))
      // the n_rows-only state serves count(*) and declines value aggs
      spark.conf.set("spark.graft.mvrewrite.enabled", "true")
      def cq() = f().groupBy("k1").agg(count(lit(1)).as("n")).orderBy("k1")
      assert(!scanRoots(cq()).exists(_.endsWith("/fact")), scanRoots(cq()))
      val on = cq().collect().toSeq
      spark.conf.set("spark.graft.mvrewrite.enabled", "false")
      assert(on == cq().collect().toSeq)
      spark.conf.set("spark.graft.mvrewrite.enabled", "true")
      assert(scanRoots(f().groupBy("k1").agg(sum("v").as("s")))
        .exists(_.endsWith("/fact")), "value agg must decline on count-only state")
    }
  }
}
