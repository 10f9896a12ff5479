package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Salt
import graft.streaming.EventStreams
import graft.streaming.EventStreams.UserEvent

class SaltStateSpec extends SparkSuite {
  import spark.implicits._

  test("salted aggregation equals direct groupBy on skewed data") {
    // 10k rows on one hot key + a tail of 100 keys
    val skewed = (1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))
    val df = skewed.toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(round(sum("v"), 6).as("sum_v"), count(lit(1)).as("cnt"))
      .orderBy("key").collect().toSeq
    val salted = Salt.saltedSumCount(df, "key", "v", buckets = 16)
      .select(col("key"), round(col("sum_v"), 6).as("sum_v"), col("cnt"))
      .orderBy("key").collect().toSeq
    assert(salted == direct)
  }

  test("salted join preserves row multiplicity and matches plain join") {
    val facts = ((1 to 5000).map(_ => 1L) ++ (1 to 50).map(_.toLong + 1))
      .toDF("nk")
    val dim = (1L to 60L).map(k => (k, s"name_$k")).toDF("nk", "name")
    val plain = facts.join(dim, Seq("nk")).groupBy("nk").count().orderBy("nk").collect().toSeq
    val salted = Salt.saltedJoin(facts, dim, "nk", buckets = 8)
      .groupBy("nk").count().orderBy("nk").collect().toSeq
    assert(salted == plain)
  }

  test("transformWithState (RocksDB provider) matches flatMapGroupsWithState semantics") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[UserEvent]
      val q = EventStreams.runningUserTotalsTws(spark, ms.toDS())
        .writeStream.outputMode("append").format("memory").queryName("tws_t").start()
      try {
        ms.addData(UserEvent(1, 10.0), UserEvent(1, 5.0), UserEvent(2, 1.0))
        q.processAllAvailable()
        ms.addData(UserEvent(1, 2.0))
        q.processAllAvailable()
        val rows = spark.table("tws_t")
          .groupBy("user_id")
          .agg(max("n_events").as("n"), max("total_value").as("t"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
        assert(rows(1L) == ((3L, 17.0))) // ValueState carried across batches
        assert(rows(2L) == ((1L, 1.0)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("flatMapGroupsWithState accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[UserEvent]
    val q = EventStreams.runningUserTotals(spark, ms.toDS())
      .writeStream.outputMode("append").format("memory").queryName("state_t").start()
    try {
      ms.addData(UserEvent(1, 10.0), UserEvent(1, 5.0), UserEvent(2, 1.0))
      q.processAllAvailable()
      ms.addData(UserEvent(1, 2.0))
      q.processAllAvailable()
      val rows = spark.table("state_t")
        .groupBy("user_id")
        .agg(max("n_events").as("n"), max("total_value").as("t"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(rows(1L) == ((3L, 17.0))) // state carried across batches
      assert(rows(2L) == ((1L, 1.0)))
    } finally q.stop()
  }
}
