package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Sinks
import graft.pipeline.PowerPipeline

/** Golden tests for the reference-parity pipeline on a synthetic
  * household-power CSV with planted anomalies (FIXTURES.md §2):
  * `?` cells, an unparsable date, a duplicated timestamp, a 2-minute gap.
  */
class PipelineSpec extends SparkSuite {

  private lazy val csvPath: String = {
    val dir = Files.createTempDirectory("power").toFile
    val f = new java.io.File(dir, "power.csv")
    val header = "Date;Time;Global_active_power;Global_reactive_power;Voltage;" +
      "Global_intensity;Sub_metering_1;Sub_metering_2;Sub_metering_3"
    val rows = scala.collection.mutable.ArrayBuffer[String]()
    // day 1: minutes 00:00..01:59 continuous except a 2-min gap at 00:30
    for (h <- 0 to 1; m <- 0 to 59) {
      if (!(h == 0 && m == 30)) // gap: 00:29 -> 00:31
        rows += f"1/1/2020;$h:$m%02d:00;1.5;0.1;240.0;5.0;1.0;2.0;3.0"
    }
    rows += "1/1/2020;0:10:00;9.9;0.9;241.0;6.0;1.0;2.0;3.0"   // duplicate ts
    rows += "31/2/2020;0:00:00;1.0;0.1;240.0;5.0;1.0;2.0;3.0"  // bad date
    rows += "2/1/2020;0:00:00;?;0.1;240.0;5.0;1.0;2.0;3.0"     // missing one
    rows += "2/1/2020;0:01:00;?;?;?;?;?;?;?"                   // missing all
    Files.write(f.toPath, (header +: rows.toSeq).mkString("\n").getBytes)
    f.getAbsolutePath
  }

  private lazy val prepared =
    PowerPipeline.castNumerics(
      PowerPipeline.addDateTime(
        PowerPipeline.replaceMissing(PowerPipeline.loadRaw(spark, csvPath))))

  test("beforeStats counts the planted anomalies exactly") {
    val st = PowerPipeline.beforeStats(prepared)
    assert(st.total == 123)              // 119 day1 + dup + bad date + 2 day2
    assert(st.badDateTime == 1)          // 31/2/2020
    assert(st.missingAny == 2)           // '?' rows
    assert(st.missingAll == 1)
    assert(st.duplicateTimestamps == 1)  // one extra row at 00:10
    // gaps: 00:29->00:31 (within day) + day1 01:59 -> day2 00:00 (cross-day);
    // the duplicate at 00:10 also breaks cadence (00:10->00:10 = 0s, then 00:10->00:11)
    assert(st.gapRows >= 2)
  }

  test("cleaning drops invalid rows, dedup keeps one per timestamp") {
    val cleaned = PowerPipeline.dropDups(PowerPipeline.dropInvalid(prepared))
    // 119 valid day1 rows + dup (distinct measurements -> kept) + 0 valid day2
    // bad date dropped, '?' rows dropped; dup row differs in values so it
    // survives dropDuplicates on (DateTime ++ numCols) -> count = 120
    assert(cleaned.count() == 120)
    assert(cleaned.filter(col("DateTime").isNull).count() == 0)
  }

  test("hourly aggregation computes exact minute averages") {
    val cleaned = PowerPipeline.dropDups(PowerPipeline.dropInvalid(prepared))
      .dropDuplicates("DateTime") // strict parity with hourly math below
    val hourly = PowerPipeline.aggregateHourly(cleaned).collect()
    assert(hourly.length == 2)
    val h0 = hourly(0)
    // hour 0: 59 rows at 1.5 (one minute missing from the gap)
    assert(math.abs(h0.getAs[Double]("avg_Global_active_power") - 1.5) < 1e-9)
    assert(math.abs(h0.getAs[Double]("avg_Voltage") - 240.0) < 1e-9)
  }

  test("transform: OHE rows sum to 1 per family, scaled cols in [0,1]") {
    val out = PowerPipeline.run(spark, csvPath)
    val dowSum = (1 to 7).map(i => col(s"dow_$i")).reduce(_ + _)
    val monthSum = (1 to 12).map(i => col(s"month_$i")).reduce(_ + _)
    val checked = out.select(
      (dowSum === 1.0).as("dow_ok"),
      (monthSum === 1.0).as("month_ok"),
      PowerPipeline.scaledCols
        .map(c => col(s"${c}_scaled").between(0.0, 1.0))
        .reduce(_ && _).as("scaled_ok"))
    checked.collect().foreach { r =>
      assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    }
    assert(out.columns.contains("total_sub_metering"))
  }

  test("single-file CSV sink writes exactly one readable file") {
    implicit val s = spark
    val outPath = Files.createTempDirectory("sink").resolve("out.csv").toString
    val hourly = PowerPipeline.run(spark, csvPath)
    Sinks.singleFileCsv(hourly.select("hour_of_day", "total_sub_metering"), outPath)
    val f = new java.io.File(outPath)
    assert(f.isFile)
    val back = spark.read.option("header", "true").csv(outPath)
    assert(back.count() == hourly.count())
  }

  test("IQR outlier report flags planted extremes") {
    import spark.implicits._
    // 100 values at ~1.0 plus two planted extremes
    val df = ((1 to 100).map(i => 1.0 + i * 0.001) ++ Seq(50.0, -50.0))
      .toDF("Global_active_power")
    val rep = PowerPipeline.iqrOutliers(df, "Global_active_power")
    assert(rep.outliers == 2)
    assert(rep.lower > -50.0 && rep.upper < 50.0)
    assert(rep.q1 >= 1.0 && rep.q3 <= 1.2)
  }

  test("sampling is reproducible with a fixed seed") {
    val hourly = PowerPipeline.aggregateHourly(
      PowerPipeline.dropDups(PowerPipeline.dropInvalid(prepared)))
    val a = PowerPipeline.sampleHours(hourly).collect().toSeq
    val b = PowerPipeline.sampleHours(hourly).collect().toSeq
    assert(a == b)
  }
}
