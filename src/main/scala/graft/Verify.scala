package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // Optional third arg: comma-separated query names (builder-side
    // single-query iteration; the driver always passes exactly two args).
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    def selected(name: String) = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", cpus, "graft-verify")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.quietLogs() // setLogLevel rebuilt levels; re-apply
    new java.io.File(outDir).mkdirs()
    // a FULL run owns the artifact: remove stale query dumps from a
    // reused outDir (e.g. a renamed query's old name) — they would read
    // as undeclared no-oracle queries in the rows-only audit
    if (only.isEmpty) {
      val known = SparkEntry.queries.keySet
      Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.matches("q\\d+.*") && !known(f.getName))
        .foreach { f =>
          System.err.println(s"[verify] removing stale dump ${f.getName}")
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty).foreach(rm); x.delete(); ()
          }
          rm(f)
        }
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the rows-only exemption, self-described: every name here is
    // oracle-less BY DESIGN (sketch/seed/model shapes, spec-gated), so a
    // `no_oracle` correctness entry is auditable from this artifact alone
    Files.writeString(Paths.get(s"$outDir/rows_only.json"),
      SparkEntry.rowsOnly.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
