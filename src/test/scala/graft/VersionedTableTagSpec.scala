package graft

import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Named tags ([[VersionedTable.setTag]]): time travel by name, atomic
  * create semantics, and the retention contract — vacuum must never age
  * out a tagged version, and deleting the tag releases the pin. */
class VersionedTableTagSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("vt_tag").toString + "/tbl"

  test("tag by name: set, read, table, explicit version, listing") {
    val path = fresh()
    VersionedTable.commitAppend(Seq((1L, "a")).toDF("id", "v"), path)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("id", "v"), path)
    val v1 = VersionedTable.versions(spark, path).head
    assert(VersionedTable.setTag(spark, path, "baseline", Some(v1)) == v1)
    assert(VersionedTable.setTag(spark, path, "latest-rel") ==
      VersionedTable.versions(spark, path).last)
    assert(VersionedTable.tags(spark, path) ==
      Map("baseline" -> v1, "latest-rel" -> VersionedTable.versions(spark, path).last))
    assert(VersionedTable.readTag(spark, path, "baseline")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(VersionedTable.tableTag(spark, path, "latest-rel").count() == 2)
    intercept[IllegalArgumentException](VersionedTable.readTag(spark, path, "nope"))
    intercept[IllegalArgumentException](
      VersionedTable.setTag(spark, path, "bad name with spaces"))
  }

  test("re-pointing requires overwrite; duplicate create fails loudly") {
    val path = fresh()
    VersionedTable.commitAppend(Seq((1L, "a")).toDF("id", "v"), path)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("id", "v"), path)
    val Seq(v1, v2) = VersionedTable.versions(spark, path).take(2)
    VersionedTable.setTag(spark, path, "prod", Some(v1))
    intercept[IllegalStateException](VersionedTable.setTag(spark, path, "prod", Some(v2)))
    assert(VersionedTable.tagVersion(spark, path, "prod") == v1)
    VersionedTable.setTag(spark, path, "prod", Some(v2), overwrite = true)
    assert(VersionedTable.tagVersion(spark, path, "prod") == v2)
    // the re-point staged through a temp file + rename: no temp debris,
    // and the tag stayed continuously present (never delete-then-create)
    val tags = new java.io.File(s"$path/_tags").list().toSeq.sorted
      .filterNot(_.endsWith(".crc")) // hadoop local-fs checksum sidecars
    assert(tags == Seq("prod.json"), s"unexpected _tags contents: $tags")
  }

  test("vacuumDryRun predicts exactly what vacuum removes, touching nothing") {
    val path = fresh()
    (1 to 3).foreach(i =>
      VersionedTable.commitAppend(Seq((i.toLong, s"r$i")).toDF("id", "v"), path))
    // appends carry files forward (nothing to free until history rewrites);
    // the overwrite retires every prior data file
    VersionedTable.commitOverwrite(Seq((9L, "z")).toDF("id", "v"), path)
    val before = VersionedTable.versions(spark, path)
    val (dropV, dropF, bytes) = VersionedTable.vacuumDryRun(spark, path, keepLast = 1)
    assert(dropV == before.take(3))
    assert(dropF.count(_.endsWith(".parquet")) == 3 && bytes > 0,
      s"files=$dropF bytes=$bytes")
    // dry run touched nothing
    assert(VersionedTable.versions(spark, path) == before)
    assert(VersionedTable.read(spark, path, Some(before.head)).count() == 1)
    // the real vacuum removes exactly the predicted set
    val (nv, nf) = VersionedTable.vacuum(spark, path, keepLast = 1)
    assert((nv, nf) == ((dropV.size, dropF.size)))
  }

  test("vacuum pins tagged versions; deleting the tag releases them") {
    val path = fresh()
    (1 to 5).foreach(i =>
      VersionedTable.commitAppend(Seq((i.toLong, s"r$i")).toDF("id", "v"), path))
    val vs = VersionedTable.versions(spark, path)
    val tagged = vs(1) // second-oldest, far outside keepLast = 2
    VersionedTable.setTag(spark, path, "v1.0", Some(tagged))
    VersionedTable.vacuum(spark, path, keepLast = 2)
    // the tagged version survived the retention window...
    assert(VersionedTable.versions(spark, path).contains(tagged))
    assert(VersionedTable.readTag(spark, path, "v1.0").count() == 2)
    // ...while untagged old versions are gone
    assert(!VersionedTable.versions(spark, path).contains(vs.head))
    // release the pin: the version becomes vacuum-eligible again
    VersionedTable.deleteTag(spark, path, "v1.0")
    VersionedTable.vacuum(spark, path, keepLast = 2)
    assert(!VersionedTable.versions(spark, path).contains(tagged))
    assert(VersionedTable.read(spark, path).count() == 5, "HEAD unaffected throughout")
  }
}
