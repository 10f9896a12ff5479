package graft

import org.apache.spark.sql.types.LongType

import graft.io.VersionedTable
import graft.io.VersionedTable.SchemaChange

/** [[VersionedTable.schemaDiff]] — the structural audit between two
  * versions: schema-merging appends surface as `added`, widenColumn as
  * `retyped`, renameColumn as removed+added (the honest physical story),
  * and an unchanged window diffs empty. */
class SchemaDiffSpec extends SparkSuite {
  import spark.implicits._

  test("added, retyped, and renamed columns across a commit window") {
    val path = java.nio.file.Files.createTempDirectory("vt_sd").toString + "/tbl"
    VersionedTable.commitAppend(Seq((1, "a")).toDF("id", "v"), path)
    val v1 = VersionedTable.versions(spark, path).last
    // schema-merging append introduces `extra`
    VersionedTable.commitAppend(Seq((2, "b", 9.5)).toDF("id", "v", "extra"), path)
    // widen id int -> long, then rename v -> label
    VersionedTable.widenColumn(spark, path, "id", LongType)
    VersionedTable.renameColumn(spark, path, "v", "label")
    val v4 = VersionedTable.versions(spark, path).last

    assert(VersionedTable.schemaDiff(spark, path, v1, v4) == Seq(
      SchemaChange("extra", "added", "", "double"),
      SchemaChange("id", "retyped", "int", "bigint"),
      SchemaChange("label", "added", "", "string"),
      SchemaChange("v", "removed", "string", "")))

    // an unchanged window diffs empty; diff to self is empty
    assert(VersionedTable.schemaDiff(spark, path, v4, v4).isEmpty)
    // direction matters: the reverse reads as the inverse story
    val rev = VersionedTable.schemaDiff(spark, path, v4, v1)
    assert(rev.contains(SchemaChange("extra", "removed", "double", "")))
    assert(rev.contains(SchemaChange("id", "retyped", "bigint", "int")))
  }
}
