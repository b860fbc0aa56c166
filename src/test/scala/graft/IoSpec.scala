package graft

import graft.io.Tables
import org.apache.spark.sql.functions._

/** Layer-A source/sink coverage (SURVEY.md §2.1): LDJ (line-delimited JSON,
  * the reference's es2json interchange format) round-trip incl. gzip, and
  * idempotent table overwrite (the bulk-sink replacement, A5/A6).
  */
class IoSpec extends SparkSpec {
  import spark.implicits._

  test("A4: LDJ sink + source round-trip, gzip") {
    val dir = "/tmp/graft_ldj_test"
    Tables.delete(spark, "/tmp", "graft_ldj_test")
    val df = Seq((1L, "alpha", Seq("x", "y")), (2L, "beta", Seq.empty[String]))
      .toDF("id", "name", "tags")
    df.write.option("compression", "gzip").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    val row = back.where(col("id") === 1).collect()(0)
    assert(row.getAs[String]("name") == "alpha")
    assert(row.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("x", "y"))
    // files are actually gzipped lines
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty)
  }

  test("A5/A6: table overwrite is idempotent (bulk-sink retry semantics)") {
    val base = "/tmp/graft_io_test"
    Tables.delete(spark, "/tmp", "graft_io_test")
    Tables.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), base, "t")
    Tables.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), base, "t") // retry = same result
    assert(Tables.read(spark, base, "t").count() == 2)
    assert(Tables.exists(spark, base, "t"))
    Tables.delete(spark, base, "t")
    assert(!Tables.exists(spark, base, "t"))
  }
}
