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

  test("A14 write-back: keyed upsert updates matches, appends the rest, is idempotent") {
    val base = "/tmp/graft_upsert_test"
    Tables.delete(spark, "/tmp", "graft_upsert_test")
    Tables.write(Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "v", "n"), base, "t")
    val updates = Seq((2L, "B2", 99), (9L, "new", 1)).toDF("k", "v", "n")
    Tables.upsert(spark, base, "t", updates, Seq("k"))
    def snap() = Tables.read(spark, base, "t").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(snap() == Seq((1L, "a", 10), (2L, "B2", 99), (3L, "c", 30), (9L, "new", 1)))
    Tables.upsert(spark, base, "t", updates, Seq("k")) // retry = same result
    assert(snap() == Seq((1L, "a", 10), (2L, "B2", 99), (3L, "c", 30), (9L, "new", 1)))
    // upsert into a table that does not exist yet = plain create
    Tables.upsert(spark, base, "t2", updates, Seq("k"))
    assert(Tables.read(spark, base, "t2").count() == 2)
  }

  test("versioned upsert: stale drops, fresh lands, new keys insert, max-version wins within the batch") {
    val base = "/tmp/graft_vupsert_test"
    Tables.delete(spark, "/tmp", "graft_vupsert_test")
    Tables.write(Seq((1L, "a", 5L), (2L, "b", 5L), (3L, "c", 5L)).toDF("k", "v", "ver"),
      base, "t")
    val updates = Seq(
      (1L, "A-new", 6L),   // fresh: 6 > 5 — lands
      (2L, "b-stale", 5L), // equal version = stale (strictly-greater pin) — drops
      (3L, "c-old", 4L),   // stale — drops
      (9L, "ins", 1L),     // new key — inserts at any version
      (1L, "A-mid", 3L)    // same key as the v6 row: max-version wins in-batch
    ).toDF("k", "v", "ver")
    Tables.upsertVersioned(spark, base, "t", updates, Seq("k"), "ver")
    def snap() = Tables.read(spark, base, "t").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(snap() == Seq((1L, "A-new", 6L), (2L, "b", 5L), (3L, "c", 5L), (9L, "ins", 1L)),
      s"versioned upsert: ${snap()}")
    // replay of the same batch is a no-op (every surviving row now equal-version)
    Tables.upsertVersioned(spark, base, "t", updates, Seq("k"), "ver")
    assert(snap() == Seq((1L, "A-new", 6L), (2L, "b", 5L), (3L, "c", 5L), (9L, "ins", 1L)))
    // creating a fresh table applies in-batch winners only
    Tables.upsertVersioned(spark, base, "t3", updates, Seq("k"), "ver")
    assert(Tables.read(spark, base, "t3").count() == 4)
    intercept[IllegalArgumentException](
      Tables.upsertVersioned(spark, base, "t", updates, Seq("k"), "nope"))
    intercept[IllegalArgumentException](
      Tables.upsertVersioned(spark, base, "t", updates, Seq("ver"), "ver"))
  }

  test("A14 upsert recovery: kill points roll forward or back, never lose a generation") {
    import org.apache.hadoop.fs.Path
    val base = "/tmp/graft_upsert_crash"
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def snap() = Tables.read(spark, base, "t").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    // Kill point A: between rename(name -> old) and rename(staging -> name):
    // name absent, old = generation G0, staging = COMMITTED generation G1.
    // Recovery must ROLL FORWARD to G1 (G1 was a fully merged next
    // generation — rolling back would silently undo a completed merge).
    Tables.delete(spark, "/tmp", "graft_upsert_crash")
    Tables.write(Seq((1L, "g1"), (2L, "g1")).toDF("k", "v"), base, "t__staging")
    Tables.write(Seq((1L, "g0")).toDF("k", "v"), base, "t__old")
    Tables.upsert(spark, base, "t", Seq((3L, "u")).toDF("k", "v"), Seq("k"))
    assert(snap() == Seq((1L, "g1"), (2L, "g1"), (3L, "u")),
      "committed staging must roll forward before the new merge applies")

    // Kill point B: killed mid-staging-write (no _SUCCESS): must roll BACK
    // to old, not serve the torn staging.
    Tables.delete(spark, "/tmp", "graft_upsert_crash")
    Tables.write(Seq((1L, "torn"), (2L, "torn")).toDF("k", "v"), base, "t__staging")
    fs.delete(new Path(s"$base/t__staging/_SUCCESS"), false)
    Tables.write(Seq((1L, "g0")).toDF("k", "v"), base, "t__old")
    Tables.upsert(spark, base, "t", Seq((3L, "u")).toDF("k", "v"), Seq("k"))
    assert(snap() == Seq((1L, "g0"), (3L, "u")),
      "a torn (uncommitted) staging must be discarded in favor of the old generation")
  }

  test("A6: lifecycle DDL — create generation, alias swap, drop") {
    import graft.io.Lifecycle
    val base = "/tmp/graft_lifecycle_test"
    Tables.delete(spark, "/tmp", "graft_lifecycle_test")
    Tables.write(Seq((1, "v1")).toDF("k", "v"), base, "gen1")
    Tables.write(Seq((1, "v2"), (2, "v2")).toDF("k", "v"), base, "gen2")
    Lifecycle.createOrReplaceTable(spark, "lc_gen1", Tables.tablePath(base, "gen1"))
    Lifecycle.createOrReplaceTable(spark, "lc_gen2", Tables.tablePath(base, "gen2"))
    Lifecycle.aliasSwap(spark, "lc_serving", "lc_gen1")
    assert(spark.sql("SELECT count(*) FROM lc_serving").collect()(0).getLong(0) == 1)
    Lifecycle.aliasSwap(spark, "lc_serving", "lc_gen2") // zero-downtime swap
    assert(spark.sql("SELECT count(*) FROM lc_serving").collect()(0).getLong(0) == 2)
    assert(spark.sql("SELECT v FROM lc_serving WHERE k = 1").collect()(0).getString(0) == "v2")
    Lifecycle.dropAlias(spark, "lc_serving")
    Lifecycle.dropTable(spark, "lc_gen1")
    Lifecycle.dropTable(spark, "lc_gen2")
    assert(!Lifecycle.exists(spark, "lc_gen1"))
    intercept[IllegalArgumentException](Lifecycle.dropTable(spark, "x; DROP TABLE y"))
  }

  test("A2: page-batched scan — deterministic pages, exact sizes, layout-independent") {
    import graft.ops.PageScan
    val df = spark.range(1000).selectExpr("id % 4 AS grp", "id AS key", "id * 2 AS other")
    val paged = PageScan.withPages(df, "grp", Seq("key"), pageSize = 100)
    // 250 rows per group => pages 0,1 full (100) + page 2 (50)
    val stats = PageScan.pageStats(df, "grp", Seq("key"), 100, "key")
      .orderBy("grp", "page").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stats.toSeq == (for (g <- 0L to 3L; p <- 0L to 2L)
      yield (g, p, if (p == 2) 50L else 100L)))
    // same (key -> page) mapping under a different input layout
    val pagesA = paged.select("key", "page").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pagesB = PageScan.withPages(df.repartition(13), "grp", Seq("key"), 100)
      .select("key", "page").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pagesA == pagesB)
    assert(pagesA(0L) == 0L && pagesA(996L) == 2L) // key 996 = grp 0, rank 249
  }

  test("empty corpus: build commits a readable index, every query path returns empty") {
    import graft.index.{IndexConfig, InvertedIndex}
    import graft.query.IndexReader
    val dir = "/tmp/graft_empty_test"
    Tables.delete(spark, "/tmp", "graft_empty_test")
    val rep = InvertedIndex.build(spark, spark.emptyDataset[graft.fixtures.CodeFile], dir,
      IndexConfig(partitions = 4), "empty")
    assert(rep.numDocs == 0)
    // degenerate but legal: every table readable, stats zeroed (sum over
    // zero rows is NULL — must commit as 0, not crash), and a reader over
    // the empty index answers every query shape with empty, never an error
    assert(InvertedIndex.readStats(spark, dir).numDocs == 0)
    assert(Tables.read(spark, dir, InvertedIndex.PostingsTable).count() == 0)
    val r = new IndexReader(spark, dir)
    assert(r.searchBmw("def", 5).isEmpty)
    assert(r.searchNaive("def", 5).isEmpty)
    assert(r.scoreAllDf("def").count() == 0)
    assert(r.matchPhraseDf("def val").count() == 0)
    assert(r.searchBool(Seq("def"), Seq("val"), Seq("class"), 5).isEmpty)
    assert(r.searchBmwBatch(Seq("def", "val"), 5).values.forall(_.isEmpty))
  }
}
