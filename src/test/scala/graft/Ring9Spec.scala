package graft

import graft.io.Tables
import graft.ops.{DedupOps, TextOps}
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.functions._

/** Gates for the ring-9 additions: Gopher-style repetition fraction (brute
  * n-gram recount), benchmark decontamination (constructed shared shingles,
  * benchmark-internal overlap excluded, NULL predicate = not benchmark),
  * _delete_by_query through the staged swap (survivors exact, NULL-pred rows
  * survive, missing target loud), and the reindex row's derived fields
  * (analyzer token count == CodeTokenizer, md5 fingerprint round-trip).
  */
class Ring9Spec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("repetition: brute duplicate-trigram fraction; short docs emit no row") {
    val docs = Seq(
      (1L, "a b c a b c a b c"),          // 7 trigrams, 3 distinct -> 1 - 3/7
      (2L, "x y z w"),                    // all distinct -> 0.0
      (3L, "t t t t t"),                  // 3 trigrams, 1 distinct -> 1 - 1/3
      (4L, "one two"),                    // < 3 tokens -> no row
      (5L, "")                            // empty -> no row
    ).toDF("doc_id", "text")
    val got = TextOps.repetition(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((7, BigDecimal(1.0 - 3.0 / 7).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(2L) == ((2, 0.0)))
    assert(got(3L) == ((3, BigDecimal(1.0 - 1.0 / 3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    intercept[IllegalArgumentException] { TextOps.repetition(docs, n = 0) }
  }

  test("contamination: shared-shingle counts; bench-internal overlap excluded; NULL pred survives") {
    // shingles are word 5-grams; doc 100 is the benchmark member
    val base = "alpha beta gamma delta epsilon" // one shingle, shared
    val docs = Seq(
      (100L, s"$base zeta"),               // benchmark: shingles {base.., ..zeta}
      (1L, s"$base"),                      // shares exactly the base shingle
      (2L, s"unrelated words only here now"),
      (3L, s"prefix $base suffix"),        // contains base + more around it
      (150L, s"$base zeta")                // benchmark too (dup of 100) — excluded
    ).toDF("doc_id", "text")
    val got = DedupOps.contamination(docs, col("doc_id") % 50 === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 3L), s"got $got")
    assert(got(1L) == 1L)
    // doc 3: "prefix alpha beta gamma delta" .. "alpha beta gamma delta epsilon"
    // .. "beta gamma delta epsilon suffix" — only the middle one is benchmark's
    assert(got(3L) == 1L)
    // NULL predicate rows are NOT benchmark and NOT matched against it
    val withNull = Seq((1L, base, null.asInstanceOf[String]), (2L, base, "b"))
      .toDF("doc_id", "text", "tag")
    val got2 = DedupOps.contamination(withNull, col("tag") === "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 1L))
  }

  test("deleteByQuery: survivors exact, NULL-pred rows survive, missing target loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dbq_spec").toString
    val t = Seq((1L, "en"), (2L, "de"), (3L, null.asInstanceOf[String]), (4L, "de"))
      .toDF("id", "lang")
    Tables.write(t, dir, "t")
    Tables.deleteByQuery(spark, dir, "t", col("lang") === "de")
    val left = Tables.read(spark, dir, "t").select("id").as[Long].collect().toSet
    assert(left == Set(1L, 3L)) // the NULL-lang row survives (pred not TRUE)
    intercept[IllegalArgumentException] {
      Tables.deleteByQuery(spark, dir, "absent", col("lang") === "de")
    }
    // idempotent second delete: nothing matches, table unchanged
    Tables.deleteByQuery(spark, dir, "t", col("lang") === "de")
    assert(Tables.read(spark, dir, "t").count() == 2L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("reindex row: n_tokens == CodeTokenizer count, fp == md5, en-only") {
    assume(haveData, s"$sfDir not mounted")
    val got = SparkEntry.queries("a66_reindex")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    val en = src.filter(_._2 == "en")
    assert(got.size == en.length && en.nonEmpty)
    en.foreach { case (id, _, text) =>
      val (fp, n) = got(id)
      assert(n == CodeTokenizer.tokenize(text).length.toLong, s"doc $id token count")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(fp == md, s"doc $id fingerprint")
    }
  }
}
