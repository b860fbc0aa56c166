package graft

import graft.fixtures.CorpusGen

class CorpusGenSpec extends SparkSpec {

  test("row is a pure function of rowId (determinism)") {
    for (i <- Seq(0L, 1L, 17L, 1999L)) assert(CorpusGen.row(i) == CorpusGen.row(i))
  }

  test("keys unique, content non-empty, langs valid at n=2000") {
    import spark.implicits._
    val ds = CorpusGen.dataset(spark, 2000, 8).cache()
    assert(ds.count() == 2000)
    assert(ds.map(f => (f.repo, f.path, f.commit)).distinct().count() == 2000)
    assert(ds.filter(_.content.isEmpty).count() == 0)
    val langs = ds.map(_.lang).distinct().collect().toSet
    assert(langs.subsetOf(CorpusGen.Langs.map(_._1).toSet))
    ds.unpersist()
  }

  test("generation is partition-count independent") {
    import spark.implicits._
    val a = CorpusGen.dataset(spark, 500, 2).collect().sortBy(_.path)
    val b = CorpusGen.dataset(spark, 500, 7).collect().sortBy(_.path)
    assert(a.toSeq == b.toSeq)
  }

  test("term skew present: keyword df >> rare df") {
    import spark.implicits._
    val ds = CorpusGen.dataset(spark, 1000, 8)
    val df = ds.flatMap(f => graft.tokenize.CodeTokenizer.tokenize(f.content).distinct)
      .groupBy("value").count()
    val defDf = df.filter($"value" === "def").collect().headOption.map(_.getLong(1)).getOrElse(0L)
    assert(defDf > 500, s"'def' should be stopword-scale, df=$defDf")
  }
}
