package graft

import graft.fixtures.{CorpusGen, QuerySet}
import graft.index.{IndexConfig, InvertedIndex}
import graft.query.IndexReader
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.json:2/14; BASELINE.md): the rule's
  * N -> 4N executor criterion cannot use a real cluster in this sandbox, so
  * the SAME job (identical input, identical IndexConfig.partitions, hence
  * identical task graph and byte-identical outputs) runs at local[8] and
  * local[32]; we report build + query throughput at both and the efficiency
  * (thr_32 / thr_8) / 4.
  *
  * Usage: runMain graft.Scaling [nDocs] [cpusA] [cpusB]
  * Prints one JSON line.
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(100000L)
    val cpusA = args.lift(1).map(_.toInt).getOrElse(8)
    val cpusB = args.lift(2).map(_.toInt).getOrElse(32)
    val partitions = 4 * math.max(cpusA, cpusB) // fixed => same task graph at both levels

    final case class Level(cpus: Int, buildSec: Double, buildDocsPerSec: Double,
        qSec: Double, qps: Double, topkFingerprint: String)

    val levels = Seq(cpusA, cpusB).map { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"graft-scaling-$cpus")
        .config("spark.sql.shuffle.partitions", partitions.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val dir = s"/tmp/graft_scale_$cpus"
      graft.io.Tables.delete(spark, "/tmp", s"graft_scale_$cpus")

      val corpus = CorpusGen.dataset(spark, n, partitions)
      val t0 = System.nanoTime()
      InvertedIndex.build(spark, corpus, dir, IndexConfig(partitions = partitions), s"scale$cpus")
      val buildSec = (System.nanoTime() - t0) / 1e9

      val reader = new IndexReader(spark, dir)
      QuerySet.all.foreach(q => reader.searchBmw(q, QuerySet.K)) // warm
      val rounds = 3
      val tq = System.nanoTime()
      var fp = 0L
      for (_ <- 1 to rounds; q <- QuerySet.all)
        reader.searchBmw(q, QuerySet.K).foreach(h => fp = fp * 31 + h.docId)
      val qSec = (System.nanoTime() - tq) / 1e9
      spark.stop()
      Level(cpus, buildSec, n / buildSec, qSec, rounds * QuerySet.all.size / qSec, fp.toHexString)
    }

    val a = levels.head
    val b = levels.last
    val buildEff = (b.buildDocsPerSec / a.buildDocsPerSec) / (b.cpus.toDouble / a.cpus)
    val queryEff = (b.qps / a.qps) / (b.cpus.toDouble / a.cpus)
    val identical = a.topkFingerprint == b.topkFingerprint
    def lvlJson(l: Level) =
      s"""{"cpus":${l.cpus},"build_sec":${l.buildSec},"build_docs_per_sec":${l.buildDocsPerSec},"query_sec":${l.qSec},"qps":${l.qps}}"""
    println(s"""{"metric":"scaling","n_docs":$n,"partitions":$partitions,""" +
      s""""levels":[${levels.map(lvlJson).mkString(",")}],""" +
      s""""build_efficiency":$buildEff,"query_efficiency":$queryEff,"topk_identical_across_levels":$identical}""")
  }
}
