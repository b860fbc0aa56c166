package graft

import graft.fixtures.{CodeFile, CorpusGen, QuerySet}
import graft.index.{IndexConfig, InvertedIndex}
import graft.query.IndexReader
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.json:2/14; BASELINE.md): the rule's
  * N -> 4N executor criterion cannot use a real cluster in this sandbox, so
  * the SAME job (identical staged input table, identical
  * IndexConfig.partitions => identical task graph and byte-identical outputs)
  * runs at local[N] and local[4N]; we report build + query throughput at both
  * and efficiency (thr_4N / thr_N) / 4. The box has 32 physical cores
  * (no SMT), so 8 -> 32 is genuine 4x hardware.
  *
  * Methodology notes (what made the measurement honest):
  *  - the corpus is STAGED TO PARQUET once, untimed — the build reads a table
  *    like production would, instead of re-running the generator every pass;
  *  - spark.sql.files.maxPartitionBytes is pinned to 4 MB at BOTH levels so
  *    scan parallelism comes from the data, not the 128 MB default (which
  *    would give a ~250 MB corpus only 2 input splits and serialize the
  *    tokenize-heavy stages);
  *  - queries run in BATCH mode (IndexReader.searchBmwBatch): one job per
  *    round for the whole 20-query set, so fixed job-scheduling latency is
  *    amortized and the measurement is scoring work, not scheduler overhead.
  *
  * Usage: runMain graft.Scaling [nDocs] [cpusA] [cpusB]
  * Prints one JSON line.
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
    val cpusA = args.lift(1).map(_.toInt).getOrElse(8)
    val cpusB = args.lift(2).map(_.toInt).getOrElse(32)
    val partitions = 4 * math.max(cpusA, cpusB) // fixed => same task graph at both levels
    val srcDir = s"/tmp/graft_scale_src_$n"

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"graft-scaling-$cpus")
        .config("spark.sql.shuffle.partitions", partitions.toString)
        .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
        // the sandbox's single virtio disk serializes concurrent shuffle
        // spill streams (32 writers regress vs 8); a real cluster has
        // node-local NVMe — tmpfs is the honest local stand-in
        .config("spark.local.dir", "/dev/shm/graft_spark_local")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // ---- untimed: stage the corpus table once (shared by both levels)
    locally {
      val s = session(cpusB)
      if (!graft.io.Tables.exists(s, srcDir, "code_files"))
        CorpusGen.writeTable(s, srcDir, n, partitions)
      s.stop()
    }

    final case class Level(cpus: Int, buildSec: Double, stages: String,
        qSec: Double, rounds: Int, fp: String,
        buildSteal: Double, querySteal: Double)

    /** (user+nice+sys, steal) jiffies from /proc/stat — this is a shared
      * host; steal% during a phase quantifies how much the hypervisor
      * throttled it (observed up to ~30% under load), which is the main
      * noise source in single-box scaling numbers.
      */
    def cpuStat(): (Long, Long) = {
      val f = scala.io.Source.fromFile("/proc/stat")
      try {
        val v = f.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (v(0) + v(1) + v(2), v(7))
      } finally f.close()
    }
    def stealPct(before: (Long, Long), after: (Long, Long)): Double = {
      val busy = after._1 - before._1
      val steal = after._2 - before._2
      if (busy + steal == 0) 0.0 else 100.0 * steal / (busy + steal)
    }

    val cfg = IndexConfig.auto(n, partitions, dfSampleFraction = 0.1)
    val levels = Seq(cpusA, cpusB).map { cpus =>
      val spark = session(cpus)
      import spark.implicits._
      val dir = s"/tmp/graft_scale_$cpus"
      graft.io.Tables.delete(spark, "/tmp", s"graft_scale_$cpus")

      val src = spark.read.parquet(s"$srcDir/code_files").as[CodeFile]
      val cs0 = cpuStat()
      val t0 = System.nanoTime()
      val report = InvertedIndex.build(spark, src, dir, cfg, s"scale$cpus")
      val buildSec = (System.nanoTime() - t0) / 1e9
      val buildSteal = stealPct(cs0, cpuStat())
      val stages = report.results.map(r => f"${r.stage}:${r.wallSec}%.1f").mkString("|")

      val reader = new IndexReader(spark, dir)
      // 100 copies of the 20-query set per batch job: enough scoring work
      // per task that the measurement is WAND throughput, not scheduling.
      // 64 buckets fixed at both levels (same task graph, same results).
      val copies = math.max(2, (20000000L / math.max(1L, n)).toInt)
      val buckets = 64
      val workload = Vector.fill(copies)(QuerySet.all).flatten
      reader.searchBmwBatch(QuerySet.all, QuerySet.K, buckets) // warm
      val rounds = 2
      var fp = 0L
      val cs1 = cpuStat()
      val tq = System.nanoTime()
      for (_ <- 1 to rounds) {
        val res = reader.searchBmwBatch(workload, QuerySet.K, buckets)
        QuerySet.all.foreach(q => res(q).foreach(h => fp = fp * 31 + h.docId))
      }
      val qSec = (System.nanoTime() - tq) / 1e9
      val querySteal = stealPct(cs1, cpuStat())
      spark.stop()
      Level(cpus, buildSec, stages, qSec, rounds * copies, fp.toHexString, buildSteal, querySteal)
    }

    val a = levels.head
    val b = levels.last
    val ratio = b.cpus.toDouble / a.cpus
    val buildEff = (a.buildSec / b.buildSec) / ratio
    val queryEff = (a.qSec / b.qSec) / ratio
    def lvlJson(l: Level) =
      s"""{"cpus":${l.cpus},"build_sec":${l.buildSec},"build_docs_per_sec":${n / l.buildSec},""" +
        s""""stages":"${l.stages}","query_sec":${l.qSec},"qps":${l.rounds * QuerySet.all.size / l.qSec},""" +
        s""""build_steal_pct":${l.buildSteal},"query_steal_pct":${l.querySteal}}"""
    println(s"""{"metric":"scaling","n_docs":$n,"partitions":$partitions,""" +
      s""""levels":[${levels.map(lvlJson).mkString(",")}],""" +
      s""""build_efficiency":$buildEff,"query_efficiency":$queryEff,""" +
      s""""topk_identical_across_levels":${a.fp == b.fp}}""")
  }
}
