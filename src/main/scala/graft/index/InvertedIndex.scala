package graft.index

import graft.codec.PostingsCodec
import graft.fixtures.CodeFile
import graft.io.Tables
import graft.lineage.Manifests
import graft.query.{Bm25, Bm25Params}
import graft.tokenize.CodeTokenizer
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One row of the `docs` table: doc registry + exact norms + the sha256
  * per-row invariant (SURVEY.md §1.3; BASELINE.json:15). `content` rides
  * along so downstream stages re-read it locally — parquet column pruning
  * makes metadata-only readers skip it for free (Lucene analog: stored
  * fields live next to norms in the same segment).
  */
final case class DocRow(docId: Long, repo: String, path: String, commit: String,
    lang: String, dl: Int, sha256: String, content: String)

/** One 128-doc compressed postings block with block-max metadata
  * (SURVEY.md §1.3 / §2.3 B5+B6; Lucene analog: one skip-block of the
  * Lucene84 postings format with its impact entry).
  *
  * blockMaxTfn is the max of the document-dependent BM25 factor
  * tf/(tf+k1(1-b+b*dl/avgdl)) within the block; the WAND upper bound for a
  * block is idf(term) * blockMaxTfn, so encode needs no df and the bound
  * stays exact under the final df.
  */
final case class PostingBlock(term: String, blockId: Long, firstDocId: Long, lastDocId: Long,
    count: Int, tfSum: Long, blockMaxTfn: Double,
    docDeltas: Array[Byte], tfs: Array[Byte], dls: Array[Byte])

final case class TermPosting(term: String, salt: Int, docId: Long, tf: Int, dl: Int)

final case class CorpusStats(numDocs: Long, sumDl: Long, avgDl: Double)

final case class IndexConfig(
    partitions: Int = 32,
    blockSize: Int = PostingsCodec.BlockSize,
    /** Terms with df above this are salted (split by docId range) so no
      * single (term) run exceeds one partition's fair share at any scale
      * (BASELINE.json:6/14). MUST be ~docs-per-partition, not a large
      * constant: the postings stage's wall time is the LONGEST (term,salt)
      * run's sort+encode, so an unsalted zipf-head term serializes the whole
      * stage (measured: 'def' at df=190k/1M-threshold held postings scaling
      * to 1.4x on 4x cores). Use [[IndexConfig.auto]].
      */
    heavyDfThreshold: Long = 1L << 20,
    /** Target docs per salted sub-run of a heavy term. */
    saltRunDocs: Long = 1L << 20,
    /** Fraction of docs sampled for heavy-term (salt) detection. Salting
      * needs only approximate df; 1.0 = exact (tests), lower at scale.
      * Deterministic: fixed-seed sample.
      */
    dfSampleFraction: Double = 1.0,
    bm25: Bm25Params = Bm25.Default)

object IndexConfig {
  /** Scale-relative defaults: salt any term whose posting list exceeds one
    * partition's fair share of documents.
    */
  def auto(numDocsEstimate: Long, partitions: Int,
      dfSampleFraction: Double = 1.0): IndexConfig = {
    val share = math.max(1000L, numDocsEstimate / math.max(1, partitions))
    IndexConfig(partitions = partitions, heavyDfThreshold = share,
      saltRunDocs = share, dfSampleFraction = dfSampleFraction)
  }
}

/** The from-scratch SPIMI-style inverted-index build (SURVEY.md §2.3 B2–B6,
  * north_star BASELINE.json:6). Four resumable stages, each committed with a
  * lineage manifest:
  *
  *   registry   code_files -> docs            (deterministic docIds, dl, sha256)
  *   stats      docs       -> corpus_stats    (N, sumDl, avgDl)
  *   postings   docs       -> postings        (salted SPIMI invert + block encode)
  *   dictionary postings   -> dictionary      (exact df/cf + global maxImpact)
  *
  * Shuffle inventory (scale analysis): registry = 1 full-content exchange
  * (hash on key, the only way to get dense deterministic docIds without a
  * global sort); postings = 1 token exchange (repartitionByRange on
  * (term, salt) — the explicit skew-handled exchange the spec demands) plus
  * one small aggregate for heavy-term detection; stats/dictionary are
  * partial-agg reductions. Nothing shuffles content twice.
  */
object InvertedIndex {
  val DocsTable = "docs"
  val StatsTable = "corpus_stats"
  val PostingsTable = "postings"
  val DictTable = "dictionary"

  /** On-disk format version; bump on any postings/codec layout change. A
    * reader refuses indexes of another version instead of misdecoding
    * (codec payloads are tagged binary — an old index read with a new
    * decoder would be silent garbage).
    */
  val FormatVersion = 2

  private def versionPath(indexDir: String) = new org.apache.hadoop.fs.Path(s"$indexDir/FORMAT_VERSION")

  def writeFormatVersion(spark: SparkSession, indexDir: String): Unit = {
    val p = versionPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(FormatVersion.toString.getBytes("UTF-8"))
    out.close()
  }

  def formatVersionOk(spark: SparkSession, indexDir: String): Boolean = {
    val p = versionPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val in = fs.open(p)
      val b = new Array[Byte](16)
      val n = in.read(b)
      in.close()
      n > 0 && new String(b, 0, n, "UTF-8").trim == FormatVersion.toString
    }
  }

  def assertFormatVersion(spark: SparkSession, indexDir: String): Unit =
    require(formatVersionOk(spark, indexDir),
      s"index at $indexDir has a different FORMAT_VERSION than this build ($FormatVersion) — rebuild it")

  /** Deterministic, dense, partition-layout-independent docId assignment
    * (SURVEY.md §7.5): pid = pmod(murmur3(repo,path,commit), P) — the exact
    * partition function `repartition(P, cols)` uses — gives a deterministic
    * partition for every row; pass A counts rows per pid (cheap: key columns
    * only, content pruned at the parquet scan); pass B re-shuffles the full
    * rows the same way, sorts each partition by key, and assigns
    * docId = offset(pid) + localIndex. No RDD, no global sort, no
    * monotonically_increasing_id.
    */
  def buildRegistry(spark: SparkSession, src: Dataset[CodeFile], cfg: IndexConfig): Dataset[DocRow] = {
    import spark.implicits._
    val p = cfg.partitions
    val keyCols = Seq(col("repo"), col("path"), col("commit"))
    val pidExpr = pmod(hash(keyCols: _*), lit(p))

    val counts = new Array[Long](p)
    src.toDF().groupBy(pidExpr.as("pid")).agg(count(lit(1)).as("c"))
      .collect().foreach(r => counts(r.getInt(0)) = r.getLong(1))
    val offsets = new Array[Long](p)
    var acc = 0L
    var i = 0
    while (i < p) { offsets(i) = acc; acc += counts(i); i += 1 }
    val offsetsB = spark.sparkContext.broadcast(offsets)
    val countsB = spark.sparkContext.broadcast(counts)

    src.repartition(p, keyCols: _*)
      .sortWithinPartitions("repo", "path", "commit")
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var nextId = offsetsB.value(pid)
        val expectedEnd = offsetsB.value(pid) + countsB.value(pid)
        new Iterator[DocRow] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) require(nextId == expectedEnd,
              s"docId assignment drift in pid=$pid: got ${nextId - offsetsB.value(pid)} rows, expected ${countsB.value(pid)}")
            h
          }
          def next(): DocRow = {
            val f = it.next()
            val dl = CodeTokenizer.countTokens(f.content)
            val id = nextId
            nextId += 1
            DocRow(id, f.repo, f.path, f.commit, f.lang, dl,
              graft.fixtures.CorpusGen.sha256Hex(f.content), f.content)
          }
        }
      }
  }

  /** SPIMI invert + block encode. The per-document tf map needs no shuffle
    * (a document is one row); the single token exchange is
    * repartitionByRange(term, salt) — heavy terms pre-split by docId RANGE so
    * salted runs concatenate in docId order and need no second merge pass
    * (the blockId encodes (salt, position), monotone in docId).
    */
  def buildPostings(spark: SparkSession, docs: Dataset[DocRow], stats: CorpusStats,
      cfg: IndexConfig): Dataset[PostingBlock] = {
    import spark.implicits._

    def tokens(sampled: Dataset[DocRow]): Dataset[TermPosting] =
      sampled.flatMap { d =>
        val m = CodeTokenizer.tfCount(d.content)
        val dl = m.dl
        m.iterator.map { case (t, tf) => TermPosting(t, 0, d.docId, tf, dl) }
      }

    // ONE sampled token pass feeds the salting decisions. (An earlier design
    // also derived token-mass quantile boundaries here and exchanged on an
    // explicit bucket column; the cumulative sum over the vocabulary ran as a
    // single-partition Window — a serial stage that dies at code-corpus
    // vocabulary sizes. It was never needed: the exchange below hash-
    // partitions on (term, salt), and salting already bounds every
    // (term, salt) group to ~saltRunDocs rows, so uniform hashing balances
    // partitions at any scale with zero extra passes and no driver-side
    // boundary state.)
    val dfSource = if (cfg.dfSampleFraction >= 1.0) docs else docs.sample(withReplacement = false, cfg.dfSampleFraction, 42L)
    val scale = 1.0 / math.min(1.0, cfg.dfSampleFraction)

    val heavy: Map[String, Int] = tokens(dfSource)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * scale > cfg.heavyDfThreshold)
      .collect()
      .map { r =>
        val df = (r.getLong(1) * scale).toLong
        val saltCount = math.max(2L, (df + cfg.saltRunDocs - 1) / cfg.saltRunDocs)
        r.getString(0) -> math.min(saltCount, Int.MaxValue.toLong).toInt
      }.toMap

    val heavyB = spark.sparkContext.broadcast(heavy)
    val numDocs = math.max(1L, stats.numDocs)
    val avgDl = stats.avgDl
    val p = cfg.bm25
    val blockSize = cfg.blockSize

    val salted = tokens(docs).map { t =>
      val s = heavyB.value.get(t.term) match {
        case Some(n) => math.min(n - 1L, t.docId * n / numDocs).toInt // docId-range bucket, monotone
        case None => 0
      }
      t.copy(salt = s)
    }

    // The single token exchange: hash on (term, salt). Every (term, salt)
    // group lands whole in one partition (so the in-partition sort yields
    // complete, contiguous runs for the block encoder) and no group exceeds
    // ~saltRunDocs rows, so expected partition load is uniform. Block
    // contents depend only on the (term, salt) run contents — identical
    // under any partition count (byte-identical-rebuild gate).
    salted
      .repartition(cfg.partitions, $"term", $"salt")
      .sortWithinPartitions($"term", $"salt", $"docId")
      .mapPartitions { it =>
        new Iterator[PostingBlock] {
          private val buf = it.buffered
          private var localBlock = 0L
          private var curTerm: String = null
          private var curSalt = -1
          private val ids = new Array[Long](blockSize)
          private val tfs = new Array[Int](blockSize)
          private val dls = new Array[Int](blockSize)
          def hasNext: Boolean = buf.hasNext
          def next(): PostingBlock = {
            val head = buf.head
            if (head.term != curTerm || head.salt != curSalt) {
              curTerm = head.term; curSalt = head.salt; localBlock = 0L
            }
            var n = 0
            var tfSum = 0L
            var maxTfn = 0.0
            while (n < blockSize && buf.hasNext && buf.head.term == curTerm && buf.head.salt == curSalt) {
              val e = buf.next()
              ids(n) = e.docId; tfs(n) = e.tf; dls(n) = e.dl
              tfSum += e.tf
              val tfn = Bm25.tfNorm(e.tf, e.dl, avgDl, p)
              if (tfn > maxTfn) maxTfn = tfn
              n += 1
            }
            val blockIds = java.util.Arrays.copyOf(ids, n)
            val blockTfs = java.util.Arrays.copyOf(tfs, n)
            val blockDls = java.util.Arrays.copyOf(dls, n)
            val b = PostingBlock(curTerm, (curSalt.toLong << 32) | localBlock,
              blockIds(0), blockIds(n - 1), n, tfSum, maxTfn,
              PostingsCodec.encodeDocIds(blockIds), PostingsCodec.encodeTfs(blockTfs),
              PostingsCodec.encodeDls(blockDls))
            localBlock += 1
            b
          }
        }
      }
  }

  /** Exact df/cf + the global WAND bound, derived from committed postings —
    * no extra pass over the corpus (SURVEY.md §2.3 B11: exact, never
    * approximate, rank-identity forbids it).
    */
  def buildDictionary(spark: SparkSession, postings: DataFrame, stats: CorpusStats): DataFrame = {
    val n = stats.numDocs
    postings.groupBy("term")
      .agg(sum("count").as("df"), sum("tfSum").as("cf"), max("blockMaxTfn").as("maxTfn"))
      .withColumn("idf", log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("maxImpact", col("idf") * col("maxTfn"))
      .select("term", "df", "cf", "maxImpact")
  }

  final case class BuildReport(results: Seq[Manifests.StageResult], numDocs: Long)

  /** Full resumable build. Re-running after a kill skips every stage whose
    * manifest committed (Manifests.runStage).
    */
  def build(spark: SparkSession, src: Dataset[CodeFile], indexDir: String,
      cfg: IndexConfig = IndexConfig(), runId: String = "run"): BuildReport = {
    import spark.implicits._
    val results = Seq.newBuilder[Manifests.StageResult]

    results += Manifests.runStage(spark, indexDir, "registry", runId, Seq(DocsTable)) {
      val docs = buildRegistry(spark, src, cfg)
      Tables.write(docs.toDF(), indexDir, DocsTable)
      Tables.read(spark, indexDir, DocsTable).count()
    }

    results += Manifests.runStage(spark, indexDir, "stats", runId, Seq(StatsTable)) {
      val agg = Tables.read(spark, indexDir, DocsTable)
        .agg(count(lit(1)).as("numDocs"), sum("dl").as("sumDl")).collect()(0)
      val n = agg.getLong(0); val sumDl = agg.getLong(1)
      val stats = CorpusStats(n, sumDl, if (n == 0) 0.0 else sumDl.toDouble / n)
      Tables.write(Seq(stats).toDF(), indexDir, StatsTable)
      n
    }

    val stats = readStats(spark, indexDir)

    results += Manifests.runStage(spark, indexDir, "postings", runId, Seq(PostingsTable)) {
      val docs = Tables.read(spark, indexDir, DocsTable).as[DocRow]
      val blocks = buildPostings(spark, docs, stats, cfg)
      // Global (term, blockId) sort of the COMPACT block rows (~2 orders of
      // magnitude smaller than the token stream) — the "merge into globally
      // sorted postings" step (BASELINE.json:6). Persist so the range
      // partitioner's sampling pass reads encoded blocks, not a recompute of
      // the whole tokenize+shuffle pipeline.
      blocks.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      try {
        Tables.write(
          blocks.repartitionByRange(cfg.partitions, col("term"), col("blockId"))
            .sortWithinPartitions("term", "blockId")
            .toDF(),
          indexDir, PostingsTable)
      } finally blocks.unpersist()
      stats.numDocs
    }

    results += Manifests.runStage(spark, indexDir, "dictionary", runId, Seq(DictTable)) {
      val postings = Tables.read(spark, indexDir, PostingsTable)
      val dict = buildDictionary(spark, postings, stats)
        .repartitionByRange(cfg.partitions, col("term"))
        .sortWithinPartitions("term")
      Tables.write(dict, indexDir, DictTable)
      stats.numDocs
    }

    writeFormatVersion(spark, indexDir)
    BuildReport(results.result(), stats.numDocs)
  }

  def readStats(spark: SparkSession, indexDir: String): CorpusStats = {
    import spark.implicits._
    Tables.read(spark, indexDir, StatsTable).as[CorpusStats].collect()(0)
  }
}
