package graft.query

import graft.codec.PostingsCodec
import graft.index.{CorpusStats, InvertedIndex, PostingBlock}
import graft.io.Tables
import graft.tokenize.CodeTokenizer
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Query entry points over a built index (SURVEY.md §2.3 B8–B10, §3.3).
  *
  * The `match`-query compile path mirrors ES's two-phase query exactly:
  * tokenize the query with the same analyzer; broadcast the tiny per-term
  * stats (df, idf, maxImpact — the FST lookup); scan ONLY the query terms'
  * postings (predicate pushed to the parquet scan: the postings table is
  * range-partitioned and sorted by term, so file/row-group min-max stats
  * prune everything else); per-bucket scoring (= per-shard); one global
  * TakeOrderedAndProject merge (= coordinator merge).
  */
final class IndexReader(spark: SparkSession, indexDir: String,
    p: Bm25Params = Bm25.Default) extends Serializable {
  import spark.implicits._

  lazy val stats: CorpusStats = {
    InvertedIndex.assertFormatVersion(spark, indexDir)
    InvertedIndex.readStats(spark, indexDir)
  }

  // registered once per reader for BMW skip-evidence (BASELINE.md rule 4)
  val decodedBlocksAcc: LongAccumulator = spark.sparkContext.longAccumulator("graft.bmw.decodedBlocks")
  val skippedBlocksAcc: LongAccumulator = spark.sparkContext.longAccumulator("graft.bmw.skippedBlocks")
  val scoredDocsAcc: LongAccumulator = spark.sparkContext.longAccumulator("graft.bmw.scoredDocs")

  def analyze(query: String): Array[String] =
    CodeTokenizer.tokenize(query).distinct.sorted

  /** Dictionary lookup for the query terms: tiny collect, broadcast by the
    * caller. Terms absent from the corpus drop out here (df = 0 contributes
    * nothing — Lucene BooleanQuery SHOULD semantics).
    */
  def termMeta(qterms: Array[String]): Map[String, BlockMaxWand.TermMeta] = {
    if (qterms.isEmpty) return Map.empty
    Tables.read(spark, indexDir, InvertedIndex.DictTable)
      .where(col("term").isin(qterms.toSeq: _*))
      .select("term", "df", "maxImpact")
      .collect()
      .map { r =>
        val t = r.getString(0)
        t -> BlockMaxWand.TermMeta(t, Bm25.idf(stats.numDocs, r.getLong(1)), r.getDouble(2))
      }.toMap
  }

  private def postingsFor(terms: Seq[String]): Dataset[PostingBlock] =
    Tables.read(spark, indexDir, InvertedIndex.PostingsTable)
      .where(col("term").isin(terms: _*))
      .as[PostingBlock]

  /** Per-posting BM25 contributions of the query terms — (docId, term,
    * idf x tfNorm) rows decoded per block; the shared kernel of the naive
    * DAAT baseline and the distributed rank-all path.
    */
  private def contribs(meta: Map[String, BlockMaxWand.TermMeta]): DataFrame = {
    val metaB = spark.sparkContext.broadcast(meta)
    val avgDl = stats.avgDl
    val pp = p
    postingsFor(meta.keys.toSeq.sorted).flatMap { b =>
      val idf = metaB.value(b.term).idf
      val ids = PostingsCodec.decodeDocIds(b.firstDocId, b.count, b.docDeltas)
      val tfs = PostingsCodec.decodeTfs(b.count, b.tfs)
      val dls = PostingsCodec.decodeDls(b.count, b.dls)
      Iterator.tabulate(b.count)(i =>
        (ids(i), b.term, idf * Bm25.tfNorm(tfs(i).toLong, dls(i).toLong, avgDl, pp)))
    }.toDF("docId", "term", "contrib")
  }

  /** Naive document-at-a-time baseline: decode ALL blocks of the query
    * terms, aggregate per doc (contributions sorted by term before summing —
    * the pinned order), global top-k. The regression target BMW must equal.
    */
  def searchNaive(query: String, k: Int): Array[SearchHit] = {
    val meta = termMeta(analyze(query))
    if (meta.isEmpty) return Array.empty
    contribs(meta).groupByKey(r => r.getLong(0))
      .mapGroups { (d, it) =>
        val s = it.toArray.sortBy(_.getString(1)).foldLeft(0.0)(_ + _.getDouble(2))
        SearchHit(d, s)
      }
      .orderBy(desc("score"), asc("docId")).limit(k)
      .collect()
  }

  /** Distributed Block-Max WAND (SURVEY.md §2.3 B9): query-term blocks are
    * re-bucketed by docId range (a block spanning multiple buckets is
    * replicated and masked — only query-term data moves, never the corpus);
    * each bucket runs exact BMW with a local threshold (= one ES shard);
    * the global merge is Catalyst's TakeOrderedAndProject.
    */
  def searchBmw(query: String, k: Int, nBuckets: Int = 0): Array[SearchHit] = {
    val meta = termMeta(analyze(query))
    if (meta.isEmpty) return Array.empty
    val buckets = if (nBuckets > 0) nBuckets else spark.sessionState.conf.numShufflePartitions
    val w = math.max(1L, (stats.numDocs + buckets - 1) / buckets)
    val metaB = spark.sparkContext.broadcast(meta)
    val avgDl = stats.avgDl
    val pp = p
    val kk = k
    val (decAcc, skipAcc, scoredAcc) = (decodedBlocksAcc, skippedBlocksAcc, scoredDocsAcc)

    postingsFor(meta.keys.toSeq.sorted)
      .flatMap(b => ((b.firstDocId / w) to (b.lastDocId / w)).iterator.map(g => (g, b)))
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val lo = g * w
        val hi = lo + w
        val byTerm = it.map(_._2).toArray.groupBy(_.term)
        val st = BlockMaxWand.BucketStats()
        val hits = BlockMaxWand.scoreBucket(byTerm, metaB.value, lo, hi, kk, avgDl, pp, st)
        decAcc.add(st.decoded); skipAcc.add(st.skipped); scoredAcc.add(st.scoredDocs)
        hits.iterator
      }
      .orderBy(desc("score"), asc("docId")).limit(k)
      .collect()
  }

  /** Batch mode: N queries in ONE Spark job (SURVEY.md §2.3 B9/B10). All
    * queries' terms are fetched in a single dictionary lookup and a single
    * postings scan; every docId bucket runs BMW once per query against its
    * local blocks; per-bucket top-k lists (tiny: buckets x queries x k) are
    * merged on the driver. This amortizes job-scheduling and scan overhead
    * across the whole query set — the shape a 100 TB deployment serves query
    * batches with.
    */
  def searchBmwBatch(queriesIn: Seq[String], k: Int, nBuckets: Int = 0): Map[String, Array[SearchHit]] = {
    val analyzed = queriesIn.map(q => q -> analyze(q))
    val allTerms = analyzed.flatMap(_._2).distinct.sorted.toArray
    val meta = termMeta(allTerms)
    val perQuery: Array[(Int, Array[String])] = analyzed.zipWithIndex
      .map { case ((_, ts), i) => (i, ts.filter(meta.contains)) }
      .filter(_._2.nonEmpty).toArray
    if (perQuery.isEmpty) return queriesIn.map(_ -> Array.empty[SearchHit]).toMap

    val buckets = if (nBuckets > 0) nBuckets else spark.sessionState.conf.numShufflePartitions
    val w = math.max(1L, (stats.numDocs + buckets - 1) / buckets)
    val metaB = spark.sparkContext.broadcast(meta)
    val perQueryB = spark.sparkContext.broadcast(perQuery)
    val avgDl = stats.avgDl
    val pp = p
    val kk = k
    val (decAcc, skipAcc, scoredAcc) = (decodedBlocksAcc, skippedBlocksAcc, scoredDocsAcc)

    val presentTerms = perQuery.flatMap(_._2).distinct.sorted
    val perBucketTops = postingsFor(presentTerms.toSeq)
      .flatMap(b => ((b.firstDocId / w) to (b.lastDocId / w)).iterator.map(g => (g, b)))
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val lo = g * w
        val hi = lo + w
        val byTerm = it.map(_._2).toArray.groupBy(_.term)
          .map { case (t, bs) => t -> bs.sortBy(_.firstDocId) } // sort once per bucket
        val st = BlockMaxWand.BucketStats()
        val cache = new BlockCache() // queries share block decodes
        val out = perQueryB.value.iterator.flatMap { case (qi, terms) =>
          val tb = terms.iterator.flatMap(t => byTerm.get(t).map(t -> _)).toMap
          if (tb.isEmpty) Iterator.empty
          else BlockMaxWand.scoreBucket(tb, metaB.value, lo, hi, kk, avgDl, pp, st, cache)
            .iterator.map(h => (qi, h.docId, h.score))
        }.toArray
        decAcc.add(st.decoded); skipAcc.add(st.skipped); scoredAcc.add(st.scoredDocs)
        out.iterator
      }
    // The shard merge stays DISTRIBUTED: per-bucket top-k lists exchange
    // once more on query id and reduce to the global top-k per query, so
    // the driver receives exactly queries x k rows. (Merging buckets x
    // queries x k rows on the driver was both a scale ceiling — 10^6
    // queries x 10^3 buckets would not fit — and a serial Amdahl term that
    // measurably depressed query scaling efficiency.)
    val merged = perBucketTops
      .groupByKey(_._1)
      .flatMapGroups { (qi, it) =>
        val heap = new TopKHeap(kk)
        it.foreach(t => heap.offer(t._2, t._3))
        heap.results.iterator.map(h => (qi, h.docId, h.score))
      }.collect()

    val byQuery = merged.groupBy(_._1)
    queriesIn.zipWithIndex.map { case (q, i) =>
      val hits = byQuery.getOrElse(i, Array.empty)
        .map(t => SearchHit(t._2, t._3))
        .sortBy(h => (-h.score, h.docId))
      q -> hits
    }.toMap
  }

  /** Distributed rank-all: score EVERY matching document with the result
    * kept distributed end-to-end — a stopword query at corpus scale matches
    * a corpus-sized doc set, so collecting hits to the driver (what a
    * top-k path with k = MaxValue would do) is a scale-killer. Per-block
    * decode is a narrow flatMap; the one shuffle groups contributions by
    * docId; the per-doc sum runs in ascending term order via a sorted in-row
    * fold (the pinned summation order), deterministic with no driver pass.
    * Block-max pruning cannot help when every match must be returned, so
    * this path skips WAND entirely.
    */
  def scoreAllDf(query: String): DataFrame = {
    val meta = termMeta(analyze(query))
    if (meta.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("docId", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType))))
    contribs(meta)
      .groupBy("docId")
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("contrib")))),
        lit(0.0),
        (acc, x) => acc + x.getField("contrib")).as("score"))
  }

  /** DataFrame form for the driver contract (SparkEntry.queries). */
  def searchDf(query: String, k: Int, useBmw: Boolean = true): DataFrame = {
    val hits = if (useBmw) searchBmw(query, k) else searchNaive(query, k)
    spark.createDataFrame(hits.toSeq).toDF("docId", "score")
  }
}
