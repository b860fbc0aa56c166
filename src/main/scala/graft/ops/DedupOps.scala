package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash-groupBy),
  * MinHash+LSH banding, n-gram Jaccard verification, SimHash.
  *
  * Portability rule: every hash a SQL oracle must reproduce is md5 (identical
  * hex in Spark and DuckDB); Spark-only paths (simhash) may use faster
  * hashes. Shingling is word 5-grams over whitespace-split lowercase text.
  *
  * Scale notes: candidate generation is always hash-bucketed (LSH band
  * buckets / rare shingles) so the pairwise-verify join never goes quadratic
  * in the corpus — only within buckets. All joins are equi-joins on bucket
  * keys; AQE handles residual bucket skew.
  */
object DedupOps {
  val NumHashes = 16
  val BandSize = 4 // 4 bands x 4 rows

  /** Exact duplicate groups: fingerprint -> keeper (min id) + group size. */
  def exactDupGroups(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    df.select(col(id), md5(col(text)).as("fp"))
      .groupBy("fp").agg(min(col(id)).as("keeper"), count(lit(1)).as("group_size"))

  /** (id, shingle) pairs: word 5-gram shingles, duplicates preserved. */
  def shingles(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    df.select(col(id), split(trim(lower(col(text))), "\\s+").as("arr"))
      .select(col(id), explode(expr(
        "transform(sequence(1, greatest(size(arr) - 4, 1)), i -> array_join(slice(arr, i, 5), ' '))"))
        .as("shingle"))

  /** MinHash signatures banded for LSH: (id, band, bucket). The j-th hash
    * function is min(md5(shingle || '#' || j)); a band bucket is the md5 of
    * its 4 minhashes concatenated in hash order.
    *
    * Shape: the 16 hash slots are 16 min-aggregates over ONE pass of the
    * shingle stream (map-side partial agg), not a 16x row explode — at
    * corpus scale the shuffle carries one row per doc, not 16 per shingle.
    */
  def minhashBands(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val aggs = (0 until NumHashes).map(j =>
      min(md5(concat(col("shingle"), lit("#"), lit(j.toString)))).as(s"mh$j"))
    val sig = shingles(df, id, text).groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
    val bandStructs = (0 until NumHashes / BandSize).map { b =>
      val mhs = (b * BandSize until (b + 1) * BandSize).map(j => col(s"mh$j"))
      struct(lit(b).as("band"), md5(concat(mhs: _*)).as("bucket"))
    }
    sig.select(col(id), explode(array(bandStructs: _*)).as("bb"))
      .select(col(id), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** LSH candidate pairs (a < b sharing any band bucket) verified with EXACT
    * shingle-set Jaccard >= minJaccard.
    */
  def nearDupPairs(df: DataFrame, minJaccard: Double,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val bands = minhashBands(df, id, text)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as("a"), col(s"y.$id").as("b")).distinct()
    verifyJaccard(df, cand, minJaccard, id, text)
  }

  /** n-gram Jaccard near-dup: candidates share a RARE shingle (df <= maxShingleDf —
    * the standard cap that keeps the self-join off stopword-scale shingles),
    * then exact Jaccard. No minhash approximation anywhere.
    */
  def ngramJaccardPairs(df: DataFrame, minJaccard: Double, maxShingleDf: Long = 20,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val sh = shingles(df, id, text).distinct()
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("sdf"))
      .where(col("sdf") > 1 && col("sdf") <= maxShingleDf)
    val shRare = sh.join(rare.select("shingle"), Seq("shingle"))
    val cand = shRare.as("x").join(shRare.as("y"),
        col("x.shingle") === col("y.shingle") && col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as("a"), col(s"y.$id").as("b")).distinct()
    verifyJaccard(df, cand, minJaccard, id, text)
  }

  /** Exact |A ∩ B| / |A ∪ B| over distinct shingle sets for candidate pairs.
    *
    * Shape: each doc's distinct shingle set is aggregated ONCE into a sorted
    * array of md5 fingerprints (fixed 32 chars — bounds the row width; 128-bit
    * fingerprints make collisions impossible in practice, so set Jaccard over
    * fingerprints equals set Jaccard over shingles). Each candidate pair then
    * intersects two arrays in ONE narrow pass — the verify cost is linear in
    * the candidate count, never a second shingle-equality join over the
    * corpus (which re-scanned + re-shuffled the whole shingle stream twice
    * and was the round-1 bench hot spot at 46% of total wall).
    */
  private def verifyJaccard(df: DataFrame, cand: DataFrame, minJaccard: Double,
      id: String, text: String): DataFrame = {
    val sets = shingles(df, id, text).distinct()
      .groupBy(col(id)).agg(sort_array(collect_list(md5(col("shingle")))).as("set"))
    cand
      .join(sets.select(col(id).as("a"), col("set").as("sa")), Seq("a"))
      .join(sets.select(col(id).as("b"), col("set").as("sb")), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")), 4))
      .where(col("jaccard") >= minJaccard)
      .select("a", "b", "jaccard")
  }

  /** 64-bit SimHash over the analyzer term stream, tf-weighted. Bits come
    * from the first 16 hex chars of md5(term). Pure narrow map (no shuffle);
    * Spark-only (bit-twiddling has no compact SQL twin — driver does the
    * rows-only check).
    */
  def simhash(spark: SparkSession, df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(text)).as[(Long, String)].map { case (docId, t) =>
      val (m, _) = graft.tokenize.CodeTokenizer.tfMap(t)
      val acc = new Array[Long](64)
      m.foreach { case (term, tf) =>
        val h = java.lang.Long.parseUnsignedLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(term).substring(0, 16), 16)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += tf else acc(b) -= tf
          b += 1
        }
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
      (docId, f"$sig%016x")
    }.toDF(id, "simhash")
  }

  /** Hamming-close SimHash pairs via 4x16-bit band blocking (exactly the
    * LSH trick at the bit level): pairs sharing any 16-bit quarter get their
    * full Hamming distance computed; keep those <= maxDist.
    */
  def simhashNearPairs(spark: SparkSession, df: DataFrame, maxDist: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val sig = simhash(spark, df, id, text)
    val banded = sig.select(col(id), col("simhash"),
      explode(expr("transform(sequence(0, 3), q -> struct(q as q, substring(simhash, q*4 + 1, 4) as piece))")).as("bp"))
      .select(col(id), col("simhash"), col("bp.q"), col("bp.piece"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.q") === col("y.q") && col("x.piece") === col("y.piece") &&
          col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as("a"), col(s"y.$id").as("b"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb")).distinct()
    // Hamming distance piecewise over 16-bit quarters: conv of a 4-hex-char
    // piece always fits an int, so ANSI-mode casts never overflow (a full
    // 64-bit conv of e.g. "ffff..." would).
    cand.withColumn("dist",
        expr("""aggregate(sequence(0, 3), 0, (acc, q) ->
          acc + bit_count(cast(conv(substring(ha, q*4 + 1, 4), 16, 10) as int) ^
                          cast(conv(substring(hb, q*4 + 1, 4), 16, 10) as int)))"""))
      .where(col("dist") <= maxDist)
      .select("a", "b", "dist")
  }

  /** Near-dup CLUSTERING — the step every dedup pipeline runs after pair
    * generation: connected components over the (a, b) near-dup pair graph,
    * each doc labeled with its component's MINIMUM doc id (`cluster`) and
    * the canonical keeper flagged (`canonical` = doc == cluster min — the
    * deterministic survivor-selection rule; a quality-ranked keeper swaps
    * one orderBy). Min-label propagation to fixpoint: labels start at the
    * node id, each round takes min(own, neighbors') over ONE exchange
    * (map-side-combined min per node), stop when no label changes. Rounds
    * are bounded by the component DIAMETER — near-dup components are
    * band-join cliques-ish, so 2-4 rounds in practice; the iteration cap
    * makes a pathological chain loud instead of silent. This is the
    * standard iterative-join CC formulation (large-star/small-star's
    * simple core) — every round is embarrassingly parallel, driver sees
    * ONE convergence count per round. Output covers docs that appear in
    * at least one pair (singletons are their own trivial cluster —
    * callers union them back if they want full coverage).
    */
  /** Benchmark-contamination check — the decontamination step every
    * training-data pipeline runs before a model ships: corpus docs that
    * share at least one word-5-gram shingle with the benchmark/eval set
    * (`benchPred` marks benchmark member rows), reported as
    * (doc_id, n_shared) with n_shared = DISTINCT shared shingles.
    * Benchmark-internal overlap is not contamination and is excluded.
    *
    * Plan shape — the real-pipeline economics: the benchmark side is
    * eval-suite-sized (thousands of docs, millions of shingles — fixed,
    * tiny vs the corpus), so its distinct-shingle set BROADCASTS and the
    * corpus side joins it inside the scan stage; the only exchange is the
    * per-doc count aggregate over the (rare) matching shingles. At 100 TB
    * the same shape holds with the broadcast swapped for a Bloom filter of
    * the benchmark shingles pushed into the scan (false positives re-checked
    * by the exact join) — the corpus is never shuffled by shingle.
    */
  def contamination(df: DataFrame, benchPred: Column,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val isBench = coalesce(benchPred, lit(false)) // NULL pred = not benchmark
    val benchSh = shingles(df.where(isBench), id, text).select("shingle").distinct()
    shingles(df.where(!isBench), id, text)
      .dropDuplicates(id, "shingle")
      .join(broadcast(benchSh), Seq("shingle"))
      .groupBy(col(id)).agg(count(lit(1)).as("n_shared"))
  }

  def nearDupClusters(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    // eager localCheckpoint TRUNCATES LINEAGE each round — without it the
    // iterative self-join's plan tree doubles per round (the classic
    // iterative-algorithm analyzer blowup: the pair-generation chain gets
    // re-embedded at every step and planning alone exhausts the heap). At
    // cluster scale swap for a reliable checkpoint dir; the algorithm is
    // unchanged.
    val edges = pairs.select(col("a").as("x"), col("b").as("y"))
      .unionByName(pairs.select(col("b").as("x"), col("a").as("y")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("x").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbr = edges.join(labels.withColumnRenamed("id", "y"), Seq("y"))
        .groupBy(col("x").as("id")).agg(min("label").as("nbr_min"))
      val next = labels.join(nbr, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .where(col("label") < col("old")).limit(1).count()
      labels = next
      converged = changed == 0L
      round += 1
    }
    require(converged, s"label propagation did not converge in $maxRounds rounds")
    labels.select(col("id").as("doc_id"), col("label").as("cluster"),
        (col("id") === col("label")).as("canonical"))
      .orderBy("cluster", "doc_id")
  }
}
