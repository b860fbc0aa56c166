package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, over any
  * (id, text) table. All pure `org.apache.spark.sql.functions` compositions —
  * whole-stage-codegen'd, no UDFs — with exact ANSI-SQL twins (DuckDB) so the
  * driver oracle can verify them (SparkEntry.oracleSql).
  *
  * The tokenization here is the SAME pinned analyzer as the engine
  * (graft.tokenize.CodeTokenizer): lower -> split [^a-z0-9_]+ -> drop empty
  * -> truncate 64.
  */
object TextOps {
  val TokenSep = "[^a-z0-9_]+"

  /** UDTF-style 1 row -> n rows split (SURVEY.md §2.2 A12 relational form). */
  def docTerms(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    df.select(col(id), explode(split(lower(col(text)), TokenSep)).as("term"))
      .where(col("term") =!= "")
      .withColumn("term", substring(col("term"), 1, 64))

  /** Per-(doc, term) frequency — the relational SPIMI invert step. */
  def docTermTf(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docTerms(df, id, text).groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))

  /** Corpus term statistics: exact df/cf per term (SURVEY.md §2.3 B11). */
  def termStats(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docTermTf(df, id, text).groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))

  /** Token counting: whitespace tokens, analyzer tokens (total + distinct),
    * and a BPE-ish regex token count (letters runs / digit runs / single
    * punctuation marks).
    */
  def tokenCounts(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val perDoc = docTerms(df, id, text).groupBy(col(id))
      .agg(count(lit(1)).as("n_terms"), countDistinct(col("term")).as("n_distinct_terms"))
    df.select(col(id),
        size(split(trim(lower(col(text))), "\\s+")).as("n_ws_tokens"),
        size(expr(s"regexp_extract_all(lower($text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).as("n_bpe_tokens"))
      .join(perDoc, Seq(id), "left")
      .na.fill(0L, Seq("n_terms", "n_distinct_terms"))
  }

  /** Document fingerprint: hash of the whitespace-normalized lowercase text.
    * md5 so the fingerprint is engine-portable (DuckDB md5 == Spark md5).
    */
  def fingerprint(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    df.select(col(id), md5(regexp_replace(lower(col(text)), "\\s+", " ")).as("fp"))

  val EnStop = Seq("the", "a", "and", "is", "to", "of", "in")

  /** Quality scoring: exact integer counts + a rounded ratio (length, alpha /
    * digit / space counts, stopword tokens, alpha ratio).
    */
  def quality(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val perDoc = docTerms(df, id, text).groupBy(col(id))
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("term").isin(EnStop: _*), 1L).otherwise(0L)).as("stop_cnt"))
    df.select(col(id),
        length(col(text)).as("n_chars"),
        length(regexp_replace(col(text), "[^a-zA-Z]", "")).as("n_alpha"),
        length(regexp_replace(col(text), "[^0-9]", "")).as("n_digit"),
        length(regexp_replace(col(text), "[^ ]", "")).as("n_space"))
      .join(perDoc, Seq(id), "left")
      .na.fill(0L, Seq("n_terms", "stop_cnt"))
      .withColumn("alpha_ratio", round(col("n_alpha").cast("double") / col("n_chars"), 4))
      .withColumn("stop_ratio", round(col("stop_cnt").cast("double") / greatest(col("n_terms"), lit(1L)), 4))
  }

  /** Repetition quality signal (the Gopher-rules family's "fraction of
    * duplicate n-grams" filter — the strongest single predictor of
    * boilerplate/spam in web-scale training corpora): per doc, the fraction
    * of word `n`-grams that are repeats of an earlier one,
    * `1 - distinct/total` over the whitespace-token n-gram stream (the same
    * token stream the shingle/dedup family uses). Docs with fewer than `n`
    * tokens emit no row (no n-gram exists — Gopher leaves them to the
    * length filter). Plan shape: a pure NARROW map — the n-gram list, its
    * size and its distinct size are all array built-ins evaluated inside
    * one whole-stage-codegen projection; no explode, no shuffle, nothing
    * leaves the row. At 100 TB this is the ideal operator: corpus scan in,
    * one double per doc out. Float protocol: `1 - cast(distinct as double)
    * / total` rounded 4 dp, spelled identically in the twin.
    */
  def repetition(df: DataFrame, id: String = "doc_id", text: String = "text",
      n: Int = 3): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    df.select(col(id), split(trim(lower(col(text))), "\\s+").as("arr"))
      .where(size(col("arr")) >= n)
      .select(col(id), expr(
        s"transform(sequence(1, size(arr) - ${n - 1}), i -> array_join(slice(arr, i, $n), ' '))")
        .as("grams"))
      .select(col(id), size(col("grams")).as("n_grams"),
        round(lit(1.0) - size(array_distinct(col("grams"))).cast("double") / size(col("grams")), 4)
          .as("dup_frac"))
  }

  /** Language-ID heuristic: non-ASCII ratio -> zh; else argmax of per-language
    * stopword hits with a fixed tie order (en > de > es > fr). Deterministic
    * and SQL-twinnable; a real pipeline would swap in a trained model here.
    */
  val LangStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "is", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "una", "y", "que", "por"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"))

  def langId(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val terms = docTerms(df, id, text)
    val counts = LangStops.foldLeft(terms.groupBy(col(id)).agg(count(lit(1)).as("n_tok"))) {
      case (acc, (lang, stops)) =>
        val c = terms.where(col("term").isin(stops: _*))
          .groupBy(col(id)).agg(count(lit(1)).as(s"cnt_$lang"))
        acc.join(c, Seq(id), "left").na.fill(0L, Seq(s"cnt_$lang"))
    }
    val base = df.select(col(id),
      (length(col(text)) - length(regexp_replace(col(text), "[^ -~]", ""))).as("n_nonascii"),
      length(col(text)).as("n_chars"))
    base.join(counts, Seq(id), "left")
      .na.fill(0L, Seq("n_tok") ++ LangStops.map("cnt_" + _._1))
      .withColumn("lang_pred",
        when(col("n_nonascii") * 10 > col("n_chars") * 3, lit("zh"))
          .when(col("cnt_en") >= col("cnt_de") && col("cnt_en") >= col("cnt_es") && col("cnt_en") >= col("cnt_fr"), lit("en"))
          .when(col("cnt_de") >= col("cnt_es") && col("cnt_de") >= col("cnt_fr"), lit("de"))
          .when(col("cnt_es") >= col("cnt_fr"), lit("es"))
          .otherwise(lit("fr")))
      .select(col(id), col("lang_pred"))
  }
}
