package graft.fixtures

import java.security.MessageDigest
import org.apache.spark.sql.{Dataset, SparkSession}

/** One row of the authoritative input table (BASELINE.json:15):
  * `code_files(repo, path, commit, lang, content)`.
  */
final case class CodeFile(repo: String, path: String, commit: String, lang: String, content: String)

/** Deterministic synthetic source-code corpus (FIXTURES.md §1).
  *
  * Every row is a pure function of (Seed, rowId) — prefix-stable: the corpus
  * at scale n is a strict prefix of the corpus at any n' > n, so golden
  * results at small scale stay valid as fixtures grow.
  *
  * Term-frequency shape (exercises the skew/salting path, BASELINE.json:6):
  *  - 64 "stopword-scale" language keywords, zipf(s=1.1) head weights;
  *  - 2,000 mid-frequency identifiers, zipf(s=1.1);
  *  - 18,000 rare identifiers, uniform (df 1..5 territory at test scales).
  */
object CorpusGen extends Serializable {
  val Seed = 42L
  val NumRepos = 256
  val Langs: Array[(String, Int)] =
    Array("scala" -> 25, "java" -> 20, "python" -> 20, "go" -> 10, "rust" -> 10, "js" -> 10, "c" -> 5)
  val Exts = Map("scala" -> ".scala", "java" -> ".java", "python" -> ".py",
    "go" -> ".go", "rust" -> ".rs", "js" -> ".js", "c" -> ".c")

  val Keywords: Array[String] = Array(
    "def", "val", "var", "class", "object", "trait", "extends", "import", "package", "return",
    "if", "else", "for", "while", "match", "case", "new", "null", "true", "false",
    "public", "private", "static", "void", "int", "long", "string", "boolean", "final", "throws",
    "function", "const", "let", "async", "await", "export", "require", "module", "this", "super",
    "fn", "mut", "impl", "struct", "enum", "pub", "use", "mod", "self", "type",
    "try", "except", "lambda", "yield", "pass", "none", "elif", "print", "range", "len",
    "break", "continue", "switch", "default")

  private val MidParts = Array(
    "buf", "idx", "han", "dler", "map", "get", "set", "read", "write", "node",
    "tree", "list", "hash", "lock", "pool", "task", "conf", "util", "parse", "load",
    "save", "exec", "plan", "query", "scan", "sort", "join", "agg", "part", "file",
    "path", "meta", "stat", "byte", "char", "line", "text", "term", "doc", "repo",
    "span", "page", "blk", "seg", "pos", "len")

  val MidIds: Array[String] = {
    val p = MidParts.length
    Array.tabulate(2000) { i =>
      val a = MidParts(i % p); val b = MidParts((i / p) % p)
      if (i < p * p) a + "_" + b else a + "_" + b + (i / (p * p)).toString
    }
  }

  val RareIds: Array[String] =
    Array.tabulate(18000)(i => "z" + java.lang.Long.toString(i.toLong + 1296, 36) + "_id")

  /** Cumulative zipf(s) distribution over n ranks, for inverse-CDF sampling. */
  private def zipfCdf(n: Int, s: Double): Array[Double] = {
    val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1, s))
    val total = w.sum
    val cdf = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(n - 1) = 1.0
    cdf
  }

  private val KwCdf = zipfCdf(Keywords.length, 1.1)
  private val MidCdf = zipfCdf(MidIds.length, 1.1)
  private val RepoCdf = zipfCdf(NumRepos, 1.0)
  private val LangCdf = {
    val total = Langs.map(_._2).sum.toDouble
    Langs.map(_._2 / total).scanLeft(0.0)(_ + _).tail
  }

  private def pick(cdf: Array[Double], u: Double): Int = {
    val i = java.util.Arrays.binarySearch(cdf, u)
    if (i >= 0) i else math.min(cdf.length - 1, -i - 1)
  }

  /** splitmix64 finalizer — decorrelates per-row RNG seeds. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** Pure per-row generator. */
  def row(rowId: Long): CodeFile = {
    val rng = new java.util.Random(mix(Seed ^ rowId))
    val repo = "repo%04d".format(pick(RepoCdf, rng.nextDouble()))
    val lang = Langs(pick(LangCdf, rng.nextDouble()))._1
    def word(): String = {
      val u = rng.nextDouble()
      if (u < 0.45) Keywords(pick(KwCdf, rng.nextDouble()))
      else if (u < 0.80) MidIds(pick(MidCdf, rng.nextDouble()))
      else RareIds(rng.nextInt(RareIds.length))
    }
    val path = s"src/${word()}/${word()}_$rowId${Exts(lang)}"
    val commit = sha256Hex(s"$Seed:$repo:$path").substring(0, 40)
    val nLines = math.min(400, 5 + (math.log(1.0 - rng.nextDouble()) / math.log(1.0 - 0.05)).toInt)
    val sb = new StringBuilder
    var l = 0
    while (l < nLines) {
      val nTok = 3 + rng.nextInt(10)
      var t = 0
      while (t < nTok) {
        if (t > 0) sb.append(if (rng.nextInt(8) == 0) "(" else " ")
        sb.append(word())
        t += 1
      }
      sb.append('\n')
      l += 1
    }
    CodeFile(repo, path, commit, lang, sb.toString)
  }

  /** Distributed generation: spark.range is evenly split across partitions,
    * each row independent — embarrassingly parallel, no shuffle, and the
    * result is identical for any partition count.
    */
  def dataset(spark: SparkSession, n: Long, partitions: Int): Dataset[CodeFile] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).as[Long].mapPartitions(_.map(row))
  }

  /** Write the fixture as a parquet `code_files` table (idempotent). */
  def writeTable(spark: SparkSession, dir: String, n: Long, partitions: Int): Unit =
    dataset(spark, n, partitions).write.mode("overwrite").parquet(s"$dir/code_files")
}
