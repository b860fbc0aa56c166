package graft.fixtures

/** The fixed, versioned query set (FIXTURES.md §2): 20 queries, k=10.
  * Coverage: 1-term rare/mid/stopword-scale, rare+common mixes (Block-Max
  * WAND's sweet spot), 3-term, duplicate-term collapse, absent term (empty
  * result), all-stopword worst case, case folding. Terms are drawn from the
  * CorpusGen vocabulary so df shapes are known.
  */
object QuerySet {
  val K = 10

  val all: Vector[String] = Vector(
    "def",                                // 1-term, stopword-scale
    "return",                             // 1-term, stopword-scale
    "buf_buf",                            // 1-term, mid-frequency head
    "idx_buf",                            // 1-term, mid
    "z100_id",                            // 1-term, rare
    "z101_id",                            // 1-term, rare
    "def z100_id",                        // stopword + rare (WAND sweet spot)
    "val buf_buf",                        // stopword + mid
    "class idx_buf z102_id",              // 3-term mix
    "import export require",              // 3 stopword-scale
    "join join",                          // duplicate terms collapse to one
    "qqqzzznotfound",                     // absent term -> empty result
    "def val class",                      // all-stopword worst case
    "buf_buf idx_buf",                    // 2 mid
    "z103_id z104_id",                    // 2 rare
    "fn mut impl",                        // 3 stopword-scale (rust-flavored)
    "parse_load save_exec",               // 2 tail-mid
    "Def VAL",                            // case folding
    "z105_id def val return import",      // rare + 4 stopwords
    "doc_repo span_page"                  // 2 tail-mid
  )
}
