package graft

import graft.operators._

/** Golden tests for tokenizer parity quirks (reference:
  * py_duckdb/similarity_join/tokenizers/__init__.py; verified against DuckDB by
  * the registered tok_* oracle queries — these pin the hand-derivable edges). */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def toks(tok: Tokenizer, values: (Long, String)*): Set[(Long, Long, String)] =
    tok.tokenize(values.toDF("k", "v"), "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("qgrams(3): padded windows, len(value)+q-1 of them, lowercased") {
    // 'ab' -> '##ab##' -> windows at 1..4: ##a #ab ab# b##
    assert(toks(QGramsTokenizer(3), 1L -> "ab") ===
      Set((1L, 4L, "##a"), (1L, 4L, "#ab"), (1L, 4L, "ab#"), (1L, 4L, "b##")))
  }

  test("qgrams(3): empty string still emits the all-# window once (set mode)") {
    // '' -> '####', windows at 1..2 are both '###' -> distinct -> len 1
    assert(toks(QGramsTokenizer(3), 1L -> "") === Set((1L, 1L, "###")))
  }

  test("qgrams(3): bag mode keeps duplicate windows") {
    // 'ababa' -> '##ababa##', 7 windows: ##a #ab aba bab aba ba# a## -> 'aba' twice
    val rows = QGramsTokenizer(3, returnSet = false)
      .tokenize(Seq(1L -> "ababa").toDF("k", "v"), "k", "v").collect()
    assert(rows.length === 7)
    assert(rows.forall(_.getLong(1) == 7L))
    assert(rows.count(_.getString(2) == "aba") === 2)
    val set = toks(QGramsTokenizer(3), 1L -> "ababa")
    assert(set.map(_._3) === Set("##a", "#ab", "aba", "bab", "ba#", "a##"))
    assert(set.forall(_._2 == 6L))
  }

  test("qgrams: NULL value produces no rows") {
    assert(toks(QGramsTokenizer(3), 1L -> null, 2L -> "x").forall(_._1 == 2L))
  }

  test("whitespace: distinct runs BEFORE lowercase (reference quirk)") {
    // 'Whisk whisk' -> distinct over original case keeps both -> len=2, two rows 'whisk'
    val rows = WhitespaceTokenizer()
      .tokenize(Seq(1L -> "Whisk whisk").toDF("k", "v"), "k", "v").collect()
    assert(rows.length === 2)
    assert(rows.forall(r => r.getLong(1) == 2L && r.getString(2) == "whisk"))
  }

  test("whitespace: blank tokens dropped, multi-separator runs collapse") {
    assert(toks(WhitespaceTokenizer(), 1L -> "  a \t b\r\n c  ") ===
      Set((1L, 3L, "a"), (1L, 3L, "b"), (1L, 3L, "c")))
  }

  test("whitespace: whitespace-only value vanishes") {
    assert(toks(WhitespaceTokenizer(), 1L -> " \t ", 2L -> "x").forall(_._1 == 2L))
  }

  test("delimiter: regex metacharacter separators are escaped") {
    assert(toks(DelimiterTokenizer(Set('-', ']')), 1L -> "A-b]C") ===
      Set((1L, 3L, "a"), (1L, 3L, "b"), (1L, 3L, "c")))
  }

  test("delimiter bag mode keeps duplicate tokens with bag cardinality") {
    val rows = WhitespaceTokenizer(returnSet = false)
      .tokenize(Seq(1L -> "a b a").toDF("k", "v"), "k", "v").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getLong(1) == 3L))
  }
}
