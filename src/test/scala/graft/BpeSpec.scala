package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer tests: golden hand-verified merges (the Sennrich paper's
  * corpus), encode == training-pass-replay equivalence, count invariants,
  * decode round trips, and BPE context-window chunking. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE training corpus: low×5, lower×2, newest×6, widest×3
  private lazy val corpus = Seq(
    (1L, ("low " * 5).trim),
    (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim),
    (4L, ("widest " * 3).trim)).toDF("id", "text")

  test("learn: golden first four merges, hand-verified") {
    // pair counts round 1: (e,s)=9, (s,t</w>)=9 -> lexicographic tie-break
    // picks (e,s); then (es,t</w>)=9; then (l,o)=7; then the 6-way tie
    // (e,w)/(n,e)/(w,est</w>) resolves to (e,w)
    val merges = Bpe.learn(corpus, "text", numMerges = 4)
    assert(merges === Seq(
      ("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")))
  }

  test("learn is deterministic and stops when no pair reaches minPairCount") {
    val a = Bpe.learn(corpus, "text", numMerges = 50)
    val b = Bpe.learn(corpus, "text", numMerges = 50)
    assert(a === b)
    // every word fully merges eventually; merges stop well before 50
    assert(a.length < 50)
    val all = Bpe.learn(corpus, "text", numMerges = 50, minPairCount = 1L)
    assert(all.length >= a.length)
  }

  test("encodeWord == replaying training merge passes in rank order") {
    val merges = Bpe.learn(corpus, "text", numMerges = 10, minPairCount = 1L)
    val ranks = merges.zipWithIndex.toMap
    val rnd = new scala.util.Random(7)
    val alpha = "lowesrntwid"
    for (_ <- 1 to 200) {
      val w = (1 to (1 + rnd.nextInt(9))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val greedy = Bpe.encodeWord(w, ranks)
      val replay = merges.foldLeft(Bpe.wordSymbols(w))((s, m) => Bpe.mergePass(s, m))
      assert(greedy === replay, s"word '$w'")
    }
  }

  test("saveMerges/loadMerges: GPT-2 merges.txt format round trip, header skipped") {
    val merges = Bpe.learn(corpus, "text", numMerges = 6)
    val f = java.nio.file.Files.createTempFile("graft_merges", ".txt")
    try {
      Bpe.saveMerges(f.toString, merges)
      assert(Bpe.loadMerges(f.toString) === merges)
      // a hand-written file in the public format (header + blanks) loads
      java.nio.file.Files.write(f, "#version: 0.2\n\ne s\nes t</w>\n".getBytes("UTF-8"))
      assert(Bpe.loadMerges(f.toString) === Seq(("e", "s"), ("es", "t</w>")))
      // a merge whose FIRST SYMBOL starts with '#' (corpora with '#include')
      // must survive the round trip — only the #version header is skipped
      // (r10 advice: a blanket '#'-filter silently dropped such merges)
      // …including one whose first symbol IS '#version' (shader corpora:
      // '#version330' tokens) — only the LINE-1 header may be skipped
      val hashy = Seq(("#", "i"), ("#i", "n"), ("#version", "3"), ("x", "y</w>"))
      Bpe.saveMerges(f.toString, hashy)
      assert(Bpe.loadMerges(f.toString) === hashy)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("byte-level: committed GPT-2-format merges fixture -> encode == hand-computed tokens") {
    // the fixture uses the real public conventions (Ġ = byte 0x20's
    // bytes_to_unicode stand-in, '#version' header, rank = line order)
    val path = getClass.getResource("/gpt2_format_merges.txt").getPath
    val merges = Bpe.loadMerges(path)
    assert(merges === Seq(("h", "e"), ("l", "l"), ("Ġ", "t"), ("Ġt", "he")))
    // hand-derivation: "the" -> [t, he]; " hello" -> [Ġ, he, ll, o]
    // (rank-0 h+e, then rank-1 l+l, nothing else applies);
    // " the" -> [Ġ, t, he] -> [Ġt, he] -> [Ġthe] (ranks 0, 2, 3)
    val docs = Seq((1L, "the hello the")).toDF("id", "text")
    val toks = Bpe.tokensBytes(docs, "id", "text", merges)
      .collect().head.getSeq[String](1)
    assert(toks === Seq("t", "he", "Ġ", "he", "ll", "o", "Ġthe"))
    assert(Bpe.tokenCountsBytes(docs, "id", "text", merges)
      .collect().head.getLong(1) === 7L)
  }

  test("byte-level: non-ASCII falls back to per-byte symbols; zero merges == UTF-8 byte count") {
    // 'é' is UTF-8 C3 A9: both bytes are in bytes_to_unicode's identity
    // ranges, so the symbols are the latin-1 chars Ã and ©
    val docs = Seq((1L, "é"), (2L, "ab c"), (3L, "")).toDF("id", "text")
    val toks = Bpe.tokensBytes(docs.where($"id" === 1), "id", "text", Seq.empty)
      .collect().head.getSeq[String](1)
    assert(toks === Seq("Ã", "©"))
    val counts = Bpe.tokenCountsBytes(docs, "id", "text", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 2L, 2L -> 4L, 3L -> 0L)) // utf-8 byte lengths
  }

  test("learnBytes: golden first merges on a tiny corpus; save/load round trip") {
    // pre-tokens: "the"(2), " the"(1), " hello"(2); weighted pairs put (h,e)
    // first (2+1+2=5), then (t,he) (2+1=3)
    val tiny = Seq((1L, "the the hello"), (2L, "the hello")).toDF("id", "text")
    val m = Bpe.learnBytes(tiny, "text", numMerges = 2)
    assert(m === Seq(("h", "e"), ("t", "he")))
    val f = java.nio.file.Files.createTempFile("graft_byte_merges", ".txt")
    try {
      Bpe.saveMerges(f.toString, m)
      assert(Bpe.loadMerges(f.toString) === m)
    } finally java.nio.file.Files.deleteIfExists(f)
    // deterministic
    assert(Bpe.learnBytes(tiny, "text", numMerges = 2) === m)
  }

  test("decode is per-symbol: literal '</w>' characters in text survive chunking") {
    // the word "a</w>b" spells the marker in its CHARACTERS; a global
    // marker-replace decode would corrupt it to "a b" (r10 advice, medium)
    val docs = Seq((1L, "a</w>b ok")).toDF("id", "text")
    val rows = Bpe.chunkBpe(docs, "id", "text", Seq.empty, 100, 0).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(3) === "a</w>b ok")
    // and with merges learned from the same pathological corpus
    val m = Bpe.learn(Seq((1L, "a</w>b a</w>b a</w>b ok ok")).toDF("id", "text"),
      "text", numMerges = 3)
    val merged = Bpe.chunkBpe(docs, "id", "text", m, 100, 0).collect()
    assert(merged.head.getString(3) === "a</w>b ok")
  }

  test("tokenCounts: zero merges = non-ws char count; more merges never increase") {
    val docs = Seq(
      (1L, "the lowest low"),
      (2L, "  spaced\tout\nwords  "),
      (3L, "")).toDF("id", "text")
    val zero = Bpe.tokenCounts(docs, "id", "text", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero === Map(1L -> 12L, 2L -> 14L, 3L -> 0L))
    val merges = Bpe.learn(corpus, "text", numMerges = 6)
    val merged = Bpe.tokenCounts(docs, "id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged.forall { case (id, n) => n <= zero(id) })
    // "lowest" contains the learned 'lo' and 'es' merges -> strictly fewer
    assert(merged(1L) < zero(1L))
  }

  test("tokens: word order preserved, decode-by-marker reconstructs ws-normalized text") {
    val merges = Bpe.learn(corpus, "text", numMerges = 6)
    val docs = Seq((1L, "the lowest\t\tnewest  low")).toDF("id", "text")
    val toks = Bpe.tokens(docs, "id", "text", merges)
      .collect().head.getSeq[String](1)
    val decoded = toks.mkString.replace(Bpe.Eow, " ").trim
    assert(decoded === "the lowest newest low")
    // every word boundary is marked exactly once
    assert(toks.mkString.sliding(Bpe.Eow.length).count(_ == Bpe.Eow) === 4)
  }

  test("chunkBpe: window count rule, overlap carry, decode of chunks") {
    val merges = Seq.empty[(String, String)] // char tokens -> counts are plain
    // "abcde fgh" -> 8 char tokens; maxTokens=4, overlap=1 -> stride 3 ->
    // nWin = 1 + ceil((8-4)/3) = 3: [a b c d] [d e f g] [g h]
    val docs = Seq((1L, "abcde fgh"), (2L, " ")).toDF("id", "text")
    val rows = Bpe.chunkBpe(docs, "id", "text", merges, 4, 1)
      .orderBy("id", "chunk_idx").collect()
    assert(rows.length === 3) // blank doc emits nothing
    assert(rows.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L))
    assert(rows.map(_.getLong(2)).toSeq === Seq(4L, 4L, 2L))
    assert(rows.map(_.getString(3)).toSeq === Seq("abcd", "de fg", "gh"))
  }

  test("chunkBpeBytes: zero merges == UTF-8 byte slices, code-point split exact, null drops") {
    // 'é' is 0xC3 0xA9 — maxTokens 4 / overlap 0 slices MID code point at
    // byte 4; the hex payload must carry the split bytes exactly
    val docs = Seq((1L, "abcéd"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val rows = Bpe.chunkBpeBytes(docs, "id", "text", Seq.empty, 4, 0)
      .orderBy("id", "chunk_idx").collect()
    assert(rows.length === 2) // null doc emits nothing
    assert(rows.map(_.getLong(1)).toSeq === Seq(0L, 1L))
    assert(rows.map(_.getLong(2)).toSeq === Seq(4L, 2L))
    assert(rows.map(_.getString(3)).toSeq === Seq("616263c3", "a964"))
  }

  test("chunkBpeBytes with learned merges: windows cover the byte stream exactly once at overlap 0") {
    val docs = Seq((1L, "the theme of the theory is the thing")).toDF("id", "text")
    val merges = Bpe.learnBytes(docs, "text", numMerges = 8, minPairCount = 1L)
    assert(merges.nonEmpty)
    val rows = Bpe.chunkBpeBytes(docs, "id", "text", merges, 5, 0)
      .orderBy("chunk_idx").collect()
    // concatenated window bytes == the document's UTF-8 bytes (pre-tokens
    // partition the text; merges only regroup bytes into tokens)
    val allHex = rows.map(_.getString(3)).mkString
    val expectHex = "the theme of the theory is the thing"
      .getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    assert(allHex === expectHex)
    assert(rows.init.forall(_.getLong(2) === 5L))
  }

  test("chunkBpe window tokens re-encode consistently (coverage, no redundant tail)") {
    val merges = Bpe.learn(corpus, "text", numMerges = 6)
    val docs = Seq((1L, ("newest lowest widest low " * 6).trim)).toDF("id", "text")
    val total = Bpe.tokenCounts(docs, "id", "text", merges).collect().head.getLong(1)
    val rows = Bpe.chunkBpe(docs, "id", "text", merges, 10, 2)
      .orderBy("chunk_idx").collect()
    val stride = 8
    val nWin = if (total <= 10) 1 else 1 + math.ceil((total - 10).toDouble / stride).toInt
    assert(rows.length === nWin)
    assert(rows.init.forall(_.getLong(2) === 10L))
    assert(rows.last.getLong(2) <= 10L && rows.last.getLong(2) >= 1L)
  }
}
