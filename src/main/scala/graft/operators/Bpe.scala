package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** A document's BPE token sequence. Top-level + public so the Dataset
  * encoder stays inside generated code (a nested private case class forces
  * the interpreted fallback). */
final case class BpeDocTokens(id: Long, tokens: Seq[String])

/** A document's BPE token count. */
final case class BpeDocCount(id: Long, n_tokens: Long)

/** One decoded BPE context window. */
final case class BpeChunk(id: Long, chunk_idx: Long, n_tokens: Long, chunk_text: String)

/** One byte-level context window: token count + the window's raw bytes as
  * lowercase hex (byte windows can split a UTF-8 code point — see
  * [[Bpe.chunkBpeBytes]]). */
final case class BpeByteChunk(id: Long, chunk_idx: Long, n_tokens: Long, chunk_hex: String)

/**
 * Byte-pair-encoding subword tokenizer (Sennrich et al. 2016, "Neural Machine
 * Translation of Rare Words with Subword Units" — the merges format GPT-2
 * popularized): the tokenizer a TRAINER actually consumes, so token budgets in
 * [[Packing.packBins]] / context windows in [[chunkBpe]] mean model tokens,
 * not whitespace words.
 *
 * Words are split to character symbols with the last character carrying the
 * `</w>` end-of-word marker (the original paper's representation); a merge
 * list is applied greedily lowest-rank-first (the canonical GPT-2 `bpe()`
 * loop, equivalent to replaying the learned merge passes in order — the spec
 * pins the equivalence differentially).
 *
 * [[learn]] trains the merge list from the corpus itself: ONE distributed
 * word-frequency aggregation (groupBy on word VALUES — partial aggregation
 * collapses hot words map-side, the shuffle is vocabulary-sized), then the
 * standard iterative pair-merge training on the driver over the top-`maxVocab`
 * word-count dictionary. This is how production BPE trainers work — training
 * state is the word-frequency DICT, Zipf-bounded by `maxVocab`, never the
 * corpus — so the driver holds vocab-sized data regardless of corpus scale.
 *
 * Encoding is per-row iterative merging — genuinely imperative per-word work
 * with no Column form — so [[tokens]]/[[tokenCounts]]/[[chunkBpe]] are honest
 * `mapPartitions` passes: the merge-rank map is built once per partition from
 * the (small, task-broadcast) merge list, rows stream through it, zero
 * shuffles. Deterministic end to end: exact distributed counts, lexicographic
 * tie-breaks, no RNG — the same corpus always learns the same merges.
 */
object Bpe {

  /** End-of-word marker fused onto a word's last character (Sennrich format):
    * it lets merges distinguish "er" mid-word from "er" word-finally, and
    * makes decode = concatenate + marker→space. */
  val Eow = "</w>"

  private val WsClass = "[\t\n\r ]"

  /** A word as its initial symbol sequence: one symbol per character, the
    * last carrying the end-of-word marker. */
  private[graft] def wordSymbols(word: String): Vector[String] = {
    val n = word.length
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < n) {
      val s = word.substring(i, i + 1)
      b += (if (i == n - 1) s + Eow else s)
      i += 1
    }
    b.result()
  }

  /** Merge every (leftmost-first, non-overlapping) occurrence of `pair` in a
    * symbol sequence — one training pass of Sennrich's algorithm. */
  private[graft] def mergePass(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        b += syms(i) + syms(i + 1)
        i += 2
      } else {
        b += syms(i)
        i += 1
      }
    }
    b.result()
  }

  /**
   * Learn `numMerges` merges from the corpus: distributed exact word counts,
   * capped at the `maxVocab` most frequent words (count desc, word asc — the
   * standard practical cap; training state is the dict, not the corpus),
   * then the textbook iterative training loop: count adjacent symbol pairs
   * weighted by word frequency, merge the most frequent (ties broken
   * lexicographically for determinism), repeat. Stops early when no pair
   * reaches `minPairCount`.
   */
  def learn(df: DataFrame, text: String, numMerges: Int,
            maxVocab: Int = 50000, minPairCount: Long = 2L): Seq[(String, String)] = {
    val words = df.select(explode(
        filter(split(col(text), WsClass), x => trim(x) =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxVocab)
      .collect().map(r => (wordSymbols(r.getString(0)), r.getLong(1)))
    learnMerges(words, numMerges, minPairCount)
  }

  /** The driver-side iterative pair-merge loop shared by [[learn]] (Sennrich
    * word-internal symbols) and [[learnBytes]] (GPT-2 byte symbols): count
    * adjacent pairs weighted by unit frequency, merge the most frequent
    * (lexicographic tie-break), repeat. State is the capped frequency dict —
    * never the corpus. */
  private def learnMerges(init: Array[(Vector[String], Long)], numMerges: Int,
                          minPairCount: Long): Seq[(String, String)] = {
    var vocab = init
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var done = false
    while (iter < numMerges && !done) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.maxBy { case ((a, b), c) => (c, a, b) }(
          Ordering.Tuple3(Ordering.Long, Ordering.String.reverse, Ordering.String.reverse))
        if (best._2 < minPairCount) done = true
        else {
          merges += best._1
          vocab = vocab.map { case (syms, c) => (mergePass(syms, best._1), c) }
          iter += 1
        }
      }
    }
    merges.toSeq
  }

  /**
   * Write a merge list in the public GPT-2 `merges.txt` format: a `#version`
   * header line, then one merge per line as two space-separated symbols in
   * rank order. Round-trips through [[loadMerges]]; files written by other
   * BPE trainers in this format load directly (symbol conventions — our
   * `</w>` suffix vs GPT-2's `Ġ` prefix — ride along as opaque symbol text).
   */
  def saveMerges(path: String, merges: Seq[(String, String)]): Unit = {
    val lines = "#version: 0.2" +: merges.map { case (a, b) => s"$a $b" }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** Load a GPT-2-format merges file: the `#version: …` header (LINE 1 only —
    * [[saveMerges]] and the public format always put it there) and blanks
    * are skipped; each remaining line is one merge, rank = order. The
    * header test is positional AND matches the header's actual shape
    * (`#version:` with the colon), not a bare `#version` prefix: a
    * header-less file whose first DATA line's first symbol merely begins
    * with '#version' — '#version330 3', the shader-corpus case — must keep
    * its rank-0 merge. The only first symbol the colon test could still
    * confuse is the literal '#version:', the header's own shape — the same
    * residual ambiguity the public format carries. */
  def loadMerges(path: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val all = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path),
      java.nio.charset.StandardCharsets.UTF_8).asScala.toSeq
    val body = if (all.headOption.exists(_.trim.startsWith("#version:"))) all.tail else all
    body.map(_.trim)
      .filter(_.nonEmpty)
      .map { l =>
        val i = l.indexOf(' ')
        require(i > 0 && i < l.length - 1, s"malformed merges line: '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }
  }

  /** GPT-2-style greedy encode of one word: repeatedly merge the present
    * pair with the LOWEST merge rank until none remains — equivalent to
    * replaying the training passes in rank order (spec-pinned). */
  private[graft] def encodeWord(word: String,
                                ranks: Map[(String, String), Int]): Vector[String] =
    encodeSyms(wordSymbols(word), ranks)

  /** The greedy lowest-rank-first merge loop over any initial symbol
    * sequence — shared by the word-internal and byte-level modes. */
  private[graft] def encodeSyms(init: Vector[String],
                                ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = init
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i + 1 < syms.length) {
        val p = (syms(i), syms(i + 1))
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = p }
        i += 1
      }
      if (best == null) continue = false
      else {
        syms = mergePass(syms, best)
        if (syms.length == 1) continue = false
      }
    }
    syms
  }

  private def splitWords(s: String): Array[String] =
    if (s == null) Array.empty else s.split(WsClass).filter(_.nonEmpty)

  /** Per-document BPE token sequence: (id, tokens array<string>), word order
    * preserved. One zero-shuffle mapPartitions pass; the rank map builds once
    * per partition from the task-broadcast merge list. */
  def tokens(df: DataFrame, key: String, text: String,
             merges: Seq[(String, String)]): DataFrame = {
    val m = merges.toArray
    df.select(col(key).cast("long"), col(text)).mapPartitions { it =>
      val ranks = m.iterator.zipWithIndex.toMap
      it.map { r =>
        val toks = splitWords(r.getString(1)).iterator
          .flatMap(encodeWord(_, ranks)).toSeq
        BpeDocTokens(r.getLong(0), toks)
      }
    }(Encoders.product[BpeDocTokens]).toDF()
  }

  /** Per-document BPE token count: (id, n_tokens) — the column every token
    * budget downstream ([[Packing.packBins]], mixture caps priced in model
    * tokens) should consume instead of whitespace word counts. */
  def tokenCounts(df: DataFrame, key: String, text: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val m = merges.toArray
    df.select(col(key).cast("long"), col(text)).mapPartitions { it =>
      val ranks = m.iterator.zipWithIndex.toMap
      it.map { r =>
        var n = 0L
        splitWords(r.getString(1)).foreach(w => n += encodeWord(w, ranks).length)
        BpeDocCount(r.getLong(0), n)
      }
    }(Encoders.product[BpeDocCount]).toDF()
  }

  /** Decode a token window back to text: PER SYMBOL, a word-final symbol
    * (one ending with the end-of-word marker) contributes its text minus the
    * marker plus a space; others contribute their text verbatim (trailing
    * space trimmed). Per-symbol — not a global marker replace over the
    * concatenation — because a document whose CHARACTERS spell a literal
    * "</w>" (plausible in web/code corpora) would have that content corrupted
    * to a space by the global form, and the zero-merge DuckDB oracle
    * ([[graft.DuckSql.bpeChunk0]]) likewise appends one space per word-final
    * symbol. The REAL marker is always a symbol suffix (wordSymbols fuses it
    * onto the last character; merges concatenate, keeping it terminal), so
    * one suffix strip recovers it exactly; only a merged symbol whose literal
    * characters happen to END in "</w>" remains ambiguous — inherent to the
    * string-marker representation, and strictly rarer than the global
    * replace's any-occurrence corruption. */
  private def decode(toks: Seq[String]): String = {
    val sb = new StringBuilder
    toks.foreach { t =>
      if (t.endsWith(Eow)) { sb ++= t.substring(0, t.length - Eow.length); sb += ' ' }
      else sb ++= t
    }
    val s = sb.toString
    if (s.nonEmpty && s.charAt(s.length - 1) == ' ') s.substring(0, s.length - 1) else s
  }

  /**
   * Context-window chunking in MODEL tokens — [[Packing.chunkDocs]] with the
   * whitespace counter swapped for BPE: windows of `maxTokens` BPE tokens
   * advancing by `maxTokens - overlap`, each decoded back to text (a window
   * may start mid-word — inherent to subword budgets; the decode keeps the
   * subword fragment). Same window-count rule as chunkDocs: the last window
   * is shorter, no redundant trailing window, empty docs emit nothing.
   * Zero-shuffle mapPartitions; output rows ∝ total tokens / stride.
   */
  // ── Byte-level mode (GPT-2 family: Radford et al. 2019) ──────────────────
  //
  // The word-internal mode above is Sennrich's original formulation; real
  // trainer tokenizers (GPT-2/BPE descendants) operate on BYTES under a
  // pre-tokenization regex: the text is first split by the GPT-2 pattern
  // (contraction suffixes, space-attached letter/number/punctuation runs,
  // whitespace runs), each pre-token is UTF-8 encoded, and every byte maps
  // to a printable stand-in character (the bytes_to_unicode trick) so merges
  // are plain string pairs over a 256-symbol alphabet — NO end-of-word
  // marker, NO out-of-alphabet fallback needed (any input is bytes). Token
  // budgets priced with this mode mean a real model family's tokens.

  /** GPT-2's bytes_to_unicode map: printable latin bytes stand for
    * themselves; the rest (control chars, space, DEL, …) shift to 256+n so
    * every symbol is a visible, non-space character and merges files stay
    * line-oriented. Byte 0x20 maps to 'Ġ' (U+0120) — the leading-space
    * marker familiar from GPT-2 vocabularies. */
  private[graft] val byteToChar: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }

  /** The GPT-2 pre-tokenization pattern (contractions, ` ?letters`,
    * ` ?numbers`, ` ?other`, whitespace runs). Matches partition the input:
    * every character lands in exactly one pre-token. */
  private val Gpt2Pattern = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  private[graft] def preTokenize(s: String): Vector[String] = {
    if (s == null) return Vector.empty
    val m = Gpt2Pattern.matcher(s)
    val b = Vector.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** A pre-token as its initial byte-level symbol sequence: one symbol per
    * UTF-8 byte, mapped through [[byteToChar]]. */
  private[graft] def byteSymbols(pretoken: String): Vector[String] = {
    val bytes = pretoken.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < bytes.length) {
      b += byteToChar(bytes(i) & 0xFF).toString
      i += 1
    }
    b.result()
  }

  /**
   * Learn byte-level merges: ONE distributed pre-token frequency aggregation
   * (the [[learn]] shape with the whitespace split swapped for the GPT-2
   * pattern), capped at the `maxVocab` most frequent pre-tokens, then the
   * shared driver merge loop over byte symbols. Merges written by
   * [[saveMerges]] in this mode are directly comparable to public GPT-2
   * format merges files (same symbol conventions, e.g. 'Ġ' leading-space).
   */
  def learnBytes(df: DataFrame, text: String, numMerges: Int,
                 maxVocab: Int = 50000, minPairCount: Long = 2L): Seq[(String, String)] = {
    val pre = df.select(col(text).cast("string").as("t"))
      .flatMap(r => if (r.isNullAt(0)) Nil else preTokenize(r.getString(0)))(Encoders.STRING)
      .groupBy(col("value").as("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxVocab)
      .collect().map(r => (byteSymbols(r.getString(0)), r.getLong(1)))
    learnMerges(pre, numMerges, minPairCount)
  }

  /** Per-document byte-level BPE token sequence: (id, tokens array<string>),
    * pre-token order preserved, symbols in the bytes_to_unicode alphabet.
    * Zero-shuffle mapPartitions, per-partition rank map — the [[tokens]]
    * shape in byte mode. */
  def tokensBytes(df: DataFrame, key: String, text: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val m = merges.toArray
    df.select(col(key).cast("long"), col(text)).mapPartitions { it =>
      val ranks = m.iterator.zipWithIndex.toMap
      it.map { r =>
        val t = if (r.isNullAt(1)) null else r.getString(1)
        val toks = preTokenize(t).iterator
          .flatMap(p => encodeSyms(byteSymbols(p), ranks)).toSeq
        BpeDocTokens(r.getLong(0), toks)
      }
    }(Encoders.product[BpeDocTokens]).toDF()
  }

  /** Per-document byte-level BPE token count: (id, n_tokens). With ZERO
    * merges this is exactly the document's UTF-8 byte length (the pattern
    * partitions the text; every byte is one symbol) — the SQL-expressible
    * twin that hash-checks the pre-tokenize + byte-map machinery. */
  def tokenCountsBytes(df: DataFrame, key: String, text: String,
                       merges: Seq[(String, String)]): DataFrame = {
    val m = merges.toArray
    df.select(col(key).cast("long"), col(text)).mapPartitions { it =>
      val ranks = m.iterator.zipWithIndex.toMap
      it.map { r =>
        val t = if (r.isNullAt(1)) null else r.getString(1)
        var n = 0L
        preTokenize(t).foreach(p => n += encodeSyms(byteSymbols(p), ranks).length)
        BpeDocCount(r.getLong(0), n)
      }
    }(Encoders.product[BpeDocCount]).toDF()
  }

  /** Inverse of [[byteToChar]]: stand-in character → raw byte. */
  private[graft] val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /**
   * BYTE-level context-window chunking — [[chunkBpe]]'s twin over the GPT-2
   * byte alphabet, so `maxTokens` prices windows in real model-family
   * tokens: per document, the [[tokensBytes]] token sequence slides in
   * (maxTokens − overlap)-strided windows, and each window's tokens decode
   * back to their RAW BYTES, emitted as lowercase hex. Bytes, not text,
   * deliberately: a byte window can split a UTF-8 code point, so a decoded
   * string would need a lossy replacement-char policy — the hex payload is
   * exact and the consumer picks its own decode leniency. Zero-shuffle
   * mapPartitions, per-partition rank map (the [[chunkBpe]] shape).
   *
   * With ZERO merges every token is one byte and the pre-tokenization
   * pattern partitions the text, so window k is exactly the document's
   * UTF-8 byte slice [k·stride, k·stride+maxTokens) — SQL-expressible
   * (hex-string slicing), which is what hash-checks the whole byte-chunk
   * machinery (`bpe_byte_chunk0_docs`); the learned-merge form stays
   * rows-only like its word-mode sibling.
   *
   * Output: (id, chunk_idx, n_tokens, chunk_hex).
   */
  def chunkBpeBytes(df: DataFrame, key: String, text: String,
                    merges: Seq[(String, String)], maxTokens: Int,
                    overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val m = merges.toArray
    df.select(col(key).cast("long"), col(text)).mapPartitions { it =>
      val ranks = m.iterator.zipWithIndex.toMap
      it.flatMap { r =>
        val t = if (r.isNullAt(1)) null else r.getString(1)
        val toks = preTokenize(t).iterator
          .flatMap(p => encodeSyms(byteSymbols(p), ranks)).toVector
        val n = toks.length
        if (n == 0) Seq.empty[BpeByteChunk]
        else {
          val nWin = if (n <= maxTokens) 1
                     else 1 + math.ceil((n - maxTokens).toDouble / stride).toInt
          (0 until nWin).map { w =>
            val win = toks.slice(w * stride, w * stride + maxTokens)
            val sb = new java.lang.StringBuilder(win.map(_.length).sum * 2)
            win.foreach(_.foreach(c =>
              sb.append(f"${charToByte(c) & 0xff}%02x")))
            BpeByteChunk(r.getLong(0), w.toLong, win.length.toLong, sb.toString)
          }
        }
      }
    }(Encoders.product[BpeByteChunk]).toDF()
  }

  def chunkBpe(df: DataFrame, key: String, text: String,
               merges: Seq[(String, String)], maxTokens: Int,
               overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val m = merges.toArray
    df.select(col(key).cast("long"), col(text)).mapPartitions { it =>
      val ranks = m.iterator.zipWithIndex.toMap
      it.flatMap { r =>
        val toks = splitWords(r.getString(1)).iterator
          .flatMap(encodeWord(_, ranks)).toVector
        val n = toks.length
        if (n == 0) Seq.empty[BpeChunk]
        else {
          val nWin = if (n <= maxTokens) 1
                     else 1 + math.ceil((n - maxTokens).toDouble / stride).toInt
          (0 until nWin).map { w =>
            val win = toks.slice(w * stride, w * stride + maxTokens)
            BpeChunk(r.getLong(0), w.toLong, win.length.toLong, decode(win))
          }
        }
      }
    }(Encoders.product[BpeChunk]).toDF()
  }
}
