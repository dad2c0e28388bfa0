package graft

import graft.operators._

/** Multimodal plumbing tests: payload bytes, metadata, batched decode stub. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Multimodal.withPayload(
    Seq(1L -> "hello world", 2L -> "abcd").toDF("id", "txt"), "txt")

  test("withPayload produces binary utf8 bytes") {
    val r = df.select("payload").head().getAs[Array[Byte]](0)
    assert(new String(r, "UTF-8") === "hello world")
  }

  test("extractMeta: size, magic (first 4 bytes hex), content hash") {
    val rows = Multimodal.extractMeta(df, "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows === Set(
      (1L, 11L, "68656c6c"),  // 'hell'
      (2L, 4L, "61626364")))  // 'abcd'
  }

  test("decode stub is deterministic and batched per partition") {
    val out = Multimodal.decode(df, "id").collect().map(m => m.id -> m).toMap
    assert(out(1L) === MediaInfo(1L, 16 + 11, 16 + (11 / 7) % 480, 1 + 11 % 24, "fake/odd"))
    assert(out(2L) === MediaInfo(2L, 16 + 4, 16 + 0, 1 + 4, "fake/even"))
    // determinism across runs
    val again = Multimodal.decode(df, "id").collect().map(m => m.id -> m).toMap
    assert(out === again)
  }

  test("sampleFrameIndexes: every kth frame per decoded row") {
    val decoded = Multimodal.decode(df, "id")
    val frames = Multimodal.sampleFrameIndexes(decoded, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    // id=1: frames = 1+11%24 = 12 -> 0,5,10 ; id=2: frames = 5 -> 0
    assert(frames === Set((1L, 0), (1L, 5), (1L, 10), (2L, 0)))
  }

  test("resize stub: payload truncated to the w*h*3 byte budget, dims set") {
    val out = Multimodal.resize(df, "id", 1, 1).collect().map(m => m.id -> m).toMap
    assert(out(1L).width === 1 && out(1L).height === 1)
    assert(out(1L).payload.length === 3)       // 11 bytes -> budget 3
    assert(out(2L).payload.length === 3)       // 4 bytes -> budget 3
    val big = Multimodal.resize(df, "id", 100, 100).collect().map(m => m.id -> m).toMap
    assert(big(1L).payload.length === 11)      // budget exceeds payload -> unchanged
  }
}
