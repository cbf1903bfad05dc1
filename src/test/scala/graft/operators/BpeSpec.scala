package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge: greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.applyMerge(Vector("a", "b", "a", "b"), "a", "b") == Vector("ab", "ab"))
    assert(Bpe.applyMerge(Vector("x"), "a", "b") == Vector("x"))
    assert(Bpe.applyMerge(Vector("a", "b", "c"), "b", "c") == Vector("a", "bc"))
  }

  test("train: hand-checked merges on a classic corpus") {
    // freqs: low=5, lowest=2 -> adjacent pairs weighted by word freq:
    // (l,o)=7, (o,w)=7, (w,e)=2, (e,s)=2, (s,t)=2
    // round 1: argmax ties (l,o) vs (o,w) at 7 -> lexicographic: (l,o)
    // round 2: ("lo", w)=7 wins
    // round 3: ("low", e)=2, (e,s)=2, (s,t)=2 -> ("e","s") lexicographic
    val docs = Seq(
      (0L, "low low low low low lowest lowest")).toDF("doc_id", "text")
    val got = Bpe.train(docs, nMerges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "l", "o", 7L),
      (2L, "lo", "w", 7L),
      (3L, "e", "s", 2L)))
  }

  test("train: stops early when pairs exhaust; invariant to partitioning") {
    val tiny = Seq((0L, "ab ab")).toDF("doc_id", "text")
    // round 1 merges (a,b); after that every word is a single symbol
    val got = Bpe.train(tiny, nMerges = 5).collect()
    assert(got.length == 1 && got.head.getString(1) == "a" && got.head.getString(2) == "b")

    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val a = Bpe.train(docs, 3).collect().map(_.toSeq).toSeq
    val b = Bpe.train(docs.repartition(13), 3).collect().map(_.toSeq).toSeq
    assert(a == b, "training must not depend on physical partitioning")
  }

  test("bpeEncode: trained merges compress the corpus token counts") {
    // corpus: "low" x5, "lowest" x2 -> merges (l,o), (lo,w), (e,s)
    val docs = Seq(
      (0L, "low low low"),
      (1L, "low low lowest lowest")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, 3).collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.bpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // after (l,o)+(lo,w): "low" -> ["low"] = 1 token
    // "lowest" -> ["low","es","t"] = 3 tokens
    assert(enc(0L) == (3L, 3L))             // 3 words x 1
    assert(enc(1L) == (4L, 2L * 1 + 2 * 3)) // 2x"low" + 2x"lowest"
    // zero merges = character counts
    val raw = Bpe.bpeEncode(docs, Seq.empty).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw(0L) == 9L) // "low" x3 = 9 chars
  }

  test("distributed rounds: identical merges past the driver vocab bound") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val driver = Bpe.train(docs, 6).collect().map(_.toSeq).toSeq
    // a 2-row bound forces the distributed dispatch on any real corpus
    val dispatched = Bpe.train(docs, 6, maxVocabRows = 2).collect().map(_.toSeq).toSeq
    assert(dispatched == driver,
      s"distributed rounds diverged from the driver loop:\n$dispatched\nvs\n$driver")
    // checkpointing mid-training (every 2 of 6 rounds) changes nothing
    val ckpt = Bpe.trainDistributed(docs, 6, checkpointEvery = 2)
      .collect().map(_.toSeq).toSeq
    assert(ckpt == driver)
    // the hand-checked corpus trains the same merges distributed
    val classic = Seq((0L, "low low low low low lowest lowest")).toDF("doc_id", "text")
    val got = Bpe.trainDistributed(classic, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, "l", "o", 7L), (2L, "lo", "w", 7L), (3L, "e", "s", 2L)))
    // a supplied checkpoint root (the shared-storage contract on a real
    // cluster) is used for the round parquets and fully cleaned by the
    // time the call returns — the merges live on the driver, so nothing
    // outlives the run (unlike components' final labels)
    val root = java.nio.file.Files.createTempDirectory("bpe-ckpt-root").toString
    try {
      val viaRoot = Bpe.trainDistributed(docs, 6, checkpointEvery = 2,
        checkpointDir = Some(root)).collect().map(_.toSeq).toSeq
      assert(viaRoot == driver,
        "a relocated checkpoint root must not change the trained merges")
      val left = Option(new java.io.File(root).listFiles()).toSeq.flatten
      assert(left.isEmpty,
        s"the run dir must be cleaned eagerly: ${left.map(_.getName).toSeq}")
    } finally Dedup.rmdir(new java.io.File(root))
  }
}
