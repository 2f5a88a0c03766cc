package graft

import graft.functions.Bpe
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The corpus-trained BPE tokenizer (D7): the published merge algorithm on
  * a known word table, determinism of corpus training, corpus-wide
  * round-trip losslessness, compression monotonicity, and the codegen
  * health of the encode expression.
  */
class BpeSpec extends SparkSpecBase {

  test("first merge is the most frequent pair; ties break lexicographically") {
    // the Sennrich paper's example vocabulary
    val words = Array[(String, Long)](("low", 5L), ("lower", 2L),
      ("newest", 6L), ("widest", 3L))
    // brute-force the expected winner over the initial symbol sequences
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    words.foreach { case (w, c) =>
      val syms = w.map(_.toString).toArray
      syms(w.length - 1) += Bpe.Eow
      syms.sliding(2).foreach { p =>
        counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
      }
    }
    val expected = counts.minBy { case ((a, b), c) => (-c, a, b) }._1
    val merges = Bpe.train(words, nMerges = 1)
    assert(merges.length == 1 && merges.head == expected,
      s"got ${merges.toSeq}, expected $expected (counts $counts)")
    // ("e","s") and ("s","t</w>") both occur 9 times — lexicographic tie
    assert(expected == ("e", "s"))
  }

  test("encode applies merges in rank order; unseen words still segment") {
    val words = Array[(String, Long)](("low", 5L), ("lower", 2L),
      ("newest", 6L), ("widest", 3L))
    val ranks = Bpe.ranksOf(Bpe.train(words, nMerges = 10))
    // a trained word collapses far below character count
    val newest = Bpe.encodeWord("newest", ranks)
    assert(newest.length < 6, newest.toSeq)
    assert(newest.mkString.stripSuffix(Bpe.Eow) == "newest")
    // an UNSEEN word reuses learned subwords and stays lossless
    val unseen = Bpe.encodeWord("lowest", ranks)
    assert(unseen.mkString.stripSuffix(Bpe.Eow) == "lowest")
    assert(unseen.length < 6, unseen.toSeq)
  }

  test("non-Latin text: code-point symbols keep CJK and emoji lossless") {
    import spark.implicits._
    // spaceless CJK words and astral-plane emoji — initSymbols must split
    // by code point or lone surrogates mangle to '?' (review finding r12)
    val docs = Seq(
      (1L, "今天天气很好 今天天气很好 天气"),
      (2L, "mixed 今天 ascii and 😀😀 emoji"),
      (3L, "😀🎉 😀🎉 😀🎉")).toDF("doc_id", "text")
    val merges = Bpe.trainOver(docs, nMerges = 30, vocabLimit = 100)
    val bad = docs
      .select(col("doc_id"),
        array_join(graft.functions.Text.tokens(col("text")), " ").as("want"),
        Bpe.bpeTokens(col("text"), merges).as("toks"))
      .withColumn("got",
        trim(regexp_replace(array_join(col("toks"), ""), Bpe.Eow, " ")))
      .filter(col("got") =!= col("want"))
    assert(bad.count() == 0, bad.take(3).mkString("\n"))
    // repeated CJK bigrams actually merge (the trainer sees code points)
    val ranks = Bpe.ranksOf(merges)
    assert(Bpe.encodeWord("今天天气很好", ranks).length < 6)
  }

  test("two BpeTokens from the same merge table are semantically equal (CSE/exchange reuse)") {
    // r12 ADVICE: with the table as an Array, case-class equality was by
    // reference — two expressions built from the same merges never compared
    // equal, so canonicalization missed common-subexpression elimination
    // whenever the tokenizer column appeared twice in a plan
    // a resolved child isolates the fixed field (an unresolved Column's
    // node carries a stack-trace Origin that never compares equal — a
    // harness artifact the analyzer erases in real plans)
    val child = org.apache.spark.sql.catalyst.expressions.Literal.create("a b c")
    val merges = Array(("a", "b"), ("ab", "c"))
    def expr(m: Array[(String, String)]) = Bpe.BpeTokens(child, m.toIndexedSeq)
    assert(expr(merges).semanticEquals(expr(merges.clone())),
      "same merge table must canonicalize equal")
    assert(!expr(merges).semanticEquals(expr(Array(("a", "b")))),
      "different merge tables must not compare equal")
  }

  test("corpus training is deterministic and partition-count invariant") {
    val docs = Tables.documents(spark, sf)
    val a = Bpe.trainOver(docs, nMerges = 50, vocabLimit = 2000)
    val b = Bpe.trainOver(docs.repartition(7), nMerges = 50, vocabLimit = 2000)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }

  test("corpus-wide round trip: BPE symbols concatenate back to the words") {
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.trainOver(docs, nMerges = 100, vocabLimit = 5000)
    val bad = docs
      .select(col("doc_id"),
        array_join(graft.functions.Text.tokens(col("text")), " ").as("want"),
        Bpe.bpeTokens(coalesce(col("text"), lit("")), merges).as("toks"))
      .withColumn("got",
        trim(regexp_replace(array_join(col("toks"), ""), Bpe.Eow, " ")))
      .filter(col("got") =!= col("want"))
    assert(bad.count() == 0, bad.take(3).mkString("\n"))
  }

  test("token_bpe: counts bounded, fertility consistent, more merges compress") {
    val out = TextAnalysis.tokenBpe(spark, sf, nMerges = 200).cache()
    assert(out.filter(col("n_bpe_tokens") < col("n_ws_tokens")).count() == 0)
    assert(out.filter(col("n_bpe_tokens") > col("n_chars")).count() == 0)
    // fertility = chars per BPE token wherever tokens exist
    assert(out.filter(col("n_bpe_tokens") > 0)
      .filter(abs(col("fertility") -
        round(col("n_chars").cast("double") / col("n_bpe_tokens") + lit(1e-9), 4)) > 1e-9)
      .count() == 0)
    // a longer merge table can only tighten the encoding
    val small = TextAnalysis.tokenBpe(spark, sf, nMerges = 20)
      .select(col("doc_id"), col("n_bpe_tokens").as("n20"))
    val joined = out.join(small, "doc_id")
    assert(joined.filter(col("n_bpe_tokens") > col("n20")).count() == 0)
    val total200 = out.agg(sum("n_bpe_tokens")).head().getLong(0)
    val total20 = joined.agg(sum("n20")).head().getLong(0)
    assert(total200 < total20, s"200 merges must strictly compress: $total200 vs $total20")
    out.unpersist()
  }

  test("randomized properties: round trip, merge budget, monotone compression") {
    // fixed seed → deterministic sweep over arbitrary word tables — the
    // invariants that must hold for ANY corpus, not just the fixtures
    val rnd = new scala.util.Random(1234)
    (0 until 60).foreach { caseId =>
      val nWords = 1 + rnd.nextInt(40)
      val words: Array[(String, Long)] = Array.tabulate(nWords) { _ =>
        val len = 1 + rnd.nextInt(12)
        val w = (0 until len).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
        (w, (1 + rnd.nextInt(20)).toLong)
      }
      val nMerges = rnd.nextInt(30)
      val merges = Bpe.train(words, nMerges)
      // budget respected
      assert(merges.length <= nMerges, s"case $caseId: over budget")
      val ranks = Bpe.ranksOf(merges)
      val fewer = Bpe.ranksOf(merges.take(merges.length / 2))
      words.map(_._1).distinct.foreach { w =>
        val enc = Bpe.encodeWord(w, ranks)
        // lossless for every trained word
        assert(enc.mkString.stripSuffix(Bpe.Eow) == w, s"case $caseId: '$w'")
        // a PREFIX of the merge list never encodes shorter (merges only
        // ever join symbols)
        assert(enc.length <= Bpe.encodeWord(w, fewer).length,
          s"case $caseId: prefix table beat full table on '$w'")
      }
      // unseen words (fresh random draws) also round-trip
      (0 until 5).foreach { _ =>
        val w = (0 until 1 + rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(8)).toChar).mkString
        assert(Bpe.encodeWord(w, ranks).mkString.stripSuffix(Bpe.Eow) == w)
      }
    }
  }

  test("merge-table persistence: save/load round trip, identity fingerprint") {
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.trainOver(docs, nMerges = 60, vocabLimit = 2000)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString + "/merges"
    Bpe.save(spark, merges, dir)
    val loaded = Bpe.load(spark, dir)
    // the artifact IS the tokenizer: identical merges, identical encoding
    assert(loaded.toSeq == merges.toSeq)
    assert(Bpe.fingerprint(loaded) == Bpe.fingerprint(merges))
    assert(Bpe.encodeWord("persistence", Bpe.ranksOf(loaded)).toSeq ==
      Bpe.encodeWord("persistence", Bpe.ranksOf(merges)).toSeq)
    assert(graft.operators.TextAnalysis.tokenBpeOver(docs, loaded)
      .exceptAll(graft.operators.TextAnalysis.tokenBpeOver(docs, merges))
      .count() == 0)
    // a DIFFERENT table fingerprints differently (identity gate material)
    val other = Bpe.trainOver(docs, nMerges = 30, vocabLimit = 2000)
    assert(Bpe.fingerprint(other) != Bpe.fingerprint(merges))
    // fingerprint is boundary-aware: [("ab","c")] vs [("a","bc")] differ
    assert(Bpe.fingerprint(Array(("ab", "c"))) != Bpe.fingerprint(Array(("a", "bc"))))
  }

  test("encode expression survives with codegen fallback disabled") {
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.trainOver(docs, nMerges = 30, vocabLimit = 1000)
    val before = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = docs
        .select(size(Bpe.bpeTokens(coalesce(col("text"), lit("")), merges)).as("n"))
        .agg(sum("n")).head().getLong(0)
      assert(n > 0)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
