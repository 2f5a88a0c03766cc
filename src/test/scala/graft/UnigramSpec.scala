package graft

import graft.functions.{Bpe, Text, Unigram}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** D10 unigram-LM tokenizer receipts: the learned model's own claims
  * (EM monotonicity, vocab bound, coverage), the encode contract
  * (round-trip losslessness, determinism, codegen), and the corpus query.
  */
class UnigramSpec extends SparkSpecBase {

  private def model(vocab: Int = 200) =
    Unigram.trainOver(Tables.documents(spark, sf), "text", vocabSize = vocab,
      vocabLimit = 2000)

  test("hard-EM is coordinate ascent: corpus Viterbi log-likelihood is monotone") {
    val m = model()
    // within each EM segment (seed-vocab and post-prune) the trace must
    // be non-decreasing — the coordinate-ascent receipt; the prune
    // BETWEEN segments may legitimately drop likelihood
    for (trace <- Seq(m.llTraceSeed, m.llTracePruned)) {
      assert(trace.nonEmpty)
      trace.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(1) >= w(0) - math.abs(w(0)) * 1e-12,
            s"EM likelihood decreased: ${trace.toSeq}")
      }
    }
    // likelihoods are real numbers over a nonempty corpus
    assert(m.llTraceSeed.forall(ll => ll < 0 && !ll.isInfinite))
  }

  test("vocab bounded; single code points always survive (total coverage)") {
    val m = model(vocab = 150)
    val (singles, multis) = m.pieces.partition { case (p, _) =>
      p.codePointCount(0, p.length) == 1
    }
    assert(m.pieces.length <= 150 + singles.length,
      s"vocab ${m.pieces.length} exceeds target+singles")
    assert(multis.nonEmpty, "a learned model must keep multi-char pieces")
    // probabilities normalize (within float tolerance)
    val mass = m.pieces.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"piece mass $mass")
  }

  test("round trip: piece streams concatenate back to the whitespace tokens") {
    val m = model()
    val docs = Tables.documents(spark, sf)
    val bad = docs
      .select(col("doc_id"),
        array_join(Text.tokens(coalesce(col("text"), lit(""))), " ").as("want"),
        Unigram.unigramTokens(coalesce(col("text"), lit("")), m).as("pieces"))
      .withColumn("got",
        trim(regexp_replace(array_join(col("pieces"), ""), Bpe.Eow, " ")))
      .filter(col("got") =!= col("want"))
    assert(bad.count() == 0, bad.take(3).mkString("\n"))
  }

  test("training is deterministic and the learned LM compresses: pieces <= chars, OOV floors") {
    val m1 = model()
    val m2 = model()
    assert(m1.pieces.toSeq == m2.pieces.toSeq, "same corpus must train identically")
    // Viterbi under the fitted LM: never more pieces than code points,
    // and for in-vocab text strictly fewer (multi-cp pieces fire)
    val t = m1.table
    val segs = Unigram.segmentWord("the", t, m1.maxLen)
    assert(segs.mkString == "the")
    // an OOV word (chars outside the corpus alphabet) still segments —
    // floor fallback, one piece per code point
    val oov = Unigram.segmentWord("éé", t, m1.maxLen)
    assert(oov.toSeq == Seq("é", "é"))
    // two expressions from the same model canonicalize equal (the
    // Array-equality trap r12 ADVICE named on BpeTokens)
    val child = org.apache.spark.sql.catalyst.expressions.Literal.create("a b")
    def expr(mm: Unigram.Model) =
      Unigram.UnigramTokens(child, mm.pieces.toIndexedSeq, mm.maxLen)
    assert(expr(m1).semanticEquals(expr(m2)))
  }

  test("token_unigram driver query: counts consistent, unigram beats or ties BPE fertility") {
    val out = TextAnalysis.tokenUnigram(spark, sf, vocabSize = 400).cache()
    assert(out.filter(col("n_pieces") < col("n_ws_tokens")).count() == 0,
      "a word is at least one piece")
    assert(out.filter(col("n_pieces") > col("n_chars")).count() == 0,
      "pieces can never exceed code points")
    assert(out.filter(col("fertility") < 0).count() == 0)
    // the LEARNED comparison: total pieces under the fitted unigram LM vs
    // the same-budget BPE merge table — Viterbi (global-optimal per word)
    // should need no more pieces than greedy merges on this corpus
    val uni = out.agg(sum("n_pieces")).head().getLong(0)
    val bpe = TextAnalysis.tokenBpe(spark, sf, nMerges = 400)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(uni <= bpe * 1.15,
      s"unigram piece count $uni far above BPE's $bpe at similar budget")
    out.unpersist()
  }

  test("model persistence: save/load round trip, identity fingerprint") {
    val docs = Tables.documents(spark, sf)
    val m = model()
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram").toString + "/model"
    Unigram.save(spark, m, dir)
    val loaded = Unigram.load(spark, dir)
    // the artifact IS the tokenizer: identical piece table (order and
    // exact log-probs), identical fingerprint, identical encoding — the
    // EM fit is the most expensive tokenizer training in the repo and
    // must be reusable across sessions, not retrained per call
    assert(loaded.maxLen == m.maxLen)
    assert(loaded.pieces.toSeq == m.pieces.toSeq)
    assert(Unigram.fingerprint(loaded) == Unigram.fingerprint(m))
    assert(Unigram.segmentWord("persistence", loaded.table, loaded.maxLen).toSeq ==
      Unigram.segmentWord("persistence", m.table, m.maxLen).toSeq)
    assert(TextAnalysis.tokenUnigramOver(docs, loaded)
      .exceptAll(TextAnalysis.tokenUnigramOver(docs, m))
      .count() == 0)
    // a DIFFERENT model fingerprints differently (identity gate
    // material): one piece fewer, or a different maxLen, must separate
    // (two vocab budgets can legitimately converge to the SAME pieces
    // once EM prunes below both — that case SHOULD collide)
    assert(Unigram.fingerprint(m.copy(pieces = m.pieces.drop(1))) !=
      Unigram.fingerprint(m))
    assert(Unigram.fingerprint(m.copy(maxLen = m.maxLen + 1)) !=
      Unigram.fingerprint(m))
    // the fingerprint separates log-probs, not just piece names
    val tweaked = m.copy(pieces = m.pieces.zipWithIndex.map {
      case ((p, lp), 0) => (p, lp - 1e-9)
      case ((p, lp), _) => (p, lp)
    })
    assert(Unigram.fingerprint(tweaked) != Unigram.fingerprint(m))
  }

  test("encode expression survives with codegen fallback disabled") {
    // the generated-code path must actually compile and run — with
    // fallback off a doGenCode bug fails the query instead of silently
    // dropping to interpreted eval (the BpeSpec pattern)
    val m = model()
    val before = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = TextAnalysis.tokenUnigramOver(Tables.documents(spark, sf), m)
        .agg(sum("n_pieces")).head().getLong(0)
      assert(n > 0)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
