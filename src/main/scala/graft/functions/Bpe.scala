package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer TRAINED ON THE CORPUS — the learned
  * counterpart of the regex "BPE-ish" D3 counter, following the published
  * algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units", arXiv:1508.07909): start from characters
  * (end-of-word marker on the final one), repeatedly merge the most
  * frequent adjacent symbol pair, and encode by applying merges in rank
  * order.
  *
  * Distribution of labor at 100 TB: pair statistics live on the WORD
  * table, not the corpus — one map-side-combined `groupBy(word)` count,
  * truncated to the top `vocabLimit` types, is all training reads. The
  * driver-local refinement loop then runs on that bounded table (≤ V
  * words × avg length symbols — the same bounded-collect discipline as
  * k-means centroids). Encoding broadcasts the merge ranks (≤ nMerges
  * pairs) inside a codegen'd expression; nothing per-row leaves the task.
  *
  * Determinism: ties in pair frequency break lexicographically, so the
  * same corpus always trains the same merge table (spec-pinned) — which
  * is what lets the rows-only driver query stay reproducible.
  */
object Bpe {

  /** End-of-word marker (the paper's `</w>`): makes word boundaries
    * recoverable from the flat symbol stream, so detokenization is exact.
    */
  val Eow = "</w>"

  private def initSymbols(word: String): Array[String] = {
    // split by CODE POINT, not UTF-16 char: a lone surrogate symbol would
    // mangle to '?' in UTF8String and break round-trip losslessness for
    // astral-plane text (emoji, rare CJK). One splitter shared with the
    // unigram tokenizer (Text.codePointOffsets).
    val offs = Text.codePointOffsets(word)
    val out = new Array[String](offs.length - 1)
    var i = 0
    while (i < out.length) { out(i) = word.substring(offs(i), offs(i + 1)); i += 1 }
    out(out.length - 1) = out(out.length - 1) + Eow
    out
  }

  /** Driver-local BPE refinement over a bounded (word, count) table:
    * `nMerges` rounds of most-frequent-adjacent-pair merging (ties
    * lexicographic on the pair), stopping early when no pair occurs
    * twice. Returns merges in rank order as (left, right).
    */
  def train(words: Array[(String, Long)], nMerges: Int): Array[(String, String)] = {
    val seqs = words.collect { case (w, c) if w.nonEmpty => (initSymbols(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = seqs.isEmpty
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          if (syms(i) != null && syms(i + 1) != null)
            counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
          i += 1
        }
      }
      val live = counts.filter(_._2 >= 2)
      if (live.isEmpty) done = true
      else {
        val best = live.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        seqs.indices.foreach { si =>
          val (syms, c) = seqs(si)
          var i = 0
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          seqs(si) = (out.toArray, c)
        }
        round += 1
      }
    }
    merges.toArray
  }

  /** Corpus-side training: word counts via one map-side-combined
    * aggregate, top-`vocabLimit` types by (count desc, word) — the ONLY
    * driver materialization, bounded by V — then [[train]].
    */
  def trainOver(docs: DataFrame, textCol: String = "text",
                nMerges: Int = 200, vocabLimit: Int = 10000): Array[(String, String)] = {
    val words = docs
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabLimit)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    train(words, nMerges)
  }

  /** Merge table → rank lookup keyed "left right" (the expression's
    * broadcast payload — a plain HashMap so generated code can call it).
    */
  def ranksOf(merges: Array[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** Encode one word: start from characters (+Eow), repeatedly merge the
    * lowest-ranked adjacent pair present — the standard greedy apply.
    */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = initSymbols(word)
    var merged = true
    while (merged && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) merged = false
      else {
        val out = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, out, 0, bestIdx)
        out(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
        System.arraycopy(syms, bestIdx + 2, out, bestIdx + 1,
          syms.length - bestIdx - 2)
        syms = out
      }
    }
    syms
  }

  /** Static evaluator (interpreted eval AND generated code both land
    * here): whitespace-tokenize, encode each word, emit the flat symbol
    * stream — word boundaries stay recoverable via the Eow markers.
    */
  def encodeEval(input: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = input.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val toks = encodeWord(s.substring(start, i), ranks)
          var t = 0
          while (t < toks.length) { out += UTF8String.fromString(toks(t)); t += 1 }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** BPE symbol stream of a text column under a fixed merge table —
    * codegen'd via an object reference so the surrounding operator stays
    * in one WholeStageCodegen span. The merge table is an IndexedSeq, NOT
    * an Array: case-class equality on an Array is by reference, so two
    * expressions built from the same table would never compare equal —
    * semanticEquals/canonicalization would fail and Spark would miss
    * common-subexpression elimination and exchange reuse whenever the
    * tokenizer column is referenced more than once in a plan.
    */
  case class BpeTokens(child: Expression, merges: IndexedSeq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val ranks = ranksOf(merges.toArray)
    override def nullSafeEval(input: Any): Any =
      encodeEval(input.asInstanceOf[UTF8String], ranks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // raw type: Janino compiles the generated cast and predates generics;
      // the lazy val keeps interpreted and generated paths on ONE table
      val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
      defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.encodeEval($c, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def bpeTokens(text: Column, merges: Array[(String, String)]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      BpeTokens(org.apache.spark.sql.GraftSqlBridge.expression(text),
        merges.toIndexedSeq))

  /** Content fingerprint of a merge table — the model identity, same role
    * as the Word2Vec table fingerprint: training artifacts that hash
    * differently tokenize differently and must not be silently swapped.
    */
  def fingerprint(merges: Array[(String, String)]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    merges.foreach { case (a, b) =>
      md.update(a.getBytes("UTF-8")); md.update(0.toByte)
      md.update(b.getBytes("UTF-8")); md.update(1.toByte)
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  /** Persist a trained merge table as a tiny (rank, left, right) parquet —
    * the tokenizer artifact a real pipeline trains once and ships to every
    * consumer. Rank is explicit (not file order) so a reread applies
    * merges in the exact trained order regardless of parquet task layout.
    */
  def save(spark: org.apache.spark.sql.SparkSession,
           merges: Array[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }.toSeq
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[save]]d merge table, rank order restored. Columns selected
    * by NAME — a reordered artifact must not silently swap pair halves.
    */
  def load(spark: org.apache.spark.sql.SparkSession,
           path: String): Array[(String, String)] =
    spark.read.parquet(path).orderBy("rank").select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1)))
}
