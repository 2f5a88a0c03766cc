package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram language-model tokenizer TRAINED ON THE CORPUS — the second
  * learned subword scheme next to [[Bpe]], following the published
  * algorithm (Kudo 2018, "Subword Regularization: Improving Neural Network
  * Translation Models with Multiple Subword Candidates", arXiv:1804.10959;
  * the SentencePiece unigram model): seed a piece vocabulary from frequent
  * substrings, fit piece probabilities by EM over the segmentation
  * lattice (hard/Viterbi EM here — each round segments every word with
  * the current probabilities, then re-estimates by MLE over the chosen
  * pieces, a coordinate ascent whose Viterbi corpus log-likelihood is
  * monotone non-decreasing — spec-receipted), prune to the target size,
  * and encode by Viterbi (maximum-likelihood segmentation).
  *
  * Distribution of labor at 100 TB — identical to [[Bpe]]'s declared
  * shape: statistics live on the WORD table (one map-side-combined
  * `groupBy(word)` count truncated to top-V types), the EM loop runs
  * driver-side on that bounded table, and encoding ships the piece
  * log-probability table (≤ vocabSize entries) inside a codegen'd
  * expression — nothing per-row leaves the task.
  *
  * Determinism: seeding, EM, pruning, and Viterbi all break ties
  * lexicographically (or by fixed position preference), so the same
  * corpus always trains the same model.
  */
object Unigram {

  /** Log-probability floor for out-of-vocabulary single code points —
    * low enough that Viterbi never prefers it over any resident piece
    * (e^-100 ≈ 1e-44: no real corpus's total piece count reaches 1e44, so
    * every MLE log-prob stays above it), finite so every word segments
    * (the unk convention). The M-step never resurrects floor-segmented
    * chars into the vocabulary, so the floor terms are CONSTANT across EM
    * rounds and the coordinate-ascent monotonicity argument stays exact.
    */
  val FloorLogp: Double = -100.0

  /** A trained model: pieces with log-probabilities plus the EM
    * log-likelihood traces (before and after the prune) — the
    * monotonicity receipt the spec asserts.
    */
  final case class Model(pieces: Array[(String, Double)],
                         maxLen: Int,
                         llTraceSeed: Array[Double],
                         llTracePruned: Array[Double]) {
    def table: java.util.HashMap[String, java.lang.Double] = tableOf(pieces)
  }

  def tableOf(pieces: Array[(String, Double)]): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    pieces.foreach { case (p, lp) => m.put(p, lp) }
    m
  }

  /** Viterbi segmentation of one word under a piece table; single code
    * points fall back to [[FloorLogp]] so every word segments. Ties
    * prefer the LONGER piece (smaller start), fixed. Positions are the
    * shared [[Text.codePointOffsets]] boundaries, so each candidate piece
    * is ONE `String.substring` — no intermediate arrays in the per-row
    * encode hot path. Returns (pieces, total log-probability).
    */
  def segmentOffs(word: String, offs: Array[Int],
                  table: java.util.HashMap[String, java.lang.Double],
                  maxLen: Int): (Array[String], Double) = {
    val n = offs.length - 1
    if (n <= 0) return (Array.empty, 0.0)
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val piece = word.substring(offs(j), offs(i))
        val lpBoxed = table.get(piece)
        val lp: Double =
          if (lpBoxed != null) lpBoxed
          else if (i - j == 1) FloorLogp
          else Double.NegativeInfinity
        val cand = best(j) + lp
        // strict > : on ties the SMALLEST j (longest piece) wins because
        // it is visited first
        if (cand > best(i)) { best(i) = cand; back(i) = j }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += word.substring(offs(back(p)), offs(p)); p = back(p) }
    (out.reverseIterator.toArray, best(n))
  }

  def segmentWord(word: String, table: java.util.HashMap[String, java.lang.Double],
                  maxLen: Int): Array[String] =
    segmentOffs(word, Text.codePointOffsets(word), table, maxLen)._1

  /** Driver-local training over a bounded (word, count) table — see the
    * object doc for the EM scheme. `vocabSize` bounds the FINAL piece
    * count. The prune keeps every single code point still RESIDENT at
    * prune time, but the hard-EM M-step drops any piece (singles
    * included) unused by the current Viterbi segmentation — total
    * coverage is guaranteed by the [[FloorLogp]] single-char fallback in
    * [[segmentOffs]], not by a vocabulary invariant. The seed is
    * `seedFactor`× larger.
    */
  def train(words: Array[(String, Long)], vocabSize: Int = 1000,
            maxLen: Int = 8, seedFactor: Int = 4, emIters: Int = 2): Model = {
    val offsW = words.collect { case (w, c) if w.nonEmpty =>
      (w, Text.codePointOffsets(w), c)
    }
    if (offsW.isEmpty)
      return Model(Array.empty, maxLen, Array.empty, Array.empty)
    def cpLen(s: String): Int = s.codePointCount(0, s.length)
    // seed: substring (code-point span) frequencies, lengths 1..maxLen
    val freq = scala.collection.mutable.Map.empty[String, Long]
    for ((w, offs, c) <- offsW; i <- 0 until offs.length - 1;
         l <- 1 to math.min(maxLen, offs.length - 1 - i)) {
      val s = w.substring(offs(i), offs(i + l))
      freq(s) = freq.getOrElse(s, 0L) + c
    }
    val singles = freq.keys.filter(cpLen(_) == 1).toArray.sorted
    val multiBudget = math.max(0, vocabSize * seedFactor - singles.length)
    val multis = freq.keys.filter(cpLen(_) > 1)
      .toArray.sortBy(s => (-freq(s), s)).take(multiBudget)
    var vocab: Map[String, Double] = normalize(
      (singles ++ multis).map(s => s -> freq(s).toDouble).toMap)
    // one hard-EM round: segment (E) then MLE re-estimate (M); returns
    // the corpus Viterbi log-likelihood under the PRE-round probabilities
    def emRound(): Double = {
      val table = tableOf(vocab.toArray)
      val counts = scala.collection.mutable.Map.empty[String, Double]
      var ll = 0.0
      for ((w, offs, c) <- offsW) {
        val (pieces, lp) = segmentOffs(w, offs, table, maxLen)
        ll += c * lp
        // M-step counts ONLY resident pieces: a floor-segmented OOV char
        // must not be resurrected into the vocabulary, or its (possibly
        // below-floor) MLE probability would replace the constant floor
        // term and break the coordinate-ascent monotonicity this model
        // receipts. Unused resident pieces drop (hard-EM MLE).
        pieces.foreach(p =>
          if (table.containsKey(p)) counts(p) = counts.getOrElse(p, 0.0) + c)
      }
      // all-floor segmentation (degenerate corpus) → keep the vocab as-is
      if (counts.nonEmpty) vocab = normalize(counts.toMap)
      ll
    }
    val traceSeed = Array.fill(emIters)(0.0)
    for (k <- 0 until emIters) traceSeed(k) = emRound()
    // prune to the target: all singles survive (coverage), then the
    // highest-probability multi-cp pieces (ties lexicographic)
    val (sing, multi) = vocab.partition { case (p, _) => cpLen(p) == 1 }
    val keep = multi.toArray.sortBy { case (p, lp) => (-lp, p) }
      .take(math.max(0, vocabSize - sing.size))
    vocab = normalize((sing.toArray ++ keep).map { case (p, lp) => p -> math.exp(lp) }.toMap)
    val tracePruned = Array.fill(emIters)(0.0)
    for (k <- 0 until emIters) tracePruned(k) = emRound()
    val pieces = vocab.toArray.sortBy(_._1)
    Model(pieces, maxLen, traceSeed, tracePruned)
  }

  private def normalize(weights: Map[String, Double]): Map[String, Double] = {
    val total = weights.values.sum
    weights.map { case (p, w) => p -> math.log(w / total) }
  }

  /** Corpus-side training: the same bounded word-table collect as
    * [[Bpe.trainOver]] — the only driver materialization, top-V types.
    */
  def trainOver(docs: org.apache.spark.sql.DataFrame, textCol: String = "text",
                vocabSize: Int = 1000, vocabLimit: Int = 10000,
                maxLen: Int = 8, emIters: Int = 2): Model = {
    import org.apache.spark.sql.functions._
    val words = docs
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabLimit)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    train(words, vocabSize, maxLen, emIters = emIters)
  }

  /** Static evaluator (interpreted AND generated code): whitespace-split,
    * Viterbi-segment each word, emit the flat piece stream with
    * [[Bpe.Eow]] appended to each word's last piece — the same
    * detokenization convention as the BPE stream, so round-trip checks
    * share one recipe.
    */
  def encodeEval(input: UTF8String,
                 table: java.util.HashMap[String, java.lang.Double],
                 maxLen: Int): ArrayData = {
    val s = input.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val pieces = segmentWord(s.substring(start, i), table, maxLen)
          var t = 0
          while (t < pieces.length) {
            val last = t == pieces.length - 1
            out += UTF8String.fromString(if (last) pieces(t) + Bpe.Eow else pieces(t))
            t += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Unigram piece stream of a text column under a fixed model — codegen'd
    * via reference objects; the piece table is an IndexedSeq in the case
    * class so two expressions from the same model canonicalize equal
    * (the Array-equality trap the r12 ADVICE named on BpeTokens).
    */
  case class UnigramTokens(child: Expression, pieces: IndexedSeq[(String, Double)],
                           maxLen: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val table = tableOf(pieces.toArray)
    override def nullSafeEval(input: Any): Any =
      encodeEval(input.asInstanceOf[UTF8String], table, maxLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramTable", table, "java.util.HashMap")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Unigram.encodeEval($c, $ref, $maxLen)")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def unigramTokens(text: Column, model: Model): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      UnigramTokens(org.apache.spark.sql.GraftSqlBridge.expression(text),
        model.pieces.toIndexedSeq, model.maxLen))

  /** Content fingerprint of a trained model — the identity gate every
    * persisted tokenizer artifact carries ([[Bpe.fingerprint]],
    * Word2Vec/Transformer bundles): models that hash differently segment
    * differently and must never be silently swapped. Log-probabilities
    * enter via their exact IEEE bit patterns (a rounded rendering could
    * collide two genuinely different EM fits).
    */
  def fingerprint(model: Model): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(8)
    model.pieces.foreach { case (p, lp) =>
      md.update(p.getBytes("UTF-8")); md.update(0.toByte)
      buf.clear(); buf.putDouble(lp)
      md.update(buf.array()); md.update(1.toByte)
    }
    buf.clear(); buf.putLong(model.maxLen.toLong)
    md.update(buf.array())
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  /** Persist a trained model as a tiny (piece, logp) parquet plus a
    * one-row params table — the EM fit is the most expensive tokenizer
    * training in the repo, so unlike retrain-per-call it ships once to
    * every consumer (same contract as [[Bpe.save]]). The LL traces are
    * training receipts, not model state, and do not persist; a reloaded
    * model carries empty traces but an identical piece table, so its
    * [[fingerprint]] and every encode are bit-equal to the trained one.
    */
  def save(spark: org.apache.spark.sql.SparkSession,
           model: Model, path: String): Unit = {
    import spark.implicits._
    model.pieces.toSeq.toDF("piece", "logp")
      .coalesce(1).write.mode("overwrite").parquet(path + "/pieces")
    Seq(model.maxLen).toDF("max_len")
      .coalesce(1).write.mode("overwrite").parquet(path + "/params")
  }

  /** Load a [[save]]d model. Pieces re-sort by name — [[train]]'s output
    * order — so parquet task layout can never reorder the table under the
    * fingerprint. Columns selected by NAME.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val pieces = spark.read.parquet(path + "/pieces")
      .select("piece", "logp").collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    val maxLen = spark.read.parquet(path + "/params")
      .select("max_len").collect().head.getInt(0)
    Model(pieces, maxLen, Array.empty, Array.empty)
  }
}
