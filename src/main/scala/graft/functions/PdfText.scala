package graft.functions

import java.util.zip.Inflater

/** Pure-JVM PDF text extraction — the REAL decode for SURVEY §2 A9's
  * largest declared gap (reference: src/pdf-extractor.ts extracts text with
  * pdf-parse and caches it by (path, size); this is the same common-case
  * extraction without a library, since this container has none).
  *
  * Scope: classic-xref AND PDF 1.5+ cross-reference-stream documents whose
  * page content streams are raw or FlateDecode-compressed and whose fonts
  * use standard one-byte encodings. Text is read from the content streams'
  * show operators — `(…) Tj`, `(…) '`, `a_w a_c (…) "`, and
  * `[(…) kern (…)] TJ` — honoring literal-string escapes (\\n, \\t, \\(,
  * \\), \\\\, octal \\ddd, line continuations), balanced nested parens, and
  * `<hex>` strings. Modern-writer structure is handled like a real reader:
  * the trailer's `startxref` bootstraps the cross-reference STREAM chain
  * (`/W` field widths, `/Index` subsections, PNG `/Predictor` row filters,
  * `/Prev` incremental updates), whose object table resolves indirect
  * `/Length N 0 R` stream bounds; `/Type/ObjStm` object streams are
  * inflated and their embedded objects walked via the `/N`+`/First` pair
  * table (that is where modern writers keep the page dictionaries, so page
  * counting covers them). Composite (Type0/CID) fonts decode through their
  * `/ToUnicode` CMap (r11): page `/Font` resource dicts — inline or
  * indirect, top-level or packed in an ObjStm — resolve each resource name
  * to its font object, whose ToUnicode stream is parsed (codespacerange
  * width, `bfchar`, `bfrange` in both increment and array forms), and show
  * strings under a `Tf`-selected mapped font regroup into code-width units
  * remapped to Unicode — the subset-font shape every modern writer emits,
  * where the raw string bytes are meaningless glyph ids. Resource names
  * merge document-wide (first binding wins — a name rebound to a different
  * font across pages is rare and degrades to the first mapping, never
  * throws). Encrypted documents decrypt through the standard security
  * handler for the EMPTY user password (r11 — the permissions-only case
  * most encrypted crawl PDFs are): Algorithm-2 key derivation from
  * /O‖/P‖/ID, per-object keys, RC4 (V1/V2/V4-`/V2`) and AES-128-CBC
  * (V4 `/AESV2`) stream decryption. Out of scope, by design: AES-256
  * (R5/6), password-protected opens, and glyph mapping for fonts that
  * ship NO ToUnicode (those degrade to the raw one-byte read or empty
  * text); everything else still flows through the same Spark plumbing.
  *
  * Driver-query note: the `pdf_decode` oracle query keeps its deterministic
  * stub outputs for the synthetic fixture (whose bytes are not PDFs — this
  * extractor correctly answers None); [[extract]] is the path REAL PDF
  * bytes take, spec-fed with handcrafted documents.
  */
object PdfText {

  /** Extracted document: concatenated text of all content streams (show
    * operations joined with single spaces) and the page-object count.
    */
  final case class PdfDoc(text: String, nPages: Int)

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
  // (?![0-9]) pins the FULL number (no backtracked prefix match: in
  // "/Length 30 0 R" a bare lookahead would accept "3"); the R-lookahead
  // then rejects indirect references as direct lengths
  private val LengthRe = "/Length\\s+(\\d+)(?![0-9])(?!\\s+\\d+\\s+R)".r
  private val IndirectLengthRe = "/Length\\s+(\\d+)\\s+\\d+\\s+R".r
  private val PageRe = "/Type\\s*/Page(?!s)".r
  private val ObjStmRe = "/Type\\s*/ObjStm".r
  private val XRefRe = "/Type\\s*/XRef".r

  /** Where an object lives, per the decoded cross-reference stream table:
    * at a byte offset in the file (type-1 entry), or embedded at an index
    * inside a `/Type/ObjStm` object stream (type-2 entry).
    */
  private sealed trait XrefLoc
  private final case class InFile(offset: Int) extends XrefLoc
  private final case class InObjStm(stm: Int, idx: Int) extends XrefLoc

  /** None unless `bytes` starts with a PDF header; Some(extracted) with
    * whatever text the supported envelope yields (possibly empty — a
    * valid-but-exotic PDF degrades to empty text, never an exception).
    */
  def extract(bytes: Array[Byte]): Option[PdfDoc] = extract(bytes, "")

  /** [[extract]] with a password (r12): the supplied credential is tried
    * as the USER password (Algorithm-6 `/U` validation for R2–4, the
    * `/U` hash for R5/6), then as the OWNER password (Algorithm 7
    * inverts `/O` to recover the user password for R2–4; the §7.6.4
    * `/O`-hash + `/OE`-unwrap leg for R5/6), then the empty user
    * password — so a caller can pass one corpus-wide credential without
    * breaking unprotected or permissions-only documents. No candidate
    * validating degrades to empty text, never throws.
    */
  def extract(bytes: Array[Byte], password: String): Option[PdfDoc] = {
    if (bytes == null || bytes.length < 5 ||
      !new String(bytes, 0, 5, Latin1).equals("%PDF-")) return None
    val pwdBytes =
      if (password == null) Array.emptyByteArray
      else password.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(127)
    // structural view: latin-1 is byte-transparent, so offsets in this
    // string are byte offsets in the file
    val s = new String(bytes, Latin1)
    // bootstrap the object table from the trailer's startxref, like a real
    // reader — for a 1.5+ file this decodes the cross-reference stream
    // chain; for a classic-xref file it yields nothing and every lookup
    // falls back to the scan heuristics below (never-throws either way)
    val xref = loadXrefStreams(bytes, s)
    // pass 1 — locate every stream (bounds resolved in trust order below)
    // without decoding text yet: the font table must exist BEFORE show
    // strings are read, and fonts may live anywhere in the file
    val recs = scala.collection.mutable.ArrayBuffer.empty[StreamRec]
    var from = 0
    while (from >= 0 && from < s.length) {
      val st = s.indexOf("stream", from)
      if (st < 0) from = -1
      else {
        // stream data begins after the keyword's EOL (CRLF or LF)
        var dataStart = st + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        // the owning object's full dictionary: scan back to its "obj"
        // keyword (the innermost "<<" could be a nested /DecodeParms
        // dict that hides the /Filter entry)
        val dictStart = s.lastIndexOf("obj", st)
        val dict = if (dictStart >= 0) s.substring(dictStart, st) else ""
        // stream end, in trust order: a direct /Length N when "endstream"
        // actually follows it (whitespace-tolerant — stream BYTES may
        // legitimately contain the string "endstream", and a bare indexOf
        // would truncate mid-stream); an INDIRECT /Length N 0 R resolved
        // through the xref table (the modern-writer shape); last, the
        // endstream scan.
        val end = {
          def checked(len: Option[Long]): Option[Int] = len
            .map(dataStart + _)
            .filter(_ <= s.length.toLong)
            .map(_.toInt)
            .filter(e => followedByEndstream(s, e))
          checked(directLength(dict))
            .orElse(checked(IndirectLengthRe.findFirstMatchIn(dict)
              .flatMap(m => scala.util.Try(m.group(1).toInt).toOption)
              .flatMap(num => resolveIntObject(s, xref, num))))
            .getOrElse(s.indexOf("endstream", dataStart))
        }
        if (end < 0) from = -1
        else {
          recs += StreamRec(dict, dataStart, end, objNumBefore(s, dictStart))
          from = end + "endstream".length
        }
      }
    }
    // structure view with stream BODIES blanked: page counting, the
    // font-resource scan, and the /Encrypt lookup must never match inside
    // stream data (raw text about PDFs may contain "/Type /Page")
    val struct = blankRanges(s, recs.map(r => (r.dataStart, r.end)).toSeq)
    // encrypted document? derive the file key (supplied password first,
    // empty-user-password fallback) so stream bodies decrypt before
    // inflate; the xref stream itself is never encrypted (spec) and was
    // already decoded above
    val crypt = loadDecryptor(struct, pwdBytes)
    // memoized stream decode: font discovery, page counting, and the text
    // pass may each touch the same stream (a CMap inflates once, not once
    // per consumer)
    val contentCache = new java.util.HashMap[Integer, Option[String]]()
    def contentOf(i: Int): Option[String] = {
      val hit = contentCache.get(i)
      if (hit != null) hit
      else {
        val r = recs(i)
        val raw0 = java.util.Arrays.copyOfRange(bytes, r.dataStart, r.end)
        val raw = crypt match {
          case Some(d) if XRefRe.findFirstIn(r.dict).isEmpty =>
            r.objNum match {
              case Some((num, gen, _)) =>
                try d.decrypt(num, gen, raw0)
                catch { case _: Exception => raw0 } // degrade, never throw
              case None => raw0
            }
          case _ => raw0
        }
        // the DECLARED filter chain, applied in decode order — an unknown
        // filter (DCT, JBIG2, …) or an indirectly-referenced /Filter
        // yields None so compressed bytes can never masquerade as show
        // operators in the text scan
        val c = filterChain(r.dict)
          .flatMap(ch => decodeFilters(raw, ch, r.dict))
          .map(new String(_, Latin1))
        contentCache.put(i, c)
        c
      }
    }
    // object streams: walk the embedded objects ONCE (that is where a
    // modern writer keeps the page dictionaries — and the font dicts the
    // font table needs). Liveness gates both LEVELS against the xref — an
    // incremental update (append-only save) leaves superseded generations
    // in the file body, and counting their stale page dicts would double
    // the page count: (a) this physical COPY is the stream object only if
    // the xref's type-1 entry for its object number points at this very
    // header offset (generations share the number); (b) a MEMBER is live
    // only if its type-2 entry points back at (this stream, this index).
    // No xref → classic behavior (count/keep everything).
    var objStmPages = 0
    val memberBodies = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    recs.indices.foreach { i =>
      val r = recs(i)
      if (ObjStmRe.findFirstIn(r.dict).isDefined) {
        val copyLive = xref.isEmpty || r.objNum.isEmpty ||
          r.objNum.exists { case (num, _, off) => xref.get(num).contains(InFile(off)) }
        if (copyLive) contentOf(i).foreach { p =>
          objStmMembers(p, r.dict) match {
            case None => objStmPages += PageRe.findAllIn(p).size // degrade
            case Some(members) =>
              val stmNum = r.objNum.map(_._1)
              // live-unknowable (no table, or unparseable stream number):
              // count all — dropping real pages is worse than stale ones
              def live(idx: Int, num: Int): Boolean =
                (xref.isEmpty || stmNum.isEmpty) ||
                  xref.get(num).contains(InObjStm(stmNum.get, idx))
              objStmPages += members.zipWithIndex.count { case ((num, body), idx) =>
                live(idx, num) && PageRe.findFirstIn(body).isDefined
              }
              memberBodies ++= members
          }
        }
      }
    }
    val fonts =
      try buildFontTable(struct, recs.toSeq, memberBodies.toSeq, xref, contentOf)
      catch { case _: Exception => Map.empty[String, CidFont] }
    // pass 2 — text path: structural streams (XRef tables, ObjStm
    // payloads) are excluded so binary table bytes can never masquerade
    // as show operators; cheap gate on the BT operator for the rest
    val text = new StringBuilder
    recs.indices.foreach { i =>
      val r = recs(i)
      if (ObjStmRe.findFirstIn(r.dict).isEmpty && XRefRe.findFirstIn(r.dict).isEmpty)
        contentOf(i).foreach(c => if (c.contains("BT")) appendShownText(c, text, fonts))
    }
    val nPages = PageRe.findAllIn(struct).size
    Some(PdfDoc(text.result().trim, nPages + objStmPages))
  }

  /** One located stream: owning dictionary text, body byte range, and the
    * owning object's (number, header offset) when recoverable.
    */
  private final case class StreamRec(dict: String, dataStart: Int, end: Int,
                                     objNum: Option[(Int, Int, Int)])

  /** `s` with each (from, until) range replaced by spaces — the structural
    * view regexes may safely run over.
    */
  private def blankRanges(s: String, ranges: Seq[(Int, Int)]): String = {
    val a = s.toCharArray
    ranges.foreach { case (f, u) =>
      var i = math.max(0, f)
      val e = math.min(a.length, u)
      while (i < e) { a(i) = ' '; i += 1 }
    }
    new String(a)
  }

  /** A direct `/Length N` (toLong + None on overflow — a malformed huge
    * length must fall back to scanning, not throw).
    */
  private def directLength(dict: String): Option[Long] =
    LengthRe.findFirstMatchIn(dict)
      .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)

  private def followedByEndstream(s: String, e: Int): Boolean = {
    var p = e
    while (p < s.length && (s.charAt(p) == '\r' || s.charAt(p) == '\n' ||
      s.charAt(p) == ' ')) p += 1
    s.startsWith("endstream", p)
  }

  // ---- PDF 1.5+ cross-reference streams ----

  /** Follow `startxref` → cross-reference stream → `/Prev` chain, merging
    * decoded object tables (earliest update wins on conflict = later /Prev
    * entries never override the newest table, per the incremental-update
    * rules). Empty map for classic-xref files (the offset points at an
    * `xref` keyword, not an object) and on any malformation.
    */
  private def loadXrefStreams(bytes: Array[Byte], s: String): Map[Int, XrefLoc] = {
    val acc = scala.collection.mutable.Map.empty[Int, XrefLoc]
    try {
      // the spec obliges readers to search the LAST 1024 bytes (trailing
      // junk after %%EOF exists in the wild); a tighter window silently
      // disengages the whole xref/ObjStm machinery
      val tail = s.substring(math.max(0, s.length - 1024))
      var at = "startxref\\s+(\\d+)".r.findAllMatchIn(tail).toSeq.lastOption
        .flatMap(m => scala.util.Try(m.group(1).toInt).toOption).getOrElse(-1)
      val seen = scala.collection.mutable.Set.empty[Int] // cycle guard
      while (at >= 0 && at < s.length && seen.add(at)) {
        at = decodeXrefStreamAt(bytes, s, at, acc).getOrElse(-1)
      }
    } catch { case _: Exception => () }
    acc.toMap
  }

  /** Decode one cross-reference STREAM object at byte `offset`; merge its
    * entries into `acc` (first writer wins — the chain walks newest first)
    * and return the `/Prev` offset if any. None ends the chain: a classic
    * `xref` table at the offset, or anything malformed.
    */
  private def decodeXrefStreamAt(bytes: Array[Byte], s: String, offset: Int,
                                 acc: scala.collection.mutable.Map[Int, XrefLoc]): Option[Int] = {
    val st = s.indexOf("stream", offset)
    if (st < 0) return None
    val dict = s.substring(offset, st)
    if (XRefRe.findFirstIn(dict).isEmpty) return None // classic xref table
    var dataStart = st + "stream".length
    if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
    if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
    // the xref stream bootstraps the table, so its /Length must be direct
    val end = directLength(dict).map(dataStart + _)
      .filter(_ <= s.length.toLong).map(_.toInt)
      .filter(e => followedByEndstream(s, e))
      .orElse(Option(s.indexOf("endstream", dataStart)).filter(_ >= 0))
      .getOrElse(return None)
    val raw = java.util.Arrays.copyOfRange(bytes, dataStart, end)
    val data0 =
      if (dict.contains("FlateDecode")) inflate(raw).getOrElse(return None)
      else raw
    val w = intArray(dict, "/W")
    if (w.length < 3 || w.exists(_ < 0) || w.sum <= 0 || w.sum > 32) return None
    val rowLen = w.sum
    // PNG predictors (/Predictor >= 10): each row is filter-byte + columns
    val pred = "/Predictor\\s+(\\d+)".r.findFirstMatchIn(dict)
      .flatMap(m => scala.util.Try(m.group(1).toInt).toOption).getOrElse(1)
    val data = if (pred >= 10) unpredictPng(data0, rowLen).getOrElse(return None)
      else data0
    val size = "/Size\\s+(\\d+)".r.findFirstMatchIn(dict)
      .flatMap(m => scala.util.Try(m.group(1).toInt).toOption).getOrElse(0)
    val index = {
      val raw = intArray(dict, "/Index")
      if (raw.length >= 2 && raw.length % 2 == 0) raw else Array(0, size)
    }
    // big-endian field read; W(0)==0 means "type defaults to 1" per spec
    var row = 0
    def field(rowStart: Int, skip: Int, width: Int, default: Long): Long = {
      if (width == 0) return default
      var v = 0L; var i = 0
      while (i < width) { v = (v << 8) | (data(rowStart + skip + i) & 0xffL); i += 1 }
      v
    }
    index.grouped(2).foreach { case Array(first, count) =>
      var i = 0
      while (i < count && (row + 1) * rowLen <= data.length) {
        val rs = row * rowLen
        val objNum = first + i
        val typ = field(rs, 0, w(0), 1L)
        val f2 = field(rs, w(0), w(1), 0L)
        val f3 = field(rs, w(0) + w(1), w(2), 0L)
        if (!acc.contains(objNum)) typ match {
          case 1L if f2 <= Int.MaxValue => acc(objNum) = InFile(f2.toInt)
          case 2L if f2 <= Int.MaxValue => acc(objNum) = InObjStm(f2.toInt, f3.toInt)
          case _ => () // type 0 (free) or out of range
        }
        row += 1; i += 1
      }
    }
    "/Prev\\s+(\\d+)".r.findFirstMatchIn(dict)
      .flatMap(m => scala.util.Try(m.group(1).toInt).toOption)
  }

  /** `[n n n …]` after `key`, or empty on absence/malformation. */
  private def intArray(dict: String, key: String): Array[Int] =
    (java.util.regex.Pattern.quote(key) + "\\s*\\[([^\\]]*)\\]").r
      .findFirstMatchIn(dict)
      .map(_.group(1).trim.split("\\s+").filter(_.nonEmpty)
        .flatMap(t => scala.util.Try(t.toInt).toOption))
      .getOrElse(Array.empty)

  /** Reverse the PNG row filters (None/Sub/Up/Average/Paeth, bpp=1) that
    * /Predictor 10–15 apply to xref-stream rows. None on a ragged buffer
    * or an unknown filter byte.
    */
  private def unpredictPng(data: Array[Byte], rowLen: Int): Option[Array[Byte]] = {
    if (rowLen <= 0 || data.length % (rowLen + 1) != 0) return None
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val filter = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val x = data(src + i) & 0xff
        val a = if (i > 0) out(dst + i - 1) & 0xff else 0 // left (bpp=1)
        val b = if (r > 0) out(dst - rowLen + i) & 0xff else 0 // up
        val c = if (r > 0 && i > 0) out(dst - rowLen + i - 1) & 0xff else 0
        val v = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some(out)
  }

  /** The integer VALUE of object `num` — e.g. an indirect stream length —
    * looked up through the xref table. Only file-resident objects resolve
    * (a length stored inside an ObjStm would need that ObjStm decoded
    * first; callers fall back to scanning, so this stays best-effort).
    */
  private def resolveIntObject(s: String, xref: Map[Int, XrefLoc], num: Int): Option[Long] =
    xref.get(num).collect { case InFile(off) if off < s.length =>
      "^\\s*\\d+\\s+\\d+\\s+obj\\s*(\\d+)".r
        .findFirstMatchIn(s.substring(off, math.min(s.length, off + 64)))
        .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)
    }.flatten

  /** The object number written before the `obj` keyword at `dictStart`
    * ("50 0 obj…") and the byte offset of its header (where the number
    * starts — the position a type-1 xref entry addresses). Identifies
    * which object a stream IS, for the generation-liveness checks.
    */
  private def objNumBefore(s: String, dictStart: Int): Option[(Int, Int, Int)] = {
    val winStart = math.max(0, dictStart - 24)
    "(\\d+)\\s+(\\d+)\\s*$".r
      .findFirstMatchIn(s.substring(winStart, dictStart))
      .flatMap(m => scala.util.Try(
        (m.group(1).toInt, m.group(2).toInt, winStart + m.start)).toOption)
  }

  /** The embedded objects of one object stream, as (objnum, serialized
    * body) in member order, by walking the `/N` pair table from `/First`
    * (the spec's layout: N (objnum, relative-offset) integer pairs, then
    * the serialized objects). None on a malformed pair table — callers
    * fall back to whole-payload heuristics.
    */
  private def objStmMembers(payload: String, dict: String): Option[Seq[(Int, String)]] = {
    try {
      val n = "/N\\s+(\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toInt)
        .getOrElse(return None)
      val first = "/First\\s+(\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toInt)
        .getOrElse(return None)
      if (first <= 0 || first > payload.length || n <= 0) return None
      val nums = payload.substring(0, first).trim.split("\\s+")
        .filter(_.nonEmpty).flatMap(t => scala.util.Try(t.toInt).toOption)
      if (nums.length < 2 * n) return None
      val offsets = (0 until n).map(i => nums(2 * i + 1))
      Some(offsets.indices.map { i =>
        val from = math.min(payload.length, math.max(first, first + offsets(i)))
        val until = if (i + 1 < n)
          math.min(payload.length, math.max(from, first + offsets(i + 1)))
        else payload.length
        (nums(2 * i), payload.substring(from, until))
      })
    } catch { case _: Exception => None }
  }

  // ---- encrypted documents (standard security handler) ----

  /** Standard-security-handler crypt for the EMPTY user password — the
    * permissions-only encryption most encrypted PDFs in a crawl carry
    * (the user can open them; only edit/print permissions are locked).
    * RC4 for V1/V2 (R2/R3) and V4 `/V2` crypt filters; AES-128-CBC for
    * V4 `/AESV2` (first 16 bytes of each stream are the IV, PKCS#5
    * padding); AES-256-CBC for V5 R5/R6 `/AESV3` (r12 — file key
    * recovered from /U+/UE via SHA-256 / Algorithm 2.B, used directly
    * per object, no MD5 salting). Non-empty passwords stay out of
    * envelope: R5/6 validation fails cleanly (None → no decryption) and
    * R2–R4 streams decrypt to garbage that the inflate/BT gates degrade
    * to empty text, never a throw. Encryption side exists for the
    * round-trip fixtures ([[buildEncryptedPdf]]).
    */
  private[graft] final case class StdCrypt(fileKey: Array[Byte], aes: Boolean,
                                           v5: Boolean = false) {
    private def objKey(num: Int, gen: Int): Array[Byte] = {
      // V5 (AES-256): the file key IS the object key (ISO 32000-2
      // §7.6.3.3 — no per-object derivation)
      if (v5) return fileKey
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(fileKey)
      md.update(Array[Byte]((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
      if (aes) md.update(Array[Byte](0x73, 0x41, 0x6c, 0x54)) // "sAlT"
      md.digest().take(math.min(fileKey.length + 5, 16))
    }
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (aes) {
        if (data.length < 32) Array.emptyByteArray // IV + >=1 block
        else {
          val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
          c.init(javax.crypto.Cipher.DECRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(objKey(num, gen), "AES"),
            new javax.crypto.spec.IvParameterSpec(java.util.Arrays.copyOf(data, 16)))
          c.doFinal(data, 16, data.length - 16)
        }
      } else rc4(objKey(num, gen), data)
    private[functions] def encrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (aes) {
        // deterministic IV (fixtures need byte-stable output): MD5 of the
        // object id — unique per object, which is all CBC needs here
        val iv = java.security.MessageDigest.getInstance("MD5")
          .digest(s"iv:$num:$gen".getBytes(Latin1)).take(16)
        val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(objKey(num, gen), "AES"),
          new javax.crypto.spec.IvParameterSpec(iv))
        iv ++ c.doFinal(data)
      } else rc4(objKey(num, gen), data)
  }

  private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val sBox = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + sBox(i) + key(i % key.length)) & 0xff
      val t = sBox(i); sBox(i) = sBox(j); sBox(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    i = 0; j = 0
    while (x < data.length) {
      i = (i + 1) & 0xff
      j = (j + sBox(i)) & 0xff
      val t = sBox(i); sBox(i) = sBox(j); sBox(j) = t
      out(x) = (data(x) ^ sBox((sBox(i) + sBox(j)) & 0xff)).toByte
      x += 1
    }
    out
  }

  /** The spec's 32-byte password pad (Algorithm 2). */
  private[graft] val PadBytes: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** The user password padded/truncated to 32 bytes with the spec's pad
    * string (Algorithm 2 step a) — the empty password is exactly
    * [[PadBytes]].
    */
  private def pad32(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ PadBytes).take(32)

  private[functions] def deriveFileKey(o: Array[Byte], p: Int, id0: Array[Byte],
                                       r: Int, lengthBits: Int): Array[Byte] =
    deriveFileKey(Array.emptyByteArray, o, p, id0, r, lengthBits)

  /** Algorithm 2 file key for a user password: MD5(padded pwd ‖ O ‖ P
    * little-endian ‖ ID₀), then 50 MD5 rounds over the first n bytes for
    * R≥3; key length n = Length/8 (clamped 5..16, 5 for V1).
    */
  private[functions] def deriveFileKey(pwd: Array[Byte], o: Array[Byte], p: Int,
                                       id0: Array[Byte], r: Int,
                                       lengthBits: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(pad32(pwd))
    md.update(o, 0, math.min(32, o.length))
    md.update(Array[Byte]((p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte))
    md.update(id0)
    var h = md.digest()
    val n = math.max(5, math.min(16, lengthBits / 8))
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        val m2 = java.security.MessageDigest.getInstance("MD5")
        m2.update(h, 0, n); h = m2.digest(); i += 1
      }
    }
    h.take(n)
  }

  /** The Algorithm-3 RC4 key derived from an OWNER password: MD5 of the
    * padded password (50 extra rounds for R≥3), truncated to the key
    * width — used both to WRITE `/O` (encrypting the padded user
    * password) and to INVERT it in an Algorithm-7 owner open.
    */
  private[graft] def ownerRc4Key(ownerPwd: Array[Byte], r: Int,
                                     lengthBits: Int): Array[Byte] = {
    var h = java.security.MessageDigest.getInstance("MD5")
      .digest(pad32(ownerPwd))
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        h = java.security.MessageDigest.getInstance("MD5").digest(h)
        i += 1
      }
    }
    h.take(math.max(5, math.min(16, lengthBits / 8)))
  }

  /** Algorithm-3 `/O`: the padded USER password RC4'd under the owner
    * key, plus 19 key⊕i rounds for R≥3.
    */
  private[graft] def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte],
                                  r: Int, lengthBits: Int): Array[Byte] = {
    val key = ownerRc4Key(ownerPwd, r, lengthBits)
    var e = rc4(key, pad32(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) { e = rc4(key.map(b => (b ^ i).toByte), e); i += 1 }
    }
    e
  }

  /** Algorithm 7's recovery step: invert [[computeO]] with the owner key
    * — RC4 is its own inverse per key, so the rounds replay in REVERSE
    * (key⊕19 … key⊕1, then the plain key). Returns the padded user
    * password `/O` encrypts; whether the owner password was RIGHT is
    * decided downstream by Algorithm-6 `/U` validation of the key that
    * padded password derives.
    */
  private[graft] def recoverUserPad(ownerPwd: Array[Byte], o: Array[Byte],
                                        r: Int, lengthBits: Int): Array[Byte] = {
    val key = ownerRc4Key(ownerPwd, r, lengthBits)
    var e = o.take(32)
    if (r >= 3) {
      var i = 19
      while (i >= 1) { e = rc4(key.map(b => (b ^ i).toByte), e); i -= 1 }
    }
    rc4(key, e)
  }

  /** Algorithm 4/5 `/U` value for a file key (r12 — what a conforming
    * writer stores and a reader compares to validate a user password):
    * R2 = RC4(key, pad); R≥3 = MD5(pad ‖ ID₀) RC4'd through the key then
    * 19 rounds with key⊕i — only the first 16 bytes are compared.
    */
  private[functions] def computeU(key: Array[Byte], id0: Array[Byte],
                                  r: Int): Array[Byte] =
    if (r == 2) rc4(key, PadBytes)
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(PadBytes); md.update(id0)
      var e = rc4(key, md.digest())
      var i = 1
      while (i <= 19) {
        e = rc4(key.map(b => (b ^ i).toByte), e)
        i += 1
      }
      e
    }

  private def validateU(key: Array[Byte], u: Array[Byte], id0: Array[Byte],
                        r: Int): Boolean = {
    val expect = computeU(key, id0, r)
    val n = if (r == 2) 32 else 16
    u.length >= n && java.util.Arrays.equals(expect.take(n), u.take(n))
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance(alg)
    parts.foreach(md.update)
    md.digest()
  }

  /** The R5/R6 password hash (ISO 32000-2 §7.6.4.3.3-4). R5 (the
    * deprecated Adobe extension) is one SHA-256 over pwd‖salt‖udata; R6
    * hardens it with Algorithm 2.B: iterate (K1 = 64×(pwd‖K‖udata);
    * E = AES-128-CBC(K[0..16], iv=K[16..32], K1); K = SHA-256/384/512 of
    * E picked by sum(E[0..16]) mod 3) until ≥64 rounds AND E's last byte
    * ≤ rounds−32. Public algorithm; empty-password use only here.
    */
  private[graft] def hash2B(pwd: Array[Byte], salt: Array[Byte],
                            udata: Array[Byte], r: Int): Array[Byte] = {
    var k = sha("SHA-256", pwd, salt, udata)
    if (r == 5) return k
    var rounds = 0
    var continue = true
    while (continue) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var j = 0
      while (j < 64) {
        System.arraycopy(block, 0, k1, j * block.length, block.length); j += 1
      }
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      val e = c.doFinal(k1)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = sha(if (mod == 0) "SHA-256" else if (mod == 1) "SHA-384" else "SHA-512", e)
      rounds += 1
      if (rounds >= 64 && (e(e.length - 1) & 0xff) <= rounds - 32) continue = false
    }
    k.take(32)
  }

  /** Parse the /Encrypt dictionary out of the structural view (it is
    * top-level and never itself encrypted) and derive the file key: the
    * SUPPLIED user password is tried first (validated against /U), then
    * the empty user password (r12 — password-protected opens). None =
    * unencrypted document, an unsupported handler/revision, no candidate
    * password validating (R5/6; R2–4 keep the legacy unvalidated
    * empty-password fallback because permissions-only writers store
    * arbitrary /U bytes), or any malformation — all degrade to "no
    * decryption", which for a truly encrypted document means garbage
    * streams that the downstream gates turn into empty text.
    */
  private def loadDecryptor(struct: String, pwd: Array[Byte]): Option[StdCrypt] = {
    try {
      val encNum = "/Encrypt\\s+(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(struct)
        .toSeq.lastOption.map(_.group(1).toInt).getOrElse(return None)
      val body = ("(?s)(?m)^\\s*" + encNum + "\\s+\\d+\\s+obj(.*?)endobj").r
        .findFirstMatchIn(struct).map(_.group(1)).getOrElse(return None)
      if (!body.contains("/Standard")) return None
      val v = "/V\\s+(\\d+)".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(0)
      val r = "/R\\s+(\\d+)".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(2)
      if (v == 5 && (r == 5 || r == 6)) {
        // AES-256 (r12): recover the file key from /U + /UE. /U is 48
        // bytes — hash(32) ‖ validation salt(8) ‖ key salt(8); an empty
        // user password must reproduce the hash, then the intermediate
        // key (hash over the KEY salt) AES-unwraps /UE into the file key.
        val u = pdfStringValue(body, "/U").getOrElse(return None)
        val ue = pdfStringValue(body, "/UE").getOrElse(return None)
        if (u.length < 48 || ue.length != 32) return None
        // supplied password first (as USER, then as OWNER — the owner
        // hash is the same 2.B construction with /U as the user data and
        // /OE as the wrapped key), then the empty user password — which
        // password opened the file is invisible downstream (same key)
        def unwrap(ikey: Array[Byte], wrapped: Array[Byte]): StdCrypt = {
          val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
          c.init(javax.crypto.Cipher.DECRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(ikey, "AES"),
            new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
          StdCrypt(c.doFinal(wrapped), aes = true, v5 = true)
        }
        def tryUser(p: Array[Byte]): Option[StdCrypt] = {
          val expect = hash2B(p, u.slice(32, 40), Array.emptyByteArray, r)
          if (java.util.Arrays.equals(expect, u.take(32)))
            Some(unwrap(hash2B(p, u.slice(40, 48), Array.emptyByteArray, r), ue))
          else None
        }
        def tryOwner(p: Array[Byte]): Option[StdCrypt] =
          for {
            o <- pdfStringValue(body, "/O") if o.length >= 48
            oe <- pdfStringValue(body, "/OE") if oe.length == 32
            u48 = u.take(48)
            if java.util.Arrays.equals(
              hash2B(p, o.slice(32, 40), u48, r), o.take(32))
          } yield unwrap(hash2B(p, o.slice(40, 48), u48, r), oe)
        tryUser(pwd).foreach(c => return Some(c))
        if (pwd.nonEmpty) {
          tryOwner(pwd).foreach(c => return Some(c))
          tryUser(Array.emptyByteArray).foreach(c => return Some(c))
        }
        return None // no candidate validates: out of envelope, degrade
      }
      if (v < 1 || v > 4 || r < 2 || r > 4) return None
      val aes = v == 4 && body.contains("/AESV2")
      // the TOP-LEVEL /Length is in BITS (40–256); a /CF sub-dictionary's
      // per-filter /Length is in BYTES (e.g. 16) and can appear first in
      // real writers' dicts — take the first match that is a legal bit
      // count so the key width can never derive from the wrong entry.
      // A V4 dict that carries ONLY the per-filter byte count (legal —
      // /Length is optional at top level) falls back to that count ×8
      // before defaulting to 40, so an AES-128 document whose only width
      // hint is `/CF…/Length 16` derives a 16-byte key, not a 5-byte one
      val lengths = "/Length\\s+(\\d+)".r.findAllMatchIn(body)
        .map(_.group(1).toInt).toSeq
      val lengthBits = lengths.find(l => l >= 40 && l <= 256 && l % 8 == 0)
        .orElse(if (v == 4) lengths.find(l => l >= 5 && l <= 32).map(_ * 8) else None)
        .getOrElse(40)
      val p = "/P\\s+(-?\\d+)".r.findFirstMatchIn(body)
        .map(_.group(1).toLong.toInt).getOrElse(-1)
      val o = pdfStringValue(body, "/O").getOrElse(return None)
      val id0 = "/ID\\s*\\[\\s*<([0-9A-Fa-f]*)>".r.findAllMatchIn(struct)
        .toSeq.lastOption.map(m => hexToBytes(m.group(1)))
        .getOrElse(Array.emptyByteArray)
      val bits = if (v == 1) 40 else lengthBits
      // a supplied password must VALIDATE against /U (Algorithm 6) to be
      // used — first as the USER password, then as the OWNER password
      // (Algorithm 7: invert /O to recover the padded user password and
      // validate the key IT derives); the empty-password key stays
      // unvalidated — permissions-only writers store arbitrary /U bytes
      // and the pre-r12 envelope opened those fine, so validation there
      // would be a regression
      val uVal = if (pwd.nonEmpty) pdfStringValue(body, "/U") else None
      uVal.foreach { u =>
        // derive only when there IS a /U to validate against — each key
        // costs 50 MD5 rounds (+~20 RC4 passes for the owner inversion)
        val userKey = deriveFileKey(pwd, o, p, id0, r, bits)
        if (validateU(userKey, u, id0, r))
          return Some(StdCrypt(userKey, aes))
        val ownerKey = deriveFileKey(
          recoverUserPad(pwd, o, r, bits), o, p, id0, r, bits)
        if (validateU(ownerKey, u, id0, r))
          return Some(StdCrypt(ownerKey, aes))
      }
      Some(StdCrypt(deriveFileKey(o, p, id0, r, bits), aes))
    } catch { case _: Exception => None }
  }

  /** The string VALUE after `key` in a dictionary body — literal
    * (escape-aware) or hex form — as raw bytes. NAME-BOUNDARY aware: `/U`
    * must not match inside `/UE` (the R6 dict carries both), so a hit
    * whose next character continues the name is skipped, as is one whose
    * value is not a string (an occurrence inside another entry's bytes).
    */
  private def pdfStringValue(body: String, key: String): Option[Array[Byte]] = {
    var idx = body.indexOf(key)
    while (idx >= 0) {
      val after = idx + key.length
      if (after >= body.length || !body.charAt(after).isLetterOrDigit) {
        var i = after
        while (i < body.length && body.charAt(i).isWhitespace) i += 1
        if (i < body.length) body.charAt(i) match {
          case '(' =>
            val sb = new StringBuilder
            parseLiteral(body, i + 1, sb)
            return Some(sb.result().map(_.toByte).toArray)
          case '<' =>
            val sb = new StringBuilder
            parseHex(body, i + 1, sb)
            return Some(sb.result().map(_.toByte).toArray)
          case _ => () // not a string value here — try the next occurrence
        }
      }
      idx = body.indexOf(key, idx + 1)
    }
    None
  }

  private def hexToBytes(h: String): Array[Byte] = {
    val hh = if (h.length % 2 == 1) h + "0" else h
    hh.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray
  }

  // ---- composite (Type0/CID) fonts via /ToUnicode CMaps ----

  /** One mapped font: show-string code width in bytes (from the CMap's
    * codespacerange; 2 for every real Type0 subset) and code → Unicode
    * text (multi-char targets carry ligatures like fi).
    */
  private final case class CidFont(codeBytes: Int, map: Map[Int, String])

  private val FontRefRe = "/([^\\s/<>\\[\\]()]+)\\s+(\\d+)\\s+\\d+\\s+R".r
  private val ToUnicodeRe = "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r

  /** Resource name (`F1`) → decoder, merged across every `/Font` resource
    * dict in the document — inline (`/Font<</F1 5 0 R>>`) or indirect
    * (`/Font 7 0 R`), in top-level structure or inside a live ObjStm
    * member (where modern writers keep page dicts). First binding wins;
    * fonts without a parseable ToUnicode CMap simply never enter the
    * table, so their strings keep the raw one-byte read.
    */
  private def buildFontTable(struct: String, recs: Seq[StreamRec],
                             memberBodies: Seq[(Int, String)],
                             xref: Map[Int, XrefLoc],
                             contentOf: Int => Option[String]): Map[String, CidFont] = {
    // every structural text a /Font resource dict can live in
    val sources: Seq[String] = struct +: memberBodies.map(_._2)
    // the body of top-level object `num` (xref offset preferred, scan
    // fallback) or of an ObjStm member
    def objectBody(num: Int): Option[String] = {
      val viaXref = xref.get(num).collect { case InFile(off) if off < struct.length =>
        val to = struct.indexOf("endobj", off)
        struct.substring(off, if (to < 0) math.min(struct.length, off + 4096) else to)
      }
      viaXref
        .orElse {
          ("(?m)^\\s*" + num + "\\s+\\d+\\s+obj").r.findFirstMatchIn(struct).map { m =>
            val to = struct.indexOf("endobj", m.end)
            struct.substring(m.end, if (to < 0) math.min(struct.length, m.end + 4096) else to)
          }
        }
        .orElse(memberBodies.find(_._1 == num).map(_._2))
    }
    // the CMap stream for object `num`: prefer the xref-live physical
    // copy, else the LAST one in the file (incremental updates append)
    def streamContent(num: Int): Option[String] = {
      val candidates = recs.indices.filter(recs(_).objNum.exists(_._1 == num))
      val live = candidates.find(i =>
        recs(i).objNum.exists { case (n, _, off) => xref.get(n).contains(InFile(off)) })
      live.orElse(candidates.lastOption).flatMap(contentOf)
    }
    val table = scala.collection.mutable.Map.empty[String, CidFont]
    def addEntries(fontDict: String): Unit =
      FontRefRe.findAllMatchIn(fontDict).foreach { m =>
        val name = m.group(1)
        if (!table.contains(name))
          for {
            fontNum <- scala.util.Try(m.group(2).toInt).toOption
            body <- objectBody(fontNum)
            font <- {
              // /ToUnicode wins when present (it is the text-extraction
              // channel by design, ISO 32000-1 §9.10.3); a simple font
              // with only /Encoding falls back to the glyph-name map
              // (r12); a font with NEITHER falls back to its embedded
              // font program — TrueType cmap/post tables, or the
              // Type1/CFF encoding+charset (r13 — the symbolic/subset-
              // font classes that closed the envelope)
              val viaCMap = for {
                cmapNum <- ToUnicodeRe.findFirstMatchIn(body)
                  .flatMap(mm => scala.util.Try(mm.group(1).toInt).toOption)
                payload <- streamContent(cmapNum)
                f <- parseToUnicodeCMap(payload)
              } yield f
              viaCMap.orElse(parseSimpleEncoding(body, objectBody))
                .orElse(parseEmbeddedTrueType(body, objectBody, streamContent))
                .orElse(parseEmbeddedType1(body, objectBody, streamContent))
            }
          } table(name) = font
      }
    sources.foreach { src =>
      // inline resource dicts: refs only inside (a nested inline font
      // dict would break the span — rare, and degrades to no mapping)
      "/Font\\s*<<([^<>]*)>>".r.findAllMatchIn(src).foreach(m => addEntries(m.group(1)))
      // indirect resource dicts: /Font 7 0 R → that object's body
      "/Font\\s+(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(src).foreach { m =>
        scala.util.Try(m.group(1).toInt).toOption
          .flatMap(objectBody).foreach(addEntries)
      }
    }
    table.toMap
  }

  // ---- simple-font /Encoding glyph maps (no ToUnicode) ----

  /** AGL glyph names for the printable-ASCII codes 32..126 in code order —
    * the spine every base encoding shares (PDF 1.7 Annex D).
    */
  private val AsciiGlyphNames: IndexedSeq[String] =
    (IndexedSeq("space", "exclam", "quotedbl", "numbersign", "dollar", "percent",
      "ampersand", "quotesingle", "parenleft", "parenright", "asterisk", "plus",
      "comma", "hyphen", "period", "slash",
      "zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine",
      "colon", "semicolon", "less", "equal", "greater", "question", "at") ++
      ('A' to 'Z').map(_.toString) ++
      IndexedSeq("bracketleft", "backslash", "bracketright", "asciicircum",
        "underscore", "grave") ++
      ('a' to 'z').map(_.toString) ++
      IndexedSeq("braceleft", "bar", "braceright", "asciitilde"))

  /** The non-ASCII slice of the Adobe Glyph List a Latin document can
    * actually reach through WinAnsi/MacRoman/`/Differences`: Latin-1
    * letters, typographic punctuation, currency, ligatures, accents.
    * Names outside this subset resolve only through the `uniXXXX`/`uXXXX`
    * conventions; otherwise the glyph has no text and its code drops —
    * same degrade contract as an unmapped CID.
    */
  private lazy val ExtraGlyphNames: Map[String, String] = Map(
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "quotesinglbase" -> "‚", "quotedblbase" -> "„",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
    "ellipsis" -> "…", "dagger" -> "†", "daggerdbl" -> "‡",
    "perthousand" -> "‰", "guilsinglleft" -> "‹",
    "guilsinglright" -> "›", "guillemotleft" -> "«",
    "guillemotright" -> "»", "fi" -> "ﬁ", "fl" -> "ﬂ",
    "florin" -> "ƒ", "fraction" -> "⁄", "Euro" -> "€",
    "trademark" -> "™", "copyright" -> "©", "registered" -> "®",
    "degree" -> "°", "plusminus" -> "±", "multiply" -> "×",
    "divide" -> "÷", "sterling" -> "£", "yen" -> "¥",
    "cent" -> "¢", "currency" -> "¤", "section" -> "§",
    "paragraph" -> "¶", "brokenbar" -> "¦", "exclamdown" -> "¡",
    "questiondown" -> "¿", "ordfeminine" -> "ª",
    "ordmasculine" -> "º", "mu" -> "µ", "periodcentered" -> "·",
    "cedilla" -> "¸", "onequarter" -> "¼", "onehalf" -> "½",
    "threequarters" -> "¾", "onesuperior" -> "¹",
    "twosuperior" -> "²", "threesuperior" -> "³",
    "logicalnot" -> "¬", "macron" -> "¯", "acute" -> "´",
    "dieresis" -> "¨", "tilde" -> "˜", "circumflex" -> "ˆ",
    "caron" -> "ˇ", "breve" -> "˘", "dotaccent" -> "˙",
    "ring" -> "˚", "ogonek" -> "˛", "hungarumlaut" -> "˝",
    "minus" -> "−", "OE" -> "Œ", "oe" -> "œ",
    "Scaron" -> "Š", "scaron" -> "š", "Zcaron" -> "Ž",
    "zcaron" -> "ž", "Ydieresis" -> "Ÿ", "ydieresis" -> "ÿ",
    "Agrave" -> "À", "Aacute" -> "Á", "Acircumflex" -> "Â",
    "Atilde" -> "Ã", "Adieresis" -> "Ä", "Aring" -> "Å",
    "AE" -> "Æ", "Ccedilla" -> "Ç", "Egrave" -> "È",
    "Eacute" -> "É", "Ecircumflex" -> "Ê", "Edieresis" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icircumflex" -> "Î",
    "Idieresis" -> "Ï", "Eth" -> "Ð", "Ntilde" -> "Ñ",
    "Ograve" -> "Ò", "Oacute" -> "Ó", "Ocircumflex" -> "Ô",
    "Otilde" -> "Õ", "Odieresis" -> "Ö", "Oslash" -> "Ø",
    "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucircumflex" -> "Û",
    "Udieresis" -> "Ü", "Yacute" -> "Ý", "Thorn" -> "Þ",
    "germandbls" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â",
    "atilde" -> "ã", "adieresis" -> "ä", "aring" -> "å",
    "ae" -> "æ", "ccedilla" -> "ç", "egrave" -> "è",
    "eacute" -> "é", "ecircumflex" -> "ê", "edieresis" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icircumflex" -> "î",
    "idieresis" -> "ï", "eth" -> "ð", "ntilde" -> "ñ",
    "ograve" -> "ò", "oacute" -> "ó", "ocircumflex" -> "ô",
    "otilde" -> "õ", "odieresis" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucircumflex" -> "û",
    "udieresis" -> "ü", "yacute" -> "ý", "thorn" -> "þ")

  private lazy val GlyphNameTable: Map[String, String] =
    ExtraGlyphNames ++ AsciiGlyphNames.zipWithIndex.map { case (n, i) =>
      n -> (32 + i).toChar.toString
    }

  private val UniNameRe = "uni((?:[0-9A-Fa-f]{4})+)".r
  private val UNameRe = "u([0-9A-Fa-f]{4,6})".r

  /** AGL resolution for one glyph name: the `uniXXXX`(+) and `uXXXXXX`
    * conventions first (they are the spec'd escape hatch for arbitrary
    * code points), then the Latin table. None = the glyph has no known
    * text → its code drops.
    */
  private[graft] def glyphToUnicode(name: String): Option[String] = name match {
    case UniNameRe(hex) =>
      Some(hex.grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString)
    case UNameRe(hex) =>
      scala.util.Try(new String(Character.toChars(Integer.parseInt(hex, 16)))).toOption
    case _ => GlyphNameTable.get(name)
  }

  /** Code → text for 32..126: every base encoding agrees with ASCII
    * there; also the declared degrade for StandardEncoding / an absent
    * /BaseEncoding (the font's built-in encoding is unknowable without
    * the font program, and ASCII identity is what the raw read already
    * assumed — Differences then overlay the part the writer re-declared).
    */
  private lazy val AsciiIdentity: Map[Int, String] =
    ((32 to 126) ++ Seq(9, 10, 13)).map(c => c -> c.toChar.toString).toMap

  /** The 0x80–0xFF halves of WinAnsi (= windows-1252) and MacRoman
    * (= Mac OS Roman), embedded as 128-char strings so decode behavior
    * never depends on the optional `jdk.charsets` provider (a minimized
    * runtime lacks `x-MacRoman`). U+FFFD marks the slots the encoding
    * leaves undefined — those codes drop. Data: PDF 1.7 Annex D /
    * the Unicode Consortium's published mapping tables.
    */
  private val WinAnsiHigh: String =
    "\u20AC\uFFFD\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030" +
    "\u0160\u2039\u0152\uFFFD\u017D\uFFFD\uFFFD\u2018\u2019\u201C" +
    "\u201D\u2022\u2013\u2014\u02DC\u2122\u0161\u203A\u0153\uFFFD" +
    "\u017E\u0178\u00A0\u00A1\u00A2\u00A3\u00A4\u00A5\u00A6\u00A7" +
    "\u00A8\u00A9\u00AA\u00AB\u00AC\u00AD\u00AE\u00AF\u00B0\u00B1" +
    "\u00B2\u00B3\u00B4\u00B5\u00B6\u00B7\u00B8\u00B9\u00BA\u00BB" +
    "\u00BC\u00BD\u00BE\u00BF\u00C0\u00C1\u00C2\u00C3\u00C4\u00C5" +
    "\u00C6\u00C7\u00C8\u00C9\u00CA\u00CB\u00CC\u00CD\u00CE\u00CF" +
    "\u00D0\u00D1\u00D2\u00D3\u00D4\u00D5\u00D6\u00D7\u00D8\u00D9" +
    "\u00DA\u00DB\u00DC\u00DD\u00DE\u00DF\u00E0\u00E1\u00E2\u00E3" +
    "\u00E4\u00E5\u00E6\u00E7\u00E8\u00E9\u00EA\u00EB\u00EC\u00ED" +
    "\u00EE\u00EF\u00F0\u00F1\u00F2\u00F3\u00F4\u00F5\u00F6\u00F7" +
    "\u00F8\u00F9\u00FA\u00FB\u00FC\u00FD\u00FE\u00FF"

  private val MacRomanHigh: String =
    "\u00C4\u00C5\u00C7\u00C9\u00D1\u00D6\u00DC\u00E1\u00E0\u00E2" +
    "\u00E4\u00E3\u00E5\u00E7\u00E9\u00E8\u00EA\u00EB\u00ED\u00EC" +
    "\u00EE\u00EF\u00F1\u00F3\u00F2\u00F4\u00F6\u00F5\u00FA\u00F9" +
    "\u00FB\u00FC\u2020\u00B0\u00A2\u00A3\u00A7\u2022\u00B6\u00DF" +
    "\u00AE\u00A9\u2122\u00B4\u00A8\u2260\u00C6\u00D8\u221E\u00B1" +
    "\u2264\u2265\u00A5\u00B5\u2202\u2211\u220F\u03C0\u222B\u00AA" +
    "\u00BA\u03A9\u00E6\u00F8\u00BF\u00A1\u00AC\u221A\u0192\u2248" +
    "\u2206\u00AB\u00BB\u2026\u00A0\u00C0\u00C3\u00D5\u0152\u0153" +
    "\u2013\u2014\u201C\u201D\u2018\u2019\u00F7\u25CA\u00FF\u0178" +
    "\u2044\u20AC\u2039\u203A\uFB01\uFB02\u2021\u00B7\u201A\u201E" +
    "\u2030\u00C2\u00CA\u00C1\u00CB\u00C8\u00CD\u00CE\u00CF\u00CC" +
    "\u00D3\u00D4\uF8FF\u00D2\u00DA\u00DB\u00D9\u0131\u02C6\u02DC" +
    "\u00AF\u02D8\u02D9\u02DA\u00B8\u02DD\u02DB\u02C7"

  private def highTable(table: String): Map[Int, String] =
    AsciiIdentity ++ (128 to 255).flatMap { b =>
      val ch = table.charAt(b - 128)
      if (ch == '�') None else Some(b -> ch.toString)
    }.toMap

  private lazy val WinAnsiMap: Map[Int, String] = highTable(WinAnsiHigh)
  private lazy val MacRomanMap: Map[Int, String] = highTable(MacRomanHigh)

  private def baseEncodingMap(name: String): Option[Map[Int, String]] = name match {
    case "WinAnsiEncoding" => Some(WinAnsiMap)
    case "MacRomanEncoding" => Some(MacRomanMap)
    case "StandardEncoding" | "PDFDocEncoding" => Some(AsciiIdentity)
    case _ => None
  }

  private val EncInlineOpenRe = "/Encoding\\s*<<".r
  private val EncIndirectRe = "/Encoding\\s+(\\d+)\\s+\\d+\\s+R".r
  private val EncNameRe = "/Encoding\\s*/([A-Za-z]+)".r

  /** Balanced extraction of an inline `/Encoding <<…>>` dictionary BODY.
    * A non-greedy regex would stop at the FIRST `>>`, so an /Encoding
    * dictionary containing a nested dictionary value would be truncated
    * there and the tail of its /Differences array silently dropped
    * (real-world writers do nest; the fixtures never did — r12 ADVICE).
    * Unbalanced input (`<<` never closed) yields None → the name/indirect
    * fallbacks, never a half-read map.
    */
  private def encInlineDict(fontBody: String): Option[String] =
    EncInlineOpenRe.findFirstMatchIn(fontBody).flatMap { m =>
      val start = m.end // just past the opening '<<'
      val n = fontBody.length
      var depth = 1
      var i = start
      while (i < n && depth > 0) {
        if (fontBody.startsWith("<<", i)) { depth += 1; i += 2 }
        else if (fontBody.startsWith(">>", i)) { depth -= 1; i += 2 }
        else i += 1
      }
      if (depth == 0) Some(fontBody.substring(start, i - 2)) else None
    }

  /** A simple font's `/Encoding` entry as a 1-byte decoder (r12 — glyph
    * maps without ToUnicode, the reference's pdf-parse envelope): a bare
    * name (`/Encoding/WinAnsiEncoding`), an inline dictionary, or an
    * indirect reference to one; a dictionary starts from its
    * /BaseEncoding (ASCII identity when absent) and overlays the
    * /Differences array (integers reset the current code, names assign
    * and auto-increment, ISO 32000-1 §9.6.5.2). A name the AGL subset
    * cannot resolve UNmaps its code — a glyph with no Unicode target has
    * no text. None when the font declares no /Encoding at all → raw
    * one-byte read, unchanged behavior.
    */
  private def parseSimpleEncoding(fontBody: String,
                                  objectBody: Int => Option[String]): Option[CidFont] = {
    val dictText: Option[String] =
      encInlineDict(fontBody)
        .orElse(EncIndirectRe.findFirstMatchIn(fontBody).flatMap(m =>
          scala.util.Try(m.group(1).toInt).toOption.flatMap(objectBody)))
    dictText match {
      case Some(d) =>
        // /BaseEncoding, or — for an indirect reference to a bare NAME
        // object rather than a dictionary — the name itself ("/Type
        // /Encoding" can never false-match: only the three concrete
        // base-encoding names are accepted)
        val base = "/BaseEncoding\\s*/([A-Za-z]+)".r.findFirstMatchIn(d)
          .flatMap(m => baseEncodingMap(m.group(1)))
          .orElse("/(WinAnsiEncoding|MacRomanEncoding|StandardEncoding|PDFDocEncoding)".r
            .findFirstMatchIn(d).flatMap(m => baseEncodingMap(m.group(1))))
          .getOrElse(AsciiIdentity)
        val map = "(?s)/Differences\\s*\\[(.*?)\\]".r.findFirstMatchIn(d)
          .map(_.group(1)) match {
          case None => base
          case Some(body) =>
            val acc = scala.collection.mutable.Map.empty[Int, String] ++= base
            var code = 0
            "(\\d+)|/([^\\s/\\[\\]<>()]+)".r.findAllMatchIn(body).foreach { t =>
              if (t.group(1) != null)
                code = scala.util.Try(t.group(1).toInt).getOrElse(0)
              else {
                if (code >= 0 && code <= 255)
                  glyphToUnicode(t.group(2)) match {
                    case Some(s) => acc(code) = s
                    case None => acc.remove(code)
                  }
                code += 1
              }
            }
            acc.toMap
        }
        Some(CidFont(1, map))
      case None =>
        // bare name — but not Type0's /Encoding/Identity-H etc., which
        // baseEncodingMap rejects (those fonts need a ToUnicode)
        EncNameRe.findFirstMatchIn(fontBody)
          .flatMap(m => baseEncodingMap(m.group(1)))
          .map(CidFont(1, _))
    }
  }

  // ---- embedded TrueType font programs (r13 — the last decode-envelope
  //      leg: no /ToUnicode, no usable /Encoding, the mapping lives only
  //      inside the /FontFile2 font program's own `cmap`/`post` tables;
  //      reference delegates this to pdf-parse, src/pdf-extractor.ts:1-56) ----

  private val FontDescRefRe = "/FontDescriptor\\s+(\\d+)\\s+\\d+\\s+R".r
  private val FontFile2Re = "/FontFile2\\s+(\\d+)\\s+\\d+\\s+R".r

  /** Decode a simple font through its embedded TrueType program
    * (ISO 32000-1 §9.6.6.4 + the OpenType `cmap`/`post` table formats):
    * codes map to glyph ids through the font's (3,0) symbol / (1,0) Mac /
    * (3,1) Unicode cmap subtables (symbol fonts key at 0xF000|code), and
    * glyph ids map back to text by inverting the Unicode subtable or via
    * `post` format-2.0 glyph names through the AGL subset. Anything
    * unparseable degrades to None (raw read) — never a throw.
    */
  private def parseEmbeddedTrueType(fontBody: String,
                                    objectBody: Int => Option[String],
                                    streamContent: Int => Option[String]): Option[CidFont] =
    try {
      for {
        dm <- FontDescRefRe.findFirstMatchIn(fontBody)
        descNum <- scala.util.Try(dm.group(1).toInt).toOption
        desc <- objectBody(descNum)
        fm <- FontFile2Re.findFirstMatchIn(desc)
        ffNum <- scala.util.Try(fm.group(1).toInt).toOption
        ttf <- streamContent(ffNum)
        font <- trueTypeCodeMap(ttf)
      } yield font
    } catch { case _: Exception => None }

  /** The 1-byte code → text table of a TrueType font program (latin-1
    * string view of its bytes). Caps mirror MaxCMapEntries: subtable walks
    * stop at hostile sizes instead of allocating them.
    */
  private def trueTypeCodeMap(ttf: String): Option[CidFont] = {
    val n = ttf.length
    def u8(i: Int): Int =
      if (i < 0 || i >= n) throw new IndexOutOfBoundsException(i.toString)
      else ttf.charAt(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Int = (u16(i) << 16) | u16(i + 2)
    if (n < 12) return None
    val numTables = math.min(u16(4), 64)
    val tables = (0 until numTables).flatMap { k =>
      val e = 12 + 16 * k
      if (e + 16 > n) None else Some(ttf.substring(e, e + 4) -> u32(e + 8))
    }.toMap
    val cmapOff = tables.getOrElse("cmap", return None)
    if (cmapOff < 0 || cmapOff + 4 > n) return None
    val nSub = math.min(u16(cmapOff + 2), 32)
    val subs: Map[(Int, Int), Int] = (0 until nSub).flatMap { k =>
      val e = cmapOff + 4 + 8 * k
      if (e + 8 > n) None
      else Some((u16(e), u16(e + 2)) -> (cmapOff + u32(e + 4)))
    }.toMap
    // one cmap subtable → char code → glyph id (formats 0/4/6/12)
    def parseSub(off: Int): Map[Int, Int] = try {
      if (off < 0 || off + 4 > n) return Map.empty
      val out = scala.collection.mutable.Map.empty[Int, Int]
      def put(c: Int, g: Int): Unit =
        if (g != 0 && c != 0xFFFF && out.size < MaxCMapEntries) out(c) = g
      u16(off) match {
        case 0 =>
          for (c <- 0 until 256) put(c, u8(off + 6 + c))
        case 4 =>
          val segX2 = u16(off + 6)
          val seg = segX2 / 2
          if (seg > 0 && seg <= 8192) {
            val endA = off + 14
            val startA = endA + segX2 + 2
            val deltaA = startA + segX2
            val rangeA = deltaA + segX2
            for (i <- 0 until seg) {
              val endC = u16(endA + 2 * i)
              val startC = u16(startA + 2 * i)
              val delta = u16(deltaA + 2 * i)
              val ro = u16(rangeA + 2 * i)
              var c = startC
              while (c <= endC && c < 0x10000 && out.size < MaxCMapEntries) {
                if (ro == 0) put(c, (c + delta) & 0xFFFF)
                else {
                  val addr = rangeA + 2 * i + ro + 2 * (c - startC)
                  if (addr + 1 < n) {
                    val g0 = u16(addr)
                    if (g0 != 0) put(c, (g0 + delta) & 0xFFFF)
                  }
                }
                c += 1
              }
            }
          }
        case 6 =>
          val first = u16(off + 6)
          val cnt = math.min(u16(off + 8), 0x10000)
          for (k <- 0 until cnt) put(first + k, u16(off + 10 + 2 * k))
        case 12 =>
          val nGroups = math.min(u32(off + 12), 0x10000)
          for (k <- 0 until nGroups) {
            val e = off + 16 + 12 * k
            val s = u32(e); val t = u32(e + 4); val g = u32(e + 8)
            var c = s
            while (c <= t && c - s < 256 && out.size < MaxCMapEntries) {
              put(c, g + (c - s)); c += 1
            }
          }
        case _ => ()
      }
      out.toMap
    } catch { case _: Exception => Map.empty }
    val uniToGid = subs.get((3, 1))
      .orElse(subs.collectFirst { case ((0, _), o) => o })
      .map(parseSub).getOrElse(Map.empty)
    val symGid = subs.get((3, 0)).map(parseSub).getOrElse(Map.empty)
    val macGid = subs.get((1, 0)).map(parseSub).getOrElse(Map.empty)
    // glyph → text: invert the Unicode subtable (lowest codepoint wins —
    // deterministic under double-mapped glyphs), post names fill the rest
    val gidToUni = scala.collection.mutable.Map.empty[Int, String]
    uniToGid.toSeq.sortBy(_._1).foreach { case (u, g) =>
      if (!gidToUni.contains(g) && u != 0xFFFF)
        gidToUni(g) = new String(Character.toChars(u))
    }
    for {
      (gid, name) <- postGlyphNames(ttf, tables.getOrElse("post", -1))
      if !gidToUni.contains(gid)
      s <- glyphToUnicode(name)
    } gidToUni(gid) = s
    // the PDF-side read is one byte per code (§9.6.6.4 lookup order:
    // symbol cmap at 0xF000|code then bare, Mac cmap, Unicode-as-code)
    val map = (0 to 255).flatMap { c =>
      symGid.get(0xF000 | c).orElse(symGid.get(c))
        .orElse(macGid.get(c)).orElse(uniToGid.get(c))
        .flatMap(gidToUni.get).map(c -> _)
    }.toMap
    if (map.isEmpty) None else Some(CidFont(1, map))
  }

  /** `post` format-2.0 glyph names: indices 0..257 are the standard
    * Macintosh order (its 3..97 span IS the printable-ASCII spine in code
    * order — the slice this parser resolves), 258+ index the table's own
    * Pascal-string names.
    */
  private def postGlyphNames(ttf: String, postOff: Int): Seq[(Int, String)] = try {
    val n = ttf.length
    def u8(i: Int): Int =
      if (i < 0 || i >= n) throw new IndexOutOfBoundsException(i.toString)
      else ttf.charAt(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Int = (u16(i) << 16) | u16(i + 2)
    if (postOff < 0 || postOff + 34 > n || u32(postOff) != 0x00020000) return Nil
    val numGlyphs = math.min(u16(postOff + 32), 0x10000)
    val idxA = postOff + 34
    if (idxA + 2 * numGlyphs > n) return Nil
    // the Pascal-string pool, in order, bounded by the table end
    val custom = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = idxA + 2 * numGlyphs
    while (p < n && custom.size < numGlyphs) {
      val len = u8(p)
      if (p + 1 + len > n) p = n
      else { custom += ttf.substring(p + 1, p + 1 + len); p += 1 + len }
    }
    (0 until numGlyphs).flatMap { gid =>
      val idx = u16(idxA + 2 * gid)
      if (idx >= 3 && idx <= 97) Some(gid -> AsciiGlyphNames(idx - 3))
      else if (idx >= 258 && idx - 258 < custom.size) Some(gid -> custom(idx - 258))
      else None
    }
  } catch { case _: Exception => Nil }

  // ---- embedded Type1/CFF font programs (r13 — the companion leg to
  //      FontFile2: a Type1 font with no /ToUnicode and no usable
  //      /Encoding carries its code→glyph-name mapping inside the font
  //      program itself — the cleartext /Encoding array of a /FontFile,
  //      or the charset/Encoding structures of a /FontFile3 CFF
  //      (Adobe TN#5176); reference delegates to pdf-parse,
  //      src/pdf-extractor.ts:1-56) ----

  private val FontFile3Re = "/FontFile3\\s+(\\d+)\\s+\\d+\\s+R".r
  private val FontFileRe = "/FontFile\\s+(\\d+)\\s+\\d+\\s+R".r

  /** Decode a simple font through its embedded Type1-family program:
    * /FontFile3 (CFF/Type1C — code → gid via the CFF Encoding, gid → SID
    * via the charset, SID → glyph name via the standard strings or the
    * String INDEX) or /FontFile (original Type1 — `dup code /name put`
    * entries in the cleartext portion). Glyph names resolve through the
    * same AGL subset + uniXXXX conventions as every other glyph path.
    * Anything unparseable degrades to None (raw read) — never a throw.
    */
  private def parseEmbeddedType1(fontBody: String,
                                 objectBody: Int => Option[String],
                                 streamContent: Int => Option[String]): Option[CidFont] =
    try {
      for {
        dm <- FontDescRefRe.findFirstMatchIn(fontBody)
        descNum <- scala.util.Try(dm.group(1).toInt).toOption
        desc <- objectBody(descNum)
        font <- {
          val viaCff = for {
            fm <- FontFile3Re.findFirstMatchIn(desc)
            num <- scala.util.Try(fm.group(1).toInt).toOption
            cff <- streamContent(num)
            f <- cffCodeMap(cff)
          } yield f
          viaCff.orElse(for {
            fm <- FontFileRe.findFirstMatchIn(desc)
            num <- scala.util.Try(fm.group(1).toInt).toOption
            t1 <- streamContent(num)
            f <- type1CodeMap(t1)
          } yield f)
        }
      } yield font
    } catch { case _: Exception => None }

  /** StandardEncoding's code → text for the built-in-default cases (CFF
    * encoding offset 0, Type1 `/Encoding StandardEncoding def`): the
    * printable-ASCII spine with the two spots where StandardEncoding
    * diverges from ASCII names (39 → quoteright, 96 → quoteleft; PDF 1.7
    * Annex D.2). Codes above 126 resolve only through a font's own
    * encoding — the declared degrade.
    */
  private lazy val StandardEncodingText: Map[Int, String] =
    (32 to 126).flatMap { c =>
      val name = c match {
        case 39 => "quoteright"
        case 96 => "quoteleft"
        case _  => AsciiGlyphNames(c - 32)
      }
      glyphToUnicode(name).map(c -> _)
    }.toMap

  /** The 1-byte code → text table of a CFF (Type1C) font program, latin-1
    * string view (Adobe TN#5176): header → Name/Top-DICT/String INDEXes →
    * charset (gid → SID, formats 0/1/2) + Encoding (code → gid, formats
    * 0/1 with supplements) → SID → name (standard strings 1..95 are the
    * ASCII spine; 391+ index the String INDEX; other predefined SIDs
    * degrade) → AGL text. Expert charsets/encodings and CID-keyed CFF
    * degrade to None.
    */
  private def cffCodeMap(cff: String): Option[CidFont] = try {
    val n = cff.length
    def u8(i: Int): Int =
      if (i < 0 || i >= n) throw new IndexOutOfBoundsException(i.toString)
      else cff.charAt(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (n < 4) return None
    val hdrSize = u8(2)
    // INDEX: count(u16) offSize(u8) offsets[count+1] data; returns the
    // (start, end) item spans plus the INDEX's own end position
    def readIndex(at: Int): (IndexedSeq[(Int, Int)], Int) = {
      val count = math.min(u16(at), 0x10000)
      if (count == 0) return (IndexedSeq.empty, at + 2)
      val offSize = u8(at + 2)
      if (offSize < 1 || offSize > 4) throw new IllegalArgumentException("offSize")
      def off(k: Int): Int = {
        var v = 0; var i = 0
        while (i < offSize) { v = (v << 8) | u8(at + 3 + k * offSize + i); i += 1 }
        v
      }
      val dataStart = at + 3 + (count + 1) * offSize - 1
      val items = (0 until count).map(k => (dataStart + off(k), dataStart + off(k + 1)))
      (items, dataStart + off(count))
    }
    val (_, afterName) = readIndex(hdrSize)
    val (topIdx, afterTop) = readIndex(afterName)
    val (strIdx, _) = readIndex(afterTop)
    val (topS, topE) = topIdx.headOption.getOrElse(return None)
    // Top DICT: operand stack → operator map (TN#5176 table 9 number
    // encodings; reals consumed structurally, value unused here)
    val dict = scala.collection.mutable.Map.empty[Int, List[Double]]
    locally {
      val ops = scala.collection.mutable.ListBuffer.empty[Double]
      var p = topS
      while (p < topE) {
        val b0 = u8(p)
        if (b0 <= 21) {
          val op = if (b0 == 12) { p += 1; 1200 + u8(p) } else b0
          dict(op) = ops.toList; ops.clear(); p += 1
        } else if (b0 == 28) { ops += ((u8(p + 1) << 8 | u8(p + 2)).toShort.toDouble); p += 3 }
        else if (b0 == 29) {
          ops += ((u8(p + 1) << 24) | (u8(p + 2) << 16) | (u8(p + 3) << 8) | u8(p + 4)).toDouble
          p += 5
        } else if (b0 == 30) { // real: nibbles until 0xf terminator
          p += 1
          var done = false
          while (!done && p < topE) {
            val b = u8(p); p += 1
            if ((b & 0xf0) == 0xf0 || (b & 0x0f) == 0x0f) done = true
          }
          ops += 0.0
        } else if (b0 >= 32 && b0 <= 246) { ops += (b0 - 139).toDouble; p += 1 }
        else if (b0 >= 247 && b0 <= 250) { ops += ((b0 - 247) * 256 + u8(p + 1) + 108).toDouble; p += 2 }
        else if (b0 >= 251 && b0 <= 254) { ops += (-(b0 - 251) * 256 - u8(p + 1) - 108).toDouble; p += 2 }
        else p += 1 // reserved byte: skip
      }
    }
    if (dict.contains(1230)) return None // ROS ⇒ CID-keyed CFF: no names
    val charStringsOff = dict.get(17).flatMap(_.headOption).map(_.toInt).getOrElse(return None)
    val (charStrings, _) = readIndex(charStringsOff)
    val nGlyphs = charStrings.size
    if (nGlyphs == 0) return None
    // charset: gid → SID (offset 0 = ISOAdobe ⇒ SID = gid; predefined
    // expert charsets degrade)
    val charsetOff = dict.get(15).flatMap(_.headOption).map(_.toInt).getOrElse(0)
    val sidOf = new Array[Int](nGlyphs)
    charsetOff match {
      case 0 => var g = 1; while (g < nGlyphs) { sidOf(g) = g; g += 1 }
      case 1 | 2 => return None
      case off =>
        u8(off) match {
          case 0 =>
            var g = 1
            while (g < nGlyphs) { sidOf(g) = u16(off + 1 + 2 * (g - 1)); g += 1 }
          case f @ (1 | 2) =>
            var g = 1; var p = off + 1
            while (g < nGlyphs) {
              val first = u16(p)
              val nLeft = if (f == 1) u8(p + 2) else u16(p + 2)
              p += (if (f == 1) 3 else 4)
              var k = 0
              while (k <= nLeft && g < nGlyphs) { sidOf(g) = first + k; g += 1; k += 1 }
            }
          case _ => return None
        }
    }
    def sidName(sid: Int): Option[String] =
      // the standard strings follow StandardEncoding NAMES, not ASCII:
      // SID 8 is quoteright and SID 65 quoteleft (TN#5176 Appendix A) —
      // the same two-spot divergence StandardEncodingText handles
      if (sid == 8) Some("quoteright")
      else if (sid == 65) Some("quoteleft")
      else if (sid >= 1 && sid <= 95) Some(AsciiGlyphNames(sid - 1))
      else if (sid >= 391 && sid - 391 < strIdx.size) {
        val (s, e) = strIdx(sid - 391)
        if (s >= 0 && e <= n && s <= e) Some(cff.substring(s, e)) else None
      } else None // predefined SIDs 96..390: outside the Latin envelope
    // Encoding: code → gid (offset 0 = Standard, 1 = Expert)
    val encodingOff = dict.get(16).flatMap(_.headOption).map(_.toInt).getOrElse(0)
    val map: Map[Int, String] = encodingOff match {
      case 0 => StandardEncodingText
      case 1 => return None
      case off =>
        val fmt = u8(off)
        val codeToGid = scala.collection.mutable.Map.empty[Int, Int]
        var supAt = -1
        (fmt & 0x7f) match {
          case 0 =>
            val nCodes = math.min(u8(off + 1), nGlyphs - 1)
            var i = 1
            while (i <= nCodes) { codeToGid(u8(off + 1 + i)) = i; i += 1 }
            supAt = off + 2 + nCodes
          case 1 =>
            val nRanges = u8(off + 1)
            var gid = 1; var r = 0
            while (r < nRanges && gid < nGlyphs) {
              val first = u8(off + 2 + 2 * r); val nLeft = u8(off + 3 + 2 * r)
              var k = 0
              while (k <= nLeft && gid < nGlyphs) {
                codeToGid(first + k) = gid; gid += 1; k += 1
              }
              r += 1
            }
            supAt = off + 2 + 2 * nRanges
          case _ => return None
        }
        val out = scala.collection.mutable.Map.empty[Int, String]
        for ((c, g) <- codeToGid; if g < nGlyphs; nm <- sidName(sidOf(g));
             s <- glyphToUnicode(nm)) out(c) = s
        if ((fmt & 0x80) != 0 && supAt >= 0) { // supplements: code → SID
          val nSups = u8(supAt)
          var k = 0
          while (k < nSups) {
            val c = u8(supAt + 1 + 3 * k); val sid = u16(supAt + 2 + 3 * k)
            for (nm <- sidName(sid); s <- glyphToUnicode(nm)) out(c) = s
            k += 1
          }
        }
        out.toMap
    }
    if (map.isEmpty) None else Some(CidFont(1, map))
  } catch { case _: Exception => None }

  /** The 1-byte code → text table of an original Type1 font program: the
    * built-in /Encoding lives in the CLEARTEXT portion (before `eexec`) as
    * `dup code /name put` entries, or as `/Encoding StandardEncoding def`.
    * The encrypted charstrings are never needed — names are the text
    * channel.
    */
  private def type1CodeMap(t1: String): Option[CidFont] = try {
    val eexec = t1.indexOf("eexec")
    val clear = if (eexec < 0) t1 else t1.substring(0, eexec)
    if ("/Encoding\\s+StandardEncoding\\s+def".r.findFirstIn(clear).isDefined)
      Some(CidFont(1, StandardEncodingText))
    else {
      val map = "dup\\s+(\\d+)\\s*/([^\\s/]+)\\s+put".r.findAllMatchIn(clear).flatMap { m =>
        for {
          code <- scala.util.Try(m.group(1).toInt).toOption
          if code >= 0 && code <= 255
          s <- glyphToUnicode(m.group(2))
        } yield code -> s
      }.toMap
      if (map.isEmpty) None else Some(CidFont(1, map))
    }
  } catch { case _: Exception => None }

  /** Mapping-entry cap: a hostile CMap must not expand into unbounded
    * driver/executor state (64k codes ≫ any real subset font).
    */
  private val MaxCMapEntries = 1 << 17

  /** Parse a ToUnicode CMap: code width from the first codespacerange
    * (default 2 — the Type0 norm), then `bfchar` pairs and `bfrange`
    * entries in both forms (`<lo> <hi> <dstStart>` incrementing the last
    * UTF-16 unit, and `<lo> <hi> [<d1> <d2> …]` explicit arrays). The
    * combined regex consumes array bodies whole, so their inner hex
    * strings can never be re-read as lo/hi pairs. None when no mapping
    * parses (font stays unmapped → raw read).
    */
  private def parseToUnicodeCMap(payload: String): Option[CidFont] = {
    try {
      // no parseable codespacerange → leave the font UNMAPPED (raw
      // one-byte read): guessing 2 bytes would regroup a simple font's
      // one-byte codes into bogus pairs and silently drop all its text
      val codeBytes = "begincodespacerange\\s*<([0-9A-Fa-f]+)>".r
        .findFirstMatchIn(payload).map(_.group(1).length / 2)
        .filter(b => b >= 1 && b <= 2).getOrElse(return None)
      val map = scala.collection.mutable.Map.empty[Int, String]
      def utf16be(hex: String): String = {
        val h = if (hex.length % 4 == 0) hex else hex.reverse.padTo((hex.length + 3) / 4 * 4, '0').reverse
        h.grouped(4).map(u => Integer.parseInt(u, 16).toChar).mkString
      }
      "beginbfchar([\\s\\S]*?)endbfchar".r.findAllMatchIn(payload).foreach { sec =>
        "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>".r.findAllMatchIn(sec.group(1)).foreach { m =>
          if (map.size < MaxCMapEntries)
            map(Integer.parseInt(m.group(1), 16)) = utf16be(m.group(2))
        }
      }
      val entry = ("<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*" +
        "(?:<([0-9A-Fa-f]+)>|\\[((?:\\s*<[0-9A-Fa-f]+>)+)\\s*\\])").r
      "beginbfrange([\\s\\S]*?)endbfrange".r.findAllMatchIn(payload).foreach { sec =>
        entry.findAllMatchIn(sec.group(1)).foreach { m =>
          val lo = Integer.parseInt(m.group(1), 16)
          val hi = Integer.parseInt(m.group(2), 16)
          if (hi >= lo && hi - lo <= 0xFFFF) {
            if (m.group(3) != null) {
              val dst = utf16be(m.group(3))
              var c = lo
              while (c <= hi && map.size < MaxCMapEntries) {
                val inc = c - lo
                val mapped =
                  if (dst.isEmpty) ""
                  else dst.dropRight(1) + ((dst.last + inc) & 0xFFFF).toChar
                map(c) = mapped
                c += 1
              }
            } else {
              val dsts = "<([0-9A-Fa-f]+)>".r.findAllMatchIn(m.group(4))
                .map(_.group(1)).toSeq
              dsts.zipWithIndex.foreach { case (d, i) =>
                if (lo + i <= hi && map.size < MaxCMapEntries)
                  map(lo + i) = utf16be(d)
              }
            }
          }
        }
      }
      if (map.isEmpty) None else Some(CidFont(codeBytes, map.toMap))
    } catch { case _: Exception => None }
  }

  /** Inflated-size cap: a content stream is operators + strings, never
    * gigabytes — a tiny zlib bomb must degrade (None), not OOM the executor.
    */
  private val MaxInflated = 64 << 20

  /** The stream's declared filter chain in DECODE order — a single name
    * (`/Filter/FlateDecode`) or an array (`/Filter[/ASCIIHexDecode
    * /FlateDecode]`, first listed applied first). `Some(empty)` = no
    * filter (raw stream). None = the dict DECLARES a /Filter the parser
    * cannot resolve — an indirect reference (`/Filter 7 0 R`, legal per
    * spec) or malformed syntax. The distinction matters: "no filter" scans
    * the bytes as text, while "undecodable filter" must degrade to empty
    * text — otherwise compressed bytes that happen to contain `BT` would
    * masquerade as show operators.
    */
  private def filterChain(dict: String): Option[Seq[String]] =
    if (!dict.contains("/Filter")) Some(Seq.empty)
    else "/Filter\\s*(\\[[^\\]]*\\]|/[A-Za-z0-9]+)".r.findFirstMatchIn(dict) match {
      case Some(m) =>
        Some("/([A-Za-z0-9]+)".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
      case None => None // indirect or malformed /Filter — cannot trust the bytes
    }

  /** Apply the declared chain in order. Unknown filters (DCTDecode,
    * JBIG2Decode, …) answer None — degrade to empty text, never scan
    * compressed bytes as if they were operators. `Crypt` passes through
    * (decryption is the layer above). `dict` supplies the DecodeParms the
    * chain needs: LZW's /EarlyChange, and the /Predictor guard — a
    * predictor (>1) restructures the decoded bytes row-wise, so a content
    * stream declaring one degrades rather than scanning shuffled bytes.
    */
  private def decodeFilters(raw: Array[Byte], filters: Seq[String],
                            dict: String = ""): Option[Array[Byte]] = {
    val predictor = "/Predictor\\s+(\\d+)".r.findFirstMatchIn(dict)
      .flatMap(m => scala.util.Try(m.group(1).toInt).toOption).getOrElse(1)
    if (filters.nonEmpty && predictor > 1) return None
    val early = "/EarlyChange\\s+(\\d+)".r.findFirstMatchIn(dict)
      .flatMap(m => scala.util.Try(m.group(1).toInt).toOption).getOrElse(1)
    filters.foldLeft(Option(raw)) { (acc, f) =>
      acc.flatMap(data => f match {
        case "FlateDecode" | "Fl" => inflate(data)
        case "LZWDecode" | "LZW" => lzwDecode(data, early)
        case "RunLengthDecode" | "RL" => runLengthDecode(data)
        case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
        case "Crypt" => Some(data)
        case _ => None
      })
    }
  }

  /** LZWDecode (PDF 1.7 §7.4.4 / TIFF LZW): 9→12-bit variable-width codes,
    * 256 = clear-table, 257 = EOD, code width grows when the next-free
    * code reaches the capacity minus `earlyChange` (PDF default 1 — one
    * code early; /DecodeParms /EarlyChange 0 selects the late switch).
    * Handles the KwKwK self-reference case; None on out-of-range codes or
    * output past [[MaxInflated]] (bomb guard). Missing EOD is tolerated —
    * real writers sometimes end at the byte boundary.
    */
  private[graft] def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
    val table = new Array[Array[Byte]](4096)
    var nextCode = 258
    var codeBits = 9
    def widthFor(n: Int): Int =
      if (n + earlyChange < 512) 9
      else if (n + earlyChange < 1024) 10
      else if (n + earlyChange < 2048) 11
      else 12
    var prev: Array[Byte] = null
    var buf = 0L
    var nbits = 0
    var i = 0
    while (i < data.length) {
      buf = (buf << 8) | (data(i) & 0xffL); nbits += 8; i += 1
      while (nbits >= codeBits) {
        val code = ((buf >>> (nbits - codeBits)) & ((1L << codeBits) - 1)).toInt
        nbits -= codeBits
        if (code == 256) {
          // stale entries above nextCode are unreachable (guarded below)
          nextCode = 258; codeBits = 9; prev = null
        } else if (code == 257) {
          return Some(out.toByteArray)
        } else {
          val entry: Array[Byte] =
            if (code < 256) Array(code.toByte)
            else if (code >= 258 && code < nextCode && table(code) != null) table(code)
            else if (code == nextCode && prev != null) prev :+ prev(0) // KwKwK
            else return None
          out.write(entry, 0, entry.length)
          if (out.size > MaxInflated) return None
          if (prev != null && nextCode < 4096) {
            table(nextCode) = prev :+ entry(0)
            nextCode += 1
          }
          prev = entry
          codeBits = widthFor(nextCode)
        }
      }
    }
    Some(out.toByteArray)
  }

  /** RunLengthDecode (PDF 1.7 §7.4.5): length byte L — L<128 copies the
    * next L+1 literal bytes; L>128 repeats the next byte 257−L times;
    * L=128 is EOD. None on a truncated run; missing EOD tolerated.
    */
  private[graft] def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 2))
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xff
      if (l == 128) return Some(out.toByteArray) // EOD
      else if (l < 128) {
        if (i + 1 + l + 1 > data.length) return None
        out.write(data, i + 1, l + 1)
        i += l + 2
      } else {
        if (i + 1 >= data.length) return None
        var n = 257 - l
        val b = data(i + 1)
        while (n > 0) { out.write(b); n -= 1 }
        i += 2
      }
      if (out.size > MaxInflated) return None
    }
    Some(out.toByteArray)
  }

  /** ASCIIHexDecode: whitespace-tolerant hex text → bytes, terminated by
    * `>` (an odd final digit pads with 0 per spec). None on any non-hex,
    * non-whitespace byte before the terminator — degrade, never throw.
    */
  private def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2)
    var hi = -1
    var i = 0
    while (i < data.length) {
      val ch = data(i).toChar
      if (ch == '>') i = data.length // EOD
      else {
        val d = Character.digit(ch, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        } else if (!ch.isWhitespace && ch != '\u0000') return None // PDF ws incl. NUL
        i += 1
      }
    }
    if (hi >= 0) out.write(hi << 4) // odd digit: pad with 0
    Some(out.toByteArray)
  }

  /** zlib-inflate, tolerant of trailing garbage; None on corrupt data or
    * output past [[MaxInflated]]. Inflater released on every path.
    */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (out.size().toLong + n > MaxInflated) return None // decompression bomb
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return Some(out.toByteArray) // stalled
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
    finally inf.end()
  }

  /** Append every shown string of one content stream to `out`, separating
    * show operations with single spaces. Strings accumulate in `pending`
    * until their operator arrives: the show operators flush them into the
    * output, any other operator discards them (they were its operands —
    * e.g. a dictionary value — not page text). Numbers, names (`/F1`), and
    * array brackets are operands and leave `pending` alone, which is
    * exactly what `[(…) -120 (…)] TJ` needs.
    */
  private def appendShownText(c: String, out: StringBuilder,
                              fonts: Map[String, CidFont] = Map.empty): Unit = {
    val pending = new StringBuilder
    // the font selected by the most recent `/Name size Tf` — None (raw
    // one-byte read) until a MAPPED font is selected; reset by a Tf that
    // names an unmapped font, because its string bytes are its own
    var curFont: Option[CidFont] = None
    var lastName = ""
    def flush(): Unit =
      if (pending.nonEmpty) {
        if (out.nonEmpty) out += ' '
        out ++= pending.result(); pending.clear()
      }
    // a parsed string's raw chars (one per byte), routed through the
    // active font: CID fonts regroup into code-width units and remap via
    // the CMap (unmapped codes drop — a glyph with no Unicode target has
    // no text), unmapped fonts keep the raw read
    def decode(raw: String): String = curFont match {
      case None => raw
      case Some(f) =>
        val sb = new StringBuilder(raw.length)
        var i = 0
        while (i + f.codeBytes <= raw.length) {
          var code = 0
          var j = 0
          while (j < f.codeBytes) { code = (code << 8) | (raw.charAt(i + j) & 0xff); j += 1 }
          f.map.get(code).foreach(sb ++= _)
          i += f.codeBytes
        }
        sb.result() // trailing partial code (malformed) drops
    }
    val rawBuf = new StringBuilder
    var i = 0
    val n = c.length
    while (i < n) {
      c.charAt(i) match {
        case '(' =>
          rawBuf.clear()
          i = parseLiteral(c, i + 1, rawBuf)
          pending ++= decode(rawBuf.result())
        case '<' =>
          if (i + 1 < n && c.charAt(i + 1) == '<') i += 2 // dict open — skip
          else {
            rawBuf.clear()
            i = parseHex(c, i + 1, rawBuf)
            pending ++= decode(rawBuf.result())
          }
        case '>' =>
          i += 1 // dict close halves — structure, skip
        case '%' => // comment runs to EOL
          while (i < n && c.charAt(i) != '\n' && c.charAt(i) != '\r') i += 1
        case '/' => // name operand — consume (remember it: Tf's operand)
          i += 1
          val start = i
          while (i < n && !isDelim(c.charAt(i))) i += 1
          lastName = c.substring(start, i)
        case ch if ch.isLetter || ch == '\'' || ch == '"' || ch == '*' =>
          val start = i
          while (i < n && (c.charAt(i).isLetterOrDigit || c.charAt(i) == '*' ||
            c.charAt(i) == '\'' || c.charAt(i) == '"')) i += 1
          c.substring(start, i) match {
            case "Tj" | "TJ" | "'" | "\"" => flush()
            case "Tf" =>
              curFont = fonts.get(lastName)
              pending.clear() // operands, not text
            case _ => pending.clear() // other operator: strings were operands
          }
        case _ =>
          i += 1 // whitespace, numbers, [, ] — operands or structure
      }
    }
  }

  private def isDelim(ch: Char): Boolean =
    ch.isWhitespace || "()<>[]{}/%".indexOf(ch) >= 0

  // ---- builder (round-trip harness + driver query's encode side) ----

  /** Minimal classic-xref PDF: one page object per content stream, correct
    * direct /Length entries, optional FlateDecode. The envelope [[extract]]
    * reads — used by the `pdf_decode_real` driver query's encode side and
    * the specs' handcrafted documents.
    */
  def buildPdf(contentStreams: Seq[Array[Byte]], flate: Boolean): Array[Byte] =
    buildPdf(contentStreams, if (flate) Seq("FlateDecode") else Seq.empty)

  /** The filter-chain builder: `filters` is the DECODE-order chain to
    * declare (`/Filter/X` or `/Filter[/X/Y]`), so the builder applies the
    * matching encoders in REVERSE. Supports the full decodable envelope —
    * FlateDecode, LZWDecode, RunLengthDecode, ASCIIHexDecode — which is
    * what lets the round-trip specs and the driver's encode rotation
    * exercise every filter leg against one oracle.
    */
  def buildPdf(contentStreams: Seq[Array[Byte]], filters: Seq[String]): Array[Byte] = {
    def encode(data: Array[Byte]): Array[Byte] =
      filters.reverse.foldLeft(data) { (d, f) =>
        f match {
          case "FlateDecode" => deflate(d)
          case "LZWDecode" => lzwEncode(d)
          case "RunLengthDecode" => runLengthEncode(d)
          case "ASCIIHexDecode" =>
            (d.map(b => f"${b & 0xff}%02x").mkString + ">").getBytes(Latin1)
          case other => throw new IllegalArgumentException(s"no encoder for $other")
        }
      }
    val filterEntry =
      if (filters.isEmpty) ""
      else if (filters.length == 1) s"/Filter/${filters.head}"
      else filters.map("/" + _).mkString("/Filter[", "", "]")
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(Latin1))
    w("%PDF-1.4\n")
    w("1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    val kids = contentStreams.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj<</Type/Pages/Kids[$kids]/Count ${contentStreams.length}>>endobj\n")
    contentStreams.zipWithIndex.foreach { case (c, i) =>
      val pageId = 3 + 2 * i
      val streamId = pageId + 1
      w(s"$pageId 0 obj<</Type/Page/Parent 2 0 R/Contents $streamId 0 R>>endobj\n")
      val body = encode(c)
      w(s"$streamId 0 obj<</Length ${body.length}$filterEntry>>stream\n")
      out.write(body)
      w("\nendstream endobj\n")
    }
    w("trailer<</Root 1 0 R>>\n%%EOF")
    out.toByteArray
  }

  /** A PDF 1.5 document the way modern writers emit it: the catalog, page
    * tree, and page dictionaries packed into a `/Type/ObjStm` OBJECT stream
    * (Flate), content streams top-level (Flate), and a cross-reference
    * STREAM (`/W [1 2 1]`, optional PNG `/Predictor 12`) as the only xref —
    * there is no classic `xref` table, so a reader that cannot decode the
    * xref stream and walk the ObjStm sees no page objects at all. With
    * `indirectLength`, the first content stream's `/Length` is an indirect
    * reference whose value object is only findable through the xref table.
    * Used by the spec fixtures; [[extract]] is the consumer. `rawFirst`
    * leaves the first content stream UNcompressed — paired with
    * `indirectLength` and a decoy "endstream" inside the page text, it
    * builds the document whose stream bounds are only recoverable through
    * the xref table (the endstream scan truncates mid-stream).
    */
  def buildModernPdf(contentStreams: Seq[Array[Byte]], predictor: Boolean,
                     indirectLength: Boolean = false,
                     rawFirst: Boolean = false): Array[Byte] = {
    val p = contentStreams.length
    require(p > 0, "at least one page")
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(Latin1))
    val offsets = scala.collection.mutable.Map.empty[Int, Int] // objNum -> byte offset
    // ids: 1 catalog, 2 pages, 3..2+p page dicts (all inside the ObjStm);
    // 10..9+p content streams; 30 indirect-length value; 50 ObjStm; 51 XRef
    w("%PDF-1.5\n")
    contentStreams.zipWithIndex.foreach { case (c, i) =>
      val id = 10 + i
      offsets(id) = out.size()
      val raw = rawFirst && i == 0
      val body = if (raw) c else deflate(c)
      val filter = if (raw) "" else "/Filter/FlateDecode"
      if (indirectLength && i == 0) {
        w(s"$id 0 obj<</Length 30 0 R$filter>>stream\n")
        out.write(body)
        w("\nendstream endobj\n")
        offsets(30) = out.size()
        w(s"30 0 obj ${body.length} endobj\n")
      } else {
        w(s"$id 0 obj<</Length ${body.length}$filter>>stream\n")
        out.write(body)
        w("\nendstream endobj\n")
      }
    }
    // the object stream: pair table then the serialized member objects
    val kids = (0 until p).map(i => s"${3 + i} 0 R").mkString(" ")
    val members = Seq(
      1 -> s"<</Type/Catalog/Pages 2 0 R>>",
      2 -> s"<</Type/Pages/Kids[$kids]/Count $p>>") ++
      (0 until p).map(i => (3 + i) -> s"<</Type/Page/Parent 2 0 R/Contents ${10 + i} 0 R>>")
    val bodyParts = members.map(_._2)
    val memberOffsets = bodyParts.scanLeft(0)(_ + _.length + 1).init
    val pairs = members.map(_._1).zip(memberOffsets)
      .map { case (num, off) => s"$num $off" }.mkString(" ") + "\n"
    val objStmPayload = (pairs + bodyParts.mkString("\n") + "\n").getBytes(Latin1)
    val objStmBody = deflate(objStmPayload)
    offsets(50) = out.size()
    w(s"50 0 obj<</Type/ObjStm/N ${members.length}/First ${pairs.length}" +
      s"/Length ${objStmBody.length}/Filter/FlateDecode>>stream\n")
    out.write(objStmBody)
    w("\nendstream endobj\n")
    // the cross-reference stream: one row per object 0..51, W=[1 2 1]
    offsets(51) = out.size()
    val size = 52
    val rows = (0 until size).map { objNum =>
      if (objNum == 0) (0, 0, 255) // free-list head
      else if (offsets.contains(objNum)) (1, offsets(objNum), 0)
      else if (objNum >= 1 && objNum <= 2 + p)
        (2, 50, members.indexWhere(_._1 == objNum)) // lives in the ObjStm
      else (0, 0, 0)
    }
    val rowLen = 4 // 1 + 2 + 1
    val table = new Array[Byte](size * rowLen)
    rows.zipWithIndex.foreach { case ((t, f2, f3), i) =>
      table(i * rowLen) = t.toByte
      table(i * rowLen + 1) = ((f2 >> 8) & 0xff).toByte
      table(i * rowLen + 2) = (f2 & 0xff).toByte
      table(i * rowLen + 3) = (f3 & 0xff).toByte
    }
    val encoded =
      if (!predictor) table
      else {
        // PNG Up filter (2) on every row — the shape real writers emit
        val enc = new Array[Byte](size * (rowLen + 1))
        for (r <- 0 until size; i <- 0 until rowLen) {
          enc(r * (rowLen + 1)) = 2
          val prev = if (r > 0) table((r - 1) * rowLen + i) & 0xff else 0
          enc(r * (rowLen + 1) + 1 + i) = (((table(r * rowLen + i) & 0xff) - prev) & 0xff).toByte
        }
        enc
      }
    val xrefBody = deflate(encoded)
    val parms = if (predictor) s"/DecodeParms<</Predictor 12/Columns $rowLen>>" else ""
    w(s"51 0 obj<</Type/XRef/Size $size/Root 1 0 R/W[1 2 1]$parms" +
      s"/Length ${xrefBody.length}/Filter/FlateDecode>>stream\n")
    out.write(xrefBody)
    w("\nendstream endobj\n")
    w(s"startxref\n${offsets(51)}\n%%EOF")
    out.toByteArray
  }

  /** A complete one-page PDF whose text is shown through a composite
    * (Type0/Identity-H) font — the modern subset-font shape where string
    * bytes are 2-byte codes meaningless without the `/ToUnicode` CMap.
    * Codes are `char + 0x100` (NOT the char values: a reader that skips
    * the CMap and reads bytes raw cannot accidentally round-trip), mapped
    * back by a `bfrange` for the run at 0x20–0x4F and `bfchar` entries
    * for every other distinct char — both CMap entry forms are exercised
    * by any text spanning the split. Encodable chars are BMP below 0xFE00
    * (the +0x100 offset must not wrap); anything above degrades to a
    * space — NEVER a throw, since this runs inside executor tasks
    * (`Multimodal.pdfEncode`) whose other encode forms also never throw.
    * The oracle gate feeds printable ASCII, so the gate never degrades.
    * Consumed by [[extract]]'s font table; used by the `pdf_decode_real`
    * gate's encode rotation and the spec fixtures.
    */
  def buildCidPdf(text0: String, flate: Boolean = true): Array[Byte] = {
    val text = text0.map(ch => if (ch >= 0xFE00) ' ' else ch)
    val content =
      ("BT /F1 12 Tf <" + text.map(ch => f"${ch.toInt + 0x100}%04X").mkString +
        "> Tj ET").getBytes(Latin1)
    val rangeLo = 0x20; val rangeHi = 0x4F
    val extras = text.filter(ch => ch < rangeLo || ch > rangeHi).distinct.sorted
    val cmap = new StringBuilder
    cmap ++= "/CIDInit /ProcSet findresource begin\nbegincmap\n"
    cmap ++= "/CMapName /GraftToUnicode def\n"
    cmap ++= "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    cmap ++= f"1 beginbfrange\n<${rangeLo + 0x100}%04X> <${rangeHi + 0x100}%04X> <$rangeLo%04X>\nendbfrange\n"
    if (extras.nonEmpty) {
      cmap ++= s"${extras.length} beginbfchar\n"
      extras.foreach(ch => cmap ++= f"<${ch.toInt + 0x100}%04X> <${ch.toInt}%04X>\n")
      cmap ++= "endbfchar\n"
    }
    cmap ++= "endcmap\nend\n"
    val cmapBytes = cmap.result().getBytes(Latin1)
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(Latin1))
    def stream(id: Int, payload: Array[Byte], extraDict: String): Unit = {
      val body = if (flate) deflate(payload) else payload
      val filter = if (flate) "/Filter/FlateDecode" else ""
      w(s"$id 0 obj<</Length ${body.length}$filter$extraDict>>stream\n")
      out.write(body)
      w("\nendstream endobj\n")
    }
    w("%PDF-1.4\n")
    w("1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    w("2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n")
    w("3 0 obj<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>" +
      "/Contents 4 0 R>>endobj\n")
    stream(4, content, "")
    w("5 0 obj<</Type/Font/Subtype/Type0/BaseFont/GraftCID" +
      "/Encoding/Identity-H/ToUnicode 6 0 R>>endobj\n")
    stream(6, cmapBytes, "")
    w("trailer<</Root 1 0 R>>\n%%EOF")
    out.toByteArray
  }

  /** A one-page document shown through a SIMPLE font whose text is only
    * recoverable via its `/Encoding` glyph map — no ToUnicode anywhere
    * (r12 fixture for the glyph-map decode leg). `differences = true`
    * writes every byte shifted into 128..222 and a `/Differences` array
    * that names the printable-ASCII glyphs back into place, so a reader
    * that ignores the encoding recovers garbage, not the text;
    * `differences = false` writes windows-1252 bytes under a bare
    * `/Encoding/WinAnsiEncoding`. `indirectEncoding` moves the encoding
    * dictionary behind an object reference (the common writer shape).
    * Text chars outside the form's envelope become spaces.
    */
  def buildSimpleFontPdf(text0: String, differences: Boolean,
                         flate: Boolean = true,
                         indirectEncoding: Boolean = false): Array[Byte] = {
    val winAnsi = java.nio.charset.Charset.forName("windows-1252")
    val (bytes: Array[Byte], encodingEntry: String) =
      if (differences) {
        val t = text0.map(ch => if (ch >= 32 && ch <= 126) ch else ' ')
        val names = AsciiGlyphNames.map("/" + _).mkString(" ")
        (t.map(ch => (128 + ch - 32).toByte).toArray,
          s"<</Type/Encoding/Differences[128 $names]>>")
      } else {
        val enc = winAnsi.newEncoder()
        val t = text0.map(ch => if (enc.canEncode(ch)) ch else ' ')
        (t.toString.getBytes(winAnsi), "/WinAnsiEncoding")
      }
    val content =
      ("BT /F1 12 Tf <" + bytes.map(b => f"${b & 0xff}%02X").mkString +
        "> Tj ET").getBytes(Latin1)
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(Latin1))
    w("%PDF-1.4\n")
    w("1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    w("2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n")
    w("3 0 obj<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>" +
      "/Contents 4 0 R>>endobj\n")
    val body = if (flate) deflate(content) else content
    val filter = if (flate) "/Filter/FlateDecode" else ""
    w(s"4 0 obj<</Length ${body.length}$filter>>stream\n")
    out.write(body)
    w("\nendstream endobj\n")
    val encRef = if (indirectEncoding) "7 0 R" else encodingEntry
    w(s"5 0 obj<</Type/Font/Subtype/Type1/BaseFont/Helvetica" +
      s"/Encoding $encRef>>endobj\n")
    if (indirectEncoding) w(s"7 0 obj$encodingEntry endobj\n")
    w("trailer<</Root 1 0 R>>\n%%EOF")
    out.toByteArray
  }

  /** A one-page document shown through a symbolic TrueType font whose
    * mapping lives ONLY inside its embedded /FontFile2 program (r13
    * fixture for the embedded-font leg): no ToUnicode, no /Encoding. Every
    * distinct char gets a PRIVATE code (128+k) and a non-trivial glyph id;
    * the font's (3,0) cmap maps 0xF000|code → gid, and gid maps back to
    * text through the (3,1) Unicode subtable's inverse (`viaPost = false`)
    * or through `post` format-2.0 glyph names (`viaPost = true`) — a
    * reader without the TrueType tables recovers garbage, not the text.
    * Chars outside printable ASCII become spaces.
    */
  def buildTrueTypePdf(text0: String, viaPost: Boolean = false,
                       flate: Boolean = true): Array[Byte] = {
    val t = text0.map(ch => if (ch >= 32 && ch <= 126) ch else ' ')
    val chars = t.distinct.sorted
    val code = chars.zipWithIndex.map { case (ch, i) => ch -> (128 + i) }.toMap
    val gid = chars.zipWithIndex.map { case (ch, i) => ch -> (5 + 3 * i) }.toMap
    def u16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Int): Array[Byte] = u16((v >> 16) & 0xffff) ++ u16(v & 0xffff)
    // cmap format-4 subtable: one single-code segment per mapping plus the
    // required 0xFFFF terminal (delta 1 → maps to gid 0)
    def format4(m: Seq[(Int, Int)]): Array[Byte] = {
      val segs = m.sortBy(_._1) :+ (0xFFFF, 0x10000) // terminal: delta 1 → gid 0
      val sc = segs.length
      val b = new java.io.ByteArrayOutputStream()
      b.write(u16(4)); b.write(u16(16 + 8 * sc)); b.write(u16(0))
      b.write(u16(sc * 2)); b.write(u16(0)); b.write(u16(0)); b.write(u16(0))
      segs.foreach { case (c, _) => b.write(u16(c)) } // endCode
      b.write(u16(0)) // reservedPad
      segs.foreach { case (c, _) => b.write(u16(c)) } // startCode
      segs.foreach { case (c, g) => b.write(u16((g - c) & 0xFFFF)) } // idDelta
      segs.foreach(_ => b.write(u16(0))) // idRangeOffset
      b.toByteArray
    }
    val symSub = format4(chars.map(ch => (0xF000 | code(ch), gid(ch))))
    val uniSub = format4(chars.map(ch => (ch.toInt, gid(ch))))
    val subList: Seq[((Int, Int), Array[Byte])] =
      if (viaPost) Seq((3, 0) -> symSub)
      else Seq((3, 0) -> symSub, (3, 1) -> uniSub)
    val cmapTable = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(u16(0)); b.write(u16(subList.length))
      var off = 4 + 8 * subList.length
      subList.foreach { case ((p, e), body) =>
        b.write(u16(p)); b.write(u16(e)); b.write(u32(off)); off += body.length
      }
      subList.foreach { case (_, body) => b.write(body) }
      b.toByteArray
    }
    val postTable: Option[Array[Byte]] = if (!viaPost) None else Some {
      // empty text → no glyphs beyond .notdef; max on an empty Map would
      // throw and break the encode rotation's never-throw contract
      val numGlyphs = (gid.values.toSeq :+ 0).max + 1
      val byGid = gid.map(_.swap)
      val b = new java.io.ByteArrayOutputStream()
      b.write(u32(0x00020000)); b.write(new Array[Byte](28)) // header rest
      b.write(u16(numGlyphs))
      val names = chars.map(ch => AsciiGlyphNames(ch - 32))
      (0 until numGlyphs).foreach { g =>
        b.write(u16(byGid.get(g).map(ch => 258 + chars.indexOf(ch)).getOrElse(0)))
      }
      names.foreach { nm => b.write(nm.length); b.write(nm.getBytes(Latin1)) }
      b.toByteArray
    }
    val ttfTables = Seq("cmap" -> cmapTable) ++ postTable.map("post" -> _)
    val ttf = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(u32(0x00010000)); b.write(u16(ttfTables.length))
      b.write(u16(0)); b.write(u16(0)); b.write(u16(0)) // search fields unused
      var off = 12 + 16 * ttfTables.length
      ttfTables.foreach { case (tag, body) =>
        b.write(tag.getBytes(Latin1)); b.write(u32(0)) // checksum unchecked
        b.write(u32(off)); b.write(u32(body.length))
        off += body.length
      }
      ttfTables.foreach { case (_, body) => b.write(body) }
      b.toByteArray
    }
    val content = ("BT /F1 12 Tf <" +
      t.map(ch => f"${code(ch)}%02X").mkString + "> Tj ET").getBytes(Latin1)
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(Latin1))
    def stream(id: Int, payload: Array[Byte], compress: Boolean): Unit = {
      val body = if (compress) deflate(payload) else payload
      val filter = if (compress) "/Filter/FlateDecode" else ""
      w(s"$id 0 obj<</Length ${body.length}$filter>>stream\n")
      out.write(body)
      w("\nendstream endobj\n")
    }
    w("%PDF-1.4\n")
    w("1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    w("2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n")
    w("3 0 obj<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>" +
      "/Contents 4 0 R>>endobj\n")
    stream(4, content, flate)
    w("5 0 obj<</Type/Font/Subtype/TrueType/BaseFont/GraftTT" +
      "/FirstChar 128/FontDescriptor 6 0 R>>endobj\n")
    w("6 0 obj<</Type/FontDescriptor/FontName/GraftTT/Flags 4" +
      "/FontFile2 7 0 R>>endobj\n")
    stream(7, ttf, flate)
    w("trailer<</Root 1 0 R>>\n%%EOF")
    out.toByteArray
  }

  /** A one-page document shown through a Type1-family font whose mapping
    * lives ONLY inside its embedded font program (r13 fixture for the
    * FontFile/FontFile3 leg): no ToUnicode, no /Encoding, and every
    * distinct char shown under a PRIVATE code (0xA0+k) so a reader
    * without the font program recovers garbage.
    *
    *   - `viaCff = true`: a /FontFile3 (Subtype/Type1C) CFF program —
    *     Encoding format 0 maps code → gid, charset format 0 maps gid →
    *     SID, and SIDs alternate between the STANDARD strings (1..95) and
    *     CUSTOM String-INDEX entries, so both name arms are under the
    *     oracle in one form;
    *   - `viaCff = false`: an original /FontFile Type1 program — the
    *     cleartext portion's `dup code /name put` encoding entries are
    *     the mapping (the eexec-encrypted tail is opaque filler, exactly
    *     as in a real font: charstrings are never the text channel).
    */
  def buildType1Pdf(text0: String, viaCff: Boolean = true,
                    flate: Boolean = true): Array[Byte] = {
    val t = text0.map(ch => if (ch >= 32 && ch <= 126) ch else ' ')
    val chars = t.distinct.sorted
    val code = chars.zipWithIndex.map { case (ch, i) => ch -> (0xA0 + i) }.toMap
    def u16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val fontProgram: Array[Byte] = if (viaCff) {
      // INDEX with offSize 2 (count, offSize, count+1 offsets, data)
      def index(items: Seq[Array[Byte]]): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(u16(items.length))
        if (items.nonEmpty) {
          b.write(2)
          var off = 1
          b.write(u16(off))
          items.foreach { it => off += it.length; b.write(u16(off)) }
          items.foreach(b.write)
        }
        b.toByteArray
      }
      val header = Array[Byte](1, 0, 4, 2)
      val nameIdx = index(Seq("GraftCFF".getBytes(Latin1)))
      // even-position chars resolve through standard SIDs (ASCII spine:
      // SID = ascii - 31), odd-position ones through custom strings.
      // Apostrophe and grave ALWAYS take the custom arm: their ascii-31
      // standard SIDs (8, 65) are quoteright/quoteleft per TN#5176 — the
      // two spots where the standard strings diverge from ASCII names —
      // so routing them through explicit quotesingle/grave strings keeps
      // the fixture's round trip byte-exact
      def needsCustom(i: Int): Boolean =
        i % 2 == 1 || chars(i) == '\'' || chars(i) == '`'
      val customPos = chars.indices.filter(needsCustom)
      val customIdx = customPos.zipWithIndex.toMap
      val customNames = customPos.map(i => AsciiGlyphNames(chars(i) - 32))
      def sidFor(i: Int): Int =
        if (needsCustom(i)) 391 + customIdx(i) else chars(i) - 31
      val stringIdx = index(customNames.map(_.getBytes(Latin1)))
      val globalSubrIdx = index(Seq.empty)
      // Top DICT: charset(15)/Encoding(16)/CharStrings(17) as fixed-width
      // 32-bit operands so the payload size is offset-independent
      def op29(v: Int, op: Int): Array[Byte] =
        Array(29.toByte, ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte, op.toByte)
      val topPayloadLen = 18
      val topIdxLen = 2 + 1 + 2 * 2 + topPayloadLen
      val charStringsIdx = index((0 to chars.length).map(_ => Array[Byte](14))) // endchar
      val base = header.length + nameIdx.length + topIdxLen +
        stringIdx.length + globalSubrIdx.length
      val charStringsOff = base
      val charsetOff = charStringsOff + charStringsIdx.length
      val charset = Array[Byte](0) ++
        chars.indices.flatMap(i => u16(sidFor(i))).toArray
      val encodingOff = charsetOff + charset.length
      val encoding = Array[Byte](0, chars.length.toByte) ++
        chars.map(ch => code(ch).toByte).toArray
      val topIdx = index(Seq(op29(charsetOff, 15) ++ op29(encodingOff, 16) ++
        op29(charStringsOff, 17)))
      require(topIdx.length == topIdxLen, "CFF top DICT layout drift")
      header ++ nameIdx ++ topIdx ++ stringIdx ++ globalSubrIdx ++
        charStringsIdx ++ charset ++ encoding
    } else {
      val sb = new StringBuilder
      sb ++= "%!PS-AdobeFont-1.0: GraftT1\n"
      sb ++= "/FontName /GraftT1 def\n"
      sb ++= "/Encoding 256 array\n0 1 255 {1 index exch /.notdef put} for\n"
      chars.foreach(ch => sb ++= s"dup ${code(ch)} /${AsciiGlyphNames(ch - 32)} put\n")
      sb ++= "readonly def\ncurrentdict end\ncurrentfile eexec\n"
      val clear = sb.result().getBytes(Latin1)
      val opaque = Array.tabulate(64)(i => ((i * 17 + 3) & 0xff).toByte)
      clear ++ opaque
    }
    val content = ("BT /F1 12 Tf <" +
      t.map(ch => f"${code(ch)}%02X").mkString + "> Tj ET").getBytes(Latin1)
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(Latin1))
    def stream(id: Int, payload: Array[Byte], compress: Boolean, extra: String = ""): Unit = {
      val body = if (compress) deflate(payload) else payload
      val filter = if (compress) "/Filter/FlateDecode" else ""
      w(s"$id 0 obj<</Length ${body.length}$filter$extra>>stream\n")
      out.write(body)
      w("\nendstream endobj\n")
    }
    w("%PDF-1.4\n")
    w("1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    w("2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n")
    w("3 0 obj<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>" +
      "/Contents 4 0 R>>endobj\n")
    stream(4, content, flate)
    w("5 0 obj<</Type/Font/Subtype/Type1/BaseFont/GraftT1" +
      "/FirstChar 160/FontDescriptor 6 0 R>>endobj\n")
    if (viaCff) {
      w("6 0 obj<</Type/FontDescriptor/FontName/GraftT1/Flags 4" +
        "/FontFile3 7 0 R>>endobj\n")
      stream(7, fontProgram, flate, "/Subtype/Type1C")
    } else {
      val clearLen = fontProgram.length - 64
      w("6 0 obj<</Type/FontDescriptor/FontName/GraftT1/Flags 4" +
        "/FontFile 7 0 R>>endobj\n")
      stream(7, fontProgram, flate, s"/Length1 $clearLen/Length2 64/Length3 0")
    }
    w("trailer<</Root 1 0 R>>\n%%EOF")
    out.toByteArray
  }

  /** A classic-xref document ENCRYPTED with the standard security handler
    * (empty user password): content streams deflate then encrypt per
    * object, the /Encrypt dictionary and trailer /ID carry everything
    * [[extract]]'s key derivation needs. `aes` selects V4 `/AESV2`
    * (AES-128-CBC, IV-prefixed streams) over V2/R3 RC4-128. Fixture
    * builder for the decryption envelope — O/U are arbitrary bytes (the
    * reader never validates the user password; it assumes empty, which
    * is exactly the permissions-only encryption case).
    */
  def buildEncryptedPdf(contentStreams: Seq[Array[Byte]], aes: Boolean): Array[Byte] =
    buildEncryptedPdf(contentStreams, aes, "")

  /** As above with a USER PASSWORD (r12): the file key derives from the
    * padded password and `/U` carries the real Algorithm-5 value, so a
    * reader must both know the password and validate it to open — the
    * password-protected fixture for the extract(bytes, password) leg.
    */
  def buildEncryptedPdf(contentStreams: Seq[Array[Byte]], aes: Boolean,
                        password: String): Array[Byte] =
    buildEncryptedPdf(contentStreams, aes, password, "")

  /** As above with an OWNER password too (r12): `/O` carries the real
    * Algorithm-3 value (the padded user password under the owner key),
    * so an Algorithm-7 owner open recovers the user password and
    * validates — the full two-password fixture.
    */
  def buildEncryptedPdf(contentStreams: Seq[Array[Byte]], aes: Boolean,
                        password: String, ownerPassword: String): Array[Byte] = {
    val id0 = Array.tabulate(16)(i => ((i * 73 + 5) & 0xff).toByte)
    val p = -44
    val r = if (aes) 4 else 3
    val pwdBytes = password.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(127)
    val ownBytes = ownerPassword.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(127)
    val oBytes =
      if (ownerPassword.isEmpty) Array.tabulate(32)(i => ((i * 37 + 11) & 0xff).toByte)
      else computeO(ownBytes, pwdBytes, r, 128)
    val key = deriveFileKey(pwdBytes, oBytes, p, id0, r, 128)
    // Algorithm-5 /U (16 computed + 16 arbitrary pad) whenever either
    // password is set; the all-empty fixture keeps its legacy arbitrary
    // /U — that path must stay open WITHOUT validation (permissions-only)
    val uBytes =
      if (password.isEmpty && ownerPassword.isEmpty) oBytes
      else computeU(key, id0, r).take(16) ++ Array.fill(16)(0x5A.toByte)
    val crypt = StdCrypt(key, aes)
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(Latin1))
    def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
    w("%PDF-1.6\n")
    w("1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    val kids = contentStreams.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj<</Type/Pages/Kids[$kids]/Count ${contentStreams.length}>>endobj\n")
    contentStreams.zipWithIndex.foreach { case (c, i) =>
      val pageId = 3 + 2 * i
      val streamId = pageId + 1
      w(s"$pageId 0 obj<</Type/Page/Parent 2 0 R/Contents $streamId 0 R>>endobj\n")
      val body = crypt.encrypt(streamId, 0, deflate(c))
      w(s"$streamId 0 obj<</Length ${body.length}/Filter/FlateDecode>>stream\n")
      out.write(body)
      w("\nendstream endobj\n")
    }
    val encId = 3 + 2 * contentStreams.length
    val cf = if (aes) "/CF<</StdCF<</CFM/AESV2/Length 16>>>>/StmF/StdCF/StrF/StdCF" else ""
    val v = if (aes) 4 else 2
    w(s"$encId 0 obj<</Filter/Standard/V $v/R $r/Length 128$cf" +
      s"/O <${hex(oBytes)}>/U <${hex(uBytes)}>/P $p>>endobj\n")
    w(s"trailer<</Root 1 0 R/Encrypt $encId 0 R/ID[<${hex(id0)}><${hex(id0)}>]>>\n%%EOF")
    out.toByteArray
  }

  /** An AES-256 document (V5, R5 or R6) for the empty user password —
    * the modern encryption real writers emit since PDF 2.0 (and Acrobat
    * X). /U carries hash‖validation-salt‖key-salt; /UE AES-wraps the
    * 256-bit file key under the key-salt hash; streams are AES-256-CBC
    * with the file key directly. Deterministic salts/key so fixtures are
    * byte-stable.
    */
  def buildEncryptedPdfR6(contentStreams: Seq[Array[Byte]], r: Int = 6,
                          password: String = "",
                          ownerPassword: String = ""): Array[Byte] = {
    require(r == 5 || r == 6, s"V5 revision must be 5 or 6, got $r")
    val fileKey = Array.tabulate(32)(i => ((i * 29 + 17) & 0xff).toByte)
    val vsalt = Array.tabulate(8)(i => ((i * 41 + 3) & 0xff).toByte)
    val ksalt = Array.tabulate(8)(i => ((i * 53 + 9) & 0xff).toByte)
    val pwd = password.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(127)
    val uHash = hash2B(pwd, vsalt, Array.emptyByteArray, r)
    val u = uHash ++ vsalt ++ ksalt // 48 bytes
    def wrap(ikey: Array[Byte]): Array[Byte] = {
      val enc = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      enc.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(ikey, "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      enc.doFinal(fileKey)
    }
    val ue = wrap(hash2B(pwd, ksalt, Array.emptyByteArray, r))
    // owner entries: the REAL §7.6.4 construction when an owner password
    // is set (hash over pwd‖salt‖U48, /OE wraps the same file key);
    // structurally-valid decoys otherwise (the empty-user-password open
    // never consults them)
    val (o, oe) =
      if (ownerPassword.isEmpty)
        (Array.tabulate(48)(i => ((i * 7 + 1) & 0xff).toByte),
          Array.tabulate(32)(i => ((i * 11 + 2) & 0xff).toByte))
      else {
        val own = ownerPassword.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(127)
        val ovsalt = Array.tabulate(8)(i => ((i * 59 + 7) & 0xff).toByte)
        val oksalt = Array.tabulate(8)(i => ((i * 67 + 13) & 0xff).toByte)
        (hash2B(own, ovsalt, u, r) ++ ovsalt ++ oksalt,
          wrap(hash2B(own, oksalt, u, r)))
      }
    val crypt = StdCrypt(fileKey, aes = true, v5 = true)
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(Latin1))
    def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
    w("%PDF-2.0\n")
    w("1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    val kids = contentStreams.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj<</Type/Pages/Kids[$kids]/Count ${contentStreams.length}>>endobj\n")
    contentStreams.zipWithIndex.foreach { case (c, i) =>
      val pageId = 3 + 2 * i
      val streamId = pageId + 1
      w(s"$pageId 0 obj<</Type/Page/Parent 2 0 R/Contents $streamId 0 R>>endobj\n")
      val body = crypt.encrypt(streamId, 0, deflate(c))
      w(s"$streamId 0 obj<</Length ${body.length}/Filter/FlateDecode>>stream\n")
      out.write(body)
      w("\nendstream endobj\n")
    }
    val encId = 3 + 2 * contentStreams.length
    w(s"$encId 0 obj<</Filter/Standard/V 5/R $r/Length 256" +
      "/CF<</StdCF<</CFM/AESV3/Length 32>>>>/StmF/StdCF/StrF/StdCF" +
      s"/O <${hex(o)}>/OE <${hex(oe)}>/U <${hex(u)}>/UE <${hex(ue)}>/P -44>>endobj\n")
    w(s"trailer<</Root 1 0 R/Encrypt $encId 0 R>>\n%%EOF")
    out.toByteArray
  }

  /** A one-show-op page content stream carrying `text` as a literal string
    * (backslash and parens escaped, so arbitrary latin-1 text round-trips
    * through [[extract]]).
    */
  def textPage(text: String): Array[Byte] = textPage(text, 0)

  /** Page content carrying `text` through one of the three show-string
    * forms the parser reads — all decode to identical text, so a caller
    * can vary the form without changing the expected output (the
    * `pdf_decode_real` gate routes by doc_id so every form is exercised
    * corpus-wide against one oracle):
    * 0 = literal `(…) Tj`; 1 = kerned array `[(…) -28 (…)] TJ`
    * (halves concatenate, kern numbers ignored); 2 = hex `<…> Tj`.
    */
  def textPage(text: String, variant: Int): Array[Byte] = {
    def esc(t: String): String = {
      val b = new StringBuilder(t.length + 16)
      t.foreach {
        case '\\' => b ++= "\\\\"
        case '(' => b ++= "\\("
        case ')' => b ++= "\\)"
        case ch => b += ch
      }
      b.result()
    }
    val shown = variant % 3 match {
      case 1 =>
        val (h1, h2) = text.splitAt(text.length / 2)
        s"[(${esc(h1)}) -28 (${esc(h2)})] TJ"
      case 2 =>
        val hex = text.map(ch => f"${ch.toInt & 0xFF}%02X").mkString
        s"<$hex> Tj"
      case _ => s"(${esc(text)}) Tj"
    }
    s"BT /F1 12 Tf 72 720 Td $shown ET".getBytes(Latin1)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** LZW ENCODE (the builder/fixture side of [[lzwDecode]]): emits
    * clear-table, (prefix,byte)-dictionary codes with the same
    * earlyChange=1 width schedule the decoder follows, clear+reset on a
    * full table, EOD. Exists so the round-trip harness and the driver's
    * encode rotation can produce genuine LZW streams — correctness is
    * pinned by decode(encode(x)) == x plus fixed known-vector specs.
    */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length))
    var buf = 0L
    var nbits = 0
    var codeBits = 9
    // the encoder's add happens one code EARLIER in the stream than the
    // decoder's (enc: write then add; dec: the add for that code lands
    // while processing the NEXT one), so the earlyChange=1 schedule the
    // decoder applies as f(nextCode+1) is f(nextCode) here — both switch
    // between the same two codes of the stream
    def widthFor(n: Int): Int =
      if (n < 512) 9 else if (n < 1024) 10 else if (n < 2048) 11 else 12
    def writeCode(c: Int): Unit = {
      buf = (buf << codeBits) | c; nbits += codeBits
      while (nbits >= 8) { out.write(((buf >>> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
    }
    val table = new java.util.HashMap[Long, Integer]()
    var nextCode = 258
    writeCode(256) // initial clear, as most writers emit
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val key = (prefix.toLong << 8) | b
        val hit = table.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          writeCode(prefix)
          if (nextCode < 4096) {
            table.put(key, nextCode); nextCode += 1
            codeBits = widthFor(nextCode)
          }
          if (nextCode == 4096) { // table full: clear and restart
            writeCode(256)
            table.clear(); nextCode = 258; codeBits = 9
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) writeCode(prefix)
    // EOD alone is read AFTER the decoder's lagging add for the final
    // data code, so its width follows the DECODER's schedule f(nextCode+1)
    // — at an exact boundary (nextCode = 511/1023/2047) the decoder has
    // already widened and a same-width EOD would be misread as a table code
    codeBits =
      if (nextCode + 1 < 512) 9 else if (nextCode + 1 < 1024) 10
      else if (nextCode + 1 < 2048) 11 else 12
    writeCode(257) // EOD
    if (nbits > 0) out.write(((buf << (8 - nbits)) & 0xff).toInt) // flush pad
    out.toByteArray
  }

  /** RunLength ENCODE: literal runs up to 128 bytes, repeat runs for 3+
    * equal bytes, EOD marker — the fixture side of [[runLengthDecode]].
    */
  private[graft] def runLengthEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length))
    var i = 0
    while (i < data.length) {
      // measure the repeat run at i
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) && run < 128) run += 1
      if (run >= 3) {
        out.write(257 - run); out.write(data(i)); i += run
      } else {
        // literal run: until the next 3+ repeat or 128 bytes
        val start = i
        var j = i
        var rep = 1
        while (j < data.length && j - start < 128 && rep < 3) {
          j += 1
          rep = if (j < data.length && data(j) == data(j - 1)) rep + 1 else 1
        }
        val end = if (rep >= 3) j - 2 else j // exclude the repeat's start
        out.write(end - start - 1)
        out.write(data, start, end - start)
        i = end
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  /** Literal string body starting AFTER the opening paren; returns the index
    * after the closing paren. Handles nesting and the escape table from the
    * PDF spec (7.3.4.2).
    */
  private def parseLiteral(c: String, start: Int, sb: StringBuilder): Int = {
    var i = start
    var depth = 1
    val n = c.length
    while (i < n && depth > 0) {
      val ch = c.charAt(i)
      if (ch == '\\' && i + 1 < n) {
        c.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case '\n' => i += 2 // line continuation
          case '\r' => i += (if (i + 2 < n && c.charAt(i + 2) == '\n') 3 else 2)
          case d if d >= '0' && d <= '7' =>
            var v = 0; var cnt = 0; var j = i + 1
            while (j < n && cnt < 3 && c.charAt(j) >= '0' && c.charAt(j) <= '7') {
              v = v * 8 + (c.charAt(j) - '0'); j += 1; cnt += 1
            }
            // PDF 7.3.4.2: high-order overflow ignored — keeps extracted
            // chars inside the latin-1 byte range the parser models
            sb += (v & 0xFF).toChar; i = j
          case other => sb += other; i += 2 // includes \( \) \\
        }
      } else {
        if (ch == '(') { depth += 1; sb += ch }
        else if (ch == ')') { depth -= 1; if (depth > 0) sb += ch }
        else sb += ch
        i += 1
      }
    }
    i
  }

  /** Hex string body starting AFTER '<'; returns the index after '>'. Odd
    * final digit is padded with 0 per spec; bytes decode as latin-1.
    */
  private def parseHex(c: String, start: Int, sb: StringBuilder): Int = {
    var i = start
    val n = c.length
    val digits = new StringBuilder
    while (i < n && c.charAt(i) != '>') {
      val ch = c.charAt(i)
      if (Character.digit(ch, 16) >= 0) digits += ch
      i += 1
    }
    if (digits.length % 2 == 1) digits += '0'
    var j = 0
    while (j < digits.length) {
      sb += ((Character.digit(digits.charAt(j), 16) * 16 +
        Character.digit(digits.charAt(j + 1), 16)).toChar)
      j += 2
    }
    i + 1
  }
}
