package graft.functions

import java.util.zip.Inflater

/** Pure-JVM PDF text extraction — the REAL decode for SURVEY §2 A9's
  * largest declared gap (reference: src/pdf-extractor.ts extracts text with
  * pdf-parse and caches it by (path, size); this is the same common-case
  * extraction without a library, since this container has none).
  *
  * Scope (the same envelope simple JS extractors cover): classic xref PDFs
  * whose page content streams are raw or FlateDecode-compressed and whose
  * fonts use standard one-byte encodings. Text is read from the content
  * streams' show operators — `(…) Tj`, `(…) '`, `a_w a_c (…) "`, and
  * `[(…) kern (…)] TJ` — honoring literal-string escapes (\\n, \\t, \\(,
  * \\), \\\\, octal \\ddd, line continuations), balanced nested parens, and
  * `<hex>` strings. Out of scope, by design: CID/Unicode CMap remapping,
  * object streams (compressed xref), encryption — a real corpus routes
  * those to a full parser; everything else still flows through the same
  * Spark plumbing.
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
  private val LengthRe = "/Length\\s+(\\d+)".r

  /** None unless `bytes` starts with a PDF header; Some(extracted) with
    * whatever text the supported envelope yields (possibly empty — a
    * valid-but-exotic PDF degrades to empty text, never an exception).
    */
  def extract(bytes: Array[Byte]): Option[PdfDoc] = {
    if (bytes == null || bytes.length < 5 ||
      !new String(bytes, 0, 5, Latin1).equals("%PDF-")) return None
    // structural view: latin-1 is byte-transparent, so offsets in this
    // string are byte offsets in the file
    val s = new String(bytes, Latin1)
    val text = new StringBuilder
    // stream-body byte ranges, collected during the walk: page counting
    // must ignore matches INSIDE stream data (raw text about PDFs may
    // contain "/Type /Page"), so the regex runs only over structure
    val streamRanges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
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
        // stream end: trust a direct /Length N when "endstream" actually
        // follows it (whitespace-tolerant) — stream BYTES may legitimately
        // contain the string "endstream" (binary data, or raw text about
        // PDFs), and a bare indexOf would truncate mid-stream. Indirect
        // lengths (/Length 12 0 R) fail the follow-check and fall back.
        val end = {
          // toLong + range filter: a malformed huge /Length must fall back
          // to scanning, not throw (never-throws contract)
          val byLen = LengthRe.findFirstMatchIn(dict)
            .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)
            .map(dataStart + _)
            .filter(_ <= s.length.toLong)
            .map(_.toInt)
            .filter { e =>
              var p = e
              while (p < s.length && (s.charAt(p) == '\r' || s.charAt(p) == '\n' ||
                s.charAt(p) == ' ')) p += 1
              s.startsWith("endstream", p)
            }
          byLen.getOrElse(s.indexOf("endstream", dataStart))
        }
        if (end < 0) from = -1
        else {
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, end)
          val content =
            if (dict.contains("FlateDecode")) inflate(raw).map(new String(_, Latin1))
            else Some(new String(raw, Latin1))
          content.foreach { c =>
            // only text-bearing streams: cheap gate on the BT operator
            if (c.contains("BT")) appendShownText(c, text)
          }
          streamRanges += ((dataStart, end))
          from = end + "endstream".length
        }
      }
    }
    val nPages = "/Type\\s*/Page(?!s)".r.findAllIn(s).matchData
      .count(m => !streamRanges.exists(r => m.start >= r._1 && m.start < r._2))
    Some(PdfDoc(text.result().trim, nPages))
  }

  /** Inflated-size cap: a content stream is operators + strings, never
    * gigabytes — a tiny zlib bomb must degrade (None), not OOM the executor.
    */
  private val MaxInflated = 64 << 20

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
  private def appendShownText(c: String, out: StringBuilder): Unit = {
    val pending = new StringBuilder
    def flush(): Unit =
      if (pending.nonEmpty) {
        if (out.nonEmpty) out += ' '
        out ++= pending.result(); pending.clear()
      }
    var i = 0
    val n = c.length
    while (i < n) {
      c.charAt(i) match {
        case '(' =>
          i = parseLiteral(c, i + 1, pending)
        case '<' =>
          if (i + 1 < n && c.charAt(i + 1) == '<') i += 2 // dict open — skip
          else i = parseHex(c, i + 1, pending)
        case '>' =>
          i += 1 // dict close halves — structure, skip
        case '%' => // comment runs to EOL
          while (i < n && c.charAt(i) != '\n' && c.charAt(i) != '\r') i += 1
        case '/' => // name operand — consume, keep pending
          i += 1
          while (i < n && !isDelim(c.charAt(i))) i += 1
        case ch if ch.isLetter || ch == '\'' || ch == '"' || ch == '*' =>
          val start = i
          while (i < n && (c.charAt(i).isLetterOrDigit || c.charAt(i) == '*' ||
            c.charAt(i) == '\'' || c.charAt(i) == '"')) i += 1
          c.substring(start, i) match {
            case "Tj" | "TJ" | "'" | "\"" => flush()
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
  def buildPdf(contentStreams: Seq[Array[Byte]], flate: Boolean): Array[Byte] = {
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
      val body = if (flate) deflate(c) else c
      val filter = if (flate) "/Filter/FlateDecode" else ""
      w(s"$streamId 0 obj<</Length ${body.length}$filter>>stream\n")
      out.write(body)
      w("\nendstream endobj\n")
    }
    w("trailer<</Root 1 0 R>>\n%%EOF")
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
