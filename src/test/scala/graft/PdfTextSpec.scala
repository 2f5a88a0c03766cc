package graft

import graft.functions.PdfText
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

/** Real PDF text extraction (A9's decode half) — fed HANDCRAFTED PDFs, not
  * fixtures pretending to be PDFs: a raw-content-stream document, a
  * FlateDecode document, TJ kerning arrays, literal-escape and hex strings,
  * multi-page structure, and the non-PDF fallback the synthetic corpus
  * takes.
  */
class PdfTextSpec extends SparkSpecBase {

  /** Minimal classic-xref PDF with one page per content stream given. */
  private def pdf(contents: Seq[Array[Byte]], flate: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n")
    val kids = contents.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj<</Type/Pages/Kids[$kids]/Count ${contents.length}>>endobj\n")
    contents.zipWithIndex.foreach { case (c, i) =>
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

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def bytes(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("raw content stream: Tj text and page count") {
    val doc = pdf(Seq(bytes("BT /F1 12 Tf 72 720 Td (Hello graft) Tj ET")), flate = false)
    val r = PdfText.extract(doc).get
    assert(r.text == "Hello graft")
    assert(r.nPages == 1)
  }

  test("FlateDecode stream, TJ kerning array, escapes, hex strings") {
    val content = bytes(
      """BT /F1 9 Tf [(Sp) -28 (ark)] TJ (and \(nested\) \\ pdf) Tj <4F4B> Tj ET""")
    val doc = pdf(Seq(content), flate = true)
    val r = PdfText.extract(doc).get
    // TJ array parts concatenate (kern numbers ignored); shows join with spaces
    assert(r.text == """Spark and (nested) \ pdf OK""", r.text)
  }

  test("multi-page: text from every page, page count from /Type/Page objects") {
    val doc = pdf(Seq(
      bytes("BT (page one) Tj ET"),
      bytes("BT (page two) ' ET")), flate = true)
    val r = PdfText.extract(doc).get
    assert(r.text == "page one page two")
    assert(r.nPages == 2)
  }

  test("octal escapes and operand strings that are NOT page text") {
    // (skip) precedes Tf — an operand of another operator, never shown
    val doc = pdf(Seq(bytes("BT (skip) /F1 12 Tf (\\101\\102\\103) Tj ET")), flate = false)
    assert(PdfText.extract(doc).get.text == "ABC")
  }

  test("non-PDF bytes answer None; corrupt flate degrades, never throws") {
    assert(PdfText.extract("plain text, no header".getBytes("UTF-8")).isEmpty)
    assert(PdfText.extract(Array.emptyByteArray).isEmpty)
    // valid header, garbage flate body: empty text, no exception
    val broken = pdf(Seq(bytes("BT (x) Tj ET")), flate = false)
    val s = new String(broken, "ISO-8859-1")
      .replace(">>stream", "/Filter/FlateDecode>>stream")
    assert(PdfText.extract(s.getBytes("ISO-8859-1")).get.text == "")
  }

  test("pdfExtract operator: real PDFs decode in-partition, fixture bytes fall back") {
    import spark.implicits._
    val real = pdf(Seq(bytes("BT (distributed decode) Tj ET")), flate = true)
    val rows = Seq((1L, real), (2L, "not a pdf at all".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val out = Multimodal.pdfExtract(rows).orderBy("doc_id").collect()
    assert(out(0).getBoolean(1) && out(0).getInt(2) == 1 &&
      out(0).getString(3) == "distributed decode")
    assert(!out(1).getBoolean(1) && out(1).getString(3) == "")
    // and the whole synthetic corpus takes the fallback branch (the declared
    // stub contract of the pdf_decode driver query)
    val corpus = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    assert(Multimodal.pdfExtract(corpus).filter(col("is_pdf")).count() == 0)
  }
}
