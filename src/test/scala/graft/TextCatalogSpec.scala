package graft

import graft.operators.{Catalog, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextCatalogSpec extends SparkSpecBase {

  test("lang_id covers all docs with a valid prediction") {
    val df = TextAnalysis.langId(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(!col("pred_lang").isin("en", "es", "de", "fr", "und")).count() == 0)
    df.unpersist()
  }

  test("quality_score is bounded in [0, 1.0001]") {
    val mm = TextAnalysis.qualityScore(spark, sf)
      .agg(min("score").as("mn"), max("score").as("mx")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0001)
  }

  test("token_count: subtokens >= ws tokens for alphanumeric corpora") {
    val bad = TextAnalysis.tokenCount(spark, sf)
      .filter(col("n_subtokens") < col("n_ws_tokens")).count()
    assert(bad == 0)
  }

  test("fingerprint is deterministic and within the modulus") {
    val a = TextAnalysis.fingerprint(spark, sf).collect()
    val b = TextAnalysis.fingerprint(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 1000000007L))
  }

  test("doc_slice returns at most 20 tokens") {
    val bad = TextAnalysis.docSlice(spark, sf)
      .filter(size(split(col("slice_text"), " ")) > 20).count()
    assert(bad == 0)
  }

  test("corpus_catalog lists dirs before files, respects limit") {
    val rows = Catalog.corpusCatalog(spark, sf, limit = 50).collect()
    assert(rows.length == 50)
    val types = rows.map(_.getAs[String]("entry_type"))
    val firstFile = types.indexOf("file")
    if (firstFile >= 0) assert(!types.drop(firstFile).contains("dir"))
  }

  test("incremental_diff classifies every doc id exactly once with expected statuses") {
    val df = Catalog.incrementalDiff(spark, sf).cache()
    assert(df.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    // docs below 20 exist only in the old snapshot -> removed
    assert(df.filter(col("doc_id") < 20 && col("status") =!= "removed").count() == 0)
    // docs >= 450 exist only in the new scan -> added
    assert(df.filter(col("doc_id") >= 450 && col("status") =!= "added").count() == 0)
    // middle docs divisible by 13 carry a size delta -> changed
    assert(df.filter(col("doc_id").between(20, 449) && col("doc_id") % 13 === 0 &&
      col("status") =!= "changed").count() == 0)
    df.unpersist()
  }

  test("pdf_decode hash matches direct md5 and pages >= 1") {
    val df = Multimodal.pdfDecode(spark, sf).cache()
    assert(df.filter(col("page_count_stub") < 1).count() == 0)
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    assert(df.join(direct, "doc_id").filter(col("content_hash") =!= col("h")).count() == 0)
    df.unpersist()
  }

  test("multimodal decodeFeatures plumbing: one feature row per doc, finite values") {
    val feats = Multimodal.decodeFeatures(spark, sf).cache()
    assert(feats.count() == Tables.documents(spark, sf).count())
    assert(feats.filter(size(col("feat")) =!= 8).count() == 0)
    val s = feats.select(aggregate(col("feat"), lit(0.0), (a, x) => a + x).as("s"))
    assert(s.filter(col("s") <= 0.0 || isnan(col("s"))).count() == 0)
    feats.unpersist()
  }
}
