package graft

import graft.operators.Multimodal
import graft.sources.ImageCorpus

/** `img_files_real` — the A12 driver query (real image-FILE ingest under
  * the DuckDB gate): the query materializes a real PNG+JPEG tmp tree,
  * ingests it twice through a real ExtractCache, and poisons every file
  * between the passes so the gated output can ONLY come from the
  * decode-once cache. These receipts pin the Spark side of that contract;
  * the closed-form/frozen-literal oracle side is the driver's.
  */
class ImgFilesRealSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("img_files_real: one png+jpg row per gated doc, stats match the fixtures") {
    val out = Multimodal.imgFilesReal(spark, sfDir).collect()
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .where(org.apache.spark.sql.functions.col("doc_id") % 25 === 0)
      .collect().map(_.getLong(0)).sorted
    assert(ids.nonEmpty)
    assert(out.length == ids.length * 2)
    assert(out.forall(_.getAs[Boolean]("decoded_ok")))
    val byKey = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("kind")) -> r).toMap
    for (id <- ids) {
      // PNG arm: stats must equal the closed-form raster's through the ONE
      // repo-wide canonical (statsOf = pixelCanonical md5 since r18)
      val (ok, w, h, ch, n, hash, luma) =
        ImageCorpus.statsOf(Some(Multimodal.imgPixels(id)))
      val p = byKey((id, "png"))
      assert(ok && p.getAs[Int]("width") == w && p.getAs[Int]("height") == h &&
        p.getAs[Int]("channels") == ch && p.getAs[Long]("n_pixels") == n &&
        p.getAs[String]("pixel_hash") == hash &&
        p.getAs[Double]("mean_luma") == luma, s"png doc $id")
      // JPEG arm: the (doc_id mod 8) fixture form's frozen stats
      val form = Math.floorMod(id, Multimodal.JpgForms.length.toLong).toInt
      val (jw, jh, jch, jhash, jluma) = Multimodal.jpgFormStats(form)
      val j = byKey((id, "jpg"))
      assert(j.getAs[Int]("width") == jw && j.getAs[Int]("height") == jh &&
        j.getAs[Int]("channels") == jch &&
        j.getAs[Long]("n_pixels") == jw.toLong * jh * jch &&
        j.getAs[String]("pixel_hash") == jhash &&
        j.getAs[Double]("mean_luma") == jluma, s"jpg doc $id form $form")
    }
  }

  test("img_files_real: the poison receipt — on-disk bytes are garbage, so the" +
    " output rows can only have come from the decode-once cache") {
    Multimodal.imgFilesReal(spark, sfDir).count()
    // the query left the tree POISONED (same byte sizes, 'X' content). A
    // fresh cache forces a re-decode of those bytes: every row degrades —
    // proof the query's decoded_ok=true rows were cache-served, not re-read
    val base = Multimodal.imgFilesBase(sfDir, stride = 25)
    val fresh = ImageCorpus.readImageStats(spark, base + "/tree",
      exts = Seq("png", "jpg"),
      cachePath = Some(base + "/cache_fresh_receipt")).collect()
    assert(fresh.nonEmpty)
    assert(fresh.forall(!_.getAs[Boolean]("decoded_ok")))
  }
}
