package graft

import graft.operators.{Chunker, Skew}
import graft.sources.TextCorpus
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class SourceSkewSpec extends SparkSpecBase {

  test("TextCorpus discovers by extension, skips excluded folders and empty files") {
    val root = Files.createTempDirectory("graft_corpus")
    def put(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    put("a.txt", "alpha file one\nsecond line")
    put("docs/b.md", "bravo markdown")
    put("c.py", "not allowed extension")
    put("node_modules/d.txt", "excluded folder")
    put("empty.txt", "")
    put("redist/keep.txt", "folder name merely CONTAINS an excluded name")
    put("my dir/space.txt", "directory with a space (URI percent-encoding)")
    val corpus = TextCorpus.read(spark, root.toString,
      excludedFolders = Seq("node_modules", "dist")).cache()
    val paths = corpus.select("path").collect().map(_.getString(0)).sorted
    assert(paths.sameElements(Array("a.txt", "docs/b.md", "my dir/space.txt", "redist/keep.txt")),
      paths.mkString(","))
    val a = corpus.filter(col("path") === "a.txt").head()
    assert(a.getAs[Long]("size") == 26 && a.getAs[Long]("line_count") == 2)
    corpus.unpersist()
  }

  test("a real directory corpus runs through the full chunk+embed pipeline") {
    val root = Files.createTempDirectory("graft_corpus2")
    Files.writeString(root.resolve("x.txt"), "spark engine test " * 30)
    Files.writeString(root.resolve("y.txt"), "another document body " * 10)
    val docs = TextCorpus.asDocuments(TextCorpus.read(spark, root.toString))
    val idx = Chunker.indexBuildFrom(docs, size = 100, overlap = 20)
    assert(idx.count() > 2)
    assert(idx.select("doc_id").distinct().count() == 2)
  }

  test("saltedJoin equals the plain join") {
    val e = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val dim = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("user_total"))
    val plain = e.join(dim, Seq("user_id"))
    val salted = Skew.saltedJoin(e, dim, Seq("user_id"), salt = 8)
    assert(salted.count() == plain.count())
    assert(salted.select(plain.columns.map(col): _*).exceptAll(plain).count() == 0)
  }

  test("saltedSumCount equals the direct aggregation") {
    val e = Tables.events(spark, sf)
    val direct = e.groupBy("event_type")
      .agg(round(sum(col("value")), 2).as("s"), count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(e, Seq("event_type"), "value", salt = 16)
      .select(col("event_type"), round(col("sum_value"), 2).as("s"), col("n_rows").as("n"))
    assert(salted.exceptAll(direct).count() == 0 && direct.exceptAll(salted).count() == 0)
  }
}
