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

  test("AQE splits a hot band-bucket join at runtime (skew=true receipt)") {
    // The dedup designs (B2/B3/B5b) lean on "AQE handles a hot bucket" —
    // this is the receipt: a band join with one giant bucket, executed with
    // test-scale skew thresholds, must show OptimizeSkewedJoin splitting the
    // hot partition (the `skew=true` marker on the sort-merge join).
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // one dup-cluster-like hot bucket (3k rows) vs 97 cold buckets; the
      // pad column gives rows realistic width so byte thresholds trip
      val bands = spark.range(0, 6000)
        .select(col("id").as("doc_id"),
          when(col("id") < 3000, lit("hot"))
            .otherwise(concat(lit("b"), col("id") % 97)).as("band_key"),
          sha2(concat(lit("pad"), col("id").cast("string")), 256).as("pad"))
      val a = bands.select(col("doc_id").as("a_id"), col("band_key"), col("pad").as("a_pad"))
      val b = bands.select(col("doc_id").as("b_id"), col("band_key"), col("pad").as("b_pad"))
      val joined = a.join(b, Seq("band_key")).filter(col("a_id") < col("b_id"))
      // drive THIS DataFrame's adaptive plan to its final form (count()
      // would plan a separate aggregate query and leave this one unexecuted)
      val qe = joined.queryExecution
      val n = qe.executedPlan.execute().count()
      assert(n > 3000L * 2999 / 2, s"hot bucket must dominate the join, got $n rows")
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join skew=true; plan:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
