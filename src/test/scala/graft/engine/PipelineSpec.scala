package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.app.Corpus

/** Distributed-correctness gates (SURVEY.md §5.2): byte-identical text per
  * url vs the oracle goldens through the REAL Spark pipeline, invariance to
  * partitioning/salting/input order, idempotent resume, and the windowed-D3
  * parity backend.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("pipeline-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def ensured(): Unit = {
    Corpus.ensure(spark, sfDir)
    spark.sparkContext.setLogLevel("WARN")
  }

  test("engine output is byte-identical to oracle goldens per url (sbt gate)") {
    ensured()
    val pages = spark.read.parquet(Corpus.pagesPath(sfDir))
    val decoded = Pipeline.extract(pages)
    val golden = spark.read.parquet(Corpus.goldenPath(sfDir))
    val joined = decoded.toDF().as("e")
      .join(golden.as("g"), col("e.url") === col("g.url"), "full_outer")
    val total = joined.count()
    val matched = joined.filter(
      col("e.url").isNotNull && col("g.url").isNotNull &&
        col("e.text") === col("g.text") && col("e.nTokens") === col("g.nTokens"))
      .count()
    assert(total == Corpus.docsFor(sfDir).toLong)
    assert(matched == total, s"byte-identity: $matched/$total")
    // full decode equality incl. kv/lines/maps via the eval path: P=R=1
    import spark.implicits._
    val report = Eval.aggregate(Eval.metricRows(decoded, golden.as[DocOut])).collect()(0)
    Seq("kv", "line", "entHead", "entTail", "groupHead", "groupTail").foreach { g =>
      assert(report.getAs[Double](s"${g}F1") == 1.0, s"$g F1")
    }
  }

  test("result set invariant to parallelism, salting, and input order") {
    ensured()
    val pages = spark.read.parquet(Corpus.pagesPath(sfDir))
    def fingerprint(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(col("url"), col("text"), col("nTokens"), col("nKv")).as("h"))
        .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    val base = fingerprint(Pipeline.extract(pages).toDF())
    val salted = fingerprint(Pipeline.extract(Pipeline.saltedByHost(pages, 7, 3)).toDF())
    val shuffled = fingerprint(Pipeline.extract(pages.orderBy(rand(42))).toDF())
    val coalesced = fingerprint(Pipeline.extract(pages.repartition(1)).toDF())
    assert(base == salted && base == shuffled && base == coalesced)
  }

  test("resume skips done buckets and total output is complete and duplicate-free") {
    ensured()
    val outDir = java.nio.file.Files.createTempDirectory("resume").toString
    val pages = spark.read.parquet(Corpus.pagesPath(sfDir))
    // first run: only half the buckets (simulated interrupted run)
    val half = pages.filter(
      udf((u: String) => Pipeline.bucketOf(u, Pipeline.DefaultBuckets) % 2 == 0).apply(col("url")))
    val dHalf = Pipeline.extract(half)
    Pipeline.writeDecoded(dHalf, outDir)
    Pipeline.writeLineage(dHalf, outDir)
    val remaining = Pipeline.resumeFilter(spark, pages, outDir)
    val remBuckets = Pipeline.extract(remaining).select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(remBuckets.forall(_ % 2 == 1), "resume must only re-run unfinished buckets")
    assert(remaining.count() + half.count() == pages.count())
  }

  test("incremental re-extraction: kernel leg bounded by the delta, result equals full extract") {
    ensured()
    val pages = spark.read.parquet(Corpus.pagesPath(sfDir))
    // prior run covered urls with pmod(xxhash64(url), 5) != 0; a seventh of
    // those digests are corrupted (stand-in for html drift since that run)
    val covered = pages.filter(pmod(xxhash64(col("url")), lit(5)) =!= 0)
    val prev = Pipeline.extractWithDigest(covered)
      .withColumn("html_x64",
        when(pmod(xxhash64(col("url")), lit(7)) === 0, col("html_x64") + 1)
          .otherwise(col("html_x64")))
      .persist()
    val inc = Pipeline.extractIncremental(pages, prev)
    // 1) byte-identical to the full extraction
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("url"), md5(col("text")).as("h"), col("nTokens"), col("nKv"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(key(inc).sameElements(key(Pipeline.extract(pages).toDF())))
    // 2) the kernel leg is the delta, not the corpus: missing + drifted
    val nMissing = pages.count() - covered.count()
    val nDrifted = covered.filter(pmod(xxhash64(col("url")), lit(7)) === 0).count()
    val cur = pages.select(col("url"), xxhash64(col("html")).as("html_x64"))
    val todo = cur.join(prev.select("url", "html_x64"), Seq("url", "html_x64"), "left_anti")
    assert(todo.count() == nMissing + nDrifted,
      s"kernel leg must re-extract exactly the missing+drifted set")
    // 3) deleted urls drop: a prev row whose url left the crawl never survives
    val ghost = prev.limit(1).withColumn("url", lit("https://gone.example/x"))
    val withGhost = Pipeline.extractIncremental(pages, prev.unionByName(ghost))
    assert(withGhost.filter(col("url") === "https://gone.example/x").count() == 0)
    assert(withGhost.count() == pages.count())
    prev.unpersist()
  }

  test("detail sink: decoded-vs-golden detail is all-TP with exact record counts") {
    ensured()
    import spark.implicits._
    val decoded = Pipeline.extract(spark.read.parquet(Corpus.pagesPath(sfDir)))
    val golden = spark.read.parquet(Corpus.goldenPath(sfDir)).as[DocOut]
    val details = Eval.detailRows(decoded, golden)
    val byVerdict = details.groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byVerdict.keySet == Set("TP"), s"identical pred/gt must be all TP: $byVerdict")
    // one record per item per granularity: kv + lines + flattened maps
    val expected = golden.collect().map { g =>
      g.kv.size + g.lines.size + g.entHead.map(_.tails.size).sum +
        g.entTail.map(_.tails.size).sum + g.groupHead.size + g.groupTail.size
    }.sum.toLong
    assert(byVerdict("TP") == expected)
  }

  test("golden corpus urls are unique (eval fname-dedupe parity precondition)") {
    // The eval oracles mirror the engine's per-url dedupe with an arbitrary
    // row_number pick; that is only deterministic while urls are unique.
    ensured()
    val g = spark.read.parquet(Corpus.goldenPath(sfDir))
    assert(g.count() == g.select("url").distinct().count())
  }

  test("golden corpus digest is frozen (catches silent engine+oracle co-drift)") {
    ensured()
    // md5 over (url  text  nKv) rows joined by  in url order,
    // computed through the ENGINE (not the oracle). Pinned 2026-08-16 for
    // corpus v1 @ sf0.001; a change here means extraction semantics moved
    // even if engine and oracle still agree with each other.
    import spark.implicits._
    val digest = Pipeline.extract(spark.read.parquet(Corpus.pagesPath(sfDir)))
      .toDF().select(col("url"), col("text"), col("nKv").cast("long"))
      .orderBy("url")
      .as[(String, String, Long)]
      .collect()
      .map { case (u, t, k) => s"$u\u0001$t\u0001$k" }
      .mkString("\u0002")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(digest.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(md == "67c7d73b47cb609337f3a8552ded7f86")
  }

  test("salting spreads a hot host across partitions, small hosts stay co-located") {
    ensured()
    import spark.implicits._
    // adversarial skew: one host owns 90% of the corpus
    val hot = (0 until 9000).map(i => (s"https://hot.example/$i", i.toString))
    val cold = (0 until 1000).map(i => (s"https://cold-$i.example/x", i.toString))
    val pages = (hot ++ cold).toDF("url", "payload")
    val salted = Pipeline.saltedByHost(pages, partitions = 16, salts = 8)
    val perPartition = salted
      .select(col("url"), org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .groupBy("pid").count().collect().map(_.getLong(1))
    val hotSpread = salted
      .filter(col("url").startsWith("https://hot.example/"))
      .select(org.apache.spark.sql.functions.spark_partition_id())
      .distinct().count()
    assert(hotSpread >= 6, s"hot host must spread over ~salts partitions, got $hotSpread")
    // a partition may receive a few of the 8 salt buckets (hash collisions)
    // but never the whole hot host
    assert(perPartition.max <= 9000 * 0.4,
      s"no partition may hold the bulk of the hot host: max=${perPartition.max}")
  }

  test("windowed parse-spots backend matches the kernel (two-backend parity)") {
    ensured()
    import graft.core.{Spot, Spots}
    val spots = spark.read.parquet(Corpus.spotsPath(sfDir))
    val windowed = WindowedSpots.parseTop(spots, triuMode = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val kernel = spots.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5)))
      .groupBy(_._1)
      .flatMap { case (doc, rows) =>
        val ordered = rows.sortBy(_._2).map(r => Spot(r._3, r._4, r._5, r._6)).toSeq
        Spots.parseTop(ordered, triuMode = true).toVector.map { case (h, t) => (doc, h, t) }
      }.toSet
    assert(windowed == kernel)
  }
}
