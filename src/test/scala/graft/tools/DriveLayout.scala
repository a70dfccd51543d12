package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Pipeline

/** Scratch A/B: pages file-layout (257 small files vs 32 compacted) under the
  * official bench session shape (128m maxPartitionBytes). Same rows, same
  * session, alternating runs so ambient drift hits both variants.
  */
object DriveLayout {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val newPath = graft.app.Corpus.pagesPath("/root/testdata/sf0.1")
    val oldPath = "/tmp/pages_old_layout.parquet"
    if (!new java.io.File(oldPath, "_SUCCESS").exists()) {
      // the pre-change layout: defaultParallelism range tasks x 8 langs
      val n = graft.app.Corpus.docsFor("/root/testdata/sf0.1")
      spark.range(0, n.toLong, 1, spark.sparkContext.defaultParallelism)
        .map(i => graft.synth.CorpusGen.pageFor(i)._2)
        .write.mode("overwrite").partitionBy("lang").parquet(oldPath)
    }
    def t(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[layout] $name%-34s $s%8.3f s"); s
    }
    def extract(p: String): Unit =
      Pipeline.extract(spark.read.parquet(p)).foreach(_ => ())
    def aggQ(p: String): Unit = { // p3-shaped: host agg over a narrow column
      spark.read.parquet(p)
        .groupBy(expr("parse_url(url, 'HOST')").as("h")).agg(count(lit(1)))
        .count()
    }
    // warm both
    extract(oldPath); extract(newPath); aggQ(oldPath); aggQ(newPath)
    val reps = 5
    val res = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      res("extract_old") ::= t("extract old(257f)")(extract(oldPath))
      res("extract_new") ::= t("extract new(32f)")(extract(newPath))
      res("agg_old") ::= t("agg old(257f)")(aggQ(oldPath))
      res("agg_new") ::= t("agg new(32f)")(aggQ(newPath))
    }
    res.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val s = v.sorted
      println(f"[layout] MED $k%-14s ${s(s.size / 2)}%8.3f  min ${s.head}%8.3f")
    }
    spark.stop()
  }
}
