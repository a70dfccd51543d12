package graft

import org.apache.spark.sql.SparkSession
import graft.app.Corpus
import graft.engine.Pipeline

/** Benchmark main (driver contract: ONE JSON line on stdout).
  *
  * Reports (a) per-query seconds for every SparkEntry query at
  * SPARK_GRAFT_CPUS, and (b) the scaling evidence required by BASELINE.json:
  * the identical extraction job at local[8] vs local[32] over the same
  * corpus, throughput at both, and scaling efficiency
  * (thr32 / thr8) / (32/8) — the sandbox proxy for N vs 4N executors.
  * Efficiency is computed on the map-only extract stage (CPU-bound kernel);
  * a full run including the bucketed parquet write is timed separately so
  * single-disk I/O contention doesn't pollute the scaling number.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // --- phase 1: per-query timings at the requested parallelism ---
    var spark = session(cpus)
    Corpus.ensure(spark, sfDir)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, sec) =
        try time(fn(spark, sfDir).count())
        catch { case _: Throwable => (-1L, -1.0) }
      name -> sec
    }

    // --- phase 2: scaling evidence (local[8] vs local[32], same input) ---
    val pagesPath = Corpus.pagesPath(sfDir)
    val nDocs = Corpus.docsFor(sfDir).toLong
    // JIT warmup on a prefix so both timed runs see hot code
    Pipeline.extract(spark.read.parquet(pagesPath).limit(500)).foreach(_ => ())
    spark.stop()

    def extractThroughput(p: Int): (Double, Double) = {
      val s = session(p)
      val (_, sec) = time {
        Pipeline.extract(s.read.parquet(pagesPath)).foreach(_ => ())
      }
      s.stop()
      (sec, nDocs / sec)
    }
    val (sec8, thr8) = extractThroughput(8)
    val (sec32, thr32) = extractThroughput(32)
    val efficiency = (thr32 / thr8) / 4.0

    // full run (read -> salt -> extract -> bucketed write + lineage) at 32
    val s32 = session(32)
    val outDir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-bench-out"
    val (_, fullSec) = time {
      Pipeline.run(s32, pagesPath, outDir, partitions = 32, salts = 8)
    }
    s32.stop()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val extraction =
      s"""{"docs":$nDocs,"sec8":$sec8,"sec32":$sec32,"docs_per_sec_8":$thr8,"docs_per_sec_32":$thr32,""" +
        s""""scaling_efficiency":$efficiency,"full_run_sec":$fullSec,"full_docs_per_sec":${nDocs / fullSec}}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","extraction":$extraction}""")
  }
}
