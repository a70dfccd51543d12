package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Pipeline

/** Separate-JVM scaling evidence: runs the extraction stage on a
  * `local-cluster[N, 1, mem]` master — REAL executor processes with their
  * own heaps and GC, the closest sandbox analogue to independent cluster
  * executors (vs `local[N]` threads sharing one heap and allocator).
  *
  * Usage (after `sbt package`, which provides the jar executors fetch):
  *   SPARK_HOME=/opt/spark sbt -batch \
  *     "Test/runMain graft.tools.DriveCluster <nExec> <pagesDir> <mult>"
  *
  * Prints one line: `cluster <nExec> <docs> <sec> <docsPerSec>`.
  */
object DriveCluster {
  def main(args: Array[String]): Unit = {
    val nExec = args(0).toInt
    val pagesDir = args(1)
    val mult = if (args.length > 2) args(2).toInt else 1
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .master(s"local-cluster[$nExec,1,1536]")
      .appName(s"graft-cluster-$nExec")
      // same-machine executors: point their classloader at the compiled
      // classes directly (no jar/package step needed)
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.shuffle.partitions", nExec.toString)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warmup (JIT in each executor JVM + page cache)
      Pipeline.extract(spark.read.parquet(pagesDir).limit(2000)).count()
      def job(): Long = {
        val input = (1 to mult).map(_ => spark.read.parquet(pagesDir)).reduce(_ union _)
        Pipeline.extract(input).count()
      }
      job() // full warmup pass
      val t0 = System.nanoTime()
      val docs = job()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"cluster $nExec $docs $sec%.3f ${docs / sec}%.1f")
    } finally spark.stop()
  }
}
