package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Pipeline

/** Scratch instrumentation for the scaling job's fixed costs. */
object DriveScale {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = graft.app.Corpus.pagesPath("/root/testdata/sf0.1")
    val schema = spark.read.parquet(path).schema
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def input = (1 to 12).map(_ => spark.read.parquet(path)).reduce(_ union _)
    def inputS = (1 to 12).map(_ => spark.read.schema(schema).parquet(path)).reduce(_ union _)
    t("warmup extract limit 2000")(Pipeline.extract(spark.read.parquet(path).limit(2000)).foreach(_ => ()))
    t("extract single (no union)")(Pipeline.extract(spark.read.parquet(path)).foreach(_ => ()))
    t("extract 12x union run1")(Pipeline.extract(input).foreach(_ => ()))
    t("extract 12x union run2")(Pipeline.extract(input).foreach(_ => ()))
    t("scan count (12x union)")(input.count())
    spark.stop()
  }
}
