package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Scratch: bare-scan cost anatomy for the pages table under the bench
  * session shape (what does one 31-task scan stage actually cost?).
  */
object DriveScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val run = new AtomicLong(0); val cpu = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          run.addAndGet(t.taskMetrics.executorRunTime)
          cpu.addAndGet(t.taskMetrics.executorCpuTime / 1000000L)
        }
    })
    val p = graft.app.Corpus.pagesPath("/root/testdata/sf0.1")
    def t(name: String)(f: => Any): Unit = {
      run.set(0); cpu.set(0)
      val t0 = System.nanoTime(); f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[scan] $name%-38s wall=$w%7.3f run=${run.get / 1e3}%7.2f cpu=${cpu.get / 1e3}%7.2f")
    }
    // warm
    spark.read.parquet(p).select("url").count()
    spark.read.parquet(p).select("url").count()
    (1 to 3).foreach { i =>
      t(s"select(url).count #$i")(spark.read.parquet(p).select("url").count())
      t(s"regexp host agg #$i")(
        spark.read.parquet(p)
          .select(regexp_extract(col("url"), "^[a-z]+://([^/:?#]+)", 1).as("h"))
          .groupBy("h").count().count())
      t(s"substr host agg #$i")(
        spark.read.parquet(p)
          .select(substring_index(substring_index(col("url"), "://", -1), "/", 1).as("h"))
          .groupBy("h").count().count())
      t(s"regexp noop (no agg) #$i")(
        spark.read.parquet(p)
          .select(regexp_extract(col("url"), "^[a-z]+://([^/:?#]+)", 1).as("h"))
          .write.format("noop").mode("overwrite").save())
      t(s"agg on raw url #$i")(
        spark.read.parquet(p).groupBy("url").count().count())
      t(s"agg on long key #$i")(
        spark.read.parquet(p).select(xxhash64(col("url")).as("k"))
          .groupBy("k").count().count())
      t(s"agg url 1task coalesce #$i")(
        spark.read.parquet(p).coalesce(1).groupBy("url").count().count())
      t(s"distinct url #$i")(
        spark.read.parquet(p).select("url").distinct().count())
    }
    spark.stop()
  }
}
