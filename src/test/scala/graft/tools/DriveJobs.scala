package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch profiler: per-query job/stage/task counts and aggregate task time
  * under the official bench session shape — pinpoints queries whose wall
  * clock is orchestration (many tiny jobs/stages) vs compute (task time).
  */
object DriveJobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    graft.app.Corpus.ensure(spark, sfDir)
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    val verbose = sys.env.contains("DRIVEJOBS_STAGES")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (verbose) {
          val i = s.stageInfo
          val tm = Option(i.taskMetrics)
          println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d " +
            f"run=${tm.map(_.executorRunTime).getOrElse(0L) / 1e3}%7.2f " +
            f"cpu=${tm.map(_.executorCpuTime).getOrElse(0L) / 1e9}%7.2f " +
            f"gc=${tm.map(_.jvmGCTime).getOrElse(0L) / 1e3}%5.2f  ${i.name.take(90)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
        }
      }
    })
    val all = graft.SparkEntry.queries
    val sel = if (args.isEmpty) Seq("p15_robots_rules") else args.toSeq
    sel.foreach { n => // warm
      try all(n)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) => System.err.println(s"warm $n: $e") }
    }
    Thread.sleep(500)
    sel.foreach { n =>
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); gcMs.set(0)
      val t0 = System.nanoTime()
      all(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      println(f"[jobs] $n%-24s wall=$wall%7.3f jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d taskSec=${taskMs.get / 1e3}%8.2f gcSec=${gcMs.get / 1e3}%6.2f")
    }
    spark.stop()
  }
}
