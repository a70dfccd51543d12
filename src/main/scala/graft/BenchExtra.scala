package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing harness for optimization work (guide §1).
  *
  * NOT the driver contract — that is Bench.scala (frozen). This main exists
  * so a single query (or a short list) can be measured in isolation with the
  * SAME session shape and action as the official bench (`local[$cpus]`,
  * shuffle.partitions=cpus, AQE on, one untimed warm pass, timed `.count()`),
  * plus optional repeats and a noop-sink mode (guide §1.4) that forces every
  * column to be computed so projection-pruning can't flatter a number.
  *
  * Usage: runMain graft.BenchExtra [--reps N] [--noop] q1 q2 ...  (or: all)
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    var reps = 3
    var noop = false
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--noop" => noop = true; i += 1
        case n        => names += n; i += 1
      }
    }
    val all = SparkEntry.queries
    val sel =
      if (names.isEmpty || names.contains("all")) all.keys.toSeq.sorted
      else names.toSeq
    val spark = session(cpus)
    graft.app.Corpus.ensure(spark, sfDir)
    def run(name: String): Unit = {
      val df = all(name)(spark, sfDir)
      if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
    }
    // one untimed warm pass per selected query (matches Bench's protocol)
    sel.foreach { n =>
      spark.sparkContext.setJobDescription(s"warm:$n")
      try run(n) catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"warm $n failed: $e") }
    }
    val out = sel.map { n =>
      val ts = (1 to reps).map { r =>
        spark.sparkContext.setJobDescription(s"timed:$n:$r")
        try time(run(n)) catch { case scala.util.control.NonFatal(_) => -1.0 }
      }
      val ok = ts.filter(_ >= 0)
      val med =
        if (ok.isEmpty) -1.0
        else { val s = ok.sorted; s(s.size / 2) }
      println(f"$n%-24s med=${med}%8.3f min=${if (ok.isEmpty) -1.0 else ok.min}%8.3f  ${ts.map(t => f"$t%.3f").mkString(" ")}")
      n -> med
    }
    println("TOTAL(med) " + f"${out.map(_._2).filter(_ >= 0).sum}%.3f")
    spark.stop()
  }
}
