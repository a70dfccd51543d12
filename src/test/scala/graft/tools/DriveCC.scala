package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B timing of componentsFrom strategies (graft.cc.mode) on
  * the components-family queries, all in ONE JVM so ambient drift hits all
  * variants equally. Usage:
  *   Test/runMain graft.tools.DriveCC <reps> <mode1> <mode2> ... -- <q1> <q2> ...
  */
object DriveCC {
  def main(args: Array[String]): Unit = {
    val sep = args.indexOf("--")
    val reps = args(0).toInt
    val modes = args.slice(1, sep).toSeq
    val qs = args.drop(sep + 1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.app.Corpus.ensure(spark, sfDir)
    // warm
    qs.foreach(q => graft.SparkEntry.queries(q)(spark, sfDir).count())
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    for (_ <- 1 to reps; m <- modes; q <- qs) {
      sys.props("graft.cc.mode") = m
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      acc((q, m)) = sec :: acc.getOrElse((q, m), Nil)
    }
    for (q <- qs; m <- modes) {
      val ts = acc((q, m)).sorted
      println(f"$q%-24s mode=$m%-5s med=${ts(ts.size / 2)}%7.3f min=${ts.head}%7.3f  ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
