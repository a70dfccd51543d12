package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Ad-hoc plan inspector: prints the formatted plan of a SparkEntry query.
  * Usage: Test/runMain graft.tools.DrivePlan <queryName> [sfDir]
  */
object DrivePlan {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "d2_minhash_lsh"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("drive-plan")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.app.Corpus.ensure(spark, sfDir)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    // executed plan after AQE for exchange-reuse visibility
    df.count()
    println("=== AFTER AQE ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
