package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.PairMetrics

/** Distributed evaluation (SURVEY.md §2 E-block): per-document membership
  * cores run in the join kernel; the micro-aggregation that the reference
  * does with `torch.distributed.all_gather_object` + a driver loop
  * (/root/reference/pipeline/evaluation.py:415-513) is a plain hash
  * aggregate here — partial+final combine comes free from Catalyst, and the
  * fname-dedupe (evaluation.py:483-487) is `dropDuplicates("url")`.
  */
object Eval {

  private def counts[A](pred: Seq[A], gt: Seq[A]): (Long, Long, Long) = {
    val c = PairMetrics.membershipCounts(pred, gt)
    (c.pred, c.gt, c.correct)
  }

  def metricRow(url: String, p: DocOut, g: DocOut): MetricRow = {
    val kv = counts(p.kv.map(x => (x.key, x.value)), g.kv.map(x => (x.key, x.value)))
    val ln = counts(p.lines.map(_.text), g.lines.map(_.text))
    def flat(m: Seq[MultiOut]): Seq[(Int, Int)] =
      m.flatMap(x => x.tails.map(t => (x.head, t)))
    val eh = counts(flat(p.entHead), flat(g.entHead))
    val et = counts(flat(p.entTail), flat(g.entTail))
    def pairs(s: Seq[PairOut]): Seq[(Int, Int)] = s.map(x => (x.head, x.tail))
    val gh = counts(pairs(p.groupHead), pairs(g.groupHead))
    val gt2 = counts(pairs(p.groupTail), pairs(g.groupTail))
    MetricRow(url,
      kv._1, kv._2, kv._3, ln._1, ln._2, ln._3,
      eh._1, eh._2, eh._3, et._1, et._2, et._3,
      gh._1, gh._2, gh._3, gt2._1, gt2._2, gt2._3)
  }

  /** Inner join pred x golden on url, per-doc membership cores in the map. */
  def metricRows(pred: Dataset[DocOut], golden: Dataset[DocOut]): Dataset[MetricRow] = {
    val spark = pred.sparkSession
    import spark.implicits._
    pred.joinWith(golden, pred("url") === golden("url"), "inner")
      .map { case (p, g) => metricRow(p.url, p, g) }
  }

  /** Per-sample TP/FP/FN detail records at all six granularities — the
    * reference's `--save_eval_detail` detail.json
    * (run_rfund.py:294-300, evaluation.py:72-93) as a queryable table.
    * Runs the real [[PairMetrics.detail]] kernel inside the join map.
    */
  def detailRows(pred: Dataset[DocOut], golden: Dataset[DocOut]): Dataset[DetailRow] = {
    val spark = pred.sparkSession
    import spark.implicits._
    def flat(m: Seq[MultiOut]): Seq[String] =
      m.flatMap(x => x.tails.map(t => s"${x.head}:$t"))
    def pairs(s: Seq[PairOut]): Seq[String] = s.map(x => s"${x.head}:${x.tail}")
    pred.joinWith(golden, pred("url") === golden("url"), "inner")
      .flatMap { case (p, g) =>
        def rows(gran: String, pd: Seq[String], gd: Seq[String]): Seq[DetailRow] =
          PairMetrics.detail(pd, gd).map { case (v, item) => DetailRow(p.url, gran, v, item) }
        rows("kv", p.kv.map(x => s"${x.key}\u0001${x.value}"), g.kv.map(x => s"${x.key}\u0001${x.value}")) ++
          rows("line", p.lines.map(_.text), g.lines.map(_.text)) ++
          rows("entHead", flat(p.entHead), flat(g.entHead)) ++
          rows("entTail", flat(p.entTail), flat(g.entTail)) ++
          rows("groupHead", pairs(p.groupHead), pairs(g.groupHead)) ++
          rows("groupTail", pairs(p.groupTail), pairs(g.groupTail))
      }
  }

  /** Micro-aggregate to the six-granularity P/R/F1 report (one row). */
  def aggregate(metrics: Dataset[MetricRow]): DataFrame = {
    val deduped = metrics.dropDuplicates("url")
    val sums = Seq(
      "kv", "line", "entHead", "entTail", "groupHead", "groupTail"
    ).flatMap { g =>
      Seq(sum(col(s"${g}Pred")).as(s"${g}Pred"),
        sum(col(s"${g}Gt")).as(s"${g}Gt"),
        sum(col(s"${g}Correct")).as(s"${g}Correct"))
    }
    val agged = deduped.agg(count(lit(1)).as("numSamples"), sums: _*)
    Seq("kv", "line", "entHead", "entTail", "groupHead", "groupTail")
      .foldLeft(agged) { (df, g) =>
        val p = col(s"${g}Correct") / col(s"${g}Pred")
        val r = col(s"${g}Correct") / col(s"${g}Gt")
        df.withColumn(s"${g}Precision", when(col(s"${g}Pred") > 0, p).otherwise(0.0))
          .withColumn(s"${g}Recall", when(col(s"${g}Gt") > 0, r).otherwise(0.0))
          .withColumn(s"${g}F1",
            when(col(s"${g}Precision") + col(s"${g}Recall") > 0,
              lit(2) * col(s"${g}Precision") * col(s"${g}Recall") /
                (col(s"${g}Precision") + col(s"${g}Recall"))).otherwise(0.0))
      }
  }
}
