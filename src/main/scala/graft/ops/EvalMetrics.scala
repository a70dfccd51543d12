package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.PairMetrics
import ColFns._

/** The reference's evaluation semantics (SURVEY.md §2 E1/E3) exposed as a
  * driver-checkable query: micro P/R/F1 of a prediction set against golden
  * KV pairs and lines.
  *
  * The "prediction" is the golden set deterministically perturbed
  * (md5-derived per-item verdict: ~80% kept, ~10% duplicated, ~10%
  * dropped), so precision/recall are non-trivial AND the reference's
  * duplicate-membership counting quirk (evaluation.py:31-33 — a duplicated
  * correct prediction counts twice) is genuinely exercised end-to-end.
  *
  * The engine path runs the real kernel ([[PairMetrics.membershipCounts]])
  * inside a typed map + hash aggregate; the DuckDB oracle recomputes the
  * same counts relationally with list functions — two independent code
  * paths over the same algebra.
  */
object EvalMetrics {

  final case class EvalCounts(url: String,
      kvPred: Long, kvGt: Long, kvCorrect: Long,
      lnPred: Long, lnGt: Long, lnCorrect: Long)

  /** verdict bucket 0..9 for one item: < 8 keep, == 8 duplicate, else drop */
  private def perturb(items: Column): Column =
    flatten(transform(items, x => {
      val m = h32(concat(col("url"), lit("|"), x)) % 10
      when(m < 8, array(x))
        .when(m === 8, array(x, x))
        .otherwise(array().cast("array<string>"))
    }))

  def perturbedEval(spark: SparkSession, goldenPath: String): DataFrame = {
    import spark.implicits._
    val g = spark.read.parquet(goldenPath)
      .select(col("url"),
        transform(col("kv"), x => concat(x.getField("key"), lit("\u0001"), x.getField("value"))).as("gkv"),
        transform(col("lines"), l => l.getField("text")).as("gln"))
      .select(col("url"), col("gkv"), col("gln"),
        perturb(col("gkv")).as("pkv"), perturb(col("gln")).as("pln"))
    val counts = g
      .as[(String, Seq[String], Seq[String], Seq[String], Seq[String])]
      .map { case (url, gkv, gln, pkv, pln) =>
        val kv = PairMetrics.membershipCounts(pkv, gkv)
        val ln = PairMetrics.membershipCounts(pln, gln)
        EvalCounts(url, kv.pred, kv.gt, kv.correct, ln.pred, ln.gt, ln.correct)
      }
    val agged = counts.dropDuplicates("url").agg(
      count(lit(1)).as("nDocs"),
      sum("kvPred").as("kvPred"), sum("kvGt").as("kvGt"), sum("kvCorrect").as("kvCorrect"),
      sum("lnPred").as("lnPred"), sum("lnGt").as("lnGt"), sum("lnCorrect").as("lnCorrect"))
    withPrf(withPrf(agged, "kv"), "ln")
  }

  private def withPrf(df: DataFrame, g: String): DataFrame = {
    val p = col(s"${g}Correct").cast("double") / col(s"${g}Pred").cast("double")
    val r = col(s"${g}Correct").cast("double") / col(s"${g}Gt").cast("double")
    df.withColumn(s"${g}P", when(col(s"${g}Pred") > 0, p).otherwise(lit(0.0)))
      .withColumn(s"${g}R", when(col(s"${g}Gt") > 0, r).otherwise(lit(0.0)))
      .withColumn(s"${g}PMicro", micro(col(s"${g}P")))
      .withColumn(s"${g}RMicro", micro(col(s"${g}R")))
      .withColumn(s"${g}F1Micro",
        micro(when(col(s"${g}P") + col(s"${g}R") > 0,
          lit(2.0) * col(s"${g}P") * col(s"${g}R") / (col(s"${g}P") + col(s"${g}R")))
          .otherwise(lit(0.0))))
      .drop(s"${g}P", s"${g}R")
  }

  /** Linking-granularity eval (SURVEY.md §2 E6 multimap flatten + E1): the
    * entHead multimap flattens to "head:tail" pair strings, groupHead pairs
    * likewise; same perturbation and membership counting as the KV eval.
    */
  def perturbedLinkEval(spark: SparkSession, goldenPath: String): DataFrame = {
    import spark.implicits._
    val eh = flatten(transform(col("entHead"),
      x => transform(x.getField("tails"),
        t => concat(x.getField("head").cast("string"), lit(":"), t.cast("string")))))
    val gh = transform(col("groupHead"),
      p => concat(p.getField("head").cast("string"), lit(":"), p.getField("tail").cast("string")))
    val g = spark.read.parquet(goldenPath)
      .select(col("url"), eh.as("geh"), gh.as("ggh"))
      .select(col("url"), col("geh"), col("ggh"),
        perturb(col("geh")).as("peh"), perturb(col("ggh")).as("pgh"))
    val counts = g
      .as[(String, Seq[String], Seq[String], Seq[String], Seq[String])]
      .map { case (url, geh, ggh, peh, pgh) =>
        val e = PairMetrics.membershipCounts(peh, geh)
        val r = PairMetrics.membershipCounts(pgh, ggh)
        EvalCounts(url, e.pred, e.gt, e.correct, r.pred, r.gt, r.correct)
      }
    val agged = counts.dropDuplicates("url").agg(
      count(lit(1)).as("nDocs"),
      sum("kvPred").as("ehPred"), sum("kvGt").as("ehGt"), sum("kvCorrect").as("ehCorrect"),
      sum("lnPred").as("ghPred"), sum("lnGt").as("ghGt"), sum("lnCorrect").as("ghCorrect"))
    withPrf(withPrf(agged, "eh"), "gh")
  }

  /** entTail/groupTail granularities (completes the reference's six,
    * pipeline/evaluation.py:210-665): entTail is the tail->heads multimap
    * flattened to "tail:head" strings, groupTail the t2t pair list; same
    * perturbation and membership counting as the other eval queries.
    */
  def perturbedTailEval(spark: SparkSession, goldenPath: String): DataFrame = {
    import spark.implicits._
    val et = flatten(transform(col("entTail"),
      x => transform(x.getField("tails"),
        t => concat(x.getField("head").cast("string"), lit(":"), t.cast("string")))))
    val gl = transform(col("groupTail"),
      p => concat(p.getField("head").cast("string"), lit(":"), p.getField("tail").cast("string")))
    val g = spark.read.parquet(goldenPath)
      .select(col("url"), et.as("get"), gl.as("ggl"))
      .select(col("url"), col("get"), col("ggl"),
        perturb(col("get")).as("pet"), perturb(col("ggl")).as("pgl"))
    val counts = g
      .as[(String, Seq[String], Seq[String], Seq[String], Seq[String])]
      .map { case (url, get, ggl, pet, pgl) =>
        val e = PairMetrics.membershipCounts(pet, get)
        val r = PairMetrics.membershipCounts(pgl, ggl)
        EvalCounts(url, e.pred, e.gt, e.correct, r.pred, r.gt, r.correct)
      }
    val agged = counts.dropDuplicates("url").agg(
      count(lit(1)).as("nDocs"),
      sum("kvPred").as("etPred"), sum("kvGt").as("etGt"), sum("kvCorrect").as("etCorrect"),
      sum("lnPred").as("glPred"), sum("lnGt").as("glGt"), sum("lnCorrect").as("glCorrect"))
    withPrf(withPrf(agged, "et"), "gl")
  }

  /** Per-sample TP/FP/FN detail rows over the perturbed prediction — the
    * reference's `--save_eval_detail` record shape (evaluation.py:72-93)
    * driven through the REAL [[PairMetrics.detail]] kernel, oracle-checked
    * row-by-row (verdict multiplicity and FN semantics pinned exactly).
    */
  def perturbedDetail(spark: SparkSession, goldenPath: String): DataFrame = {
    import spark.implicits._
    val g = spark.read.parquet(goldenPath)
      .select(col("url"),
        transform(col("kv"), x => concat(x.getField("key"), lit("\u0001"), x.getField("value"))).as("gkv"),
        transform(col("lines"), l => l.getField("text")).as("gln"))
      .select(col("url"), col("gkv"), col("gln"),
        perturb(col("gkv")).as("pkv"), perturb(col("gln")).as("pln"))
    g.as[(String, Seq[String], Seq[String], Seq[String], Seq[String])]
      .flatMap { case (url, gkv, gln, pkv, pln) =>
        PairMetrics.detail(pkv, gkv).map { case (v, i) => (url, "kv", v, i) } ++
          PairMetrics.detail(pln, gln).map { case (v, i) => (url, "line", v, i) }
      }
      .toDF("url", "granularity", "verdict", "item")
      .orderBy("url", "granularity", "verdict", "item")
  }

  def perturbedTailEvalSql(goldenGlob: String): String = {
    def perturbSql(items: String): String = {
      val m = sqlH32("url || '|' || x") + " % 10"
      s"flatten(list_transform($items, x -> CASE WHEN $m < 8 THEN [x] WHEN $m = 8 THEN [x,x] ELSE [] END))"
    }
    def prf(g: String): String = {
      val p = s"CASE WHEN ${g}Pred > 0 THEN CAST(${g}Correct AS DOUBLE)/CAST(${g}Pred AS DOUBLE) ELSE 0.0 END"
      val r = s"CASE WHEN ${g}Gt > 0 THEN CAST(${g}Correct AS DOUBLE)/CAST(${g}Gt AS DOUBLE) ELSE 0.0 END"
      s"""${sqlMicro(p)} AS ${g}PMicro, ${sqlMicro(r)} AS ${g}RMicro,
         |  ${sqlMicro(s"CASE WHEN ($p) + ($r) > 0 THEN 2.0*($p)*($r)/(($p) + ($r)) ELSE 0.0 END")} AS ${g}F1Micro""".stripMargin
    }
    s"""WITH g AS (SELECT url,
       |    flatten(list_transform(entTail, x -> list_transform(x.tails, t -> x.head || ':' || t))) AS get1,
       |    list_transform(groupTail, p -> p.head || ':' || p.tail) AS ggl
       |  FROM read_parquet('$goldenGlob')),
       |p AS (SELECT url, get1, ggl, ${perturbSql("get1")} AS pet, ${perturbSql("ggl")} AS pgl FROM g),
       |c0 AS (SELECT url,
       |    CAST(len(pet) AS BIGINT) AS etPred, CAST(len(get1) AS BIGINT) AS etGt,
       |    CAST(len(list_filter(pet, x -> list_contains(get1, x))) AS BIGINT) AS etCorrect,
       |    CAST(len(pgl) AS BIGINT) AS glPred, CAST(len(ggl) AS BIGINT) AS glGt,
       |    CAST(len(list_filter(pgl, x -> list_contains(ggl, x))) AS BIGINT) AS glCorrect
       |  FROM p),
       |c AS (SELECT * FROM (SELECT c0.*, row_number() OVER (PARTITION BY url ORDER BY url) AS rn
       |  FROM c0) WHERE rn = 1),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS nDocs,
       |    CAST(sum(etPred) AS BIGINT) AS etPred, CAST(sum(etGt) AS BIGINT) AS etGt,
       |    CAST(sum(etCorrect) AS BIGINT) AS etCorrect,
       |    CAST(sum(glPred) AS BIGINT) AS glPred, CAST(sum(glGt) AS BIGINT) AS glGt,
       |    CAST(sum(glCorrect) AS BIGINT) AS glCorrect
       |  FROM c)
       |SELECT nDocs, etPred, etGt, etCorrect, glPred, glGt, glCorrect,
       |  ${prf("et")},
       |  ${prf("gl")}
       |FROM a""".stripMargin
  }

  def perturbedDetailSql(goldenGlob: String): String = {
    def perturbSql(items: String): String = {
      val m = sqlH32("url || '|' || x") + " % 10"
      s"flatten(list_transform($items, x -> CASE WHEN $m < 8 THEN [x] WHEN $m = 8 THEN [x,x] ELSE [] END))"
    }
    s"""WITH g AS (SELECT url,
       |    list_transform(kv, x -> x."key" || chr(1) || x."value") AS gkv,
       |    list_transform(lines, l -> l.text) AS gln
       |  FROM read_parquet('$goldenGlob')),
       |p AS (SELECT url, gkv, gln, ${perturbSql("gkv")} AS pkv, ${perturbSql("gln")} AS pln FROM g),
       |tpfp AS (
       |  SELECT url, 'kv' AS granularity,
       |    CASE WHEN list_contains(gkv, x) THEN 'TP' ELSE 'FP' END AS verdict, x AS item
       |  FROM p, unnest(pkv) AS t(x)
       |  UNION ALL
       |  SELECT url, 'line',
       |    CASE WHEN list_contains(gln, x) THEN 'TP' ELSE 'FP' END, x
       |  FROM p, unnest(pln) AS t(x)),
       |fn AS (
       |  SELECT url, 'kv' AS granularity, 'FN' AS verdict, x AS item
       |  FROM p, unnest(gkv) AS t(x) WHERE NOT list_contains(pkv, x)
       |  UNION ALL
       |  SELECT url, 'line', 'FN', x
       |  FROM p, unnest(gln) AS t(x) WHERE NOT list_contains(pln, x))
       |SELECT url, granularity, verdict, item
       |FROM (SELECT * FROM tpfp UNION ALL SELECT * FROM fn)
       |ORDER BY url, granularity, verdict, item""".stripMargin
  }

  def perturbedLinkEvalSql(goldenGlob: String): String = {
    def perturbSql(items: String): String = {
      val m = sqlH32("url || '|' || x") + " % 10"
      s"flatten(list_transform($items, x -> CASE WHEN $m < 8 THEN [x] WHEN $m = 8 THEN [x,x] ELSE [] END))"
    }
    def prf(g: String): String = {
      val p = s"CASE WHEN ${g}Pred > 0 THEN CAST(${g}Correct AS DOUBLE)/CAST(${g}Pred AS DOUBLE) ELSE 0.0 END"
      val r = s"CASE WHEN ${g}Gt > 0 THEN CAST(${g}Correct AS DOUBLE)/CAST(${g}Gt AS DOUBLE) ELSE 0.0 END"
      s"""${sqlMicro(p)} AS ${g}PMicro, ${sqlMicro(r)} AS ${g}RMicro,
         |  ${sqlMicro(s"CASE WHEN ($p) + ($r) > 0 THEN 2.0*($p)*($r)/(($p) + ($r)) ELSE 0.0 END")} AS ${g}F1Micro""".stripMargin
    }
    s"""WITH g AS (SELECT url,
       |    flatten(list_transform(entHead, x -> list_transform(x.tails, t -> x.head || ':' || t))) AS geh,
       |    list_transform(groupHead, p -> p.head || ':' || p.tail) AS ggh
       |  FROM read_parquet('$goldenGlob')),
       |p AS (SELECT url, geh, ggh, ${perturbSql("geh")} AS peh, ${perturbSql("ggh")} AS pgh FROM g),
       |c0 AS (SELECT url,
       |    CAST(len(peh) AS BIGINT) AS ehPred, CAST(len(geh) AS BIGINT) AS ehGt,
       |    CAST(len(list_filter(peh, x -> list_contains(geh, x))) AS BIGINT) AS ehCorrect,
       |    CAST(len(pgh) AS BIGINT) AS ghPred, CAST(len(ggh) AS BIGINT) AS ghGt,
       |    CAST(len(list_filter(pgh, x -> list_contains(ggh, x))) AS BIGINT) AS ghCorrect
       |  FROM p),
       |c AS (SELECT * FROM (SELECT c0.*, row_number() OVER (PARTITION BY url ORDER BY url) AS rn
       |  FROM c0) WHERE rn = 1),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS nDocs,
       |    CAST(sum(ehPred) AS BIGINT) AS ehPred, CAST(sum(ehGt) AS BIGINT) AS ehGt,
       |    CAST(sum(ehCorrect) AS BIGINT) AS ehCorrect,
       |    CAST(sum(ghPred) AS BIGINT) AS ghPred, CAST(sum(ghGt) AS BIGINT) AS ghGt,
       |    CAST(sum(ghCorrect) AS BIGINT) AS ghCorrect
       |  FROM c)
       |SELECT nDocs, ehPred, ehGt, ehCorrect, ghPred, ghGt, ghCorrect,
       |  ${prf("eh")},
       |  ${prf("gh")}
       |FROM a""".stripMargin
  }

  def perturbedEvalSql(goldenGlob: String): String = {
    def perturbSql(items: String): String = {
      val m = sqlH32("url || '|' || x") + " % 10"
      s"flatten(list_transform($items, x -> CASE WHEN $m < 8 THEN [x] WHEN $m = 8 THEN [x,x] ELSE [] END))"
    }
    def prf(g: String): String = {
      val p = s"CASE WHEN ${g}Pred > 0 THEN CAST(${g}Correct AS DOUBLE)/CAST(${g}Pred AS DOUBLE) ELSE 0.0 END"
      val r = s"CASE WHEN ${g}Gt > 0 THEN CAST(${g}Correct AS DOUBLE)/CAST(${g}Gt AS DOUBLE) ELSE 0.0 END"
      s"""${sqlMicro(p)} AS ${g}PMicro, ${sqlMicro(r)} AS ${g}RMicro,
         |  ${sqlMicro(s"CASE WHEN ($p) + ($r) > 0 THEN 2.0*($p)*($r)/(($p) + ($r)) ELSE 0.0 END")} AS ${g}F1Micro""".stripMargin
    }
    s"""WITH g AS (SELECT url,
       |    list_transform(kv, x -> x."key" || chr(1) || x."value") AS gkv,
       |    list_transform(lines, l -> l.text) AS gln
       |  FROM read_parquet('$goldenGlob')),
       |p AS (SELECT url, gkv, gln, ${perturbSql("gkv")} AS pkv, ${perturbSql("gln")} AS pln FROM g),
       |c0 AS (SELECT url,
       |    CAST(len(pkv) AS BIGINT) AS kvPred, CAST(len(gkv) AS BIGINT) AS kvGt,
       |    CAST(len(list_filter(pkv, x -> list_contains(gkv, x))) AS BIGINT) AS kvCorrect,
       |    CAST(len(pln) AS BIGINT) AS lnPred, CAST(len(gln) AS BIGINT) AS lnGt,
       |    CAST(len(list_filter(pln, x -> list_contains(gln, x))) AS BIGINT) AS lnCorrect
       |  FROM p),
       |c AS (SELECT * FROM (SELECT c0.*, row_number() OVER (PARTITION BY url ORDER BY url) AS rn
       |  FROM c0) WHERE rn = 1),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS nDocs,
       |    CAST(sum(kvPred) AS BIGINT) AS kvPred, CAST(sum(kvGt) AS BIGINT) AS kvGt,
       |    CAST(sum(kvCorrect) AS BIGINT) AS kvCorrect,
       |    CAST(sum(lnPred) AS BIGINT) AS lnPred, CAST(sum(lnGt) AS BIGINT) AS lnGt,
       |    CAST(sum(lnCorrect) AS BIGINT) AS lnCorrect
       |  FROM c)
       |SELECT nDocs, kvPred, kvGt, kvCorrect, lnPred, lnGt, lnCorrect,
       |  ${prf("kv")},
       |  ${prf("ln")}
       |FROM a""".stripMargin
  }
}
