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

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Plain-Scala mirror of [[ColFns.h32]]: first 8 hex chars of md5 as an
    * unsigned 32-bit value in a Long (= first 4 digest bytes, big-endian).
    */
  private def h32s(s: String): Long = {
    val d = md5Local.get().digest(s.getBytes("UTF-8"))
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) | ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  /** verdict bucket 0..9 for one item: < 8 keep, == 8 duplicate, else drop.
    * Runs inside the typed eval kernels (the earlier `flatten(transform(..))`
    * column form was CodegenFallback — interpreted per element — and sat in
    * four oracle queries' hot loop).
    */
  private def perturbItems(url: String, items: Seq[String]): Seq[String] =
    items.flatMap { x =>
      val m = h32s(url + "|" + x) % 10
      if (m < 8) x :: Nil else if (m == 8) x :: x :: Nil else Nil
    }

  /** "key\u0001value" item strings from parallel key/value field arrays. */
  private def kvItems(ks: Seq[String], vs: Seq[String]): Seq[String] =
    ks.iterator.zip(vs.iterator).map { case (k, v) => k + "\u0001" + v }.toVector

  /** "head:tail" strings from a flattened multimap (head, tails[]) pair. */
  private def multiItems(heads: Seq[Int], tails: Seq[Seq[Int]]): Seq[String] =
    heads.iterator.zip(tails.iterator)
      .flatMap { case (h, ts) => ts.map(t => s"$h:$t") }.toVector

  /** "head:tail" strings from parallel head/tail field arrays. */
  private def pairItems(heads: Seq[Int], tails: Seq[Int]): Seq[String] =
    heads.iterator.zip(tails.iterator).map { case (h, t) => s"$h:$t" }.toVector

  def perturbedEval(spark: SparkSession, goldenPath: String): DataFrame = {
    import spark.implicits._
    // field extraction via GetArrayStructFields (a codegen'd projection, no
    // interpreted lambda); item assembly + perturbation live in the typed
    // kernel alongside the membership counting
    val g = spark.read.parquet(goldenPath)
      .select(col("url"), col("kv.key").as("gk"), col("kv.value").as("gv"),
        col("lines.text").as("gln"))
    val counts = g
      .as[(String, Seq[String], Seq[String], Seq[String])]
      .map { case (url, gk, gv, gln) =>
        val gkv = kvItems(gk, gv)
        val kv = PairMetrics.membershipCounts(perturbItems(url, gkv), gkv)
        val ln = PairMetrics.membershipCounts(perturbItems(url, gln), gln)
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
    val g = spark.read.parquet(goldenPath)
      .select(col("url"),
        col("entHead.head").as("ehh"), col("entHead.tails").as("eht"),
        col("groupHead.head").as("ghh"), col("groupHead.tail").as("ght"))
    val counts = g
      .as[(String, Seq[Int], Seq[Seq[Int]], Seq[Int], Seq[Int])]
      .map { case (url, ehh, eht, ghh, ght) =>
        val geh = multiItems(ehh, eht)
        val ggh = pairItems(ghh, ght)
        val e = PairMetrics.membershipCounts(perturbItems(url, geh), geh)
        val r = PairMetrics.membershipCounts(perturbItems(url, ggh), ggh)
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
    val g = spark.read.parquet(goldenPath)
      .select(col("url"),
        col("entTail.head").as("eth"), col("entTail.tails").as("ett"),
        col("groupTail.head").as("glh"), col("groupTail.tail").as("glt"))
    val counts = g
      .as[(String, Seq[Int], Seq[Seq[Int]], Seq[Int], Seq[Int])]
      .map { case (url, eth, ett, glh, glt) =>
        val get = multiItems(eth, ett)
        val ggl = pairItems(glh, glt)
        val e = PairMetrics.membershipCounts(perturbItems(url, get), get)
        val r = PairMetrics.membershipCounts(perturbItems(url, ggl), ggl)
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
      .select(col("url"), col("kv.key").as("gk"), col("kv.value").as("gv"),
        col("lines.text").as("gln"))
    g.as[(String, Seq[String], Seq[String], Seq[String])]
      .flatMap { case (url, gk, gv, gln) =>
        val gkv = kvItems(gk, gv)
        val pkv = perturbItems(url, gkv)
        val pln = perturbItems(url, gln)
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
