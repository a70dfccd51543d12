package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import ColFns._

/** Text-analysis operators for a large-scale training-data pipeline, over a
  * `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * All four are pure narrow projections (no shuffle, whole-stage codegen,
  * column-pruned scans): at 100 TB they run map-only at input parallelism.
  * Each has a bit-exact DuckDB oracle (see the sql* builders).
  */
object TextAnalysis {

  /** Small per-language stopword profiles for the n-gram/stopword-hit
    * language-ID heuristic. Tie-break priority = declaration order.
    */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "los", "y", "una", "es", "por", "que", "se", "con", "para"),
    "fr" -> Seq("le", "les", "et", "des", "une", "du", "est", "pour", "dans", "au")
  )

  private def hits(w: Column, stop: Seq[String]): Column =
    size(filter(w, x => x.isin(stop.map(s => s: Any): _*)))

  /** Stopword-argmax language prediction as a reusable column expression. */
  def langPredExpr(w: Column): Column = {
    val hitCols = StopwordProfiles.map { case (l, sw) => l -> hits(w, sw) }
    hitCols.zipWithIndex.foldRight(lit("und")) {
      case (((l, h), i), els) =>
        val geRest = hitCols.drop(i + 1)
          .map { case (_, h2) => h >= h2 }
          .foldLeft(h > 0)(_ && _)
        when(geRest, lit(l)).otherwise(els)
    }
  }

  /** Language-ID: stopword-hit counts per profile, argmax with fixed
    * priority tie-break, "und" when no profile hits.
    */
  def langId(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val hitCols = StopwordProfiles.map { case (l, sw) => l -> hits(w, sw) }
    docs.select(
      (col("doc_id") +:
        hitCols.map { case (l, h) => h.as(s"hits_$l") } :+
        langPredExpr(w).as("lang_pred")): _*)
      .orderBy("doc_id")
  }

  def langIdSql(table: String): String = {
    val w = sqlWords("text")
    val hitExpr = StopwordProfiles.map { case (l, sw) =>
      val lst = sw.map(s => s"'$s'").mkString("[", ",", "]")
      l -> s"len(list_filter($w, x -> list_contains($lst, x)))"
    }
    val hitCols = hitExpr.map { case (l, e) => s"CAST($e AS INT) AS hits_$l" }
    val langs = hitExpr.map(_._1)
    val cases = langs.zipWithIndex.map { case (l, i) =>
      val conds = (s"hits_$l > 0" +: langs.drop(i + 1).map(l2 => s"hits_$l >= hits_$l2"))
        .mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, ${langs.map(l => s"hits_$l").mkString(", ")},
       |  CASE $cases ELSE 'und' END AS lang_pred
       |FROM (SELECT doc_id, ${hitCols.mkString(", ")} FROM $table)
       |ORDER BY doc_id""".stripMargin
  }

  /** Composite quality score in exact micro units, reusable expression. */
  def qualityScoreMicroExpr(w: Column): Column = {
    val nWords = size(w).cast("long")
    val stopHits = hits(w, StopwordProfiles.head._2).cast("long")
    val alphaWords = size(filter(w, x => x.rlike("^[a-z]+$"))).cast("long")
    val nw = nWords.cast("double")
    val score = (lit(0.4) * (stopHits.cast("double") / nw)
      + lit(0.3) * (alphaWords.cast("double") / nw)
      + lit(0.3) * least(lit(1.0), nw / lit(200.0)))
    when(nWords > 0, micro(score)).otherwise(lit(0L))
  }

  /** Quality scoring: word count, summed word length, stopword hits,
    * alphabetic-word count, and a composite score in exact micro units.
    */
  def quality(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val nWords = size(w).cast("long")
    val sumWlen = aggregate(transform(w, x => length(x).cast("long")), lit(0L), (a, x) => a + x)
    val stopHits = hits(w, StopwordProfiles.head._2).cast("long")
    val alphaWords = size(filter(w, x => x.rlike("^[a-z]+$"))).cast("long")
    val nw = nWords.cast("double")
    val score = (lit(0.4) * (stopHits.cast("double") / nw)
      + lit(0.3) * (alphaWords.cast("double") / nw)
      + lit(0.3) * least(lit(1.0), nw / lit(200.0)))
    docs.select(col("doc_id"), nWords.as("n_words"), sumWlen.as("sum_wlen"),
        stopHits.as("stop_hits"), alphaWords.as("alpha_words"),
        when(nWords > 0, micro(score)).otherwise(lit(0L)).as("score_micro"))
      .orderBy("doc_id")
  }

  def qualitySql(table: String): String = {
    val w = sqlWords("text")
    val stop = StopwordProfiles.head._2.map(s => s"'$s'").mkString("[", ",", "]")
    s"""SELECT doc_id, n_words, sum_wlen, stop_hits, alpha_words,
       |  CASE WHEN n_words > 0 THEN ${sqlMicro(
        "0.4 * (CAST(stop_hits AS DOUBLE) / CAST(n_words AS DOUBLE)) " +
          "+ 0.3 * (CAST(alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE)) " +
          "+ 0.3 * least(1.0, CAST(n_words AS DOUBLE) / 200.0)")} ELSE 0 END AS score_micro
       |FROM (SELECT doc_id,
       |  CAST(len($w) AS BIGINT) AS n_words,
       |  CAST(list_reduce(list_prepend(0, list_transform($w, x -> length(x))), (a,x) -> a+x) AS BIGINT) AS sum_wlen,
       |  CAST(len(list_filter($w, x -> list_contains($stop, x))) AS BIGINT) AS stop_hits,
       |  CAST(len(list_filter($w, x -> regexp_matches(x, '^[a-z]+$$'))) AS BIGINT) AS alpha_words
       |  FROM $table)
       |ORDER BY doc_id""".stripMargin
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs | digit runs | single other non-space char).
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(words(col("text"))).as("n_ws"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("n_bpe"),
        length(col("text")).cast("long").as("n_chars_t"))
      .orderBy("doc_id")

  def tokenCountsSql(table: String): String =
    s"""SELECT doc_id, CAST(len(${sqlWords("text")}) AS INT) AS n_ws,
       |  CAST(len(regexp_extract_all(text, '$BpePattern')) AS INT) AS n_bpe,
       |  CAST(length(text) AS BIGINT) AS n_chars_t
       |FROM $table ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: a rolling polynomial hash over word hashes
    * (mod 1e9+7 — keeps every intermediate < 2^35, ANSI-overflow-safe), plus
    * a winnowing-style min-hash over 4-gram window hashes.
    */
  val FpMod = 1000000007L

  def fingerprint(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val wh = transform(w, x => h32(x) % lit(FpMod))
    val fp = aggregate(wh, lit(0L), (acc, h) => (acc * lit(31L) + h) % lit(FpMod))
    val sh = shingles(w, 4)
    val winnow = when(size(sh) > 0, array_min(transform(sh, s => h32(s))))
      .otherwise(lit(null).cast("long"))
    docs.select(col("doc_id"), fp.as("fp"), winnow.as("winnow_fp"))
      .orderBy("doc_id")
  }

  def fingerprintSql(table: String): String = {
    val w = sqlWords("text")
    val wh = s"list_transform($w, x -> ${sqlH32("x")} % $FpMod)"
    val sh = sqlShingles(w, 4)
    s"""SELECT doc_id,
       |  list_reduce(list_prepend(0, $wh), (acc,h) -> (acc*31 + h) % $FpMod) AS fp,
       |  CASE WHEN len($sh) > 0 THEN list_min(list_transform($sh, s -> ${sqlH32("s")})) ELSE NULL END AS winnow_fp
       |FROM $table ORDER BY doc_id""".stripMargin
  }
}
