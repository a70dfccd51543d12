package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import ColFns._

/** Text-analysis operators for a large-scale training-data pipeline, over a
  * `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * All four are pure narrow projections (no shuffle, whole-stage codegen,
  * column-pruned scans): at 100 TB they run map-only at input parallelism.
  * The per-row kernels are native Catalyst expressions
  * ([[graft.functions.TextStatsExpression]] /
  * [[graft.functions.FingerprintExpression]]) — ONE compiled byte-level
  * pass per document instead of the round-1 higher-order-function chains
  * (CodegenFallback, interpreted per element, re-evaluated per consuming
  * branch). Each op keeps a bit-exact DuckDB oracle (see the sql*
  * builders — the SQL text is unchanged from the HOF form, which is the
  * point: same semantics, faster plan).
  */
object TextAnalysis {

  /** Stopword profiles (priority order) — sourced from the native
    * expression so the kernel and the SQL builders cannot drift.
    */
  val StopwordProfiles: Seq[(String, Seq[String])] =
    graft.functions.TextStatsExpression.StopwordProfiles

  private val Langs = StopwordProfiles.map(_._1)

  /** struct(n_words, sum_wlen, alpha_words, hits_en, hits_de, hits_es,
    * hits_fr) in one native pass.
    */
  def statsCol(text: Column): Column = call_function("graft_text_stats", text)

  /** Stopword-argmax language prediction over a stats struct. */
  def langPredFromStats(st: Column): Column = {
    val hitCols = Langs.map(l => l -> st.getField(s"hits_$l"))
    hitCols.zipWithIndex.foldRight(lit("und")) {
      case (((l, h), i), els) =>
        val geRest = hitCols.drop(i + 1)
          .map { case (_, h2) => h >= h2 }
          .foldLeft(h > 0)(_ && _)
        when(geRest, lit(l)).otherwise(els)
    }
  }

  /** Composite quality score in exact micro units over a stats struct. */
  def qualityScoreMicroFromStats(st: Column): Column = {
    val nWords = st.getField("n_words")
    val stopHits = st.getField("hits_en") // head profile
    val alphaWords = st.getField("alpha_words")
    val nw = nWords.cast("double")
    val score = (lit(0.4) * (stopHits.cast("double") / nw)
      + lit(0.3) * (alphaWords.cast("double") / nw)
      + lit(0.3) * least(lit(1.0), nw / lit(200.0)))
    when(nWords > 0, micro(score)).otherwise(lit(0L))
  }

  /** Language-ID: stopword-hit counts per profile, argmax with fixed
    * priority tie-break, "und" when no profile hits.
    */
  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), statsCol(col("text")).as("st"))
      .select(
        (col("doc_id") +:
          Langs.map(l => col("st").getField(s"hits_$l").cast("int").as(s"hits_$l")) :+
          langPredFromStats(col("st")).as("lang_pred")): _*)
      .orderBy("doc_id")

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

  /** Quality scoring: word count, summed word length, stopword hits,
    * alphabetic-word count, and a composite score in exact micro units.
    */
  def quality(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), statsCol(col("text")).as("st"))
      .select(col("doc_id"),
        col("st").getField("n_words").as("n_words"),
        col("st").getField("sum_wlen").as("sum_wlen"),
        col("st").getField("hits_en").as("stop_hits"),
        col("st").getField("alpha_words").as("alpha_words"),
        qualityScoreMicroFromStats(col("st")).as("score_micro"))
      .orderBy("doc_id")

  /** The quality micro-score as a DuckDB expression over a relation that
    * carries (n_words, stop_hits, alpha_words) — ONE definition shared by
    * [[qualitySql]] and [[Dedup.bestCanonicalSql]] (the shardsForSql
    * lesson: a hand-inlined copy of a shared rule is where cross-engine
    * bugs breed).
    */
  private[ops] def sqlScoreMicroExpr: String =
    "CASE WHEN n_words > 0 THEN " + sqlMicro(
      "0.4 * (CAST(stop_hits AS DOUBLE) / CAST(n_words AS DOUBLE)) " +
        "+ 0.3 * (CAST(alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE)) " +
        "+ 0.3 * least(1.0, CAST(n_words AS DOUBLE) / 200.0)") + " ELSE 0 END"

  /** The per-doc stats relation `(doc_id, n_words, sum_wlen, stop_hits,
    * alpha_words)` over `table` — the DuckDB mirror of [[statsCol]]'s
    * head-profile fields; shared with [[Dedup.bestCanonicalSql]].
    */
  private[ops] def sqlStatsRel(table: String): String = {
    val w = sqlWords("text")
    val stop = StopwordProfiles.head._2.map(s => s"'$s'").mkString("[", ",", "]")
    s"""(SELECT doc_id,
       |  CAST(len($w) AS BIGINT) AS n_words,
       |  CAST(list_reduce(list_prepend(0, list_transform($w, x -> length(x))), (a,x) -> a+x) AS BIGINT) AS sum_wlen,
       |  CAST(len(list_filter($w, x -> list_contains($stop, x))) AS BIGINT) AS stop_hits,
       |  CAST(len(list_filter($w, x -> regexp_matches(x, '^[a-z]+$$'))) AS BIGINT) AS alpha_words
       |  FROM $table)""".stripMargin
  }

  def qualitySql(table: String): String =
    s"""SELECT doc_id, n_words, sum_wlen, stop_hits, alpha_words,
       |  $sqlScoreMicroExpr AS score_micro
       |FROM ${sqlStatsRel(table)}
       |ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs | digit runs | single other non-space char).
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        statsCol(col("text")).getField("n_words").cast("int").as("n_ws"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("n_bpe"),
        length(col("text")).cast("long").as("n_chars_t"))
      .orderBy("doc_id")

  def tokenCountsSql(table: String): String =
    s"""SELECT doc_id, CAST(len(${sqlWords("text")}) AS INT) AS n_ws,
       |  CAST(len(regexp_extract_all(text, '$BpePattern')) AS INT) AS n_bpe,
       |  CAST(length(text) AS BIGINT) AS n_chars_t
       |FROM $table ORDER BY doc_id""".stripMargin

  /** Corpus vocabulary: top-k tokens by frequency (count desc, token asc —
    * fully deterministic). The shape a vocab/stopword build needs at 100 TB:
    * explode + hash aggregate (map-side partial combine collapses each
    * partition to its distinct tokens before the shuffle), then a global
    * top-k that Spark plans as TakeOrderedAndProject — only k rows ever
    * reach the driver-side collect of a consumer.
    */
  def vocabTopK(docs: DataFrame, k: Int = 100): DataFrame =
    docs
      .select(explode(split(col("text"), " ", -1)).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  def vocabTopKSql(table: String, k: Int = 100): String =
    s"""SELECT token, CAST(count(*) AS BIGINT) AS n
       |FROM (SELECT unnest(${sqlWords("text")}) AS token FROM $table)
       |GROUP BY token ORDER BY n DESC, token ASC LIMIT $k""".stripMargin

  /** Repetition-based quality stats — the standard web-corpus repetition
    * rules (Gopher §A1.1 / RefinedWeb-style filters), per document:
    * most-frequent-word fraction, duplicate-word fraction
    * (1 - distinct/total), and most-frequent-bigram fraction. One typed map
    * kernel pass with two small per-doc count maps — narrow and
    * shuffle-free, so it composes with the lang/quality gates at 100 TB
    * without a per-word explode+groupBy (the corpus-wide explode shape is
    * only right when aggregating ACROSS docs, as in [[vocabTopK]]).
    */
  final case class RepStats(doc_id: Long, n_words: Long, top_word_micro: Long,
      dup_word_micro: Long, top_bigram_micro: Long)

  def repetitionStats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val ws = t.split(' ').filter(_.nonEmpty)
        val n = ws.length
        if (n == 0) RepStats(id, 0L, 0L, 0L, 0L)
        else {
          @inline def toMicro(x: Double): Long = math.floor(x * 1000000.0).toLong
          val wc = new java.util.HashMap[String, Integer]()
          var maxW = 0
          var i = 0
          while (i < n) {
            val c = wc.getOrDefault(ws(i), 0) + 1
            wc.put(ws(i), c)
            if (c > maxW) maxW = c
            i += 1
          }
          var maxB = 0
          if (n >= 2) {
            val bc = new java.util.HashMap[String, Integer]()
            i = 0
            while (i < n - 1) {
              val b = ws(i) + " " + ws(i + 1)
              val c = bc.getOrDefault(b, 0) + 1
              bc.put(b, c)
              if (c > maxB) maxB = c
              i += 1
            }
          }
          RepStats(id, n.toLong,
            toMicro(maxW.toDouble / n),
            toMicro(1.0 - wc.size.toDouble / n),
            if (n >= 2) toMicro(maxB.toDouble / (n - 1)) else 0L)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  def repetitionStatsSql(table: String): String =
    s"""WITH d AS (SELECT doc_id, ${sqlWords("text")} AS ws FROM $table),
       |wc AS (SELECT doc_id, word, count(*) AS c
       |  FROM (SELECT doc_id, unnest(ws) AS word FROM d) GROUP BY 1, 2),
       |wa AS (SELECT doc_id, max(c) AS maxw, sum(c) AS nw, count(*) AS dw
       |  FROM wc GROUP BY 1),
       |bc AS (SELECT doc_id, bigram, count(*) AS c
       |  FROM (SELECT doc_id, unnest(${sqlShingles("ws", 2)}) AS bigram FROM d)
       |  GROUP BY 1, 2),
       |ba AS (SELECT doc_id, max(c) AS maxb, sum(c) AS nb FROM bc GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(wa.nw, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(floor(CAST(wa.maxw AS DOUBLE) / wa.nw * 1000000.0), 0) AS BIGINT) AS top_word_micro,
       |  CAST(coalesce(floor((1.0 - CAST(wa.dw AS DOUBLE) / wa.nw) * 1000000.0), 0) AS BIGINT) AS dup_word_micro,
       |  CAST(coalesce(floor(CAST(ba.maxb AS DOUBLE) / ba.nb * 1000000.0), 0) AS BIGINT) AS top_bigram_micro
       |FROM d LEFT JOIN wa USING (doc_id) LEFT JOIN ba USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** PII redaction: scrub email addresses and long digit runs (phone/ID-like)
    * from a text column — the standard pre-release scrubbing pass of a
    * training-data pipeline. Pure codegen projection (regexp_replace), no
    * shuffle. Patterns deliberately stay in the regex subset Java and RE2
    * (DuckDB) interpret identically: character classes, +, bounded
    * repetition — no backreferences, no lookaround.
    */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
  val LongDigitPattern = "[0-9]{6,}"

  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          LongDigitPattern, "<NUM>").as("redacted"))
      .orderBy("doc_id")

  def redactPiiSql(table: String, textExpr: String = "text"): String =
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace($textExpr, '$EmailPattern', '<EMAIL>', 'g'),
       |    '$LongDigitPattern', '<NUM>', 'g') AS redacted
       |FROM $table ORDER BY doc_id""".stripMargin

  /** Default thresholds of the composed [[qualityGate]] — public so tests
    * and pipelines can reason about the gate without re-deriving them.
    * Chosen so every branch of the gate is exercised (and therefore
    * oracle-checked) on the synthetic corpus; a production pipeline passes
    * its own.
    */
  val GateMinWords: Long = 16L
  val GateMaxWords: Long = 90L
  val GateMinScoreMicro: Long = 360000L
  val GatePiiPerKword: Long = 50L

  /** Composed keep/drop gate — the C4/Gopher-style document filter a
    * training pipeline actually runs, as ONE operator: language-ID,
    * quality score, length bounds, and PII density decided in a single
    * pass with a named first-failing rule per doc.
    *
    * Everything is a narrow codegen projection over ONE scan: the stats
    * struct is computed once (aliased, then field-projected — CollapseProject
    * keeps one kernel eval per row), the PII counts are `regexp_count` over
    * the same row, and no shuffle exists anywhere but the presentation sort.
    * At 100 TB this runs map-only at input parallelism, which is the point
    * of composing the gate instead of joining four per-op outputs — the
    * JOIN of t1/t2/t7 outputs would shuffle the corpus three times for a
    * row-local decision.
    *
    * Rule order is the documented funnel priority: too_short, too_long,
    * no_lang, low_quality, pii_heavy; `drop_reason` is NULL for kept docs
    * and `keep` mirrors it as 1/0.
    */
  def qualityGate(docs: DataFrame,
                  minWords: Long = GateMinWords,
                  maxWords: Long = GateMaxWords,
                  minScoreMicro: Long = GateMinScoreMicro,
                  piiPerKword: Long = GatePiiPerKword): DataFrame = {
    val scored = docs
      .select(col("doc_id"), col("text"), statsCol(col("text")).as("st"))
      .select(
        col("doc_id"),
        col("st").getField("n_words").as("n_words"),
        langPredFromStats(col("st")).as("lang_pred"),
        qualityScoreMicroFromStats(col("st")).as("score_micro"),
        regexp_count(col("text"), lit(EmailPattern)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(LongDigitPattern)).cast("long").as("n_digit_runs"))
    scored
      .withColumn("drop_reason",
        when(col("n_words").isNull || col("n_words") < minWords, lit("too_short"))
          .when(col("n_words") > maxWords, lit("too_long"))
          .when(col("lang_pred") === "und", lit("no_lang"))
          .when(col("score_micro") < minScoreMicro, lit("low_quality"))
          .when((col("n_emails") + col("n_digit_runs")) * lit(1000L) >
            col("n_words") * lit(piiPerKword), lit("pii_heavy"))
          .otherwise(lit(null).cast("string")))
      .withColumn("keep", when(col("drop_reason").isNull, lit(1)).otherwise(lit(0)))
      .orderBy("doc_id")
  }

  def qualityGateSql(table: String,
                     minWords: Long = GateMinWords,
                     maxWords: Long = GateMaxWords,
                     minScoreMicro: Long = GateMinScoreMicro,
                     piiPerKword: Long = GatePiiPerKword): String = {
    val w = sqlWords("text")
    val hitExpr = StopwordProfiles.map { case (l, sw) =>
      val lst = sw.map(s => s"'$s'").mkString("[", ",", "]")
      l -> s"CAST(len(list_filter($w, x -> list_contains($lst, x))) AS BIGINT) AS hits_$l"
    }
    val langs = hitExpr.map(_._1)
    val langCases = langs.zipWithIndex.map { case (l, i) =>
      val conds = (s"hits_$l > 0" +: langs.drop(i + 1).map(l2 => s"hits_$l >= hits_$l2"))
        .mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    val score = sqlMicro(
      "0.4 * (CAST(hits_en AS DOUBLE) / CAST(n_words AS DOUBLE)) " +
        "+ 0.3 * (CAST(alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE)) " +
        "+ 0.3 * least(1.0, CAST(n_words AS DOUBLE) / 200.0)")
    s"""WITH base AS (SELECT doc_id,
       |  CAST(len($w) AS BIGINT) AS n_words,
       |  ${hitExpr.map(_._2).mkString(",\n  ")},
       |  CAST(len(list_filter($w, x -> regexp_matches(x, '^[a-z]+$$'))) AS BIGINT) AS alpha_words,
       |  CAST(len(regexp_extract_all(text, '$EmailPattern')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$LongDigitPattern')) AS BIGINT) AS n_digit_runs
       |  FROM $table),
       |scored AS (SELECT doc_id, n_words,
       |  CASE $langCases ELSE 'und' END AS lang_pred,
       |  CASE WHEN n_words > 0 THEN $score ELSE 0 END AS score_micro,
       |  n_emails, n_digit_runs FROM base),
       |gated AS (SELECT *,
       |  CASE WHEN n_words IS NULL OR n_words < $minWords THEN 'too_short'
       |       WHEN n_words > $maxWords THEN 'too_long'
       |       WHEN lang_pred = 'und' THEN 'no_lang'
       |       WHEN score_micro < $minScoreMicro THEN 'low_quality'
       |       WHEN (n_emails + n_digit_runs) * 1000 > n_words * $piiPerKword
       |         THEN 'pii_heavy'
       |       ELSE NULL END AS drop_reason
       |  FROM scored)
       |SELECT doc_id, n_words, lang_pred, score_micro, n_emails, n_digit_runs,
       |  drop_reason, CAST(drop_reason IS NULL AS INT) AS keep
       |FROM gated ORDER BY doc_id""".stripMargin
  }

  /** Dynamic per-language quality floor: keep a doc iff its quality score
    * reaches the language's p-th percentile — the data-driven variant of
    * [[qualityGate]]'s fixed threshold (a fixed cut tuned on English drops
    * half of another language; a per-lang percentile self-calibrates).
    *
    * Shape at 100 TB: the threshold table is ONE ROW PER LANGUAGE, so it
    * comes from a regular partial-agg shuffle and BROADCASTS back — never a
    * `Window.partitionBy(lang)` over the corpus, which would sort each
    * language's 10^11 rows in its own task. The percentile is EXACT yet
    * scale-safe: `percentile_disc` aggregates a count-map keyed by the
    * VALUE, and score_micro is quantized to <= 1e6 distinct values, so the
    * aggregation state is O(distinct scores) = O(1e6) per language, not
    * O(docs). (Spark's DOUBLE return is cast back to BIGINT — discrete
    * percentiles return an actual member value, so the cast is exact.)
    * The join-back is null-safe (`<=>`) per the r4 null-key lesson.
    */
  def qualityThreshold(docs: DataFrame, p: Double = 0.10): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val scored = docs
      .select(col("doc_id"), col("lang"), statsCol(col("text")).as("st"))
      .select(col("doc_id"), col("lang"),
        qualityScoreMicroFromStats(col("st")).as("score_micro"))
    val th = scored.groupBy(col("lang"))
      .agg(expr(s"CAST(percentile_disc($p) WITHIN GROUP (ORDER BY score_micro) AS BIGINT)")
        .as("thresh_micro"))
      .withColumnRenamed("lang", "lang_t")
    scored.join(broadcast(th), col("lang") <=> col("lang_t"))
      .select(col("doc_id"), col("lang"), col("score_micro"), col("thresh_micro"),
        when(col("score_micro") >= col("thresh_micro"), lit(1)).otherwise(lit(0))
          .as("kept"))
      .orderBy("doc_id")
  }

  def qualityThresholdSql(table: String, p: Double = 0.10): String = {
    val w = sqlWords("text")
    val stop = StopwordProfiles.head._2.map(s => s"'$s'").mkString("[", ",", "]")
    val score = sqlMicro(
      "0.4 * (CAST(stop_hits AS DOUBLE) / CAST(n_words AS DOUBLE)) " +
        "+ 0.3 * (CAST(alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE)) " +
        "+ 0.3 * least(1.0, CAST(n_words AS DOUBLE) / 200.0)")
    s"""WITH base AS (SELECT doc_id, lang,
       |  CAST(len($w) AS BIGINT) AS n_words,
       |  CAST(len(list_filter($w, x -> list_contains($stop, x))) AS BIGINT) AS stop_hits,
       |  CAST(len(list_filter($w, x -> regexp_matches(x, '^[a-z]+$$'))) AS BIGINT) AS alpha_words
       |  FROM $table),
       |scored AS (SELECT doc_id, lang,
       |  CASE WHEN n_words > 0 THEN $score ELSE 0 END AS score_micro FROM base),
       |th AS (SELECT lang, CAST(percentile_disc($p) WITHIN GROUP (ORDER BY score_micro) AS BIGINT) AS thresh_micro
       |  FROM scored GROUP BY lang)
       |SELECT doc_id, scored.lang AS lang, score_micro, thresh_micro,
       |  CAST(score_micro >= thresh_micro AS INT) AS kept
       |FROM scored JOIN th ON scored.lang IS NOT DISTINCT FROM th.lang
       |ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: a rolling polynomial hash over word hashes
    * (mod 1e9+7 — keeps every intermediate < 2^35, ANSI-overflow-safe), plus
    * a winnowing-style min-hash over 4-gram window hashes.
    */
  val FpMod: Long = graft.functions.FingerprintExpression.FpMod

  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), call_function("graft_fingerprint", col("text")).as("f"))
      .select(col("doc_id"),
        col("f").getField("fp").as("fp"),
        col("f").getField("winnow_fp").as("winnow_fp"))
      .orderBy("doc_id")

  def fingerprintSql(table: String): String = {
    val w = sqlWords("text")
    val wh = s"list_transform($w, x -> ${sqlH32("x")} % $FpMod)"
    val sh = sqlShingles(w, 4)
    s"""SELECT doc_id,
       |  list_reduce(list_prepend(0, $wh), (acc,h) -> (acc*31 + h) % $FpMod) AS fp,
       |  CASE WHEN len($sh) > 0 THEN list_min(list_transform($sh, s -> ${sqlH32("s")})) ELSE NULL END AS winnow_fp
       |FROM $table ORDER BY doc_id""".stripMargin
  }

  /** OOV sentinel for [[lmScore]]'s capped vocabulary. Tokens come from a
    * space-split so no real token can contain a space, but a literal
    * "<unk>" token in the corpus would simply merge with the OOV mass —
    * identically in both engines, so the oracle stays exact.
    */
  val UnkToken: String = "<unk>"

  /** CCNet-style n-gram language-model quality scoring (Wenzek et al. 2020
    * §4.3, the Wikipedia-LM perplexity filter, rebuilt without KenLM): train
    * an add-one-smoothed bigram LM on a deterministic reference slice of
    * the corpus (`doc_id % trainMod == 0` stands in for the curated
    * reference corpus), then score EVERY document by its mean per-bigram
    * probability `P(w_i | w_{i-1}) = (c_bigram + 1) / (c_unigram + V + 1)`.
    * Low scores flag out-of-domain / gibberish text exactly as high
    * perplexity does (the score is a monotone proxy chosen to keep the
    * arithmetic rational: log/exp differ in the last ulp across engines,
    * while IEEE +,*,/ are exact-rounded and identical everywhere).
    *
    * Hash-exactness: each per-bigram probability becomes an integer micro
    * value ([[ColFns.micro]] — floor is safe, round is not) and per-doc
    * totals are LONG sums, so the oracle compare never depends on float
    * summation order.
    *
    * Scale shape: the vocabulary cap bounds the model BY CONSTRUCTION —
    * OOV maps to [[UnkToken]], so the unigram table is <= v+1 rows and the
    * bigram table <= (v+1)^2, and both broadcast to the scorers (never a
    * corpus-wide shuffle join). Bigrams are built INSIDE the token array
    * (zip_with of the mapped array against its own tail — two lambda
    * projections per doc, the documented trade against the alternative
    * posexplode + lag window, which would shuffle every TOKEN in the
    * corpus). The only corpus-scale shuffle is the per-doc score sum, and
    * its map-side partial phase collapses each doc to one row per
    * partition before the wire.
    */
  def lmScore(docs: DataFrame, v: Int = 64, trainMod: Int = 5): DataFrame = {
    val trainPred = col("doc_id") % trainMod === 0
    val words = docs.select(col("doc_id"),
      filter(split(col("text"), " ", -1), w => w =!= "").as("ws"))
    // reference vocabulary: top-v tokens of the training slice, fully
    // deterministic tie-break (count desc, token asc), carried as ONE
    // sorted-array row that broadcasts under every scorer
    val vocabArr = words.filter(trainPred)
      .select(explode(col("ws")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(v)
      .agg(sort_array(collect_list(col("tok"))).as("vocab"))
    val mapped = words.crossJoin(broadcast(vocabArr))
      .select(col("doc_id"),
        transform(col("ws"),
          w => when(array_contains(col("vocab"), w), w)
            .otherwise(lit(UnkToken))).as("ms"))
    val bigrams = mapped.select(col("doc_id"),
      when(size(col("ms")) >= 2,
        zip_with(
          slice(col("ms"), lit(1), size(col("ms")) - 1),
          slice(col("ms"), lit(2), size(col("ms")) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>")).as("bs"))
    val uni = mapped.filter(trainPred)
      .select(explode(col("ms")).as("u_tok"))
      .groupBy(col("u_tok")).agg(count(lit(1)).as("c_u"))
    val big = bigrams.filter(trainPred)
      .select(explode(col("bs")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c_b"))
    val probs = bigrams.select(col("doc_id"), explode(col("bs")).as("b"))
      .join(broadcast(big), Seq("b"), "left")
      .join(broadcast(uni), substring_index(col("b"), " ", 1) === col("u_tok"), "left")
      .select(col("doc_id"),
        micro((coalesce(col("c_b"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c_u"), lit(0L)) + lit((v + 1).toDouble))).as("p_micro"))
    val perDoc = probs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_micro")).as("sum_p_micro"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_p_micro"), lit(0L)).as("sum_p_micro"),
        // integer division of two positive longs — exact in both engines;
        // NULL (not 0) for docs too short to have a bigram
        expr("sum_p_micro div n_bigrams").as("score_micro"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[lmScore]] — same slice, same capped-vocab mapping,
    * same add-one arithmetic with the multiply-after-divide order, same
    * integer-micro summation.
    */
  def lmScoreSql(table: String, v: Int = 64, trainMod: Int = 5): String = {
    val w = sqlWords("text")
    s"""WITH w AS (SELECT doc_id, $w AS ws FROM $table),
       |vt AS (SELECT tok FROM (SELECT unnest(ws) AS tok FROM w WHERE doc_id % $trainMod = 0)
       |  GROUP BY tok ORDER BY count(*) DESC, tok ASC LIMIT $v),
       |voc AS (SELECT list_sort(list(tok)) AS vocab FROM vt),
       |m AS (SELECT doc_id, list_transform(ws, x ->
       |    CASE WHEN list_contains(vocab, x) THEN x ELSE '$UnkToken' END) AS ms
       |  FROM w CROSS JOIN voc),
       |bg AS (SELECT doc_id, CASE WHEN len(ms) >= 2
       |    THEN list_transform(generate_series(1, len(ms)-1), i -> ms[i] || ' ' || ms[i+1])
       |    ELSE [] END AS bs FROM m),
       |uni AS (SELECT u_tok, CAST(count(*) AS BIGINT) AS c_u
       |  FROM (SELECT unnest(ms) AS u_tok FROM m WHERE doc_id % $trainMod = 0) GROUP BY u_tok),
       |big AS (SELECT b, CAST(count(*) AS BIGINT) AS c_b
       |  FROM (SELECT unnest(bs) AS b FROM bg WHERE doc_id % $trainMod = 0) GROUP BY b),
       |pr AS (SELECT e.doc_id,
       |    CAST(floor((COALESCE(bi.c_b, 0) + 1.0) / (COALESCE(u.c_u, 0) + ${v + 1}.0) * 1000000.0) AS BIGINT) AS p_micro
       |  FROM (SELECT doc_id, unnest(bs) AS b FROM bg) e
       |  LEFT JOIN big bi USING (b)
       |  LEFT JOIN uni u ON u.u_tok = string_split(e.b, ' ')[1]),
       |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(p_micro) AS BIGINT) AS sum_p_micro FROM pr GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
       |  COALESCE(a.sum_p_micro, 0) AS sum_p_micro,
       |  a.sum_p_micro // a.n_bigrams AS score_micro
       |FROM (SELECT doc_id FROM $table) d LEFT JOIN ag a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Phrase-merge induction — BPE-style merge learning lifted to the word
    * level (Sennrich et al. 2016 / word2vec phrase detection): for each of
    * `rounds` rounds, count every adjacent word pair corpus-wide, pick THE
    * most frequent pair (count desc, pair asc — fully deterministic; pairs
    * below `minCount` never merge), and rewrite every document with the
    * winning pair fused into one `w1_w2` token. Returns each doc's merged
    * text plus how many merges landed in it.
    *
    * Merge application is a non-overlapping left-to-right literal string
    * replace on the space-delimited form (` w1 w2 ` -> ` w1_w2 ` inside a
    * padded copy): back-to-back occurrences share their delimiter space, so
    * the second of two ADJACENT phrase occurrences survives unmerged until
    * a later round — the documented trade that makes each rewrite ONE
    * codegen string pass with bit-identical semantics in both engines
    * (classic BPE resolves the run in one pass; this converges to the same
    * fixpoint over rounds).
    *
    * Scale shape: the whole k-round loop is ONE declarative plan with NO
    * driver-side collect — each round is a corpus bigram count (map-side
    * partial agg over bounded pair keys), a 1-row TakeOrdered winner
    * broadcast under every rewriter (left join on TRUE, so a round with no
    * qualifying pair is an identity rewrite, never a row loss), and a
    * map-only string rewrite. The original word count rides along as a
    * column, so the final merge accounting needs no join back.
    */
  def phraseMerge(docs: DataFrame, rounds: Int = 3,
                  minCount: Long = 2L): DataFrame = {
    def wordsOf(t: Column): Column = filter(split(t, " ", -1), w => w =!= "")
    def bigramsOf(t: Column): Column = {
      val ws = wordsOf(t)
      when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>"))
    }
    // r6: each round's rewrite is materialized (localCheckpoint) before
    // the next round's bigram count reads it. The former fully-lazy chain
    // re-executed round r-1's rewrite once for round r's count and again
    // for round r's rewrite — O(rounds²) corpus passes through the
    // interpreted zip_with bigram lambda; now each round is exactly one
    // count pass + one rewrite pass. No driver collect anywhere: the
    // 1-row winner still rides as a broadcast join.
    var cur = docs.select(col("doc_id"), col("text").as("t"),
      size(wordsOf(col("text"))).cast("long").as("n0"))
      .localCheckpoint()
    for (r <- 1 to rounds) {
      val best = cur.select(explode(bigramsOf(col("t"))).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= minCount)
        .orderBy(col("n").desc, col("b").asc).limit(1)
        .select(col("b"), regexp_replace(col("b"), " ", "_").as("m"))
      val padded = concat(lit(" "), col("t"), lit(" "))
      cur = cur.join(broadcast(best), lit(true), "left")
        .select(col("doc_id"), col("n0"),
          when(col("b").isNull, padded)
            .otherwise(call_function("replace", padded,
              concat(lit(" "), col("b"), lit(" ")),
              concat(lit(" "), col("m"), lit(" ")))).as("pt"))
        .select(col("doc_id"), col("n0"),
          expr("substring(pt, 2, length(pt)-2)").as("t"))
      // the LAST round stays lazy: it has a single consumer (the final
      // projection), and keeping it in the plan preserves the
      // winner-broadcast/TakeOrdered shape the plan gate asserts
      if (r < rounds) cur = cur.localCheckpoint()
    }
    cur.select(col("doc_id"), col("t").as("text"),
      (col("n0") - size(wordsOf(col("t"))).cast("long")).as("n_merged"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[phraseMerge]] — the k rounds unrolled as a CTE
    * chain (count -> 1-row winner -> padded replace -> strip), generated by
    * the same loop so the two dialects cannot drift.
    */
  def phraseMergeSql(table: String, rounds: Int = 3,
                     minCount: Long = 2L): String = {
    def w(t: String) = sqlWords(t)
    def bigrams(t: String): String = {
      val ws = w(t)
      s"""CASE WHEN len($ws) >= 2 THEN list_transform(generate_series(1, len($ws)-1),
         |    i -> $ws[i] || ' ' || $ws[i+1]) ELSE [] END""".stripMargin
    }
    val ctes = new scala.collection.mutable.ArrayBuffer[String]
    ctes += s"t0 AS (SELECT doc_id, text AS t, CAST(len(${w("text")}) AS BIGINT) AS n0 FROM $table)"
    for (r <- 1 to rounds) {
      val p = r - 1
      ctes += s"""c$r AS (SELECT b, CAST(count(*) AS BIGINT) AS n
                 |  FROM (SELECT unnest(${bigrams("t")}) AS b FROM t$p) GROUP BY b)""".stripMargin
      ctes += s"""b$r AS (SELECT b, replace(b, ' ', '_') AS m FROM c$r
                 |  WHERE n >= $minCount ORDER BY n DESC, b ASC LIMIT 1)""".stripMargin
      ctes += s"""p$r AS (SELECT doc_id, n0, CASE WHEN b IS NULL THEN ' ' || t || ' '
                 |  ELSE replace(' ' || t || ' ', ' ' || b || ' ', ' ' || m || ' ') END AS pt
                 |  FROM t$p LEFT JOIN b$r ON TRUE)""".stripMargin
      ctes += s"t$r AS (SELECT doc_id, n0, substring(pt, 2, length(pt)-2) AS t FROM p$r)"
    }
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT doc_id, t AS text,
       |  CAST(n0 - len(${w("t")}) AS BIGINT) AS n_merged
       |FROM t$rounds ORDER BY doc_id""".stripMargin
  }

  /** C4-style LINE-level cleaning (Raffel et al., the famous pass that made
    * C4 out of Common Crawl) over extracted pages — the granularity the
    * doc-level [[qualityGate]] cannot reach: a page whose body is fine but
    * whose nav/footer boilerplate is noise should lose the LINES, not the
    * document. Per line (after stripping only ' ' padding, both engines'
    * trim(x, ' ')): keep iff it has >= `minWords` words, ends in a terminal
    * mark ('.', '!', '?', '"') when `requirePunct`, and contains no
    * `blocklist` needle; whole docs containing a `docDropMarkers` needle
    * ("lorem ipsum", '{' — C4's policy-page and code tells) drop outright,
    * as do docs with fewer than `minKeptLines` survivors. Needle matching
    * is CASE-SENSITIVE by contract: the corpus is multilingual and Java
    * `toLowerCase` vs SQL `lower()` disagree outside ASCII (the Turkish-I
    * class of divergence), so callers pass the case variants they mean.
    * Terminal-mark tests use endsWith — code-point-representation-proof in
    * both engines, unlike last-char indexing (UTF-16 units vs code points).
    *
    * Scale shape: purely row-local — ONE typed map pass, zero shuffles
    * (the final orderBy is oracle determinism only); at 100 TB it runs
    * map-only at input parallelism, upstream of [[Dedup.lineDedup]] (clean
    * first, then dedup survivors — C4's own order). Output keeps the
    * audit trail: (url, cleaned text, n_lines in, n_kept).
    */
  def cleanLines(pages: DataFrame, minWords: Int = 3,
                 requirePunct: Boolean = true,
                 blocklist: Seq[String] = Seq("javascript", "cookie"),
                 docDropMarkers: Seq[String] = Seq("lorem ipsum", "{"),
                 minKeptLines: Int = 3): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val terminal = Seq(".", "!", "?", "\"")
    pages.select(col("url"), col("text")).as[(String, String)]
      .flatMap { case (url, text) =>
        if (text == null || docDropMarkers.exists(text.contains(_)))
          Iterator.empty
        else {
          val ls = text.split("\n", -1)
          val kept = ls.filter { raw =>
            var a = 0
            var b = raw.length
            while (a < b && raw.charAt(a) == ' ') a += 1
            while (b > a && raw.charAt(b - 1) == ' ') b -= 1
            val t = raw.substring(a, b)
            var words = 0
            var i = 0
            while (i < t.length) { // count ' '-separated non-empty runs
              if (t.charAt(i) != ' ' && (i == 0 || t.charAt(i - 1) == ' '))
                words += 1
              i += 1
            }
            t.nonEmpty && words >= minWords &&
              (!requirePunct || terminal.exists(t.endsWith(_))) &&
              !blocklist.exists(t.contains(_))
          }
          if (kept.length < minKeptLines) Iterator.empty
          else Iterator((url, kept.mkString("\n"), ls.length.toLong,
            kept.length.toLong))
        }
      }
      .toDF("url", "text", "n_lines", "n_kept")
      .orderBy("url")
  }

  /** DuckDB mirror of [[cleanLines]] over the hive-partitioned pages glob.
    * The strip-then-test is inlined per predicate (SQL lambdas have no
    * `let`); string needles are escaped with doubled quotes.
    */
  def cleanLinesSql(pagesGlob: String, minWords: Int = 3,
                    requirePunct: Boolean = true,
                    blocklist: Seq[String] = Seq("javascript", "cookie"),
                    docDropMarkers: Seq[String] = Seq("lorem ipsum", "{"),
                    minKeptLines: Int = 3): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val t = "trim(x, ' ')"
    val punct = if (!requirePunct) ""
      else Seq(".", "!", "?", "\"").map(m => s"ends_with($t, ${q(m)})")
        .mkString(" AND (", " OR ", ")")
    val blocked = blocklist.map(n => s" AND NOT contains($t, ${q(n)})").mkString
    val docGate = docDropMarkers.map(n => s" AND NOT contains(text, ${q(n)})").mkString
    s"""WITH e AS (SELECT url, string_split(text, chr(10)) AS ls
       |    FROM read_parquet('$pagesGlob', hive_partitioning=1)
       |    WHERE text IS NOT NULL$docGate),
       |f AS (SELECT url, len(ls) AS n_lines,
       |    list_filter(ls, x -> $t <> ''
       |      AND len(list_filter(string_split($t, ' '), w -> w <> '')) >= $minWords$punct$blocked) AS ks
       |  FROM e)
       |SELECT url, array_to_string(ks, chr(10)) AS text,
       |  CAST(n_lines AS BIGINT) AS n_lines, CAST(len(ks) AS BIGINT) AS n_kept
       |FROM f WHERE len(ks) >= $minKeptLines ORDER BY url""".stripMargin
  }

  /** Linear quality-classifier inference (the fastText/DCLM-style filter a
    * web-corpus curation run applies after the rule-based gates): each
    * document scores as the sum of its words' signed weights and keeps if
    * the margin clears a per-word threshold — decided in EXACT integer
    * arithmetic (`total_w > n_words * threshold`, never a division). The
    * "trained model" is a (term, weight) TABLE — here derived
    * deterministically (in-vocab gate h32(term:v)%4<>0, weight
    * h32(term:w)%2001-1000 micro-units, identically in both engines, the
    * p6/t7 constructed-input pattern) — exercising the real deployment
    * shape: a model artifact BROADCAST to every scorer, OOV terms at
    * weight 0 via the left join.
    *
    * Scale shape: the vocabulary is CAPPED to the top-`vocabCap` terms by
    * corpus frequency (count desc, term asc — a TakeOrdered, not a global
    * sort), exactly like a real fastText/DCLM model caps its feature
    * space — so the broadcast is bounded BY CONSTRUCTION, not by hoping
    * the corpus vocabulary stays small (an uncapped distinct-terms
    * "model" would be unbroadcastable at 10^12 docs). The only
    * corpus-wide shuffles are the tf count feeding the cap and the
    * per-doc score sum (both map-side partial); the scorer join is
    * broadcast, never a corpus shuffle join (the t11 discipline,
    * gate-pinned).
    */
  def classifierFilter(docs: DataFrame, thresholdMicro: Long = 5L,
                       vocabCap: Int = 4096): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(filter(split(col("text"), " ", -1), w => w =!= "")).as("w"))
    val vocab = words.groupBy(col("w").as("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(vocabCap)
      .filter(h32(concat(col("term"), lit(":v"))) % 4 =!= 0)
      .select(col("term"),
        (h32(concat(col("term"), lit(":w"))) % 2001 - 1000).as("wt"))
    val scored = words
      .join(broadcast(vocab), words("w") === vocab("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("wt"), lit(0L))).as("total_w"),
        sum(when(col("term").isNull, 0L).otherwise(1L)).as("n_invocab"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("total_w"), lit(0L)).as("total_w"),
        coalesce(col("n_invocab"), lit(0L)).as("n_invocab"),
        (coalesce(col("total_w"), lit(0L)) >
          coalesce(col("n_words"), lit(0L)) * thresholdMicro)
          .cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[classifierFilter]] — same capped constructed
    * model, same integer margin rule.
    */
  def classifierFilterSql(table: String, thresholdMicro: Long = 5L,
                          vocabCap: Int = 4096): String =
    s"""WITH w AS (SELECT doc_id, unnest(${sqlWords("text")}) AS w FROM $table),
       |cap AS (SELECT w AS term FROM w GROUP BY w
       |  ORDER BY count(*) DESC, w LIMIT $vocabCap),
       |vocab AS (SELECT term, ${sqlH32("term || ':w'")} % 2001 - 1000 AS wt
       |  FROM cap
       |  WHERE ${sqlH32("term || ':v'")} % 4 <> 0),
       |sc AS (SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(COALESCE(v.wt, 0)) AS BIGINT) AS total_w,
       |    CAST(sum(CASE WHEN v.term IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_invocab
       |  FROM w LEFT JOIN vocab v ON v.term = w.w GROUP BY w.doc_id)
       |SELECT d.doc_id, COALESCE(s.n_words, 0) AS n_words,
       |  COALESCE(s.total_w, 0) AS total_w,
       |  COALESCE(s.n_invocab, 0) AS n_invocab,
       |  CAST(CASE WHEN COALESCE(s.total_w, 0) > COALESCE(s.n_words, 0) * $thresholdMicro
       |    THEN 1 ELSE 0 END AS INT) AS keep
       |FROM (SELECT doc_id FROM $table) d LEFT JOIN sc s USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Per-document top-k keywords by tf-idf (linear-idf variant): the
    * document-summarization signal an index/selection pipeline extracts.
    * Scoring is EXACT integer arithmetic by construction — the classic
    * log-idf cannot be oracle-compared (libm log is not bit-portable), so
    * the rule is the linear inverse frequency
    * `score = ((tf * 1e6) div nd) * (N div df)` with the division order
    * fixed and mirrored; ranking semantics (rare-in-corpus,
    * frequent-in-doc first) are preserved, scores are reproducible
    * integers.
    *
    * Scale shape: tf = one (doc_id, term) partial-agg shuffle; doc length
    * and df are second-level aggregates OF the tf frame (never a second
    * corpus scan); N rides as a broadcast one-row frame; the df join
    * shuffles on term with AQE handling stop-word skew; per-doc top-k
    * windows are bounded by document vocabulary (WindowGroupLimit pushes
    * the rank filter map-side).
    */
  def tfidfKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(col("doc_id"),
      explode(filter(split(col("text"), " ", -1), w => w =!= "")).as("term"))
    val tf = words.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val nd = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("nd"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(nd, "doc_id").join(dfT, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (expr("(tf * 1000000L) div nd") * expr("n div df")).as("score_q"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score_q").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("score_q"), col("rn"))
      .orderBy("doc_id", "rn")
  }

  /** DuckDB mirror of [[tfidfKeywords]] — same fixed division order. */
  def tfidfKeywordsSql(table: String, k: Int = 3): String =
    s"""WITH w AS (SELECT doc_id, unnest(${sqlWords("text")}) AS term FROM $table),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY doc_id, term),
       |nd AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS nd FROM tf GROUP BY doc_id),
       |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM $table),
       |s AS (SELECT tf.doc_id, tf.term,
       |    ((tf.tf * 1000000) // nd.nd) * (n.n // dft.df) AS score_q
       |  FROM tf JOIN nd USING (doc_id) JOIN dft USING (term), n),
       |r AS (SELECT doc_id, term, score_q,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_q DESC, term) AS rn
       |  FROM s)
       |SELECT doc_id, term, CAST(score_q AS BIGINT) AS score_q, CAST(rn AS INT) AS rn
       |FROM r WHERE rn <= $k ORDER BY doc_id, rn""".stripMargin

  /** Per-document code-switching audit (the CCNet per-paragraph-langid
    * pattern): every LINE of the extracted text gets its own
    * stopword-argmax language prediction and the document reports how
    * much of it disagrees with the document's language tag — the signal
    * that catches boilerplate in another language, embedded quotes and
    * wrongly-tagged documents before a lang-partitioned corpus is
    * trusted. One explode + the native single-pass stats kernel per line
    * (codegen, no lambdas) + ONE per-url partial-agg fold; off-language
    * fraction is floor-scaled from exact integer counts.
    */
  def codeSwitchAudit(pages: DataFrame): DataFrame = {
    val lines = pages
      .select(col("url"), col("lang"),
        explode(split(col("text"), "\n", -1)).as("line"))
      .filter(length(col("line")) > 0)
      .select(col("url"), col("lang"),
        langPredFromStats(statsCol(col("line"))).as("line_lang"))
    lines
      .groupBy(col("url"), col("lang"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("line_lang") =!= col("lang") &&
          col("line_lang") =!= "und", 1L).otherwise(0L)).as("n_offlang"),
        sum(when(col("line_lang") === "und", 1L).otherwise(0L)).as("n_und"))
      .select(col("url"), col("lang"), col("n_lines"), col("n_offlang"), col("n_und"),
        micro(col("n_offlang").cast("double") / col("n_lines").cast("double"))
          .as("offlang_micro"))
      .orderBy(col("url"))
  }

  /** DuckDB mirror of [[codeSwitchAudit]] — the same per-line hit counts
    * and the same fixed argmax tie priority as [[langIdSql]].
    */
  def codeSwitchAuditSql(pagesGlob: String): String = {
    val w = sqlWords("line")
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
    s"""WITH ln AS (SELECT url, lang, unnest(string_split(text, chr(10))) AS line
       |  FROM read_parquet('$pagesGlob', hive_partitioning=1)),
       |ne AS (SELECT url, lang, line FROM ln WHERE length(line) > 0),
       |h AS (SELECT url, lang, ${hitCols.mkString(", ")} FROM ne),
       |p AS (SELECT url, lang, CASE $cases ELSE 'und' END AS line_lang FROM h),
       |a AS (SELECT url, lang, CAST(count(*) AS BIGINT) AS n_lines,
       |    CAST(sum(CASE WHEN line_lang <> lang AND line_lang <> 'und'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_offlang,
       |    CAST(sum(CASE WHEN line_lang = 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_und
       |  FROM p GROUP BY url, lang)
       |SELECT url, lang, n_lines, n_offlang, n_und,
       |  ${sqlMicro("CAST(n_offlang AS DOUBLE) / CAST(n_lines AS DOUBLE)")} AS offlang_micro
       |FROM a ORDER BY url""".stripMargin
  }
}
