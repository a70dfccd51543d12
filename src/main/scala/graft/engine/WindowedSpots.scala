package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational (windowed) backend for `parse_matrix_spots(top_score_only)` —
  * the documented scale-out fallback for SURVEY.md §2 D3 and the second
  * backend of the kernel-vs-relational parity check (the engine's analogue
  * of the reference's ONNX parity smoke, SURVEY.md §2 F8).
  *
  * The mutual-best assignment (/root/reference/pipeline/decode.py:50-67) is
  * two chained top-1-per-group dedups. Tie semantics replicated exactly:
  *  - per-head pass keeps the first spot (in list order `ord`) whose score
  *    is never strictly exceeded -> `row_number over (head, score desc,
  *    ord asc)`;
  *  - per-tail pass iterates heads in *first-appearance* order (Python dict
  *    insertion), not winner order -> tie key is min(ord) per head, not the
  *    winning spot's ord.
  *
  * Whole-stage-codegen friendly: filters + two window ranks, no UDFs.
  */
object WindowedSpots {

  /** @param spots columns (doc_id, ord, i, j, tag, score)
    * @return (doc_id, head, tail) mutual-best pairs
    */
  def parseTop(spots: DataFrame, triuMode: Boolean, scoreThresh: Double = 0.0): DataFrame = {
    val kept = spots
      .filter(col("tag") =!= 0 && col("score") >= scoreThresh)
      .withColumn("head", if (triuMode) when(col("tag") === 2, col("j")).otherwise(col("i")) else col("i"))
      .withColumn("tail", if (triuMode) when(col("tag") === 2, col("i")).otherwise(col("j")) else col("j"))
    val headFirst = Window.partitionBy(col("doc_id"), col("head"))
    val byHead = Window.partitionBy(col("doc_id"), col("head"))
      .orderBy(col("score").desc, col("ord").asc)
    val perHead = kept
      .withColumn("headFirstOrd", min(col("ord")).over(headFirst))
      .withColumn("rnHead", row_number().over(byHead))
      .filter(col("rnHead") === 1)
    val byTail = Window.partitionBy(col("doc_id"), col("tail"))
      .orderBy(col("score").desc, col("headFirstOrd").asc)
    perHead
      .withColumn("rnTail", row_number().over(byTail))
      .filter(col("rnTail") === 1)
      .select(col("doc_id"), col("head"), col("tail"))
  }

  /** The same operator as ANSI SQL over a Parquet path (DuckDB-runnable). */
  def parseTopSql(spotsParquet: String, triuMode: Boolean, scoreThresh: Double = 0.0): String = {
    val headExpr = if (triuMode) "CASE WHEN tag = 2 THEN j ELSE i END" else "i"
    val tailExpr = if (triuMode) "CASE WHEN tag = 2 THEN i ELSE j END" else "j"
    s"""WITH kept AS (
       |  SELECT doc_id, ord, $headExpr AS head, $tailExpr AS tail, score
       |  FROM read_parquet('$spotsParquet')
       |  WHERE tag <> 0 AND score >= $scoreThresh
       |), per_head AS (
       |  SELECT doc_id, head, tail, score,
       |         MIN(ord) OVER (PARTITION BY doc_id, head) AS head_first_ord,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id, head ORDER BY score DESC, ord ASC) AS rn_head
       |  FROM kept
       |), winners AS (
       |  SELECT doc_id, head, tail, score, head_first_ord FROM per_head WHERE rn_head = 1
       |)
       |SELECT doc_id, head, tail FROM (
       |  SELECT doc_id, head, tail,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id, tail ORDER BY score DESC, head_first_ord ASC) AS rn_tail
       |  FROM winners
       |) WHERE rn_tail = 1
       |ORDER BY doc_id, head, tail""".stripMargin
  }
}
