package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.html.HtmlParser

/** Structured-table extraction from web pages (x8): every `<table>` in a
  * page flattened to (url, table_idx, cell_idx, tag, text) rows via the
  * engine's own DOM parser — the semi-structured-data harvest a web-scale
  * corpus runs alongside main-content extraction (tables carry the
  * key-value and relational payloads the flat text loses). Cell text is
  * the entity-decoded, nested-markup-flattened textContent — one
  * definition with the extraction kernel's view of the page.
  *
  * Scale shape: map-only kernel (parse once, walk tables) at input
  * parallelism straight into the output sort; no shuffle before the
  * presentation orderBy. The oracle re-derives cells independently:
  * non-greedy regex over the decoded html for table blocks, two capture
  * groups (tag, text) zipped by index, the x7 entity replace-chain.
  */
object Tables {

  /** All (table_idx, cell_idx, tag, text) cells in document order. The
    * table index counts `<table>` elements in traversal (= document)
    * order; cells are th/td descendants in order within their table.
    * Nested tables are out of the corpus contract (a nested table's cells
    * would count toward the innermost enclosing table).
    */
  def tableCells(html: String): List[(Int, Int, String, String)] = {
    val out = List.newBuilder[(Int, Int, String, String)]
    var tableIdx = -1
    def walkCells(nd: HtmlParser.Node, cellIdx: Int, ti: Int): Int = nd match {
      case HtmlParser.Text(_) => cellIdx
      case e @ HtmlParser.Elem(tag, _, kids) =>
        if (tag == "th" || tag == "td") {
          out += ((ti, cellIdx, tag, HtmlParser.textContent(e)))
          cellIdx + 1
        } else kids.foldLeft(cellIdx)((ci, k) => walkCells(k, ci, ti))
    }
    def rec(nd: HtmlParser.Node): Unit = nd match {
      case HtmlParser.Text(_) => ()
      case HtmlParser.Elem(tag, _, kids) =>
        if (tag == "table") {
          tableIdx += 1
          kids.foldLeft(0)((ci, k) => walkCells(k, ci, tableIdx))
        } else kids.foreach(rec)
    }
    rec(HtmlParser.parse(html))
    out.result()
  }

  def extractTables(pages: DataFrame): DataFrame = {
    val sess = pages.sparkSession
    import sess.implicits._
    pages
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, html) =>
        val doc = new String(html, java.nio.charset.StandardCharsets.UTF_8)
        tableCells(doc).iterator.map { case (ti, ci, tag, text) =>
          (url, ti, ci, tag, text)
        }
      }
      .toDF("url", "table_idx", "cell_idx", "tag", "text")
      .orderBy(col("url"), col("table_idx"), col("cell_idx"))
  }

  /** DuckDB mirror: independent regex derivation of the same cells. */
  def extractTablesSql(pagesGlob: String): String = {
    val cellPat = "<(t[hd])[^>]*>([^<]*)</t[hd]>"
    val decoded = "replace(replace(replace(replace(replace(raw," +
      "'&lt;','<'),'&gt;','>'),'&quot;','\"'),'&apos;',''''),'&amp;','&')"
    s"""WITH p AS (SELECT url, decode(html) AS h
       |  FROM read_parquet('$pagesGlob', hive_partitioning=1)),
       |tb AS (SELECT url, regexp_extract_all(h, '<table>(.*?)</table>', 1) AS ts FROM p),
       |ti AS (SELECT url, ts, unnest(generate_series(1, len(ts))) AS i FROM tb),
       |cx AS (SELECT url, CAST(i - 1 AS INT) AS table_idx,
       |    regexp_extract_all(ts[i], '$cellPat', 1) AS tags,
       |    regexp_extract_all(ts[i], '$cellPat', 2) AS raws FROM ti),
       |ci AS (SELECT url, table_idx, tags, raws,
       |    unnest(generate_series(1, len(tags))) AS j FROM cx),
       |cell AS (SELECT url, table_idx, CAST(j - 1 AS INT) AS cell_idx,
       |    tags[j] AS tag, raws[j] AS raw FROM ci)
       |SELECT url, table_idx, cell_idx, tag, $decoded AS text
       |FROM cell ORDER BY url, table_idx, cell_idx""".stripMargin
  }
}
