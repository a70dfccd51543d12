package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the host link-graph operators (x6 edges / g1 PageRank /
  * g2 frontier): href resolution contract, parser-level anchor collection,
  * a plain-Scala integer-PageRank cross-check of the distributed loop
  * (the s7 Lloyd idiom — an independent in-memory implementation of the
  * same recurrence must agree bit-for-bit), and frontier schedule
  * politeness invariants.
  */
class LinkGraphSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("linkgraph-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def page(url: String, hrefs: Seq[String]): (String, Array[Byte]) = {
    val body = hrefs.zipWithIndex
      .map { case (h, i) => s"""<a href="$h">link$i</a>""" }
      .mkString("<nav>", "", "</nav>")
    (url, s"<html><body>$body</body></html>".getBytes("UTF-8"))
  }

  private def pagesDf(rows: (String, Array[Byte])*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("url", "html")
  }

  test("resolveHost: absolute / root-relative resolve; everything else drops") {
    assert(LinkGraph.resolveHost("a.example", "https://b.example/x") == "b.example")
    assert(LinkGraph.resolveHost("a.example", "http://b.example:8080/x?q#f") == "b.example")
    assert(LinkGraph.resolveHost("a.example", "/path/only") == "a.example")
    assert(LinkGraph.resolveHost("a.example", "relative/path") == null)
    assert(LinkGraph.resolveHost("a.example", "//proto-rel.example/x") == "proto-rel.example")
    assert(LinkGraph.resolveHost("a.example", "//") == null)
    assert(LinkGraph.resolveHost("a.example", "mailto:x@y.example") == null)
    assert(LinkGraph.resolveHost("a.example", "#frag") == null)
    assert(LinkGraph.resolveHost("a.example", "https://") == null)
  }

  test("anchorHrefs: tag-soup anchors, entity decode, href-less and empty drop") {
    val html =
      """<div><a href="/a&amp;b">one</a><a name="no-href">two</a>
        |<A HREF="https://up.example/Case">three</A>
        |<a href="">empty</a><p><a href="/unclosed">four</p></div>""".stripMargin
    assert(LinkGraph.anchorHrefs(html) ==
      List("/a&b", "https://up.example/Case", "/unclosed"))
  }

  test("linkEdges: aggregated weighted host edges from the parse kernel") {
    val df = pagesDf(
      page("https://a.example/1", Seq("/self", "https://b.example/x", "https://b.example/y")),
      page("https://a.example/2", Seq("https://b.example/z", "mailto:drop@me")),
      page("https://b.example/1", Seq("/own"))
    )
    val got = LinkGraph.linkEdges(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
    assert(got == List(
      ("a.example", "a.example", 1L),
      ("a.example", "b.example", 3L),
      ("b.example", "b.example", 1L)))
  }

  test("anchorTerms: nested markup flattens into the anchor text; ties break on term") {
    import spark.implicits._
    val html = ("""<a href="https://t.example/x"><b>deep</b> link</a>""" +
      """<a href="/same">beta alpha</a>""" +
      """<a href="mailto:no">dropped words</a>""").getBytes("UTF-8")
    val df = Seq(("https://s.example/1", html)).toDF("url", "html")
    val got = LinkGraph.anchorTerms(df, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toList
    // s.example gets {beta, alpha}; t.example gets {deep, link}; the
    // mailto words never appear; all counts 1 -> rn ordered by term asc
    assert(got == List(
      ("s.example", "alpha", 1L, 1), ("s.example", "beta", 1L, 2),
      ("t.example", "deep", 1L, 1), ("t.example", "link", 1L, 2)))
  }

  test("hostRank agrees bit-for-bit with a plain-Scala integer PageRank") {
    // hand graph with a hub, a dangler-in (c has no outlinks -> its mass
    // drains), self-loops and weighted edges
    val df = pagesDf(
      page("https://a.example/1", Seq("https://b.example/x", "https://b.example/y", "https://c.example/z")),
      page("https://a.example/2", Seq("https://b.example/w")),
      page("https://b.example/1", Seq("https://a.example/x", "/self")),
      page("https://d.example/1", Seq("https://b.example/q"))
    )
    // independent in-memory recurrence over the same edges
    val edges = Map( // (src, dst) -> w
      ("a.example", "b.example") -> 3L, ("a.example", "c.example") -> 1L,
      ("b.example", "a.example") -> 1L, ("b.example", "b.example") -> 1L,
      ("d.example", "b.example") -> 1L)
    val nodes = edges.keys.flatMap(k => Seq(k._1, k._2)).toSet
    val outW = edges.groupBy(_._1._1).map { case (s, es) => s -> es.values.sum }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = nodes.map { h =>
        h -> edges.collect {
          case ((s, d), w) if d == h => (r(s) * w) / outW(s)
        }.sum
      }.toMap
      r = nodes.map(h => h -> (150000L + (85L * in(h)) / 100L)).toMap
    }
    val got = LinkGraph.hostRank(df, iters = 3).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == r, s"distributed=$got expected=$r")
    // structure sanity: the hub (b) outranks the dangler-fed c, which
    // outranks the unlinked-to d
    assert(got("b.example") > got("c.example"))
    assert(got("c.example") > got("d.example"))
  }

  test("resolveRedirects: pointer doubling resolves full chains with exact hops") {
    import spark.implicits._
    import graft.synth.CorpusGen
    // corpus-rule urls for docs 0..8: chains 0->1->2->3, 4->5->6->7, 8->(9 missing)
    val urls = (0L to 8L).map(i => CorpusGen.urlFor(i, CorpusGen.Langs((i % 8).toInt)))
    val got = LinkGraph.resolveRedirects(urls.toDF("url")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
    val byUrl = got.map(x => x._1 -> ((x._2, x._3))).toMap
    def u(i: Long) = CorpusGen.urlFor(i, CorpusGen.Langs((i % 8).toInt))
    assert(byUrl(u(0)) == ((u(3), 3L)), s"chain head: ${byUrl(u(0))}")
    assert(byUrl(u(1)) == ((u(3), 2L)))
    assert(byUrl(u(2)) == ((u(3), 1L)))
    assert(byUrl(u(3)) == ((u(3), 0L)), "i%4==3 is final")
    assert(byUrl(u(7)) == ((u(7), 0L)))
    // doc 8 redirects to doc 9, which does not exist -> it is final
    assert(byUrl(u(8)) == ((u(8), 0L)), "dangling target must make the source final")
    // every url resolves to a fixed point
    got.foreach { case (_, fin, _) => assert(byUrl(fin)._1 == fin, s"$fin not final") }
  }

  test("frontierSchedule: per-host slots are 1..n and rounds are rank-ordered") {
    val df = pagesDf(
      (0 until 6).map(i => page(s"https://a.example/$i", Seq("https://b.example/x"))) ++
        (0 until 3).map(i => page(s"https://b.example/$i", Seq("https://a.example/y", "https://a.example/z"))) :+
        page("https://c.example/0", Seq("https://a.example/q")): _*
    )
    val rows = LinkGraph.frontierSchedule(df).collect()
      .map(x => (x.getString(0), x.getString(1), x.getInt(2), x.getLong(3)))
    // slots within each host are exactly 1..n_pages(host)
    rows.groupBy(_._2).foreach { case (host, rs) =>
      assert(rs.map(_._3).sorted.toList == (1 to rs.length).toList, s"slots of $host")
    }
    // collected order IS the fetch order: slot-major, then rank desc
    val order = rows.map(x => (x._3, -x._4))
    assert(order.sameElements(order.sorted), "schedule must be (slot asc, pr desc)")
    // politeness: within one slot round no host repeats
    rows.groupBy(_._3).foreach { case (slot, rs) =>
      assert(rs.map(_._2).distinct.length == rs.length, s"host repeat in round $slot")
    }
  }
}
