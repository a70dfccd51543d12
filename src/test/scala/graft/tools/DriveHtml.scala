package graft.tools
import graft.synth.CorpusGen
import graft.html.{HtmlParser, Lineizer}
/** Manual end-to-end drive: synthesize page -> raw HTML -> extract. */
object DriveHtml {
  def main(args: Array[String]): Unit = {
    val idx = if (args.nonEmpty) args(0).toLong else 7L
    val (_, page) = CorpusGen.pageFor(idx)
    val html = new String(page.html, "UTF-8")
    println("URL=" + page.url + " lang=" + page.lang + " ts=" + page.warc_ts)
    println("HTML_HEAD=" + html.take(400).replace("\n", " "))
    val d = Lineizer.extract(page.url, page.html)
    println("N_LINES=" + d.lines.length + " N_KV=" + d.kvPairs.length)
    d.kvPairs.take(5).foreach(p => println("KV: [" + p.key + "] -> [" + p.value + "]"))
    println("TEXT:\n" + d.extractedText)
    // probe: garbage / truncated / generic html through the same surface
    println("GARBAGE=" + Lineizer.extract("u", "<<<>>>not html &&& <div".getBytes("UTF-8")).lines.length)
    println("TRUNCATED=" + Lineizer.extract("u", page.html.take(page.html.length / 2)).lines.length)
    println("NOSTYLE=" + Lineizer.extract("u", "<html><body><p>hello world</p></body></html>".getBytes("UTF-8")).lines.length)
  }
}
