package graft.tools

import graft.html.{HtmlParser, Lineizer}

/** Repro driver for the tag-soup fuzz: prints the soup index before each
  * parse so a hang pinpoints the generating seed/step.
  */
object DriveFuzz {
  def main(args: Array[String]): Unit = {
    val rng = new java.util.Random(20260816L)
    val tags = Array("div", "p", "span", "dl", "dt", "dd", "table", "tr", "th",
      "td", "a", "nav", "h2", "label", "output", "b", "script", "img", "br", "zz")
    val words = Array("x", "A&amp;B", "t&lt;u", "&#65;", "key:", "v", " ", "–", "ｘ",
      "東京", "😀", "　")
    def soup(): String = {
      val sb = new StringBuilder("<html><body>")
      (0 until 5 + rng.nextInt(60)).foreach { _ =>
        rng.nextInt(7) match {
          case 0 | 1 =>
            val t = tags(rng.nextInt(tags.length))
            sb ++= s"<$t"
            if (rng.nextInt(3) == 0)
              sb ++= s""" style="left:${rng.nextInt(900)}px;top:${rng.nextInt(900)}px;width:${1 + rng.nextInt(200)}px;height:${1 + rng.nextInt(40)}px""""
            if (rng.nextInt(4) == 0) sb ++= s""" id="i${rng.nextInt(9)}""""
            if (rng.nextInt(5) == 0) sb ++= s""" for="i${rng.nextInt(9)}""""
            if (rng.nextInt(6) == 0) sb ++= " /"
            sb ++= ">"
          case 2 => sb ++= s"</${tags(rng.nextInt(tags.length))}>"
          case 3 => sb ++= words(rng.nextInt(words.length))
          case 4 => sb ++= s"<!-- c ${rng.nextInt(9)} -->"
          case 5 => sb ++= words(rng.nextInt(words.length)) + words(rng.nextInt(words.length))
          case _ => sb ++= s"<${words(rng.nextInt(words.length))}"
        }
      }
      sb ++= "</body></html>"
      sb.toString
    }
    val nasty = Array(
      "<", "</", "</>", "<>", "< div>", "<div", "\"", "'", "<script>never closed",
      "<style>p{}</STYLE>", "<DIV STYLE=\"left:1px;top:2px;width:3px;height:4px\">",
      "<div style='left:5px;top:6px;width:7px;height:8px'>", "<div style=left:1pxtop:2px>",
      "<a href=http://ex/a/b>u</a>", "<img src=x / >", "<p / / />", "&#xZZ;", "&bogus;",
      "<div style=\"unclosed", "<t id=\"spans<div>tags\">", "\u0000", "<div style=\"left:-3px;top:-4px;width:1px;height:1px\">",
      "<!doctype html>", "<?pi x?>", "<!-- unterminated", "<b id=>", "<b id>", "<b =x>"
    )
    val n = args.headOption.map(_.toInt).getOrElse(500)
    var diverged = 0
    (0 until n).foreach { t =>
      val base = soup()
      // splice 0-3 nasty fragments at random positions
      val sb = new StringBuilder(base)
      (0 until rng.nextInt(4)).foreach { _ =>
        // never split a surrogate pair: a lone surrogate cannot survive the
        // UTF-8 round trip (encodes as '?'), so tree-vs-bytes comparison on
        // such a String is meaningless — real inputs are (valid-or-not)
        // BYTES, where the byte scanner is the ground truth
        var pos = rng.nextInt(sb.length)
        if (pos > 0 && Character.isLowSurrogate(sb.charAt(pos))) pos -= 1
        sb.insert(pos, nasty(rng.nextInt(nasty.length)))
      }
      val html = sb.toString
      if (t % 1000 == 0) { println(s"[$t]"); Console.flush() }
      val tree = Lineizer.lineize(HtmlParser.parse(html), "u")
      val stream = Lineizer.lineizeStream(html, "u")
      if (stream != tree) {
        diverged += 1
        println(s"DIVERGED at $t:\n$html")
      } else {
        val sample = graft.core.DocBuilder.build(stream)
        if (graft.core.DocBuilder.decodeSampleFast(sample) !=
            graft.core.DocBuilder.decodeSample(sample)) {
          diverged += 1
          println(s"DECODE DIVERGED at $t:\n$html")
        }
      }
    }
    println(s"done diverged=$diverged")
  }
}
