package graft.tools

import graft.engine.Pipeline
import graft.synth.CorpusGen

/** Single-threaded kernel allocation/throughput profile (no Spark). */
object DriveAlloc {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val bean = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val pages = (0L until 200L).map(i => CorpusGen.pageFor(i)._2).toArray
    // warmup
    (0 until 4000).foreach { i =>
      val p = pages(i % pages.length)
      Pipeline.extractDoc(p.url, p.html, p.lang, 256)
    }
    def stage(name: String)(f: Int => Any): Unit = {
      System.gc()
      val a0 = bean.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f(i); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      val da = bean.getThreadAllocatedBytes(tid) - a0
      println(f"[alloc] $name%-22s ${n / dt}%9.0f docs/s  ${da.toDouble / n / 1024}%8.1f KB/doc")
    }
    stage("full extractDoc") { i =>
      val p = pages(i % pages.length)
      Pipeline.extractDoc(p.url, p.html, p.lang, 256)
    }
    stage("parse only") { i =>
      val p = pages(i % pages.length)
      graft.html.HtmlParser.parse(new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
    }
    stage("parse+lineize") { i =>
      val p = pages(i % pages.length)
      graft.html.Lineizer.lineize(graft.html.HtmlParser.parse(
        new String(p.html, java.nio.charset.StandardCharsets.UTF_8)), p.url)
    }
    stage("parse+lineize+build") { i =>
      val p = pages(i % pages.length)
      graft.core.DocBuilder.build(graft.html.Lineizer.lineize(graft.html.HtmlParser.parse(
        new String(p.html, java.nio.charset.StandardCharsets.UTF_8)), p.url))
    }
    stage("lineizeStream") { i =>
      val p = pages(i % pages.length)
      graft.html.Lineizer.lineizeStreamBytes(p.html, p.url)
    }
    val htmlStrs = pages.map(p => new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
    stage("  ls:string conv") { i =>
      val p = pages(i % pages.length)
      new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
    }
    stage("  ls:via-string") { i =>
      graft.html.Lineizer.lineizeStream(htmlStrs(i % htmlStrs.length),
        pages(i % pages.length).url)
    }
    val anns = pages.map(p => graft.html.Lineizer.lineizeStreamBytes(p.html, p.url))
    stage("build only") { i =>
      graft.core.DocBuilder.build(anns(i % anns.length))
    }
    stage("  b:norm+tokenize") { i =>
      val d = anns(i % anns.length)
      d.entities.foreach(_.lines.foreach { l =>
        graft.core.Tokenizer.tokenizeEnds(graft.core.DocBuilder.normalizeLineText(l.text))
      })
    }
    stage("  b:boxconvert+sort") { i =>
      val d = anns(i % anns.length)
      val boxes = d.entities.iterator.flatMap(_.lines.iterator)
        .map(l => graft.core.Boxes.boxTwoPointConvert(l.bbox)).toVector
      graft.core.Boxes.sortBoxes(boxes)
    }
    stage("  b:normalizeBbox") { i =>
      val d = anns(i % anns.length)
      d.entities.foreach(_.lines.foreach { l =>
        graft.core.Boxes.normalizeBbox(
          graft.core.Boxes.boxTwoPointConvert(l.bbox), d.width, d.height)
      })
    }
    stage("  b:entityText") { i =>
      val d = anns(i % anns.length)
      d.entities.foreach { e =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        e.lines.foreach(l => buf += graft.core.DocBuilder.normalizeLineText(l.text))
        buf.mkString
      }
    }
    val samples = pages.map { p =>
      graft.core.DocBuilder.build(graft.html.Lineizer.lineize(graft.html.HtmlParser.parse(
        new String(p.html, java.nio.charset.StandardCharsets.UTF_8)), p.url))
    }
    stage("canonicalize x5") { i =>
      val s = samples(i % samples.length)
      graft.core.Spots.canonicalizePacked(s.lineExtractionSpots)
      graft.core.Spots.canonicalizePacked(s.entHeadSpots)
      graft.core.Spots.canonicalizePacked(s.entTailSpots)
      graft.core.Spots.canonicalizePacked(s.groupHeadSpots)
      graft.core.Spots.canonicalizePacked(s.groupTailSpots)
    }
    stage("decodeSample") { i =>
      graft.core.DocBuilder.decodeSample(samples(i % samples.length))
    }
    stage("decodeSampleFast") { i =>
      graft.core.DocBuilder.decodeSampleFast(samples(i % samples.length))
    }
  }
}
