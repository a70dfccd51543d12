package graft.tools
import graft.core._
/** Manual end-to-end drive of the public core API (verification harness). */
object DriveCore {
  def main(args: Array[String]): Unit = {
    val doc = AnnDoc(
      uid = "https://host-1.example/en/doc-0",
      width = 1000, height = 1414,
      entities = Vector(
        AnnEntity(0, "header", Vector(AnnLine(0, "ＦＯＲＭ　２０２４", Vector(100, 20, 500, 50)))),
        AnnEntity(1, "question", Vector(
          AnnLine(1, "Applicant Name", Vector(50, 100, 250, 130)),
          AnnLine(2, "(full legal)", Vector(50, 140, 200, 170)))),
        AnnEntity(2, "answer", Vector(AnnLine(3, "José K. Müller–Smith", Vector(300, 100, 600, 130)))),
        AnnEntity(3, "other", Vector(AnnLine(4, "Home | About | ☑", Vector(50, 1300, 900, 1330)))),
        AnnEntity(4, "question", Vector(AnnLine(5, "   ", Vector(50, 200, 60, 210))))
      ),
      kvEntity = Vector(AnnRelation(1, 2)),
      lineGrouping = Vector(AnnRelation(1, 2))
    )
    val sample = DocBuilder.build(doc)
    println("TOKENS=" + sample.tokens.mkString("|"))
    val pred = DocBuilder.decodeSample(sample)
    val gt = DocBuilder.decodeSample(sample, decodeGt = true)
    println("LINES=" + pred.lines.map(_.text))
    println("KV=" + pred.kvPairs.map(p => (p.key, p.value)))
    println("TEXT=" + pred.extractedText.replace("\n", "\\n"))
    println("GT==PRED lines " + (gt.lines == pred.lines) + " kv " + (gt.kvPairs == pred.kvPairs))
    println("METRICS=" + PairMetrics.docMetrics(doc.uid, pred, gt))
    println("EMPTY=" + DocBuilder.build(doc.copy(entities = Vector.empty, kvEntity = Vector.empty, lineGrouping = Vector.empty)).tokens.length)
    val huge = AnnDoc("u", 1000, 1000,
      Vector.tabulate(300)(i => AnnEntity(i, "answer", Vector(AnnLine(i, s"line $i with several tokens", Vector(10, 10 + i * 4, 400, 12 + i * 4))))),
      Vector.empty, Vector.empty)
    val hs = DocBuilder.build(huge)
    println("TRUNC tokens=" + hs.tokens.length + " (cap 511) lineSpots=" + hs.lineExtractionSpots.length)
  }
}
