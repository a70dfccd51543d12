package graft.core

import scala.collection.mutable

/** One decoded key-value pair (/root/reference/pipeline/decode.py:360-368). */
final case class KvPair(
    key: String,
    value: String,
    keyBox: Vector[Int],
    valueBox: Vector[Int]
)

/** One decoded line (/root/reference/pipeline/decode.py:205-212). */
final case class DecodedLine(text: String, box: Vector[Int])

/** The full per-document decode result: the 7-tuple returned by
  * `sample_decode_peneo` (/root/reference/pipeline/decode.py:370-378), with
  * maps materialized as insertion-ordered pair vectors (Python dicts are
  * insertion-ordered; the order is observable in the metrics and goldens).
  */
final case class DecodedDoc(
    kvPairs: Vector[KvPair],
    lines: Vector[DecodedLine],
    lineExtraction: Vector[(Int, Int)],
    entHead: Vector[(Int, Vector[Int])],
    entTail: Vector[(Int, Vector[Int])],
    groupHead: Vector[(Int, Int)],
    groupTail: Vector[(Int, Int)]
) {
  /** Byte-identity target: the extracted main-content text of the page —
    * decoded lines joined by a single '\n'. Per-url invariant vs goldens.
    */
  def extractedText: String = lines.iterator.map(_.text).mkString("\n")
}

/** Exact port of the decode algebra in
  * /root/reference/pipeline/decode.py:72-378 (`sample_decode_peneo`): spots
  * -> head/tail memory maps -> chain-following -> validated KV pairs. Pure
  * and Spark-free; shared verbatim between the distributed engine kernel and
  * the golden oracle.
  */
object Decode {

  /** @param text      token-parallel fetched substrings; `"".join` slices of
    *                  it reconstruct source text byte-identically
    * @param bbox      token-parallel boxes (orig_bbox in the reference)
    * @param decodeGt  ground-truth mode: multimap-collapse instead of
    *                  mutual-best top-score assignment
    */
  def decode(
      text: IndexedSeq[String],
      lineExtractionSpots: Seq[Spot],
      entHeadSpots: Seq[Spot],
      entTailSpots: Seq[Spot],
      groupHeadSpots: Seq[Spot],
      groupTailSpots: Seq[Spot],
      bbox: IndexedSeq[Vector[Int]],
      decodeGt: Boolean = false,
      scoreThresh: Double = 0.0
  ): DecodedDoc = {

    // --- parse the three per-line channels (decode.py:170-200) ---
    val lineExtraction: mutable.LinkedHashMap[Int, Int] =
      if (decodeGt) Spots.collapseFirst(Spots.parseMulti(lineExtractionSpots, triuMode = false, scoreThresh))
      else Spots.parseTop(lineExtractionSpots, triuMode = false, scoreThresh)
    val groupTail: mutable.LinkedHashMap[Int, Int] =
      if (decodeGt) Spots.collapseFirst(Spots.parseMulti(groupTailSpots, triuMode = true, scoreThresh))
      else Spots.parseTop(groupTailSpots, triuMode = true, scoreThresh)
    val groupHead: mutable.LinkedHashMap[Int, Int] =
      if (decodeGt) Spots.collapseFirst(Spots.parseMulti(groupHeadSpots, triuMode = true, scoreThresh))
      else Spots.parseTop(groupHeadSpots, triuMode = true, scoreThresh)

    @inline def sliceText(s: Int, eIncl: Int): String = {
      val sb = new java.lang.StringBuilder
      var k = s
      while (k <= eIncl) { sb.append(text(k)); k += 1 }
      sb.toString
    }
    @inline def sliceBox(s: Int, eIncl: Int): Vector[Int] =
      Boxes.mergeBboxRange(bbox, s, eIncl)

    // --- line assembly (decode.py:205-212) ---
    val lines = Vector.newBuilder[DecodedLine]
    lineExtraction.foreach { case (s, e) =>
      lines += DecodedLine(sliceText(s, e), sliceBox(s, e))
    }

    // --- entity tail multimap (decode.py:217-222) ---
    val entTail = Spots.parseMulti(entTailSpots, triuMode = true, scoreThresh)

    // one chain walk (identical for key and value, decode.py:248-350):
    // follow grouping_head; accept a step only if line-extraction's tail for
    // the next head equals grouping_tail's tail for the current tail.
    final case class Walk(texts: Vector[String], boxes: Vector[Vector[Int]], currHead: Int, currTail: Int)
    def walkChain(headIdx: Int, firstTailIdx: Int): Walk = {
      var texts = Vector(sliceText(headIdx, firstTailIdx))
      var boxes = Vector(sliceBox(headIdx, firstTailIdx))
      var currHead = headIdx
      var currTail = firstTailIdx
      var nextHead: Option[Int] = groupHead.get(currHead)
      var numOp = 0
      var continue = true
      while (continue && nextHead.isDefined) {
        numOp += 1
        if (numOp > 1000) continue = false // loop guard (decode.py:259-261)
        else if (nextHead.get == currHead) continue = false // self-loop (decode.py:263-264)
        else {
          val nh = nextHead.get
          lineExtraction.get(nh) match {
            case None => continue = false // next head not an extracted line
            case Some(leTail) =>
              if (!groupTail.get(currTail).contains(leTail)) {
                continue = false // sub-task cross-validation failed (decode.py:274-276)
              } else {
                texts :+= sliceText(nh, leTail)
                boxes :+= sliceBox(nh, leTail)
                currHead = nh
                currTail = leTail
                nextHead = groupHead.get(currHead)
              }
          }
        }
      }
      Walk(texts, boxes, currHead, currTail)
    }

    // --- entity-linking heads drive KV emission (decode.py:223-368) ---
    val entHead = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[Int]]
    val kvPairs = Vector.newBuilder[KvPair]
    entHeadSpots.foreach { sp =>
      if (sp.tag != 0 && sp.score >= scoreThresh) {
        val (keyHead, valueHead) =
          if (sp.tag == 2) (sp.j, sp.i) else (sp.i, sp.j)
        entHead.getOrElseUpdate(keyHead, mutable.ArrayBuffer.empty[Int]) += valueHead

        (lineExtraction.get(keyHead), lineExtraction.get(valueHead)) match {
          case (Some(keyFirstTail), Some(valueFirstTail)) =>
            val kw = walkChain(keyHead, keyFirstTail)
            val vw = walkChain(valueHead, valueFirstTail)
            // validation: value chain tail must be a registered ent-tail of
            // the key chain tail (decode.py:352-359)
            val valid = entTail.get(kw.currTail).exists(_.contains(vw.currTail))
            if (valid) {
              kvPairs += KvPair(
                key = TextNorm.pyStrip(kw.texts.mkString),
                value = TextNorm.pyStrip(vw.texts.mkString),
                keyBox = Boxes.mergeBbox(kw.boxes),
                valueBox = Boxes.mergeBbox(vw.boxes)
              )
            }
          case _ => () // head not in line-extraction map: skip (decode.py:236-243)
        }
      }
    }

    DecodedDoc(
      kvPairs = kvPairs.result(),
      lines = lines.result(),
      lineExtraction = lineExtraction.toVector,
      entHead = entHead.iterator.map { case (k, v) => (k, v.toVector) }.toVector,
      entTail = entTail.iterator.map { case (k, v) => (k, v.toVector) }.toVector,
      groupHead = groupHead.toVector,
      groupTail = groupTail.toVector
    )
  }
}
