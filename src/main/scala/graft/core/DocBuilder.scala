package graft.core

import scala.collection.mutable

/** The token-parallel document sample: the output of the pre-processing +
  * label-generation stages (B/C blocks of SURVEY.md §2), mirroring the dict
  * returned by /root/reference/data/datasets/sibr.py:447-460.
  *
  * Token-parallel invariant: tokens.length == bbox.length == origBbox.length.
  * Spot channels carry (i, j, tag) triples in emission order; they are
  * canonicalized (dense round-trip order, score 1.0) at decode time.
  */
final case class DocSample(
    uid: String,
    tokens: Vector[String],
    bbox: Vector[Vector[Int]],
    origBbox: Vector[Vector[Int]],
    relations: Vector[(String, String)],
    lineExtractionSpots: Vector[(Int, Int, Int)],
    entHeadSpots: Vector[(Int, Int, Int)],
    entTailSpots: Vector[(Int, Int, Int)],
    groupHeadSpots: Vector[(Int, Int, Int)],
    groupTailSpots: Vector[(Int, Int, Int)]
)

/** Exact port of the dataset pre-processing pipeline
  * (/root/reference/data/datasets/sibr.py:90-460): tokenize + fetch,
  * empty-line/empty-entity filtering, reading-order sort, truncation with the
  * dataset-side `>=` rule (sibr.py:232-235; the inference-side `>` variant is
  * intentionally NOT used, see SURVEY.md §7.5), in-scope bookkeeping, and the
  * generation of the five spot channels (C1-C3).
  *
  * Known reference quirks preserved exactly (SURVEY.md §7.5):
  *  - `empty_entity` is only populated while the *global* kept-line list is
  *    empty (sibr.py:184-186);
  *  - `entity_last_line_map` records the last *globally kept* line at the
  *    time the entity closes (sibr.py:188-192);
  *  - the line that trips the truncation check is present in
  *    `line_orig_to_sorted_map` but carries no token offsets.
  */
object DocBuilder {

  final val DefaultMaxTokenLen = 511

  private final class LineInfo(
      val coords: Vector[Int],
      val tokens: Vector[String],
      val category: String,
      val origEntityId: Int,
      val origLineId: Int
  ) {
    // -1 = unset (the reference's None); plain ints keep the hot path free
    // of Some() allocations — the trace re-wraps them as Options
    var sortedStartToken: Int = -1
    var sortedEndToken: Int = -1
  }

  /** One sorted line's bookkeeping, exposed for the executed-reference
    * comparison (sibr.py's LineInfo dataclass fields the loop mutates).
    */
  final case class TraceLine(origLineId: Int, origEntityId: Int, category: String,
      tokens: Vector[String], coords: Vector[Int],
      start: Option[Int], end: Option[Int])

  /** The builder's internal bookkeeping — exclusion sets, entity maps,
    * orig->sorted map, token offsets — surfaced so RefVectorSpec can pin
    * them against the EXECUTED reference loop (sibr.py:105-263), not just
    * against the observable DocSample.
    */
  final case class BuildTrace(
      emptyLine: Set[Int],
      emptyEntity: Set[Int],
      entityFirstLine: Map[Int, Int],
      entityLastLine: Map[Int, Int],
      entityText: Map[Int, String],
      inScopeEntityId: Set[Int],
      inScopeLineId: Set[Int],
      lineOrigToSorted: Map[Int, Int],
      sortedLines: Vector[TraceLine]
  )

  /** Normalize a raw annotation line text exactly as the engine does before
    * tokenization: ordered replacement table + full-width folding
    * (/root/reference/data/datasets/rfund.py:95-109 applied dataset-side).
    */
  def normalizeLineText(raw: String): String = TextNorm.specialReplace(raw)

  def build(doc: AnnDoc, maxTokenLen: Int = DefaultMaxTokenLen): DocSample =
    buildImpl(doc, maxTokenLen, wantTrace = false)._1

  def buildWithTrace(doc: AnnDoc,
      maxTokenLen: Int = DefaultMaxTokenLen): (DocSample, BuildTrace) = {
    val (sample, trace) = buildImpl(doc, maxTokenLen, wantTrace = true)
    (sample, trace.get)
  }

  /** wantTrace=false keeps the hot extraction path allocation-free: the
    * trace copies every internal set/map, which only the executed-reference
    * spec needs.
    */
  private def buildImpl(doc: AnnDoc, maxTokenLen: Int,
      wantTrace: Boolean): (DocSample, Option[BuildTrace]) = {
    val allOrigLines = mutable.ArrayBuffer.empty[LineInfo]
    val allOrigBoxes = mutable.ArrayBuffer.empty[Vector[Int]]
    // open-addressing primitive maps (value 1 = set membership): the boxed
    // HashMap/HashSet versions cost an entry object + boxed key per put on
    // the per-doc hot path (-1 is the maps' empty sentinel, hence the
    // nonnegative-id requirement — the reference's ids are list indices)
    val emptyLine = new IntIntOrdered()
    val emptyEntity = new IntIntOrdered()
    val entityIdToText = mutable.HashMap.empty[Int, String]
    val entityFirstLine = new IntIntOrdered()
    val entityLastLine = new IntIntOrdered()
    val lineIdToEntityId = new IntIntOrdered()

    doc.entities.foreach { entity =>
      var firstLineFlag = true
      val entityTextList = mutable.ArrayBuffer.empty[String]
      require(entity.id >= 0, s"negative entity id ${entity.id}")
      entity.lines.foreach { line =>
        require(line.id >= 0, s"negative line id ${line.id}")
        val lineText = normalizeLineText(line.text)
        val lineTokens = Tokenizer.tokenize(lineText)
        if (lineTokens.isEmpty) {
          emptyLine.put(line.id, 1)
        } else {
          entityTextList += lineText
          val b = Boxes.boxTwoPointConvert(line.bbox)
          allOrigLines += new LineInfo(b, lineTokens, entity.label, entity.id, line.id)
          allOrigBoxes += b
          if (firstLineFlag) entityFirstLine.put(entity.id, line.id)
          firstLineFlag = false
          lineIdToEntityId.put(line.id, entity.id)
        }
      }
      if (allOrigLines.isEmpty) {
        emptyEntity.put(entity.id, 1)
      } else {
        entityLastLine.put(entity.id, allOrigLines.last.origLineId)
        entityIdToText.put(entity.id, entityTextList.mkString)
      }
    }

    val sortedIdx = Boxes.sortBoxes(allOrigBoxes)
    val sortedLines: Vector[LineInfo] = sortedIdx.map(allOrigLines(_))

    val texts = Vector.newBuilder[String]
    val bbox = Vector.newBuilder[Vector[Int]]
    val origBbox = Vector.newBuilder[Vector[Int]]
    val lineExtractionSpots = Vector.newBuilder[(Int, Int, Int)]
    val entHeadSpots = Vector.newBuilder[(Int, Int, Int)]
    val entTailSpots = Vector.newBuilder[(Int, Int, Int)]
    val groupHeadSpots = Vector.newBuilder[(Int, Int, Int)]
    val groupTailSpots = Vector.newBuilder[(Int, Int, Int)]

    var currTokenIdx = 0
    val lineOrigToSorted = new IntIntOrdered()
    val inScopeEntityId = new IntIntOrdered()
    val inScopeLineId = new IntIntOrdered()

    var sortedLineIdx = 0
    var truncated = false
    while (sortedLineIdx < sortedLines.length && !truncated) {
      val ln = sortedLines(sortedLineIdx)
      lineOrigToSorted.put(ln.origLineId, sortedLineIdx)
      val lineTokenLen = ln.tokens.length
      if (currTokenIdx + lineTokenLen >= maxTokenLen) {
        truncated = true // dataset-side `>=` rule (sibr.py:233)
      } else {
        inScopeEntityId.put(ln.origEntityId, 1)
        inScopeLineId.put(ln.origLineId, 1)
        val norm = Boxes.normalizeBbox(ln.coords, doc.width, doc.height)
        var k = 0
        while (k < lineTokenLen) { origBbox += ln.coords; bbox += norm; k += 1 }
        texts ++= ln.tokens
        val start = currTokenIdx
        ln.sortedStartToken = start
        currTokenIdx += lineTokenLen
        ln.sortedEndToken = currTokenIdx
        if (ln.category == AnnLabels.Question || ln.category == AnnLabels.Answer) {
          lineExtractionSpots += ((start, currTokenIdx - 1, 1))
        }
        sortedLineIdx += 1
      }
    }

    // --- C2: entity-linking spots (sibr.py:266-347) ---
    doc.kvEntity.foreach { rel =>
      val qId = rel.fromId
      val aId = rel.toId
      val skip =
        emptyEntity.contains(qId) || emptyEntity.contains(aId) ||
          !inScopeEntityId.contains(qId) || !inScopeEntityId.contains(aId)
      if (!skip) {
        val qFirst = entityFirstLine.getOrMinus1(qId)
        val aFirst = entityFirstLine.getOrMinus1(aId)
        val qLast = entityLastLine.getOrMinus1(qId)
        val aLast = entityLastLine.getOrMinus1(aId)
        val linesInScope =
          inScopeLineId.contains(qFirst) && inScopeLineId.contains(qLast) &&
            inScopeLineId.contains(aFirst) && inScopeLineId.contains(aLast)
        if (linesInScope) {
          val qFirstStart = sortedLines(lineOrigToSorted.getOrMinus1(qFirst)).sortedStartToken
          val aFirstStart = sortedLines(lineOrigToSorted.getOrMinus1(aFirst)).sortedStartToken
          val qLastEnd = sortedLines(lineOrigToSorted.getOrMinus1(qLast)).sortedEndToken
          val aLastEnd = sortedLines(lineOrigToSorted.getOrMinus1(aLast)).sortedEndToken
          if (qFirstStart < aFirstStart)
            entHeadSpots += ((qFirstStart, aFirstStart, 1))
          else
            entHeadSpots += ((aFirstStart, qFirstStart, 2))
          if (qLastEnd < aLastEnd)
            entTailSpots += ((qLastEnd - 1, aLastEnd - 1, 1))
          else
            entTailSpots += ((aLastEnd - 1, qLastEnd - 1, 2))
        }
      }
    }

    // --- C3: line-grouping spots (sibr.py:349-408) ---
    doc.lineGrouping.foreach { rel =>
      val fromId = rel.fromId
      val toId = rel.toId
      val skip =
        emptyLine.contains(fromId) || emptyLine.contains(toId) || {
          val fromEnt = lineIdToEntityId.getOrMinus1(fromId)
          val toEnt = lineIdToEntityId.getOrMinus1(toId)
          !inScopeEntityId.contains(fromEnt) || !inScopeEntityId.contains(toEnt)
        } || !inScopeLineId.contains(fromId) || !inScopeLineId.contains(toId)
      if (!skip) {
        val fromLn = sortedLines(lineOrigToSorted.getOrMinus1(fromId))
        val toLn = sortedLines(lineOrigToSorted.getOrMinus1(toId))
        val fs = fromLn.sortedStartToken; val fe = fromLn.sortedEndToken
        val ts = toLn.sortedStartToken; val te = toLn.sortedEndToken
        // -1 = unset offsets (the truncation-tripped line quirk): skip, as
        // the reference's None match did
        if (fs >= 0 && fe >= 0 && ts >= 0 && te >= 0) {
          if (fs < ts) groupHeadSpots += ((fs, ts, 1))
          else groupHeadSpots += ((ts, fs, 2))
          if (fe < te) groupTailSpots += ((fe - 1, te - 1, 1))
          else groupTailSpots += ((te - 1, fe - 1, 2))
        }
      }
    }

    // --- auxiliary gt relations list (sibr.py:410-425) ---
    val relations = Vector.newBuilder[(String, String)]
    doc.kvEntity.foreach { rel =>
      val qId = rel.fromId
      val aId = rel.toId
      val ok =
        entityIdToText.contains(qId) && entityIdToText.contains(aId) &&
          !emptyEntity.contains(qId) && !emptyEntity.contains(aId) &&
          inScopeEntityId.contains(qId) && inScopeEntityId.contains(aId)
      if (ok) relations += ((entityIdToText(qId), entityIdToText(aId)))
    }

    val sample = DocSample(
      uid = doc.uid,
      tokens = texts.result(),
      bbox = bbox.result(),
      origBbox = origBbox.result(),
      relations = relations.result(),
      lineExtractionSpots = lineExtractionSpots.result(),
      entHeadSpots = entHeadSpots.result(),
      entTailSpots = entTailSpots.result(),
      groupHeadSpots = groupHeadSpots.result(),
      groupTailSpots = groupTailSpots.result()
    )
    def asSet(m: IntIntOrdered): Set[Int] = m.toVector.iterator.map(_._1).toSet
    def opt(v: Int): Option[Int] = if (v >= 0) Some(v) else None
    val trace = if (!wantTrace) None else Some(BuildTrace(
      emptyLine = asSet(emptyLine),
      emptyEntity = asSet(emptyEntity),
      entityFirstLine = entityFirstLine.toVector.toMap,
      entityLastLine = entityLastLine.toVector.toMap,
      entityText = entityIdToText.toMap,
      inScopeEntityId = asSet(inScopeEntityId),
      inScopeLineId = asSet(inScopeLineId),
      lineOrigToSorted = lineOrigToSorted.toVector.toMap,
      sortedLines = sortedLines.map(ln => TraceLine(ln.origLineId, ln.origEntityId,
        ln.category, ln.tokens, ln.coords, opt(ln.sortedStartToken), opt(ln.sortedEndToken)))
    ))
    (sample, trace)
  }

  /** Canonicalize + decode one sample: the shared kernel body used by the
    * oracle and the engine (pred path: mutual-best; gt path: first-wins).
    */
  def decodeSample(sample: DocSample, decodeGt: Boolean = false): DecodedDoc =
    Decode.decode(
      text = sample.tokens,
      lineExtractionSpots = Spots.canonicalize(sample.lineExtractionSpots),
      entHeadSpots = Spots.canonicalize(sample.entHeadSpots),
      entTailSpots = Spots.canonicalize(sample.entTailSpots),
      groupHeadSpots = Spots.canonicalize(sample.groupHeadSpots),
      groupTailSpots = Spots.canonicalize(sample.groupTailSpots),
      bbox = sample.origBbox,
      decodeGt = decodeGt
    )
}
