package graft.html

import scala.collection.mutable
import graft.core._

/** DOM lineizer + heuristic classifier: the engine-side replacement for the
  * reference's neural scoring path (SURVEY.md §2 C1-C6). Converts a parsed
  * HTML page into the same annotation algebra the decoder consumes:
  *
  *  - line extraction: positioned block elements become candidate lines;
  *    Boilerpipe/Readability-style *link-density* classification plus
  *    structural tags assign the {other, header, question, answer} category
  *    (reference category list: /root/reference/data/datasets/sibr.py:30-41);
  *  - line grouping: union-find over *adjacent DOM block spans* — consecutive
  *    sibling blocks with the same tag and category merge into one entity
  *    (replaces annotated line_grouping, sibr.py:349-408);
  *  - entity linking: DOM pair idioms `<dl><dt>/<dd>`, `<tr><th>/<td>`, and
  *    `<label for>/<id>` emit key->value relations (replaces annotated
  *    kv_entity, sibr.py:266-347).
  *
  * Output is an [[graft.core.AnnDoc]], so everything downstream (tokenize,
  * sort, spots, decode) is shared verbatim with the golden oracle.
  */
object Lineizer {

  /** link-density threshold above which an unclassified block is boilerplate */
  final val LinkDensityThreshold = 0.5

  private final case class Block(
      docOrder: Int,
      tag: String,
      parentRef: Int,
      dlRef: Int,
      trRef: Int,
      idAttr: Option[String],
      forAttr: Option[String],
      navLike: Boolean,
      headerLike: Boolean,
      cellTag: String, // nearest dt/dd/th/td/label/output ancestor-or-self tag, or ""
      text: String,
      bbox: Vector[Int],
      linkDensity: Double
  )

  private val styleKeys = Array("left", "top", "width", "height")

  /** ASCII whitespace only — Java regex `\s` = [ \t\n\x0B\f\r]. Using
    * Character.isWhitespace here would accept Unicode whitespace (U+2028
    * etc.) that the original regex rejected.
    */
  @inline private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Hand-rolled equivalent of `(left|top|width|height)\s*:\s*(-?\d+)px`
    * findAllMatchIn (left-to-right, resume after each match, last match per
    * key wins). The regex was the kernel's top allocation site — Match
    * objects per block at 10^12-doc scale; this scan allocates nothing.
    */
  private def parseStyleBox(style: String): Option[Vector[Int]] = {
    var l, t, w, h = Integer.MIN_VALUE
    val n = style.length
    var i = 0
    while (i < n) {
      var matched = false
      var ki = 0
      while (!matched && ki < 4) {
        val k = styleKeys(ki)
        if (style.startsWith(k, i)) {
          var j = i + k.length
          while (j < n && isAsciiSpace(style.charAt(j))) j += 1
          if (j < n && style.charAt(j) == ':') {
            j += 1
            while (j < n && isAsciiSpace(style.charAt(j))) j += 1
            var neg = false
            if (j < n && style.charAt(j) == '-') { neg = true; j += 1 }
            val ds = j
            while (j < n && style.charAt(j) >= '0' && style.charAt(j) <= '9') j += 1
            // digit runs that cannot fit an Int are not a match (the regex
            // form threw on toInt; silently wrapping would parse garbage
            // boxes from pathological styles)
            if (j > ds && j - ds <= 9 && style.startsWith("px", j)) {
              var v = 0
              var p = ds
              while (p < j) { v = v * 10 + (style.charAt(p) - '0'); p += 1 }
              if (neg) v = -v
              ki match {
                case 0 => l = v
                case 1 => t = v
                case 2 => w = v
                case _ => h = v
              }
              i = j + 2
              matched = true
            }
          }
        }
        ki += 1
      }
      if (!matched) i += 1
    }
    if (l != Integer.MIN_VALUE && t != Integer.MIN_VALUE &&
      w != Integer.MIN_VALUE && h != Integer.MIN_VALUE)
      Some(Vector(l, t, l + w, t + h))
    else None
  }

  private val navTags = Set("nav", "footer", "aside", "header")
  private val cellTags = Set("dt", "dd", "th", "td", "label", "output")
  private val headerTags = Set("h1", "h2", "h3", "h4", "h5", "h6")

  def lineize(root: HtmlParser.Elem, uid: String): AnnDoc = {
    val blocks = mutable.ArrayBuffer.empty[Block]
    var elemCounter = 0

    def walk(
        e: HtmlParser.Elem,
        parentRef: Int,
        dlRef: Int,
        trRef: Int,
        navLike: Boolean,
        headerLike: Boolean,
        cellTag: String
    ): Unit = {
      elemCounter += 1
      val myRef = elemCounter
      val nav2 = navLike || navTags.contains(e.tag)
      val hdr2 = headerLike || headerTags.contains(e.tag)
      val cell2 = if (cellTags.contains(e.tag)) e.tag else cellTag
      val dl2 = if (e.tag == "dl") myRef else dlRef
      val tr2 = if (e.tag == "tr") myRef else trRef

      val isBlock = e.attr("style").flatMap(parseStyleBox) match {
        case Some(box) =>
          val (text, linkLen) = HtmlParser.textAndLinkLength(e)
          val ld =
            if (text.isEmpty) 0.0
            else linkLen.toDouble / text.length
          blocks += Block(
            docOrder = blocks.length,
            tag = e.tag,
            parentRef = parentRef,
            dlRef = dl2,
            trRef = tr2,
            idAttr = e.attr("id").filter(_.nonEmpty),
            forAttr = e.attr("for").filter(_.nonEmpty),
            navLike = nav2,
            headerLike = hdr2,
            cellTag = cell2,
            text = text,
            bbox = box,
            linkDensity = ld
          )
          true
        case None => false
      }
      // the outermost positioned element is the line: don't descend into it
      if (!isBlock) e.children.foreach {
        case kid: HtmlParser.Elem =>
          walk(kid, myRef, dl2, tr2, nav2, hdr2, cell2)
        case _ => ()
      }
    }
    walk(root, parentRef = 0, dlRef = 0, trRef = 0,
      navLike = false, headerLike = false, cellTag = "")

    // page dimensions from the main/body data attributes, else defaults
    def findDims(e: HtmlParser.Elem): Option[(Int, Int)] = {
      val here = for {
        w <- e.attr("data-w").flatMap(_.toIntOption)
        h <- e.attr("data-h").flatMap(_.toIntOption)
      } yield (w, h)
      if (here.isDefined) here
      else e.children.iterator.collect { case kid: HtmlParser.Elem => findDims(kid) }
        .collectFirst { case Some(d) => d }
    }
    val (width, height) = findDims(root).getOrElse((1000, 1414))

    // ids referenced by any label[for]: their blocks are answers
    val referencedIds: Set[String] =
      blocks.iterator.flatMap(_.forAttr).toSet

    def category(b: Block): String = {
      if (b.headerLike) AnnLabels.Header
      else if (b.cellTag == "dt" || b.cellTag == "th" || b.cellTag == "label")
        AnnLabels.Question
      else if (b.cellTag == "dd" || b.cellTag == "td" || b.cellTag == "output")
        AnnLabels.Answer
      else if (b.idAttr.exists(referencedIds.contains)) AnnLabels.Answer
      else if (b.navLike || b.linkDensity > LinkDensityThreshold) AnnLabels.Other
      else AnnLabels.Answer // main content
    }
    val cats: Vector[String] = blocks.iterator.map(category).toVector

    // --- union-find over adjacent DOM block spans (line grouping) ---
    val parent = Array.tabulate(blocks.length)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    var k = 1
    while (k < blocks.length) {
      val prev = blocks(k - 1)
      val curr = blocks(k)
      if (prev.parentRef == curr.parentRef && prev.tag == curr.tag &&
        cats(k - 1) == cats(k)) union(k - 1, k)
      k += 1
    }
    // entity ids in order of first member (document order)
    val rootToEntity = mutable.LinkedHashMap.empty[Int, Int]
    blocks.indices.foreach { i =>
      val r = find(i)
      if (!rootToEntity.contains(r)) rootToEntity.put(r, rootToEntity.size)
    }
    val entityOf: Vector[Int] = blocks.indices.map(i => rootToEntity(find(i))).toVector

    // --- entities with their lines (line id = document order) ---
    val entityLines = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[Int]]
    blocks.indices.foreach { i =>
      entityLines.getOrElseUpdate(entityOf(i), mutable.ArrayBuffer.empty) += i
    }
    val entities: Vector[AnnEntity] = entityLines.iterator.map { case (eid, lineIdxs) =>
      AnnEntity(
        id = eid,
        label = cats(lineIdxs.head),
        lines = lineIdxs.iterator.map { i =>
          val b = blocks(i)
          AnnLine(id = i, text = b.text, bbox = b.bbox)
        }.toVector
      )
    }.toVector

    // --- line grouping relations: consecutive lines within an entity ---
    val lineGrouping = Vector.newBuilder[AnnRelation]
    entityLines.valuesIterator.foreach { lineIdxs =>
      var i = 1
      while (i < lineIdxs.length) {
        lineGrouping += AnnRelation(lineIdxs(i - 1), lineIdxs(i))
        i += 1
      }
    }

    // --- KV links from DOM idioms, entity-level, first-seen order ---
    val kv = Vector.newBuilder[AnnRelation]
    val seen = mutable.HashSet.empty[(Int, Int)]
    def link(qEnt: Int, aEnt: Int): Unit =
      if (qEnt != aEnt && seen.add((qEnt, aEnt))) kv += AnnRelation(qEnt, aEnt)

    // dl and tr idioms: inside one container, pair each question-run with
    // the answer-run that follows it
    def pairRuns(groupRef: Block => Int, qTag: String, aTag: String): Unit = {
      val byContainer = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[Int]]
      blocks.indices.foreach { i =>
        val ref = groupRef(blocks(i))
        if (ref != 0 && (blocks(i).cellTag == qTag || blocks(i).cellTag == aTag))
          byContainer.getOrElseUpdate(ref, mutable.ArrayBuffer.empty) += i
      }
      byContainer.valuesIterator.foreach { idxs =>
        var pendingQ: Option[Int] = None
        var lastCell = ""
        idxs.foreach { i =>
          val b = blocks(i)
          if (b.cellTag == qTag) {
            if (lastCell != qTag) pendingQ = Some(entityOf(i))
            lastCell = qTag
          } else {
            if (lastCell != aTag) pendingQ.foreach(q => link(q, entityOf(i)))
            lastCell = aTag
          }
        }
      }
    }
    pairRuns(_.dlRef, "dt", "dd")
    pairRuns(_.trRef, "th", "td")

    // label[for] -> id idiom
    val idToBlock: Map[String, Int] =
      blocks.iterator.flatMap(b => b.idAttr.map(_ -> b.docOrder)).toMap
    blocks.indices.foreach { i =>
      val b = blocks(i)
      if (b.cellTag == "label") b.forAttr.flatMap(idToBlock.get).foreach { tgt =>
        link(entityOf(i), entityOf(tgt))
      }
    }

    AnnDoc(
      uid = uid,
      width = width,
      height = height,
      entities = entities,
      kvEntity = kv.result(),
      lineGrouping = lineGrouping.result()
    )
  }

  /** Full kernel body: html bytes -> annotation -> token sample -> decoded
    * document. The single per-document function the Spark engine maps over
    * partitions (pred path: mutual-best assignment).
    */
  def extract(uid: String, htmlBytes: Array[Byte]): DecodedDoc = {
    val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
    val ann = lineize(HtmlParser.parse(html), uid)
    DocBuilder.decodeSample(DocBuilder.build(ann))
  }
}
