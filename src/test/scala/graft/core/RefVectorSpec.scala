package graft.core

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Pins this engine's pure core against vectors produced by RUNNING the
  * actual reference functions (tools/gen_reference_vectors.py executes
  * /root/reference/data/data_utils.py and the extracted
  * pipeline/decode.py:parse_matrix_spots on seeded random + adversarial
  * inputs). Committed at src/test/resources/refvec/vectors.json.
  */
class RefVectorSpec extends AnyFunSuite {

  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/refvec/vectors.json")
    require(in != null, "missing refvec/vectors.json")
    new ObjectMapper().readTree(in)
  }

  private def intSeq(n: JsonNode): Vector[Int] = n.elements.asScala.map(_.asInt).toVector

  test("sort_boxes matches reference permutation") {
    root.get("sort_boxes").elements.asScala.foreach { c =>
      val boxes = c.get("boxes").elements.asScala.map(intSeq).toVector
      val expected = intSeq(c.get("perm"))
      assert(Boxes.sortBoxes(boxes) == expected, s"boxes=$boxes")
    }
  }

  test("special_text_replace matches the executed reference (inference variant)") {
    root.get("special_text_replace").elements.asScala.foreach { c =>
      assert(TextNorm.specialReplace(c.get("in").asText) == c.get("out").asText,
        s"in=${c.get("in").asText}")
    }
  }

  test("string_f2h matches reference") {
    root.get("string_f2h").elements.asScala.foreach { c =>
      assert(TextNorm.stringF2H(c.get("in").asText) == c.get("out").asText)
    }
  }

  test("normalize_bbox matches reference int-truncation semantics") {
    root.get("normalize_bbox").elements.asScala.foreach { c =>
      val got = Boxes.normalizeBbox(intSeq(c.get("box")), c.get("w").asInt, c.get("h").asInt)
      assert(got == intSeq(c.get("out")))
    }
  }

  test("box_two_point_convert matches reference (4-value and 8-coord quad)") {
    root.get("box_two_point_convert").elements.asScala.foreach { c =>
      val box = intSeq(c.get("box"))
      assert(Boxes.boxTwoPointConvert(box) == intSeq(c.get("out")), s"box=$box")
    }
  }

  test("merge_bbox matches reference") {
    root.get("merge_bbox").elements.asScala.foreach { c =>
      val boxes = c.get("boxes").elements.asScala.map(intSeq).toVector
      assert(Boxes.mergeBbox(boxes) == intSeq(c.get("out")))
    }
  }

  test("sample_decode_peneo full chain matches executed reference") {
    def spots(n: JsonNode): Vector[Spot] =
      n.elements.asScala.map { s =>
        val v = s.elements.asScala.toVector
        Spot(v(0).asInt, v(1).asInt, v(2).asInt, v(3).asDouble)
      }.toVector
    def pairs(n: JsonNode): Vector[(Int, Int)] =
      n.elements.asScala.map(e => (e.get(0).asInt, e.get(1).asInt)).toVector
    def multi(n: JsonNode): Vector[(Int, Vector[Int])] =
      n.elements.asScala.map(e => (e.get(0).asInt, intSeq(e.get(1)))).toVector

    var nKv = 0
    root.get("sample_decode").elements.asScala.zipWithIndex.foreach { case (c, ci) =>
      val text = c.get("text").elements.asScala.map(_.asText).toVector
      val bbox = c.get("bbox").elements.asScala.map(intSeq).toVector
      val got = Decode.decode(
        text = text,
        lineExtractionSpots = spots(c.get("le")),
        entHeadSpots = spots(c.get("eh")),
        entTailSpots = spots(c.get("et")),
        groupHeadSpots = spots(c.get("gh")),
        groupTailSpots = spots(c.get("gtl")),
        bbox = bbox,
        decodeGt = c.get("gt").asBoolean,
        scoreThresh = c.get("thresh").asDouble
      )
      val expKv = c.get("kv").elements.asScala.map { e =>
        KvPair(e.get(0).asText, e.get(1).asText, intSeq(e.get(2)), intSeq(e.get(3)))
      }.toVector
      val expLines = c.get("lines").elements.asScala.map { e =>
        DecodedLine(e.get(0).asText, intSeq(e.get(1)))
      }.toVector
      assert(got.kvPairs == expKv, s"case $ci kv")
      assert(got.lines == expLines, s"case $ci lines")
      assert(got.lineExtraction == pairs(c.get("le_map")), s"case $ci le_map")
      assert(got.entHead == multi(c.get("eh_map")), s"case $ci eh_map")
      assert(got.entTail == multi(c.get("et_map")), s"case $ci et_map")
      assert(got.groupHead == pairs(c.get("gh_map")), s"case $ci gh_map")
      assert(got.groupTail == pairs(c.get("gt_map")), s"case $ci gt_map")
      nKv += expKv.size
    }
    assert(nKv >= 20, s"vectors must exercise kv emission (got $nKv pairs)")
  }

  test("parse_matrix_spots matches reference dict-order and tie semantics") {
    root.get("parse_matrix_spots").elements.asScala.foreach { c =>
      val spots = c.get("spots").elements.asScala.map { s =>
        val v = s.elements.asScala.toVector
        Spot(v(0).asInt, v(1).asInt, v(2).asInt, v(3).asDouble)
      }.toVector
      val top = c.get("top").asBoolean
      val triu = c.get("triu").asBoolean
      val thresh = c.get("thresh").asDouble
      val expected: Vector[(Int, Either[Int, Vector[Int]])] =
        c.get("result").elements.asScala.map { item =>
          val k = item.get(0).asInt
          val v = item.get(1)
          if (v.isArray) (k, Right(intSeq(v))) else (k, Left(v.asInt))
        }.toVector
      if (top) {
        val got = Spots.parseTop(spots, triu, thresh).toVector
        assert(got == expected.map { case (k, Left(v)) => (k, v); case x => fail(s"$x") },
          s"spots=$spots top=$top triu=$triu")
      } else {
        val got = Spots.parseMulti(spots, triu, thresh).toVectorMulti
        assert(got == expected.map { case (k, Right(v)) => (k, v); case x => fail(s"$x") },
          s"spots=$spots top=$top triu=$triu")
      }
    }
  }
}
