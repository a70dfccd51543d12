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

  test("merge_bbox matches reference") {
    root.get("merge_bbox").elements.asScala.foreach { c =>
      val boxes = c.get("boxes").elements.asScala.map(intSeq).toVector
      assert(Boxes.mergeBbox(boxes) == intSeq(c.get("out")))
    }
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
        val got = Spots.parseMulti(spots, triu, thresh).iterator
          .map { case (k, v) => (k, v.toVector) }.toVector
        assert(got == expected.map { case (k, Right(v)) => (k, v); case x => fail(s"$x") },
          s"spots=$spots top=$top triu=$triu")
      }
    }
  }
}
