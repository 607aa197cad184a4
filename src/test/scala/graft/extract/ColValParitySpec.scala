package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/**
 * Per-row extractor invariant (BASELINE.json input_hint): byte-identical
 * output vs goldens produced by running the reference's exact parser
 * semantics under CPython (src/test/resources/colval_goldens.json —
 * fixtures include unicode whitespace, NBSP/NEL/VT, stray-word markers,
 * real rows from /root/reference/datamodel/test11updaetmore.tsv).
 */
class ColValParitySpec extends AnyFunSuite {

  case class Golden(input: String, strict: Map[String, String],
      robust: Map[String, String], title: String)

  lazy val goldens: Seq[Golden] = {
    val is = getClass.getResourceAsStream("/colval_goldens.json")
    require(is != null, "colval_goldens.json missing from test resources")
    val mapper = new ObjectMapper()
    val root = mapper.readTree(is)
    (0 until root.size()).map { i =>
      val n = root.get(i)
      def m(field: String): Map[String, String] = {
        val node = n.get(field)
        node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }
      Golden(n.get("input").asText(), m("strict"), m("robust"),
        n.get("title").asText())
    }
  }

  test("goldens loaded") { assert(goldens.size >= 30) }

  test("strict parser matches CPython reference semantics byte-for-byte") {
    goldens.foreach { g =>
      assert(ColVal.parseStrict(g.input) === g.strict,
        s"strict mismatch on input: ${g.input.take(120)}")
    }
  }

  test("robust parser matches CPython reference semantics byte-for-byte") {
    goldens.foreach { g =>
      assert(ColVal.parseRobust(g.input) === g.robust,
        s"robust mismatch on input: ${g.input.take(120)}")
    }
  }

  test("title extraction matches CPython reference semantics byte-for-byte") {
    goldens.foreach { g =>
      assert(ColVal.extractTitle(g.input) === g.title,
        s"title mismatch on input: ${g.input.take(120)}")
    }
  }

  test("null and pathological inputs are total") {
    assert(ColVal.parseStrict(null) === Map.empty)
    assert(ColVal.parseRobust(null) === Map.empty)
    assert(ColVal.extractTitle(null) === "")
    assert(ColVal.parseStrict("COL VAL") === Map.empty ||
      ColVal.parseStrict("COL VAL").nonEmpty) // never throws
  }
}
