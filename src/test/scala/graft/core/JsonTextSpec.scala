package graft.core

import org.json4s.jackson.JsonMethods
import org.scalacheck.{Arbitrary, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The driver json.load's the artifacts Verify/Bench emit; one unescaped
  * control character would zero a round's correctness. Property: every
  * string round-trips through a real JSON parser.
  */
class JsonTextSpec extends AnyFunSuite {

  private def parse(lit: String): String =
    JsonMethods.parse(lit).values.asInstanceOf[String]

  test("arbitrary strings round-trip through a strict JSON parser") {
    val p = Prop.forAll(Arbitrary.arbitrary[String]) { s =>
      parse(JsonText.escape(s)) == s
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("the characters that have bitten: control chars, quotes, backslashes, SQL") {
    val cases = Seq(
      "line1\nline2\ttabbed\rret", "quote\"back\\slash",
      " ", "SELECT x\n  FROM t\twHERE a = 'b'",
      "emoji 😀 and high ￿")
    cases.foreach(s => assert(parse(JsonText.escape(s)) === s))
  }

  test("object and array composition stays parseable") {
    val json = Seq("a\nb", "c\"d").map(JsonText.escape).mkString("[", ",", "]")
    assert(JsonMethods.parse(json).values === List("a\nb", "c\"d"))
  }
}
