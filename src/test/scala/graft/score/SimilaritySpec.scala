package graft.score

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class SimilaritySpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, eps: Double = 1e-4) =
    math.abs(a - b) <= eps

  test("jaro-winkler known vectors (Winkler 1990 test set)") {
    assert(approx(Similarity.jaroWinkler("MARTHA", "MARHTA"), 0.9611))
    assert(approx(Similarity.jaroWinkler("DIXON", "DICKSONX"), 0.8133))
    assert(approx(Similarity.jaroWinkler("JELLYFISH", "SMELLYFISH"), 0.8963))
    assert(approx(Similarity.jaroWinkler("DWAYNE", "DUANE"), 0.8400))
    assert(Similarity.jaroWinkler("abc", "abc") === 1.0)
    assert(Similarity.jaroWinkler("", "") === 1.0)
    assert(Similarity.jaroWinkler("abc", "") === 0.0)
    assert(Similarity.jaroWinkler(null, "x") === 0.0)
  }

  test("jaro-winkler properties: symmetry, range, identity (500 random pairs)") {
    val rnd = new Random(42)
    def randStr() = {
      val n = rnd.nextInt(24)
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    (1 to 500).foreach { _ =>
      val a = randStr(); val b = randStr()
      val ab = Similarity.jaroWinkler(a, b)
      assert(approx(ab, Similarity.jaroWinkler(b, a), 1e-12), s"symmetry: '$a' '$b'")
      assert(ab >= 0.0 && ab <= 1.0, s"range: '$a' '$b'")
      assert(approx(Similarity.jaroWinkler(a, a), 1.0, 1e-12), s"identity: '$a'")
    }
  }
}
