package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Ref semantics: omim2obo/utils/romanplus.py (pattern requires one
  * trailing suffix letter; greedy decode). */
class RomanSpec extends AnyFunSuite {

  test("toRoman known values") {
    assert(Roman.toRoman(1) == "I")
    assert(Roman.toRoman(4) == "IV")
    assert(Roman.toRoman(9) == "IX")
    assert(Roman.toRoman(14) == "XIV")
    assert(Roman.toRoman(49) == "XLIX")
    assert(Roman.toRoman(99) == "XCIX")
    assert(Roman.toRoman(1987) == "MCMLXXXVII")
  }

  test("round-trip 1..4999 (exhaustive)") {
    (1 to 4999).foreach { n =>
      assert(Roman.fromRoman(Roman.toRoman(n)) == n, s"round-trip failed at $n")
    }
  }

  test("pattern accepts numeral+suffix and bare numerals via suffix slot") {
    assert(Roman.matchesPattern("IIIB"))   // 3 + suffix B
    assert(Roman.matchesPattern("IVA"))    // 4 + suffix A
    assert(Roman.matchesPattern("III"))    // II + suffix I (quirk)
    assert(Roman.matchesPattern("X"))      // empty numeral + suffix X
    assert(!Roman.matchesPattern("IIAB"))  // two suffix letters
    assert(!Roman.matchesPattern("3B"))
    assert(!Roman.matchesPattern(""))
  }

  test("arabize mirrors cleanup_title word logic") {
    assert(Roman.arabize("IIIB") == "3B")
    assert(Roman.arabize("IVA") == "4A")
    assert(Roman.arabize("III") == "3")
    assert(Roman.arabize("VI") == "6")
    assert(Roman.arabize("C") == "C")       // 100, not < 100 -> kept
    assert(Roman.arabize("A") == "A")       // decodes to 0 -> kept
    assert(Roman.arabize("SYNDROME") == "SYNDROME")
  }
}
