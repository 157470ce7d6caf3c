package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{JArr, JObj, JStr, Json}

/** Pins [[Confusables]] against uts39_expected.json — direct ICU 72.1
  * uspoof_getSkeleton / unorm2 NFKC_CF outputs captured by
  * tools/extract_uts39_tables.py for a 28-string battery (homoglyphs,
  * ligatures, fullwidth, math alphabets, combining marks, deletions).
  * The extraction tool additionally verified the composition contract on
  * 500 randomized mixed-plane strings.
  */
class ConfusablesSpec extends AnyFunSuite {

  private lazy val battery: Seq[Map[String, String]] = {
    val in = getClass.getResourceAsStream("/fixtures/uts39_expected.json")
    assert(in != null)
    val raw = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    Json.parse(raw).asInstanceOf[JArr].items.map { v =>
      v.asInstanceOf[JObj].fields.toMap.map {
        case (k, JStr(s)) => k -> s
        case (k, other) => fail(s"$k: $other")
      }
    }
  }

  test("skeleton matches direct ICU uspoof_getSkeleton on the battery") {
    battery.foreach { f =>
      assert(Confusables.skeleton(f("input")) == f("skeleton"),
        s"skeleton(${f("input")})")
    }
  }

  test("nfkcCasefold matches direct ICU NFKC_CF on the battery") {
    battery.foreach { f =>
      assert(Confusables.nfkcCasefold(f("input")) == f("nfkc_cf"),
        s"nfkc_cf(${f("input")})")
    }
  }

  test("dedupKey = skeleton(nfkcCasefold) matches the pinned pipeline key") {
    battery.foreach { f =>
      assert(Confusables.dedupKey(f("input")) == f("key"), s"key(${f("input")})")
    }
  }

  test("homoglyph spam collides with its clean form; distinct text does not") {
    // cyrillic а/е/о/р/с, greek ο/ρ, fullwidth, case, ligature
    assert(Confusables.dedupKey("раураl sсam") == Confusables.dedupKey("paypal scam"))
    assert(Confusables.dedupKey("ρAYPAL") == Confusables.dedupKey("ｐaypal"))
    assert(Confusables.dedupKey("ﬁle") == Confusables.dedupKey("file"))
    assert(Confusables.dedupKey("paypal") != Confusables.dedupKey("paypa1 x"))
    // ascii digits/letters that are themselves confusable fold together
    assert(Confusables.dedupKey("l1me") == Confusables.dedupKey("llme"))
    // note the casefold-first order: '0' skeletons to uppercase 'O' while a
    // real 'O' folds to 'o' first, so 0/O do NOT collide — but case does
    assert(Confusables.dedupKey("c0de") == Confusables.dedupKey("c0DE"))
    assert(Confusables.dedupKey("c0de") != Confusables.dedupKey("cOde"))
  }

  test("script property matches ICU anchors; mixing per UTS #39 §5.1") {
    // anchors pinned in tools/extract_script_ranges.py against ICU direct
    assert(Confusables.script('a') == "Latn")
    assert(Confusables.script(0x430) == "Cyrl")
    assert(Confusables.script(0x3bf) == "Grek")
    assert(Confusables.script(0x4e00) == "Hani")
    assert(Confusables.script('0') == "Zyyy")
    assert(Confusables.script(0x301) == "Zinh") // combining acute
    assert(Confusables.script(0x5d0) == "Hebr")
    assert(Confusables.script(0xe0100) == "Zinh") // variation selector, plane 14
    assert(Confusables.script(0x10ffff) == "Zzzz")
    // mixing: Common/Inherited never count
    assert(Confusables.scripts("abc123 !") == Set("Latn"))
    assert(!Confusables.isMixedScript("abc123"))
    assert(!Confusables.isMixedScript("124 - 56")) // Common only
    assert(Confusables.isMixedScript("pаypal")) // cyrillic а inside latin
    assert(!Confusables.isMixedScript("привет"))
    assert(Confusables.isMixedScript("latinχ"))
    assert(!Confusables.isMixedScript("café")) // Zinh mark on latin
  }

  test("soft hyphen and default-ignorables vanish under NFKC_CF") {
    assert(Confusables.nfkcCasefold("so­ft") == "soft")
    assert(Confusables.nfkcCasefold("a‍b") == "ab") // ZWJ
  }
}
