package graft.text

/** Porter stemmer, NLTK-extensions variant.
  *
  * The reference stems via NLTK's `PorterStemmer` in its default
  * NLTK_EXTENSIONS mode (dlx/util.py:1063-1064,1102-1104), which
  * departs from Porter's 1980 paper in documented ways: an irregular-
  * forms pool, a short-word (<=2 chars) bypass, `ies`/`ied` handling
  * for 4-letter words, a consonant-not-first-letter condition for
  * step 1c, `alli` applied before other step-2 rules with re-entry,
  * extra `fulli`/`logi` rules, and a 2-letter `vc` word counting as
  * ending CVC. This is a clean-room reimplementation of that public
  * algorithm; golden-tested against the reference's fixture outputs
  * (tests/test_util.py:35-44: testing->test, icing->ice).
  */
object PorterStemmer {

  private val vowels = Set('a', 'e', 'i', 'o', 'u')

  private val irregularForms: Map[String, String] = {
    val forms = Seq(
      "sky" -> Seq("sky", "skies"),
      "die" -> Seq("dying"),
      "lie" -> Seq("lying"),
      "tie" -> Seq("tying"),
      "news" -> Seq("news"),
      "inning" -> Seq("innings", "inning"),
      "outing" -> Seq("outings", "outing"),
      "canning" -> Seq("cannings", "canning"),
      "howe" -> Seq("howe"),
      "proceed" -> Seq("proceed"),
      "exceed" -> Seq("exceed"),
      "succeed" -> Seq("succeed"))
    forms.flatMap { case (k, vs) => vs.map(_ -> k) }.toMap
  }

  private def isConsonant(word: String, i: Int): Boolean = {
    val c = word.charAt(i)
    if (vowels.contains(c)) false
    else if (c == 'y') i == 0 || !isConsonant(word, i - 1)
    else true
  }

  /** m() — count of "vc" transitions in the consonant/vowel sequence. */
  private def measure(stem: String): Int = {
    var m = 0
    var prevVowel = false
    var i = 0
    while (i < stem.length) {
      val cons = isConsonant(stem, i)
      if (cons && prevVowel) m += 1
      prevVowel = !cons
      i += 1
    }
    m
  }

  private def hasPositiveMeasure(stem: String): Boolean = measure(stem) > 0

  private def containsVowel(stem: String): Boolean =
    (0 until stem.length).exists(i => !isConsonant(stem, i))

  private def endsDoubleConsonant(word: String): Boolean =
    word.length >= 2 &&
      word.charAt(word.length - 1) == word.charAt(word.length - 2) &&
      isConsonant(word, word.length - 1)

  /** *o — ends cvc where final c is not w/x/y; NLTK extension: a
    * 2-letter vowel-consonant word (e.g. "ic") also counts. */
  private def endsCvc(word: String): Boolean = {
    val n = word.length
    (n >= 3 && isConsonant(word, n - 3) && !isConsonant(word, n - 2) &&
      isConsonant(word, n - 1) && !"wxy".contains(word.charAt(n - 1))) ||
      (n == 2 && !isConsonant(word, 0) && isConsonant(word, 1))
  }

  private case class Rule(suffix: String, replacement: String, condition: Option[String => Boolean])

  /** First matching suffix wins; if its condition fails, the word is
    * returned unchanged (no later rules are tried) — reference
    * semantics of NLTK's _apply_rule_list. */
  private def applyRules(word: String, rules: Seq[Rule]): String = {
    for (r <- rules) {
      if (r.suffix == "*d") {
        if (endsDoubleConsonant(word)) {
          val stem = word.substring(0, word.length - 2)
          return if (r.condition.forall(_(stem))) stem + r.replacement else word
        }
      } else if (word.endsWith(r.suffix)) {
        val stem = word.substring(0, word.length - r.suffix.length)
        return if (r.condition.forall(_(stem))) stem + r.replacement else word
      }
    }
    word
  }

  private def step1a(word: String): String = {
    if (word.endsWith("ies") && word.length == 4)
      return word.substring(0, word.length - 3) + "ie"
    applyRules(word, Seq(
      Rule("sses", "ss", None),
      Rule("ies", "i", None),
      Rule("ss", "ss", None),
      Rule("s", "", None)))
  }

  private def step1b(word: String): String = {
    if (word.endsWith("ied"))
      return if (word.length == 4) word.substring(0, word.length - 3) + "ie"
      else word.substring(0, word.length - 3) + "i"
    if (word.endsWith("eed")) {
      val stem = word.substring(0, word.length - 3)
      return if (measure(stem) > 0) stem + "ee" else word
    }
    val intermediate: Option[String] = Seq("ed", "ing").collectFirst {
      case suf if word.endsWith(suf) && containsVowel(word.substring(0, word.length - suf.length)) =>
        word.substring(0, word.length - suf.length)
    }
    intermediate match {
      case None => word
      case Some(stem) =>
        applyRules(stem, Seq(
          Rule("at", "ate", None),
          Rule("bl", "ble", None),
          Rule("iz", "ize", None),
          Rule("*d", stem.substring(stem.length - 1), Some(_ => !"lsz".contains(stem.charAt(stem.length - 1)))),
          Rule("", "e", Some(s => measure(s) == 1 && endsCvc(s)))))
    }
  }

  private def step1c(word: String): String =
    applyRules(word, Seq(
      Rule("y", "i", Some(stem => stem.length > 1 && isConsonant(stem, stem.length - 1)))))

  private def step2(word: String): String = {
    if (word.endsWith("alli") && hasPositiveMeasure(word.substring(0, word.length - 4)))
      return step2(word.substring(0, word.length - 4) + "al")
    val pm = Some(hasPositiveMeasure _)
    applyRules(word, Seq(
      Rule("ational", "ate", pm),
      Rule("tional", "tion", pm),
      Rule("enci", "ence", pm),
      Rule("anci", "ance", pm),
      Rule("izer", "ize", pm),
      Rule("bli", "ble", pm),
      Rule("alli", "al", pm),
      Rule("entli", "ent", pm),
      Rule("eli", "e", pm),
      Rule("ousli", "ous", pm),
      Rule("ization", "ize", pm),
      Rule("ation", "ate", pm),
      Rule("ator", "ate", pm),
      Rule("alism", "al", pm),
      Rule("iveness", "ive", pm),
      Rule("fulness", "ful", pm),
      Rule("ousness", "ous", pm),
      Rule("aliti", "al", pm),
      Rule("iviti", "ive", pm),
      Rule("biliti", "ble", pm),
      Rule("fulli", "ful", pm),
      // the 'l' of 'logi' stays with the stem so short stems (geo,
      // theo) behave like longer ones — NLTK extension
      Rule("logi", "log", Some(_ => hasPositiveMeasure(word.substring(0, word.length - 3))))))
  }

  private def step3(word: String): String = {
    val pm = Some(hasPositiveMeasure _)
    applyRules(word, Seq(
      Rule("icate", "ic", pm),
      Rule("ative", "", pm),
      Rule("alize", "al", pm),
      Rule("iciti", "ic", pm),
      Rule("ical", "ic", pm),
      Rule("ful", "", pm),
      Rule("ness", "", pm)))
  }

  private def step4(word: String): String = {
    val m1 = Some((s: String) => measure(s) > 1)
    applyRules(word, Seq(
      Rule("al", "", m1),
      Rule("ance", "", m1),
      Rule("ence", "", m1),
      Rule("er", "", m1),
      Rule("ic", "", m1),
      Rule("able", "", m1),
      Rule("ible", "", m1),
      Rule("ant", "", m1),
      Rule("ement", "", m1),
      Rule("ment", "", m1),
      Rule("ent", "", m1),
      Rule("ion", "", Some(s => measure(s) > 1 && s.nonEmpty && "st".contains(s.charAt(s.length - 1)))),
      Rule("ou", "", m1),
      Rule("ism", "", m1),
      Rule("ate", "", m1),
      Rule("iti", "", m1),
      Rule("ous", "", m1),
      Rule("ive", "", m1),
      Rule("ize", "", m1)))
  }

  private def step5a(word: String): String = {
    if (word.endsWith("e")) {
      val stem = word.substring(0, word.length - 1)
      if (measure(stem) > 1) return stem
      if (measure(stem) == 1 && !endsCvc(stem)) return stem
    }
    word
  }

  private def step5b(word: String): String =
    applyRules(word, Seq(
      Rule("ll", "l", Some(_ => measure(word.substring(0, word.length - 1)) > 1))))

  /** Stem one word. Mirrors NLTK `stem(word, to_lowercase=True)`:
    * the pool is checked against the original-case word, and words of
    * length <= 2 are returned in their original case. */
  def stem(word: String): String = {
    val lowered = word.toLowerCase(java.util.Locale.ROOT)
    if (irregularForms.contains(word)) return irregularForms(lowered)
    if (word.length <= 2) return word
    var s = lowered
    s = step1a(s)
    s = step1b(s)
    s = step1c(s)
    s = step2(s)
    s = step3(s)
    s = step4(s)
    s = step5a(s)
    s = step5b(s)
    s
  }
}
