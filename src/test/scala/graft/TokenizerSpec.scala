package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{PorterStemmer, Tokenizer}

/** Tokenizer parity targets (tests/test_util.py:35-44) plus Porter
  * algorithm spot checks. */
class TokenizerSpec extends AnyFunSuite {

  test("scrub golden") {
    assert(Tokenizer.scrub("!first//second third testing İcing Øscar") ==
      "first second third testing icing oscar")
  }

  test("tokenize golden (stemmed)") {
    assert(Tokenizer.tokenize("!first//second third testing İcing Øscar") ==
      Seq("first", "second", "third", "test", "ice", "oscar"))
  }

  test("split_words on punctuation blocks") {
    assert(Tokenizer.splitWords("a,b;c deß-f") == Seq("a", "b", "c", "deß", "f"))
    assert(Tokenizer.splitWords("«guillemets» and — dashes € costs") ==
      Seq("guillemets", "and", "dashes", "costs"))
  }

  test("asciify quirks: unchanged when pure ascii or unmapped") {
    assert(Tokenizer.asciify("PLAIN Ascii") == "PLAIN Ascii") // no lowercase!
    assert(Tokenizer.asciify("Ångström") == "angstrom")
  }

  test("porter: basic suffix stripping") {
    assert(PorterStemmer.stem("caresses") == "caress")
    assert(PorterStemmer.stem("ponies") == "poni")
    assert(PorterStemmer.stem("cats") == "cat")
    assert(PorterStemmer.stem("feed") == "feed")
    assert(PorterStemmer.stem("agreed") == "agre")
    assert(PorterStemmer.stem("plastered") == "plaster")
    assert(PorterStemmer.stem("bled") == "bled")
    assert(PorterStemmer.stem("motoring") == "motor")
    assert(PorterStemmer.stem("sing") == "sing")
  }

  test("porter: rewriting after ed/ing removal") {
    assert(PorterStemmer.stem("conflated") == "conflat")
    assert(PorterStemmer.stem("troubled") == "troubl")
    assert(PorterStemmer.stem("sized") == "size")
    assert(PorterStemmer.stem("hopping") == "hop")
    assert(PorterStemmer.stem("tanned") == "tan")
    assert(PorterStemmer.stem("falling") == "fall")
    assert(PorterStemmer.stem("hissing") == "hiss")
    assert(PorterStemmer.stem("fizzed") == "fizz")
    assert(PorterStemmer.stem("failing") == "fail")
    assert(PorterStemmer.stem("filing") == "file")
  }

  test("porter: y -> i (nltk variant)") {
    assert(PorterStemmer.stem("happy") == "happi")
    assert(PorterStemmer.stem("sky") == "sky") // irregular pool
    assert(PorterStemmer.stem("enjoy") == "enjoy") // y after vowel
    assert(PorterStemmer.stem("cry") == "cri")
    assert(PorterStemmer.stem("by") == "by") // len <= 2 bypass
    assert(PorterStemmer.stem("say") == "say")
  }

  test("porter: step 2-4 chains") {
    assert(PorterStemmer.stem("relational") == "relat")
    assert(PorterStemmer.stem("conditional") == "condit")
    assert(PorterStemmer.stem("rational") == "ration")
    assert(PorterStemmer.stem("valenci") == "valenc")
    assert(PorterStemmer.stem("digitizer") == "digit")
    assert(PorterStemmer.stem("operator") == "oper")
    assert(PorterStemmer.stem("feudalism") == "feudal")
    assert(PorterStemmer.stem("decisiveness") == "decis")
    assert(PorterStemmer.stem("hopefulness") == "hope")
    assert(PorterStemmer.stem("callousness") == "callous")
    assert(PorterStemmer.stem("formaliti") == "formal")
    assert(PorterStemmer.stem("sensitiviti") == "sensit")
    assert(PorterStemmer.stem("sensibiliti") == "sensibl")
    assert(PorterStemmer.stem("triplicate") == "triplic")
    assert(PorterStemmer.stem("formative") == "form")
    assert(PorterStemmer.stem("formalize") == "formal")
    assert(PorterStemmer.stem("electriciti") == "electr")
    assert(PorterStemmer.stem("electrical") == "electr")
    assert(PorterStemmer.stem("hopeful") == "hope")
    assert(PorterStemmer.stem("goodness") == "good")
    assert(PorterStemmer.stem("revival") == "reviv")
    assert(PorterStemmer.stem("allowance") == "allow")
    assert(PorterStemmer.stem("inference") == "infer")
    assert(PorterStemmer.stem("airliner") == "airlin")
    assert(PorterStemmer.stem("gyroscopic") == "gyroscop")
    assert(PorterStemmer.stem("adjustable") == "adjust")
    assert(PorterStemmer.stem("defensible") == "defens")
    assert(PorterStemmer.stem("irritant") == "irrit")
    assert(PorterStemmer.stem("replacement") == "replac")
    assert(PorterStemmer.stem("adjustment") == "adjust")
    assert(PorterStemmer.stem("dependent") == "depend")
    assert(PorterStemmer.stem("adoption") == "adopt")
    assert(PorterStemmer.stem("homologou") == "homolog")
    assert(PorterStemmer.stem("communism") == "commun")
    assert(PorterStemmer.stem("activate") == "activ")
    assert(PorterStemmer.stem("angulariti") == "angular")
    assert(PorterStemmer.stem("homologous") == "homolog")
    assert(PorterStemmer.stem("effective") == "effect")
    assert(PorterStemmer.stem("bowdlerize") == "bowdler")
  }

  test("porter: step 5") {
    assert(PorterStemmer.stem("probate") == "probat")
    assert(PorterStemmer.stem("rate") == "rate")
    assert(PorterStemmer.stem("cease") == "ceas")
    assert(PorterStemmer.stem("controll") == "control")
    assert(PorterStemmer.stem("roll") == "roll")
  }

  test("porter: irregular pool and short words") {
    assert(PorterStemmer.stem("dying") == "die")
    assert(PorterStemmer.stem("lying") == "lie")
    assert(PorterStemmer.stem("tying") == "tie")
    assert(PorterStemmer.stem("news") == "news")
    assert(PorterStemmer.stem("innings") == "inning")
    assert(PorterStemmer.stem("proceed") == "proceed")
    assert(PorterStemmer.stem("exceed") == "exceed")
    assert(PorterStemmer.stem("succeed") == "succeed")
    assert(PorterStemmer.stem("IT") == "IT") // len<=2 keeps original case
  }

  test("porter: nltk ies/ied handling for 4-letter words") {
    assert(PorterStemmer.stem("dies") == "die")
    assert(PorterStemmer.stem("ties") == "tie")
    assert(PorterStemmer.stem("died") == "die")
    assert(PorterStemmer.stem("spied") == "spi")
    assert(PorterStemmer.stem("flies") == "fli")
  }

  test("stopwords") {
    assert(Tokenizer.stopWords == Set("the", "of", "to", "at", "and", "in", "on", "by", "it", "its"))
  }
}
