package graft.text

import java.util.Locale
import scala.util.matching.Regex

/** Word splitting / transliteration / stemming chain.
  *
  * Semantics mirror the reference Tokenizer (dlx/util.py:1061-1118):
  *  - words are maximal runs of characters outside four punctuation
  *    blocks (ASCII punct, Latin-1 supplement punct, general
  *    punctuation, currency symbols);
  *  - `asciify` returns the string unchanged when it is pure ASCII or
  *    when no mapped key occurs in it (including the no-lowercase
  *    quirk), else applies multi-char replacements in map order, then
  *    the single-char table, then lowercases;
  *  - `scrub` = split/rejoin, uppercase, asciify, lowercase, strip;
  *  - `tokenize` = asciify, split, Porter-stem each word.
  */
object Tokenizer {

  private val punctClasses =
    "\\u0020-\\u002f\\u003a-\\u0040\\u005b-\\u0060\\u007b-\\u007e" + // ASCII
      "\\u00a0-\\u00bf" + // Latin-1 Supplement
      "\\u2000-\\u206f" + // General Punctuation
      "\\u20a0-\\u20cf" // Currency Symbols

  private val wordRe: Regex = s"[^$punctClasses]+".r

  def splitWords(s: String): Seq[String] = wordRe.findAllIn(s).toSeq

  def asciify(s: String): String = {
    if (s.forall(_ < 128)) return s
    // fast char-level prefilter, then the reference's exact
    // key-substring containment check
    if (!s.exists(AsciiMap.keyChars.contains) ||
        !AsciiMap.data.exists { case (k, _) => s.contains(k) }) return s
    var out = s
    AsciiMap.multiByte.foreach { case (k, v) =>
      if (out.contains(k)) out = out.replace(k, v)
    }
    val sb = new StringBuilder(out.length)
    out.foreach { c =>
      AsciiMap.singleByte.get(c) match {
        case Some(rep) => sb.append(rep)
        case None => sb.append(c)
      }
    }
    sb.result().toLowerCase(Locale.ROOT)
  }

  def stem(s: String): String = PorterStemmer.stem(s)

  /** Lowercase + de-punctuate: single-space joined words. */
  def scrub(s: String): String =
    asciify(splitWords(s).mkString(" ").toUpperCase(Locale.ROOT))
      .toLowerCase(Locale.ROOT).trim

  /** Asciified, stemmed word array. */
  def tokenize(s: String): Seq[String] =
    splitWords(asciify(s)).map(stem)

  /** Free-text stopwords excluded by whole-record text search
    * (dlx/marc/query.py:718-720). */
  val stopWords: Set[String] = Set("the", "of", "to", "at", "and", "in", "on", "by", "it", "its")
}
