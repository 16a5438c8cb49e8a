package graft.text

/** Marker-word / script-range language identification heuristic.
  *
  * Scores each candidate language by the count of its marker words in
  * the whitespace-lowered token stream; CJK characters short-circuit
  * to zh. Ties resolve in fixed preference order (en, es, de, fr) and
  * an all-zero score is "und". Deterministic by construction so an
  * external SQL oracle can replay it exactly.
  */
object LanguageId {

  val markers: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "in", "is", "a", "that", "for", "it", "with", "as"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "por"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "zu", "den"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "des", "du", "dans", "pour", "que", "sur"))

  private val cjk = "[一-鿿]".r

  def tokens(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq.filter(_.nonEmpty)

  def scores(text: String): Map[String, Int] = {
    val ts = tokens(text)
    markers.map { case (lang, set) => lang -> ts.count(set.contains) }.toMap
  }

  def detect(text: String): String = {
    if (cjk.findFirstIn(text).isDefined) return "zh"
    val s = scores(text)
    if (s.values.forall(_ == 0)) "und"
    else if (s("en") >= s("es") && s("en") >= s("de") && s("en") >= s("fr")) "en"
    else if (s("es") >= s("de") && s("es") >= s("fr")) "es"
    else if (s("de") >= s("fr")) "de"
    else "fr"
  }
}
