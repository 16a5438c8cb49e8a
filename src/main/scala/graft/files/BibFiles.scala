package graft.files

import graft.model.{AuthLookup, MarcRecord}

/** Bib ↔ files linkage (reference Bib.files,
  * dlx/marc/__init__.py:1815-1830): a bib's document symbol (191$a)
  * joins the file store by symbol identifier + language, newest
  * first. At set scale this is the window join in
  * [[FileStore.latestPerIdentifierLanguage]]. */
object BibFiles {

  /** All files attached to a bib through its 191$a symbols. */
  def files(bib: MarcRecord, store: FileStore, language: Option[String] = None)
      (implicit auth: AuthLookup): Seq[FileRecord] =
    bib.getValues("191", "a").flatMap { symbol =>
      store.findByIdentifier(Identifier("symbol", symbol), language)
    }

  /** Latest file for the bib's first symbol in a language. */
  def file(bib: MarcRecord, store: FileStore, language: String)
      (implicit auth: AuthLookup): Option[FileRecord] = {
    val symbol = bib.getValue("191", "a")
    if (symbol.isEmpty) None
    else store.latestByIdentifierLanguage(Identifier("symbol", symbol), language)
  }
}
