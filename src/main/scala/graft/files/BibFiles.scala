package graft.files

import graft.model.{AuthLookup, MarcRecord}

/** Bib ↔ files linkage (reference Bib.files,
  * dlx/marc/__init__.py:1815-1830): a bib's document symbol (191$a)
  * joins the file store by symbol identifier + language, newest
  * first. At set scale this is the window join in
  * [[FileStore.latestPerIdentifierLanguage]]. */
object BibFiles {

  /** All files attached to a bib through its 191$a symbols.
    *
    * Inherits [[FileStore.findByIdentifier]]'s row-API bound (default
    * 10,000 matches per symbol — it RAISES past the bound rather than
    * truncating). A single document symbol carrying >10k stored files
    * is implausible in the reference's data model (a handful of
    * language variants × revisions), so no limit parameter is threaded
    * here; a caller that genuinely expects more should use the
    * DataFrame twin [[FileStore.findByIdentifierDf]] directly. */
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
