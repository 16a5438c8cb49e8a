package graft.auth

import graft.model._
import graft.config.DlxConfig

/** In-memory authority index: the row-level analog of the broadcast
  * auth-headings dimension (reference Auth caches,
  * dlx/marc/__init__.py:1835-1874). Backs AuthLookup for parsers,
  * serializers and validation; the Spark path builds the same
  * dimension as a DataFrame and broadcasts it (graft.index).
  */
final class AuthIndex(auths: Seq[MarcRecord]) extends AuthLookup {

  private val byId: Map[Long, MarcRecord] =
    auths.flatMap(a => a.id.map(_ -> a)).toMap

  def all: Seq[MarcRecord] = auths

  /** Heading-field subfield value for an xref (Auth.lookup,
    * dlx/marc/__init__.py:1876-1911). */
  override def lookup(xref: Long, code: String): Option[String] =
    byId.get(xref).flatMap(_.headingField)
      .flatMap(_.getSubfield(code)).flatMap(_.value)

  /** Translated value: reads the language tag configured for the
    * heading tag (993-997) (heading_value,
    * dlx/marc/__init__.py:2061-2089). */
  override def lookup(xref: Long, code: String, language: String): Option[String] =
    byId.get(xref).flatMap { a =>
      a.headingField.flatMap { hf =>
        DlxConfig.languageSourceTag(hf.tag, language) match {
          case Some(langTag) =>
            a.getDataField(langTag).flatMap(_.getSubfield(code)).flatMap(_.value)
          case None => lookup(xref, code)
        }
      }
    }

  /** All auth ids whose source-tag field carries (code, value)
    * (Auth.xlookup, dlx/marc/__init__.py:1913-1939). */
  override def xlookup(sourceTag: String, code: String, value: String): Seq[Long] =
    auths.filter { a =>
      a.getFields(sourceTag).exists {
        case d: DataField => d.subfields.exists(s => s.code == code && s.value.contains(value))
        case _ => false
      }
    }.flatMap(_.id)

  /** Multi-subfield lookup: all (code, value) pairs must match within
    * the source-tag field (xlookup_multi,
    * dlx/marc/__init__.py:1941-1965). */
  def xlookupMulti(sourceTag: String, pairs: Seq[(String, String)]): Seq[Long] =
    auths.filter { a =>
      a.getFields(sourceTag).exists {
        case d: DataField =>
          pairs.forall { case (c, v) => d.subfields.exists(s => s.code == c && s.value.contains(v)) }
        case _ => false
      }
    }.flatMap(_.id)

  /** Exact-heading disambiguation (resolve_ambiguous,
    * dlx/marc/__init__.py:1967-1993): unique multi-match, else the
    * single auth whose full heading subfield list equals the given
    * pairs. */
  override def resolveAmbiguous(recordType: String, tag: String, pairs: Seq[(String, String)]): Option[Long] = {
    val sourceTag = pairs.headOption
      .flatMap(p => DlxConfig.authoritySourceTag(recordType, tag, p._1))
      .getOrElse(return None)
    xlookupMulti(sourceTag, pairs) match {
      case Seq(one) => Some(one)
      case Seq() => None
      case many =>
        val candidates = many.filter { xref =>
          byId.get(xref).flatMap(_.headingField).exists { hf =>
            hf.subfields.map(s => (s.code, s.value.getOrElse(""))) == pairs
          }
        }
        if (candidates.length == 1) Some(candidates.head) else None
    }
  }

  /** Case-insensitive containment typeahead, limit 25
    * (partial_lookup, dlx/marc/__init__.py:1995-2041). */
  def partialLookup(recordType: String, tag: String, code: String, string: String,
      limit: Int = 25): Seq[(String, Long)] = {
    val sourceTag = DlxConfig.authoritySourceTag(recordType, tag, code).getOrElse(return Nil)
    val needle = string.toLowerCase
    auths.iterator.flatMap { a =>
      a.getFields(sourceTag).collectFirst {
        case d: DataField if d.subfields.exists(s =>
          s.code == code && s.value.exists(_.toLowerCase.contains(needle))) =>
          (d.subfields.find(_.code == code).flatMap(_.value).getOrElse(""), a.id.getOrElse(-1L))
      }
    }.take(limit).toSeq
  }

  /** Records (bibs or auths) referencing the given auth id in any
    * auth-controlled tag (list_attached/in_use,
    * dlx/marc/__init__.py:2091-2141). */
  def listAttached(records: Seq[MarcRecord], xref: Long): Seq[MarcRecord] =
    records.filter { r =>
      val controlled = DlxConfig.authorityControlled(r.recordType)
      r.fields.exists {
        case d: DataField =>
          controlled.get(d.tag).exists { codes =>
            d.subfields.exists(s => codes.contains(s.code) && s.xref.contains(xref))
          }
        case _ => false
      }
    }

  def inUse(records: Seq[MarcRecord], xref: Long): Int = listAttached(records, xref).size
}
