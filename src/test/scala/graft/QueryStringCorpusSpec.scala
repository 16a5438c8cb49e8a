package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.query._
import graft.spark.{MarcSchema, SparkQueryCompiler}
import Fixtures._

/** Table-driven port of the reference's own query-string quirk corpus
  * (tests/test_marc.py:348-525): every query string the reference
  * asserts on, with its expected match-id set on the canonical
  * fixtures, run differentially through all three engines — the row
  * engine (semantic spec), the Spark compiler's in-list path, and its
  * semi-join default path. The reference test mutates its database as
  * it goes (commits auth 110/100 records, a 246 bib, deletes all bibs
  * for the NOT block); those moments are modeled as named fixture
  * stages below so each string is evaluated against the same record
  * population the reference evaluated it against. */
class QueryStringCorpusSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  // --- fixture stages -----------------------------------------------------

  /** auth committed at test_marc.py:371: 110 $a string $b part */
  private val auth3 = MarcRecord(recordType = "auth", id = Some(3L),
    fields = Vector(DataField("110", " ", " ",
      Vector(Subfield("a", Some("string")), Subfield("b", Some("part"))))))

  /** auth committed at test_marc.py:461: 100 $a x */
  private val auth4 = MarcRecord(recordType = "auth", id = Some(4L),
    fields = Vector(DataField("100", " ", " ", Vector(Subfield("a", Some("x"))))))

  /** bib committed at test_marc.py:462: 700 $a -> auth4 */
  private val bib3 = MarcRecord(recordType = "bib", id = Some(3L),
    fields = Vector(DataField("700", " ", " ", Vector(Subfield("a", None, Some(4L))))))

  /** bib committed at test_marc.py:487: 246 $a This title: $b is a title */
  private val bibTitled = MarcRecord(recordType = "bib", id = Some(4L),
    fields = Vector(DataField("246", " ", " ", Vector(
      Subfield("a", Some("This title:")), Subfield("b", Some("is a title"))))))

  /** the NOT block (test_marc.py:500-517) deletes all bibs then builds
    * one bib with 246 New title + 246 Edited alt title, 500 notes,
    * 520 $z Some words in a field (fields accrete across the block —
    * the final shape satisfies every assertion in it). */
  private val bibNot = MarcRecord(recordType = "bib", id = Some(5L),
    fields = Vector(
      DataField("246", " ", " ", Vector(Subfield("a", Some("New title")))),
      DataField("246", " ", " ", Vector(Subfield("a", Some("Edited alt title")))),
      DataField("500", " ", " ", Vector(Subfield("a", Some("notes")))),
      DataField("520", " ", " ", Vector(Subfield("z", Some("Some words in a field"))))))

  private val ts = java.time.Instant.parse("2026-08-14T10:00:00Z")
  private def stamped(r: MarcRecord) = r.copy(updated = Some(ts))

  private case class Stage(name: String, bibs: Seq[MarcRecord], auths: Seq[MarcRecord]) {
    lazy val rowEngine = new RowQueryEngine(bibs, auths)
    lazy val compiler = new SparkQueryCompiler(spark,
      MarcSchema.toDataset(spark, bibs).toDF(), MarcSchema.toDataset(spark, auths).toDF())
  }

  private val base = Stage("base", Seq(bib1, bib2), Seq(auth1, auth2))
  private val withAuth3 = Stage("withAuth3", Seq(bib1, bib2), Seq(auth1, auth2, auth3))
  private val withXref = Stage("withXref", Seq(bib1, bib2, bib3), Seq(auth1, auth2, auth3, auth4))
  private val datesStage = Stage("dates",
    Seq(stamped(bib1), stamped(bib2), stamped(bib3)), Seq(auth1, auth2, auth3, auth4))
  private val logicalStage = Stage("logical",
    Seq(bib1, bib2, bibTitled), Seq(auth1, auth2, auth3, auth4))
  private val notStage = Stage("not", Seq(bibNot), Seq(auth1, auth2, auth3, auth4))

  // --- the corpus ---------------------------------------------------------

  /** (test_marc.py line, stage, record type, query string, expected ids) */
  private val corpus: Seq[(Int, Stage, String, String, Set[Long])] = Seq(
    // exact subfield / AND / OR (test_marc.py:353-361)
    (353, base, "bib", "245__c:'title'", Set(1L, 2L)),
    (356, base, "bib", "245__a:'This' AND 650__a:'Header'", Set(1L)),
    (359, base, "bib", "245__a:'This' OR 245__a:'Another'", Set(1L, 2L)),
    // regex on plain fields, auth record type (test_marc.py:371-378)
    (372, withAuth3, "auth", "110__a:/string$/", Set(3L)),
    (376, withAuth3, "auth", "110__b:/^part/", Set(3L)),
    // regex over auth-controlled values (test_marc.py:381-385)
    (381, base, "bib", "650__a:/[Hh]eader/", Set(1L, 2L)),
    (384, base, "bib", "650__a:/header/i", Set(1L, 2L)),
    // double-quoted phrase: subfield / field / logical (test_marc.py:388-399)
    (388, base, "bib", "520__a:\"another description\"", Set(1L)),
    (390, base, "bib", "520__a:\"another descrip\"", Set.empty[Long]), // whole words only
    (393, base, "bib", "520:\"another description\"", Set(1L)),
    (395, base, "bib", "520:\"another descrip\"", Set.empty[Long]),
    (398, base, "bib", "title:\"is the\"", Set(1L, 2L)),
    (400, base, "bib", "title:\"is t\"", Set.empty[Long]),
    // whole-record free text (test_marc.py:408-412)
    (408, base, "bib", "header", Set(1L, 2L)),
    (410, base, "bib", "Another header", Set(1L, 2L)),
    // hyphenated quoted phrase: words AND adjacency (test_marc.py:415-417)
    (415, base, "bib", "\"Another-header\"", Set(1L)),
    // hyphenated free word: words only, no adjacency (test_marc.py:420-421)
    (420, base, "bib", "Another-header", Set(1L, 2L)),
    // negation: both fixtures contain 'header' via 650 (test_marc.py:424-425)
    (424, base, "bib", "Another -header", Set.empty[Long]),
    // starred truncation (test_marc.py:428-431)
    (428, base, "bib", "anoth*", Set(1L, 2L)),
    (430, base, "bib", "anoth* h*der", Set(1L, 2L)),
    // tag with no subfield (test_marc.py:434-444)
    (434, base, "bib", "245:'is the'", Set(1L, 2L)),
    (438, base, "bib", "650:'Header'", Set(1L, 2L)),
    (442, base, "bib", "650:/eader/", Set(1L, 2L)),
    // id (test_marc.py:447-448)
    (447, base, "bib", "id:1", Set(1L)),
    // updated (test_marc.py:452-456; stamped copies stand in for the
    // reference's "3 records have been updated in this test")
    (453, datesStage, "bib", "updated>1900-01-01", Set(1L, 2L, 3L)),
    (456, datesStage, "bib", "updated:2026-08-14", Set(1L, 2L, 3L)),
    // xref (test_marc.py:460-464)
    (463, withXref, "bib", "xref:4", Set(3L)),
    // wildcard strings (test_marc.py:467-477)
    (467, base, "bib", "245__c:*itl*", Set(1L, 2L)),
    (470, base, "bib", "245:titl*", Set(1L, 2L)),
    (473, base, "bib", "650:head*", Set(1L, 2L)),
    (476, base, "bib", "650__a:head*", Set(1L, 2L)),
    // logical fields (test_marc.py:487-496)
    (488, logicalStage, "bib", "title:'This title: is a title'", Set(4L)),
    (492, logicalStage, "bib", "title:*is*", Set(1L, 2L, 4L)),
    (495, logicalStage, "bib", "title:this*", Set(1L, 4L)),
    // NOT block after all-bibs delete (test_marc.py:500-517)
    (505, notStage, "bib", "NOT 246:'New title'", Set.empty[Long]),
    (510, notStage, "bib", "NOT 246:New title", Set.empty[Long]),
    (513, notStage, "bib", "NOT xref:1", Set(5L)),
    // multi field + free text, order-independent (test_marc.py:516-522)
    (517, notStage, "bib", "246:'New title' AND 500:'notes' AND some words in a field", Set(5L)),
    (521, notStage, "bib", "246:'New title' AND some words in a field AND 500:'notes'", Set(5L)))

  test("test_marc.py query-string corpus: row engine == in-list plan == semi-join plan == reference") {
    val failures = scala.collection.mutable.Buffer.empty[String]
    corpus.foreach { case (line, stage, rt, q, expected) =>
      val row = stage.rowEngine.runString(q, rt).flatMap(_.id).toSet
      if (row != expected)
        failures += s"test_marc.py:$line [${stage.name}] <$q> row engine=$row expected=$expected"
      val ast = QueryParser.parse(q, rt)
      val inList = stage.compiler.runInList(ast).select("_id").collect().map(_.getLong(0)).toSet
      if (inList != expected)
        failures += s"test_marc.py:$line [${stage.name}] <$q> in-list=$inList expected=$expected"
      val semi = stage.compiler.runSemiJoin(ast).select("_id").collect().map(_.getLong(0)).toSet
      if (semi != expected)
        failures += s"test_marc.py:$line [${stage.name}] <$q> semi-join=$semi expected=$expected"
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }

  // --- compiled-document assertions (the reference asserts the Mongo
  // query document itself; our analog is the parsed AST shape) -----------

  import Cond._
  import graft.text.Tokenizer

  private def freeTextOf(q: String): TextQuery =
    QueryParser.parse(q).conditions match {
      case Seq(FreeText(tq)) => tq
      case other => fail(s"<$q> did not parse to a single FreeText: $other")
    }

  test("compile shape: 'Another header' -> words $all [anoth, header] (test_marc.py:411-412)") {
    val tq = freeTextOf("Another header")
    assert(Tokenizer.tokenize(tq.terms).map(Tokenizer.stem).toSet == Set("anoth", "header"))
    assert(tq.phrases.isEmpty && tq.negated.isEmpty && tq.starred.isEmpty)
  }

  test("compile shape: quoted \"Another-header\" -> words $all + adjacency regex (test_marc.py:415-417)") {
    val tq = freeTextOf("\"Another-header\"")
    // words: $all ['anoth', 'header']
    assert(Tokenizer.tokenize("Another-header").map(Tokenizer.stem).toSet == Set("anoth", "header"))
    // text: Regex('\sanother header\s') — the scrubbed phrase carried for adjacency
    assert(tq.phrases.map(Tokenizer.scrub) == Seq("another header"))
  }

  test("compile shape: 'Another -header' -> $all [anoth] + $nin [header] (test_marc.py:424-425)") {
    val tq = freeTextOf("Another -header")
    assert(Tokenizer.tokenize(tq.terms).map(Tokenizer.stem) == Seq("anoth"))
    assert(tq.negated.map(n => Tokenizer.stem(Tokenizer.scrub(n).trim)) == Seq("header"))
  }

  test("compile shape: starred terms become anchored truncation regexes (test_marc.py:428-431)") {
    // 'anoth*' -> text Regex(' anoth.*'); two starred terms AND together
    assert(freeTextOf("anoth*").starred == Seq("anoth*"))
    assert(freeTextOf("anoth* h*der").starred == Seq("anoth*", "h*der"))
  }

  test("compile shape: only-negation free text is invalid (dlx/marc/query.py)") {
    intercept[InvalidQueryString] { QueryParser.parse("-header") }
  }

  // --- invalid query strings (test_marc.py:524-531) ----------------------

  test("invalid query strings raise InvalidQueryString (test_marc.py:524-531)") {
    val invalid = Seq(
      "invalid_field:value",
      "245:title NOT 500:notes",
      "245:title \"unclosed double quote",
      "245:'title unclosed ' exact match",
      "245:/title uncl/osed regex")
    invalid.foreach { q =>
      intercept[InvalidQueryString] { QueryParser.parse(q) }
    }
  }
}
