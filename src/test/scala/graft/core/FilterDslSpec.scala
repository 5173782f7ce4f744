package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Filter DSL grammar + atom semantics (reference `FiltersTest.java:94-205`,
  * grammar `FilterParser.jj:58-180`). */
class FilterDslSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def urls = {
    import spark.implicits._
    Seq(
      "http://a.example.com/x/y.html",
      "https://b.example.org/img/pic.jpg",
      "ftp://c.example.com/file",
      "http://www.example.com/a/b/a/b/a/b/z",
      "http://short.io/"
    ).toDF("url")
  }

  private def keep(dsl: String): Seq[String] = {
    import spark.implicits._
    urls.where(FilterDsl.compile(dsl, FilterDsl.urlContext(col("url"))))
      .select("url").as[String].collect().toSeq
  }

  test("scheme and boolean composition, all operator spellings") {
    val expected = Seq("http://a.example.com/x/y.html", "https://b.example.org/img/pic.jpg",
      "http://www.example.com/a/b/a/b/a/b/z", "http://short.io/")
    assert(keep("SchemeEquals(http) or SchemeEquals(https)") == expected)
    assert(keep("SchemeEquals(http) || SchemeEquals(https)") == expected)
    assert(keep("SchemeEquals(http) ∨ SchemeEquals(https)") == expected)
    assert(keep("not SchemeEquals(ftp)") == expected)
    assert(keep("! SchemeEquals(ftp)") == expected)
    assert(keep("~ SchemeEquals(ftp)") == expected)
  }

  test("host predicates") {
    assert(keep("HostEquals(short.io)") == Seq("http://short.io/"))
    assert(keep("HostEndsWith(.example.com)").size == 3) // a., c. (ftp), www.
    assert(keep("HostEndsWithOneOf(.example.com,.example.org)").size == 4)
  }

  test("path / url predicates") {
    assert(keep("PathEndsWithOneOf(.jpg,.png)") == Seq("https://b.example.org/img/pic.jpg"))
    assert(keep("URLShorterThan(17)") == Seq("http://short.io/"))
    assert(keep("URLMatchesRegex(http://[as].*)") ==
      Seq("http://a.example.com/x/y.html", "http://short.io/"))
    assert(keep("DuplicateSegmentsLessThan(3)").size == 4) // a/b x3 rejected
  }

  test("constants, parens, precedence (and binds tighter than or)") {
    assert(keep("true").size == 5)
    assert(keep("false").isEmpty)
    // or of and-chains: (ftp and true) or HostEquals(short.io)
    assert(keep("SchemeEquals(ftp) and true or HostEquals(short.io)").toSet ==
      Set("ftp://c.example.com/file", "http://short.io/"))
    assert(keep("SchemeEquals(ftp) and ( true or HostEquals(short.io) )") ==
      Seq("ftp://c.example.com/file"))
  }

  test("parse errors are loud") {
    intercept[IllegalArgumentException](FilterDsl.compile("Bogus(x)", FilterDsl.urlContext(col("url"))))
    intercept[IllegalArgumentException](FilterDsl.compile("SchemeEquals(http", FilterDsl.urlContext(col("url"))))
    intercept[IllegalArgumentException](FilterDsl.compile("and and", FilterDsl.urlContext(col("url"))))
  }

  test("status/content-type atoms read the right columns") {
    import spark.implicits._
    val rows = Seq((200, "text/html"), (404, "text/plain"), (302, "image/png"))
      .toDF("status", "contentType")
    val ctx = FilterDsl.FilterContext(
      status = Some(col("status")), contentType = Some(col("contentType")))
    assert(rows.where(FilterDsl.compile("StatusCategory(2)", ctx)).count() == 1)
    assert(rows.where(FilterDsl.compile("ContentTypeStartsWith(text/)", ctx)).count() == 2)
    assert(rows.where(FilterDsl.compile("StatusCategory(3) and ContentTypeStartsWith(image/)", ctx)).count() == 1)
    // missing column -> loud error
    intercept[IllegalArgumentException](
      rows.where(FilterDsl.compile("HostEquals(x)", ctx)).count())
  }
}
