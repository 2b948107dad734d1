package graft.remote

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import Http._

class HttpSpec extends AnyFunSuite {

  test("S18 retry: 429 then 5xx then success, with the two wait tiers") {
    val waits = scala.collection.mutable.ArrayBuffer.empty[Long]
    val inner = new FixtureClient(Map("u" -> "ok"),
      failures = Seq(Response(429, "slow down"), Response(503, "oops")))
    val client = new RetryingClient(inner, maxRetries = 3,
      rateLimitWaitMs = 3000, serverErrorWaitMs = 10000, sleeper = waits += _)
    assert(client.fetch(Request("u")).body == "ok")
    assert(waits.toSeq == Seq(3000L, 10000L))
    assert(inner.calls == 3)
  }

  test("S18 retry: non-429 4xx fails fast; exhaustion throws") {
    val inner = new FixtureClient(Map.empty, failures = Seq(Response(404, "nope")))
    val client = new RetryingClient(inner, sleeper = _ => ())
    assertThrows[HttpError](client.fetch(Request("u")))
    val always429 = new HttpClient {
      override def fetch(req: Request): Response = Response(429, "never")
    }
    assertThrows[HttpError](new RetryingClient(always429, maxRetries = 2,
      sleeper = _ => ()).fetch(Request("u")))
  }

  test("S18 cache: identical requests hit once; param order irrelevant") {
    val inner = new FixtureClient(Map("GET u?a=1&b=2 " -> "ok"))
    val client = new CachingClient(inner)
    assert(client.fetch(Request("u", params = Map("a" -> "1", "b" -> "2"))).body == "ok")
    assert(client.fetch(Request("u", params = Map("b" -> "2", "a" -> "1"))).body == "ok")
    assert(client.misses == 1 && inner.calls == 1)
  }
}

class PaginatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def countOf(body: String): Int =
    "\"id\":".r.findAllIn(body).length

  test("S10 offset pages stop on short page") {
    val pages = Map(
      """GET api?limit=2&skip=0 """ -> """{"result":[{"id":1},{"id":2}]}""",
      """GET api?limit=2&skip=2 """ -> """{"result":[{"id":3}]}""")
    val client = new FixtureClient(pages)
    val bodies = Paginator.offsetPages(client, "api", limit = 2, countOf)
    assert(bodies.length == 2)
    assert(client.calls == 2)
    val df = Paginator.toDF(spark, bodies)
    import org.apache.spark.sql.functions._
    assert(df.select(explode(col("result.id"))).count() == 3)
  }

  test("S11 cursor pages follow endCursor until hasNextPage false") {
    def cursorOf(b: String): Option[String] =
      if (b.contains("\"hasNextPage\":true"))
        Some("\"endCursor\":\"([^\"]+)\"".r.findFirstMatchIn(b).get.group(1))
      else None
    val pages = Map(
      "api" -> """{"nodes":[{"id":1}],"endCursor":"c1","hasNextPage":true}""",
      "GET api?after=c1 " -> """{"nodes":[{"id":2}],"endCursor":"c2","hasNextPage":false}""")
    val client = new FixtureClient(pages)
    assert(Paginator.cursorPages(client, "api", cursorOf).length == 2)
  }

  test("S12 token pages follow nextPageToken") {
    def tokenOf(b: String): Option[String] =
      "\"nextPageToken\":\"([^\"]+)\"".r.findFirstMatchIn(b).map(_.group(1))
    val pages = Map(
      "api" -> """{"studies":[{"id":1}],"nextPageToken":"t1"}""",
      "GET api?pageToken=t1 " -> """{"studies":[{"id":2}]}""")
    assert(Paginator.tokenPages(new FixtureClient(pages), "api", tokenOf).length == 2)
  }

  test("S13 link pages follow _meta.links.next") {
    def nextOf(b: String): Option[String] =
      "\"next\":\"([^\"]+)\"".r.findFirstMatchIn(b).map(_.group(1))
    val pages = Map(
      "p1" -> """{"items":[1],"_meta":{"links":{"next":"p2"}}}""",
      "p2" -> """{"items":[2],"_meta":{"links":{}}}""")
    assert(Paginator.linkPages(new FixtureClient(pages), "p1", nextOf) ==
      Seq("""{"items":[1],"_meta":{"links":{"next":"p2"}}}""",
        """{"items":[2],"_meta":{"links":{}}}"""))
  }

  test("S14 solr pages derive page count from numFound") {
    def numFound(b: String): Int =
      "\"numFound\":(\\d+)".r.findFirstMatchIn(b).get.group(1).toInt
    val pages = Map(
      "GET api?rows=2&start=0 " -> """{"numFound":5,"docs":[1,2]}""",
      "GET api?rows=2&start=2 " -> """{"numFound":5,"docs":[3,4]}""",
      "GET api?rows=2&start=4 " -> """{"numFound":5,"docs":[5]}""")
    val client = new FixtureClient(pages)
    assert(Paginator.solrPages(client, "api", 2, numFound).length == 3)
    assert(client.calls == 3)
  }
}

class EntrezBatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("S15 batched fetch: one fetcher call per <=batchSize ids, all ids served") {
    val ids = spark.createDataset((1 to 350).map(_.toString))
    // deterministic "remote": payload derives from the id; batch sizes are
    // recorded via the payload suffix
    val out = EntrezBatch.fetchByIds(ids,
      batch => batch.map(id => (id, s"rec-$id/b${batch.size}")),
      batchSize = 150, parallelism = 2).collect()
    assert(out.length == 350)
    assert(out.forall(r => r.getString(1).startsWith(s"rec-${r.getString(0)}/")))
    // no batch exceeded the cap
    assert(out.forall(_.getString(1).split("/b")(1).toInt <= 150))
  }

  test("S15+J9 hydrate: misses fetched and unioned, dim rows untouched") {
    val dim = Seq(("1", "cached-1"), ("2", "cached-2")).toDF("id", "payload")
    val lookups = spark.createDataset(Seq("1", "3", "4"))
    val out = EntrezBatch.hydrate(dim, "id", "payload", lookups,
      batch => batch.map(id => (id, s"fetched-$id")))
    val rows = out.collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rows == Set(("1", "cached-1", false), ("2", "cached-2", false),
      ("3", "fetched-3", true), ("4", "fetched-4", true)))
  }
}

class ScrapeSpec extends AnyFunSuite {
  val html =
    """<html><head><script>var x = "<a href='junk'>";</script></head>
      |<body><h1>FDA approves drug X</h1>
      |<a href="/news/2021/drug-x">announcement</a>
      |<a href="/about">about</a>
      |<p>Approved in 2021. First filed 2019, revised 2021.</p>
      |</body></html>""".stripMargin

  test("S17 link harvest with filter") {
    assert(Scrape.links(html) == Seq("/news/2021/drug-x", "/about"))
    assert(Scrape.links(html, containing = "news") == Seq("/news/2021/drug-x"))
  }

  test("S17 text extraction strips tags and scripts") {
    val t = Scrape.text(html)
    assert(t.contains("FDA approves drug X"))
    assert(!t.contains("var x"))
    assert(!t.contains("<"))
  }

  test("S17 consensus year") {
    assert(Scrape.consensusYear(html).contains(2021))
    assert(Scrape.consensusYear("<p>no dates</p>").isEmpty)
  }
}
