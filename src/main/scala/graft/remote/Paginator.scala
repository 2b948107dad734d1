package graft.remote

import org.apache.spark.sql.{DataFrame, SparkSession}

import Http._

/** S10–S14 — the reference's five REST pagination shapes, each a
  * driver-side cursor loop (cursor chains are inherently sequential —
  * SURVEY §2.1) yielding raw page bodies that become one DataFrame via
  * `spark.read.json`. The per-page fetch goes through the shared
  * [[Http.HttpClient]] stack (retry + cache).
  *
  * Scale: pagination is a metadata trickle (thousands of pages at most);
  * the heavy lifting — parse, explode, join — happens in Spark after the
  * union. For offset-partitionable APIs (S10) the page-range variant
  * fans out over executors instead.
  */
object Paginator {

  /** Generic driver-side loop: start from `init` state, fetch, extract
    * (body, nextState) until no next state.
    */
  def paginate[S](init: S)(step: S => (String, Option[S])): Seq[String] = {
    val out = Seq.newBuilder[String]
    var state: Option[S] = Some(init)
    while (state.isDefined) {
      val (body, next) = step(state.get)
      out += body
      state = next
    }
    out.result()
  }

  /** S10 — offset pagination (`skip`/`limit`, graphkb.js:341-372): stop on
    * a short page. `countOf` reports how many records a page body holds.
    */
  def offsetPages(
      client: HttpClient,
      uri: String,
      limit: Int,
      countOf: String => Int,
      params: Map[String, String] = Map.empty): Seq[String] =
    paginate(0) { skip =>
      val body = client.fetch(Request(uri,
        params = params ++ Map("skip" -> skip.toString, "limit" -> limit.toString))).body
      val n = countOf(body)
      (body, if (n < limit) None else Some(skip + limit))
    }

  /** S11 — cursor pagination (GraphQL `after`/`endCursor`/`hasNextPage`,
    * civic/evidenceItem.js:28-53). `cursorOf` returns the next cursor when
    * the page reports another.
    */
  def cursorPages(
      client: HttpClient,
      uri: String,
      cursorOf: String => Option[String]): Seq[String] = {
    val first = client.fetch(Request(uri)).body
    var out = Seq(first)
    var cursor = cursorOf(first)
    while (cursor.isDefined) {
      val body = client.fetch(Request(uri, params = Map("after" -> cursor.get))).body
      out :+= body
      cursor = cursorOf(body)
    }
    out
  }

  /** S12 — token pagination (`pageToken`/`nextPageToken`,
    * clinicaltrialsgov/index.js:301-371).
    */
  def tokenPages(
      client: HttpClient,
      uri: String,
      tokenOf: String => Option[String],
      params: Map[String, String] = Map.empty): Seq[String] = {
    val first = client.fetch(Request(uri, params = params)).body
    var out = Seq(first)
    var token = tokenOf(first)
    while (token.isDefined) {
      val body = client.fetch(Request(uri,
        params = params + ("pageToken" -> token.get))).body
      out :+= body
      token = tokenOf(body)
    }
    out
  }

  /** S13 — numbered-page links (`_meta.links.next`, dgidb/index.js:48-86):
    * each page names the next page's full request.
    */
  def linkPages(
      client: HttpClient,
      firstUri: String,
      nextLinkOf: String => Option[String]): Seq[String] =
    paginate(firstUri) { uri =>
      val body = client.fetch(Request(uri)).body
      (body, nextLinkOf(body))
    }

  /** S14 — solr offset paging (`start` vs `numFound`, asco/index.js:72-92):
    * total count known from the first response.
    */
  def solrPages(
      client: HttpClient,
      uri: String,
      pageSize: Int,
      numFoundOf: String => Int): Seq[String] = {
    val first = client.fetch(Request(uri,
      params = Map("start" -> "0", "rows" -> pageSize.toString))).body
    val total = numFoundOf(first)
    first +: (pageSize until total by pageSize).map { start =>
      client.fetch(Request(uri,
        params = Map("start" -> start.toString, "rows" -> pageSize.toString))).body
    }
  }

  /** Page bodies (JSON) → one DataFrame. */
  def toDF(spark: SparkSession, pages: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(pages.toDS())
  }
}
