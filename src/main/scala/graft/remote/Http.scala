package graft.remote

/** S18 — HTTP fetch utility with retry/backoff and a request cache
  * (reference `request`/`requestWithRetry` util.js:127-183, the GraphKB
  * client's 429/5xx policy graphkb.js:248-312, and the global
  * `REQUESTS_CACHE` keyed by stable-stringified request util.js:19).
  *
  * The transport is behind `HttpClient` so production wires a real socket
  * client while tests (and this zero-egress container) wire
  * [[FixtureClient]] — the reference does exactly this with recorded
  * request/response fixtures (test/data/ensembl_*_requests.json).
  *
  * Scale: executors share one client per partition (see
  * [[EntrezBatch]]); the cache dedupes identical requests within a task,
  * and upstream `distinct()` on request keys dedupes across the cluster
  * before any fetch happens.
  */
object Http {

  /** Canonical request: sorted params make the cache key stable regardless
    * of insertion order (the reference stable-stringifies for the same
    * reason).
    */
  case class Request(
      uri: String,
      method: String = "GET",
      params: Map[String, String] = Map.empty,
      body: Option[String] = None) {
    def cacheKey: String = {
      val p = params.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
      s"$method $uri?$p ${body.getOrElse("")}"
    }
  }

  case class Response(status: Int, body: String)

  case class HttpError(status: Int, msg: String) extends Exception(s"$status: $msg")

  trait HttpClient {
    def fetch(req: Request): Response
  }

  /** Retry policy: 429 → short wait, 5xx → long wait, bounded attempts
    * (graphkb.js:253: 3 retries, 3 s on 429, 10 s on 5xx). `sleeper` is
    * injectable so tests assert the schedule without sleeping.
    */
  class RetryingClient(
      inner: HttpClient,
      maxRetries: Int = 3,
      rateLimitWaitMs: Long = 3000,
      serverErrorWaitMs: Long = 10000,
      sleeper: Long => Unit = Thread.sleep) extends HttpClient {
    override def fetch(req: Request): Response = {
      var attempt = 0
      var last: Response = null
      while (attempt <= maxRetries) {
        last = inner.fetch(req)
        if (last.status < 400) return last
        if (last.status != 429 && last.status < 500)
          throw HttpError(last.status, last.body) // 4xx ≠ 429: no retry
        attempt += 1
        // only sleep when another attempt will actually happen
        if (attempt <= maxRetries)
          sleeper(if (last.status == 429) rateLimitWaitMs else serverErrorWaitMs)
      }
      throw HttpError(last.status, s"retries exhausted: ${last.body}")
    }
  }

  /** Request-keyed memo cache (util.js:19,161-170). Not thread-safe by
    * design — one instance per task/partition.
    */
  class CachingClient(inner: HttpClient) extends HttpClient {
    private val cache = scala.collection.mutable.Map.empty[String, Response]
    var misses: Int = 0
    override def fetch(req: Request): Response =
      cache.getOrElseUpdate(req.cacheKey, { misses += 1; inner.fetch(req) })
  }

  /** Canned-response transport for tests and offline runs. Unknown
    * requests 404; a mutable script of failures can precede success to
    * exercise the retry path.
    */
  class FixtureClient(
      fixtures: Map[String, String],
      failures: Seq[Response] = Seq.empty) extends HttpClient {
    private var pending = failures.toList
    var calls: Int = 0
    override def fetch(req: Request): Response = {
      calls += 1
      pending match {
        case f :: rest => pending = rest; f
        case Nil =>
          fixtures.get(req.cacheKey)
            .orElse(fixtures.get(req.uri))
            .map(Response(200, _))
            .getOrElse(Response(404, s"no fixture for ${req.cacheKey}"))
      }
    }
  }
}
