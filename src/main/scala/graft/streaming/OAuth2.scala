package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** OAuth2 client-credentials token flow for the live polling source —
  * the reference's third auth mode (`oauth2creds.py:1-18`: a client
  * id/secret pair exchanged at an ORDS `oauth/token` endpoint for a
  * short-lived bearer token; `dbconnect.py` then calls the REST API
  * with that token). The RTDB legacy `?auth=` and static-Bearer modes
  * are covered by [[HttpTreeFetcher]]; this adds token ACQUISITION and
  * mid-stream REFRESH, which a long-running poll stream hits the first
  * time a token expires between micro-batches.
  *
  * All network and time dependencies are injectable, so the full
  * expiry/rotation/failure matrix is spec'd against an in-memory token
  * server (the [[TreeFetchers]] fake-registry pattern) with no live
  * endpoint.
  */
object OAuth2 {

  /** One HTTP POST: (url, headers, form body) → (status, response body).
    * The default implementation is a real java.net.http call; specs
    * inject a fake. */
  type Post = (String, Map[String, String], String) => (Int, String)

  def httpPost(connectTimeoutMs: Int = 10000,
      requestTimeoutMs: Int = 30000): Post = {
    lazy val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(connectTimeoutMs.toLong))
      .build()
    (url, headers, body) => {
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(requestTimeoutMs.toLong))
        .POST(HttpRequest.BodyPublishers.ofString(body))
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
  }

  /** Minimal token-response field extraction. The response is a
    * config-sized driver-side JSON object ({"access_token": ...,
    * "expires_in": ...}); a full JSON parser adds nothing here. */
  private[streaming] def extractString(json: String, field: String): Option[String] =
    ("\"" + field + "\"\\s*:\\s*\"([^\"]*)\"").r
      .findFirstMatchIn(json).map(_.group(1))

  private[streaming] def extractLong(json: String, field: String): Option[Long] =
    ("\"" + field + "\"\\s*:\\s*(\\d+)").r
      .findFirstMatchIn(json).map(_.group(1).toLong)
}

/** Acquires and caches a client-credentials access token.
  *
  * The token POST is `grant_type=client_credentials` with HTTP Basic
  * auth over the client id/secret (the ORDS contract the reference's
  * token_url serves). The credentials come from ENVIRONMENT VARIABLES
  * named by the caller — same discipline as [[HttpTreeFetcher]]: reader
  * options leak into plans, logs and checkpoint metadata; env vars do
  * not.
  *
  * Caching: a token is reused until `expires_in` minus a skew margin
  * (default 30 s) elapses on the injected clock, then re-acquired on
  * the next `token()` call. `invalidate()` drops the cache immediately —
  * the 401-retry path for tokens revoked server-side before their
  * advertised expiry. Thread-safe: the poll source fetches on the
  * driver, but nothing stops an embedder sharing a provider across
  * streams.
  */
final class OAuth2TokenProvider(
    tokenUrl: String,
    clientIdEnv: String,
    clientSecretEnv: String,
    expirySkewSeconds: Long = 30L,
    post: OAuth2.Post = OAuth2.httpPost(),
    env: String => Option[String] = k => sys.env.get(k),
    nowMs: () => Long = () => System.currentTimeMillis()) {

  /** (token, expiry wall-clock ms; Long.MaxValue when the server sent no
    * expires_in — such tokens are reused until invalidated). */
  @volatile private var cached: Option[(String, Long)] = None

  val requests = new java.util.concurrent.atomic.AtomicInteger(0)

  private def credential(name: String): String = env(name).getOrElse(
    throw new IllegalArgumentException(
      s"oauth2 credential environment variable '$name' is not set"))

  private def acquire(): (String, Long) = {
    requests.incrementAndGet()
    // RFC 6749 §2.3.1: client id and secret are each
    // x-www-form-urlencoded BEFORE the id:secret concat + base64 —
    // otherwise a ':' or reserved character inside either credential
    // shifts the split point and authenticates as the wrong identity
    def formEnc(v: String): String =
      java.net.URLEncoder.encode(v, StandardCharsets.UTF_8)
    val basic = Base64.getEncoder.encodeToString(
      s"${formEnc(credential(clientIdEnv))}:${formEnc(credential(clientSecretEnv))}"
        .getBytes(StandardCharsets.UTF_8))
    val (status, body) = post(tokenUrl,
      Map("Authorization" -> s"Basic $basic",
        "Content-Type" -> "application/x-www-form-urlencoded"),
      "grant_type=client_credentials")
    if (status / 100 != 2)
      throw new java.io.IOException(
        s"oauth2 token request failed: HTTP $status from $tokenUrl")
    val token = OAuth2.extractString(body, "access_token").getOrElse(
      throw new java.io.IOException(
        s"oauth2 token response from $tokenUrl has no access_token"))
    val expiry = OAuth2.extractLong(body, "expires_in") match {
      case Some(sec) => nowMs() + math.max(0L, sec - expirySkewSeconds) * 1000L
      case None => Long.MaxValue
    }
    (token, expiry)
  }

  def token(): String = synchronized {
    cached match {
      case Some((t, exp)) if nowMs() < exp => t
      case _ =>
        val fresh = acquire()
        cached = Some(fresh)
        fresh._1
    }
  }

  /** Drop the cached token (server-side revocation seen as a 401). */
  def invalidate(): Unit = synchronized { cached = None }
}

/** Bearer-auth snapshot fetcher whose token comes from an
  * [[OAuth2TokenProvider]]. On a 401/403 the cached token is
  * invalidated and the request retried ONCE with a freshly acquired
  * token — the mid-stream-expiry path; a second auth failure
  * propagates (bad credentials, not a stale token). */
final class OAuth2TreeFetcher(
    url: String,
    provider: OAuth2TokenProvider,
    get: (String, Map[String, String]) => (Int, String) =
      OAuth2TreeFetcher.httpGet()) extends TreeFetcher {

  private def attempt(): (Int, String) =
    get(url, Map("Authorization" -> s"Bearer ${provider.token()}"))

  override def fetch(): String = {
    val (status, body) = attempt() match {
      case (s, _) if s == 401 || s == 403 =>
        provider.invalidate()
        attempt()
      case ok => ok
    }
    if (status / 100 != 2)
      throw new java.io.IOException(
        s"poll fetch failed: HTTP $status from $url")
    body
  }
}

object OAuth2TreeFetcher {
  /** Default GET transport: (url, headers) → (status, body). */
  def httpGet(connectTimeoutMs: Int = 10000,
      requestTimeoutMs: Int = 30000): (String, Map[String, String]) => (Int, String) = {
    lazy val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(connectTimeoutMs.toLong))
      .build()
    (url, headers) => {
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(requestTimeoutMs.toLong))
        .GET()
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
  }
}
