package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.collection.concurrent.TrieMap

/** Transport abstraction for the live polling source (reference S1: the
  * Firebase RTDB subtree fetch, STG_Firebase2Oracle.py:45-46 — a full
  * GET of `MCU_Data/<device>/HIST_DHT11_DATA` returning the nested
  * `{date: {time: record}}` JSON).
  *
  * The poll source calls `fetch()` once per micro-batch on the DRIVER —
  * deliberately so: the reference's contract is a full-snapshot pull of a
  * bounded per-device subtree (the store offers no server-side delta
  * predicate), and the delta filter runs client-side. The snapshot must
  * fit driver memory by the same argument it fits the reference's Python
  * process; the 100 TB path is the file/tree batch ingest, not this.
  */
trait TreeFetcher {
  /** Return the raw JSON text of the whole subtree snapshot. */
  def fetch(): String
}

/** HTTPS fetcher for Firebase-RTDB-style REST endpoints.
  *
  * `GET <url>.json` with optional auth, either the RTDB legacy
  * `?auth=<token>` query param or an `Authorization: Bearer` header.
  * The token is read from an ENVIRONMENT VARIABLE named by the caller —
  * never from DataFrame reader options, which leak into plans, logs and
  * checkpoint metadata.
  */
final class HttpTreeFetcher(
    url: String,
    authTokenEnv: Option[String] = None,
    authMode: String = "param",
    connectTimeoutMs: Int = 10000,
    requestTimeoutMs: Int = 30000,
    env: String => Option[String] = k => sys.env.get(k)) extends TreeFetcher {

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMs.toLong))
    .build()

  private def token: Option[String] = authTokenEnv.flatMap(env)

  /** Effective request URI (token appended for `param` mode). Factored
    * out so request construction is unit-testable without a network. */
  private[streaming] def requestUri: URI = token match {
    case Some(t) if authMode == "param" =>
      val sep = if (url.contains("?")) "&" else "?"
      URI.create(s"$url${sep}auth=$t")
    case _ => URI.create(url)
  }

  private[streaming] def buildRequest: HttpRequest = {
    val b = HttpRequest.newBuilder(requestUri)
      .timeout(Duration.ofMillis(requestTimeoutMs.toLong))
      .GET()
    token match {
      case Some(t) if authMode == "bearer" => b.header("Authorization", s"Bearer $t")
      case _ =>
    }
    b.build()
  }

  override def fetch(): String = {
    val resp = client.send(buildRequest, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"poll fetch failed: HTTP ${resp.statusCode()} from $url")
    resp.body()
  }
}

/** Mutable in-memory snapshot transport — the no-network stand-in for an
  * RTDB endpoint, used by the oracle query and specs (and available to
  * embedders for deterministic replays). Counts fetches so rate-limit
  * behavior is observable. */
final class ScriptedSnapshot(@volatile var snapshot: String) extends TreeFetcher {
  val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
  override def fetch(): String = { fetches.incrementAndGet(); snapshot }
}

/** Registry of named fetchers. DataSourceV2 reader options are plain
  * strings, so tests (and embedders) inject transports by registering an
  * instance under a name and passing `option("transport", name)`; the
  * default name `http` is special-cased and built from the `url` /
  * `authTokenEnv` / `authMode` options instead.
  */
object TreeFetchers {
  private val registry = TrieMap.empty[String, TreeFetcher]

  def register(name: String, fetcher: TreeFetcher): Unit = registry.put(name, fetcher)
  def unregister(name: String): Unit = registry.remove(name)

  def resolve(name: String, options: Map[String, String]): TreeFetcher =
    if (name == "http") {
      val url = options.getOrElse("url",
        throw new IllegalArgumentException("graft-poll with transport=http requires option 'url'"))
      val authMode = options.getOrElse("authmode", "param")
      if (authMode == "oauth2") {
        // client-credentials flow (reference oauth2creds.py): id/secret
        // env-var names + token endpoint; token acquisition, expiry
        // refresh and 401-retry live in the fetcher/provider pair
        def req(k: String) = options.getOrElse(k,
          throw new IllegalArgumentException(
            s"graft-poll with authmode=oauth2 requires option '$k'"))
        new OAuth2TreeFetcher(url, new OAuth2TokenProvider(
          tokenUrl = req("tokenurl"),
          clientIdEnv = req("clientidenv"),
          clientSecretEnv = req("clientsecretenv"),
          post = OAuth2.httpPost(
            options.getOrElse("connecttimeoutms", "10000").toInt,
            options.getOrElse("requesttimeoutms", "30000").toInt)),
          get = OAuth2TreeFetcher.httpGet(
            options.getOrElse("connecttimeoutms", "10000").toInt,
            options.getOrElse("requesttimeoutms", "30000").toInt))
      } else new HttpTreeFetcher(url,
        authTokenEnv = options.get("authtokenenv"),
        authMode = authMode,
        connectTimeoutMs = options.getOrElse("connecttimeoutms", "10000").toInt,
        requestTimeoutMs = options.getOrElse("requesttimeoutms", "30000").toInt)
    } else registry.getOrElse(name,
      throw new IllegalArgumentException(s"no registered TreeFetcher named '$name'"))
}
