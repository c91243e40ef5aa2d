package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** OAuth2 client-credentials matrix against an in-memory token server
  * fake (no network): acquisition, caching within expiry, clock-driven
  * refresh, mid-stream revocation (401 → invalidate → one retry),
  * credential/config failure modes, and the resolve() wiring. */
class OAuth2Spec extends AnyFunSuite {

  /** In-memory token server + protected resource. Issues sequential
    * tokens tok-1, tok-2, …; the resource accepts only the latest. */
  private final class FakeAuthServer(expiresIn: Option[Long] = Some(60L)) {
    @volatile var issued = 0
    @volatile var lastBasic: String = ""
    @volatile var lastBody: String = ""
    def current: String = s"tok-$issued"

    val post: OAuth2.Post = (_, headers, body) => {
      lastBasic = headers.getOrElse("Authorization", "")
      lastBody = body
      issued += 1
      val exp = expiresIn.map(e => s""","expires_in":$e""").getOrElse("")
      (200, s"""{"access_token":"$current","token_type":"bearer"$exp}""")
    }

    /** Resource GET honoring only the CURRENT token. */
    def get(snapshot: String): (String, Map[String, String]) => (Int, String) =
      (_, headers) =>
        if (headers.get("Authorization").contains(s"Bearer $current"))
          (200, snapshot)
        else (401, """{"error":"invalid_token"}""")

    /** Revoke everything issued so far (clients must re-acquire). */
    def revoke(): Unit = issued += 1
  }

  private def provider(srv: FakeAuthServer, now: () => Long,
      skew: Long = 30L) =
    new OAuth2TokenProvider("https://auth.example/token", "CID", "CSEC",
      expirySkewSeconds = skew, post = srv.post,
      env = Map("CID" -> "id-1", "CSEC" -> "sec-1").get, nowMs = now)

  test("acquires once and reuses the token within its lifetime") {
    val srv = new FakeAuthServer()
    var clock = 1000L
    val p = provider(srv, () => clock)
    assert(p.token() == "tok-1")
    clock += 10000L // 10 s — well inside 60-30 s effective lifetime
    assert(p.token() == "tok-1")
    assert(srv.issued == 1 && p.requests.get() == 1)
  }

  test("sends Basic auth over the env credentials and the client_credentials grant") {
    val srv = new FakeAuthServer()
    provider(srv, () => 0L).token()
    val expected = java.util.Base64.getEncoder.encodeToString(
      "id-1:sec-1".getBytes("UTF-8"))
    assert(srv.lastBasic == s"Basic $expected")
    assert(srv.lastBody == "grant_type=client_credentials")
  }

  test("form-urlencodes credentials with reserved characters (RFC 6749 §2.3.1)") {
    val srv = new FakeAuthServer()
    new OAuth2TokenProvider("https://auth.example/token", "CID", "CSEC",
      post = srv.post,
      env = Map("CID" -> "id:with colon", "CSEC" -> "s&cret+/=").get,
      nowMs = () => 0L).token()
    // each credential is x-www-form-urlencoded BEFORE the ':' concat, so
    // the split point is unambiguous even with a ':' inside the id
    val expected = java.util.Base64.getEncoder.encodeToString(
      "id%3Awith+colon:s%26cret%2B%2F%3D".getBytes("UTF-8"))
    assert(srv.lastBasic == s"Basic $expected")
  }

  test("refreshes after expiry minus the skew margin") {
    val srv = new FakeAuthServer(expiresIn = Some(60L))
    var clock = 0L
    val p = provider(srv, () => clock, skew = 30L)
    assert(p.token() == "tok-1")
    clock = 29999L // just under the 30 s effective lifetime
    assert(p.token() == "tok-1")
    clock = 30000L
    assert(p.token() == "tok-2")
    assert(srv.issued == 2)
  }

  test("a token without expires_in is reused until invalidated") {
    val srv = new FakeAuthServer(expiresIn = None)
    var clock = 0L
    val p = provider(srv, () => clock)
    assert(p.token() == "tok-1")
    clock = Long.MaxValue / 2
    assert(p.token() == "tok-1")
    p.invalidate()
    assert(p.token() == "tok-2")
  }

  test("fetch uses the bearer token and returns the snapshot") {
    val srv = new FakeAuthServer()
    val p = provider(srv, () => 0L)
    val f = new OAuth2TreeFetcher("https://api.example/tree.json", p,
      get = srv.get("""{"a":1}"""))
    assert(f.fetch() == """{"a":1}""")
  }

  test("mid-stream revocation: 401 → invalidate → single retry succeeds") {
    val srv = new FakeAuthServer()
    val p = provider(srv, () => 0L)
    val f = new OAuth2TreeFetcher("https://api.example/tree.json", p,
      get = srv.get("""{"a":2}"""))
    assert(f.fetch() == """{"a":2}""") // tok-1
    srv.revoke() // server rejects tok-1; client still caches it
    assert(f.fetch() == """{"a":2}""")
    assert(p.requests.get() == 2, "exactly one re-acquisition after the 401")
  }

  test("persistent auth failure propagates instead of retrying forever") {
    val srv = new FakeAuthServer()
    val p = provider(srv, () => 0L)
    // resource rejects EVERYTHING — e.g. the client was deauthorized
    val f = new OAuth2TreeFetcher("https://api.example/tree.json", p,
      get = (_, _) => (401, "no"))
    val e = intercept[java.io.IOException](f.fetch())
    assert(e.getMessage.contains("HTTP 401"))
    assert(p.requests.get() == 2, "one initial acquire + one 401 retry")
  }

  test("non-auth HTTP errors propagate without token invalidation") {
    val srv = new FakeAuthServer()
    val p = provider(srv, () => 0L)
    val f = new OAuth2TreeFetcher("https://api.example/tree.json", p,
      get = (_, _) => (503, "down"))
    val e = intercept[java.io.IOException](f.fetch())
    assert(e.getMessage.contains("HTTP 503"))
    assert(srv.issued == 1, "503 is not a token problem")
  }

  test("token endpoint failure and malformed response fail loudly") {
    val p1 = new OAuth2TokenProvider("u", "CID", "CSEC",
      post = (_, _, _) => (500, "boom"),
      env = Map("CID" -> "a", "CSEC" -> "b").get, nowMs = () => 0L)
    assert(intercept[java.io.IOException](p1.token())
      .getMessage.contains("HTTP 500"))
    val p2 = new OAuth2TokenProvider("u", "CID", "CSEC",
      post = (_, _, _) => (200, """{"nope":true}"""),
      env = Map("CID" -> "a", "CSEC" -> "b").get, nowMs = () => 0L)
    assert(intercept[java.io.IOException](p2.token())
      .getMessage.contains("no access_token"))
  }

  test("missing credential env vars name the variable") {
    val p = new OAuth2TokenProvider("u", "MISSING_ID", "MISSING_SEC",
      post = (_, _, _) => (200, """{"access_token":"t"}"""),
      env = _ => None, nowMs = () => 0L)
    val e = intercept[IllegalArgumentException](p.token())
    assert(e.getMessage.contains("MISSING_ID"))
  }

  test("resolve wires authmode=oauth2 and validates its options") {
    val f = TreeFetchers.resolve("http", Map(
      "url" -> "https://api.example/tree.json",
      "authmode" -> "oauth2", "tokenurl" -> "https://auth.example/token",
      "clientidenv" -> "CID", "clientsecretenv" -> "CSEC"))
    assert(f.isInstanceOf[OAuth2TreeFetcher])
    val e = intercept[IllegalArgumentException](
      TreeFetchers.resolve("http", Map(
        "url" -> "u", "authmode" -> "oauth2", "tokenurl" -> "t",
        "clientidenv" -> "CID")))
    assert(e.getMessage.contains("clientsecretenv"))
  }

  test("end-to-end through the poll stream: expiry between micro-batches") {
    // The PollSource contract is fetch()-per-batch on the driver; here
    // the fetcher itself is exercised across a token expiry exactly as
    // two consecutive micro-batches would see it.
    val srv = new FakeAuthServer(expiresIn = Some(60L))
    var clock = 0L
    val p = provider(srv, () => clock, skew = 30L)
    val f = new OAuth2TreeFetcher("https://api.example/tree.json", p,
      get = srv.get("""{"d":{"t":1}}"""))
    assert(f.fetch() == """{"d":{"t":1}}""") // batch 1, tok-1
    clock = 31000L // past effective expiry → batch 2 must re-acquire
    assert(f.fetch() == """{"d":{"t":1}}""")
    assert(srv.issued == 2)
  }
}
