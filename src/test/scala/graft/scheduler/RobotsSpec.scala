package graft.scheduler

import graft.SparkSpec
import graft.core.{CrawlConfig, FrontierEntry}

/** robots.txt parsing (RFC 9309 semantics, conservative folds) and its
  * wiring into the scheduler's broadcast cache. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# store robots
      |User-agent: *
      |Disallow: /private/
      |Crawl-delay: 2
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /forum/
      |Disallow:
      |Allow: /forum/public/
      |Crawl-delay: 0.5
      |
      |User-agent: graftbot-wide
      |Disallow: /
      |Sitemap: https://x.example.com/sitemap.xml
      |""".stripMargin

  test("group selection: the most specific matching UA group wins; '*' is the fallback") {
    val mine = Robots.parse("x.example.com", body, userAgent = "graftbot")
    assert(mine.disallowPrefixes === Seq("/forum/"))
    assert(mine.allowPrefixes === Seq("/forum/public/"))
    assert(mine.crawlDelayMs === 600L, "0.5 s floors at the politeness default")
    val stranger = Robots.parse("x.example.com", body, userAgent = "someone-else")
    assert(stranger.disallowPrefixes === Seq("/private/"))
    assert(stranger.crawlDelayMs === 2000L)
    // 'graftbot-wide' contains 'graftbot' but our UA 'graftbot' does not
    // contain the longer token — it must NOT bind us to Disallow: /
    assert(!mine.disallowPrefixes.contains("/"))
  }

  test("conservative folds: wildcard/anchored disallows truncate into the unconditional list") {
    val b = """User-agent: *
              |Disallow: /a*b
              |Disallow: /exact$
              |Allow: /a/ok
              |""".stripMargin
    val r = Robots.parse("h.example.com", b)
    assert(r.wildcardDisallowPrefixes.toSet === Set("/a", "/exact"))
    assert(r.disallowPrefixes.isEmpty)
    // an unconditional (truncated) disallow cannot be outranked by Allow
    assert(r.allowPrefixes === Seq("/a/ok"))
    assert(r.blocks("https://h.example.com/a/ok/page"))
  }

  test("RFC 9309 longest-match: an exact Allow outranks a shorter Disallow; ties go to Allow") {
    val b = """User-agent: *
              |Disallow: /
              |Allow: /public/
              |""".stripMargin
    val r = Robots.parse("h.example.com", b)
    assert(!r.blocks("https://h.example.com/public/page.html"), "allow overrides")
    assert(r.blocks("https://h.example.com/secret/page.html"), "disallow still holds elsewhere")
    // tie (equal length) → least-restrictive → allowed
    val tie = Robots.parse("h.example.com",
      "User-agent: *\nDisallow: /x/\nAllow: /x/\n")
    assert(!tie.blocks("https://h.example.com/x/page"))
    // wildcard and '$'-anchored allows are dropped (folding would widen)
    val wild = Robots.parse("h.example.com",
      "User-agent: *\nDisallow: /d/\nAllow: /d/*.html\nAllow: /d/one$\n")
    assert(wild.allowPrefixes.isEmpty)
    assert(wild.blocks("https://h.example.com/d/x.html"))
  }

  test("blocks() matches on the PATH — an http:// URL cannot bypass the rules (ADVICE r4)") {
    val r = Robots.parse("h.example.com", "User-agent: *\nDisallow: /private/\n")
    assert(r.blocks("https://h.example.com/private/a"))
    assert(r.blocks("http://h.example.com/private/a"), "scheme must not matter")
    assert(!r.blocks("https://h.example.com/public/a"))
    // a URL with no path component is the root
    assert(!r.blocks("https://h.example.com"))
    assert(Robots.parse("h.example.com", "User-agent: *\nDisallow: /\n")
      .blocks("http://h.example.com"))
    // a '?' (or '#') BEFORE any slash ends the authority too: dropping the
    // query there would let an exact 'Disallow: /?x=1' rule miss — an
    // under-block, the direction the conservative parse forbids
    assert(RobotsRules.pathOf("https://h.example.com?x=1") === "/?x=1")
    assert(RobotsRules.pathOf("https://h.example.com#frag") === "/#frag")
    assert(Robots.parse("h.example.com", "User-agent: *\nDisallow: /?x=1\n")
      .blocks("https://h.example.com?x=1"))
    // protocol-relative URLs carry an authority too: '//host/path' must
    // yield '/path', not '//host/path' — otherwise every path-scoped
    // disallow silently stops matching (an under-block)
    assert(RobotsRules.pathOf("//h.example.com/private/a") === "/private/a")
    assert(RobotsRules.pathOf("//h.example.com") === "/")
    assert(r.blocks("//h.example.com/private/a"), "protocol-relative must match path rules")
  }

  test("lexical hygiene: comments, CRLF, case-insensitive keys, empty Disallow") {
    val b = "USER-AGENT: *\r\nDISALLOW: /x # trailing comment\r\nDisallow:\r\n"
    val r = Robots.parse("h.example.com", b)
    assert(r.disallowPrefixes === Seq("/x"))
    assert(r.crawlDelayMs === HostScheduler.DefaultDelayMs)
  }

  test("a rule line after rules re-opens a new group (RFC 9309 grammar)") {
    val b = """User-agent: a
              |Disallow: /one
              |User-agent: b
              |Disallow: /two
              |""".stripMargin
    val gs = Robots.groups(b)
    assert(gs.map(_.agents) === Seq(Seq("a"), Seq("b")))
    assert(gs.map(_.disallows) === Seq(Seq("/one"), Seq("/two")))
  }

  test("buildCache → scheduler: parsed disallows drop URLs, crawl-delay paces the host") {
    val docs = Seq(
      ("a.example.com",
        "User-agent: *\nDisallow: /detail/blocked\nCrawl-delay: 1\n"),
      ("b.example.com", "User-agent: *\nDisallow:\n"))
      .toDF("host", "body")
    val cache = Robots.buildCache(docs)
    assert(cache.map(_.host).toSet === Set("a.example.com", "b.example.com"))

    val frontier = spark.createDataset(Seq(
      FrontierEntry("id1", "https://a.example.com/detail/blocked1", "a.example.com", forums = false, discoveredRun = 1),
      FrontierEntry("id2", "https://a.example.com/detail/ok2", "a.example.com", forums = false, discoveredRun = 1),
      FrontierEntry("id3", "https://a.example.com/detail/ok3", "a.example.com", forums = false, discoveredRun = 1),
      FrontierEntry("id4", "https://b.example.com/detail/blocked4", "b.example.com", forums = false, discoveredRun = 1)))
    val sched = HostScheduler.schedule(spark, frontier, cache, CrawlConfig()).collect()
    // the literal-prefix disallow drops id1; b's empty Disallow blocks nothing
    assert(sched.map(_.id).toSet === Set("id2", "id3", "id4"))
    // a.example.com fetches are spaced >= its parsed 1 s crawl-delay
    val aTimes = sched.filter(s => s.id == "id2" || s.id == "id3")
      .map(_.startMs).sorted
    assert(aTimes(1) - aTimes(0) >= 1000L,
      s"crawl-delay must pace the host: $aTimes")
  }
}
