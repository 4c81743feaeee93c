package graft

import org.apache.spark.sql.functions._
import graft.text.WebText

/** HTML extraction + URL parsing edges (the web-corpus ingest stage). */
class WebTextSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, input: (String, String)*): Seq[Any] = {
    import spark.implicits._
    input.toSeq.toDF("id", "x").orderBy("id").select(c).collect().map(_.get(0)).toSeq
  }

  test("stripHtml: blocks drop with content, tags strip, entities decode, ws collapses") {
    val got = one(WebText.stripHtml(col("x")),
      "a" -> "<html><head><title>T</title><script>var x=1;</script><style>p{}</style></head><body><p>Hello &amp; wel&lt;come</p></body></html>",
      "b" -> "<SCRIPT type='t'>alert(1)</SCRIPT><P>upper  case\n\ttags</P>",
      "c" -> "&amp;lt; stays literal; &quot;q&quot; &#39;a&#39;&nbsp;end",
      "d" -> "plain text, no markup",
      "e" -> "")
    assert(got === Seq(
      "T Hello & wel<come",
      "upper case tags",
      "&lt; stays literal; \"q\" 'a' end",
      "plain text, no markup",
      ""))
  }

  test("linkDensity: anchor chars over stripped chars, nested tags, bounds") {
    // stripped = "one mid two words" (17 chars); anchors = "one" + "two words" = 12
    val got = one(WebText.linkDensity(col("x")),
      "a" -> "<a href=x>one</a> mid <a>two <b>words</b></a>",
      "b" -> "no anchors at all",
      "c" -> "",
      "d" -> "<a>everything</a>")
    assert(got === Seq(12.0 / 17, 0.0, 0.0, 1.0))
  }

  test("urlHost/urlPath: userinfo and port stripped, query/fragment dropped") {
    val hosts = one(WebText.urlHost(col("x")),
      "a" -> "https://www.Example.co.uk:8080/path/a?q=1#f",
      "b" -> "http://user:pw@sub.blog.example.com/x/y",
      "c" -> "https://example.com",
      "d" -> "not a url",
      "e" -> "https://[::1]:8080/x",
      "f" -> "https://user@[2001:DB8::1]/y")
    assert(hosts === Seq("www.example.co.uk", "sub.blog.example.com",
      "example.com", "", "::1", "2001:db8::1"))
    val paths = one(WebText.urlPath(col("x")),
      "a" -> "https://h.io:8080/path/a?q=1#f",
      "b" -> "https://h.io",
      "c" -> "https://h.io/?q=1",
      "d" -> "no scheme")
    assert(paths === Seq("/path/a", "/", "/", "/"))
  }

  test("registeredDomain: eTLD+1 with multi-label suffixes; degenerate hosts") {
    val got = one(WebText.registeredDomain(col("x")),
      "a" -> "www.example.co.uk",
      "b" -> "sub.blog.example.com",
      "c" -> "example.com",
      "d" -> "localhost",
      "e" -> "co.uk",
      "f" -> "")
    assert(got === Seq("example.co.uk", "example.com", "example.com",
      "localhost", "co.uk", null))
    // straight from URL
    val viaUrl = one(WebText.urlDomain(col("x")),
      "a" -> "https://a.b.news.com.au/x")
    assert(viaUrl === Seq("news.com.au"))
  }

  test("urlCanonicalize: transport-noise forms collapse to one dedup key") {
    val got = one(WebText.urlCanonicalize(col("x")),
      "a" -> "https://WWW.Ex.com/a/b/?utm_source=x&b=2&a=1#f",
      "b" -> "https://ex.com/a/b?a=1&b=2",
      "c" -> "https://user@ex.com:8080/a/b?b=2&a=1",
      "d" -> "https://ex.com",
      "e" -> "https://www.ex.com/?utm_campaign=y&fbclid=z",
      "f" -> "Not A URL",
      "g" -> "https://ex.com/a/b?gclid&a=1&b=2",
      "h" -> "https://ex.com/a/b?a=1&b=2&utm_source")
    assert(got(0) === "ex.com/a/b?a=1&b=2")
    assert(got(1) === got(0) && got(2) === got(0))
    assert(got(3) === "ex.com" && got(4) === "ex.com")
    assert(got(5) === "not a url")
    // bare tracking params (no '=') are transport noise too
    assert(got(6) === got(0) && got(7) === got(0))
  }

  test("invariants over generated inputs: plain-text fixpoint, domain-suffix, density bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Seq("data", "spark", "pipeline", "x1", "Word", "a")
    def sentence() = Seq.fill(1 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" ")
    val plains = (0 until 50).map(i => (i, sentence()))
    // tag/entity-free text is a fixpoint of stripHtml (modulo ws collapse)
    val fx = plains.toDF("i", "x")
      .select(col("x"), WebText.stripHtml(col("x")).as("s")).collect()
    fx.foreach(r => assert(r.getString(1) === r.getString(0).trim.replaceAll("\\s+", " ")))
    // synthetic markup: density always in [0,1]
    val docs = (0 until 50).map { i =>
      val parts = Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(3) match {
        case 0 => s"<p>${sentence()}</p>"
        case 1 => s"<a href='/${i}'>${sentence()}</a>"
        case _ => sentence()
      })
      (i, parts.mkString(" "))
    }
    val dens = docs.toDF("i", "x")
      .select(WebText.linkDensity(col("x"))).collect().map(_.getDouble(0))
    dens.foreach(d => assert(d >= 0.0 && d <= 1.0, s"density $d out of bounds"))
    // registeredDomain is always a dot-suffix of its host
    val hosts = (0 until 60).map { i =>
      val labels = Seq.fill(1 + rnd.nextInt(4))(words(rnd.nextInt(words.size)).toLowerCase)
      val tail = Seq("com", "org", "co.uk", "com.au", "io")(rnd.nextInt(5))
      (i, (labels :+ tail).mkString("."))
    }
    hosts.toDF("i", "x")
      .select(col("x"), WebText.registeredDomain(col("x"))).collect().foreach { r =>
        val (h, d) = (r.getString(0), r.getString(1))
        assert(h == d || h.endsWith("." + d), s"$d not a suffix of $h")
      }
  }
}
