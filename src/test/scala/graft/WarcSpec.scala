package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlText
import graft.sources.Warc

/** WARC ingest (ISO 28500) + html_text: records parse from plain and
  * per-record-gzip-member files, HTTP response payloads split off
  * their header block, oversize bodies truncate WITH a flag, torn
  * tails end the file quietly, and the crawl→text composition
  * (html_text over response payloads) feeds the quality gates. */
class WarcSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("warc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Html =
    """<!DOCTYPE html><html><head><title>T</title>
      |<style>body { color: red; }</style>
      |<script type="text/javascript">var x = "<p>not text</p>";</script>
      |</head><body>
      |<!-- a comment -->
      |<h1>Hello &amp; welcome</h1>
      |<p>caf&#233; &lt;tag&gt; &#x41;B&nbsp;C</p>
      |</body></html>""".stripMargin

  private def record(wtype: String, uri: String, block: Array[Byte],
      ctype: String = "application/http; msgtype=response"): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $wtype\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:$wtype-${uri.hashCode}>\r\n"
    h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "WARC-Date: 2026-08-14T00:00:00Z\r\n"
    h ++= s"Content-Type: $ctype\r\n"
    h ++= s"Content-Length: ${block.length}\r\n"
    h ++= "\r\n"
    h.toString.getBytes(StandardCharsets.UTF_8) ++ block ++
      "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
  }

  private def httpResponse(payload: Array[Byte],
      ctype: String = "text/html; charset=utf-8"): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8) ++ payload

  private def writeWarc(dir: java.nio.file.Path, name: String,
      records: Seq[Array[Byte]], gzipPerRecord: Boolean): String = {
    val f = dir.resolve(name).toFile
    val out = new FileOutputStream(f)
    try {
      if (gzipPerRecord) records.foreach { r =>
        // one gzip MEMBER per record — the CommonCrawl layout
        val bos = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bos)
        gz.write(r); gz.finish()
        out.write(bos.toByteArray)
      }
      else records.foreach(out.write)
    } finally out.close()
    f.getAbsolutePath
  }

  private def fixtureRecords: Seq[Array[Byte]] = Seq(
    record("warcinfo", "urn:info",
      "software: graft-test\r\n".getBytes(StandardCharsets.UTF_8),
      ctype = "application/warc-fields"),
    record("request", "http://example.com/a",
      "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n"
        .getBytes(StandardCharsets.UTF_8),
      ctype = "application/http; msgtype=request"),
    record("response", "http://example.com/a",
      httpResponse(Html.getBytes(StandardCharsets.UTF_8))),
    record("response", "http://example.com/b",
      httpResponse("plain text body".getBytes(StandardCharsets.UTF_8),
        ctype = "text/plain")))

  test("plain and per-record-gzipped WARC parse identically; responses " +
      "split the HTTP header block off") {
    val dir = java.nio.file.Files.createTempDirectory("warc")
    writeWarc(dir, "a.warc", fixtureRecords, gzipPerRecord = false)
    writeWarc(dir, "a.warc.gz", fixtureRecords, gzipPerRecord = true)
    val df = Warc.records(spark, dir.toString + "/*")
    val rows = df.collect()
    assert(rows.length === 8) // 4 records × 2 files
    for (variant <- Seq("a.warc", "a.warc.gz")) {
      val rs = rows.filter(_.getAs[String]("source_file").endsWith(variant))
      assert(rs.map(_.getAs[String]("warc_type")).sorted.toSeq ===
        Seq("request", "response", "response", "warcinfo"))
      val resp = rs.filter(r => r.getAs[String]("warc_type") == "response" &&
        r.getAs[String]("target_uri") == "http://example.com/a").head
      assert(resp.getAs[Int]("http_status") === 200)
      assert(resp.getAs[String]("http_content_type")
        .startsWith("text/html"))
      assert(new String(resp.getAs[Array[Byte]]("body"),
        StandardCharsets.UTF_8) === Html)
      assert(!resp.getAs[Boolean]("truncated"))
      // non-http records keep their raw block
      val info = rs.filter(_.getAs[String]("warc_type") == "warcinfo").head
      assert(new String(info.getAs[Array[Byte]]("body"),
        StandardCharsets.UTF_8).startsWith("software:"))
      assert(info.isNullAt(info.fieldIndex("http_status")))
    }
  }

  test("oversize bodies truncate WITH the flag; a torn tail keeps the " +
      "records before it") {
    val dir = java.nio.file.Files.createTempDirectory("warc2")
    writeWarc(dir, "big.warc", fixtureRecords, gzipPerRecord = false)
    val small = Warc.records(spark, dir.resolve("big.warc").toString,
      maxBodyBytes = 64).collect()
    assert(small.length === 4)
    val bigResp = small.filter(r =>
      r.getAs[String]("warc_type") == "response" &&
        r.getAs[String]("target_uri") == "http://example.com/a").head
    assert(bigResp.getAs[Boolean]("truncated"))
    // declared length survives truncation for accounting
    assert(bigResp.getAs[Long]("content_length") > 64L)
    // torn tail: a record whose declared length exceeds the bytes left
    val torn = fixtureRecords :+
      record("response", "http://example.com/torn",
        httpResponse("x".getBytes(StandardCharsets.UTF_8)))
    val all = torn.flatMap(_.toSeq).toArray
    val cut = java.util.Arrays.copyOfRange(all, 0, all.length - 30)
    val f = new FileOutputStream(dir.resolve("torn.warc").toFile)
    try f.write(cut) finally f.close()
    val parsed = Warc.records(spark, dir.resolve("torn.warc").toString)
      .collect()
    assert(parsed.length === 4) // the intact prefix, not an exception
  }

  test("html_text: tags/scripts/styles/comments out, entities decoded " +
      "AFTER stripping, whitespace normalized; composes crawl -> text") {
    val dir = java.nio.file.Files.createTempDirectory("warc3")
    writeWarc(dir, "c.warc.gz", fixtureRecords, gzipPerRecord = true)
    val txt = Warc.records(spark, dir.resolve("c.warc.gz").toString)
      .filter(col("warc_type") === "response" &&
        col("http_content_type").startsWith("text/html"))
      .select(col("target_uri"),
        HtmlText(col("body").cast("string")).as("text"))
      .collect()
    assert(txt.length === 1)
    val t = txt.head.getAs[String]("text")
    assert(t === "T Hello & welcome café <tag> AB C")
    // the SQL registration agrees with the Column API
    graft.api.GraftExtensions.register(spark)
    import spark.implicits._
    val viaSql = Seq(Html).toDF("h")
      .selectExpr("html_text(h) AS t").head.getString(0)
    assert(viaSql === t)
    // decoding order: an entity-encoded tag must NOT be stripped
    val sneaky = Seq("a &lt;script&gt;alert(1)&lt;/script&gt; b").toDF("h")
      .select(HtmlText(col("h")).as("t")).head.getString(0)
    assert(sneaky === "a <script>alert(1)</script> b")
    // null/garbage safety
    val nulls = Seq[String](null, "", "<p", "&#xD800; &#999999999;").toDF("h")
      .select(HtmlText(col("h")).as("t")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    assert(nulls(0) === null)
    assert(nulls(1) === "")
    assert(nulls(3) === "&#xD800; &#999999999;")
  }

  test("WARC headers are UTF-8: a non-ASCII target URI round-trips " +
      "instead of being mangled per-byte") {
    val dir = java.nio.file.Files.createTempDirectory("warc4")
    val uri = "http://example.com/café/日本語"
    writeWarc(dir, "u.warc", Seq(
      record("response", uri,
        httpResponse("ok".getBytes(StandardCharsets.UTF_8)))),
      gzipPerRecord = false)
    val row = Warc.records(spark, dir.resolve("u.warc").toString)
      .collect().head
    assert(row.getAs[String]("target_uri") === uri)
  }

  test("decode_text: charset= header wins, <meta charset> sniff next, " +
      "UTF-8 default; replacement errors are COUNTED; SQL == Column") {
    import spark.implicits._
    graft.api.GraftExtensions.register(spark)
    val text = "café naïve — résumé"
    val sjText = "日本語のテキスト"
    val metaPage = "<html><head><meta charset=\"windows-1252\"></head>" +
      s"<body>$text</body></html>"
    val rows = Seq(
      // 1: header charset (windows-1252 bytes would garble as UTF-8)
      (1L, text.getBytes("windows-1252"), "text/html; charset=windows-1252"),
      // 2: Shift-JIS via header
      (2L, sjText.getBytes("Shift_JIS"), "text/html; charset=Shift_JIS"),
      // 3: no header param -> <meta charset> sniff
      (3L, metaPage.getBytes("windows-1252"), "text/html"),
      // 4: nothing declared -> UTF-8 default
      (4L, text.getBytes(StandardCharsets.UTF_8), null),
      // 5: ISO-8859-1 bytes mislabeled utf-8 -> replacement + count
      (5L, text.getBytes("ISO-8859-1"), "text/html; charset=utf-8"),
      // 6: typo'd charset name -> falls back to UTF-8, decodes fine
      (6L, text.getBytes(StandardCharsets.UTF_8), "text/html; charset=bogus-9"))
      .toDF("id", "body", "ct")
    val got = rows.select(col("id"),
      graft.functions.CharsetDecode(col("body"), col("ct")).as("d"))
      .select(col("id"), col("d.text"), col("d.charset"),
        col("d.decode_errors"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
    assert(got(1L) === ((text, "windows-1252", 0)))
    assert(got(2L) === ((sjText, "shift_jis", 0)))
    assert(got(3L) === ((metaPage, "windows-1252", 0)))
    assert(got(4L) === ((text, "utf-8", 0)))
    // mislabeled: each of the 4 non-ASCII latin-1 bytes (é×3, ï; the
    // em-dash is unmappable in latin-1 and became '?' on encode) is
    // malformed UTF-8 and must surface as one counted U+FFFD each
    assert(got(5L)._2 === "utf-8")
    assert(got(5L)._3 === 4)
    assert(got(5L)._1 === "caf� na�ve ? r�sum�")
    assert(got(6L) === ((text, "utf-8", 0)))
    // SQL face, incl. null content-type passthrough
    val viaSql = rows.selectExpr("id",
        "decode_text(body, ct) AS d")
      .selectExpr("id", "d.text", "d.charset", "d.decode_errors")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
    assert(viaSql === got)
  }

  test("crawl fixture: revisits share the base record's CANONICAL url " +
      "over identical bytes, mirrors share bytes under a different " +
      "canonical url, and (doc_id, seq) extract from record ids") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_crawl")
    // ids cover: even/odd (revisit), 7 and 17 (mirror), all charset legs
    val docs = Seq(2L, 3L, 7L, 9L, 16L, 17L)
      .map(id => (id, s"doc $id body words here"))
      .toDF("doc_id", "text")
    Warc.synthesizeCrawlFixture(docs, dir.toString, nFiles = 2)
    val rows = Warc.records(spark, dir.toString + "/part-*.warc*")
      .withColumn("curl",
        graft.functions.TextFunctions.canonicalUrl(col("target_uri")))
      .collect()
    // multiplicities: 6 base + 4 odd revisits (3,7,9,17) + 2 mirrors
    assert(rows.length === 12)
    val byDoc = rows.groupBy { r =>
      "urn:graft:(\\d+):(\\d+)".r.findFirstMatchIn(
        r.getAs[String]("record_id")).map(m => m.group(1).toLong).get
    }
    assert(byDoc(3L).length === 2 && byDoc(2L).length === 1 &&
      byDoc(7L).length === 3 && byDoc(17L).length === 3)
    // revisit: different raw URI, SAME canonical URI, SAME payload bytes
    val (b3, r3) = (byDoc(3L).find(_.getAs[String]("record_id")
        .endsWith(":0>")).get,
      byDoc(3L).find(_.getAs[String]("record_id").endsWith(":1>")).get)
    assert(b3.getAs[String]("target_uri") !== r3.getAs[String]("target_uri"))
    assert(b3.getAs[String]("curl") === r3.getAs[String]("curl"))
    assert(java.util.Arrays.equals(b3.getAs[Array[Byte]]("body"),
      r3.getAs[Array[Byte]]("body")))
    // mirror: same bytes, DIFFERENT canonical URI
    val (b7, m7) = (byDoc(7L).find(_.getAs[String]("record_id")
        .endsWith(":0>")).get,
      byDoc(7L).find(_.getAs[String]("record_id").endsWith(":2>")).get)
    assert(b7.getAs[String]("curl") !== m7.getAs[String]("curl"))
    assert(java.util.Arrays.equals(b7.getAs[Array[Byte]]("body"),
      m7.getAs[Array[Byte]]("body")))
    // both container forms present, q97's charset-leg bytes preserved:
    // decode + strip yields the closed-form text on every record
    assert(rows.map(_.getAs[String]("source_file")).distinct.length === 2)
    val texts = Warc.records(spark, dir.toString + "/part-*.warc*")
      .withColumn("doc_id", regexp_extract(col("record_id"),
        "urn:graft:(\\d+):", 1).cast("bigint"))
      .withColumn("d", graft.functions.CharsetDecode(col("body"),
        col("http_content_type")))
      .select(col("doc_id"), HtmlText(col("d.text")).as("t"),
        col("d.decode_errors").as("e"))
      .collect()
    assert(texts.forall(_.getAs[Int]("e") === 0))
    assert(texts.forall { r =>
      val id = r.getAs[Long]("doc_id")
      r.getAs[String]("t") === s"Doc $id doc $id body words here café révisé"
    })
  }

  test("main_content: containers die wholesale, link farms die on " +
      "density, stubs die on length, content survives under html_text's " +
      "normalization; canonicalUrl port strip is authority-anchored") {
    import spark.implicits._
    def mc(h: String): String =
      Seq(h).toDF("h")
        .select(graft.functions.TextFunctions.mainContent(col("h")))
        .head().getString(0)
    val page = "<html><head><title>Doc 7</title></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> menu</nav>" +
      "<p>the quick brown fox jumps over the lazy dog &amp; friends</p>" +
      "<div><a href=\"/r1\">related article one</a> " +
      "<a href=\"/r2\">related article two</a> " +
      "<a href=\"/r3\">related article three</a></div>" +
      "<aside>subscribe to our newsletter for offers today</aside>" +
      "<footer>copyright 2026 all rights reserved by us</footer>" +
      "<script>var x=1;</script></body></html>"
    assert(mc(page) ===
      "the quick brown fox jumps over the lazy dog & friends")
    // a long paragraph with ONE short inline link keeps its block
    assert(mc("<p>a genuinely long content paragraph mentioning " +
      "<a href=\"/x\">one link</a> inline keeps flowing with more " +
      "words after it</p>").contains("one link"))
    // a page of nothing but boilerplate reduces to the EMPTY string
    assert(mc("<nav><a href=\"/\">Home</a></nav>" +
      "<footer>short footer</footer>") === "")
    // nested same-tag container: outer tail survives into the scorer
    // but dies on the length/density rules when boilerplate-shaped
    assert(mc("<nav>a<nav>b</nav>menu links</nav>" +
      "<p>real content paragraph long enough to clear the minimum</p>")
      === "real content paragraph long enough to clear the minimum")
    // canonicalUrl: port-lookalikes in paths and query params survive;
    // real default ports strip with ?, #, or nothing following
    def cu(u: String): String =
      Seq(u).toDF("u")
        .select(graft.functions.TextFunctions.canonicalUrl(col("u")))
        .head().getString(0)
    assert(cu("https://h.org/a:80/b") === "https://h.org/a:80/b")
    assert(cu("https://h.org/p?next=http://x.org:443/q")
      === "https://h.org/p?next=http://x.org:443/q")
    assert(cu("https://h.org:443?p=1") === "https://h.org?p=1")
    assert(cu("https://h.org:80") === "https://h.org")
    assert(cu("HTTPS://H.org:443/a#frag") === "https://h.org/a")
    assert(cu("https://h.org:8443/a") === "https://h.org:8443/a")
  }
}
