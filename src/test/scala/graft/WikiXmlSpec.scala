package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.sources.{Sink, WikiXml}

/** Streaming XML source + snapshot pipeline + partitioned sink — the
  * reference's end-to-end per-file flow (/root/reference/main.py:84-94)
  * against the fixture mirroring its input format (FIXTURES.md §B). */
class WikiXmlSpec extends SparkTestBase {

  private val fixture = "src/test/resources/wiki/fixture.xml"

  test("parseStream emits all revisions with page state and document order") {
    val in = Files.newInputStream(Paths.get(fixture))
    val revs = WikiXml.parseStream(in).toList
    assert(revs.length == 11)
    assert(revs.count(_.title == "Alpha") == 4)
    // page-level fields populated before revisions (element order guarantee)
    assert(revs.forall(r => r.title != null && r.namespace != null))
    // document-order ordinal resets per page
    assert(revs.filter(_.title == "Alpha").map(_.revOrd) == List(0L, 1L, 2L, 3L))
    assert(revs.filter(_.title == "Ties").map(_.revOrd) == List(0L, 1L))
    // missing <text> element -> "" (main.py:156 None coercion)
    assert(revs.filter(_.title == "EmptyText").forall(_.text == ""))
  }

  test("byte lexer (pruned path) emits rows identical to the StAX parser") {
    import graft.sources.WikiLexer
    def stax(xml: Array[Byte], nsf: Option[String]) =
      WikiXml.parseStream(new java.io.ByteArrayInputStream(xml),
          withText = false, nsFilter = nsf)
        .map(r => (r.namespace, r.title, r.timestampMicros, r.text, r.revOrd)).toList
    def lex(xml: Array[Byte], nsf: Option[String]) =
      WikiLexer.scan(new java.io.ByteArrayInputStream(xml), nsf)
        .map(r => (r.namespace, r.title, r.timestampMicros, r.text, r.revOrd)).toList

    val fixtureBytes = Files.readAllBytes(Paths.get(fixture))
    assert(lex(fixtureBytes, None) == stax(fixtureBytes, None))
    assert(lex(fixtureBytes, Some("0")) == stax(fixtureBytes, Some("0")))
    assert(lex(fixtureBytes, Some("1")) == stax(fixtureBytes, Some("1")))

    // adversarial: closing tags hidden inside CDATA and comments, entities
    // in the title, self-closing text, attribute-bearing tags
    val nasty =
      ("""<mediawiki><page><title>T&amp;1 &#65;&lt;x&gt;</title><ns>0</ns>
        |<!-- page comment with fake </page> inside -->
        |<revision><id>1</id><timestamp>2020-01-01T00:00:00Z</timestamp>
        |<text bytes="99" xml:space="preserve">body <!-- fake </text> in comment -->
        |mid <![CDATA[cdata with </text> and </revision> inside]]> tail</text>
        |</revision>
        |<revision><id>2</id><timestamp>2020-01-02T03:04:05Z</timestamp><text/></revision>
        |<revision><id>3</id><timestamp>2020-01-03T00:00:00Z</timestamp>
        |<text bytes="0"></text></revision>
        |</page>
        |<page><title><![CDATA[Raw & <title>]]></title><ns>2</ns>
        |<revision><id>4</id><timestamp>2021-05-06T07:08:09Z</timestamp>
        |<text>short</text></revision></page>
        |</mediawiki>""").stripMargin.getBytes("UTF-8")
    assert(lex(nasty, None) == stax(nasty, None))
    assert(lex(nasty, Some("0")) == stax(nasty, Some("0")))
    assert(lex(nasty, None).map(_._2).distinct ==
      List("T&1 A<x>", "Raw & <title>"))

    // pruned DataFrame read goes through the lexer: title-only scan over
    // the fixture equals the full read's titles
    val dir = Files.createTempDirectory("wikilex").toString
    Files.copy(Paths.get(fixture), Paths.get(s"$dir/a.xml"))
    val full = WikiXml.read(spark, s"$dir/a.xml")
    assert(full.select("title", "rev_ord").collect().toSet ==
      full.select("title", "rev_ord", "text").drop("text").collect().toSet)
  }

  test("fast timestamp parser equals the JDK parser over random instants") {
    val rng = new scala.util.Random(17)
    val samples = Seq("2001-01-15T00:00:00Z", "1970-01-01T00:00:00Z",
      "2000-02-29T23:59:59Z", "2100-03-01T01:02:03Z", "2024-12-31T12:34:56.789Z",
      "1999-07-04T06:07:08.123456Z") ++
      Seq.fill(500) {
        val epochSec = rng.between(-2208988800L, 4102444800L) // 1900..2100
        val ldt = java.time.LocalDateTime.ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
        ldt.toString + "Z"
      }
    samples.foreach { s =>
      val ldt = java.time.LocalDateTime.parse(s.stripSuffix("Z"))
      val expect = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      assert(WikiXml.parseTsMicros(s) == expect, s)
    }
  }

  test("read() streams files (plain + gzip codec) into the 5-col DataFrame") {
    val dir = Files.createTempDirectory("wikixml").toString
    Files.copy(Paths.get(fixture), Paths.get(s"$dir/a.xml"))
    val gz = new GZIPOutputStream(Files.newOutputStream(Paths.get(s"$dir/b.xml.gz")))
    gz.write(Files.readAllBytes(Paths.get(fixture)))
    gz.close()

    val df = WikiXml.read(spark, s"$dir/*")
    assert(df.schema == WikiXml.schema)
    assert(df.count() == 22) // 11 revisions x 2 files
    assert(df.filter(col("namespace") === "1").count() == 2)
  }

  test("read() decompress-scans 7z archives (the reference's metahistory7zdump format)") {
    // build a .7z of the fixture with the same commons-compress that the
    // source reads with (LZMA2 via the xz jar) — write side doubles as
    // coverage that the container's 7z stack actually round-trips
    import org.apache.commons.compress.archivers.sevenz.SevenZOutputFile
    val dir = Files.createTempDirectory("wiki7z").toString
    val archive = new java.io.File(s"$dir/fixture.xml.7z")
    val out = new SevenZOutputFile(archive)
    val entry = out.createArchiveEntry(new java.io.File(fixture), "fixture.xml")
    out.putArchiveEntry(entry)
    out.write(Files.readAllBytes(Paths.get(fixture)))
    out.closeArchiveEntry()
    out.close()

    val df = WikiXml.read(spark, archive.toString)
    assert(df.schema == WikiXml.schema)
    val plain = WikiXml.read(spark, fixture)
    assert(df.collect().toSet == plain.collect().toSet)
    assert(df.count() == 11)
  }

  test("V2 scan prunes columns: title-only query never materializes text") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val df = WikiXml.read(spark, fixture).select("title", "rev_ord")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan.readSchema()
    }
    assert(scans.nonEmpty)
    assert(scans.head.fieldNames.toSeq == Seq("title", "rev_ord"))
    assert(df.count() == 11)
    // parser-level: pruned parse emits empty text, same row structure
    val in = Files.newInputStream(Paths.get(fixture))
    try {
      val revs = WikiXml.parseStream(in, withText = false).toList
      assert(revs.length == 11 && revs.forall(_.text == ""))
      assert(revs.map(r => (r.title, r.revOrd)) ==
        WikiXml.parseStream(Files.newInputStream(Paths.get(fixture)))
          .map(r => (r.title, r.revOrd)).toList)
    } finally in.close()
  }

  test("namespace filter pushes into the parser; results equal the unpushed filter") {
    val df = WikiXml.read(spark, fixture).filter(col("namespace") === "0")
    // the scan's description advertises the pushed filter
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PushedNsFilter: namespace=0"), scanDesc.take(800))
    // equality with the parser-level unfiltered read + Spark-side filter
    val pushed = df.collect().toSet
    val unpushed = WikiXml.read(spark, fixture).collect()
      .filter(_.getString(0) == "0").toSet
    assert(pushed == unpushed)
    assert(pushed.nonEmpty)
    // parser level: nsFilter skips filtered pages but keeps rev_ord parity
    val in = Files.newInputStream(Paths.get(fixture))
    try {
      val only0 = WikiXml.parseStream(in, withText = true, nsFilter = Some("0")).toList
      assert(only0.forall(_.namespace == "0"))
      val all = WikiXml.parseStream(Files.newInputStream(Paths.get(fixture))).toList
      assert(only0.map(r => (r.title, r.revOrd)) ==
        all.filter(_.namespace == "0").map(r => (r.title, r.revOrd)))
    } finally in.close()
  }

  test("multistream bz2 splits at stream boundaries; rows equal the single-partition read") {
    import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
    import graft.sources.WikiBz2

    def page(i: Int): String =
      s"<page><title>P$i</title><ns>${i % 2}</ns>" +
        (0 until 3).map(j =>
          s"<revision><timestamp>2020-01-${"%02d".format(j + 1)}T0$j:00:00Z</timestamp>" +
            s"<text>body $i rev $j</text></revision>").mkString + "</page>"
    val pages = (1 to 12).map(page)
    // three independent bz2 streams, concatenated byte-aligned — the
    // multistream dump layout: header rides in the first chunk, the
    // closing root tag in the last
    val chunks = Seq(
      "<mediawiki>\n  <siteinfo><sitename>T</sitename></siteinfo>\n" +
        pages.take(4).mkString("\n"),
      pages.slice(4, 8).mkString("\n"),
      pages.slice(8, 12).mkString("\n") + "\n</mediawiki>\n")
    val fileBytes = chunks.map { c =>
      val bo = new java.io.ByteArrayOutputStream()
      val bz = new BZip2CompressorOutputStream(bo)
      bz.write(c.getBytes("UTF-8")); bz.close()
      bo.toByteArray
    }.reduce(_ ++ _)

    val starts = WikiBz2.findStreamStarts(new java.io.ByteArrayInputStream(fileBytes))
    assert(starts.length == 3 && starts.head == 0L)
    // ranges honor the minimum split size
    assert(WikiBz2.planRanges(starts, fileBytes.length, 1L).length == 3)
    assert(WikiBz2.planRanges(starts, fileBytes.length, fileBytes.length).length == 1)

    val dir = Files.createTempDirectory("wikibz2").toString
    Files.write(Paths.get(s"$dir/multi.xml.bz2"), fileBytes)

    val split = spark.read.format(classOf[graft.sources.WikiXmlSource].getName)
      .option("bz2MinSplitBytes", 1L).load(s"$dir/multi.xml.bz2")
    val whole = spark.read.format(classOf[graft.sources.WikiXmlSource].getName)
      .option("splitBz2", false).load(s"$dir/multi.xml.bz2")
    assert(split.rdd.getNumPartitions == 3)
    assert(whole.rdd.getNumPartitions == 1)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("namespace", "title", "timestamp", "text", "rev_ord")
        .collect().map(_.toSeq).toSet
    val s = rows(split)
    assert(s.size == 36 && s == rows(whole))
    // pruned path (byte lexer) agrees across the fragment adapter too
    assert(split.select("title", "rev_ord").collect().toSet ==
      whole.select("title", "rev_ord").collect().toSet)
    // pushed namespace filter on a split read
    assert(split.filter(col("namespace") === "0").count() ==
      whole.filter(col("namespace") === "0").count())
  }

  test("reader closes streams on early exit: no fd growth under limit(1)") {
    def openFds(): Int = new java.io.File("/proc/self/fd").list().length
    val dir = Files.createTempDirectory("wikifd").toString
    (0 until 4).foreach(i => Files.copy(Paths.get(fixture), Paths.get(s"$dir/f$i.xml")))
    val df = WikiXml.read(spark, s"$dir/*.xml")
    df.limit(1).collect() // warm codepaths before baselining
    val before = openFds()
    (0 until 10).foreach(_ => df.limit(1).collect())
    val after = openFds()
    assert(after <= before + 2, s"fd leak: $before -> $after")
  }

  test("parseStream handles CDATA, comments, entities, attributes, split character runs") {
    val xml =
      """<mediawiki>
        |<page><title>T&amp;1</title><ns>0</ns><id>1</id>
        |<!-- a comment between elements -->
        |<revision><id>10</id><timestamp>2020-01-01T00:00:00Z</timestamp>
        |<text xml:space="preserve" bytes="20">before <!-- inline --> after &lt;tag&gt; <![CDATA[raw <cdata> & body]]> end</text>
        |</revision>
        |<revision><id>11</id><timestamp>2020-01-02T00:00:00Z</timestamp>
        |<minor/><text/></revision>
        |</page>
        |</mediawiki>""".stripMargin
    val in = new java.io.ByteArrayInputStream(xml.getBytes("UTF-8"))
    val revs = WikiXml.parseStream(in).toList
    assert(revs.length == 2)
    assert(revs.head.title == "T&1")
    // comment dropped, entities decoded, CDATA kept verbatim
    assert(revs.head.text == "before  after <tag> raw <cdata> & body end")
    assert(revs(1).text == "")
    assert(revs.map(_.revOrd) == List(0L, 1L))
  }

  test("WikiPipeline end to end: manifest -> skip -> parse -> downsample -> partitioned sink") {
    import graft.sources.WikiPipeline
    val dir = Files.createTempDirectory("wikipipe").toString
    Files.copy(Paths.get(fixture), Paths.get(s"$dir/fixture.xml"))
    Files.writeString(Paths.get(s"$dir/manifest.json"),
      """{"jobs":{"metahistory7zdump":{"files":{"fixture.xml":{"size":1}}}}}""")
    val out = s"$dir/out"
    val n = WikiPipeline.runFromManifest(spark, s"$dir/manifest.json", dir, out, wiki = "testwiki")
    assert(n == 1)
    val written = spark.read.parquet(out)
    assert(written.columns.toSet ==
      Set("namespace", "title", "timestamp", "text", "wiki", "month"))
    val expected = WikiXml.dailySnapshots(WikiXml.read(spark, fixture)).count()
    assert(written.count() == expected)
    assert(written.select("wiki").distinct().collect().map(_.getString(0)).toSeq == Seq("testwiki"))
    // second run with the output listed as done: the S2 anti-join skips it
    import spark.implicits._
    val done = Seq("fixture.xml.parquet").toDF("name")
    val n2 = WikiPipeline.runFromManifest(spark, s"$dir/manifest.json", dir, out,
      wiki = "testwiki", done = Some(done))
    assert(n2 == 0)
    assert(spark.read.parquet(out).count() == expected) // untouched
  }

  test("dailySnapshots reproduces the reference pipeline on the fixture") {
    val snaps = WikiXml.dailySnapshots(WikiXml.read(spark, fixture))
      .orderBy("title", "timestamp")
      .collect()
      .map(r => (r.getString(1), r.getTimestamp(2).toString, r.getString(3)))

    assert(snaps.toList == List(
      ("Alpha", "2001-01-15 00:00:00.0", "alpha at epoch"),          // epoch inclusive
      ("Alpha", "2001-01-16 08:00:00.0", "alpha next day early"),    // earliest per day
      ("EmptyText", "2004-01-02 03:04:05.0", ""),                    // empty <text/>
      ("EmptyText", "2004-01-03 03:04:05.0", ""),                    // missing <text>
      ("Ties", "2003-07-08 09:10:11.0", "first in document order"))) // doc-order tie-break
    // BeforeEpoch (all < epoch) and Talk:Beta (ns=1) contribute nothing
  }

  test("writeSnapshots partitions by wiki/month and round-trips; incrementalSkip anti-joins") {
    import spark.implicits._
    val out = Files.createTempDirectory("wikisink").toString + "/snaps"
    val snaps = WikiXml.dailySnapshots(WikiXml.read(spark, fixture))
    Sink.writeSnapshots(snaps, out, wiki = "testwiki")

    assert(Files.exists(Paths.get(s"$out/wiki=testwiki/month=2001-01")))
    val back = spark.read.parquet(out)
    assert(back.count() == 5)
    // 2001-01 (x2), 2003-07, 2004-01 (x2)
    assert(back.select("month").distinct().count() == 3)

    // S2 semantics: work items minus already-produced outputs
    val work = Seq("f1", "f2", "f3").toDF("item")
    val done = Seq("f1.parquet", "f3.parquet").toDF("blob")
    val todo = Sink.incrementalSkip(work, "item", done, "blob", "parquet")
      .as[String].collect().toSet
    assert(todo == Set("f2"))
    assert(Sink.incrementalSkip(work, "item", done, "blob", "parquet",
      overwrite = true).count() == 3)
  }
}
