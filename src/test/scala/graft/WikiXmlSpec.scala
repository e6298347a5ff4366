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
