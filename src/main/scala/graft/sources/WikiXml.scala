package graft.sources

import java.io.InputStream
import java.sql.Timestamp
import java.time.LocalDateTime
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Streaming MediaWiki revision-history XML source — the reference's
  * decompress-scan + XML-event-scan operators (S4/S5,
  * /root/reference/main.py:172-175 and 135-164) re-expressed for Spark.
  *
  * Design, mirroring the reference's constraints:
  *  - **Never materialize a decompressed file.** The reference pipes
  *    `7z e -so` into `lxml.etree.iterparse`; here each Spark task opens
  *    its file as an InputStream (`sc.binaryFiles` → PortableDataStream),
  *    optionally wrapped by the Hadoop codec matching the extension
  *    (.bz2/.gz — real wiki dumps ship multistream .bz2, which Hadoop
  *    decompresses natively; there is no 7z codec on the JVM classpath,
  *    same conclusion as SURVEY.md §4), and parses it with StAX pull
  *    events — the JVM's SAX-style streaming model, equivalent to
  *    iterparse's end-element events.
  *  - **One file = one partition = one task** (the reference's
  *    per-file `Pool` worker, main.py:99). A page's revisions are
  *    contiguous within a file, so per-page state lives entirely inside
  *    one task — never split across partitions.
  *  - **The source emits raw revisions**; filtering (ns=0, epoch) and the
  *    daily downsample are separate declarative operators
  *    ([[graft.operators.Diachronic]]), so Catalyst can prune/push rather
  *    than having the semantics baked into the parser like the
  *    reference's parse_revision (main.py:151-161).
  *
  * Output schema = the reference's frozen 4-column table (main.py:111):
  * namespace/title as raw strings, timestamp as UTC-naive microseconds
  * (trailing-Z strip, main.py:153), text with null→"" (main.py:156).
  */
object WikiXml {

  /** The reference's output schema (main.py:111), declared statically
    * (SURVEY.md §1.3 — no degenerate inferred schemas on empty files),
    * plus `rev_ord` — the revision's document-order index within its page.
    * The reference resolves identical-timestamp ties by document order
    * (first wins, main.py:154); a parallel engine needs that order as
    * data, so the parser captures it and [[dailySnapshots]] tie-breaks on
    * it (then drops it from the 4-column output). */
  val schema: StructType = StructType(Seq(
    StructField("namespace", StringType),
    StructField("title", StringType),
    StructField("timestamp", TimestampType),
    StructField("text", StringType),
    StructField("rev_ord", LongType)))

  final case class Revision(
      namespace: String, title: String, timestamp: Timestamp, text: String,
      revOrd: Long)

  /** Pull-parse one revision-history XML stream into revisions.
    * Dispatch mirrors /root/reference/main.py:135-164: element end-events
    * for title/ns populate page state (guaranteed to fire before the
    * page's revisions — dump element order), revision-end emits, page-end
    * resets. Unknown tags no-op (the reference's defaultdict). Lazily
    * evaluated; the stream is consumed incrementally. */
  def parseStream(in: InputStream): Iterator[Revision] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    // dumps are untrusted input: no DTDs / external entities
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val reader = factory.createXMLStreamReader(in)

    new Iterator[Revision] {
      private var title: String = _
      private var ns: String = _
      private var revTs: Timestamp = _
      private var revText: String = ""
      private var revOrd: Long = 0L
      private var pending: Revision = _
      private var done = false
      // current element path tracking: we only read text at known leaves
      private var inPage = false
      private var inRevision = false

      private def textOf(r: XMLStreamReader): String = {
        val sb = new StringBuilder
        var ev = r.next()
        while (ev != XMLStreamConstants.END_ELEMENT) {
          if (ev == XMLStreamConstants.CHARACTERS || ev == XMLStreamConstants.CDATA)
            sb.append(r.getText)
          ev = r.next()
        }
        sb.toString
      }

      private def parseTs(s: String): Timestamp =
        // ISO8601 with trailing Z, stored as UTC-naive (main.py:153)
        Timestamp.valueOf(LocalDateTime.parse(s.stripSuffix("Z")))

      @annotation.tailrec
      private def advance(): Unit = {
        if (!reader.hasNext) { done = true }
        else {
          reader.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              reader.getLocalName match {
                case "page" =>
                  inPage = true; title = null; ns = null; revOrd = 0L
                  advance()
                case "revision" if inPage =>
                  inRevision = true; revTs = null; revText = ""
                  advance()
                case "title" if inPage && !inRevision =>
                  title = textOf(reader); advance()
                case "ns" if inPage && !inRevision =>
                  ns = textOf(reader); advance()
                case "timestamp" if inRevision =>
                  revTs = parseTs(textOf(reader)); advance()
                case "text" if inRevision =>
                  revText = textOf(reader); advance()
                case _ => advance()
              }
            case XMLStreamConstants.END_ELEMENT =>
              reader.getLocalName match {
                case "revision" if inRevision =>
                  inRevision = false
                  pending = Revision(ns, title, revTs,
                    if (revText == null) "" else revText, revOrd)
                  revOrd += 1L
                case "page" =>
                  inPage = false
                  advance()
                case _ => advance()
              }
            case XMLStreamConstants.END_DOCUMENT =>
              done = true
            case _ => advance()
          }
        }
      }

      override def hasNext: Boolean = {
        while (pending == null && !done) advance()
        pending != null
      }

      override def next(): Revision = {
        if (!hasNext) throw new NoSuchElementException
        val r = pending
        pending = null
        r
      }
    }
  }

  /** Read a directory/glob of (optionally compressed) revision-history XML
    * files as the 4-column revisions DataFrame. One task per file; each
    * task streams its file through the codec + StAX pipeline without
    * materializing it. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val sc = spark.sparkContext
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      sc.hadoopConfiguration)
    val rows = sc.binaryFiles(path).flatMap { case (file, pds) =>
      val codec = new CompressionCodecFactory(serConf.value)
        .getCodec(new Path(file))
      val raw = pds.open()
      val in = if (codec == null) raw else codec.createInputStream(raw)
      parseStream(in).map(r => Row(r.namespace, r.title, r.timestamp, r.text, r.revOrd))
    }
    spark.createDataFrame(rows, schema)
  }

  /** The reference's full per-file pipeline (filter ns=0 → epoch filter →
    * greedy daily downsample, main.py:151-161) as declarative ops over the
    * revisions table. Output: one row per (title, day) = the earliest
    * revision that day — SURVEY.md §2.4. */
  def dailySnapshots(revisions: DataFrame,
      epoch: String = graft.operators.Diachronic.DefaultEpoch): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.operators.Diachronic
      .firstPerDay(
        revisions.filter(col("namespace") === "0"),
        key = col("title"), ts = col("timestamp"), tieBreak = col("rev_ord"),
        payload = Seq("namespace" -> col("namespace"), "text" -> col("text")),
        epoch = epoch)
      .withColumnRenamed("key", "title")
      .select(col("namespace"), col("title"), col("first_ts").as("timestamp"), col("text"))
  }
}
