package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.operators.Warc

class WarcSpec extends SparkSpec {

  private def rec(id: Long, body: String): Array[Byte] =
    Warc.frame(s"http://host${id % 13}.example/p$id", s"<urn:graft:$id>",
      body.getBytes(UTF_8))

  private def cat(parts: Array[Byte]*): Array[Byte] =
    parts.reduce(_ ++ _)

  test("frame → parse roundtrip: headers, octet length, payload bytes") {
    val blob = cat(rec(1, "hello world"), rec(2, "héllo wörld"), rec(3, ""))
    val (rs, corrupt) = Warc.parseRecords(blob)
    assert(corrupt == 0)
    assert(rs.length == 3)
    assert(rs.map(_.headers("warc-record-id")) ==
      Seq("<urn:graft:1>", "<urn:graft:2>", "<urn:graft:3>"))
    assert(rs.head.headers("warc-target-uri") == "http://host1.example/p1")
    assert(rs.head.headers.size == 4)
    // octets, not chars: the accented payload is longer encoded
    assert(rs(1).headers("content-length").toInt == "héllo wörld".getBytes(UTF_8).length)
    assert(new String(rs(1).payload, UTF_8) == "héllo wörld")
    assert(rs(2).payload.isEmpty)
  }

  test("corrupt records are counted, not fatal: neighbors still parse") {
    // missing version line: a header block with no WARC/1.0 marker
    val noVersion = ("WARC-Type: response\r\nContent-Length: 2\r\n\r\nxx\r\n\r\n")
      .getBytes(UTF_8)
    val (rs1, c1) = Warc.parseRecords(cat(rec(1, "first record"), noVersion,
      rec(2, "second record")))
    assert(rs1.map(_.headers("warc-record-id")) ==
      Seq("<urn:graft:1>", "<urn:graft:2>"))
    assert(c1 == 1)

    // truncated Content-Length at the tail: declared longer than the bytes
    val truncated = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 9999\r\n\r\nshort").getBytes(UTF_8)
    val (rs2, c2) = Warc.parseRecords(cat(rec(1, "ok record here"), truncated))
    assert(rs2.length == 1 && c2 == 1)

    // unparseable length
    val badLen = ("WARC/1.0\r\nContent-Length: -4\r\n\r\n").getBytes(UTF_8)
    val (rs3, c3) = Warc.parseRecords(cat(badLen, rec(7, "after the bad one")))
    assert(rs3.length == 1 && c3 == 1)
    assert(rs3.head.headers("warc-record-id") == "<urn:graft:7>")

    // empty / separator-only blob: nothing, no phantom corruption
    assert(Warc.parseRecords(Array.emptyByteArray) == (Seq(), 0))
    assert(Warc.parseRecords("\r\n\r\n".getBytes(UTF_8)) == (Seq(), 0))
  }

  test("disk roundtrip: binaryFile scan of written .warc files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_warc").toFile
    val files = Warc.warcFiles(spark, sfDir)
      .as[(Long, Array[Byte])].collect()
    assert(files.length == math.ceil(500.0 / Warc.RecordsPerFile).toInt)
    files.foreach { case (fid, blob) =>
      Files.write(new java.io.File(dir, s"part-$fid.warc").toPath, blob)
    }
    val back = Warc.readWarcDir(spark, dir.getAbsolutePath)
    assert(back.count() == 500L)
    // spot-check one record against the source table
    val r0 = back.where(col("record_id") === "<urn:graft:0>").collect().head
    val t0 = graft.sources.Tables.table(spark, sfDir, "documents")
      .where(col("doc_id") === 0L).select("text").collect().head.getString(0)
    assert(new String(r0.getAs[Array[Byte]]("payload"), UTF_8) == t0)
    assert(r0.getAs[Long]("content_length") == t0.getBytes(UTF_8).length.toLong)
  }

  test("warc extract parity: the composed pipeline equals html-extract") {
    // the WARC hop must be transparent: parsing payloads back out of
    // the containers and extracting equals extracting the pages
    // directly, column for column
    val viaWarc = Warc.warcExtract(spark, sfDir).drop("target_uri")
    val direct = graft.operators.Html.htmlExtract(spark, sfDir)
    assert(viaWarc.columns.toSeq == direct.columns.toSeq)
    assert(viaWarc.collect().toSeq == direct.collect().toSeq)
  }

  test("warc extract: a corrupt container record drops only its page") {
    import spark.implicits._
    // re-frame two pages, garble the first record's length header
    val pages = graft.operators.Html.htmlPages(spark, sfDir)
      .as[(Long, String, String, String)].collect().take(2)
    val good = pages.map { case (id, _, _, html) =>
      Warc.frame(s"http://host${id % 13}.example/p$id",
        s"<urn:graft:$id>", html.getBytes(UTF_8))
    }
    val garbled = ("WARC/1.0\r\nWARC-Record-ID: <urn:graft:999>\r\n" +
      "Content-Length: 99999999\r\n\r\nshort").getBytes(UTF_8)
    val (rs, corrupt) = Warc.parseRecords(cat(garbled, good(0), good(1)))
    assert(corrupt == 1)
    assert(rs.map(_.headers("warc-record-id")) ==
      pages.map(p => s"<urn:graft:${p._1}>").toSeq)
  }

  test("warc writer sink: files land deterministically; a planted corrupt file loses only its bad record") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_warc_sink").toString
    Warc.writeWarcDir(spark, sfDir, base)
    val nDocs = graft.sources.Tables.table(spark, sfDir, "documents").count()
    // one container per RecordsPerFile docs, named part-<fid>%05d.warc
    val files = new java.io.File(base).listFiles().filter(_.getName.endsWith(".warc"))
    assert(files.length == ((nDocs + Warc.RecordsPerFile - 1) / Warc.RecordsPerFile).toInt)
    assert(files.forall(_.getName.matches("part-\\d{5}\\.warc")))
    // the production reader recovers every document octet-exactly
    val back = Warc.readWarcDir(spark, base)
    assert(back.count() == nDocs)
    // re-run is idempotent: byte-identical files, same read-back census
    val sizes = files.map(f => f.getName -> f.length()).toMap
    Warc.writeWarcDir(spark, sfDir, base)
    new java.io.File(base).listFiles().filter(_.getName.endsWith(".warc"))
      .foreach(f => assert(f.length() == sizes(f.getName), f.getName))
    // planted corruption: a landed file with one good + one truncated
    // record surfaces the good record and loses ONLY the bad one
    val good = Warc.frame("http://host0.example/px", "<urn:graft:999999>",
      "planted payload".getBytes(UTF_8))
    val bad = ("WARC/1.0\r\nWARC-Record-ID: <urn:graft:999998>\r\n" +
      "Content-Length: 99999999\r\n\r\nshort").getBytes(UTF_8)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, "part-99999.warc"), cat(good, bad))
    val after = Warc.readWarcDir(spark, base)
    assert(after.count() == nDocs + 1)
    val planted = after.where(col("record_id") === "<urn:graft:999999>").collect()
    assert(planted.length == 1 &&
      new String(planted(0).getAs[Array[Byte]]("payload"), UTF_8) == "planted payload")
    val (_, corrupt) = Warc.parseRecords(cat(good, bad))
    assert(corrupt == 1)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
