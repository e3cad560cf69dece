package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.io.WdsHttp
import graft.io.WdsHttp.{Response, Transport, WdsHttpException}

/** HTTP client semantics with a scripted stub transport (the
  * environment has no egress): bounded retry with exponential backoff
  * on transient statuses, fail-fast on permanent ones, and the
  * two-step download-link follow with zip validation.
  */
class WdsHttpSpec extends AnyFunSuite {

  /** Plays back a queue of responses/throwables and records calls. */
  private class Stub(script: Seq[Either[Exception, Response]]) extends Transport {
    val calls = mutable.Buffer.empty[(String, String, Option[String])]
    private val it = script.iterator
    def send(method: String, url: String, body: Option[String]): Response = {
      calls += ((method, url, body))
      it.next() match {
        case Left(e) => throw e
        case Right(r) => r
      }
    }
  }

  private def ok(text: String) = Right(Response(200, text.getBytes(UTF_8)))
  private def status(s: Int) = Right(Response(s, Array.emptyByteArray))

  private def client(stub: Stub, sleeps: mutable.Buffer[Long] = mutable.Buffer.empty) =
    new WdsHttp(stub, baseUrl = "http://wds", maxAttempts = 3,
      backoffMs = 100L, sleeper = sleeps += _)

  test("success after transient failures, with exponential backoff") {
    val stub = new Stub(Seq(
      status(503),
      Left(new java.io.IOException("connection reset")),
      ok("""{"status": "SUCCESS", "object": [{"productId": 101}, {"productId": 102}]}""")))
    val sleeps = mutable.Buffer.empty[Long]
    val pids = client(stub, sleeps).changedCubeList("2022-03-01")
    assert(pids == Seq(101L, 102L))
    assert(stub.calls.length == 3)
    assert(stub.calls.head._2 == "http://wds/getChangedCubeList/2022-03-01")
    assert(sleeps.toSeq == Seq(100L, 200L)) // 1x then 2x backoff
  }

  test("gives up after maxAttempts transient failures") {
    val stub = new Stub(Seq(status(503), status(503), status(503), status(503)))
    val e = intercept[WdsHttpException] { client(stub).codeSets() }
    assert(e.getMessage.contains("after 3 attempts"))
    assert(stub.calls.length == 3) // bounded — no 4th call
  }

  test("fails fast on a permanent status (404), no retry") {
    val stub = new Stub(Seq(status(404), ok("unreachable")))
    intercept[WdsHttpException] { client(stub).codeSets() }
    assert(stub.calls.length == 1)
  }

  test("cubeMetadata POSTs the productId body and parses the response") {
    val meta =
      """[{"status": "SUCCESS", "object": {"productId": 99100001,
        |"cubeTitleEn": "T", "cubeTitleFr": "Tf",
        |"cubeStartDate": "2019-01-01", "cubeEndDate": "2020-01-01",
        |"releaseTime": "2022-03-01 08:30:00", "frequencyCode": 12,
        |"surveyCode": ["5000"], "subjectCode": ["9910"],
        |"dimension": [{"dimensionPositionId": 1, "dimensionNameEn": "Geography",
        |  "dimensionNameFr": "G", "hasUom": false,
        |  "member": [{"memberId": 1, "memberNameEn": "Canada",
        |    "memberNameFr": "Canada", "memberUomCode": null}]}]}}]""".stripMargin
    val stub = new Stub(Seq(ok(meta)))
    val m = client(stub).cubeMetadata(99100001L)
    assert(m.productId == 99100001L && m.titleEn == "T")
    val (method, url, body) = stub.calls.head
    assert(method == "POST" && url == "http://wds/getCubeMetadata")
    assert(body.contains("""[{"productId": 99100001}]"""))
  }

  test("downloadFullTable follows the link and stages a valid zip") {
    val zipBytes = {
      val bos = new ByteArrayOutputStream()
      val zos = new ZipOutputStream(bos)
      zos.putNextEntry(new ZipEntry("42.csv"))
      zos.write("REF_DATE\n2019\n".getBytes(UTF_8))
      zos.closeEntry(); zos.close()
      bos.toByteArray
    }
    val stub = new Stub(Seq(
      ok("""{"status": "SUCCESS", "object": "http://dl/42-eng.zip"}"""),
      Right(Response(200, zipBytes))))
    val dir = Files.createTempDirectory("graft_wds_dl").toString
    val path = client(stub).downloadFullTable(42L, dir)
    assert(path.getFileName.toString == "42.zip")
    assert(graft.io.Staging.isValidZip(path.toString))
    // second request went to the ABSOLUTE link, not the base url
    assert(stub.calls(1)._2 == "http://dl/42-eng.zip")
  }

  test("downloadFullTable surfaces a FAILED link resolution") {
    val stub = new Stub(Seq(ok("""{"status": "FAILED", "object": ""}""")))
    val dir = Files.createTempDirectory("graft_wds_dl2").toString
    val e = intercept[WdsHttpException] {
      client(stub).downloadFullTable(42L, dir)
    }
    assert(e.getMessage.contains("FAILED"))
  }
}
