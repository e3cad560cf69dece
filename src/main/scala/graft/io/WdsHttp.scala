package graft.io

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import graft.cube.CubeMetadata

/** WDS HTTP client skeleton (scwds.py:68-123, 219-245): session with
  * bounded retries + exponential backoff on transient statuses,
  * JSON GET/POST helpers for the WDS endpoints, and the two-step
  * full-table download (ask for the per-product zip link, then follow
  * it and stage the bytes).
  *
  * The byte-level transport is INJECTABLE and this environment is
  * zero-egress: tests drive the client with a scripted stub; a real
  * deployment supplies a `java.net.http.HttpClient`-backed transport
  * ([[WdsHttp.jdkTransport]], compiled but never exercised here).
  * Response parsing is delegated to the staged-body parsers in [[Wds]]
  * so the HTTP layer adds transport concerns only.
  */
object WdsHttp {

  final case class Response(status: Int, body: Array[Byte]) {
    def text: String = new String(body, UTF_8)
  }

  /** Minimal transport seam: one request → one response (or throw). */
  trait Transport {
    def send(method: String, url: String, body: Option[String]): Response
  }

  /** Statuses the reference's retry adapter re-attempts
    * (scwds.py:74-80: total=5, backoff on 429/5xx).
    */
  val RetryStatuses: Set[Int] = Set(429, 500, 502, 503, 504)

  final class WdsHttpException(msg: String) extends RuntimeException(msg)

  /** Production transport over the JDK HTTP client. Compiled, not
    * exercised in tests (zero-egress environment).
    */
  def jdkTransport(timeoutSeconds: Long = 30): Transport = new Transport {
    private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
      // the reference client (python requests) follows redirects; the
      // JDK default is Redirect.NEVER, which would turn a CDN 301/302
      // on the download link into a permanent failure
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    def send(method: String, url: String, body: Option[String]): Response = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
      val req = (method match {
        case "POST" => b.header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body.getOrElse("")))
        case _ => b.GET()
      }).build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      Response(resp.statusCode(), resp.body())
    }
  }
}

class WdsHttp(
    transport: WdsHttp.Transport,
    baseUrl: String = "https://www150.statcan.gc.ca/t1/wds/rest",
    maxAttempts: Int = 5,
    backoffMs: Long = 1000L,
    sleeper: Long => Unit = Thread.sleep) {

  import WdsHttp._

  /** Bounded retry with exponential backoff (scwds.py:74-80): retry on
    * transport exceptions and the adapter's status list; any other
    * non-2xx fails fast (the reference surfaces it as a failed
    * product, main.py:145-146).
    */
  private def request(method: String, url: String, body: Option[String]): Response = {
    var attempt = 0
    while (true) {
      attempt += 1
      val failure: String =
        try {
          val r = transport.send(method, url, body)
          if (r.status >= 200 && r.status < 300) return r
          if (!RetryStatuses(r.status)) // fail fast on non-transient statuses
            throw new WdsHttpException(s"$method $url: status ${r.status}")
          s"status ${r.status}"
        } catch {
          case e: WdsHttpException => throw e
          case e: Exception => e.getMessage // connect/read error: retryable
        }
      if (attempt >= maxAttempts)
        throw new WdsHttpException(
          s"$method $url failed after $attempt attempts: $failure")
      sleeper(backoffMs << (attempt - 1)) // 1x, 2x, 4x… backoff
    }
    throw new IllegalStateException("unreachable")
  }

  def get(path: String): String = request("GET", baseUrl + path, None).text

  def postJson(path: String, body: String): String =
    request("POST", baseUrl + path, Some(body)).text

  /** getChangedCubeList/{date} → changed pids (scwds.py:125-145). */
  def changedCubeList(date: String): Seq[Long] =
    Wds.changedCubeList(get(s"/getChangedCubeList/$date"))

  /** getCubeMetadata (POST [{"productId": pid}], scwds.py:11-32). */
  def cubeMetadata(pid: Long): CubeMetadata =
    Wds.cubeMetadata(postJson("/getCubeMetadata", s"""[{"productId": $pid}]"""))

  /** getCodeSets response body — staged verbatim so the existing
    * [[Wds.uomCodeset]]/[[Wds.subjectCodeset]] parsers consume it.
    */
  def codeSets(): String = get("/getCodeSets")

  /** Two-step full-table download (scwds.py:219-245): resolve the
    * per-product zip link, follow it (absolute URL, not base-relative),
    * stage the bytes, and validate the zip magic like the reference's
    * validity check. Returns the staged path.
    */
  def downloadFullTable(pid: Long, destDir: String, lang: String = "en"): Path = {
    val linkJson = get(s"/getFullTableDownloadCSV/$pid/$lang")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(linkJson)
    // guard the shape before dereferencing: a proxy can return 200
    // with a JSON body missing "status"/"object", and a bare NPE here
    // would lose the pid/endpoint context the per-product isolation
    // reporting relies on
    val status = Option(root.get("status")).filterNot(_.isNull).map(_.asText())
    if (!status.contains("SUCCESS"))
      throw new WdsHttpException(
        s"getFullTableDownloadCSV/$pid: status ${status.getOrElse("<missing>")}")
    val link = Option(root.get("object")).filterNot(_.isNull).map(_.asText())
      .getOrElse(throw new WdsHttpException(
        s"getFullTableDownloadCSV/$pid: SUCCESS response without a download link"))
    val bytes = request("GET", link, None).body
    Files.createDirectories(Paths.get(destDir))
    val dest = Paths.get(destDir, s"$pid.zip")
    Files.write(dest, bytes)
    if (!Staging.isValidZip(dest.toString))
      throw new WdsHttpException(s"downloaded $link is not a valid zip")
    dest
  }
}
