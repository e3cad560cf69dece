package graft.io

import java.time.LocalDate

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.cube.{CubeMetadata, Dimension, Member, ProductDefaults}

/** Parsers for WDS-shaped JSON payloads (FIXTURES.md §A2-A4,
  * scwds.py:11-32, 125-145, 147-184). This environment has no egress,
  * so the HTTP layer is out of scope: these consume locally staged
  * response bodies — the driver-side control plane of the pipeline
  * (S2-S6 in SURVEY.md §2.1). Uses Jackson, which ships with Spark.
  */
object Wds {

  private val mapper = new ObjectMapper()

  private def parse(json: String): JsonNode = mapper.readTree(json)

  /** `getCubeMetadata` object → CubeMetadata (scwds.py:11-32,
    * multi-subject-code disambiguation: prefer the code whose prefix
    * matches the product id, scwds.py:51-65).
    */
  def cubeMetadata(json: String): CubeMetadata = {
    val o = {
      val root = parse(json)
      if (root.isArray) root.get(0).get("object") else root
    }
    val pid = o.get("productId").asLong()
    val subjectCodes = {
      val n = o.get("subjectCode")
      if (n == null || n.isNull) Seq.empty[String]
      else if (n.isArray) (0 until n.size()).map(n.get(_).asText())
      else Seq(n.asText())
    }
    val subject = subjectCodes
      .find(c => pid.toString.startsWith(c.take(2)))
      .orElse(subjectCodes.headOption)
      .getOrElse(pid.toString.take(2))
    val surveys = {
      val n = o.get("surveyCode")
      if (n == null || n.isNull) Seq.empty[String]
      else if (n.isArray) (0 until n.size()).map(n.get(_).asText())
      else Seq(n.asText())
    }
    val dims = {
      val n = o.get("dimension")
      (0 until n.size()).map { i =>
        val d = n.get(i)
        val members = {
          val m = d.get("member")
          (0 until m.size()).map { j =>
            val mm = m.get(j)
            val uom = mm.get("memberUomCode")
            Member(
              mm.get("memberId").asInt(),
              mm.get("memberNameEn").asText(),
              mm.get("memberNameFr").asText(),
              if (uom == null || uom.isNull) None else Some(uom.asInt()))
          }
        }
        Dimension(
          d.get("dimensionPositionId").asInt(),
          d.get("dimensionNameEn").asText(),
          d.get("dimensionNameFr").asText(),
          d.has("hasUom") && d.get("hasUom").asBoolean(),
          members)
      }
    }
    CubeMetadata(
      productId = pid,
      titleEn = o.get("cubeTitleEn").asText(),
      titleFr = o.get("cubeTitleFr").asText(),
      startDate = LocalDate.parse(o.get("cubeStartDate").asText()),
      endDate = LocalDate.parse(o.get("cubeEndDate").asText()),
      releaseTime = o.get("releaseTime").asText(),
      frequencyCode = o.get("frequencyCode").asInt(),
      surveyCode = surveys.headOption.getOrElse("0"),
      subjectCode = subject,
      dimensions = dims)
  }

  /** `getChangedCubeList/{date}` → changed product ids (scwds.py:125-145). */
  def changedCubeList(json: String): Seq[Long] = {
    val root = parse(json)
    if (root.get("status").asText() != "SUCCESS") Seq.empty
    else {
      val arr = root.get("object")
      (0 until arr.size()).map(arr.get(_).get("productId").asLong()).distinct
    }
  }

  /** `products_to_merge.json` → master pid → sibling pids
    * (json_handler.py:11-74).
    */
  def mergeConfig(json: String): Map[Long, Seq[Long]] = {
    val root = parse(json)
    val it = root.properties().iterator()
    val out = Seq.newBuilder[(Long, Seq[Long])]
    while (it.hasNext) {
      val e = it.next()
      val linked = e.getValue.get("linked_tables")
      out += e.getKey.toLong ->
        (0 until linked.size()).map(linked.get(_).asText().toLong)
    }
    out.result().toMap
  }

  /** Serialize a merge config back to products_to_merge.json form
    * (the read-modify-write of json_handler.py:87-96).
    */
  def mergeConfigJson(config: Map[Long, Seq[Long]]): String =
    config.toSeq.sortBy(_._1).map { case (master, siblings) =>
      s""""$master": {"linked_tables": [${siblings.map(s => s""""$s"""").mkString(", ")}]}"""
    }.mkString("{", ", ", "}")

  /** `product_defaults.json` entry for a pid, falling back to the
    * "default" entry (json_handler.py:29-37, product_defaults.json:498-505).
    */
  def productDefaults(json: String, pid: Long): ProductDefaults = {
    val root = parse(json)
    val node = if (root.has(pid.toString)) root.get(pid.toString) else root.get("default")
    ProductDefaults(
      node.get("default_breaks_algorithm_id").asInt(),
      node.get("default_breaks").asText(),
      node.get("primary_chart_type_id").asInt(),
      node.get("color_to").asText(),
      node.get("color_from").asText(),
      node.get("related_chart_type_id").asInt())
  }

  /** Code-set subsets used by the pipeline: uom code → (EN, FR) and
    * subject code triples (scwds.py:147-184, helpers.py:129-167).
    */
  def uomCodeset(json: String): Map[Int, (String, String)] = {
    val arr = parse(json).get("object").get("uom")
    (0 until arr.size()).map { i =>
      val n = arr.get(i)
      n.get("memberUomCode").asInt() ->
        (n.get("memberUomEn").asText(), n.get("memberUomFr").asText())
    }.toMap
  }

  /** Optional `jdbc.json` sink config: {"url": "...",
    * "properties": {"user": "...", …}} (the engine-parameter role of
    * scdb.py:27-30, staged instead of env-injected).
    */
  def jdbcConfig(json: String): (String, Map[String, String]) = {
    val root = parse(json)
    val props = Option(root.get("properties")).filterNot(_.isNull).map { p =>
      val it = p.properties().iterator()
      val out = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); out += e.getKey -> e.getValue.asText() }
      out.result()
    }.getOrElse(Map.empty)
    val url = Option(root.get("url")).filterNot(_.isNull).map(_.asText())
      .getOrElse(throw new IllegalArgumentException(
        """jdbc.json must have a "url" key (e.g. {"url": "jdbc:…"})"""))
    (url, props)
  }

  def subjectCodeset(json: String): Seq[(String, String, String)] = {
    val arr = parse(json).get("object").get("subject")
    (0 until arr.size()).map { i =>
      val n = arr.get(i)
      (n.get("subjectCode").asText(), n.get("subjectEn").asText(),
        n.get("subjectFr").asText())
    }
  }
}
