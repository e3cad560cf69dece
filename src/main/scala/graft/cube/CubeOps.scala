package graft.cube

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar transforms (SURVEY.md §2.8) as pure Catalyst
  * column expressions — zero UDFs, so every op stays inside whole-stage
  * codegen and the pipeline is one fused projection over the scan.
  */
object CubeOps {

  /** Fiscal-year normalization (helpers.py:86-101):
    * "2017"→"2017", "2017/18"→"2018", "2017/2018"→"2018",
    * anything else → "1900" sentinel.
    */
  def fixRefYear(c: Column): Column =
    when(length(c) === 4, c)
      .when(length(c) === 7, concat(substring(c, 1, 2), substring(c, 6, 2)))
      .when(length(c) === 9, substring(c, 6, 4))
      .otherwise(lit("1900"))

  /** Year string → Jan 1 timestamp (dfhandler.py:682-683). */
  def refYearToJan1(c: Column): Column =
    to_timestamp(concat(c, lit("-01-01")))

  /** DGUID literal cleanup: drop dots, 201A→2015A (dfhandler.py:678). */
  def cleanDguid(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\.", ""), "201A", "2015A")

  /** Justice-table DGUID repair (dfhandler.py:597-617): pad short
    * DGUIDs with vintage + police-district level, fix schema typos,
    * re-vintage CMAs for years ≥ 2016, and two CA/CMA boundary fixes.
    * Applies only to subject code 35 and non-null DGUIDs.
    */
  def fixDguid(refYear: Column, dguid: Column, pidStr: Column): Column = {
    val vintage = when(refYear.cast("int") < 2016, lit("2016")).otherwise(refYear)
    val padded = when(length(dguid) < 10, concat(vintage, lit("A0025"), dguid))
      .otherwise(dguid)
    val preVintage = regexp_replace(
      regexp_replace(padded, "2011B", "2011S"),
      "2011S05031", "2011S0503001")
    val reVintaged = when(refYear.cast("int") >= 2016,
      regexp_replace(preVintage, lit("2011S0503"), concat(refYear, lit("S0503"))))
      .otherwise(preVintage)
    val postFix = regexp_replace(
      regexp_replace(reVintaged, "2011S0503522", "2011S0504522"),
      "2011S0503810", "2011S0504810")
    when(substring(pidStr, 1, 2) === "35" && dguid.isNotNull, postFix)
      .otherwise(dguid)
  }

  /** Geo level = DGUID chars [4:9] (dfhandler.py:685, format doc 599). */
  def geoLevelId(dguid: Column): Column = substring(dguid, 5, 5)

  /** Strip the leading (geography) coordinate element
    * (dfhandler.py:210-214).
    */
  def stripGeography(coordinate: Column): Column =
    regexp_replace(coordinate, "^([^.]+\\.)", "")

  /** IndicatorCode = pid.coordinate-sans-geo.REF_DATE-01-01, capped at
    * 100 chars (dfhandler.py:210-214, 299).
    */
  def indicatorCode(coordinate: Column, refDate: Column, pidStr: Column): Column =
    substring(concat(pidStr, lit("."), stripGeography(coordinate),
      lit("."), refDate, lit("-01-01")), 1, 100)

  /** IndicatorValueCode = DGUID.IndicatorCode, ≤100 (dfhandler.py:451, 458). */
  def indicatorValueCode(dguid: Column, indCode: Column): Column =
    substring(concat(dguid, lit("."), indCode), 1, 100)

  /** Vector id: strip "v", cast int (dfhandler.py:684). */
  def vectorId(v: Column): Column =
    regexp_replace(v, "v", "").cast("int")

  /** CA/CMAP/CAP → CMA geo level collapse (dfhandler.py:160-161). */
  def caToCma(geoLevel: Column): Column =
    regexp_replace(geoLevel, "S0504|S0505|S0506", "S0503")

  /** HTML display list (dfhandler.py:87-90):
    * `<ul><li>year<li>member1<li>member2</li></ul>`.
    */
  def dimensionUl(refYear: Column, nameLong: Column): Column =
    concat(lit("<ul><li>"), refYear, lit("<li>"),
      regexp_replace(nameLong, " _ ", "<li>"), lit("</li></ul>"))

  /** nth element of a delimited list, python-style negative indexing,
    * "" when out of range (helpers.py:104-113). ANSI-safe via `get`.
    */
  def nthFromDelimited(c: Column, delim: String, n: Int): Column = {
    val arr = split(c, java.util.regex.Pattern.quote(delim))
    val idx0 = if (n < 0) size(arr) + n else lit(n)
    coalesce(get(arr, idx0), lit(""))
  }

  /** "02. " member display prefix (dfhandler.py:102-104). */
  def memberPrefix(order: Column): Column =
    concat(lpad(order.cast("string"), 2, "0"), lit(". "))

  /** Strip a numeric sort prefix like "02. " (dfhandler.py:56-58). */
  def stripSortPrefix(c: Column): Column =
    ltrim(regexp_replace(c,
      "^(?:(?:0){0,3}[0-9]|(?:0){0,2}[1-9][0-9]|(?:0){0,1}[1-9][0-9][0-9])\\.", ""))

  /** Generic indicator code: 2nd-to-last coordinate element → "%"
    * (dfhandler.py:635-644). Null when the code has < 2 non-geo
    * dimensions.
    * Ex: "13100778.4.1.2.1.2018-01-01" → "13100778.4.1.%.1.2018-01-01"
    */
  def genericIndicatorCode(indCode: Column): Column = {
    val p = split(indCode, "\\.")
    when(size(p) > 3,
      concat(
        array_join(slice(p, lit(1), size(p) - 3), "."),
        lit(".%."),
        array_join(slice(p, -2, 2), ".")))
      .otherwise(lit(null).cast("string"))
  }

  /** T-SQL value-format fragment for generated queries
    * (dfhandler.py:647-666 — chart-type/uom variants intentionally
    * disabled in the reference; locale is the only variable).
    */
  def uomFormatSql(lang: String): String = {
    val loc = if (lang == "fr") "fr-CA" else "en-US"
    s"Format(iv.value, 'N', '$loc')"
  }

  /** Variable-length dummy subject-code suffix (helpers.py:58-61). */
  def dummySubjectSuffix(code: String): String =
    if (code.length > 4) "99" else "9999"

  /** First `/`-partitioned remainder, or the original when no match
    * (helpers.py:116-121).
    */
  def partitionedAfter(s: String, delim: String): String = {
    val i = s.indexOf(delim)
    if (i >= 0 && i + delim.length < s.length) s.substring(i + delim.length) else s
  }
}
