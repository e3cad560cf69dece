package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._

/** Property-based checks (SURVEY.md §5.2): combo cardinality, id
  * density, fiscal-year normalization, generic-code shape. Uses raw
  * ScalaCheck generators with fixed seeds (scalatestplus bridge is not
  * in the offline dependency set).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val dimGen: Gen[List[Int]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, Gen.chooseNum(1, 4)))

  test("combo cardinality = product of member counts (J14)") {
    samples(dimGen, 5).foreach { sizes =>
      val dims = Dimension(1, "Geography", "G", hasUom = false,
        Seq(Member(1, "Canada", "Canada", None))) +:
        sizes.zipWithIndex.map { case (k, i) =>
          Dimension(i + 2, s"Dim$i", s"DimFr$i", hasUom = false,
            (1 to k).map(m => Member(m, s"m$m", s"mf$m", None)))
        }
      val meta = MiniCube.meta.copy(dimensions = dims)
      val n = IndicatorBuilder.memberCombos(spark, meta).count()
      assert(n == sizes.product.toLong, s"sizes=$sizes")
    }
  }

  test("indicator ids are dense 1..n regardless of shape (W2)") {
    samples(Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(1, 3)), 4)
      .foreach { case (members, years) =>
        val dims = Seq(
          Dimension(1, "Geography", "G", hasUom = false,
            Seq(Member(1, "Canada", "Canada", None))),
          Dimension(2, "D", "D", hasUom = false,
            (1 to members).map(m => Member(m, s"m$m", s"mf$m", None))))
        val meta = MiniCube.meta.copy(dimensions = dims,
          startDate = java.time.LocalDate.of(2019, 1, 1),
          endDate = java.time.LocalDate.of(2018 + years, 12, 31))
        val dates = RefDates.generate(meta.startDate, meta.endDate, 12)
        val ind = IndicatorBuilder.build(spark, meta, dates, Map.empty, 1L,
          None, Set.empty)
        val ids = ind.select("IndicatorId").as[Long].collect().sorted
        assert(ids.toSeq == (1L to (members.toLong * dates.size)),
          s"members=$members years=$years")
      }
  }

  test("fixRefYear maps fiscal forms to the later 4-digit year (X16)") {
    samples(Gen.chooseNum(1900, 2099), 8).foreach { y =>
      val got = Seq(y.toString, s"$y/${y + 1}").toDF("y")
        .select(CubeOps.fixRefYear($"y")).as[String].collect()
      assert(got(0) == y.toString)
      assert(got(1) == (y + 1).toString, s"$y/${y + 1}")
    }
  }

  test("genericIndicatorCode keeps element count, wildcard 3rd-from-end (X14)") {
    samples(Gen.chooseNum(2, 5), 4).foreach { nDims =>
      val code = (Seq("13100778") ++ (1 to nDims).map(_.toString) :+ "2018-01-01")
        .mkString(".")
      val out = Seq(code).toDF("c")
        .select(CubeOps.genericIndicatorCode($"c")).as[Option[String]].head()
      val parts = out.get.split("\\.")
      assert(parts.length == nDims + 2, s"nDims=$nDims")
      assert(parts(parts.length - 3) == "%")
    }
  }

  test("shinglesFromTokens equals sliding-window reference on random docs") {
    import org.apache.spark.sql.functions.col
    val tokenGen: Gen[List[String]] =
      Gen.chooseNum(0, 12).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("a", "bb", "ccc", "d", "e")))
    val docs = samples(Gen.zip(tokenGen, Gen.chooseNum(1, 4)), 20)
    docs.zipWithIndex.foreach { case ((tokens, n), i) =>
      val expected = tokens.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq.distinct
      val got = Seq(tokens.mkString(" "))
        .toDF("text")
        .select(graft.ops.TextOps.wordShingles(col("text"), n).as("sh"))
        .as[Seq[String]].head()
      // empty text tokenizes to [""] (size 1), never to []: the n=1
      // reference must account for that split() artifact
      val exp = if (tokens.isEmpty && n == 1) Seq("") else expected
      assert(got == exp, s"tokens=$tokens n=$n i=$i")
    }
  }

  test("varchar caps hold on generated codes (schema contract)") {
    samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 5).foreach { s =>
      val code = Seq((s * 30, "2018", "13100778")).toDF("a", "b", "p")
        .select(CubeOps.indicatorCode($"a", $"b", $"p")).as[String].head()
      assert(code.length <= 100)
    }
  }
}
