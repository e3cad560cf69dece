package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{LogReg, TextOps}

/** In-engine logistic regression (q148's trainer): the snapped
  * integer-gradient GD must actually learn (loss decreases vs the
  * zero model) and the snapped trajectory must be replayable — the
  * determinism claim the unrolled SQL oracle depends on.
  */
class LogRegSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def setup = {
    val docs = Tables(spark, dir, "documents")
    val w = TextOps.whitespaceTokens(col("text"))
    val features = Seq(
      lit(1.0),
      least(size(w), lit(1000)).cast("double") / lit(1000.0),
      least(col("n_chars"), lit(5000)).cast("double") / lit(5000.0),
      size(array_distinct(w)).cast("double") / greatest(size(w), lit(1)))
    val label = when(col("lang") === "en", 1.0).otherwise(0.0)
    (docs, features, label)
  }

  test("training reduces logloss vs the zero model") {
    val (docs, features, label) = setup
    val traj = LogReg.train(docs, features, label, iterations = 5, lr = 0.5)
    val l0 = LogReg.logloss(docs, features, label, Array.fill(4)(0.0))
    val l5 = LogReg.logloss(docs, features, label, traj.last)
    assert(l5 < l0, s"logloss $l5 !< zero-model $l0")
    assert(traj.last.exists(_ != 0.0))
  }

  test("snapped trajectory is replay-deterministic") {
    val (docs, features, label) = setup
    val a = LogReg.train(docs, features, label, iterations = 3, lr = 0.5)
    val b = LogReg.train(docs, features, label, iterations = 3, lr = 0.5)
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    // every weight is an exact 1e-6 multiple (the snap invariant the
    // oracle's floor-replay relies on)
    for (w <- a.last)
      assert(math.floor(w * 1e6 + 0.5) / 1e6 == w)
  }
}
