package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class ClassifierOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Separable-by-construction corpus: short low-diversity docs below
    * the n_chars band, long high-diversity docs above it. */
  private def corpus: DataFrame = {
    val rows = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "the a of " + s"tok$i tok$i", 120L)
      else {
        val words = (0 until 60).map(j => s"w${i}_$j").mkString(" ")
        (i.toLong, words, 420L)
      }
    }
    rows.toDF("doc_id", "text", "n_chars")
  }

  test("features: 6dp doubles and their fixed-point twins agree") {
    val f = ClassifierOps.features(corpus).collect()
    assert(f.length === 40)
    f.foreach { r =>
      Seq(("x1", "ix1"), ("x2", "ix2"), ("x3", "ix3")).foreach { case (x, ix) =>
        assert(math.round(r.getAs[Double](x) * 1e6) === r.getAs[Long](ix))
      }
      assert(Set(0L, 1L).contains(r.getAs[Long]("y")))
    }
  }

  test("qualityCalibration: bins partition the corpus and ECE is the weighted mean gap") {
    val cal = ClassifierOps.qualityCalibration(corpus, minChars = 300).collect()
    assert(cal.nonEmpty)
    assert(cal.map(_.getAs[Long]("n")).sum === 40L)
    val binIds = cal.map(_.getAs[Long]("bin_id"))
    assert(binIds.distinct.length === binIds.length)
    assert(binIds.forall(b => b >= 0 && b <= 9))
    cal.foreach { r =>
      assert(r.getAs[Double]("mean_conf") >= 0.0 && r.getAs[Double]("mean_conf") <= 1.0)
      assert(r.getAs[Double]("frac_pos") >= 0.0 && r.getAs[Double]("frac_pos") <= 1.0)
      assert(r.getAs[Double]("gap") >= 0.0)
    }
    // every row carries the same ECE, and it equals the n-weighted
    // mean gap recomputed from the emitted bins
    val eces = cal.map(_.getAs[Double]("ece")).distinct
    assert(eces.length === 1)
    val n = cal.map(_.getAs[Long]("n").toDouble)
    val gaps = cal.map(_.getAs[Double]("gap"))
    val expected = n.zip(gaps).map { case (a, g) => a * g }.sum / n.sum
    assert(math.abs(eces.head - expected) < 2e-6)
  }

  test("qualityLift: bins partition the corpus; cumulative columns reconcile; top beats base rate") {
    val r = ClassifierOps.qualityLift(corpus, minChars = 300).collect()
      .sortBy(-_.getAs[Long]("bin_id"))
    assert(r.map(_.getAs[Long]("n")).sum === 40L)
    val nn = r.map(_.getAs[Long]("n")).sum
    val pp = r.map(_.getAs[Long]("n_pos")).sum
    // cumulative columns are exactly the running sums from the top bin
    var (cn, cp) = (0L, 0L)
    r.foreach { x =>
      cn += x.getAs[Long]("n"); cp += x.getAs[Long]("n_pos")
      assert(x.getAs[Long]("cum_n") === cn)
      assert(x.getAs[Long]("cum_pos") === cp)
      assert(x.getAs[Long]("cum_capture_micro") === cp * 1000000L / pp)
      assert(x.getAs[Long]("cum_lift_micro") === cp * nn * 1000000L / (cn * pp))
    }
    // the bottom row's cumulative lift is exactly 1x by construction
    assert(r.last.getAs[Long]("cum_lift_micro") === 1000000L)
    // the trained gate ranks positives above the base rate at the top
    assert(r.head.getAs[Long]("lift_micro") > 1000000L,
      "top score bin must beat the base rate")
  }

  test("train: deterministic across invocations, weights move") {
    val feat = ClassifierOps.features(corpus).localCheckpoint(true)
    val w1 = ClassifierOps.train(feat, steps = 4).last._2
    val w2 = ClassifierOps.train(feat, steps = 4).last._2
    assert(w1.toSeq === w2.toSeq) // exact fixed-point gradients → bit-equal
    assert(w1.exists(_ != 0.0))
  }

  test("qualityClassifier learns the separable band (accuracy ≥ 0.9)") {
    val out = ClassifierOps.qualityClassifier(corpus).collect()
    val acc = out.count(r =>
      r.getAs[Boolean]("predicted") === (r.getAs[Long]("y") == 1L)).toDouble / out.length
    assert(acc >= 0.9, s"accuracy $acc")
    // score/threshold consistency
    out.foreach { r =>
      assert(r.getAs[Boolean]("predicted") === (r.getAs[Double]("score") >= 0.5))
    }
  }
  test("featureMi: a label-determining feature scores nmi 1, a constant feature 0") {
    // short docs: 3 tokens, n_chars 50 → y=0, ix3 bin 0; long docs:
    // 100 tokens, n_chars 400 → y=1, ix3 bin 3 — ix3 determines y
    // exactly. No stopwords anywhere → ix1 is constant → MI 0.
    val longText = (1 to 100).map(i => s"tok$i").mkString(" ")
    val docs = ((0L to 3L).map(i => (i, "alpha beta gamma", 50L)) ++
      (4L to 7L).map(i => (i, longText, 400L)))
      .toDF("doc_id", "text", "n_chars")
    val r = ClassifierOps.featureMi(docs).collect()
      .map(x => x.getAs[String]("feature") ->
        ((x.getAs[Double]("mi"), x.getAs[Double]("h_y"), x.getAs[Double]("nmi"))))
      .toMap
    assert(r("ix3")._3 === 1.0, "length feature carries the whole label")
    assert(r("ix3")._1 === 0.693147)
    assert(r("ix1") === ((0.0, 0.693147, 0.0)), "constant feature carries nothing")
  }
}
