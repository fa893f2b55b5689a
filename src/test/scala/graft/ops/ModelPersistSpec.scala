package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The model-artifact persistence contract: every trained model the
  * engine ships (NB lang-ID weights, PLSA φ, JM bigram counts, GD
  * classifier trajectory) round-trips through parquet and the
  * reloaded artifact answers BIT-IDENTICALLY to the in-memory
  * train-then-apply composition — the production train-once /
  * ship-the-table shape behind the `*_model_persist` declared
  * queries. */
class ModelPersistSpec extends SparkSpec {
  import spark.implicits._

  private def roundtrip(df: DataFrame, tag: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory(s"graft_mp_$tag").toString
    df.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp)
  }

  private def dump(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  /** A corpus with enough lang signal, token mass, and length spread
    * to exercise all four trainers. */
  private def corpus: DataFrame = {
    val rows = (0 until 60).map { i =>
      val lang = Seq("en", "es", "fr")(i % 3)
      val base = lang match {
        case "en" => "the quick brown fox jumps over the lazy dog and then"
        case "es" => "el rapido zorro marron salta sobre el perro perezoso y"
        case _    => "le renard brun rapide saute par dessus le chien paresseux"
      }
      val text = (0 to i % 7).map(_ => base).mkString(" ") + s" doc$i"
      (i.toLong, text, lang, text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "n_chars")
  }

  test("NB lang-ID: reloaded weight table predicts bit-identically") {
    val docs = corpus
    val feat = TextOps.nbLangFeatures(docs)
    val model = TextOps.nbLangTrain(docs, feat)
    val fresh = dump(TextOps.nbLangApply(docs, feat, model))
    val reloaded = dump(TextOps.nbLangApply(docs, feat, roundtrip(model, "nb")))
    assert(reloaded === fresh)
    assert(fresh === dump(TextOps.langIdLearned(docs)))
  }

  test("NB count state is decomposable: merged disjoint-slice states derive the full-retrain model exactly") {
    val docs = corpus
    val full = dump(TextOps.nbLangTrain(docs, TextOps.nbLangFeatures(docs)))
    // a 3-way split that cuts across langs and doc lengths
    val slices = (0 until 3).map(k => docs.filter($"doc_id" % 3 === k))
    val merged = TextOps.nbMergeStates(
      slices.map(s => TextOps.nbCountState(s, TextOps.nbLangFeatures(s))): _*)
    assert(dump(TextOps.nbModelFromState(merged)) === full,
      "state(a) + state(b) + state(c) must train the SAME model as state(a+b+c)")
  }

  test("NB model artifact is long-format with all three kinds") {
    val docs = corpus
    val kinds = TextOps.nbLangTrain(docs, TextOps.nbLangFeatures(docs))
      .groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(kinds.keySet === Set("w", "d", "p"))
    assert(kinds("d") === kinds("p")) // one default + one prior per lang
  }

  test("PLSA: reloaded φ summarizes bit-identically") {
    val docs = corpus
    val phi = TopicOps.plsaPhi(docs, k = 3, rounds = 2)
    val fresh = dump(TopicOps.plsaTopicsFromPhi(phi, k = 3, topN = 5))
    val reloaded =
      dump(TopicOps.plsaTopicsFromPhi(roundtrip(phi, "plsa"), k = 3, topN = 5))
    assert(reloaded === fresh)
    assert(fresh === dump(TopicOps.plsaTopics(docs, k = 3, rounds = 2, topN = 5)))
  }

  test("JM LM: reloaded count tables tune bit-identically") {
    val docs = corpus
    val model = TextOps.lmTrain(docs)
    val fresh = dump(TextOps.lmTuneFromModel(docs, model))
    val reloaded = dump(TextOps.lmTuneFromModel(docs, roundtrip(model, "lm")))
    assert(reloaded === fresh)
    assert(fresh === dump(TextOps.lmTune(docs)))
  }

  test("BPE: reloaded merge list re-encodes bit-identically") {
    val docs = corpus
    val merges = TextOps.bpeMerges(docs, rounds = 4)
    val fresh = dump(TextOps.bpeEncodedVocabFromMerges(docs, merges, k = 10))
    val reloaded =
      dump(TextOps.bpeEncodedVocabFromMerges(docs, roundtrip(merges, "bpe"), k = 10))
    assert(reloaded === fresh)
    assert(fresh === dump(TextOps.bpeEncodedVocab(docs, rounds = 4, k = 10)))
  }

  test("WordPiece: reloaded vocab re-encodes the sample identically to the full encode") {
    val docs = corpus
    val model = TextOps.wordpieceModel(docs)
    val kinds = model.groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(kinds.keySet === Set("m", "c"))
    val fresh = dump(TextOps.wordpieceEncodeFromModel(docs, model, topWords = 8))
    val reloaded =
      dump(TextOps.wordpieceEncodeFromModel(docs, roundtrip(model, "wp"), topWords = 8))
    assert(reloaded === fresh)
    // the bounded sample agrees row-for-row with the full encode's
    // segmentation of the same words (restriction commutes)
    val full = TextOps.wordpieceEncode(docs, topWords = 1000000)
      .filter(org.apache.spark.sql.functions.length($"word") <= 8)
      .orderBy($"wc".desc, $"word").limit(8)
    assert(fresh === dump(full))
  }

  test("unigram LM: reloaded (piece, w_mu) table Viterbi-decodes identically") {
    val docs = corpus
    val model = TextOps.unigramModel(docs)
    val fresh = dump(TextOps.unigramEncodeFromModel(docs, model, topWords = 8))
    val reloaded =
      dump(TextOps.unigramEncodeFromModel(docs, roundtrip(model, "ug"), topWords = 8))
    assert(reloaded === fresh)
    val full = TextOps.unigramEncode(docs, topWords = 1000000)
      .filter(org.apache.spark.sql.functions.length($"word") <= 8)
      .orderBy($"wc".desc, $"word").limit(8)
    assert(fresh === dump(full))
  }

  test("GD classifier: reloaded trajectory scores bit-identically") {
    val docs = corpus
    val model = ClassifierOps.qualityModel(docs, minChars = 120)
    assert(model.count() === 9) // init + 8 steps
    val fresh = dump(ClassifierOps.qualityApply(docs, model, minChars = 120))
    val reloaded =
      dump(ClassifierOps.qualityApply(docs, roundtrip(model, "gd"), minChars = 120))
    assert(reloaded === fresh)
    assert(fresh === dump(ClassifierOps.qualityClassifier(docs, minChars = 120)))
  }
}
