package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityModel

/** The distilled quality classifier: fit-side and scoring-side
  * features must agree bit-for-bit, planted good/gibberish corpora
  * must separate, and the corpus scoring path must stay declarative. */
class QualityModelSpec extends SparkSpec {

  test("declarative score equals the closed-form sigmoid over hashed tf") {
    import spark.implicits._
    // hand-built model over two known terms: the scorer must reproduce
    // sigmoid(b + Σ w·tf) exactly, with tf counted per (doc, dim)
    val Seq(dimA, dimB) = Seq("alpha", "beta").toDF("t")
      .select(pmod(hash(col("t")), lit(QualityModel.Dims)))
      .collect().toSeq.map(_.getInt(0))
    assume(dimA != dimB, "hash collision in the planted vocabulary")
    val weights = Seq((dimA, 0.7), (dimB, -0.2)).toDF("dim", "w")
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma"), (3L, ""))
      .toDF("doc_id", "text")
    val got = QualityModel.scoreQuality(docs, weights, 0.1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    assert(math.abs(got(1L) - sig(0.1 + 2 * 0.7 - 0.2)) < 1e-12)
    // unweighted term and empty text both fall back to sigmoid(b)
    assert(math.abs(got(2L) - sig(0.1)) < 1e-12)
    assert(math.abs(got(3L) - sig(0.1)) < 1e-12)
  }

  test("planted good vs gibberish corpora separate; empty text scores sigmoid(b)") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val good = (1L to 60L).map { i =>
      (i, s"the quick brown fox number $i jumps over the lazy dog and " +
        s"then runs off to the woods in the morning light of day $i")
    }
    val bad = (101L to 160L).map { i =>
      (i, Seq.fill(20)(rng.nextInt(100000).toString).mkString(" "))
    }
    val docs = (good ++ bad).toDF("doc_id", "text")
    val (w, b) = QualityModel.fitQualityLr(docs, perClass = 100, maxIter = 25)
    val scored = QualityModel.scoreQuality(docs, w, b)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val meanGood = good.map(g => scored(g._1)).sum / good.size
    val meanBad = bad.map(g => scored(g._1)).sum / bad.size
    assert(meanGood > meanBad + 0.5,
      s"no separation: good $meanGood vs bad $meanBad")
    // empty text: no terms -> left-join null dot -> sigmoid(intercept)
    val empty = QualityModel.scoreQuality(Seq((999L, "")).toDF("doc_id", "text"), w, b)
      .collect()(0).getDouble(1)
    assert(math.abs(empty - 1.0 / (1.0 + math.exp(-b))) < 1e-12)
  }

  test("corpus scoring is declarative: broadcast weight join, partial aggs, no UDF") {
    val docs = Tables.documents(spark, Sf)
    val (w, b) = QualityModel.fitQualityLr(docs, perClass = 200, maxIter = 5)
    val df = QualityModel.scoreQuality(docs, w, b)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("UDF("), s"scoring path left codegen:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"weight table must broadcast:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"dot-product agg not partial+final:\n$p")
  }

  test("single-class weak-label corpus fails the fit loudly, persists nothing") {
    import spark.implicits._
    // every doc passes the Gopher gate → one class → LR would return a
    // degenerate ±∞-intercept model; the guard must throw instead
    val allGood = (1L to 40L).map { i =>
      (i, s"the quick brown fox number $i jumps over the lazy dog and " +
        s"then runs off to the woods in the morning light of day $i")
    }.toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      QualityModel.fitQualityLr(allGood, perClass = 50, maxIter = 5)
    }
    assert(e.getMessage.contains("both weak-label classes"), e.getMessage)
  }

  test("maintain: stable traffic stays under the drift bar, a planted shift flips it") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val good = (1L to 60L).map { i =>
      (i, s"the quick brown fox number $i jumps over the lazy dog and " +
        s"then runs off to the woods in the morning light of day $i")
    }
    val bad = (101L to 160L).map { i =>
      (i, Seq.fill(20)(rng.nextInt(100000).toString).mkString(" "))
    }
    val fitDocs = (good ++ bad).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_qmaint").toString
    val (w, b) = QualityModel.fitQualityLr(fitDocs, perClass = 100, maxIter = 25)
    QualityModel.saveModel(w, b, s"$dir/m", fitDocs = Some(fitDocs))
    // live traffic drawn from the fit distribution: no refit needed
    val stable = QualityModel.maintain(spark, s"$dir/m", fitDocs)
    assert(!stable.refitNeeded && stable.drift < 0.05,
      s"stable traffic reported drifted: $stable")
    // planted shift: traffic turns all-gibberish — the score histogram
    // collapses into the low buckets and the trigger must flip
    val shifted = (201L to 320L).map { i =>
      (i, Seq.fill(20)(rng.nextInt(100000).toString).mkString(" "))
    }.toDF("doc_id", "text")
    val drifted = QualityModel.maintain(spark, s"$dir/m", shifted)
    assert(drifted.refitNeeded && drifted.drift > stable.drift,
      s"planted distribution shift not flagged: $drifted")
    // a model saved without a snapshot cannot silently pass maintain
    QualityModel.saveModel(w, b, s"$dir/nosnap")
    val miss = intercept[IllegalArgumentException] {
      QualityModel.maintain(spark, s"$dir/nosnap", fitDocs)
    }
    assert(miss.getMessage.contains("no fit snapshot"), miss.getMessage)
  }

  test("gate report carries both weak-label rows and a sane operating point") {
    val rep = QualityModel.qualityClassifierReport(spark, Sf).collect()
    assert(rep.nonEmpty)
    val byLabel = rep.groupBy(_.getLong(1))
    assert(byLabel.keySet == Set(0L, 1L),
      s"corpus must exercise both classes: ${byLabel.keySet}")
    // distillation sanity: rule-keepers score higher on average than
    // rule-rejects, aggregated over the corpus
    def wmean(rows: Array[org.apache.spark.sql.Row]): Double = {
      val n = rows.map(_.getLong(2)).sum
      rows.map(r => r.getDouble(3) * r.getLong(2)).sum / n
    }
    assert(wmean(byLabel(1L)) > wmean(byLabel(0L)),
      s"keepers must outscore rejects: $rep")
  }
}
