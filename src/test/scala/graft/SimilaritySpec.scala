package graft

import graft.operators.Similarity

/** Brute force is the exact oracle; the LSH path must recall most of
  * its top-k. */
class SimilaritySpec extends SparkSpec {

  private def topkSets(rows: Array[org.apache.spark.sql.Row]) =
    rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap

  test("brute-force top-1 matches a driver-side exact computation") {
    val emb = Tables.embeddings(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = Similarity.simTopkBruteforce(spark, Sf)
      .where("rank = 1").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (q, neighbor) =>
      val best = (emb - q).maxBy { case (id, v) => (cos(emb(q), v), -id) }._1
      assert(neighbor == best, s"query $q: spark=$neighbor exact=$best")
    }
  }

  test("LSH ANN recalls >= 60% of brute-force top-k") {
    val exact = topkSets(Similarity.simTopkBruteforce(spark, Sf).collect())
    val ann = topkSets(Similarity.simAnnLsh(spark, Sf).collect())
    val recalls = exact.map { case (q, tk) =>
      ann.getOrElse(q, Set.empty).intersect(tk).size.toDouble / tk.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, f"mean recall $mean%.2f < 0.6")
  }
}
