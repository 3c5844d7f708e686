package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Sharding, TextAnalysis}
import graft.Tables.documents

/** Semantics pins for the round-11 analytics batch — properties the
  * DuckDB hash compare can't see (invariants, not values). */
class AnalyticsOpsSpec extends SparkSpec {

  test("markov rows are proper conditional distributions") {
    val m = Events.eventsMarkov(spark, Sf).collect()
    val byPrev = m.groupBy(_.getString(0))
    byPrev.foreach { case (prev, rows) =>
      val tot = rows.map(_.getDouble(3)).sum
      assert(math.abs(tot - 1.0) < 1e-4, s"P(·|$prev) sums to $tot")
    }
  }

  test("inter-arrival gaps: mean <= max, counts match event totals") {
    val ia = Events.eventsInterArrival(spark, Sf)
    assert(ia.where(col("mean_gap_s") > col("max_gap_s") + 1e-9).count() == 0)
    val nGaps = ia.agg(sum("n_gaps")).collect()(0).getLong(0)
    val nEvents = graft.Tables.events(spark, Sf).count()
    val nUsers = ia.count()
    // every user with >=2 events contributes (events-1) gaps
    assert(nGaps == nEvents - nUsers)
  }

  test("stickiness is bounded: dau <= wau, 0 < stickiness <= 1") {
    val st = Events.eventsDauStickiness(spark, Sf)
    assert(st.where(col("dau") > col("wau")).count() == 0)
    assert(st.where(col("stickiness") <= 0.0 || col("stickiness") > 1.0)
      .count() == 0)
  }

  test("hourly profile shares sum to 1 per type") {
    val hp = Events.eventsHourlyProfile(spark, Sf).collect()
    hp.groupBy(_.getString(0)).foreach { case (t, rows) =>
      val tot = rows.map(_.getDouble(3)).sum
      assert(math.abs(tot - 1.0) < 1e-4, s"$t shares sum to $tot")
    }
  }

  test("value histogram covers every non-null event exactly once") {
    val h = Events.eventsValueHistogram(spark, Sf)
    val total = h.agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == graft.Tables.events(spark, Sf)
      .where(col("value").isNotNull).count())
  }

  test("budget cap: admission is a prefix in doc_id order per source") {
    val bc = Sharding.budgetCap(documents(spark, Sf), budget = 500L)
    val rows = bc.collect()
      .map(r => (r.getString(1), r.getLong(0), r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val ordered = docs.sortBy(_._2).map(_._3)
      // once a doc is rejected, every later doc of the source is too
      val firstReject = ordered.indexOf(false)
      if (firstReject >= 0)
        assert(ordered.drop(firstReject).forall(!_),
          s"$src re-admits after the budget cut")
    }
    // a 500-token budget must actually cut somewhere at this SF
    assert(rows.exists(!_._3), "budget never binds — test is vacuous")
    assert(rows.exists(_._3), "budget rejects everything")
  }

  test("epoch plan: each epoch is a full permutation, epochs differ") {
    val ep = Sharding.epochPlan(documents(spark, Sf), epochs = 2)
    val n = documents(spark, Sf).count()
    val byEpoch = ep.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(byEpoch.keySet == Set(0, 1))
    byEpoch.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq)
    }
    val order0 = byEpoch(0).sortBy(_._3).map(_._2).toSeq
    val order1 = byEpoch(1).sortBy(_._3).map(_._2).toSeq
    assert(order0 != order1, "epochs must reshuffle, not repeat")
  }

  test("zipf slope is negative and near -1ish for every language") {
    val z = TextAnalysis.textZipfFit(spark, Sf).collect()
    assert(z.nonEmpty)
    z.foreach { r =>
      val slope = r.getDouble(2)
      assert(slope < 0.0, s"${r.getString(0)} slope $slope not negative")
      assert(slope > -4.0, s"${r.getString(0)} slope $slope implausible")
    }
  }

  test("hapax share bounded and vocab >= hapax") {
    val h = TextAnalysis.textHapaxShare(spark, Sf)
    assert(h.where(col("n_hapax") > col("vocab_size")).count() == 0)
    assert(h.where(col("hapax_share") < 0.0 || col("hapax_share") > 1.0)
      .count() == 0)
  }

  test("prefix dedup groups genuinely share their 64-char prefix") {
    val g = graft.operators.Dedup.dedupPrefix(documents(spark, Sf))
    val withText = g.join(documents(spark, Sf), Seq("doc_id"))
      .select(col("prefix_group"), substring(col("text"), 1, 64).as("p"))
      .collect().groupBy(_.getLong(0))
    assert(withText.nonEmpty, "no prefix groups at this SF — vacuous")
    withText.foreach { case (grp, rows) =>
      assert(rows.map(_.getString(1)).distinct.length == 1,
        s"group $grp mixes prefixes")
    }
  }

  test("windowed funnel is dominated by the unbounded funnel per stage") {
    val un = Events.eventsFunnel(spark, Sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val wi = Events.eventsFunnelWindowed(spark, Sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (1 to 3).foreach { st =>
      assert(wi(st) <= un(st), s"stage $st windowed ${wi(st)} > ${un(st)}")
    }
    assert(wi(1) == un(1), "stage 1 has no prior stage to window against")
  }

  test("new + returning = active; day-1 users are all new") {
    val nr = Events.eventsNewVsReturning(spark, Sf).collect()
    nr.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
    }
    assert(nr.head.getLong(3) == 0, "earliest day must have 0 returning")
  }

  test("binned packing balances token totals across bins") {
    val docs = documents(spark, Sf)
    val bins = Sharding.packBinned(docs, nBins = 8).collect()
    assert(bins.length == 8)
    val toks = bins.map(_.getLong(2))
    val maxDoc = docs.select(
      max(size(split(lower(col("text")), "\\s+")))).collect()(0).getInt(0)
    // LPT round-robin bound: spread across bins ≤ a handful of max docs
    assert(toks.max - toks.min <= 4L * maxDoc,
      s"bins unbalanced: ${toks.toSeq} (max doc $maxDoc)")
    assert(toks.sum == docs.select(sum(size(split(lower(col("text")),
      "\\s+")).cast("long"))).collect()(0).getLong(0))
  }

  test("layout plan: files >= 1, buckets are powers of two >= files") {
    val lp = Sharding.layoutPlan(spark, Sf).collect()
    assert(lp.length == 4)
    lp.foreach { r =>
      val (files, buckets) = (r.getLong(3), r.getLong(4))
      assert(files >= 1)
      assert(buckets >= files)
      assert((buckets & (buckets - 1)) == 0, s"$buckets not a power of 2")
    }
  }

  test("cluster assign: one row per vector, valid cosine, real argmax") {
    // NOTE: the synthetic labels are NOT cosine-separable (measured
    // ~37% self-assignment), so agreement rate is a property of the
    // data, not the operator — the invariants below are what the
    // E-step itself guarantees; argmax VALUE correctness is pinned by
    // the DuckDB oracle.
    val ca = graft.operators.Similarity.simClusterAssign(spark, Sf)
    val emb = graft.Tables.embeddings(spark, Sf)
    assert(ca.count() == emb.count(), "exactly one assignment per vector")
    assert(ca.where(col("score") < -1.0001 || col("score") > 1.0001)
      .count() == 0, "cosine out of range")
    assert(ca.select("assigned").distinct().count() > 1,
      "degenerate: everything assigned to one centroid")
    assert(ca.where(col("label_match") =!= (col("assigned") === col("label")))
      .count() == 0)
  }

  test("containment: exact dups score 1.0 both ways; score in (0,1]") {
    val c = graft.operators.Dedup.containmentPairs(documents(spark, Sf))
    assert(c.where(col("containment") <= 0.0 || col("containment") > 1.0001)
      .count() == 0)
    // exact text duplicates (known present) must appear in both
    // directions at containment 1.0
    val dupPair = documents(spark, Sf).as("a")
      .join(documents(spark, Sf).as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).limit(1).collect()
    if (dupPair.nonEmpty) {
      val (x, y) = (dupPair(0).getLong(0), dupPair(0).getLong(1))
      assert(c.where(col("contained_id") === x &&
        col("container_id") === y && col("containment") > 0.999).count() == 1)
      assert(c.where(col("contained_id") === y &&
        col("container_id") === x).count() == 1)
    }
  }

  test("merge upsert: deletes gone, updates rewritten, inserts present") {
    val m = Sharding.pipelineMergeUpsert(spark, Sf)
    val snap = documents(spark, Sf)
    assert(m.where(col("doc_id") % 10 === 7 &&
      col("doc_id") < 10000000L).count() == 0, "deletes survived")
    val nIns = snap.where(col("doc_id") % 10 === 3).count()
    assert(m.where(col("action") === "insert").count() == nIns)
    val nUpd = snap.where(col("doc_id") % 10 === 0).count()
    assert(m.where(col("action") === "update").count() == nUpd)
    assert(m.where(col("action") === "update" &&
      col("n_chars") > 58).count() == 0, "updated text not truncated")
  }

  test("A/B assignment is a partition of the user base, both arms live") {
    val ab = Events.eventsAbAssign(spark, Sf).collect()
    assert(ab.map(_.getString(0)).sorted.toSeq == Seq("A", "B"))
    val users = graft.Tables.events(spark, Sf)
      .select("user_id").distinct().count()
    assert(ab.map(_.getLong(1)).sum == users)
    ab.foreach(r => assert(r.getLong(1) > 0))
  }

  test("hashed bow: dims bounded, counts cover every token") {
    val bow = graft.operators.TextAnalysis.textHashedBow(spark, Sf)
    assert(bow.where(col("dim") < 0 || col("dim") >= 64).count() == 0)
    val total = bow.agg(sum("cnt")).collect()(0).getLong(0)
    val tokens = documents(spark, Sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .where(length(col("t")) > 0).count()
    assert(total == tokens, s"bow counts $total != tokens $tokens")
  }

  test("label separation: margin consistent with cluster-assign agreement") {
    val sep = graft.operators.Similarity.simLabelSeparation(spark, Sf)
      .collect()
    assert(sep.length == 10)
    sep.foreach { r =>
      assert(r.getDouble(4) == r.getDouble(2) - r.getDouble(3))
      assert(math.abs(r.getDouble(2)) <= 1.0001)
    }
    // the measured ~37% self-assignment implies margins near zero —
    // this operator REPORTS that; margins must not claim separation
    assert(sep.map(_.getDouble(4)).max < 0.5,
      "synthetic labels suddenly separable — data changed?")
  }

  test("type affinity: symmetric coverage, lift consistent with counts") {
    val af = Events.eventsTypeAffinity(spark, Sf).collect()
    assert(af.nonEmpty)
    af.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs must be ordered")
      assert(r.getLong(2) > 0)
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("mode stat picks the true per-group maximum count") {
    val m = SparkEntry.queries("q_mode_stat")(spark, Sf).collect()
    val counts = graft.Tables.orders(spark, Sf)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    m.foreach { r =>
      val (st, cnt) = (r.getString(0), r.getLong(2))
      val best = counts.filter(_._1 == st).map(_._3).max
      assert(cnt == best, s"$st mode cnt $cnt != max $best")
    }
  }

  test("vocab coverage is monotone in k, bounded by 1, and exact at the head") {
    val rows = graft.operators.TextAnalysis.textVocabCoverage(spark, Sf)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set(10, 100, 1000, 10000))
    val ks = Seq(10, 100, 1000, 10000)
    ks.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(a)._3 <= rows(b)._3, s"coverage not monotone at $a->$b")
    }
    rows.values.foreach { case (cov, tot, share) =>
      assert(cov <= tot && share <= 1.0 && share > 0.0)
      assert(math.abs(share - cov.toDouble / tot) < 1e-15)
    }
    // head check against the independently-computed top-10 token mass
    val top10 = graft.operators.TextAnalysis
      .topTokens(Tables.documents(spark, Sf), 10)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(rows(10)._1 == top10, s"${rows(10)._1} != top-10 mass $top10")
  }

  test("active streaks: islands cover the day set exactly, gaps split, corpus sane") {
    val rows = graft.operators.Events.eventsActiveStreaks(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val dayMs = 24L * 3600 * 1000
    rows.foreach { case (_, s, e, n) =>
      // an island's length equals its day span — internal gaps would
      // have split it into two islands
      assert((e.getTime - s.getTime) / dayMs == n - 1,
        s"island [$s, $e] span disagrees with n_days=$n")
    }
    // islands per user are disjoint and separated by >= 2 days
    rows.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._2.getTime).toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert((b._2.getTime - a._3.getTime) / dayMs >= 2,
            s"adjacent islands not separated: ${a._3} -> ${b._2}")
        case _ =>
      }
    }
    // total island days == total distinct active (user, day) pairs
    val totalDays = Tables.events(spark, Sf)
      .select(col("user_id"), date_trunc("day", col("ts"))).distinct().count()
    assert(rows.map(_._4).sum == totalDays)
  }

  test("forecast baseline: perfectly periodic stream has zero MAE; corpus MAE finite") {
    import spark.implicits._
    // same count for every (dow, hour) bucket in train and test: 1
    // event per hour, every hour, two weeks train + one week test
    val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ev = (0 until 21 * 24).map { h =>
      (h.toLong, new java.sql.Timestamp(start + h * 3600L * 1000),
        1L, "tick", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rep = graft.operators.Events.forecastBaseline(ev, "2024-01-15")
      .collect()
    assert(rep.length == 1)
    assert(rep(0).getDouble(2) == 0.0,
      s"periodic stream must forecast exactly: mae=${rep(0).getDouble(2)}")
    // corpus: every type reports, MAE >= 0 and finite
    val corpus = graft.operators.Events.eventsForecastBaseline(spark, Sf)
      .collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && !r.getDouble(2).isNaN)
    }
  }

  test("conversion lag: floor-hour buckets, pre-view purchases excluded, cum share monotone to 1") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 09:00:00").getTime
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000L)
    val ev = Seq(
      (1L, ts(0), 10L, "view"),      // converts 30 min later -> bucket 0
      (2L, ts(30), 10L, "purchase"),
      (3L, ts(0), 11L, "view"),      // 90 min -> bucket 1
      (4L, ts(90), 11L, "purchase"),
      (5L, ts(0), 12L, "view"),      // exactly 2 h -> bucket 2
      (6L, ts(120), 12L, "purchase"),
      (7L, ts(60), 13L, "purchase"), // purchase BEFORE first view: no conv
      (8L, ts(120), 13L, "view"),
      (9L, ts(0), 14L, "view"))      // never converts
      .map { case (id, t, u, et) => (id, t, u, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.conversionLag(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, 1L, 1L, 1.0 / 3), (1L, 1L, 2L, 2.0 / 3), (2L, 1L, 3L, 1.0)),
      s"got ${out.toSeq}")
    // corpus: cum_share is monotone nondecreasing and ends exactly at 1
    val corpus = Events.eventsConversionLag(spark, Sf).collect()
      .map(_.getDouble(3))
    assert(corpus.nonEmpty && corpus.last == 1.0)
    assert(corpus.zip(corpus.tail).forall { case (a, b) => a <= b })
  }

  test("tenure survival: exact curve on planted users, monotone nonincreasing on corpus") {
    import spark.implicits._
    def ev(id: Long, day: String, u: Long) =
      (id, java.sql.Timestamp.valueOf(s"2024-02-$day 12:00:00"),
        u, "view", 1.0, "{}")
    val e = Seq(
      ev(1L, "01", 10L),                      // tenure 0
      ev(2L, "01", 11L), ev(3L, "03", 11L),   // tenure 2
      ev(4L, "01", 12L), ev(5L, "02", 12L))   // tenure 1
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.tenureSurvival(e).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0, 1L, 3L, 1.0), (1, 1L, 2L, 2.0 / 3), (2, 1L, 1L, 1.0 / 3)),
      s"got ${out.toSeq}")
    // corpus: survival starts at exactly 1, never increases with tenure
    val s = Events.eventsTenureSurvival(spark, Sf).collect()
      .map(_.getDouble(3))
    assert(s.nonEmpty && s.head == 1.0)
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
  }

  test("lifecycle states: new/retained/resurrected/churned on a planted 4-week timeline") {
    import spark.implicits._
    // weeks are Mondays: 2024-01-01 / 08 / 15 / 22
    def ev(id: Long, day: String, u: Long) =
      (id, java.sql.Timestamp.valueOf(s"2024-01-$day 12:00:00"),
        u, "view", 1.0, "{}")
    val e = Seq(
      ev(1L, "01", 1L), ev(2L, "09", 1L), ev(3L, "23", 1L), // w1 w2 w4
      ev(4L, "02", 2L),                                     // w1 only
      ev(5L, "08", 3L), ev(6L, "16", 3L))                   // w2 w3
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.lifecycleStates(e).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 2L, 2L, 0L, 0L, 0L),
      ("2024-01-08", 2L, 1L, 1L, 0L, 1L),  // u2 churned, u1 retained
      ("2024-01-15", 1L, 0L, 1L, 0L, 1L),  // u1 churned, u3 retained
      ("2024-01-22", 1L, 0L, 0L, 1L, 1L)), // u1 resurrects, u3 churns
      s"got ${out.toSeq}")
    // corpus: the accounting identity holds on every week
    val c = Events.eventsLifecycleStates(spark, Sf).collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"active != new+retained+resurrected at ${r.getTimestamp(0)}")
    }
    c.sliding(2).foreach { w =>
      if (w.length == 2 &&
        w(1).getTimestamp(0).getTime - w(0).getTimestamp(0).getTime ==
          7L * 86400000L)
        assert(w(0).getLong(1) == w(1).getLong(3) + w(1).getLong(5),
          s"prev_active != retained+churned at ${w(1).getTimestamp(0)}")
    }
  }

  test("user concentration: exact shares on planted counts, monotone on corpus") {
    import spark.implicits._
    def ev(id: Long, u: Long) =
      (id, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
        u, "view", 1.0, "{}")
    // u1: 3 events, u2: 3, u3: 1  -> hist {1 -> 1 user, 3 -> 2 users}
    val e = Seq(ev(1L, 1L), ev(2L, 1L), ev(3L, 1L), ev(4L, 2L),
      ev(5L, 2L), ev(6L, 2L), ev(7L, 3L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.userConcentration(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1.0, 1.0), (3L, 2L, 2.0 / 3, 6.0 / 7)),
      s"got ${out.toSeq}")
    // corpus: shares start at exactly 1 and never increase with k;
    // the histogram reconstructs the event total
    val c = Events.eventsUserConcentration(spark, Sf).collect()
    assert(c.nonEmpty && c.head.getDouble(2) == 1.0 &&
      c.head.getDouble(3) == 1.0)
    val us = c.map(_.getDouble(2)); val es = c.map(_.getDouble(3))
    assert(us.zip(us.tail).forall { case (a, b) => a >= b })
    assert(es.zip(es.tail).forall { case (a, b) => a >= b })
    val total = c.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(total == graft.Tables.events(spark, Sf).count())
  }

  test("key skew: exact ratios on planted keys; uniform keys report skew 1") {
    import spark.implicits._
    val skewed = Seq("a", "a", "a", "b").toDF("k")
    val r = Sharding.keySkew(skewed, "t", "k").collect()(0)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((4L, 2L, 3L)))
    assert(r.getDouble(5) == 2.0 && r.getDouble(6) == 1.5 &&
      r.getDouble(7) == 0.75, r.toString)
    val uniform = Seq("a", "a", "b", "b").toDF("k")
    assert(Sharding.keySkew(uniform, "t", "k").collect()(0)
      .getDouble(6) == 1.0)
    // corpus report: every leg present, skew >= 1 by construction
    val rep = Sharding.pipelineSkewStats(spark, Sf).collect()
    assert(rep.length == 6)
    rep.foreach(row => assert(row.getDouble(6) >= 1.0 - 1e-12,
      row.toString))
  }

  test("PMI: an always-adjacent pair scores exactly ln(4) on a planted corpus") {
    import spark.implicits._
    // 20 docs of "x y": c(x)=c(y)=20, c(xy)=20, N_uni=40, N_bi=20
    // PMI = ln((20*40*40)/(20*20*20)) = ln(4)
    val docs = (1 to 20)
      .map(i => (i.toLong, "x y", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.pmiBigrams(docs, minCount = 1).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getString(0), r.getString(1), r.getLong(2)) ==
      (("x", "y", 20L)))
    assert(r.getDouble(3) ==
      BigDecimal(math.log(4.0)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble, r.toString)
    // corpus: every reported pair cleared the min-count floor
    val c = TextAnalysis.textPmiBigrams(spark, Sf).collect()
    assert(c.nonEmpty && c.forall(_.getLong(2) >= 10))
  }

  test("daily dense: a planted 2-day gap fills with zero rows flagged filled") {
    import spark.implicits._
    def ev(id: Long, day: String) =
      (id, java.sql.Timestamp.valueOf(s"2024-05-$day 09:00:00"),
        1L, "view", 1.0, "{}")
    // active 05-01 (2 events) and 05-04 (1) — 02/03 missing
    val e = Seq(ev(1L, "01"), ev(2L, "01"), ev(3L, "04"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.dailyDense(e).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1),
        r.getBoolean(2)))
    assert(out.toSeq == Seq(
      ("2024-05-01", 2L, false), ("2024-05-02", 0L, true),
      ("2024-05-03", 0L, true), ("2024-05-04", 1L, false)),
      s"got ${out.toSeq}")
    // corpus: spine is contiguous daily, totals reconcile
    val c = Events.eventsDailyDense(spark, Sf).collect()
    assert(c.map(_.getLong(1)).sum ==
      graft.Tables.events(spark, Sf).count())
    c.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(1).getTimestamp(0).getTime -
          w(0).getTimestamp(0).getTime == 86400000L, "spine gap")
    }
  }

  test("regr agg: a planted exact line fits slope/intercept/r2 exactly") {
    import spark.implicits._
    // y = 3x + 7, four points -> slope 3, intercept 7, r2 1
    val li = Seq((1.0, 10.0), (2.0, 13.0), (3.0, 16.0), (4.0, 19.0))
      .map { case (x, y) => ("A", x, y) }
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val r = li.groupBy(col("l_returnflag"))
      .agg(round(expr("regr_slope(l_extendedprice, l_quantity)"), 6)
        .as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2)
          .as("intercept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"))
      .collect()(0)
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      ((3.0, 7.0, 1.0)), r.toString)
  }

  test("cohort LTV: exact curve on a planted two-user cohort") {
    import spark.implicits._
    def ev(id: Long, day: String, u: Long, v: Double) =
      (id, java.sql.Timestamp.valueOf(s"2024-01-$day 12:00:00"),
        u, "purchase", v, "{}")
    // both users join week of 2024-01-01; week 2 only user 1 spends
    val e = Seq(
      ev(1L, "02", 1L, 10.0), ev(2L, "10", 1L, 20.0),
      ev(3L, "03", 2L, 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.cohortLtv(e).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L, 15.0, 7.5),
      ("2024-01-01", 1, 2L, 20.0, 17.5)), s"got ${out.toSeq}")
    // corpus: ltv is monotone nondecreasing within every cohort
    val c = Events.eventsCohortLtv(spark, Sf).collect()
      .groupBy(_.getTimestamp(0))
    c.values.foreach { rows =>
      val ltv = rows.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => a <= b + 1e-9 })
    }
  }

  test("TTR: exact ratio on planted repetition, map-only bounds on corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a a b", "en", "s", 5L),
      (2L, "x y z", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.typeTokenRatio(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 3L, 2L, 2.0 / 3), (2L, 3L, 3L, 1.0)),
      s"got ${out.toSeq}")
    val c = TextAnalysis.textTtr(spark, Sf).collect()
    assert(c.forall(r => r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    assert(c.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("dim stats: every embedding dimension profiles with finite moments") {
    val d = graft.operators.Similarity.simDimStats(spark, Sf).collect()
    val dims = graft.Tables.embeddings(spark, Sf)
      .select(size(col("embedding"))).collect()(0).getInt(0)
    assert(d.length == dims)
    d.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(2) &&
        r.getDouble(2) <= r.getDouble(5),
        s"mean outside [min,max] at dim ${r.getInt(0)}")
      assert(r.getDouble(3) > 0.0 && !r.getDouble(3).isNaN)
    }
  }
}
