package graft

/** The REPL's table renderer must reproduce the reference's box-drawn
  * output (reference src/main.rs prints via its table formatter) and
  * behave sanely on truncation and nulls. */
class ReplSpec extends SparkSpec {

  test("formatTable draws the reference-style box") {
    val out = Repl.formatTable(
      Seq("movie", "year"),
      Seq(Seq("taxi driver", "1976"), Seq("up", "2009")))
    val expected =
      """╭─────────────┬──────╮
        |│ movie       │ year │
        |├─────────────┼──────┤
        |│ taxi driver │ 1976 │
        |│ up          │ 2009 │
        |╰─────────────┴──────╯""".stripMargin
    assert(out == expected)
  }

  test("render runs a reference-dialect query end to end") {
    val out = Repl.render(GraftEngine.sql(spark,
      s"select r_name from '$Sf/region.parquet' where r_regionkey = 0"))
    assert(out.contains("r_name") && out.contains("AFRICA"))
  }

  test("explain prefix prints the formatted physical plan, not a table") {
    val out = Repl.eval(spark,
      s"explain select r_name from '$Sf/region.parquet' where r_regionkey = 0",
      ".")
    assert(out.contains("Physical Plan"), out.take(200))
    assert(out.contains("PushedFilters"), "plan must show parquet pushdown")
    assert(!out.contains("╭"), "explain must not render a result table")
  }

  test("pipeline operators are queryable end to end through SQL views") {
    // register the MinHash cluster collapse as a view via the REPL
    // meta-command, then hit it with plain SQL through the front-end
    val msg = Repl.eval(spark, s"pipeline dedup_minhash_clusters $Sf", ".")
    assert(msg.contains("graft_dedup_minhash_clusters"), msg)
    val direct = graft.operators.Dedup.queries("dedup_minhash_clusters")(spark, Sf)
    val viaSql = GraftEngine.sql(spark,
      "select * from graft_dedup_minhash_clusters")
    assert(viaSql.collect().toSet == direct.collect().toSet,
      "SQL view must return exactly the operator's rows")
    // and SQL composes against the pipeline: aggregate over the view
    val nClusters = GraftEngine.sql(spark,
      "select count(distinct comp) as n from graft_dedup_minhash_clusters")
      .collect().head.getLong(0)
    assert(nClusters > 0 && nClusters <= direct.count())

    // ANN + quality-gate pipelines reach SQL the same way
    GraftEngine.pipelineViews(spark, Sf,
      Seq("sim_ann_ivfpq", "quality_gopher_rules"))
    val topHit = GraftEngine.sql(spark,
      "select vec_id from graft_sim_ann_ivfpq where q_id = 0 and rank = 1")
      .collect()
    assert(topHit.length == 1, "ANN view must answer per-query SQL")
    val gated = GraftEngine.sql(spark,
      "select count(*) as n from graft_quality_gopher_rules where keep")
      .collect().head.getLong(0)
    assert(gated > 0, "quality gate view must pass some documents")
  }

  test("pipeline views accept k=v parameters and the plan reflects them") {
    // non-default probe budget through the REPL syntax: the persisted
    // IVF registers with nProbe=2 then nProbe=6 — the static cell
    // partition filter in the view's plan must widen with the budget
    def probedCells(nProbe: Int): Int = {
      val msg = Repl.eval(spark,
        s"pipeline sim_ann_ivf_persisted $Sf k=64 nProbe=$nProbe", ".")
      assert(msg.contains("graft_sim_ann_ivf_persisted") &&
        msg.contains(s"nProbe=$nProbe"), msg)
      val p = GraftEngine.sql(spark,
          "select * from graft_sim_ann_ivf_persisted where rank = 1")
        .queryExecution.executedPlan.toString
      val inList = "cell[^ ]* IN \\(([^)]*)\\)".r.findFirstMatchIn(p)
        .orElse("cell[^ ]* INSET ([\\d, ]+)".r.findFirstMatchIn(p))
      assert(inList.isDefined, s"no static cell partition filter:\n${p.take(800)}")
      inList.get.group(1).split(",").count(_.trim.nonEmpty)
    }
    val narrow = probedCells(2)
    val wide = probedCells(6)
    assert(narrow < wide,
      s"probe budget must widen the partition filter ($narrow !< $wide)")
    assert(wide < 64, s"even nProbe=6 must keep a pruning margin ($wide of 64)")

    // the typo guard: an unknown key fails loudly, never runs defaults
    val err = intercept[IllegalArgumentException] {
      Repl.eval(spark, s"pipeline sim_ann_ivf_persisted $Sf nprobe=8", ".")
    }
    assert(err.getMessage.contains("nprobe"), err.getMessage)
    // and a non-parameterizable operator rejects params outright
    val err2 = intercept[IllegalArgumentException] {
      Repl.eval(spark, s"pipeline q1_agg $Sf k=3", ".")
    }
    assert(err2.getMessage.contains("takes no parameters"), err2.getMessage)
  }

  test("DSIR selection reaches SQL through the pipeline view with a custom k") {
    Repl.eval(spark, s"pipeline pipeline_dsir_sample $Sf k=25 seed=7", ".")
    val n = GraftEngine.sql(spark,
      "select count(*) as n from graft_pipeline_dsir_sample")
      .collect().head.getLong(0)
    assert(n == 25, s"k=25 must select exactly 25 docs, got $n")
  }

  test("stats DDL: build, append, status, staleness, advice via the REPL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_repl_stats").toString
    val built = Repl.eval(spark, s"stats build $dir $Sf", ".")
    assert(built.contains(s"built stats catalog at $dir"), built)
    val st = Repl.eval(spark, s"stats status $dir", ".")
    assert(st.contains("version=") && st.contains("liveDataFiles="), st)
    // advice renders the cataloged joinAdvice rows — six legs — and
    // layout the cataloged layoutPlan rows; neither scans a relation
    val adv = Repl.eval(spark, s"stats advice $dir", ".")
    assert(adv.contains("strategy") && adv.contains("lineitem"), adv)
    val lay = Repl.eval(spark, s"stats layout $dir", ".")
    assert(lay.contains("bucket_count") && lay.contains("lineitem"), lay)
    // a fresh build is not stale; appending the same tables as a
    // "new drop" pushes one leg's appended fraction to 0.5
    val fresh = Repl.eval(spark, s"stats staleness $dir", ".")
    assert(fresh.contains("false") && !fresh.contains("true"), fresh)
    val app = Repl.eval(spark,
      s"stats append $dir $Sf rel=documents key=source", ".")
    assert(app.contains("appended documents(source)"), app)
    val stale = Repl.eval(spark,
      s"stats staleness $dir maxAppendedFrac=0.4", ".")
    assert(stale.contains("true"), stale)
    // the correction verb: retracting the very drop just appended
    // restores every per-key count (REPL surface of the merge law)
    val ret = Repl.eval(spark,
      s"stats retract $dir $Sf rel=documents key=source", ".")
    assert(ret.contains("retracted documents(source)"), ret)
    // maintenance verbs: compact folds the append litter, vacuum
    // sweeps the replaced files
    val comp = Repl.eval(spark, s"stats compact $dir", ".")
    assert(comp.contains("live data files"), comp)
    val vac = Repl.eval(spark, s"stats vacuum $dir", ".")
    assert(vac.contains("orphan file(s)"), vac)
  }

  test("index DDL: build, status, delete-takedown, compact, vacuum via the REPL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_repl_ddl").toString
    // build from the embeddings table, then probe it through the
    // pipeline view pointed at the SAME index dir
    val built = Repl.eval(spark, s"index build ann $dir $Sf k=16", ".")
    assert(built.contains(s"built ann index at $dir") && built.contains("k=16"),
      built)
    val st = Repl.eval(spark, s"index status ann $dir", ".")
    assert(st.contains("version=") && st.contains("liveDataFiles="), st)

    Repl.eval(spark, s"pipeline serve_ann_probe $Sf indexDir=$dir nProbe=16", ".")
    val before = GraftEngine.sql(spark,
        "select distinct vec_id from graft_serve_ann_probe")
      .collect().map(_.getLong(0)).toSet
    assert(before.nonEmpty, "probe against the built index must hit")
    val victim = before.head

    // the takedown verb, SQL-surface only — no Scala required
    val del = Repl.eval(spark, s"index delete ann $dir ids=$victim", ".")
    assert(del.contains("tombstoned 1"), del)
    Repl.eval(spark, s"pipeline serve_ann_probe $Sf indexDir=$dir nProbe=16", ".")
    val after = GraftEngine.sql(spark,
        "select distinct vec_id from graft_serve_ann_probe")
      .collect().map(_.getLong(0)).toSet
    assert(!after.contains(victim),
      s"deleted id $victim still served: ${after.take(5)}")

    // compact folds the tombstone physically; vacuum clears orphans
    val comp = Repl.eval(spark, s"index compact ann $dir", ".")
    assert(comp.contains("live data files"), comp)
    val vac = Repl.eval(spark, s"index vacuum ann $dir", ".")
    assert(vac.contains("vacuumed"), vac)

    // the maintenance verdict (drift + occupancy) and the occupancy
    // actuator, SQL-surface only — a balanced corpus reads as a no-op
    val maint = Repl.eval(spark, s"index maintain ann $dir $Sf", ".")
    assert(maint.contains("maxLoadFactor=") && maint.contains("hotCells=")
      && maint.contains("rebalanceNeeded="), maint)
    val reb = Repl.eval(spark, s"index rebalance ann $dir hotFactor=1000", ".")
    assert(reb.contains("split 0 hot cell(s)"), reb)

    // text twin: build + delete + status round-trip
    val tdir = java.nio.file.Files.createTempDirectory("graft_repl_tddl").toString
    assert(Repl.eval(spark, s"index build text $tdir $Sf", ".")
      .contains("built text index"))
    assert(Repl.eval(spark, s"index delete text $tdir ids=1,2", ".")
      .contains("tombstoned 2"))
    assert(Repl.eval(spark, s"index status text $tdir", ".")
      .contains("liveTombstoneFiles=1"))

    // unknown parameter keys fail loudly, as everywhere on the surface
    val err = intercept[IllegalArgumentException] {
      Repl.eval(spark, s"index compact ann $dir maxfiles=2", ".")
    }
    assert(err.getMessage.contains("maxfiles"), err.getMessage)

    // text takedown -> re-admission, entirely through the SQL surface:
    // an index over ALL documents rejects every batch doc (each is its
    // own exact dup); tombstoning one unique-text batch doc via DDL
    // makes exactly that doc admissible on the next screen
    val xdir = java.nio.file.Files.createTempDirectory("graft_repl_xddl").toString
    Repl.eval(spark, s"index build text $xdir $Sf", ".")
    Repl.eval(spark, s"pipeline dedup_incremental_near $Sf indexDir=$xdir", ".")
    assert(GraftEngine.sql(spark,
        "select count(*) as n from graft_dedup_incremental_near")
      .collect().head.getLong(0) == 0L,
      "a full-corpus index must reject every batch doc")
    // victim = a batch doc sharing NO MinHash band bucket with any
    // other doc — uniqueness by the admission criterion itself (raw
    // text uniqueness isn't enough: the kernel normalizes case and
    // whitespace, and a band can collide across different texts)
    import org.apache.spark.sql.functions.{col, posexplode}
    import graft.functions.HashFunctions.minhashBuckets
    val b = Tables.documents(spark, Sf)
      .select(col("doc_id"), posexplode(minhashBuckets(col("text")))
        .as(Seq("band", "bucket")))
    val colliding = b.as("a").join(b.as("o"),
        col("a.band") === col("o.band") &&
          col("a.bucket") === col("o.bucket") &&
          col("a.doc_id") =!= col("o.doc_id"))
      .select(col("a.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val unique = Tables.documents(spark, Sf)
      .select(col("doc_id")).where(col("doc_id") % 10 === 0)
      .collect().map(_.getLong(0))
      .filterNot(colliding).min
    Repl.eval(spark, s"index delete text $xdir ids=$unique", ".")
    Repl.eval(spark, s"pipeline dedup_incremental_near $Sf indexDir=$xdir", ".")
    val readmitted = GraftEngine.sql(spark,
        "select doc_id from graft_dedup_incremental_near")
      .collect().map(_.getLong(0)).toSet
    assert(readmitted == Set(unique),
      s"takedown of $unique must re-admit exactly it, got $readmitted")

    // media twin: the same takedown -> re-admission flow over the blob
    // planes (a full-corpus media index rejects every batch blob — each
    // collides with its own standing fingerprint at Hamming 0)
    val mdir = java.nio.file.Files.createTempDirectory("graft_repl_mddl").toString
    assert(Repl.eval(spark, s"index build media $mdir $Sf", ".")
      .contains("built media index"))
    Repl.eval(spark, s"pipeline dedup_incremental_media $Sf indexDir=$mdir", ".")
    assert(GraftEngine.sql(spark,
        "select count(*) as n from graft_dedup_incremental_media")
      .collect().head.getLong(0) == 0L,
      "a full-corpus media index must reject every batch blob")
    // victim = a batch blob sharing no (plane, band, bucket) with any
    // other doc — uniqueness by the admission join's own key
    val mb = graft.operators.MediaIndex.bucketsOf(
      graft.operators.Multimodal.withBlobs(Tables.documents(spark, Sf)))
    val mcolliding = mb.as("a").join(mb.as("o"),
        col("a.plane") === col("o.plane") &&
          col("a.band") === col("o.band") &&
          col("a.bucket") === col("o.bucket") &&
          col("a.doc_id") =!= col("o.doc_id"))
      .select(col("a.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val mvictim = Tables.documents(spark, Sf)
      .select(col("doc_id")).where(col("doc_id") % 7 === 0)
      .collect().map(_.getLong(0))
      .filterNot(mcolliding).min
    Repl.eval(spark, s"index delete media $mdir ids=$mvictim", ".")
    Repl.eval(spark, s"pipeline dedup_incremental_media $Sf indexDir=$mdir", ".")
    val mreadmitted = GraftEngine.sql(spark,
        "select doc_id from graft_dedup_incremental_media")
      .collect().map(_.getLong(0)).toSet
    assert(mreadmitted == Set(mvictim),
      s"media takedown of $mvictim must re-admit exactly it, got $mreadmitted")

    // PQ twin: the IVFPQ encoding builds through the same DDL and
    // shares the takedown/maintenance verbs (same manifest contract)
    val pdir = java.nio.file.Files.createTempDirectory("graft_repl_pddl").toString
    val pb = Repl.eval(spark, s"index build pq $pdir $Sf k=16 m=8", ".")
    assert(pb.contains("built ivfpq index") && pb.contains("m=8"), pb)
    val pq = Repl.eval(spark, s"index delete pq $pdir ids=7", ".")
    assert(pq.contains("tombstoned 1"), pq)
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, Sf)
    val queries = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val served = graft.operators.AnnIndex
      .queryPq(spark, pdir, queries, emb, nProbe = 16, topK = 50)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(served.nonEmpty && !served.contains(7L),
      s"tombstoned id 7 still served by the PQ index")

    // SQ8 twin: the 4× byte encoding builds/appends through the same
    // DDL and shares the takedown/maintenance verbs
    val sdir = java.nio.file.Files.createTempDirectory("graft_repl_sddl").toString
    val sb = Repl.eval(spark, s"index build sq8 $sdir $Sf k=16", ".")
    assert(sb.contains("built ivfsq8 index") && sb.contains("k=16"), sb)
    val sd = Repl.eval(spark, s"index delete sq8 $sdir ids=7", ".")
    assert(sd.contains("tombstoned 1"), sd)
    val sServed = graft.operators.AnnIndex
      .querySq8(spark, sdir, queries, emb, nProbe = 16, topK = 50)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(sServed.nonEmpty && !sServed.contains(7L),
      s"tombstoned id 7 still served by the SQ8 index")
    assert(Repl.eval(spark, s"index status sq8 $sdir", ".")
      .contains("liveDataFiles"), "sq8 status must render")
  }

  test("model DDL: fit, status, and a scoring view over the persisted model") {
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    val fitMsg = Repl.eval(spark,
      s"model fit quality $dir/m perClass=200 maxIter=5", Sf)
    assert(fitMsg.contains("fitted quality model"), fitMsg)
    val status = Repl.eval(spark, s"model status quality $dir/m", Sf)
    assert(status.contains("weights=") && status.contains("intercept="), status)
    // scoring composes through the pipeline-view surface + plain SQL
    val view = Repl.eval(spark,
      s"pipeline quality_score $Sf modelDir=$dir/m", Sf)
    assert(view.contains("registered view"), view)
    val n = GraftEngine.sql(spark,
      "select count(*) from graft_quality_score where q_score >= 0", Sf)
      .collect()(0).getLong(0)
    assert(n == Tables.documents(spark, Sf).count(),
      "every doc must score through the persisted model")
    // drift check through the DDL: same corpus the model was fitted on
    // → no refit needed
    val maint = Repl.eval(spark, s"model maintain quality $dir/m", Sf)
    assert(maint.contains("drift=") && maint.contains("refitNeeded=false"),
      maint)
    // unknown knob must fail loudly, not silently run defaults
    val err = intercept[IllegalArgumentException] {
      Repl.eval(spark, s"model fit quality $dir/m2 prClass=5", Sf)
    }
    assert(err.getMessage.contains("prClass"), err.getMessage)
    // ...and fail BEFORE any side effect: no model dir may exist after
    assert(!new java.io.File(s"$dir/m2").exists,
      "typo'd fit persisted a default-fitted model")
  }

  test("bpe model DDL: fit + status + tokenizer-true sharding, all from SQL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val base = java.nio.file.Files.createTempDirectory("graft_bpeddl").toString
    // planted corpus: 'abc' merges are learnable; the CJK stand-in doc
    // is one whitespace word but six bpe tokens
    Seq(
      (1L, "abcabc abcabc abc abc abc", "en"),
      (2L, "abcabcabcabcabcabc", "zz"),
      (3L, "x y z", "en"))
      .toDF("doc_id", "text", "lang").withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$base/data/documents.parquet")
    val fitMsg = Repl.eval(spark,
      s"model fit bpe $base/m $base/data nMerges=2", ".")
    assert(fitMsg.contains("fitted bpe model") && fitMsg.contains("2 merges"),
      fitMsg)
    val status = Repl.eval(spark, s"model status bpe $base/m", ".")
    assert(status.contains("2 merges") && status.contains("(a,b)"), status)
    // the tokenizer loop closes from SQL: encode view + packing knob
    Repl.eval(spark,
      s"pipeline text_bpe_encode $base/data modelDir=$base/m", ".")
    val enc = GraftEngine.sql(spark,
      "select doc_id, n_words, n_bpe_tokens from graft_text_bpe_encode " +
        "order by doc_id", ".")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc(2L) == ((1L, 6L)),
      s"no-space doc must count 6 bpe tokens via the DDL-built model: $enc")
    Repl.eval(spark,
      s"pipeline pipeline_shard $base/data tokens=bpe:$base/m budget=6", ".")
    val shards = spark.table("graft_pipeline_shard")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    // en stratum under bpe counts: doc 1 = 7 tokens, so doc 3 starts at
    // offset 7 -> shard 1 (whitespace counts would say 5+3 = one shard)
    assert(shards(1L) == 0L && shards(3L) == 1L,
      s"bpe counts must move doc 3 past the 6-token budget: $shards")
    // unknown knob fails fast, nothing persisted
    val err = intercept[IllegalArgumentException] {
      Repl.eval(spark, s"model fit bpe $base/m2 merges=2", ".")
    }
    assert(err.getMessage.contains("merges"), err.getMessage)
    assert(!new java.io.File(s"$base/m2").exists)
  }

  test("render truncates past MaxRows and shows nulls as NULL") {
    import spark.implicits._
    val big = spark.range(500).toDF("id")
    val out = Repl.render(big, maxRows = 10)
    assert(out.linesIterator.size == 10 + 5) // 10 rows + 4 frame lines + note
    assert(out.contains("… more rows"))
    val nulls = Seq((1L, None: Option[String]), (2L, Some("x")))
      .toDF("id", "v")
    assert(Repl.render(nulls).contains("NULL"))
  }

  test("round-13 analytics take knobs through the pipeline view") {
    // conversion lag re-targeted at view->click: a DIFFERENT funnel leg
    // than the gate default, so the curves must disagree somewhere
    GraftEngine.pipelineView(spark, "events_conversion_lag", Sf,
      Map("to" -> "click"))
    val clicks = GraftEngine.sql(spark,
      "select lag_hours, n_users from graft_events_conversion_lag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dflt = graft.operators.Events.eventsConversionLag(spark, Sf)
      .select("lag_hours", "n_users")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clicks.nonEmpty)
    assert(clicks != dflt,
      s"view->click must trace a different lag curve than view->purchase")
    // novelty at n=2: denser grams than the 8-gram default
    GraftEngine.pipelineView(spark, "text_ngram_novelty", Sf,
      Map("n" -> "2"))
    val g2 = GraftEngine.sql(spark,
      "select sum(n_distinct_grams) as n from graft_text_ngram_novelty")
      .collect().head.getLong(0)
    val g8 = graft.operators.TextAnalysis.textNgramNovelty(spark, Sf)
      .agg(org.apache.spark.sql.functions.sum("n_distinct_grams"))
      .collect().head.getLong(0)
    assert(g2 > g8, s"2-grams must outnumber 8-grams: $g2 vs $g8")
  }

  test("skew profile re-targets at any table column through the pipeline view") {
    GraftEngine.pipelineView(spark, "pipeline_skew_stats", Sf,
      Map("rel" -> "orders", "key" -> "o_orderpriority"))
    val r = GraftEngine.sql(spark,
      "select rel, keycol, n_keys from graft_pipeline_skew_stats")
      .collect()
    assert(r.length == 1 && r(0).getString(0) == "orders" &&
      r(0).getString(1) == "o_orderpriority" && r(0).getLong(2) == 5L,
      r.mkString(","))
    // a rel= without key= must fail loudly, not profile something else
    val e = intercept[IllegalArgumentException] {
      GraftEngine.pipelineView(spark, "pipeline_skew_stats", Sf,
        Map("rel" -> "orders"))
    }
    assert(e.getMessage.contains("key="))

    // the advisor re-targets the same way, and broadcastBytes= moves
    // the strategy: the whole orders table fits a 10 MiB build side
    // but not a 1-byte one
    GraftEngine.pipelineView(spark, "pipeline_join_advisor", Sf,
      Map("rel" -> "orders", "key" -> "o_custkey"))
    assert(GraftEngine.sql(spark,
        "select strategy from graft_pipeline_join_advisor")
      .collect().head.getString(0) == "broadcast")
    GraftEngine.pipelineView(spark, "pipeline_join_advisor", Sf,
      Map("rel" -> "orders", "key" -> "o_custkey", "broadcastBytes" -> "1"))
    assert(GraftEngine.sql(spark,
        "select strategy from graft_pipeline_join_advisor")
      .collect().head.getString(0) != "broadcast")
  }

  test("late-wave view knobs: probes=, k=, experiment= reach the operators") {
    import org.apache.spark.sql.functions._
    // recall curve: a custom probe ladder yields exactly those rows
    GraftEngine.pipelineView(spark, "sim_ann_recall_curve", Sf,
      Map("probes" -> "2,8"))
    val pr = GraftEngine.sql(spark,
      "select nprobe from graft_sim_ann_recall_curve order by nprobe")
      .collect().map(_.getInt(0)).toSeq
    assert(pr == Seq(2, 8), pr.toString)
    // top terms: k=2 caps every source's ranks at 2
    GraftEngine.pipelineView(spark, "text_source_topterms", Sf,
      Map("k" -> "2"))
    val mx = GraftEngine.sql(spark,
      "select max(rank) from graft_text_source_topterms")
      .collect()(0).getInt(0)
    assert(mx == 2, s"k=2 ignored: max rank $mx")
    // ab significance: a different experiment salt re-splits the arms
    GraftEngine.pipelineView(spark, "events_ab_significance", Sf,
      Map("experiment" -> "exp2"))
    val n2 = GraftEngine.sql(spark,
      "select n_a from graft_events_ab_significance").collect()(0).getLong(0)
    GraftEngine.pipelineView(spark, "events_ab_significance", Sf)
    val n1 = GraftEngine.sql(spark,
      "select n_a from graft_events_ab_significance").collect()(0).getLong(0)
    assert(n1 != n2, s"experiment salt did not re-split arms: $n1 == $n2")
  }

  test("column profile re-targets at any table through the pipeline view") {
    GraftEngine.pipelineView(spark, "pipeline_column_profile", Sf,
      Map("rel" -> "nation"))
    val r = GraftEngine.sql(spark,
      "select colname, n_rows, n_null, n_distinct " +
        "from graft_pipeline_column_profile order by colname").collect()
    assert(r.map(_.getString(0)).toSeq ==
      Seq("n_name", "n_nationkey", "n_regionkey"), r.mkString(","))
    // nation: 25 rows, all keys distinct, no nulls anywhere
    assert(r.forall(x => x.getLong(1) == 25L && x.getLong(2) == 0L))
    assert(r.find(_.getString(0) == "n_nationkey").get.getLong(3) == 25L)
  }
}
