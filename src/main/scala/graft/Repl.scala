package graft

import org.apache.spark.sql.DataFrame

/** Interactive read-eval-print loop over GraftEngine.sql — the
  * reference's primary UX (cite: reference src/main.rs:1, a rustyline
  * loop printing box-drawn tables). Reference users run their existing
  * queries verbatim:
  *
  * {{{
  * sbt "runMain graft.Repl [baseDir]"
  * >> select * from 'tests/resources/data/movies1.parquet'
  * ╭─────────────┬────────┬──────╮
  * │ movie       │ score1 │ year │
  * ├─────────────┼────────┼──────┤
  * │ taxi driver │ 9      │ 1976 │
  * ╰─────────────┴────────┴──────╯
  * }}}
  *
  * Relative parquet paths resolve against `baseDir` (default: cwd).
  * Errors print and the loop continues, as in the reference.
  */
object Repl {

  val MaxRows = 100

  /** Box-drawn table in the reference's output style. Pure function of
    * (header, rows) so it's unit-testable without a terminal. */
  def formatTable(header: Seq[String], rows: Seq[Seq[String]]): String = {
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    def line(l: String, m: String, r: String) =
      widths.map(w => "─" * (w + 2)).mkString(l, m, r)
    def row(cells: Seq[String]) =
      cells.zip(widths).map { case (c, w) => s" ${c.padTo(w, ' ')} " }
        .mkString("│", "│", "│")
    (Seq(line("╭", "┬", "╮"), row(header), line("├", "┼", "┤")) ++
      rows.map(row) :+ line("╰", "┴", "╯")).mkString("\n")
  }

  def render(df: DataFrame, maxRows: Int = MaxRows): String = {
    val taken = df.take(maxRows + 1)
    val shown = taken.take(maxRows)
    val header = df.columns.toSeq
    val rows = shown.toSeq.map(r =>
      header.indices.map(i => if (r.isNullAt(i)) "NULL" else r.get(i).toString))
    val table = formatTable(header, rows)
    if (taken.length > maxRows) s"$table\n… more rows (showing first $maxRows)"
    else table
  }

  /** Index lifecycle DDL — the SQL/REPL user's route to the verbs that
    * were previously Scala-only (most importantly `delete`, the
    * takedown verb: a compliance operator must not require a Scala
    * build). Syntax:
    *
    * {{{
    * index <build|append|delete|compact|vacuum|status|maintain|rebalance>
    *       <ann|pq|text|media> <indexDir> [dataDir] [key=value ...]
    * }}}
    *
    * `build`/`append` read the corpus tables (embeddings / documents)
    * from `dataDir` (default: the session's baseDir); `delete` takes
    * `ids=1,2,3`; `compact`/`vacuum`/`status` act on the index alone.
    * `pq` builds/appends the IVFPQ encoding (buildPq/appendPq; knobs
    * m, codebookK) — its takedown/maintenance verbs are the raw-IVF
    * ones, since both layouts share the manifest and cell-directory
    * contract. The built raw index is immediately probeable via
    * `pipeline serve_ann_probe indexDir=<indexDir>`. */
  def evalIndex(spark: org.apache.spark.sql.SparkSession, rest: String,
                baseDir: String): String = {
    import graft.operators.{AnnIndex, Bm25Index, MediaIndex, TextIndex}
    val toks = rest.trim.split("\\s+")
    require(toks.length >= 3,
      "syntax: index <build|append|delete|compact|vacuum|status" +
        "|maintain|rebalance> " +
        "<ann|pq|sq8|text|media|bm25> <indexDir> [dataDir] [key=value ...]")
    val (verb, kind, dir) = (toks(0).toLowerCase, toks(1).toLowerCase, toks(2))
    require(kind == "ann" || kind == "pq" || kind == "sq8" ||
      kind == "text" || kind == "media" || kind == "bm25",
      s"unknown index kind '$kind' — expected ann, pq, sq8, text, media " +
        "or bm25")
    def mediaBlobs(dataDir: String) = graft.operators.Multimodal
      .withBlobs(Tables.documents(spark, dataDir))
    val (kvs, positional) = toks.drop(3).partition(_.contains("="))
    require(positional.length <= 1,
      s"unexpected arguments ${positional.drop(1).mkString(" ")}")
    val dataDir = positional.headOption.getOrElse(baseDir)
    val p = new GraftEngine.Params(s"index $verb $kind",
      kvs.map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap)
    val out = (verb, kind) match {
      case ("build", "ann") =>
        val cents = AnnIndex.build(spark, Tables.embeddings(spark, dataDir),
          dir, k = p.int("k", 0),
          targetCellSize = p.long("targetCellSize", 64L))
        s"built ann index at $dir (k=${cents.length}, dim=${cents.head.length})"
      case ("build", "pq") =>
        val qz = AnnIndex.buildPq(spark, Tables.embeddings(spark, dataDir),
          dir, k = p.int("k", 0), m = p.int("m", 8),
          codebookK = p.int("codebookK", 64),
          targetCellSize = p.long("targetCellSize", 64L))
        s"built ivfpq index at $dir (k=${qz.centroids.length}, " +
          s"m=${qz.codebooks.length})"
      case ("build", "sq8") =>
        val (cents, _) = AnnIndex.buildSq8(spark,
          Tables.embeddings(spark, dataDir), dir, k = p.int("k", 0),
          targetCellSize = p.long("targetCellSize", 64L))
        s"built ivfsq8 index at $dir (k=${cents.length}, " +
          s"dim=${cents.head.length})"
      case ("build", "text") =>
        TextIndex.build(spark, Tables.documents(spark, dataDir), dir)
        s"built text index at $dir"
      case ("build", "media") =>
        MediaIndex.build(spark, mediaBlobs(dataDir), dir)
        s"built media index at $dir"
      case ("build", "bm25") =>
        Bm25Index.build(spark, Tables.documents(spark, dataDir), dir)
        s"built bm25 index at $dir"
      case ("append", "ann") =>
        AnnIndex.append(spark, Tables.embeddings(spark, dataDir), dir)
        s"appended embeddings from $dataDir into $dir"
      case ("append", "pq") =>
        AnnIndex.appendPq(spark, Tables.embeddings(spark, dataDir), dir)
        s"appended embeddings from $dataDir into $dir"
      case ("append", "sq8") =>
        AnnIndex.appendSq8(spark, Tables.embeddings(spark, dataDir), dir)
        s"appended embeddings from $dataDir into $dir"
      case ("append", "text") =>
        TextIndex.append(spark, Tables.documents(spark, dataDir), dir)
        s"appended documents from $dataDir into $dir"
      case ("append", "media") =>
        MediaIndex.append(spark, mediaBlobs(dataDir), dir)
        s"appended media blobs from $dataDir into $dir"
      case ("append", "bm25") =>
        Bm25Index.append(spark, Tables.documents(spark, dataDir), dir)
        s"appended documents from $dataDir into $dir"
      case ("delete", _) =>
        val ids = p.strings("ids", Seq.empty).map(_.toLong)
        require(ids.nonEmpty, "index delete needs ids=<id,id,...>")
        if (kind == "text") TextIndex.delete(spark, dir, ids)
        else if (kind == "media") MediaIndex.delete(spark, dir, ids)
        else if (kind == "bm25") Bm25Index.delete(spark, dir, ids)
        else AnnIndex.delete(spark, dir, ids)
        s"tombstoned ${ids.length} id(s) in $dir"
      case ("compact", "ann" | "pq" | "sq8") =>
        val (before, after) = AnnIndex.compact(spark, dir,
          maxFilesPerCell = p.int("maxFilesPerCell", 4))
        s"compacted $dir: live data files $before -> $after"
      case ("compact", "text") =>
        val (before, after) = TextIndex.compact(spark, dir,
          smallFileBytes = p.long("smallFileBytes", 16L << 20))
        s"compacted $dir: live data files $before -> $after"
      case ("compact", "media") =>
        val (before, after) = MediaIndex.compact(spark, dir,
          smallFileBytes = p.long("smallFileBytes", 16L << 20))
        s"compacted $dir: live data files $before -> $after"
      case ("compact", "bm25") =>
        val (before, after) = Bm25Index.compact(spark, dir,
          smallFileBytes = p.long("smallFileBytes", 16L << 20))
        s"compacted $dir: live data files $before -> $after"
      case ("vacuum", _) =>
        val n = if (kind == "text") TextIndex.vacuum(spark, dir, p.long("graceMs", 0L))
                else if (kind == "media") MediaIndex.vacuum(spark, dir, p.long("graceMs", 0L))
                else if (kind == "bm25") Bm25Index.vacuum(spark, dir, p.long("graceMs", 0L))
                else AnnIndex.vacuum(spark, dir, p.long("graceMs", 0L))
        s"vacuumed $n orphan file(s) from $dir"
      case ("status", _) =>
        val st = if (kind == "text") TextIndex.status(spark, dir)
                 else if (kind == "media") MediaIndex.status(spark, dir)
                 else if (kind == "bm25") Bm25Index.status(spark, dir)
                 else AnnIndex.status(spark, dir)
        s"version=${st.version} built=${st.built} " +
          s"liveDataFiles=${st.liveDataFiles} " +
          s"liveTombstoneFiles=${st.liveTombstoneFiles}"
      // the full maintenance verdict — drift (refit) AND occupancy
      // (rebalance) — against a would-be ingest batch from dataDir
      case ("maintain", "ann" | "pq" | "sq8") =>
        val dec = AnnIndex.maintain(spark, dir,
          Tables.embeddings(spark, dataDir),
          maxDistortionRatio = p.double("maxDistortionRatio", 1.5),
          hotFactor = p.double("hotFactor", 4.0))
        f"appendedFrac=${dec.appendedFrac}%.3f " +
          f"distortionRatio=${dec.distortionRatio}%.3f " +
          f"maxLoadFactor=${dec.maxLoadFactor}%.3f " +
          s"hotCells=${dec.hotCells} refitNeeded=${dec.refitNeeded} " +
          s"rebalanceNeeded=${dec.rebalanceNeeded}"
      case ("rebalance", "ann") =>
        val rep = AnnIndex.rebalance(spark, dir,
          hotFactor = p.double("hotFactor", 4.0))
        f"split ${rep.split} hot cell(s): k ${rep.kBefore} -> " +
          f"${rep.kAfter}, maxLoadFactor ${rep.maxLoadBefore}%.3f -> " +
          f"${rep.maxLoadAfter}%.3f"
      case _ => throw new IllegalArgumentException(
        s"unknown index verb '$verb' — expected " +
          "build|append|delete|compact|vacuum|status|maintain|rebalance")
    }
    p.requireAllRead()
    out
  }

  /** Stats-catalog lifecycle DDL — ANALYZE at rest from SQL:
    * {{{
    *   stats build <catalogDir> [dataDir]            // the six advisor legs
    *   stats append <catalogDir> [dataDir] rel=<r> key=<k>  // one drop
    *   stats retract <catalogDir> [dataDir] rel=<r> key=<k> // a takedown
    *   stats <status|staleness|advice|layout> <catalogDir> [k=v ...]
    *   stats layout list                             // persisted layouts
    *   stats layout drop name=<tag>                  // retire one
    * }}}
    * `build` scans each standard advisor leg once; `append` folds a
    * new drop directory's per-key deltas in (the ingest-batch verb);
    * `retract` folds NEGATED deltas of a removed batch (the
    * correction verb — no rebuild); `advice` renders the cataloged
    * joinAdvice rows and `layout` the cataloged layoutPlan rows — no
    * profiled relation is scanned by either. The executed form is
    * `ScaleJoins.advisedJoin(..., statsDir=<catalogDir>)`. */
  def evalStats(spark: org.apache.spark.sql.SparkSession, rest: String,
                baseDir: String): String = {
    import graft.operators.StatsCatalog
    val toks = rest.trim.split("\\s+")
    require(toks.length >= 2,
      "syntax: stats <build|append|retract|status|staleness|advice" +
        "|layout|compact|vacuum> <catalogDir> [dataDir] [key=value ...]")
    val (verb, dir) = (toks(0).toLowerCase, toks(1))
    val (kvs, positional) = toks.drop(2).partition(_.contains("="))
    require(positional.length <= 1,
      s"unexpected arguments ${positional.drop(1).mkString(" ")}")
    val dataDir = positional.headOption.getOrElse(baseDir)
    val p = new GraftEngine.Params(s"stats $verb",
      kvs.map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap)
    def reader(rel: String): org.apache.spark.sql.DataFrame = rel match {
      case "events" => Tables.events(spark, dataDir)
      case "orders" => Tables.orders(spark, dataDir)
      case "lineitem" => Tables.lineitem(spark, dataDir)
      case "documents" => Tables.documents(spark, dataDir)
      case "customer" => Tables.customer(spark, dataDir)
      case "supplier" => Tables.supplier(spark, dataDir)
      case other => throw new IllegalArgumentException(
        s"unknown relation '$other'")
    }
    verb match {
      case "build" =>
        p.requireAllRead()
        StatsCatalog.build(spark, dir, Seq(
          StatsCatalog.Leg(reader("events"), "events", "user_id"),
          StatsCatalog.Leg(reader("events"), "events", "event_type"),
          StatsCatalog.Leg(reader("orders"), "orders", "o_custkey"),
          StatsCatalog.Leg(reader("lineitem"), "lineitem", "l_suppkey"),
          StatsCatalog.Leg(reader("lineitem"), "lineitem", "l_partkey"),
          StatsCatalog.Leg(reader("documents"), "documents", "source")))
        s"built stats catalog at $dir (6 legs from $dataDir)"
      case "append" =>
        val (rel, key) = (p.str("rel", ""), p.str("key", ""))
        p.requireAllRead()
        require(rel.nonEmpty && key.nonEmpty,
          "stats append needs rel=<relation> key=<keycol>")
        StatsCatalog.append(spark, dir, reader(rel), rel, key)
        s"appended $rel($key) deltas from $dataDir into $dir"
      case "retract" =>
        val (rel, key) = (p.str("rel", ""), p.str("key", ""))
        p.requireAllRead()
        require(rel.nonEmpty && key.nonEmpty,
          "stats retract needs rel=<relation> key=<keycol>")
        StatsCatalog.retract(spark, dir, reader(rel), rel, key)
        s"retracted $rel($key) deltas of $dataDir from $dir"
      case "status" =>
        p.requireAllRead()
        val st = StatsCatalog.status(spark, dir)
        s"version=${st.version} built=${st.built} " +
          s"liveDataFiles=${st.liveDataFiles} " +
          s"liveTombstoneFiles=${st.liveTombstoneFiles}"
      case "staleness" =>
        val maxFrac = p.double("maxAppendedFrac", 0.5)
        p.requireAllRead()
        render(StatsCatalog.staleness(spark, dir, maxFrac))
      case "advice" =>
        val bb = p.long("broadcastBytes", 1L << 20)
        p.requireAllRead()
        render(StatsCatalog.advice(spark, dir, bb))
      // `stats layout <catalogDir>` renders the cataloged layout plan;
      // the LIFECYCLE subverbs take the dir slot: `stats layout list`
      // enumerates the session's persisted graft_bucketed_* layouts
      // (tag, bytes, files, mtime), `stats layout drop name=<tag>`
      // retires one (both managed tables + warehouse data)
      case "layout" if dir == "list" =>
        p.requireAllRead()
        render(graft.operators.ScaleJoins.layouts(spark))
      case "layout" if dir == "drop" =>
        val name = p.str("name", "")
        p.requireAllRead()
        require(name.nonEmpty, "stats layout drop needs name=<layoutTag>")
        val n = graft.operators.ScaleJoins.dropLayout(spark, name)
        s"dropped $n layout table(s) for '$name'"
      case "layout" =>
        val tb = p.long("targetBytes", 1L << 20)
        p.requireAllRead()
        render(StatsCatalog.layoutAdvice(spark, dir, tb))
      case "compact" =>
        p.requireAllRead()
        val (before, after) = StatsCatalog.compact(spark, dir)
        s"compacted $dir: live data files $before -> $after"
      case "vacuum" =>
        val grace = p.long("graceMs", 0L)
        p.requireAllRead()
        s"vacuumed ${StatsCatalog.vacuum(spark, dir, grace)} " +
          s"orphan file(s) from $dir"
      case _ => throw new IllegalArgumentException(
        s"unknown stats verb '$verb' — expected " +
          "build|append|retract|status|staleness|advice|layout" +
          "|compact|vacuum")
    }
  }

  /** Model lifecycle DDL — the persisted-model twin of the index DDL:
    * {{{
    *   model <fit|status|maintain> quality <modelDir> [dataDir] [k=v ...]
    *   model <fit|status> bpe <modelDir> [dataDir] [nMerges=N]
    * }}}
    * `quality` is the distilled classifier (weak Gopher labels,
    * deterministic per-class sample; knobs dims, perClass, maxIter,
    * seed; `maintain` reports score-distribution drift vs the fit
    * snapshot). `bpe` fits the tokenizer's merge table on `dataDir`'s
    * documents and persists it — the model the packing family's
    * `tokens=bpe:<modelDir>` knob and `pipeline text_bpe_encode
    * modelDir=<modelDir>` consume, so the full tokenizer loop is
    * reachable without a Scala build. Scoring composes through
    * `pipeline quality_score <dataDir> modelDir=<modelDir>`. */
  def evalModel(spark: org.apache.spark.sql.SparkSession, rest: String,
                baseDir: String): String = {
    import graft.operators.{Pretrain, QualityModel}
    val toks = rest.trim.split("\\s+")
    require(toks.length >= 3,
      "syntax: model <fit|status|maintain> <quality|bpe> <modelDir> " +
        "[dataDir] [key=value ...]")
    val (verb, kind, dir) = (toks(0).toLowerCase, toks(1).toLowerCase, toks(2))
    require(kind == "quality" || kind == "bpe",
      s"unknown model kind '$kind' — expected quality or bpe")
    val (kvs, positional) = toks.drop(3).partition(_.contains("="))
    require(positional.length <= 1,
      s"unexpected arguments ${positional.drop(1).mkString(" ")}")
    val dataDir = positional.headOption.getOrElse(baseDir)
    val p = new GraftEngine.Params(s"model $verb $kind",
      kvs.map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap)
    // read EVERY knob and run the unknown-key guard BEFORE any verb
    // executes: a typo'd knob (prClass=5) must fail fast with no side
    // effects, not train on defaults and persist a model first
    if (kind == "bpe") {
      val nMerges = p.int("nMerges", 12)
      p.requireAllRead()
      return verb match {
        case "fit" =>
          val merges = Pretrain.bpeMerges(
            Tables.documents(spark, dataDir), spark, nMerges = nMerges)
          Pretrain.saveBpeModel(merges, dir)
          s"fitted bpe model at $dir (${merges.count()} merges)"
        case "status" =>
          val m = Pretrain.loadBpeMerges(spark, dir)
          val head = m.take(3).map { case (a, b) => s"($a,$b)" }.mkString(" ")
          s"bpe model at $dir: ${m.size} merges, first: $head"
        case other => throw new IllegalArgumentException(
          s"unknown bpe model verb '$other' — expected fit|status")
      }
    }
    val (dims, perClass, maxIter, seed, refDir) =
      (p.int("dims", QualityModel.Dims), p.int("perClass", 2000),
        p.int("maxIter", 25), p.long("seed", 42L), p.str("refDir", ""))
    p.requireAllRead()
    verb match {
      case "fit" =>
        val (w, b) = QualityModel.fitQualityLr(
          Tables.documents(spark, dataDir),
          dims = dims, perClass = perClass, maxIter = maxIter, seed = seed)
        QualityModel.saveModel(w, b, dir,
          fitDocs = Some(Tables.documents(spark, dataDir)))
        f"fitted quality model at $dir (weights=${w.count()}, intercept=$b%.6f)"
      case "status" =>
        val (w, b) = QualityModel.loadModel(spark, dir)
        f"quality model at $dir: weights=${w.count()} intercept=$b%.6f"
      case "maintain" =>
        val rep = QualityModel.maintain(spark, dir,
          Tables.documents(spark, if (refDir.isEmpty) dataDir else refDir))
        f"quality model at $dir: drift=${rep.drift}%.6f " +
          s"threshold=${rep.threshold} refitNeeded=${rep.refitNeeded}"
      case _ => throw new IllegalArgumentException(
        s"unknown model verb '$verb' — expected fit|status|maintain")
    }
  }

  /** Versioned-table DDL — [[graft.operators.TableStore]] from the
    * REPL (the CDC/time-travel loop without a Scala build):
    *
    * {{{
    * table <publish|merge|asof|status|vacuum> <tableDir> [dataDir] [k=v ...]
    * }}}
    *
    * `publish` commits dataDir's documents (doc_id, text) as the next
    * full snapshot; `merge changes=<parquetDir>` applies a
    * (doc_id, op∈U|I|D, c_text) batch and publishes v+1; `asof v=N`
    * renders the table exactly as version N published it; `vacuum
    * retain=K` keeps the trailing K versions readable. */
  def evalTable(spark: org.apache.spark.sql.SparkSession, rest: String,
                baseDir: String): String = {
    import org.apache.spark.sql.functions.col
    import graft.operators.TableStore
    val toks = rest.trim.split("\\s+").toSeq
    require(toks.length >= 2,
      "syntax: table <publish|merge|asof|status|vacuum> <tableDir> " +
        "[dataDir] [key=value ...]")
    val (verb, dir) = (toks(0).toLowerCase, toks(1))
    val (kvs, positional) = toks.drop(2).partition(_.contains("="))
    require(positional.length <= 1,
      s"unexpected arguments ${positional.drop(1).mkString(" ")}")
    val dataDir = positional.headOption.getOrElse(baseDir)
    val p = new GraftEngine.Params(s"table $verb",
      kvs.map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap)
    verb match {
      case "publish" =>
        val v = TableStore.publish(spark,
          Tables.documents(spark, dataDir)
            .select(col("doc_id"), col("text")), dir)
        s"published version $v at $dir"
      case "merge" =>
        val changesDir = p.str("changes", "")
        require(changesDir.nonEmpty,
          "table merge needs changes=<parquetDir> with (doc_id, op, c_text)")
        val v = TableStore.merge(spark, dir,
          spark.read.parquet(changesDir))
        s"merged $changesDir into $dir as version $v"
      case "asof" =>
        render(TableStore.asof(spark, dir,
          p.long("v", TableStore.currentVersion(spark, dir)))
          .orderBy(col("doc_id")))
      case "status" =>
        s"version=${TableStore.currentVersion(spark, dir)}"
      case "vacuum" =>
        val retain = p.int("retain", 2)
        val n = TableStore.vacuumRetain(spark, dir, retain)
        s"vacuumed $n file(s); trailing $retain version(s) retained"
      case other => throw new IllegalArgumentException(
        s"unknown table verb '$other' — expected publish, merge, asof, " +
          "status or vacuum")
    }
  }

  /** One REPL step: `explain <query>` → formatted physical plan (beyond
    * the reference's surface — its optimizer is a no-op; on Spark the
    * plan IS the performance story); `pipeline <name> [dataDir]
    * [k=v ...]` → register the operator as a SQL view
    * (GraftEngine.pipelineView) so subsequent queries compose against
    * it — trailing k=v tokens override the operator's gate defaults
    * (e.g. `pipeline sim_ann_ivf_persisted /data nProbe=8`);
    * `index <verb> ...` → the index lifecycle DDL ([[evalIndex]]);
    * anything else → rendered table. */
  def eval(spark: org.apache.spark.sql.SparkSession, line: String,
           baseDir: String): String = {
    val t = line.trim
    if (t.toLowerCase.startsWith("explain "))
      GraftEngine.sql(spark, t.drop(8), baseDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
    else if (t.toLowerCase.startsWith("index "))
      evalIndex(spark, t.drop(6), baseDir)
    else if (t.toLowerCase.startsWith("model "))
      evalModel(spark, t.drop(6), baseDir)
    else if (t.toLowerCase.startsWith("stats "))
      evalStats(spark, t.drop(6), baseDir)
    else if (t.toLowerCase.startsWith("table "))
      evalTable(spark, t.drop(6), baseDir)
    else if (t.toLowerCase.startsWith("pipeline ")) {
      val args = t.drop(9).trim.split("\\s+")
      val (kvs, positional) = args.tail.partition(_.contains("="))
      // at most one positional (the data dir): a trailing token that
      // isn't k=v is a separator typo (`nProbe:4`), and silently
      // dropping it would run the gate default — the exact silent
      // fallback the Params unknown-key guard exists to prevent
      require(positional.length <= 1,
        s"unexpected arguments ${positional.drop(1).mkString(" ")} — " +
          "syntax: pipeline <name> [dataDir] [key=value ...]")
      val params = kvs.map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> v
      }.toMap
      val view = GraftEngine.pipelineView(
        spark, args(0), positional.headOption.getOrElse(baseDir), params)
      s"registered view $view" +
        (if (params.isEmpty) "" else s" with ${kvs.sorted.mkString(" ")}")
    }
    else render(GraftEngine.sql(spark, line, baseDir))
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse(System.getProperty("user.dir"))
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    println("graft SQL engine — reference-dialect queries; exit/quit to leave")
    var running = true
    while (running) {
      print(">> ")
      Console.flush()
      val line = scala.io.StdIn.readLine()
      if (line == null || line.trim.equalsIgnoreCase("exit")
          || line.trim.equalsIgnoreCase("quit")) {
        running = false
      } else if (line.trim.nonEmpty) {
        try println(eval(spark, line, baseDir))
        catch { case e: Exception =>
          println(Option(e.getMessage).getOrElse(e.toString).linesIterator
            .take(3).mkString("\n"))
        }
      }
    }
    spark.stop()
  }
}
