package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming forms of the event analytics (SURVEY.md §2.C).
  * Same logical plans as the batch forms in graft.operators.Events, run
  * under `readStream` — watermarks bound state so a 100 TB/day stream
  * holds only the open windows/sessions in the state store.
  */
/** flatMapGroupsWithState state + output rows for runningSpend. */
case class SpendState(n: Long, total: Double)
case class SpendUpdate(user_id: Long, n_purchases: Long, total_spend: Double,
                       large: Boolean)

/** sourceBudget state + output: tokens admitted so far per source. */
case class BudgetState(admitted: Long)
case class Admitted(doc_id: Long, source: String, n_tokens: Long,
                    cum_tokens: Long)

object EventStreams {

  /** Streaming source over the events parquet directory (schema must be
    * supplied for readStream). The driver's `ts` physical type has
    * shifted across data vintages — TIMESTAMP(NANOS) read as long under
    * the legacy flag, then plain timestamp[us] with no UTC flag (Spark
    * infers TIMESTAMP_NTZ). Probe the file's actual type with a one-off
    * batch footer read and convert per vintage, so every downstream
    * watermark/window sees session-zone TimestampType — the same
    * contract graft.Tables.events normalizes the batch twin to. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("ts", tsType),
      StructField("value", DoubleType)))
    // glob-filter to the events file specifically: a bare directory
    // stream would sweep in sibling tables as all-null rows (event-time
    // filters hide them in windowed aggs, but a dedup keeps one
    // null-key row)
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    tsType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark:
    * late events beyond the watermark drop, closed windows evict from
    * the state store (bounded state at any input rate). */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_v"))

  /** Streaming exact dedup on event_id: state holds only ids younger
    * than the watermark, so an at-least-once upstream (Kafka replays,
    * task retries) dedupes with bounded memory at any input rate. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom arbitrary-state operator: per-user running spend with a
    * large-purchase alert stream, via flatMapGroupsWithState — the
    * escape hatch when no built-in stateful operator fits. State is one
    * (count, total) pair per user in the state store; timeouts would
    * evict idle users in production. */
  def runningSpend(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val enc = Encoders.product[SpendUpdate]
    val stateEnc = Encoders.product[SpendState]
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(events.schema)
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    events
      .filter(col("event_type") === "purchase")
      .groupByKey((r: Row) => r.getAs[Long]("user_id"))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[Row], state: GroupState[SpendState]) => {
          var st = state.getOption.getOrElse(SpendState(0L, 0.0))
          val out = rows.map { r =>
            val v = r.getAs[Double]("value")
            st = SpendState(st.n + 1, st.total + v)
            SpendUpdate(user, st.n, st.total, v > 100.0)
          }.toVector
          state.update(st)
          out.iterator
        })(stateEnc, enc)
      .toDF()
  }

  /** Stateful ingest budget control: each SOURCE gets a token quota and
    * the stream admits its docs greedily in arrival order until the
    * quota is exhausted — the streaming counterpart of the batch
    * mixture sampler for the live-crawl case, where per-source totals
    * aren't known up front and over-represented sources must be cut off
    * mid-flight. State per source is ONE long (tokens admitted); a doc
    * is admitted iff it still fits. flatMapGroupsWithState because no
    * built-in stateful operator expresses admit-while-under-quota.
    *
    * `tokens` mirrors the batch packing family's knob: "" counts
    * whitespace words; `bpe:<modelDir>` counts tokenizer-TRUE tokens
    * through the native [[graft.functions.BpeTokenCount]] kernel (the
    * fitted merge table rides a broadcast codec — plan size O(1), the
    * count projection is map-only so the stream stays stateless before
    * the keyed gate). Same wrong-by-construction argument as batch: a
    * live-crawl cutoff counted in whitespace words admits ~N× too much
    * of any non-space-delimited source before the quota trips. */
  def sourceBudget(docs: DataFrame, quota: Long,
                   textCol: String = "text",
                   tokens: String = ""): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val tokCol = tokens match {
      case "" =>
        graft.functions.TextStats.textStats(col(textCol))
          .getField("n_words").cast("long")
      case t if t.startsWith("bpe:") =>
        val spark = docs.sparkSession
        val bc = spark.sparkContext.broadcast(new graft.functions.BpeCodec(
          graft.operators.Pretrain.loadBpeMerges(spark, t.stripPrefix("bpe:"))))
        graft.functions.BpeFunctions.bpeTokenCount(col(textCol), bc)
      case other => throw new IllegalArgumentException(
        s"unknown tokens mode '$other' — expected bpe:<modelDir>")
    }
    val withTok = docs.withColumn("_tok", tokCol)
    val enc = Encoders.product[Admitted]
    val stateEnc = Encoders.product[BudgetState]
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(withTok.schema)
    implicit val strEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    withTok
      .groupByKey((r: Row) => r.getAs[String]("source"))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[Row], state: GroupState[BudgetState]) => {
          var st = state.getOption.getOrElse(BudgetState(0L))
          val out = rows.flatMap { r =>
            val tok = r.getAs[Long]("_tok")
            if (st.admitted + tok <= quota) {
              st = BudgetState(st.admitted + tok)
              Some(Admitted(r.getAs[Long]("doc_id"), source, tok, st.admitted))
            } else None
          }.toVector
          state.update(st)
          out.iterator
        })(stateEnc, enc)
      .toDF()
  }

  /** Streaming near-duplicate dedup: key = ONE MinHash band bucket of
    * the text (8 signature rows via the native kernel), deduped within
    * the watermark. A single band fires with probability J^8 — ~0.66 at
    * Jaccard 0.95, ~1 for boilerplate/near-exact repeats — which is the
    * realistic streaming trade: high-similarity repeats (the dominant
    * stream pathology) collapse with bounded state and zero shuffle
    * amplification, while borderline pairs defer to the batch LSH pass.
    * Multi-band streaming recall would need doc-level vote state across
    * 16 keyed streams (a flatMapGroupsWithState pair) — not worth the
    * state-store size at ingest time. */
  def nearDedupStream(docs: DataFrame, tsCol: String = "ts",
                      textCol: String = "text"): DataFrame =
    docs
      .withColumn("_b0",
        element_at(graft.functions.HashFunctions.minhashBuckets(col(textCol)), 1))
      .withWatermark(tsCol, "2 hours")
      .dropDuplicatesWithinWatermark("_b0")
      .drop("_b0")

  /** Streaming EMBEDDING near-dup admission — the vector twin of
    * [[nearDedupStream]] for multimodal/embedding ingest: key = the
    * sign-bucket code of one fine random-hyperplane table over the
    * embedding (the same hyperplane_codes kernel the batch LSH dedup
    * runs; 20 bits ≈ 1 M buckets), deduped within the watermark.
    * Near-identical vectors agree on every projection sign with
    * probability ~1 − b·θ/π (θ → 0 for true dups), so re-ingested and
    * trivially-perturbed embeddings collapse with ONE long of state
    * per live bucket; unrelated vectors collide at ~2^-20 per pair.
    * Borderline near-dups (θ large) defer to the batch LSH pass, the
    * same trade nearDedupStream makes for text.
    *
    * Dim guard: hyperplane_codes returns an ALL-ZERO code for a
    * dim-mismatched embedding, so without a guard every mismatched
    * vector would land in bucket 0 and all but one per window would
    * silently drop — data loss on a schema drift in an ingest-admission
    * path. Mismatched rows therefore key on (length, content hash)
    * instead: they still pass through (deduping only exact repeats of
    * themselves), and the length column keeps their key space disjoint
    * from the well-formed bucket codes.
    *
    * CHECKPOINT MIGRATION: the guard widened the stateful dedup key
    * from (_b0) to (_sz, _b0) — a state-key SCHEMA change. A query
    * restarted from a checkpoint written by the one-column version
    * fails Spark's state-schema compatibility check; restart from a
    * fresh checkpoint (accepting one watermark window of possible
    * re-admits) rather than deleting state files in place. */
  def embedDedupStream(vecs: DataFrame, tsCol: String = "ts",
                       bits: Int = 20, dim: Int = 64,
                       embCol: String = "embedding"): DataFrame =
    vecs
      .withColumn("_sz", size(col(embCol)))
      .withColumn("_b0", when(col("_sz") === dim, element_at(
          graft.operators.Similarity.buckets(col(embCol), 1, bits, dim), 1))
        .otherwise(xxhash64(col(embCol))))
      .withWatermark(tsCol, "2 hours")
      .dropDuplicatesWithinWatermark("_sz", "_b0")
      .drop("_sz", "_b0")

  /** Streaming IMAGE near-dup admission — the pixel-plane twin of
    * [[nearDedupStream]]/[[embedDedupStream]], reusing the batch
    * dedup_image_phash machinery (rotation-canonical aHash over the
    * decoded pixel grid, 16-bit band buckets): key = the FIRST band of
    * the canonical hash, deduped within the watermark. A re-encoded /
    * rotated / brightness-shifted copy lands on the identical canonical
    * hash (Hamming ≤ a few bits otherwise), so its first band matches
    * and the copy drops with ONE long of state per live bucket;
    * borderline variants defer to the batch banded-Hamming pass — the
    * same single-band trade the text and embedding streams make, for
    * the same state-store reason.
    *
    * Non-image / undecodable blobs hash to null and key on the full
    * blob content instead (deduping only exact byte repeats of
    * themselves); the `_isimg` discriminator keeps the two key spaces
    * disjoint, so a blob hash can never collide an image band out of
    * the stream. The decode rides the native image_ahash64 expression
    * — stateless map-side, no UDF, blobs never shuffle (the state key
    * is 16 bits + the discriminator). */
  def imageDedupStream(blobs: DataFrame, tsCol: String = "ts",
                       blobCol: String = "blob"): DataFrame =
    blobs
      .withColumn("_ph",
        graft.functions.MediaFunctions.imageAHash64(col(blobCol)))
      .withColumn("_isimg", col("_ph").isNotNull)
      .withColumn("_b0", when(col("_isimg"),
          col("_ph").bitwiseAND(lit(0xffffL)))
        .otherwise(xxhash64(col(blobCol))))
      .withWatermark(tsCol, "2 hours")
      .dropDuplicatesWithinWatermark("_isimg", "_b0")
      .drop("_ph", "_isimg", "_b0")

  /** Streaming AUDIO near-dup admission — the waveform-plane twin of
    * [[imageDedupStream]], reusing the batch dedup_audio_fp machinery
    * (volume-rescale-invariant energy-envelope fingerprint over the
    * RIFF data chunk, 16-bit band buckets): key = the first band of
    * the fingerprint, deduped within the watermark. A re-rendered /
    * volume-rescaled copy lands on the identical fingerprint, so its
    * first band matches and the copy drops with ONE long of state per
    * live bucket; borderline variants defer to the batch
    * banded-Hamming pass — the single-band trade all the admission
    * streams make, for the same state-store reason.
    *
    * Non-audio / unsupported-format blobs fingerprint to null and key
    * on the full blob content instead (deduping only exact byte
    * repeats of themselves); the `_isaud` discriminator keeps the two
    * key spaces disjoint. The decode rides the native audio_fp64
    * expression — stateless map-side, no UDF, blobs never shuffle
    * (the state key is 16 bits + the discriminator). */
  def audioDedupStream(blobs: DataFrame, tsCol: String = "ts",
                       blobCol: String = "blob"): DataFrame =
    blobs
      .withColumn("_fp",
        graft.functions.MediaFunctions.audioFp64(col(blobCol)))
      .withColumn("_isaud", col("_fp").isNotNull)
      .withColumn("_b0", when(col("_isaud"),
          col("_fp").bitwiseAND(lit(0xffffL)))
        .otherwise(xxhash64(col(blobCol))))
      .withWatermark(tsCol, "2 hours")
      .dropDuplicatesWithinWatermark("_isaud", "_b0")
      .drop("_fp", "_isaud", "_b0")

  /** Streaming VIDEO near-dup admission — the frame-set-plane twin of
    * [[imageDedupStream]]/[[audioDedupStream]], reusing the batch
    * dedup_frame_containment decomposition (fixed-width frame slices
    * hashed declaratively — substring + xxhash64 in codegen): key =
    * the MINIMUM frame hash, i.e. a one-permutation MinHash of the
    * blob's frame SET. Re-encoded byte-identical copies and
    * frame-REORDERED cuts land on the same min (the set is order-free)
    * and drop with one long of state per live clip family; a trim
    * keeps the min with probability ≈ its containment, so borderline
    * partial overlaps defer to the batch prefix-filtered containment
    * pass — the same single-band trade all the admission streams make.
    *
    * Empty blobs key on the hash of the empty byte string (deduping
    * only their own exact repeats); the `_isvid` discriminator keeps
    * the two key spaces disjoint. All map-side, no UDF; blobs never
    * shuffle (the state key is one long + the discriminator). */
  def videoDedupStream(blobs: DataFrame, tsCol: String = "ts",
                       blobCol: String = "blob",
                       frameBytes: Int = 64): DataFrame =
    blobs
      .withColumn("_isvid", length(col(blobCol)) > 0)
      .withColumn("_mh", when(col("_isvid"), expr(
        s"""aggregate(
           |  transform(
           |    sequence(0,
           |      CAST(ceil(length($blobCol) / ${frameBytes}D) AS INT) - 1),
           |    f -> xxhash64(substring($blobCol,
           |      f * $frameBytes + 1, $frameBytes))),
           |  CAST(9223372036854775807 AS BIGINT),
           |  (acc, x) -> least(acc, x))""".stripMargin))
        .otherwise(xxhash64(col(blobCol))))
      .withWatermark(tsCol, "2 hours")
      .dropDuplicatesWithinWatermark("_isvid", "_mh")
      .drop("_isvid", "_mh")

  /** Streaming ingest admission — the stateless gates a crawl stream
    * passes BEFORE any stateful dedup: Gopher-style quality rules plus
    * a benchmark-contamination check, both pure map-side filters (no
    * state store, no shuffle, no watermark needed).
    *
    * The eval set's distinct 8-gram hashes ship as a
    * `SparkContext.broadcast` sorted-long set probed by the native
    * [[graft.functions.AnyLongInBroadcast]] kernel — the same
    * inverted-index-as-broadcast shape the batch screen
    * (QualityRules.contaminationScreen) uses, kept stateless per
    * batch. The PLAN stays O(1) regardless of eval-suite size (a
    * million-gram suite previously inlined as `lit(array)` made every
    * micro-batch's plan and codegen proportional to it); driver
    * memory is the broadcast build side, exactly like the batch
    * twin's broadcast hash join, and the exact lookup keeps
    * batch/stream parity bit-for-bit. Admitted docs flow on
    * unchanged, ready for nearDedupStream. */
  def ingestGate(docs: DataFrame, evalDocs: DataFrame,
                 textCol: String = "text"): DataFrame = {
    import graft.functions.HashFunctions.{anyLongInBroadcast, ngramHashes}
    val evalGrams = evalDocs
      .select(explode(ngramHashes(col(textCol), 8)).as("ng"))
      .distinct().collect().map(_.getLong(0)).sorted
    val bc = docs.sparkSession.sparkContext.broadcast(evalGrams)
    docs
      .where(graft.operators.QualityRules.gopherKeep(col(textCol)))
      .where(!anyLongInBroadcast(ngramHashes(col(textCol), 8), bc))
  }

  /** Streaming ANN serving — micro-batch probes against the PERSISTED
    * IVF index (graft.operators.AnnIndex): the index is built and
    * appended offline (the lifecycle's write side), query vectors
    * arrive as a stream, and every micro-batch pays only its probed
    * cell directories — the same static partition-filter scan the
    * batch path runs, now per trigger. foreachBatch rather than a
    * stream-static join because per-query top-k needs a rank window
    * over a COMPLETE candidate set, which exists per micro-batch but
    * not on an unbounded stream. Results are exactly-once by
    * idempotence: each batch overwrites its own batchId-keyed
    * directory (see [[foreachBatchSink]]). The spec pins result
    * equality against the batch twin on the same queries. */
  def annProbeStream(queries: DataFrame, indexDir: String, outDir: String,
                     checkpointDir: String, nProbe: Int = 0,
                     topK: Int = 10): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.AnnIndex
            .query(batch.sparkSession, indexDir, batch, nProbe, topK)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .start()

  /** Streaming ingest into the persisted IVF index — the WRITE-side
    * twin of [[annProbeStream]], closing the lifecycle loop: vectors
    * arrive as a stream, each micro-batch assigns against the
    * PERSISTED centroids (AnnIndex.append — map-only, pure function
    * of vector × centroids) and lands in the cell directories, so the
    * index a probe stream is serving grows continuously without a
    * refit; AnnIndex.maintain decides when drift demands one, and
    * AnnIndex.compact folds the per-batch small files. Delivery is
    * at-least-once: a replayed micro-batch re-appends (plain parquet
    * append has no batchId idempotence) — acceptable for ANN serving
    * (a duplicated vector changes no top-k membership beyond itself);
    * an exactly-once deployment stages per-batch directories as in
    * [[foreachBatchSink]] and compacts them in. */
  def annIngestStream(vecs: DataFrame, indexDir: String,
                      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.AnnIndex.append(batch.sparkSession, batch, indexDir)
        ()
      }
      .start()

  /** Streaming stats maintenance — the CATALOG twin of
    * [[annIngestStream]]: each micro-batch's per-key deltas fold into
    * the persisted [[graft.operators.StatsCatalog]] via `append` (the
    * batch is the only input — standing data is never re-read), so
    * online ingest keeps join/layout advice fresh without an ANALYZE
    * pass ever running against the grown corpus. Per-key subtotals
    * SUM, so streaming N micro-batches ≡ appending their union as one
    * batch (StreamingSpec pins the parity); a batch racing a compact
    * WAITS out the writer lock and lands (the StatsCatalogSpec race
    * pin — same lock discipline as every manifest writer). Delivery
    * is at-least-once: a replayed micro-batch re-appends its
    * subtotals and over-counts until the next build or a retract of
    * the replayed drop re-baselines — the staleness drift check
    * prices exactly that. */
  def statsIngestStream(rows: DataFrame, catalogDir: String, rel: String,
                        keyCol: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.StatsCatalog.append(batch.sparkSession,
            catalogDir, batch.toDF(), rel, keyCol)
        ()
      }
      .start()

  /** Streaming ingest into the persisted BM25 posting index — the
    * LEXICAL twin of [[annIngestStream]], closing the last index
    * plane's maintenance loop: documents arrive as a stream (a live
    * crawl), each micro-batch folds into the index via
    * [[graft.operators.Bm25Index.append]] — a map-side posting build
    * into the term buckets plus ONE new stats row — so the index a
    * [[graft.operators.Bm25Index.search]] probe is serving stays
    * fresh without a rebuild and WITHOUT ever re-reading standing
    * postings (each micro-batch's write cost is proportional to the
    * batch, not the corpus). Because a committed batch is a pure
    * union of posting rows and an additive stats row, streaming N
    * micro-batches ≡ appending their union as one batch ≡ building
    * the whole corpus at once (StreamingSpec pins search-result
    * parity against the one-shot build). Delivery is at-least-once:
    * a replayed micro-batch re-appends its postings and stats row
    * (duplicate tf rows + over-counted N) until the next rebuild or
    * compact re-baselines — same trade as [[statsIngestStream]]; an
    * exactly-once deployment stages batchId-keyed directories as in
    * [[foreachBatchSink]]. The caller's dedup plane (e.g.
    * [[textIngestStream]] upstream) guarantees doc novelty, the same
    * contract the batch append carries. */
  def bm25IngestStream(docs: DataFrame, indexDir: String,
                       checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.Bm25Index.append(batch.sparkSession,
            batch.toDF(), indexDir)
        ()
      }
      .start()

  /** Streaming incremental near-dup ingest — the TEXT twin of
    * [[annIngestStream]], riding TextIndex (the persisted MinHash
    * bucket index): each micro-batch of documents screens against the
    * standing corpus' buckets at rest, collapses its own in-batch
    * near-dups, lands its ADMITTED docs in a batchId-keyed directory
    * (idempotent on replay, as [[foreachBatchSink]]), and appends
    * their buckets so the NEXT batch screens against them too. This
    * is the crawl-ingest shape at 100 TB: the corpus text is never
    * re-read — only its ~0.1%-sized bucket index participates, and
    * that through a bloom-reduced semi join. Index appends are
    * at-least-once (replay re-appends buckets — harmless: duplicate
    * bucket rows change no admission decision); the admitted OUTPUT
    * is exactly-once by the batchId overwrite. */
  def textIngestStream(docs: DataFrame, indexDir: String, outDir: String,
                       checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.TextIndex
            .ingest(batch.sparkSession, batch, indexDir)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .start()

  /** Streaming incremental near-dup ingest for the MEDIA planes — the
    * [[textIngestStream]] contract over blob rows (doc_id, blob),
    * riding MediaIndex (the persisted image-aHash / audio-fp /
    * video-min-frame-hash fingerprint index). Replaces the ephemeral
    * single-band admission streams as the durable path: each
    * micro-batch screens against fingerprints AT REST (standing blobs
    * never re-decoded; the index side bloom-reduces before any
    * exchange and candidates Hamming-verify), collapses in-batch
    * near-dups per plane, lands admitted blobs batchId-keyed
    * (exactly-once by overwrite), and appends their fingerprints so
    * the next batch screens against them. Same at-least-once append /
    * exactly-once output split as the text twin. */
  def mediaIngestStream(blobs: DataFrame, indexDir: String, outDir: String,
                        checkpointDir: String, maxHamming: Int = 6)
      : org.apache.spark.sql.streaming.StreamingQuery =
    blobs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.MediaIndex
            .ingest(batch.sparkSession, batch, indexDir, maxHamming)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .start()

  /** Streaming DSIR admission gate — the data-SELECTION twin of
    * [[ingestGate]], riding the persisted DSIR model
    * (graft.operators.Pretrain.fitDsirWeights written to parquet):
    * each micro-batch of documents scores against the ≤B-row weight
    * table (one pass over the batch + a broadcast join) and only docs
    * with log-weight ≥ the threshold land. Fit offline on the curated
    * target, gate the crawl firehose online — weights never refit in
    * the hot path (re-run fit + swap the directory to update, exactly
    * the AnnIndex quantizer discipline). Docs with <2 tokens carry no
    * bigram evidence and are NOT admitted. Output is exactly-once by
    * batchId-keyed overwrite (as [[foreachBatchSink]]). */
  def dsirGateStream(docs: DataFrame, weightsDir: String, outDir: String,
                     checkpointDir: String, minLogweight: Double = 0.0,
                     buckets: Int = 8192): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val w = s.read.parquet(weightsDir)
          val scored = graft.operators.Pretrain.scoreDsir(batch.toDF(), w, buckets)
            .select(col("doc_id"),
              round(col("lw"), 6).cast(DoubleType).as("dsir_logweight"))
            .where(col("dsir_logweight") >= minLogweight)
          batch.join(scored, Seq("doc_id"))
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
        ()
      }
      .start()

  /** Streaming model-based quality gate — the CLASSIFIER twin of
    * [[dsirGateStream]], riding the persisted distilled model
    * ([[graft.operators.QualityModel.saveModel]]): each micro-batch of
    * documents scores declaratively against the ≤dims-row weight table
    * (one hashed-tf pass + a broadcast join + sigmoid) and only docs
    * with q_score ≥ `minScore` land. Fit offline on labeled exemplars,
    * gate the crawl firehose online — the model never refits in the
    * hot path (refit + swap the directory to update). Output is
    * exactly-once by batchId-keyed overwrite. */
  def qualityGateStream(docs: DataFrame, modelDir: String, outDir: String,
                        checkpointDir: String, minScore: Double = 0.5):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val (w, b) = graft.operators.QualityModel.loadModel(s, modelDir)
          val admitted = graft.operators.QualityModel
            .scoreQuality(batch.toDF(), w, b)
            .where(col("q_score") >= minScore)
          batch.join(admitted, Seq("doc_id"))
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
        ()
      }
      .start()

  /** Fit the anomaly BASELINE the streaming gate scores against: one
    * row per event_type with the mean/std of its daily volume —
    * persist with `.write.parquet(dir)`; that parquet IS the model
    * (refit offline on a schedule and swap by directory, the
    * AnnIndex-quantizer / DSIR-weights discipline). */
  def fitAnomalyBaseline(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(avg(col("cnt")).as("mean_cnt"),
        stddev_samp(col("cnt")).as("std_cnt"))

  /** Streaming volume-anomaly gate: score per-(event_type, day)
    * counts against the persisted baseline and emit only the anomalous
    * rows (|z| ≥ `zThreshold`) — the online half of
    * [[graft.operators.Events.eventsAnomaly]]'s trailing-window batch
    * form. The gate is FRONTED by a watermarked daily window
    * aggregation (the stream_window_agg plan), so a calendar day that
    * spans many micro-batches accumulates in the state store and
    * arrives at the scorer as ONE closed row when the watermark passes
    * the day's end — per-batch fragments can never under-count a day
    * and under-alert (StreamingSpec splits one planted burst day
    * across 3 batches and still gets the full-count alert). Days are
    * scored exactly once, when they close; events later than
    * `lateness` past the day boundary are dropped by the watermark.
    * The baseline is a ≤|types|-row broadcast; scoring each batch of
    * closed days is a map-only join. Zero-variance baselines yield
    * null z and never alert (the batch twin's rule). Exactly-once by
    * batchId-keyed overwrite. */
  def anomalyGateStream(events: DataFrame, baselineDir: String,
                        outDir: String, checkpointDir: String,
                        zThreshold: Double = 3.0,
                        lateness: String = "1 hour"): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"), col("w.start").as("day"), col("cnt"))
      .writeStream
      .outputMode("append") // append = only CLOSED daily windows reach the sink
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val base = s.read.parquet(baselineDir)
          scoreDailyCounts(batch.toDF(), base, zThreshold)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
        ()
      }
      .start()

  /** Score already-reduced (event_type, day, cnt) rows against the
    * baseline — the shared tail of the stream gate (which feeds it
    * closed daily windows) and [[scoreAnomaly]] (which feeds it a
    * batch reduction), so StreamingSpec can pin online/offline parity. */
  def scoreDailyCounts(counts: DataFrame, baseline: DataFrame,
                       zThreshold: Double = 3.0): DataFrame =
    counts
      .join(broadcast(baseline), Seq("event_type"))
      .withColumn("z",
        when(col("std_cnt") > 0.0,
          (col("cnt") - col("mean_cnt")) / col("std_cnt")))
      .where(abs(col("z")) >= zThreshold)
      .select(col("event_type"), col("day"), col("cnt"), col("z"))

  /** Batch twin of the stream scoring: reduce to daily counts, then
    * the same scoring tail the stream gate runs on closed windows. */
  def scoreAnomaly(events: DataFrame, baseline: DataFrame,
                   zThreshold: Double = 3.0): DataFrame =
    scoreDailyCounts(
      events
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt")),
      baseline, zThreshold)

  /** foreachBatch sink: the escape hatch for targets without a native
    * streaming sink (JDBC upserts, multi-table fan-out, partitioned
    * lakehouse layouts). Exactly-once comes from idempotence, not the
    * sink: each micro-batch overwrites its own batchId-keyed directory,
    * so a replayed batch after failure rewrites the same files instead
    * of appending duplicates. Returns the started query. */
  def foreachBatchSink(deduped: DataFrame, outDir: String,
                       checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .start()

  /** Stream-stream inner join: clicks attributed to a view by the same
    * user within 30 minutes. Both sides carry watermarks and the join
    * condition bounds event time, so each side's state store holds only
    * rows younger than watermark + the 30-minute band — the bounded-state
    * form of stream-to-stream correlation (attribution, funnels,
    * request/response pairing) at any input rate. */
  def clickAfterView(events: DataFrame): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value"))
      .withWatermark("click_ts", "2 hours")
    views.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("view_ts"), col("click_ts"), col("value"))
  }

  /** Session windows with a 30-minute gap, built on the native
    * session_window operator — state holds only open sessions. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_v"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"), col("sum_v"))
}
