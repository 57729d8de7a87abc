package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface (SURVEY §2.10).
  *
  * The reference's only streaming-shaped construct is chunked generator
  * iteration (read_sam(chunks=…) etc.) — its analog here is a file-source
  * stream whose micro-batch is the "chunk". Beyond parity, the engine keeps
  * the standard Spark streaming operators available for the events table:
  * watermarked windowed aggregation and stateful sessionization.
  *
  * Every transform is expressed on a plain DataFrame so the SAME code path
  * serves batch and streaming (run it on `spark.read` output and it is the
  * batch twin used by the oracle-checked queries).
  */
object EventStream {

  /** Hourly per-type counts/sums with a watermark for late data.
    * In batch mode this is exactly `Relational.q_events_hourly` with
    * window() instead of date_trunc.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Chunked-iteration parity: stream a text/FASTQ-shaped directory as
    * micro-batches of at most `maxFilesPerTrigger` files — the reference's
    * `chunks=` contract where one chunk = one micro-batch.
    */
  def chunkedText(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)

  /** The reference's `from_sam(chunks=…)` / `read_fastq(chunk_size=…)`
    * pattern (SURVEY §2.10): iterate SeqTables chunk by chunk, where a
    * chunk is one FASTQ file and arrivals drive the iteration. Each
    * micro-batch's files are re-read with the record-boundary batch reader
    * (which owns the '@'-quality resync logic a raw line stream lacks)
    * and handed to `onChunk` as a SeqTable.
    * Returns the started query; stop it (or await) from the caller.
    */
  def fastqChunks(
      spark: SparkSession,
      dir: String,
      checkpoint: String)(
      onChunk: graft.core.SeqTable => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.input_file_name
    chunkedText(spark, dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val files = batch.select(input_file_name().as("f"))
          .distinct().collect().map(_.getString(0)).sorted
        files.foreach { f =>
          val reads = graft.io.Fastq.read(spark, f)
          if (!reads.isEmpty) {
            onChunk(graft.core.SeqTable.fromReadsDf(reads))
          }
        }
      }
      .start()
  }

  /** WARC twin of [[fastqChunks]] (round 8): iterate a crawl drop
    * directory chunk by chunk, one `.warc` file per micro-batch, each
    * re-read with [[graft.io.Warc]]'s record-boundary batch reader (the
    * raw line stream can't walk Content-Length payloads) and handed to
    * `onChunk` as the records DataFrame — the arrival-driven front of a
    * CommonCrawl-shaped ingest.
    */
  def warcChunks(
      spark: SparkSession,
      dir: String,
      checkpoint: String)(
      onChunk: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.input_file_name
    chunkedText(spark, dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val files = batch.select(input_file_name().as("f"))
          .distinct().collect().map(_.getString(0)).sorted
        files.foreach { f =>
          val recs = graft.io.Warc.read(spark, f)
          if (!recs.isEmpty) onChunk(recs)
        }
      }
      .start()
  }

  // ---- streaming crawl ingest (the §2.12 capstone, arrival-driven) -----

  /** The per-record crawl transform, shared verbatim by the streaming
    * ingest and its batch twin: WARC `response` payload BYTES → HTTP
    * split + charset decode ([[graft.io.Http]]) → full-entity HTML
    * main-content extraction ([[graft.ops.HtmlExtract.extractFull]]) →
    * canonical URL ([[graft.ops.UrlOps.normalize]]). Pages whose
    * extracted content is empty (pure chrome) are dropped. Map-only —
    * safe on a streaming frame.
    */
  def crawlExtract(records: DataFrame): DataFrame =
    records
      .withColumn("r", graft.io.Http.split(col("payload")))
      .withColumn("decoded", graft.io.Http.decodeBodyWire(col("r.body"),
        col("r.headers")))
      .withColumn("extracted", graft.ops.HtmlExtract.extractFull(col("decoded")))
      .withColumn("url_norm", graft.ops.UrlOps.normalize(col("target_uri")))
      .filter(length(col("extracted")) > 0)
      .select(col("record_id"), col("url_norm"), col("extracted"))

  /** WAT metadata rows for a crawl batch — the sidecar leg of the
    * capstone, shared verbatim with the batch q_wat_pipeline
    * discipline: HTTP split + charset decode, outlink/anchor pairs,
    * and the pinned-layout JSON envelope ([[graft.io.Wat.payload]]).
    * Map-only, so safe per micro-batch; write the result through
    * [[graft.io.Warc.write]] (warcType = "metadata") for a real
    * per-batch WAT archive.
    */
  def crawlWat(records: DataFrame): DataFrame =
    records
      .withColumn("r", graft.io.Http.split(col("payload")))
      .withColumn("html", graft.io.Http.decodeBody(
        col("r.body"), col("r.headers")("content-type")))
      .select(col("record_id"), col("target_uri").as("uri"),
        graft.io.Wat.payload(col("r.status"),
          col("r.headers")("content-type"), octet_length(col("r.body")),
          graft.ops.LinkGraph.pairHrefs(col("html")),
          graft.ops.LinkGraph.pairTexts(col("html"))).as("wat_json"))

  /** foreachBatch sink into a committed clustered table
    * ([[graft.ops.Layout]] manifest log): the first non-empty batch
    * creates the table, every later one appends through
    * [[graft.ops.Layout.appendClustered]] — so concurrent readers plan
    * a consistent snapshot while the stream ingests, each batch costs
    * only its own write, and [[graft.ops.Layout.compactFiles]] +
    * [[graft.ops.Layout.vacuum]] run as ordinary maintenance against
    * the same log. Empty batches commit nothing (no version churn).
    *
    * EXACTLY-ONCE: pass `txn = Some(writerId -> batchId)` and a
    * replayed foreachBatch invocation is a provable no-op — the
    * (writer, batch) high-water mark rides IN the snapshot header
    * (`Layout.TableSnapshot.txns`), so the guard survives process
    * restarts, unlike a session-var batchId check. The create path
    * records the txn too, so even batch 0's replay is covered (the
    * table exists by then, and the append guard sees its id).
    */
  def sinkToCommittedTable(batchDf: DataFrame, path: String,
      key: org.apache.spark.sql.Column, nFiles: Int,
      txn: Option[(String, Long)] = None): Unit = {
    if (batchDf.isEmpty) return
    if (graft.ops.Layout.latestSnapshot(batchDf.sparkSession, path).isEmpty)
      graft.ops.Layout.writeClustered(batchDf, path, key, nFiles, txn = txn): Unit
    else
      graft.ops.Layout.appendClustered(batchDf, path, key, nFiles, txn = txn): Unit
  }

  /** Batch twin of one ingest round: extract, keep the FIRST record per
    * canonical URL (min record_id — crawl ids are monotone with crawl
    * order, the same nondecreasing-arrival contract the temporal twins
    * state), and drop URLs already in `urlIndex` (one `url_norm`
    * column). One hash aggregate on url_norm + one left_anti join on
    * the (small, broadcastable) index — the exact-identity
    * specialization of the [[graft.ops.Dedup.minhashBuildIndex]] /
    * probe discipline.
    */
  def crawlSurvivorsBatch(records: DataFrame, urlIndex: DataFrame): DataFrame = {
    // extraction feeds both the election aggregate and the semi-join
    // side — materialize once (DAG branches share no map-only subtree)
    val ex = crawlExtract(records).localCheckpoint()
    val first = ex.groupBy(col("url_norm"))
      .agg(min(col("record_id")).as("record_id"))
    ex.join(first, Seq("url_norm", "record_id"), "left_semi")
      .join(urlIndex.select(col(urlIndex.columns(0)).as("url_norm")),
        Seq("url_norm"), "left_anti")
      .select(col("record_id"), col("url_norm"), col("extracted"))
  }

  /** Streaming crawl-ingest capstone: a WARC drop directory streamed
    * one file per micro-batch ([[warcChunks]] front), each batch run
    * through [[crawlSurvivorsBatch]] against the ACCUMULATED index —
    * the pre-built corpus index plus every URL already emitted by an
    * earlier micro-batch — so a re-crawled (duplicate-URL) record is
    * dropped incrementally, never re-extracted downstream. Survivors
    * go to `onBatch`; their URLs append to the index.
    *
    * State = the distinct canonical URLs seen (what any crawl frontier
    * stores anyway), carried as a localCheckpointed frame per batch
    * here; at fleet scale the same loop writes the index to a keyed
    * table (Delta/parquet bucketed on url_norm) and the probe becomes
    * a broadcast or bucket join — the operator shape is identical.
    * Exactly-once caveat, stated: the index update and `onBatch` are
    * not atomic across driver failure; production runs make `onBatch`
    * idempotent (keyed overwrite) exactly as with any foreachBatch
    * sink. Restart caveat, stated: the accumulated index lives in the
    * session, not the checkpoint — on restart, rebuild it by passing
    * the sink's URL set (or the keyed index table) as
    * `corpusUrlIndex`, which is also what the fleet-scale shape does
    * anyway.
    *
    * `onWat` (optional) receives the batch's WAT metadata rows
    * ([[crawlWat]]) for the SURVIVING records only — the sidecar
    * mirrors the deduped corpus, so a re-crawl's metadata is dropped
    * with its page and the accumulated sidecar equals the batch twin's
    * (PipelineStreamingSpec pins stream == batch over ≥3 micro-batches
    * including a re-crawl drop).
    *
    * `committedSink` (optional) upgrades the capstone from
    * "idempotence is the caller's job" to COMMITTED, exactly-once
    * ingest: each micro-batch's survivors append to a
    * [[graft.ops.Layout]] committed table with the batchId recorded in
    * the snapshot header ([[sinkToCommittedTable]] txn), so a
    * foreachBatch replay is a provable no-op even across process
    * restarts; and on START, the accumulated URL index is REBUILT from
    * the committed table (corpus index ∪ already-ingested URLs), which
    * removes the restart caveat above — a restarted stream drops a
    * re-crawl of anything any earlier run committed. When
    * `sink.dedupIndexPath` is set, each batch also extends a PERSISTED
    * MinHash index over the survivors' extracted text
    * ([[graft.ops.Dedup.minhashExtendIndexIdempotent]], first batch
    * creates it) under the same (writer, batchId) guard — the
    * train-once near-dup index tracks the corpus without rebuilds.
    */
  final case class CommittedCrawlSink(
      path: String,
      key: org.apache.spark.sql.Column,
      nFiles: Int,
      writerId: String = "crawl_ingest",
      dedupIndexPath: Option[String] = None)

  def crawlIngest(
      spark: SparkSession,
      dir: String,
      checkpoint: String,
      corpusUrlIndex: DataFrame,
      onWat: DataFrame => Unit = _ => (),
      committedSink: Option[CommittedCrawlSink] = None)(
      onBatch: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.input_file_name
    val recovered = committedSink
      .filter(s => graft.ops.Layout.latestSnapshot(spark, s.path).isDefined)
      .map(s => graft.ops.Layout.readCommitted(spark, s.path).select(col("url_norm")))
    var index = recovered.foldLeft(
      corpusUrlIndex.select(col(corpusUrlIndex.columns(0)).as("url_norm")))(
      _ unionByName _).distinct().localCheckpoint()
    chunkedText(spark, dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val files = batch.select(input_file_name().as("f"))
          .distinct().collect().map(_.getString(0)).sorted
        var batchSurvivors: Option[DataFrame] = None
        files.foreach { f =>
          val recs = graft.io.Warc.read(spark, f)
          if (!recs.isEmpty) {
            val survivors = crawlSurvivorsBatch(recs, index).localCheckpoint()
            onBatch(survivors)
            onWat(crawlWat(recs)
              .join(survivors.select(col("record_id")), Seq("record_id"), "left_semi"))
            index = index
              .unionByName(survivors.select(col("url_norm")))
              .distinct().localCheckpoint()
            batchSurvivors = Some(batchSurvivors
              .map(_.unionByName(survivors)).getOrElse(survivors))
          }
        }
        committedSink.foreach { sink =>
          batchSurvivors.filter(s => !s.isEmpty).foreach { all =>
            // ONE commit per micro-batch (not per file): the txn guard is
            // per batchId, and per-file dedup above already serialized the
            // intra-batch order
            sinkToCommittedTable(all, sink.path, sink.key, sink.nFiles,
              txn = Some(sink.writerId -> batchId))
            sink.dedupIndexPath.foreach { ip =>
              val fs = new org.apache.hadoop.fs.Path(ip)
                .getFileSystem(spark.sessionState.newHadoopConf())
              if (!fs.exists(new org.apache.hadoop.fs.Path(ip))) {
                graft.ops.Dedup.minhashWriteIndex(
                  graft.ops.Dedup.minhashBuildIndex(all, "record_id", "extracted"),
                  ip): Unit
                // record the creating batch's id so its replay no-ops
                graft.ops.Dedup.minhashExtendIndexIdempotent(
                  all.limit(0), "record_id", "extracted",
                  graft.ops.Dedup.minhashOpenIndex(spark, ip),
                  sink.writerId, batchId): Unit
              } else {
                graft.ops.Dedup.minhashExtendIndexIdempotent(
                  all, "record_id", "extracted",
                  graft.ops.Dedup.minhashOpenIndex(spark, ip),
                  sink.writerId, batchId): Unit
              }
            }
          }
        }
      }
      .start()
  }

  /** Streaming twin of the inverted-index delta merge
    * ([[graft.ops.Search.mergePostings]]): a foreachBatch loop maintains
    * the postings index incrementally across micro-batches — the first
    * batch builds the index, every later batch tokenizes ONLY its delta
    * and merges (posting rows union untouched, df re-derived by one
    * token-keyed aggregate). The nightly-crawl contract carries over:
    * batch doc ids are append-only (re-crawls go through dedup first).
    * `onBatch` observes the maintained index after each merge;
    * PipelineStreamingSpec pins stream == full rebuild row-for-row over
    * ≥3 micro-batches. State between batches is the materialized
    * posting frame itself (localCheckpoint truncates lineage per batch
    * — the documented DISK_ONLY/real-checkpoint swap applies on a
    * cluster), never a driver-side collection: at 100 TB the index
    * stays distributed and each batch costs one delta tokenize + one
    * union + one keyed aggregate.
    *
    * Replay/restart discipline: foreachBatch may re-invoke a batchId
    * after a task retry; merging the same delta twice would inflate
    * tf/df, so the handler tracks the last merged batchId and skips
    * replays. The index itself lives only in this session (not in the
    * checkpoint), so resuming from an EXISTING checkpoint would mark
    * old batches committed while the index restarts empty — a silent
    * partial index. The constructor therefore refuses a checkpoint
    * that already holds commits: start fresh, or rebuild the index in
    * batch ([[graft.ops.Search.invertedIndex]]) and stream only new
    * deltas through a fresh checkpoint.
    */
  def indexMaintenanceStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      checkpoint: String)(
      onBatch: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val commitsDir = new java.io.File(new java.io.File(checkpoint), "commits")
    require(
      !commitsDir.exists() || commitsDir.listFiles().forall(_.getName.startsWith(".")),
      s"indexMaintenanceStream cannot resume from an existing checkpoint ($checkpoint): " +
        "the postings index is session state, not checkpoint state — resuming would " +
        "skip committed batches and yield a partial index. Use a fresh checkpoint.")
    var index: DataFrame = null
    var lastMergedBatchId: Long = -1L
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastMergedBatchId) {
          val delta = batch.localCheckpoint()
          if (!delta.isEmpty) {
            index =
              if (index == null)
                graft.ops.Search.invertedIndex(delta, idCol, textCol).localCheckpoint()
              else
                graft.ops.Search.mergePostings(index, delta, idCol, textCol)
                  .localCheckpoint()
            onBatch(index)
          }
          lastMergedBatchId = batchId
        }
      }
      .start()
  }

  // ---- streaming dedup -------------------------------------------------

  /** Exact streaming dedup on a 64-bit content hash. State is BOUNDED by
    * the watermark (`dropDuplicatesWithinWatermark`): a duplicate arriving
    * within the horizon is dropped, one arriving later is a new document —
    * the standard trade for infinite streams. In batch mode this
    * degenerates to a plain dropDuplicates on the hash (the batch twin of
    * `Dedup.exact`'s key).
    */
  def dedupExactStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame = {
    val hashed = docs.withColumn("content_hash", xxhash64(col(textCol)))
    if (docs.isStreaming)
      hashed.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("content_hash")
    else hashed.dropDuplicates("content_hash")
  }

  case class SimDoc(doc_id: Long, text: String)
  case class NearDupHit(doc_id: Long, matches_doc_id: Long, hamming_bits: Int)

  /** Streaming SimHash near-dup detection: every doc keys into its 4
    * 16-bit signature chunks (guaranteed recall at hamming ≤ 3, same
    * blocking as the batch `Dedup.simhashNearDuplicates`); per chunk-key
    * state holds the last `maxStatePerBucket` (signature, id) pairs, so
    * state is bounded per bucket no matter the stream length. Emits one
    * hit per (new doc, prior doc) pair found in any shared bucket — dedup
    * downstream if a pair can share several chunks.
    */
  def simhashNearDupStream(
      docs: org.apache.spark.sql.Dataset[SimDoc],
      maxHamming: Int = 3,
      maxStatePerBucket: Int = 1000): org.apache.spark.sql.Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    docs
      .map { d =>
        val sig = graft.ops.HashKernels.simhash64(d.text)
        (d.doc_id, sig)
      }
      .flatMap { case (id, sig) =>
        (0 until 4).map(c => (c.toLong << 32 | ((sig >>> (c * 16)) & 0xffffL), id, sig))
      }
      .toDF("bucket", "doc_id", "sig")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long)], NearDupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[List[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val hits = Iterator.newBuilder[NearDupHit]
          // deterministic order within the batch
          it.toSeq.sortBy(_._2).foreach { case (_, id, sig) =>
            seen.foreach { case (pid, psig) =>
              val hd = java.lang.Long.bitCount(sig ^ psig)
              if (hd <= maxHamming && pid != id) hits += NearDupHit(id, pid, hd)
            }
            seen = ((id, sig) :: seen).take(maxStatePerBucket)
          }
          state.update(seen)
          hits.result()
      }
  }

  // ---- cross-batch arrival-contract check ------------------------------

  /** Shared by the hand-built temporal twins: across micro-batches each
    * key's events must arrive in nondecreasing event time (in-batch
    * disorder is sorted away). `prevMaxUs` is the newest event time the
    * key's state has recorded; an incoming batch whose OLDEST event
    * predates it would need already-evicted state, so the twin fails
    * loudly here instead of silently emitting wrong windows / matches /
    * stages. Callers pass `Long.MinValue` when no state exists yet.
    */
  private def requireNoLateEvents(
      op: String, key: Long, batchMinUs: Long, prevMaxUs: Long): Unit =
    if (batchMinUs < prevMaxUs)
      throw new IllegalStateException(
        s"$op: late event for key=$key — batch min event time $batchMinUs predates the " +
          s"newest state time $prevMaxUs; the cross-batch nondecreasing-event-time " +
          "contract is violated. Feed each key's events in nondecreasing event time " +
          "(e.g. via an upstream watermarked sort) or buffer late data before this twin.")

  // ---- streaming trailing-window features ------------------------------

  case class TrailEvent(event_id: Long, user_id: Long, us: Long, value: Double)
  case class TrailState(win: Seq[(Long, Double)]) // (us, value), ascending us
  case class TrailOut(event_id: Long, user_id: Long, us: Long,
      n_win: Long, sum_win: Double, max_win: Double)

  /** Streaming twin of [[graft.ops.Temporal.trailingWindow]]: per event,
    * count / exact sum / max over the same user's events with timestamp
    * in `[us − windowLenUs, us]`, inclusive both ends — RANGE-frame
    * semantics, so all timestamp TIES are peers of each other (a whole
    * tie group enters the buffer before any of its members emits).
    *
    * State per user is only the events inside the trailing window of the
    * newest timestamp seen — time-bounded, like the batch operator's
    * frame, not event-count-bounded. Events are sorted by (us, event_id)
    * within a micro-batch; ACROSS batches each user's events must arrive
    * in nondecreasing event time (the usual watermarked-source contract —
    * an older event would need already-evicted state).
    *
    * The sum quantizes each value to DECIMAL(18,4) half-up and adds
    * exactly, matching the batch query's `sum(cast(value as
    * decimal(18,4)))` bit-for-bit regardless of arrival order
    * (PipelineStreamingSpec pins stream == batch).
    */
  def trailingFeatures(
      events: org.apache.spark.sql.Dataset[TrailEvent],
      windowLenUs: Long): org.apache.spark.sql.Dataset[TrailOut] = {
    import events.sparkSession.implicits._
    require(windowLenUs >= 0, s"windowLenUs must be >= 0, got $windowLenUs")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TrailState, TrailOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[TrailState]) =>
          var buf = state.getOption.map(_.win.toList).getOrElse(Nil)
          val out = List.newBuilder[TrailOut]
          val sorted = it.toSeq.sortBy(e => (e.us, e.event_id))
          // the buffer is appended in ascending us, so its last entry is
          // the newest event time this key has processed
          sorted.headOption.foreach(e => requireNoLateEvents(
            "trailingFeatures", user, e.us,
            buf.lastOption.map(_._1).getOrElse(Long.MinValue)))
          sorted
            .groupBy(_.us).toSeq.sortBy(_._1)
            .foreach { case (us, group) =>
              buf = (buf ++ group.map(e => (e.us, e.value)))
                .dropWhile(_._1 < us - windowLenUs)
              val n = buf.size.toLong
              val sum = buf.iterator
                .map(p => BigDecimal(p._2).setScale(4, BigDecimal.RoundingMode.HALF_UP))
                .sum.toDouble
              val mx = buf.iterator.map(_._2).max
              group.foreach(e => out += TrailOut(e.event_id, user, us, n, sum, mx))
            }
          state.update(TrailState(buf))
          out.result().iterator
      }
  }

  // ---- streaming as-of join -------------------------------------------

  /** One element of the unioned as-of stream: `side` 0 = right (the
    * lookup table's change feed), 1 = left (the probe); `tie` breaks
    * right-side timestamp ties (largest wins), ignored on the left.
    */
  case class AsOfEvent(key: Long, us: Long, side: Int, id: Long, tie: Long)
  /** `rightUs == Long.MinValue` is the "no right row seen yet" sentinel;
    * `maxUs` tracks the newest event time (either side) so a late batch
    * fails loudly instead of matching against too-new state.
    */
  case class AsOfState(rightUs: Long, rightTie: Long, maxUs: Long)
  case class AsOfMatch(id: Long, key: Long, us: Long,
      right_us: Option[Long], right_tie: Option[Long])

  /** Streaming twin of [[graft.ops.Temporal.asOfJoin]]: each left event
    * is matched to the most recent right event of the same key with
    * `right.us <= left.us` (ties on the timestamp resolve to the largest
    * `tie`, exactly like the batch union-merge's sort order — a right
    * event at the SAME microsecond as a left probe does match it).
    *
    * State per key is one row — the best (us, tie) right event seen —
    * which is the as-of invariant that makes the operator streamable at
    * all: the batch version's running `last(ignoreNulls)` carries
    * exactly this much information forward. Within a micro-batch events
    * are sorted by (us, side, tie); across batches each key's events
    * must arrive in nondecreasing event time (watermarked-source
    * contract), or a late left probe would see a too-new right row.
    */
  def asOfStream(
      events: org.apache.spark.sql.Dataset[AsOfEvent])
      : org.apache.spark.sql.Dataset[AsOfMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[AsOfState]) =>
          var st = state.getOption
            .getOrElse(AsOfState(Long.MinValue, Long.MinValue, Long.MinValue))
          val out = List.newBuilder[AsOfMatch]
          val sorted = it.toSeq.sortBy(e => (e.us, e.side, e.tie))
          sorted.headOption.foreach(e =>
            requireNoLateEvents("asOfStream", key, e.us, st.maxUs))
          sorted.foreach { e =>
            if (e.side == 0) {
              if (e.us > st.rightUs ||
                (e.us == st.rightUs && e.tie > st.rightTie))
                st = st.copy(rightUs = e.us, rightTie = e.tie)
            } else {
              val has = st.rightUs != Long.MinValue
              out += AsOfMatch(e.id, key, e.us,
                if (has) Some(st.rightUs) else None,
                if (has) Some(st.rightTie) else None)
            }
            if (e.us > st.maxUs) st = st.copy(maxUs = e.us)
          }
          state.update(st)
          out.result().iterator
      }
  }

  // ---- streaming funnel ------------------------------------------------

  /** Pre-classified funnel event: `step` is the 0-based stage index the
    * event would satisfy (classify with the same predicates the batch
    * operator takes).
    */
  case class FunnelEvent(user_id: Long, us: Long, step: Int)
  /** `next` = the stage the user needs next; `lastUs` = time of the last
    * advance (strict-after comparisons run against it); `maxUs` = newest
    * event time seen (any step), for the late-arrival contract check.
    */
  case class FunnelState(next: Int, lastUs: Long, maxUs: Long)
  /** One row per stage ADVANCE: user reached `step` (0-based) at `us`.
    * `count(*) group by step` over all deltas equals the batch funnel's
    * n_users per stage.
    */
  case class FunnelDelta(user_id: Long, step: Int, us: Long)

  /** Streaming twin of [[graft.ops.Temporal.funnel]]: processed in event
    * order, the FIRST stage-k event strictly after the user's stage-(k−1)
    * time IS the `min(ts)` the batch chain of aggregates selects, so a
    * greedy one-pass advance emits exactly the batch stages. State per
    * user is two numbers. Same arrival contract as the other twins:
    * in-batch disorder is sorted away, across batches each user's events
    * must arrive in nondecreasing event time.
    */
  def funnelStream(
      events: org.apache.spark.sql.Dataset[FunnelEvent],
      nSteps: Int): org.apache.spark.sql.Dataset[FunnelDelta] = {
    import events.sparkSession.implicits._
    require(nSteps >= 1, s"nSteps must be >= 1, got $nSteps")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[FunnelState]) =>
          var st = state.getOption
            .getOrElse(FunnelState(0, Long.MinValue, Long.MinValue))
          val out = List.newBuilder[FunnelDelta]
          val sorted = it.toSeq.sortBy(e => (e.us, e.step))
          sorted.headOption.foreach(e =>
            requireNoLateEvents("funnelStream", user, e.us, st.maxUs))
          sorted.foreach { e =>
            if (st.next < nSteps && e.step == st.next &&
              (st.next == 0 || e.us > st.lastUs)) {
              out += FunnelDelta(user, st.next, e.us)
              st = FunnelState(st.next + 1, e.us, st.maxUs)
            }
            if (e.us > st.maxUs) st = st.copy(maxUs = e.us)
          }
          state.update(st)
          out.result().iterator
      }
  }

  // ---- streaming interval join -----------------------------------------

  case class IntervalSide(key: Long, iid: Long, start_us: Long, end_us: Long)
  case class PointSide(key: Long, event_id: Long, us: Long)

  /** Streaming twin of [[graft.ops.Temporal.intervalJoin]] — and the one
    * temporal twin that is NOT hand-built state: Structured Streaming
    * already ships a stream-stream inner join with event-time range
    * conditions, which is exactly the interval-join shape. The batch
    * operator avoids the inequality join because in batch Spark it plans
    * as a cartesian; in streaming, the range condition on two WATERMARKED
    * event-time columns is instead what lets the engine BOUND the join
    * state (each side's buffer evicts once the other side's watermark
    * passes `maxIntervalUs + delay`). Both formulations emit each
    * qualifying (interval, event) pair exactly once.
    *
    * `maxIntervalUs` must bound `end_us − start_us`; `delayThreshold`
    * is the usual late-data allowance on both inputs. The bound is what
    * lets the engine evict join state, so it is ENFORCED, not advisory:
    * an interval wider than `maxIntervalUs` would silently lose its tail
    * points to the state-eviction condition — instead the row fails the
    * query loudly (per-row `assert_true`; pre-split long intervals
    * upstream or raise the bound).
    */
  def intervalStream(
      intervals: org.apache.spark.sql.Dataset[IntervalSide],
      points: org.apache.spark.sql.Dataset[PointSide],
      maxIntervalUs: Long,
      delayThreshold: String = "1 minute"): DataFrame = {
    require(maxIntervalUs > 0, s"maxIntervalUs must be > 0, got $maxIntervalUs")
    val i = intervals.toDF()
      .filter(assert_true(
        col("end_us") - col("start_us") <= lit(maxIntervalUs),
        format_string(
          "intervalStream: interval iid=%s spans %s us > maxIntervalUs=%s — " +
            "pre-split long intervals or raise the bound",
          col("iid"), col("end_us") - col("start_us"), lit(maxIntervalUs))).isNull)
      .withColumn("__its", timestamp_micros(col("start_us")))
      .withWatermark("__its", delayThreshold)
      .alias("i")
    val p = points.toDF()
      .withColumn("__pts", timestamp_micros(col("us")))
      .withWatermark("__pts", delayThreshold)
      .alias("p")
    i.join(p,
      col("i.key") === col("p.key") &&
        col("p.us") >= col("i.start_us") && col("p.us") < col("i.end_us") &&
        col("p.__pts") >= col("i.__its") &&
        col("p.__pts") <= col("i.__its") + expr(s"INTERVAL ${maxIntervalUs} MICROSECOND"))
      .select(col("i.iid"), col("i.key").as("key"), col("p.event_id"), col("p.us"))
  }

  // ---- streaming cohort retention --------------------------------------

  /** Pre-binned retention event: `bin` = event time div the cohort bin
    * length (week, day, …), computed upstream exactly like the batch
    * operator's `ts div binLen`.
    */
  case class RetentionEvent(user_id: Long, bin: Long)
  case class RetentionState(cohort: Long, seen: Seq[Long])
  /** One row per (user, first-time-seen bin): the user's cohort and the
    * period offset. `count(*) GROUP BY cohort_bin, period` over all
    * deltas equals the batch retention matrix's n_users.
    */
  case class RetentionDelta(user_id: Long, cohort_bin: Long, period: Long)

  /** Streaming twin of [[graft.ops.Temporal.cohortRetention]]: the first
    * event's bin IS the user's cohort under the nondecreasing-event-time
    * arrival contract (it is the min), and each bin seen for the first
    * time emits one (cohort, period) delta — exactly the rows the batch
    * operator's collect_set explode produces, so the aggregated counts
    * match. State per user is the cohort plus the distinct bins seen:
    * bounded by the calendar span like the batch aggregate's buffer,
    * not by event count.
    */
  def retentionStream(
      events: org.apache.spark.sql.Dataset[RetentionEvent])
      : org.apache.spark.sql.Dataset[RetentionDelta] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[RetentionState]) =>
          val out = List.newBuilder[RetentionDelta]
          var st = state.getOption
          it.toSeq.sortBy(_.bin).foreach { e =>
            // Retention deltas are order-insensitive for any bin ≥ the
            // cohort (a "late" new bin still yields the correct period),
            // so the only arrival-contract violation that corrupts output
            // is an event BEFORE the recorded cohort — the cohort itself
            // would be wrong. Fail loudly on exactly that case.
            st.foreach { s =>
              if (e.bin < s.cohort) throw new IllegalStateException(
                s"retentionStream: late event for user=$user — bin ${e.bin} predates the " +
                  s"recorded cohort bin ${s.cohort}, so the cohort assignment is wrong. " +
                  "Feed each user's events in nondecreasing event time.")
            }
            st match {
              case None =>
                st = Some(RetentionState(e.bin, Seq(e.bin)))
                out += RetentionDelta(user, e.bin, 0L)
              case Some(s) if !s.seen.contains(e.bin) =>
                st = Some(s.copy(seen = s.seen :+ e.bin))
                out += RetentionDelta(user, s.cohort, e.bin - s.cohort)
              case _ => ()
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  // ---- stateful sessionization ----------------------------------------

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  /** Gap-based sessionization with explicit state — the streaming twin of
    * the lag+cumsum batch query (Pipeline.q_sessionize). A session closes
    * when a later event for the same user arrives past the gap. With
    * `timeoutClose = true` a processing-time timer also flushes idle
    * sessions — note that timer registration keeps the micro-batch engine
    * scheduling batches, so bounded runs (Trigger.AvailableNow) should
    * leave it off.
    */
  def sessionize(
      events: org.apache.spark.sql.Dataset[Event],
      gapMinutes: Int = 30,
      timeoutClose: Boolean = false): org.apache.spark.sql.Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val timeoutMode =
      if (timeoutClose) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeoutMode) {
        case (user, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.last, s.n, s.sum))
          } else {
            var cur = state.getOption
            val closed = Iterator.newBuilder[SessionOut]
            it.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
              val us = e.ts.getTime * 1000L
              cur match {
                case Some(s) if us - s.last <= gapUs =>
                  cur = Some(s.copy(last = us, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(user, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(us, us, 1, e.value))
                case None =>
                  cur = Some(SessionState(us, us, 1, e.value))
              }
            }
            cur.foreach(state.update)
            if (timeoutClose) state.setTimeoutDuration(s"$gapMinutes minutes")
            closed.result()
          }
      }
  }
}
