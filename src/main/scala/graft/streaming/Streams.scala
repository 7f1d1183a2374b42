package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.rass.{CorpusStats, DeterministicEmbedder, DocSchema, Embedder}
import graft.rass.ingest.{FhirBundleParser, IndexWriter}

/** Structured Streaming operators.
  *
  * The reference's only data-plane streaming is startup directory
  * auto-ingestion (`app/main.py:1285-1321`; the lifespan call is
  * commented out at `main.py:2977-2981` but README still documents it)
  * — [[AutoIngest]] is its always-on Spark form. The windowed /
  * sessionized event aggregations are the north-star extensions over
  * the `events` table; their batch twins are
  * `relational.StarQueries.q11EventTumbling` / `q13Sessionize`, and the
  * specs pin stream results to the batch results.
  *
  * Scale notes: the windowed count is a streaming hash aggregate whose
  * state is bounded by the watermark horizon; sessionization state is
  * one small struct per active user, dropped on idle timeout —
  * both shapes run unchanged on a 1000-executor cluster with
  * state-store sharding on the grouping key.
  */
object Streams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)

  /** Tumbling 15-minute counts per event type with a 30-minute
    * watermark (late data beyond it is dropped; windows finalize and
    * emit append-mode results).
    */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "15 minutes").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Watermarked stream-stream inner join: each left event matched to
    * same-user right events within the following 30 minutes. Both sides
    * carry watermarks, so the join state (buffered unmatched rows) is
    * evicted once event time passes the window — bounded state at any
    * scale; the shuffle keys on user_id.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val a = left.withWatermark("ts", "30 minutes")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
        col("ts").as("a_ts"), col("event_type").as("a_type"))
    val b = right.withWatermark("ts", "30 minutes")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("ts").as("b_ts"), col("event_type").as("b_type"))
    a.join(b, expr(
      """a_user = b_user AND b_ts > a_ts AND
        |b_ts <= a_ts + interval 30 minutes""".stripMargin))
      .select(col("a_id"), col("b_id"), col("a_user").as("user_id"),
        col("a_type"), col("b_type"))
  }

  /** Stateful sessionization: 30-minute inactivity gap splits sessions.
    * One GroupState per user holding (last event time, counters). With
    * `idleTimeout` set (the production default), a processing-time
    * timeout evicts users idle that long, bounding state by the ACTIVE
    * user population; pass None for deterministic single-batch tests
    * (a pending timeout keeps `processAllAvailable` from ever settling).
    */
  def sessionize(events: Dataset[Event],
      idleTimeout: Option[String] = Some("1 hour")): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val GapMs = 30L * 60 * 1000
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), SessionSummary](
        OutputMode.Update(), timeoutConf) {
        case (uid, it, state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (lastTs, sessions, count) =
              state.getOption.getOrElse((Long.MinValue, 0L, 0L))
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              if (lastTs == Long.MinValue || t - lastTs > GapMs) sessions += 1
              lastTs = t
              count += 1
            }
            state.update((lastTs, sessions, count))
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator(SessionSummary(uid, sessions, count))
          }
      }
  }
}

/** S1 streaming — always-on directory ingest: new *.json bundle files
  * are parsed, embedded, and idempotently merged into the document
  * table inside foreachBatch (exactly-once per batch via the
  * checkpoint; the upsert keyed on doc_id makes replays harmless).
  *
  * Each batch also maintains the materialized BM25 statistics tables
  * ([[graft.rass.CorpusStats]]) next to the document table
  * (`<table>_stats_fields` / `<table>_stats_terms`): the signed merge
  * subtracts the replaced doc versions and adds the new ones, so the
  * stats update cost is proportional to the BATCH, not the corpus —
  * the property that lets a search at 100 TB read its stats row
  * without any corpus scan.
  */
object AutoIngest {

  private type HPath = org.apache.hadoop.fs.Path

  def start(spark: SparkSession, watchDir: String, tablePath: String,
      checkpointDir: String, userId: String = "default",
      embedder: Embedder = new DeterministicEmbedder()): StreamingQuery = {
    import spark.implicits._
    val stream = spark.readStream
      .option("wholetext", "true")
      .text(watchDir + "/*.json")
      .select(input_file_name().as("path"), col("value"))

    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        // crash recovery 1: a kill between the two renames of a swap
        // leaves the previous table at _old — restore before reading
        val tables = Seq(tablePath, statsFieldsPath(tablePath),
          statsTermsPath(tablePath))
        tables.foreach { p =>
          val (target, retired) = (new HPath(p), new HPath(p + "_old"))
          if (!fs.exists(target) && fs.exists(retired))
            fs.rename(retired, target)
        }
        // crash recovery 2: stagings are fully written before the FIRST
        // swap, so a leftover staging whose doc-table staging is already
        // gone means the crash hit after the doc table was promoted —
        // finish promoting it (else the replay's merge, computed against
        // the already-new doc table, would be a no-op over stale stats).
        // Any other leftover staging predates the swaps; discard it and
        // let the replay recompute.
        val docStagingLeft = fs.exists(new HPath(tablePath + "_staging"))
        tables.foreach { p =>
          val staging = new HPath(p + "_staging")
          if (fs.exists(staging)) {
            val complete = fs.exists(new HPath(p + "_staging/_SUCCESS"))
            if (!docStagingLeft && complete) swapIn(fs, p)
            else fs.delete(staging, true)
          }
        }

        val bundles = batch.as[(String, String)]
        val parsed = FhirBundleParser.parseBundles(bundles, userId)
        val docs = IndexWriter.withEmbeddings(parsed, embedder)
        val existing =
          if (fs.exists(new HPath(tablePath)))
            Some(spark.read.parquet(tablePath)) else None
        val merged = IndexWriter.upsert(existing, docs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // stage EVERYTHING first (Spark refuses to overwrite a path it
          // is reading in the same plan, and `existing`'s resolved file
          // list dies the moment the doc table is swapped), THEN swap
          merged.write.mode("overwrite").parquet(tablePath + "_staging")

          val batchIds = parsed.select("doc_id").distinct()
          val (newFields, newTerms) = existing match {
            case Some(e) if tables.tail.forall(p => fs.exists(new HPath(p))) =>
              // upsert winners for batch ids are always the batch rows,
              // so: new corpus = existing − replaced + batch winners
              val replaced = e.join(batchIds, Seq("doc_id"), "left_semi")
              val added = merged.join(batchIds, Seq("doc_id"), "left_semi")
              CorpusStats.merge(
                (spark.read.parquet(statsFieldsPath(tablePath)),
                  spark.read.parquet(statsTermsPath(tablePath))),
                added, replaced, DocSchema.scoredFields)
            case _ => // first batch, or stats not yet materialized
              CorpusStats.build(merged, DocSchema.scoredFields)
          }
          newFields.write.mode("overwrite")
            .parquet(statsFieldsPath(tablePath) + "_staging")
          newTerms.write.mode("overwrite")
            .parquet(statsTermsPath(tablePath) + "_staging")

          tables.foreach { p => swapIn(fs, p) }
        } finally merged.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  def statsFieldsPath(tablePath: String): String = tablePath + "_stats_fields"
  def statsTermsPath(tablePath: String): String = tablePath + "_stats_terms"

  /** Promote `<p>_staging` to `p`, retiring the old table via `_old` so
    * a crash at any point leaves either the old or the new table
    * recoverable (worst case it sits at _old until the next batch).
    */
  private def swapIn(fs: org.apache.hadoop.fs.FileSystem, p: String): Unit = {
    val (staging, target, retired) =
      (new HPath(p + "_staging"), new HPath(p), new HPath(p + "_old"))
    fs.delete(retired, true)
    if (fs.exists(target)) fs.rename(target, retired)
    fs.rename(staging, target)
    fs.delete(retired, true)
  }
}
