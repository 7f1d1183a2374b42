package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe (BASELINE §H): measures the superlinear-risk
  * queries at sf0.1 and at an R-times replica of it, so the 100 TB
  * scaling story is MEASURED, not only design-argued. Not part of the
  * driver bench contract — run by hand:
  *
  *   SPARK_GRAFT_ARTIFACTS=/tmp/graft_scale/artifacts \
  *     sbt "runMain graft.ScaleProbe [reps]"
  *
  * The replica corpus is deterministic and structure-preserving:
  *   - documents: replica k offsets doc_id by k*ceil(maxId+1) and
  *     suffixes every token with "~k" (k>0), so each replica carries
  *     EXACTLY the original's shingle/gram overlap structure (the same
  *     transformation applied to both sides of a near-dup pair
  *     preserves their token overlap) while sharing NO vocabulary with
  *     other replicas — dup volume, vocabulary, and train/test gram
  *     leakage all scale by R with no cross-replica artifacts.
  *     doc_id-derived split buckets stay ~90/5/5 (md5 of new ids is
  *     still uniform).
  *   - embeddings: replica k offsets vec_id and circularly shifts the
  *     vector by k dims — norms, pairwise-distance distribution, and
  *     isotropy are preserved, so IVF cell geometry scales honestly.
  *
  * Expected exponents (the probe's pass criteria, BASELINE §H):
  *   - d02: bounded by cap x df on the sharded shingle index — ~linear
  *   - d04: banded SimHash, pigeonhole buckets — ~linear
  *   - d06: rounds x dup-volume label propagation — ~linear (diameter
  *     unchanged by replication)
  *   - s03: IVF knn-join, k = sqrt(n) cells, candidates (nprobe/k)n^2
  *     — ~n^1.5
  *   - p09/p10: gram-hash join, test-split-bounded — ~linear
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map { a =>
      val n = try a.toInt catch {
        case _: NumberFormatException =>
          sys.error(s"usage: ScaleProbe [reps]; got non-numeric arg '$a'")
      }
      require(n >= 1, s"reps must be >= 1, got $n")
      n
    }.getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"/tmp/graft_scale/x$reps"

    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$out/_built"))) {
      println(s"[probe] building ${reps}x replica of $base at $out")
      val docs = Tables.documents(spark, base)
      val maxDoc = docs.agg(max($"doc_id")).head().getLong(0) + 1
      val ks = spark.range(reps).toDF("k")
      docs.crossJoin(broadcast(ks))
        .select(
          ($"doc_id" + $"k" * maxDoc).as("doc_id"),
          when($"k" === 0, $"text").otherwise(
            array_join(transform(split(trim($"text"), "\\s+"),
              t => concat(t, lit("~"), $"k")), " ")).as("text"),
          $"lang", $"source")
        .withColumn("n_chars", length($"text"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val emb = Tables.embeddings(spark, base)
      val maxVec = emb.agg(max($"vec_id")).head().getLong(0) + 1
      val dim = emb.select(size($"embedding")).head().getInt(0)
      emb.crossJoin(broadcast(ks))
        .select(
          ($"vec_id" + $"k" * maxVec).as("vec_id"),
          concat(
            slice($"embedding", ($"k" % dim) + 1, lit(dim) - ($"k" % dim)),
            slice($"embedding", lit(1), $"k" % dim)).as("embedding"),
          $"label")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      // events: replica k offsets event_id and user_id into disjoint
      // ranges with timestamps untouched — R independent user
      // populations with identical per-user histories, so funnel/
      // session work scales exactly R-fold with no cross-replica
      // interaction
      val ev = Tables.events(spark, base)
      val maxEvent = ev.agg(max($"event_id")).head().getLong(0) + 1
      val maxUser = ev.agg(max($"user_id")).head().getLong(0) + 1
      ev.crossJoin(broadcast(ks))
        .select(($"event_id" + $"k" * maxEvent).as("event_id"), $"ts",
          ($"user_id" + $"k" * maxUser).as("user_id"),
          $"event_type", $"value", $"props")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      fs.create(new org.apache.hadoop.fs.Path(s"$out/_built"), true).close()
    }

    def invalidateAll(): Unit = {
      graft.pipeline.Dedup.invalidateCaches()
      graft.pipeline.Similarity.invalidateCaches()
      graft.pipeline.TextAnalysis.invalidateCaches()
      graft.pipeline.Multimodal.invalidateCaches()
      graft.pipeline.Export.invalidateCaches()
      System.gc()
    }

    // the superlinear-risk set, bench protocol (noop sink, memoized
    // ingest artifacts warm WITHIN a dir like the bench's d-group)
    val targets: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "d02" -> SparkEntry.queries("d02_ngram_jaccard_pairs"),
      "d04" -> SparkEntry.queries("d04_simhash_pairs"),
      "d06" -> SparkEntry.queries("d06_neardup_clusters"),
      "s03" -> SparkEntry.queries("s03_knn_join"),
      "p09" -> SparkEntry.queries("p09_contamination"),
      "p10x4" -> ((s: SparkSession, d: String) =>
        graft.pipeline.TextAnalysis.leakedGramsSharded(s, d, 4)),
      // x05: global RangedPrefix rank over (lang, hash) — expected
      // ~n log n from the range-partition sort, i.e. ~linear wall-clock
      // at any practical R
      "x05" -> SparkEntry.queries("x05_mixture_sample"),
      // s08: same IVF candidate volume as s02 (fixed query set), plus
      // one int8 pass over the candidates — expected to track s02's
      // shape, i.e. sub-linear in wall-clock at small R (probe cost is
      // dominated by the k=sqrt(n) index build, like s03)
      "s08" -> SparkEntry.queries("s08_sq8_rescore"),
      // p14: distinct (source, gram) reduction + per-gram source
      // self-join — gram volume scales linearly and the per-gram pair
      // work is bounded by the (fixed) source count, so ~linear; the
      // matrix keeps its |sources|^2 shape with cell counts scaling ~R
      // (each replica contributes its own disjoint-vocabulary grams
      // under the same source labels)
      "p14" -> SparkEntry.queries("p14_cross_source_leakage"),
      // p15: explode → (doc, token) agg → per-doc agg; token volume and
      // type volume both scale ~R with disjoint replica vocabularies,
      // so ~linear
      "p15" -> SparkEntry.queries("p15_lexical_diversity"),
      // m05: inverted-index self-join on frame digests — candidate
      // volume is Σ df(g)² over shared digests; replicas share no
      // digests (suffixed tokens shift every 32-byte frame), so pair
      // volume scales ~R and the probe should be ~linear
      "m05" -> SparkEntry.queries("m05_media_neardup"),
      // q25: three chained user-keyed min aggregations over per-type
      // event subsets; the replica carries R disjoint user populations
      // with identical histories, so the funnel's work is exactly R x
      // the base — ~linear expected, superlinearity would mean the
      // stage joins stopped reusing the user-keyed partitioning
      "q25" -> SparkEntry.queries("q25_funnel"),
      // p16: ONE corpus-scale word count, then 8 vocab-sized merge
      // iterations; replica vocabularies are disjoint (~k suffixes) so
      // the vocab table scales ~R — ~linear overall, dominated by the
      // word count
      "p16" -> SparkEntry.queries("p16_bpe_merges"),
      // p17: pure per-row fingerprint pass + output sort — ~linear
      "p17" -> SparkEntry.queries("p17_winnowing"),
      // d08: batch band rows join the corpus band table; both sides
      // scale ~R and replicas share no buckets (disjoint vocabulary),
      // so candidate volume — and the verify join behind it — is ~R x
      // the base: ~linear
      "d08" -> SparkEntry.queries("d08_delta_dedup"),
      // p18: winnowed-fingerprint inverted-index self-join; replicas
      // share no fingerprints, so pair volume scales ~R — ~linear
      "p18" -> SparkEntry.queries("p18_fingerprint_overlap"),
      // s11: one shared-window sweep over the k=sqrt(n) index; cost is
      // dominated by the corpus cell assignment (n x sqrt(n) cosines)
      // like s03 — allow ~n^1.5
      "s11" -> SparkEntry.queries("s11_nprobe_curve"),
      // d09: one conditional-agg pass over d02's cap x df bounded pair
      // stats — same ~linear envelope as d02
      "d09" -> SparkEntry.queries("d09_threshold_curve"),
      // p19: corpus word count + vocab-sized encode chain + broadcast
      // join — ~linear, dominated by the word count like p16
      "p19" -> SparkEntry.queries("p19_bpe_encode"),
      // q26: per-user window + distinct (user, week) + user-keyed
      // joins; replicas are disjoint user populations — ~linear
      "q26" -> SparkEntry.queries("q26_cohort_retention"),
      // v05: four fixed passes, each a scan + 64-key agg — ~linear
      "v05" -> SparkEntry.queries("v05_pc1_profile"),
      // s12: subvector explosion x fixed 16-candidate argmin per
      // iteration — ~linear (codebook size fixed)
      "s12" -> SparkEntry.queries("s12_pq_profile"),
      // s13: fixed query set; candidate volume = n x 8 code rows
      // against a broadcast table — ~linear
      "s13" -> SparkEntry.queries("s13_pq_adc"),
      // m06: m05's ~linear pair volume + label propagation whose rounds
      // are bounded by component diameter (replica components are copies
      // of the base's, so diameter is unchanged) — ~linear
      "m06" -> SparkEntry.queries("m06_media_clusters"),
      // s14: s07's cell-pruned pair volume (assignment-dominated like
      // s03/s11, ~n^1.5 allowance) + diameter-bounded propagation
      "s14" -> SparkEntry.queries("s14_semantic_clusters"),
      // p20: positional gram table ~token volume through one window
      // shuffle on the hash; replica vocabularies are disjoint, so
      // dup-gram volume scales ~R — ~linear
      "p20" -> SparkEntry.queries("p20_dup_spans"),
      // s15: the ~5% test split probes nprobe of k=sqrt(n) cells over
      // the 90% train side — candidate volume ~n^1.5 like s03/s11
      "s15" -> SparkEntry.queries("s15_semantic_decontam"),
      // s16: fixed query set; candidate code-rows (nprobe/k)·n per
      // query, but the trained-assignment build is n·sqrt(n) cosines
      // — allow ~n^1.5 like s03/s11
      "s16" -> SparkEntry.queries("s16_ivfpq_search"),
      // d10: cluster-artifact read + doc-keyed token-count join + one
      // cluster_id window/agg; cluster rows and the token scan both
      // scale ~R (replica components are copies of the base's) —
      // ~linear, dominated by the documents scan
      "d10" -> SparkEntry.queries("d10_longest_survivors"),
      // d11: the union of three dup-fraction-sized verified pair sets
      // (d02/d03/d04 — each probed individually above) through one
      // pair-keyed agg + a 7-row collapse; expected to track the MAX
      // of its three inputs — ~linear
      "d11" -> SparkEntry.queries("d11_detector_overlap"),
      // x09: x02's manifest aggregated to one row per (lang) stratum,
      // then per-stratum arithmetic on broadcast one-row totals —
      // ~linear, dominated by the export scan
      "x09" -> SparkEntry.queries("x09_epoch_plan"),
      // p22: bigram volume ~R; the LM count tables scale ~R with
      // disjoint replica vocabularies and the scoring join is
      // bigram-keyed on both sides — ~linear
      "p22" -> SparkEntry.queries("p22_perplexity_buckets"),
      // p23: feature hashing is per-row in the scan; the distribution
      // tables are FIXED 4096 rows regardless of R (replica bigrams
      // hash into the same buckets — the DSIR constant-model property
      // under test) — ~linear, dominated by the corpus scan
      "p23" -> SparkEntry.queries("p23_dsir_weights"),
      // x10: x09's shape — one row per stratum off the export scan —
      // ~linear
      "x10" -> SparkEntry.queries("x10_temperature_mixture"),
      // p25: reuses the persisted gram artifact; one gram-keyed
      // map-side-combined count to a 5-row histogram — ~linear
      "p25" -> SparkEntry.queries("p25_gram_df_spectrum"),
      // v07: one posexplode to a d-key aggregate + v05's memoized
      // profile collapsed to a scalar — ~linear, v05-dominated
      "v07" -> SparkEntry.queries("v07_anisotropy_profile"),
      // p26: the encode-table build is p19's (~linear, vocab-sized
      // merges); the eval is one corpus scan joined to the broadcast
      // vocab, collapsed to |langs| rows — ~linear
      "p26" -> SparkEntry.queries("p26_tokenizer_fertility"),
      // x12: one projection over x03's memoized layout + a shard-keyed
      // map-side-combined aggregate — ~linear
      "x12" -> SparkEntry.queries("x12_checksum_manifest"),
      // m07: m06's durable cluster artifact joined to the byte
      // catalog + one cluster-keyed window over dup-sized rows —
      // ~linear, m06-dominated
      "m07" -> SparkEntry.queries("m07_media_survivors"),
      // s21: s14's durable cluster artifact joined to p22's memoized
      // scored frame + one cluster-keyed window over dup-sized rows —
      // ~linear, dominated by whichever artifact is cold
      "s21" -> SparkEntry.queries("s21_semantic_survivors"),
      // d12: one rollup of the stored five-flag pair artifact — the
      // build is detector-dominated (d02..d05 + s07), the query ~flat
      "d12" -> SparkEntry.queries("d12_detector_overlap_full"),
      // s22: the memoized exact-KNN pool + per-query k²-bounded MMR
      // fold — pool-dominated (s01's corpus scan), re-rank itself
      // grows only with |Q| (fixed here), so warm reads stay ~flat
      "s22" -> SparkEntry.queries("s22_mmr_rerank"),
      // m09: linear landmark scan + df-capped inverted-index join +
      // partial-agg vote count — the d02 volume class (Σ df² bounded
      // by the cap), ~linear in audio bytes
      "m09" -> SparkEntry.queries("m09_audio_aligned_pairs"),
      // p31: positional train grams (linear) term-join the test gram
      // set (the p09 shuffle class), then leak-volume islands + the
      // p21 indexed cut — ~linear, leak-volume dominated downstream
      "p31" -> SparkEntry.queries("p31_leak_excision"),
      // q28: one per-user rollup + three RangedPrefix global ranks
      // (range-partition prefix sums, no single-partition window) —
      // ~linear in events, |users|-bounded downstream
      "q28" -> SparkEntry.queries("q28_rfm_segments"),
      // p29: one range-partition global rank + the p06-class vocab
      // shuffle (term keys only) + 10-row arithmetic — ~linear
      "p29" -> SparkEntry.queries("p29_vocab_growth"),
      // v08: s03's probed candidate volume at k=2 + a per-query 2-row
      // rollup to one scalar — tracks s03 (~n^1.5 via k=sqrt(n) cells)
      "v08" -> SparkEntry.queries("v08_twonn_id"),
      // m08: per-row aHash (one HOF pass, no shuffle) + MIH banded
      // self-join — candidate volume Σ df(block)², ~linear while the
      // 4-bit blocks stay sparse (the production lever is code width)
      "m08" -> SparkEntry.queries("m08_image_phash_pairs"),
      // x11: one corpus scan to two longs + its gates' drop lists and
      // per-doc score tables (each probed individually: d06, p09, p22,
      // p24) joined on doc_id — expected ~linear, p22-dominated
      "x11" -> SparkEntry.queries("x11_quality_funnel"),
      // s18: s16's ADC scan (sublinear — scan fraction nprobe/k falls
      // as k=sqrt(n) grows) plus a RescorePool x queries int8
      // point-lookup refine — expected to track s16
      "s18" -> SparkEntry.queries("s18_pq_refine"),
      // s19: one widest-pool ADC scan + refine join + a query-keyed
      // window over ≤60 rows/query, plus the exact-side artifact join
      // — ~linear (measured 2.0–2.4 at 10×)
      "s19" -> SparkEntry.queries("s19_refine_pool_curve"),
      // p27: three regex counts + one chained replace per row inside
      // a single projection — pure map-side, no shuffle; expected
      // ~linear with corpus rows
      "p27" -> SparkEntry.queries("p27_pii_redaction"),
      // p28: per-row token fold (regex gate + 16-step integer
      // checksum per candidate) in one projection — pure map-side,
      // p27's expected ~linear shape
      "p28" -> SparkEntry.queries("p28_luhn_redaction"),
      // s20: the 256-code retrain — training is PqIters corpus passes
      // scoring a constant 256x8 broadcast codebook map-side (~linear
      // in vectors); the ADC/recall half shares s16's probed shape
      // (fixed query set, (nprobe/k)·n candidates — ~sublinear)
      "s20" -> SparkEntry.queries("s20_retrained_recall"),
      // p24: the occ build is one corpus scan (~R); each of the 3 GD
      // iterations is two exchange-free passes over the
      // doc_id-partitioned occ plus a FIXED 4096-key collapse, and the
      // model stays a constant 32 KB driver array at any R (the same
      // hashed-feature property p23 probes) — ~linear
      "p24" -> SparkEntry.queries("p24_quality_classifier"),
      // m10: one rollup of the stored four-flag media pair artifact —
      // the build is detector-dominated (m05/m08/m09 + the stored d11
      // table), the query itself ~flat
      "m10" -> SparkEntry.queries("m10_media_detector_overlap"),
      // x13: x06's shard rollup + four ONE-ROW broadcast folds over
      // the dup/contam-fraction-sized stored lists (d06, p09, s21,
      // s15 since the semantic gates landed) — ~linear, x03-dominated
      "x13" -> SparkEntry.queries("x13_release_provenance"),
      // d13: stored cluster artifact + memoized capped index;
      // in-cluster pair volume is dup-sized and PurityExactCap²-
      // bounded per cluster — ~linear in dup volume
      "d13" -> SparkEntry.queries("d13_cluster_purity"),
      // p32: one term-keyed map-side-combined count + a RangedPrefix
      // global rank + a 5-sum single-row aggregate — ~linear in
      // tokens, vocab-bounded downstream
      "p32" -> SparkEntry.queries("p32_zipf_slope"),
      // d14: line hashes are ~token volume through one distinct+count
      // (map-side combined); replicas share no lines (disjoint
      // vocabulary) so the dup-line list scales ~R and the excision is
      // a per-row filter — ~linear
      "d14" -> SparkEntry.queries("d14_line_dedup"),
      // x14: x02's manifest scan + two broadcast anti-joins against
      // the stored dup-fraction-sized semantic lists — ~linear,
      // manifest-scan dominated (list builds probed via s14/s15/s21)
      "x14" -> SparkEntry.queries("x14_semantic_export"),
      // x15: each doc explodes to its resident block range off x03's
      // memoized layout — emission volume ~tokens/2048 + n_docs with a
      // block-keyed partial agg — ~linear
      "x15" -> SparkEntry.queries("x15_block_map"),
      // x16: pure shift-mask projection over x03's memoized layout
      // into a histogram-sized partial agg — ~linear, layout-dominated
      "x16" -> SparkEntry.queries("x16_fragmentation_audit"),
      // x17: two conditional aggregates over the published manifest to
      // stats-row scalars + constant arithmetic — ~linear,
      // manifest-scan dominated
      "x17" -> SparkEntry.queries("x17_delta_dirtiness"))

    // optional args after reps: probe only the named targets (dev
    // iteration on a new operator without re-running the full set)
    val only = args.drop(1).toSet
    val selected =
      if (only.isEmpty) targets
      else {
        val unknown = only -- targets.map(_._1).toSet
        require(unknown.isEmpty, s"unknown probe targets: $unknown")
        targets.filter(t => only(t._1))
      }

    def once(f: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      f(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val rows = for (dir <- Seq(base, out)) yield {
      invalidateAll()
      // warm FS metadata + page cache so dir order doesn't bias pass 1
      Tables.documents(spark, dir).write.mode("overwrite").format("noop").save()
      Tables.embeddings(spark, dir).write.mode("overwrite").format("noop").save()
      // per-dir round counts: clear the record so the print below
      // shows only THIS corpus's contractions
      graft.pipeline.Dedup.lastPropagationRounds.clear()
      val timings = selected.map { case (name, f) =>
        val t1 = once(f, dir)
        val t2 = once(f, dir)
        println(f"[probe] $dir $name cold=$t1%.2f warm=${math.min(t1, t2)}%.2f")
        (name, t1, math.min(t1, t2))
      }
      // star-contraction round counts (d06/m06/s14 share the engine):
      // the engine switched in round 15 BECAUSE min-label propagation's
      // count grew with corpus size (s14 4→14 at 10×); these lines keep
      // the base-vs-replica comparison measured every probe run
      val rounds = graft.pipeline.Dedup.lastPropagationRounds.toSeq.sorted
      if (rounds.nonEmpty)
        println(s"[probe] $dir propagation_rounds=" +
          rounds.map { case (t, r) => s"$t:$r" }.mkString(","))
      dir -> timings
    }
    val Seq((_, b), (_, s)) = rows
    println("SCALE name base_cold base_warm x_cold x_warm ratio_cold ratio_warm")
    b.zip(s).foreach { case ((n, bc, bw), (_, sc, sw)) =>
      println(f"SCALE $n $bc%.2f $bw%.2f $sc%.2f $sw%.2f ${sc / bc}%.2f ${sw / bw}%.2f")
    }
    spark.stop()
  }
}
