package graft.pipeline

import graft.SparkSpec

class ExportSpec extends SparkSpec {

  test("x01 is consistent with its upstream operators") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Export.x01CorpusExport(spark, sfDir).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.length == byId.size, "one row per surviving document")

    // every exported doc survives d06 (keep=1 or unclustered)
    val dropped = Dedup.d06NeardupClusters(spark, sfDir)
      .filter($"keep" === 0).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(byId.keySet.intersect(dropped).isEmpty, "a dropped near-dup leaked through")

    // quality gate matches p02's clean-bucket thresholds
    rows.foreach(r => assert(r.getAs[Long]("n_tokens") >= 30))

    // split assignment agrees with p07's buckets in aggregate:
    // grouping x01 by split must never invent a split p07 doesn't have
    val p07Splits = TextAnalysis.p07SplitProfile(spark, sfDir)
      .select($"split").distinct().collect().map(_.getString(0)).toSet
    val x01Splits = rows.map(_.getAs[String]("split")).toSet
    assert(x01Splits.subsetOf(p07Splits))
    // and the train share lands near 90%
    val train = rows.count(_.getAs[String]("split") == "train")
    assert(train * 10 >= rows.length * 8, s"train share off: $train/${rows.length}")

    // something was actually filtered (the corpus has shorts and dups)
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length < total)
  }

  test("x02 drops exactly x01's contaminated test docs, nothing else") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val x01 = Export.x01CorpusExport(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val x02 = Export.x02DecontaminatedExport(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(x02.subsetOf(x01.keySet), "x02 must be a subset of x01")
    val contaminated = TextAnalysis.p09Contamination(spark, sfDir)
      .filter($"contaminated" === 1).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val dropped = x01.keySet -- x02
    assert(dropped == x01.keySet.intersect(contaminated),
      s"dropped $dropped != x01-surviving contaminated docs")
    // only test-split rows can be dropped
    assert(dropped.forall(id => x01(id) == "test"),
      "decontamination must never touch train/val rows")
  }

  test("x14 drops exactly the semantic lists; a lexically-unique doc falls ONLY to the semantic gate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val x02 = Export.x02DecontaminatedExport(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val x14 = Export.x14SemanticExport(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(x14.subsetOf(x02), "x14 must be a subset of x02")
    val semDrops = Similarity.semDropList(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val semContam = Similarity.semContamList(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(x02 -- x14 == (semDrops ++ semContam).intersect(x02),
      "x14's drop set is not exactly the semantic lists' x02 members")
    // the stored drop artifact equals an independent re-derivation
    // from the PUBLISHED s14/s21 query outputs (keep rule: everyone
    // but the survivor goes)
    val members = Similarity.s14SemanticClusters(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("vec_id")))
    val survivors = Similarity.s21SemanticSurvivors(spark, sfDir)
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        r.getAs[Long]("survivor_vec_id")).toMap
    val rederived = members.collect {
      case (c, v) if survivors(c) != v => v
    }.toSet
    assert(semDrops == rederived, "stored s21 drop list diverges from " +
      "the published cluster/survivor tables")
    // THE PIN: a document every lexical gate passed (x02 membership =
    // quality-clean, not in d06's drop list, not p09-contaminated)
    // that the release still drops — because the embedding space sees
    // the near-dup the lexical detectors cannot
    val semOnly = (x02 -- x14).intersect(semDrops)
    assert(semOnly.nonEmpty,
      "no doc is dropped ONLY by the semantic gate — the gate is vacuous")
    val clusterOf = members.groupBy(_._2).view.mapValues(_.head._1).toMap
    val sizes = members.groupBy(_._1).view.mapValues(_.length).toMap
    semOnly.foreach { id =>
      assert(sizes(clusterOf(id)) >= 2,
        s"doc $id dropped from a singleton semantic cluster")
    }
    // and the lexical gate really did pass it: not in d06's drop list
    val lexDrops = graft.pipeline.Dedup.clusterDropList(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(semOnly.forall(id => !lexDrops(id)))
  }

  test("x03 packs the train split gaplessly into fixed blocks") {
    import spark.implicits._
    val rows = Export.x03PackingLayout(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("doc_id"))
    assert(rows.nonEmpty)
    // exactly x14's (the published manifest's) train docs, in doc_id order
    val train = Export.x14SemanticExport(spark, sfDir)
      .filter($"split" === "train").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == train.keySet)
    val B = Export.BlockTokens
    // gapless concatenation: doc k starts exactly where doc k-1 ended
    var expectedStart = 0L
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val blk = r.getAs[Long]("start_block")
      val off = r.getAs[Long]("start_offset")
      assert(off >= 0 && off < B, s"doc $id: offset $off outside [0,$B)")
      assert(blk * B + off == expectedStart,
        s"doc $id: starts at ${blk * B + off}, expected $expectedStart")
      assert(r.getAs[Long]("n_tokens") == train(id))
      expectedStart += r.getAs[Long]("n_tokens")
    }
    // total block count is exactly ceil(total_tokens / B)
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val lastBlock = rows.last.getAs[Long]("start_block")
    assert(lastBlock <= (totalTokens - 1) / B,
      "a start_block beyond the token total means phantom gaps")
  }

  test("x04 mixture quotas are integer-exact and bound by the scarcest stratum") {
    import spark.implicits._
    val rows = Export.x04MixturePlan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // availability recomputed from the publishable manifest directly
    val avail = Export.x14SemanticExport(spark, sfDir).select($"doc_id")
      .join(graft.Tables.documents(spark, sfDir).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(rows.map(_.getAs[String]("lang")).toSet == avail.keySet)
    val units = rows.map(r =>
      r.getAs[Long]("n_available") / r.getAs[Long]("parts")).min
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(r.getAs[Long]("n_available") == avail(lang))
      assert(r.getAs[Long]("parts") == (if (lang == "en") 6L else 1L))
      assert(r.getAs[Long]("quota") == r.getAs[Long]("parts") * units)
      // every quota is drawable from what the stratum actually has
      assert(r.getAs[Long]("quota") <= r.getAs[Long]("n_available"))
    }
    // the bound is tight: one more recipe unit would overdraw some stratum
    assert(rows.exists(r =>
      (units + 1) * r.getAs[Long]("parts") > r.getAs[Long]("n_available")),
      "units is not the maximal whole-recipe count")
  }

  test("x05 draws exactly x04's quota per stratum, lowest-hash-first") {
    import spark.implicits._
    val quotas = Export.x04MixturePlan(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("quota")).toMap
    val sample = Export.x05MixtureSample(spark, sfDir).collect()
    // stratum-exact: each language contributes precisely its quota,
    // ranked contiguously from 1
    val byLang = sample.groupBy(_.getAs[String]("lang"))
    assert(byLang.keySet == quotas.filter(_._2 > 0).keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length.toLong == quotas(lang), s"$lang sample size")
      assert(rows.map(_.getAs[Long]("stratum_rank")).sorted.toSeq ==
        (1L to quotas(lang)), s"$lang ranks not contiguous")
    }
    // lowest-hash-first: no selected doc hashes higher than an
    // unselected doc of the same stratum
    val hk = (id: Long) => {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    }
    val all = Export.x14SemanticExport(spark, sfDir).select($"doc_id")
      .join(graft.Tables.documents(spark, sfDir).select($"doc_id", $"lang"), "doc_id")
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id")))
    val chosen = sample.map(r =>
      (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet
    byLang.keys.foreach { lang =>
      val keys = all.filter(_._1 == lang)
        .map { case (_, id) => ((hk(id), id), chosen.contains((lang, id))) }
        .sortBy(_._1)
      val boundary = keys.count(_._2)
      assert(keys.take(boundary).forall(_._2),
        s"$lang selection is not a lowest-hash prefix")
    }
    // deterministic across a cache flush
    Export.invalidateCaches()
    val again = Export.x05MixtureSample(spark, sfDir).collect()
    assert(again.map(_.toSeq).toSeq == sample.map(_.toSeq).toSeq)
  }

  test("x06 shards partition x03's layout exactly") {
    import spark.implicits._
    val layout = Export.x03PackingLayout(spark, sfDir).collect()
    val shards = Export.x06ShardManifest(spark, sfDir).collect()
    // totals conserve: every laid-out doc lands in exactly one shard
    assert(shards.map(_.getAs[Long]("n_docs")).sum == layout.length.toLong)
    assert(shards.map(_.getAs[Long]("n_tokens")).sum ==
      layout.map(_.getAs[Long]("n_tokens")).sum)
    shards.foreach { s =>
      val id = s.getAs[Long]("shard_id")
      // block range stays inside the shard's window
      assert(s.getAs[Long]("first_block") >= id * Export.BlocksPerShard)
      assert(s.getAs[Long]("last_block") < (id + 1) * Export.BlocksPerShard)
      assert(s.getAs[Long]("first_block") <= s.getAs[Long]("last_block"))
    }
    // shards cover a contiguous prefix of the block space (no gap: the
    // packed layout has no empty block, so no empty shard either)
    val ids = shards.map(_.getAs[Long]("shard_id")).sorted.toSeq
    assert(ids == (0L until ids.length.toLong))
  }

  test("x15 block map: gapless full blocks, conserved tokens, residency matches a driver replay") {
    val layout = Export.x03PackingLayout(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("start_block") * Export.BlockTokens +
          r.getAs[Long]("start_offset")))
    val rows = Export.x15BlockMap(spark, sfDir).collect()
      .map(r => r.getAs[Long]("block_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("first_doc_id"),
          r.getAs[Long]("last_doc_id"), r.getAs[Long]("n_tokens"))).toMap
    // gapless: blocks 0..max, every block FULL except possibly the last
    val ids = rows.keys.toSeq.sorted
    assert(ids == (0L until ids.length.toLong))
    ids.init.foreach { b =>
      assert(rows(b)._4 == Export.BlockTokens, s"block $b not full")
    }
    // conservation: the map's fill sums to the layout's token total
    assert(rows.values.map(_._4).sum == layout.map(_._2).sum)
    // residency equals a driver replay of the span arithmetic
    val B = Export.BlockTokens
    val want = layout.flatMap { case (id, n, sp) =>
      (sp / B to (sp + n - 1) / B).map { b =>
        b -> (id, math.min(sp + n, (b + 1) * B) - math.max(sp, b * B))
      }
    }.groupBy(_._1).map { case (b, xs) =>
      val docs = xs.map(_._2._1)
      b -> (docs.length.toLong, docs.min, docs.max, xs.map(_._2._2).sum)
    }
    assert(rows == want)
    // multi-doc blocks exist (the map is not a trivial 1:1 table)
    assert(rows.values.exists(_._1 > 1))
  }

  test("x13 provenance reconciles x06's shard set; folds replay from the stored lists") {
    val prov = Export.x13ReleaseProvenance(spark, sfDir).collect()
    val shards = Export.x06ShardManifest(spark, sfDir).collect()
    // one provenance row per x06 shard, carrying ITS (n_docs, n_tokens)
    assert(prov.map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_tokens"))).toSet ==
      shards.map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).toSet)
    // the release-level provenance columns are one record, constant
    // across shards (the artifact identity, not a per-shard quantity)
    val recs = prov.map(r => (r.getAs[Long]("n_dup_dropped"),
      r.getAs[Long]("dup_drop_xor"), r.getAs[Long]("n_contaminated"),
      r.getAs[Long]("contam_xor"), r.getAs[Long]("n_semdedup_dropped"),
      r.getAs[Long]("semdedup_xor"), r.getAs[Long]("n_sem_contaminated"),
      r.getAs[Long]("semcontam_xor"), r.getAs[Long]("block_tokens"),
      r.getAs[Long]("blocks_per_shard"),
      r.getAs[Long]("sem_tau_ppm"))).distinct
    assert(recs.length == 1, s"provenance record not constant: $recs")
    val (nDrop, dropXor, nContam, contamXor, nSem, semXor,
      nSemCon, semConXor, bt, bps, tau) = recs.head
    assert(bt == Export.BlockTokens && bps == Export.BlocksPerShard)
    // the semantic threshold rides the record, exact-ppm
    assert(tau == Export.SemDedupTauPpm)
    // content folds replay driver-side from the same stored artifacts
    // the export chain consumes — the verification a loader performs
    def fold48(ids: Seq[Long]): Long = ids.map { id =>
      java.lang.Long.parseLong(
        graft.pipeline.ArtifactStore.md5Hex(id.toString).take(12), 16)
    }.foldLeft(0L)(_ ^ _)
    val dropIds = graft.pipeline.Dedup.clusterDropList(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(nDrop == dropIds.length.toLong)
    assert(dropXor == fold48(dropIds), "dup drop-list fold mismatch")
    val contamIds = graft.pipeline.TextAnalysis
      .contaminatedDocs(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(nContam == contamIds.length.toLong)
    assert(contamXor == fold48(contamIds), "contam-list fold mismatch")
    // the SEMANTIC folds replay the same way, from the stored semantic
    // artifacts the published manifest anti-joins
    val semIds = Similarity.semDropList(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(nSem == semIds.length.toLong)
    assert(semXor == fold48(semIds), "semdedup drop-list fold mismatch")
    assert(nSem > 0, "semdedup fold over an empty list proves nothing")
    val semConIds = Similarity.semContamList(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(nSemCon == semConIds.length.toLong)
    assert(semConXor == fold48(semConIds), "sem-contam fold mismatch")
  }

  test("x07 card reconciles the corpus total and x14's published set exactly") {
    val card = Export.x07DatasetCard(spark, sfDir).collect()
    assert(card.nonEmpty)
    def col(n: String) = card.map(_.getAs[Long](n)).sum
    // every document is accounted in exactly one status bucket
    val accounted = col("n_published") + col("n_quality_filtered") +
      col("n_dup_dropped") + col("n_contaminated") +
      col("n_semdedup_dropped") + col("n_sem_contaminated")
    assert(accounted == graft.Tables.documents(spark, sfDir).count())
    // the published cells ARE x14's manifest (the one the release
    // ships), split & token mass included
    val x14 = Export.x14SemanticExport(spark, sfDir).collect()
    assert(col("n_published") == x14.length)
    assert(col("n_tokens_published") ==
      x14.map(_.getAs[Long]("n_tokens")).sum)
    val bySplit = x14.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.length.toLong)
    card.groupBy(_.getAs[String]("split"))
      .foreach { case (s, rows) =>
        assert(rows.map(_.getAs[Long]("n_published")).sum ==
          bySplit.getOrElse(s, 0L), s"split $s published count mismatch")
      }
    // the quality and dup channels are live on the fixture corpus;
    // the contamination channel equals EXACTLY the x01-to-x02
    // difference (a contaminated doc already dropped as quality/dup is
    // NOT the card's contamination — at sf0.001 the one planted
    // contaminated doc is also a dup, so this cell is legitimately 0)
    val x02 = Export.x02DecontaminatedExport(spark, sfDir).collect()
    assert(col("n_quality_filtered") > 0)
    assert(col("n_dup_dropped") > 0)
    assert(col("n_contaminated") ==
      Export.x01CorpusExport(spark, sfDir).count() - x02.length)
    // the two SEMANTIC channels cover exactly the x02-to-x14
    // difference, and the SemDeDup channel is live on the fixture
    assert(col("n_semdedup_dropped") + col("n_sem_contaminated") ==
      x02.length - x14.length)
    assert(col("n_semdedup_dropped") > 0,
      "semdedup channel silent — the semantic gate is vacuous here")
    card.filter(_.getAs[String]("split") != "test").foreach { r =>
      assert(r.getAs[Long]("n_contaminated") == 0L,
        "contaminated docs outside the test split — p09 semantics broken")
      assert(r.getAs[Long]("n_sem_contaminated") == 0L,
        "sem-contaminated docs outside the test split — s15 semantics broken")
    }
  }

  test("x08 is a per-epoch permutation matching the md5 draw order, distinct across epochs") {
    val rows = Export.x08EpochShuffle(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("block_id"),
        r.getAs[Long]("shuffle_rank")))
    assert(rows.nonEmpty)
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == (0L until Export.ShuffleEpochs).toSet)
    val nBlocks = rows.map(_._2).max + 1
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    byEpoch.foreach { case (e, rs) =>
      // every epoch covers every block exactly once, ranks 1..n
      assert(rs.map(_._2).sorted.toSeq == (0L until nBlocks).toSeq)
      assert(rs.map(_._3).sorted.toSeq == (1L to nBlocks).toSeq)
      // the order IS the md5 draw order
      val want = (0L until nBlocks)
        .sortBy(b => (md5hex(s"$e:$b").take(8), b))
        .zipWithIndex.map { case (b, i) => b -> (i + 1L) }.toMap
      rs.foreach { case (_, b, rk) =>
        assert(rk == want(b), s"epoch $e block $b rank $rk != ${want(b)}")
      }
    }
    // epochs draw DIFFERENT orders (the whole point of re-shuffling)
    val orders = byEpoch.values
      .map(_.sortBy(_._3).map(_._2).toSeq).toSet
    assert(orders.size == byEpoch.size,
      "two epochs produced the identical block order")
  }

  test("x09 epoch plan matches a first-principles replay of the budget math") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // independent reference: per-lang unique published train tokens
    val lang = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val uniq = Export.x14SemanticExport(spark, sfDir)
      .filter($"split" === "train").collect()
      .groupBy(r => lang(r.getAs[Long]("doc_id")))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum)
      .filter(_._2 > 0L).toMap
    assert(uniq.nonEmpty, "no published train tokens — fixture broken")
    def parts(l: String): Long = if (l == "en") 6L else 1L
    val tu = uniq.values.sum
    val tp = uniq.keys.toSeq.map(parts).sum
    val C = Export.EpochCap
    val want = uniq.map { case (l, u) =>
      val budget = Export.BudgetMultiple * tu * parts(l) / tp
      val f = budget / u
      val r = budget - f * u
      val needed = f + (if (r > 0) 1L else 0L)
      val effFull = (1L to math.min(f, C)).map(k => u >> (k - 1).toInt).sum
      val eff = effFull + (if (f < C) r >> f.toInt else 0L)
      l -> (parts(l), u, budget, needed, math.min(needed, C),
        math.min(budget, C * u), eff,
        if (budget > C * u) 1L else 0L)
    }
    val got = Export.x09EpochPlan(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") -> (
        r.getAs[Long]("parts"), r.getAs[Long]("n_tokens_unique"),
        r.getAs[Long]("budget_tokens"), r.getAs[Long]("epochs_needed"),
        r.getAs[Long]("epochs_planned"), r.getAs[Long]("planned_tokens"),
        r.getAs[Long]("effective_tokens"), r.getAs[Long]("saturated")))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (l, w) => assert(got(l) == w, s"stratum $l: ${got(l)} != $w") }
    // plan invariants: value never exceeds what is planned, the plan
    // never exceeds the budget, and a 4x budget over a 6:1 recipe must
    // put at least one stratum into the multi-epoch regime
    got.values.foreach { case (_, _, budget, _, _, planned, eff, _) =>
      assert(eff <= planned && planned <= budget)
    }
    assert(got.values.exists(_._4 > 1L), "no stratum needed a repeat epoch")
  }

  test("x10 temperature mixture matches a first-principles replay off the published manifest") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lang = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val mass = Export.x14SemanticExport(spark, sfDir).collect()
      .filter(_.getAs[String]("split") == "train")
      .map(r => (lang(r.getAs[Long]("doc_id")), r.getAs[Long]("n_tokens")))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sum }
      .filter(_._2 > 0L)
    val q = mass.map { case (l, n) =>
      // the engine's ln-space quantization: inner floor of 2^20·ln n,
      // outer floor of 2^20·exp(a·inner/2^20) — NOT a direct pow
      val lnq = math.floor(1048576.0 * math.log(n.toDouble))
      l -> ((n, math.floor(1048576.0 *
        math.exp(Export.TempAlpha * lnq / 1048576.0)).toLong))
    }
    val sq = BigInt(q.values.map(_._2).sum)
    val nt = BigInt(q.values.map(_._1).sum)
    val got = Export.x10TemperatureMixture(spark, sfDir).collect()
    assert(got.map(_.getAs[String]("lang")).toSet == q.keySet)
    got.foreach { r =>
      val l = r.getAs[String]("lang")
      val (n, qt) = q(l)
      assert(r.getAs[Long]("n_tokens") == n, s"$l n_tokens")
      assert(r.getAs[Long]("q_temp") == qt, s"$l q_temp")
      assert(r.getAs[Long]("share_ppb") ==
        (BigInt(qt) * 1000000000L / sq).toLong, s"$l share_ppb")
      assert(r.getAs[Long]("planned_tokens") ==
        (BigInt(qt) * nt / sq).toLong, s"$l planned_tokens")
      assert(r.getAs[Long]("upsampled") ==
        (if (BigInt(qt) * nt > sq * BigInt(n)) 1L else 0L), s"$l upsampled")
    }
    // floors lose at most one ppb per stratum
    val shares = got.map(_.getAs[Long]("share_ppb")).sum
    assert(shares <= 1000000000L && shares > 1000000000L - got.length)
    // alpha < 1 flattens: the mixture must upsample some tail stratum
    // AND downsample some head stratum (otherwise it's a no-op knob)
    assert(got.exists(_.getAs[Long]("upsampled") == 1L))
    assert(got.exists(_.getAs[Long]("upsampled") == 0L))
    // planned per-epoch draw never exceeds the corpus total
    assert(got.map(_.getAs[Long]("planned_tokens")).sum <= nt.toLong)
  }

  test("x10's ln-space quantization clears the guard on every power-of-two stratum") {
    // the direct-pow path had a STRUCTURED benign trigger: n = 2^k with
    // k·alpha near an integer landed within fractions of an ulp of an
    // integer (k = 10: ~0.4 ulp of 2^23) and ABORTED the export; the
    // ln-space inner floor scatters that family — every 2^k stratum up
    // to 1e12 tokens must now clear the 4-ulp backstop
    (1 to 40).foreach { k =>
      val n = math.pow(2.0, k.toDouble)
      val lnRaw = 1048576.0 * math.log(n)
      val lnq = math.floor(lnRaw)
      val v = 1048576.0 * math.exp(Export.TempAlpha * lnq / 1048576.0)
      Seq(lnRaw, v).foreach { x =>
        val d = math.abs(x - math.rint(x))
        assert(d > 4.0 * math.ulp(x),
          s"n=2^$k lands within 4 ulp of an integer ($x)")
      }
    }
  }

  test("x12 checksums replay from x03's layout and are order-invariant by construction") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lay = Export.x03PackingLayout(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("start_block")))
    val byShard = lay.groupBy(_._3 / Export.BlocksPerShard)
    val got = Export.x12ChecksumManifest(spark, sfDir).collect()
      .map(r => r.getAs[Long]("shard_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("checksum_sum"),
          r.getAs[Long]("checksum_xor")))).toMap
    assert(got.keySet == byShard.keySet, "one row per x06 shard")
    byShard.foreach { case (shard, docs) =>
      val fps = docs.map { case (id, nt, _) =>
        java.lang.Long.parseLong(md5hex(s"$id:$nt").substring(0, 12), 16)
      }
      val (n, cs, cx) = got(shard)
      assert(n == docs.length.toLong, s"shard $shard n_docs")
      assert(cs == fps.sum, s"shard $shard sum")
      assert(cx == fps.reduce(_ ^ _), s"shard $shard xor")
      // order-invariance is definitional: the reversed fold agrees
      assert(fps.reverse.sum == fps.sum &&
        fps.reverse.reduce(_ ^ _) == fps.reduce(_ ^ _))
    }
    // a corrupted shard is detectable: perturbing one member's token
    // count moves BOTH folds
    val (id0, nt0, sb0) = lay.head
    val good = java.lang.Long.parseLong(
      md5hex(s"$id0:$nt0").substring(0, 12), 16)
    val bad = java.lang.Long.parseLong(
      md5hex(s"$id0:${nt0 + 1}").substring(0, 12), 16)
    val s0 = sb0 / Export.BlocksPerShard
    assert(got(s0)._2 - good + bad != got(s0)._2)
    assert((got(s0)._3 ^ good ^ bad) != got(s0)._3)
  }

  test("x11 funnel matches a cumulative replay of its seven gates and reconciles") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").collect()
      .map { r =>
        val t = r.getAs[String]("text").trim.split("\\s+").toSeq
        (r.getAs[Long]("doc_id"), t.size.toLong,
          t.count(TextAnalysis.Stopwords.contains).toLong)
      }
    val dropped = Dedup.d06NeardupClusters(spark, sfDir)
      .filter($"keep" === 0).collect().map(_.getAs[Long]("doc_id")).toSet
    val contaminated = TextAnalysis.p09Contamination(spark, sfDir)
      .filter($"contaminated" === 1).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val pb = TextAnalysis.p22PerplexityBuckets(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("ppl_bucket"))
      .toMap
    val pred = TextAnalysis.p24QualityClassifier(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("predicted"))
      .toMap
    val semDropped = Similarity.semDropList(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val semContam = Similarity.semContamList(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    def survives(stage: Int)(d: (Long, Long, Long)): Boolean = {
      val (id, n, stp) = d
      val gates = Seq[Boolean](
        n >= 30 && stp * 5 < n,
        !dropped(id),
        !contaminated(id),
        pb.getOrElse(id, "tail") != "tail",
        pred.getOrElse(id, 0L) == 1L,
        !semDropped(id),
        !semContam(id))
      gates.take(stage).forall(identity)
    }
    val got = Export.x11QualityFunnel(spark, sfDir).collect()
    assert(got.length == 8)
    assert(got.map(_.getAs[Long]("stage")).toSeq == (0L to 7L))
    got.foreach { r =>
      val st = r.getAs[Long]("stage").toInt
      val keep = docs.filter(survives(st))
      assert(r.getAs[Long]("n_docs") == keep.length,
        s"stage $st (${r.getAs[String]("stage_name")}) n_docs")
      assert(r.getAs[Long]("n_tokens") == keep.map(_._2).sum,
        s"stage $st n_tokens")
    }
    // the funnel narrows monotonically; the quality, dedup,
    // perplexity and classifier gates all fire on this corpus
    // (decontamination and BOTH semantic stages may legitimately drop
    // 0 here — their flagged docs can already be gone by an earlier
    // stage; the semantic gates' manifest-level firing is pinned by
    // the x14 spec instead); something survives the final cut
    val ns = got.sortBy(_.getAs[Long]("stage")).map(_.getAs[Long]("n_docs"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
    Seq(0, 1, 3, 4).foreach(i => assert(ns(i + 1) < ns(i),
      s"stage ${i + 1} dropped nothing: $ns"))
    assert(ns.last > 0, "nothing survives the funnel")
  }

  test("x16 prices a constructed straddle exactly and reconciles the real layout") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val B = Export.BlockTokens
    // the constructed-corpus device: the real corpus only exercises
    // whatever fragmentation it happens to have, so the head/tail
    // arithmetic is pinned on three hand-computable documents — one
    // that fits (1 fragment), a two-block straddle (head 48 / tail 52,
    // ONE truncation), and a three-block span (head 1048, one
    // exactly-full interior block, tail 500, TWO truncations)
    val layout = Seq(
      (1L, 100L, 0L, 0L),      // fits: frag 1, head 100, tail 0
      (2L, 100L, 0L, 2000L),   // straddles blocks 0|1: 48 + 52
      (3L, 3596L, 2L, 1000L))  // blocks 2..4: 1048 + 2048 + 500
      .toDF("doc_id", "n_tokens", "start_block", "start_offset")
    val got = Export.x16Core(layout).collect()
      .map(r => r.getAs[Long]("n_fragments") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_truncations"), r.getAs[Long]("head_tokens"),
          r.getAs[Long]("tail_tokens"))).toMap
    assert(got == Map(
      1L -> (1L, 100L, 0L, 100L, 0L),
      2L -> (1L, 100L, 1L, 48L, 52L),
      3L -> (1L, 3596L, 2L, 1048L, 500L)))

    // the real layout reconciles: every train doc lands in exactly one
    // bucket, token mass is conserved, and each bucket satisfies the
    // exact-interior identity (interior fragments are full blocks, so
    // n_tokens = head + tail + (n_frag - 2) * B per doc for n_frag >= 2
    // and n_tokens = head for unfragmented docs)
    val lay = Export.x03PackingLayout(spark, sfDir)
    val rows = Export.x16FragmentationAudit(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == lay.count())
    assert(rows.map(_.getAs[Long]("n_tokens")).sum ==
      lay.agg(sum($"n_tokens")).collect()(0).getLong(0))
    rows.foreach { r =>
      val (nf, nd, nt, tr, h, t) = (r.getAs[Long]("n_fragments"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_truncations"), r.getAs[Long]("head_tokens"),
        r.getAs[Long]("tail_tokens"))
      assert(tr == (nf - 1) * nd, s"bucket $nf truncation count")
      if (nf == 1) assert(t == 0L && h == nt, s"bucket 1 identity")
      else assert(nt == h + t + (nf - 2) * B * nd, s"bucket $nf identity")
    }
    // the corpus actually fragments (docs longer than a block exist),
    // so the audit is non-vacuous here
    assert(rows.exists(_.getAs[Long]("n_fragments") >= 2),
      "no fragmented bucket — the audit is vacuous on this corpus")
  }

  test("x17: an empty batch prices zero dirty shards; a constructed insertion shows the shift cliff") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def run(m: Seq[(Long, Long, Boolean)]) =
      Export.x17Core(m.toDF("doc_id", "n_tokens", "is_batch")).collect()
        .map(r => r.getAs[String]("scenario") ->
          (Option(r.getAs[Any]("first_dirty_block"))
            .map(_.asInstanceOf[Long]),
            r.getAs[Long]("n_dirty_blocks"), r.getAs[Long]("n_dirty_shards"),
            r.getAs[Long]("n_new_blocks"), r.getAs[Long]("n_new_shards")))
        .toMap

    // the ReleaseSpec-style gate: an EMPTY batch dirties nothing and
    // creates nothing, in BOTH admission policies
    val empty = run(Seq((10L, 5000L, false), (30L, 5000L, false)))
    assert(empty("append") == (None, 0L, 0L, 0L, 0L))
    assert(empty("insert") == (None, 0L, 0L, 0L, 0L))

    // the shift cliff, hand-computed at B=2048, S=8: old docs 10 and
    // 30 carry 5000 tokens each (oldBlocks ceil(10000/2048) = 5, one
    // shard); batch doc 20 (100 tokens) inserts between them. Insert:
    // the first shifted token sits at offset 5000 -> block 2, so
    // blocks 2..4 (3) and the one shard rewrite while total blocks
    // stay 5 (nothing net-new). Append: only the partial last block 4
    // rewrites. The cliff is the point: a 100-token insertion dirties
    // 3x what appending it does, and the gap GROWS with everything
    // packed after the insertion point.
    val ins = run(Seq((10L, 5000L, false), (20L, 100L, true),
      (30L, 5000L, false)))
    assert(ins("insert") == (Some(2L), 3L, 1L, 0L, 0L))
    assert(ins("append") == (Some(4L), 1L, 1L, 0L, 0L))

    // block-aligned corpus: appending never touches an old block (no
    // partial block to top up) — the batch is purely net-new
    val aligned = run(Seq((10L, 2048L, false), (20L, 100L, true),
      (30L, 2048L, false)))
    assert(aligned("append") == (None, 0L, 0L, 1L, 0L))
    assert(aligned("insert") == (Some(1L), 1L, 1L, 1L, 0L))

    // the real manifest's audit: both scenarios present, the batch is
    // non-empty under the d08 split, and insert dirties at least as
    // much as append (the cliff holds on real data)
    val real = Export.x17DeltaDirtiness(spark, sfDir).collect()
      .map(r => r.getAs[String]("scenario") -> r).toMap
    assert(real.keySet == Set("append", "insert"))
    assert(real("insert").getAs[Long]("n_batch_docs") > 0,
      "the d08 split selects no batch docs — the audit is vacuous")
    assert(real("insert").getAs[Long]("n_dirty_blocks") >=
      real("append").getAs[Long]("n_dirty_blocks"))
  }
}
