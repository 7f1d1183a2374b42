package graft.pipeline

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("every dedup query has an oracle and runs non-empty") {
    assert(Dedup.oracles.keySet == Dedup.queries.keySet)
    Dedup.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("d01 dup counts are consistent") {
    Dedup.d01ExactDedup(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("n_uniq_texts") + r.getAs[Long]("n_dup_docs")
        == r.getAs[Long]("n_docs"))
    }
  }

  test("d02 pairs satisfy the integer Jaccard threshold and id ordering") {
    Dedup.d02NgramJaccardPairs(spark, sfDir).collect().foreach { r =>
      val (inter, na, nb) = (r.getAs[Long]("inter"), r.getAs[Long]("na"), r.getAs[Long]("nb"))
      assert(inter <= math.min(na, nb))
      assert(inter * 5 >= (na + nb - inter) * 4)
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
    }
  }

  test("d02 df-capped candidates lose nothing vs the uncapped self-join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // uncapped reference formulation (the pre-cap d02): direct
    // inverted-index self-join, no candidate stage
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", split(trim($"text"), "\\s+").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id", explode(array_distinct(
        transform(sequence(lit(1), size($"t") - 2),
          i => array_join(slice($"t", i, lit(3)), " ")))).as("shingle"))
    val sizes = docs.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val uncapped = docs.as("a")
      .join(docs.as("b"), $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes).as("sa"), $"a_id" === $"sa.doc_id")
      .join(broadcast(sizes).as("sb"), $"b_id" === $"sb.doc_id")
      .filter($"inter" * 5 >= ($"sa.n" + $"sb.n" - $"inter") * 4)
      .select($"a_id", $"b_id", $"inter")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val capped = Dedup.d02NgramJaccardPairs(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("inter"))).toSet
    assert(capped == uncapped,
      s"df cap changed results: ${capped.size} vs ${uncapped.size}")
  }

  test("d03 MinHash/LSH pairs are a subset of brute-force Jaccard pairs") {
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val brute = keys(Dedup.d02NgramJaccardPairs(spark, sfDir))
    val lsh = keys(Dedup.d03MinhashLshPairs(spark, sfDir))
    assert(lsh.subsetOf(brute))
    // 4 bands x 3 rows at j>=0.8: P(miss) = (1-j^3)^4 <= 0.06 per pair;
    // on this corpus the banding should catch essentially everything.
    assert(lsh.size >= brute.size * 8 / 10, s"LSH recall too low: ${lsh.size}/${brute.size}")
  }

  test("d04 SimHash: bag-of-words duplicates collide at hamming 0") {
    val rows = Dedup.d04SimhashPairs(spark, sfDir).collect()
    assert(rows.forall(r => r.getAs[Long]("hamming") <= 3))
    assert(rows.exists(r => r.getAs[Long]("hamming") == 0L),
      "fingerprint-identical docs must have identical simhash")
  }

  test("d05 cosines are in (0.4, 1] and pairs are id-ordered") {
    Dedup.d05EmbeddingNearDup(spark, sfDir).collect().foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c > 0.4 && c <= 1.000001)
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
    }
  }

  test("d05 sign-LSH pairs are a subset of brute-force cosine pairs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.rass.expressions.CosineSimilarity.register(spark)
    val e = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val brute = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("a_id"), $"b.vec_id".as("b_id"),
        call_function("cosine_sim", $"a.v", $"b.v").as("cosine"))
      .filter($"cosine" > 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.d05EmbeddingNearDup(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(lsh.subsetOf(brute))
    // weak pairs (cosine 0.40-0.48) at 6 bands x 4 sign bits: measured
    // recall ~0.73 on this corpus; guard against silent banding breakage
    assert(lsh.size * 2 >= brute.size,
      s"sign-LSH recall too low: ${lsh.size}/${brute.size}")
  }

  test("d06 clusters are consistent connected components of the d03 pairs") {
    val pairs = Dedup.d03MinhashLshPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val rows = Dedup.d06NeardupClusters(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("keep")))).toMap
    // every paired doc is clustered, and both ends share a cluster
    pairs.foreach { case (a, b) =>
      assert(rows(a)._1 == rows(b)._1, s"$a and $b split across clusters")
    }
    // cluster id is the min member; exactly one survivor per cluster
    val byCluster = rows.toSeq.groupBy(_._2._1)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid)
      assert(members.count(_._2._2 == 1L) == 1)
      assert(members.find(_._2._2 == 1L).get._1 == cid)
      assert(members.size >= 2, "singletons are excluded from the dup list")
    }
  }
}
