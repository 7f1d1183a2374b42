package graft.rass

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Embedding seam (reference: Ollama `/embeddings` HTTP calls,
  * `app/main.py:225-263` — batch 64, concurrency 5, empty text to a
  * zero-vector).
  *
  * In Spark the natural shape is mapPartitions with an explicit batch:
  * executors already give the parallelism the reference built with
  * asyncio semaphores, and a batch-of-64 amortizes whatever the
  * implementation costs per call (HTTP round-trip, model forward pass).
  * The deterministic implementation keeps tests and the correctness
  * gate hermetic; an HTTP impl plugs in without touching callers.
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Embed one batch of texts (batch size chosen by the caller). */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic hash-based embedder: each token contributes a
  * pseudo-random (but fixed) direction; the sum is L2-normalized with
  * the reference's epsilon (`main.py:1249-1251`). Empty text embeds to
  * the zero vector exactly like the reference (`main.py:227-228`).
  */
final class DeterministicEmbedder(val dim: Int = DocSchema.EmbedDim)
    extends Embedder {

  private def mix(z0: Long): Long = {
    // splitmix64 finalizer — stable across JVMs, good dispersion
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def embedOne(text: String): Array[Float] = {
    val v = new Array[Double](dim)
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.isEmpty) return new Array[Float](dim)
    toks.foreach { t =>
      val h = t.foldLeft(1125899906842597L)((a, c) => a * 31 + c)
      var j = 0
      while (j < dim) {
        // unit contribution in {-1, +1} per (token, dim)
        v(j) += (if ((mix(h * 131 + j) & 1L) == 0L) -1.0 else 1.0)
        j += 1
      }
    }
    val norm = math.sqrt(v.map(x => x * x).sum) + 1e-9
    v.map(x => (x / norm).toFloat)
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(embedOne)
}

object Embedder {
  val BatchSize = 64 // reference BATCH_SIZE (`main.py:78`)

  /** Add an `embedding` column by running `textCol` through the
    * embedder in batches inside each partition.
    */
  def embedColumn(df: DataFrame, textCol: String, embedder: Embedder,
      outCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(outCol, ArrayType(FloatType))
    val idx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        val embs = embedder.embedBatch(batch.map(r =>
          Option(r.getString(idx)).getOrElse("")))
        batch.lazyZip(embs).map { (r, e) => Row.fromSeq(r.toSeq :+ e.toSeq) }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
