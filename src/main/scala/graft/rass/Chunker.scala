package graft.rass

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size word chunking (reference `app/main.py:2160-2170`,
  * CHUNK_SIZE=512, no overlap; the ADAPTIVE_CHUNKING env flag is read
  * but never used, `main.py:100-102` — chunking is always fixed-size).
  *
  * Pure columnar: split -> sequence -> transform -> posexplode. One
  * narrow stage, no shuffle; at 100 TB chunking rides the ingest scan.
  */
object Chunker {

  val DefaultChunkSize = 512

  /** Chunk expressions for a WORD-ARRAY column: array of chunk
    * strings. Takes the pre-split array, not raw text — an expression
    * captured inside the `transform` lambda re-evaluates per element,
    * so an inlined `split` would re-tokenize the document once per
    * chunk (O(words²/chunkSize)).
    */
  def chunks(words: Column, chunkSize: Int): Column = {
    val nChunks = ceil(size(words).cast("double") / chunkSize).cast("int")
    transform(sequence(lit(0), greatest(nChunks - 1, lit(0))),
      i => array_join(slice(words, i * chunkSize + 1, lit(chunkSize)), " "))
  }

  /** Explode a document DataFrame into (…, chunk_index, chunk_text).
    * Empty/whitespace-only text yields one empty chunk, matching the
    * reference's behavior of skipping embedding for empty text with a
    * zero-vector (`main.py:227-228`).
    */
  def chunkDf(df: DataFrame, textCol: String,
      chunkSize: Int = DefaultChunkSize): DataFrame = {
    // deterministic fresh name: a caller frame that already carries a
    // "__words" column must not have it silently overwritten and
    // dropped by the staging projection
    val tmp = Iterator.from(0).map(i => if (i == 0) "__words" else s"__words$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(tmp, split(trim(col(textCol)), "\\s+"))
      .select(col("*"), posexplode(chunks(col(tmp), chunkSize)))
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "chunk_text")
      .drop(textCol, tmp)
  }
}
