package graft.rass.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rass.{Chunker, DocSchema, Embedder, VectorOps}

/** S5/S6/S7 — plain-text / markdown file ingest (reference
  * `parse_text_file`, `app/main.py:1167-1208`): whole-file read,
  * patientId inferred from the `patient_(\d+)` filename pattern
  * (`main.py:1158-1164`), fixed 512-word chunks. Markdown is treated as
  * text, exactly like the reference's live path (`main.py:1314-1315`
  * routes .md to parse_text_file; its parse_markdown_file is dead code
  * — SURVEY S6).
  *
  * Fully columnar: wholetext scan -> regexp on input_file_name ->
  * posexplode chunker. One narrow stage.
  */
object TextIngest {

  def ingestDirectory(spark: SparkSession, globPath: String,
      userId: String = "default",
      chunkSize: Int = Chunker.DefaultChunkSize): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("wholetext", "true").text(globPath)
      .select(input_file_name().as("file_path"), $"value".as("text"))
      .withColumn("file_type",
        when($"file_path".endsWith(".md"), "markdown").otherwise("text"))
    fromRaw(raw, userId, chunkSize)
  }

  /** Already-read file contents (the upload path, [[Upload]]): same
    * chunk/id pipeline as the directory scan, with the file_type the
    * caller determined from the original extension.
    */
  def fromContents(spark: SparkSession,
      files: Seq[(String, String, String)], // (file_path, text, file_type)
      userId: String = "default",
      chunkSize: Int = Chunker.DefaultChunkSize): DataFrame = {
    import spark.implicits._
    val raw = files.toDF("file_path", "text", "file_type")
    fromRaw(raw, userId, chunkSize)
  }

  /** (file_path, text, file_type) rows -> doc-schema chunk rows. */
  private def fromRaw(rawIn: DataFrame, userId: String,
      chunkSize: Int): DataFrame = {
    import rawIn.sparkSession.implicits._
    val raw = rawIn
      .withColumn("patientId",
        when(regexp_extract($"file_path", "patient_(\\d+)", 1) =!= "",
          regexp_extract($"file_path", "patient_(\\d+)", 1)))
      .withColumn("stem", regexp_extract($"file_path", "([^/]+)\\.[^.]+$", 1))
    val chunked = Chunker.chunkDf(raw, "text", chunkSize)
    // a path digest keeps same-named files in different directories from
    // colliding on doc_id (which would make upsert drop one silently)
    val withIds = chunked.select(
      concat($"stem", lit("-"), substring(md5($"file_path"), 1, 8),
        lit("-unstructured-"), $"chunk_index").as("doc_id"),
      lit("unstructured").as("doc_type"),
      $"file_path", $"file_type", $"patientId",
      $"chunk_text".as("unstructuredText"),
      lit(userId).as("user_id"))
    // conform to the full doc schema (missing columns null)
    val allCols = DocSchema.schema.map { f =>
      if (withIds.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    withIds.select(allCols: _*)
  }
}
