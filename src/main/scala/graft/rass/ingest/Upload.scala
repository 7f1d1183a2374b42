package graft.rass.ingest

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

import graft.rass.{DeterministicEmbedder, Embedder}

/** S13 — the reference's upload endpoint modeled as an engine API
  * (`app/embedding_gen.py:1256-1408`): validate the user id
  * (`embedding_gen.py:1233-1236`), cap the request at
  * MAX_FILES_PER_REQUEST(5) files of MAX_FILE_SIZE(10 MB) each
  * (`embedding_gen.py:68-69`), stage each accepted file under the
  * user's upload folder, parse per extension (.json -> FHIR bundle,
  * .md/.txt -> chunked text), then embed + upsert through the same
  * crash-safe [[IngestCommit]] the streaming path uses.
  *
  * Divergences from the reference, both deliberate:
  *   - the staged filename suffix is a content digest, not `uuid4`
  *     (`embedding_gen.py:1325`), so re-uploading the same file is
  *     idempotent instead of duplicating every document;
  *   - text files are parsed with their FINAL path, not the tempfile
  *     path (`embedding_gen.py:1362-1364` stores the deleted temp path
  *     as `file_path`, leaving DOCUMENT_FETCH nothing to re-read).
  *
  * Per-file failures (bad extension, oversize, invalid bundle JSON,
  * empty text) skip that file exactly like the reference's per-file
  * error handling (`asyncio.gather(return_exceptions=True)`,
  * `embedding_gen.py:1381-1395`); request-level failures return the
  * reference's error strings.
  */
object Upload {

  val MaxFileSize: Long = 10485760L // embedding_gen.py:68
  val MaxFilesPerRequest: Int = 5   // embedding_gen.py:69

  // alphanumeric (<=36) or UUID, embedding_gen.py:1233-1236
  private val UserIdRe =
    ("^[a-zA-Z0-9_-]{1,36}$|^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-" +
      "[0-9a-f]{4}-[0-9a-f]{12}$").r

  def validateUserId(userId: String): Boolean = UserIdRe.matches(userId)

  final case class UploadResult(processedFiles: Int, docsIndexed: Long,
    message: String)

  private final case class Staged(finalPath: String, ext: String,
    content: String)

  @transient private lazy val mapper = new ObjectMapper()

  /** utf-8 with latin-1 fallback, like the reference's two-step decode
    * (`embedding_gen.py:1331-1348`).
    */
  private def decode(bytes: Array[Byte]): String =
    try StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
      .decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException =>
      new String(bytes, StandardCharsets.ISO_8859_1)
    }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Validate + stage one file; None = skipped (reference returns
    * `0, [], []` for that file).
    */
  private def stage(path: String, userFolder: java.nio.file.Path,
      maxFileSize: Long): Option[Staged] =
    try {
      val p = Paths.get(path)
      if (!Files.isRegularFile(p)) return None
      val name = p.getFileName.toString
      val dot = name.lastIndexOf('.')
      val ext = if (dot < 0) "" else name.substring(dot).toLowerCase
      if (!DocumentFetch.SupportedExtensions(ext)) return None
      if (Files.size(p) > maxFileSize) return None
      val content = decode(Files.readAllBytes(p))
      if (ext == ".json") {
        // reference requires a dict with "entry" (embedding_gen.py:1334-1341)
        val root = try mapper.readTree(content) catch { case _: Exception => null }
        if (root == null || !root.isObject || !root.has("entry")) return None
      } else if (content.trim.isEmpty) return None // "No data extracted"
      val stem = if (dot < 0) name else name.substring(0, dot)
      val finalPath = userFolder.resolve(
        s"${stem}_${md5hex(content).take(8)}$ext")
      Files.writeString(finalPath, content)
      Some(Staged(finalPath.toString, ext, content))
    } catch { case _: Exception => None }

  /** The endpoint body: Left(reference error string) on request-level
    * failure, Right(result) after a successful commit.
    */
  def ingestFiles(spark: SparkSession, userId: String, paths: Seq[String],
      uploadDir: String, tablePath: String,
      embedder: Embedder = new DeterministicEmbedder(),
      maxFileSize: Long = MaxFileSize): Either[String, UploadResult] = {
    if (!validateUserId(userId)) return Left("Invalid user ID format")
    if (paths.isEmpty) return Left("No files uploaded")
    if (paths.size > MaxFilesPerRequest)
      return Left(s"Too many files uploaded (max $MaxFilesPerRequest)")

    val userFolder = Paths.get(uploadDir, userId)
    Files.createDirectories(userFolder)
    val staged = paths.flatMap(stage(_, userFolder, maxFileSize))
    if (staged.isEmpty) return Left("No valid files were processed")

    import spark.implicits._
    val jsons = staged.filter(_.ext == ".json")
    val texts = staged.filterNot(_.ext == ".json")
    val fhirDocs =
      if (jsons.isEmpty) None
      else Some(FhirBundleParser.parseBundles(
        spark.createDataset(jsons.map(s => (s.finalPath, s.content))), userId))
    val textDocs =
      if (texts.isEmpty) None
      else Some(TextIngest.fromContents(spark,
        texts.map(s => (s.finalPath, s.content,
          if (s.ext == ".md") "markdown" else "text")), userId))
    val parsed = (fhirDocs.toSeq ++ textDocs.toSeq).reduce(_ unionByName _)
    // distinct doc_ids: the upsert collapses same-id rows (two bundles
    // exporting one resource), so a raw row count would overreport
    val nDocs = parsed.select("doc_id").distinct().count()

    IngestCommit.commit(spark, tablePath, parsed, embedder)
    Right(UploadResult(staged.size, nDocs,
      s"Uploaded and indexed ${staged.size} file(s) for user=$userId"))
  }
}
