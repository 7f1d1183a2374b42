package graft.rass.ingest

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S12 — raw-document fetch (reference `retrieve_ehr_document` +
  * `validate_file_path`, `app/main.py:1324-1392`, caller
  * `main.py:2804-2856`): after the Q12 collapse, re-read each matched
  * patient's original files — path-validated under the upload root,
  * .json/.md/.txt only, non-empty, capped at MAX_FILES_PER_PATIENT(5)
  * (`main.py:108`).
  *
  * The collapse and the distinct-file projection run on executors; only
  * the final <=5 small file identities reach the driver for the read —
  * the same driver-side K-file fetch the reference performs.
  */
object DocumentFetch {

  val MaxFilesPerPatient = 5
  val SupportedExtensions = Set(".json", ".md", ".txt")

  final case class FetchedDoc(patientId: String, filePath: String,
      fileType: String, content: String)

  /** Reference `validate_file_path`: resolve under baseDir, must exist,
    * be a file, carry a supported extension, and (read=true) be
    * non-empty utf-8.
    */
  def validatePath(filePath: String, baseDir: Option[String]): Option[Path] =
    try {
      // ingest stores input_file_name() URIs ("file:///…"); accept both
      val fp =
        if (filePath.startsWith("file:")) Paths.get(new java.net.URI(filePath)).toString
        else filePath
      val p0 = baseDir.map(b => Paths.get(b).resolve(
        fp.stripPrefix("/"))).getOrElse(Paths.get(fp))
      val p = p0.toRealPath()
      val ext = {
        val n = p.getFileName.toString
        val i = n.lastIndexOf('.')
        if (i < 0) "" else n.substring(i).toLowerCase
      }
      val inBase = baseDir.forall(b =>
        p.startsWith(Paths.get(b).toRealPath()))
      if (Files.isRegularFile(p) && SupportedExtensions(ext) && inBase) Some(p)
      else None
    } catch { case _: Exception => None }

  /** Collapse hits -> distinct (patientId, file_path, file_type) capped
    * per patient -> driver-side validated read.
    */
  def fetch(collapsedHits: DataFrame, baseDir: Option[String] = None): Seq[FetchedDoc] = {
    val files = collapsedHits
      .select(col("patientId"), col("file_path"), col("file_type"))
      .filter(col("file_path").isNotNull)
      .distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("patientId")).orderBy(col("file_path"))))
      .filter(col("rn") <= MaxFilesPerPatient)
      .drop("rn")
      .collect()
    files.toSeq.flatMap { r =>
      val (pid, fp, ft) = (r.getString(0), r.getString(1), r.getString(2))
      validatePath(fp, baseDir).flatMap { p =>
        try {
          val content = Files.readString(p)
          if (content.trim.isEmpty) None
          else Some(FetchedDoc(pid, fp, ft, content))
        } catch { case _: Exception => None }
      }
    }
  }
}
