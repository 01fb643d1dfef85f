package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame

/** Staged-file plumbing for the multi-batch streaming gates: write a
  * DataFrame as the seq-th single-parquet source file of a streamed
  * directory with a forced strictly-increasing mtime —
  * FileStreamSource orders files by modification time, so synthetic
  * mtimes make micro-batch arrival order deterministic. ONE copy of
  * the pattern (previously repeated across the pipeline, relational
  * and graph-stream gates). */
object StageFiles {

  /** Write `df` as `src/<seq>%02d.parquet` (single part, moved out of
    * the scratch dir `base/stage<seq>`) with mtime 1000000·seq ms. */
  def stageTimedParquet(df: DataFrame, base: String, src: String,
                        seq: Int): Unit = {
    val tmp = s"$base/stage$seq"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Paths.get(tmp).toFile.listFiles
      .find(_.getName.endsWith(".parquet")).get.toPath
    val dest = Paths.get(src, f"$seq%02d.parquet")
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000L * seq))
    ()
  }
}
