package graft.io

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cube.{CubeMetadata, CubeSchema}

/** Driver-side staging for the full-table-download path (S1/S5,
  * SURVEY.md §7.4 risk 6): zip archives are not splittable, so members
  * are extracted to a staging directory once, then read distributed.
  */
object Staging {

  /** True iff the file starts with the zip magic (helpers.py:181-187's
    * validity check).
    */
  def isValidZip(path: String): Boolean = {
    val f = new java.io.File(path)
    if (!f.isFile || f.length() < 4) false
    else {
      val in = new FileInputStream(f)
      try {
        val sig = new Array[Byte](4)
        in.read(sig)
        sig(0) == 'P' && sig(1) == 'K' && sig(2) == 3 && sig(3) == 4
      } finally in.close()
    }
  }

  /** Extract every member of `zipPath` into `destDir` (flat; member
    * paths are sanitized against zip-slip). Returns extracted paths.
    */
  def extractZip(zipPath: String, destDir: String): Seq[Path] = {
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    val zin = new ZipInputStream(new BufferedInputStream(new FileInputStream(zipPath)))
    val out = Seq.newBuilder[Path]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val name = Paths.get(e.getName).getFileName.toString
          val target = dest.resolve(name)
          val os = new FileOutputStream(target.toFile)
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = zin.read(buf)
            while (n > 0) { os.write(buf, 0, n); n = zin.read(buf) }
          } finally os.close()
          out += target
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Distributed read of an extracted observation CSV with the
    * product's declared schema (S1: fixed core + dynamic dimension
    * tail, never inferred — dfhandler.py:15-23, main.py:195).
    */
  def readObservations(spark: SparkSession, csvPath: String,
      meta: CubeMetadata): DataFrame =
    spark.read
      .schema(CubeSchema.csvSchema(meta.nonGeoDimensions.map(_.nameEn)))
      .option("header", "true")
      .csv(csvPath)
}
