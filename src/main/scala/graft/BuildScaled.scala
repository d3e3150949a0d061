package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption, LinkOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Materialize a ScaleBench-style scaled corpus dir at a PERSISTENT
  * path so separate Bench JVMs (32-core and 8-core) can point
  * `SPARK_GRAFT_SF_DIR` at the SAME scaled fixture — the scaling
  * keeper VERDICT r17 item 3 asks for (at sf0.1 the bench is
  * overhead-bound and 8-vs-32-core ratios sit at ≈1 everywhere; the
  * scaled corpus is where parallel work separates from the floor).
  *
  * Usage: graft.BuildScaled <sfDir> <outDir>   (SPARK_GRAFT_SCALE=N)
  * Probe main — off the driver path, writes only under <outDir>.
  */
object BuildScaled {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = Paths.get(args(1))
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = ScaleBench.buildScaledDir(spark, sfDir, factor)
    if (Files.exists(out)) {
      Files.walk(out).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    Files.createDirectories(out)
    copyTree(tmp, out)
    println(s"""{"scaled_dir":"$out","factor":$factor,"src":"$sfDir"}""")
    spark.stop()
  }

  /** Copy `src` into `dst` preserving symlinks (the scaled dir links
    * the untouched fixture tables back to the source dir).
    */
  private def copyTree(src: Path, dst: Path): Unit = {
    Files.walk(src).iterator().asScala.foreach { p =>
      val rel = src.relativize(p)
      val target = dst.resolve(rel.toString)
      if (Files.isSymbolicLink(p))
        Files.createSymbolicLink(target, Files.readSymbolicLink(p))
      else if (Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS))
        Files.createDirectories(target)
      else
        Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
