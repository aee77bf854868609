package graft.io

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Shared fixture for the incremental-merge specs: three doctors_raw.csv
  * batches (batch 1 = the reference file verbatim; batch 2 changes rows
  * 0/1 and adds a doctor; batch 3 changes row 0 again and adds another),
  * plus the closed-partition byte-digest helper both layouts' immutability
  * assertions use.
  */
object DoctorsBatches {

  val rawDir = "/root/reference/hospital_raw_data"

  def writeBatches(): (String, String, String) = {
    val lines = Files.readAllLines(Paths.get(s"$rawDir/doctors_raw.csv")).asScala.toVector
    val header = lines.head
    val body = lines.tail
    def mutate(l: String, idx: Int, v: String) = {
      val c = l.split(",", -1); c(idx) = v; c.mkString(",")
    }
    val b2 = body.zipWithIndex.map {
      case (l, 0) => mutate(l, 3, "Neurology")
      case (l, 1) => mutate(l, 4, "40")
      case (l, _) => l
    } :+ "00000000-0000-0000-0000-00000000beef,New,Doctor,Oncology,7"
    val b3 = b2.zipWithIndex.map {
      case (l, 0) => mutate(l, 3, "Cardiology")
      case (l, _) => l
    } :+ "00000000-0000-0000-0000-00000000cafe,Second,Doctor,Radiology,3"
    def dump(b: Vector[String]) = {
      val d = Files.createTempDirectory("graft_incr_raw").toString
      Files.write(Paths.get(s"$d/doctors_raw.csv"), (header +: b).asJava)
      d
    }
    (rawDir, dump(b2), dump(b3))
  }

  /** MD5 per data file (recursive — the layout nests generation dirs
    * inside each partition dir) in each CLOSED (non-default) end_date
    * partition — the byte-immutability witness. Paths are relative to the
    * table root, so a new generation appearing for an untouched day also
    * fails the comparison.
    */
  def partitionDigests(path: String): Map[String, String] = {
    val root = Paths.get(path)
    Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("end_date=") &&
        !p.getFileName.toString.contains("__HIVE_DEFAULT_PARTITION__"))
      .flatMap(part => Files.walk(part).iterator().asScala)
      .filter(f => Files.isRegularFile(f) &&
        !f.getFileName.toString.startsWith(".") && !f.getFileName.toString.startsWith("_"))
      .map { f =>
        val md = MessageDigest.getInstance("MD5")
        (root.relativize(f).toString,
          md.digest(Files.readAllBytes(f)).map("%02x".format(_)).mkString)
      }.toMap
  }
}
