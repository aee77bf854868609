package graft

import java.io.RandomAccessFile
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-dependent session sizing added in round 12: AQE's
  * initialPartitionNum grows ~1/64 MB of on-disk input, floored at the
  * core count (so ≤ sf10 sessions stay bit-identical to rounds 1–11)
  * and capped at 1024. Sparse files keep the "19 GB input" cases cheap:
  * `Files.size` reports logical length, which is all initialParts reads.
  */
class SessionsSpec extends AnyFunSuite {

  private def dirWithSparse(sizes: Long*): String = {
    val dir = Files.createTempDirectory("sessions-spec").toFile
    dir.deleteOnExit()
    sizes.zipWithIndex.foreach { case (sz, i) =>
      val f = new java.io.File(dir, s"part-$i.parquet")
      f.deleteOnExit()
      val raf = new RandomAccessFile(f, "rw")
      try raf.setLength(sz)
      finally raf.close()
    }
    dir.getAbsolutePath
  }

  test("small input floors at the core count (sf<=10 regime unchanged)") {
    // 1.8 GB ≈ sf10: 28 initial parts by the byte rule, floored to 32.
    assert(Sessions.initialParts(dirWithSparse(1800L << 20), 32) === 32)
    assert(Sessions.initialParts(dirWithSparse(10L << 20), 32) === 32)
  }

  test("big input scales ~1 part per 64 MB and sums nested files") {
    // 19 GB ≈ sf100 split across files: 19456 MB / 64 = 304.
    val dir = dirWithSparse(10240L << 20, 9216L << 20)
    assert(Sessions.initialParts(dir, 32) === 304)
  }

  test("cap at 1024 and floor at cpus; missing dir falls back to cpus") {
    assert(Sessions.initialParts(dirWithSparse(100L << 30), 32) === 1024)
    assert(Sessions.initialParts("/no/such/dir-sessions-spec", 48) === 48)
  }
}
