package graft

import graft.streaming.Retention
import java.io.File
import java.nio.file.{Files, Paths}

/** S11 retention semantics (reference reddit_consumer.py:249-279): cap per
  * dir, delete oldest-by-mtime first, never exceed the cap, leave side files
  * alone. */
class RetentionSpec extends SparkSpec {

  private def mk(dir: String, name: String, bytes: Int, mtime: Long): File = {
    val f = Paths.get(dir, name).toFile
    Files.write(f.toPath, Array.fill[Byte](bytes)(42))
    f.setLastModified(mtime)
    f
  }

  test("deletes oldest-first until under the cap") {
    val dir = Files.createTempDirectory("graft-retention").toString
    val t0 = 1700000000000L
    mk(dir, "old.parquet", 500, t0)
    mk(dir, "mid.parquet", 500, t0 + 1000)
    mk(dir, "new.parquet", 500, t0 + 2000)
    val deleted = Retention.enforce(dir, 1100)
    assert(deleted === Seq("old.parquet"))
    assert(Retention.dataFiles(dir).map(_.getPath.getName).sorted ===
      Seq("mid.parquet", "new.parquet"))
    // idempotent once under the cap
    assert(Retention.enforce(dir, 1100) === Seq.empty)
  }

  test("ignores non-parquet side files for accounting and deletion") {
    val dir = Files.createTempDirectory("graft-retention2").toString
    val t0 = 1700000000000L
    mk(dir, "_SUCCESS", 10, t0 - 5000)
    mk(dir, "a.parquet", 800, t0)
    mk(dir, "b.parquet", 800, t0 + 1000)
    val deleted = Retention.enforce(dir, 1000)
    assert(deleted === Seq("a.parquet"))
    assert(Paths.get(dir, "_SUCCESS").toFile.exists())
  }

  test("never exceeds cap even when all files must go") {
    val dir = Files.createTempDirectory("graft-retention3").toString
    val t0 = 1700000000000L
    mk(dir, "a.parquet", 700, t0)
    mk(dir, "b.parquet", 700, t0 + 1)
    assert(Retention.enforce(dir, 100) === Seq("a.parquet", "b.parquet"))
    assert(Retention.dataFiles(dir).isEmpty)
  }
}
