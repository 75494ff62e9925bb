package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The temp-table registry the src_* queries stage through: create
  * registers, drain (what the JVM shutdown hook runs) deletes whole
  * trees and is idempotent. Suites run sequentially in the forked test
  * JVM, so draining here only sweeps prior suites' finished tables.
  */
class TempDirsSpec extends AnyFunSuite {
  test("create registers; drain deletes non-empty trees; re-drain is a " +
      "no-op; create works again after a drain") {
    val a = Paths.get(TempDirs.create("graft_tmpdirs_a"))
    val b = Paths.get(TempDirs.create("graft_tmpdirs_b"))
    Files.createDirectories(a.resolve("data/sub"))
    Files.writeString(a.resolve("data/sub/f.parquet"), "x")
    Files.writeString(b.resolve("m.json"), "{}")
    assert(Files.exists(a) && Files.exists(b))

    TempDirs.drain()
    assert(!Files.exists(a), "drain left a registered tree")
    assert(!Files.exists(b), "drain left a registered tree")
    TempDirs.drain() // nothing registered — must not throw

    val c = Paths.get(TempDirs.create("graft_tmpdirs_c"))
    assert(Files.exists(c))
    TempDirs.drain()
    assert(!Files.exists(c))
  }
}
