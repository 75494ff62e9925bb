package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.state._

/** Porcupine-style linearizability checking of concurrent KV histories —
  * the round-1 gap vs the reference's kvtest harness
  * (src/kvtest1/porcupine.go:50-83 runs porcupine over client histories;
  * src/models1/kv.go:26-80 is the (value, version) model;
  * src/kvsrv1/client.go:37-53 is the retry rule that creates ErrMaybe).
  *
  * N real threads race versioned CAS puts through a lossy "network" (seeded
  * request/response drops → retries → ErrMaybe ambiguity) against a server
  * that serializes KvStateMachine.step per key — the same serialization
  * point the Spark faces provide (per-key mapGroups fold / GroupState
  * cell). Each client op records its wall-clock [invoke, return] window and
  * client-visible result only; a WGL-search checker then proves a
  * linearization exists: a total order respecting real-time precedence in
  * which every result matches the model, with an ErrMaybe put allowed to
  * have either applied (as a lost-response OK) or not applied at all.
  *
  * The bridge assertion closes the loop to the Spark operator: replaying
  * the server's executed-attempt log through KvBatch.replay reproduces the
  * exact final (value, version) and applied/rejected counts — the
  * distributed fold and the live concurrent server are the same machine.
  */
class KvLinearizabilitySpec extends AnyFunSuite {
  import KvTypes._

  /** One client-visible completed operation. For puts, (value, version)
    * are the arguments; for gets, (gotValue, gotVersion) are the reply.
    */
  private case class Rec(key: String, isPut: Boolean,
      value: String, version: Long,
      err: String, gotValue: String, gotVersion: Long,
      start: Long, end: Long)

  /** Atomic per-key step application + executed-attempt log (for the
    * KvBatch bridge). The lock is the linearization point, standing in for
    * the per-key GroupState cell.
    */
  private final class Server {
    val cells = scala.collection.mutable.Map[String, KvCell]()
    val executed = scala.collection.mutable.ArrayBuffer[(KvOp, String)]()

    def putAttempt(key: String, value: String, version: Long): String =
      synchronized {
        val (next, err) = KvStateMachine.step(cells.get(key),
          KvOp(key, value, version))
        next.foreach(cells(key) = _)
        executed += ((KvOp(key, value, version, retried = false,
          seq = executed.size.toLong), err))
        err
      }

    def get(key: String): (String, String, Long) = synchronized {
      cells.get(key) match {
        case Some(KvCell(v, ver)) => (OK, v, ver)
        case None                 => (ErrNoKey, "", 0L)
      }
    }
  }

  /** The reference client's at-most-once retry rule: drop a request before
    * it executes (retry may then succeed) or a response after it executed
    * (retry sees ErrVersion → surfaced as ErrMaybe).
    */
  private def lossyPut(server: Server, rnd: scala.util.Random,
      key: String, value: String, version: Long): String = {
    var retried = false
    while (true) {
      val requestLost = rnd.nextDouble() < 0.2
      val err = if (requestLost) None
        else Some(server.putAttempt(key, value, version))
      val responseLost = rnd.nextDouble() < 0.2
      err match {
        case Some(e) if !responseLost =>
          return if (retried && e == ErrVersion) ErrMaybe else e
        case _ => retried = true
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** WGL linearizability search over one key's history with memoization on
    * (linearized-set, model state). Candidates at each step are the
    * remaining ops not real-time-preceded by another remaining op.
    */
  private def linearizable(ops: Vector[Rec]): Boolean = {
    require(ops.size <= 62, s"mask overflow: ${ops.size}")
    val n = ops.size
    val full = (1L << n) - 1
    val seen = scala.collection.mutable.HashSet[(Long, Option[KvCell])]()

    def fits(cell: Option[KvCell], op: Rec): Seq[Option[KvCell]] =
      if (op.isPut) {
        val (next, err) = KvStateMachine.step(cell,
          KvOp(op.key, op.value, op.version))
        op.err match {
          case ErrMaybe =>
            // Either it applied (a lost-response OK) or it never executed.
            (if (err == OK) Seq(next) else Nil) :+ cell
          case e => if (err == e) Seq(next) else Nil
        }
      } else {
        cell match {
          case Some(KvCell(v, ver)) =>
            if (op.err == OK && op.gotValue == v && op.gotVersion == ver)
              Seq(cell)
            else Nil
          case None =>
            if (op.err == ErrNoKey) Seq(cell) else Nil
        }
      }

    def search(mask: Long, cell: Option[KvCell]): Boolean = {
      if (mask == full) return true
      if (!seen.add((mask, cell))) return false
      val remaining = (0 until n).filter(i => (mask & (1L << i)) == 0)
      val candidates = remaining.filter(i =>
        !remaining.exists(j => j != i && ops(j).end < ops(i).start))
      candidates.exists(i =>
        fits(cell, ops(i)).exists(next => search(mask | (1L << i), next)))
    }
    search(0L, None)
  }

  /** One seeded concurrent run; returns (history, server). */
  private def runHistory(seed: Int, nThreads: Int = 4, opsPerThread: Int = 12,
      keys: Seq[String] = Seq("k0", "k1")): (Vector[Rec], Server) = {
    val server = new Server
    val recs = scala.collection.mutable.ArrayBuffer[Rec]()
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        val rnd = new scala.util.Random(seed * 1000L + t)
        (0 until opsPerThread).foreach { i =>
          val key = keys(rnd.nextInt(keys.size))
          val start = System.nanoTime()
          val rec = if (rnd.nextDouble() < 0.35) {
            val (err, v, ver) = server.get(key)
            Rec(key, isPut = false, "", 0L, err, v, ver,
              start, System.nanoTime())
          } else {
            // Mostly read-modify-write CAS on the live version; sometimes a
            // deliberately stale/blind version to exercise ErrVersion.
            val ver = if (rnd.nextDouble() < 0.75) server.get(key)._3
              else rnd.nextInt(3).toLong
            val value = s"t$t-i$i"
            val err = lossyPut(server, rnd, key, value, ver)
            Rec(key, isPut = true, value, ver, err, "", 0L,
              start, System.nanoTime())
          }
          recs.synchronized { recs += rec }
          if (rnd.nextDouble() < 0.3) Thread.`yield`()
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    (recs.toVector, server)
  }

  test("100 seeded concurrent histories linearize against the model") {
    var maybes = 0
    // stress.sh offsets the seed window per trial — 100 fresh schedules
    // every run of the repeat-suite loop.
    val base = SparkTestBase.stressSeed * 100
    (base + 1 to base + 100).foreach { seed =>
      val (recs, _) = runHistory(seed)
      maybes += recs.count(_.err == ErrMaybe)
      recs.groupBy(_.key).foreach { case (key, ops) =>
        assert(linearizable(ops), s"seed=$seed key=$key not linearizable:\n" +
          ops.sortBy(_.start).mkString("\n"))
      }
    }
    info(s"100 histories linearizable ($maybes ErrMaybe ambiguities exercised)")
    assert(maybes > 0, "drops never produced ErrMaybe — lossy path untested")
  }

  test("checker rejects corrupted histories (it has teeth)") {
    // A read observing a value that was never the cell's content.
    val bad = Vector(
      Rec("k", isPut = true, "a", 0L, OK, "", 0L, 0L, 10L),
      Rec("k", isPut = false, "", 0L, OK, "phantom", 1L, 20L, 30L))
    assert(!linearizable(bad))
    // A version that skips ahead.
    val bad2 = Vector(
      Rec("k", isPut = true, "a", 0L, OK, "", 0L, 0L, 10L),
      Rec("k", isPut = false, "", 0L, OK, "a", 7L, 20L, 30L))
    assert(!linearizable(bad2))
    // An OK put against a version that can never match.
    val bad3 = Vector(
      Rec("k", isPut = true, "a", 5L, OK, "", 0L, 0L, 10L))
    assert(!linearizable(bad3))
  }

  test("concurrent history replays identically through KvBatch (Spark bridge)") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val (_, server) = runHistory(seed = 7, nThreads = 4, opsPerThread = 15)
    val log = server.executed.toVector
    val results = KvBatch
      .replay(spark, spark.createDataset(log.map(_._1)))
      .collect().map(r => r.key -> r).toMap
    log.groupBy(_._1.key).foreach { case (key, attempts) =>
      val want = server.cells(key)
      val got = results(key)
      assert(got.value == want.value && got.version == want.version,
        s"$key: batch=(${got.value},${got.version}) live=$want")
      assert(got.nApplied == attempts.count(_._2 == OK))
      assert(got.nRejected == attempts.count(_._2 != OK))
    }
  }
}
