package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.state._

/** Executable contract of the S5 RSM layer (src/kvraft1/rsm/rsm.go:30-34):
  * exactly-once apply under re-submitted committed entries, and the
  * snapshot compaction law — restore(snapshot(prefix)) + suffix replay must
  * equal full replay at EVERY cut point, byte-level codec included. All
  * pure-Scala (no SparkSession): the distributed face is the oracled
  * `rsm_submit_replay` query.
  */
class RsmSpec extends AnyFunSuite {
  type Img = KvRsmSnapshot.Img

  /** Seeded interleaved multi-client log: `nClients` sequential clients,
    * each writing its own key with CAS version = its op rank; entries get
    * global log indexes in a seeded shuffle order that preserves each
    * client's own sequence (a client is sequential; clients interleave).
    */
  private def cleanLog(nClients: Int, opsPer: Int, seed: Long)
      : Vector[RsmEntry[KvOp]] = {
    val rnd = new Random(seed)
    val perClient = (0 until nClients).map { c =>
      (0 until opsPer).map { i =>
        (c.toLong, i.toLong, KvOp(s"k$c", s"v$c-$i", version = i.toLong))
      }
    }
    // Interleave: repeatedly pick a random client with ops remaining.
    val cursors = Array.fill(nClients)(0)
    val out = Vector.newBuilder[RsmEntry[KvOp]]
    var index = 0L
    var remaining = nClients * opsPer
    while (remaining > 0) {
      val live = (0 until nClients).filter(c => cursors(c) < opsPer)
      val c = live(rnd.nextInt(live.size))
      val (client, seq, op) = perClient(c)(cursors(c))
      out += RsmEntry(index, client, seq, op)
      cursors(c) += 1
      index += 1
      remaining -= 1
    }
    out.result()
  }

  /** Inject a re-send of every `every`-th entry right after it (the
    * leader-change double-commit shape), re-numbering indexes.
    */
  private def withResends(log: Vector[RsmEntry[KvOp]], every: Int)
      : Vector[RsmEntry[KvOp]] =
    log.zipWithIndex.flatMap { case (e, i) =>
      if (i % every == 0) Seq(e, e) else Seq(e)
    }.zipWithIndex.map { case (e, i) => e.copy(index = i.toLong) }

  test("clean replay equals the naive sequential interpreter") {
    val log = cleanLog(nClients = 7, opsPer = 13, seed = 41L)
    val img = Rsm.replay(KvRsmMachine, Rsm.start(KvRsmMachine), log.iterator)
    // Naive interpreter: apply each op with KvStateMachine.step directly.
    var naive = Map.empty[String, KvCell]
    log.foreach { e =>
      val (c2, err) = KvStateMachine.step(naive.get(e.op.key), e.op)
      assert(err == KvTypes.OK, s"clean log op rejected: $e -> $err")
      c2.foreach(c => naive = naive.updated(e.op.key, c))
    }
    assert(img.state == naive)
    assert(img.nApplied == log.size.toLong && img.nSuppressed == 0L)
  }

  test("re-submitted committed entries are suppressed and answered from cache") {
    val clean = cleanLog(nClients = 5, opsPer = 11, seed = 97L)
    val dirty = withResends(clean, every = 4)
    val cleanImg = Rsm.replay(KvRsmMachine, Rsm.start(KvRsmMachine),
      clean.iterator)
    // Walk the dirty log entry by entry, checking each duplicate's answer.
    var img: Img = Rsm.start(KvRsmMachine)
    var lastResult = Map.empty[Long, (String, Long)]
    dirty.foreach { e =>
      val (next, res, dup) = Rsm.applyEntry(KvRsmMachine, img, e)
      if (dup)
        assert(res == lastResult(e.clientId),
          s"duplicate of ${e.clientId}/${e.seq} not answered from cache")
      else lastResult = lastResult.updated(e.clientId, res)
      img = next
    }
    assert(img.state == cleanImg.state,
      "re-applied duplicates corrupted the state")
    assert(img.nApplied == clean.size.toLong)
    assert(img.nSuppressed == (dirty.size - clean.size).toLong)
  }

  test("a stale duplicate (seq below the session high-water mark) is suppressed") {
    val img0: Img = Rsm.start(KvRsmMachine)
    val e0 = RsmEntry(0L, 1L, 0L, KvOp("k1", "a", 0L))
    val e1 = RsmEntry(1L, 1L, 1L, KvOp("k1", "b", 1L))
    val img2 = Rsm.replay(KvRsmMachine, img0, Iterator(e0, e1))
    val (img3, _, dup) = Rsm.applyEntry(KvRsmMachine, img2, e0)
    assert(dup && img3.state == img2.state && img3.nSuppressed == 1L)
  }

  test("snapshot + suffix replay equals full replay at every cut point") {
    val log = withResends(cleanLog(nClients = 4, opsPer = 6, seed = 7L),
      every = 5)
    val full = Rsm.replay(KvRsmMachine, Rsm.start(KvRsmMachine), log.iterator)
    val fullBytes = KvRsmSnapshot.encode(full)
    for (k <- 0 to log.size) {
      val prefix = Rsm.replay(KvRsmMachine, Rsm.start(KvRsmMachine),
        log.take(k).iterator)
      val restored = KvRsmSnapshot.decode(KvRsmSnapshot.encode(prefix))
      assert(restored == prefix, s"codec roundtrip broke at cut $k")
      val resumed = Rsm.replay(KvRsmMachine, restored, log.drop(k).iterator)
      assert(KvRsmSnapshot.encode(resumed).sameElements(fullBytes),
        s"snapshot at $k + suffix replay != full replay")
    }
  }

  test("equal images encode to equal bytes regardless of construction order") {
    val log = cleanLog(nClients = 6, opsPer = 5, seed = 3L)
    val a = Rsm.replay(KvRsmMachine, Rsm.start(KvRsmMachine), log.iterator)
    // Same per-client sequences, different interleaving: the final image is
    // NOT generally order-independent across clients touching shared keys,
    // but here each client owns its key, so any client-sequence-preserving
    // order must converge to the same state and the same bytes.
    val reordered = log.sortBy(e => (e.clientId, e.seq))
      .zipWithIndex.map { case (e, i) => e.copy(index = i.toLong) }
    val b = Rsm.replay(KvRsmMachine, Rsm.start(KvRsmMachine),
      reordered.iterator)
    // Each client owns its key, so sessions and state both converge too:
    // full image equality, hence byte equality.
    assert(a == b)
    assert(KvRsmSnapshot.encode(a).sameElements(KvRsmSnapshot.encode(b)))
  }
}
