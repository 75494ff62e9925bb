package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.state._

/** S10 controller: codec roundtrip, the init → change → query lifecycle,
  * and the supersession contract — concurrent controllers racing
  * ChangeConfigTo are serialized by the CAS version check (exactly one
  * winner per config version, reference shardctrler.go:49-56).
  */
class ShardCtrlerSpec extends AnyFunSuite {

  test("codec roundtrips configs including empty groups and orphan shards") {
    val cases = Seq(
      ShardConfig.empty,
      ShardConfig.initial("g1", Seq("s1", "s2")),
      ShardConfig.initial("g1", Seq("s1"))
        .join(Map("g2" -> Seq("s2a", "s2b"), "g3" -> Seq.empty)),
      ShardConfig.initial("g1", Seq("s1")).leave(Seq("g1")),
      // Delimiter characters in gids/servers must round-trip (escaped).
      ShardConfig.initial("g|1,x=y", Seq("host:1234,host:5678", "a;b%c")))
    cases.foreach { c =>
      assert(ShardCtrlerCodec.unmarshal(ShardCtrlerCodec.marshal(c)) == c,
        ShardCtrlerCodec.marshal(c))
    }
  }

  test("init/changeConfigTo/query lifecycle") {
    val sck = new ShardCtrler(new ConfigStore)
    assert(sck.query().isEmpty)
    assert(!sck.changeConfigTo(ShardConfig.initial("g9", Seq("x"))),
      "change before init must fail")
    assert(sck.initConfig(ShardConfig.initial("g1", Seq("s1"))))
    assert(!sck.initConfig(ShardConfig.initial("g1", Seq("s1"))),
      "second init must lose the version-0 CAS")
    val c1 = sck.query().get
    assert(c1.num == 1L && c1.groups.keySet == Set("g1"))
    assert(sck.changeConfigTo(c1.join(Map("g2" -> Seq("s2")))))
    val c2 = sck.query().get
    assert(c2.num == 2L && c2.groups.keySet == Set("g1", "g2"))
    // Rebalanced: spread at most 1 over the 12 shards.
    val loads = c2.shards.groupBy(identity).view.mapValues(_.size).values
    assert(loads.max - loads.min <= 1)
  }

  test("racing controllers: CAS admits exactly one winner per version") {
    val store = new ConfigStore
    assert(new ShardCtrler(store).initConfig(ShardConfig.initial("g0", Seq("s0"))))
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        // One clerk per racing controller, as in the reference's model.
        val sck = new ShardCtrler(store)
        var won = false
        while (!won) {
          val cur = sck.query().get
          // Each controller wants its own group added; recompute from the
          // freshest config after every lost race.
          won = sck.changeConfigTo(cur.join(Map(s"g$i" -> Seq(s"srv$i"))))
          if (won) wins.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val fin = new ShardCtrler(store).query().get
    assert(wins.get() == 8)
    // Every join landed exactly once: 8 bumps over the initial num=1.
    assert(fin.num == 9L, s"lost or duplicated a CAS win: $fin")
    assert(fin.groups.keySet == (0 to 8).map(i => s"g$i").toSet)
    val loads = fin.shards.groupBy(identity).view.mapValues(_.size).values
    assert(loads.max - loads.min <= 1)
  }
}
