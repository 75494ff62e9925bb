package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.state.ShardConfig

/** Rebalance/Join/Leave to the reference's specified behavior
  * (src/shardkv1/shardcfg/shardcfg.go:122-221): balanced spread, minimal
  * movement direction (most→least), deterministic under sorted group order.
  */
class ShardConfigSpec extends AnyFunSuite {

  private def loads(c: ShardConfig): Map[String, Int] =
    c.groups.keys.map(g => g -> c.shards.count(_ == g)).toMap

  test("initial config owns all shards; join levels to max<=min+1") {
    val c1 = ShardConfig.initial("g1", Seq("s1"))
    assert(c1.shards.forall(_ == "g1"))
    val c2 = c1.join(Map("g2" -> Seq("s2")))
    val l2 = loads(c2)
    assert(l2("g1") + l2("g2") == ShardConfig.NShards)
    assert(math.abs(l2("g1") - l2("g2")) <= 1)
    assert(c2.num == 2)
  }

  test("three-way join and leave keep balance and full coverage") {
    val c = ShardConfig.initial("g1", Seq("a"))
      .join(Map("g2" -> Seq("b")))
      .join(Map("g3" -> Seq("c")))
    val l = loads(c)
    assert(l.values.sum == 12 && l.values.max - l.values.min <= 1)
    val afterLeave = c.leave(Seq("g1"))
    val l2 = loads(afterLeave)
    assert(!afterLeave.shards.contains("g1"))
    assert(l2.values.sum == 12 && l2.values.max - l2.values.min <= 1)
  }

  test("leave of all groups unassigns every shard") {
    val c = ShardConfig.initial("g1", Seq("a")).leave(Seq("g1"))
    assert(c.shards.forall(_ == ShardConfig.NoGroup))
    assert(c.groupForKey("anything").isEmpty)
  }

  test("rebalance is deterministic (same input -> same assignment)") {
    val base = ShardConfig.initial("g1", Seq("a"))
      .join(Map("g2" -> Seq("b"), "g3" -> Seq("c"), "g4" -> Seq("d"), "g5" -> Seq("e")))
    val again = ShardConfig.initial("g1", Seq("a"))
      .join(Map("g2" -> Seq("b"), "g3" -> Seq("c"), "g4" -> Seq("d"), "g5" -> Seq("e")))
    assert(base.shards == again.shards)
    val l = loads(base)
    assert(l.values.max - l.values.min <= 1) // 12 over 5 -> 3,3,2,2,2
  }

  test("re-join of an existing gid and leave of unknown gids are rejected") {
    val c = ShardConfig.initial("g1", Seq("a")).join(Map("g2" -> Seq("b")))
    assert(c.join(Map("g2" -> Seq("other"))) == c) // re-join rejected
    assert(c.leave(Seq("nope")) == c)              // unknown leave: no bump
  }

  test("most-loaded tie breaks toward the smallest gid (reference order)") {
    // g1 and g2 both hold 5 after a leave; the next move must come from g1.
    val c = ShardConfig(1L,
      Vector("g1", "g1", "g1", "g1", "g1", "g2", "g2", "g2", "g2", "g2",
        "g3", "g3"),
      Map("g1" -> Seq("a"), "g2" -> Seq("b"), "g3" -> Seq("c"), "g4" -> Seq("d")))
    val r = c.rebalance()
    val l = r.groups.keys.map(g => g -> r.shards.count(_ == g)).toMap
    assert(l.values.max - l.values.min <= 1)
    // g1 (smallest max-loaded gid) lost a shard before g2 did.
    assert(r.shards.count(_ == "g1") <= r.shards.count(_ == "g2"))
  }

  test("key routing matches the FNV shard function") {
    val c = ShardConfig.initial("g1", Seq("a")).join(Map("g2" -> Seq("b")))
    for (k <- Seq("a", "key7", "xyzzy")) {
      assert(c.groupForKey(k).contains(c.shards(ShardConfig.key2shard(k))))
    }
  }
}
