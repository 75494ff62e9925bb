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

  test("S9 batch migration: freeze/install/delete across a Join/Leave rebalance") {
    import graft.state.ShardMigration
    val spark = SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col

    val allKeys = (0 until 100).map(i => (s"k$i", s"v$i"))
    def contents(m: Map[String, org.apache.spark.sql.DataFrame]) =
      m.view.mapValues(_.as[(String, String)].collect().toSet).toMap

    // g1 owns everything; g2 joins -> ~half the shards move to g2.
    val c1 = ShardConfig.initial("g1", Seq("s1"))
    val c2 = c1.join(Map("g2" -> Seq("s2")))
    val st1 = Map("g1" -> allKeys.toDF("key", "value"))
    val st2 = contents(ShardMigration.migrate(st1, c1, c2))
    // No key lost or duplicated, and each group holds exactly its shards.
    assert(st2.values.map(_.size).sum == allKeys.size)
    for ((gid, rows) <- st2; (k, _) <- rows)
      assert(c2.shards(ShardConfig.key2shard(k)) == gid,
        s"$k landed on $gid, config says ${c2.shards(ShardConfig.key2shard(k))}")
    assert(st2("g2").nonEmpty, "rebalance moved no shards — test is vacuous")

    // g1 leaves -> everything migrates back onto g2.
    val c3 = c2.leave(Seq("g1"))
    val dfs2 = st2.view.mapValues(_.toSeq.toDF("key", "value")).toMap
    val st3 = contents(ShardMigration.migrate(dfs2, c2, c3))
    assert(st3("g2") == allKeys.toSet)
    assert(st3("g1").isEmpty)

    // The three RPC analogs compose: freeze+delete partition a store.
    val g1 = dfs2("g1")
    val shard = ShardConfig.key2shard(st2("g1").head._1)
    val frozen = ShardMigration.freeze(g1, shard)
    val rest = ShardMigration.delete(g1, shard)
    assert(frozen.count() + rest.count() == g1.count())
    assert(frozen.join(rest, Seq("key"), "inner").count() == 0)
  }
}
