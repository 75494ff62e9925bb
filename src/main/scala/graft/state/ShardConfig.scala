package graft.state

import graft.engine.Fnv1a

/** The shard-map configuration layer (SURVEY.md §2.3 S6–S8), implemented to
  * the reference's specified behavior (src/shardkv1/shardcfg/shardcfg.go):
  * 12 static shards routed by FNV-1a, assigned to replica groups, with a
  * deterministic rebalance that moves shards from the most- to the
  * least-loaded group until `max <= min + 1`.
  *
  * Pure config logic — the engine-level analog is partitioning, and Spark's
  * shuffle already moves data when assignments change; this module exists so
  * a user of the reference's controller surface (InitConfig/Join/Leave/
  * Rebalance) has the same operations here.
  */
case class ShardConfig(num: Long, shards: Vector[String],
    groups: Map[String, Seq[String]]) {

  def shardForKey(key: String): Int = ShardConfig.key2shard(key)

  def groupForKey(key: String): Option[String] = {
    val g = shards(shardForKey(key))
    if (g == ShardConfig.NoGroup) None else Some(g)
  }

  /** Deterministic rebalance (spec: shardcfg.go:122-154): repeatedly move
    * one shard from the most-loaded to the least-loaded group (ties broken
    * by sorted group id — the reference's deterministic group ordering)
    * until the spread is at most 1. Unassigned shards go first.
    */
  def rebalance(): ShardConfig = {
    if (groups.isEmpty)
      return copy(shards = Vector.fill(ShardConfig.NShards)(ShardConfig.NoGroup))
    val gids = groups.keys.toSeq.sorted
    var s = shards.map(g => if (groups.contains(g)) g else ShardConfig.NoGroup)
    // Assign orphans to the least-loaded group.
    def load(v: Vector[String], g: String) = v.count(_ == g)
    for (i <- s.indices if s(i) == ShardConfig.NoGroup)
      s = s.updated(i, gids.minBy(g => load(s, g)))
    // Level until max <= min + 1. min/maxBy over the SORTED gid list keep
    // the FIRST extremum on ties — the reference's strict-comparison sweep
    // over sorted gids picks the smallest gid the same way
    // (shardcfg.go:80-111 analyze + :122-154 rebalance).
    var done = false
    while (!done) {
      val most = gids.maxBy(g => load(s, g))
      val least = gids.minBy(g => load(s, g))
      if (load(s, most) > load(s, least) + 1) {
        s = s.updated(s.indexOf(most), least)
      } else done = true
    }
    copy(shards = s)
  }

  /** S8 Join: add replica groups, bump the config number, rebalance.
    * Re-joining an existing gid is rejected (config unchanged) — the
    * reference's Join returns false there (shardcfg.go:156-187).
    */
  def join(newGroups: Map[String, Seq[String]]): ShardConfig =
    if (newGroups.keys.exists(groups.contains)) this
    else copy(num = num + 1, groups = groups ++ newGroups).rebalance()

  /** S8 Leave: remove groups (their shards get reassigned), bump,
    * rebalance. Leaving only unknown gids is a no-op (no bump).
    */
  def leave(gids: Seq[String]): ShardConfig =
    if (!gids.exists(groups.contains)) this
    else copy(num = num + 1, groups = groups -- gids).rebalance()
}

object ShardConfig {
  /** NShards = 12 (src/shardkv1/shardcfg/shardcfg.go:17-19). */
  final val NShards = 12
  final val NoGroup = ""

  /** Key2Shard = FNV-1a-32(key) mod NShards (shardcfg.go:29-34). */
  def key2shard(key: String): Int = Fnv1a.key2Shard(key, NShards)

  def initial(gid: String, servers: Seq[String]): ShardConfig =
    ShardConfig(1L, Vector.fill(NShards)(gid), Map(gid -> servers))

  def empty: ShardConfig =
    ShardConfig(0L, Vector.fill(NShards)(NoGroup), Map.empty)
}
