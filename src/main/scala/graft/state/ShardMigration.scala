package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Batch analog of the S9 shard-migration RPC surface
  * (src/shardkv1/shardgrp/shardrpc/shardrpc.go:8-36): the reference moves a
  * shard between replica groups with FreezeShard (owner stops serving and
  * exports the shard's state), InstallShard (the new owner imports it), and
  * DeleteShard (the old owner drops it). On an engine whose state lives in
  * partitioned tables the same protocol is three relational operations over
  * a keyed store `(key, ...payload)`:
  *
  *  - freeze  = filter the shard's rows out by the S6 routing hash — an
  *    immutable exported snapshot (batch frames are frozen by construction;
  *    the serving cutover is the config bump, as in the reference);
  *  - install = union the snapshot into the new owner's store;
  *  - delete  = the complement filter on the old owner (the degenerate
  *    anti-join — the shard predicate IS the join key).
  *
  * [[migrate]] drives the full protocol for every shard an old→new config
  * transition reassigns, which is exactly what the reference's controller
  * does per ChangeConfigTo (src/shardkv1/shardctrler/shardctrler.go).
  * ShardConfigSpec proves no key is lost or duplicated across a Join/Leave
  * rebalance and that afterwards every group holds precisely its shards.
  */
object ShardMigration {
  private def shardOf(nShards: Int): Column =
    Hashing.key2shard(col("key"), nShards)

  /** FreezeShard: export shard `shard`'s rows from a group store. */
  def freeze(store: DataFrame, shard: Int,
      nShards: Int = ShardConfig.NShards): DataFrame =
    store.filter(shardOf(nShards) === shard)

  /** InstallShard: import a frozen shard snapshot into a group store. */
  def install(store: DataFrame, frozen: DataFrame): DataFrame =
    store.unionByName(frozen)

  /** DeleteShard: drop shard `shard`'s rows from a group store. */
  def delete(store: DataFrame, shard: Int,
      nShards: Int = ShardConfig.NShards): DataFrame =
    store.filter(shardOf(nShards) =!= shard)

  /** Freeze/install/delete every shard whose owner changed between two
    * configs. `stores` maps gid → that group's keyed store; a group new in
    * `newCfg` may be absent (it starts from the installed snapshots).
    */
  def migrate(stores: Map[String, DataFrame], oldCfg: ShardConfig,
      newCfg: ShardConfig): Map[String, DataFrame] =
    (0 until ShardConfig.NShards).foldLeft(stores) { (st, s) =>
      val (from, to) = (oldCfg.shards(s), newCfg.shards(s))
      if (from == to || from == ShardConfig.NoGroup ||
          to == ShardConfig.NoGroup) st
      else {
        val frozen = freeze(st(from), s)
        val installed = st.get(to).map(install(_, frozen)).getOrElse(frozen)
        st.updated(to, installed).updated(from, delete(st(from), s))
      }
    }
}
