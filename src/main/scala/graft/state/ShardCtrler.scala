package graft.state

/** S10: the shard controller (SURVEY.md §2.3), completing the declared
  * spec surface. The reference's contract
  * (src/shardkv1/shardctrler/shardctrler.go:38-63) stores the marshalled
  * configuration as ONE CAS-guarded cell in the S1/S2 versioned KV:
  * InitConfig puts it at version 0, ChangeConfigTo CAS-replaces the config
  * the controller LAST READ — a controller superseded by a concurrent one
  * loses the version check and gives up — and Query reads + unmarshals.
  * Config-as-table: at engine scale the same cell is a one-row config
  * table consulted by the FNV router (S6); every transition goes through
  * the same [[KvStateMachine.step]] the KV operators use.
  */
object ShardCtrlerCodec {
  /** Percent-escapes the codec's delimiter characters so gids/servers
    * containing them (e.g. `host:1234,host:5678`) round-trip instead of
    * corrupting the config (the reference avoids this with JSON,
    * shardcfg.go:51-65; this codec stays line-oriented but safe).
    */
  private def esc(s: String): String = s
    .replace("%", "%25").replace("|", "%7C").replace(",", "%2C")
    .replace("=", "%3D").replace(";", "%3B")

  private def unesc(s: String): String = s
    .replace("%3B", ";").replace("%3D", "=").replace("%2C", ",")
    .replace("%7C", "|").replace("%25", "%")

  /** Deterministic text form (the reference marshals with shardcfg.String(),
    * shardctrler.go:43-47): `num|shard0,...,shard11|gid=srv1;srv2,...`,
    * every string field delimiter-escaped.
    */
  def marshal(c: ShardConfig): String = {
    val groups = c.groups.toSeq.sortBy(_._1)
      .map { case (g, srvs) => esc(g) + "=" + srvs.map(esc).mkString(";") }
      .mkString(",")
    s"${c.num}|${c.shards.map(esc).mkString(",")}|$groups"
  }

  def unmarshal(s: String): ShardConfig = {
    val Array(num, shards, groups) = s.split("\\|", -1)
    ShardConfig(
      num.toLong,
      shards.split(",", -1).toVector.map(unesc),
      if (groups.isEmpty) Map.empty
      else groups.split(",", -1).map { part =>
        val Array(g, srvs) = part.split("=", -1)
        unesc(g) -> (if (srvs.isEmpty) Seq.empty[String]
                     else srvs.split(";", -1).toSeq.map(unesc))
      }.toMap)
  }
}

/** The config cell — the kvsrv a controller stores its state in
  * (shardctrler.go:27-33). One atomic [[KvStateMachine.step]] per Put.
  */
final class ConfigStore {
  private[this] var cell: Option[KvCell] = None

  def get: Option[KvCell] = synchronized(cell)

  def put(value: String, version: Long): String = synchronized {
    val (next, err) = KvStateMachine.step(cell,
      KvOp("config", value, version))
    cell = next
    err
  }
}

/** One controller clerk over a shared [[ConfigStore]]. Each clerk is
  * single-threaded (the reference's model); multiple clerks may race
  * [[changeConfigTo]] and the CAS serializes them: the Put is pinned to
  * the version THIS clerk last observed in [[query]], so a clerk holding a
  * stale config always loses — at most one winner per config version,
  * losers must re-query and recompute.
  */
final class ShardCtrler(store: ConfigStore) {
  import KvTypes._

  private[this] var lastReadVersion: Long = -1L

  /** Supply the first configuration (Put at version 0). */
  def initConfig(cfg: ShardConfig): Boolean =
    store.put(ShardCtrlerCodec.marshal(cfg), 0L) == OK

  /** Current configuration; remembers its cell version for the next CAS. */
  def query(): Option[ShardConfig] = store.get.map { c =>
    lastReadVersion = c.version
    ShardCtrlerCodec.unmarshal(c.value)
  }

  /** CAS the config forward from the last-queried version; false =
    * superseded by a concurrent controller (re-query and recompute).
    */
  def changeConfigTo(newCfg: ShardConfig): Boolean =
    lastReadVersion >= 0 &&
      store.put(ShardCtrlerCodec.marshal(newCfg), lastReadVersion) == OK
}
