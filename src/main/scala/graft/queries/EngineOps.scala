package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.state.{KvOp, KvStateMachine}

/** Engine-level operators exposed as queries: the FNV shard router (S6) via
  * the native Catalyst expression, and the versioned-KV CAS replay (S1/S2)
  * driven by a deterministic op log derived from `events`.
  */
object EngineOps {
  import Tables.t

  val shardRoute = Q(
    "shard_route_fnv",
    "The reference's static shard routing Key2Shard = FNV-1a-32(key) mod 12 " +
      "(src/shardkv1/shardcfg/shardcfg.go:17-34) as a native codegen " +
      "Expression (graft.functions.Fnv1a32), applied to every doc key — " +
      "shard histogram + distinct keys per shard. The DuckDB oracle " +
      "recomputes FNV-1a with a list_reduce fold over the code points, " +
      "proving bit parity of the custom expression.",
    Some("""
      SELECT list_reduce(
               list_prepend(2166136261::BIGINT,
                 list_transform(range(1, len(k) + 1),
                   i -> ord(substr(k, i, 1))::BIGINT)),
               (acc, x) -> (xor(acc, x) * 16777619) & 4294967295) % 12 AS shard,
             count(*) AS n_keys
      FROM (SELECT doc_id::VARCHAR AS k FROM documents)
      GROUP BY shard""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "documents")
        .select(Hashing.key2shard(col("doc_id").cast("string")).as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_keys")))

  val kvReplay = Q(
    "kv_cas_replay",
    "Versioned-KV CAS replay (S1/S2 spec, src/kvsrv1/rpc/rpc.go:19-39): " +
      "events become an ordered Put log per user — non-error events carry " +
      "the correct expected version (count of prior non-error ops), error " +
      "events carry a poisoned version and must be rejected. ONE shuffle " +
      "with a SECONDARY SORT: repartition by user + in-partition sort on " +
      "(user, event_id) delivers each user's log as a contiguous ordered " +
      "run that STREAMS through the CAS fold — no per-user " +
      "materialization, so a pathologically hot user spills in the sort " +
      "instead of blowing the heap (round 2 held each history in a Seq). " +
      "The oracle is the closed form the deterministic log implies. Scales " +
      "per-key with no cross-key coordination — the state-store sharding " +
      "contract.",
    Some("""
      SELECT user_id AS key,
             coalesce(max(CASE WHEN event_type <> 'error' THEN event_id END)::VARCHAR, '')
               AS value,
             count(*) FILTER (WHERE event_type <> 'error')::BIGINT AS version,
             count(*) FILTER (WHERE event_type <> 'error')::BIGINT AS n_applied,
             count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_rejected
      FROM events
      GROUP BY user_id""".stripMargin),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .as[(Long, Long, String)]
        .repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("event_id"))
        .mapPartitions(it =>
          graft.engine.SortedRuns.fold(it,
            (r: (Long, Long, String)) => r._2) { (uid, run) =>
            var priorOk = 0L
            val ops = run.map { case (eid, _, etype) =>
              val version = if (etype == "error") 999999999L else priorOk
              if (etype != "error") priorOk += 1
              KvOp(uid.toString, eid.toString, version, retried = false,
                seq = eid)
            }
            KvStateMachine.replayKey(uid.toString, ops)
          })
        .toDF()
        .select(col("key").cast("long").as("key"), col("value"),
          col("version"), col("nApplied").as("n_applied"),
          col("nRejected").as("n_rejected"))
    })

  val all: Seq[Q] = Seq(shardRoute, kvReplay)
}
