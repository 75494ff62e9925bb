package graft.engine

import org.apache.spark.Partitioner

/** FNV-1a 32-bit hash over a string's UTF-8 bytes, masked to 31 bits —
  * bit-identical to the reference's `ihash` (src/mr/worker.go:30-34) and, with
  * `% 12`, to the shard router `Key2Shard` (src/shardkv1/shardcfg/shardcfg.go:29-34).
  */
object Fnv1a {
  final val OffsetBasis: Long = 2166136261L
  final val Prime: Long = 16777619L
  final val Mask32: Long = 0xffffffffL

  /** Full unsigned 32-bit FNV-1a of the UTF-8 bytes of `s`. */
  def hash32(s: String): Long = {
    var h = OffsetBasis
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h = ((h ^ (bytes(i) & 0xffL)) * Prime) & Mask32
      i += 1
    }
    h
  }

  /** The reference's `ihash`: FNV-1a masked to 31 bits (src/mr/worker.go:30-34). */
  def ihash(s: String): Int = (hash32(s) & 0x7fffffffL).toInt

  /** The reference's `Key2Shard` with NShards=12 (src/shardkv1/shardcfg/shardcfg.go:17-34). */
  def key2Shard(s: String, nShards: Int = 12): Int = (hash32(s) % nShards).toInt
}

/** Custom Spark partitioner reproducing the reference's shuffle routing
  * `ihash(key) % nReduce` (src/mr/worker.go:100-107) exactly.
  */
class FnvPartitioner(val nReduce: Int) extends Partitioner {
  require(nReduce > 0)
  override def numPartitions: Int = nReduce
  override def getPartition(key: Any): Int =
    Fnv1a.ihash(key.asInstanceOf[String]) % nReduce
  override def equals(other: Any): Boolean = other match {
    case p: FnvPartitioner => p.nReduce == nReduce
    case _                 => false
  }
  override def hashCode: Int = nReduce
}
