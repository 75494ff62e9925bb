package graft.engine

/** The reference engine's sole record type: a string key/value pair
  * (reference: src/mr/worker.go:16-19 `type KeyValue struct{ Key, Value string }`).
  */
case class KV(key: String, value: String)

/** The reference's UDF surface: a Map/Reduce application pair, loaded there as a
  * Go plugin with fixed signatures (reference: src/main/mrworker.go:32-49,
  * src/main/mrsequential.go:91-108). Here it is a plain trait + registry.
  *
  * Contract notes (mirroring the reference):
  *  - `map(file, contents)` receives one WHOLE input file per call
  *    (reference: src/mr/worker.go:87-97; one map task per file,
  *    src/mr/coordinator.go:191-207) and may emit any number of KVs.
  *  - `reduce(key, values)` is called exactly once per distinct key with ALL of
  *    that key's values materialized (reference: src/mr/worker.go:188-203).
  *    Value ORDER IS NOT SPECIFIED — the reference feeds values in key-sorted
  *    file order, but every committed app either sorts values itself or is
  *    order-insensitive, so we promise nothing (SURVEY.md §7 risk register).
  */
trait MRApp extends Serializable {
  def name: String
  def map(file: String, contents: String): Seq[KV]
  def reduce(key: String, values: Seq[String]): String
}
