package graft.apps

import graft.engine.{KV, MRApp}

/** The reference's portable Map/Reduce application queries (SURVEY.md §2.2,
  * A1–A5), re-implemented behaviorally. Output formats are byte-compatible so
  * golden diffs against the sequential oracle match the reference's
  * `sort | cmp` methodology (src/main/test-mr.sh:103-111).
  *
  * A6–A8 (jobcount/mtiming/rtiming) introspect the MR scheduler via local-FS
  * side effects and are non-portable by design; their intent (task accounting,
  * executor parallelism) is Spark-runtime territory, asserted via listener
  * metrics in tests, not ported as apps.
  */
object Tokenizer {
  /** Splits on runs of non-letters, mirroring Go's
    * `strings.FieldsFunc(contents, func(r rune) bool { return !unicode.IsLetter(r) })`
    * (reference: src/mrapps/wc.go:19-24). Implemented with
    * `Character.isLetter` over code points — NOT a regex — so Unicode classes
    * match Go's `unicode.IsLetter` rather than Java regex semantics
    * (SURVEY.md §7 risk register).
    */
  def words(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) sb.appendCodePoint(cp)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out += sb.toString
    out.result()
  }
}

/** A1 `wc` — word count (reference: src/mrapps/wc.go). */
object WordCount extends MRApp {
  val name = "wc"
  def map(file: String, contents: String): Seq[KV] =
    Tokenizer.words(contents).map(w => KV(w, "1"))
  def reduce(key: String, values: Seq[String]): String = values.size.toString
}

/** A2 `indexer` — inverted index: per-document DISTINCT words (map-side dedup,
  * src/mrapps/indexer.go:21-27); reduce prints `"<n> doc1,doc2,..."` with the
  * document list sorted (src/mrapps/indexer.go:36-39).
  */
object Indexer extends MRApp {
  val name = "indexer"
  def map(file: String, contents: String): Seq[KV] =
    Tokenizer.words(contents).distinct.map(w => KV(w, file))
  def reduce(key: String, values: Seq[String]): String = {
    val docs = values.sorted
    s"${docs.size} ${docs.mkString(",")}"
  }
}

/** A3/A4 `crash`/`nocrash` query part — map emits four fixed keys
  * (a→filename, b→len(filename), c→len(contents), d→"xyzzy",
  * src/mrapps/crash.go:34-43); reduce space-joins sorted values
  * (src/mrapps/crash.go:45-55). The crash-injection half is fault-tolerance
  * territory (Spark task retry ≅ the coordinator's 10 s re-execution, E11).
  */
object Collector extends MRApp {
  val name = "collector"
  def map(file: String, contents: String): Seq[KV] = Seq(
    KV("a", file),
    KV("b", file.length.toString),
    KV("c", contents.length.toString),
    KV("d", "xyzzy"))
  def reduce(key: String, values: Seq[String]): String =
    values.sorted.mkString(" ")
}

/** A5 `early_exit` query part — one count per input file
  * (src/mrapps/early_exit.go:19-36); the sleep there tests premature
  * finalization, a scheduler property, not a query feature.
  */
object FileCount extends MRApp {
  val name = "filecount"
  def map(file: String, contents: String): Seq[KV] = Seq(KV(file, "1"))
  def reduce(key: String, values: Seq[String]): String = values.size.toString
}

/** Registry replacing the reference's `plugin.Open` dynamic loading
  * (src/main/mrworker.go:32-49).
  */
object AppRegistry {
  val all: Map[String, MRApp] = Seq(WordCount, Indexer, Collector, FileCount)
    .map(a => a.name -> a).toMap
  def apply(name: String): MRApp = all.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown MR app '$name'; known: ${all.keys.toSeq.sorted.mkString(", ")}"))
}
