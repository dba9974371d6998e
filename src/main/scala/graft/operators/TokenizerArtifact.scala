package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper

/** Tokenizer-artifact interop: export/import of a trained BPE merge
  * table in the standard `tokenizer.json` model shape — the PUBLIC
  * artifact format a training stack's tokenizer loader consumes
  * (`{"model": {"type": "BPE", "vocab": {token: id}, "merges":
  * ["lhs rhs", ...]}}`, merges in rank order, rank = list position).
  * The reference has no tokenizer (its BPE analog is our extension);
  * the format itself is the published HuggingFace-tokenizers JSON
  * layout, re-emitted here with only the fields the BPE model needs.
  *
  * The MERGE LIST is the artifact's load-bearing payload — rank-ordered
  * merges fully determine the encode ([[TextOps.withBpePieces]]); the
  * vocab map is the derived id table a training stack needs for
  * token-to-id lookup: base alphabet first (sorted single-code-point
  * operands), then any composite operand no earlier merge produced
  * (padded/hand-built tables), then each merge's output in rank order,
  * ids dense from 0 — the shape a trained BPE vocabulary takes (one new
  * token per merge over the alphabet).
  *
  * Driver-side artifact I/O (one small JSON document, like the CURRENT
  * markers and store manifests) through the Hadoop FS API ([[graft.sources.Hfs]])
  * so the artifact lives wherever the vocab store does; Jackson (on
  * every Spark classpath) does the escaping-correct (de)serialization.
  */
object TokenizerArtifact {

  /** Vocabulary derived from a rank-ordered merge table: alphabet ++
    * underivable composite operands ++ merge outputs, deduped
    * first-wins, ids = positions. */
  private[graft] def vocabOf(table: Seq[(String, String)]): Seq[String] = {
    val operands = table.flatMap { case (a, b) => Seq(a, b) }
    // CODE-POINT order, not UTF-16 lexicographic: a supplementary char
    // would sort below U+E000 under String's surrogate-unit compare,
    // diverging from the UTF-8 binary order an engine-independent
    // replay (DuckDB ORDER BY) uses
    val alphabet = operands
      .filter(s => s.codePointCount(0, s.length) == 1)
      .distinct.sortBy(_.codePointAt(0))
    val outputs = table.map { case (a, b) => a + b }
    val produced = alphabet.toSet ++ outputs
    val underivable = operands.filterNot(produced).distinct
    (alphabet ++ underivable ++ outputs).distinct
  }

  /** Export `table` (rank order) as a tokenizer.json artifact at
    * `path`. Symbols must be whitespace-free — the merges entry format
    * is the space-separated "lhs rhs" pair, and BPE symbols are by
    * construction concatenations of non-whitespace word characters
    * (the tokenizer splits on whitespace before any merge). */
  def exportTokenizerJson(table: Seq[(String, String)], path: String): Unit = {
    table.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty && !s"$a$b".exists(_.isWhitespace),
        s"BPE symbols must be non-empty and whitespace-free: ($a, $b)")
    }
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    val model = root.putObject("model")
    model.put("type", "BPE")
    val vocab = model.putObject("vocab")
    vocabOf(table).zipWithIndex.foreach { case (t, i) => vocab.put(t, i) }
    val merges = model.putArray("merges")
    table.foreach { case (a, b) => merges.add(s"$a $b") }
    graft.sources.Hfs.writeStringAtomic(
      new org.apache.hadoop.fs.Path(path), m.writeValueAsString(root))
  }

  /** Import the rank-ordered merge table back from a tokenizer.json
    * artifact. Accepts both published merges spellings: the classic
    * space-separated "lhs rhs" string and the newer ["lhs", "rhs"]
    * pair array. */
  def importMerges(path: String): Seq[(String, String)] = {
    val m = new ObjectMapper()
    val root = m.readTree(
      graft.sources.Hfs.readString(new org.apache.hadoop.fs.Path(path)))
    val model = root.path("model")
    require(model.path("type").asText() == "BPE",
      s"not a BPE tokenizer artifact: $path")
    val merges = model.path("merges")
    require(merges.isArray, s"artifact has no merges list: $path")
    (0 until merges.size).map { i =>
      val node = merges.get(i)
      if (node.isArray) {
        require(node.size() >= 2 && !node.get(0).isNull && !node.get(1).isNull,
          s"malformed pair merge entry at rank $i: $node")
        (node.get(0).asText(), node.get(1).asText())
      } else {
        val s = node.asText()
        val sp = s.indexOf(' ')
        require(sp > 0 && sp < s.length - 1, s"malformed merge entry: '$s'")
        (s.substring(0, sp), s.substring(sp + 1))
      }
    }
  }
}
