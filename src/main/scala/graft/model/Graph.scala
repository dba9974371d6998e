package graft.model

/** Property-graph record universe.
  *
  * Re-expression of the reference's graph layer:
  *  - GraphNode     ← databuilder/models/graph_node.py:6-13
  *  - GraphRelationship ← databuilder/models/graph_relationship.py:19-30
  *    (every edge is bidirectional: forward + reverse type written as a pair)
  *  - GraphSerializable ← databuilder/models/graph_serializable.py:21-91
  *    (the create_next_node/create_next_relation generators become a
  *    typeclass used in Dataset.flatMap — the reference's de-facto UDTF).
  *
  * Attributes are an open string→string map (MapType at the DataFrame
  * level); typed per-label projections are derived downstream where
  * querying needs them.
  */
case class GraphNode(key: String, label: String, attributes: Map[String, String])

case class GraphRelationship(
    startLabel: String,
    endLabel: String,
    startKey: String,
    endKey: String,
    relType: String,
    reverseType: String,
    attributes: Map[String, String])

/** Per-model graph fan-out: one domain record → N nodes + M relationships.
  * Applied via `Dataset[T].flatMap`; global dedup of low-cardinality nodes
  * (reference table_metadata.py:324-327) happens downstream as a
  * distributed `dropDuplicates("label","key")`, not mutable state. */
trait GraphSerializable[T] extends Serializable {
  def nodes(t: T): Seq[GraphNode]
  def relationships(t: T): Seq[GraphRelationship]
}

object Graph {
  /** Python `str.istitle()`: every cased run starts uppercase and continues
    * lowercase, with at least one cased char — rejects "TABLE" and "tAble",
    * accepts "Dashboardgroup" (reference graph_serializable.py:115-121). */
  def isTitle(s: String): Boolean = {
    var prevCased = false
    var seen = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isUpper) {
        if (prevCased) return false
        prevCased = true; seen = true
      } else if (c.isLower) {
        if (!prevCased) return false
        prevCased = true; seen = true
      } else prevCased = false
      i += 1
    }
    seen
  }

  /** Validation invariants (reference graph_serializable.py:68-91,115-121):
    * non-empty key/label, title-case label, upper-case relation types. */
  def nodeValid(n: GraphNode): Boolean =
    n.key != null && n.key.nonEmpty && n.label != null && n.label.nonEmpty &&
      isTitle(n.label)

  def relationshipValid(r: GraphRelationship): Boolean =
    Seq(r.startLabel, r.endLabel, r.startKey, r.endKey).forall(s => s != null && s.nonEmpty) &&
      r.relType == r.relType.toUpperCase && r.reverseType == r.reverseType.toUpperCase
}
