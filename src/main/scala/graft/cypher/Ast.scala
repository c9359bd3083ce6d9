package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}

/** Typed Cypher-like pattern EDSL — the Spark-native re-expression of the
  * reference's combinator language (reference src/JudyGraph/Cypher.hs:62-144,
  * 195-346). A pattern is an alternation of node and edge specifiers; Scala
  * operator precedence reproduces the Haskell fixities:
  *
  *   nodes32(0) --| edge(attr(Raises)) |-- labels(Issue)
  *   n0 <--| e |-- n1        // left-directed step  (Cypher.hs:376-381)
  *   n0 --| e |--> n1        // right-directed step (Cypher.hs:382-391)
  *   n0 --> n1, n0 <-- n1, n0 ~~ n1   // unlabeled steps (Cypher.hs:393-414)
  *
  * `--|`/`<--|` (first char '-','<') bind tighter than `|--`/`|-->` (first
  * char '|'), so `a --| e |-- b --| f |-- c` groups as
  * `((a --| e) |-- (b --| f)) |-- c` — the PatE `|--` overloads below stitch
  * those shapes back into one alternating component list.
  */
sealed trait NodeSel
case object AllNodes extends NodeSel
final case class LabelSel(labels: Seq[Int]) extends NodeSel
final case class IdSel(ids: Seq[Long]) extends NodeSel
/** Frontier from an arbitrary DataFrame with a single `id` column — the
  * distributed generalization of the reference's explicit `nodes32` list. */
final case class DfSel(df: DataFrame) extends NodeSel

final case class NodeSpec(sel: NodeSel, applFn: Option[DataFrame => DataFrame] = None) {
  /** Post-processing hook on the evaluated node layer (reference `appl`,
    * Cypher.hs:179-192 — e.g. sort in SortNodes.hs:58-59). */
  def appl(f: DataFrame => DataFrame): NodeSpec = copy(applFn = Some(f))

  def --|(e: EdgeSpec): PatE = Pat.of(this) --| e
  def <--|(e: EdgeSpec): PatE = Pat.of(this) <--| e
  def -->(n: NodeSpec): Pat = Pat.of(this) --> n
  def -->(p: Pat): Pat = Pat.of(this) --> p
  def -->(p: PatE): PatE = Pat.of(this) --> p
  def <--(n: NodeSpec): Pat = Pat.of(this) <-- n
  def <--(p: Pat): Pat = Pat.of(this) <-- p
  def <--(p: PatE): PatE = Pat.of(this) <-- p
  def ~~(n: NodeSpec): Pat = Pat.of(this) ~~ n
  def ~~(p: Pat): Pat = Pat.of(this) ~~ p
  def ~~(p: PatE): PatE = Pat.of(this) ~~ p

  // unicode aliases (reference Cypher.hs:98-144)
  def ─┤(e: EdgeSpec): PatE = this --| e
  def <─┤(e: EdgeSpec): PatE = this <--| e
  def ⟼(n: NodeSpec): Pat = this --> n
  def ⟻(n: NodeSpec): Pat = this <-- n
  def ⟞⟝(n: NodeSpec): Pat = this ~~ n
}

/** Direction of one step, as recorded by the combinators
  * (reference DirL/DirR in EAttr, Table.hs:34-50). Both = undirected
  * (`<--| e |-->` behaves as undirected, Spec.hs:153-154). */
sealed trait Dir
case object DirNone extends Dir
case object DirL extends Dir
case object DirR extends Dir

/** The edge-row view a `where_` predicate sees — the relational form of the
  * reference predicate's full edge word + edge map (Cypher.hs:268-270,
  * applied :840-849): the step's label, the orthogonal overlay bits, and the
  * stored target node. `dst` is the physical row's target (= the walked-to
  * node on rightward steps; on leftward steps the row is traversed from its
  * dst side, so `dst` is the node being left). */
final case class EdgeView(label: Column, attrMask: Column, dst: Column)

final case class EdgeSpec(
    attrs: Seq[Int] = Nil,
    orths: Seq[Int] = Nil,
    whereFn: Option[EdgeView => Column] = None,
    several: Option[(Int, Int)] = None,
    dir: Dir = DirNone) {
  /** `edge(attr(L)).rep(1,3)` — the reference's `(1…3)` repetition
    * (Cypher.hs:126-132, 272-274). */
  def rep(lo: Int, hi: Int): EdgeSpec = copy(several = Some((lo, hi)))
  def orthMask: Long = orths.foldLeft(0L)((m, l) => m | (1L << l))
}

sealed trait Comp
final case class CompN(n: NodeSpec) extends Comp
final case class CompE(e: EdgeSpec) extends Comp

/** Complete pattern (ends with a node). */
final case class Pat(comps: Vector[Comp]) {
  private def pend(e: EdgeSpec): PatE = PatE(comps :+ CompE(e))
  def --|(e: EdgeSpec): PatE = pend(e)
  def <--|(e: EdgeSpec): PatE = pend(e.copy(dir = DirL))
  def -->(n: NodeSpec): Pat = pend(EdgeSpec(dir = DirR)) |-- n
  def -->(p: Pat): Pat = pend(EdgeSpec(dir = DirR)) |-- p
  def -->(p: PatE): PatE = pend(EdgeSpec(dir = DirR)) |-- p
  def <--(n: NodeSpec): Pat = pend(EdgeSpec(dir = DirL)) |-- n
  def <--(p: Pat): Pat = pend(EdgeSpec(dir = DirL)) |-- p
  def <--(p: PatE): PatE = pend(EdgeSpec(dir = DirL)) |-- p
  def ~~(n: NodeSpec): Pat = pend(EdgeSpec(dir = DirNone)) |-- n
  def ~~(p: Pat): Pat = pend(EdgeSpec(dir = DirNone)) |-- p
  def ~~(p: PatE): PatE = pend(EdgeSpec(dir = DirNone)) |-- p
}

object Pat {
  def of(n: NodeSpec): Pat = Pat(Vector(CompN(n)))
}

/** Pattern with a pending (dangling) trailing edge. */
final case class PatE(comps: Vector[Comp]) {
  def |--(n: NodeSpec): Pat = Pat(comps :+ CompN(n))
  def |--(p: Pat): Pat = Pat(comps ++ p.comps)
  def |--(p: PatE): PatE = PatE(comps ++ p.comps)
  /** `|-->` closes the edge as right-directed, unless the edge already got
    * DirL from `<--|` — then both arrows = undirected (Cypher.hs:382-391). */
  private def flip: Vector[Comp] = comps.init :+ (comps.last match {
    case CompE(e) if e.dir == DirL => CompE(e.copy(dir = DirNone))
    case CompE(e) => CompE(e.copy(dir = DirR))
    case other => other
  })
  def |-->(n: NodeSpec): Pat = Pat(flip :+ CompN(n))
  def |-->(p: Pat): Pat = Pat(flip ++ p.comps)
  def |-->(p: PatE): PatE = PatE(flip ++ p.comps)

  // unicode aliases (reference Cypher.hs:98-144)
  def ├─(n: NodeSpec): Pat = this |-- n
  def ├─>(n: NodeSpec): Pat = this |--> n
}

/** Pieces accepted by the variadic `edge(...)` builder (reference `edge`
  * bundler, Cypher.hs:212-224). */
sealed trait EdgePart
final case class AttrPart(label: Int) extends EdgePart
final case class OrthPart(label: Int) extends EdgePart
final case class WherePart(f: EdgeView => Column) extends EdgePart
final case class SeveralPart(lo: Int, hi: Int) extends EdgePart {
  // lo = 0 ("zero hops acceptable") is not a reference semantic — its
  // stopRecursion counts from 1 (Cypher.hs:823-837) — and the executor's
  // dry-up rules assume lo >= 1; fail construction, not the query result
  require(lo >= 1 && hi >= lo,
    s"several($lo, $hi): bounds must satisfy 1 <= lo <= hi")
}

object Dsl {
  /** All nodes (reference anyNode, Cypher.hs:336-338). */
  def anyNode: NodeSpec = NodeSpec(AllNodes)
  /** Nodes of the given label classes (reference labels, Cypher.hs:340-342). */
  def labels(ls: Int*): NodeSpec = NodeSpec(LabelSel(ls))
  /** Explicit node ids (reference nodes32, Cypher.hs:344-346). */
  def nodes32(ids: Long*): NodeSpec = NodeSpec(IdSel(ids))
  /** Distributed frontier: any DataFrame with an `id` column. */
  def nodesDF(df: DataFrame): NodeSpec = NodeSpec(DfSel(df))

  /** Follow edges with this label (reference attr, Cypher.hs:250-253). */
  def attr(label: Int): EdgePart = AttrPart(label)
  /** Orthogonal overlay label (reference orth, Cypher.hs:255-266): matches
    * edges whose attrMask is a nonzero combination of the given orth bits. */
  def orth(label: Int): EdgePart = OrthPart(label)
  /** Per-edge predicate over the label column (reference where_,
    * Cypher.hs:268-270 — the common case; [[whereEdge]] exposes the full
    * edge view). */
  def where_(f: Column => Column): EdgePart = WherePart(v => f(v.label))

  /** Per-edge predicate over the FULL edge view (label, attrMask, dst) —
    * the reference predicate sees the whole edge word and edge map
    * (Cypher.hs:268-270, applied :840-849), so attr-bit and target-node
    * filters are expressible. */
  def whereEdge(f: EdgeView => Column): EdgePart = WherePart(f)
  /** Bounded repetition (reference several/(…), Cypher.hs:272-274). */
  def several(lo: Int, hi: Int): EdgePart = SeveralPart(lo, hi)

  def edge(parts: EdgePart*): EdgeSpec =
    parts.foldLeft(EdgeSpec()) {
      case (e, AttrPart(l)) => e.copy(attrs = e.attrs :+ l)
      case (e, OrthPart(l)) => e.copy(orths = e.orths :+ l)
      case (e, WherePart(f)) => e.copy(whereFn = Some(f))
      case (e, SeveralPart(lo, hi)) => e.copy(several = Some((lo, hi)))
    }

  /** Any path length (reference `***` = several 1 maxBound,
    * Cypher.hs:134-136). Executed as BFS-to-fixpoint (terminates on cycles,
    * unlike the reference's unbounded recursion). */
  def anyLength: EdgeSpec = EdgeSpec(several = Some((1, Int.MaxValue)))

  implicit def nodeSpecToPat(n: NodeSpec): Pat = Pat.of(n)
}
