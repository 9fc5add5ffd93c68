package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Decision-tree / boosted-ensemble INFERENCE compiled to Catalyst
  * expressions: a literal tree becomes a nested CASE WHEN column, an
  * ensemble a fixed-order sum of tree columns — whole-stage-codegen'd
  * scalar math, no UDF, no model object at runtime. This is how tree
  * models (GBTs, random forests) should ship to a 100 TB scorer: the
  * model is data, the scorer is an expression, and Catalyst fuses it
  * into the scan projection (zero extra operators in the plan).
  *
  * Determinism: leaf values are double literals and the ensemble sum
  * is an explicit left-fold, so engines agree bit-for-bit (same
  * literal parse, same IEEE add order) — the oracle is the same CASE
  * WHEN tree in SQL. NULL features route to the RIGHT branch in both
  * engines (a NULL `<=` comparison fails the WHEN in Spark and SQL
  * alike), so the split semantics match without a NULL-handling rider.
  */
object TreeInfer {
  sealed trait TreeNode
  final case class Leaf(value: Double) extends TreeNode
  /** Binary split: rows with `feature <= threshold` go left. */
  final case class Split(feature: String, threshold: Double,
      left: TreeNode, right: TreeNode) extends TreeNode

  /** Compile one tree to a Column (nested when/otherwise). */
  def treeColumn(t: TreeNode): Column = t match {
    case Leaf(v) => lit(v)
    case Split(f, thr, l, r) =>
      when(col(f) <= lit(thr), treeColumn(l)).otherwise(treeColumn(r))
  }

  /** Additive ensemble score: left-to-right sum of the tree outputs
    * (fixed association — the order IS the contract, see scaladoc). */
  def ensembleScore(trees: Seq[TreeNode]): Column = {
    require(trees.nonEmpty, "ensemble needs at least one tree")
    trees.map(treeColumn).reduceLeft(_ + _)
  }
}
