package graft

/**
 * Plan-shape guards: the scale contracts PLANS.md documents, asserted
 * mechanically so a regression (lost pushdown, a join degrading to a
 * cross product, a top-N materializing a full sort) fails CI instead of
 * surfacing at 100 TB.
 */
class PlanSpec extends SparkSpecBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("filters are pushed into the parquet scan") {
    val p = plan("scan_filter_eq")
    assert(p.contains("PushedFilters") && p.contains("EqualTo"), p.take(2000))
    val r = plan("scan_filter_range")
    assert(r.contains("GreaterThan") && r.contains("PushedFilters"), r.take(2000))
  }

  test("projection prunes the read schema") {
    val p = plan("scan_projection")
    // lineitem has 16 columns; the query projects 3
    val struct = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse(fail(s"no ReadSchema in $p"))
    assert(struct.split(",").length <= 3, struct)
  }

  test("dimension joins broadcast; no sort-merge join against tiny dims") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("top-N collapses to TakeOrderedAndProject, not a global sort") {
    assert(plan("topn").contains("TakeOrderedAndProject"))
    assert(plan("q18_large_orders").contains("TakeOrderedAndProject"))
  }

  test("decontamination broadcasts the eval side") {
    assert(plan("text_decontaminate").contains("BroadcastExchange"))
  }

  test("no registered query plans a cartesian product; BNLJ only where intended") {
    // Bounded-sample pair kernels and 1-to-3-row broadcast sides use
    // BroadcastNestedLoopJoin deliberately; everything else must not.
    val bnljAllowed = Set("dedup_ngram_pairs", "dedup_levenshtein",
      "join_range", "text_tfidf", "dedup_stats",
      "ann_bruteforce",  // the all-pairs baseline the bounded variants beat
      "subquery_scalar", // uncorrelated scalar = 1-row broadcast side
      "q22_dormant",     // Q22's average balance = 1-row broadcast side
      "q15_top_supplier", // Q15's max revenue = 1-row broadcast side
      // partsupp family: the derivation crossJoins the 1-row broadcast
      // supplier count (TpchExtQueries.partsupp); Q11 additionally
      // broadcasts its 1-row threshold.
      "q2_min_cost_supplier", "q9_product_profit", "q11_important_stock",
      "q16_parts_suppliers", "q20_promotion",
      // lloydAssign scores every vector against a broadcast of ≤nlist
      // (16) centroid rows — a bounded-side BNLJ by design; the dedup
      // pair join itself is a cell equi-join (asserted in AnnSpec)
      "dedup_semantic")
    // Iterative/stateful builders execute work at construction; their
    // per-round plans are asserted in their own specs instead.
    val skip = Set("dedup_clusters", "cluster_kmeans", "ann_ivf",
      "stream_window", "stream_sessions")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).flatMap { name =>
      val p = plan(name)
      val cart = if (p.contains("CartesianProduct")) Seq(s"$name: CartesianProduct") else Nil
      val bnlj = if (!bnljAllowed(name) && p.contains("BroadcastNestedLoopJoin"))
        Seq(s"$name: BroadcastNestedLoopJoin") else Nil
      cart ++ bnlj
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
