package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair graph
  * (`a`, `b` columns), the primitive under dedup cluster assignment
  * (q102/q111/q112 consume the labels).
  *
  * Two algorithms with one contract — output is (id, lbl) where lbl
  * is the minimum node id reachable from id:
  *
  *  - [[minLabel]]: label propagation to a fixpoint. O(diameter)
  *    rounds, one edge-sized shuffle per round — the cheap path for
  *    near-dup graphs, whose components are short chains (diameter
  *    ≤ a few). DOES NOT converge within the round cap on long
  *    chains; it reports that instead of silently returning partial
  *    labels.
  *  - [[largeSmallStar]]: alternating large-star/small-star edge
  *    contraction (Kiveris et al., "Connected Components in MapReduce
  *    and Beyond", SoCC 2014). Converges in O(log n) rounds
  *    REGARDLESS of diameter — the planet-scale path; each round is
  *    two edge-sized shuffles and the edge set only shrinks toward a
  *    star forest.
  *
  * [[labelsFor]] is what q102 uses: min-label first, automatic
  * escalation to large-star/small-star if the cap is hit — a
  * chain-heavy pair graph (adversarial near-dup corpus) degrades to
  * the logarithmic algorithm instead of to wrong answers.
  *
  * Both iterate with per-round `localCheckpoint` so round k+1 reads
  * round k's materialized output, not the whole lineage (same shape
  * as the q102 loop since round 3; required for any iterative plan).
  */
object ConnectedComponents {

  /** Min-label propagation. Returns (labels, converged, rounds);
    * `labels` is only the true component labeling when `converged`.
    */
  def minLabel(pairs: DataFrame, maxRounds: Int = 25)
      : (DataFrame, Boolean, Int) = {
    val nbr = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b"), col("a"))).toDF("id", "nb")
    var labels = nbr.select(col("id")).distinct()
      .select(col("id"), col("id").as("lbl")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val prop = nbr
        .join(labels.select(col("id").as("nb"), col("lbl")), "nb")
        .select(col("id"), col("lbl"))
      val next = labels.select(col("id"), col("lbl")).union(prop)
        .groupBy("id").agg(min(col("lbl")).as("lbl")).localCheckpoint()
      changed = next.join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") =!= col("prev")).count()
      labels = next
      rounds += 1
    }
    (labels, changed == 0L, rounds)
  }

  /** Large-star/small-star to a star-forest fixpoint.
    *
    * Per round (u ranges over nodes, Γ(u) = neighbors, m(u) = min of
    * {u} ∪ Γ(u)):
    *  - large-star: emit (v, m(u)) for every v ∈ Γ(u) with v > u —
    *    strictly larger neighbors hook onto u's local minimum;
    *  - small-star: orient edges child > parent; emit (v, m(u)) for
    *    every smaller neighbor v ≠ m(u), plus (u, m(u)) — u and its
    *    smaller neighbors all hook onto the minimum.
    * The edge set is deduped each round and compared by (count,
    * hash-sum) signature; at the fixpoint it IS the star forest
    * (child → component minimum), from which labels read off
    * directly. Shuffles are always edge-sized; high-degree minima
    * are plain groupBy keys (no per-node adjacency lists are ever
    * collected).
    */
  def largeSmallStar(pairs: DataFrame, maxRounds: Int = 100): DataFrame = {
    // canonical undirected edges, self-loops dropped
    var edges = pairs
      .select(least(col("a"), col("b")).as("s"),
        greatest(col("a"), col("b")).as("l"))
      .filter(col("s") =!= col("l"))
      .select(col("s").as("a"), col("l").as("b"))
      .distinct().localCheckpoint()

    def signature(e: DataFrame): (Long, Long) = {
      // XOR-fold, not SUM: ANSI mode makes a long SUM of 2^63-range
      // hashes throw on overflow; XOR is order-independent and
      // overflow-free, and the edge set is distinct so multiplicity
      // cannot cancel.
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(mins, "u").filter(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("a"),
          greatest(col("v"), col("m")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // orient child > parent: u is the larger endpoint
      val oriented = e.select(col("b").as("u"), col("a").as("v"))
      val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
      val hooked = oriented.join(mins, "u")
      hooked.filter(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .union(hooked.select(col("m").as("a"), col("u").as("b")).distinct())
        .select(least(col("a"), col("b")).as("s"),
          greatest(col("a"), col("b")).as("l"))
        .filter(col("s") =!= col("l"))
        .select(col("s").as("a"), col("l").as("b")).distinct()
    }

    var sig = signature(edges)
    var rounds = 0
    var fixed = false
    while (!fixed && rounds < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nextSig = signature(next)
      fixed = nextSig == sig
      sig = nextSig
      edges = next
      rounds += 1
    }
    assert(fixed, s"large-star/small-star did not converge in $maxRounds rounds")
    // star forest: every child appears once with its component min;
    // roots (= the minima) label themselves
    edges.select(col("b").as("id"), col("a").as("lbl"))
      .union(edges.select(col("a").as("id"), col("a").as("lbl")).distinct())
      .groupBy("id").agg(min(col("lbl")).as("lbl"))
  }

  /** The production entry: min-label for the common short-diameter
    * case, automatic escalation to large-star/small-star when the
    * round cap is hit — long chains cost O(log n) extra rounds
    * instead of silently wrong labels.
    */
  def labelsFor(pairs: DataFrame, minLabelRounds: Int = 25): DataFrame = {
    val (labels, converged, rounds) = minLabel(pairs, minLabelRounds)
    if (converged) labels
    else {
      System.err.println(
        s"[graft-cc] min-label hit the $rounds-round cap (graph diameter " +
          "exceeds it); escalating to large-star/small-star")
      largeSmallStar(pairs)
    }
  }
}
