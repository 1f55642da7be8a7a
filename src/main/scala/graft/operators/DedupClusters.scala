package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup cluster formation (SURVEY.md §2C): connected components over
  * the near-duplicate pair graph, mapping every document to a
  * canonical representative (the minimum doc_id reachable through
  * near-dup edges) plus the cluster size.
  *
  * Spark side: alternating large-star/small-star edge contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014) — per round, large-star hangs every node's
  * strictly-larger neighbors off its neighborhood minimum and
  * small-star does the same for the smaller-or-equal side, so chains
  * halve in height each pair of steps and the edge set converges to
  * one star per component (center = component-minimum id) in
  * O(log n) rounds, NOT the O(component diameter) a min-label
  * propagation loop needs. Each operation is a groupBy + equi-join
  * over the edge list; the driver only checks the per-round fixpoint
  * (no data ever collects to the driver). That log-round bound is
  * what makes the shape 100 TB-safe even when near-dup chains get
  * long (shingled crawls at 10× data showed exactly that growth with
  * the propagation loop).
  *
  * Oracle: DuckDB recursive CTE computing min reachable id over the
  * same edge set.
  */
object DedupClusters {

  type Q = (SparkSession, String) => DataFrame

  /** Connected components: nodes (id) + undirected edges (a, b) →
    * (id, canonical). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 64): DataFrame =
    connectedComponentsLabeled(nodes.selectExpr("id", "id AS label"), edges, maxRounds)

  /** large-star: for every node u, connect each strictly-larger
    * neighbor v to m = min(N(u) ∪ {u}). Keeps connectivity (u's own
    * link to its minimum re-emerges from the minimum's group) while
    * flattening tall chains. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.selectExpr("a AS u", "b AS v")
      .unionAll(edges.selectExpr("b AS u", "a AS v"))
    val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** small-star: orient every edge (larger → smaller), then per node u
    * connect each smaller neighbor v — and u itself — to
    * m = min of u's smaller neighborhood. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
    oriented.join(mins, "u")
      .select(col("v").as("a"), col("m").as("b"))
      .unionAll(mins.select(col("u").as("a"), col("m").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Components with caller-supplied initial labels (id, label): each
    * component resolves to its minimum label. Callers encode their
    * canonical-preference order into the label (e.g. [[CrossShard]]
    * packs shard priority above doc_id), so "which duplicate wins" is
    * a pure label ordering — the contraction loop itself never
    * changes: stars form over ids, then ONE groupBy resolves each
    * star to the component's minimum label.
    *
    * CONTRACT: every edge endpoint must appear in `nodesLabeled` —
    * the output is one row per node row, so an endpoint with no node
    * row has no label to resolve. Enforced loudly (not silently
    * dropped): the star-extraction join is full-outer and any
    * comp-only id raises, riding the join that already exists rather
    * than costing an extra anti-join job. */
  def connectedComponentsLabeled(nodesLabeled: DataFrame, edges: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    // Checkpoint (eager) materializes each round's edge set AND
    // truncates the logical lineage: without it round k's plan carries
    // all k-1 prior joins, so planning cost grows per round and a
    // cache eviction at scale would recompute the whole chain. When
    // the session has a checkpoint dir configured we use the reliable
    // variant (survives executor loss on a cluster); otherwise
    // executor-local (the right default for local mode).
    val ckpt: DataFrame => DataFrame = df =>
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()
    var e = ckpt(edges.select(col("a"), col("b")).filter(col("a") =!= col("b")).distinct())
    // r16 optimization: carry each round's count forward instead of
    // re-counting the previous round's checkpointed edges — one fewer
    // Spark job per contraction round, same fixpoint test
    var eCount = e.count()
    var round = 0
    var converged = eCount == 0L
    while (round < maxRounds && !converged) {
      val next = ckpt(smallStar(largeStar(e)))
      val nextCount = next.count()
      // fixpoint test: the star set is stable (multiset-subset + equal
      // count == set equality, both over checkpointed rounds)
      converged = nextCount == eCount &&
        next.exceptAll(e).limit(1).count() == 0
      e = next
      eCount = nextCount
      round += 1
    }
    // star contraction needs O(log n) rounds; failing loudly beats
    // silently mislabeled clusters
    require(converged,
      s"connectedComponents did not converge within $maxRounds rounds — " +
        "raise maxRounds")
    // fixpoint edges form stars (child, root); roots map to themselves
    // and edge-free nodes are their own component
    val comp = e.select(col("a").as("id"), col("b").as("root"))
      .unionAll(e.select(col("b").as("id"), col("b").as("root")).distinct())
    val withRoot = nodesLabeled.select("id", "label")
      .join(comp, Seq("id"), "full")
      .select(col("id"), coalesce(col("root"), col("id")).as("root"),
        // a comp row with no node row = an edge endpoint absent from
        // nodesLabeled — a contract breach that previously shrank the
        // output silently; fail on the row, inside the existing join
        when(col("label").isNull, raise_error(concat(
          lit("connectedComponentsLabeled: edge endpoint absent from nodes frame: id="),
          col("id").cast(org.apache.spark.sql.types.StringType))))
          .otherwise(col("label")).as("label"))
    val minLab = withRoot.groupBy("root").agg(min(col("label")).as("canonical"))
    withRoot.join(minLab, "root").select("id", "canonical")
  }

  /** Clusters from MinHash-LSH candidate pairs with verified
    * Jaccard >= 0.2 as the edge set.
    *
    * SESSION-STAGED (r16 optimization round): the cluster-assignment
    * table is the second half of the `lsh_pairs` staging rationale
    * ("the LSH pair set is an INDEX-BUILD product — a real pipeline
    * computes it once and then clustering, cross-shard CC, and the
    * keep-list composite all read the same artifact") — the CC run
    * over the staged pairs is itself computed once per (session, dir)
    * and read by dedup_clusters, dedup_explain, pipeline_soft_dedup,
    * pipeline_keep_list and pipeline_dedup_attrition, instead of each
    * re-running the full star-contraction loop per invocation. The
    * registration charges the contraction to the bench's staging
    * line. Parquet roundtrips the (long, long, long) rows exactly. */
  Staged.register("lsh_clusters")((s, dir) => { dedupClusters(s, dir); () })
  def dedupClusters: Q = (s, dir) =>
    Staged.table(s, dir, "lsh_clusters", coalesce = false)(clustersBuild(s, dir))

  private def clustersBuild(s: SparkSession, dir: String): DataFrame = {
    val nodes = t(s, dir, "documents").select(col("doc_id").as("id"))
    val edges = Dedup.dedupMinhashLsh(s, dir)
      .filter(col("jaccard") >= 0.2)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val cc = connectedComponents(nodes, edges)
    val sizes = cc.groupBy("canonical").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "canonical")
      .select(col("id").as("doc_id"), col("canonical").as("canonical_id"),
        col("cluster_size"))
  }

  /** SOFT DEDUP (r8 — DOWNWEIGHT duplicates instead of dropping:
    * keeping one weighted copy per near-dup cluster bounds a
    * duplicate's gradient mass while preserving corpus diversity —
    * the alternative several production pipelines prefer to hard
    * removal). Per-doc weight = 1/cluster_size carried as exact ppm
    * BIGINTs (1e6 DIV size — the RRF device), so the per-source
    * effective sizes sum order-free on both engines. Scale shape:
    * the cluster table (bounded-LSH CC output) joins back to the
    * corpus on doc_id — an equi-join — and everything after is one
    * partial-agg groupBy. */
  def pipelineSoftDedup: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val clusters = dedupClusters(s, dir)
    docs.join(clusters, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_id")).as("n_clusters"),
        sum(col("n_chars")).as("raw_chars"),
        sum(col("n_chars") * expr("1000000L DIV cluster_size")).as("eff_chars_ppm"))
  }

  /** DROP-EXPLANATION LEDGER (r13 — the dedup-debuggability table a
    * curation reviewer reads: for every document a clustering pass
    * dropped, WHICH canonical displaced it and HOW similar the nearest
    * evidence edge was): non-canonical cluster members joined to their
    * direct near-dup edges — per doc the partner count, the strongest
    * edge's Jaccard, and that best partner under the deterministic
    * (jaccard DESC, partner ASC) order (a min_by over a total-order
    * struct — partial agg, no window). Everything is pair-table-sized;
    * the corpus never re-joins. */
  def dedupExplain: Q = (s, dir) => {
    val clusters = dedupClusters(s, dir)
    val pairs = Dedup.dedupMinhashLsh(s, dir)
    val sym = pairs.select(col("id_a").as("doc_id"), col("id_b").as("partner"), col("jaccard"))
      .unionAll(pairs.select(col("id_b").as("doc_id"), col("id_a").as("partner"), col("jaccard")))
    val best = sym.groupBy("doc_id")
      .agg(count(lit(1)).as("n_partners"),
        max(round(col("jaccard"), 6)).as("best_jaccard"),
        min_by(col("partner"),
          struct((-round(col("jaccard"), 9)).as("nj"), col("partner"))).as("best_partner"))
    clusters.filter(col("doc_id") =!= col("canonical_id"))
      .join(best, "doc_id")
      .select("doc_id", "canonical_id", "cluster_size",
        "n_partners", "best_partner", "best_jaccard")
  }

  lazy val dedupExplainSql: String =
    s"""WITH cl AS (
       |${dedupClustersSql}
       |),
       |p AS (
       |${Dedup.dedupMinhashLshSql}
       |),
       |sym AS (
       |  SELECT id_a AS doc_id, id_b AS partner, jaccard FROM p
       |  UNION ALL SELECT id_b, id_a, jaccard FROM p),
       |best AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_partners,
       |    MAX(round(jaccard, 6)) AS best_jaccard
       |  FROM sym GROUP BY doc_id),
       |bp AS (
       |  SELECT doc_id, partner AS best_partner FROM (
       |    SELECT doc_id, partner, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY round(jaccard, 9) DESC, partner) AS rn
       |    FROM sym) WHERE rn = 1)
       |SELECT cl.doc_id, cl.canonical_id, cl.cluster_size,
       |  best.n_partners, bp.best_partner, best.best_jaccard
       |FROM cl JOIN best USING (doc_id) JOIN bp USING (doc_id)
       |WHERE cl.doc_id <> cl.canonical_id""".stripMargin

  // lazy: refers to dedupClustersSql, declared below (object init order)
  lazy val pipelineSoftDedupSql: String =
    s"""WITH sd AS (
       |${dedupClustersSql}
       |)
       |SELECT d.source, COUNT(*) AS n_docs,
       |  COUNT(DISTINCT sd.canonical_id) AS n_clusters,
       |  CAST(SUM(d.n_chars) AS BIGINT) AS raw_chars,
       |  CAST(SUM(d.n_chars * (1000000 // sd.cluster_size)) AS BIGINT) AS eff_chars_ppm
       |FROM sd JOIN documents d USING (doc_id)
       |GROUP BY d.source""".stripMargin

  val dedupClustersSql: String = {
    // reuse the full minhash pipeline SQL as the edge CTE (a nested
    // WITH...SELECT is a valid CTE body)
    val pairSql = Dedup.dedupMinhashLshSql
    s"""WITH RECURSIVE pairs AS ($pairSql),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs WHERE jaccard >= 0.2),
       |sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
       |reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT sym.b, reach.r FROM sym JOIN reach ON reach.v = sym.a),
       |cc AS (SELECT v AS doc_id, MIN(r) AS canonical_id FROM reach GROUP BY v),
       |sizes AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM cc GROUP BY canonical_id)
       |SELECT cc.doc_id, cc.canonical_id, sizes.cluster_size
       |FROM cc JOIN sizes USING (canonical_id)""".stripMargin
  }

  /** Embedding-space cluster dedup driven by the corpus k-NN graph
    * ([[Similarity.simKnnGraph]]): edges are k-NN entries with
    * cos_sim >= 0.3 (the same near-dup bar as dedup_embedding), made
    * undirected, then min-label connected components over all vec_ids.
    * Composing the BOUNDED k-NN graph (<= k edges per node from banded
    * candidates) instead of the all-pairs near-dup set keeps the edge
    * count O(n·k) no matter how dense the similarity neighborhoods get
    * — the 100 TB-safe cluster-formation shape for embeddings. */
  def dedupKnnClusters: Q = (s, dir) => {
    val nodes = t(s, dir, "embeddings").select(col("vec_id").as("id"))
    val edges = Similarity.simKnnGraph(s, dir)
      .filter(col("cos_sim") >= 0.3)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val cc = connectedComponents(nodes, edges)
    val sizes = cc.groupBy("canonical").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "canonical")
      .select(col("id").as("vec_id"), col("canonical").as("canonical_id"),
        col("cluster_size"))
  }

  val dedupKnnClustersSql: String = {
    val knnSql = Similarity.simKnnGraphSql
    s"""WITH RECURSIVE knn AS ($knnSql),
       |edges AS (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM knn WHERE cos_sim >= 0.3),
       |sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
       |reach(v, r) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT sym.b, reach.r FROM sym JOIN reach ON reach.v = sym.a),
       |cc AS (SELECT v AS vec_id, MIN(r) AS canonical_id FROM reach GROUP BY v),
       |sizes AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM cc GROUP BY canonical_id)
       |SELECT cc.vec_id, cc.canonical_id, sizes.cluster_size
       |FROM cc JOIN sizes USING (canonical_id)""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "dedup_clusters" -> dedupClusters,
    "dedup_explain" -> dedupExplain,
    "pipeline_soft_dedup" -> pipelineSoftDedup,
    "dedup_knn_clusters" -> dedupKnnClusters)
  val oracles: Map[String, String] = Map(
    "dedup_clusters" -> dedupClustersSql,
    "dedup_explain" -> dedupExplainSql,
    "pipeline_soft_dedup" -> pipelineSoftDedupSql,
    "dedup_knn_clusters" -> dedupKnnClustersSql)
}
