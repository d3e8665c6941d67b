package graft.queries

import scala.collection.immutable.ListMap
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Lexicons, TextExprs, VectorExprs}
import graft.operators.{Dedup, GlobalRank, JoinOps, Profiler, Retrieval, Similarity, SurveyPipeline, TextAnalysis, TopKAgg}
import graft.multimodal.Multimodal
import graft.sources.Tables
import graft.queries.QueryHelpers._

/** Graph analytics over fixture-derived edge sets: components,
  * centrality, cores, random walks, link prediction.
  *
  * Query/oracle pairs split out of the SparkEntry book (round 13);
  * aggregated by [[graft.SparkEntry]]. Conventions in QueryHelpers. */
private[graft] object GraphQueries extends QueryBook {

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q99_pmi_cooccur" -> ((s, dir) => {
      // Pointwise mutual information over document-level token
      // co-occurrence — the collocation / phrase-mining primitive
      // (PMI(a,b) = ln(P(a,b) / (P(a)P(b))) with doc-level events).
      // Scale shape: the pair explosion is BOUNDED by restricting to the
      // top-K corpus tokens (K=20, deterministic df-desc/token-asc cutoff)
      // before pairing, so the pair stream is ≤ K²/2 rows per doc no
      // matter how large the corpus — the unrestricted form is O(L²) per
      // doc and unshippable. The top-K table is K rows → broadcast to
      // both the per-doc semi-filter and the final count joins; the only
      // full-corpus shuffles are the df hash-agg and the pair hash-agg
      // (both map-side combined). The self-join runs on doc_id with both
      // sides ≤ K rows per key. All counts integer; the single float op
      // (ln) happens once per surviving pair, rounded 6dp.
      val docToks = t(s, dir, "documents")
        .select(col("doc_id"),
          array_distinct(split(TextExprs.cleanText(col("text")), " ")).as("ts"))
      val nDocs = docToks.agg(count(lit(1)).as("n_docs"))
      val tok = docToks.select(col("doc_id"), explode(col("ts")).as("tok"))
      val topk = tok.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc).limit(20)
      val tf = tok.join(broadcast(topk.select("tok")), "tok")
      val pairs = tf.select(col("doc_id"), col("tok").as("tok_a"))
        .join(tf.select(col("doc_id"), col("tok").as("tok_b")), "doc_id")
        .where(col("tok_a") < col("tok_b"))
      pairs.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 5)
        .join(broadcast(topk.select(col("tok").as("tok_a"), col("n").as("n_a"))), "tok_a")
        .join(broadcast(topk.select(col("tok").as("tok_b"), col("n").as("n_b"))), "tok_b")
        .crossJoin(broadcast(nDocs))
        .select(col("tok_a"), col("tok_b"), col("n_ab"),
          round(log(col("n_ab").cast("double") * col("n_docs") /
            (col("n_a").cast("double") * col("n_b"))), 6).as("pmi"))
    }),

    "q130_textrank" -> ((s, dir) => {
      // TextRank keyword ranking (Mihalcea & Tarau 2004): weighted
      // PageRank over the corpus word co-occurrence graph — the
      // unsupervised keyphrase primitive, and the engine's fixed-point
      // GRAPH dataflow (q53's connected components converge to a label;
      // this iterates a numeric rank to a damped stationary point).
      // Scale shape (operators.PageRank): the normalized edge table is
      // built ONCE (one corpus pass + map-combined hash-agg) and eagerly
      // localCheckpoint'ed — the CC lineage-truncation posture — so the
      // 5 unrolled iterations read shuffle-ready blocks (PlanSpec pins
      // ZERO source scans in the final plan); each iteration is join +
      // hash-agg on well-spread token keys — no windows, no driver
      // collect of corpus-sized state. The symmetric graph has no
      // dangling nodes, so damping mass is closed-form.
      val toks = t(s, dir, "documents")
        .select(split(lower(TextExprs.cleanText(col("text"))), " ").as("ts"))
      val edges = graft.operators.PageRank.adjacencyEdges(toks)
      graft.operators.PageRank.ranks(edges, iters = 5, damping = 0.85)
        .select(col("tok"), round(col("pr"), 6).as("pr"))
    }),

    "q134_source_authority" -> ((s, dir) => {
      // Source-authority mixture weighting — PageRank over the INTER-
      // SOURCE shared-content graph (q108's overlap matrix as symmetric
      // edges, weight = shared distinct shingles): the CommonCrawl-style
      // domain-authority recipe for weighting feeds in a mixture —
      // sources whose content many other sources replicate rank higher.
      // Operator COMPOSITION: CorpusOverlap builds the bounded edge list
      // (corpus-sized work, |sources|²-bounded output), PageRank iterates
      // on the tiny graph, and the normalization to mixture weights is a
      // one-row broadcast cross join. All heavy lifting is q108's single
      // reused distinct-shingle exchange.
      // the edge list is bounded by C(|sources|, 2) — a property of the
      // source ENUM, not the corpus — so materialize it once to a local
      // relation (the k-means-centroid posture) instead of letting five
      // iteration subtrees re-reference the corpus-sized overlap pipeline
      val ov = graft.operators.CorpusOverlap.sourceOverlap(
        t(s, dir, "documents"), col("source"), col("text"), n = 5)
      val edgeRows = ov.select(col("src_a"), col("src_b"), col("inter")).collect()
      import s.implicits._
      val sym = edgeRows.toSeq.flatMap { r =>
        val (a, b, w) = (r.getString(0), r.getString(1), r.getLong(2))
        Seq((a, b, w), (b, a, w))
      }.toDF("u", "v", "w")
      val pr = graft.operators.PageRank.ranks(sym, iters = 5, damping = 0.85,
        materialize = false)
      val tot = pr.agg(sum("pr").as("_tot"))
      pr.crossJoin(broadcast(tot))
        .select(col("tok").as("source"), round(col("pr"), 6).as("authority"),
          round(col("pr") / col("_tot"), 6).as("mix_w"))
    }),

    "q147_knn_graph" -> ((s, dir) => {
      // Mutual k-NN GRAPH clustering over the embedding corpus: each
      // vector's top-4 cosine neighbors, an edge kept only when BOTH
      // endpoints pick each other (mutuality prunes hub noise — the
      // NN-descent/graph-clustering baseline), connected components
      // label the clusters, singletons keep their own id. Candidate
      // generation is deterministic 8-plane LSH BLOCKING (q34's
      // md5-derived hyperplane buckets — DuckDB-replicable, so the twin
      // ranks the identical candidate set): pairs meet only inside
      // their bucket, an EQUI-join on the bucket key, so the pair
      // volume is Σ|bucket|² ≈ n²/2^planes, never the n² crossJoin.
      // At 100 TB candidates come from the q123 IVF index instead and
      // the downstream — per-node bounded-heap top-k, n·k mutuality
      // self-join, CC — is UNCHANGED.
      val planes = VectorExprs.deterministicPlanes(8, 64)
      val e = t(s, dir, "embeddings")
      val sims = graft.operators.Similarity.lshCandidatePairs(
        e, col("vec_id"), col("embedding"),
        e, col("vec_id"), col("embedding"), planes)
      // bounded heap, NOT a window: partial aggregation reduces every map
      // partition to ≤4 rows per node before the shuffle, so the bucketed
      // score stream is never exchanged or sorted (TopKAgg tie-break = the
      // window's (cos DESC, id ASC)); the n·k result is checkpointed
      // eagerly because BOTH mutuality sides and CC read it — without the
      // pin the self-join re-evaluates the whole candidate pipeline
      val topk = graft.operators.TopKAgg
        .perKey(sims, col("id_a"), col("cos"), col("id_b"), 4)
        .select(col("_k").as("id_a"), col("id").as("id_b"))
        .localCheckpoint(true)
      val mutual = topk.join(
          topk.select(col("id_b").as("id_a"), col("id_a").as("id_b")),
          Seq("id_a", "id_b"))
        .where(col("id_a") < col("id_b"))
      val labels = graft.operators.Dedup.connectedComponents(mutual)
        .withColumnRenamed("node", "vec_id")
      val lab = e.select(col("vec_id")).join(labels, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("component"), col("vec_id")).as("cluster_id"))
      val sizes = lab.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      lab.join(sizes, "cluster_id")
        .select(col("vec_id"), col("cluster_id"), col("cluster_size"))
    }),

    "q173_label_propagation" -> ((s, dir) => {
      // One-hop LABEL PROPAGATION over the near-dup graph: docs with
      // held-out labels (doc_id % 5 == 0 simulates the unlabeled pool)
      // inherit the MAJORITY lang of their labeled near-duplicates
      // (minhash-LSH pairs + exact verify, q27's operator) — the label-
      // transfer step that lets one labeling pass cover every copy of
      // the same content; ties break to the min label. Majority is the
      // q98 two-pass argmax (per-node max count joined back, min label
      // among ties) — no per-node window, no collect.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select("id_a", "id_b")
      val sym = pairs.union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      val labels = docs.where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("id_b"), col("lang"))
      val nbhd = sym.where(col("id_a") % 5 === 0).join(labels, "id_b")
      val cnts = nbhd.groupBy("id_a", "lang").agg(count(lit(1)).as("c"))
      val mx = cnts.groupBy("id_a")
        .agg(max("c").as("_mc"), sum("c").as("n_labeled_neighbors"))
      cnts.join(mx, "id_a").where(col("c") === col("_mc"))
        .groupBy("id_a", "n_labeled_neighbors")
        .agg(min("lang").as("pred_lang"))
        .select(col("id_a").as("doc_id"), col("pred_lang"),
          col("n_labeled_neighbors"))
    }),

    "q197_neardup_assortativity" -> ((s, dir) => {
      // Degree assortativity of the verified near-dup graph: Pearson r
      // over symmetrized edge-endpoint degrees — positive means heavy
      // duplicators link to each other (template families), negative
      // means hubs absorbing singletons (one canonical + many variants);
      // the two regimes want different keep policies. Candidates are
      // q27's banded LSH (never all-pairs); degrees and every Σ are LONG
      // so the coefficient is exact in both engines.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select("id_a", "id_b")
      val deg = pairs.select(col("id_a").as("id"))
        .unionAll(pairs.select(col("id_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val sym = pairs
        .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
        .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
        .select(col("da").as("x"), col("db").as("y"))
        .unionAll(pairs
          .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
          .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
          .select(col("db").as("x"), col("da").as("y")))
      val m = sym.agg(count(lit(1)).as("m"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      val nodes = deg.agg(count(lit(1)).as("n_nodes"), sum("deg").as("_sd"))
      val num = (col("m") * col("sxy") - col("sx") * col("sy")).cast("double")
      val den = sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
        sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double"))
      m.crossJoin(broadcast(nodes))
        .select((col("m") / 2).cast("long").as("n_edges"), col("n_nodes"),
          round(col("_sd").cast("double") / col("n_nodes"), 4).as("mean_degree"),
          when(den > 0, round(num / den, 6)).as("assortativity"))
    }),

    "q200_event_transitions" -> ((s, dir) => {
      // First-order behavioral Markov matrix: session-gated (≤30 min
      // gap) next-event transition counts and row-normalized
      // probabilities — the background model that q185's bot profile and
      // any sequence-model pretraining both start from. One partitioned
      // window pass (lead shares q35's partitioning); the matrix is
      // |types|² rows, the normalizer a broadcast row-total join.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("_next", lead("event_type", 1).over(w))
        .withColumn("_gap_us",
          lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .where(col("_next").isNotNull && col("_gap_us") <= 1800L * 1000000L)
        .groupBy(col("event_type").as("cur_type"), col("_next").as("next_type"))
        .agg(count(lit(1)).as("n_transitions"))
      val totals = trans.groupBy("cur_type")
        .agg(sum("n_transitions").as("_rt"))
      trans.join(broadcast(totals), "cur_type")
        .select(col("cur_type"), col("next_type"), col("n_transitions"),
          round(col("n_transitions").cast("double") / col("_rt"), 4).as("p"))
    }),

    "q209_session_basket_lift" -> ((s, dir) => {
      // Association lift between event types CO-PRESENT in a session
      // (order-free, unlike q200's adjacent transitions): lift > 1 means
      // the pair travels together across sessions. Sessions from q35's
      // one-window pass; the distinct (session, type) projection is the
      // only corpus-sized shuffle — pair/single supports and the lift
      // arithmetic run on session-cardinality tables.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val st = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("_gap_us"))
        .withColumn("_new_sess",
          when(col("_gap_us").isNull || col("_gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_no", sum("_new_sess").over(wRun))
        .select(col("user_id"), col("session_no"), col("event_type"))
        .distinct()
      val nSess = st.select("user_id", "session_no").distinct()
        .agg(count(lit(1)).as("n_sessions"))
      val singles = st.groupBy("event_type").agg(count(lit(1)).as("n_with"))
      val pairs = st.as("a").join(st.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.session_no") === col("b.session_no") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(singles.select(col("event_type").as("type_a"),
          col("n_with").as("_na"))), "type_a")
        .join(broadcast(singles.select(col("event_type").as("type_b"),
          col("n_with").as("_nb"))), "type_b")
        .crossJoin(broadcast(nSess))
        .select(col("type_a"), col("type_b"), col("n_both"),
          round((col("n_both") * col("n_sessions")).cast("double") /
            (col("_na") * col("_nb")), 4).as("lift"))
    }),

    "q223_triangle_census" -> ((s, dir) => {
      // Triangle census of the part co-purchase graph — the clustering
      // structure behind "bought together" analysis, computed the
      // node-iterator way (Suri & Vassilvitskii 2011, "Counting triangles
      // and the curse of the last reducer"): edges canonicalized u < v,
      // wedges formed by ONE equi-join on the shared endpoint, closed by
      // an equi-join back onto the edge list — never an all-pairs
      // product. Support >= 2 (parts co-ordered at least twice)
      // sparsifies the edge set first, the standard mining cut that also
      // bounds wedge fan-out at scale. Global clustering coefficient =
      // 3·triangles / wedges, every term an exact integer.
      val edges = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
        .select(col("p1").as("u"), col("p2").as("v"))
        .localCheckpoint() // degree census + both wedge sides + the closer
      val deg = edges.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val base = deg.agg(count(lit(1)).as("n_nodes"),
        (sum(col("d") * (col("d") - 1)) / 2).cast("long").as("n_wedges"))
      val ne = edges.agg(count(lit(1)).as("n_edges"))
      val tri = edges.as("e1").join(edges.as("e2"), col("e1.v") === col("e2.u"))
        .select(col("e1.u").as("x"), col("e2.v").as("z"))
        .join(edges.as("e3"), col("x") === col("e3.u") && col("z") === col("e3.v"))
        .agg(count(lit(1)).as("n_triangles"))
      base.crossJoin(ne).crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
          round(col("n_triangles") * 3.0 / col("n_wedges"), 6).as("global_cc"))
    }),

    "q229_path_trigrams" -> ((s, dir) => {
      // Order-sensitive 3-step behavioral paths: consecutive event-type
      // triples within a session (both inter-step gaps <= 30 min) —
      // one partitioned window with two leads, completing the n-gram
      // ladder over the event stream (q200 = adjacent transitions,
      // q209 = order-free co-presence). Output is bounded by |types|³;
      // share normalizes over observed triples.
      val w = Window.partitionBy("user_id").orderBy(col("e"), col("event_id"))
      val tri = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("e"))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("e2", lead(col("e"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .withColumn("e3", lead(col("e"), 2).over(w))
        .where(col("t3").isNotNull &&
          col("e2") - col("e") <= 1800 && col("e3") - col("e2") <= 1800)
        .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
          col("t3").as("step3"))
        .agg(count(lit(1)).as("n"))
      val tot = tri.agg(sum("n").as("_tot"))
      tri.crossJoin(broadcast(tot))
        .select(col("step1"), col("step2"), col("step3"), col("n"),
          round(col("n").cast("double") / col("_tot"), 4).as("share"))
    }),

    "q250_markov_stationary" -> ((s, dir) => {
      // Steady-state attention share of the behavioral Markov chain:
      // damped power iteration (PageRank.ranks — the q130 fixed-point
      // dataflow with its checkpoint-once contribution table) over
      // q200's session-gated transition graph, normalized to a
      // distribution and set against each type's RAW traffic share —
      // where users SETTLE vs where they merely pass through. The graph
      // is |types|² rows; five unrolled join+agg rounds touch only that.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val edges = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("_next", lead("event_type", 1).over(w))
        .withColumn("_gap_us",
          lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .where(col("_next").isNotNull && col("_gap_us") <= 1800L * 1000000L)
        .groupBy(col("event_type").as("u"), col("_next").as("v"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint() // |types|² rows; 5 rounds must not rescan events
      val pr = graft.operators.PageRank.ranks(edges, iters = 5,
        materialize = false)
      val mass = pr.agg(sum("pr").as("_mass"))
      val raw = t(s, dir, "events").groupBy(col("event_type").as("tok"))
        .agg(count(lit(1)).as("n_events"))
      val rawTot = broadcast(raw.agg(sum("n_events").as("_tot")))
      pr.crossJoin(broadcast(mass)).join(raw, "tok").crossJoin(rawTot)
        .select(col("tok").as("event_type"), col("n_events"),
          round(col("pr"), 6).as("pagerank"),
          round(col("pr") / col("_mass"), 6).as("steady_share"),
          round(col("n_events").cast("double") / col("_tot"), 6).as("raw_share"))
    }),

    "q253_nation_flows" -> ((s, dir) => {
      // TPC-H Q7-shaped trade-flow matrix, generalized to ALL nation
      // pairs: revenue shipped from each supplier nation to each
      // (different) customer nation per year — the cross-border flow
      // table Q7 samples two cells of. Dims broadcast, lineitem⋈orders
      // the one shuffle join, exact cents; output bounded by
      // |nations|²·years.
      val nat = t(s, dir, "nation")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      val custN = broadcast(t(s, dir, "customer").as("c")
        .join(nat.as("cn"), col("c.c_nationkey") === col("cn.n_nationkey"))
        .select(col("c.c_custkey"), col("cn.n_name").as("cust_nation")))
      val ords = t(s, dir, "orders")
        .join(custN, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"),
          year(col("o_orderdate")).cast("long").as("yr"))
      val supN = broadcast(t(s, dir, "supplier").as("s2")
        .join(nat.as("sn"), col("s2.s_nationkey") === col("sn.n_nationkey"))
        .select(col("s2.s_suppkey"), col("sn.n_name").as("supp_nation")))
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(count(lit(1)).as("n_lines"), sum("cents").as("cents"))
        .select(col("supp_nation"), col("cust_nation"), col("yr").as("year"),
          col("n_lines"), round(col("cents").cast("double") / 100.0, 2).as("revenue"))
    }),

    "q267_kcore" -> ((s, dir) => {
      // k-core decomposition (k=3) of the part co-purchase graph —
      // the standard community-mining prefilter (Seidman 1983): peel
      // nodes of degree < k until a fixpoint. Edges = part pairs
      // sharing ≥ 2 orders (pair fan-out bounded by C(items/order, 2)).
      // The peel iterates DRIVER-side over distributed degree
      // aggregates + semi-joins on the shrinking alive set, each round
      // localCheckpoint-pinned so round n+1 never replays rounds 1..n
      // — the star-contraction discipline; O(peel-depth) rounds, each
      // one shuffle of the surviving edge list. The oracle mirrors it
      // as a bounded recursive CTE (extra rounds are no-ops after
      // convergence).
      val edges = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
      // `converged` pins the oracle's bounded recursion to the Spark side's
      // fixpoint: KCore.core only returns AT the fixpoint (true by
      // construction here), while the twin compares its iter-23 and iter-24
      // survivor counts — a fixture needing > 24 peel rounds flips the
      // oracle's column to false and the gate fails loudly instead of
      // silently comparing against a not-yet-converged core.
      graft.operators.KCore.core(edges, k = 3)
        .select(col("node").as("p_partkey"), col("deg").as("core_degree"),
          lit(true).as("converged"))
    }),

    "q271_clustering_coeff" -> ((s, dir) => {
      // Local clustering coefficient over the q267 co-purchase graph:
      // cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the per-node
      // transitivity behind q223's global triangle census. Triangles
      // come from the node-iterator wedge join (ab ⋈ bc ⋈ ac on the
      // ordered edge list — each triangle counted once, attributed to
      // all three corners); degrees from one edge-list aggregate. The
      // edge list is pinned: four consumers, one materialization.
      val e = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
        .localCheckpoint()
      val deg = e.select(col("p1").as("node"))
        .unionAll(e.select(col("p2").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val tri = graft.operators.CoPurchase.triangles(e)
      val triPerNode = tri.select(col("x").as("node"))
        .unionAll(tri.select(col("y").as("node")))
        .unionAll(tri.select(col("z").as("node")))
        .groupBy("node").agg(count(lit(1)).as("tri"))
      deg.join(triPerNode, Seq("node"), "left")
        .na.fill(0L, Seq("tri"))
        .select(col("node").as("p_partkey"), col("deg"), col("tri"),
          when(col("deg") >= 2,
            round(col("tri") * 2.0 / (col("deg") * (col("deg") - 1)), 6))
            .otherwise(0.0).as("clustering_coeff"))
    }),

    "q276_edge_embeddedness" -> ((s, dir) => {
      // Edge embeddedness over the co-purchase graph: common-neighbor
      // count per EDGE (each triangle credits its three edges — the
      // q271 wedge join re-keyed to edges), rolled into a distribution
      // with the LOCAL-BRIDGE share (embeddedness 0 = Granovetter weak
      // ties; at 100 TB these are the cross-community links a
      // partitioner must not cut). Edge list pinned, one wedge join,
      // |distinct embeddedness| output rows.
      val e = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
        .localCheckpoint()
      val tri = graft.operators.CoPurchase.triangles(e)
      // each triangle (x<y<z) credits edges (x,y), (y,z), (x,z)
      val perEdge = tri.select(col("x").as("p1"), col("y").as("p2"))
        .unionAll(tri.select(col("y").as("p1"), col("z").as("p2")))
        .unionAll(tri.select(col("x").as("p1"), col("z").as("p2")))
        .groupBy("p1", "p2").agg(count(lit(1)).as("emb"))
      val dist = e.join(perEdge, Seq("p1", "p2"), "left")
        .na.fill(0L, Seq("emb"))
        .groupBy("emb").agg(count(lit(1)).as("n_edges"))
      dist.crossJoin(broadcast(dist.agg(sum("n_edges").as("te"))))
        .select(col("emb").as("embeddedness"), col("n_edges"),
          round(col("n_edges").cast("double") / col("te"), 6)
            .as("edge_share"),
          (col("emb") === 0L).as("is_local_bridge"))
    }),

    "q282_bfs_hops" -> ((s, dir) => {
      // Hop-distance census by unrolled BFS (4 rounds) from the
      // highest-degree hub of the co-purchase graph — the landmark-
      // distance sketch behind graph-diameter estimates at scale: each
      // round ONE join of the frontier against the pinned edge list +
      // an anti-join on the visited set (ids only). Emits how much of
      // the graph each hop ring reaches; 'unreached' rounds up the
      // census so the rings provably tile the node set.
      val e = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
        .localCheckpoint()
      val und = e.select(col("p1").as("u"), col("p2").as("v"))
        .unionAll(e.select(col("p2").as("u"), col("p1").as("v")))
        .localCheckpoint()
      val hub = und.groupBy("u").agg(count(lit(1)).as("deg"))
        .orderBy(col("deg").desc, col("u").asc).limit(1)
        .select(col("u").as("node"), lit(0L).as("hop"))
      var visited = hub.localCheckpoint()
      var frontier = visited
      for (h <- 1L to 4L) {
        val next = frontier.join(und, col("node") === col("u"))
          .select(col("v").as("node")).distinct()
          .join(visited.select(col("node").as("_vn")),
            col("node") === col("_vn"), "left_anti")
          .select(col("node"), lit(h).as("hop"))
          .localCheckpoint()
        // visited is a union of already-pinned rings — no re-checkpoint
        visited = visited.unionAll(next)
        frontier = next
      }
      val ringed = visited.groupBy("hop").agg(count(lit(1)).as("n_nodes"))
      val allNodes = und.select(col("u").as("node")).distinct()
      val unreached = allNodes
        .join(visited.select(col("node").as("_vn")),
          col("node") === col("_vn"), "left_anti")
        .agg(count(lit(1)).as("n_nodes"))
        .select(lit(-1L).as("hop"), col("n_nodes"))
      ringed.unionAll(unreached.where(col("n_nodes") > 0))
    }),

    "q286_link_prediction" -> ((s, dir) => {
      // Common-neighbor link prediction over the co-purchase graph
      // (Liben-Nowell & Kleinberg 2003): candidate pairs are EXACTLY
      // the distance-2 wedge endpoints (never all-pairs), scored by
      // neighborhood Jaccard cn/(deg_u + deg_v − cn), existing edges
      // anti-joined away, top-20 on the rounded score via TakeOrdered.
      // The "customers also bought" candidate generator, stated as a
      // plan: one wedge join + one anti-join + two degree lookups.
      val e = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
        .localCheckpoint()
      val und = e.select(col("p1").as("u"), col("p2").as("v"))
        .unionAll(e.select(col("p2").as("u"), col("p1").as("v")))
      val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
      val wedges = und.as("a").join(und.as("b"),
          col("a.v") === col("b.u") && col("a.u") < col("b.v"))
        .groupBy(col("a.u").as("p1"), col("b.v").as("p2"))
        .agg(count(lit(1)).as("cn"))
      val cand = wedges.join(e, Seq("p1", "p2"), "left_anti")
      cand
        .join(deg.select(col("u").as("p1"), col("deg").as("d1")), Seq("p1"))
        .join(deg.select(col("u").as("p2"), col("deg").as("d2")), Seq("p2"))
        .select(col("p1"), col("p2"), col("cn"),
          round(col("cn").cast("double")
            / (col("d1") + col("d2") - col("cn")), 6).as("jaccard"))
        .orderBy(col("jaccard").desc, col("p1").asc, col("p2").asc)
        .limit(20)
    }),

    "q288_markov_order_test" -> ((s, dir) => {
      // Memorylessness test for the q200/q250 first-order Markov view:
      // in the 3-way table of session-gated (prev, cur, next) triples,
      // test prev ⟂ next | cur — expected cell count E =
      // T(prev,cur,·)·T(·,cur,next)/T(·,cur,·), χ² per middle state
      // over observed cells. A large χ² says the chain remembers more
      // than one step and the first-order transition matrix is a
      // fiction. ALL margins re-aggregate the one pinned trigram
      // table; doubles appear only in the (O−E)²/E display sum over
      // ≤|types|² bounded cells.
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val tri = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("prev", lag("event_type", 2).over(w))
        .withColumn("cur", lag("event_type", 1).over(w))
        .withColumn("g1", col("us") - lag(col("us"), 1).over(w))
        .withColumn("g2", lag(col("us"), 1).over(w) - lag(col("us"), 2).over(w))
        .where(col("prev").isNotNull && col("g1") <= 1800L * 1000000L &&
          col("g2") <= 1800L * 1000000L)
        .groupBy(col("prev"), col("cur"), col("event_type").as("next"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint() // three margins + the cell pass read it
      val mPC = tri.groupBy("prev", "cur").agg(sum("o").as("t_pc"))
      val mCN = tri.groupBy("cur", "next").agg(sum("o").as("t_cn"))
      val mC = tri.groupBy("cur").agg(sum("o").as("t_c"))
      tri.join(mPC, Seq("prev", "cur")).join(mCN, Seq("cur", "next"))
        .join(broadcast(mC), Seq("cur"))
        .select(col("cur"), col("o"),
          ((col("t_pc") * col("t_cn")).cast("double") / col("t_c"))
            .as("e"))
        .groupBy("cur")
        .agg(count(lit(1)).as("n_cells"), sum("o").as("n_trigrams"),
          round(sum(pow(col("o") -
            (col("e")), 2) / col("e")), 4).as("chi_sq"))
    }),

    "q318_markov_entropy" -> ((s, dir) => {
      // Entropy RATE of the q200 behavioral Markov chain (empirical
      // H = −Σᵢⱼ (Tᵢⱼ/N)·ln(Tᵢⱼ/Tᵢ·)) plus its ceiling ln(|states|) and
      // the predictability ratio — how much of the event stream a
      // sequence model can hope to compress. Per-cell log terms are
      // ×10⁶-pinned LONGs weighted by exact counts (Tᵢⱼ·t6 ≤ ~1e13 at
      // sf0.1; at count ~1e12 the weighted sum needs ×10³ rescaling —
      // the q280 overflow-ceiling note applies); the whole computation
      // past the one window pass lives on the |types|² cell table.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("_next", lead("event_type", 1).over(w))
        .withColumn("_gap_us",
          lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .where(col("_next").isNotNull && col("_gap_us") <= 1800L * 1000000L)
        .groupBy(col("event_type").as("cur"), col("_next").as("nxt"))
        .agg(count(lit(1)).as("tij"))
      val tot = trans.groupBy("cur").agg(sum("tij").as("ti"))
      val terms = trans.join(broadcast(tot), "cur")
        .select(col("tij"),
          round(log(col("tij").cast("double") / col("ti")) * 1e6)
            .cast("long").as("t6"))
      terms.agg(sum("tij").as("n_transitions"),
          sum(col("tij") * col("t6")).as("_w"))
        .crossJoin(broadcast(tot.agg(count(lit(1)).as("n_states"))))
        .select(col("n_transitions"), col("n_states"),
          round((-col("_w")).cast("double")
            / (col("n_transitions") * lit(1e6)), 6).as("h_rate"),
          round(log(col("n_states").cast("double")), 6).as("h_max"),
          round(((-col("_w")).cast("double")
            / (col("n_transitions") * lit(1e6)))
            / log(col("n_states").cast("double")), 4).as("predictability"))
    }),

    "q327_lang_modularity" -> ((s, dir) => {
      // Newman modularity of the LANGUAGE partition over the verified
      // near-dup graph (q27's banded LSH, never all-pairs): Q = Σ_c
      // (e_c/m − (d_c/2m)²) — high Q means near-dup structure respects
      // language boundaries (dedup can shard by lang); low/negative Q
      // means heavy cross-lingual duplication (translations / boilerplate)
      // and a lang-sharded dedup would MISS pairs — the go/no-go number
      // for the most natural 100 TB partitioning of a multilingual crawl.
      // Everything stays LONG (Q = (4m·Σe_c − Σd_c²) / 4m²) until the one
      // final division, rounded 6dp — no float-order drift possible.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select("id_a", "id_b")
        .localCheckpoint() // two consumers: edge-lang join + degree agg
      val lang = docs.select(col("doc_id"), col("lang"))
      val eAgg = pairs
        .join(lang.select(col("doc_id").as("id_a"), col("lang").as("la")), "id_a")
        .join(lang.select(col("doc_id").as("id_b"), col("lang").as("lb")), "id_b")
        .agg(count(lit(1)).as("n_edges"),
          sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_intra_edges"))
      val dc = pairs.select(col("id_a").as("doc_id"))
        .unionAll(pairs.select(col("id_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("deg"))
        .join(lang, "doc_id")
        .groupBy("lang").agg(sum("deg").as("d_c"))
      val dAgg = dc.agg(sum(col("d_c") * col("d_c")).as("_dc2"),
        count(lit(1)).as("n_communities"))
      eAgg.crossJoin(broadcast(dAgg))
        .select(col("n_edges"), col("n_communities"), col("n_intra_edges"),
          round((lit(4L) * col("n_edges") * col("n_intra_edges") - col("_dc2"))
              .cast("double")
            / (lit(4L) * col("n_edges") * col("n_edges")).cast("double"), 6)
            .as("modularity"))
    }),
  )

  val oracleSql: ListMap[String, String] = ListMap(
      "q318_markov_entropy" ->
        """WITH o AS (SELECT user_id, event_type, ts, event_id,
          |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS nxt,
          |    lead(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) - epoch_us(ts::TIMESTAMP) AS gap_us
          |  FROM events),
          |tr AS (SELECT event_type AS cur, nxt, CAST(count(*) AS BIGINT) AS tij
          |  FROM o WHERE nxt IS NOT NULL AND gap_us <= 1800000000
          |  GROUP BY 1, 2),
          |tt AS (SELECT cur, CAST(sum(tij) AS BIGINT) AS ti FROM tr GROUP BY 1),
          |te AS (SELECT tr.tij,
          |   CAST(round(ln(CAST(tr.tij AS DOUBLE) / tt.ti) * 1e6) AS BIGINT)
          |     AS t6 FROM tr JOIN tt ON tr.cur = tt.cur),
          |k AS (SELECT CAST(count(*) AS BIGINT) AS n_states FROM tt),
          |a AS (SELECT CAST(sum(tij) AS BIGINT) AS n_transitions,
          |   CAST(sum(tij * t6) AS BIGINT) AS w FROM te)
          |SELECT a.n_transitions, k.n_states,
          | round(CAST(-a.w AS DOUBLE) / (a.n_transitions * 1e6), 6) AS h_rate,
          | round(ln(CAST(k.n_states AS DOUBLE)), 6) AS h_max,
          | round((CAST(-a.w AS DOUBLE) / (a.n_transitions * 1e6))
          |   / ln(CAST(k.n_states AS DOUBLE)), 4) AS predictability
          |FROM a, k""".stripMargin,
      "q99_pmi_cooccur" ->
        s"""WITH docs AS (SELECT doc_id,
           |   list_distinct(string_split(${cleanSql("text")}, ' ')) AS ts FROM documents),
           |tok AS (SELECT doc_id, unnest(ts) AS tok FROM docs),
           |dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY tok),
           |topk AS (SELECT tok, n FROM dfc ORDER BY n DESC, tok ASC LIMIT 20),
           |tf AS (SELECT t.doc_id, t.tok FROM tok t JOIN topk USING (tok)),
           |pc AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
           |   CAST(count(*) AS BIGINT) AS n_ab
           |  FROM tf a JOIN tf b ON a.doc_id = b.doc_id AND a.tok < b.tok
           |  GROUP BY 1, 2 HAVING count(*) >= 5),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs)
           |SELECT tok_a, tok_b, n_ab,
           | round(ln(n_ab * 1.0 * n_docs / (ka.n * 1.0 * kb.n)), 6) AS pmi
           |FROM pc JOIN topk ka ON pc.tok_a = ka.tok
           | JOIN topk kb ON pc.tok_b = kb.tok CROSS JOIN nn""".stripMargin,

      "q130_textrank" -> {
        val base =
          s"""WITH tk AS (SELECT string_split(lower(${cleanSql("text")}), ' ') AS ts FROM documents),
             |a0 AS (SELECT unnest(ts[:len(ts)-1]) AS u, unnest(ts[2:]) AS v
             |  FROM tk WHERE len(ts) >= 2),
             |ad AS (SELECT u, v FROM a0 WHERE u <> '' AND v <> '' AND u <> v),
             |ed AS (SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM
             |   (SELECT u, v FROM ad UNION ALL SELECT v AS u, u AS v FROM ad)
             |  GROUP BY u, v),
             |ow AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM ed GROUP BY u),
             |p0 AS (SELECT u AS tok, CAST(1.0 AS DOUBLE) AS pr FROM ow)""".stripMargin
        base + prIterCtes(5) + "\nSELECT tok, round(pr, 6) AS pr FROM p5"
      },

      "q134_source_authority" -> {
        val base =
          s"""WITH t AS (SELECT source,
             |   string_split(${cleanSql("text")}, ' ') AS toks FROM documents),
             |nn AS (SELECT source, toks, len(toks) AS n FROM t WHERE len(toks) >= 5),
             |wi AS (SELECT source, toks,
             |   unnest(generate_series(0, CAST(n - 5 AS BIGINT))) AS pos FROM nn),
             |sh AS (SELECT DISTINCT source, substring(md5(array_to_string(list_slice(toks,
             |   CAST(pos + 1 AS BIGINT), CAST(pos + 5 AS BIGINT)), ' ')), 1, 16) AS h FROM wi),
             |ix AS (SELECT a.source AS src_a, b.source AS src_b,
             |   CAST(count(*) AS BIGINT) AS inter
             |  FROM sh a JOIN sh b USING (h) WHERE a.source < b.source GROUP BY 1, 2),
             |ed AS (SELECT src_a AS u, src_b AS v, inter AS w FROM ix
             |   UNION ALL SELECT src_b AS u, src_a AS v, inter AS w FROM ix),
             |ow AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM ed GROUP BY u),
             |p0 AS (SELECT u AS tok, CAST(1.0 AS DOUBLE) AS pr FROM ow)""".stripMargin
        base + prIterCtes(5) +
          """,
            |tt AS (SELECT sum(pr) AS tot FROM p5)
            |SELECT tok AS source, round(pr, 6) AS authority,
            | round(pr / tot, 6) AS mix_w
            |FROM p5, tt""".stripMargin
      },

      "q147_knn_graph" -> {
        // LSH-bucket candidate blocking replicated with the SAME plane
        // constants the Spark side uses (q34/q153 twin pattern)
        val planes = graft.functions.VectorExprs.deterministicPlanes(8, 64)
        def planeDot(v: String, p: Seq[Double]): String =
          s"list_sum(list_transform(range(1,65), j -> $v[j] * list_extract(${p.mkString("[", ", ", "]")}, j)))"
        val bucket = planes.zipWithIndex.map { case (p, i) =>
          s"(CASE WHEN ${planeDot("v", p)} >= 0 THEN ${1 << i} ELSE 0 END)"
        }.mkString("\n   + ")
        def nrm(v: String): String =
          s"sqrt(list_sum(list_transform(range(1, 65), i -> $v[i] * $v[i])))"
        s"""WITH RECURSIVE c AS (SELECT vec_id, v, CAST($bucket AS BIGINT) AS bkt
           |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
           |s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |   round(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) /
           |    (${nrm("a.v")} * ${nrm("b.v")}), 6) AS cos
           |  FROM c a JOIN c b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id),
           |t AS (SELECT id_a, id_b,
           |   row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b ASC) AS rn
           |  FROM s QUALIFY rn <= 4),
           |m AS (SELECT t1.id_a, t1.id_b FROM t t1
           |  JOIN t t2 ON t1.id_a = t2.id_b AND t1.id_b = t2.id_a
           |  WHERE t1.id_a < t1.id_b),
           |e AS (SELECT id_a AS src, id_b AS dst FROM m
           |  UNION SELECT id_b, id_a FROM m
           |  UNION SELECT id_a, id_a FROM m
           |  UNION SELECT id_b, id_b FROM m),
           |reach AS (SELECT src, dst FROM e
           |  UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
           |comp AS (SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src),
           |lab AS (SELECT a.vec_id, coalesce(p.cluster_id, a.vec_id) AS cluster_id
           |  FROM (SELECT vec_id FROM embeddings) a LEFT JOIN comp p USING (vec_id))
           |SELECT l.vec_id, l.cluster_id, z.cluster_size
           |FROM lab l JOIN (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
           |  FROM lab GROUP BY cluster_id) z USING (cluster_id)""".stripMargin
      },

      // all-pairs exact twin of the banded-LSH engine path — recall caveat
      // documented at q159's oracle entry
      "q173_label_propagation" ->
        s"""$shingleCte,
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |sym AS (SELECT id_a, id_b FROM pairs
           |  UNION ALL SELECT id_b, id_a FROM pairs),
           |nb AS (SELECT s.id_a, d.lang FROM sym s
           |  JOIN documents d ON d.doc_id = s.id_b AND d.doc_id % 5 <> 0
           |  WHERE s.id_a % 5 = 0),
           |c AS (SELECT id_a, lang, CAST(count(*) AS BIGINT) AS c
           |  FROM nb GROUP BY 1, 2),
           |m AS (SELECT id_a, CAST(max(c) AS BIGINT) AS mc,
           |   CAST(sum(c) AS BIGINT) AS n_lab FROM c GROUP BY id_a)
           |SELECT c.id_a AS doc_id, min(c.lang) AS pred_lang,
           | m.n_lab AS n_labeled_neighbors
           |FROM c JOIN m ON c.id_a = m.id_a AND c.c = m.mc
           |GROUP BY 1, 3""".stripMargin,

      // all-pairs exact candidate twin of the banded-LSH engine path —
      // recall caveat documented at q159's oracle entry
      "q197_neardup_assortativity" ->
        s"""$shingleCte,
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
           |   SELECT id_a AS id FROM pairs
           |   UNION ALL SELECT id_b FROM pairs) GROUP BY id),
           |sym AS (SELECT da.deg AS x, db.deg AS y FROM pairs
           |   JOIN deg da ON da.id = pairs.id_a JOIN deg db ON db.id = pairs.id_b
           | UNION ALL
           | SELECT db.deg, da.deg FROM pairs
           |   JOIN deg da ON da.id = pairs.id_a JOIN deg db ON db.id = pairs.id_b),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS m,
           |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |   CAST(sum(x * y) AS BIGINT) AS sxy,
           |   CAST(sum(x * x) AS BIGINT) AS sxx,
           |   CAST(sum(y * y) AS BIGINT) AS syy FROM sym),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           |   CAST(sum(deg) AS BIGINT) AS sd FROM deg)
           |SELECT m.m // 2 AS n_edges, n.n_nodes,
           | round(CAST(n.sd AS DOUBLE) / n.n_nodes, 4) AS mean_degree,
           | CASE WHEN sqrt(CAST(m.m * m.sxx - m.sx * m.sx AS DOUBLE)) *
           |        sqrt(CAST(m.m * m.syy - m.sy * m.sy AS DOUBLE)) > 0
           |      THEN round(CAST(m.m * m.sxy - m.sx * m.sy AS DOUBLE) /
           |        (sqrt(CAST(m.m * m.sxx - m.sx * m.sx AS DOUBLE)) *
           |         sqrt(CAST(m.m * m.syy - m.sy * m.sy AS DOUBLE))), 6) END
           |   AS assortativity
           |FROM m, n""".stripMargin,

      "q200_event_transitions" ->
        """WITH o AS (SELECT user_id, event_type, ts, event_id,
          |   lead(event_type) OVER w AS nxt,
          |   lead(epoch_us(ts::TIMESTAMP)) OVER w
          |     - epoch_us(ts::TIMESTAMP) AS gap_us
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |tr AS (SELECT event_type AS cur_type, nxt AS next_type,
          |   CAST(count(*) AS BIGINT) AS n_transitions
          |  FROM o WHERE nxt IS NOT NULL AND gap_us <= 1800000000
          |  GROUP BY 1, 2),
          |tot AS (SELECT cur_type, CAST(sum(n_transitions) AS BIGINT) AS rt
          |  FROM tr GROUP BY cur_type)
          |SELECT tr.cur_type, tr.next_type, tr.n_transitions,
          | round(CAST(tr.n_transitions AS DOUBLE) / tot.rt, 4) AS p
          |FROM tr JOIN tot USING (cur_type)""".stripMargin,

      "q209_session_basket_lift" ->
        """WITH o AS (SELECT user_id, event_id, ts, event_type,
          |   epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP))
          |     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          |  FROM events),
          |sn AS (SELECT *, sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
          |   THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
          |   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_no
          |  FROM o),
          |st AS (SELECT DISTINCT user_id, session_no, event_type FROM sn),
          |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM
          |  (SELECT DISTINCT user_id, session_no FROM st)),
          |si AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_with
          |  FROM st GROUP BY event_type),
          |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          |   CAST(count(*) AS BIGINT) AS n_both
          |  FROM st a JOIN st b ON a.user_id = b.user_id
          |    AND a.session_no = b.session_no AND a.event_type < b.event_type
          |  GROUP BY 1, 2)
          |SELECT pr.type_a, pr.type_b, pr.n_both,
          | round(CAST(pr.n_both * ns.n_sessions AS DOUBLE) /
          |   (sa.n_with * sb.n_with), 4) AS lift
          |FROM pr JOIN si sa ON sa.event_type = pr.type_a
          |JOIN si sb ON sb.event_type = pr.type_b
          |CROSS JOIN ns""".stripMargin,

      "q223_triangle_census" ->
        """WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |p AS (SELECT a.l_partkey AS u, b.l_partkey AS v,
          |   CAST(count(*) AS BIGINT) AS w
          |  FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
          |    AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2),
          |e AS (SELECT u, v FROM p WHERE w >= 2),
          |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
          |   SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
          |  GROUP BY node),
          |base AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
          |   CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
          |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
          |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
          |  FROM e e1 JOIN e e2 ON e1.v = e2.u
          |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
          |SELECT base.n_nodes, ne.n_edges, base.n_wedges, tri.n_triangles,
          | round(tri.n_triangles * 3.0 / base.n_wedges, 6) AS global_cc
          |FROM base, ne, tri""".stripMargin,

      "q229_path_trigrams" ->
        """WITH ev AS (SELECT user_id, event_id, event_type,
          |   CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
          |w AS (SELECT event_type AS step1,
          |   lead(event_type, 1) OVER win AS step2,
          |   lead(e, 1) OVER win AS e2,
          |   lead(event_type, 2) OVER win AS step3,
          |   lead(e, 2) OVER win AS e3, e
          |  FROM ev WINDOW win AS (PARTITION BY user_id
          |    ORDER BY e, event_id)),
          |tri AS (SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
          |  FROM w WHERE step3 IS NOT NULL
          |    AND e2 - e <= 1800 AND e3 - e2 <= 1800
          |  GROUP BY 1, 2, 3),
          |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM tri)
          |SELECT step1, step2, step3, n,
          | round(CAST(n AS DOUBLE) / tt.tot, 4) AS share
          |FROM tri, tt""".stripMargin,

      "q250_markov_stationary" -> (
        """WITH o AS (SELECT user_id, event_type, ts, event_id,
          |   lead(event_type) OVER w AS nxt,
          |   lead(epoch_us(ts::TIMESTAMP)) OVER w
          |     - epoch_us(ts::TIMESTAMP) AS gap_us
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |ed AS (SELECT event_type AS u, nxt AS v,
          |   CAST(count(*) AS BIGINT) AS w
          |  FROM o WHERE nxt IS NOT NULL AND gap_us <= 1800000000
          |  GROUP BY 1, 2),
          |ow AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM ed GROUP BY u),
          |p0 AS (SELECT u AS tok, 1.0 AS pr FROM ow)""".stripMargin +
        prIterCtes(5) +
        """,
          |m AS (SELECT sum(pr) AS mass FROM p5),
          |raw AS (SELECT event_type AS tok, CAST(count(*) AS BIGINT)
          |   AS n_events FROM events GROUP BY 1),
          |rt AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM raw)
          |SELECT p5.tok AS event_type, raw.n_events,
          | round(p5.pr, 6) AS pagerank,
          | round(p5.pr / m.mass, 6) AS steady_share,
          | round(CAST(raw.n_events AS DOUBLE) / rt.tot, 6) AS raw_share
          |FROM p5 JOIN raw ON raw.tok = p5.tok, m, rt""".stripMargin),

      "q253_nation_flows" ->
        """WITH li AS (SELECT l_orderkey, l_suppkey,
          |   CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
          |     AS cents FROM lineitem),
          |cn AS (SELECT c.c_custkey, n.n_name AS cust_nation FROM customer c
          |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
          |ords AS (SELECT o.o_orderkey, cn.cust_nation,
          |   CAST(year(o.o_orderdate) AS BIGINT) AS yr
          |  FROM orders o JOIN cn ON o.o_custkey = cn.c_custkey),
          |sn AS (SELECT s.s_suppkey, n.n_name AS supp_nation FROM supplier s
          |  JOIN nation n ON s.s_nationkey = n.n_nationkey)
          |SELECT sn.supp_nation, o.cust_nation, o.yr AS year,
          | CAST(count(*) AS BIGINT) AS n_lines,
          | round(CAST(sum(li.cents) AS DOUBLE) / 100.0, 2) AS revenue
          |FROM li JOIN ords o ON li.l_orderkey = o.o_orderkey
          |JOIN sn ON li.l_suppkey = sn.s_suppkey
          |WHERE sn.supp_nation <> o.cust_nation
          |GROUP BY 1, 2, 3""".stripMargin,

      "q267_kcore" ->
        """WITH RECURSIVE pp AS (SELECT DISTINCT l_orderkey, l_partkey
          |  FROM lineitem),
          |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          |  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |peel(iter, node) AS (
          |  SELECT 0, p1 FROM e UNION SELECT 0, p2 FROM e
          |  UNION ALL
          |  SELECT a.iter + 1, a.node FROM peel a
          |  WHERE a.iter < 24 AND (SELECT count(*) FROM e
          |     WHERE (e.p1 = a.node AND e.p2 IN
          |        (SELECT b.node FROM peel b WHERE b.iter = a.iter))
          |        OR (e.p2 = a.node AND e.p1 IN
          |        (SELECT b.node FROM peel b WHERE b.iter = a.iter))) >= 3),
          |core AS (SELECT node FROM peel WHERE iter = 24)
          |SELECT c.node AS p_partkey,
          | CAST((SELECT count(*) FROM e
          |   WHERE (e.p1 = c.node AND e.p2 IN (SELECT node FROM core))
          |      OR (e.p2 = c.node AND e.p1 IN (SELECT node FROM core)))
          |   AS BIGINT) AS core_degree,
          | ((SELECT count(*) FROM peel WHERE iter = 23)
          |   = (SELECT count(*) FROM peel WHERE iter = 24)) AS converged
          |FROM core c""".stripMargin,

      "q271_clustering_coeff" ->
        """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          |  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
          |   SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
          |  GROUP BY 1),
          |tri AS (SELECT ab.p1 AS x, ab.p2 AS y, bc.p2 AS z
          |  FROM e ab JOIN e bc ON ab.p2 = bc.p1
          |   JOIN e ac ON ac.p1 = ab.p1 AND ac.p2 = bc.p2),
          |tpn AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
          |   SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
          |   UNION ALL SELECT z FROM tri) GROUP BY 1)
          |SELECT deg.node AS p_partkey, deg.deg,
          | CAST(coalesce(tpn.tri, 0) AS BIGINT) AS tri,
          | CASE WHEN deg.deg >= 2 THEN
          |   round(coalesce(tpn.tri, 0) * 2.0 / (deg.deg * (deg.deg - 1)), 6)
          |  ELSE 0.0 END AS clustering_coeff
          |FROM deg LEFT JOIN tpn ON deg.node = tpn.node""".stripMargin,

      "q276_edge_embeddedness" ->
        """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          |  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |tri AS (SELECT ab.p1 AS x, ab.p2 AS y, bc.p2 AS z
          |  FROM e ab JOIN e bc ON ab.p2 = bc.p1
          |   JOIN e ac ON ac.p1 = ab.p1 AND ac.p2 = bc.p2),
          |pe AS (SELECT p1, p2, CAST(count(*) AS BIGINT) AS emb FROM (
          |   SELECT x AS p1, y AS p2 FROM tri
          |   UNION ALL SELECT y, z FROM tri
          |   UNION ALL SELECT x, z FROM tri) GROUP BY 1, 2),
          |dist AS (SELECT coalesce(pe.emb, 0) AS emb,
          |   CAST(count(*) AS BIGINT) AS n_edges
          |  FROM e LEFT JOIN pe ON e.p1 = pe.p1 AND e.p2 = pe.p2
          |  GROUP BY 1),
          |t AS (SELECT CAST(sum(n_edges) AS BIGINT) AS te FROM dist)
          |SELECT dist.emb AS embeddedness, dist.n_edges,
          | round(CAST(dist.n_edges AS DOUBLE) / t.te, 6) AS edge_share,
          | dist.emb = 0 AS is_local_bridge
          |FROM dist, t""".stripMargin,

      "q282_bfs_hops" ->
        """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          |  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |und AS (SELECT p1 AS u, p2 AS v FROM e
          |  UNION ALL SELECT p2, p1 FROM e),
          |hub AS (SELECT u AS node FROM und GROUP BY u
          |  ORDER BY count(*) DESC, u ASC LIMIT 1),
          |h0 AS (SELECT node FROM hub),
          |h1 AS (SELECT DISTINCT und.v AS node FROM und
          |  JOIN h0 ON und.u = h0.node
          |  WHERE und.v NOT IN (SELECT node FROM h0)),
          |h2 AS (SELECT DISTINCT und.v AS node FROM und
          |  JOIN h1 ON und.u = h1.node
          |  WHERE und.v NOT IN (SELECT node FROM h0)
          |   AND und.v NOT IN (SELECT node FROM h1)),
          |h3 AS (SELECT DISTINCT und.v AS node FROM und
          |  JOIN h2 ON und.u = h2.node
          |  WHERE und.v NOT IN (SELECT node FROM h0)
          |   AND und.v NOT IN (SELECT node FROM h1)
          |   AND und.v NOT IN (SELECT node FROM h2)),
          |h4 AS (SELECT DISTINCT und.v AS node FROM und
          |  JOIN h3 ON und.u = h3.node
          |  WHERE und.v NOT IN (SELECT node FROM h0)
          |   AND und.v NOT IN (SELECT node FROM h1)
          |   AND und.v NOT IN (SELECT node FROM h2)
          |   AND und.v NOT IN (SELECT node FROM h3)),
          |rings AS (
          | SELECT CAST(0 AS BIGINT) AS hop, CAST(count(*) AS BIGINT)
          |   AS n_nodes FROM h0
          | UNION ALL SELECT 1, CAST(count(*) AS BIGINT) FROM h1
          | UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM h2
          | UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM h3
          | UNION ALL SELECT 4, CAST(count(*) AS BIGINT) FROM h4),
          |unreach AS (SELECT CAST(-1 AS BIGINT) AS hop,
          |   CAST(count(*) AS BIGINT) AS n_nodes
          |  FROM (SELECT DISTINCT u AS node FROM und) an
          |  WHERE an.node NOT IN (SELECT node FROM h0)
          |   AND an.node NOT IN (SELECT node FROM h1)
          |   AND an.node NOT IN (SELECT node FROM h2)
          |   AND an.node NOT IN (SELECT node FROM h3)
          |   AND an.node NOT IN (SELECT node FROM h4))
          |SELECT hop, n_nodes FROM rings WHERE n_nodes > 0
          |UNION ALL SELECT hop, n_nodes FROM unreach WHERE n_nodes > 0"""
          .stripMargin,

      "q286_link_prediction" ->
        """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          |  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |und AS (SELECT p1 AS u, p2 AS v FROM e
          |  UNION ALL SELECT p2, p1 FROM e),
          |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
          |  FROM und GROUP BY 1),
          |wedges AS (SELECT a.u AS p1, b.v AS p2,
          |   CAST(count(*) AS BIGINT) AS cn
          |  FROM und a JOIN und b ON a.v = b.u AND a.u < b.v
          |  GROUP BY 1, 2),
          |cand AS (SELECT w.* FROM wedges w
          |  LEFT JOIN e ON w.p1 = e.p1 AND w.p2 = e.p2
          |  WHERE e.p1 IS NULL)
          |SELECT c.p1, c.p2, c.cn,
          | round(CAST(c.cn AS DOUBLE) / (d1.deg + d2.deg - c.cn), 6)
          |   AS jaccard
          |FROM cand c JOIN deg d1 ON c.p1 = d1.u
          | JOIN deg d2 ON c.p2 = d2.u
          |ORDER BY jaccard DESC, c.p1 ASC, c.p2 ASC LIMIT 20""".stripMargin,

      "q288_markov_order_test" ->
        """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
          |   event_type,
          |   lag(event_type, 2) OVER w AS prev,
          |   lag(event_type, 1) OVER w AS cur,
          |   epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS g1,
          |   lag(epoch_us(ts), 1) OVER w - lag(epoch_us(ts), 2) OVER w
          |     AS g2
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts),
          |   event_id)),
          |tri AS (SELECT prev, cur, event_type AS next,
          |   CAST(count(*) AS BIGINT) AS o
          |  FROM ev WHERE prev IS NOT NULL AND g1 <= 1800 * 1000000
          |   AND g2 <= 1800 * 1000000
          |  GROUP BY 1, 2, 3),
          |mpc AS (SELECT prev, cur, CAST(sum(o) AS BIGINT) AS t_pc
          |  FROM tri GROUP BY 1, 2),
          |mcn AS (SELECT cur, next, CAST(sum(o) AS BIGINT) AS t_cn
          |  FROM tri GROUP BY 1, 2),
          |mc AS (SELECT cur, CAST(sum(o) AS BIGINT) AS t_c
          |  FROM tri GROUP BY 1)
          |SELECT tri.cur, CAST(count(*) AS BIGINT) AS n_cells,
          | CAST(sum(tri.o) AS BIGINT) AS n_trigrams,
          | round(sum(pow(tri.o - CAST(mpc.t_pc * mcn.t_cn AS DOUBLE)
          |    / mc.t_c, 2)
          |   / (CAST(mpc.t_pc * mcn.t_cn AS DOUBLE) / mc.t_c)), 4)
          |   AS chi_sq
          |FROM tri JOIN mpc ON tri.prev = mpc.prev AND tri.cur = mpc.cur
          | JOIN mcn ON tri.cur = mcn.cur AND tri.next = mcn.next
          | JOIN mc ON tri.cur = mc.cur
          |GROUP BY 1""".stripMargin,

      // all-pairs exact candidate twin of the banded-LSH engine path —
      // recall caveat documented at q159's oracle entry; integer-exact
      // modularity numerator/denominator mirrors the engine's LONG math
      "q327_lang_modularity" ->
        s"""$shingleCte,
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |e AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
           |   CAST(sum(CASE WHEN da.lang = db.lang THEN 1 ELSE 0 END) AS BIGINT)
           |     AS n_intra_edges
           |  FROM pairs p JOIN documents da ON p.id_a = da.doc_id
           |   JOIN documents db ON p.id_b = db.doc_id),
           |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
           |   SELECT id_a AS id FROM pairs
           |   UNION ALL SELECT id_b FROM pairs) GROUP BY id),
           |dc AS (SELECT d.lang, CAST(sum(g.deg) AS BIGINT) AS d_c
           |  FROM deg g JOIN documents d ON g.id = d.doc_id GROUP BY 1),
           |da2 AS (SELECT CAST(sum(d_c * d_c) AS BIGINT) AS dc2,
           |   CAST(count(*) AS BIGINT) AS n_communities FROM dc)
           |SELECT e.n_edges, da2.n_communities, e.n_intra_edges,
           | round(CAST(4 * e.n_edges * e.n_intra_edges - da2.dc2 AS DOUBLE)
           |   / CAST(4 * e.n_edges * e.n_edges AS DOUBLE), 6) AS modularity
           |FROM e, da2""".stripMargin,
  )
}
