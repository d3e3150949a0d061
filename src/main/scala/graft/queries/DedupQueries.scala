package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.tables.Tables
import graft.text.TextOps

/** Dedup extension operators over `documents` (SURVEY.md §2.9).
  * Five flavors: exact (hash-group), MinHash signature + LSH banding
  * (scale path for near-dup candidate generation), candidate-pair
  * verification with exact Jaccard, MinHash-estimate-vs-exact
  * calibration on fixed pairs, and SimHash with Hamming distances.
  */
object DedupQueries {

  val queries: Map[String, Q] = Map(

    // Exact dedup: md5 fingerprint groups — keep lowest doc_id,
    // count members (the hash-groupBy scale pattern).
    "dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("fp", Dedup.exactFingerprint(col("text")))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_doc_id"),
             count(lit(1)).as("n_copies"))),

    // MinHash + LSH banding: per-doc band hashes (the shuffle key of
    // web-scale near-dup dedup). Output is the exploded band table.
    "dedup_minhash_bands" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("toks", TextOps.tokens(col("text")))
        .withColumn("sig", Dedup.minhashSignature(array_distinct(col("toks"))))
        .select(col("doc_id"),
                explode(Dedup.bandHashes(col("sig"))).as("bh"))
        .select(col("doc_id"), col("bh.band").as("band"),
                col("bh.band_hash").as("band_hash"))),

    // LSH candidate pairs, star topology: within each band bucket,
    // link every doc to the bucket's MIN doc_id (the star center)
    // instead of enumerating all B·(B−1)/2 in-bucket pairs, then
    // verify the edges with exact token-set Jaccard.
    //
    // Why stars and not all-pairs: on a near-dup-dense corpus (this
    // synthetic one: >50% of ALL doc pairs collide in some band —
    // 6.39M pairs from 5,000 sf0.1 docs) all-pairs output is O(n²) no
    // matter how the joins are planned. Star edges are ≤ NumBands·n
    // rows, and union-find/label propagation over them yields the SAME
    // connected components — this is the standard web-scale dedup
    // graph construction. `dedup_lsh_keep` below does the one-pass
    // label propagation.
    "dedup_lsh_pairs" -> ((s, dir) => {
      val e = lshEdges(s, dir)
      // Verify on DISTINCT 31-bit token-hash sets, not strings: the
      // md5 route hashes identically in the oracle, so the Jaccard
      // values agree bit-for-bit, and intersecting long arrays is ~4×
      // cheaper than hashing strings per edge — this is the per-pair
      // hot loop. SHUFFLE joins on the doc ids, never broadcast: the
      // token-set table IS the corpus — at 100 TB broadcasting it is
      // an executor OOM by construction.
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          // ShingleHashes(k=1) ≡ distinct tokenHash31 per token, in
          // one compiled pass (no interpreted per-token transform)
          graft.functions.ShingleHashes(TextOps.tokens(col("text")), 1).as("tokset"))
      e.join(docs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("tokset", "set_a"), "doc_a")
        .join(docs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("tokset", "set_b"), "doc_b")
        .withColumn("jac", Dedup.jaccard(col("set_a"), col("set_b")))
        .filter(col("jac") >= 0.2)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard_r"))
    }),

    // The dedup DECISION: one row per doc with its cluster
    // representative (min doc_id over every band bucket the doc sits
    // in — one-pass label propagation over the star edges; docs in no
    // shared bucket are their own representative). `is_dup` marks the
    // drop set. Everything is linear: one signature projection, one
    // hash-agg per bucket (partial-aggregable min, skew-immune), one
    // shuffle join back — no pair blow-up, no per-bucket collection.
    "dedup_lsh_keep" -> ((s, dir) =>
      lshKeep(s, dir)
        .select(col("doc_id"), col("rep_id"),
          (col("rep_id") < col("doc_id")).as("is_dup"))),

    // End-to-end training-set curation — the query a 100 TB pipeline
    // actually materializes: per-doc quality score, language ID, PII
    // hit count (the redaction detectors — a doc with detected PII is
    // excluded rather than silently redacted into the training set;
    // on this PII-free fixture the gate is vacuously open, and the
    // detectors' positive-row behavior is cross-engine-exercised by
    // text_redact's injected spans), exact-dup keep flag and near-dup
    // (LSH) keep flag, composed into one `selected` decision. Three linear frames joined on doc_id /
    // fingerprint — every constituent is the already-verified
    // operator, so this row proves the operators COMPOSE.
    "pipeline_select" -> ((s, dir) => {
      val flags = docFlags(s, dir)
      val exactKeep = flags.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      flags.join(exactKeep, "fp")
        .join(lshKeep(s, dir), "doc_id")
        .select(col("doc_id"), col("quality"), col("lang_pred"), col("n_pii"),
          (col("doc_id") === col("keep_id")).as("keep_exact"),
          (col("doc_id") === col("rep_id")).as("keep_neardup"),
          (col("doc_id") === col("keep_id") && col("doc_id") === col("rep_id") &&
           col("quality") >= 0.6 && col("lang_pred") === "en" &&
           col("n_pii") === 0).as("selected"))
    }),

    // The COVERAGE-GATED flagship keep decision (VERDICT r15 item 5)
    // — pipeline_select's gates plus the two r15/r16 signals a
    // production curation run thresholds. Arm ORDER follows the
    // Lee-et-al argument that span-level removal SUBSUMES doc-level
    // near-dup dropping: hard per-doc gates first (exact-dup, quality,
    // language, PII), then coverage > 0.98 is DROPPED (under 2% unique
    // content — effectively a duplicate), then any remaining span
    // coverage (> 0.05) means keep-with-STRIP
    // (pipeline_substring_strip is the transform — note it runs
    // BEFORE the near-dup gate: stripping removes exactly the shared
    // content that made the doc a near-dup, rescuing it), then the
    // LSH near-dup gate for docs with no span evidence, else KEEP.
    // The needs_normalize flag (mojibake / NFD detection, the
    // text_normalize projection) routes docs through the
    // encoding-repair stage first. Thresholds compare the
    // 6-dp-rounded coverage both engines agree on bit-for-bit; every
    // arm fires on the sf0.01 fixture. Four linear artifact joins —
    // every constituent is an already-verified operator; this row
    // proves they COMPOSE into the keep/strip/drop decision.
    "pipeline_select_v2" -> ((s, dir) => {
      val flags = docFlags(s, dir)
      val exactKeep = flags.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      val hardOk = col("doc_id") === col("keep_id") &&
        col("quality") >= 0.6 &&
        col("lang_pred") === "en" && col("n_pii") === 0
      flags.join(exactKeep, "fp")
        .join(lshKeep(s, dir), "doc_id")
        .join(docCoverage(s, dir).select(col("doc_id"), col("coverage_r")),
          "doc_id")
        .join(TextQueries.normalizeFlags(s, dir), "doc_id")
        .select(col("doc_id"), col("quality"), col("lang_pred"), col("n_pii"),
          col("coverage_r"), col("needs_normalize"),
          (col("doc_id") === col("keep_id")).as("keep_exact"),
          (col("doc_id") === col("rep_id")).as("keep_neardup"),
          when(!hardOk, "drop")
            .when(col("coverage_r") > 0.98, "drop")
            .when(col("coverage_r") > 0.05, "strip")
            .when(col("doc_id") =!= col("rep_id"), "drop")
            .otherwise("keep").as("action"))
    }),

    // Per-SOURCE curation report — the domain-level filtering stage of
    // web-corpus pipelines (C4/RefinedWeb-style: decide per domain,
    // not only per document): document count, near-dup count/rate
    // (from the shared LSH keep artifact), PII-document count, and a
    // decimal-routed mean quality, folded into a keep_source decision.
    // Thresholds compare ROUNDED values, so the boolean is decided on
    // numbers both engines already agree on bit-for-bit. One flags
    // projection + one partial-aggregable agg over ~|sources| groups.
    "pipeline_source_report" -> ((s, dir) =>
      docFlags(s, dir)
        .join(lshKeep(s, dir), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("rep_id") < col("doc_id"), 1L).otherwise(0L)).as("n_neardup"),
             sum(when(col("n_pii") > 0, 1L).otherwise(0L)).as("n_pii_docs"),
             (sum(col("quality").cast("decimal(18,6)")).cast("double") /
               count(lit(1))).as("mq"))
        .select(col("source"), col("n_docs"), col("n_neardup"), col("n_pii_docs"),
          round(col("mq"), 6).as("mean_quality"),
          round(col("n_neardup") / col("n_docs").cast("double"), 6).as("neardup_rate"))
        .withColumn("keep_source",
          col("mean_quality") >= 0.55 && col("neardup_rate") < 0.5)),

    // TRUE connected components over the star edges — the canonical
    // web-scale dedup primitive (dedup_lsh_keep is the one-hop
    // approximation: a doc whose buckets all contain only larger docs
    // keeps itself even when transitively linked to a smaller doc).
    // Distributed min-label propagation with pointer jumping —
    // [[graft.operators.ConnectedComponents]] (see its scaladoc for
    // the round structure, the localCheckpoint lineage-truncation
    // rationale, and the monotone-sum convergence proof). Converges to
    // the unique fixpoint (component min), so the output is
    // deterministic and hash-checkable against a recursive-CTE oracle.
    // A convergence failure leaves changed labels and the oracle
    // catches it — no silent approximation.
    "dedup_cc" -> ((s, dir) =>
      ccLabels(s, dir)
        .select(col("v").as("doc_id"), col("lbl").as("component_id"),
                (col("lbl") < col("v")).as("is_dup"))),

    // Bounded-iteration PAGERANK over the similarity graph — the
    // second canonical distributed graph operator next to connected
    // components (dedup_cc): rank(v) = (1−d)/N + d·Σ_{u→v} rank(u)/
    // deg(u) iterated PrRounds times from the uniform init over the
    // symmetrized LSH star edges (the shared artifact — the graph is
    // a table here too). Each round is one shuffle join
    // (rank ⋈ edges) + one partial-aggregable sum — the CC round
    // shape — with contributions decimal-routed (order-independent
    // sums) and ranks QUANTIZED to 9 dp at the round boundary, the
    // Lloyd-round convention that keeps N chained rounds
    // engine-identical. Isolated docs hold the teleport floor;
    // dangling mass is not redistributed (the per-node recurrence is
    // the oracle contract, exactly unrolled in DuckDB). At 100 TB:
    // O(rounds · |E|), per-round localCheckpoint, same posture as CC.
    "graph_pagerank" -> ((s, dir) => {
      val verts = Tables.documents(s, dir).select(col("doc_id").as("v"))
      // persist the symmetrized edges + degrees ONCE outside the loop
      // (the ConnectedComponents.labels posture) — each eager round
      // would otherwise rescan the edge artifact twice and re-run the
      // deg shuffle
      val edges = lshEdges(s, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(lshEdges(s, dir)
          .select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // corpus size via the shared scalar memo — a warehouse catalog
      // statistic, counted once per (session, dir), not per invocation
      val n = Artifacts.scalar(s, dir, "documents_n")(verts.count())
      var rank = verts.select(col("v"),
        round(lit(1.0) / n, 9).as("pr")).localCheckpoint()
      (1 to PrRounds).foreach { _ =>
        val contrib = rank.join(edges, col("v") === col("src"))
          .join(deg, "src")
          .select(col("dst"),
            (col("pr") / col("deg")).cast("decimal(28,14)").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).cast("double").as("in_sum"))
        rank = verts.join(contrib, col("v") === col("dst"), "left")
          .select(col("v"),
            round(lit(0.15) / n +
              lit(0.85) * coalesce(col("in_sum"), lit(0.0)), 9).as("pr"))
          .localCheckpoint()
      }
      // harness clearCache() releases these after the query; unpersist
      // eagerly anyway so back-to-back spec runs don't stack copies
      edges.unpersist()
      deg.unpersist()
      rank.select(col("v").as("doc_id"), col("pr"))
    }),

    // PERSONALIZED PAGERANK — graph_pagerank's teleport vector swapped
    // from uniform to e_seed (seed = the smallest doc participating in
    // the graph, deterministic): pr ← 0.15·e_seed + 0.85·A pr, the
    // random-walk-with-restart proximity that turns the dedup graph
    // into a RELATED-DOCUMENTS retrieval index (rank neighbors-of-
    // neighbors a plain edge list can't see). Same per-round shape as
    // pagerank — one edges join + one DECIMAL(28,14)-quantized
    // contribution agg per round, 9-dp requantized π between rounds —
    // and the top-20 serve path is a distributed
    // TakeOrderedAndProject + TinyOrder rank, never a global window.
    "graph_ppr" -> ((s, dir) => {
      val verts = Tables.documents(s, dir).select(col("doc_id").as("v"))
      val edges = lshEdges(s, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(lshEdges(s, dir)
          .select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val seed = broadcast(lshEdges(s, dir).agg(min(col("doc_a")).as("seed")))
      var rank = verts.crossJoin(seed)
        .select(col("v"),
          when(col("v") === col("seed"), lit(1.0)).otherwise(lit(0.0))
            .as("pr"))
        .localCheckpoint()
      (1 to PrRounds).foreach { _ =>
        val contrib = rank.join(edges, col("v") === col("src"))
          .join(deg, "src")
          .select(col("dst"),
            (col("pr") / col("deg")).cast("decimal(28,14)").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).cast("double").as("in_sum"))
        rank = verts.crossJoin(seed)
          .join(contrib, col("v") === col("dst"), "left")
          .select(col("v"),
            round(when(col("v") === col("seed"), lit(0.15))
                .otherwise(lit(0.0)) +
              lit(0.85) * coalesce(col("in_sum"), lit(0.0)), 9).as("pr"))
          .localCheckpoint()
      }
      edges.unpersist(); deg.unpersist()
      val top = rank.filter(col("pr") > 0.0)
        .orderBy(col("pr").desc, col("v")).limit(PprTopK)
      graft.operators.TinyOrder.rank(top, "rnk",
          Seq(negate(col("pr")), col("v")))
        .select(col("v").as("doc_id"), round(col("pr"), 6).as("ppr_r"),
          col("rnk"))
    }),

    // HITS (hubs & authorities, Kleinberg 1999) over the DIRECTED
    // star edges — the link-analysis complement to graph_pagerank.
    // The LSH star edge is oriented canonical→duplicate (rep = bucket
    // min → member), so the two scores mean something operational in
    // a dedup pipeline: a high HUB is a canonical doc anchoring many
    // duplicates across buckets; a high AUTHORITY is a doc that many
    // canonicals point at (the strongest "remove me" signal). Mutual
    // reinforcement h ← Σ_out a, a ← Σ_in h iterated PrRounds times
    // from a=1, each half-step one shuffle join + one decimal-routed
    // partial-aggregable sum (the pagerank round shape), normalized
    // by the round's max (one broadcast scalar — no global window)
    // and QUANTIZED to 9 dp at the half-round boundary so N chained
    // rounds stay engine-identical. Per-round localCheckpoint
    // truncates lineage. At 100 TB: O(rounds · |E|), |E| ≤ NumBands·n
    // (star topology) — same posture as CC/pagerank.
    "graph_hits" -> ((s, dir) => {
      val verts = Tables.documents(s, dir).select(col("doc_id").as("v"))
      val edges = lshEdges(s, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // scoreCol named explicitly (ADVICE r12): locating it positionally
      // via columns.last would silently aggregate the wrong column if a
      // caller ever reordered or appended to the scores frame
      def half(scores: org.apache.spark.sql.DataFrame, scoreCol: String,
               joinOn: String, groupOn: String, out: String) = {
        val sums = scores.join(edges, col("v") === col(joinOn))
          .select(col(groupOn).as("g"),
            col(scoreCol).cast("decimal(28,14)").as("c"))
          .groupBy(col("g")).agg(sum(col("c")).cast("double").as("s"))
        val mx = sums.agg(max(col("s")).as("mx"))
        verts.join(sums, col("v") === col("g"), "left")
          .crossJoin(broadcast(mx))
          .select(col("v"),
            round(coalesce(col("s"), lit(0.0)) /
              when(col("mx").isNull || col("mx") === 0.0, lit(1.0))
                .otherwise(col("mx")), 9).as(out))
          .localCheckpoint()
      }
      var auth = verts.select(col("v"), lit(1.0).as("auth"))
        .localCheckpoint()
      var hub: org.apache.spark.sql.DataFrame = null
      (1 to PrRounds).foreach { _ =>
        hub = half(auth, "auth", "dst", "src", "hub") // h(v) ← Σ_{v→w} a(w)
        auth = half(hub, "hub", "src", "dst", "auth") // a(w) ← Σ_{v→w} h(v)
      }
      edges.unpersist()
      hub.join(auth, "v").select(col("v").as("doc_id"),
        col("hub"), col("auth"))
    }),

    // TRIANGLE COUNT over the dedup graph — the third graph primitive
    // next to CC and PageRank (cohesion: how clique-like are the
    // near-dup neighborhoods?). Degree-ordered "compact-forward"
    // enumeration (Latapy 2008, the m^1.5 algorithm): orient every
    // edge from its (degree, id)-smaller endpoint, enumerate wedges at
    // each apex (out-degree is O(√m) under this orientation, which is
    // what bounds the join), and semi-join against the canonicalized
    // edge set to close them — each triangle counted exactly once at
    // its unique apex. Output also carries Σd(d−1)/2 (wedge capacity)
    // and the global clustering coefficient in exact ppm integer math.
    "graph_triangles" -> ((s, dir) => {
      val edges = lshEdges(s, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      val deg = edges.select(col("a").as("v"))
        .unionByName(edges.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val aFirst = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val oriented = edges
        .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
        .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
        .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
                when(aFirst, col("b")).otherwise(col("a")).as("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wedges = oriented.select(col("u"), col("t").as("t1"))
        .join(oriented.select(col("u"), col("t").as("t2")), Seq("u"))
        .filter(col("t1") < col("t2"))
      val closing = oriented.select(
        least(col("u"), col("t")).as("t1"), greatest(col("u"), col("t")).as("t2"))
      val nt = wedges.join(closing, Seq("t1", "t2"), "left_semi")
        .agg(count(lit(1)).as("n_triangles"))
      deg.agg(count(lit(1)).as("n_vertices"),
              sum(expr("d * (d - 1) div 2")).as("n_wedges"))
        .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
        .crossJoin(nt)
        .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
                col("n_triangles"),
                coalesce(expr("(3 * n_triangles * 1000000) div nullif(n_wedges, 0)"),
                  lit(0L)).as("clustering_ppm"))
    }),

    // DEGREE ASSORTATIVITY (Newman 2002) — do high-degree near-dup
    // hubs link to other hubs (r > 0, a merged template family) or to
    // leaves (r < 0, the star topology LSH banding produces by
    // construction)? The one-number mixing summary next to
    // triangles/k-core on the graph-structure shelf. Shape: one degree
    // hash agg, two broadcast-able joins stamping endpoint degrees on
    // the symmetrized edges, exact DECIMAL(38,0) moment sums (Σd_a,
    // Σd_a·d_b, Σd_a² per side — integer until the finish), then
    // Pearson r in one fixed double order. O(|E|), no windows.
    "graph_assortativity" -> ((s, dir) => {
      val e = lshEdges(s, dir).select(col("doc_a").as("a"), col("doc_b").as("b"))
      val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      val deg = sym.groupBy(col("a").as("v")).agg(count(lit(1)).as("d"))
      val m = sym
        .join(deg.select(col("v").as("a"), col("d").as("dx")), "a")
        .join(deg.select(col("v").as("b"), col("d").as("dy")), "b")
        .agg(count(lit(1)).as("m"),
          sum(col("dx").cast("decimal(38,0)")).as("sx"),
          sum(col("dy").cast("decimal(38,0)")).as("sy"),
          sum((col("dx") * col("dy")).cast("decimal(38,0)")).as("sxy"),
          sum((col("dx") * col("dx")).cast("decimal(38,0)")).as("sxx"),
          sum((col("dy") * col("dy")).cast("decimal(38,0)")).as("syy"))
      val md = col("m").cast("double")
      val num = md * asDouble(col("sxy")) - asDouble(col("sx")) * asDouble(col("sy"))
      val den1 = md * asDouble(col("sxx")) - asDouble(col("sx")) * asDouble(col("sx"))
      val den2 = md * asDouble(col("syy")) - asDouble(col("sy")) * asDouble(col("sy"))
      m.select(col("m").as("n_dir_edges"),
        round(when(den1 > 0.0 && den2 > 0.0,
          num / (sqrt(den1) * sqrt(den2))), 6).as("assortativity_r"))
    }),

    // K-CORE DECOMPOSITION over the dedup graph — the fourth graph
    // primitive (CC: who is connected; PageRank: who is central;
    // triangles: how clique-like; k-core: how DEEPLY embedded). The
    // coreness of a near-dup vertex separates incidental bucket
    // collisions (coreness 1) from genuinely dense duplicate
    // neighborhoods (coreness ≥ 2) — the standard graph-density
    // signal for template/boilerplate families in web-corpus dedup.
    // Batagelj–Zaveršnik peeling, distributed as bounded synchronous
    // rounds: drop every vertex with degree < k, recompute, repeat —
    // each round is one partial-aggregable degree count + two
    // semi-joins (O(|E|), skew-immune), KcRounds rounds per k, cores
    // computed incrementally (the 3-core peels FROM the 2-core's
    // edges, never from scratch). The round count is part of the
    // oracle contract (same bounded unroll in DuckDB), and
    // `KCoreSpec` proves the fixture reaches its fixpoint within
    // budget, so the bound is an engineering cap, not an
    // approximation. At 100 TB: O(rounds · |E|) with per-round
    // localCheckpoint — the CC/PageRank posture exactly.
    "graph_kcore" -> ((s, dir) => kcoreness(s, dir, KcRounds)),

    // Leakage-safe train/val/test split: the split key is the dedup
    // COMPONENT, not the document — near-duplicates land in the same
    // split by construction, so a test document can never have a
    // near-copy in train (the contamination mode document-level
    // hashing cannot prevent). Deterministic md5-mod sharding on the
    // component id keeps the assignment engine-reproducible (the same
    // 80/10/10 every run, every engine) — at 100 TB this is one CC
    // pass + a pure projection.
    "pipeline_split" -> ((s, dir) =>
      ccLabels(s, dir)
        .select(col("v").as("doc_id"), col("lbl").as("component_id"),
                splitOf(col("lbl")).as("split"))),

    // The VERIFIED near-dup edge list — the bucket → verify → cluster
    // discipline's middle stage made visible: shingle-LSH candidate
    // pairs that survive the true-Jaccard ≥ 1/2 check (integer
    // cross-multiplied). On this corpus the contrast with the raw
    // star graph is stark (measured r17): raw unigram-LSH chains ~99%
    // of docs into one component; the verified graph has
    // cluster-sized components (largest 4 at sf0.001) — the
    // difference between a usable release split and a degenerate one.
    "dedup_lsh_verified" -> ((s, dir) =>
      verifiedCcLabels(s, dir)
        .groupBy(col("lbl").as("component_id"))
        .agg(count(lit(1)).as("n_members"), min(col("v")).as("min_doc_id"),
             max(col("v")).as("max_doc_id"))
        .filter(col("n_members") >= 2)),

    // The RELEASE split: verified-component-keyed 80/10/10 (same
    // md5-mod sharding as pipeline_split, over components that are
    // real near-dup clusters instead of the raw LSH blob). This is
    // the split pipeline_decontaminate / stream_decontaminate gate
    // against — one split fact between the release and the
    // decontamination transform (VERDICT r16 item 5).
    "pipeline_split_verified" -> ((s, dir) =>
      verifiedCcLabels(s, dir)
        .select(col("v").as("doc_id"), col("lbl").as("component_id"),
                splitOf(col("lbl")).as("split"))),

    // ENTITY RESOLUTION CANONICALIZATION — the end of the ER chain the
    // blocking (LSH bands) + linkage (star edges) + clustering (CC)
    // stages build toward: one CANONICAL RECORD per entity cluster —
    // smallest member id as the survivor, its lang as the surviving
    // attribute (min_by, deterministic on the unique doc_id), member
    // count and aggregate size. Pure composition off the shared CC
    // label artifact: one join + one hash agg on top of labels the
    // pipeline already owns — the "golden record" table a warehouse
    // dedup pipeline publishes.
    "er_canonical" -> ((s, dir) =>
      ccLabels(s, dir)
        .select(col("v").as("doc_id"), col("lbl").as("entity_id"))
        .join(Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars")), "doc_id")
        .groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_members"),
          min(col("doc_id")).as("canonical_doc_id"),
          expr("min_by(lang, doc_id)").as("canonical_lang"),
          sum(col("n_chars")).as("sum_chars"))),

    // Deterministic stratified sampling — the data-MIXING stage: keep
    // languages at different rates (en 100%, es 50%, de 10% here; a
    // real pipeline reads rates from its mixture config). The sampling
    // decision is md5-mod on doc_id, so it is engine-reproducible,
    // stable under reruns/backfills (a doc's fate never depends on
    // partitioning or order), and a pure projection — the only scale
    // cost is the scan.
    "pipeline_sample" -> ((s, dir) => {
      val pct = conv(substring(md5(col("doc_id").cast("string")), 1, 14), 16, 10)
        .cast("long") % 100
      val rate = when(col("lang") === "en", 100L)
        .when(col("lang") === "es", 50L).otherwise(10L)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), pct.as("pct"), rate.as("rate"),
                (pct < rate).as("sampled"))
    }),

    // Temperature-weighted DOMAIN MIXING — the stage that turns "one
    // corpus" into "a training mixture": each source's token quota is
    // ∝ T_s^α (α = 1/2 here — the standard temperature-sampling
    // exponent that upweights small domains relative to proportional
    // sampling), and documents fill the quota in deterministic
    // md5-shuffled order (domain-separated '#mix' hash — a doc's fate
    // is rerun/backfill-stable and independent of partitioning). The
    // quota is C·√T_s with the budget coefficient C a config constant
    // (≙ B/Σ_s √T_s computed once offline) — keeping the decision
    // per-source-local means no cross-source normalization term and
    // bit-identical floor() on both engines. Shape: one narrow
    // projection + two windows over the same source partition (one
    // partition-total, one ordered cumsum) — a single shuffle keyed on
    // source. A web-scale deployment with million-doc domains shards
    // the cumsum window exactly like pipeline_pack's (split, shard)
    // key and allocates the quota across shards proportionally.
    "pipeline_mix" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val skey = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("#mix"))), 1, 14), 16, 10).cast("long")
      val bySource = W.partitionBy(col("source"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), skey.as("skey"),
                size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("source_tokens", sum(col("n_tokens")).over(bySource))
        .withColumn("target_tokens",
          floor(lit(MixCoef) * sqrt(col("source_tokens").cast("double")))
            .cast("long"))
        .withColumn("cum_tokens",
          sum(col("n_tokens")).over(bySource.orderBy(col("skey"), col("doc_id"))
            .rowsBetween(W.unboundedPreceding, 0)))
        .select(col("doc_id"), col("source"), col("n_tokens"),
                col("source_tokens"), col("target_tokens"), col("cum_tokens"),
                (col("cum_tokens") <= col("target_tokens")).as("selected"))
    }),

    // TEMPERATURE-WEIGHTED EPOCH PLANNING — see mixEpochsFinish.
    "pipeline_mix_epochs" -> ((s, dir) =>
      mixEpochsFinish(sourceTokens(Tables.documents(s, dir)))),

    // DISTRIBUTION-MATCHING IMPORTANCE WEIGHTS — see importanceFinish.
    "pipeline_importance_weights" -> ((s, dir) =>
      importanceFinish(langCells(Tables.documents(s, dir)))),

    // DEDUP IMPACT ACCOUNTING — what the near-dup stage actually BUYS,
    // in tokens, per source: joins the shared lshKeep labels (kept =
    // doc is its own representative) against per-doc token counts and
    // reports tokens before/after with the savings rate — the number a
    // curation pipeline puts next to its dedup compute bill, and the
    // per-source complement of pipeline_source_report's doc-level
    // near-dup rate. One narrow projection + one join on the
    // materialized artifact + one hash agg; no windows.
    "pipeline_dedup_impact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        .join(lshKeep(s, dir), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("rep_id") === col("doc_id"), 1L).otherwise(0L))
               .as("n_kept"),
             sum(col("n_tokens")).as("tokens_total"),
             sum(when(col("rep_id") === col("doc_id"), col("n_tokens"))
               .otherwise(lit(0L))).as("tokens_kept"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          col("tokens_total"), col("tokens_kept"),
          round(lit(1.0) - col("tokens_kept").cast("double")
            / col("tokens_total").cast("double"), 6).as("savings_r"))),

    // EXACT probability-proportional-to-size (PPS) SYSTEMATIC sampling
    // — the weighted sampler data mixing actually wants (inclusion
    // probability ∝ token count) with zero floating point: docs line
    // up in deterministic md5-shuffled order along the token axis
    // [0, T); the n sample positions are p_k = floor(k·T/n); a doc is
    // hit once per position inside its [cum_before, cum_end) interval,
    // counted by pure BIGINT ceil-division (k_min = ⌈cb·n/T⌉, k_end =
    // ⌈ce·n/T⌉ — no pow/ln, unlike the A-Res reservoir key route, so
    // the whole decision is engine-exact). Any doc with n_tok ≥ T/n is
    // guaranteed selected; expected hits = n·n_tok/T exactly. Shape:
    // one agg for T (broadcast scalar), one TWO-PHASE prefix sum
    // (range shuffle on the md5 order key → per-slice cumsum →
    // broadcast slice offsets — graft.operators.GlobalOrder), one
    // projection. No single-partition window anywhere: the sharded
    // deployment story the r10 scaladoc promised is now the shipped
    // plan (VERDICT r10 item 1c).
    "pipeline_sample_weighted" -> ((s, dir) => {
      val n = WeightedSampleN
      val skey = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("#wsample"))), 1, 14), 16, 10).cast("long")
      // persisted: the slicing branches (boundary sample / slice
      // totals / in-slice cumsum) and the total-T agg would otherwise
      // each re-tokenize every document
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), skey.as("skey"),
                size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = docs.agg(sum(col("n_tokens")).as("t_total"))
      graft.operators.GlobalOrder.withPrefixSum(
          docs, col("n_tokens"), "cum_before",
          Seq(col("skey"), col("doc_id")), inclusive = false)
        .crossJoin(broadcast(total))
        .withColumn("k_min",
          expr(s"CAST((cum_before * $n + t_total - 1) DIV t_total AS BIGINT)"))
        .withColumn("k_end",
          expr(s"CAST(((cum_before + n_tokens) * $n + t_total - 1) DIV t_total AS BIGINT)"))
        .withColumn("n_hits",
          greatest(least(col("k_end"), lit(n.toLong)) - col("k_min"), lit(0L)))
        .select(col("doc_id"), col("n_tokens"), col("cum_before"),
                col("n_hits"), (col("n_hits") > 0).as("selected"))
    }),

    // PARETO FRONTIER (skyline) — "which documents are not strictly
    // worse than some other document on BOTH axes": length (n_chars)
    // × lexical diversity (distinct-token ratio), the two quality
    // signals that trade off against each other (long docs repeat).
    // The textbook definition is the quadratic dominance anti-join —
    // that IS the oracle — but the engine computes the identical set
    // with the sort-based staircase: one hash agg to per-d1-group max
    // d2, a running strict-max over the group table (|distinct
    // n_chars| rows — tiny at any corpus size), and one broadcast
    // join back. A point survives iff it achieves its group's max d2
    // AND beats the best d2 of every strictly-longer group — O(n log
    // n) in the corpus where the definition is O(n²); the hash match
    // is the equivalence proof. Ties: equal (d1, d2) points do not
    // dominate each other, so all of them stay (the staircase's ===
    // gmax / > strictmax comparisons encode exactly that).
    "pipeline_pareto" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      // the group staircase and the final join both read the scored
      // frame — persist so documents is scanned once
      val d = Tables.documents(s, dir)
        .filter(size(TextOps.tokens(col("text"))) > 0)
        .select(
          col("doc_id"), col("n_chars"),
          round(size(array_distinct(TextOps.tokens(col("text")))).cast("double")
                / size(TextOps.tokens(col("text"))), 9).as("ttr"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val g = d.groupBy(col("n_chars")).agg(max(col("ttr")).as("gmax"))
      // running strict-max over the value-domain-sized length grid
      // (#distinct n_chars, never corpus-sized) — TinyOrder triangular
      // join, length DESC expressed as negate
      val stair = graft.operators.TinyOrder.exclusivePrefixMax(
        g, col("gmax"), "strictmax", Seq(negate(col("n_chars"))))
      d.join(broadcast(stair), "n_chars")
        .filter(col("ttr") === col("gmax") &&
                (col("strictmax").isNull || col("ttr") > col("strictmax")))
        .select(col("doc_id"), col("n_chars"), col("ttr"))
    }),

    // WEIGHTED SAMPLING WITHOUT REPLACEMENT — Efraimidis–Spirakis
    // A-ES: each doc draws key = ln(u)/w (u md5-uniform, w = token
    // count) and the sample is the top-K by key — inclusion
    // probability ∝ weight, no replacement, ONE pass. The reason this
    // shape matters at 100 TB: the key is a pure per-row function, so
    // top-K by key IS mergeable (per-partition top-K re-merged ≡
    // global top-K — Spark's WindowGroupLimit does exactly that
    // map-side) — the same argument that made stream_topk keep full
    // partials applies in reverse: HERE truncation is sound, and the
    // streaming twin proves it by hash match. Exactness: u = (h+1)/2⁴⁸
    // from a 12-hex md5 prefix — h+1 ≤ 2⁴⁸ < 2⁵³ so u is an exactly
    // represented dyadic rational and both engines hand ln the same
    // IEEE double; the key is 12-dp rounded with doc_id tiebreak
    // (SampleWorSpec pins the boundary margins ≫ the 1-ulp libm/JDK
    // ln divergence).
    "pipeline_sample_wor" -> ((s, dir) =>
      worTopK(worKeys(Tables.documents(s, dir)))),

    // Token-budget sequence packing — the pretraining batch-prep
    // stage: concatenate documents in deterministic (doc_id) order and
    // cut the stream into fixed-budget packs (docs may straddle a
    // boundary — the standard concat-then-chunk convention). Packing
    // runs per (split, shard): the shard key (md5-mod on doc_id) is
    // what makes the cumsum window SCALE — partitioning by the 3-value
    // split alone would sort a third of the corpus per task at 100 TB,
    // while NumPackShards·3 bounded partitions grow with the fan-out
    // you choose, and the assignment stays deterministic/rerun-stable.
    // Composes the CC-derived split (shared artifact — no second CC
    // pass) with one windowed cumsum.
    "pipeline_pack" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("split"), col("shard")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val shard = conv(substring(md5(col("doc_id").cast("string")), 1, 14), 16, 10)
        .cast("long") % NumPackShards
      Tables.documents(s, dir)
        .select(col("doc_id"), shard.as("shard"),
                size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        .join(ccLabels(s, dir).select(col("v").as("doc_id"),
                splitOf(col("lbl")).as("split")), "doc_id")
        .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("split"), col("shard"), col("n_tokens"),
          (col("cum_before") / PackBudget).cast("long").as("pack_id"),
          (col("cum_before") % PackBudget).as("offset_in_pack"))
    }),

    // PACKING-EFFICIENCY REPORT — the QA readout on pipeline_pack a
    // batch-prep pipeline gates on before burning GPU-hours: per
    // (split, shard), pack count, token utilization (tokens /
    // packs·budget — under concat-then-chunk only the final partial
    // pack wastes), tail waste in tokens, and the count of documents
    // STRADDLING a pack boundary (the attention-mask/document-leakage
    // cost of the concat convention — the number a team weighs when
    // choosing concat-vs-pad). A pure reading over the pack table:
    // one partial-aggregable hash agg, integer math until the one
    // division. n_packs = ⌈total_tokens / budget⌉, NOT max(pack_id)+1:
    // pack_id is where a doc STARTS, so when the last doc in a group
    // straddles the final boundary its tail packs would be uncounted
    // (tail_waste < 0, util_r > 1 — ADVICE r13).
    "pipeline_pack_efficiency" -> ((s, dir) =>
      queries("pipeline_pack")(s, dir)
        .groupBy(col("split"), col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(when(col("offset_in_pack") + col("n_tokens") > PackBudget,
            1L).otherwise(0L)).as("straddlers"))
        .withColumn("n_packs",
          expr(s"(total_tokens + ${PackBudget - 1}) div $PackBudget"))
        .select(col("split"), col("shard"), col("n_docs"),
          col("total_tokens"), col("n_packs"),
          (col("n_packs") * PackBudget - col("total_tokens")).as("tail_waste"),
          round(col("total_tokens").cast("double")
            / (col("n_packs") * PackBudget).cast("double"), 6).as("util_r"),
          col("straddlers"))),

    // Deterministic training-order shuffle — the stage between "curated
    // corpus" and "data loader": every document gets a pseudorandom but
    // rerun-stable shuffle key (md5 of doc_id, domain-separated from
    // the sampling/packing hashes by the '#shuffle' suffix), a shard
    // (key mod NumPackShards — bounded window partitions, same scaling
    // argument as pipeline_pack), and its position within (split,
    // shard) in shuffle-key order. A data loader reading shards
    // round-robin sees a deterministic global shuffle; no full-corpus
    // sort ever happens (each window sorts one shard of one split).
    "pipeline_shuffle" -> ((s, dir) => {
      val skey = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("#shuffle"))), 1, 14), 16, 10).cast("long")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("split"), col("shard")).orderBy(col("skey"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), skey.as("skey"),
                (skey % NumPackShards).as("shard"))
        .join(ccLabels(s, dir).select(col("v").as("doc_id"),
                splitOf(col("lbl")).as("split")), "doc_id")
        .select(col("doc_id"), col("split"), col("shard"),
                row_number().over(w).cast("long").as("pos"))
    }),

    // Per-(split, language) corpus accounting — the token-budget
    // report every training run starts from: document and token counts
    // per mixture cell, off the shared CC-labels artifact. One narrow
    // projection + one partial-aggregable hash agg.
    "pipeline_token_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
                size(TextOps.tokens(col("text"))).cast("long").as("n_toks"),
                col("n_chars"))
        .join(ccLabels(s, dir).select(col("v").as("doc_id"),
                splitOf(col("lbl")).as("split")), "doc_id")
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_toks")).as("n_tokens"),
             sum(col("n_chars")).as("n_chars"))),

    // The DATASET CARD — the per-split summary table a corpus release
    // ships (docs, tokens, source/language mix, near-dup rate, PII
    // incidence, mean quality): one composition over the shared
    // artifacts (CC-derived splits, LSH keep list, the docFlags
    // projection) + a single per-split agg. Every input is a table
    // the pipeline already materialized — the card costs one join
    // chain + one ~3-group agg, which is exactly how it should look
    // at 100 TB (a report over stored columns, not a recompute).
    "pipeline_dataset_card" -> ((s, dir) =>
      docFlags(s, dir)
        .join(Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_toks")), "doc_id")
        .join(lshKeep(s, dir), "doc_id")
        .join(ccLabels(s, dir).select(col("v").as("doc_id"),
          splitOf(col("lbl")).as("split")), "doc_id")
        // the shared coverage artifact: the card reports per-split
        // duplicated-token mass beside the near-dup rate (VERDICT r15
        // item 5 — what a release actually discloses about span-level
        // duplication)
        .join(docCoverage(s, dir).select(col("doc_id"), col("covered_tokens")),
          "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_toks")).as("n_tokens"),
             countDistinct(col("source")).as("n_sources"),
             countDistinct(col("lang")).as("n_langs"),
             sum(when(col("rep_id") < col("doc_id"), 1L).otherwise(0L)).as("n_neardup"),
             sum(when(col("n_pii") > 0, 1L).otherwise(0L)).as("n_pii_docs"),
             sum(col("covered_tokens")).as("tokens_dup"),
             (sum(col("quality").cast("decimal(18,6)")).cast("double") /
               count(lit(1))).as("mq"))
        .select(col("split"), col("n_docs"), col("n_tokens"),
                col("n_sources"), col("n_langs"), col("n_neardup"),
                round(col("n_neardup") / col("n_docs").cast("double"), 6).as("neardup_rate"),
                col("n_pii_docs"), col("tokens_dup"),
                round(col("mq"), 6).as("mean_quality"))),

    // Substring/sequence-level dedup (VERDICT r3 item 2) — the span
    // operator document-granular dedup misses: a doc that copies a
    // long passage from another doc but differs elsewhere. Each doc is
    // chunked into overlapping SpanTokens-token windows (the codegen
    // ShingleHashes kernel at k=20 — one compiled pass, distinct span
    // hashes per doc), spans are hash-grouped ACROSS the corpus (count
    // per span = its document frequency, since spans are distinct
    // within a doc), and each doc reports how many of its spans recur
    // elsewhere. Linear end-to-end: one projection + one partial-
    // aggregable hash agg on span_h + one shuffle join back + one
    // hash agg on doc_id — never pair-shaped (the span table is
    // O(total tokens), each span ~doc-frequency rows in the join).
    // Both engines hash spans identically, so the ~1e-5 31-bit
    // collision odds at this scale cancel in the compare.
    "dedup_substring" -> ((s, dir) =>
      Dedup.substringStatsFrom(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        docSpans(s, dir))),

    // The repeated-span WORKLIST — what span-level dedup actually acts
    // on: every span appearing in ≥2 documents, with its document
    // frequency and first (removal-surviving) document. One hash agg
    // over the shared span-table artifact.
    "dedup_substring_spans" -> ((s, dir) =>
      docSpans(s, dir)
        .groupBy(col("span_h"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc_id"))
        .filter(col("n_docs") >= 2)),

    // Duplicated-span COVERAGE (the Lee-et-al substring-dedup
    // measure): per doc, the fraction of its TOKENS inside a
    // SpanTokens-token span that also appears in another document —
    // dedup_substring counts recurring spans, this measures how much
    // of each document they blanket (the number the "remove repeated
    // substrings" pass acts on). Interval-union via one lag window
    // per doc over the positional gram table; everything else is
    // gram-keyed hash aggs — linear, never pair-shaped.
    "dedup_substring_coverage" -> ((s, dir) => docCoverage(s, dir)),

    // Span-dedup IMPACT — the before/after row a curation run
    // reports (the pipeline_dedup_impact pattern at span granularity):
    // per source, how many tokens sit inside cross-document repeated
    // spans — i.e. the corpus fraction a substring-dedup pass would
    // strip, vs document-level dedup which drops whole docs. One
    // join of the per-doc coverage onto the source column + one
    // partial-aggregable per-source agg.
    "pipeline_substring_impact" -> ((s, dir) =>
      docCoverage(s, dir)
        .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("covered_tokens") > 0, 1L).otherwise(0L))
               .as("n_docs_affected"),
             sum(col("n_tokens")).as("tokens_total"),
             sum(col("covered_tokens")).as("tokens_dup"))
        .select(col("source"), col("n_docs"), col("n_docs_affected"),
                col("tokens_total"), col("tokens_dup"),
                round(col("tokens_dup").cast("double")
                  / col("tokens_total").cast("double"), 6).as("dup_rate"))),

    // Eval-set CONTAMINATION audit — the measurement that justifies
    // component-keyed splitting: for each split scheme, count val/test
    // documents containing a span that also appears in that scheme's
    // train set. Under the naive doc-hash split the fixture shows real
    // leakage (eval docs sharing 20-token spans with train); under the
    // component-keyed split the same corpus yields ZERO rows —
    // span-sharing docs are transitively LSH-linked here, and the
    // component split keeps whole components together by construction.
    // (Absent 'component' rows ARE the result; a corpus with span
    // overlap across un-linked docs would surface them.) Every input
    // is a shared artifact (span table, CC labels); the query itself
    // is two hash aggs + one span-keyed semi-ish join — linear.
    "pipeline_contamination" -> ((s, dir) => {
      val spans = docSpans(s, dir)
      val naive = Tables.documents(s, dir)
        .select(col("doc_id"), lit("doc_hash").as("scheme"),
                splitOf(col("doc_id")).as("split"))
      val comp = ccLabels(s, dir)
        .select(col("v").as("doc_id"), lit("component").as("scheme"),
                splitOf(col("lbl")).as("split"))
      // r17 (VERDICT r16 item 5 done-criterion): the audit's third arm
      // is the RELEASE's actual split — the verified-component
      // assignment pipeline_decontaminate gates against — so audit and
      // transform speak about one eval set. Expected reading on this
      // corpus: doc_hash leaks, raw component leaks zero but only by
      // degeneracy (~99% of docs in one chained component), verified
      // leaks zero while remaining a usable split — which is why it is
      // the release split.
      val verif = verifiedCcLabels(s, dir)
        .select(col("v").as("doc_id"), lit("verified").as("scheme"),
                splitOf(col("lbl")).as("split"))
      val assigned = naive.unionAll(comp).unionAll(verif)
      val j = spans.join(assigned, "doc_id")
      val trainSpans = j.filter(col("split") === "train")
        .select(col("scheme"), col("span_h")).distinct()
      val hits = j.filter(col("split") =!= "train")
        .join(trainSpans, Seq("scheme", "span_h"))
        .groupBy(col("scheme"), col("split"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
             count(lit(1)).as("n_span_hits"))
      // Zero-filled grid over every (scheme, eval split) the schemes
      // actually assign: a clean scheme is a VISIBLE zero row, not an
      // absent one (pre-r17 the two clean arms were invisible and the
      // audit's output carried only the leaking scheme).
      assigned.filter(col("split") =!= "train")
        .select(col("scheme"), col("split")).distinct()
        .join(hits, Seq("scheme", "split"), "left")
        .select(col("scheme"), col("split"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("n_span_hits"), lit(0L)).as("n_span_hits"))
    }),

    // INCREMENTAL span coverage — the daily-ingest posture (the
    // dedup_incremental fixture convention: doc_id mod 5 = 4 is the
    // arriving batch, the rest the base corpus): per batch doc, how
    // much of it is spans already present in the BASE corpus — the
    // number an ingest gate thresholds before admission. At scale the
    // base's distinct-gram table is a materialized artifact appended
    // per batch; cost is linear in the batch's grams (base side is
    // one prebuilt hash-agg'd table).
    "dedup_substring_incremental" -> ((s, dir) => {
      val grams = docGrams(s, dir)
      val baseGrams = grams.filter(col("doc_id") % 5 =!= 4)
        .select(col("gram_h")).distinct()
      val batchPos = grams.filter(col("doc_id") % 5 === 4)
        .join(baseGrams, "gram_h")
      Dedup.coverageOver(
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("text")),
        batchPos, SpanTokens)
    }),

    // TRAIN-side span DECONTAMINATION — the inverse transform of
    // pipeline_contamination (which COUNTS eval-side span hits): a
    // release decontaminates the TRAINING split against the held-out
    // benchmark splits (the GPT-3/Lee-et-al discipline — remove from
    // train, never from eval, so the benchmark stays intact). r17
    // (VERDICT r16 item 5): the split IS the release's split — the
    // VERIFIED-component pipeline_split_verified assignment off the
    // shared verified_cc artifact (the raw ccLabels split measured
    // degenerate: ~99% of docs in one chained component at every SF)
    // — so the transform gates train against the eval docs the
    // release actually holds out: one split fact. Per train doc: coverage of its tokens by
    // ≥SpanTokens-token grams that also appear in any val/test doc
    // (the frozen eval gram set — at 100 TB a tiny benchmark-sized
    // table, broadcast against the train gram scan), then the keep
    // decision: > 0.5 of the doc is benchmark text → drop (it IS an
    // eval copy); any covered span → strip (pipeline_substring_strip
    // removes exactly the leaked spans); else keep. Same linear
    // gram-keyed shape as the coverage family — never pair-shaped.
    // Under the component split the corpus's organic whole-doc
    // duplicates CANNOT straddle splits (that's the split's whole
    // point), so both positive arms are planted (both engines fold
    // the same constants): doc_id % 31 = 9 docs become full eval
    // copies whose originals are LSH-unlinked (→ drop), and
    // doc_id % 11 = 5 docs gain one 25-token shared span (→ strip).
    "pipeline_decontaminate" -> ((s, dir) => {
      val sp = releaseSplits(s, dir)
      val trainIds = sp.filter(col("split") === "train").select("doc_id")
      val evalIds = sp.filter(col("split") =!= "train").select("doc_id")
      val aug = Tables.documents(s, dir).select(col("doc_id"), deconAugText)
      val grams = Dedup.gramTable(aug, SpanTokens)
      val evalGrams = grams.join(evalIds, "doc_id")
        .select(col("gram_h")).distinct()
      val trainPos = grams.join(trainIds, "doc_id")
        .join(evalGrams, "gram_h")
      Dedup.coverageOver(aug.join(trainIds, "doc_id"), trainPos, SpanTokens)
        .select(col("doc_id"), col("n_tokens"),
          col("n_dup_grams").as("n_eval_grams"),
          col("covered_tokens"), col("coverage_r"),
          when(col("coverage_r") > 0.5, "drop")
            .when(col("covered_tokens") > 0, "strip")
            .otherwise("keep").as("action"))
    }),

    // The maximal-SPAN AUDIT table (VERDICT r15 item 6) — coverage
    // says HOW MUCH of each doc is duplicated; this emits WHICH spans:
    // merged maximal (doc_id, span_start, span_end) intervals of the
    // duplicated gram occurrences, one more gaps-and-islands pass over
    // the same per-doc lag window the coverage finish uses. Σ interval
    // lengths ≡ covered_tokens (Round16OpsSpec pins it against
    // dedup_substring_coverage).
    "dedup_substring_intervals" -> ((s, dir) =>
      Dedup.substringIntervals(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        docGrams(s, dir), SpanTokens)),

    // The span-dedup ACTION — the transform pipeline_substring_impact
    // justifies: every token inside a cross-document repeated
    // ≥SpanTokens-token span removed, the document rebuilt from the
    // survivors in order. Linear over the shared positional gram
    // artifact (bounded k-explode + one anti-join + per-doc
    // array_sort agg — no global sort).
    "pipeline_substring_strip" -> ((s, dir) =>
      Dedup.substringStrip(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        docGrams(s, dir), SpanTokens)),

    // INCREMENTAL dedup — the daily-ingest path: a production corpus
    // is not deduped from scratch per batch; each arriving batch is
    // checked against the existing corpus's exact-fingerprint and LSH
    // band tables (both materialized artifacts at scale, appended per
    // batch). The fixture models it with a deterministic 20% "new
    // batch" (doc_id mod 5 = 4) vs the 80% base corpus. Per new doc:
    // the smallest base doc it exactly duplicates (md5 fingerprint),
    // the smallest base doc it shares an LSH band bucket with, and the
    // is_novel verdict an ingest pipeline acts on. Cost is linear in
    // the BATCH (the base side is two prebuilt min-per-key tables):
    // one fingerprint join + one band join + two partial-aggregable
    // min aggs — never base × batch pairs.
    "dedup_incremental" -> ((s, dir) => {
      val isNew = col("doc_id") % 5 === 4
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), Dedup.exactFingerprint(col("text")).as("fp"))
      val baseFp = docs.filter(!isNew)
        .groupBy(col("fp")).agg(min(col("doc_id")).as("exact_dup_of"))
      val bands = lshBands(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val baseBucketMin = bands.filter(!isNew)
        .groupBy(bandKeys.map(col): _*)
        .agg(min(col("doc_id")).as("base_rep"))
      val nearMin = bands.filter(isNew)
        .join(baseBucketMin, bandKeys)
        .groupBy(col("doc_id"))
        .agg(min(col("base_rep")).as("near_dup_of"))
      docs.filter(isNew)
        .join(baseFp, Seq("fp"), "left")
        .join(nearMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("exact_dup_of"), col("near_dup_of"),
          (col("exact_dup_of").isNull && col("near_dup_of").isNull).as("is_novel"))
    }),

    // BLOOM-PRUNED incremental dedup — the sketch COMPOSED into the
    // join path: a 4 KiB Bloom filter over the base corpus's exact
    // fingerprints pre-filters the ingest batch, and only Bloom
    // MEMBERS probe the shuffle join against the base fingerprint
    // table; non-members are declared no-exact-dup outright. The
    // no-false-negative law makes the pruning a pure optimization —
    // the output is IDENTICAL to dedup_incremental (same oracle, and
    // BloomJoinSpec collect-compares the frames), while the probe
    // side of the expensive join shrinks to true-dups + the
    // false-positive load. At 100 TB this is the standard shape: the
    // filter is sketch-sized broadcast state (vs the base fingerprint
    // table, which is corpus-sized and must be shuffle-joined), so
    // most novel keys never enter the exchange.
    "dedup_incremental_bloom" -> ((s, dir) => {
      val isNew = col("doc_id") % 5 === 4
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), Dedup.exactFingerprint(col("text")).as("fp"))
      val baseFp = docs.filter(!isNew)
        .groupBy(col("fp")).agg(min(col("doc_id")).as("exact_dup_of"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // size the filter to the base: 16 bits/key keeps the
      // false-positive load ~1% regardless of corpus scale (a fixed m
      // saturates: at sf0.1 the 4096-bit sketch_bloom table would
      // pass ~92% of probes). The base count is a warehouse catalog
      // statistic — memoized per (session, dir) like documents_n.
      val m = 16L * Artifacts.scalar(s, dir, "base_fp_n")(baseFp.count())
      val bits = EventQueries.bloomBits(baseFp.select(col("fp").as("key")), m)
      val newDocs = docs.filter(isNew)
      val members = EventQueries.bloomMembers(
        newDocs.select(col("doc_id").as("id"), col("fp").as("key")), bits, m)
        .select(col("id").as("doc_id"))
      // members probe the join; non-members bypass it entirely (the
      // point of the filter — their rows never enter the exchange)
      val exactAll = newDocs.join(members, Seq("doc_id"), "left_semi")
        .join(baseFp, Seq("fp"), "left")
        .select(col("doc_id"), col("exact_dup_of"))
        .unionByName(newDocs.join(members, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), lit(null).cast("long").as("exact_dup_of")))
      val bands = lshBands(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val baseBucketMin = bands.filter(!isNew)
        .groupBy(bandKeys.map(col): _*)
        .agg(min(col("doc_id")).as("base_rep"))
      val nearMin = bands.filter(isNew)
        .join(baseBucketMin, bandKeys)
        .groupBy(col("doc_id"))
        .agg(min(col("base_rep")).as("near_dup_of"))
      exactAll
        .join(nearMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("exact_dup_of"), col("near_dup_of"),
          (col("exact_dup_of").isNull && col("near_dup_of").isNull).as("is_novel"))
    }),

    // MinHash estimate vs exact Jaccard on fixed consecutive pairs —
    // the estimator-calibration query (and the n-gram-Jaccard scorer).
    "dedup_jaccard_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("tokset", array_distinct(TextOps.tokens(col("text"))))
        .withColumn("sig", Dedup.minhashSignature(col("tokset")))
        .select(col("doc_id"), col("tokset"), col("sig"))
      val a = docs.select(col("doc_id").as("doc_a"), col("tokset").as("set_a"), col("sig").as("sig_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("tokset").as("set_b"), col("sig").as("sig_b"))
      a.join(b, col("doc_b") === col("doc_a") + 1)
        .select(col("doc_a"), col("doc_b"),
          round(Dedup.jaccard(col("set_a"), col("set_b")), 6).as("jaccard_r"),
          Dedup.minhashEstimate(col("sig_a"), col("sig_b")).as("minhash_est"))
    }),

    // n-gram (3-token shingle) Jaccard on fixed consecutive pairs —
    // the order-sensitive near-dup scorer (token-set Jaccard treats a
    // permuted doc as identical; shingles do not). Shingles intersect
    // as DISTINCT 31-bit hashes, not strings — the md5 route hashes
    // identically in the oracle and long-array intersection is ~4×
    // cheaper than string comparison in the per-pair hot loop (the
    // same hashed-set trick as the LSH verify join).
    "dedup_ngram_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("sh",
          graft.functions.ShingleHashes(TextOps.tokens(col("text")), 3))
        .select(col("doc_id"), col("sh"))
      val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      a.join(b, col("doc_b") === col("doc_a") + 1)
        .select(col("doc_a"), col("doc_b"),
          round(Dedup.jaccard(col("sh_a"), col("sh_b")), 6).as("ngram_jaccard_r"))
    }),

    // SimHash near-dup: 32-bit simhash per doc + Hamming distance to
    // the next doc (pairing fixed for determinism).
    "dedup_simhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("simhash", Dedup.simhash(TextOps.tokens(col("text"))))
        .select(col("doc_id"), col("simhash"))
      val nxt = docs.select(col("doc_id").as("next_id"), col("simhash").as("next_sh"))
      docs.join(nxt, col("next_id") === col("doc_id") + 1, "left")
        .select(col("doc_id"), col("simhash"),
          when(col("next_sh").isNotNull, Dedup.hamming(col("simhash"), col("next_sh")))
            .as("hamming_next"))
    }),

    // SORTED-NEIGHBORHOOD dedup (Hernández & Stolfo's merge/purge
    // blocking) with EDIT-DISTANCE matching — the character-level
    // member of the near-dup family (MinHash/LSH sees token SETS and
    // is blind to character edits inside tokens; levenshtein is the
    // complementary signal record linkage uses). Records sort by a
    // normalized 64-char key; each record is compared only to its W
    // following neighbors in sort order, so pair work is ≤ W·n —
    // never all-pairs — and the only heavy op is a sort, which is
    // exactly what a cluster does well (cf. layout_zorder). Blocking
    // on the key's 2-char prefix makes the sort a bounded-bucket
    // window partition (at 100 TB the prefix length is the
    // bucket-granularity knob; a longer prefix = more, smaller
    // sorts); as with any blocking scheme, pairs whose keys diverge
    // in the first 2 chars are out of reach BY DESIGN — the recall
    // trade LSH makes with non-colliding bands. The plan is one
    // shuffle on the bucket, one in-partition sort, W constant-offset
    // lead() frames folded into a single Window node, a generator,
    // and the levenshtein filter — no self-join, no pair blow-up.
    // Edit distance on the fixed 64-char keys bounds the per-pair
    // cost at 64² cells; the integer distance is engine-exact.
    "dedup_sorted_neighborhood" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"),
          substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 64)
            .as("snkey"))
        .withColumn("bkt", substring(col("snkey"), 1, 2))
      val w = Window.partitionBy(col("bkt")).orderBy(col("snkey"), col("doc_id"))
      val nbrs = (1 to SnWindow).map(i =>
        struct(lead(col("doc_id"), i).over(w).as("nbr_id"),
               lead(col("snkey"), i).over(w).as("nbr_key")))
      keyed.withColumn("nbrs", array(nbrs: _*))
        .select(col("doc_id"), col("snkey"), explode(col("nbrs")).as("nbr"))
        .filter(col("nbr.nbr_id").isNotNull)
        .withColumn("edit_dist", levenshtein(col("snkey"), col("nbr.nbr_key")))
        .filter(col("edit_dist") <= SnMaxDist)
        .select(col("doc_id").as("doc_a"), col("nbr.nbr_id").as("doc_b"),
                col("edit_dist"))
    }),

    // JARO-WINKLER record linkage over the same sorted-neighborhood
    // blocks — the fuzzy-matching scorer entity resolution uses where
    // edit distance over-penalizes transpositions and length gaps
    // (names, addresses, titles). Spark has no built-in, so this is
    // the library's `jaro_winkler` native expression (codegen'd
    // static kernel — stays inside the blocking join's whole-stage
    // span; a Scala UDF would box every pair), case-verified against
    // DuckDB's `jaro_winkler_similarity`, which is also the oracle
    // here. Decisions compare the 6-dp-rounded score (fixture margin
    // from the 0.92 threshold: 0.045 — JaroWinklerSpec pins it), so
    // the keep set is engine-identical. Same linear blocking scale
    // shape as dedup_sorted_neighborhood: sort + bounded window,
    // never all-pairs.
    "dedup_jaro_winkler" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.JaroWinkler
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"),
          substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 64)
            .as("snkey"))
        .withColumn("bkt", substring(col("snkey"), 1, 2))
      val w = Window.partitionBy(col("bkt")).orderBy(col("snkey"), col("doc_id"))
      val nbrs = (1 to SnWindow).map(i =>
        struct(lead(col("doc_id"), i).over(w).as("nbr_id"),
               lead(col("snkey"), i).over(w).as("nbr_key")))
      keyed.withColumn("nbrs", array(nbrs: _*))
        .select(col("doc_id"), col("snkey"), explode(col("nbrs")).as("nbr"))
        .filter(col("nbr.nbr_id").isNotNull)
        .withColumn("jw", round(JaroWinkler(col("snkey"), col("nbr.nbr_key")), 6))
        .filter(col("jw") >= JwThreshold)
        .select(col("doc_id").as("doc_a"), col("nbr.nbr_id").as("doc_b"),
                col("jw"))
    }),

    // CONTAINMENT-scored candidate pairs — the ASYMMETRIC near-dup
    // signal Jaccard structurally misses: a short doc fully embedded
    // in a long one has |A∩B|/|A| = 1 but Jaccard ≈ |A|/|B| (tiny),
    // so symmetric thresholds pass exactly the subset-duplication
    // case web dedup most wants to catch (quotes, boilerplate
    // wrappers, page-of-pages). Same star-edge blocking and hashed
    // token sets as the verified LSH pairs; per edge, one
    // intersection feeds both direction scores and the max-≥0.8
    // containment decision (compared on the 6-dp-rounded values both
    // engines already agree on).
    "dedup_containment" -> ((s, dir) => {
      val e = lshEdges(s, dir)
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.ShingleHashes(TextOps.tokens(col("text")), 1).as("tokset"))
      e.join(docs.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("tokset", "set_a"), "doc_a")
        .join(docs.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("tokset", "set_b"), "doc_b")
        .withColumn("n_inter",
          size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
        .withColumn("cont_a",
          round(col("n_inter").cast("double") / size(col("set_a")), 6))
        .withColumn("cont_b",
          round(col("n_inter").cast("double") / size(col("set_b")), 6))
        .select(col("doc_a"), col("doc_b"), col("n_inter"),
          size(col("set_a")).cast("long").as("n_a"),
          size(col("set_b")).cast("long").as("n_b"),
          col("cont_a").as("containment_a"), col("cont_b").as("containment_b"),
          (greatest(col("cont_a"), col("cont_b")) >= 0.8).as("is_contained"))
    }),

    // LABEL-PROPAGATION COMMUNITIES — the near-linear community
    // detector (Raghavan 2007) next to CC's reachability classes: a
    // node adopts the MOST FREQUENT label among its neighbors, so
    // dense near-dup neighborhoods converge to one label while
    // bridge-connected groups that CC would merge stay distinct.
    // Deterministic by construction: synchronous rounds, vote ties
    // broken by (count desc, label asc) under row_number, isolated
    // and unvoted nodes keep their current label — so LpaRounds
    // chained rounds are engine-identical and the DuckDB twin unrolls
    // them exactly. Shape per round: one edge-join + one (dst, lbl)
    // count agg + one per-dst top-1 (WindowGroupLimit) + one label
    // left-join — all partial-aggregable or bounded-window, O(rounds
    // ·|E|) like PageRank, per-round localCheckpoint against plan
    // blow-up. At 100 TB this is THE communities algorithm you run
    // when Louvain's global modularity sweep is too expensive.
    "graph_lpa" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val verts = Tables.documents(s, dir).select(col("doc_id").as("v"))
      val edges = lshEdges(s, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(lshEdges(s, dir)
          .select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var lbl = verts.select(col("v"), col("v").as("lbl")).localCheckpoint()
      (1 to LpaRounds).foreach { _ =>
        val votes = lbl.join(edges, col("v") === col("src"))
          .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
        val top = votes.withColumn("rn", row_number().over(
            Window.partitionBy(col("dst"))
              .orderBy(col("cnt").desc, col("lbl"))))
          .filter(col("rn") === 1)
          .select(col("dst"), col("lbl").as("new_lbl"))
        lbl = lbl.join(top, col("v") === col("dst"), "left")
          .select(col("v"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
          .localCheckpoint()
      }
      edges.unpersist()
      val sizes = lbl.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
      lbl.join(sizes, "lbl")
        .select(col("v").as("doc_id"), col("lbl").as("community_id"),
                col("community_size"))
    }),

    // PARTITION MODULARITY — the one-number quality score for the
    // dedup clustering (Newman's Q): for each component,
    // e_c/m − (d_c/2m)², summed — "how much denser inside components
    // than a degree-preserving random graph". This is the metric
    // that tells a pipeline owner whether the LSH band settings
    // produce real clusters or noise, computed EXACTLY: intra-edge
    // counts and degree sums are integers off two agg-sized joins
    // (edges ⋈ labels on each endpoint), and the only float ops are
    // the two final divisions per component (IEEE, engine-exact).
    // Output: per-component rows + the global Q as component_id = -1.
    "graph_modularity" -> ((s, dir) => {
      val labels = ccLabels(s, dir)
        .select(col("v"), col("lbl"))
      val e = lshEdges(s, dir)
      val m = e.agg(count(lit(1)).as("m"))
      // intra-component edges: both endpoints share a label
      val ec = e
        .join(labels.select(col("v").as("doc_a"), col("lbl").as("la")), "doc_a")
        .join(labels.select(col("v").as("doc_b"), col("lbl").as("lb")), "doc_b")
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("component_id"))
        .agg(count(lit(1)).as("e_in"))
      // degree sums per component (each undirected edge adds 1 to
      // both endpoints' degrees)
      val deg = e.select(col("doc_a").as("v"))
        .unionAll(e.select(col("doc_b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val dc = labels.join(deg, "v")
        .groupBy(col("lbl").as("component_id"))
        .agg(sum(col("deg")).as("d_sum"))
      val per = dc.join(ec, Seq("component_id"), "left")
        .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
        .crossJoin(broadcast(m))
        .withColumn("q_c",
          round(col("e_in").cast("double") / col("m") -
            (col("d_sum").cast("double") / (lit(2L) * col("m")).cast("double")) *
            (col("d_sum").cast("double") / (lit(2L) * col("m")).cast("double")),
            9))
        .select(col("component_id"), col("e_in"), col("d_sum"), col("q_c"))
      // global Q: the 9-dp per-component terms are exact decimals, so
      // the decimal sum is order-free (a double sum would be
      // order-dependent across engines)
      val global = per.agg(lit(-1L).as("component_id"),
        sum(col("e_in")).as("e_in"), sum(col("d_sum")).as("d_sum"),
        sum(col("q_c").cast("decimal(28,9)")).cast("double").as("q_c"))
      per.unionByName(global)
    }),

    // LSH INDEX EVALUATION — the measurement loop every production
    // dedup pipeline runs before trusting its index: on a
    // deterministic FIXED-SIZE doc sample (the EvalSampleN smallest
    // md5 keys — engine-reproducible, and constant-size under corpus
    // growth, so the quadratic truth never scales; the top-N plans as
    // TakeOrdered, a scan + per-partition top-N merge, never a full
    // sort), compute the EXACT all-pairs Jaccard truth (≥ 0.2, the
    // dedup_lsh_pairs threshold), compare against "same CC component"
    // (the dedup decision the pipeline actually takes), and report the
    // confusion counts + precision/recall/F1. The broadcast side is
    // the bounded sample, never the corpus; predicted pairs are
    // cluster-confined (Σ|component∩sample|²). Counts are exact
    // integers; the three ratios are scalar double math rounded at
    // 6 dp.
    "dedup_lsh_eval" -> ((s, dir) => {
      val sample = Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.ShingleHashes(TextOps.tokens(col("text")), 1)
            .as("tokset"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 14),
            16, 10).cast("long").as("skey"))
        .orderBy(col("skey"), col("doc_id"))
        .limit(EvalSampleN)
        .select(col("doc_id"), col("tokset"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = sample.select(col("doc_id").as("doc_a"), col("tokset").as("set_a"))
      val b = sample.select(col("doc_id").as("doc_b"), col("tokset").as("set_b"))
      val truth = a.join(broadcast(b), col("doc_a") < col("doc_b"))
        .filter(Dedup.jaccard(col("set_a"), col("set_b")) >= 0.2)
        .select(col("doc_a"), col("doc_b"), lit(1).as("t"))
      val slabels = sample.select(col("doc_id"))
        .join(ccLabels(s, dir), col("doc_id") === col("v"))
        .select(col("doc_id"), col("lbl"))
      val pred = slabels.select(col("doc_id").as("doc_a"), col("lbl"))
        .join(slabels.select(col("doc_id").as("doc_b"), col("lbl")), "lbl")
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), lit(1).as("p"))
      val conf = truth.join(pred, Seq("doc_a", "doc_b"), "full_outer")
        .agg(
          sum(when(col("t").isNotNull && col("p").isNotNull, 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("t").isNotNull && col("p").isNull, 1L).otherwise(0L))
            .as("fn"),
          sum(when(col("t").isNull && col("p").isNotNull, 1L).otherwise(0L))
            .as("fp"))
      val nSample = sample.agg(count(lit(1)).as("n_sample"))
      val prec = col("tp").cast("double") / (col("tp") + col("fp"))
      val rec  = col("tp").cast("double") / (col("tp") + col("fn"))
      conf.crossJoin(broadcast(nSample)).select(
        col("n_sample"),
        (col("tp") + col("fn")).as("n_truth"),
        (col("tp") + col("fp")).as("n_pred"),
        col("tp"), col("fp"), col("fn"),
        round(prec, 6).as("precision"),
        round(rec, 6).as("recall"),
        round(lit(2.0) * prec * rec / (prec + rec), 6).as("f1"))
    }),

    // LSH BANDING SWEEP — the index-tuning curve behind the eval
    // above: precision/recall/F1 for three (bands, rows-per-band)
    // splits of the SAME 16-hash signature — (8,2) recall-leaning,
    // (4,4) the production point, (2,8) precision-leaning — each
    // predicting candidate pairs by shared band buckets within the
    // fixed 128-doc sample, against the same exact-Jaccard truth.
    // This is how an operator team picks the banding before a 100 TB
    // run: the sweep costs O(sample²) per config regardless of corpus
    // size (truth and candidates both live on the sample), and the
    // S-curve 1 − (1 − j^r)^b it traces decides the config. Note the
    // measured monotonicity: recall falls and precision rises from
    // (8,2) → (2,8) (LshSweepSpec pins it).
    "dedup_lsh_sweep" -> ((s, dir) => {
      val sample = Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.ShingleHashes(TextOps.tokens(col("text")), 1)
            .as("tokset"),
          Dedup.minhashSignature(array_distinct(TextOps.tokens(col("text"))))
            .as("sig"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 14),
            16, 10).cast("long").as("skey"))
        .orderBy(col("skey"), col("doc_id"))
        .limit(EvalSampleN)
        .select(col("doc_id"), col("tokset"), col("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = sample.select(col("doc_id").as("doc_a"), col("tokset").as("set_a"))
      val b = sample.select(col("doc_id").as("doc_b"), col("tokset").as("set_b"))
      val truth = a.join(broadcast(b), col("doc_a") < col("doc_b"))
        .filter(Dedup.jaccard(col("set_a"), col("set_b")) >= 0.2)
        .select(col("doc_a"), col("doc_b"), lit(1).as("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      LshSweepConfigs.map { case (nb, rp) =>
        val bands = sample.select(col("doc_id"),
            explode(Dedup.bandHashesCfg(col("sig"), nb, rp)).as("bh"))
          .select(col("doc_id"), col("bh.band").as("band"),
                  col("bh.band_hash").as("band_hash"))
        val pred = bands
          .select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
          .join(bands.select(col("doc_id").as("doc_b"), col("band"),
            col("band_hash")), Seq("band", "band_hash"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b")).distinct()
          .withColumn("p", lit(1))
        val prec = col("tp").cast("double") / (col("tp") + col("fp"))
        val rec  = col("tp").cast("double") / (col("tp") + col("fn"))
        truth.join(pred, Seq("doc_a", "doc_b"), "full_outer")
          .agg(
            sum(when(col("t").isNotNull && col("p").isNotNull, 1L).otherwise(0L))
              .as("tp"),
            sum(when(col("t").isNotNull && col("p").isNull, 1L).otherwise(0L))
              .as("fn"),
            sum(when(col("t").isNull && col("p").isNotNull, 1L).otherwise(0L))
              .as("fp"))
          .select(lit(nb.toLong).as("bands"), lit(rp.toLong).as("rows_per_band"),
            col("tp"), col("fp"), col("fn"),
            round(when(col("tp") + col("fp") > 0, prec), 6).as("precision"),
            round(rec, 6).as("recall"),
            round(when(col("tp") > 0,
              lit(2.0) * prec * rec / (prec + rec)), 6).as("f1"))
      }.reduce(_.unionByName(_))
    }),

    // ADAMIC-ADAR link prediction — score NON-adjacent doc pairs by
    // Σ_z 1/ln(deg(z)) over their common neighbors z (the canonical
    // similarity-completion operator: "these two docs share rare
    // neighbors, the LSH bands probably just missed the edge").
    // Wedge enumeration is a self-join of the symmetrized star edges
    // on the middle vertex — the triangle-count shape — bounded by the
    // hub cap (Σ deg(z)² ≤ cap·|E|, see AaHubCap), then one
    // partial-aggregable sum per candidate pair, an anti-join against
    // the existing edges (predictions only), and a top-k cut under a
    // total order. deg(z) ≥ 2 for any wedge middle, so ln is never 0.
    // 1/ln terms are 12-dp-quantized and decimal-summed (order-free,
    // engine-identical); score rounded once at 6 dp.
    "graph_adamic_adar" -> ((s, dir) => {
      val e = lshEdges(s, dir)
      val edges = e.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(e.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val mid = edges.join(deg.filter(col("deg") <= AaHubCap), "src")
      val left  = mid.select(col("src").as("z"), col("dst").as("u"), col("deg"))
      val right = mid.select(col("src").as("z"), col("dst").as("w"))
      val scores = left.join(right, "z").filter(col("u") < col("w"))
        .groupBy(col("u"), col("w"))
        .agg(count(lit(1)).as("common_neighbors"),
             sum(round(lit(1.0) / log(col("deg")), 12).cast("decimal(28,12)"))
               .as("aa"))
      val predicted = scores.join(
        edges.select(col("src").as("u"), col("dst").as("w")),
        Seq("u", "w"), "left_anti")
      val out = predicted.select(col("u").as("doc_a"), col("w").as("doc_b"),
          col("common_neighbors"),
          round(asDouble(col("aa")), 6).as("aa_score"))
        .orderBy(col("aa_score").desc, col("doc_a"), col("doc_b"))
        .limit(AaTopK)
      edges.unpersist()
      out
    }),

    // JACCARD LINK PREDICTION — the set-overlap reading on the SAME
    // hub-capped wedge enumeration as graph_adamic_adar (AA weights
    // rare middles; Jaccard normalizes by the neighborhood UNION, so
    // two low-degree docs with one shared neighbor outrank two hubs
    // with three): |N∩|/(deg_u + deg_w − |N∩|) over non-edges, top-K.
    // The score is a small-integer rational (1/128 sits exactly ON a
    // 6-dp half), so the final round rides the tie-safe chain.
    "graph_jaccard_linkpred" -> ((s, dir) => {
      val e = lshEdges(s, dir)
      val edges = e.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(e.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val mid = edges.join(deg.filter(col("deg") <= AaHubCap), "src")
      val left  = mid.select(col("src").as("z"), col("dst").as("u"))
      val right = mid.select(col("src").as("z"), col("dst").as("w"))
      val commons = left.join(right, "z").filter(col("u") < col("w"))
        .groupBy(col("u"), col("w"))
        .agg(count(lit(1)).as("common_neighbors"))
      val predicted = commons.join(
        edges.select(col("src").as("u"), col("dst").as("w")),
        Seq("u", "w"), "left_anti")
      val out = predicted
        .join(deg.select(col("src").as("u"), col("deg").as("deg_u")), "u")
        .join(deg.select(col("src").as("w"), col("deg").as("deg_w")), "w")
        .select(col("u").as("doc_a"), col("w").as("doc_b"),
          col("common_neighbors"), col("deg_u"), col("deg_w"),
          round(round(col("common_neighbors").cast("double")
              / (col("deg_u") + col("deg_w") - col("common_neighbors"))
                .cast("double"), 12).cast("decimal(24,12)"), 6).cast("double")
            .as("jaccard_r"))
        .orderBy(col("jaccard_r").desc, col("doc_a"), col("doc_b"))
        .limit(AaTopK)
      edges.unpersist()
      out
    }),

    // RICH-CLUB COEFFICIENT — do the high-degree docs (the heavy
    // near-dup hubs) preferentially connect to EACH OTHER? φ(k) =
    // 2·E_k/(N_k(N_k−1)) over the frozen degree grid k ∈
    // {1,2,4,8,16}: the topology audit that tells a dedup pipeline
    // whether its hub docs form one tangled club (transitive-closure
    // blowup risk) or independent stars. One degree agg + two
    // broadcast k-grid conditional counts; φ is a small-integer
    // rational, so the final rides the tie-safe chain.
    "graph_rich_club" -> ((s, dir) => {
      val e = lshEdges(s, dir)
      val und = e.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(e.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val kgrid = s.range(1).select(explode(array(
        lit(1L), lit(2L), lit(4L), lit(8L), lit(16L))).as("k"))
      val nk = deg.crossJoin(broadcast(kgrid))
        .filter(col("deg") > col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_k"))
      val ek = e
        .join(deg.select(col("src").as("doc_a"), col("deg").as("da")), "doc_a")
        .join(deg.select(col("src").as("doc_b"), col("deg").as("db")), "doc_b")
        .crossJoin(broadcast(kgrid))
        .filter(col("da") > col("k") && col("db") > col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("e_k"))
      kgrid.join(nk, Seq("k"), "left").join(ek, Seq("k"), "left")
        .select(col("k"), coalesce(col("n_k"), lit(0L)).as("n_k"),
          coalesce(col("e_k"), lit(0L)).as("e_k"))
        .select(col("k"), col("n_k"), col("e_k"),
          when(col("n_k") > 1,
            round(round(lit(2.0) * col("e_k").cast("double")
              / (col("n_k").cast("double") * (col("n_k") - 1).cast("double")),
              12).cast("decimal(24,12)"), 6).cast("double")).as("phi_r"))
    }),

    // MULTI-SOURCE BFS over the dedup graph: every document's hop
    // distance to its component's canonical representative (the CC
    // label minimum — the shared artifact), all components in ONE
    // pass. hop_dist is the length of the near-dup transitivity chain
    // that links a doc to the copy the pipeline keeps — the curation
    // signal behind "how aggressive is transitive dedup here" (a
    // 1-hop dup collided with its keeper directly; a 4-hop dup is
    // kept-or-dropped purely by chain closure). Frontier expansion as
    // iterated join/min with the CC round shape and convergence
    // early-exit (graft.operators.Bfs); distances cap at BfsRounds
    // hops — vertices further out carry no row, identically bounded
    // in the unrolled oracle recursion.
    "graph_bfs" -> ((s, dir) => {
      val seeds = ccLabels(s, dir).select(col("lbl").as("v")).distinct()
      val pairs = lshEdges(s, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      graft.operators.Bfs.distances(seeds, pairs, BfsRounds)
        .select(col("v").as("doc_id"), col("dist").as("hop_dist"))
    }),

    // DEDUP CLUSTER-SIZE HISTOGRAM — the standard dedup report next
    // to pipeline_dedup_impact: how big are the near-dup components
    // (a heavy tail means aggressive transitive collapse; all-1s
    // means the banding found nothing). A SECOND finish on the
    // materialized ccLabels artifact — one size agg + one histogram
    // agg, both partial-aggregable; the pct joins ONE broadcast
    // scalar. Count-of-counts frames are value-domain-sized.
    "pipeline_cluster_sizes" -> ((s, dir) => {
      val sizes = ccLabels(s, dir)
        .groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
      val hist = sizes.groupBy(col("sz").as("size"))
        .agg(count(lit(1)).as("n_components"))
        .withColumn("n_docs", col("size") * col("n_components"))
      hist.crossJoin(broadcast(
          hist.agg(sum(col("n_docs")).as("n_total"))))
        .select(col("size"), col("n_components"), col("n_docs"),
          round(col("n_docs").cast("double")
            / col("n_total").cast("double"), 6).as("pct_docs_r"))
    }),

    // DEGREE DISTRIBUTION + CCDF of the dedup graph — the structural
    // audit behind every bounded-wedge argument in this file (the
    // Adamic-Adar hub cap, the LSH star radius): degree histogram
    // over the symmetrized star edges with zero-degree documents
    // included (a dedup graph's isolated-vertex share IS the novelty
    // rate). The CCDF cumulative runs over the distinct-degree grid
    // via the TinyOrder triangular join — value-domain-sized, never
    // an unpartitioned data window.
    "graph_degree_distribution" -> ((s, dir) => {
      val sym = lshEdges(s, dir)
        .select(col("doc_a").as("v"), col("doc_b").as("w"))
        .unionAll(lshEdges(s, dir)
          .select(col("doc_b").as("v"), col("doc_a").as("w")))
      val deg = Tables.documents(s, dir).select(col("doc_id").as("v"))
        .join(sym.groupBy(col("v")).agg(count(lit(1)).as("d")), Seq("v"), "left")
        .withColumn("d", coalesce(col("d"), lit(0L)))
      val hist = deg.groupBy(col("d").as("degree"))
        .agg(count(lit(1)).as("n_nodes"))
      val cum = graft.operators.TinyOrder.exclusivePrefixSum(
        hist, col("n_nodes"), "cum_below", Seq(col("degree")))
      cum.crossJoin(broadcast(hist.agg(sum(col("n_nodes")).as("n_total"))))
        .select(col("degree"), col("n_nodes"),
          (col("n_total") - col("cum_below")).as("n_ge"),
          round((col("n_total") - col("cum_below")).cast("double")
            / col("n_total").cast("double"), 6).as("ccdf_r"))
    }),

    // SAMPLED CLOSENESS CENTRALITY — per-seed distance profiles over
    // the dedup graph for a deterministic panel of component reps
    // (the ClosenessSeeds smallest — exact all-pairs closeness is
    // O(V·E) and never the 100 TB plan; a seed panel is how
    // centrality is estimated at scale). Per-seed BFS via
    // Bfs.labeledDistances (the product-graph join/min — |seeds|
    // runs share each round's ONE edge join); the finish reads
    // bounded-horizon closeness (reached−1)/Σd, harmonic centrality
    // Σ 1/d (9-dp-quantized terms, decimal-summed — the engines'
    // division ulp never reaches the sum), and the within-horizon
    // eccentricity. Everything past the BFS is a |seeds|-row agg.
    "graph_closeness_sampled" -> ((s, dir) => {
      val seeds = ccLabels(s, dir).select(col("lbl")).distinct()
        .orderBy(col("lbl")).limit(ClosenessSeeds)
        .select(col("lbl").as("s"))
      val pairs = lshEdges(s, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      graft.operators.Bfs.labeledDistances(seeds, pairs, BfsRounds)
        .groupBy(col("s"))
        .agg(count(lit(1)).as("n_reached"),
          sum(col("dist")).as("dist_sum"),
          max(col("dist")).as("ecc_h"),
          sum(when(col("dist") > 0,
            round(lit(1.0) / col("dist").cast("double"), 9)
              .cast("decimal(20,9)"))
            .otherwise(lit(0).cast("decimal(20,9)"))).as("hsum"))
        .select(col("s").as("seed"), col("n_reached"), col("dist_sum"),
          col("ecc_h"),
          when(col("dist_sum") > 0,
            round((col("n_reached") - 1).cast("double")
              / col("dist_sum").cast("double"), 6)).as("closeness_r"),
          round(col("hsum").cast("double"), 6).as("harmonic_r"))
    })
  )

  /** Seed-panel size for `graph_closeness_sampled` — the smallest
    * component reps, deterministic across engines and scale factors.
    */
  private[graft] val ClosenessSeeds = 4

  /** BFS hop horizon for `graph_bfs` — comfortably past the LSH star
    * graph's tiny diameter (stars have radius 1 around bucket reps;
    * chains of overlapping stars rarely exceed a few hops).
    * private[graft]: BfsSpec re-runs with BfsRounds + 1 to prove the
    * cap is past the fixpoint.
    */
  private[graft] val BfsRounds = 6

  /** Sorted-neighborhood window width (neighbors compared per record)
    * and match threshold (edit distance on the 64-char normalized
    * key; 16 ≈ 75% character similarity). private[graft]: the spec
    * asserts the ≤ W·n pair-work bound against these constants.
    */
  private[graft] val SnWindow = 8
  private[graft] val SnMaxDist = 16

  /** `dedup_jaro_winkler` keep threshold (on the 6-dp-rounded score;
    * fixture margin 0.045, pinned by JaroWinklerSpec).
    */
  private[graft] val JwThreshold = 0.92

  /** Span window length (tokens) for substring-level dedup — the
    * LLM-pipeline convention is 20-50; 20 keeps spans meaningful on
    * the fixture's 10-99-token docs.
    */
  private[queries] val SpanTokens = 20

  /** `pipeline_decontaminate`'s planted shared span (25 fixed tokens,
    * > SpanTokens so it registers as a duplicated gram run): appended
    * to doc_id % 11 = 5 docs on BOTH engines, it lands in both splits
    * and gives the strip arm partial-coverage positives the natural
    * fixture lacks (its only repeated spans are whole-doc copies).
    */
  private[queries] val DeconPlantSpan: String =
    (0 until 25).map(i => s"decon$i").mkString(" ")

  /** `pipeline_decontaminate`'s planted EVAL-COPY text (40 fixed
    * tokens): REPLACES the text of doc_id % 31 = 9 docs on both
    * engines. Needed because the transform now gates against the
    * component-keyed release split (VERDICT r16 item 5), under which
    * the corpus's organic whole-doc duplicates can never straddle
    * splits — identical texts hash to identical MinHash signatures,
    * LSH links them into one component, and the component split keeps
    * components together (the exact property pipeline_contamination
    * proves). The replaced docs' ORIGINAL texts are LSH-unlinked, so
    * they scatter across components and splits; any one landing in
    * val/test makes every train member a full eval copy
    * (coverage ≈ 1 → drop), giving the drop arm real positives.
    */
  private[queries] val DeconCopyText: String =
    (0 until 40).map(i => f"evalcopy$i%02d").mkString(" ")

  /** The decontamination fixture augmentation, shared by the batch
    * query, its streaming twin, and (constant-duplicated) the spec
    * and the DuckDB oracle: full-copy replacement first, then the
    * 25-token span plant.
    */
  private[queries] def deconAugText: org.apache.spark.sql.Column = concat(
    when(col("doc_id") % 31 === 9, lit(DeconCopyText)).otherwise(col("text")),
    when(col("doc_id") % 11 === 5, lit(" " + DeconPlantSpan))
      .otherwise(lit(""))).as("text")

  /** Verification threshold for the release near-dup graph: true
    * shingle Jaccard ≥ 1/2, compared integer-exactly as
    * 3·|A∩B| ≥ |A|+|B| on both engines.
    */
  private val VerifyNum = 3L

  /** 3-token shingle STRINGS (the signature input — MinHashSig hashes
    * them internally with the same h31 chain the oracle inlines).
    * Guarded for sub-3-token docs (Spark's `sequence(1, 0)` is
    * DESCENDING, not empty like DuckDB's generate_series).
    */
  private def shingleStrings(toks: org.apache.spark.sql.Column) =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** The VERIFIED near-dup component labels — the bucket → VERIFY →
    * cluster chain (Lee et al.; the stage the raw star graph lacks):
    * MinHash-LSH over 3-token SHINGLES (unigram-token signatures are
    * the wrong granularity for document identity — on this corpus's
    * shared vocabulary they transitively chain 98-99.9% of all docs
    * into ONE component at every SF, measured r17: sf0.001 490/500,
    * sf0.1 4997/5000, making the raw-CC split degenerate as a release
    * split: 1-4 train docs), candidate pairs WITHIN each band bucket,
    * each candidate verified by true shingle Jaccard ≥ 1/2
    * (integer-exact), CC over the surviving edges. At 100 TB:
    * shingle-band buckets are near-dup-cluster-sized (not
    * vocabulary-sized), so the in-bucket pairing is bounded; a
    * production run additionally caps pathological buckets (a
    * band key shared by thousands of documents carries no identity
    * signal) — irrelevant at fixture scale, noted for posture.
    */
  private def verifiedCcLabels(s: org.apache.spark.sql.SparkSession,
                               dir: String) =
    Artifacts.materialized(s, dir, "verified_cc") {
      // EXACT-COLLAPSE first (r17 — the production near-dup order:
      // exact dedup before LSH). Identical texts have identical
      // shingle sets (Jaccard 1 ≥ the verify threshold), so every copy
      // of a text provably joins its representative's component —
      // signatures, banding, verification, and CC need only run on
      // DISTINCT texts, with labels joined back through the text key.
      // Output-identical: a component's label is min(doc_id) over
      // members; each text group's min IS its representative, so the
      // min over reps in a component equals the global member min.
      // Measured r17: the 10× scale corpus is a 10-way self-union, and
      // without the collapse its in-bucket pairing is quadratic in the
      // copy count (pipeline_decontaminate drew 25 s / 9.0× at 10×);
      // at 100 TB copy-heavy crawls are the common case.
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"), md5(col("text")).as("tkey"))
      val reps = keyed.groupBy(col("tkey")).agg(min(col("doc_id")).as("rep"))
      val base = Tables.documents(s, dir)
        .join(reps.select(col("rep").as("doc_id"), col("tkey")), "doc_id")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val withSig = base.select(col("doc_id"),
        graft.functions.ShingleHashes(col("toks"), 3).as("sh"),
        Dedup.minhashSignature(shingleStrings(col("toks"))).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = withSig.select(col("doc_id"),
          explode(sequence(lit(0L), lit(Dedup.NumBands - 1L))).as("band"),
          col("sig"))
        .select(Seq(col("doc_id"), col("band")) ++
          (0 until Dedup.RowsPerBand).map(j =>
            element_at(col("sig"),
              (col("band") * Dedup.RowsPerBand + j + 1).cast("int"))
              .as(s"k$j")): _*)
      val keys = Seq("band", "k0", "k1", "k2", "k3")
      val cand = bands.select((col("doc_id").as("doc_a") +: keys.map(col)): _*)
        .join(bands.select((col("doc_id").as("doc_b") +: keys.map(col)): _*),
          keys)
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      val sh = withSig.select(col("doc_id"), col("sh"))
      val edges = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
          "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
          "doc_b")
        .filter(size(array_intersect(col("sh_a"), col("sh_b"))) * VerifyNum
          >= size(col("sh_a")) + size(col("sh_b")))
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      val verts = reps.select(col("rep").as("v"))
      val repCc = graft.operators.ConnectedComponents.labels(verts, edges)
      // broadcast the rep labels back through the text key — every
      // copy inherits its representative's component label
      val out = keyed.join(reps, "tkey")
        .join(repCc.select(col("v").as("rep"), col("lbl")), "rep")
        .select(col("doc_id").as("v"), col("lbl"))
      withSig.unpersist()
      out
    }

  /** The release split (doc_id → split) — the VERIFIED-component
    * `pipeline_split_verified` assignment as a reusable projection.
    * VERDICT r16 item 5 asked to gate decontamination on the shared
    * ccLabels split; measured this round, that split is degenerate on
    * this corpus (the raw star graph chains ~99% of docs into one
    * component — see [[verifiedCcLabels]]), so the release split is
    * the verified-component one, and decontamination gates train
    * against exactly the eval set it holds out — one split fact.
    */
  private[queries] def releaseSplits(s: org.apache.spark.sql.SparkSession,
                                     dir: String) =
    verifiedCcLabels(s, dir)
      .select(col("v").as("doc_id"), splitOf(col("lbl")).as("split"))

  /** Pack budget (tokens) for sequence packing — small enough that the
    * fixture yields many packs per split.
    */
  private[graft] val PackBudget = 512L

  /** Pack-shard fan-out: bounds the per-window sort partition (a real
    * deployment sizes this to executors × a few; 4 keeps fixture packs
    * multi-document).
    */
  private val NumPackShards = 4L

  /** Mixing-budget coefficient for `pipeline_mix`: per-source token
    * quota = MixCoef·√T_s (≙ B/Σ√T_s for a global budget B, folded to
    * a constant so the per-source decision needs no cross-source
    * normalization). 3.0 selects a few docs per fixture source.
    */
  private val MixCoef = 3.0

  /** Epoch (repetition) cap for `pipeline_mix_epochs` — the
    * data-constrained-scaling guard: no source is repeated more than
    * this many times however much the temperature weighting wants it
    * (the 4-epoch knee where repetition stops helping).
    */
  private[graft] val MaxEpochs = 4.0

  /** The mergeable half of `pipeline_mix_epochs`: per-source total
    * token counts — one partial-aggregable hash agg, and ADDITIVE, so
    * per-micro-batch partials re-summed per source equal the batch
    * aggregation exactly (`stream_mix_epochs`'s hash proof).
    */
  private[graft] def sourceTokens(d: org.apache.spark.sql.DataFrame) =
    d.select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("t_source"))

  /** Temperature-weighted epoch planning from merged per-source token
    * counts — the mixture step after `pipeline_mix`'s selection: given
    * a global token budget B = 2·T (two corpus passes), allocate
    * target_s = B·w_s under τ = 2 temperature weights
    * w_s = √T_s / Σ√T_s, and convert to a per-source REPETITION factor
    * epochs_s = target_s / T_s capped at [[MaxEpochs]] (repeating a
    * tiny source 40× buys memorization, not loss). Cross-engine
    * determinism: each √T_s is quantized to 6 dp BEFORE the
    * (order-sensitive) normalizer sum — the sum runs in exact
    * DECIMAL(18,6); every step after is a fixed-order IEEE chain per
    * source row, and the cap flag compares the ROUNDED epochs value.
    * The finish is a #sources-row frame on top of one hash agg.
    */
  private[graft] def mixEpochsFinish(ts: org.apache.spark.sql.DataFrame) = {
    val tot = ts.agg(
      sum(col("t_source")).as("t_total"),
      sum(round(sqrt(col("t_source").cast("double")), 6)
        .cast("decimal(18,6)")).as("s_total"))
    ts.crossJoin(broadcast(tot))
      .withColumn("w_d", round(sqrt(col("t_source").cast("double")), 6)
        / asDouble(col("s_total")))
      .withColumn("epochs_d",
        lit(2.0) * asDouble(col("t_total")) * col("w_d")
          / asDouble(col("t_source")))
      .withColumn("epochs_r", round(col("epochs_d"), 6))
      .select(col("source"), col("t_source"),
        round(col("w_d"), 9).as("weight_r"),
        col("epochs_r"),
        floor(least(col("epochs_d"), lit(MaxEpochs))
          * asDouble(col("t_source"))).cast("long").as("planned_tokens"),
        (col("epochs_r") > lit(MaxEpochs)).as("capped"))
  }

  /** Sample-position count for `pipeline_sample_weighted` — small
    * enough that selection is genuinely sparse on the fixture.
    * private[graft]: PipelineOpsSpec asserts the exactly-n invariant
    * against this constant.
    */
  private[graft] val WeightedSampleN = 20

  /** `pipeline_sample_wor` reservoir size (Efraimidis–Spirakis A-ES
    * keys, top-K by key). private[graft]: SampleWorSpec pins the
    * rank-K/K+1 key gap and the 12-dp rounding-boundary margins
    * against this constant.
    */
  private[graft] val WorSampleK = 50

  /** A-ES reservoir keys per doc: key = 12-dp-rounded ln(u)/w with u
    * a dyadic-rational md5-uniform (12 hex → (h+1)/2⁴⁸ is exactly
    * representable) and w the token count.
    */
  private[graft] def worKeys(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val h = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit("#wor"))), 1, 12), 16, 10).cast("long")
    docs
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        h.as("h"))
      .withColumn("key_r",
        round(log((col("h") + lit(1L)).cast("double")
                  / lit(281474976710656.0)) / col("n_tokens"), 12))
      .select(col("doc_id"), col("n_tokens"), col("key_r"))
  }

  /** Top-K by (key desc, doc_id): sound under per-shard truncation —
    * the key is a pure per-row function, so re-selecting over merged
    * partial top-Ks equals the global top-K (`stream_sample_wor`'s
    * hash proof; contrast stream_topk, where count-based top-k is NOT
    * mergeable and must keep full partials).
    */
  /** The distributed top-K take (TakeOrderedAndProject — per-partition
    * top-K, no global shuffle) BEFORE the TinyOrder rank — exposed
    * because the rank's eager localCheckpoint truncates the executed
    * plan to a checkpoint scan, so PlanShapeSpec's map-side-take
    * assertion must read THIS frame's plan (the shipped chain).
    */
  private[graft] def worTake(keys: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    keys.orderBy(col("key_r").desc, col("doc_id")).limit(WorSampleK)

  private[graft] def worTopK(keys: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    worTake(keys)
      .transform(df => graft.operators.TinyOrder.rank(df, "rn",
        Seq(negate(col("key_r")), col("doc_id"))))
      .select(col("doc_id"), col("n_tokens"), col("key_r"),
              col("rn").cast("long").as("rn"))
  }

  /** PageRank iteration budget (bounded like the Lloyd/CC loops). */
  private val PrRounds = 3

  /** Serve size for `graph_ppr`'s related-documents list. */
  private[graft] val PprTopK = 20

  /** `graph_lpa` synchronous vote rounds (star-edge graphs settle in
    * 2; 4 exercises the stability fixpoint in the unrolled oracle).
    */
  private val LpaRounds = 4

  /** `graph_adamic_adar` hub cap: wedges through a middle vertex with
    * degree > cap are skipped — the standard production bound that
    * keeps common-neighbor enumeration Σ deg(z)² ≤ cap·|E| instead of
    * quadratic in a super-hub's bucket (a stopword-like hub predicts
    * nothing anyway: its 1/ln(deg) weight is why Adamic-Adar
    * discounts it). Same constant on both engines.
    */
  private val AaHubCap = 64
  private val AaTopK   = 50

  /** `dedup_lsh_eval` sample size — FIXED, so the all-pairs truth is
    * O(EvalSampleN²) regardless of corpus size.
    */
  private val EvalSampleN = 128

  /** (bands, rows-per-band) splits of the 16-hash signature for
    * `dedup_lsh_sweep` — recall-leaning, production, precision-leaning.
    */
  private val LshSweepConfigs = Seq((8, 2), (4, 4), (2, 8))

  /** Peel-round budget per k for `graph_kcore` (bounded like the
    * Lloyd/CC/PageRank loops; fixpoint-on-fixture proven by
    * KCoreSpec). private[graft]: the spec re-runs with KcRounds + 1
    * to prove the cap is past the fixpoint.
    */
  private[graft] val KcRounds = 6

  /** `graph_kcore` body, parameterized by round budget so KCoreSpec
    * can prove fixpoint (rounds vs rounds+1 identical). Coreness is
    * capped at 3: 0 = isolated, 1 = touches an edge, 2/3 = survives
    * the 2-/3-core peel — the decision signal a dedup pipeline reads
    * (bucket-incidental vs dense family); deeper cores add rounds,
    * not structure.
    */
  private[graft] def kcoreness(s: org.apache.spark.sql.SparkSession,
                               dir: String, rounds: Int) = {
    val sym = lshEdges(s, dir)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(lshEdges(s, dir)
        .select(col("doc_b").as("u"), col("doc_a").as("v")))
      .localCheckpoint()
    // Early exit is SOUND and oracle-invisible: e_r ⊆ e_{r-1}, so an
    // unchanged edge count means e_r = e_{r-1} (the fixpoint) and
    // every remaining round is the identity — the bounded DuckDB
    // unroll computes the same table either way. At 100× this cuts
    // the 2×6 materialized rounds to the ~3 the graph actually needs.
    def peel(start: org.apache.spark.sql.DataFrame, k: Int) = {
      var e = start
      var prevCount = e.count()
      var converged = false
      (1 to rounds).foreach { _ =>
        if (!converged) {
          val surv = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
            .filter(col("d") >= k).select(col("u"))
          e = e.join(surv, Seq("u"), "left_semi")
            .join(surv.select(col("u").as("v")), Seq("v"), "left_semi")
            .select(col("u"), col("v"))
            .localCheckpoint()
          val c = e.count()
          converged = c == prevCount
          prevCount = c
        }
      }
      e
    }
    val e2 = peel(sym, 2)
    val e3 = peel(e2, 3)
    def members(e: org.apache.spark.sql.DataFrame, flag: String) =
      e.select(col("u").as("doc_id")).distinct().withColumn(flag, lit(1L))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(members(sym, "k1"), Seq("doc_id"), "left")
      .join(members(e2, "k2"), Seq("doc_id"), "left")
      .join(members(e3, "k3"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("k1"), lit(0L)) + coalesce(col("k2"), lit(0L)) +
         coalesce(col("k3"), lit(0L))).as("coreness"))
  }

  /** The (doc_id, span_h) table — materialized once per (session,
    * dir) and shared by `dedup_substring` and
    * `dedup_substring_spans` (at scale it is the pipeline's spans
    * table, written once).
    */
  private def docSpans(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "doc_spans") {
      Dedup.spanTable(
        Tables.documents(s, dir).select(col("doc_id"), col("text")), SpanTokens)
    }

  /** The POSITIONAL (doc_id, pos, gram_h) table — materialized once
    * per (session, dir) and shared by `dedup_substring_coverage` and
    * `pipeline_substring_impact` (at scale it is the pipeline's grams
    * table, written once beside the spans table).
    */
  private[queries] def docGrams(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "doc_grams") {
      Dedup.gramTable(
        Tables.documents(s, dir).select(col("doc_id"), col("text")), SpanTokens)
    }

  /** Per-document span COVERAGE — the interval-union finish over the
    * gram artifact, materialized once and shared by
    * `dedup_substring_coverage`, `pipeline_substring_impact`,
    * `pipeline_select_v2` and `pipeline_dataset_card` (at scale: the
    * coverage column a curation run writes beside the documents after
    * the gram pass, read by every downstream keep/strip/report stage).
    */
  private def docCoverage(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "doc_coverage") {
      Dedup.spanCoverageFrom(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        docGrams(s, dir), SpanTokens)
    }

  /** Per-document curation flags (quality score, language prediction,
    * sequential-pass PII count, exact fingerprint, source) — one narrow
    * projection shared by `pipeline_select` and
    * `pipeline_source_report`.
    */
  private def docFlags(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("fp"),
        let1(TextOps.tokens(col("text"))) { t =>
          let1(struct(
              size(t).cast("long").as("n_tokens"),
              size(array_distinct(t)).cast("long").as("n_distinct"),
              (TextOps.tokenCount(t, "the") + TextOps.tokenCount(t, "a")).as("n_stop"),
              TextOps.tokenCount(t, "the").as("cnt_en"),
              TextOps.tokenCount(t, "a").as("cnt_es"),
              TextOps.tokenCount(t, "data").as("cnt_de"),
              length(col("text")).cast("long").as("n_chars"))) { st =>
            val nTok = st.getField("n_tokens")
            val ttr = st.getField("n_distinct") / nTok
            val stopRatio = st.getField("n_stop") / nTok
            val meanLen = (st.getField("n_chars") - (nTok - 1)) / nTok
            struct(
              // the TextQueries.qualityOf tie-safe rounding, verbatim
              round(round(ttr * 0.4 + (lit(1.0) - stopRatio) * 0.3 +
                    least(meanLen / 10.0, lit(1.0)) * 0.3, 9)
                  .cast("decimal(18,9)"), 6)
                .cast("double").as("quality"),
              TextOps.langPredict(st.getField("cnt_en"), st.getField("cnt_es"),
                st.getField("cnt_de")).as("lang_pred"))
          }
        }.as("s"),
        (TextOps.piiCounts(col("text")) match {
          case (e, p, i) => e + p + i
        }).as("n_pii"))
      .select(col("doc_id"), col("source"), col("fp"), col("n_pii"),
              col("s.quality").as("quality"), col("s.lang_pred").as("lang_pred"))

  /** Component label → deterministic 80/10/10 split (md5-mod 10). */
  private[queries] def splitOf(lbl: org.apache.spark.sql.Column) = {
    val shard = conv(substring(md5(lbl.cast("string")), 1, 14), 16, 10)
      .cast("long") % 10
    when(shard < 8, "train").when(shard === 8, "val").otherwise("test")
  }

  // ---- LSH star-graph helpers ----------------------------------------

  /** Per-bucket join key: band index + the RAW 4-long signature slice
    * (no md5 band strings on the shuffle — narrower rows,
    * primitive-equality codegen hash agg/join). private[graft]: the
    * streaming incremental-dedup query joins its per-batch bands
    * against the static base-bucket table on the same key.
    */
  private[graft] val bandKeys: Seq[String] =
    "band" +: (0 until Dedup.RowsPerBand).map(i => s"k$i")

  /** One row per (doc, band) with the band's signature slice unpacked
    * to primitive key columns. O(NumBands · n). Consumers join this
    * frame against its own aggregate, so [[lshEdges]]/[[lshKeep]]
    * PERSIST it — the signature/band pass computes ONCE per query, not
    * once per branch. This models the at-scale posture directly:
    * signatures are a (materialized) table, not a recompute —
    * MEMORY_AND_DISK here; a checkpoint/signatures table on a cluster.
    * Verify/Bench clearCache() between queries, so nothing leaks.
    */
  private def lshBands(s: org.apache.spark.sql.SparkSession, dir: String) =
    bandsOf(Tables.documents(s, dir))

  /** The band projection over an arbitrary (doc_id, text, …) frame —
    * batch or a streaming micro-batch (it is a pure narrow projection,
    * so it runs unchanged on both).
    */
  private[graft] def bandsOf(docs: org.apache.spark.sql.DataFrame) =
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        Dedup.minhashSignature(array_distinct(col("toks"))).as("sig"))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(Dedup.NumBands - 1))).as("band"), col("sig"))
      .select(Seq(col("doc_id"), col("band")) ++
        (0 until Dedup.RowsPerBand).map(i =>
          element_at(col("sig"), col("band") * Dedup.RowsPerBand + i + 1).as(s"k$i")): _*)

  /** Bucket representatives: min doc_id per (band, slice) bucket.
    * A partial-aggregable hash agg — skew-immune even on a
    * million-member bucket (no collection, just a running min).
    */
  private def lshBucketMinsOf(bands: org.apache.spark.sql.DataFrame) =
    bands.groupBy(bandKeys.map(col): _*)
      .agg(min(col("doc_id")).as("rep"))

  /** Star edges: every doc linked to its bucket's min doc_id, distinct
    * across bands. ≤ NumBands·n rows — linear, yet union-find over
    * them gives the same connected components as all in-bucket pairs.
    * Materialized once per (session, dir) — [[Artifacts]]: the dedup
    * graph is a table consumed by pair verification AND connected
    * components, not a per-consumer recompute.
    */
  private[graft] def lshEdges(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "lsh_edges") {
      val bands = lshBands(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      bands.join(lshBucketMinsOf(bands), bandKeys)
        .filter(col("rep") < col("doc_id"))
        .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
        .distinct()
    }

  /** Per-lang doc counts — the additive half of the importance-weight
    * audit (the streaming twin sum-merges these cells, the benford/
    * chisq merge law). Zero rows on empty input (key-grouped), per
    * the partialsOf contract.
    */
  private[graft] def langCells(d: org.apache.spark.sql.DataFrame) =
    d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))

  /** DISTRIBUTION-MATCHING IMPORTANCE WEIGHTS — reweight the observed
    * language mix toward a frozen UNIFORM target over the observed
    * languages (the domain-adaptation primitive under DoReMi-style
    * mixture tuning: w = p_target/p_source, clipped at 10 so a rare
    * stratum can't explode the variance) plus the effective-sample-
    * size diagnostic ESS = (Σnw)²/(Σnw²) that says how much data the
    * reweighted corpus is actually worth. Weights and shares are
    * 9-dp-quantized doubles; the two ESS sums are DECIMAL(28,9)-
    * quantized per-lang terms (order-independent); the global scalar
    * attaches via a broadcast join — no unpartitioned window. Scale:
    * one count agg over data; everything after is a ≤ |langs|-row
    * frame.
    */
  private[graft] def importanceFinish(cells: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val tot = cells.agg(sum(col("n_docs")).as("n"),
      count(lit(1)).as("l"))
    val w = cells.crossJoin(broadcast(tot))
      .withColumn("share_r",
        round(col("n_docs").cast("double") / col("n").cast("double"), 9))
      .withColumn("w_r", least(
        round(col("n").cast("double")
          / (col("l") * col("n_docs")).cast("double"), 9), lit(10.0)))
    val ess = w.select(
        (col("n_docs").cast("double") * col("w_r"))
          .cast("decimal(28,9)").as("a"),
        (col("n_docs").cast("double") * col("w_r") * col("w_r"))
          .cast("decimal(28,9)").as("b"))
      .agg(sum(col("a")).as("s1"), sum(col("b")).as("s2"))
      .select(round(asDouble(col("s1")) * asDouble(col("s1"))
        / asDouble(col("s2")), 6).as("ess_r"))
    w.crossJoin(broadcast(ess))
      .select(col("lang"), col("n_docs"), col("share_r"), col("w_r"),
        col("ess_r"))
  }

  /** One-pass label propagation: each doc's representative = the min
    * doc_id over every bucket it sits in (itself when alone).
    * Materialized once per (session, dir) — consumed by
    * `dedup_lsh_keep` AND `pipeline_select`.
    */
  private def lshKeep(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "lsh_keep") {
      val bands = lshBands(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      bands.join(lshBucketMinsOf(bands), bandKeys)
        .groupBy(col("doc_id"))
        .agg(min(col("rep")).as("rep_id"))
    }

  /** True connected-component labels over the LSH star edges —
    * materialized once per (session, dir) and consumed by `dedup_cc`
    * AND `pipeline_split` (VERDICT r3 item 1: at 100 TB component
    * labels are a table a pipeline writes once, so the second
    * consumer's cost is a projection, not a second CC pass).
    */
  private def ccLabels(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "cc_labels") {
      val star = lshEdges(s, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      val verts = Tables.documents(s, dir).select(col("doc_id").as("v"))
      graft.operators.ConnectedComponents.labels(verts, star)
    }

  // ---- DuckDB twins ---------------------------------------------------

  /** Incremental-dedup oracle — shared verbatim by `dedup_incremental`
    * and `dedup_incremental_bloom` (the Bloom pre-filter has no false
    * negatives, so pruning cannot change the result).
    */
  private lazy val IncrementalOracle: String =
    s"""WITH sigs AS (
       |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
       |  FROM documents
       |), bands AS (
       |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
       |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
       |  FROM sigs, generate_series(0, 3) t(b)
       |), base_mins AS (
       |  SELECT b, k0, k1, k2, k3, min(doc_id) AS base_rep
       |  FROM bands WHERE doc_id % 5 <> 4 GROUP BY 1, 2, 3, 4, 5
       |), near_min AS (
       |  SELECT bd.doc_id, min(m.base_rep) AS near_dup_of
       |  FROM bands bd JOIN base_mins m USING (b, k0, k1, k2, k3)
       |  WHERE bd.doc_id % 5 = 4 GROUP BY 1
       |), base_fp AS (
       |  SELECT md5(text) AS fp, min(doc_id) AS exact_dup_of
       |  FROM documents WHERE doc_id % 5 <> 4 GROUP BY 1
       |)
       |SELECT d.doc_id, bf.exact_dup_of, nm.near_dup_of,
       |  (bf.exact_dup_of IS NULL AND nm.near_dup_of IS NULL) AS is_novel
       |FROM documents d
       |LEFT JOIN base_fp bf ON bf.fp = md5(d.text)
       |LEFT JOIN near_min nm ON nm.doc_id = d.doc_id
       |WHERE d.doc_id % 5 = 4""".stripMargin

  private val h31 = "CAST(concat('0x', substr(md5(%s), 1, 14)) AS BIGINT) %% 2147483647"

  private def sigCte(tokExpr: String): String =
    s"""list_transform(generate_series(0, 15), j ->
       |  list_min(list_transform($tokExpr, s ->
       |    ((2*j + 1) * (${h31.format("s")}) + j*12345 + 7) % 2147483647)))""".stripMargin

  /** Shared oracle CTE chain for the span-coverage pair: positional
    * k-grams (`g`), distinct-doc-frequency-≥2 grams (`dupg`), per-doc
    * sorted interval union (`pv` → `cov`), per-doc token counts
    * (`n`) — the SQL twin of [[graft.operators.Dedup.gramTable]] +
    * [[graft.operators.Dedup.spanCoverageFrom]].
    */
  private lazy val gramCoverageCtes: String =
    s"""d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), g AS (
       |  SELECT doc_id, i - 1 AS pos,
       |    ${h31.format(s"array_to_string(list_slice(toks, i, i + ${SpanTokens - 1}), ' ')")} AS gram_h
       |  FROM d, unnest(generate_series(1, greatest(len(toks) - ${SpanTokens - 1}, 0))) u(i)
       |), dupg AS (
       |  SELECT gram_h FROM (
       |    SELECT gram_h, count(DISTINCT doc_id) AS ddf FROM g GROUP BY 1
       |  ) WHERE ddf >= 2
       |), pv AS (
       |  SELECT g.doc_id, g.pos,
       |    lag(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS prev
       |  FROM g JOIN dupg USING (gram_h)
       |), cov AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
       |    CAST(sum(CASE WHEN prev IS NULL THEN ${SpanTokens}
       |      ELSE least(${SpanTokens}, pos - prev) END) AS BIGINT)
       |      AS covered_tokens
       |  FROM pv GROUP BY 1
       |), n AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |)""".stripMargin

  /** Shared oracle CTE chain `sigs → bands → mins → edges` — the SQL
    * twin of the [[lshEdges]] artifact (LSH star-edge candidate
    * pairs). Consumed by text_bleu_pairs's oracle (TextQueries); the
    * older dedup_* oracles predate it and inline the same chain.
    */
  private[graft] lazy val lshEdgeCtes: String =
    s"""sigs AS (
       |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
       |  FROM documents
       |), bands AS (
       |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
       |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
       |  FROM sigs, generate_series(0, 3) t(b)
       |), mins AS (
       |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
       |  FROM bands GROUP BY 1, 2, 3, 4, 5
       |), edges AS (
       |  SELECT DISTINCT m.rep AS doc_a, bd.doc_id AS doc_b
       |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
       |  WHERE m.rep < bd.doc_id
       |)""".stripMargin

  /** Shared CTE chain: LSH star edges → recursive min-label flooding
    * (the dedup_cc twin) → `cc(doc_id, component_id)` →
    * `splits(doc_id, component_id, split)` — prefixed by the caller's
    * `WITH RECURSIVE`. Consumed by the pipeline_split and
    * pipeline_pack oracles (the same sharing the Spark side gets from
    * the materialized ccLabels artifact).
    */
  /** SQL twin of [[verifiedCcLabels]] + [[releaseSplits]]: shingle
    * strings → h31 shingle-hash sets (verify side) and shingle-string
    * minhash signatures (band side), in-bucket candidate pairs,
    * integer-exact Jaccard ≥ 1/2 verification, recursive-CTE CC over
    * the surviving edges, md5-mod component sharding. Requires
    * WITH RECURSIVE at the consuming query.
    */
  private lazy val verifiedSplitCtes: String = {
    val shingleExpr =
      "list_transform(generate_series(1, greatest(len(toks) - 2, 0)), " +
        "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
    s"""vd AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), vsh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform($shingleExpr,
       |      g -> ${h31.format("g")})) AS sh,
       |    ${sigCte(shingleExpr)} AS sig
       |  FROM vd
       |), vbands AS (
       |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
       |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
       |  FROM vsh, generate_series(0, 3) t(b)
       |), vcand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM vbands x JOIN vbands y USING (b, k0, k1, k2, k3)
       |  WHERE x.doc_id < y.doc_id
       |), vedge AS (
       |  SELECT c.doc_a, c.doc_b
       |  FROM vcand c JOIN vsh a ON a.doc_id = c.doc_a
       |    JOIN vsh b ON b.doc_id = c.doc_b
       |  WHERE 3 * len(list_intersect(a.sh, b.sh)) >= len(a.sh) + len(b.sh)
       |), vedge2 AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM vedge
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM vedge
       |), vlp(v, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, vlp.lbl
       |  FROM vlp JOIN vedge2 e ON e.src = vlp.v
       |  WHERE vlp.lbl < e.dst
       |), vcc AS (
       |  SELECT v AS doc_id, CAST(min(lbl) AS BIGINT) AS component_id
       |  FROM vlp GROUP BY v
       |), vsplits AS (
       |  SELECT doc_id, component_id,
       |    CASE WHEN shard < 8 THEN 'train'
       |         WHEN shard = 8 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (
       |    SELECT doc_id, component_id,
       |      (CAST(concat('0x', substr(md5(CAST(component_id AS VARCHAR)), 1, 14)) AS BIGINT)) % 10 AS shard
       |    FROM vcc
       |  )
       |)""".stripMargin
  }

  private lazy val ccSplitCtes: String =
    s"""sigs AS (
       |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
       |  FROM documents
       |), bands AS (
       |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
       |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
       |  FROM sigs, generate_series(0, 3) t(b)
       |), mins AS (
       |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
       |  FROM bands GROUP BY 1, 2, 3, 4, 5
       |), edges AS (
       |  SELECT DISTINCT m.rep AS doc_a, bd.doc_id AS doc_b
       |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
       |  WHERE m.rep < bd.doc_id
       |), edges2 AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM edges
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM edges
       |), lp(v, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, lp.lbl
       |  FROM lp JOIN edges2 e ON e.src = lp.v
       |  WHERE lp.lbl < e.dst
       |), cc AS (
       |  SELECT v AS doc_id, CAST(min(lbl) AS BIGINT) AS component_id
       |  FROM lp GROUP BY v
       |), splits AS (
       |  SELECT doc_id, component_id,
       |    CASE WHEN shard < 8 THEN 'train'
       |         WHEN shard = 8 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (
       |    SELECT doc_id, component_id,
       |      (CAST(concat('0x', substr(md5(CAST(component_id AS VARCHAR)), 1, 14)) AS BIGINT)) % 10 AS shard
       |    FROM cc
       |  )
       |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // Bloom pruning is invisible in the result (no false negatives) —
    // the composed query shares the unpruned oracle verbatim.
    "dedup_incremental_bloom" -> IncrementalOracle,

    // same symmetrized star edges, same exact integer moments, same
    // fixed-order Pearson finish
    "graph_assortativity" ->
      s"""WITH $lshEdgeCtes, sym AS (
         |  SELECT doc_a AS a, doc_b AS b FROM edges
         |  UNION ALL
         |  SELECT doc_b AS a, doc_a AS b FROM edges
         |), deg AS (
         |  SELECT a AS v, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1
         |), st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m,
         |    sum(CAST(dx.d AS DECIMAL(38,0))) AS sx,
         |    sum(CAST(dy.d AS DECIMAL(38,0))) AS sy,
         |    sum(CAST(dx.d * dy.d AS DECIMAL(38,0))) AS sxy,
         |    sum(CAST(dx.d * dx.d AS DECIMAL(38,0))) AS sxx,
         |    sum(CAST(dy.d * dy.d AS DECIMAL(38,0))) AS syy
         |  FROM sym
         |  JOIN deg dx ON dx.v = sym.a
         |  JOIN deg dy ON dy.v = sym.b
         |)
         |SELECT m AS n_dir_edges,
         |  round(CASE WHEN
         |      CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
         |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
         |      AND CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
         |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
         |    THEN (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
         |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |      / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
         |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |        * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
         |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         |    END, 6) AS assortativity_r
         |FROM st""".stripMargin,

    // same star edges → same (degree, id) orientation → wedge +
    // closing-edge EXISTS — exact integer outputs throughout
    "graph_triangles" ->
      s"""WITH sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
         |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
         |  FROM sigs, generate_series(0, 3) t(b)
         |), mins AS (
         |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
         |  FROM bands GROUP BY 1, 2, 3, 4, 5
         |), edges AS (
         |  SELECT DISTINCT m.rep AS doc_a, bd.doc_id AS doc_b
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  WHERE m.rep < bd.doc_id
         |), deg AS (
         |  SELECT v, count(*) AS d FROM (
         |    SELECT doc_a AS v FROM edges UNION ALL SELECT doc_b FROM edges
         |  ) GROUP BY 1
         |), oriented AS (
         |  SELECT CASE WHEN (da.d, e.doc_a) < (db.d, e.doc_b) THEN e.doc_a ELSE e.doc_b END AS u,
         |         CASE WHEN (da.d, e.doc_a) < (db.d, e.doc_b) THEN e.doc_b ELSE e.doc_a END AS t
         |  FROM edges e JOIN deg da ON da.v = e.doc_a JOIN deg db ON db.v = e.doc_b
         |), wedges AS (
         |  SELECT w1.u, w1.t AS t1, w2.t AS t2
         |  FROM oriented w1 JOIN oriented w2 ON w1.u = w2.u AND w1.t < w2.t
         |), closing AS (
         |  SELECT least(u, t) AS t1, greatest(u, t) AS t2 FROM oriented
         |), tri AS (
         |  SELECT count(*) AS n_triangles FROM wedges w
         |  WHERE EXISTS (SELECT 1 FROM closing c WHERE c.t1 = w.t1 AND c.t2 = w.t2)
         |), stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_vertices,
         |         CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
         |  FROM deg
         |), ecnt AS (SELECT count(*) AS n_edges FROM edges)
         |SELECT s.n_vertices, e.n_edges, s.n_wedges, t.n_triangles,
         |  coalesce((3 * t.n_triangles * 1000000) // nullif(s.n_wedges, 0), 0) AS clustering_ppm
         |FROM stats s, ecnt e, tri t""".stripMargin,

    // same star edges → same bounded synchronous peel rounds: the
    // Spark loop unrolled to a CTE chain (identical round count, so
    // the two engines agree even short of the fixpoint — KCoreSpec
    // proves the fixpoint IS reached on the fixtures). Every round
    // CTE is MATERIALIZED: each references its predecessor 2-3
    // times, and DuckDB's default inlining would expand the chain
    // exponentially (3^rounds base scans ⇒ fd exhaustion — observed,
    // not hypothetical).
    "graph_kcore" -> {
      def peelCtes(src: String, k: Int, p: String) =
        (1 to KcRounds).map { r =>
          val prev = if (r == 1) src else s"${p}e${r - 1}"
          s"""${p}s$r AS MATERIALIZED (
             |  SELECT u FROM $prev GROUP BY u HAVING count(*) >= $k
             |), ${p}e$r AS MATERIALIZED (
             |  SELECT e.u, e.v FROM $prev e
             |  WHERE EXISTS (SELECT 1 FROM ${p}s$r s WHERE s.u = e.u)
             |    AND EXISTS (SELECT 1 FROM ${p}s$r s WHERE s.u = e.v)
             |)""".stripMargin
        }.mkString(", ")
      s"""WITH sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
         |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
         |  FROM sigs, generate_series(0, 3) t(b)
         |), mins AS (
         |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
         |  FROM bands GROUP BY 1, 2, 3, 4, 5
         |), edges AS MATERIALIZED (
         |  SELECT DISTINCT m.rep AS doc_a, bd.doc_id AS doc_b
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  WHERE m.rep < bd.doc_id
         |), sym AS MATERIALIZED (
         |  SELECT doc_a AS u, doc_b AS v FROM edges
         |  UNION ALL
         |  SELECT doc_b AS u, doc_a AS v FROM edges
         |), ${peelCtes("sym", 2, "a")}, ${peelCtes(s"ae$KcRounds", 3, "b")}
         |SELECT d.doc_id,
         |  CAST((CASE WHEN c1.u IS NULL THEN 0 ELSE 1 END) +
         |       (CASE WHEN c2.u IS NULL THEN 0 ELSE 1 END) +
         |       (CASE WHEN c3.u IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS coreness
         |FROM documents d
         |LEFT JOIN (SELECT DISTINCT u FROM sym) c1 ON c1.u = d.doc_id
         |LEFT JOIN (SELECT DISTINCT u FROM ae$KcRounds) c2 ON c2.u = d.doc_id
         |LEFT JOIN (SELECT DISTINCT u FROM be$KcRounds) c3 ON c3.u = d.doc_id""".stripMargin
    },

    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_minhash_bands" ->
      s"""WITH sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |)
         |SELECT doc_id, CAST(b AS BIGINT) AS band,
         |  md5(array_to_string(list_transform(sig[b*4 + 1 : b*4 + 4], x -> CAST(x AS VARCHAR)), ',')) AS band_hash
         |FROM sigs, generate_series(0, 3) t(b)""".stripMargin,

    "dedup_lsh_pairs" ->
      s"""WITH sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
         |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
         |  FROM sigs, generate_series(0, 3) t(b)
         |), mins AS (
         |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
         |  FROM bands GROUP BY 1, 2, 3, 4, 5
         |), edges AS (
         |  SELECT DISTINCT m.rep AS doc_a, bd.doc_id AS doc_b
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  WHERE m.rep < bd.doc_id
         |), toksets AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(string_split(text, ' '), s ->
         |      ${h31.format("s")})) AS tokset
         |  FROM documents
         |)
         |SELECT doc_a, doc_b, round(jac, 6) AS jaccard_r FROM (
         |  SELECT doc_a, doc_b,
         |    len(list_intersect(ta.tokset, tb.tokset)) /
         |      CAST(len(list_distinct(list_concat(ta.tokset, tb.tokset))) AS DOUBLE) AS jac
         |  FROM edges
         |  JOIN toksets ta ON ta.doc_id = doc_a
         |  JOIN toksets tb ON tb.doc_id = doc_b
         |) WHERE jac >= 0.2""".stripMargin,

    // Recursive-CTE twin of the pointer-jumping loop: min-label
    // flooding over the undirected star edges. The `lp.lbl < e.dst`
    // guard keeps the working set finite; the component MIN always
    // floods fully because it is smaller than every other member.
    "dedup_cc" ->
      s"""WITH RECURSIVE sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
         |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
         |  FROM sigs, generate_series(0, 3) t(b)
         |), mins AS (
         |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
         |  FROM bands GROUP BY 1, 2, 3, 4, 5
         |), edges AS (
         |  SELECT DISTINCT m.rep AS doc_a, bd.doc_id AS doc_b
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  WHERE m.rep < bd.doc_id
         |), edges2 AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM edges
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM edges
         |), lp(v, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.dst, lp.lbl
         |  FROM lp JOIN edges2 e ON e.src = lp.v
         |  WHERE lp.lbl < e.dst
         |)
         |SELECT v AS doc_id, CAST(min(lbl) AS BIGINT) AS component_id,
         |  (min(lbl) < v) AS is_dup
         |FROM lp GROUP BY v""".stripMargin,

    "er_canonical" ->
      s"""WITH RECURSIVE sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
         |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
         |  FROM sigs, generate_series(0, 3) t(b)
         |), mins AS (
         |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
         |  FROM bands GROUP BY 1, 2, 3, 4, 5
         |), edges AS (
         |  SELECT DISTINCT m.rep AS doc_a, bd.doc_id AS doc_b
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  WHERE m.rep < bd.doc_id
         |), edges2 AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM edges
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM edges
         |), lp(v, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.dst, lp.lbl
         |  FROM lp JOIN edges2 e ON e.src = lp.v
         |  WHERE lp.lbl < e.dst
         |), lab AS (
         |  SELECT v AS doc_id, CAST(min(lbl) AS BIGINT) AS entity_id
         |  FROM lp GROUP BY v
         |)
         |SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(min(d.doc_id) AS BIGINT) AS canonical_doc_id,
         |  min_by(d.lang, d.doc_id) AS canonical_lang,
         |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
         |FROM lab JOIN documents d USING (doc_id)
         |GROUP BY 1""".stripMargin,

    // Component-keyed md5-mod sharding on top of the dedup_cc labels.
    "pipeline_split" ->
      s"""WITH RECURSIVE $ccSplitCtes
         |SELECT doc_id, component_id, split FROM splits""".stripMargin,

    // Verified-component summary: the full shingle-LSH → verify → CC
    // chain replayed in SQL.
    "dedup_lsh_verified" ->
      s"""WITH RECURSIVE $verifiedSplitCtes
         |SELECT component_id, CAST(count(*) AS BIGINT) AS n_members,
         |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
         |FROM vcc GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

    // The release split: verified-component-keyed md5-mod sharding.
    "pipeline_split_verified" ->
      s"""WITH RECURSIVE $verifiedSplitCtes
         |SELECT doc_id, component_id, split FROM vsplits""".stripMargin,

    // Sharded deterministic shuffle over the CC splits.
    "pipeline_shuffle" ->
      s"""WITH RECURSIVE $ccSplitCtes, keyed AS (
         |  SELECT d.doc_id, s.split,
         |    (CAST(concat('0x', substr(md5(concat(CAST(d.doc_id AS VARCHAR), '#shuffle')), 1, 14)) AS BIGINT)) AS skey
         |  FROM documents d JOIN splits s USING (doc_id)
         |)
         |SELECT doc_id, split, skey % $NumPackShards AS shard,
         |  CAST(row_number() OVER (
         |    PARTITION BY split, skey % $NumPackShards
         |    ORDER BY skey, doc_id) AS BIGINT) AS pos
         |FROM keyed""".stripMargin,

    "pipeline_token_stats" ->
      s"""WITH RECURSIVE $ccSplitCtes
         |SELECT s.split, d.lang, count(*) AS n_docs,
         |  CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(sum(d.n_chars) AS BIGINT) AS n_chars
         |FROM documents d JOIN splits s USING (doc_id)
         |GROUP BY 1, 2""".stripMargin,

    "dedup_incremental" -> IncrementalOracle,

    "pipeline_sample" ->
      """SELECT doc_id, lang, pct, rate, (pct < rate) AS sampled
        |FROM (
        |  SELECT doc_id, lang,
        |    (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)) % 100 AS pct,
        |    CAST(CASE WHEN lang = 'en' THEN 100
        |              WHEN lang = 'es' THEN 50
        |              ELSE 10 END AS BIGINT) AS rate
        |  FROM documents
        |)""".stripMargin,

    // Temperature-weighted source quotas + md5-ordered greedy fill.
    "pipeline_mix" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#mix')), 1, 14)) AS BIGINT)) AS skey,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), t AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS source_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY skey, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM d
         |)
         |SELECT doc_id, source, n_tokens, source_tokens,
         |  CAST(floor($MixCoef * sqrt(CAST(source_tokens AS DOUBLE))) AS BIGINT) AS target_tokens,
         |  cum_tokens,
         |  (cum_tokens <= CAST(floor($MixCoef * sqrt(CAST(source_tokens AS DOUBLE))) AS BIGINT)) AS selected
         |FROM t""".stripMargin,

    // same lsh_keep chain as pipeline_source_report, same kept rule
    "pipeline_dedup_impact" ->
      s"""WITH $lshEdgeCtes, lsh_keep AS (
         |  SELECT bd.doc_id, min(m.rep) AS rep_id
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  GROUP BY bd.doc_id
         |), d AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), agg AS (
         |  SELECT d.source,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN k.rep_id = d.doc_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_kept,
         |    CAST(sum(d.n_tokens) AS BIGINT) AS tokens_total,
         |    CAST(sum(CASE WHEN k.rep_id = d.doc_id THEN d.n_tokens
         |      ELSE 0 END) AS BIGINT) AS tokens_kept
         |  FROM d JOIN lsh_keep k USING (doc_id)
         |  GROUP BY 1
         |)
         |SELECT source, n_docs, n_kept, tokens_total, tokens_kept,
         |  round(CAST(1.0 AS DOUBLE) - CAST(tokens_kept AS DOUBLE)
         |    / CAST(tokens_total AS DOUBLE), 6) AS savings_r
         |FROM agg""".stripMargin,

    // same 6-dp-quantized sqrt into an exact DECIMAL normalizer sum,
    // same fixed-order IEEE finish; doubles CAST explicitly (DuckDB
    // parses bare 2.0/4.0 as DECIMAL — the pagerank lesson)
    // same per-lang cells, same 9-dp clipped uniform-target weights,
    // same DECIMAL(28,9)-quantized ESS sums — term-for-term
    "pipeline_importance_weights" ->
      """WITH c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS l FROM c
        |), w AS (
        |  SELECT lang, n_docs,
        |    round(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE), 9) AS share_r,
        |    least(round(CAST(n AS DOUBLE)
        |      / CAST(l * n_docs AS DOUBLE), 9), 10.0) AS w_r
        |  FROM c CROSS JOIN t
        |), s AS (
        |  SELECT
        |    sum(CAST(CAST(n_docs AS DOUBLE) * w_r AS DECIMAL(28,9))) AS s1,
        |    sum(CAST((CAST(n_docs AS DOUBLE) * w_r) * w_r
        |      AS DECIMAL(28,9))) AS s2
        |  FROM w
        |), e AS (
        |  SELECT round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |    / CAST(s2 AS DOUBLE), 6) AS ess_r FROM s
        |)
        |SELECT lang, n_docs, share_r, w_r, ess_r
        |FROM w CROSS JOIN e""".stripMargin,

    "pipeline_mix_epochs" ->
      s"""WITH t AS (
         |  SELECT source,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_source
         |  FROM documents GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(t_source) AS BIGINT) AS t_total,
         |    sum(CAST(round(sqrt(CAST(t_source AS DOUBLE)), 6)
         |      AS DECIMAL(18,6))) AS s_total
         |  FROM t
         |), f AS (
         |  SELECT source, t_source,
         |    round(sqrt(CAST(t_source AS DOUBLE)), 6)
         |      / CAST(s_total AS DOUBLE) AS w_d,
         |    CAST(2.0 AS DOUBLE) * CAST(t_total AS DOUBLE)
         |      * (round(sqrt(CAST(t_source AS DOUBLE)), 6)
         |         / CAST(s_total AS DOUBLE))
         |      / CAST(t_source AS DOUBLE) AS epochs_d
         |  FROM t CROSS JOIN tot
         |)
         |SELECT source, t_source,
         |  round(w_d, 9) AS weight_r,
         |  round(epochs_d, 6) AS epochs_r,
         |  CAST(floor(least(epochs_d, CAST($MaxEpochs AS DOUBLE))
         |    * CAST(t_source AS DOUBLE)) AS BIGINT) AS planned_tokens,
         |  round(epochs_d, 6) > CAST($MaxEpochs AS DOUBLE) AS capped
         |FROM f""".stripMargin,

    // Unrolled 3-round PageRank twin over the symmetrized star edges
    // (edges2 of the CC chain; the unreferenced recursive CTEs prune
    // away). Literals are cast to DOUBLE explicitly — DuckDB parses
    // bare 0.15/0.85 as DECIMAL and its decimal division would
    // diverge from the engine's double arithmetic.
    "graph_pagerank" -> {
      def roundCte(r: Int) =
        s"""c$r AS (
           |  SELECT e.dst,
           |    sum(CAST(r${r - 1}.pr / d.deg AS DECIMAL(28,14))) AS s
           |  FROM r${r - 1}
           |  JOIN edges2 e ON e.src = r${r - 1}.v
           |  JOIN deg d ON d.src = e.src
           |  GROUP BY 1
           |), r$r AS (
           |  SELECT dv.doc_id AS v,
           |    round(CAST(0.15 AS DOUBLE) / nn.n +
           |          CAST(0.85 AS DOUBLE) * coalesce(CAST(c$r.s AS DOUBLE), 0.0), 9) AS pr
           |  FROM documents dv CROSS JOIN nn LEFT JOIN c$r ON c$r.dst = dv.doc_id
           |)""".stripMargin
      s"""WITH RECURSIVE $ccSplitCtes, deg AS (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges2 GROUP BY 1
         |), nn AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
         |), r0 AS (
         |  SELECT doc_id AS v, round(CAST(1.0 AS DOUBLE) / nn.n, 9) AS pr
         |  FROM documents, nn
         |), ${(1 to PrRounds).map(roundCte).mkString(", ")}
         |SELECT v AS doc_id, pr FROM r$PrRounds""".stripMargin
    },

    // same unrolled rounds as graph_pagerank with the teleport mass on
    // the deterministic seed; rank over the 9-dp π with the doc_id
    // tiebreak, top-20
    "graph_ppr" -> {
      def roundCte(r: Int) =
        s"""c$r AS (
           |  SELECT e.dst,
           |    sum(CAST(r${r - 1}.pr / d.deg AS DECIMAL(28,14))) AS s
           |  FROM r${r - 1}
           |  JOIN edges2 e ON e.src = r${r - 1}.v
           |  JOIN deg d ON d.src = e.src
           |  GROUP BY 1
           |), r$r AS (
           |  SELECT dv.doc_id AS v,
           |    round(CASE WHEN dv.doc_id = sd.seed THEN CAST(0.15 AS DOUBLE)
           |        ELSE CAST(0.0 AS DOUBLE) END +
           |      CAST(0.85 AS DOUBLE) * coalesce(CAST(c$r.s AS DOUBLE), 0.0),
           |      9) AS pr
           |  FROM documents dv CROSS JOIN sd
           |  LEFT JOIN c$r ON c$r.dst = dv.doc_id
           |)""".stripMargin
      s"""WITH $lshEdgeCtes, edges2 AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM edges
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM edges
         |), deg AS (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges2 GROUP BY 1
         |), sd AS (
         |  SELECT min(doc_a) AS seed FROM edges
         |), r0 AS (
         |  SELECT dv.doc_id AS v,
         |    CASE WHEN dv.doc_id = sd.seed THEN CAST(1.0 AS DOUBLE)
         |      ELSE CAST(0.0 AS DOUBLE) END AS pr
         |  FROM documents dv CROSS JOIN sd
         |), ${(1 to PrRounds).map(roundCte).mkString(", ")}
         |SELECT v AS doc_id, round(pr, 6) AS ppr_r,
         |  CAST(rn AS BIGINT) AS rnk
         |FROM (
         |  SELECT v, pr, row_number() OVER (ORDER BY pr DESC, v) AS rn
         |  FROM r$PrRounds WHERE pr > 0.0
         |) WHERE rn <= $PprTopK""".stripMargin
    },

    // same unrolled mutual-reinforcement rounds over the DIRECTED
    // star edges; decimal-routed sums, max-normalized + 9-dp
    // quantized at each half-round boundary — term-for-term
    "graph_hits" -> {
      def roundCte(r: Int) =
        s"""hs$r AS (
           |  SELECT e.doc_a AS v,
           |    CAST(sum(CAST(a${r - 1}.a AS DECIMAL(28,14))) AS DOUBLE) AS s
           |  FROM a${r - 1} JOIN edges e ON e.doc_b = a${r - 1}.v
           |  GROUP BY 1
           |), hmx$r AS (SELECT max(s) AS mx FROM hs$r
           |), h$r AS (
           |  SELECT d.doc_id AS v,
           |    round(coalesce(hs$r.s, 0.0) /
           |      (CASE WHEN hmx$r.mx IS NULL OR hmx$r.mx = 0.0
           |            THEN 1.0 ELSE hmx$r.mx END), 9) AS h
           |  FROM documents d CROSS JOIN hmx$r
           |  LEFT JOIN hs$r ON hs$r.v = d.doc_id
           |), aus$r AS (
           |  SELECT e.doc_b AS v,
           |    CAST(sum(CAST(h$r.h AS DECIMAL(28,14))) AS DOUBLE) AS s
           |  FROM h$r JOIN edges e ON e.doc_a = h$r.v
           |  GROUP BY 1
           |), amx$r AS (SELECT max(s) AS mx FROM aus$r
           |), a$r AS (
           |  SELECT d.doc_id AS v,
           |    round(coalesce(aus$r.s, 0.0) /
           |      (CASE WHEN amx$r.mx IS NULL OR amx$r.mx = 0.0
           |            THEN 1.0 ELSE amx$r.mx END), 9) AS a
           |  FROM documents d CROSS JOIN amx$r
           |  LEFT JOIN aus$r ON aus$r.v = d.doc_id
           |)""".stripMargin
      s"""WITH $lshEdgeCtes, a0 AS (
         |  SELECT doc_id AS v, CAST(1.0 AS DOUBLE) AS a FROM documents
         |), ${(1 to PrRounds).map(roundCte).mkString(", ")}
         |SELECT h.v AS doc_id, h.h AS hub, a.a AS auth
         |FROM h$PrRounds h JOIN a$PrRounds a ON a.v = h.v""".stripMargin
    },

    // Unrolled synchronous LPA rounds over the same symmetrized star
    // edges; vote top-1 via the identical (count desc, label asc)
    // row_number tie-break, unvoted nodes carry their label.
    "graph_lpa" -> {
      def roundCte(r: Int) =
        s"""v$r AS (
           |  SELECT e.dst, l.lbl, count(*) AS cnt
           |  FROM l${r - 1} l JOIN edges2 e ON e.src = l.v
           |  GROUP BY 1, 2
           |), b$r AS (
           |  SELECT dst, lbl AS new_lbl,
           |    row_number() OVER (PARTITION BY dst
           |                       ORDER BY cnt DESC, lbl) AS rn
           |  FROM v$r
           |), l$r AS (
           |  SELECT l.v, coalesce(b.new_lbl, l.lbl) AS lbl
           |  FROM l${r - 1} l
           |  LEFT JOIN (SELECT dst, new_lbl FROM b$r WHERE rn = 1) b
           |    ON b.dst = l.v
           |)""".stripMargin
      s"""WITH RECURSIVE $ccSplitCtes, l0 AS (
         |  SELECT doc_id AS v, doc_id AS lbl FROM documents
         |), ${(1 to LpaRounds).map(roundCte).mkString(", ")}
         |SELECT l.v AS doc_id, CAST(l.lbl AS BIGINT) AS community_id,
         |  CAST(s.cnt AS BIGINT) AS community_size
         |FROM l$LpaRounds l
         |JOIN (SELECT lbl, count(*) AS cnt FROM l$LpaRounds GROUP BY 1) s
         |  USING (lbl)""".stripMargin
    },

    // same md5 sample, same hashed-token exact Jaccard truth, same
    // CC-component prediction, same confusion algebra — term-for-term
    "dedup_lsh_eval" ->
      s"""WITH RECURSIVE $ccSplitCtes, toksets AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(string_split(text, ' '), s ->
         |      ${h31.format("s")})) AS tokset
         |  FROM documents
         |), sample AS (
         |  SELECT doc_id, tokset FROM toksets
         |  ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
         |           AS BIGINT), doc_id
         |  LIMIT $EvalSampleN
         |), truth AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 1 AS t
         |  FROM sample a JOIN sample b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.tokset, b.tokset)) /
         |    CAST(len(list_distinct(list_concat(a.tokset, b.tokset)))
         |         AS DOUBLE) >= 0.2
         |), slabels AS (
         |  SELECT s.doc_id, c.component_id AS lbl
         |  FROM sample s JOIN cc c USING (doc_id)
         |), pred AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 1 AS p
         |  FROM slabels a JOIN slabels b
         |    ON a.lbl = b.lbl AND a.doc_id < b.doc_id
         |), conf AS (
         |  SELECT
         |    CAST(sum(CASE WHEN t.t = 1 AND p.p = 1 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN t.t = 1 AND p.p IS NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN t.t IS NULL AND p.p = 1 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS fp
         |  FROM truth t FULL OUTER JOIN pred p USING (doc_a, doc_b)
         |), ns AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_sample FROM sample
         |)
         |SELECT n_sample, tp + fn AS n_truth, tp + fp AS n_pred, tp, fp, fn,
         |  round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
         |  round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
         |  round(CAST(2.0 AS DOUBLE) * (CAST(tp AS DOUBLE) / (tp + fp))
         |        * (CAST(tp AS DOUBLE) / (tp + fn))
         |        / ((CAST(tp AS DOUBLE) / (tp + fp))
         |           + (CAST(tp AS DOUBLE) / (tp + fn))), 6) AS f1
         |FROM conf CROSS JOIN ns""".stripMargin,

    // same fixed sample, same exact truth, same per-config banding of
    // the shared signature; f1 guarded to tp > 0 on both sides
    "dedup_lsh_sweep" -> {
      val cfgVals = LshSweepConfigs.map { case (b, r) => s"($b, $r)" }.mkString(", ")
      s"""WITH toksets AS (
         |  SELECT doc_id, text,
         |    list_distinct(list_transform(string_split(text, ' '), s ->
         |      ${h31.format("s")})) AS tokset
         |  FROM documents
         |), sample AS (
         |  SELECT doc_id, text, tokset FROM toksets
         |  ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
         |           AS BIGINT), doc_id
         |  LIMIT $EvalSampleN
         |), ssig AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM sample
         |), truth AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 1 AS t
         |  FROM sample a JOIN sample b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.tokset, b.tokset)) /
         |    CAST(len(list_distinct(list_concat(a.tokset, b.tokset)))
         |         AS DOUBLE) >= 0.2
         |), cfg(nb, rp) AS (VALUES $cfgVals
         |), bands AS (
         |  SELECT c.nb, c.rp, s.doc_id, t.k AS band,
         |    md5(array_to_string(list_transform(
         |      s.sig[t.k * c.rp + 1 : t.k * c.rp + c.rp],
         |      x -> CAST(x AS VARCHAR)), ',')) AS band_hash
         |  FROM ssig s, cfg c,
         |    generate_series(0, ${LshSweepConfigs.map(_._1).max - 1}) t(k)
         |  WHERE t.k < c.nb
         |), cand AS (
         |  SELECT DISTINCT a.nb, a.rp, a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    1 AS p
         |  FROM bands a JOIN bands b
         |    ON a.nb = b.nb AND a.rp = b.rp AND a.band = b.band
         |   AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
         |), truthc AS (
         |  SELECT c.nb, c.rp, t.doc_a, t.doc_b, t.t FROM truth t, cfg c
         |), conf AS (
         |  SELECT coalesce(t.nb, p.nb) AS nb, coalesce(t.rp, p.rp) AS rp,
         |    CAST(sum(CASE WHEN t.t = 1 AND p.p = 1 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN t.t = 1 AND p.p IS NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN t.t IS NULL AND p.p = 1 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS fp
         |  FROM truthc t FULL OUTER JOIN cand p
         |    ON p.nb = t.nb AND p.rp = t.rp
         |   AND p.doc_a = t.doc_a AND p.doc_b = t.doc_b
         |  GROUP BY 1, 2
         |)
         |SELECT CAST(nb AS BIGINT) AS bands, CAST(rp AS BIGINT) AS rows_per_band,
         |  tp, fp, fn,
         |  round(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END, 6)
         |    AS precision,
         |  round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
         |  round(CASE WHEN tp > 0 THEN
         |    CAST(2.0 AS DOUBLE) * (CAST(tp AS DOUBLE) / (tp + fp))
         |      * (CAST(tp AS DOUBLE) / (tp + fn))
         |      / ((CAST(tp AS DOUBLE) / (tp + fp))
         |         + (CAST(tp AS DOUBLE) / (tp + fn))) END, 6) AS f1
         |FROM conf""".stripMargin
    },

    // same star edges, same hub cap, same 12-dp quantized 1/ln terms,
    // same anti-join + (score desc, pair) top-k — term-for-term
    "graph_adamic_adar" ->
      s"""WITH RECURSIVE $ccSplitCtes, deg AS (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges2 GROUP BY 1
         |), mid AS (
         |  SELECT e.src AS z, e.dst, d.deg
         |  FROM edges2 e JOIN deg d USING (src)
         |  WHERE d.deg <= $AaHubCap
         |), sc AS (
         |  SELECT a.dst AS u, b.dst AS w,
         |    CAST(count(*) AS BIGINT) AS common_neighbors,
         |    sum(CAST(round(CAST(1.0 AS DOUBLE) / ln(a.deg), 12)
         |             AS DECIMAL(28,12))) AS aa
         |  FROM mid a JOIN mid b ON a.z = b.z AND a.dst < b.dst
         |  GROUP BY 1, 2
         |)
         |SELECT u AS doc_a, w AS doc_b, common_neighbors,
         |  round(CAST(aa AS DOUBLE), 6) AS aa_score
         |FROM sc
         |WHERE NOT EXISTS (SELECT 1 FROM edges2 e
         |                  WHERE e.src = sc.u AND e.dst = sc.w)
         |ORDER BY aa_score DESC, doc_a, doc_b
         |LIMIT $AaTopK""".stripMargin,

    // the same symmetric degree frame, canonical edges, frozen
    // k-grid conditional counts, tie-safe rational final
    "graph_rich_club" ->
      s"""WITH RECURSIVE $ccSplitCtes, deg AS (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges2 GROUP BY 1
         |), ks AS (
         |  SELECT CAST(unnest([1, 2, 4, 8, 16]) AS BIGINT) AS k
         |), nk AS (
         |  SELECT ks.k, CAST(count(*) AS BIGINT) AS n_k
         |  FROM deg CROSS JOIN ks WHERE deg.deg > ks.k GROUP BY 1
         |), ek AS (
         |  SELECT ks.k, CAST(count(*) AS BIGINT) AS e_k
         |  FROM edges e
         |  JOIN deg da ON da.src = e.doc_a
         |  JOIN deg db ON db.src = e.doc_b
         |  CROSS JOIN ks
         |  WHERE da.deg > ks.k AND db.deg > ks.k GROUP BY 1
         |), f AS (
         |  SELECT ks.k, coalesce(nk.n_k, 0) AS n_k, coalesce(ek.e_k, 0) AS e_k
         |  FROM ks LEFT JOIN nk USING (k) LEFT JOIN ek USING (k)
         |)
         |SELECT k, n_k, e_k,
         |  CASE WHEN n_k > 1 THEN
         |    CAST(round(CAST(round(2.0 * CAST(e_k AS DOUBLE)
         |      / (CAST(n_k AS DOUBLE) * CAST(n_k - 1 AS DOUBLE)), 12)
         |      AS DECIMAL(24,12)), 6) AS DOUBLE) END AS phi_r
         |FROM f""".stripMargin,

    // the identical hub-capped wedge chain, union-normalized score,
    // tie-safe round (small-integer rationals hit 6-dp halves)
    "graph_jaccard_linkpred" ->
      s"""WITH RECURSIVE $ccSplitCtes, deg AS (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges2 GROUP BY 1
         |), mid AS (
         |  SELECT e.src AS z, e.dst
         |  FROM edges2 e JOIN deg d USING (src)
         |  WHERE d.deg <= $AaHubCap
         |), sc AS (
         |  SELECT a.dst AS u, b.dst AS w,
         |    CAST(count(*) AS BIGINT) AS common_neighbors
         |  FROM mid a JOIN mid b ON a.z = b.z AND a.dst < b.dst
         |  GROUP BY 1, 2
         |), pr AS (
         |  SELECT sc.u, sc.w, sc.common_neighbors,
         |    du.deg AS deg_u, dw.deg AS deg_w
         |  FROM sc
         |  JOIN deg du ON du.src = sc.u
         |  JOIN deg dw ON dw.src = sc.w
         |  WHERE NOT EXISTS (SELECT 1 FROM edges2 e
         |                    WHERE e.src = sc.u AND e.dst = sc.w)
         |)
         |SELECT u AS doc_a, w AS doc_b, common_neighbors, deg_u, deg_w,
         |  CAST(round(CAST(round(CAST(common_neighbors AS DOUBLE)
         |    / CAST(deg_u + deg_w - common_neighbors AS DOUBLE), 12)
         |    AS DECIMAL(24,12)), 6) AS DOUBLE) AS jaccard_r
         |FROM pr
         |ORDER BY jaccard_r DESC, doc_a, doc_b
         |LIMIT $AaTopK""".stripMargin,

    // Integer-exact PPS systematic sampler over the md5-shuffled token
    // axis.
    "pipeline_sample_weighted" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#wsample')), 1, 14)) AS BIGINT)) AS skey,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY skey, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         |    CAST(sum(n_tokens) OVER () AS BIGINT) AS t_total
         |  FROM d
         |), h AS (
         |  SELECT doc_id, n_tokens, cum_before,
         |    (cum_before * $WeightedSampleN + t_total - 1) // t_total AS k_min,
         |    ((cum_before + n_tokens) * $WeightedSampleN + t_total - 1) // t_total AS k_end
         |  FROM c
         |)
         |SELECT doc_id, n_tokens, cum_before,
         |  CAST(greatest(least(k_end, $WeightedSampleN) - k_min, 0) AS BIGINT) AS n_hits,
         |  (greatest(least(k_end, $WeightedSampleN) - k_min, 0) > 0) AS selected
         |FROM h""".stripMargin,

    // the DEFINITION (quadratic dominance anti-join) — the engine's
    // sort-based staircase must reproduce it exactly
    "pipeline_pareto" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |          / len(string_split(text, ' ')), 9) AS ttr
        |  FROM documents WHERE len(string_split(text, ' ')) > 0
        |)
        |SELECT a.doc_id, a.n_chars, a.ttr
        |FROM d a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM d b
        |  WHERE b.n_chars >= a.n_chars AND b.ttr >= a.ttr
        |    AND (b.n_chars > a.n_chars OR b.ttr > a.ttr))""".stripMargin,

    // same dyadic-rational uniform, same ln-key quantization, same
    // (key desc, doc_id) top-K selection
    "pipeline_sample_wor" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
         |      '#wor')), 1, 12)) AS BIGINT) AS h
         |  FROM documents
         |), k AS (
         |  SELECT doc_id, n_tokens,
         |    round(ln((h + 1) / 281474976710656.0) / n_tokens, 12) AS key_r
         |  FROM d
         |), rk AS (
         |  SELECT doc_id, n_tokens, key_r,
         |    CAST(row_number() OVER (ORDER BY key_r DESC, doc_id) AS BIGINT)
         |      AS rn
         |  FROM k
         |)
         |SELECT doc_id, n_tokens, key_r, rn
         |FROM rk WHERE rn <= $WorSampleK""".stripMargin,

    // (split, shard)-partitioned concat-then-chunk packing over the
    // CC splits.
    "pipeline_pack" ->
      s"""WITH RECURSIVE $ccSplitCtes, nt AS (
         |  SELECT d.doc_id, s.split,
         |    (CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14)) AS BIGINT)) % $NumPackShards AS shard,
         |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents d JOIN splits s USING (doc_id)
         |), packed AS (
         |  SELECT doc_id, split, shard, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY split, shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM nt
         |)
         |SELECT doc_id, split, shard, n_tokens,
         |  cum_before // $PackBudget AS pack_id,
         |  cum_before % $PackBudget AS offset_in_pack
         |FROM packed""".stripMargin,

    // the pack chain verbatim with the per-(split, shard) efficiency
    // tail; n_packs = ceil(total_tokens / budget) (ADVICE r13 — see
    // the Spark side)
    "pipeline_pack_efficiency" ->
      s"""WITH RECURSIVE $ccSplitCtes, nt AS (
         |  SELECT d.doc_id, s.split,
         |    (CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14)) AS BIGINT)) % $NumPackShards AS shard,
         |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents d JOIN splits s USING (doc_id)
         |), packed AS (
         |  SELECT doc_id, split, shard, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY split, shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM nt
         |), pk AS (
         |  SELECT doc_id, split, shard, n_tokens,
         |    cum_before // $PackBudget AS pack_id,
         |    cum_before % $PackBudget AS offset_in_pack
         |  FROM packed
         |)
         |SELECT split, shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST((sum(n_tokens) + ${PackBudget - 1}) // $PackBudget AS BIGINT)
         |    AS n_packs,
         |  CAST(((sum(n_tokens) + ${PackBudget - 1}) // $PackBudget)
         |    * $PackBudget - sum(n_tokens) AS BIGINT) AS tail_waste,
         |  round(CAST(sum(n_tokens) AS DOUBLE)
         |    / CAST(((sum(n_tokens) + ${PackBudget - 1}) // $PackBudget)
         |      * $PackBudget AS DOUBLE), 6) AS util_r,
         |  CAST(sum(CASE WHEN offset_in_pack + n_tokens > $PackBudget
         |    THEN 1 ELSE 0 END) AS BIGINT) AS straddlers
         |FROM pk GROUP BY 1, 2""".stripMargin,

    "pipeline_select" ->
      s"""WITH sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
         |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
         |  FROM sigs, generate_series(0, 3) t(b)
         |), mins AS (
         |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
         |  FROM bands GROUP BY 1, 2, 3, 4, 5
         |), lsh_keep AS (
         |  SELECT bd.doc_id, min(m.rep) AS rep_id
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  GROUP BY bd.doc_id
         |), d AS (
         |  SELECT doc_id, text, md5(text) AS fp,
         |         string_split(text, ' ') AS toks
         |  FROM documents
         |), flags AS (
         |  SELECT doc_id, fp,
         |    CAST(round(CAST(round((len(list_distinct(toks)) / len(toks)) * 0.4 +
         |      (1.0 - (len(list_filter(toks, t -> t = 'the')) +
         |              len(list_filter(toks, t -> t = 'a'))) / len(toks)) * 0.3 +
         |      least(((length(text) - (len(toks) - 1)) / len(toks)) / 10.0, 1.0) * 0.3,
         |      9) AS DECIMAL(18,9)), 6) AS DOUBLE) AS quality,
         |    CASE WHEN len(list_filter(toks, t -> t = 'the')) >= len(list_filter(toks, t -> t = 'a'))
         |           AND len(list_filter(toks, t -> t = 'the')) >= len(list_filter(toks, t -> t = 'data')) THEN 'en'
         |         WHEN len(list_filter(toks, t -> t = 'a')) >= len(list_filter(toks, t -> t = 'data')) THEN 'es'
         |         ELSE 'de' END AS lang_pred,
         |    CAST(len(regexp_extract_all(text, '${graft.text.TextOps.EmailPat}'))
         |       + len(regexp_extract_all(regexp_replace(text,
         |           '${graft.text.TextOps.EmailPat}', '<EMAIL>', 'g'),
         |           '${graft.text.TextOps.PhonePat}'))
         |       + len(regexp_extract_all(regexp_replace(regexp_replace(text,
         |           '${graft.text.TextOps.EmailPat}', '<EMAIL>', 'g'),
         |           '${graft.text.TextOps.PhonePat}', '<PHONE>', 'g'),
         |           '${graft.text.TextOps.IdPat}')) AS BIGINT) AS n_pii
         |  FROM d
         |), exact_keep AS (
         |  SELECT fp, min(doc_id) AS keep_id FROM d GROUP BY fp
         |)
         |SELECT f.doc_id, f.quality, f.lang_pred, f.n_pii,
         |  (f.doc_id = e.keep_id) AS keep_exact,
         |  (f.doc_id = k.rep_id) AS keep_neardup,
         |  (f.doc_id = e.keep_id AND f.doc_id = k.rep_id
         |   AND f.quality >= 0.6 AND f.lang_pred = 'en'
         |   AND f.n_pii = 0) AS selected
         |FROM flags f
         |JOIN exact_keep e USING (fp)
         |JOIN lsh_keep k USING (doc_id)""".stripMargin,

    // pipeline_select's chain + the gram-coverage CTEs (coverage_r
    // joined per doc, thresholds on the 6-dp round both engines agree
    // on) + the normalizeFlags CTE — same keep/strip/drop CASE.
    "pipeline_select_v2" ->
      s"""WITH $gramCoverageCtes, ${TextQueries.normalizeFlagsCte}, sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
         |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
         |  FROM sigs, generate_series(0, 3) t(b)
         |), mins AS (
         |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
         |  FROM bands GROUP BY 1, 2, 3, 4, 5
         |), lsh_keep AS (
         |  SELECT bd.doc_id, min(m.rep) AS rep_id
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  GROUP BY bd.doc_id
         |), dd AS (
         |  SELECT doc_id, text, md5(text) AS fp,
         |         string_split(text, ' ') AS toks
         |  FROM documents
         |), flags AS (
         |  SELECT doc_id, fp,
         |    CAST(round(CAST(round((len(list_distinct(toks)) / len(toks)) * 0.4 +
         |      (1.0 - (len(list_filter(toks, t -> t = 'the')) +
         |              len(list_filter(toks, t -> t = 'a'))) / len(toks)) * 0.3 +
         |      least(((length(text) - (len(toks) - 1)) / len(toks)) / 10.0, 1.0) * 0.3,
         |      9) AS DECIMAL(18,9)), 6) AS DOUBLE) AS quality,
         |    CASE WHEN len(list_filter(toks, t -> t = 'the')) >= len(list_filter(toks, t -> t = 'a'))
         |           AND len(list_filter(toks, t -> t = 'the')) >= len(list_filter(toks, t -> t = 'data')) THEN 'en'
         |         WHEN len(list_filter(toks, t -> t = 'a')) >= len(list_filter(toks, t -> t = 'data')) THEN 'es'
         |         ELSE 'de' END AS lang_pred,
         |    CAST(len(regexp_extract_all(text, '${graft.text.TextOps.EmailPat}'))
         |       + len(regexp_extract_all(regexp_replace(text,
         |           '${graft.text.TextOps.EmailPat}', '<EMAIL>', 'g'),
         |           '${graft.text.TextOps.PhonePat}'))
         |       + len(regexp_extract_all(regexp_replace(regexp_replace(text,
         |           '${graft.text.TextOps.EmailPat}', '<EMAIL>', 'g'),
         |           '${graft.text.TextOps.PhonePat}', '<PHONE>', 'g'),
         |           '${graft.text.TextOps.IdPat}')) AS BIGINT) AS n_pii
         |  FROM dd
         |), exact_keep AS (
         |  SELECT fp, min(doc_id) AS keep_id FROM dd GROUP BY fp
         |), covr AS (
         |  SELECT n.doc_id,
         |    round(coalesce(c.covered_tokens, 0) / CAST(n.n_tokens AS DOUBLE), 6)
         |      AS coverage_r
         |  FROM n LEFT JOIN cov c USING (doc_id)
         |)
         |SELECT f.doc_id, f.quality, f.lang_pred, f.n_pii,
         |  cv.coverage_r, nr.needs_normalize,
         |  (f.doc_id = e.keep_id) AS keep_exact,
         |  (f.doc_id = k.rep_id) AS keep_neardup,
         |  CASE WHEN NOT (f.doc_id = e.keep_id
         |         AND f.quality >= 0.6 AND f.lang_pred = 'en' AND f.n_pii = 0)
         |       THEN 'drop'
         |       WHEN cv.coverage_r > 0.98 THEN 'drop'
         |       WHEN cv.coverage_r > 0.05 THEN 'strip'
         |       WHEN f.doc_id <> k.rep_id THEN 'drop'
         |       ELSE 'keep' END AS action
         |FROM flags f
         |JOIN exact_keep e USING (fp)
         |JOIN lsh_keep k USING (doc_id)
         |JOIN covr cv ON cv.doc_id = f.doc_id
         |JOIN nrm nr ON nr.doc_id = f.doc_id""".stripMargin,

    // Per-split release summary over the CC splits + LSH keep list +
    // the flags projection + the gram-coverage chain (tokens_dup).
    "pipeline_dataset_card" ->
      s"""WITH RECURSIVE $ccSplitCtes, $gramCoverageCtes, lsh_keep AS (
         |  SELECT bd.doc_id, min(m.rep) AS rep_id
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  GROUP BY bd.doc_id
         |), dd AS (
         |  SELECT doc_id, text, source, lang,
         |         string_split(text, ' ') AS toks
         |  FROM documents
         |), flags AS (
         |  SELECT doc_id, source, lang, CAST(len(toks) AS BIGINT) AS n_toks,
         |    CAST(round(CAST(round((len(list_distinct(toks)) / len(toks)) * 0.4 +
         |      (1.0 - (len(list_filter(toks, t -> t = 'the')) +
         |              len(list_filter(toks, t -> t = 'a'))) / len(toks)) * 0.3 +
         |      least(((length(text) - (len(toks) - 1)) / len(toks)) / 10.0, 1.0) * 0.3,
         |      9) AS DECIMAL(18,9)), 6) AS DOUBLE) AS quality,
         |    CAST(len(regexp_extract_all(text, '${graft.text.TextOps.EmailPat}'))
         |       + len(regexp_extract_all(regexp_replace(text,
         |           '${graft.text.TextOps.EmailPat}', '<EMAIL>', 'g'),
         |           '${graft.text.TextOps.PhonePat}'))
         |       + len(regexp_extract_all(regexp_replace(regexp_replace(text,
         |           '${graft.text.TextOps.EmailPat}', '<EMAIL>', 'g'),
         |           '${graft.text.TextOps.PhonePat}', '<PHONE>', 'g'),
         |           '${graft.text.TextOps.IdPat}')) AS BIGINT) AS n_pii
         |  FROM dd
         |)
         |SELECT s.split, count(*) AS n_docs,
         |  CAST(sum(f.n_toks) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT f.source) AS BIGINT) AS n_sources,
         |  CAST(count(DISTINCT f.lang) AS BIGINT) AS n_langs,
         |  CAST(sum(CASE WHEN k.rep_id < f.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
         |  round(sum(CASE WHEN k.rep_id < f.doc_id THEN 1 ELSE 0 END)
         |    / CAST(count(*) AS DOUBLE), 6) AS neardup_rate,
         |  CAST(sum(CASE WHEN f.n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
         |  CAST(sum(coalesce(c.covered_tokens, 0)) AS BIGINT) AS tokens_dup,
         |  round(CAST(sum(CAST(f.quality AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_quality
         |FROM flags f
         |JOIN lsh_keep k USING (doc_id)
         |JOIN splits s USING (doc_id)
         |LEFT JOIN cov c ON c.doc_id = f.doc_id
         |GROUP BY 1""".stripMargin,

    "pipeline_source_report" ->
      s"""WITH sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
         |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
         |  FROM sigs, generate_series(0, 3) t(b)
         |), mins AS (
         |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
         |  FROM bands GROUP BY 1, 2, 3, 4, 5
         |), lsh_keep AS (
         |  SELECT bd.doc_id, min(m.rep) AS rep_id
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  GROUP BY bd.doc_id
         |), d AS (
         |  SELECT doc_id, text, source,
         |         string_split(text, ' ') AS toks
         |  FROM documents
         |), flags AS (
         |  SELECT doc_id, source,
         |    CAST(round(CAST(round((len(list_distinct(toks)) / len(toks)) * 0.4 +
         |      (1.0 - (len(list_filter(toks, t -> t = 'the')) +
         |              len(list_filter(toks, t -> t = 'a'))) / len(toks)) * 0.3 +
         |      least(((length(text) - (len(toks) - 1)) / len(toks)) / 10.0, 1.0) * 0.3,
         |      9) AS DECIMAL(18,9)), 6) AS DOUBLE) AS quality,
         |    CAST(len(regexp_extract_all(text, '${graft.text.TextOps.EmailPat}'))
         |       + len(regexp_extract_all(regexp_replace(text,
         |           '${graft.text.TextOps.EmailPat}', '<EMAIL>', 'g'),
         |           '${graft.text.TextOps.PhonePat}'))
         |       + len(regexp_extract_all(regexp_replace(regexp_replace(text,
         |           '${graft.text.TextOps.EmailPat}', '<EMAIL>', 'g'),
         |           '${graft.text.TextOps.PhonePat}', '<PHONE>', 'g'),
         |           '${graft.text.TextOps.IdPat}')) AS BIGINT) AS n_pii
         |  FROM d
         |), agg AS (
         |  SELECT f.source, count(*) AS n_docs,
         |    CAST(sum(CASE WHEN k.rep_id < f.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
         |    CAST(sum(CASE WHEN f.n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
         |    round(CAST(sum(CAST(f.quality AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_quality
         |  FROM flags f JOIN lsh_keep k USING (doc_id)
         |  GROUP BY 1
         |)
         |SELECT source, n_docs, n_neardup, n_pii_docs, mean_quality,
         |  round(n_neardup / CAST(n_docs AS DOUBLE), 6) AS neardup_rate,
         |  (mean_quality >= 0.55 AND
         |   round(n_neardup / CAST(n_docs AS DOUBLE), 6) < 0.5) AS keep_source
         |FROM agg""".stripMargin,

    "dedup_lsh_keep" ->
      s"""WITH sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
         |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
         |  FROM sigs, generate_series(0, 3) t(b)
         |), mins AS (
         |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
         |  FROM bands GROUP BY 1, 2, 3, 4, 5
         |)
         |SELECT bd.doc_id, min(m.rep) AS rep_id,
         |       (min(m.rep) < bd.doc_id) AS is_dup
         |FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |GROUP BY bd.doc_id""".stripMargin,

    "dedup_substring" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    list_transform(generate_series(1, greatest(len(toks) - ${SpanTokens - 1}, 0)),
         |      i -> array_to_string(list_slice(toks, i, i + ${SpanTokens - 1}), ' ')),
         |    g -> ${h31.format("g")}))) AS span_h
         |  FROM d
         |), span_df AS (
         |  SELECT span_h, count(*) AS n_docs FROM sh GROUP BY 1
         |), perdoc AS (
         |  SELECT s.doc_id, count(*) AS n_spans,
         |    CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_spans,
         |    max(f.n_docs) AS max_span_df
         |  FROM sh s JOIN span_df f USING (span_h) GROUP BY 1
         |)
         |SELECT d.doc_id,
         |  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(p.n_shared_spans, 0) AS BIGINT) AS n_shared_spans,
         |  CAST(coalesce(p.max_span_df, 0) AS BIGINT) AS max_span_df,
         |  (coalesce(p.n_shared_spans, 0) > 0) AS has_shared_span
         |FROM d LEFT JOIN perdoc p USING (doc_id)""".stripMargin,

    "pipeline_contamination" ->
      s"""WITH RECURSIVE $ccSplitCtes, $verifiedSplitCtes, d AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    list_transform(generate_series(1, greatest(len(toks) - ${SpanTokens - 1}, 0)),
         |      i -> array_to_string(list_slice(toks, i, i + ${SpanTokens - 1}), ' ')),
         |    g -> ${h31.format("g")}))) AS span_h
         |  FROM d
         |), naive AS (
         |  SELECT doc_id, 'doc_hash' AS scheme,
         |    CASE WHEN shard < 8 THEN 'train'
         |         WHEN shard = 8 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (
         |    SELECT doc_id,
         |      (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)) % 10 AS shard
         |    FROM documents
         |  )
         |), assigned AS (
         |  SELECT doc_id, scheme, split FROM naive
         |  UNION ALL
         |  SELECT doc_id, 'component' AS scheme, split FROM splits
         |  UNION ALL
         |  SELECT doc_id, 'verified' AS scheme, split FROM vsplits
         |), j AS (
         |  SELECT s.doc_id, a.scheme, a.split, s.span_h
         |  FROM sh s JOIN assigned a USING (doc_id)
         |), tr AS (
         |  SELECT DISTINCT scheme, span_h FROM j WHERE split = 'train'
         |), hits AS (
         |  SELECT j.scheme, j.split,
         |    count(DISTINCT j.doc_id) AS n_docs, count(*) AS n_span_hits
         |  FROM j JOIN tr ON tr.scheme = j.scheme AND tr.span_h = j.span_h
         |  WHERE j.split <> 'train'
         |  GROUP BY 1, 2
         |)
         |SELECT g.scheme, g.split,
         |  CAST(coalesce(h.n_docs, 0) AS BIGINT) AS n_docs,
         |  CAST(coalesce(h.n_span_hits, 0) AS BIGINT) AS n_span_hits
         |FROM (SELECT DISTINCT scheme, split FROM assigned
         |      WHERE split <> 'train') g
         |LEFT JOIN hits h ON h.scheme = g.scheme AND h.split = g.split""".stripMargin,

    "dedup_substring_spans" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    list_transform(generate_series(1, greatest(len(toks) - ${SpanTokens - 1}, 0)),
         |      i -> array_to_string(list_slice(toks, i, i + ${SpanTokens - 1}), ' ')),
         |    g -> ${h31.format("g")}))) AS span_h
         |  FROM d
         |)
         |SELECT span_h, count(*) AS n_docs, min(doc_id) AS first_doc_id
         |FROM sh GROUP BY span_h
         |HAVING count(*) >= 2""".stripMargin,

    // same positional grams → distinct-doc df ≥ 2 → per-doc sorted
    // interval union (Σ min(k, gap)) — term-for-term the
    // Dedup.spanCoverageFrom chain
    "dedup_substring_coverage" ->
      s"""WITH $gramCoverageCtes
         |SELECT n.doc_id, n.n_tokens,
         |  CAST(coalesce(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
         |  CAST(coalesce(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
         |  round(coalesce(c.covered_tokens, 0) / CAST(n.n_tokens AS DOUBLE), 6)
         |    AS coverage_r
         |FROM n LEFT JOIN cov c USING (doc_id)""".stripMargin,

    // batch grams against the base corpus's distinct-gram set, same
    // interval union
    "dedup_substring_incremental" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    ${h31.format(s"array_to_string(list_slice(toks, i, i + ${SpanTokens - 1}), ' ')")} AS gram_h
         |  FROM d, unnest(generate_series(1, greatest(len(toks) - ${SpanTokens - 1}, 0))) u(i)
         |), base AS (
         |  SELECT DISTINCT gram_h FROM g WHERE doc_id % 5 <> 4
         |), pv AS (
         |  SELECT g.doc_id, g.pos,
         |    lag(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS prev
         |  FROM g JOIN base USING (gram_h)
         |  WHERE g.doc_id % 5 = 4
         |), cov AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
         |    CAST(sum(CASE WHEN prev IS NULL THEN ${SpanTokens}
         |      ELSE least(${SpanTokens}, pos - prev) END) AS BIGINT)
         |      AS covered_tokens
         |  FROM pv GROUP BY 1
         |), n AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents WHERE doc_id % 5 = 4
         |)
         |SELECT n.doc_id, n.n_tokens,
         |  CAST(coalesce(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
         |  CAST(coalesce(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
         |  round(coalesce(c.covered_tokens, 0) / CAST(n.n_tokens AS DOUBLE), 6)
         |    AS coverage_r
         |FROM n LEFT JOIN cov c USING (doc_id)""".stripMargin,

    // train grams against the frozen eval-split distinct-gram set —
    // the VERIFIED-component release split (the full recursive-CTE
    // shingle-LSH → verify → CC chain), same planted full-copy +
    // shared-span constants, same interval union, same 6-dp-round /
    // integer thresholds in the action CASE
    "pipeline_decontaminate" ->
      s"""WITH RECURSIVE $verifiedSplitCtes, d AS (
         |  SELECT doc_id, string_split(
         |    CASE WHEN doc_id % 31 = 9 THEN '$DeconCopyText' ELSE text END ||
         |    CASE WHEN doc_id % 11 = 5 THEN ' $DeconPlantSpan' ELSE '' END,
         |    ' ') AS toks
         |  FROM documents
         |), sp AS (
         |  SELECT doc_id, split FROM vsplits
         |), g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    ${h31.format(s"array_to_string(list_slice(toks, i, i + ${SpanTokens - 1}), ' ')")} AS gram_h
         |  FROM d, unnest(generate_series(1, greatest(len(toks) - ${SpanTokens - 1}, 0))) u(i)
         |), eg AS (
         |  SELECT DISTINCT g.gram_h
         |  FROM g JOIN sp USING (doc_id) WHERE sp.split <> 'train'
         |), pv AS (
         |  SELECT g.doc_id, g.pos,
         |    lag(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS prev
         |  FROM g JOIN eg USING (gram_h) JOIN sp USING (doc_id)
         |  WHERE sp.split = 'train'
         |), cov AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
         |    CAST(sum(CASE WHEN prev IS NULL THEN ${SpanTokens}
         |      ELSE least(${SpanTokens}, pos - prev) END) AS BIGINT)
         |      AS covered_tokens
         |  FROM pv GROUP BY 1
         |), n AS (
         |  SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens
         |  FROM d JOIN sp USING (doc_id) WHERE sp.split = 'train'
         |)
         |SELECT n.doc_id, n.n_tokens,
         |  CAST(coalesce(c.n_dup_grams, 0) AS BIGINT) AS n_eval_grams,
         |  CAST(coalesce(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
         |  round(coalesce(c.covered_tokens, 0) / CAST(n.n_tokens AS DOUBLE), 6)
         |    AS coverage_r,
         |  CASE WHEN round(coalesce(c.covered_tokens, 0)
         |         / CAST(n.n_tokens AS DOUBLE), 6) > 0.5 THEN 'drop'
         |       WHEN coalesce(c.covered_tokens, 0) > 0 THEN 'strip'
         |       ELSE 'keep' END AS action
         |FROM n LEFT JOIN cov c USING (doc_id)""".stripMargin,

    // the same duplicated-gram occurrences (pv carries the lag),
    // gaps-and-islands with break at gap > k, island bounds per group
    "dedup_substring_intervals" ->
      s"""WITH $gramCoverageCtes, isl AS (
         |  SELECT doc_id, pos,
         |    sum(CASE WHEN prev IS NULL OR pos - prev > $SpanTokens
         |        THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos
         |            ROWS UNBOUNDED PRECEDING) AS island
         |  FROM pv
         |)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + ${SpanTokens - 1} AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_grams
         |FROM isl GROUP BY doc_id, island""".stripMargin,

    // the same duplicated-gram occurrences expanded to covered token
    // indices, surviving tokens re-joined in order
    "pipeline_substring_strip" ->
      s"""WITH $gramCoverageCtes, cvp AS (
         |  SELECT DISTINCT o.doc_id, o.pos + u.i AS pos
         |  FROM (SELECT g.doc_id, g.pos FROM g JOIN dupg USING (gram_h)) o,
         |    unnest(generate_series(0, ${SpanTokens - 1})) u(i)
         |), tk AS (
         |  SELECT doc_id, i - 1 AS pos, toks[i] AS tok
         |  FROM d, unnest(generate_series(1, len(toks))) u(i)
         |), kept AS (
         |  SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         |    string_agg(tk.tok, ' ' ORDER BY tk.pos) AS stripped_text
         |  FROM tk
         |  LEFT JOIN cvp ON cvp.doc_id = tk.doc_id AND cvp.pos = tk.pos
         |  WHERE cvp.doc_id IS NULL
         |  GROUP BY 1
         |)
         |SELECT n.doc_id, n.n_tokens,
         |  coalesce(k.kept_tokens, 0) AS kept_tokens,
         |  coalesce(k.stripped_text, '') AS stripped_text
         |FROM n LEFT JOIN kept k USING (doc_id)""".stripMargin,

    // the same coverage chain rolled up per source
    "pipeline_substring_impact" ->
      s"""WITH $gramCoverageCtes, d2 AS (
         |  SELECT n.doc_id, d.source, n.n_tokens,
         |    coalesce(c.covered_tokens, 0) AS covered
         |  FROM n
         |  JOIN documents d USING (doc_id)
         |  LEFT JOIN cov c USING (doc_id)
         |)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN covered > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_affected,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
         |  CAST(sum(covered) AS BIGINT) AS tokens_dup,
         |  round(CAST(sum(covered) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE), 6)
         |    AS dup_rate
         |FROM d2 GROUP BY 1""".stripMargin,

    "dedup_jaccard_pairs" ->
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    list_distinct(string_split(text, ' ')) AS tokset,
         |    ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(len(list_intersect(a.tokset, b.tokset)) /
         |    CAST(len(list_distinct(list_concat(a.tokset, b.tokset))) AS DOUBLE), 6) AS jaccard_r,
         |  CAST(len(list_filter(generate_series(1, 16), i -> a.sig[i] = b.sig[i])) AS BIGINT) / 16.0 AS minhash_est
         |FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1""".stripMargin,

    "dedup_ngram_pairs" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(
         |      list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
         |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])),
         |      g -> ${h31.format("g")})) AS sh
         |  FROM d
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(len(list_intersect(a.sh, b.sh)) /
         |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 6)
         |    AS ngram_jaccard_r
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin,

    "dedup_simhash" ->
      s"""WITH hashes AS (
         |  SELECT doc_id,
         |    list_transform(string_split(text, ' '), t -> ${h31.format("t")}) AS th
         |  FROM documents
         |), sh AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(generate_series(0, 31), b ->
         |      CASE WHEN list_sum(list_transform(th, h ->
         |          ((h // CAST(power(2, b) AS BIGINT)) % 2) * 2 - 1)) > 0
         |        THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
         |  FROM hashes
         |)
         |SELECT a.doc_id, a.simhash,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming_next
         |FROM sh a LEFT JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin,

    // same normalized 64-char key, same 2-char-prefix blocking, same
    // sort; the W constant-offset leads become a rank-range self-join
    // (DuckDB's lead() takes only constant offsets in the same spirit,
    // but the join form is clearer as SQL) — identical pair set, and
    // levenshtein is an integer both engines compute identically
    "dedup_sorted_neighborhood" ->
      s"""WITH k AS (
         |  SELECT doc_id,
         |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 64)
         |      AS snkey
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, snkey, substr(snkey, 1, 2) AS bkt,
         |    row_number() OVER (PARTITION BY substr(snkey, 1, 2)
         |                       ORDER BY snkey, doc_id) AS rn
         |  FROM k
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(levenshtein(a.snkey, b.snkey) AS INTEGER) AS edit_dist
         |FROM r a JOIN r b
         |  ON a.bkt = b.bkt AND b.rn > a.rn AND b.rn <= a.rn + 8
         |WHERE levenshtein(a.snkey, b.snkey) <= 16""".stripMargin,

    // same blocks, DuckDB's own jaro_winkler_similarity as the scorer
    // — the native-expression parity proof; decisions on the rounded
    // score both engines agree on
    "dedup_jaro_winkler" ->
      s"""WITH k AS (
         |  SELECT doc_id,
         |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 64)
         |      AS snkey
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, snkey, substr(snkey, 1, 2) AS bkt,
         |    row_number() OVER (PARTITION BY substr(snkey, 1, 2)
         |                       ORDER BY snkey, doc_id) AS rn
         |  FROM k
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(jaro_winkler_similarity(a.snkey, b.snkey), 6) AS jw
         |FROM r a JOIN r b
         |  ON a.bkt = b.bkt AND b.rn > a.rn AND b.rn <= a.rn + $SnWindow
         |WHERE round(jaro_winkler_similarity(a.snkey, b.snkey), 6) >= $JwThreshold""".stripMargin,

    // same star edges + hashed token sets as dedup_lsh_pairs; both
    // direction scores from one intersection, decision on rounded
    // values
    "dedup_containment" ->
      s"""WITH sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b, sig[b*4 + 1] AS k0, sig[b*4 + 2] AS k1,
         |         sig[b*4 + 3] AS k2, sig[b*4 + 4] AS k3
         |  FROM sigs, generate_series(0, 3) t(b)
         |), mins AS (
         |  SELECT b, k0, k1, k2, k3, min(doc_id) AS rep
         |  FROM bands GROUP BY 1, 2, 3, 4, 5
         |), edges AS (
         |  SELECT DISTINCT m.rep AS doc_a, bd.doc_id AS doc_b
         |  FROM bands bd JOIN mins m USING (b, k0, k1, k2, k3)
         |  WHERE m.rep < bd.doc_id
         |), toksets AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(string_split(text, ' '), s ->
         |      ${h31.format("s")})) AS tokset
         |  FROM documents
         |)
         |SELECT doc_a, doc_b,
         |  CAST(len(list_intersect(ta.tokset, tb.tokset)) AS BIGINT) AS n_inter,
         |  CAST(len(ta.tokset) AS BIGINT) AS n_a,
         |  CAST(len(tb.tokset) AS BIGINT) AS n_b,
         |  round(len(list_intersect(ta.tokset, tb.tokset)) /
         |    CAST(len(ta.tokset) AS DOUBLE), 6) AS containment_a,
         |  round(len(list_intersect(ta.tokset, tb.tokset)) /
         |    CAST(len(tb.tokset) AS DOUBLE), 6) AS containment_b,
         |  (greatest(
         |    round(len(list_intersect(ta.tokset, tb.tokset)) /
         |      CAST(len(ta.tokset) AS DOUBLE), 6),
         |    round(len(list_intersect(ta.tokset, tb.tokset)) /
         |      CAST(len(tb.tokset) AS DOUBLE), 6)) >= CAST(0.8 AS DOUBLE))
         |    AS is_contained
         |FROM edges
         |JOIN toksets ta ON ta.doc_id = doc_a
         |JOIN toksets tb ON tb.doc_id = doc_b""".stripMargin,

    // the CC chain + the same two agg-sized joins; per-component
    // terms 9-dp-rounded then decimal-summed for the order-free
    // global Q
    "graph_modularity" ->
      s"""WITH RECURSIVE $ccSplitCtes, m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m FROM edges
         |), ec AS (
         |  SELECT ca.component_id, CAST(count(*) AS BIGINT) AS e_in
         |  FROM edges e
         |  JOIN cc ca ON ca.doc_id = e.doc_a
         |  JOIN cc cb ON cb.doc_id = e.doc_b
         |  WHERE ca.component_id = cb.component_id
         |  GROUP BY 1
         |), deg AS (
         |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT doc_a AS v FROM edges
         |    UNION ALL
         |    SELECT doc_b AS v FROM edges
         |  ) GROUP BY 1
         |), dc AS (
         |  SELECT cc.component_id, CAST(sum(deg.deg) AS BIGINT) AS d_sum
         |  FROM cc JOIN deg ON deg.v = cc.doc_id
         |  GROUP BY 1
         |), per AS (
         |  SELECT dc.component_id, coalesce(ec.e_in, 0) AS e_in, dc.d_sum,
         |    round(CAST(coalesce(ec.e_in, 0) AS DOUBLE) / m.m -
         |      (CAST(dc.d_sum AS DOUBLE) / CAST(2 * m.m AS DOUBLE)) *
         |      (CAST(dc.d_sum AS DOUBLE) / CAST(2 * m.m AS DOUBLE)), 9) AS q_c
         |  FROM dc LEFT JOIN ec USING (component_id) CROSS JOIN m
         |)
         |SELECT component_id, CAST(e_in AS BIGINT) AS e_in, d_sum, q_c FROM per
         |UNION ALL
         |SELECT CAST(-1 AS BIGINT), CAST(sum(e_in) AS BIGINT),
         |  CAST(sum(d_sum) AS BIGINT),
         |  CAST(sum(CAST(q_c AS DECIMAL(28,9))) AS DOUBLE)
         |FROM per""".stripMargin,

    // same CC chain for the seed set (component reps), then the BFS
    // recursion: (v, dist) pairs bounded at BfsRounds hops, min per
    // vertex — UNION-dedup terminates the recursion at the bound
    "graph_bfs" ->
      s"""WITH RECURSIVE $ccSplitCtes, seeds AS (
         |  SELECT DISTINCT component_id AS v FROM cc
         |), bfs(v, dist) AS (
         |  SELECT v, CAST(0 AS BIGINT) FROM seeds
         |  UNION
         |  SELECT e.dst, bfs.dist + 1
         |  FROM bfs JOIN edges2 e ON e.src = bfs.v
         |  WHERE bfs.dist < $BfsRounds
         |)
         |SELECT v AS doc_id, min(dist) AS hop_dist
         |FROM bfs GROUP BY 1""".stripMargin,

    // the same CC chain, component sizes, count-of-counts histogram
    "pipeline_cluster_sizes" ->
      s"""WITH RECURSIVE $ccSplitCtes, sizes AS (
         |  SELECT component_id, CAST(count(*) AS BIGINT) AS sz
         |  FROM cc GROUP BY 1
         |), hist AS (
         |  SELECT sz AS size, CAST(count(*) AS BIGINT) AS n_components,
         |    CAST(sz * count(*) AS BIGINT) AS n_docs
         |  FROM sizes GROUP BY 1
         |)
         |SELECT size, n_components, n_docs,
         |  round(CAST(n_docs AS DOUBLE)
         |    / CAST(sum(n_docs) OVER () AS DOUBLE), 6) AS pct_docs_r
         |FROM hist""".stripMargin,

    // the same star edges symmetrized, zero-degree docs included, the
    // distinct-degree cumulative realized by a plain window (the
    // engine's TinyOrder triangular join computes the same prefix)
    "graph_degree_distribution" ->
      s"""WITH $lshEdgeCtes, sym AS (
         |  SELECT doc_a AS v FROM edges
         |  UNION ALL
         |  SELECT doc_b AS v FROM edges
         |), deg AS (
         |  SELECT d.doc_id AS v, CAST(coalesce(g.dd, 0) AS BIGINT) AS dd
         |  FROM documents d
         |  LEFT JOIN (SELECT v, count(*) AS dd FROM sym GROUP BY 1) g
         |    ON g.v = d.doc_id
         |), hist AS (
         |  SELECT dd AS degree, CAST(count(*) AS BIGINT) AS n_nodes
         |  FROM deg GROUP BY 1
         |), c AS (
         |  SELECT degree, n_nodes,
         |    sum(n_nodes) OVER ()
         |      - coalesce(sum(n_nodes) OVER (ORDER BY degree
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS n_ge,
         |    sum(n_nodes) OVER () AS n_total
         |  FROM hist
         |)
         |SELECT degree, n_nodes, CAST(n_ge AS BIGINT) AS n_ge,
         |  round(CAST(n_ge AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS ccdf_r
         |FROM c""".stripMargin,

    // the same CC chain, the smallest-rep seed panel, and the graph_bfs
    // recursion carrying the seed label; min per (seed, vertex) then
    // the 9-dp-quantized harmonic/closeness finish term-for-term
    "graph_closeness_sampled" ->
      s"""WITH RECURSIVE $ccSplitCtes, seeds AS (
         |  SELECT v AS s FROM (
         |    SELECT DISTINCT component_id AS v FROM cc
         |    ORDER BY v LIMIT $ClosenessSeeds)
         |), bfs(s, v, dist) AS (
         |  SELECT s, s, CAST(0 AS BIGINT) FROM seeds
         |  UNION
         |  SELECT bfs.s, e.dst, bfs.dist + 1
         |  FROM bfs JOIN edges2 e ON e.src = bfs.v
         |  WHERE bfs.dist < $BfsRounds
         |), md AS (
         |  SELECT s, v, min(dist) AS dist FROM bfs GROUP BY 1, 2
         |)
         |SELECT s AS seed, CAST(count(*) AS BIGINT) AS n_reached,
         |  CAST(sum(dist) AS BIGINT) AS dist_sum,
         |  CAST(max(dist) AS BIGINT) AS ecc_h,
         |  CASE WHEN sum(dist) > 0 THEN
         |    round(CAST(count(*) - 1 AS DOUBLE) / CAST(sum(dist) AS DOUBLE), 6)
         |  END AS closeness_r,
         |  round(CAST(sum(CASE WHEN dist > 0
         |    THEN CAST(round(1.0 / CAST(dist AS DOUBLE), 9) AS DECIMAL(20,9))
         |    ELSE CAST(0 AS DECIMAL(20,9)) END) AS DOUBLE), 6) AS harmonic_r
         |FROM md GROUP BY 1""".stripMargin
  )
}
