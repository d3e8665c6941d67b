#!/usr/bin/env python3
"""One-shot refactor: split the 13.4k-line SparkEntry.scala query book into
per-family files under graft.queries, with shared helpers in QueryHelpers.
Run once from /root/repo; idempotence is not needed (git is the undo)."""
import re, os, collections

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT = "src/main/scala/graft/queries"
lines = open(SRC).read().split("\n")  # 0-based; line N (1-based) = lines[N-1]

# ---- section boundaries (verified by inspection, 1-based inclusive) ----
HDR = lines[0:29]            # 1..29  package/imports/doc + "object SparkEntry {"
HELP_B = lines[29:160]       # 30..160 top helper defs
ENTRYDOC = lines[165:169]    # 166..169 flagship doc + def entry
QSTART, QEND = 172, 7836     # queries entries
HELP_F = lines[7837:7954]    # 7838..7954 mid helpers
ORA_LOCAL = lines[7955:8007] # 7956..8007 oracleSql local vals (low/cln/cte/q115)
OSTART, OEND = 8009, 13448   # oracle entries

qbody = lines[QSTART-1:QEND]
obody = lines[OSTART-1:OEND]

def split_entries(body, indent):
    """Split map-body lines into (key, block-lines) preserving attached
    leading scaladoc/comments; drop family banner comments."""
    start_re = re.compile(r'^%s"(q[0-9a-z_]+)" ->' % (" " * indent))
    starts = [i for i, l in enumerate(body) if start_re.match(l)]
    blocks = []
    # preamble before first entry: keep only comments, attach to first
    pre = body[:starts[0]]
    for idx, st in enumerate(starts):
        en = starts[idx + 1] if idx + 1 < len(starts) else len(body)
        blocks.append([start_re.match(body[st]).group(1), body[st:en]])
    # move trailing comment/blank runs to the next block's head
    cmt = re.compile(r'^\s*(//|/\*\*|\*|\*/)|^\s*$')
    for i in range(len(blocks) - 1):
        blk = blocks[i][1]
        j = len(blk)
        while j > 0 and cmt.match(blk[j - 1]):
            j -= 1
        blocks[i + 1][1] = blk[j:] + blocks[i + 1][1]
        blocks[i][1] = blk[:j]
    blocks[0][1] = pre + blocks[0][1]
    # drop family banner lines, strip leading blank runs
    banner = re.compile(r'^\s*// ----')
    out = []
    for k, blk in blocks:
        blk = [l for l in blk if not banner.match(l)]
        while blk and blk[0].strip() == "":
            blk.pop(0)
        while blk and blk[-1].strip() == "":
            blk.pop()
        out.append((k, blk))
    return out

qents = split_entries(qbody, 4)
oents = split_entries(obody, 6)
assert len(qents) == 298 and len(oents) == 298, (len(qents), len(oents))
assert set(k for k, _ in qents) == set(k for k, _ in oents)

# ---- family classification: first matching keyword wins ----
RULES = [
    ("Survey", ["clean_filler", "classify_demo", "summary", "survey_wide",
                "explode_tokens", "cached_api", "xlsx"]),
    ("Graph", ["kcore", "triangle", "clustering_coeff", "bfs_hops",
               "link_prediction", "embeddedness", "textrank",
               "label_propagation", "assortativity", "knn_graph", "markov",
               "event_transitions", "path_trigrams", "nation_flows",
               "source_authority", "copurchase", "basket_lift", "pmi_cooccur"]),
    ("Dedup", ["dedup", "minhash", "simhash", "jaccard", "winnow", "neardup",
               "span_", "canonical_pick", "cdc_chunks", "dup_", "blocking",
               "containment", "shared_prefix", "decontaminate", "leakage",
               "snapshot_diff", "fingerprint", "bloom_decontaminate"]),
    ("Ann", ["cosine", "ivf", "_pq", "pq_", "ann_index", "semdedup", "embed",
             "mmr", "triplet", "margin_mining", "centroid", "quantize",
             "nprobe", "lsh_tuning", "kmeans", "cluster_ari",
             "cluster_profile", "pca", "abtt", "outlier"]),
    ("Retrieval", ["tfidf", "bm25", "phrase_search", "retrieve_rerank",
                   "rrf", "ndcg", "hard_negatives", "mrr"]),
    ("Text", ["lang", "token", "bpe", "perplexity", "backoff", "kneser",
              "bigram", "boilerplate", "repetition", "quality_rules", "pii",
              "nfc", "script_profile", "vocab", "oov", "fightin", "zipf",
              "heaps", "entropy", "lexical", "fertility", "text_profile",
              "hash_classifier", "label_fusion", "rater", "novelty",
              "distinct_ngrams", "stupid", "ngram"]),
    ("Curation", ["curate", "mix", "pack", "chunk", "shard", "curriculum",
                  "export", "quota", "sample", "split", "dataset_card",
                  "upsample", "dsir", "k_anonymity", "l_diversity",
                  "t_closeness", "mask", "effective_tokens", "winsorize",
                  "curation", "canonical", "ctx_overflow", "pad_efficiency"]),
    ("Events", ["session", "funnel", "retention", "event", "conversion",
                "cohort", "dwell", "concurrency", "stickiness",
                "active_users", "bot_", "rate_anomaly", "burstiness",
                "attribution", "migration", "growth", "engagement",
                "incident", "daily_trend", "peak", "latency"]),
    ("Stats", ["zscore", "percentile", "histogram", "bootstrap", "chisq",
               "ks_drift", "psi", "gini", "mann_whitney", "benford", "cuped",
               "sprt", "brier", "simpson", "overdispersion", "mase",
               "seasonal", "ewma", "drift", "survival", "calibration",
               "median", "stats_agg", "sketches", "heavy_hitters", "cms_",
               "hhi", "pareto", "correlation", "elasticity", "shrinkage",
               "dose_response", "experiment", "split_half", "forecast",
               "price_index", "independence", "adjustment", "stationary",
               "changepoint", "anomaly", "skew", "tail_index", "dispersion",
               "_ci", "stability", "zonemap", "threshold", "trend", "sweep"]),
]
def family(key):
    name = key.split("_", 1)[1] if "_" in key else key
    for fam, kws in RULES:
        for kw in kws:
            if kw in name:
                return fam
    return "Relational"

fams = collections.OrderedDict()
order = ["Relational", "Survey", "Text", "Dedup", "Ann", "Retrieval",
         "Graph", "Curation", "Events", "Stats"]
for f in order:
    fams[f] = []
for k, _ in qents:
    fams[family(k)].append(k)
for f, ks in fams.items():
    print(f, len(ks), " ".join(ks))

# ---- emit files ----
os.makedirs(OUT, exist_ok=True)
IMPORTS = """import scala.collection.immutable.ListMap
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
"""

# helpers file: widen `private ` -> `private[graft] ` (top-level members only,
# i.e. lines starting with "  private ")
def widen(ls):
    return [re.sub(r'^(  )private( (def|val|lazy val))', r'\1private[graft]\2', l)
            for l in ls]

# the oracle-local vals need re-indenting from 4 to 2 spaces and val->lazy val
# (q115Oracle references KMeansOp at init; lazy keeps object init cheap).
def deindent_locals(ls):
    out = []
    for l in ls:
        l = l[2:] if l.startswith("  ") else l
        out.append(l)
    return out

ora_local = deindent_locals(ORA_LOCAL)
ora_local = [re.sub(r'^(  )val ', r'\1private[graft] lazy val ', l) if
             re.match(r'^  val ', l) else l for l in ora_local]
# "val low = "low"; val cln = "cln"" single line:
ora_local = [l.replace('private[graft] lazy val low = "low"; val cln = "cln"',
                       'private[graft] lazy val low = "low"\n  private[graft] lazy val cln = "cln"')
             for l in ora_local]

helpers = []
helpers.append("package graft.queries\n")
helpers.append("""import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Lexicons
import graft.operators.Profiler
import graft.sources.Tables
""")
helpers.append("/** Shared helpers for the per-family query books: fixture table reader,")
helpers.append("  * DuckDB-twin SQL generators, and the engine-neutral constants that are")
helpers.append("  * injected into BOTH the Spark plan and the generated oracle SQL (the")
helpers.append("  * lexicon-twin pattern — one set of literals, two engines). */")
helpers.append("private[graft] object QueryHelpers {")
helpers.extend(widen(HELP_B))
helpers.extend(widen(HELP_F))
helpers.append("")
helpers.extend(ora_local)
helpers.append("}")
open(os.path.join(OUT, "QueryHelpers.scala"), "w").write("\n".join(helpers) + "\n")

qmap = dict(qents)
omap = dict(oents)
CROSSREF = re.compile(r'(?<![.\w])queries\("')

FAMDOC = {
  "Relational": "Relational core: TPC-H-shaped scans/joins/aggregates/windows,\n  * SQL-surface functions, and table-audit queries.",
  "Survey": "The reference pipeline's own dataflow (clean -> classify -> pivot)\n  * re-expressed on the documents corpus.",
  "Text": "Text analysis for training-data curation: language ID, quality,\n  * tokenization, LM scoring, vocabulary statistics.",
  "Dedup": "Deduplication family: exact, MinHash/SimHash/LSH near-dup,\n  * span/substring dedup, decontamination, cluster attribution.",
  "Ann": "Embedding similarity: brute-force / IVF / PQ ANN search, k-means,\n  * semantic dedup, embedding diagnostics.",
  "Retrieval": "Retrieval scoring: TF-IDF, BM25, phrase search, fusion,\n  * reranking, ranking metrics.",
  "Graph": "Graph analytics over fixture-derived edge sets: components,\n  * centrality, cores, random walks, link prediction.",
  "Curation": "Corpus curation: mixing, packing, sharding, sampling, privacy\n  * (k-anonymity family), curriculum and export pipelines.",
  "Events": "Event-stream analytics: sessions, funnels, retention, cohorts,\n  * engagement and incident diagnostics.",
  "Stats": "Statistical process control and inference: drift, anomaly,\n  * hypothesis tests, calibration, forecasting.",
}

for fam, keys in fams.items():
    if not keys:
        continue
    fn = []
    fn.append("package graft.queries\n")
    fn.append(IMPORTS)
    fn.append("/** %s" % FAMDOC[fam])
    fn.append("  *")
    fn.append("  * Query/oracle pairs split out of the SparkEntry book (round 13);")
    fn.append("  * aggregated by [[graft.SparkEntry]]. Conventions in QueryHelpers. */")
    fn.append("private[graft] object %sQueries extends QueryBook {" % fam)
    fn.append("")
    fn.append("  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(")
    for k in keys:
        for l in qmap[k]:
            fn.append(CROSSREF.sub('graft.SparkEntry.queries("', l))
        fn.append("")
    if fn[-1] == "":
        fn.pop()
    fn.append("  )")
    fn.append("")
    fn.append("  val oracleSql: ListMap[String, String] = ListMap(")
    for k in keys:
        fn.extend(omap[k])
        fn.append("")
    if fn[-1] == "":
        fn.pop()
    fn.append("  )")
    fn.append("}")
    open(os.path.join(OUT, "%sQueries.scala" % fam), "w").write("\n".join(fn) + "\n")
    print("wrote", fam, len(keys))
