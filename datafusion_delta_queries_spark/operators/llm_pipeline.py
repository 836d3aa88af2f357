"""LLM-training-data pipeline operators over documents/embeddings.

Driver-mandated capability beyond the reference (BASELINE.json north
star; the reference has no function surface at all — SURVEY §2.3).
Every operator carries an exact DuckDB oracle (including the
end-to-end curation pipeline as one declarative plan):

dedup      : exact md5, n-gram Jaccard (complete inverted-index
             candidates), MinHash+LSH (banded, sub-quadratic), SimHash
             fingerprints + pigeonhole-banded Hamming near-dup pairs,
             embedding-cosine near-dup (banded sign-LSH), dup-cluster
             formation (connected components over pairs), incremental
             LSH-index refresh (delta_lsh_maintenance)
similarity : brute-force cosine top-k, hyperplane-LSH bucketed ANN,
             IVF coarse-quantizer ANN (exactly oracle-checked)
text       : per-doc stats, quality score, language-ID heuristic,
             BPE-ish token counts, rolling char-shingle fingerprint,
             TF-IDF top terms, bigram-LM fluency score
multimodal : binary payload + metadata struct through Arrow-batched
             mapInPandas (decode stubbed — no codecs in container)

Engine-portability contract: all hashing is md5-based (identical hex in
Spark and DuckDB), array ops are 1-based on both sides (element_at /
list indexing), dot products are order-stable sequential folds, and
every computed column is aliased identically in the Spark plan and the
oracle SQL.

Scale posture (100 TB): signatures/stats are per-row higher-order array
expressions (no shuffle, whole-stage codegen); candidate generation for
fuzzy dedup joins on shingle/band/bucket keys — never an all-pairs
cross join; the only Python crossing is the Arrow-batched multimodal
extractor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import dedup, graph, multimodal, similarity, text
from ..functions.text import round_portable

# ---------------------------------------------------------------------------
# Shared building blocks
# ---------------------------------------------------------------------------

_NORM = text.norm_text("text")

# Stopword vote lists for the language-ID heuristic (shared by
# llm_lang_id and the end-to-end pipeline).
_EN = "('the', 'a', 'of', 'and', 'is')"
_DE = "('der', 'die', 'das', 'und', 'ist')"
_ES = "('el', 'la', 'de', 'y', 'es')"

# DuckDB twin of the normalization + tokenization + shingling chain.
def _sql_base(src: str = "documents") -> str:
    """The norm/wrds/shing CTE chain over ``src`` — the DuckDB twin of
    _shingled_df, parameterized so retraction oracles can run it over
    a post-change state subquery instead of the raw table."""
    return rf"""norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM {src}
),
wrds AS (SELECT doc_id, norm, string_split(norm, ' ') AS w FROM norm),
shing AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(w) - 2),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
  FROM wrds
)"""


_SQL_BASE = _sql_base()


def _norm_df(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    # The fixture is a single parquet file = one input partition; the
    # hash-heavy per-row work downstream (minhash/simhash: ~10^7 md5s)
    # would run on one core. Repartitioning 5k tiny rows costs ~nothing
    # and buys full parallelism — on a real cluster the same applies
    # whenever upstream files are few/large relative to cores.
    n = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(n, "doc_id").selectExpr(
        "doc_id", "n_chars", f"{_NORM} AS norm", *carry
    )


def _docs_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _norm_df(load_table(spark, sf_dir, "documents"))


def _shingled_df(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    return (
        _norm_df(docs, carry)
        .selectExpr("doc_id", "norm", f"{text.words('norm')} AS w", *carry)
        .selectExpr("doc_id", f"{text.word_shingles('w', 3)} AS sh", *carry)
    )


def _docs_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shingled_df(load_table(spark, sf_dir, "documents"))


def _shared(df: DataFrame) -> DataFrame:
    """Persist a small, multiply-referenced intermediate (shingle sets,
    survivor docs).

    Spark evaluates each DataFrame reference independently — the
    LSH-candidate + two-sided Jaccard-verify plan references the
    shingle relation three times (six once cluster formation
    symmetrizes edges), so without a persist the md5/BPE-heavy upstream
    recomputes per reference. ``persist`` stays lazy (first action
    materializes, all later branches and CC-loop actions reuse) —
    unlike an eager checkpoint it costs nothing until the driver runs
    the query. Default storage spills to disk, so a hot executor holds
    at most its partitions of (doc_id, shingles) — at 100 TB you'd
    persist to reliable storage instead; the plan shape is unchanged.

    Every persisted handle is recorded so ``release_shared()`` can end
    its lifetime after the terminal action — without it, repeated
    builds in one long-lived session (the bench loop, the driver's
    correctness sweep) accumulate cached blocks, rely on LRU eviction,
    and spam ``CacheManager: Asked to cache already cached data``.
    """
    df = df.persist()
    _PERSISTED.append(df)
    return df


_PERSISTED: list[DataFrame] = []


def _co_materialize(*thunks):
    """Run independent eager materializations (the per-subspace PQ
    code/LUT ``localCheckpoint`` chains) as CONCURRENT jobs on the
    shared scheduler and return their results in argument order.

    Spark happily runs several jobs at once inside one application;
    eager checkpoints issued sequentially from the driver serialize
    them for no reason, leaving most cores idle through each small
    job's tail (guide §2.6 — overlap independent jobs). Results are
    combined by the caller in a fixed order, so concurrency changes
    wall-clock only, never the result."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def release_shared() -> int:
    """Unpersist every intermediate ``_shared`` has pinned; returns the
    count released. Callers invoke this after the terminal action of a
    query (bench does, per run) — safe anytime: unpersisting merely
    drops cached blocks, later actions recompute from source.
    """
    n = 0
    while _PERSISTED:
        try:
            # Blocking so block removal finishes before the caller's
            # next measured run starts (r6 bimodality watch item).
            _PERSISTED.pop().unpersist(blocking=True)
        except Exception:  # session already stopped — nothing to free
            pass
        n += 1
    # CC-loop final checkpoints live outside the persist registry (their
    # blocks belong to a localCheckpointed RDD, not the cache manager);
    # end their lifetime here too so one call frees the whole query.
    n += graph.release_checkpoints()
    return n


def _verified_pairs(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """candidates (doc_a, doc_b) → exact-Jaccard-verified pairs."""
    return (
        cand.join(sh.selectExpr("doc_id AS doc_a", "sh AS sh_a"), "doc_a")
        .join(sh.selectExpr("doc_id AS doc_b", "sh AS sh_b"), "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            f"{round_portable(dedup.jaccard('sh_a', 'sh_b'), 6)} AS jac",
        )
        .where(f"jac >= {threshold}")
    )


_MINHASH_K, _LSH_BANDS, _LSH_ROWS = 12, 6, 2
# Degenerate-bucket guard: a band bucket holding more than this many
# docs contributes quadratically many candidate pairs AND materializes
# as one giant collect_set row on a single task — at 100 TB one hot
# band key (e.g. a boilerplate page that survived exact dedup) would
# wedge the stage. Buckets past the cap are dropped: near-dups lose at
# most recall there, and only when ALL their shared bands are hot
# (run exact dedup first — as the end-to-end pipeline does — so
# identical docs never flood a bucket). Mirrored in the SQL oracle.
_LSH_BUCKET_CAP = 256


def _band_rows(sh: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, band-bucket-key[, *carry]) rows: minhash signature →
    banded keys; ``carry`` columns (e.g. a sign weight) ride through."""
    sig = sh.selectExpr(
        "doc_id", "sh", f"{dedup.minhash_signature('sh', _MINHASH_K)} AS sig",
        *carry,
    )
    return sig.selectExpr(
        "doc_id",
        f"explode({dedup.lsh_bands('sig', _LSH_BANDS, _LSH_ROWS, _MINHASH_K)}) AS band",
        *carry,
    )


def _lsh_candidates(sh: DataFrame, bucket_cap: int = _LSH_BUCKET_CAP) -> DataFrame:
    """Banded MinHash-LSH candidate pairs over (doc_id, sh) rows.

    One shuffle on the (band, band-hash) bucket key; in-bucket pair
    expansion over the (small, by LSH design) doc array, buckets capped
    at ``bucket_cap`` docs. The shared sub-quadratic candidate engine
    for minhash dedup, cluster formation, and the end-to-end pipeline.
    """
    bands = _band_rows(sh)
    return (
        bands.groupBy("band")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("d"))
        .where((F.size("d") >= 2) & (F.size("d") <= bucket_cap))
        .selectExpr(
            "explode(flatten(transform(d, (x, i) -> "
            "transform(slice(d, i + 2, size(d) - i - 1), "
            "y -> struct(x AS doc_a, y AS doc_b))))) AS pr"
        )
        .select("pr.doc_a", "pr.doc_b")
        .distinct()
    )


def _sql_lsh_pairs(sh_rel: str, p: str) -> str:
    """DuckDB twin of _lsh_candidates + exact-Jaccard verify (>= 0.5).

    Emits CTEs {p}sig/{p}bands/{p}cand/{p}pairs over shingle relation
    ``sh_rel`` (columns doc_id, sh).
    """
    return f"""{p}sig AS (
  SELECT doc_id, sh,
         list_transform(generate_series(0, {_MINHASH_K - 1}),
           h -> list_aggregate(list_transform(sh,
                  s -> md5(cast(h AS varchar) || ':' || s)), 'min')) AS sig
  FROM {sh_rel}
),
{p}bands AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(0, {_LSH_BANDS - 1}),
           b -> cast(b AS varchar) || ':' ||
                md5(sig[b * {_LSH_ROWS} + 1] || '|' || sig[b * {_LSH_ROWS} + 2]))) AS band
  FROM {p}sig
),
{p}bcnt AS (
  SELECT band FROM {p}bands GROUP BY band
  HAVING count(*) BETWEEN 2 AND {_LSH_BUCKET_CAP}
),
{p}cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM {p}bands a JOIN {p}bands b ON a.band = b.band AND a.doc_id < b.doc_id
  JOIN {p}bcnt c ON c.band = a.band
),
{p}pairs AS (
  SELECT doc_a, doc_b, jac FROM (
    SELECT doc_a, doc_b,
           CAST(floor((CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
                 (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))))
                * 1e6 + 0.5) AS DOUBLE) / 1e6 AS jac
    FROM {p}cand
    JOIN {sh_rel} sa ON sa.doc_id = doc_a
    JOIN {sh_rel} sb ON sb.doc_id = doc_b
  ) WHERE jac >= 0.5
)"""


# ---------------------------------------------------------------------------
# 1. Exact dedup — hash-groupBy on normalized content
# ---------------------------------------------------------------------------


def q_llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: group by md5(normalized text).

    One shuffle on the hash; at 100 TB this is the standard first dedup
    pass (map-side combine keeps it cheap).
    """
    return (
        _docs_norm(spark, sf_dir)
        .selectExpr("doc_id", "md5(norm) AS content_hash")
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


ORACLE_DEDUP_EXACT = f"""
WITH {_SQL_BASE}
SELECT md5(norm) AS content_hash,
       count(*) AS n_docs,
       min(doc_id) AS keep_doc_id
FROM norm GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 2. n-gram Jaccard dedup — complete inverted-index candidates
# ---------------------------------------------------------------------------


# Hot-shingle guard: a shingle appearing in more than this many docs
# (boilerplate, stop-phrases) would expand quadratically in the
# inverted-index self-join — one ultra-hot shingle at 100 TB turns the
# candidate stage into an all-pairs join. Capped shingles are excluded
# from candidate generation; a pair is lost only if ALL its shared
# shingles are hot, and such pairs sit far below the 0.5 Jaccard
# verify threshold in practice. Mirrored in the SQL oracle.
_NGRAM_DF_CAP = 64


def _ngram_candidates(ex: DataFrame, df_cap: int = _NGRAM_DF_CAP) -> DataFrame:
    """Inverted-index candidate pairs over (doc_id, shingle) rows with
    a document-frequency cap on hot shingles.

    The hot list (df > cap) is tiny by construction — broadcast
    anti-join it away before the self-join so the big side never
    shuffles on a hot key.
    """
    hot = (
        ex.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > df_cap)
        .select("shingle")
    )
    cold = ex.join(F.broadcast(hot), "shingle", "left_anti")
    return (
        cold.alias("a")
        .join(
            cold.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def q_llm_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with word-3-gram Jaccard >= 0.5.

    Candidate generation is an inverted-index self-join on shingles
    (any pair with Jaccard > 0 shares one, so this is complete up to
    the ``_NGRAM_DF_CAP`` hot-shingle exclusion) — sub-quadratic
    because the join key is the shingle, not the doc, and hot shingles
    are removed before the join.
    """
    sh = _shared(_docs_shingled(spark, sf_dir))
    ex = sh.select("doc_id", F.explode("sh").alias("shingle"))
    return _verified_pairs(_ngram_candidates(ex), sh, 0.5)


ORACLE_DEDUP_NGRAM = f"""
WITH {_SQL_BASE},
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM shing),
hot AS (
  SELECT shingle FROM ex GROUP BY shingle HAVING count(*) > {_NGRAM_DF_CAP}
),
exc AS (
  SELECT * FROM ex WHERE shingle NOT IN (SELECT shingle FROM hot)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
)
SELECT * FROM (
  SELECT doc_a, doc_b,
         CAST(floor((CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
               (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))))
              * 1e6 + 0.5) AS DOUBLE) / 1e6 AS jac
  FROM cand
  JOIN shing sa ON sa.doc_id = doc_a
  JOIN shing sb ON sb.doc_id = doc_b
) WHERE jac >= 0.5
"""


# -- Prefix-filtered COMPLETE similarity join (PPJoin-family) ----------
#
# The third candidate-generation strategy next to the capped inverted
# index (complete up to the hot-shingle cap) and MinHash-LSH
# (probabilistic): prefix filtering is COMPLETE with NO cap. Sort each
# doc's shingle set by one global rarity order (df asc, then hashed
# shingle — rarest first); for Jaccard >= t a pair MUST share at least
# one shingle among each side's first |s| − ⌈t·|s|⌉ + 1 entries (if
# the prefixes were disjoint, even matching everything after them
# caps the overlap below t·|s|) — so joining on PREFIX shingles only
# generates every qualifying pair while skipping the huge tail of
# common-shingle collisions. The prefix bound uses pure integer
# arithmetic (⌈7n/10⌉ = (7n + 9) DIV 10) so both engines cut
# identically; the oracle generates candidates BRUTE-FORCE (every
# shared-shingle pair, uncapped), so a green row PROVES the filter's
# completeness, not just its precision.

_PREFIX_T_NUM, _PREFIX_T_DEN = 7, 10  # Jaccard threshold 0.7


def q_llm_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shared(_docs_shingled(spark, sf_dir))
    ex = sh.select("doc_id", F.explode("sh").alias("shingle"))
    dfc = ex.groupBy("shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        "df", F.md5("shingle"), "shingle"
    )
    # r18 measured negative, kept out: repartition("shingle") before
    # the persist (so the cached relation is join-key-partitioned and
    # the self-join plans exchange-free) ran 5.8-7.1 s vs 1.9-4.2 s
    # min over n=6 adjacent runs — the extra full shuffle of the
    # prefix rows costs more than the residual cache race it closes.
    # Persisted (r17): the candidate self-join references this
    # relation twice and the static plan duplicates the df-count +
    # window + prefix-cut subtree under both sides — whether it
    # actually executed once or twice per run was an AQE
    # exchange-reuse lottery, the measured source of this query's
    # documented bimodal 3.3 s / 8-11 s split. The pin makes the
    # shared subtree a cached read for whichever side materializes
    # second (solo spread went [2.4, 2.6, 2.6, 3.3, 8.2, 8.3] from
    # [3.3, 3.6, 8.1, 8.6, 9.2, 11.0]; the residual high mode is the
    # same-job cache-population race). Two full-determinism attempts
    # measured WORSE and are kept out: an eager count() serializes
    # the prefix build against the verify pipeline (min 2.4 -> 4.8 s),
    # and a _copurchase_pairs-style grouped expansion replaces the
    # hot-side broadcasts with a uniformly slow ObjectHashAggregate
    # pass (8.5-12 s every run).
    prefix = _shared(
        ex.join(dfc, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(sh.selectExpr("doc_id", "size(sh) AS n"), "doc_id")
        .where(
            f"rn <= n - ((({_PREFIX_T_NUM} * n) + {_PREFIX_T_DEN - 1}) "
            f"DIV {_PREFIX_T_DEN}) + 1"
        )
        .select("doc_id", "shingle")
    )
    a = prefix.selectExpr("doc_id AS doc_a", "shingle")
    b = prefix.selectExpr("doc_id AS doc_b", "shingle")
    cand = (
        a.join(b, "shingle")
        .where("doc_a < doc_b")
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.selectExpr("doc_id AS doc_a", "sh AS sh_a")
    sb = sh.selectExpr("doc_id AS doc_b", "sh AS sh_b")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) AS n_inter",
            "CAST(size(sh_a) + size(sh_b) "
            "- size(array_intersect(sh_a, sh_b)) AS BIGINT) AS n_union",
        )
        .where(
            f"{_PREFIX_T_DEN} * n_inter >= {_PREFIX_T_NUM} * n_union"
        )
    )


# Brute-force candidates (EVERY shared-shingle pair, no cap, no
# prefix): equality with the Spark side proves prefix completeness.
ORACLE_DEDUP_PREFIX_FILTER = f"""
WITH {_SQL_BASE},
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM shing),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM ex a JOIN ex b
           ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
v AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_inter,
         CAST(len(sa.sh) + len(sb.sh)
              - len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_union
  FROM cand
  JOIN shing sa ON sa.doc_id = doc_a
  JOIN shing sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, n_inter, n_union FROM v
WHERE {_PREFIX_T_DEN} * n_inter >= {_PREFIX_T_NUM} * n_union
"""


# Asymmetric containment threshold: C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)|.
_CONTAIN_T = 0.7


def q_llm_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT ≥ 0.7 —
    ``(doc_contained, doc_container)`` where most of the contained
    doc's word-3-grams appear in the container.

    Jaccard under-detects subset duplicates: a snippet fully embedded
    in a much longer page has Jaccard |A|/|B| → 0 but containment
    |A∩B|/|A| = 1 — the quote/boilerplate/expanded-revision case a
    training-data pipeline must catch (the same asymmetry motivates
    suffix-substring dedup in the published train-data-dedup work).
    Candidates come from the same capped inverted-index self-join as
    the Jaccard path (any pair with containment > 0 shares a shingle,
    so generation is complete up to the hot-shingle cap); each
    undirected candidate is then scored in BOTH directions from one
    intersection computation — ``stack`` fans the scored row out to
    its two directions in the same pass, so the candidate join and the
    per-pair intersection run once, not once per direction. Scale:
    identical posture to llm_dedup_ngram_jaccard — shingle-keyed join,
    hot keys broadcast-anti-joined away, per-pair verify is an array
    intersection.
    """
    sh = _shared(_docs_shingled(spark, sf_dir))
    ex = sh.select("doc_id", F.explode("sh").alias("shingle"))
    j = (
        _ngram_candidates(ex)
        .join(sh.selectExpr("doc_id AS doc_a", "sh AS sh_a"), "doc_a")
        .join(sh.selectExpr("doc_id AS doc_b", "sh AS sh_b"), "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "size(array_intersect(sh_a, sh_b)) AS inter",
            "size(sh_a) AS na",
            "size(sh_b) AS nb",
        )
    )
    directed = j.selectExpr(
        "stack(2, "
        f"doc_a, doc_b, {round_portable('CAST(inter AS DOUBLE) / na', 6)}, "
        f"doc_b, doc_a, {round_portable('CAST(inter AS DOUBLE) / nb', 6)}"
        ") AS (doc_contained, doc_container, containment)"
    )
    return directed.where(f"containment >= {_CONTAIN_T}")


ORACLE_DEDUP_CONTAINMENT = f"""
WITH {_SQL_BASE},
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM shing),
hot AS (
  SELECT shingle FROM ex GROUP BY shingle HAVING count(*) > {_NGRAM_DF_CAP}
),
exc AS (
  SELECT * FROM ex WHERE shingle NOT IN (SELECT shingle FROM hot)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
j AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.sh, sb.sh)) AS inter,
         len(sa.sh) AS na, len(sb.sh) AS nb
  FROM cand
  JOIN shing sa ON sa.doc_id = doc_a
  JOIN shing sb ON sb.doc_id = doc_b
)
SELECT * FROM (
  SELECT doc_a AS doc_contained, doc_b AS doc_container,
         {round_portable('CAST(inter AS DOUBLE) / na', 6)} AS containment
  FROM j
  UNION ALL
  SELECT doc_b AS doc_contained, doc_a AS doc_container,
         {round_portable('CAST(inter AS DOUBLE) / nb', 6)} AS containment
  FROM j
) WHERE containment >= {_CONTAIN_T}
"""


# ---------------------------------------------------------------------------
# 2b. Dup-cluster formation — connected components over near-dup pairs
# ---------------------------------------------------------------------------


def q_llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the near-dup pair
    graph (banded-LSH candidates, exact-Jaccard ≥ 0.5 verified),
    labeled by minimum doc_id (= the canonical keeper).

    Pairs alone under-deduplicate (A~B, B~C but A≁C must still
    collapse to one cluster); components give the transitive groups a
    keep-one policy needs. Min-label propagation converges in
    diameter-many join+agg rounds (functions/graph.py); the oracle
    re-derives the same clusters via a recursive-CTE transitive
    closure, so a pass certifies the distributed algorithm against a
    declarative one.
    """
    sh = _shared(_docs_shingled(spark, sf_dir))
    pairs = _verified_pairs(_lsh_candidates(sh), sh, 0.5).select("doc_a", "doc_b")
    comp = graph.connected_components(pairs, src="doc_a", dst="doc_b")
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
    )


def _sql_clusters(src: str = "documents") -> str:
    """DuckDB twin of the full cluster derivation over document state
    ``src``: LSH pairs → transitive closure → min-labeled components
    with sizes. Parameterized (like _sql_base) so the batch oracle and
    the retraction net-change oracle share ONE SQL copy."""
    return f"""
WITH RECURSIVE {_sql_base(src)},
{_sql_lsh_pairs("shing", "m")},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM mpairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM mpairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
members AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM members
"""


ORACLE_DEDUP_CLUSTERS = _sql_clusters()


# ---------------------------------------------------------------------------
# 2c. End-to-end training-data pipeline (the north-star composition)
# ---------------------------------------------------------------------------


def q_llm_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation pipeline as ONE declarative plan: language filter →
    quality gate → exact dedup → near-dup cluster keep-min → per-source
    token accounting.

    This is what the LLM-pipeline operators exist for — chained, in
    pipeline order (dedup runs on the language/quality survivors, as a
    real corpus build would). Catalyst sees the whole chain: document
    scans are shared, stats are per-row expressions, the only shuffles
    are the dedup groupBys / the shingle join / the tiny component
    loop. The quality average is summed as floor-rounded 1e4 integers,
    so it is exact in both engines (no float-order dependence).
    """
    base = _docs_norm(spark, sf_dir).selectExpr(
        "doc_id", "n_chars", "norm", f"{text.words('norm')} AS w"
    )
    scored = base.selectExpr(
        "doc_id",
        "norm",
        f"CAST(size(filter(w, x -> x IN {_EN})) AS BIGINT) AS en_hits",
        f"CAST(size(filter(w, x -> x IN {_DE})) AS BIGINT) AS de_hits",
        f"CAST(size(filter(w, x -> x IN {_ES})) AS BIGINT) AS es_hits",
        round_portable(
            "0.5 * least(CAST(1.0 AS DOUBLE), n_chars / CAST(400.0 AS DOUBLE))"
            " + 0.3 * (size(array_distinct(w)) * CAST(1.0 AS DOUBLE) / size(w))"
            " + 0.2 * least(CAST(1.0 AS DOUBLE), (aggregate(w, CAST(0 AS BIGINT),"
            " (a, x) -> a + length(x)) * CAST(1.0 AS DOUBLE) / size(w))"
            " / CAST(8.0 AS DOUBLE))", 4)
        + " AS quality_score",
        f"CAST(size({text.bpe_tokens('norm')}) AS BIGINT) AS n_bpe_tokens",
    )
    # filtered is referenced twice (the exact-dedup groupBy AND the
    # survivor join) — persist it so the scoring/lang-ID/BPE subtree,
    # the most expensive per-row work in the pipeline, evaluates once.
    filtered = _shared(
        scored.where(
            "en_hits >= de_hits AND en_hits >= es_hits AND en_hits > 0"
            " AND quality_score >= 0.45"
        )
    )
    exact_keep = filtered.groupBy(F.expr("md5(norm)").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # survivors feeds shingling AND the final per-source rollup; sh is
    # referenced by candidate generation + both verify sides + the CC
    # loop — persist both so the scoring/BPE subtree runs once.
    survivors = _shared(filtered.join(exact_keep.select("doc_id"), "doc_id"))
    sh = _shared(
        survivors.selectExpr(
            "doc_id", f"{text.word_shingles(text.words('norm'), 3)} AS sh"
        )
    )
    pairs = _verified_pairs(_lsh_candidates(sh), sh, 0.5).select("doc_a", "doc_b")
    comp = graph.connected_components(pairs, src="doc_a", dst="doc_b")
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    final = survivors.join(losers, "doc_id", "left_anti")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        final.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe_tokens").alias("n_tokens"),
            F.sum(
                F.expr("CAST(floor(quality_score * 1e4 + 0.5) AS BIGINT)")
            ).alias("quality_sum_1e4"),
        )
    )


ORACLE_PIPELINE = f"""
WITH RECURSIVE {_SQL_BASE},
scored AS (
  SELECT w.doc_id, w.norm,
         CAST(len(list_filter(w.w, x -> x IN {_EN})) AS BIGINT) AS en_hits,
         CAST(len(list_filter(w.w, x -> x IN {_DE})) AS BIGINT) AS de_hits,
         CAST(len(list_filter(w.w, x -> x IN {_ES})) AS BIGINT) AS es_hits,
         CAST(floor((0.5 * least(CAST(1.0 AS DOUBLE), d.n_chars / CAST(400.0 AS DOUBLE))
               + 0.3 * (len(list_distinct(w.w)) * CAST(1.0 AS DOUBLE) / len(w.w))
               + 0.2 * least(CAST(1.0 AS DOUBLE),
                   (list_sum(list_transform(w.w, x -> strlen(x)))
                    * CAST(1.0 AS DOUBLE) / len(w.w)) / CAST(8.0 AS DOUBLE)))
              * 1e4 + 0.5) AS DOUBLE) / 1e4 AS quality_score,
         CAST(len(regexp_extract_all(w.norm, '{text.BPE_TOKEN_PATTERN}')) AS BIGINT)
           AS n_bpe_tokens
  FROM wrds w JOIN documents d ON d.doc_id = w.doc_id
),
filtered AS (
  SELECT * FROM scored
  WHERE en_hits >= de_hits AND en_hits >= es_hits AND en_hits > 0
    AND quality_score >= 0.45
),
exact_keep AS (
  SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(norm)
),
survivors AS (
  SELECT f.* FROM filtered f JOIN exact_keep k ON f.doc_id = k.doc_id
),
ssh AS (
  SELECT s.doc_id, sh.sh FROM survivors s JOIN shing sh ON sh.doc_id = s.doc_id
),
{_sql_lsh_pairs("ssh", "s")},
sedges AS (
  SELECT doc_a AS a, doc_b AS b FROM spairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM spairs
),
sreach(a, b) AS (
  SELECT a, b FROM sedges
  UNION
  SELECT r.a, e.b FROM sreach r JOIN sedges e ON r.b = e.a
),
losers AS (
  SELECT a AS doc_id FROM sreach GROUP BY a HAVING least(a, min(b)) <> a
),
final AS (
  SELECT s.* FROM survivors s
  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = s.doc_id)
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(f.n_bpe_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(floor(f.quality_score * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         AS quality_sum_1e4
FROM final f JOIN documents d ON d.doc_id = f.doc_id
GROUP BY d.source
"""


# ---------------------------------------------------------------------------
# 3. MinHash + LSH dedup — banded, never all-pairs
# ---------------------------------------------------------------------------

def q_llm_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs, exact-Jaccard verified.

    Signature = per-row higher-order array expr (no shuffle). Candidate
    pairs come from ONE shuffle on the (band, band-hash) bucket key:
    groupBy band → in-bucket pair expansion over the (small, by LSH
    design) doc array — computing the md5-heavy signature pipeline
    once, where a bucket self-join would evaluate it twice. Degenerate
    hot buckets are dropped at ``_LSH_BUCKET_CAP`` docs (the 100 TB
    guard against a single giant collect_set row); AQE skew handling
    covers moderate imbalance below the cap. With k=12, b=6, r=2 the
    miss probability for the planted ~0.98-Jaccard dups is
    (1 - 0.98²)⁶ ≈ 4e-9.
    """
    sh = _shared(_docs_shingled(spark, sf_dir))
    return _verified_pairs(_lsh_candidates(sh), sh, 0.5)


ORACLE_DEDUP_MINHASH = f"""
WITH {_SQL_BASE},
{_sql_lsh_pairs("shing", "m")}
SELECT doc_a, doc_b, jac FROM mpairs
"""


# ---------------------------------------------------------------------------
# 3b. Incremental LSH-index maintenance (IVM × fuzzy dedup)
# ---------------------------------------------------------------------------


def q_delta_lsh_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs produced by ONE refresh of a maintained MinHash-LSH
    index: shingle + minhash ONLY the appended documents, join their
    band keys against the full band index, verify exact Jaccard only
    for pairs that touch the delta batch.

    The 100 TB dedup-refresh pattern: per ingest batch the md5-heavy
    signature pipeline runs over ΔT (the old corpus contributes its
    STORED band index — here recomputed from the snapshot because the
    fixture has no stored index, but the candidate join never pairs
    old-with-old), and Jaccard verification fetches shingles via
    semi-join only for touched docs. Output ≡ full-corpus LSH pairs
    restricted to pairs with ≥1 new doc — which is exactly what the
    oracle checks.
    """
    from ..plans import DeltaCatalog

    cat = DeltaCatalog(spark, sf_dir)
    # Pin both band relations: the plan references bands_new three times
    # and bands_all twice (bucket gate + candidate join), and each
    # reference would otherwise rerun the md5-minhash pipeline over its
    # scan. In production bands_all IS the stored index table; the
    # persist stands in for that here. Skinny rows (band key + doc_id),
    # so the pinned footprint is small even at corpus scale.
    bands_new = _shared(_band_rows(_shingled_df(cat.delta("documents"))))
    bands_old = _band_rows(_shingled_df(cat.snapshot("documents")))
    bands_all = _shared(bands_old.unionByName(bands_new))
    # The stored index maintains per-bucket membership counts; the same
    # [2, cap] gate as the batch path (degenerate-bucket guard).
    ok_buckets = (
        bands_all.groupBy("band")
        .count()
        .where(f"count BETWEEN 2 AND {_LSH_BUCKET_CAP}")
        .select("band")
    )
    cand = (
        bands_new.join(ok_buckets, "band")
        .selectExpr("band", "doc_id AS d_new")
        .join(bands_all.selectExpr("band", "doc_id AS d_any"), "band")
        .where("d_new != d_any")
        .selectExpr(
            "least(d_new, d_any) AS doc_a", "greatest(d_new, d_any) AS doc_b"
        )
        .distinct()
    )
    sh = _shared(_docs_shingled(spark, sf_dir))
    return _verified_pairs(cand, sh, 0.5)


# Oracle: the incremental refresh must emit exactly the full-corpus LSH
# pairs that involve at least one delta-batch document (doc_id % 9 = 0,
# the registered append split for `documents`).
ORACLE_DELTA_LSH = f"""
WITH {_SQL_BASE},
{_sql_lsh_pairs("shing", "m")}
SELECT doc_a, doc_b, jac FROM mpairs
WHERE doc_a % 9 = 0 OR doc_b % 9 = 0
"""


# ---------------------------------------------------------------------------
# 4. SimHash fingerprints — 128-bit, majority vote over token md5 nibbles
# ---------------------------------------------------------------------------


def _simhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) — the shared fingerprint pipeline."""
    toks = _docs_norm(spark, sf_dir).selectExpr(
        "doc_id", f"explode(array_distinct({text.words('norm')})) AS tok"
    )
    votes = toks.select(
        "doc_id", "tok", F.explode(F.expr("sequence(1, 32)")).alias("p")
    ).selectExpr("doc_id", "p", *dedup.simhash_vote_exprs())
    sums = votes.groupBy("doc_id", "p").agg(
        *[F.sum(f"v{b}").alias(f"s{b}") for b in range(4)]
    )
    nib = sums.selectExpr("doc_id", "p", f"{dedup.simhash_nibble_expr()} AS ch")
    return nib.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(p, ch))), x -> x.ch), '')"
        ).alias("simhash")
    )


def q_llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 128-bit SimHash (as 32 hex chars).

    Votes are (doc, position) partial aggregates — map-side combinable,
    linear in corpus size. ``llm_dedup_simhash_pairs`` bands these
    fingerprints into near-dup pairs; the fingerprint itself is the
    exactly-oracle-checkable part.
    """
    return _simhash_fp(spark, sf_dir)


# CTE chain ending in fp(doc_id, simhash) — shared by the fingerprint
# and pairs oracles.
_SQL_SIMHASH_FP = """toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(norm, ' '))) AS tok FROM norm
),
pos AS (SELECT doc_id, tok, unnest(generate_series(1, 32)) AS p FROM toks),
votes AS (
  SELECT doc_id, p,
         strpos('0123456789abcdef', substring(md5(tok), p, 1)) - 1 AS nibv
  FROM pos
),
sums AS (
  SELECT doc_id, p,
         sum(2 * ((nibv // 1) % 2) - 1) AS s0,
         sum(2 * ((nibv // 2) % 2) - 1) AS s1,
         sum(2 * ((nibv // 4) % 2) - 1) AS s2,
         sum(2 * ((nibv // 8) % 2) - 1) AS s3
  FROM votes GROUP BY 1, 2
),
nib AS (
  SELECT doc_id, p,
         substring('0123456789abcdef',
           (CASE WHEN s0 > 0 THEN 1 ELSE 0 END
            + CASE WHEN s1 > 0 THEN 2 ELSE 0 END
            + CASE WHEN s2 > 0 THEN 4 ELSE 0 END
            + CASE WHEN s3 > 0 THEN 8 ELSE 0 END) + 1, 1) AS ch
  FROM sums
),
fp AS (
  SELECT doc_id, string_agg(ch, '' ORDER BY p) AS simhash FROM nib GROUP BY doc_id
)"""

ORACLE_DEDUP_SIMHASH = f"""
WITH {_SQL_BASE},
{_SQL_SIMHASH_FP}
SELECT doc_id, simhash FROM fp
"""


# ---------------------------------------------------------------------------
# 4b. SimHash near-dup pairs — pigeonhole-banded, Hamming-verified
# ---------------------------------------------------------------------------

# 4 blocks × 32 bits: a pair within Hamming distance 3 (of 128) differs
# in at most 3 blocks, so it matches in ≥1 — banding is COMPLETE for
# the ≤3 threshold (pigeonhole), making this an exact operator with a
# sub-quadratic plan. The bucket cap mirrors the LSH paths' 100 TB
# guard; it never binds at oracle scale (max bucket ≈ 38 at sf0.01).
_SIMHASH_BLOCKS, _SIMHASH_MAX_DIST, _SIMHASH_BUCKET_CAP = 4, 3, 256


def _hamming128(a: str, b: str) -> str:
    nib = "instr('0123456789abcdef', substring({col}, i, 1)) - 1"
    return (
        f"aggregate(transform(sequence(1, 32), "
        f"i -> bit_count(({nib.format(col=a)}) ^ ({nib.format(col=b)}))), "
        f"0, (acc, x) -> acc + x)"
    )


def q_llm_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: fingerprints band into 4×32-bit blocks,
    block-equal docs become candidates (one shuffle on the block key,
    capped buckets), and exact 128-bit Hamming distance ≤ 3 verifies.

    Same sub-quadratic shape as the MinHash path but over fingerprints,
    so the verify join moves 32-char strings instead of shingle sets —
    the cheap second opinion a curation pipeline runs corpus-wide.
    """
    fp = _shared(_simhash_fp(spark, sf_dir))
    blocks = fp.selectExpr(
        "doc_id",
        f"explode(transform(sequence(0, {_SIMHASH_BLOCKS - 1}), "
        f"b -> concat(cast(b AS string), ':', substring(simhash, b * 8 + 1, 8)))) AS blk",
    )
    cand = (
        blocks.groupBy("blk")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("d"))
        .where((F.size("d") >= 2) & (F.size("d") <= _SIMHASH_BUCKET_CAP))
        .selectExpr(
            "explode(flatten(transform(d, (x, i) -> "
            "transform(slice(d, i + 2, size(d) - i - 1), "
            "y -> struct(x AS doc_a, y AS doc_b))))) AS pr"
        )
        .select("pr.doc_a", "pr.doc_b")
        .distinct()
    )
    return (
        cand.join(fp.selectExpr("doc_id AS doc_a", "simhash AS sh_a"), "doc_a")
        .join(fp.selectExpr("doc_id AS doc_b", "simhash AS sh_b"), "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            f"CAST({_hamming128('sh_a', 'sh_b')} AS BIGINT) AS hamming",
        )
        .where(f"hamming <= {_SIMHASH_MAX_DIST}")
    )


ORACLE_SIMHASH_PAIRS = f"""
WITH {_SQL_BASE},
{_SQL_SIMHASH_FP},
blocks AS (
  SELECT doc_id, cast(b AS varchar) || ':' || substring(simhash, b * 8 + 1, 8) AS blk
  FROM fp, generate_series(0, {_SIMHASH_BLOCKS - 1}) AS g(b)
),
bcnt AS (
  SELECT blk FROM blocks GROUP BY blk
  HAVING count(*) BETWEEN 2 AND {_SIMHASH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.doc_id < b.doc_id
  JOIN bcnt c ON c.blk = a.blk
),
ham AS (
  SELECT doc_a, doc_b,
         CAST(list_sum(list_transform(generate_series(1, 32),
           i -> bit_count(xor(
             strpos('0123456789abcdef', substring(fa.simhash, i, 1)) - 1,
             strpos('0123456789abcdef', substring(fb.simhash, i, 1)) - 1))))
           AS BIGINT) AS hamming
  FROM cand JOIN fp fa ON fa.doc_id = doc_a JOIN fp fb ON fb.doc_id = doc_b
)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= {_SIMHASH_MAX_DIST}
"""


# ---------------------------------------------------------------------------
# 5. Embedding cosine top-k (brute force — the correctness baseline)
# ---------------------------------------------------------------------------

_V = similarity.as_double_array("embedding")

# Hard ceiling on the broadcast/collected query batch. The batch is
# derived from the corpus (every 50th vector stands in for "the
# user's query set"), so WITHOUT a cap it grows linearly with the
# corpus and the driver collect/broadcast OOMs at 100×. A
# deterministic lowest-vec_id LIMIT makes the driver footprint
# O(cap × dim) at ANY corpus size: 4096 × 64 float64 ≈ 2 MB.
# tests/test_plan_audit.py pins the GlobalLimit into the plan.
_EMB_QUERY_CAP = 4096


def embedding_query_batch(wn: DataFrame) -> DataFrame:
    """The bounded query batch both top-k paths share: every 50th
    vector, lowest ``_EMB_QUERY_CAP`` vec_ids — deterministic and
    driver-safe by construction (TakeOrdered, never a full sort)."""
    return (
        wn.where("vec_id % 50 = 0")
        .orderBy("vec_id")
        .limit(_EMB_QUERY_CAP)
    )


def q_llm_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for every 50th vector (capped batch).

    The query set is broadcast; the corpus is scanned once with
    per-row JVM array math — no shuffle until the per-query top-k
    (TakeOrdered within window). Ranks use the ROUNDED similarity plus
    a vec_id tiebreak so both engines order identically.
    """
    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_V} AS v"
    )
    wn = emb.selectExpr("vec_id", "v", f"{similarity.norm('v')} AS nrm")
    q = embedding_query_batch(wn).selectExpr(
        "vec_id AS query_id", "v AS qv", "nrm AS qnrm"
    )
    scored = (
        wn.crossJoin(F.broadcast(q))
        .where("vec_id != query_id")
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            f"{round_portable(similarity.dot('qv', 'v') + ' / (qnrm * nrm)', 6)} AS cos_sim",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where("rnk <= 5")
    )


def q_llm_embedding_topk_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME exact top-k as ``llm_embedding_topk``, realized as the
    high-throughput Arrow path a 100 TB embedding store actually runs:
    the bounded query set (``embedding_query_batch`` — every 50th
    vector, hard-capped at ``_EMB_QUERY_CAP`` so the driver footprint
    is O(cap × dim) at any corpus size) is collected once and
    BROADCAST as a dense float64 matrix; each corpus Arrow batch is scored against ALL queries in
    one vectorized pass inside ``mapInPandas``; each batch emits only
    its LOCAL top-5 per query (a batch's global winners are
    necessarily within its local top-5), so the shuffle carries
    ≤ 5·|queries| rows per batch — never the n×q similarity matrix —
    and one final window pass takes the global top-5.

    Numeric parity: the dot/norm use an explicit per-dimension
    sequential accumulation (``acc += A[:, j] * q[j]``) — the same
    left-to-right double fold as the JVM ``aggregate`` expression —
    and the identical floor-based portable rounding, so this path and
    the expression path produce the same rows and share one oracle."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_V} AS v"
    )
    qrows = embedding_query_batch(emb).collect()
    # limit() guarantees this, but the bound is the whole point of the
    # derivation — assert it so a refactor that drops the cap fails
    # loudly instead of silently re-growing with the corpus.
    assert len(qrows) <= _EMB_QUERY_CAP, (
        f"query batch {len(qrows)} exceeds _EMB_QUERY_CAP "
        f"{_EMB_QUERY_CAP}"
    )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = np.array([r["v"] for r in qrows], dtype=np.float64)

    def seq_dot(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
        # (n, d) × (m, d) → (n, m), accumulated dim-by-dim so the
        # float64 op order matches aggregate()'s sequential fold.
        acc = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
        for j in range(a.shape[1]):
            acc += np.outer(a[:, j], b[:, j])
        return acc

    def seq_norm(a: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(a.shape[0], dtype=np.float64)
        for j in range(a.shape[1]):
            acc += a[:, j] * a[:, j]
        return np.sqrt(acc)

    qn = seq_norm(qm)
    bq = spark.sparkContext.broadcast((q_ids, qm, qn))

    def score(batches):
        ids_q, mat_q, nrm_q = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            corpus = np.array(list(pdf["v"]), dtype=np.float64)
            sims = seq_dot(corpus, mat_q) / np.outer(
                seq_norm(corpus), nrm_q
            )
            sims = np.floor(sims * 1e6 + 0.5) / 1e6
            out_q, out_n, out_s = [], [], []
            for qi in range(len(ids_q)):
                col = sims[:, qi]
                mask = ids != ids_q[qi]
                cand_idx = np.nonzero(mask)[0]
                # local top-5: sort by (-sim, neighbor_id)
                order = cand_idx[
                    np.lexsort((ids[cand_idx], -col[cand_idx]))
                ][:5]
                out_q.extend([ids_q[qi]] * len(order))
                out_n.extend(ids[order])
                out_s.extend(col[order])
            yield pd.DataFrame(
                {
                    "query_id": np.array(out_q, dtype=np.int64),
                    "neighbor_id": np.array(out_n, dtype=np.int64),
                    "cos_sim": np.array(out_s, dtype=np.float64),
                }
            )

    # Width scales with BOTH the cluster and the corpus — never a
    # fixed constant: single-file fixtures arrive as one input
    # partition (the GEMM would run on one core), while at real scale
    # the corpus's own partition count dominates and must be kept.
    width = max(
        spark.sparkContext.defaultParallelism,
        emb.rdd.getNumPartitions(),
    )
    cand = emb.repartition(width).mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where("rnk <= 5")
    )


def q_llm_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs — the dedup modality that catches
    single-character corruptions MinHash's shingle sets blur over:
    BLOCK by the normalized 24-char prefix (cheap equality blocking —
    near-identical docs share their opening; at 100 TB this is one
    shuffle on the block key with bucket-cap discipline like every
    other blocking stage), then pairs within a block keep
    levenshtein(a, b) ≤ 12 over the first 160 normalized chars (the
    DP cost is bounded by the clamp, not document length). Both
    engines ship the same classic DP levenshtein on identical inputs,
    so distances — and therefore the pair set — are integer-exact."""
    docs = load_table(spark, sf_dir, "documents")
    norm = text.norm_text("text")
    d = docs.selectExpr(
        "doc_id",
        f"substring({norm}, 1, 160) AS head",
        f"substring({norm}, 1, 24) AS block",
    )
    a = d.alias("a")
    b = d.alias("b")
    pairs = (
        a.join(b, F.col("a.block") == F.col("b.block"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.head"), F.col("b.head")).alias("dist"),
        )
        .where("dist <= 12")
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.col("dist").cast("bigint").alias("dist"),
    )


ORACLE_DEDUP_EDIT_DISTANCE = r"""
WITH d AS (
  SELECT doc_id,
         substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 160)
           AS head,
         substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 24)
           AS block
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 12
"""


def q_llm_dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup CHAIN, composed end to end from the stages
    this module already ships: banded MinHash-LSH candidate generation
    → EDIT-DISTANCE verification → connected-component clusters.

    SCALE.md documents edit-distance verification's production
    placement as post-LSH (the quadratic DP runs only on LSH's
    sub-quadratic candidate stream, never on blocking-stage pair
    volume); this query IS that architecture, executable and
    oracle-checked rather than prose. Stage economics at 100 TB:

    1. CANDIDATES — ``_lsh_candidates``: one shuffle on the band key,
       in-bucket expansion capped at ``_LSH_BUCKET_CAP``; candidate
       volume is LSH-bounded, never all-pairs.
    2. VERIFY — ``levenshtein`` over the 160-char normalized heads,
       keep ≤ 12: the DP cost is clamp-bounded per pair and the pair
       count is stage-1's, so total verify work is
       O(|candidates| · 160²) — the pattern's whole point.
    3. CLUSTER — min-label connected components over the verified
       edges (diameter-many join+agg rounds; edge volume is already
       verified-pairs-sized).

    Output matches llm_dedup_clusters' shape (doc_id, cluster_id,
    cluster_size); the oracle re-derives the identical chain with a
    recursive-CTE closure over DuckDB's levenshtein (integer-exact in
    both engines)."""
    sh = _shared(_docs_shingled(spark, sf_dir))
    cand = _lsh_candidates(sh)
    heads = _docs_norm(spark, sf_dir).selectExpr(
        "doc_id", "substring(norm, 1, 160) AS head"
    )
    edges = (
        cand.join(heads.selectExpr("doc_id AS doc_a", "head AS ha"), "doc_a")
        .join(heads.selectExpr("doc_id AS doc_b", "head AS hb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ha", "hb").alias("dist"),
        )
        .where("dist <= 12")
        .select("doc_a", "doc_b")
    )
    comp = graph.connected_components(edges, src="doc_a", dst="doc_b")
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
    )


ORACLE_DEDUP_LSH_VERIFIED = f"""
WITH RECURSIVE {_SQL_BASE},
{_sql_lsh_pairs("shing", "m")},
h AS (SELECT doc_id, substr(norm, 1, 160) AS head FROM norm),
vpairs AS (
  SELECT doc_a, doc_b
  FROM mcand
  JOIN h a ON a.doc_id = doc_a
  JOIN h b ON b.doc_id = doc_b
  WHERE levenshtein(a.head, b.head) <= 12
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM vpairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM vpairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
members AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM members
"""


# Line-level dedup (C4 / RefinedWeb / FineWeb boilerplate removal):
# a "line" here is a fixed _LINE_W-word window because the synthetic
# fixture text has no newlines — production splits on '\n' and the
# rest of the operator is UNCHANGED (hash lines, count distinct-doc
# frequency, strip lines past the threshold). _LINE_DF = the
# distinct-document frequency at which a line counts as boilerplate.
_LINE_W, _LINE_DF = 4, 3


def q_llm_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-level dedup — the third dedup granularity production
    pipelines run (document-level = exact/MinHash above; substring =
    winnowing; LINE = C4's three-sentence rule, RefinedWeb/FineWeb's
    newline-split line dedup for boilerplate like nav bars and cookie
    banners): split each document into lines, count each line's
    DISTINCT-document frequency corpus-wide, and strip every
    occurrence of lines appearing in ≥ ``_LINE_DF`` documents.

    Scale shape: one shuffle to build the line-frequency relation
    (map-side combine on the line hash), one hash equi join to mark
    occurrences (NO broadcast — at 100 TB the boilerplate set is
    corpus-proportional), then two map-side-combinable aggregations
    (per-doc, per-lang). Everything is BIGINT-exact; the returned
    per-language ledger pins removed/retained word mass and the exact
    set of touched documents via a checksum."""
    docs = load_table(spark, sf_dir, "documents")
    w_df = _norm_df(docs, ("lang",)).selectExpr(
        "doc_id", "lang", f"{text.words('norm')} AS w"
    )
    # boiler and marked both read this relation — deliberately NOT
    # persisted: the upstream is a cheap split+explode (no hashing),
    # and the exploded lines relation is LARGER than the raw text, so
    # two streamed corpus scans beat writing + re-reading the bigger
    # intermediate (contrast _shared on the md5-heavy shingle/DSIR
    # relations, where recompute is the expensive side)
    lines = w_df.selectExpr(
        "doc_id",
        "lang",
        f"explode(transform(sequence(0, CAST((size(w) - 1) / {_LINE_W} AS INT)), "
        f"i -> concat_ws(' ', slice(w, i * {_LINE_W} + 1, {_LINE_W})))) AS line",
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(f"nd >= {_LINE_DF}")
        .select("line", F.lit(1).alias("is_boiler"))
    )
    marked = lines.join(boiler, "line", "left").selectExpr(
        "doc_id",
        "lang",
        "CAST(size(split(line, ' ')) AS BIGINT) AS lw",
        "is_boiler",
    )
    per_doc = marked.groupBy("doc_id", "lang").agg(
        F.count("*").cast("bigint").alias("nl"),
        F.count("is_boiler").cast("bigint").alias("rm"),
        F.coalesce(F.sum(F.when(F.col("is_boiler").isNotNull(), F.col("lw"))), F.lit(0))
        .cast("bigint")
        .alias("rw"),
        F.coalesce(F.sum(F.when(F.col("is_boiler").isNull(), F.col("lw"))), F.lit(0))
        .cast("bigint")
        .alias("kw"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("nl").cast("bigint").alias("n_lines"),
        F.sum("rm").cast("bigint").alias("removed_lines"),
        F.sum("rw").cast("bigint").alias("removed_words"),
        F.sum("kw").cast("bigint").alias("retained_words"),
        F.sum(F.when(F.col("rm") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_touched"),
        F.coalesce(F.sum(F.when(F.col("rm") > 0, F.col("doc_id"))), F.lit(0))
        .cast("bigint")
        .alias("touched_checksum"),
    )


ORACLE_DEDUP_LINES = rf"""
WITH norm AS (
  SELECT doc_id, lang,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
           AS w
  FROM documents
),
lines AS (
  SELECT doc_id, lang,
         array_to_string(w[i * {_LINE_W} + 1 : i * {_LINE_W} + {_LINE_W}], ' ')
           AS line
  FROM norm, unnest(generate_series(0, (len(w) - 1) // {_LINE_W})) AS g(i)
),
boiler AS (
  SELECT line, 1 AS is_boiler FROM lines
  GROUP BY line HAVING count(DISTINCT doc_id) >= {_LINE_DF}
),
marked AS (
  SELECT l.doc_id, l.lang,
         CAST(len(string_split(l.line, ' ')) AS BIGINT) AS lw,
         b.is_boiler
  FROM lines l LEFT JOIN boiler b USING (line)
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(count(*) AS BIGINT) AS nl,
         CAST(count(is_boiler) AS BIGINT) AS rm,
         CAST(coalesce(sum(CASE WHEN is_boiler IS NOT NULL THEN lw END), 0)
              AS BIGINT) AS rw,
         CAST(coalesce(sum(CASE WHEN is_boiler IS NULL THEN lw END), 0)
              AS BIGINT) AS kw
  FROM marked GROUP BY doc_id, lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nl) AS BIGINT) AS n_lines,
       CAST(sum(rm) AS BIGINT) AS removed_lines,
       CAST(sum(rw) AS BIGINT) AS removed_words,
       CAST(sum(kw) AS BIGINT) AS retained_words,
       CAST(sum(CASE WHEN rm > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_touched,
       CAST(coalesce(sum(CASE WHEN rm > 0 THEN doc_id END), 0) AS BIGINT)
         AS touched_checksum
FROM per_doc GROUP BY lang
"""


def _line_presence(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Distinct (doc_id, line[, *carry]) PRESENCE rows of the fixed-
    window line splitter (see q_llm_dedup_lines) — the state unit the
    boilerplate threshold counts (a doc contributes a line once no
    matter how often it repeats it)."""
    return (
        _norm_df(docs, carry)
        .selectExpr("doc_id", f"{text.words('norm')} AS w", *carry)
        .selectExpr(
            "doc_id",
            f"explode(transform(sequence(0, CAST((size(w) - 1) / {_LINE_W} AS INT)), "
            f"i -> concat_ws(' ', slice(w, i * {_LINE_W} + 1, {_LINE_W})))) AS line",
            *carry,
        )
        .distinct()
    )


# Sliding-window chunking: context length C tokens, stride S < C (so
# consecutive chunks overlap by C - S tokens — the standard long-
# document split that PRECEDES sequence packing; llm_pack_sequences
# handles the complementary many-short-docs-into-one-context case).
_CHUNK_C, _CHUNK_S = 32, 24


def q_llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document CHUNKING with overlap: every document splits
    into context windows of ``_CHUNK_C`` tokens starting every
    ``_CHUNK_S`` tokens (trailing chunks shorter). Pure per-row array
    expressions — chunk starts are a ``sequence(0, n-1, S)``, chunk
    length is ``least(C, n - start)`` — so the operator is one
    map-side pass; the only shuffle is the per-language summary agg.

    The ledger pins the chunk STREAM exactly: chunk counts, total
    chunk tokens (> corpus tokens — the overlap mass is the point),
    short trailing chunks, and a (doc, chunk-index) checksum."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = (
        _norm_df(docs, ("lang",))
        .selectExpr("doc_id", "lang", f"{text.words('norm')} AS w")
        .selectExpr(
            "doc_id",
            "lang",
            "size(w) AS n",
            f"posexplode(sequence(0, size(w) - 1, {_CHUNK_S}))"
            " AS (chunk_idx, start)",
        )
        .selectExpr(
            "doc_id",
            "lang",
            "CAST(chunk_idx AS BIGINT) AS chunk_idx",
            f"CAST(least({_CHUNK_C}, n - start) AS BIGINT) AS n_tokens",
        )
    )
    return chunks.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("chunk_tokens"),
        F.sum(F.when(F.col("n_tokens") < _CHUNK_C, 1).otherwise(0))
        .cast("bigint")
        .alias("short_chunks"),
        F.sum(F.col("doc_id") + F.col("chunk_idx"))
        .cast("bigint")
        .alias("chunk_checksum"),
    )


ORACLE_CHUNK_OVERLAP = rf"""
WITH norm AS (
  SELECT doc_id, lang,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
           AS w
  FROM documents
),
chunks AS (
  SELECT doc_id, lang,
         CAST((start / {_CHUNK_S}) AS BIGINT) AS chunk_idx,
         CAST(least({_CHUNK_C}, len(w) - start) AS BIGINT) AS n_tokens
  FROM norm, unnest(generate_series(0, len(w) - 1, {_CHUNK_S})) AS g(start)
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
       CAST(sum(CASE WHEN n_tokens < {_CHUNK_C} THEN 1 ELSE 0 END) AS BIGINT)
         AS short_chunks,
       CAST(sum(doc_id + chunk_idx) AS BIGINT) AS chunk_checksum
FROM chunks GROUP BY lang
"""


# DSIR (Xie et al. 2023, arXiv:2302.03169): hashed n-gram importance
# resampling — the production data-SELECTION recipe (pick pretraining
# docs that look like a trusted target domain). _DSIR_B hashed-bigram
# feature buckets; the fixture's stand-in target domain is
# lang='en' AND source IN ('src0','src1').
_DSIR_B = 64
_DSIR_TARGET = "lang = 'en' AND source IN ('src0', 'src1')"


def q_llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: per-document log-likelihood ratio
    between a TARGET domain's hashed-bigram distribution and the raw
    corpus distribution; documents with weight > 0 look more like the
    target than like the average document and get selected.

    Engine-exactness: the per-bucket log ratio (add-1 smoothed) is
    quantized ONCE to a 1e-6-granular BIGINT on the
    ``_DSIR_B``-row synopsis; per-document weights are then INTEGER
    sums of those quantized ratios — order-independent, so both
    engines agree exactly (float sums would depend on aggregation
    order).

    Scale shape: featurization is per-row expression work (bigram →
    md5 bucket, the shared ``token_bucket`` helper); the two count
    passes map-side-combine onto ``_DSIR_B`` partials; the scoring
    join BROADCASTS the 64-row synopsis (bounded by construction, not
    by data); one groupBy(doc) + one groupBy(lang, source). No stage
    touches pairs — the whole recipe is corpus-linear."""
    docs = load_table(spark, sf_dir, "documents")
    w_df = _norm_df(docs, ("lang", "source")).selectExpr(
        "doc_id", "lang", "source", f"{text.words('norm')} AS w"
    )
    # four consumers read the featurized relation (raw counts, target
    # counts, totals, scoring) — _shared, or the bigram explode + md5
    # bucketing recomputes per reference (4 corpus scans)
    fb = _shared(
        w_df.selectExpr(
            "doc_id",
            "lang",
            "source",
            # guard: sequence(0, size-2) with size < 2 would DESCEND,
            # not empty (Spark asymmetry vs DuckDB) — explode(array())
            "explode(CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2), "
            "i -> concat(w[i], ' ', w[i + 1])) ELSE array() END) AS bg",
        ).withColumn("b", F.expr(text.token_bucket("bg", _DSIR_B)))
    )
    raw_c = fb.groupBy("b").agg(F.count("*").alias("cr"))
    tgt_c = (
        fb.where(_DSIR_TARGET)
        .groupBy("b")
        .agg(F.count("*").alias("ct"))
    )
    tots = fb.agg(
        F.count("*").alias("tr"),
        F.count(F.when(F.expr(_DSIR_TARGET), 1)).alias("tt"),
    )
    lr = (
        raw_c.join(tgt_c, "b", "left")
        .crossJoin(tots)  # 1-row agg frame: crossJoin-safe
        .selectExpr(
            "b",
            f"CAST(floor(ln(((coalesce(ct, 0) + 1) * CAST(1.0 AS DOUBLE)"
            f" / (tt + {_DSIR_B})) / ((cr + 1) * CAST(1.0 AS DOUBLE)"
            f" / (tr + {_DSIR_B}))) * 1e6 + 0.5) AS BIGINT) AS lrq",
        )
    )
    dw = (
        fb.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang", "source")
        .agg(F.sum("lrq").cast("bigint").alias("wt"))
    )
    return dw.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("wt").cast("bigint").alias("sum_weight"),
        F.sum(F.when(F.col("wt") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_selected"),
        F.coalesce(F.sum(F.when(F.col("wt") > 0, F.col("doc_id"))), F.lit(0))
        .cast("bigint")
        .alias("selected_checksum"),
    )


ORACLE_DSIR_WEIGHTS = rf"""
WITH norm AS (
  SELECT doc_id, lang, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
           AS w
  FROM documents
),
bg AS (
  SELECT doc_id, lang, source, w[i] || ' ' || w[i+1] AS bg
  FROM norm, unnest(generate_series(1, len(w) - 1)) AS g(i)
),
fb AS (SELECT doc_id, lang, source,
              ({{BUCKET}}) AS b
       FROM bg),
raw_c AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
tgt_c AS (SELECT b, count(*) AS ct FROM fb
          WHERE {_DSIR_TARGET} GROUP BY b),
tots AS (SELECT (SELECT count(*) FROM fb) AS tr,
                (SELECT count(*) FROM fb WHERE {_DSIR_TARGET}) AS tt),
lr AS (
  SELECT r.b,
         CAST(floor(ln(((coalesce(t.ct, 0) + 1) * 1.0 / (tots.tt + {_DSIR_B}))
                    / ((r.cr + 1) * 1.0 / (tots.tr + {_DSIR_B}))) * 1e6 + 0.5)
              AS BIGINT) AS lrq
  FROM raw_c r LEFT JOIN tgt_c t USING (b) CROSS JOIN tots
),
dw AS (
  SELECT fb.doc_id, fb.lang, fb.source, CAST(sum(lr.lrq) AS BIGINT) AS wt
  FROM fb JOIN lr USING (b) GROUP BY fb.doc_id, fb.lang, fb.source
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(wt) AS BIGINT) AS sum_weight,
       CAST(sum(CASE WHEN wt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(coalesce(sum(CASE WHEN wt > 0 THEN doc_id END), 0) AS BIGINT)
         AS selected_checksum
FROM dw GROUP BY lang, source
""".replace(
    "{BUCKET}", text.token_bucket_oracle("bg", _DSIR_B)
)


def build_inverted_index(
    docs: DataFrame,
    idx_path: str,
    n_buckets: int = text.TEXT_INDEX_BUCKETS,
) -> None:
    """BUILD half of the stored inverted index: tokenize once
    (normalize → split — pure JVM), distinct (token, doc_id) postings,
    written parquet PARTITIONED BY an ``n_buckets``-way md5 bucket of
    the token — every token's posting list lives in exactly one bucket
    directory. ``n_buckets`` is the build-time scale knob (derived
    from corpus size in production, like the LSH band/bucket
    parameters); 16 is the fixture default."""
    norm = text.norm_text("text")
    postings = (
        docs.selectExpr("doc_id", f"explode(split({norm}, ' ')) AS token")
        .where("length(token) >= 3")
        .distinct()
        .withColumn("bucket", F.expr(text.token_bucket("token", n_buckets)))
    )
    postings.repartition("bucket").write.partitionBy("bucket").parquet(
        idx_path
    )


def conjunctive_search(
    spark: SparkSession,
    idx_path: str,
    terms: list[str],
    n_buckets: int = text.TEXT_INDEX_BUCKETS,
) -> DataFrame:
    """SEARCH half: doc_ids containing ALL ``terms``. Opens ONLY the
    terms' bucket directories (the driver computes bucket ids from the
    terms alone — no scan; asserted via ``inputFiles``; at 100 TB the
    search reads posting lists, never the corpus). ``n_buckets`` must
    be the count the index was BUILT with — it is part of the on-disk
    layout, like a hash ring. Duplicate ``terms`` are deduped (AND of
    a repeated term is the term itself; countDistinct below could
    otherwise never reach the raw length)."""
    import os

    terms = sorted(set(terms))
    buckets = sorted({text.token_bucket_id(t, n_buckets) for t in terms})
    lists = (
        spark.read.option("basePath", idx_path)
        .parquet(*[os.path.join(idx_path, f"bucket={b}") for b in buckets])
        .where(F.col("token").isin(list(terms)))
    )
    opened = {
        f.rsplit("/bucket=", 1)[1].split("/")[0] for f in lists.inputFiles()
    }
    assert opened <= {str(b) for b in buckets}, (opened, buckets)
    return (
        lists.groupBy("doc_id")
        .agg(F.countDistinct("token").alias("nt"))
        .where(F.col("nt") == len(terms))
        .select("doc_id")
    )


def q_text_inverted_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored INVERTED INDEX + conjunctive (AND) text search — the
    posting-list pattern a corpus-scale search runs:

    1. BUILD: ``build_inverted_index`` (bucket-partitioned posting
       lists; bucket count is the build-time scale parameter — fixture
       16 here, corpus-derived in production).
    2. PLAN: the two highest-document-frequency terms (tie → token
       asc) are computed from the index — a bounded 2-row driver
       decision, standing in for the user's query terms.
    3. SEARCH: ``conjunctive_search`` — partition pruning opens ONLY
       the terms' bucket directories (``inputFiles``-asserted), AND
       semantics = group by doc having all terms, matched ids join
       back to documents for the result.

    The oracle rebuilds index + search relationally; a green row
    certifies tokenize → store → prune → intersect → join."""
    import os

    from .signed_queries import _cagg_state_dir

    docs = load_table(spark, sf_dir, "documents")
    idx_path = os.path.join(_cagg_state_dir(), "inverted_index")
    build_inverted_index(docs, idx_path)
    index = spark.read.parquet(idx_path)
    terms = [
        r["token"]
        for r in index.groupBy("token")
        .count()
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(2)
        .collect()
    ]
    hits = conjunctive_search(spark, idx_path, terms)
    return (
        docs.join(hits, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
    )


# -- BPE vocabulary training ------------------------------------------

_BPE_MERGES = 6


def q_llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE merge table over the corpus — the tokenizer-
    learning half of the pipeline (Sennrich et al. 2016): start from
    characters, repeatedly merge the most frequent adjacent symbol
    pair, emit the ranked merge list.

    Classic BPE trains on the WORD-FREQUENCY dictionary, not the
    corpus: one tokenize+count pass reduces the input to (word, cnt)
    — vocabulary-sized at any corpus scale (the 100 TB shape; this is
    why BPE training is tractable at all) — and every merge round is
    one pair-count shuffle + one expression-only rewrite over that
    synopsis. Words are spelled as space-joined character strings and
    a merge is ``replace(s, ' l r ', ' lr ')`` — both engines'
    ``replace`` substitutes left-to-right non-overlapping, which IS
    BPE's merge rule, so the whole procedure is engine-portable.
    Pair counts are integers and the argmax tie-breaks (count desc,
    pair asc), so the learned table is deterministic. The loop is
    FULLY relational — each round's argmax is a 1-row frame
    broadcast-crossJoined back (eagerly checkpointed: 1-row scalar
    frames and the vocab synopsis share lineage otherwise — the r12
    ambiguity trap); no merge text ever round-trips through driver
    literals. Rounds fixed at ``_BPE_MERGES`` = 6 (the fixture knob;
    production runs 30-50k rounds with the identical per-round
    plan)."""
    bests, _ = _bpe_rounds(spark, sf_dir)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out


def _bpe_rounds(
    spark: SparkSession, sf_dir: str, n_merges: int = _BPE_MERGES
) -> tuple[list[DataFrame], DataFrame]:
    """The BPE training loop: returns ([per-round 1-row merge frames
    (rank, lhs, rhs, pair_count)], the word synopsis (w, s, cnt) with
    ALL merges applied — the trained tokenizer's spelling of every
    corpus word, which ``q_llm_bpe_tokenize`` joins back to docs)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = text.norm_text("text")
    chars = "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
    cur = (
        docs.selectExpr(f"explode(split({norm}, ' ')) AS w")
        .where("length(w) >= 2")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .selectExpr(
            "w", f"concat(' ', array_join({chars}, ' '), ' ') AS s", "cnt"
        )
        .localCheckpoint(eager=True)
    )
    bests = []
    for r in range(1, n_merges + 1):
        pairs = (
            cur.selectExpr("split(trim(s), ' ') AS t", "cnt")
            .where("size(t) >= 2")
            .selectExpr(
                "explode(transform(sequence(1, size(t) - 1), "
                "i -> struct(element_at(t, i) AS lhs, "
                "element_at(t, i + 1) AS rhs))) AS p",
                "cnt",
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("cnt").cast("bigint").alias("pc"))
        )
        best = (
            pairs.orderBy(F.desc("pc"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        bests.append(
            best.selectExpr(
                f"CAST({r} AS INT) AS rank",
                "lhs",
                "rhs",
                "pc AS pair_count",
            )
        )
        cur = (
            cur.crossJoin(F.broadcast(best))
            .selectExpr(
                "w",
                "replace(s, concat(' ', lhs, ' ', rhs, ' '), "
                "concat(' ', lhs, rhs, ' ')) AS s",
                "cnt",
            )
            .localCheckpoint(eager=True)
        )
    return bests, cur


def q_llm_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the trained BPE tokenizer: per-language token-count and
    compression stats over the corpus — the other half of the
    tokenizer workflow (train on the word dictionary, tokenize by
    dictionary LOOKUP).

    The scale shape is the point: tokenizing 100 TB does NOT re-run
    the merge procedure per document — every distinct word's merged
    spelling is already in the trained synopsis, so application is
    one hash equi join of the corpus' words against the
    vocabulary-sized synopsis, then expression-only counting.
    Single-character words bypass the synopsis as 1 token (they have
    no pairs to merge). Output: per-language document count, BPE
    token count, character-baseline token count — the compression
    the merges bought."""
    _, vocab = _bpe_rounds(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    norm = text.norm_text("text")
    words = docs.selectExpr(
        "doc_id", "lang", f"explode(split({norm}, ' ')) AS w"
    ).where("length(w) >= 1")
    # plain equi join on the word: the synopsis is vocabulary-sized —
    # broadcastable at fixture scale but 10-100M rows on a web corpus,
    # so the hint is left to AQE rather than forced
    toks = words.join(vocab.select("w", "s"), "w", "left")
    per_word = toks.selectExpr(
        "lang",
        "doc_id",
        # synopsis words: merged token count; 1-char words: 1 token
        "CASE WHEN s IS NULL THEN 1 "
        "ELSE size(split(trim(s), ' ')) END AS n_tok",
        "length(w) AS n_chr",
    )
    return per_word.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("bpe_tokens"),
        F.sum("n_chr").cast("bigint").alias("char_tokens"),
    )


def _bpe_ctes(n_merges: int = _BPE_MERGES) -> str:
    """The shared DuckDB CTE chain: word-frequency synopsis → char
    spelling → ``n_merges`` unrolled (pair count → argmax → replace)
    rounds, the word key carried through so the tokenize oracle can
    join the trained spelling back to documents."""
    rounds = []
    for r in range(1, n_merges + 1):
        rounds.append(f"""p{r} AS (
  SELECT t[i] AS lhs, t[i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS pc
  FROM (SELECT string_split(trim(s), ' ') AS t, cnt FROM w{r - 1})
     , unnest(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
  GROUP BY 1, 2
),
b{r} AS (SELECT lhs, rhs, pc FROM p{r}
         ORDER BY pc DESC, lhs, rhs LIMIT 1),
w{r} AS (
  SELECT w, replace(s, ' ' || lhs || ' ' || rhs || ' ',
                 ' ' || lhs || rhs || ' ') AS s, cnt
  FROM w{r - 1} CROSS JOIN b{r}
)""")
    return rf"""wf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE length(w) >= 2 GROUP BY w
),
w0 AS (
  SELECT w, ' ' || array_to_string(
           list_transform(generate_series(1, length(w)),
                          i -> w[i]), ' ') || ' ' AS s,
         cnt
  FROM wf
),
{",".join(rounds)}"""


def _bpe_oracle(n_merges: int = _BPE_MERGES) -> str:
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS rank, lhs, rhs, pc AS pair_count "
        f"FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return f"""
WITH {_bpe_ctes(n_merges)}
{finals}
"""


ORACLE_BPE_TRAIN = _bpe_oracle()


ORACLE_BPE_TOKENIZE = rf"""
WITH {_bpe_ctes()},
doc_words AS (
  SELECT doc_id, lang, unnest(string_split(
    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
  FROM documents
)
SELECT lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s IS NULL THEN 1
                ELSE len(string_split(trim(s), ' ')) END) AS BIGINT)
         AS bpe_tokens,
       CAST(sum(length(w)) AS BIGINT) AS char_tokens
FROM doc_words LEFT JOIN w{_BPE_MERGES} USING (w)
WHERE length(w) >= 1
GROUP BY lang
"""


# -- BM25 ranked retrieval over stored posting lists -------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20
_BM25_NTERMS = 3


def _bm25_tf(docs: DataFrame) -> DataFrame:
    """(doc_id, token, tf) term-frequency postings — the BM25 unit of
    state (shared by the batch build and the signed maintainer)."""
    norm = text.norm_text("text")
    return (
        docs.selectExpr("doc_id", f"explode(split({norm}, ' ')) AS token")
        .where("length(token) >= 3")
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def build_bm25_index(
    docs: DataFrame,
    idx_path: str,
    n_buckets: int = text.TEXT_INDEX_BUCKETS,
) -> None:
    """BUILD half of the BM25 index: term-FREQUENCY postings
    (token, doc_id, tf) bucket-partitioned like the boolean index,
    plus a ``_docstats`` sidecar (doc_id, dl) derived by re-reading
    the written postings — the doc-length pass reads the index, never
    the corpus a second time."""
    tf = _bm25_tf(docs).withColumn(
        "bucket", F.expr(text.token_bucket("token", n_buckets))
    )
    tf.repartition("bucket").write.partitionBy("bucket").parquet(idx_path)
    spark = docs.sparkSession
    (
        spark.read.parquet(idx_path)
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("bigint").alias("dl"))
        .write.parquet(idx_path + "_docstats")
    )


def bm25_search(
    spark: SparkSession,
    idx_path: str,
    terms: list[str],
    k: int = _BM25_TOPK,
    n_buckets: int = text.TEXT_INDEX_BUCKETS,
) -> DataFrame:
    """SEARCH half: top-``k`` documents by BM25 over ``terms``
    (Robertson/Sparck-Jones, the Lucene-default variant:
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)),
    tf-norm = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))).

    Scale shape: opens ONLY the terms' bucket directories
    (``inputFiles``-asserted); df(t) comes from the opened posting
    lists themselves; corpus stats (N, avgdl) are a 1-row aggregate of
    the index-sized docstats sidecar, attached by broadcast; the
    final top-k is a distributed TakeOrdered, never a global sort.

    Determinism across engines: idf (the only transcendental) is
    quantized to 1e-6 BEFORE use, each term's score contribution is
    floored to integer MICROS, and per-doc totals are integer sums —
    order-independent, so Spark and the SQL oracle rank identically;
    ties break on doc_id."""
    import os

    terms = sorted(set(terms))
    buckets = sorted({text.token_bucket_id(t, n_buckets) for t in terms})
    lists = (
        spark.read.option("basePath", idx_path)
        .parquet(*[os.path.join(idx_path, f"bucket={b}") for b in buckets])
        .where(F.col("token").isin(list(terms)))
        .select("token", "doc_id", "tf")
    )
    opened = {
        f.rsplit("/bucket=", 1)[1].split("/")[0] for f in lists.inputFiles()
    }
    assert opened <= {str(b) for b in buckets}, (opened, buckets)
    stats = spark.read.parquet(idx_path + "_docstats")
    return _bm25_rank(lists, stats, k)


def _bm25_rank(lists: DataFrame, stats: DataFrame, k: int) -> DataFrame:
    """BM25 scoring tail over candidate postings ``lists`` =
    (token, doc_id, tf) already filtered to the query terms, and
    ``stats`` = (doc_id, dl). Shared by the stored-index search and
    the signed maintainer (which feeds it the MAINTAINED relations)."""
    corpus = stats.agg(
        F.count("*").cast("bigint").alias("n_docs_total"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    dfreq = lists.groupBy("token").agg(
        F.count("*").cast("bigint").alias("df")
    )
    idf = (
        "ln(1.0 + (CAST(n_docs_total - df AS DOUBLE) + 0.5) / "
        "(CAST(df AS DOUBLE) + 0.5))"
    )
    contrib = (
        lists.join(F.broadcast(dfreq), "token")
        .join(stats, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .selectExpr(
            "doc_id",
            f"CAST(floor(({text.round_portable(idf, 6)}) * "
            f"CAST(tf AS DOUBLE) * {_BM25_K1 + 1.0} / "
            f"(CAST(tf AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B} + "
            f"{_BM25_B} * CAST(dl AS DOUBLE) / avgdl)) * 1e6 + 0.5) "
            "AS BIGINT) AS s_micros",
        )
    )
    top = (
        contrib.groupBy("doc_id")
        .agg(F.sum("s_micros").cast("bigint").alias("s_micros"))
        .orderBy(F.desc("s_micros"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("s_micros"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "doc_id",
        (F.col("s_micros").cast("double") / F.lit(1e6)).alias("score"),
    )


def q_llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored BM25 index + ranked retrieval — the scoring sibling of
    the boolean ``text_inverted_index_search``:

    1. BUILD: ``build_bm25_index`` (tf postings, bucket-partitioned;
       doc-length sidecar computed FROM the index).
    2. PLAN: the three highest-df terms (tie → token asc) stand in
       for the user query — a bounded 3-row driver decision.
    3. SEARCH: ``bm25_search`` — partition-pruned posting reads,
       integer-micros scoring, distributed top-20.

    The oracle rebuilds tf/df/dl/avgdl relationally and replays the
    same quantized formula; a green row certifies tokenize → store →
    prune → score → rank end to end."""
    import os

    from .signed_queries import _cagg_state_dir

    docs = load_table(spark, sf_dir, "documents")
    idx_path = os.path.join(_cagg_state_dir(), "bm25_index")
    build_bm25_index(docs, idx_path)
    index = spark.read.parquet(idx_path)
    terms = [
        r["token"]
        for r in index.groupBy("token")
        .count()
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(_BM25_NTERMS)
        .collect()
    ]
    return bm25_search(spark, idx_path, terms)


def _bm25_oracle(src: str = "documents") -> str:
    """The BM25 oracle parameterized on the documents source, so the
    signed maintainer can point the SAME relational replay at the
    post-CDC state."""
    return rf"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM {src}
),
tok AS (
  SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE length(token) >= 3 GROUP BY doc_id, token
),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
corpus AS (
  SELECT count(*) AS n_docs_total,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
terms AS (SELECT token FROM dfreq ORDER BY df DESC, token
          LIMIT {_BM25_NTERMS}),
contrib AS (
  SELECT tf.doc_id,
         CAST(floor(
           (CAST(floor(ln(1.0 + (CAST(c.n_docs_total - d.df AS DOUBLE)
                                 + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
                       * 1e6 + 0.5) AS DOUBLE) / 1e6)
           * CAST(tf.tf AS DOUBLE) * {_BM25_K1 + 1.0}
           / (CAST(tf.tf AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * CAST(dl.dl AS DOUBLE) / c.avgdl))
           * 1e6 + 0.5) AS BIGINT) AS s_micros
  FROM tf
  JOIN terms USING (token)
  JOIN dfreq d USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus c
),
scored AS (
  SELECT doc_id, CAST(sum(s_micros) AS BIGINT) AS s_micros
  FROM contrib GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY s_micros DESC, doc_id) AS INT)
         AS rank,
       doc_id,
       CAST(s_micros AS DOUBLE) / 1e6 AS score
FROM scored
QUALIFY rank <= {_BM25_TOPK}
"""


ORACLE_BM25_SEARCH = _bm25_oracle()


def build_phrase_index(
    docs: DataFrame,
    idx_path: str,
    n_buckets: int = text.TEXT_INDEX_BUCKETS,
) -> None:
    """BUILD half of the positional phrase index: (token, doc_id, pos)
    postings with ORIGINAL 1-based sequence positions (short tokens
    filtered AFTER posexplode so positions stay original), written
    parquet bucket-partitioned by the parameterized token bucket."""
    norm = text.norm_text("text")
    postings = (
        docs.selectExpr("doc_id", f"split({norm}, ' ') AS w")
        .selectExpr("doc_id", "posexplode(w) AS (pos0, token)")
        .selectExpr("doc_id", "token", "CAST(pos0 + 1 AS BIGINT) AS pos")
        .where("length(token) >= 3")
        .withColumn("bucket", F.expr(text.token_bucket("token", n_buckets)))
    )
    postings.repartition("bucket").write.partitionBy("bucket").parquet(
        idx_path
    )


def phrase_search(
    spark: SparkSession,
    idx_path: str,
    t1: str,
    t2: str,
    n_buckets: int = text.TEXT_INDEX_BUCKETS,
) -> DataFrame:
    """SEARCH half: distinct doc_ids containing the exact phrase
    ``t1 t2``. Opens ONLY the two terms' bucket directories
    (``inputFiles``-asserted); adjacency is a posting-list self-join
    on (doc_id, pos₂ = pos₁ + 1). ``n_buckets`` must match the
    build."""
    import os

    buckets = sorted(
        {text.token_bucket_id(t, n_buckets) for t in (t1, t2)}
    )
    lists = (
        spark.read.option("basePath", idx_path)
        .parquet(*[os.path.join(idx_path, f"bucket={b}") for b in buckets])
        .where(F.col("token").isin([t1, t2]))
    )
    opened = {
        f.rsplit("/bucket=", 1)[1].split("/")[0] for f in lists.inputFiles()
    }
    assert opened <= {str(b) for b in buckets}, (opened, buckets)
    a = lists.where(F.col("token") == t1).select("doc_id", "pos")
    b = lists.where(F.col("token") == t2).selectExpr(
        "doc_id", "pos AS pos2"
    )
    return (
        a.join(b, ["doc_id"])
        .where("pos2 = pos + 1")
        .select("doc_id")
        .distinct()
    )


def q_text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL inverted index + exact PHRASE search — the other
    half of corpus-scale text search (conjunctive AND is
    q_text_inverted_index_search; phrases additionally need token
    POSITIONS so adjacency is checkable from posting lists alone):

    1. BUILD: ``build_phrase_index`` — ``posexplode`` keeps each
       token's ORIGINAL sequence position (filtering short tokens
       afterwards, so positions stay original); postings (token,
       doc_id, pos) are written parquet bucket-partitioned like the
       conjunctive index (same parameterized bucket count).
    2. PLAN: the query phrase is the corpus' most frequent adjacent
       bigram whose words both index (tie → bigram asc) — a bounded
       1-row driver decision standing in for the user's phrase.
    3. SEARCH: ``phrase_search`` — ONLY the two terms' bucket
       directories are opened (inputFiles-asserted); the phrase match
       is a posting-list self-join on (doc_id, pos₂ = pos₁ + 1) — at
       100 TB this reads two posting lists and joins them on doc_id,
       never the corpus — then matched docs join back to documents
       for the summary.

    The oracle rebuilds positional postings + phrase match
    relationally (DuckDB lacks WITH ORDINALITY; positions come from
    generate_series indexing, the engine-portable idiom)."""
    import os

    from .signed_queries import _cagg_state_dir

    docs = load_table(spark, sf_dir, "documents")
    norm = text.norm_text("text")
    words = docs.selectExpr("doc_id", f"split({norm}, ' ') AS w")
    idx_path = os.path.join(_cagg_state_dir(), "phrase_index")
    build_phrase_index(docs, idx_path)
    # the query phrase: top adjacent bigram over indexable words
    top = (
        words.where("size(w) >= 2")
        .selectExpr(
            "explode(transform(sequence(0, size(w) - 2), "
            "i -> concat(w[i], ' ', w[i + 1]))) AS bg"
        )
        .where(
            "length(split(bg, ' ')[0]) >= 3 "
            "AND length(split(bg, ' ')[1]) >= 3"
        )
        .groupBy("bg")
        .count()
        .orderBy(F.desc("count"), F.asc("bg"))
        .limit(1)
        .collect()
    )
    t1, t2 = top[0]["bg"].split(" ")
    hits = phrase_search(spark, idx_path, t1, t2)
    return (
        docs.join(hits, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
    )


ORACLE_TEXT_PHRASE_SEARCH = r"""
WITH norm AS (
  SELECT doc_id, string_split(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, w[i] AS token, CAST(i AS BIGINT) AS pos
  FROM norm, unnest(generate_series(1, len(w))) AS g(i)
  WHERE length(w[i]) >= 3
),
bi AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                i -> w[i] || ' ' || w[i + 1])) AS bg
  FROM norm
),
top AS (
  SELECT bg FROM bi
  WHERE length(string_split(bg, ' ')[1]) >= 3
    AND length(string_split(bg, ' ')[2]) >= 3
  GROUP BY bg ORDER BY count(*) DESC, bg LIMIT 1
),
hits AS (
  SELECT DISTINCT a.doc_id
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  CROSS JOIN top
  WHERE a.token = string_split(top.bg, ' ')[1]
    AND b.token = string_split(top.bg, ' ')[2]
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(d.n_chars) AS BIGINT) AS chars
FROM documents d JOIN hits h ON d.doc_id = h.doc_id
GROUP BY d.lang
"""


ORACLE_TEXT_INVERTED_INDEX = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm
),
tok3 AS (SELECT * FROM tok WHERE length(token) >= 3),
df AS (SELECT token, count(*) AS n FROM tok3 GROUP BY token),
terms AS (SELECT token FROM df ORDER BY n DESC, token LIMIT 2),
hits AS (
  SELECT doc_id FROM tok3 WHERE token IN (SELECT token FROM terms)
  GROUP BY doc_id HAVING count(DISTINCT token) = (SELECT count(*) FROM terms)
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(d.n_chars) AS BIGINT) AS chars
FROM documents d JOIN hits h ON d.doc_id = h.doc_id
GROUP BY d.lang
"""


ORACLE_EMBEDDING_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
      WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         CAST(floor((list_dot_product(qv, v) / (qnrm * nrm)) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS cos_sim
  FROM n CROSS JOIN q WHERE n.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
"""


def q_llm_embedding_filtered_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Metadata-FILTERED vector search — the vector-store feature the
    unfiltered top-k family lacks: top-5 cosine neighbors per query
    among ONLY the documents passing a metadata predicate (here
    ``lang = 'en'``, joined from the documents table on the shared id
    space). Pre-filter semantics (filter THEN rank), not post-filter:
    a query's 5 rows are the best ENGLISH neighbors, never fewer rows
    because non-English ones were discarded after ranking.

    Scale shape: the predicate prunes the corpus BEFORE any scoring
    (broadcast semi join against the metadata selection — with the
    corpus partitioned on the filter column this is partition
    pruning), the bounded query batch broadcasts as usual, and the
    scan cost is O(|passing docs| · |queries|) instead of
    O(corpus · queries) + discard."""
    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_V} AS v"
    )
    docs_en = (
        load_table(spark, sf_dir, "documents")
        .where("lang = 'en'")
        .selectExpr("doc_id AS vec_id")
    )
    wn = emb.selectExpr("vec_id", "v", f"{similarity.norm('v')} AS nrm")
    q = embedding_query_batch(wn).selectExpr(
        "vec_id AS query_id", "v AS qv", "nrm AS qnrm"
    )
    # the filter is NOT applied to the query batch — a non-English
    # query may still retrieve English neighbors (the serving shape)
    passing = wn.join(docs_en, "vec_id", "left_semi")
    scored = (
        passing.crossJoin(F.broadcast(q))
        .where("vec_id != query_id")
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            f"{round_portable(similarity.dot('qv', 'v') + ' / (qnrm * nrm)', 6)}"
            " AS cos_sim",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where("rnk <= 5")
    )


ORACLE_EMBEDDING_FILTERED_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
      WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT {_EMB_QUERY_CAP}),
pass AS (
  SELECT n.* FROM n JOIN documents d ON d.doc_id = n.vec_id
  WHERE d.lang = 'en'
),
scored AS (
  SELECT q.query_id, pass.vec_id AS neighbor_id,
         CAST(floor((list_dot_product(qv, v) / (qnrm * nrm)) * 1e6 + 0.5)
              AS DOUBLE) / 1e6 AS cos_sim
  FROM pass CROSS JOIN q WHERE pass.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id)
              AS BIGINT) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: dense + lexical legs fused by Reciprocal Rank Fusion
# ---------------------------------------------------------------------------

_RRF_K = 60       # the standard RRF damping constant (Cormack/Clarke/Buettcher)
_RRF_LEG_K = 20   # per-leg candidate depth
_RRF_TOPK = 10    # fused results per query


def q_llm_hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the RAG-serving shape: a DENSE leg (exact
    cosine top-20 per query over the embedding store) and a LEXICAL
    leg (word-3-gram Jaccard top-20 via a shingle-index join) fused by
    Reciprocal Rank Fusion: rrf(d) = Σ_legs 1/(60 + rank_leg(d)),
    fused top-10 per query.

    Scale shape: the query batch is the bounded ``% 50 = 0`` /
    lowest-id-capped set both top-k families use (driver footprint
    O(cap × dim)); the dense leg is one corpus scan against the
    broadcast batch; the lexical leg joins on the SHINGLE key (only
    docs sharing a shingle with some query are touched — never
    query × corpus); each leg emits ≤ 20 rows/query, so the fusion
    join is O(queries · 40) regardless of corpus size.

    Determinism across engines: each leg's similarity is quantized to
    1e-6 before ranking (ties → doc_id asc), and the RRF contribution
    is floored to integer MICROS — per-doc fusion is a BIGINT sum, so
    Spark and DuckDB rank identically."""
    # dense leg — shares the query-batch derivation and quantized
    # cosine of q_llm_embedding_topk
    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_V} AS v"
    )
    wn = emb.selectExpr("vec_id", "v", f"{similarity.norm('v')} AS nrm")
    q = embedding_query_batch(wn).selectExpr(
        "vec_id AS query_id", "v AS qv", "nrm AS qnrm"
    )
    dense = (
        wn.crossJoin(F.broadcast(q))
        .where("vec_id != query_id")
        .selectExpr(
            "query_id",
            "vec_id AS doc_id",
            f"{round_portable(similarity.dot('qv', 'v') + ' / (qnrm * nrm)', 6)}"
            " AS cos_sim",
        )
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("doc_id")
    )
    dense_r = (
        dense.withColumn("r_dense", F.row_number().over(wd))
        .where(f"r_dense <= {_RRF_LEG_K}")
        .selectExpr("query_id", "doc_id", "CAST(r_dense AS BIGINT) AS r_dense")
    )
    # lexical leg — shingle-index join: candidates are docs sharing at
    # least one 3-gram with a query doc (inter >= 1 → jaccard > 0)
    sh = _shared(_docs_shingled(spark, sf_dir))
    sizes = sh.selectExpr("doc_id", "CAST(size(sh) AS BIGINT) AS n_sh")
    ex = sh.select("doc_id", F.explode("sh").alias("shingle"))
    qsh = (
        sh.where("doc_id % 50 = 0")
        .orderBy("doc_id")
        .limit(_EMB_QUERY_CAP)
        .selectExpr("doc_id AS query_id", "CAST(size(sh) AS BIGINT) AS n_q")
    )
    qex = ex.join(
        F.broadcast(qsh.select("query_id")),
        ex.doc_id == F.col("query_id"),
    ).select("query_id", "shingle")
    inter = (
        qex.join(ex, "shingle")
        .where("doc_id != query_id")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    lex = (
        inter.join(F.broadcast(qsh), "query_id")
        .join(sizes, "doc_id")
        .selectExpr(
            "query_id",
            "doc_id",
            f"{round_portable('CAST(inter AS DOUBLE) / CAST(n_q + n_sh - inter AS DOUBLE)', 6)}"
            " AS jac",
        )
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("jac"), F.asc("doc_id"))
    lex_r = (
        lex.withColumn("r_lex", F.row_number().over(wl))
        .where(f"r_lex <= {_RRF_LEG_K}")
        .selectExpr("query_id", "doc_id", "CAST(r_lex AS BIGINT) AS r_lex")
    )
    # fusion — integer-micros RRF, then fused top-k
    micros = "CAST(floor(1e6 / ({k} + {r}) + 0.5) AS BIGINT)"
    fused = dense_r.join(
        lex_r, ["query_id", "doc_id"], "full_outer"
    ).selectExpr(
        "query_id",
        "doc_id",
        "(CASE WHEN r_dense IS NULL THEN CAST(0 AS BIGINT) ELSE "
        + micros.format(k=_RRF_K, r="r_dense")
        + " END + CASE WHEN r_lex IS NULL THEN CAST(0 AS BIGINT) ELSE "
        + micros.format(k=_RRF_K, r="r_lex")
        + " END) AS rrf_micros",
        "r_dense",
        "r_lex",
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micros"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rrf_rank", F.row_number().over(wf).cast("bigint"))
        .where(f"rrf_rank <= {_RRF_TOPK}")
        .selectExpr(
            "query_id",
            "doc_id",
            "CAST(rrf_micros AS DOUBLE) / 1e6 AS rrf",
            "rrf_rank",
            "r_dense",
            "r_lex",
        )
    )


ORACLE_HYBRID_RRF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
nv AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nv
      WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT {_EMB_QUERY_CAP}),
dense AS (
  SELECT q.query_id, nv.vec_id AS doc_id,
         CAST(floor((list_dot_product(qv, v) / (qnrm * nrm)) * 1e6 + 0.5)
              AS DOUBLE) / 1e6 AS cos_sim
  FROM nv CROSS JOIN q WHERE nv.vec_id != q.query_id
),
dr AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, doc_id)
              AS BIGINT) AS r_dense
  FROM dense QUALIFY r_dense <= {_RRF_LEG_K}
),
{_SQL_BASE},
qsh AS (SELECT doc_id AS query_id, sh AS qs, len(sh) AS n_q FROM shing
        WHERE doc_id % 50 = 0 ORDER BY doc_id LIMIT {_EMB_QUERY_CAP}),
lex0 AS (
  SELECT q.query_id, s.doc_id,
         len(list_intersect(q.qs, s.sh)) AS inter,
         q.n_q + len(s.sh) AS tot
  FROM qsh q JOIN shing s ON s.doc_id != q.query_id
),
lex AS (
  SELECT query_id, doc_id,
         CAST(floor((CAST(inter AS DOUBLE) / CAST(tot - inter AS DOUBLE))
                    * 1e6 + 0.5) AS DOUBLE) / 1e6 AS jac
  FROM lex0 WHERE inter > 0
),
lr AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY jac DESC, doc_id)
              AS BIGINT) AS r_lex
  FROM lex QUALIFY r_lex <= {_RRF_LEG_K}
),
fused AS (
  SELECT coalesce(dr.query_id, lr.query_id) AS query_id,
         coalesce(dr.doc_id, lr.doc_id) AS doc_id,
         dr.r_dense, lr.r_lex,
         (CASE WHEN dr.r_dense IS NULL THEN CAST(0 AS BIGINT)
               ELSE CAST(floor(1e6 / ({_RRF_K} + dr.r_dense) + 0.5)
                         AS BIGINT) END
          + CASE WHEN lr.r_lex IS NULL THEN CAST(0 AS BIGINT)
                 ELSE CAST(floor(1e6 / ({_RRF_K} + lr.r_lex) + 0.5)
                           AS BIGINT) END) AS rrf_micros
  FROM dr FULL JOIN lr
    ON dr.query_id = lr.query_id AND dr.doc_id = lr.doc_id
)
SELECT query_id, doc_id, CAST(rrf_micros AS DOUBLE) / 1e6 AS rrf,
       rrf_rank, r_dense, r_lex
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY rrf_micros DESC, doc_id)
                 AS BIGINT) AS rrf_rank
  FROM fused
) WHERE rrf_rank <= {_RRF_TOPK}
"""


# ---------------------------------------------------------------------------
# 6. Hyperplane-LSH bucketed ANN (the sub-quadratic scale path)
# ---------------------------------------------------------------------------

_PLANES = similarity.hyperplanes(n_planes=8, dim=64)


def q_llm_embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate neighbor pairs from sign-pattern LSH buckets.

    One projection pass assigns each vector an 8-bit bucket (literal
    md5-derived hyperplane matrix — identical in the oracle); then an
    equi-join on the bucket key yields candidates with their exact
    cosine. Corpus×corpus ANN without an all-pairs join.
    """
    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_V} AS v"
    )
    b = emb.selectExpr(
        "vec_id",
        "v",
        f"{similarity.norm('v')} AS nrm",
        f"{similarity.bucket_expr_spark('v', _PLANES)} AS bucket",
    )
    return (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .selectExpr(
            "a.bucket AS bucket",
            "a.vec_id AS vec_a",
            "b.vec_id AS vec_b",
            f"{round_portable(similarity.dot('a.v', 'b.v') + ' / (a.nrm * b.nrm)', 6)} AS cos_sim",
        )
    )


ORACLE_EMBEDDING_ANN = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         {similarity.bucket_expr_duckdb('v', _PLANES)} AS bucket
  FROM e
)
SELECT a.bucket AS bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(floor((list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS cos_sim
FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
"""


# ---------------------------------------------------------------------------
# 6a. IVF (inverted-file) ANN — coarse-quantizer cells, probe-limited scan
# ---------------------------------------------------------------------------

_IVF_CELLS, _IVF_PROBE, _IVF_K = 16, 4, 5


def q_llm_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: cluster the corpus into 16 Voronoi cells (deterministic
    seeds, one quantized-mean Lloyd step), then answer every 50th
    vector's top-5 cosine neighbors scanning only the 4 nearest cells.

    The scale path past brute force: search cost drops from |corpus| to
    ~|corpus|·n_probe/n_cells per query, the centroid table is tiny and
    broadcast, and the cell id is the partition key of the stored index
    — a probe reads only its cells' files. The whole build is
    bitwise-reproducible (seeded, integer-quantized centroid sums), so
    this approximate index is checked by an EXACT DuckDB oracle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    indexed, cents = similarity.ivf_index(
        emb, id_col="vec_id", vec_col="embedding", n_cells=_IVF_CELLS,
        persist=_shared,
    )
    q = emb.where("vec_id % 50 = 0")
    res = similarity.ivf_search(
        indexed, cents, q,
        id_col="vec_id", vec_col="embedding", k=_IVF_K, n_probe=_IVF_PROBE,
    )
    return res.selectExpr(
        "q_id",
        "vec_id AS neighbor_id",
        f"{round_portable('sim', 6)} AS cos_sim",
        "CAST(rank AS BIGINT) AS rnk",
    )


_IVF_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

# Shared WITH-clause prefix of the two IVF oracles (plain and
# metadata-filtered): full-corpus index build (seeded assignment →
# quantized centroid means → final cell assignment) + query batch +
# probed cells. The two oracles differ ONLY in their `cand` CTE — the
# filtered one adds the metadata join and self-exclusion — so the
# centroid/probe recipe lives in exactly one place and cannot
# silently diverge between them (r16 ADVICE item).
_SQL_IVF_INDEX_CTES = f"""v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
seeds AS (
  SELECT CAST(vec_id AS INT) AS cell, v AS c FROM v
  WHERE vec_id IN (SELECT vec_id FROM v ORDER BY vec_id LIMIT {_IVF_CELLS})
),
a1 AS (
  SELECT vec_id, v, cell FROM (
    SELECT v.vec_id, v.v, s.cell,
           {_IVF_COS.format(a='v.v', b='s.c')} AS sim
    FROM v CROSS JOIN seeds s
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell DESC) = 1
),
ex AS (SELECT cell, unnest(v) AS x, unnest(generate_series(1, len(v))) AS d FROM a1),
cm AS (
  SELECT cell, d,
         CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
           / (1e6 * count(*)) AS m
  FROM ex GROUP BY cell, d
),
cents AS (SELECT cell, list(m ORDER BY d) AS c FROM cm GROUP BY cell),
idx AS (
  SELECT vec_id, v, cell FROM (
    SELECT v.vec_id, v.v, ct.cell,
           {_IVF_COS.format(a='v.v', b='ct.c')} AS sim
    FROM v CROSS JOIN cents ct
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell DESC) = 1
),
q AS (SELECT vec_id AS q_id, v AS q FROM v WHERE vec_id % 50 = 0),
probe AS (
  SELECT q_id, q, cell FROM (
    SELECT q_id, q, cell,
           row_number() OVER (PARTITION BY q_id ORDER BY csim DESC, cell) AS pr
    FROM (
      SELECT qq.q_id, qq.q, ct.cell,
             {_IVF_COS.format(a='qq.q', b='ct.c')} AS csim
      FROM q qq CROSS JOIN cents ct
    )
  ) WHERE pr <= {_IVF_PROBE}
)"""

# Shared ranked top-k tail: micro-rounded cosine, rank tie-broken on
# neighbor id — consumed by both oracles over their own `cand`.
_SQL_IVF_RANKED_SELECT = f"""SELECT q_id, neighbor_id, cos_sim, rnk FROM (
  SELECT q_id, vec_id AS neighbor_id,
         CAST(floor(sim * 1e6 + 0.5) AS DOUBLE) / 1e6 AS cos_sim,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
              AS BIGINT) AS rnk
  FROM cand
) WHERE rnk <= {_IVF_K}"""

ORACLE_EMBEDDING_IVF = f"""
WITH {_SQL_IVF_INDEX_CTES},
cand AS (
  SELECT p.q_id, i.vec_id,
         {_IVF_COS.format(a='p.q', b='i.v')} AS sim
  FROM probe p JOIN idx i ON p.cell = i.cell
)
{_SQL_IVF_RANKED_SELECT}
"""


# ---------------------------------------------------------------------------
# 6a¹. Metadata-filtered IVF — the production vector-store composition
# ---------------------------------------------------------------------------


def q_llm_embedding_filtered_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered IVF search — the production vector-store
    shape: q_llm_embedding_filtered_topk's PRE-filter semantics
    composed with q_llm_embedding_ivf's probe pruning. The IVF index
    (centroids + cell assignment) is built over the FULL corpus — the
    index is shared across requests while filters vary per request —
    and each query's top-5 cosine neighbors are ranked among ONLY the
    documents passing the metadata predicate (``lang = 'en'``) WITHIN
    its 4 probed cells. Pre-filter semantics per cell: the predicate
    prunes candidates BEFORE any pair scoring (left-semi against the
    metadata selection inside the probed-cell equi join), so a query
    gets the 5 best passing neighbors its probes can see — never
    fewer rows because non-passing ones were discarded after ranking.
    Self-matches are excluded before ranking (the serving shape).

    Scale shape: two independent prunes multiply — the probe reads
    ~n_probe/n_cells of the corpus (partition pruning when the stored
    index is partitioned by cell id) and the predicate semi-join
    prunes the survivors before the dot-product fold, so the scan is
    O(|passing ∩ probed cells| · |queries|). The approximation is the
    same honest one IVF always makes (recall bounded by the probes);
    the filter never changes which cells are probed, only which
    candidates inside them are scored."""
    emb = load_table(spark, sf_dir, "embeddings")
    indexed, cents = similarity.ivf_index(
        emb, id_col="vec_id", vec_col="embedding", n_cells=_IVF_CELLS,
        persist=_shared,
    )
    passing_ids = (
        load_table(spark, sf_dir, "documents")
        .where("lang = 'en'")
        .selectExpr("doc_id AS vec_id")
    )
    passing = indexed.join(passing_ids, "vec_id", "left_semi")
    q = emb.where("vec_id % 50 = 0")
    res = similarity.ivf_search(
        passing, cents, q,
        id_col="vec_id", vec_col="embedding", k=_IVF_K, n_probe=_IVF_PROBE,
        exclude_id_match=True,
    )
    return res.selectExpr(
        "q_id",
        "vec_id AS neighbor_id",
        f"{round_portable('sim', 6)} AS cos_sim",
        "CAST(rank AS BIGINT) AS rnk",
    )


ORACLE_EMBEDDING_FILTERED_IVF = f"""
WITH {_SQL_IVF_INDEX_CTES},
cand AS (
  SELECT p.q_id, i.vec_id,
         {_IVF_COS.format(a='p.q', b='i.v')} AS sim
  FROM probe p
  JOIN idx i ON p.cell = i.cell
  JOIN documents d ON d.doc_id = i.vec_id AND d.lang = 'en'
  WHERE i.vec_id != p.q_id
)
{_SQL_IVF_RANKED_SELECT}
"""


# ---------------------------------------------------------------------------
# 6a². Product quantization (PQ) + ADC scan — compressed ANN
# ---------------------------------------------------------------------------

# FAISS-style IVF-PQ's compression half: split each 64-dim vector into
# M=4 subspaces of 16 dims, k-means a K=8 codebook per subspace (the
# repo's seeded quantized-Lloyd recipe, so the build is bitwise
# reproducible), encode every vector as 4 small code ids, and answer
# queries by Asymmetric Distance Computation — per-query lookup
# tables of (subspace, code) → partial d2, summed in fixed order.
_PQ_M, _PQ_SUBDIM, _PQ_K, _PQ_TOPK = 4, 16, 8, 5


def q_llm_embedding_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN with ADC scoring: every 50th vector queries
    the code table for its top-5 approximate-L2 neighbors.

    Scale economics — why PQ is THE memory lever at 100 TB: the
    stored index is M small ints per vector (here 4 bytes vs 512 — a
    128× compression), codebooks are M·K subvectors (broadcast
    literals), and a query never touches raw corpus vectors — each
    ADC lookup table is K·M doubles per query, attached by broadcast
    equi joins on the code id, and the scan is one pass over the code
    table with a per-query top-k window. Composes with IVF
    (q_llm_embedding_ivf) as IVF-PQ: cells prune the scan, codes
    compress it.

    Determinism: codebooks use the seeded integer-quantized Lloyd
    recipe shared with the k-means family; ADC sums M=4 doubles in
    fixed textual order; ranks tie-break on neighbor_id — so this
    approximate index is checked by an EXACT DuckDB oracle."""
    from .curation import _km_assign, _km_centroids, _km_d2

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.selectExpr(
        "vec_id", f"{similarity.as_double_array('embedding')} AS v"
    )
    q = v.where("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "v AS qv"
    )
    # eager localCheckpoints: the four code/LUT frames descend
    # from the same base relation and meet again in equi joins
    # below — fresh attribute ids keep those joins unambiguous
    # (the r12 same-lineage trap); each frame is corpus-ID- or
    # query-count-sized, never vector-payload-sized. The four
    # subspace chains are independent, so they materialize as
    # CONCURRENT jobs (guide §2.6) instead of four serial ones —
    # the fold below combines them in fixed m order.
    def _subspace(m: int):
        s = m * _PQ_SUBDIM + 1
        sub = v.selectExpr(
            "vec_id", f"slice(v, {s}, {_PQ_SUBDIM}) AS v"
        )
        cb = _shared(_km_centroids(sub, _PQ_K))  # K rows, broadcast
        cm = (
            _km_assign(sub, cb)
            .selectExpr("vec_id", f"cell AS code_{m}")
            .localCheckpoint(eager=True)
        )
        lut = (
            q.selectExpr(
                "query_id", f"slice(qv, {s}, {_PQ_SUBDIM}) AS qs"
            )
            .crossJoin(F.broadcast(cb))
            .selectExpr(
                "query_id",
                f"cell AS code_{m}",
                f"{_km_d2('qs', 'c')} AS d2_{m}",
            )
            .localCheckpoint(eager=True)
        )
        return cm, lut

    halves = _co_materialize(
        *[lambda m=m: _subspace(m) for m in range(_PQ_M)]
    )
    codes = None
    luts = []
    for cm, lut in halves:
        codes = cm if codes is None else codes.join(cm, "vec_id")
        luts.append(lut)
    adc = codes
    for m, lut in enumerate(luts):
        keys = [f"code_{m}"] if m == 0 else ["query_id", f"code_{m}"]
        adc = adc.join(F.broadcast(lut), keys)
    ad2 = " + ".join(f"d2_{m}" for m in range(_PQ_M))
    res = adc.where("vec_id != query_id").selectExpr(
        "query_id", "vec_id AS neighbor_id", f"({ad2}) AS ad2"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("ad2"), F.asc("neighbor_id")
    )
    return (
        res.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(f"rnk <= {_PQ_TOPK}")
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"{round_portable('ad2', 6)} AS ad2",
            "rnk",
        )
    )


def _oracle_embedding_pq() -> str:
    d2 = (
        "list_dot_product({v}, {v}) - 2 * list_dot_product({v}, {c})"
        " + list_dot_product({c}, {c})"
    )
    blocks = []
    for m in range(_PQ_M):
        s = m * _PQ_SUBDIM + 1
        e = s + _PQ_SUBDIM - 1
        blocks.append(f"""v{m} AS (SELECT vec_id, v[{s}:{e}] AS v FROM vv),
seeds{m} AS (
  SELECT CAST(vec_id AS INT) AS cell, v AS c FROM v{m}
  WHERE vec_id < {_PQ_K}
),
a1_{m} AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell, {d2.format(v="v", c="c")} AS d2
    FROM v{m} CROSS JOIN seeds{m}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1
),
ex{m} AS (
  SELECT cell, unnest(v) AS x, unnest(generate_series(1, len(v))) AS d
  FROM a1_{m}
),
cq{m} AS (
  SELECT cell, d,
         CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
           / (1e6 * count(*)) AS m
  FROM ex{m} GROUP BY cell, d
),
cents{m} AS (SELECT cell, list(m ORDER BY d) AS c FROM cq{m} GROUP BY cell),
code{m} AS (
  SELECT vec_id, cell AS code FROM (
    SELECT vec_id, cell, {d2.format(v="v", c="c")} AS d2
    FROM v{m} CROSS JOIN cents{m}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1
),
lut{m} AS (
  SELECT q.vec_id AS query_id, ct.cell AS code,
         {d2.format(v="q.qs", c="ct.c")} AS d2
  FROM (SELECT vec_id, v[{s}:{e}] AS qs FROM vv WHERE vec_id % 50 = 0) q
  CROSS JOIN cents{m} ct
)""")
    joined = "\n".join(
        f"  JOIN code{m} c{m} USING (vec_id)" for m in range(1, _PQ_M)
    )
    lut_joins = "\n".join(
        f"  JOIN lut{m} l{m} ON l{m}.query_id = l0.query_id "
        f"AND l{m}.code = c{m}.code"
        for m in range(1, _PQ_M)
    )
    ad2 = " + ".join(f"l{m}.d2" for m in range(_PQ_M))
    return f"""
WITH vv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{",".join(blocks)},
adc AS (
  SELECT c0.vec_id, l0.query_id, {ad2} AS ad2
  FROM code0 c0
{joined}
  JOIN lut0 l0 ON l0.code = c0.code
{lut_joins}
  WHERE c0.vec_id != l0.query_id
)
SELECT query_id, neighbor_id, ad2_r AS ad2, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT query_id, vec_id AS neighbor_id,
         CAST(floor(ad2 * 1e6 + 0.5) AS DOUBLE) / 1e6 AS ad2_r,
         row_number() OVER (PARTITION BY query_id ORDER BY ad2, vec_id)
           AS rnk
  FROM adc
) WHERE rnk <= {_PQ_TOPK}
"""


ORACLE_EMBEDDING_PQ = _oracle_embedding_pq()


def q_llm_embedding_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed — the full FAISS-style ANN index shape: IVF
    cells PRUNE the scan (each query reads only its ``_IVF_PROBE`` of
    ``_IVF_CELLS`` Voronoi cells), PQ codes COMPRESS it (the pruned
    scan reads M=4 small code ids per vector and never touches raw
    corpus vectors; scoring is per-query ADC lookup tables attached by
    broadcast equi joins). Divergence from FAISS kept deliberate and
    documented: codes quantize RAW vectors, not per-cell residuals —
    that keeps the two stages independently testable, the composition
    associative, and the whole build expressible as an EXACT DuckDB
    oracle (both stages reuse the seeded integer-quantized Lloyd
    recipe; ranks tie-break on neighbor_id).

    At 100 TB this is the ANN configuration that actually ships: the
    code table is partitioned by cell (probe = partition pruning), a
    query's cost is n_probe/n_cells of the corpus in 1-byte-per-
    subspace reads, and both the centroid table and the codebooks are
    broadcast literals."""
    from .curation import _km_assign, _km_centroids, _km_d2

    emb = load_table(spark, sf_dir, "embeddings")
    indexed, cents = similarity.ivf_index(
        emb, id_col="vec_id", vec_col="embedding", n_cells=_IVF_CELLS,
        persist=_shared,
    )
    v = emb.selectExpr(
        "vec_id", f"{similarity.as_double_array('embedding')} AS v"
    )
    q = v.where("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "v AS qv", f"{similarity.norm('v')} AS nq"
    )
    # probe: each query's _IVF_PROBE nearest cells by centroid cosine
    # (the same rule ivf_search applies — broadcast centroid table,
    # row_number window per query)
    cell_sim = f"{similarity.dot('qv', 'c')} / ((nq) * (nrm))"
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("_csim"), "cell"
    )

    def _probe():
        return (
            q.join(F.broadcast(cents))
            .selectExpr("query_id", "qv", "cell", f"{cell_sim} AS _csim")
            .withColumn("_pr", F.row_number().over(probe_w))
            .where(F.col("_pr") <= _IVF_PROBE)
            .select("query_id", "cell")
            .localCheckpoint(eager=True)
        )

    # PQ codes + per-query LUTs, exactly as q_llm_embedding_pq_adc —
    # and, as there, the probe + four subspace chains are independent,
    # so all five materialize as CONCURRENT jobs (guide §2.6)
    def _subspace(m: int):
        s = m * _PQ_SUBDIM + 1
        sub = v.selectExpr(
            "vec_id", f"slice(v, {s}, {_PQ_SUBDIM}) AS v"
        )
        cb = _shared(_km_centroids(sub, _PQ_K))
        cm = (
            _km_assign(sub, cb)
            .selectExpr("vec_id", f"cell AS code_{m}")
            .localCheckpoint(eager=True)
        )
        lut = (
            q.selectExpr(
                "query_id", f"slice(qv, {s}, {_PQ_SUBDIM}) AS qs"
            )
            .crossJoin(F.broadcast(cb))
            .selectExpr(
                "query_id",
                f"cell AS code_{m}",
                f"{_km_d2('qs', 'c')} AS d2_{m}",
            )
            .localCheckpoint(eager=True)
        )
        return cm, lut

    probe, *halves = _co_materialize(
        _probe, *[lambda m=m: _subspace(m) for m in range(_PQ_M)]
    )
    codes = None
    luts = []
    for cm, lut in halves:
        codes = cm if codes is None else codes.join(cm, "vec_id")
        luts.append(lut)
    # the PRUNED candidate set: probed cells only — this is the join
    # IVF contributes; everything downstream reads codes, not vectors
    cand = probe.join(
        indexed.selectExpr("vec_id", "cell"), "cell"
    ).select("query_id", "vec_id")
    adc = cand.join(codes, "vec_id")
    for m, lut in enumerate(luts):
        adc = adc.join(F.broadcast(lut), ["query_id", f"code_{m}"])
    ad2 = " + ".join(f"d2_{m}" for m in range(_PQ_M))
    res = adc.where("vec_id != query_id").selectExpr(
        "query_id", "vec_id AS neighbor_id", f"({ad2}) AS ad2"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("ad2"), F.asc("neighbor_id")
    )
    return (
        res.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(f"rnk <= {_PQ_TOPK}")
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"{round_portable('ad2', 6)} AS ad2",
            "rnk",
        )
    )


def _oracle_embedding_ivf_pq() -> str:
    """IVF probe CTEs (cosine Lloyd) + PQ code/LUT CTEs (d2 Lloyd per
    subspace), composed: candidates come from probed cells only, ADC
    scores them."""
    d2 = (
        "list_dot_product({v}, {v}) - 2 * list_dot_product({v}, {c})"
        " + list_dot_product({c}, {c})"
    )
    pq_blocks = []
    for m in range(_PQ_M):
        s = m * _PQ_SUBDIM + 1
        e = s + _PQ_SUBDIM - 1
        pq_blocks.append(f"""v{m} AS (SELECT vec_id, v[{s}:{e}] AS v FROM vv),
seeds{m} AS (
  SELECT CAST(vec_id AS INT) AS cell, v AS c FROM v{m}
  WHERE vec_id < {_PQ_K}
),
a1_{m} AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell, {d2.format(v="v", c="c")} AS d2
    FROM v{m} CROSS JOIN seeds{m}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1
),
ex{m} AS (
  SELECT cell, unnest(v) AS x, unnest(generate_series(1, len(v))) AS d
  FROM a1_{m}
),
cq{m} AS (
  SELECT cell, d,
         CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
           / (1e6 * count(*)) AS m
  FROM ex{m} GROUP BY cell, d
),
cents{m} AS (SELECT cell, list(m ORDER BY d) AS c FROM cq{m} GROUP BY cell),
code{m} AS (
  SELECT vec_id, cell AS code FROM (
    SELECT vec_id, cell, {d2.format(v="v", c="c")} AS d2
    FROM v{m} CROSS JOIN cents{m}
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1
),
lut{m} AS (
  SELECT q.vec_id AS query_id, ct.cell AS code,
         {d2.format(v="q.qs", c="ct.c")} AS d2
  FROM (SELECT vec_id, v[{s}:{e}] AS qs FROM vv WHERE vec_id % 50 = 0) q
  CROSS JOIN cents{m} ct
)""")
    code_joins = "\n".join(
        f"  JOIN code{m} c{m} USING (vec_id)" for m in range(1, _PQ_M)
    )
    lut_joins = "\n".join(
        f"  JOIN lut{m} l{m} ON l{m}.query_id = l0.query_id "
        f"AND l{m}.code = c{m}.code"
        for m in range(1, _PQ_M)
    )
    ad2 = " + ".join(f"l{m}.d2" for m in range(_PQ_M))
    return f"""
WITH vv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
iseeds AS (
  SELECT CAST(vec_id AS INT) AS cell, v AS c FROM vv
  WHERE vec_id IN (SELECT vec_id FROM vv ORDER BY vec_id LIMIT {_IVF_CELLS})
),
ia1 AS (
  SELECT vec_id, v, cell FROM (
    SELECT vv.vec_id, vv.v, s.cell,
           {_IVF_COS.format(a='vv.v', b='s.c')} AS sim
    FROM vv CROSS JOIN iseeds s
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell DESC) = 1
),
iex AS (SELECT cell, unnest(v) AS x, unnest(generate_series(1, len(v))) AS d FROM ia1),
icm AS (
  SELECT cell, d,
         CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
           / (1e6 * count(*)) AS m
  FROM iex GROUP BY cell, d
),
icents AS (SELECT cell, list(m ORDER BY d) AS c FROM icm GROUP BY cell),
idx AS (
  SELECT vec_id, cell FROM (
    SELECT vv.vec_id, ct.cell,
           {_IVF_COS.format(a='vv.v', b='ct.c')} AS sim
    FROM vv CROSS JOIN icents ct
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell DESC) = 1
),
iq AS (SELECT vec_id AS query_id, v AS q FROM vv WHERE vec_id % 50 = 0),
probe AS (
  SELECT query_id, cell FROM (
    SELECT query_id, cell,
           row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cell) AS pr
    FROM (
      SELECT qq.query_id, ct.cell,
             {_IVF_COS.format(a='qq.q', b='ct.c')} AS csim
      FROM iq qq CROSS JOIN icents ct
    )
  ) WHERE pr <= {_IVF_PROBE}
),
{",".join(pq_blocks)},
cand AS (
  SELECT p.query_id, i.vec_id FROM probe p JOIN idx i ON p.cell = i.cell
),
adc AS (
  SELECT c0.vec_id, l0.query_id, {ad2} AS ad2
  FROM cand
  JOIN code0 c0 USING (vec_id)
{code_joins}
  JOIN lut0 l0 ON l0.query_id = cand.query_id AND l0.code = c0.code
{lut_joins}
  WHERE c0.vec_id != l0.query_id
)
SELECT query_id, neighbor_id, ad2_r AS ad2, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT query_id, vec_id AS neighbor_id,
         CAST(floor(ad2 * 1e6 + 0.5) AS DOUBLE) / 1e6 AS ad2_r,
         row_number() OVER (PARTITION BY query_id ORDER BY ad2, vec_id)
           AS rnk
  FROM adc
) WHERE rnk <= {_PQ_TOPK}
"""


ORACLE_EMBEDDING_IVF_PQ = _oracle_embedding_ivf_pq()


# ---------------------------------------------------------------------------
# 6b. Embedding-cosine near-dup — banded sign-LSH (OR-amplified)
# ---------------------------------------------------------------------------

# 16 hyperplanes split into 4 bands of 4 bits: a pair is a candidate if
# it collides in ANY band (OR-amplification) — recall at moderate
# cosine is far higher than one 8-bit bucket, cost stays sub-quadratic
# (16 buckets per band). The matrix is md5-derived, so the oracle
# embeds the identical literal planes.
_PLANES16 = similarity.hyperplanes(16, 64)
_N_EMB_BANDS, _EMB_BAND_BITS = 4, 4
_EMB_DUP_THRESHOLD = 0.4


def _emb_band_exprs_spark() -> list[str]:
    out = []
    for b in range(_N_EMB_BANDS):
        sub = _PLANES16[b * _EMB_BAND_BITS:(b + 1) * _EMB_BAND_BITS]
        out.append(f"concat('{b}:', {similarity.bucket_expr_spark('v', sub)})")
    return out


def q_llm_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded sign-LSH.

    Candidates collide in at least one of 4 sign-pattern bands; exact
    cosine (rounded identically on both sides) filters to >= 0.4 and
    the lower vec_id is the keeper. The fixture has no true duplicate
    vectors (max cosine ~0.51), so the threshold marks "near" rather
    than "dup" — same operator, same plan shape, non-vacuous oracle.
    """
    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_V} AS v"
    )
    bands = ", ".join(_emb_band_exprs_spark())
    # Pin the banded relation: both self-join sides and both verify
    # sides reference it, and each reference would otherwise recompute
    # the norm + 4 hyperplane sign-patterns from its own corpus scan
    # (4 scans of the widest column). In production this relation IS
    # the stored sign-LSH index table.
    n = _shared(
        emb.selectExpr(
            "vec_id",
            "v",
            f"{similarity.norm('v')} AS nrm",
            f"array({bands}) AS bands",
        )
    )
    x = n.selectExpr("vec_id", "v", "nrm", "explode(bands) AS band")
    cand = (
        x.alias("a")
        .join(
            x.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    side = n.select("vec_id", "v", "nrm")
    return (
        cand.join(side.selectExpr("vec_id AS vec_a", "v AS va", "nrm AS na"), "vec_a")
        .join(side.selectExpr("vec_id AS vec_b", "v AS vb", "nrm AS nb"), "vec_b")
        .selectExpr(
            "vec_a",
            "vec_b",
            f"{round_portable(similarity.dot('va', 'vb') + ' / (na * nb)', 6)} AS cos_sim",
        )
        .where(f"cos_sim >= {_EMB_DUP_THRESHOLD}")
        .selectExpr("vec_a", "vec_b", "cos_sim", "least(vec_a, vec_b) AS keep_vec_id")
    )


def _emb_band_exprs_duckdb() -> list[str]:
    out = []
    for b in range(_N_EMB_BANDS):
        sub = _PLANES16[b * _EMB_BAND_BITS:(b + 1) * _EMB_BAND_BITS]
        out.append(f"'{b}:' || ({similarity.bucket_expr_duckdb('v', sub)})")
    return out


ORACLE_DEDUP_EMBEDDING = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         [{", ".join("(" + x + ")" for x in _emb_band_exprs_duckdb())}] AS bands
  FROM e
),
x AS (SELECT vec_id, v, nrm, unnest(bands) AS band FROM n),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM x a JOIN x b ON a.band = b.band AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos_sim, least(vec_a, vec_b) AS keep_vec_id
FROM (
  SELECT vec_a, vec_b,
         CAST(floor((list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm)) * 1e6 + 0.5)
              AS DOUBLE) / 1e6 AS cos_sim
  FROM cand JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b
)
WHERE cos_sim >= {_EMB_DUP_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# 7-10. Text analysis
# ---------------------------------------------------------------------------


def q_llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token statistics — pure per-row array math."""
    return (
        _docs_norm(spark, sf_dir)
        .selectExpr("doc_id", f"{text.words('norm')} AS w")
        .selectExpr(
            "doc_id",
            "CAST(size(w) AS BIGINT) AS n_tokens",
            "CAST(size(array_distinct(w)) AS BIGINT) AS n_uniq",
            round_portable(
                "aggregate(w, CAST(0 AS BIGINT), (a, x) -> a + length(x))"
                " * CAST(1.0 AS DOUBLE) / size(w)", 4) + " AS avg_token_len",
            round_portable("size(array_distinct(w)) * CAST(1.0 AS DOUBLE) / size(w)", 4)
            + " AS ttr",
        )
    )


ORACLE_TEXT_STATS = f"""
WITH {_SQL_BASE}
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
       CAST(floor((list_sum(list_transform(w, x -> strlen(x))) * CAST(1.0 AS DOUBLE) / len(w))
            * 1e4 + 0.5) AS DOUBLE) / 1e4 AS avg_token_len,
       CAST(floor((len(list_distinct(w)) * CAST(1.0 AS DOUBLE) / len(w)) * 1e4 + 0.5) AS DOUBLE)
         / 1e4 AS ttr
FROM wrds
"""


def q_llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: length + lexical diversity + word length."""
    return (
        _docs_norm(spark, sf_dir)
        .selectExpr("doc_id", "n_chars", f"{text.words('norm')} AS w")
        .selectExpr(
            "doc_id",
            round_portable(
                "0.5 * least(CAST(1.0 AS DOUBLE), n_chars / CAST(400.0 AS DOUBLE))"
                " + 0.3 * (size(array_distinct(w)) * CAST(1.0 AS DOUBLE) / size(w))"
                " + 0.2 * least(CAST(1.0 AS DOUBLE), (aggregate(w, CAST(0 AS BIGINT),"
                " (a, x) -> a + length(x)) * CAST(1.0 AS DOUBLE) / size(w))"
                " / CAST(8.0 AS DOUBLE))", 4)
            + " AS quality_score",
        )
        .selectExpr(
            "doc_id",
            "quality_score",
            "CASE WHEN quality_score >= 0.6 THEN 'high' "
            "WHEN quality_score >= 0.45 THEN 'medium' ELSE 'low' END AS quality_band",
        )
    )


ORACLE_QUALITY = f"""
WITH {_SQL_BASE},
doc_n AS (SELECT doc_id, n_chars FROM documents),
score AS (
  SELECT w.doc_id,
         CAST(floor((0.5 * least(CAST(1.0 AS DOUBLE), d.n_chars / CAST(400.0 AS DOUBLE))
               + 0.3 * (len(list_distinct(w)) * CAST(1.0 AS DOUBLE) / len(w))
               + 0.2 * least(CAST(1.0 AS DOUBLE), (list_sum(list_transform(w, x -> strlen(x)))
                                   * CAST(1.0 AS DOUBLE) / len(w)) / CAST(8.0 AS DOUBLE)))
              * 1e4 + 0.5)
           AS DOUBLE) / 1e4 AS quality_score
  FROM wrds w JOIN doc_n d ON d.doc_id = w.doc_id
)
SELECT doc_id, quality_score,
       CASE WHEN quality_score >= 0.6 THEN 'high'
            WHEN quality_score >= 0.45 THEN 'medium' ELSE 'low' END AS quality_band
FROM score
"""



def q_llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-voting language-ID heuristic (deterministic argmax)."""
    return (
        _docs_norm(spark, sf_dir)
        .selectExpr("doc_id", f"{text.words('norm')} AS w")
        .selectExpr(
            "doc_id",
            f"CAST(size(filter(w, x -> x IN {_EN})) AS BIGINT) AS en_hits",
            f"CAST(size(filter(w, x -> x IN {_DE})) AS BIGINT) AS de_hits",
            f"CAST(size(filter(w, x -> x IN {_ES})) AS BIGINT) AS es_hits",
        )
        .selectExpr(
            "doc_id",
            "en_hits",
            "de_hits",
            "es_hits",
            "CASE WHEN en_hits >= de_hits AND en_hits >= es_hits THEN "
            "  CASE WHEN en_hits > 0 THEN 'en' ELSE 'unknown' END "
            "WHEN de_hits >= es_hits THEN 'de' ELSE 'es' END AS predicted_lang",
        )
    )


ORACLE_LANG_ID = f"""
WITH {_SQL_BASE},
hits AS (
  SELECT doc_id,
         CAST(len(list_filter(w, x -> x IN {_EN})) AS BIGINT) AS en_hits,
         CAST(len(list_filter(w, x -> x IN {_DE})) AS BIGINT) AS de_hits,
         CAST(len(list_filter(w, x -> x IN {_ES})) AS BIGINT) AS es_hits
  FROM wrds
)
SELECT doc_id, en_hits, de_hits, es_hits,
       CASE WHEN en_hits >= de_hits AND en_hits >= es_hits THEN
         CASE WHEN en_hits > 0 THEN 'en' ELSE 'unknown' END
       WHEN de_hits >= es_hits THEN 'de' ELSE 'es' END AS predicted_lang
FROM hits
"""


def q_llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    return _docs_norm(spark, sf_dir).selectExpr(
        "doc_id",
        f"CAST(size({text.words('norm')}) AS BIGINT) AS n_ws_tokens",
        f"CAST(size({text.bpe_tokens('norm')}) AS BIGINT) AS n_bpe_tokens",
        "CAST(length(norm) AS BIGINT) AS n_chars_norm",
    )


ORACLE_TOKEN_COUNT = f"""
WITH {_SQL_BASE}
SELECT doc_id,
       CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(norm, '{text.BPE_TOKEN_PATTERN}')) AS BIGINT)
         AS n_bpe_tokens,
       CAST(strlen(norm) AS BIGINT) AS n_chars_norm
FROM norm
"""


def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling char-8-gram min-hash fingerprints (winnowing-lite)."""
    shexpr = text.char_shingles("norm", 8)
    fps = [
        f"array_min(transform(csh, s -> md5(concat('{j}:', s)))) AS fp{j}"
        for j in range(4)
    ]
    return (
        _docs_norm(spark, sf_dir)
        .selectExpr("doc_id", f"{shexpr} AS csh")
        .selectExpr("doc_id", *fps)
    )


_FP_COLS = ",\n       ".join(
    f"list_aggregate(list_transform(csh, s -> md5('{j}:' || s)), 'min') AS fp{j}"
    for j in range(4)
)
ORACLE_FINGERPRINT = f"""
WITH {_SQL_BASE},
csh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, strlen(norm) - 7),
           i -> norm[i : i + 7])) AS csh
  FROM norm
)
SELECT doc_id,
       {_FP_COLS}
FROM csh
"""


# Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS
# fingerprinter): hash every word K-gram, then keep the minimum hash of
# each sliding window of W consecutive K-gram hashes. Guarantee: any
# shared word run of length >= K + W - 1 yields a shared fingerprint,
# so overlap detection is *local* (position-robust), unlike the global
# minima of llm_fingerprint or the whole-document signatures of
# MinHash. Fingerprinting is pure per-row array expressions (zero
# shuffle); the inverted index is one shuffle on the fingerprint with
# the same bucket-cap discipline as the LSH paths. The reference
# declines everything here (mod.rs:187); SURVEY §2.3 LLM row.
_WINNOW_K, _WINNOW_W = 4, 4
_WINNOW_BUCKET_CAP = 64
_WINNOW_MIN_SHARED = 2


def _winnow_fp(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, fp[, *carry]) winnowing-selected fingerprint rows —
    zero-shuffle per-row array expressions. ``carry`` columns (e.g. a
    sign weight) ride through so a mixed-sign change batch fingerprints
    in ONE pass rather than one filtered scan per sign."""
    K, W = _WINNOW_K, _WINNOW_W
    kg_parts = ", ' ', ".join(f"element_at(w, i + {k})" for k in range(1, K + 1))
    kg = (
        f"CASE WHEN size(w) >= {K} THEN transform(sequence(0, size(w) - {K}), "
        f"i -> md5(concat({kg_parts}))) ELSE array() END"
    )
    fps = (
        f"CASE WHEN size(kg) = 0 THEN array() "
        f"WHEN size(kg) < {W} THEN array(array_min(kg)) "
        f"ELSE array_distinct(transform(sequence(0, size(kg) - {W}), "
        f"j -> array_min(slice(kg, j + 1, {W})))) END"
    )
    return (
        _norm_df(docs, carry)
        .selectExpr("doc_id", f"{text.words('norm')} AS w", *carry)
        .selectExpr("doc_id", f"{kg} AS kg", *carry)
        .selectExpr("doc_id", f"explode({fps}) AS fp", *carry)
    )


def q_llm_dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap candidates: (doc_a, doc_b, number
    of shared selected fingerprints), pairs sharing >= 2."""
    fp = _winnow_fp(load_table(spark, sf_dir, "documents"))
    # One pair occurrence per shared fingerprint bucket (no distinct —
    # the occurrence count IS the shared-fingerprint count).
    return (
        fp.groupBy("fp")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("d"))
        .where((F.size("d") >= 2) & (F.size("d") <= _WINNOW_BUCKET_CAP))
        .selectExpr(
            "explode(flatten(transform(d, (x, i) -> "
            "transform(slice(d, i + 2, size(d) - i - 1), "
            "y -> struct(x AS doc_a, y AS doc_b))))) AS pr"
        )
        .groupBy("pr.doc_a", "pr.doc_b")
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= _WINNOW_MIN_SHARED)
    )


def q_delta_winnow_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE refresh of a maintained winnowing index: fingerprint ONLY
    the appended documents, join them against the full fingerprint
    index, emit overlap pairs that touch the delta batch.

    Same refresh discipline as the MinHash index
    (q_delta_lsh_maintenance): old-with-old pairs are never generated,
    the old corpus contributes its stored index (recomputed from the
    snapshot here because the fixture stores none), bucket membership
    is gated on FULL-index counts so the result is exactly the batch
    operator's pairs restricted to pairs with >= 1 new doc.
    """
    from ..plans import DeltaCatalog

    cat = DeltaCatalog(spark, sf_dir)
    fp_new = _shared(_winnow_fp(cat.delta("documents")))
    fp_all = _shared(
        _winnow_fp(cat.snapshot("documents")).unionByName(fp_new)
    )
    ok = (
        fp_all.groupBy("fp")
        .count()
        .where(f"count BETWEEN 2 AND {_WINNOW_BUCKET_CAP}")
        .select("fp")
    )
    # countDistinct collapses the symmetric duplicate a new-new pair
    # gets from appearing on both sides of the index join.
    return (
        fp_new.join(ok, "fp")
        .selectExpr("fp", "doc_id AS d_new")
        .join(fp_all.selectExpr("fp", "doc_id AS d_any"), "fp")
        .where("d_new != d_any")
        .selectExpr(
            "least(d_new, d_any) AS doc_a",
            "greatest(d_new, d_any) AS doc_b",
            "fp",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("fp").alias("shared_fps"))
        .where(F.col("shared_fps") >= _WINNOW_MIN_SHARED)
    )


# Shared CTE chain ending in wcand (one row per shared in-gate
# fingerprint per doc pair) — used by the batch and maintenance
# oracles. The k-gram concat is generated from _WINNOW_K (like the
# Spark side) so changing K can never desync oracle from operator.
_ORACLE_KGRAM = " || ' ' || ".join(
    "w[i]" if k == 0 else f"w[i+{k}]" for k in range(_WINNOW_K)
)
_SQL_WINNOW_CTES = f"""wkg AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {_WINNOW_K} THEN
           list_transform(generate_series(1, len(w) - {_WINNOW_K - 1}),
             i -> md5({_ORACLE_KGRAM}))
         ELSE CAST([] AS VARCHAR[]) END AS kg
  FROM wrds
),
wfp AS (
  SELECT doc_id, unnest(
    CASE WHEN len(kg) = 0 THEN CAST([] AS VARCHAR[])
         WHEN len(kg) < {_WINNOW_W} THEN [list_aggregate(kg, 'min')]
         ELSE list_distinct(list_transform(
                generate_series(1, len(kg) - {_WINNOW_W - 1}),
                j -> list_aggregate(kg[j : j + {_WINNOW_W - 1}], 'min'))) END
  ) AS fp
  FROM wkg
),
wbkt AS (
  SELECT fp FROM wfp GROUP BY fp
  HAVING count(*) BETWEEN 2 AND {_WINNOW_BUCKET_CAP}
),
wcand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM wfp a JOIN wfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
  JOIN wbkt c ON c.fp = a.fp
)"""

ORACLE_DEDUP_WINNOW = f"""
WITH {_SQL_BASE},
{_SQL_WINNOW_CTES}
SELECT doc_a, doc_b, count(*) AS shared_fps
FROM wcand GROUP BY doc_a, doc_b
HAVING count(*) >= {_WINNOW_MIN_SHARED}
"""

# The incremental refresh must emit exactly the batch winnow pairs
# that involve at least one delta-batch document (doc_id % 9 = 0, the
# registered append split for `documents`).
ORACLE_DELTA_WINNOW = f"""
WITH {_SQL_BASE},
{_SQL_WINNOW_CTES}
SELECT doc_a, doc_b, count(*) AS shared_fps
FROM wcand GROUP BY doc_a, doc_b
HAVING count(*) >= {_WINNOW_MIN_SHARED}
AND (doc_a % 9 = 0 OR doc_b % 9 = 0)
"""


# -- Duplicate-SPAN detection (exact-substring dedup, word-granular) --------
#
# The span-level member of the dedup family: every MAXIMAL run of
# >= _SPAN_K consecutive normalized words whose every _SPAN_K-word
# gram occurs at least twice in the corpus — total occurrences, so
# within-document repetition counts, exactly the removal criterion of
# the published exact-substring train-data dedup (any substring the
# corpus contains twice is duplicated text). Winnowing/MinHash FIND
# overlapping documents; this reports the precise word ranges a
# cleaner would cut: (doc_id, span_start, span_end) in 1-based word
# positions, plus the span width and its duplicated-gram count.
#
# Distributed shape: the gram-position stream is corpus-token-sized
# and is shuffled ONCE (the per-gram occurrence count is map-side
# combinable); duplicated positions come back from one equi join of
# that stream against the much smaller duplicated-gram table (AQE
# absorbs hot boilerplate grams — the join fans out positions, never
# pairs, so there is no quadratic blow-up to cap); maximal spans form
# per document with a gaps-and-islands window PARTITIONED BY doc_id —
# never a corpus-wide sort. All positions are integers → exact oracle.

_SPAN_K = 8


def _gram_positions(
    docs: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, i, g): md5 of the _SPAN_K-word gram starting at
    1-based word position i, one row per position of every doc with
    at least _SPAN_K words. ``carry`` threads extra columns through
    unchanged (the signed maintainer carries the CDC sign) — the
    tokenization stays single-sourced here, so the batch detector,
    the maintained dup-span state, and the oracle can never
    desynchronize."""
    return (
        _norm_df(docs, carry)
        .selectExpr("doc_id", f"{text.words('norm')} AS w", *carry)
        .where(f"size(w) >= {_SPAN_K}")
        .selectExpr(
            "doc_id",
            f"explode(transform(sequence(1, size(w) - {_SPAN_K - 1}), "
            "i -> struct(i AS i, "
            f"md5(concat_ws(' ', slice(w, i, {_SPAN_K}))) AS g))) AS z",
            *carry,
        )
        .select("doc_id", "z.i", "z.g", *carry)
    )


def _spans_from_positions(pos: DataFrame) -> DataFrame:
    """Gaps-and-islands over duplicated gram positions (doc_id, i):
    one row per maximal consecutive run, with the span's word range
    in 1-based positions. Window partitioned by document — per-doc
    work bounded by doc length, never a corpus-wide sort."""
    w = Window.partitionBy("doc_id").orderBy("i")
    # island key: consecutive duplicated gram positions share i - rn
    isl = pos.withColumn("k", F.col("i") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "k")
        .agg(
            F.min("i").cast("bigint").alias("span_start"),
            (F.max("i") + F.lit(_SPAN_K - 1)).cast("bigint").alias("span_end"),
            (F.max("i") - F.min("i") + F.lit(_SPAN_K))
            .cast("bigint")
            .alias("span_words"),
            F.count("*").cast("bigint").alias("n_dup_grams"),
        )
        .select("doc_id", "span_start", "span_end", "span_words", "n_dup_grams")
    )


def q_llm_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    gp = _shared(_gram_positions(load_table(spark, sf_dir, "documents")))
    dup = gp.groupBy("g").count().where("count >= 2").select("g")
    return _spans_from_positions(gp.join(dup, "g").select("doc_id", "i"))


# Shared CTE chain ending in spos (duplicated gram positions) — used by
# the batch oracle and the signed-maintenance oracle (which runs it
# over the post-change corpus subquery instead of the raw table).
def _substring_span_oracle(src: str = "documents") -> str:
    return f"""
WITH {_sql_base(src)},
gp AS (
  SELECT doc_id,
         unnest(generate_series(1, len(w) - {_SPAN_K - 1})) AS i,
         unnest(list_transform(generate_series(1, len(w) - {_SPAN_K - 1}),
           i -> md5(list_aggregate(w[i : i + {_SPAN_K - 1}],
                                   'string_agg', ' ')))) AS g
  FROM wrds WHERE len(w) >= {_SPAN_K}
),
dup AS (SELECT g FROM gp GROUP BY g HAVING count(*) >= 2),
spos AS (SELECT doc_id, i FROM gp JOIN dup USING (g)),
isl AS (
  SELECT doc_id, i,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS k
  FROM spos
)
SELECT doc_id,
       CAST(min(i) AS BIGINT) AS span_start,
       CAST(max(i) + {_SPAN_K - 1} AS BIGINT) AS span_end,
       CAST(max(i) - min(i) + {_SPAN_K} AS BIGINT) AS span_words,
       CAST(count(*) AS BIGINT) AS n_dup_grams
FROM isl GROUP BY doc_id, k
"""


ORACLE_DEDUP_SUBSTRING = _substring_span_oracle()


def q_llm_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT half of exact-substring dedup: remove every duplicated
    span (q_llm_dedup_substring's ranges) from every document and
    certify the cleaned corpus — (doc_id, kept_words, cut_words,
    clean_md5), where clean_md5 hashes the space-joined surviving
    words in document order (docs whose text is entirely duplicated
    keep 0 words and hash the empty string).

    Distributed shape: spans come from the same one-shuffle gram-count
    plan as the detector; the cut is a LEFT ANTI join of word
    positions against span ranges EQUI-KEYED on doc_id (the range
    predicate is doc-local, so the join is document-bounded — never a
    corpus-wide interval join); reassembly is a per-doc
    sort-by-position aggregate. All counts are integers and the hash
    is md5 on both engines → exact oracle."""
    docs = load_table(spark, sf_dir, "documents")
    gp = _shared(_gram_positions(docs))
    dup = gp.groupBy("g").count().where("count >= 2").select("g")
    spans = _spans_from_positions(gp.join(dup, "g").select("doc_id", "i"))
    words = _shared(
        _norm_df(docs)
        .selectExpr("doc_id", f"{text.words('norm')} AS w")
        .selectExpr("doc_id", "posexplode(w) AS (p0, word)")
        .selectExpr("doc_id", "CAST(p0 + 1 AS BIGINT) AS p", "word")
    )
    kept = words.join(
        spans,
        (words["doc_id"] == spans["doc_id"])
        & (words["p"] >= spans["span_start"])
        & (words["p"] <= spans["span_end"]),
        "left_anti",
    )
    clean = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("kept_words"),
        F.expr(
            "concat_ws(' ', transform(array_sort(collect_list("
            "struct(p, word))), s -> s.word))"
        ).alias("_clean"),
    )
    totals = words.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_words")
    )
    return totals.join(clean, "doc_id", "left").selectExpr(
        "doc_id",
        "coalesce(kept_words, CAST(0 AS BIGINT)) AS kept_words",
        "n_words - coalesce(kept_words, CAST(0 AS BIGINT)) AS cut_words",
        "md5(coalesce(_clean, '')) AS clean_md5",
    )


ORACLE_SUBSTRING_CLEAN = f"""
WITH {_SQL_BASE},
gp AS (
  SELECT doc_id,
         unnest(generate_series(1, len(w) - {_SPAN_K - 1})) AS i,
         unnest(list_transform(generate_series(1, len(w) - {_SPAN_K - 1}),
           i -> md5(list_aggregate(w[i : i + {_SPAN_K - 1}],
                                   'string_agg', ' ')))) AS g
  FROM wrds WHERE len(w) >= {_SPAN_K}
),
dup AS (SELECT g FROM gp GROUP BY g HAVING count(*) >= 2),
spos AS (SELECT doc_id, i FROM gp JOIN dup USING (g)),
isl AS (
  SELECT doc_id, i,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS k
  FROM spos
),
spans AS (
  SELECT doc_id, min(i) AS s, max(i) + {_SPAN_K - 1} AS e
  FROM isl GROUP BY doc_id, k
),
wpos AS (
  SELECT doc_id, i AS p, w[i] AS word
  FROM wrds, unnest(generate_series(1, len(w))) AS t(i)
),
kept AS (
  SELECT wp.doc_id, wp.p, wp.word
  FROM wpos wp
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = wp.doc_id
                      AND wp.p BETWEEN s.s AND s.e)
),
cl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_words,
         string_agg(word, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words
        FROM wpos GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(c.kept_words, 0) AS kept_words,
       t.n_words - coalesce(c.kept_words, 0) AS cut_words,
       md5(coalesce(c.clean_text, '')) AS clean_md5
FROM tot t LEFT JOIN cl c ON c.doc_id = t.doc_id
"""


def q_llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style discrete quality-rule battery — the rule-flag
    sibling of q_llm_quality_score's composite: per document, one
    boolean per published repetition-free heuristic (word count in
    range, mean word length in [3, 10], >= 80% words containing an
    alphabetic character, >= 2 distinct stopwords) plus the AND
    verdict a pipeline filters on.

    Every rule is an INTEGER comparison (mean-length bounds become
    ``3·n <= Σlen <= 10·n``), so the flags are bitwise-identical
    across engines. Expression-only over one scan — no shuffle, no
    Python; whole-stage codegen end to end."""
    stop = "('the', 'a', 'of', 'and', 'is', 'der', 'die', 'und', 'el', 'la', 'de')"
    return (
        _docs_norm(spark, sf_dir)
        .selectExpr("doc_id", f"{text.words('norm')} AS w")
        .selectExpr(
            "doc_id",
            "CAST(size(w) AS BIGINT) AS n_words",
            "aggregate(w, CAST(0 AS BIGINT), (a, x) -> a + length(x)) AS sum_len",
            "CAST(size(filter(w, x -> x rlike '[a-z]')) AS BIGINT) AS n_alpha",
            f"CAST(size(array_distinct(filter(w, x -> x IN {stop}))) AS BIGINT)"
            " AS n_stop",
        )
        .selectExpr(
            "doc_id",
            "n_words",
            "n_words BETWEEN 20 AND 100000 AS r_word_count",
            "3 * n_words <= sum_len AND sum_len <= 10 * n_words AS r_mean_word_len",
            "5 * n_alpha >= 4 * n_words AS r_alpha_fraction",
            "n_stop >= 2 AS r_stopwords",
            "(n_words BETWEEN 20 AND 100000) AND "
            "(3 * n_words <= sum_len AND sum_len <= 10 * n_words) AND "
            "(5 * n_alpha >= 4 * n_words) AND n_stop >= 2 AS passes",
        )
    )


ORACLE_GOPHER_RULES = f"""
WITH {_SQL_BASE},
m AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS sum_len,
         CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
           AS n_alpha,
         CAST(len(list_distinct(list_filter(w, x -> x IN
           ('the', 'a', 'of', 'and', 'is', 'der', 'die', 'und',
            'el', 'la', 'de')))) AS BIGINT) AS n_stop
  FROM wrds
)
SELECT doc_id, n_words,
       n_words BETWEEN 20 AND 100000 AS r_word_count,
       3 * n_words <= sum_len AND sum_len <= 10 * n_words AS r_mean_word_len,
       5 * n_alpha >= 4 * n_words AS r_alpha_fraction,
       n_stop >= 2 AS r_stopwords,
       (n_words BETWEEN 20 AND 100000) AND
       (3 * n_words <= sum_len AND sum_len <= 10 * n_words) AND
       (5 * n_alpha >= 4 * n_words) AND n_stop >= 2 AS passes
FROM m
"""


# ---------------------------------------------------------------------------
# 11. Multimodal plumbing (Arrow-batched mapInPandas; decode stubbed)
# ---------------------------------------------------------------------------


def q_llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.with_payload(docs))


ORACLE_MULTIMODAL = """
SELECT doc_id,
       'text/plain' AS kind,
       CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       'stub:text/plain' AS decoded
FROM documents
"""


def q_llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1 payload → N frames) through mapInPandas.

    Synthetic media model (decode stubbed, plumbing real): 100 bytes =
    1 s of video, one frame every 2 s; each frame is a deterministic
    hash of (payload, index), reproduced literally by the oracle's
    lateral generate_series.
    """
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(multimodal.with_payload(docs))


ORACLE_MULTIMODAL_FRAMES = """
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_idx,
       CAST(i * 2.0 AS DOUBLE) AS frame_ts,
       md5(text || '#' || CAST(i AS VARCHAR)) AS frame_md5
FROM documents, LATERAL (
  SELECT unnest(generate_series(
    0, CAST(octet_length(text::BLOB) // 200 AS BIGINT))) AS i) f
"""


def q_llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail/resize stub: payloads capped at 64 bytes, hashed.

    Text is ASCII in the fixtures (verified: octet_length == length),
    so the oracle's character-based substr equals the stub's byte
    truncation.
    """
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.resize_stub(multimodal.with_payload(docs), max_bytes=64)


ORACLE_MULTIMODAL_RESIZE = """
SELECT doc_id,
       CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
       CAST(least(octet_length(text::BLOB), 64) AS BIGINT) AS thumb_bytes,
       md5(substr(text, 1, 64)) AS thumb_md5
FROM documents
"""


def q_llm_multimodal_phash_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over the payload column —
    the image-dedup pipeline shape (decode → aHash → band blocking →
    Hamming verify) with the decode stubbed to byte sampling. The
    4×16-bit pigeonhole banding is COMPLETE for the ≤3 threshold, so
    the banded plan is an exact operator; the oracle recomputes the
    hash character-wise (fixture text is ASCII: byte == char) and
    verifies Hamming via BIT xor popcount."""
    docs = load_table(spark, sf_dir, "documents")
    hashes = multimodal.perceptual_hash(multimodal.with_payload(docs))
    return multimodal.phash_near_dup(hashes, max_hamming=3).orderBy(
        "doc_a", "doc_b"
    )


ORACLE_MULTIMODAL_PHASH = """
WITH g AS (
  SELECT doc_id, i,
         ascii(substr(text, (i % length(text)) + 1, 1)) AS v
  FROM documents, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) t(i)
), m AS (
  SELECT doc_id, avg(v) AS mean FROM g GROUP BY doc_id
), bits AS (
  SELECT g.doc_id, g.i, CASE WHEN g.v > m.mean THEN '1' ELSE '0' END AS b
  FROM g JOIN m ON g.doc_id = m.doc_id
), h AS (
  SELECT doc_id, string_agg(b, '' ORDER BY i) AS bits
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.bits::BIT, b.bits::BIT)) AS BIGINT) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.bits::BIT, b.bits::BIT)) <= 3
"""


# ---------------------------------------------------------------------------
# 12. TF-IDF — corpus-weighted term scoring (top terms per document)
# ---------------------------------------------------------------------------


def q_llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document.

    tf = in-doc term count; idf = ln(N / doc-frequency). Term counting
    and doc-frequency are two shuffles with map-side combine; N rides a
    broadcast scalar. Deterministic ordering via (score desc, token).
    """
    toks = _docs_norm(spark, sf_dir).selectExpr(
        "doc_id", f"explode({text.words('norm')}) AS token"
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = toks.select("doc_id", "token").distinct().groupBy("token").agg(
        F.count("*").alias("df")
    )
    # N rides a broadcast 1-row aggregate inside the SAME lazy plan —
    # an eager .count() here would fire a blocking extra corpus scan at
    # build time and hard-code the corpus size into the query text.
    n = _docs_norm(spark, sf_dir).agg(
        F.countDistinct("doc_id").alias("n_docs_total")
    )
    scored = tf.join(df_, "token").crossJoin(F.broadcast(n)).selectExpr(
        "doc_id",
        "token",
        "CAST(tf AS BIGINT) AS tf",
        "CAST(df AS BIGINT) AS df",
        f"{round_portable('tf * ln(CAST(n_docs_total AS DOUBLE) / df)', 6)} AS tfidf",
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where("rnk <= 5")
    )


ORACLE_TFIDF = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
toks AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.token,
         CAST(tf AS BIGINT) AS tf,
         CAST(df AS BIGINT) AS df,
         CAST(floor((tf * ln(CAST(n_docs AS DOUBLE) / df)) * 1e6 + 0.5)
              AS DOUBLE) / 1e6 AS tfidf
  FROM tf JOIN df ON tf.token = df.token, n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, token) AS rnk
  FROM scored
)
SELECT doc_id, token, tf, df, tfidf, rnk FROM ranked WHERE rnk <= 5
"""


# ---------------------------------------------------------------------------
# 7b. Bigram-LM fluency score — corpus-trained, CCNet-style quality signal
# ---------------------------------------------------------------------------


def q_llm_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fluency under a corpus-trained bigram model: the
    mean conditional probability p(b|a) = C(a,b)/C(a,·) over the doc's
    word bigrams (higher = more typical of the corpus; production
    pipelines threshold the same signal as log-perplexity).

    Distributed shape: bigram counts are two map-side-combinable
    groupBys; scoring joins doc bigrams to the count tables on the
    bigram/prefix keys (AQE skew join absorbs hot function words — the
    quantized sum is itself combinable, so the reduce never
    concentrates). Probabilities are exact IEEE divisions of bounded
    integers and per-doc means sum 1e9-quantized integers, so the
    score is bitwise-identical across engines with no libm anywhere.
    """
    w = (
        _docs_norm(spark, sf_dir)
        .selectExpr("doc_id", f"{text.words('norm')} AS w")
        .where("size(w) >= 2")
    )
    bg = w.selectExpr(
        "doc_id",
        "explode(transform(sequence(1, size(w) - 1), "
        "i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))) AS z",
    ).select("doc_id", "z.a", "z.b")
    cab = bg.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    ca = cab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    # Attach prefix counts to the (vocabulary-sized) count table first,
    # so the corpus-sized bigram stream is shuffled ONCE — joining bg
    # to cab and ca separately would shuffle it twice.
    model = cab.join(ca, "a")
    p = bg.join(model, ["a", "b"]).selectExpr(
        "doc_id", "CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE) AS p"
    )
    return p.groupBy("doc_id").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_bigrams"),
        F.expr(
            "CAST(sum(CAST(floor(p * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) "
            "/ (1e9 * count(*))"
        ).alias("mean_p"),
    )


ORACLE_NGRAM_LM = f"""
WITH {_SQL_BASE},
ww AS (SELECT doc_id, w FROM wrds WHERE len(w) >= 2),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i])) AS a,
         unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i + 1])) AS b
  FROM ww
),
cab AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY a, b),
ca AS (SELECT a, sum(c_ab) AS c_a FROM cab GROUP BY a),
p AS (
  SELECT g.doc_id, CAST(c.c_ab AS DOUBLE) / CAST(n.c_a AS DOUBLE) AS p
  FROM bg g JOIN cab c ON g.a = c.a AND g.b = c.b JOIN ca n ON g.a = n.a
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CAST(floor(p * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
         / (1e9 * count(*)) AS mean_p
FROM p GROUP BY doc_id
"""


def queries_and_oracles():
    queries = {
        "llm_dedup_exact": q_llm_dedup_exact,
        "llm_dedup_ngram_jaccard": q_llm_dedup_ngram_jaccard,
        "llm_dedup_containment": q_llm_dedup_containment,
        "llm_dedup_clusters": q_llm_dedup_clusters,
        "llm_pipeline_end_to_end": q_llm_pipeline_end_to_end,
        "llm_dedup_minhash_lsh": q_llm_dedup_minhash_lsh,
        "delta_lsh_maintenance": q_delta_lsh_maintenance,
        "llm_dedup_simhash": q_llm_dedup_simhash,
        "llm_dedup_simhash_pairs": q_llm_dedup_simhash_pairs,
        "llm_dedup_winnow": q_llm_dedup_winnow,
        "llm_dedup_substring": q_llm_dedup_substring,
        "llm_substring_clean": q_llm_substring_clean,
        "llm_gopher_rules": q_llm_gopher_rules,
        "llm_dedup_prefix_filter": q_llm_dedup_prefix_filter,
        "delta_winnow_maintenance": q_delta_winnow_maintenance,
        "llm_dedup_embedding": q_llm_dedup_embedding,
        "llm_embedding_topk": q_llm_embedding_topk,
        "llm_embedding_topk_gemm": q_llm_embedding_topk_gemm,
        "llm_hybrid_retrieval_rrf": q_llm_hybrid_retrieval_rrf,
        "llm_embedding_filtered_topk": q_llm_embedding_filtered_topk,
        "text_inverted_index_search": q_text_inverted_index_search,
        "llm_bm25_search": q_llm_bm25_search,
        "llm_embedding_pq_adc": q_llm_embedding_pq_adc,
        "llm_embedding_ivf_pq": q_llm_embedding_ivf_pq,
        "llm_bpe_train": q_llm_bpe_train,
        "llm_bpe_tokenize": q_llm_bpe_tokenize,
        "text_phrase_search": q_text_phrase_search,
        "llm_dedup_edit_distance": q_llm_dedup_edit_distance,
        "llm_dedup_lsh_verified": q_llm_dedup_lsh_verified,
        "llm_dedup_lines": q_llm_dedup_lines,
        "llm_dsir_weights": q_llm_dsir_weights,
        "llm_chunk_overlap": q_llm_chunk_overlap,
        "llm_embedding_ann_lsh": q_llm_embedding_ann_lsh,
        "llm_embedding_ivf": q_llm_embedding_ivf,
        "llm_embedding_filtered_ivf": q_llm_embedding_filtered_ivf,
        "llm_text_stats": q_llm_text_stats,
        "llm_quality_score": q_llm_quality_score,
        "llm_lang_id": q_llm_lang_id,
        "llm_token_count": q_llm_token_count,
        "llm_fingerprint": q_llm_fingerprint,
        "llm_multimodal_features": q_llm_multimodal_features,
        "llm_multimodal_frames": q_llm_multimodal_frames,
        "llm_multimodal_resize": q_llm_multimodal_resize,
        "llm_multimodal_phash_dedup": q_llm_multimodal_phash_dedup,
        "llm_tfidf_top_terms": q_llm_tfidf_top_terms,
        "llm_ngram_lm_score": q_llm_ngram_lm_score,
    }
    oracles = {
        "llm_dedup_exact": ORACLE_DEDUP_EXACT,
        "llm_dedup_ngram_jaccard": ORACLE_DEDUP_NGRAM,
        "llm_dedup_containment": ORACLE_DEDUP_CONTAINMENT,
        "llm_dedup_clusters": ORACLE_DEDUP_CLUSTERS,
        "llm_pipeline_end_to_end": ORACLE_PIPELINE,
        "llm_dedup_minhash_lsh": ORACLE_DEDUP_MINHASH,
        "delta_lsh_maintenance": ORACLE_DELTA_LSH,
        "llm_dedup_simhash": ORACLE_DEDUP_SIMHASH,
        "llm_dedup_simhash_pairs": ORACLE_SIMHASH_PAIRS,
        "llm_dedup_winnow": ORACLE_DEDUP_WINNOW,
        "llm_dedup_substring": ORACLE_DEDUP_SUBSTRING,
        "llm_substring_clean": ORACLE_SUBSTRING_CLEAN,
        "llm_gopher_rules": ORACLE_GOPHER_RULES,
        "llm_dedup_prefix_filter": ORACLE_DEDUP_PREFIX_FILTER,
        "delta_winnow_maintenance": ORACLE_DELTA_WINNOW,
        "llm_dedup_embedding": ORACLE_DEDUP_EMBEDDING,
        "llm_embedding_topk": ORACLE_EMBEDDING_TOPK,
        "llm_embedding_topk_gemm": ORACLE_EMBEDDING_TOPK,
        "llm_hybrid_retrieval_rrf": ORACLE_HYBRID_RRF,
        "llm_embedding_filtered_topk": ORACLE_EMBEDDING_FILTERED_TOPK,
        "text_inverted_index_search": ORACLE_TEXT_INVERTED_INDEX,
        "llm_bm25_search": ORACLE_BM25_SEARCH,
        "llm_embedding_pq_adc": ORACLE_EMBEDDING_PQ,
        "llm_embedding_ivf_pq": ORACLE_EMBEDDING_IVF_PQ,
        "llm_bpe_train": ORACLE_BPE_TRAIN,
        "llm_bpe_tokenize": ORACLE_BPE_TOKENIZE,
        "text_phrase_search": ORACLE_TEXT_PHRASE_SEARCH,
        "llm_dedup_edit_distance": ORACLE_DEDUP_EDIT_DISTANCE,
        "llm_dedup_lsh_verified": ORACLE_DEDUP_LSH_VERIFIED,
        "llm_dedup_lines": ORACLE_DEDUP_LINES,
        "llm_dsir_weights": ORACLE_DSIR_WEIGHTS,
        "llm_chunk_overlap": ORACLE_CHUNK_OVERLAP,
        "llm_embedding_ann_lsh": ORACLE_EMBEDDING_ANN,
        "llm_embedding_ivf": ORACLE_EMBEDDING_IVF,
        "llm_embedding_filtered_ivf": ORACLE_EMBEDDING_FILTERED_IVF,
        "llm_text_stats": ORACLE_TEXT_STATS,
        "llm_quality_score": ORACLE_QUALITY,
        "llm_lang_id": ORACLE_LANG_ID,
        "llm_token_count": ORACLE_TOKEN_COUNT,
        "llm_fingerprint": ORACLE_FINGERPRINT,
        "llm_multimodal_features": ORACLE_MULTIMODAL,
        "llm_multimodal_frames": ORACLE_MULTIMODAL_FRAMES,
        "llm_multimodal_resize": ORACLE_MULTIMODAL_RESIZE,
        "llm_multimodal_phash_dedup": ORACLE_MULTIMODAL_PHASH,
        "llm_tfidf_top_terms": ORACLE_TFIDF,
        "llm_ngram_lm_score": ORACLE_NGRAM_LM,
    }
    return queries, oracles
