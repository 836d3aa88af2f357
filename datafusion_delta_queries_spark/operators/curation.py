"""Corpus-curation operators: decontamination, repetition filters,
stratified sampling, sequence packing, PII scrubbing.

The second tranche of training-data pipeline capability (beyond the
dedup/similarity/text tranche in llm_pipeline.py; the reference has no
function surface at all — SURVEY §2.3). Same engine-portability
contract: md5-based determinism, identical aliases in the Spark plan
and the DuckDB oracle, portable half-up rounding.

Scale posture (100 TB):
- decontamination joins the corpus against a BROADCAST eval-shingle
  set (eval benchmarks are tiny by definition) — no corpus shuffle;
- repetition stats are two map-side-combinable groupBys;
- stratified sampling is a pure per-row filter (hex-threshold on md5 —
  no sampling state, rerunnable, exactly reproducible);
- sequence packing is one window over (source, doc_id) — at scale,
  range-partition by the same key so the cumsum never sees skew;
- PII scrubbing is per-row regexp work inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import similarity, text
from ..functions.text import round_portable

_NORM = text.norm_text("text")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "source", f"{_NORM} AS norm"
    )


# ---------------------------------------------------------------------------
# 1. Benchmark decontamination — eval-set n-gram overlap
# ---------------------------------------------------------------------------

# Deterministic pseudo-benchmark: every 23rd doc plays the eval set.
_EVAL_MOD = 23
_DECON_N = 5  # word n-gram size for the overlap check


def q_llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs that share a word-5-gram with the eval set.

    The standard pre-training decontamination pass: any training
    document containing an n-gram of a benchmark document is flagged
    (n=5 here; 13 is common for full-size corpora — the fixture docs
    are 10-99 words). The eval shingle set is broadcast — benchmarks
    are tiny next to the corpus, so the corpus never shuffles.
    """
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        f"{text.word_shingles(text.words('norm'), _DECON_N)} AS sh",
    )
    ev = docs.where(f"doc_id % {_EVAL_MOD} = 0").select(
        F.explode("sh").alias("shingle")
    ).distinct()
    train = docs.where(f"doc_id % {_EVAL_MOD} != 0").select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    return (
        train.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


ORACLE_DECONTAMINATE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(w) - {_DECON_N - 1}),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
         )) AS sh
  FROM (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
    FROM documents
  ) WHERE len(w) >= {_DECON_N}
),
ev AS (
  SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id % {_EVAL_MOD} = 0
),
train AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh WHERE doc_id % {_EVAL_MOD} != 0
)
SELECT t.doc_id, count(*) AS n_shared_ngrams
FROM train t JOIN ev USING (shingle)
GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# 2. Repetition-based quality filter (Gopher-style top-n-gram fraction)
# ---------------------------------------------------------------------------

_REP_THRESHOLD = 0.1  # top-bigram fraction above which a doc is flagged


def q_llm_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition stats: top-bigram fraction + duplicate-word
    ratio, with a repetition flag.

    The Gopher/MassiveText-style repetition filters: a document whose
    single most frequent word-2-gram covers more than ``threshold`` of
    all its 2-grams is boilerplate/spam-shaped. Two map-side-combinable
    groupBys ((doc, gram) then (doc)) — linear, no skew exposure.
    """
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id", f"{text.words('norm')} AS w"
    )
    grams = docs.where("size(w) >= 2").selectExpr(
        "doc_id",
        "size(w) AS n_words",
        "size(array_distinct(w)) AS n_distinct_words",
        "explode(transform(sequence(0, size(w) - 2), "
        "i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))) AS gram",
    )
    per_gram = grams.groupBy("doc_id", "n_words", "n_distinct_words", "gram").agg(
        F.count("*").alias("cnt")
    )
    return per_gram.groupBy("doc_id", "n_words", "n_distinct_words").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        F.max("cnt").cast("bigint").alias("top_bigram_n"),
    ).selectExpr(
        "doc_id",
        "CAST(n_words AS BIGINT) AS n_words",
        "n_bigrams",
        "top_bigram_n",
        f"{round_portable('top_bigram_n * CAST(1.0 AS DOUBLE) / n_bigrams', 6)}"
        " AS top_bigram_ratio",
        f"{round_portable('CAST(1.0 AS DOUBLE) - n_distinct_words * CAST(1.0 AS DOUBLE) / n_words', 6)}"
        " AS dup_word_ratio",
        f"CAST(CASE WHEN top_bigram_n * CAST(1.0 AS DOUBLE) / n_bigrams > {_REP_THRESHOLD}"
        " THEN 1 ELSE 0 END AS INT) AS repetitive",
    )


ORACLE_QUALITY_REPETITION = f"""
WITH w AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct_words,
         unnest(list_transform(generate_series(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1])) AS gram
  FROM w WHERE len(w) >= 2
),
per_gram AS (
  SELECT doc_id, n_words, n_distinct_words, gram, count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3, 4
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       CAST(max(cnt) AS BIGINT) AS top_bigram_n,
       CAST(floor((max(cnt) * CAST(1.0 AS DOUBLE) / sum(cnt)) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS top_bigram_ratio,
       CAST(floor((CAST(1.0 AS DOUBLE) - n_distinct_words * CAST(1.0 AS DOUBLE) / n_words) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS dup_word_ratio,
       CAST(CASE WHEN max(cnt) * CAST(1.0 AS DOUBLE) / sum(cnt) > {_REP_THRESHOLD}
            THEN 1 ELSE 0 END AS INT) AS repetitive
FROM per_gram
GROUP BY doc_id, n_words, n_distinct_words
"""


# ---------------------------------------------------------------------------
# 3. Deterministic stratified sampling (domain mixing)
# ---------------------------------------------------------------------------

# Per-source keep rates as md5-hex thresholds: the first 8 hex chars of
# md5(doc_id) are uniform in [0, 2^32), so comparing them against a hex
# literal keeps exactly that fraction in expectation — identically in
# both engines, with no RNG state and perfect reproducibility.
_RATE_CASE = """
CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN '40000000'
     WHEN source IN ('src5','src6','src7','src8','src9') THEN '80000000'
     ELSE 'c0000000' END
"""


def q_llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based stratified sampling: keep 25% of src0-4, 50% of
    src5-9, 75% of the rest — the domain-mixing step of a corpus build.

    A pure per-row filter (no sampling state, no RNG): kept(doc) =
    md5(doc_id)[:8] < rate-threshold. Rerunning — on any cluster, at
    any parallelism — keeps exactly the same documents.
    """
    return _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "source",
        "substring(md5(CAST(doc_id AS STRING)), 1, 8) AS u_hex",
    ).where(f"u_hex < ({_RATE_CASE})")


ORACLE_SAMPLE_STRATIFIED = f"""
SELECT doc_id, source, substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS u_hex
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < ({_RATE_CASE})
"""


# ---------------------------------------------------------------------------
# 4. Sequence packing (token-budget accounting)
# ---------------------------------------------------------------------------

_SEQ_BUDGET = 256  # tokens per packed training sequence


def q_llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing accounting: concatenate each source's
    docs in doc_id order and chunk into 256-token sequences (documents
    straddle boundaries). Emits, per doc, its first/last sequence id
    and offset — the shuffle-side bookkeeping a packed-pretraining
    writer needs.

    One window over (source, doc_id): the running token count before
    each doc determines every placement. At 100 TB the input would be
    range-partitioned on the same key, so the cumsum is a partition-
    local scan."""
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "source",
        f"CAST(size({text.bpe_tokens('norm')}) AS BIGINT) AS n_tokens",
    )
    return docs.selectExpr(
        "doc_id",
        "source",
        "n_tokens",
        "CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_before",
    ).selectExpr(
        "doc_id",
        "source",
        "n_tokens",
        f"CAST(tok_before div {_SEQ_BUDGET} AS BIGINT) AS first_seq",
        f"CAST((tok_before + n_tokens - 1) div {_SEQ_BUDGET} AS BIGINT) AS last_seq",
        f"CAST(tok_before % {_SEQ_BUDGET} AS BIGINT) AS seq_offset",
    )


ORACLE_PACK_SEQUENCES = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
           '{text.BPE_TOKEN_PATTERN}')) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_before
  FROM toks
)
SELECT doc_id, source, n_tokens,
       CAST(tok_before // {_SEQ_BUDGET} AS BIGINT) AS first_seq,
       CAST((tok_before + n_tokens - 1) // {_SEQ_BUDGET} AS BIGINT) AS last_seq,
       CAST(tok_before % {_SEQ_BUDGET} AS BIGINT) AS seq_offset
FROM cum
"""


# ---------------------------------------------------------------------------
# 5. PII scrubbing (regex redaction)
# ---------------------------------------------------------------------------

# The fixture text is synthetic and PII-free, so the op injects
# deterministic PII first (derived from doc_id — identical in both
# engines), then scrubs it: the redaction regexes do real work and the
# oracle proves byte-identical output.
_PII_AUG = (
    "concat(norm, ' contact user', CAST(doc_id AS {str_t}), '@example.com"
    " or call 555-', lpad(CAST(doc_id % 10000 AS {str_t}), 4, '0'),"
    " ' from 10.1.', CAST(doc_id % 256 AS {str_t}), '.9')"
)
# `[.]` instead of `\.`: Spark SQL string literals consume backslash
# escapes (`'\.'` reaches the regex engine as bare `.` = any-char),
# while DuckDB literals don't — a character class parses identically in
# both engines with no escaping at all.
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"
_IP_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def q_llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails, phone numbers, and IPv4 addresses to typed
    placeholder tokens, counting each redaction class.

    Order matters and is pinned: emails first (their domain would
    otherwise be eaten by the IP pattern's digit runs), then phones,
    then IPs. Pure per-row regexp work — codegen'd, shuffle-free."""
    aug = _PII_AUG.format(str_t="STRING")
    return _docs(spark, sf_dir).selectExpr(
        "doc_id", f"{aug} AS aug"
    ).selectExpr(
        "doc_id",
        f"CAST(size(regexp_extract_all(aug, '{_EMAIL_RE}', 0)) AS BIGINT) AS n_emails",
        f"CAST(size(regexp_extract_all(aug, '{_PHONE_RE}', 0)) AS BIGINT) AS n_phones",
        f"regexp_replace(regexp_replace(regexp_replace(aug,"
        f" '{_EMAIL_RE}', '[EMAIL]'),"
        f" '{_PHONE_RE}', '[PHONE]'),"
        f" '{_IP_RE}', '[IP]') AS scrubbed",
    ).selectExpr(
        "doc_id",
        "n_emails",
        "n_phones",
        f"CAST(size(regexp_extract_all(scrubbed, '{_IP_RE}', 0)) AS BIGINT) + 0"
        " AS n_ips_left",  # must be 0 rows-wide: proves the scrub got them
        "scrubbed",
    )


_DUCK_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_PII_AUG_DUCK = _PII_AUG.format(str_t="VARCHAR").replace("norm", _DUCK_NORM)

ORACLE_PII_SCRUB = rf"""
WITH aug AS (
  SELECT doc_id,
         {_PII_AUG_DUCK} AS aug
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(
         regexp_replace(regexp_replace(regexp_replace(aug,
           '{_EMAIL_RE}', '[EMAIL]', 'g'),
           '{_PHONE_RE}', '[PHONE]', 'g'),
           '{_IP_RE}', '[IP]', 'g'), '{_IP_RE}')) AS BIGINT) + 0 AS n_ips_left,
       regexp_replace(regexp_replace(regexp_replace(aug,
         '{_EMAIL_RE}', '[EMAIL]', 'g'),
         '{_PHONE_RE}', '[PHONE]', 'g'),
         '{_IP_RE}', '[IP]', 'g') AS scrubbed
FROM aug
"""


# ---------------------------------------------------------------------------
# 6. Semantic clustering — distributed k-means over embeddings
# ---------------------------------------------------------------------------

# Two fixed Lloyd iterations from deterministic seeds (the k lowest
# vec_ids) — enough to demonstrate the distributed pattern while
# staying exactly SQL-expressible for the oracle. Centroid means are
# computed over 1e6-quantized integers: float sums across rows depend
# on aggregation order (not portable between engines), integer sums do
# not, and one final double division of exact integers is identical
# IEEE math on both sides.
_KMEANS_K = 8


def _km_d2(v: str, c: str) -> str:
    """Portable squared L2 distance via three order-stable dot products."""
    d = similarity.dot
    return f"({d(v, v)}) - 2 * ({d(v, c)}) + ({d(c, c)})"


def _km_assign(v_df: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment with ZERO shuffle: the centroid
    table collapses to ONE broadcast row (array of (cell, c) structs)
    and the per-vector argmin is a row-local array reduction — no k-way
    fanout join, no re-aggregation of the corpus. (d2, cell)
    lexicographic min, so ties still break on the lower cell id;
    ``array_min`` is order-insensitive, so the non-deterministic
    ``collect_list`` order can't leak into the result."""
    cent_row = cents.agg(F.expr("collect_list(struct(cell, c))").alias("_cents"))
    return (
        v_df.crossJoin(F.broadcast(cent_row))
        .selectExpr(
            "vec_id",
            "v",
            f"array_min(transform(_cents, s -> "
            f"struct({_km_d2('v', 's.c')} AS d2, s.cell AS cell))) AS b",
        )
        .selectExpr("vec_id", "v", "b.cell AS cell", "b.d2 AS d2")
    )


def _km_centroids(v_df: DataFrame, k: int = _KMEANS_K) -> DataFrame:
    """(cell, c) centroids from seeds (the k lowest vec_ids of
    ``v_df``) plus ONE quantized Lloyd step — the centroid half of
    ``_km_final_assign``, factored out so maintenance paths can FREEZE
    centroids built from a stored state and assign later batches
    against them (the production cadence: centroids refresh slowly,
    assignments maintain per change batch)."""
    seeds = v_df.where(f"vec_id < {k}").selectExpr(
        "CAST(vec_id AS INT) AS cell", "v AS c"
    )
    a1 = _km_assign(v_df, seeds)
    return (
        a1.selectExpr("cell", "posexplode(v) AS (d, x)")
        .groupBy("cell", "d")
        .agg(
            F.expr("sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT))").alias("s"),
            F.count("*").alias("n"),
        )
        .selectExpr("cell", "d", "CAST(s AS DOUBLE) / (1e6 * n) AS m")
        .groupBy("cell")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d, m))), s -> s.m)"
            ).alias("c")
        )
    )


def _km_final_assign(
    spark: SparkSession, sf_dir: str, k: int = _KMEANS_K
) -> DataFrame:
    """(vec_id, v, cell, d2) after seeds → one Lloyd step → reassign.
    ``k`` is the production scale knob: it grows with the corpus so
    cluster SIZE stays bounded (the fixture default is 8)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.selectExpr(
        "vec_id", f"{similarity.as_double_array('embedding')} AS v"
    )
    return _km_assign(v, _km_centroids(v, k))


def q_llm_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster assignment over the embeddings table: seeds =
    the 8 lowest vec_ids, one Lloyd centroid refinement, final
    assignment with squared-L2 distance.

    The semantic-clustering primitive a curation pipeline uses for
    diversity sampling and cluster-level dedup. At 100 TB: centroids
    are k×dim doubles (broadcast), each assignment is one corpus pass
    with map-side partial aggregation, and the centroid update shuffles
    only (cell, dim) partial sums — never vectors.
    """
    return _km_final_assign(spark, sf_dir).selectExpr(
        "vec_id",
        "CAST(cell AS INT) AS cluster_id",
        f"{round_portable('d2', 6)} AS d2",
    )


# Shared CTE chain: seeds → first assignment → quantized centroid
# update → final assignment (a2). Reused by the diversity sampler and
# SemDeDup; parameterized on k like _km_final_assign.
def _km_sql_ctes(k: int = _KMEANS_K) -> str:
    return f"""v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
seeds AS (
  SELECT CAST(vec_id AS INT) AS cell, v AS c FROM v WHERE vec_id < {k}
),
a1 AS (
  SELECT vec_id, v, cell, d2 FROM (
    SELECT vec_id, v, cell,
           list_dot_product(v, v) - 2 * list_dot_product(v, c)
             + list_dot_product(c, c) AS d2
    FROM v CROSS JOIN seeds
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1
),
ex AS (
  SELECT cell, unnest(v) AS x, unnest(generate_series(1, len(v))) AS d FROM a1
),
cm AS (
  SELECT cell, d,
         CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
           / (1e6 * count(*)) AS m
  FROM ex GROUP BY cell, d
),
cents AS (
  SELECT cell, list(m ORDER BY d) AS c FROM cm GROUP BY cell
),
a2 AS (
  SELECT vec_id, cell, d2 FROM (
    SELECT vec_id, cell,
           list_dot_product(v, v) - 2 * list_dot_product(v, c)
             + list_dot_product(c, c) AS d2
    FROM v CROSS JOIN cents
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1
)"""


_KM_SQL_CTES = _km_sql_ctes()

ORACLE_SEMANTIC_KMEANS = f"""
WITH {_KM_SQL_CTES}
SELECT vec_id, CAST(cell AS INT) AS cluster_id,
       CAST(floor(d2 * 1e6 + 0.5) AS DOUBLE) / 1e6 AS d2
FROM a2
"""


# ---------------------------------------------------------------------------
# 7. Diversity sampling — most-central M per semantic cluster
# ---------------------------------------------------------------------------

_DIVERSE_M = 25


def q_llm_sample_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``_DIVERSE_M`` most-central vectors of each k-means cluster:
    prototype selection for diversity-aware corpus subsampling — every
    semantic region contributes, no region dominates.

    One window over the k-means assignment (partitioned by cluster,
    ordered by distance then vec_id — raw distances are bitwise
    identical across engines, so the rank order is too).
    """
    return (
        _km_final_assign(spark, sf_dir)
        .selectExpr(
            "vec_id",
            "CAST(cell AS INT) AS cluster_id",
            "d2",
            "CAST(row_number() OVER "
            "(PARTITION BY cell ORDER BY d2, vec_id) AS INT) AS rank",
        )
        .where(f"rank <= {_DIVERSE_M}")
        .selectExpr(
            "vec_id", "cluster_id", f"{round_portable('d2', 6)} AS d2", "rank"
        )
    )


ORACLE_SAMPLE_DIVERSE = f"""
WITH {_KM_SQL_CTES}
SELECT vec_id, CAST(cell AS INT) AS cluster_id,
       CAST(floor(d2 * 1e6 + 0.5) AS DOUBLE) / 1e6 AS d2,
       CAST(rank AS INT) AS rank
FROM (
  SELECT vec_id, cell, d2,
         row_number() OVER (PARTITION BY cell ORDER BY d2, vec_id) AS rank
  FROM a2
) WHERE rank <= {_DIVERSE_M}
"""


# ---------------------------------------------------------------------------
# 7a. SemDeDup — semantic dedup within k-means clusters
# ---------------------------------------------------------------------------

# Intra-cluster cosine threshold. The fixture corpus has no true
# semantic duplicates (max intra-cluster cosine ≈ 0.51/0.60 at
# sf0.01/sf0.1), so 0.4 marks "semantically near" — same operator,
# same plan shape, non-vacuous oracle (24 / 303 above-threshold pairs
# at the two fixture scales).
_SEMDEDUP_TAU = 0.4


def q_llm_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): the production
    SEMANTIC dedup recipe — cluster embeddings with k-means, then drop
    near-duplicates WITHIN each cluster only. Composes the two
    primitives this module already ships (the k-means assignment and
    the capped cosine machinery) into the one major public LLM-dedup
    pattern the registry lacked.

    Drop rule (deterministic, SQL-expressible): a vector is dropped
    iff some intra-cluster neighbor with a LOWER vec_id has rounded
    cosine ≥ τ — the standard greedy lowest-id-keeper approximation of
    SemDeDup's per-group representative.

    Scale economics — the pattern's whole point: pairs are
    INTRA-CLUSTER only. Production k grows with the corpus so cluster
    size (and the per-cluster pair count) stays bounded, making total
    pair volume O(N · cluster_size) — linear in the corpus, never
    all-pairs. Both regimes are EXECUTABLE here via ``k``
    (``_semdedup_ledger``; the k-scaled regime is measured in
    SCALE.md and oracle-checked in tests/test_dedup_caps.py); the
    registered query uses the fixture k=8. The cluster self-join is
    an equi join on the cell id (plan-audited: no cartesian). Returns
    the per-cluster dedup ledger; checksums pin the exact
    survivor/dropped sets."""
    return _semdedup_ledger(spark, sf_dir)


def _semdedup_ledger(
    spark: SparkSession, sf_dir: str, k: int = _KMEANS_K
) -> DataFrame:
    from .llm_pipeline import _shared

    a = _km_final_assign(spark, sf_dir, k)  # vec_id, v, cell, d2
    # both self-join sides and the summary read this relation: persist
    # (via the registry, so release_shared() frees it per run) so the
    # seeds → Lloyd → reassign chain runs once
    n = _shared(
        a.selectExpr(
            "vec_id", "cell", "v", f"{similarity.norm('v')} AS nrm"
        )
    )
    return _ledger_of(n)


def _ledger_of(n: DataFrame) -> DataFrame:
    """The SemDeDup per-cluster ledger over an assignment relation
    ``n`` = (vec_id, cell, v, nrm): intra-cluster lower-id-neighbor
    drop rule, then (n_vecs, n_dropped, survivor/dropped checksums)
    per cluster. Factored out of ``_semdedup_ledger`` so the signed
    maintainer can repair the ledger of TOUCHED cells only."""
    dropped = (
        # shuffle_hash (r17): the intra-cluster self-join is keyed on
        # k cells only — sort-merge sorts both corpus-sized sides for
        # nothing; a hash map over the per-partition cell slice feeds
        # the same pair stream without the sorts (quiet solo min
        # 7.2 -> 4.0 s on llm_dedup_semantic). Per-join opt-in.
        n.alias("a")
        .hint("shuffle_hash")
        .join(
            n.alias("b").hint("shuffle_hash"),
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .selectExpr(
            "b.vec_id AS vec_id",
            f"{round_portable(similarity.dot('a.v', 'b.v') + ' / (a.nrm * b.nrm)', 6)}"
            " AS cos_sim",
        )
        .where(f"cos_sim >= {_SEMDEDUP_TAU}")
        .select("vec_id")
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    return (
        n.join(dropped, "vec_id", "left")
        .groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.count("is_dropped").cast("bigint").alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(F.col("is_dropped").isNull(), F.col("vec_id"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("survivor_checksum"),
            F.coalesce(
                F.sum(
                    F.when(F.col("is_dropped").isNotNull(), F.col("vec_id"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("dropped_checksum"),
        )
        .selectExpr(
            "CAST(cell AS INT) AS cluster_id",
            "n_vecs",
            "n_dropped",
            "survivor_checksum",
            "dropped_checksum",
        )
    )


def _oracle_dedup_semantic(k: int = _KMEANS_K) -> str:
    return f"""
WITH {_km_sql_ctes(k)},
n AS (
  SELECT a2.vec_id, a2.cell, v.v, sqrt(list_dot_product(v.v, v.v)) AS nrm
  FROM a2 JOIN v USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE CAST(floor((list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) * 1e6
             + 0.5) AS DOUBLE) / 1e6 >= {_SEMDEDUP_TAU}
)
SELECT CAST(n.cell AS INT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(d.vec_id) AS BIGINT) AS n_dropped,
       CAST(coalesce(sum(CASE WHEN d.vec_id IS NULL THEN n.vec_id END), 0)
            AS BIGINT) AS survivor_checksum,
       CAST(coalesce(sum(CASE WHEN d.vec_id IS NOT NULL THEN n.vec_id END), 0)
            AS BIGINT) AS dropped_checksum
FROM n LEFT JOIN dropped d ON n.vec_id = d.vec_id
GROUP BY n.cell
"""


ORACLE_DEDUP_SEMANTIC = _oracle_dedup_semantic()


# ---------------------------------------------------------------------------
# 7b. Table profile — per-column stats in ONE scan (wide agg → unpivot)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("doc_id", "lang", "source", "n_chars")


def q_llm_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of the documents table: null count,
    distinct count, min/max (as strings) — one row per column, computed
    in ONE scan.

    The ingest-time data-quality report: all metrics ride a single
    wide aggregation (every profiled column's counters in one pass),
    then a zero-cost ``stack`` unpivot reshapes wide → long. N columns
    never mean N scans; at 100 TB the shuffle carries exactly one row.
    """
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            f"CAST(count(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS {c}_nulls",
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS {c}_ndv",
            f"CAST(min({c}) AS STRING) AS {c}_min",
            f"CAST(max({c}) AS STRING) AS {c}_max",
        ]
    stack = ", ".join(
        f"'{c}', {c}_nulls, {c}_ndv, {c}_min, {c}_max" for c in _PROFILE_COLS
    )
    return (
        load_table(spark, sf_dir, "documents")
        .selectExpr(*aggs)
        .selectExpr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def _profile_oracle() -> str:
    arms = []
    for c in _PROFILE_COLS:
        arms.append(f"""
SELECT '{c}' AS column_name,
       CAST(count(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value
FROM documents""")
    return "\nUNION ALL\n".join(arms)


ORACLE_TABLE_PROFILE = _profile_oracle()


# ---------------------------------------------------------------------------
# 8. Metadata audit — heuristic lang-ID vs the lang metadata column
# ---------------------------------------------------------------------------

# Same stopword-vote heuristic as q_llm_lang_id (llm_pipeline.py).
_PRED_LANG = (
    "CASE WHEN en_hits >= de_hits AND en_hits >= es_hits THEN "
    "  CASE WHEN en_hits > 0 THEN 'en' ELSE 'unknown' END "
    "WHEN de_hits >= es_hits THEN 'de' ELSE 'es' END"
)


def q_llm_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement matrix between the corpus's ``lang`` metadata column
    and the content-based stopword-vote language prediction.

    The standard trust-but-verify pass on crawled metadata: per
    (claimed, predicted) cell, document count and its share of the
    claimed language. One scan + one map-side-combinable groupBy; the
    share is one division of exact counts, portable across engines.
    """
    from .llm_pipeline import _DE, _EN, _ES

    hits = (
        load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", "lang", f"{_NORM} AS norm")
        .selectExpr("doc_id", "lang", f"{text.words('norm')} AS w")
        .selectExpr(
            "doc_id",
            "lang",
            f"CAST(size(filter(w, x -> x IN {_EN})) AS BIGINT) AS en_hits",
            f"CAST(size(filter(w, x -> x IN {_DE})) AS BIGINT) AS de_hits",
            f"CAST(size(filter(w, x -> x IN {_ES})) AS BIGINT) AS es_hits",
        )
    )
    return (
        hits.selectExpr("lang", f"{_PRED_LANG} AS predicted_lang")
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .selectExpr(
            "lang",
            "predicted_lang",
            "n_docs",
            f"{round_portable('CAST(n_docs AS DOUBLE) / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE)', 6)}"
            " AS frac_of_lang",
        )
    )


def _oracle_metadata_audit() -> str:
    from .llm_pipeline import _DE, _EN, _ES

    return f"""
WITH w AS (
  SELECT doc_id, lang,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
hits AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(w, x -> x IN {_EN})) AS BIGINT) AS en_hits,
         CAST(len(list_filter(w, x -> x IN {_DE})) AS BIGINT) AS de_hits,
         CAST(len(list_filter(w, x -> x IN {_ES})) AS BIGINT) AS es_hits
  FROM w
),
cells AS (
  SELECT lang, {_PRED_LANG} AS predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM hits GROUP BY lang, predicted_lang
)
SELECT lang, predicted_lang, n_docs,
       CAST(floor((CAST(n_docs AS DOUBLE)
             / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE)) * 1e6 + 0.5)
            AS DOUBLE) / 1e6 AS frac_of_lang
FROM cells
"""


# ---------------------------------------------------------------------------
# 9. Corpus funnel — per-stage survivor counts in ONE scan
# ---------------------------------------------------------------------------

# Mirrors the end-to-end pipeline's gates (llm_pipeline.py
# q_llm_pipeline_end_to_end): English stopword-vote, quality >= 0.45,
# exact-dup uniqueness among passers.
_QUALITY_EXPR_SPARK = (
    "0.5 * least(CAST(1.0 AS DOUBLE), n_chars / CAST(400.0 AS DOUBLE))"
    " + 0.3 * (size(array_distinct(w)) * CAST(1.0 AS DOUBLE) / size(w))"
    " + 0.2 * least(CAST(1.0 AS DOUBLE), (aggregate(w, CAST(0 AS BIGINT),"
    " (a, x) -> a + length(x)) * CAST(1.0 AS DOUBLE) / size(w))"
    " / CAST(8.0 AS DOUBLE))"
)


def q_llm_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel report: how many documents survive each pipeline
    gate (language, quality, both, exact-unique among passers) plus the
    surviving token budget — computed in ONE corpus scan with
    conditional aggregation, the pattern a 100 TB nightly corpus
    report must use (N gates never mean N scans).
    """
    from .llm_pipeline import _DE, _EN, _ES

    scored = (
        load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", "n_chars", f"{_NORM} AS norm")
        .selectExpr("doc_id", "n_chars", "norm", f"{text.words('norm')} AS w")
        .selectExpr(
            "doc_id",
            "norm",
            f"CAST(size(filter(w, x -> x IN {_EN})) AS BIGINT) AS en_hits",
            f"CAST(size(filter(w, x -> x IN {_DE})) AS BIGINT) AS de_hits",
            f"CAST(size(filter(w, x -> x IN {_ES})) AS BIGINT) AS es_hits",
            f"{round_portable(_QUALITY_EXPR_SPARK, 4)} AS q",
            f"CAST(size({text.bpe_tokens('norm')}) AS BIGINT) AS n_bpe",
        )
        .selectExpr(
            "norm",
            "n_bpe",
            "q",
            "CAST(CASE WHEN en_hits >= de_hits AND en_hits >= es_hits"
            " AND en_hits > 0 THEN 1 ELSE 0 END AS INT) AS lang_ok",
            "CAST(CASE WHEN q >= 0.45 THEN 1 ELSE 0 END AS INT) AS quality_ok",
        )
    )
    return scored.selectExpr(
        "CAST(count(*) AS BIGINT) AS n_total",
        "CAST(sum(lang_ok) AS BIGINT) AS n_lang_pass",
        "CAST(sum(quality_ok) AS BIGINT) AS n_quality_pass",
        "CAST(sum(lang_ok * quality_ok) AS BIGINT) AS n_pass_both",
        "CAST(count(DISTINCT CASE WHEN lang_ok * quality_ok = 1"
        " THEN md5(norm) END) AS BIGINT) AS n_unique_pass",
        "CAST(sum(CASE WHEN lang_ok * quality_ok = 1 THEN n_bpe"
        " ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS n_tokens_pass",
    )


def _oracle_corpus_funnel(src: str = "documents") -> str:
    from .llm_pipeline import _DE, _EN, _ES

    return f"""
WITH w AS (
  SELECT doc_id, n_chars,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM {src}
),
scored AS (
  SELECT norm,
         CAST(len(regexp_extract_all(norm, '{text.BPE_TOKEN_PATTERN}')) AS BIGINT) AS n_bpe,
         CASE WHEN CAST(len(list_filter(w, x -> x IN {_EN})) AS BIGINT)
                     >= CAST(len(list_filter(w, x -> x IN {_DE})) AS BIGINT)
               AND CAST(len(list_filter(w, x -> x IN {_EN})) AS BIGINT)
                     >= CAST(len(list_filter(w, x -> x IN {_ES})) AS BIGINT)
               AND len(list_filter(w, x -> x IN {_EN})) > 0
              THEN 1 ELSE 0 END AS lang_ok,
         CASE WHEN CAST(floor((0.5 * least(CAST(1.0 AS DOUBLE), n_chars / CAST(400.0 AS DOUBLE))
               + 0.3 * (len(list_distinct(w)) * CAST(1.0 AS DOUBLE) / len(w))
               + 0.2 * least(CAST(1.0 AS DOUBLE),
                   (list_sum(list_transform(w, x -> strlen(x)))
                    * CAST(1.0 AS DOUBLE) / len(w)) / CAST(8.0 AS DOUBLE)))
              * 1e4 + 0.5) AS DOUBLE) / 1e4 >= 0.45 THEN 1 ELSE 0 END AS quality_ok
  FROM w
)
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(lang_ok) AS BIGINT) AS n_lang_pass,
       CAST(sum(quality_ok) AS BIGINT) AS n_quality_pass,
       CAST(sum(lang_ok * quality_ok) AS BIGINT) AS n_pass_both,
       CAST(count(DISTINCT CASE WHEN lang_ok * quality_ok = 1
            THEN md5(norm) END) AS BIGINT) AS n_unique_pass,
       CAST(sum(CASE WHEN lang_ok * quality_ok = 1 THEN n_bpe
            ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS n_tokens_pass
FROM scored
"""


# -- deterministic train/holdout split ---------------------------------
#
# The canonical training-data discipline: every document is routed to
# train/valid/test by a SALTED HASH of its stable id, never by position
# or randomness. Properties that matter at 100 TB:
#   - per-row map-side math (md5 + one comparison), no sampling state,
#     no shuffle until the audit aggregation;
#   - rerunnable: the same doc lands in the same split on every run,
#     on any cluster, after any repartition — so incremental corpus
#     additions never migrate old documents across the holdout
#     boundary (the contamination property);
#   - the salt ('split:') isolates this hash use from every other md5
#     use in the pipeline (shingles, shards), so splits are
#     uncorrelated with dedup buckets.
# Portable: Spark conv() and the DuckDB strpos-hex idiom decode the
# same 4 hex chars of the same md5 to the same 16-bit integer.

def _split_u16_spark():
    # Column exprs need a live session — built per call, not at import.
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")


# 80 / 10 / 10 in 16-bit space: 0.8 * 65536 = 52428.8 → 52429 exact
# integer thresholds both engines agree on.
def _split_case_spark():
    u16 = _split_u16_spark()
    return (
        F.when(u16 < 52429, F.lit("train"))
        .when(u16 < 58982, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def _duck_u16(prefix: str, expr: str) -> str:
    """DuckDB rendition of the 4-hex-char md5 prefix → u16 decode."""
    h = f"md5('{prefix}' || CAST({expr} AS VARCHAR))"
    hexpos = "strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1"
    return " + ".join(
        f"({hexpos.format(h=h, i=i)}) * {16 ** (4 - i)}" for i in range(1, 5)
    )


def q_llm_split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split the corpus 80/10/10 and audit the assignment per
    (lang, split): counts, char mass, and a doc_id checksum that pins
    EXACT membership (two different splits with the same counts cannot
    share the checksum). One narrow scan + one aggregation shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", _split_case_spark())
        .groupBy("lang", "split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


ORACLE_SPLIT_TRAIN_HOLDOUT = f"""
WITH assigned AS (
  SELECT lang, n_chars, doc_id,
         CASE WHEN ({_duck_u16('split:', 'doc_id')}) < 52429 THEN 'train'
              WHEN ({_duck_u16('split:', 'doc_id')}) < 58982 THEN 'valid'
              ELSE 'test' END AS split
  FROM documents
)
SELECT lang, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM assigned GROUP BY lang, split
"""


def q_llm_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-LEAKAGE audit — the DQ check a training pipeline runs
    after splitting: are any NEAR-DUPLICATE pairs straddling the
    train/valid/test boundary? A held-out doc whose near-copy sits in
    train silently inflates eval numbers; the production fix is
    cluster-level splitting, and this audit is how the violation is
    detected. Composes two existing stages: banded MinHash-LSH
    candidates → exact-Jaccard ≥ 0.5 verification (the same verified
    pair stream the dedup clusters use), then each pair is classified
    by its endpoints' salted-hash splits (canonically ordered), with
    `is_leak` marking cross-split rows.

    Scale: pair volume is LSH-bounded; the split assignment is one
    map-side expression per endpoint; the classification is one
    6-row-output aggregation. The checksum pins the exact pair set
    per class."""
    from .llm_pipeline import _docs_shingled, _lsh_candidates, _shared, _verified_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    sh = _shared(_docs_shingled(spark, sf_dir))
    pairs = _verified_pairs(_lsh_candidates(sh), sh, 0.5).select(
        "doc_a", "doc_b"
    )
    splits = docs.withColumn("split", _split_case_spark())
    classified = (
        pairs.join(
            splits.selectExpr("doc_id AS doc_a", "split AS sa"), "doc_a"
        )
        .join(splits.selectExpr("doc_id AS doc_b", "split AS sb"), "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "least(sa, sb) AS split_lo",
            "greatest(sa, sb) AS split_hi",
        )
    )
    return classified.groupBy("split_lo", "split_hi").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.col("doc_a") + F.col("doc_b"))
        .cast("bigint")
        .alias("pair_checksum"),
        F.max(
            F.when(F.col("split_lo") != F.col("split_hi"), 1).otherwise(0)
        )
        .cast("int")
        .alias("is_leak"),
    )


def _oracle_split_leakage() -> str:
    from .llm_pipeline import _SQL_BASE, _sql_lsh_pairs

    return f"""
WITH {_SQL_BASE},
{_sql_lsh_pairs("shing", "m")},
assigned AS (
  SELECT doc_id,
         CASE WHEN ({_duck_u16('split:', 'doc_id')}) < 52429 THEN 'train'
              WHEN ({_duck_u16('split:', 'doc_id')}) < 58982 THEN 'valid'
              ELSE 'test' END AS split
  FROM documents
),
classified AS (
  SELECT p.doc_a, p.doc_b,
         least(a.split, b.split) AS split_lo,
         greatest(a.split, b.split) AS split_hi
  FROM mpairs p
  JOIN assigned a ON a.doc_id = p.doc_a
  JOIN assigned b ON b.doc_id = p.doc_b
)
SELECT split_lo, split_hi,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(doc_a + doc_b) AS BIGINT) AS pair_checksum,
       CAST(max(CASE WHEN split_lo <> split_hi THEN 1 ELSE 0 END) AS INT)
         AS is_leak
FROM classified GROUP BY split_lo, split_hi
"""


def q_llm_export_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sharded training export: shard =
    md5-u16(doc_id) % 8, repartitioned BY THE SHARD COLUMN (the one
    export shuffle — each shard's rows co-located so the writer emits
    one file per shard directory, not tasks × shards fragments), then
    written ``partitionBy("shard")`` and RE-READ for the audit — the
    green row certifies the round-trip, not the pre-write frame.

    At 100 TB this is the terminal pipeline stage: the hash is
    map-side, the single shuffle is the unavoidable co-location, and
    shard assignment is stable under corpus growth (new docs spread
    uniformly; old docs never move shards — resumable exports).
    The balance audit is inline: an 8-way md5 split of a uniform id
    space stays within mundane bounds, asserted loudly.
    """
    import os

    from .signed_queries import _cagg_state_dir

    docs = load_table(spark, sf_dir, "documents")
    u16 = _split_u16_spark()
    out = os.path.join(_cagg_state_dir(), "shards")
    (
        docs.withColumn("shard", (u16 % 8).cast("int"))
        .repartition("shard")
        .write.partitionBy("shard")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    # one parquet directory per shard — the export actually sharded
    assert len({f.rsplit("/shard=", 1)[1].split("/")[0] for f in back.inputFiles()}) == 8
    res = back.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    rows = res.collect()  # 8 rows — bounded audit, not a data collect
    ns = [r["n_docs"] for r in rows]
    assert len(ns) == 8 and max(ns) <= 3 * min(ns), f"shard skew: {ns}"
    return spark.createDataFrame(rows, res.schema)


ORACLE_EXPORT_TRAINING_SHARDS = f"""
WITH assigned AS (
  SELECT doc_id, lang, n_chars,
         CAST(({_duck_u16('split:', 'doc_id')}) % 8 AS INT) AS shard
  FROM documents
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM assigned GROUP BY shard
"""


def q_llm_export_shards_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESUMABLE-export property, proven: export a base corpus,
    then append ONLY the late-arriving documents — because shard
    assignment is a pure hash of the stable doc_id, old documents
    never move shards, so the increment is an append of new files
    into existing shard directories and every pre-existing file stays
    BYTE-IDENTICAL (hashed before/after, asserted inline). The final
    audit equals a from-scratch export of the full corpus (the
    oracle), which is the whole contract: at 100 TB a nightly corpus
    delta costs O(delta) write bytes, never a re-export.
    """
    import hashlib
    import os

    from .signed_queries import _cagg_state_dir

    docs = load_table(spark, sf_dir, "documents")
    u16 = _split_u16_spark()
    out = os.path.join(_cagg_state_dir(), "shards")
    base = docs.where("doc_id % 10 != 9")
    late = docs.where("doc_id % 10 = 9")

    def export(df):
        (
            df.withColumn("shard", (u16 % 8).cast("int"))
            .repartition("shard")
            .write.mode("append")
            .partitionBy("shard")
            .parquet(out)
        )

    def file_hashes() -> dict[str, str]:
        state = {}
        for root, _, names in os.walk(out):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    with open(p, "rb") as fh:
                        state[p] = hashlib.md5(fh.read()).hexdigest()
        return state

    export(base)
    before = file_hashes()
    export(late)
    after = file_hashes()
    # incremental = strictly additive: every base file untouched
    assert set(before) <= set(after)
    changed = [p for p in before if after[p] != before[p]]
    assert not changed, f"incremental export rewrote base files: {changed}"
    back = spark.read.parquet(out)
    return back.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )


# identical to the one-shot export oracle: increment == full recompute
ORACLE_EXPORT_SHARDS_INCREMENTAL = ORACLE_EXPORT_TRAINING_SHARDS


def ordered_export(spark: SparkSession, docs: DataFrame, out: str) -> DataFrame:
    """Key, range-shard, sort, and write one globally-ordered corpus
    epoch; returns the read-back frame. See
    ``q_llm_export_ordered_shards`` for the full design rationale."""
    u16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("order:"), F.col("doc_id").cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")
    (
        docs.withColumn("sort_key", u16)
        .withColumn("shard", (F.col("sort_key") / 8192).cast("int"))
        .repartition("shard")
        # the sort LEADS with the partition column: the dynamic-
        # partition writer requires rows ordered by partition cols and
        # would otherwise inject its own (non-stable) sort, destroying
        # the key order; with shard first, our sort satisfies the
        # writer's requirement and survives to the file bytes.
        .sortWithinPartitions("shard", "sort_key", "doc_id")
        .write.partitionBy("shard")
        .parquet(out)
    )
    return spark.read.parquet(out)


def q_llm_export_ordered_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL training order: every document gets a
    portable pseudo-random sort key (md5 u16, salt ``order:`` —
    independent of the split/shard hashes), shards are FIXED RANGE
    cuts of the key space (u16 // 8192 → 8 shards), and each shard is
    written as one internally-sorted file — so reading shard 0..7 in
    filename order replays one globally-shuffled, perfectly
    reproducible epoch. This is how a training pipeline randomizes
    data order WITHOUT a nondeterministic shuffle: same corpus → same
    order, on any cluster, after any repartition; new documents
    splice into their key positions without reordering anything else.

    Plan: one map-side key computation, one range co-location
    shuffle, one sort-within-partition (range cuts make shards
    contiguous key intervals, so within-shard sort = global sort).
    The returned audit pins the interval property (per-shard min/max
    never overlap — visible in the oracle row) and membership
    (id checksum); the within-file ordering gate is pytest-pinned
    (tests read the parquet back with row order preserved)."""
    import os

    from .signed_queries import _cagg_state_dir

    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(_cagg_state_dir(), "ordered")
    back = ordered_export(spark, docs, out)
    return back.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("sort_key").cast("bigint").alias("min_key"),
        F.max("sort_key").cast("bigint").alias("max_key"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


ORACLE_EXPORT_ORDERED_SHARDS = f"""
WITH keyed AS (
  SELECT doc_id, ({_duck_u16('order:', 'doc_id')}) AS sort_key
  FROM documents
)
SELECT CAST(sort_key // 8192 AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(sort_key) AS BIGINT) AS min_key,
       CAST(max(sort_key) AS BIGINT) AS max_key,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM keyed GROUP BY 1
"""


def q_llm_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weights for a training run: waterfill an integer token
    budget across (lang, source) domains — the sampling-proportions
    step every pretraining data recipe runs (cap the giant web crawl,
    keep the small high-quality domains whole).

    Semantics (classic waterfilling, closed form via one sort):
    budget N = half the corpus' whitespace tokens; every domain
    contributes min(avail, cap) where cap is the LARGEST integer with
    sum(min(avail, cap)) <= N. cap falls out of one ascending sort +
    prefix sums: walking domains smallest-first, the first rank t
    where floor((N - prefix_before) / domains_remaining) < avail_t
    cannot be fully funded, and that quotient IS cap (for i < t the
    quotient funds avail_i fully, so allocation = avail there).

    Everything is BIGINT arithmetic (counts, prefix sums, one integer
    division) — bit-exact in both engines. Scale shape: one
    aggregation to per-domain counts (map-side combined), then ALL
    waterfill math runs on the |domains|-row synopsis (window over a
    broadcast-sized frame, one-row scalar cross joins) — the corpus
    is scanned exactly once regardless of size."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    domains = (
        docs.selectExpr("lang", "source", f"{_NORM} AS norm")
        .selectExpr(
            "lang", "source",
            f"CAST(size({text.words('norm')}) AS BIGINT) AS toks",
        )
        .groupBy("lang", "source")
        .agg(F.sum("toks").cast("bigint").alias("avail"))
    )
    totals = domains.agg(
        F.count("*").cast("bigint").alias("k"),
        # integer division end-to-end: float /2 then cast rounds
        # past 2^53, diverging from the oracle's exact // 2
        F.expr("sum(avail) DIV 2").alias("budget"),
    )
    w = Window.orderBy("avail", "lang", "source")
    ranked = (
        domains.crossJoin(F.broadcast(totals))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "prefix_before",
            F.coalesce(
                F.sum("avail").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint"),
        )
        .withColumn(
            "cand", F.expr("(budget - prefix_before) DIV (k - rn + 1)")
        )
    )
    # cap = the candidate at the FIRST rank the uniform split cannot
    # fully fund (1-row broadcast; empty → budget >= total, no cap)
    cap = (
        ranked.where("cand < avail")
        .orderBy("rn")
        .limit(1)
        .selectExpr("cand AS cap")
    )
    return (
        # LEFT join on TRUE, not a cross join: when NO rank violates
        # (budget >= total corpus) the cap frame is EMPTY and a cross
        # join would drop every domain — the left join supplies the
        # NULL cap that coalesce() reads as "fully funded". Caught by
        # tests/test_mixture_property.py.
        ranked.join(F.broadcast(cap), F.lit(True), "left")
        .selectExpr(
            "lang",
            "source",
            "avail AS avail_tokens",
            "CAST(least(avail, coalesce(cap, avail)) AS BIGINT) "
            "AS alloc_tokens",
            "CAST(CASE WHEN cap IS NOT NULL AND avail > cap "
            "THEN 1 ELSE 0 END AS BIGINT) AS capped",
        )
    )


ORACLE_MIXTURE_BUDGET = rf"""
WITH norm AS (
  SELECT lang, source,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
domains AS (
  SELECT lang, source,
         CAST(sum(len(string_split(norm, ' '))) AS BIGINT) AS avail
  FROM norm GROUP BY lang, source
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(avail) // 2 AS BIGINT) AS budget
  FROM domains
),
ranked AS (
  SELECT d.*, t.k, t.budget,
         row_number() OVER w AS rn,
         COALESCE(sum(avail) OVER (
             ORDER BY avail, lang, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prefix_before
  FROM domains d CROSS JOIN totals t
  WINDOW w AS (ORDER BY avail, lang, source)
),
cand AS (
  SELECT *, (budget - prefix_before) // (k - rn + 1) AS cand FROM ranked
),
cap AS (
  SELECT cand AS cap FROM cand WHERE cand < avail ORDER BY rn LIMIT 1
)
SELECT lang, source, avail AS avail_tokens,
       CAST(least(avail, COALESCE(cap, avail)) AS BIGINT) AS alloc_tokens,
       CAST(CASE WHEN cap IS NOT NULL AND avail > cap THEN 1 ELSE 0 END
            AS BIGINT) AS capped
FROM cand LEFT JOIN cap ON TRUE
"""


def q_llm_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture quotas — the OTHER standard
    pretraining sampling rule (multilingual recipes up-sample small
    domains: quota_i ∝ avail_i^τ; here τ = 0.5, so the weight is an
    integer sqrt): each (lang, source) domain gets an integer token
    QUOTA out of budget N = Σavail/2, allotted by the LARGEST
    REMAINDER method so Σquota == N EXACTLY. A quota above a domain's
    available tokens means the domain REPEATS across epochs
    (up-sampling — flagged); big domains get proportionally less than
    linear (down-sampling). Unlike ``llm_mixture_budget`` (hard cap,
    never up-samples), this is the smooth-reweighting recipe.

    Engine-exactness: the weight is floor(sqrt(avail)) — sqrt is
    IEEE-correctly-rounded in both engines, so the floor is
    bit-identical — and everything after is BIGINT (base share =
    N·w DIV W, remainder ranked by N·w MOD W desc). Scale shape: one
    map-side-combined count pass over the corpus; all quota math on
    the |domains|-row synopsis."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    domains = (
        docs.selectExpr("lang", "source", f"{_NORM} AS norm")
        .selectExpr(
            "lang", "source",
            f"CAST(size({text.words('norm')}) AS BIGINT) AS toks",
        )
        .groupBy("lang", "source")
        .agg(F.sum("toks").cast("bigint").alias("avail"))
        .withColumn(
            "w",
            F.expr(
                "CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT)"
            ),
        )
    )
    totals = domains.agg(
        # integer division end-to-end: float /2 then cast rounds
        # past 2^53, diverging from the oracle's exact // 2
        F.expr("sum(avail) DIV 2").alias("budget"),
        F.sum("w").cast("bigint").alias("tot_w"),
    )
    based = (
        domains.crossJoin(F.broadcast(totals))
        .withColumn("base", F.expr("(budget * w) DIV tot_w"))
        .withColumn("frac", F.expr("(budget * w) % tot_w"))
    )
    leftover = based.agg(
        (F.max("budget") - F.sum("base")).cast("bigint").alias("r")
    )
    w_rank = Window.orderBy(F.desc("frac"), F.asc("lang"), F.asc("source"))
    return (
        based.crossJoin(F.broadcast(leftover))
        .withColumn("rn", F.row_number().over(w_rank).cast("bigint"))
        .selectExpr(
            "lang",
            "source",
            "avail AS avail_tokens",
            "w AS weight",
            "CAST(base + CASE WHEN rn <= r THEN 1 ELSE 0 END AS BIGINT) "
            "AS quota_tokens",
            "CAST(CASE WHEN base + CASE WHEN rn <= r THEN 1 ELSE 0 END "
            "> avail THEN 1 ELSE 0 END AS BIGINT) AS upsampled",
        )
    )


ORACLE_SAMPLE_TEMPERATURE = rf"""
WITH norm AS (
  SELECT lang, source,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
),
domains AS (
  SELECT lang, source,
         CAST(sum(len(string_split(norm, ' '))) AS BIGINT) AS avail
  FROM norm GROUP BY lang, source
),
wts AS (
  SELECT *, CAST(floor(sqrt(avail::DOUBLE)) AS BIGINT) AS w FROM domains
),
totals AS (
  SELECT CAST(sum(avail) // 2 AS BIGINT) AS budget,
         CAST(sum(w) AS BIGINT) AS tot_w
  FROM wts
),
based AS (
  SELECT d.*, t.budget, t.tot_w,
         (t.budget * d.w) // t.tot_w AS base,
         (t.budget * d.w) % t.tot_w AS frac
  FROM wts d CROSS JOIN totals t
),
leftover AS (SELECT max(budget) - sum(base) AS r FROM based),
ranked AS (
  SELECT b.*, l.r,
         row_number() OVER (ORDER BY frac DESC, lang, source) AS rn
  FROM based b CROSS JOIN leftover l
)
SELECT lang, source, avail AS avail_tokens, w AS weight,
       CAST(base + CASE WHEN rn <= r THEN 1 ELSE 0 END AS BIGINT)
         AS quota_tokens,
       CAST(CASE WHEN base + CASE WHEN rn <= r THEN 1 ELSE 0 END > avail
            THEN 1 ELSE 0 END AS BIGINT) AS upsampled
FROM ranked
"""


def queries_and_oracles():
    queries = {
        "llm_decontaminate": q_llm_decontaminate,
        "llm_quality_repetition": q_llm_quality_repetition,
        "llm_sample_stratified": q_llm_sample_stratified,
        "llm_pack_sequences": q_llm_pack_sequences,
        "llm_pii_scrub": q_llm_pii_scrub,
        "llm_semantic_kmeans": q_llm_semantic_kmeans,
        "llm_dedup_semantic": q_llm_dedup_semantic,
        "llm_sample_diverse": q_llm_sample_diverse,
        "llm_metadata_audit": q_llm_metadata_audit,
        "llm_corpus_funnel": q_llm_corpus_funnel,
        "llm_table_profile": q_llm_table_profile,
        "llm_split_train_holdout": q_llm_split_train_holdout,
        "llm_split_leakage_audit": q_llm_split_leakage_audit,
        "llm_export_training_shards": q_llm_export_training_shards,
        "llm_export_shards_incremental": q_llm_export_shards_incremental,
        "llm_export_ordered_shards": q_llm_export_ordered_shards,
        "llm_mixture_budget": q_llm_mixture_budget,
        "llm_sample_temperature": q_llm_sample_temperature,
    }
    oracles = {
        "llm_decontaminate": ORACLE_DECONTAMINATE,
        "llm_quality_repetition": ORACLE_QUALITY_REPETITION,
        "llm_sample_stratified": ORACLE_SAMPLE_STRATIFIED,
        "llm_pack_sequences": ORACLE_PACK_SEQUENCES,
        "llm_pii_scrub": ORACLE_PII_SCRUB,
        "llm_semantic_kmeans": ORACLE_SEMANTIC_KMEANS,
        "llm_dedup_semantic": ORACLE_DEDUP_SEMANTIC,
        "llm_sample_diverse": ORACLE_SAMPLE_DIVERSE,
        "llm_metadata_audit": _oracle_metadata_audit(),
        "llm_corpus_funnel": _oracle_corpus_funnel(),
        "llm_table_profile": ORACLE_TABLE_PROFILE,
        "llm_split_train_holdout": ORACLE_SPLIT_TRAIN_HOLDOUT,
        "llm_split_leakage_audit": _oracle_split_leakage(),
        "llm_export_training_shards": ORACLE_EXPORT_TRAINING_SHARDS,
        "llm_export_shards_incremental": ORACLE_EXPORT_SHARDS_INCREMENTAL,
        "llm_export_ordered_shards": ORACLE_EXPORT_ORDERED_SHARDS,
        "llm_mixture_budget": ORACLE_MIXTURE_BUDGET,
        "llm_sample_temperature": ORACLE_SAMPLE_TEMPERATURE,
    }
    return queries, oracles
