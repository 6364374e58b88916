"""Independent driver-side recomputation oracles for the iterative
(k-means-based) gate queries — `semantic_dedup` and `diversity_sample`.

These two were the last rows-only entries in the contract: k-means is
iterative and not SQL-expressible, but under the repo's determinism
discipline (hash-selected, id-ordered training samples; seeded Lloyd; hash
tie-breaking everywhere — ops/sampling.py, ops/dedup.py) both pipelines are
pure functions of the DATA. So the oracle recomputes the expected output
here, in plain numpy, WITHOUT importing the engine's implementation
(`ops.dedup`, `ops.sampling`, `indices.vector` are never imported), and
states it as a VALUES table — the `media_features` pattern.

Because the same SQL string must be valid for whichever sf dir the gate
registered its views over, each VALUES row is tagged with a content
signature of its source table — `(count(*), sum(floor(embedding[1]*1000)))`,
an integer pair that is order-independent, exact in IEEE double on both
DuckDB and Python, and distinct across the three test fixtures — and the
SQL joins the signature of the live `embeddings` view against it. An
unknown table matches no branch and fails the gate loudly (0 rows) instead
of silently passing.

Reference parity note: the reference has no oracle layer at all; this
module exists for the correctness gate contract (driver + judge), cited
from VERDICT.md round-7 item 4.

DRIFT TRAP — read this first if `semantic_dedup` or `diversity_sample`
hash-mismatches: this module MIRRORS the engine's numeric contract by
design, so the most likely cause is engine-side numeric drift, not a
broken oracle. The mirrored constants/disciplines are: float32 distance
arithmetic in Lloyd's assignment step (`_lloyd` casts to float32 like
indices/vector.py), the hash-selected id-ordered training sample and its
size cap, the seeded centroid init (same md5-derived ordering as
ops/dedup.py), lowest-index tie-breaking on equal distances, and BUCKETS
= 1_000_000 (ops/sampling.py). If any of those change engine-side —
e.g. a float64 refactor, a new sampling seed, a different tie-break —
the gate will fail HERE first; update the mirror in the same commit as
the engine change, never independently.
"""

from __future__ import annotations

import glob
import hashlib
import math
import os

BUCKETS = 1_000_000  # must mirror ops/sampling.py BUCKETS (gate parity)

_TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def _bucket(seed: str, ident: int) -> int:
    """Pure-Python twin of ops.sampling._bucket: md5('{seed}:{id}') first
    12 hex chars as an integer, mod BUCKETS. Re-derived from the hash
    definition, not imported."""
    h = hashlib.md5(f"{seed}:{ident}".encode()).hexdigest()[:12]
    return int(h, 16) % BUCKETS


def _lloyd(x, k: int, iters: int, seed: int):
    """Independent Lloyd reimplementation with the engine's numeric
    contract (float32 distances, random-sample init, farthest-point
    re-seed for empty clusters, float64 result). Written against the
    documented algorithm, not copied from indices/vector.py."""
    import numpy as np

    rng = np.random.default_rng(seed)
    x32 = np.ascontiguousarray(x, dtype=np.float32)
    k = min(k, len(x32))
    cents = x32[rng.choice(len(x32), size=k, replace=False)].copy()
    batch = min(len(x32), max(8 * k, 32_768))
    use_minibatch = len(x32) > batch
    for _ in range(iters):
        xb = (
            x32[rng.choice(len(x32), size=batch, replace=False)]
            if use_minibatch
            else x32
        )
        cn = (cents * cents).sum(axis=1)
        assign = (cn[None, :] - 2.0 * (xb @ cents.T)).argmin(axis=1)
        sums = np.zeros_like(cents)
        counts = np.bincount(assign, minlength=k).astype(np.float32)
        np.add.at(sums, assign, xb)
        nonempty = counts > 0
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        if not nonempty.all():
            d = ((xb - cents[assign]) ** 2).sum(axis=1)
            far = np.argsort(-d)[: int((~nonempty).sum())]
            cents[~nonempty] = xb[far]
    return cents.astype(np.float64)


def _load_embeddings(path: str):
    """(ids int64, vecs float64 (n,d), labels int32) sorted by vec_id."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding", "label"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.asarray(t.column("label").to_pylist(), dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    return ids[order], vecs[order], labels[order]


def _signature(path: str) -> tuple[int, int]:
    """Integer content signature matching the SQL side exactly:
    (count(*), sum(floor(embedding[1] * 1000))) — embedding[1] is the
    FIRST element (DuckDB lists are 1-based)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["embedding"])
    first = [e[0] for e in t.column("embedding").to_pylist()]
    return len(first), sum(math.floor(float(v) * 1000) for v in first)


def _train_centroids(ids, vecs, k: int, sample_seed: str, lloyd_seed: int):
    """The engine's deterministic-training contract: hash_sample the rows
    (bucket < frac·BUCKETS), order by id, train seeded Lloyd. Falls back
    to the first-k-by-id rows when the sample is smaller than k."""
    import numpy as np

    n = len(ids)
    target = k * 40
    frac = min(1.0, (target * 1.2) / max(n, 1))
    if frac < 1.0:
        thr = int(frac * BUCKETS)
        keep = np.asarray(
            [_bucket(sample_seed, int(i)) < thr for i in ids], dtype=bool
        )
        x = vecs[keep]  # ids are pre-sorted, so this IS id order
    else:
        x = vecs
    if len(x) < k:
        x = vecs[:k]
    return _lloyd(x, k, iters=10, seed=lloyd_seed)


def _assign_clusters(vecs, cents):
    """Nearest-centroid assignment with the engine's executor formula:
    float64 GEMM, ||v||² dropped (constant per row), stable first-min."""
    cn = (cents * cents).sum(axis=1)
    return (cn[None, :] - 2.0 * (vecs @ cents.T)).argmin(axis=1)


def semantic_dedup_expected(path: str, tau: float, rows_per_centroid: int = 64, seed: int = 42):
    """Recompute SemDeDup (cluster → within-cluster cosine ≥ tau →
    connected components → keep min-id representative) for one embeddings
    parquet. Returns kept [(vec_id, label)] sorted by vec_id."""
    import numpy as np

    ids, vecs, labels = _load_embeddings(path)
    n = len(ids)
    k = max(1, min(n // rows_per_centroid, 4096, n))
    cents = _train_centroids(ids, vecs, k, f"ivf:{seed}", seed)
    cid = _assign_clusters(vecs, cents)

    # within-cluster exact cosine pairs (probes=1: each row in exactly one
    # cluster), rounded to 4 decimals like the engine's verify stage
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id root keeps "component = min reachable id" semantics
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for c in np.unique(cid):
        sel = cid == c
        gids = ids[sel]
        if len(gids) < 2:
            continue
        m = vecs[sel]
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sim = m @ m.T
        iu, ju = np.triu_indices(len(gids), k=1)
        cs = np.round(sim[iu, ju], 4)
        hit = cs >= tau
        for a, b in zip(gids[iu[hit]], gids[ju[hit]]):
            union(int(a), int(b))

    losers = {i for i in parent if find(i) != i}
    keep = [
        (int(i), int(lb)) for i, lb in zip(ids, labels) if int(i) not in losers
    ]
    return keep


def diversity_sample_expected(
    path: str,
    rows_per_centroid: int = 64,
    cap_per_cluster: int = 16,
    seed: int = 42,
):
    """Recompute cluster_balanced_sample: cluster every row, keep the
    cap_per_cluster rows with the smallest (hash-bucket, id) per cluster.
    Returns [(vec_id, label, cluster_id)] sorted by vec_id."""
    import numpy as np

    ids, vecs, labels = _load_embeddings(path)
    n = len(ids)
    k = max(1, min(n // rows_per_centroid, 4096, n))
    cents = _train_centroids(ids, vecs, k, f"diversity:{seed}", seed)
    cid = _assign_clusters(vecs, cents)
    out = []
    rank_seed = f"cluster:{seed}"
    for c in np.unique(cid):
        sel = np.where(cid == c)[0]
        ranked = sorted(sel, key=lambda j: (_bucket(rank_seed, int(ids[j])), int(ids[j])))
        for j in ranked[:cap_per_cluster]:
            out.append((int(ids[j]), int(labels[j]), int(c)))
    out.sort()
    return out


def _embedding_paths() -> list[str]:
    return sorted(glob.glob(os.path.join(_TESTDATA_ROOT, "sf*", "embeddings.parquet")))


_SIG_SQL = "count(*) AS n, sum(CAST(floor(embedding[1] * 1000) AS BIGINT)) AS s"


def semantic_dedup_oracle_sql(tau: float) -> str:
    """Signature-branched VALUES oracle over every test-fixture embeddings
    table; matches q_semantic_dedup's (vec_id, label) output."""
    rows = []
    for p in _embedding_paths():
        n, s = _signature(p)
        for vid, lb in semantic_dedup_expected(p, tau):
            rows.append(f"({n}, {s}, {vid}, {lb})")
    if not rows:  # no fixtures visible: degrade to rows-only, not bad SQL
        raise FileNotFoundError(f"no embeddings fixtures under {_TESTDATA_ROOT}")
    return (
        f"WITH sig AS (SELECT {_SIG_SQL} FROM embeddings) "
        "SELECT CAST(t.vec_id AS BIGINT) AS vec_id, CAST(t.label AS INTEGER) AS label "
        "FROM (VALUES " + ", ".join(rows) + ") AS t(n, s, vec_id, label), sig "
        "WHERE t.n = sig.n AND t.s = sig.s ORDER BY vec_id"
    )


def diversity_sample_oracle_sql() -> str:
    """Signature-branched VALUES oracle matching q_diversity_sample's
    (vec_id, label, cluster_id) output."""
    rows = []
    for p in _embedding_paths():
        n, s = _signature(p)
        for vid, lb, c in diversity_sample_expected(p):
            rows.append(f"({n}, {s}, {vid}, {lb}, {c})")
    if not rows:  # no fixtures visible: degrade to rows-only, not bad SQL
        raise FileNotFoundError(f"no embeddings fixtures under {_TESTDATA_ROOT}")
    return (
        f"WITH sig AS (SELECT {_SIG_SQL} FROM embeddings) "
        "SELECT CAST(t.vec_id AS BIGINT) AS vec_id, CAST(t.label AS INTEGER) AS label, "
        "CAST(t.cluster_id AS INTEGER) AS cluster_id "
        "FROM (VALUES " + ", ".join(rows) + ") AS t(n, s, vec_id, label, cluster_id), sig "
        "WHERE t.n = sig.n AND t.s = sig.s ORDER BY vec_id"
    )
