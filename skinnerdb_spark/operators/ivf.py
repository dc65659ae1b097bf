"""IVF (inverted-file) ANN index — the k-means-partitioned scale path.

sim_lsh_* partitions the corpus by random hyperplanes; IVF partitions by
learned k-means centroids, which adapts to the data distribution and is what
production vector stores (FAISS IVF, Milvus) do. Train/assign/search:

- train: Lloyd iterations on a bounded deterministic sample (driver-side
  numpy — at 100 TB you train on a sample regardless of engine);
- assign: one broadcast of the centroid matrix + argmax-dot per row inside
  mapInPandas (Arrow/BLAS, no shuffle);
- search: probe the nprobe nearest centroid cells only — candidate cost is
  |corpus| * nprobe / k instead of |corpus|.

This is an ITERATIVE algorithm — k-means has no SQL expression — so its
registry entry is rows-only by the driver contract (the exact-scoring tail
reuses the decimal-exact machinery, and determinism is pinned by fixed seed,
fixed init, and fixed iteration count).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.operators.similarity import (
    TOP_K,  # noqa: F401  (re-export for tests)
    N_QUERIES,
    exact_topk_on_candidates,
)
from skinnerdb_spark.queries.util import read_table
from skinnerdb_spark.registry import register

K_CELLS = 16
N_ITERS = 5
N_PROBE = 2
TRAIN_SAMPLE = 2048  # lowest vec_ids — deterministic sample


def default_index_path(sf_dir: str) -> str:
    """Per-warehouse persisted-index location (inside spark-warehouse so the
    repo checkout stays the only writable root)."""
    import os

    sf_name = os.path.basename(sf_dir.rstrip("/")) or "default"
    return os.path.join("spark-warehouse", f"ivf_index_{sf_name}")


def source_fingerprint(sf_dir: str) -> str:
    """Identity of the embeddings source the index was built from: every
    file's (relpath, size, mtime_ns) under embeddings.parquet, hashed. An
    index whose recorded fingerprint no longer matches is STALE (the corpus
    was rewritten) and must be rebuilt — path-basename keying alone would
    happily serve assignments for vectors that no longer exist."""
    import hashlib
    import os

    src = os.path.join(sf_dir, "embeddings.parquet")
    parts: list[str] = []
    if os.path.isdir(src):
        for root, _, files in sorted(os.walk(src)):
            for fn in sorted(files):
                p = os.path.join(root, fn)
                st = os.stat(p)
                parts.append(f"{os.path.relpath(p, src)}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(src):
        st = os.stat(src)
        parts.append(f"{os.path.basename(src)}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def train_centroids(train: np.ndarray, k: int = K_CELLS, iters: int = N_ITERS) -> np.ndarray:
    """Plain Lloyd k-means on unit-normalized vectors (spherical k-means).
    Deterministic: init = first k training rows, fixed iteration count."""
    x = train / np.linalg.norm(train, axis=1, keepdims=True)
    c = x[:k].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    c[j] = m / n
    return c


def assign_cells(e: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment, Arrow-batched BLAS."""
    bc = e.sparkSession.sparkContext.broadcast(centroids)

    def gen(batches):
        c = bc.value
        for pdf in batches:
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": np.argmax(m @ c.T, axis=1).astype("int64")}
            )

    return e.select("vec_id", "embedding").mapInPandas(gen, "vec_id long, cell long")


def build_ivf_index(spark: SparkSession, e: DataFrame, path: str) -> None:
    """Persist an IVF index: centroid matrix + per-vector cell assignments,
    both as parquet. The durable analogue of the reference's `index all`
    (src/indexing/Indexer.java — which rebuilds RAM indexes every session);
    here the index survives restarts and is shared cluster-wide."""
    train_pdf = (
        e.filter(F.col("vec_id") < TRAIN_SAMPLE).select("vec_id", "embedding").toPandas()
    )
    train = np.array(train_pdf.sort_values("vec_id")["embedding"].tolist(), dtype=np.float64)
    centroids = train_centroids(train)
    cent_pdf = pd.DataFrame(
        {"cell": range(len(centroids)), "centroid": [c.tolist() for c in centroids]}
    )
    spark.createDataFrame(cent_pdf).write.mode("overwrite").parquet(f"{path}/centroids")
    assign_cells(e, centroids).write.mode("overwrite").parquet(f"{path}/assignments")


def _meta_file(path: str) -> str:
    import os

    return os.path.join(path, "_source_fingerprint")


def index_is_fresh(path: str, sf_dir: str) -> bool:
    """True iff a persisted index exists AND was built from the embeddings
    files currently on disk (see :func:`source_fingerprint`)."""
    import os

    if not os.path.isdir(os.path.join(path, "centroids")):
        return False
    try:
        with open(_meta_file(path)) as f:
            return f.read().strip() == source_fingerprint(sf_dir)
    except OSError:
        return False


def load_ivf_index(spark: SparkSession, path: str) -> tuple[np.ndarray, DataFrame]:
    """(centroid matrix, assignments DataFrame) from a persisted index."""
    cent_pdf = spark.read.parquet(f"{path}/centroids").toPandas().sort_values("cell")
    centroids = np.array(cent_pdf["centroid"].tolist(), dtype=np.float64)
    return centroids, spark.read.parquet(f"{path}/assignments")


@register("sim_ivf_ann", None, bench=True, tags=("similarity", "pipeline", "ivf"))
def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: probe the 2 nearest cells per query, exact decimal cosine +
    rank within candidates. Rows-only check (iterative training step).

    Loads the persisted index (centroids + assignments) when present AND
    still matching the source files' fingerprint; builds+persists otherwise
    — repeated invocations never retrain, matching how a production vector
    store amortizes index builds, while a rewritten corpus invalidates the
    index instead of silently serving stale assignments. Training is
    deterministic (fixed sample/init/iterations), so cold and warm paths
    return identical results."""
    import os

    e = read_table(spark, sf_dir, "embeddings")
    path = default_index_path(sf_dir)
    if not index_is_fresh(path, sf_dir):
        build_ivf_index(spark, e, path)
        os.makedirs(path, exist_ok=True)
        with open(_meta_file(path), "w") as f:
            f.write(source_fingerprint(sf_dir))
    centroids, cells = load_ivf_index(spark, path)

    # query -> its nprobe nearest cells
    q_pdf = e.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").toPandas()
    qm = np.array(q_pdf["embedding"].tolist(), dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    probe_rows = [
        {"query_id": int(v), "cell": int(c)}
        for v, sims in zip(q_pdf["vec_id"], qm @ centroids.T)
        for c in np.argsort(-sims)[:N_PROBE]
    ]
    probes = spark.createDataFrame(pd.DataFrame(probe_rows))

    cand = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    return exact_topk_on_candidates(e, cand)
