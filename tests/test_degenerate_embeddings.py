"""Degenerate-embeddings sweep: every embedding-consuming operator
must survive a vector corpus containing NULL embeddings, empty arrays,
zero vectors, NULL elements, NaN elements, and ragged (wrong-dim)
vectors — all of which occur in real embedding stores (failed encoder
calls, schema drift, half-written rows).

Same defect class as the round-2 text-operator crashes (degenerate
input that the happy-path fixture never exercises), applied to the
vector side: JVM expression paths mostly 3VL-propagate NULLs safely,
but every numpy-backed stage (``np.array(list(col))``) hard-crashes on
ragged or None entries unless vectors are validated JVM-side first.
"""

from __future__ import annotations

import math
import os
import shutil

import pytest

DIM = 64


def _unit(i: int) -> list[float]:
    # deterministic unit-ish vector
    v = [math.sin(0.1 * i * (j + 1)) for j in range(DIM)]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def degenerate_vectors():
    rows = [(i, _unit(i), i % 5) for i in range(40)]  # valid majority
    rows += [
        (100, None, 0),                       # NULL embedding
        (101, [], 1),                         # empty array
        (102, [0.0] * DIM, 2),                # zero vector (norm 0)
        (103, [None] + [0.5] * (DIM - 1), 3), # NULL element
        (104, [float("nan")] + [0.5] * (DIM - 1), 4),  # NaN element
        (105, [0.1, 0.2, 0.3], 0),            # ragged: wrong dim
        (106, _unit(6), None),                # NULL label
    ]
    return rows


EMB_KEYS_PREFIXES = ("sim_", "emb_")
EMB_KEYS_EXTRA = ("dedup_embed", "dedup_semantic", "sql_recursive_cte")


def _emb_keys():
    import __spark_entry__ as entry

    return sorted(
        k
        for k in entry.queries()
        if k.startswith(EMB_KEYS_PREFIXES) or k in EMB_KEYS_EXTRA
    )


@pytest.fixture(scope="module")
def degenerate_emb_dir(spark, tmp_path_factory):
    """sf0.001 with embeddings.parquet replaced by the degenerate set."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("degenerate_emb_sf")
    for f in os.listdir(src):
        if f != "embeddings.parquet":
            os.symlink(os.path.join(src, f), dst / f)
    df = spark.createDataFrame(
        degenerate_vectors(),
        "vec_id long, embedding array<float>, label int",
    )
    tmp_out = str(dst / "_emb_out")
    df.coalesce(1).write.parquet(tmp_out)
    part = next(p for p in os.listdir(tmp_out) if p.endswith(".parquet"))
    shutil.move(os.path.join(tmp_out, part), dst / "embeddings.parquet")
    shutil.rmtree(tmp_out)
    return str(dst)


@pytest.mark.parametrize("key", _emb_keys())
def test_operator_survives_degenerate_embeddings(
    spark, degenerate_emb_dir, key
):
    import __spark_entry__ as entry

    fn = entry.queries()[key]
    n = fn(spark, degenerate_emb_dir).count()
    assert n >= 0


def test_topk_pandas_drops_only_malformed_vectors(spark, degenerate_emb_dir):
    """The validated path must still rank the 40 well-formed vectors —
    dropping malformed rows, not the whole batch/partition."""
    import __spark_entry__ as entry

    rows = entry.queries()["sim_topk_pandas"](
        spark, degenerate_emb_dir
    ).collect()
    assert rows, "no results from well-formed majority"
    ids = {r[1] for r in rows}  # neighbour id column
    assert not ids & {100, 101, 103, 104, 105}, (
        "malformed vectors must never appear as neighbours"
    )
