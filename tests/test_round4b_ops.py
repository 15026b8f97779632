"""Semantic tests for the round-4 additions: edit-distance NN dedup,
boilerplate scrubbing, linear interpolation."""

from __future__ import annotations

import datetime as dt

import pytest


def _with_docs(spark, module, rows):
    """Run `fn` with documents replaced by an in-memory table."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = module.table
    module.table = lambda s, d, n: df
    return orig


def test_edit_nn_prefers_the_one_edit_neighbor(spark):
    import spark_cep_spark.operators.llm_dedup as D

    rows = [
        (1, "alpha beta gamma delta", "en", "s", 0),
        (2, "alpha beta gamma delpa", "en", "s", 0),  # 1 substitution from 1
        (3, "alpha zzz yyy xxx www", "en", "s", 0),  # same block, far
    ]
    orig = _with_docs(spark, D, rows)
    try:
        out = {
            r["doc_id"]: (r["nn_doc_id"], r["edit_dist"])
            for r in D.dedup_edit_nn(spark, "x").collect()
        }
    finally:
        D.table = orig
    assert out[1] == (2, 1)  # one substitution: 't' -> 'p'
    assert out[2][0] == 1
    # 3 shares the block (same first token, similar length) and gets
    # its nearest-in-block even though it is far
    assert out[3][0] in (1, 2)


def test_edit_nn_isolated_blocks_drop_out(spark):
    import spark_cep_spark.operators.llm_dedup as D

    rows = [
        (1, "alpha beta gamma", "en", "s", 0),
        (2, "omega beta gamma", "en", "s", 0),  # different first token
    ]
    orig = _with_docs(spark, D, rows)
    try:
        assert D.dedup_edit_nn(spark, "x").count() == 0
    finally:
        D.table = orig


def test_scrub_removes_planted_boilerplate_and_keeps_prose(spark):
    import spark_cep_spark.operators.llm_pipeline as P

    footer = "subscribe to newsletter"  # one 3-token chunk
    rows = [
        (1, f"unique prose one {footer}", "en", "s", 0),
        (2, f"other words here {footer}", "en", "s", 0),
        (3, f"third body text {footer}", "en", "s", 0),
        (4, "completely original sentence", "en", "s", 0),
    ]
    orig = _with_docs(spark, P, rows)
    try:
        out = {
            r["doc_id"]: r
            for r in P.pipeline_scrub_boilerplate(spark, "x").collect()
        }
    finally:
        P.table = orig
    # the shared footer chunk (df=3) is scrubbed from every doc
    assert out[1]["clean_text"] == "unique prose one"
    assert out[2]["clean_text"] == "other words here"
    assert out[3]["clean_text"] == "third body text"
    assert out[1]["n_dropped"] == 1 and out[1]["n_chunks"] == 2
    # a unique doc is untouched
    assert out[4]["clean_text"] == "completely original sentence"
    assert out[4]["n_dropped"] == 0


def test_scrub_keeps_fully_scrubbed_and_empty_docs(spark):
    import spark_cep_spark.operators.llm_pipeline as P

    rows = [
        (1, "dup dup dup", "en", "s", 0),
        (2, "dup dup dup", "en", "s", 0),
        (3, "", "en", "s", 0),
    ]
    orig = _with_docs(spark, P, rows)
    try:
        out = {
            r["doc_id"]: r
            for r in P.pipeline_scrub_boilerplate(spark, "x").collect()
        }
    finally:
        P.table = orig
    assert len(out) == 3  # nothing dropped from the corpus
    assert out[1]["clean_text"] == "" and out[1]["n_dropped"] == 1
    assert out[3]["clean_text"] == "" and out[3]["n_chunks"] == 0


def test_interpolate_fills_the_straight_line(spark):
    import spark_cep_spark.operators.aggregates as A

    def ev(eid, hour, etype, value):
        return (eid, dt.datetime(2024, 1, 1, hour), 1, etype, value, "{}")

    rows = [
        ev(1, 0, "click", 10.0),
        ev(2, 3, "click", 40.0),  # hours 1, 2 missing -> 20, 30
        ev(3, 0, "view", 5.0),  # 'view' present only at hour 0
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = A.table
    A.table = lambda s, d, n: df
    try:
        out = {
            (r["event_type"], r["hr"].hour): (r["value_filled"], r["fill_kind"])
            for r in A.rollup_interpolate(spark, "x").collect()
        }
    finally:
        A.table = orig
    assert out[("click", 0)] == (10.0, "present")
    assert out[("click", 1)] == (20.0, "interp")
    assert out[("click", 2)] == (30.0, "interp")
    assert out[("click", 3)] == (40.0, "present")
    # 'view' has no later observation: trailing hours carry the edge
    assert out[("view", 2)] == (5.0, "edge")
    # grid is complete: 2 types x 4 hours
    assert len(out) == 8


def test_maxsim_rewards_local_agreement_over_pooled_dot(spark):
    """A candidate matching one query sub-vector perfectly (and
    orthogonal elsewhere) must outrank a candidate that is uniformly
    mediocre, even when the POOLED dot product says otherwise."""
    import spark_cep_spark.operators.llm_similarity as S
    import math

    dim, sub = 64, 16
    q = [0.0] * dim
    for i in range(sub):  # energy concentrated in sub-vector 0
        q[i] = 1.0 / math.sqrt(sub)
    # candidate A: identical to q in sub-vector 0, zero elsewhere
    a = list(q)
    # candidate B: small positive everywhere -> pooled dot comparable,
    # but every sub-vector match is weak
    b = [1.0 / math.sqrt(dim)] * dim
    rows = [(0, q, 0), (1, a, 0), (2, b, 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    orig = S.table
    S.table = lambda s, d, n: df
    try:
        out = {
            r["rk"]: r["neighbor_id"]
            for r in S.sim_maxsim(spark, "x").collect()
            if r["qid"] == 0
        }
    finally:
        S.table = orig
    assert out[1] == 1  # exact local match wins
    assert out[2] == 2


def test_incremental_dedup_verdicts_on_planted_batch(spark):
    import spark_cep_spark.operators.llm_dedup as D

    base = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta iota"  # last token differs
    rows = [
        (1, base, "en", "s", 0),  # existing corpus
        (2, "one two three four five six", "en", "s", 0),
        # new batch (>= 400)
        (401, base, "en", "s", 0),  # exact dup of 1
        (402, near, "en", "s", 0),  # near dup of 1 (minhash may match)
        (403, "totally different words entirely here now", "en", "s", 0),
        (404, base, "en", "s", 0),  # exact dup again -> still dup_of 1
    ]
    orig = _with_docs(spark, D, rows)
    try:
        out = {
            r["doc_id"]: (r["verdict"], r["dup_of"])
            for r in D.pipeline_incremental_dedup(spark, "x").collect()
        }
    finally:
        D.table = orig
    assert set(out) == {401, 402, 403, 404}
    assert out[401] == ("exact_dup", 1)
    assert out[404] == ("exact_dup", 1)
    assert out[403] == ("kept", None)
    # 402: near-dup only if the 6-hash signature collides; with a
    # single trailing-token change on an 8-token doc, 5 of 6 shingles
    # are shared — signature equality is data-dependent, but the
    # verdict must never be exact_dup and dup_of must be 1 if matched
    v, dof = out[402]
    assert v in ("near_dup", "kept")
    if v == "near_dup":
        assert dof == 1
