"""Property tests for the round-6 winnowing and CDC-compaction ops.

- Winnowing selection (pot_spark/queries/llm_dedup.py:_winnow_sel_df) must
  equal an independent pure-Python implementation of robust winnowing
  (Schleimer et al. 2003: per-window min hash, rightmost on ties) — this
  pins the arithmetic tie-break encoding (h * 2^20 + (2^20-1 - pos)).
- The MOSS guarantee: two docs sharing a token run of length >= w + k - 1
  (= 6) always share at least one selected fingerprint.
- CDC compaction's max(struct) latest-wins must equal a sequential
  replay model — this pins the lexicographic-struct-ordering assumption
  that makes the plan partial-aggregable.
"""

from __future__ import annotations

import datetime
import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pot_spark import registry

registry.load_all_query_modules()

from pot_spark.queries.llm_dedup import _WIN_W, _winnow_sel_df  # noqa: E402
from pot_spark.queries.scale_ops import _cdc_compact_df  # noqa: E402

_K = 3  # shingle size used by _winnow_sel_df


def _lane(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _model_winnow(tokens: list[str]) -> set[int]:
    """Independent robust winnowing: min per window, rightmost on ties."""
    if len(tokens) < _K:
        return set()
    hs = [
        _lane(" ".join(tokens[i : i + _K]))
        for i in range(len(tokens) - _K + 1)
    ]
    sel: set[int] = set()
    for s in range(0, len(hs) - _WIN_W + 1):
        window = hs[s : s + _WIN_W]
        m = min(window)
        sel.add(m)  # fingerprint identity is the selected hash
    return sel


_tok = st.sampled_from(["a", "b", "c", "dd", "ee", "ff", "the", "x1"])
_docs = st.lists(
    st.lists(_tok, min_size=0, max_size=24), min_size=1, max_size=8
)


@settings(max_examples=10, deadline=None)
@given(docs=_docs)
def test_winnow_selection_equals_model(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in _winnow_sel_df(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, toks in enumerate(docs):
        assert got.get(i, set()) == _model_winnow(toks), (i, toks)


@settings(max_examples=10, deadline=None)
@given(
    run=st.lists(_tok, min_size=_WIN_W + _K - 1, max_size=10),
    pre_a=st.lists(_tok, min_size=0, max_size=8),
    post_a=st.lists(_tok, min_size=0, max_size=8),
    pre_b=st.lists(_tok, min_size=0, max_size=8),
    post_b=st.lists(_tok, min_size=0, max_size=8),
)
def test_winnow_guarantee_shared_run_detected(
    spark, run, pre_a, post_a, pre_b, post_b
):
    """Any shared run of >= w + k - 1 tokens yields a shared fingerprint
    (the run contains a full window; its rightmost-min is the same
    relative gram in both docs)."""
    a = " ".join(pre_a + run + post_a)
    b = " ".join(pre_b + run + post_b)
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    sel = {
        (r["doc_id"], r["fp"]) for r in _winnow_sel_df(df).collect()
    }
    fp0 = {fp for d, fp in sel if d == 0}
    fp1 = {fp for d, fp in sel if d == 1}
    assert fp0 & fp1, (a, b)


_log = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user_id
        st.sampled_from(["A", "B"]),  # event_type
        st.integers(min_value=0, max_value=50),  # ts offset (sec)
        st.integers(min_value=0, max_value=500),  # value cents
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(log=_log)
def test_cdc_compact_equals_sequential_replay(spark, log):
    """max(struct(ts, event_id, op, value)) latest-wins == replaying the
    log in (ts, event_id) order into a dict, per key."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=ts), u, et, v / 100.0, "{}")
        for i, (u, et, ts, v) in enumerate(log)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    # sequential replay model
    state: dict[tuple[int, str], tuple[str, float]] = {}
    for i, (u, et, ts, v) in sorted(
        enumerate(log), key=lambda p: (p[1][2], p[0])
    ):
        op = "D" if i % 7 == 0 else "U"
        state[(u, et)] = (op, v / 100.0)
    want: dict[str, tuple[int, int, float]] = {}
    for (u, et), (op, v) in state.items():
        live, dead, sv = want.get(et, (0, 0, 0.0))
        if op == "U":
            want[et] = (live + 1, dead, round(sv + v, 6))
        else:
            want[et] = (live, dead + 1, sv)
    got = {
        r["event_type"]: (
            r["n_live"],
            r["n_tombstoned"],
            r["sum_live_value"],
        )
        for r in _cdc_compact_df(df).collect()
    }
    assert set(got) == set(want)
    for et, (live, dead, sv) in want.items():
        gl, gd, gsv = got[et]
        assert (gl, gd) == (live, dead), et
        if live:
            assert abs((gsv or 0.0) - sv) < 1e-6, et
        else:
            assert gsv is None


def test_winnow_rejects_docs_past_position_lane(spark):
    """The packed tie-break key reserves 2^20 for the position lane; a
    doc with more token positions must fail LOUDLY (advisor round 6: the
    invariant was prose-only), never silently corrupt fingerprints."""
    import pytest
    from pyspark.sql import functions as F

    from pot_spark.queries.llm_dedup import _POS_M, _winnow_sel_df

    big = spark.range(1).select(
        F.lit(7).alias("doc_id"),
        F.array_join(F.array_repeat(F.lit("tok"), _POS_M + 4), " ").alias(
            "text"
        ),
    )
    with pytest.raises(Exception, match="pre-chunk"):
        _winnow_sel_df(big).count()
