"""Property tests (hypothesis) for the PQ and NB-classifier primitives:

- the classifier's md5 feature bucket (Python hashlib model) matches its
  DuckDB SQL fragment for arbitrary token strings — the twin primitive
  the q91 gate rests on;
- PQ quantization is a projection: encoding a RECONSTRUCTED vector
  returns the same codes (idempotence on codebook points), and the ADC
  distance from a reconstructed probe to its own codes is exactly the
  sum of per-subspace zeros;
- NB log-odds are bounded by the smoothing (|logodds| <= ln(c_max + 1)
  with add-one over the bucket space) and the prior's sign follows the
  class balance.

Pure-Python models of driver-side math — no Spark session needed; the
Spark execution paths are pinned in test_pq.py / test_classifier.py.
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from entangledb_spark.operators.classifier import N_CLS_BUCKETS, bucket_sql

_EXAMPLES = int(os.environ.get("ENTANGLE_FUZZ_EXAMPLES", "25"))

_con = duckdb.connect()


def _py_bucket(tok: str, n: int = N_CLS_BUCKETS) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:7], 16) % n


@given(
    st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=200, deadline=None)
def test_md5_bucket_matches_duckdb(tok):
    """hashlib model == the oracle's SQL fragment, for any [a-z]+ token
    (the only tokens CLS_TOKEN_RE can produce)."""
    lit = "'" + tok + "'"
    got = _con.execute(f"SELECT {bucket_sql(lit)}").fetchone()[0]
    assert int(got) == _py_bucket(tok), tok


@st.composite
def _codebooks(draw):
    m = draw(st.integers(min_value=1, max_value=3))
    dsub = draw(st.integers(min_value=1, max_value=3))
    ksub = draw(st.integers(min_value=1, max_value=4))
    f = st.floats(
        min_value=-8, max_value=8, allow_nan=False, allow_infinity=False
    )
    cbs = []
    for _ in range(m):
        cents = draw(
            st.lists(
                st.lists(f, min_size=dsub, max_size=dsub),
                min_size=ksub,
                max_size=ksub,
                unique_by=lambda v: tuple(v),
            )
        )
        cbs.append(list(enumerate(cents)))
    return {"m": m, "dsub": dsub, "ksub": ksub, "codebooks": cbs}


def _py_encode(vec, model):
    m, dsub = model["m"], model["dsub"]
    out = []
    for j in range(m):
        xj = vec[j * dsub : (j + 1) * dsub]
        best = min(
            (sum((a - b) ** 2 for a, b in zip(xj, cent)), code)
            for code, cent in model["codebooks"][j]
        )
        out.append(best[1])
    return out


def _py_reconstruct(codes, model):
    out = []
    for j, c in enumerate(codes):
        out.extend(dict(model["codebooks"][j])[c])
    return out


@given(_codebooks(), st.data())
@settings(max_examples=_EXAMPLES, deadline=None)
def test_pq_quantization_is_a_projection(model, data):
    """encode(reconstruct(encode(x))) == encode(x): quantizing twice
    changes nothing, and a reconstructed vector is its own codeword
    (ADC distance to itself = 0)."""
    d = model["m"] * model["dsub"]
    vec = data.draw(
        st.lists(
            st.floats(
                min_value=-8, max_value=8, allow_nan=False, allow_infinity=False
            ),
            min_size=d,
            max_size=d,
        )
    )
    codes = _py_encode(vec, model)
    recon = _py_reconstruct(codes, model)
    assert _py_encode(recon, model) == codes
    assert all(
        math.isclose(
            sum(
                (a - b) ** 2
                for a, b in zip(
                    recon[j * model["dsub"] : (j + 1) * model["dsub"]],
                    dict(model["codebooks"][j])[codes[j]],
                )
            ),
            0.0,
            abs_tol=0.0,
        )
        for j in range(model["m"])
    )


@given(
    st.integers(min_value=1, max_value=1000),
    st.integers(min_value=1, max_value=1000),
    st.lists(st.integers(min_value=0, max_value=100), min_size=4, max_size=4),
)
@settings(max_examples=_EXAMPLES, deadline=None)
def test_nb_math_bounds(n1, n0, counts):
    """Add-one smoothing bounds every log-odds by ln(c+1) terms; the
    prior's sign follows the class balance exactly."""
    nb = 4
    c1, c0 = counts[:2], counts[2:]
    t1, t0 = sum(c1), sum(c0)
    for b in range(2):
        lo = math.log((c1[b] + 1) / (t1 + nb)) - math.log(
            (c0[b] + 1) / (t0 + nb)
        )
        bound = math.log(max(c1[b], c0[b]) + 1) + math.log(
            max(t1, t0) + nb
        )
        assert abs(lo) <= bound + 1e-12
    prior = math.log(n1 / n0)
    assert (prior > 0) == (n1 > n0)
    assert (prior == 0) == (n1 == n0)
