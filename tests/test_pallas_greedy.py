"""Fused greedy-decode Pallas kernel vs the scan decode path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioner_tpu.core.config import full_student_config
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.ops import decode as D
from imagecaptioner_tpu.ops.pallas_greedy import pallas_greedy_decode_student

INTERPRET = os.environ.get("IC_TPU_TESTS") != "1"


@pytest.mark.parametrize("V,E,H,B,Lf,T", [
    (50, 16, 24, 2, 9, 8),
    (300, 256, 512, 16, 49, 20),   # production dims
])
def test_pallas_greedy_matches_scan(V, E, H, B, Lf, T):
    cfg = full_student_config(V, embed_size=E, hidden_size=H, dropout=0.0)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, Lf, E)) * 0.3
    ref = D.greedy_decode_student(p, feats, cfg, max_length=T)
    got = pallas_greedy_decode_student(p, feats, cfg, max_length=T,
                                       interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("V,E,H,B,Lf,T", [
    (40, 16, 16, 2, 9, 8),
    (300, 256, 256, 16, 49, 20),   # optimized-trainer production dims
])
def test_pallas_compact_greedy_matches_scan(V, E, H, B, Lf, T):
    from imagecaptioner_tpu.core.config import compact_student_config
    from imagecaptioner_tpu.ops.pallas_greedy import (
        pallas_greedy_decode_compact)

    cfg = compact_student_config(V, embed_size=E, hidden_size=H)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, Lf, E)) * 0.3
    ref = np.asarray(D.greedy_decode_student(p, feats, cfg, max_length=T))
    got = np.asarray(pallas_greedy_decode_compact(p, feats, cfg, max_length=T,
                                                  interpret=INTERPRET))
    if INTERPRET:
        np.testing.assert_array_equal(got, ref)
    else:
        # On real TPU, MXU-f32 (bf16x3) vs VPU-f32 reduction order can flip
        # argmax on random-weight near-ties (measured: a 7e-5 top-2 logit
        # gap); trained models have far larger gaps.  Require near-total
        # agreement: at most one row may diverge.
        rows_exact = int((got == ref).all(axis=1).sum())
        assert rows_exact >= B - 1, f"{rows_exact}/{B} rows agree"


def test_pallas_greedy_temperature():
    cfg = full_student_config(40, embed_size=16, hidden_size=24, dropout=0.0)
    p, s = SM.student_init(jax.random.PRNGKey(2), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(3), (3, 7, 16))
    ref = D.greedy_decode_student(p, feats, cfg, max_length=6, temperature=2.0)
    got = pallas_greedy_decode_student(p, feats, cfg, max_length=6,
                                       temperature=2.0, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
