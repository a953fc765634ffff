"""Pallas fused LSTM+attention kernel vs the lax.scan reference.

Runs in interpret mode on CPU; set IC_TPU_TESTS=1 to compile on real TPU.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioner_tpu.core.config import full_student_config
from imagecaptioner_tpu.models import lstm as L
from imagecaptioner_tpu.ops.pallas_lstm import pallas_full_decoder_scan

INTERPRET = os.environ.get("IC_TPU_TESTS") != "1"


@pytest.mark.parametrize("T,B,Lf", [(6, 2, 9), (12, 4, 49)])
def test_pallas_scan_matches_lax_scan(T, B, Lf):
    cfg = full_student_config(vocab_size=50, embed_size=16, hidden_size=24,
                              dropout=0.0)
    key = jax.random.PRNGKey(0)
    p = L.full_decoder_init(key, cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, Lf, cfg.embed_size))
    captions = jax.random.randint(jax.random.PRNGKey(2), (T, B), 0, 50)

    ref_logits, ref_h, ref_attn = L.full_decoder_apply(
        p, feats, captions, cfg, train=False)
    logits, h, attn = pallas_full_decoder_scan(
        p, feats, captions, cfg, interpret=INTERPRET)

    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=1e-3)


def test_pallas_scan_production_dims():
    """Production full-student dims (E=256, H=512, L=49, B=16)."""
    cfg = full_student_config(vocab_size=300, dropout=0.0)
    p = L.full_decoder_init(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (16, 49, 256)) * 0.1
    captions = jax.random.randint(jax.random.PRNGKey(2), (20, 16), 0, 300)
    ref_logits, ref_h, _ = L.full_decoder_apply(p, feats, captions, cfg)
    logits, h, _ = pallas_full_decoder_scan(p, feats, captions, cfg,
                                            interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               atol=5e-5, rtol=1e-3)
