"""Fused beam-attention decode-step kernel (ops/pallas_beam_attn.py).

Contract: with the kernel live (interpret mode on CPU, compiled on TPU),
both beam searches produce IDENTICAL tokens and scores to the XLA ancestry
path — the kernel computes the same all-pairs scores / joint softmax /
context with the same f32 discipline, and its aliased block write-back is
the cache update.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core.config import TeacherConfig
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.models import transformer as TD
from imagecaptioner_tpu.ops import pallas_beam_attn as BA

TPU = os.environ.get("IC_TPU_TESTS") == "1"


def _small_cfg(V=40):
    return TeacherConfig(vocab_size=V, embed_size=32, num_heads=4,
                         num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                         encoder_depth=2, encoder_heads=3, image_size=32,
                         patch_size=16)


def _beams(monkeypatch, mode):
    """Run packed + single beam under a forced beam-attn impl."""
    import importlib

    from imagecaptioner_tpu.ops import decode as D

    monkeypatch.setenv("IC_BEAM_ATTN", mode)
    importlib.reload(D)
    cfg = _small_cfg()
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    memory = TM.encode_image(p, images, cfg)
    ps, psc, plen = D.beam_search_teacher_packed(p, memory, cfg,
                                                 max_length=8, beam_size=3)
    ss, ssc, _ = D.beam_search_teacher(p, memory[:1], cfg, max_length=8,
                                       beam_size=3)
    return tuple(np.asarray(x) for x in (ps, psc, plen, ss, ssc))


def test_kernel_interpret_matches_xla(monkeypatch):
    ref = _beams(monkeypatch, "xla")
    ker = _beams(monkeypatch, "interpret")
    np.testing.assert_array_equal(ref[0], ker[0])   # packed tokens
    np.testing.assert_allclose(ref[1], ker[1], atol=1e-5)
    np.testing.assert_array_equal(ref[2], ker[2])
    np.testing.assert_array_equal(ref[3], ker[3])   # single-image tokens
    np.testing.assert_allclose(ref[4], ker[4], atol=1e-5)


def test_attention_core_matches_xla_anc(monkeypatch):
    """Direct single-step comparison: fused kernel vs _attend_anc on the
    same random cache/ancestry state (not just end-to-end tokens)."""
    monkeypatch.setenv("IC_BEAM_ATTN", "interpret")
    N, K, H, S, hd = 2, 3, 4, 9, 8
    E = H * hd
    R = N * K
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(R, 1, E)).astype(np.float32))
    kn = jnp.asarray(rng.normal(size=(R, 1, E)).astype(np.float32))
    vn = jnp.asarray(rng.normal(size=(R, 1, E)).astype(np.float32))
    kv = {"k": jnp.asarray(rng.normal(size=(R, H, S, hd)).astype(np.float32)),
          "v": jnp.asarray(rng.normal(size=(R, H, S, hd)).astype(np.float32))}
    pos = 5
    anc = jnp.asarray(rng.integers(0, K, size=(N, K, S)).astype(np.int32))
    anc = anc.at[:, :, pos].set(jnp.arange(K, dtype=jnp.int32)[None, :])

    # caller contract: rows at `pos` already written into the cache
    krow = kn.reshape(R, 1, H, hd).transpose(0, 2, 1, 3)
    vrow = vn.reshape(R, 1, H, hd).transpose(0, 2, 1, 3)
    kc = jax.lax.dynamic_update_slice(kv["k"], krow, (0, 0, pos, 0))
    vc = jax.lax.dynamic_update_slice(kv["v"], vrow, (0, 0, pos, 0))

    out = BA.fused_beam_self_attention(q, {"k": kc, "v": vc}, anc,
                                       jnp.int32(pos), num_heads=H,
                                       interpret=True)

    causal = jnp.arange(S)[None, None, None, :] > pos
    anc_hot = jax.nn.one_hot(anc, K, dtype=q.dtype)
    ref = TD._attend_anc(q, kc, vc, anc_hot, H, causal)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_vmem_refusal():
    q = jnp.zeros((128, 1, 512))
    kv = {"k": jnp.zeros((128, 8, 65536, 64)),
          "v": jnp.zeros((128, 8, 65536, 64))}
    anc = jnp.zeros((1, 128, 65536), jnp.int32)
    with pytest.raises(BA.BeamAttnVmemExceeded):
        BA.fused_beam_self_attention(q, kv, anc, jnp.int32(0),
                                     num_heads=8, interpret=True)


@pytest.mark.skipif(not TPU, reason="needs the real chip (IC_TPU_TESTS=1)")
def test_kernel_live_on_tpu(monkeypatch):
    """Production dims, compiled kernel (opt-in via IC_BEAM_ATTN=pallas) vs
    the default XLA ancestry path on-chip: tokens must match."""
    import importlib

    from imagecaptioner_tpu.ops import decode as D

    cfg = TeacherConfig(vocab_size=300)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    # bf16 memory = the serving configuration; the compiled kernel's MXU
    # dots are exact for bf16 inputs (f32 would round through bf16 on the
    # MXU while the XLA arm pins HIGHEST - tokens could flip on near-ties)
    memory = (jax.random.normal(jax.random.PRNGKey(1), (4, 197, 512))
              * 0.1).astype(jnp.bfloat16)

    monkeypatch.setenv("IC_BEAM_ATTN", "pallas")
    importlib.reload(D)
    ks, ksc, _ = D.beam_search_teacher_packed(p, memory, cfg, max_length=10,
                                              beam_size=5)
    monkeypatch.setenv("IC_BEAM_ATTN", "xla")
    importlib.reload(D)
    xs, xsc, _ = D.beam_search_teacher_packed(p, memory, cfg, max_length=10,
                                              beam_size=5)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(xs))
    np.testing.assert_allclose(np.asarray(ksc), np.asarray(xsc), atol=1e-4)
