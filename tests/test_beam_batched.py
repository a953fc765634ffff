"""Batched (vmapped) beam search equals per-image beam search."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecaptioner_tpu.core.config import TeacherConfig
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.ops import decode as D


def test_batched_beam_matches_per_image():
    cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 32))
    memory = TM.encode_image(p, images, cfg)
    bs, bsc, bl = D.beam_search_teacher_batched(p, memory, cfg, max_length=8,
                                                beam_size=3)
    assert bs.shape == (3, 3, 9)
    for i in range(3):
        s, sc, l = D.beam_search_teacher(p, memory[i:i + 1], cfg,
                                         max_length=8, beam_size=3)
        np.testing.assert_array_equal(np.asarray(bs[i]), np.asarray(s))
        np.testing.assert_allclose(np.asarray(bsc[i]), np.asarray(sc),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(bl[i]), np.asarray(l))


def test_packed_beam_matches_per_image():
    """The MXU-packed beam (beams folded into the batch dim, one decoder
    GEMM set per step) must be token-identical to the per-image search —
    same bookkeeping code, same accepted sets (VERDICT r2 weak #2)."""
    cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    memory = TM.encode_image(p, images, cfg)
    ps, psc, plen = D.beam_search_teacher_packed(p, memory, cfg, max_length=8,
                                                 beam_size=3)
    assert ps.shape == (4, 3, 9)
    for i in range(4):
        s, sc, l = D.beam_search_teacher(p, memory[i:i + 1], cfg,
                                         max_length=8, beam_size=3)
        np.testing.assert_array_equal(np.asarray(ps[i]), np.asarray(s))
        np.testing.assert_allclose(np.asarray(psc[i]), np.asarray(sc),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(plen[i]), np.asarray(l))


def test_pipelined_beam_matches_packed():
    """The two-stage serving beam (full-batch memory-K/V projection,
    lax.map-chained decode packs — VERDICT r4 #3) must be token-identical
    to the single-pack search at every pack width, early-exit on and off."""
    cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 32, 32))
    memory = TM.encode_image(p, images, cfg)
    ref = D.beam_search_teacher_packed(p, memory, cfg, max_length=8,
                                       beam_size=3, early_exit=False)
    for pack, ee in ((2, False), (4, False), (4, True), (8, True)):
        got = D.beam_search_teacher_pipelined(
            p, memory, cfg, pack=pack, max_length=8, beam_size=3,
            early_exit=ee)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))


def test_anc_impl_sel_vs_joint_token_identical():
    """The two ancestry-attention formulations (select-before-softmax vs
    joint softmax, transformer._attend_anc_sel/_attend_anc) must produce
    the same hypotheses and scores through a full packed search.  Run both
    impls by flipping the module switch and clearing the jit caches (the
    switch is read at trace time)."""
    from imagecaptioner_tpu.models import transformer as TD

    cfg = TeacherConfig(vocab_size=60, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(5), cfg)
    images = jax.random.normal(jax.random.PRNGKey(6), (3, 3, 32, 32))
    memory = TM.encode_image(p, images, cfg)

    prev = TD._ANC_IMPL
    results = {}
    try:
        for impl in ("sel", "joint"):
            TD._ANC_IMPL = impl
            D.beam_search_teacher_packed._clear_cache()
            results[impl] = D.beam_search_teacher_packed(
                p, memory, cfg, max_length=8, beam_size=3)
    finally:
        TD._ANC_IMPL = prev
        D.beam_search_teacher_packed._clear_cache()
    s_sel, sc_sel, l_sel = results["sel"]
    s_j, sc_j, l_j = results["joint"]
    np.testing.assert_array_equal(np.asarray(s_sel), np.asarray(s_j))
    np.testing.assert_allclose(np.asarray(sc_sel), np.asarray(sc_j),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(l_sel), np.asarray(l_j))


def test_packed_beam_production_dims_smoke():
    """Production teacher dims (512/8/4, 197 tokens), N=4, K=5 — shapes and
    finite scores."""
    cfg = TeacherConfig(vocab_size=300)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    memory = jax.random.normal(jax.random.PRNGKey(1), (4, 197, 512)) * 0.1
    s, sc, l = D.beam_search_teacher_packed(p, memory, cfg, max_length=10,
                                            beam_size=5)
    assert s.shape == (4, 5, 11)
    assert bool(jnp.all(jnp.isfinite(sc[:, 0])))


def test_beam_early_exit_identical():
    """The while_loop early termination (stop when every image's beams are
    done — the reference's `if len(beams) == 0: break`,
    teacher_model.py:196-198) must be bitwise-identical to the fixed
    lax.scan, both when beams survive to max_length and when they all
    finish in the first steps (END-biased output head)."""
    cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 32))
    memory = TM.encode_image(p, images, cfg)

    # END-biased head: every beam finishes around step 2
    p_eos = jax.tree.map(lambda x: x, p)
    bias = np.full((40,), -4.0, np.float32)
    bias[2] = 20.0  # END token id
    p_eos["fc_out"] = dict(p_eos["fc_out"], bias=jnp.asarray(bias))

    for prm in (p, p_eos):
        for fn in (D.beam_search_teacher_packed, D.beam_search_teacher_batched):
            fast = fn(prm, memory, cfg, max_length=8, beam_size=3,
                      early_exit=True)
            full = fn(prm, memory, cfg, max_length=8, beam_size=3,
                      early_exit=False)
            for a, b in zip(fast, full):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        s_fast = D.beam_search_teacher(prm, memory[:1], cfg, max_length=8,
                                       beam_size=3, early_exit=True)
        s_full = D.beam_search_teacher(prm, memory[:1], cfg, max_length=8,
                                       beam_size=3, early_exit=False)
        for a, b in zip(s_fast, s_full):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
