"""Decode loops: greedy vs step-by-step oracle, beam search vs a dynamic
(reference-semantics) Python oracle, sampling determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioner_tpu.core import modules as M
from imagecaptioner_tpu.core.config import TeacherConfig, compact_student_config, full_student_config
from imagecaptioner_tpu.data.vocabulary import END, PAD, START
from imagecaptioner_tpu.models import lstm as L
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.ops import decode as D

V = 40


@pytest.fixture(scope="module")
def small_teacher():
    cfg = TeacherConfig(vocab_size=V, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32, 32))
    memory = TM.encode_image(p, images, cfg)
    return p, cfg, memory


def _student_fixture(variant_cfg):
    p, s = SM.student_init(jax.random.PRNGKey(0), variant_cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 224, 224))
    _, refined, _ = SM.encode_image(p, s, images, variant_cfg, train=False)
    return p, refined


@pytest.mark.parametrize("mk_cfg", [full_student_config, compact_student_config])
def test_student_greedy_matches_stepwise(mk_cfg):
    cfg = mk_cfg(V, embed_size=16, hidden_size=24, dropout=0.0)
    p, feats = _student_fixture(cfg)
    toks = D.greedy_decode_student(p, feats, cfg, max_length=12)
    assert toks.shape == (3, 12)

    # step-by-step oracle replicating student_model.py:314-381
    for b in range(3):
        hc = L.init_hidden(cfg.num_layers, 1, cfg.hidden_size)
        tok = jnp.array([START], jnp.int32)
        expected = []
        fb = feats[b:b + 1]
        for _ in range(12):
            emb = M.embedding(p["decoder"]["embedding"], tok)
            logits, hc, _ = SM.decoder_step(p, emb, hc, fb, cfg)
            nxt = int(jnp.argmax(logits.astype(jnp.float32), axis=-1)[0])
            if nxt == END:
                break
            expected.append(nxt)
            tok = jnp.array([nxt], jnp.int32)
        got = [int(t) for t in np.asarray(toks[b]) if t != PAD]
        assert got == expected


def test_student_greedy_pads_after_end():
    cfg = compact_student_config(V, embed_size=16, hidden_size=16, dropout=0.0)
    p, feats = _student_fixture(cfg)
    toks = np.asarray(D.greedy_decode_student(p, feats, cfg, max_length=15))
    for row in toks:
        seen_pad = False
        for t in row:
            if t == PAD:
                seen_pad = True
            elif seen_pad:
                pytest.fail("non-PAD token after PAD")
            assert t != END  # END never emitted


def test_student_sampling_deterministic_per_key():
    cfg = compact_student_config(V, embed_size=16, hidden_size=16, dropout=0.0)
    p, feats = _student_fixture(cfg)
    a = D.greedy_decode_student(p, feats, cfg, max_length=10, temperature=1.1,
                                rng=jax.random.PRNGKey(7))
    b = D.greedy_decode_student(p, feats, cfg, max_length=10, temperature=1.1,
                                rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_teacher_greedy_matches_full_forward_argmax(small_teacher):
    """KV-cached greedy must equal argmax chaining over full forwards."""
    p, cfg, memory = small_teacher
    toks = np.asarray(D.greedy_decode_teacher(p, memory, cfg, max_length=10))[0]

    seq = [START]
    expected = []
    for t in range(10):
        captions = jnp.asarray(np.array(seq, np.int32))[:, None]
        logits = TM.teacher_apply(p, None, captions, cfg, memory=memory)
        nxt = int(jnp.argmax(logits[-1, 0].astype(jnp.float32)))
        if nxt == END:
            break
        expected.append(nxt)
        seq.append(nxt)
    got = [int(t) for t in toks if t != PAD]
    assert got == expected


def _oracle_beam(p, cfg, memory, max_length, beam_size, length_penalty):
    """Reference beam semantics (teacher_model.py:108-252): dynamic lists,
    beam shrink on EOS, full-prefix re-runs via teacher_apply."""
    seqs = [[START] for _ in range(beam_size)]
    scores = [0.0] + [-np.inf] * (beam_size - 1)
    finished = []
    B = beam_size
    for step in range(1, max_length + 1):
        captions = jnp.asarray(np.array(seqs, np.int32).T)  # (t, B)
        logits = TM.teacher_apply(p, None, captions, cfg,
                                  memory=jnp.broadcast_to(memory, (B,) + memory.shape[1:]))
        logp = jax.nn.log_softmax(logits[-1].astype(jnp.float32), axis=-1)
        cand = np.asarray(logp) + np.array(scores)[:, None]
        flat = cand.reshape(-1)
        top = np.argsort(-flat)[:B]
        new_seqs, new_scores = [], []
        for idx in top:
            origin, token = divmod(int(idx), cfg.vocab_size)
            sc = float(flat[idx])
            seq_i = seqs[origin] + [token]
            if token == END:
                Lh = len(seq_i)
                lp = ((5.0 + Lh) / 6.0) ** length_penalty if length_penalty > 0 else 1.0
                finished.append((seq_i, sc / lp))
            else:
                new_seqs.append(seq_i)
                new_scores.append(sc)
        if not new_seqs:
            break
        seqs, scores, B = new_seqs, new_scores, len(new_seqs)
    if not finished:
        for b in range(len(seqs)):
            Lh = len(seqs[b])
            lp = ((5.0 + Lh) / 6.0) ** length_penalty if length_penalty > 0 else 1.0
            finished.append((seqs[b], scores[b] / lp))
    finished.sort(key=lambda x: x[1], reverse=True)
    return finished


@pytest.mark.parametrize("beam_size,max_length", [(3, 8), (5, 12)])
def test_beam_search_matches_reference_oracle(small_teacher, beam_size, max_length):
    p, cfg, memory = small_teacher
    seqs, scores, lens = D.beam_search_teacher(
        p, memory, cfg, max_length=max_length, beam_size=beam_size,
        length_penalty=0.6)
    oracle = _oracle_beam(p, cfg, memory, max_length, beam_size, 0.6)

    n = sum(1 for s in np.asarray(scores) if np.isfinite(s))
    assert n == len(oracle)
    for i in range(n):
        o_seq, o_score = oracle[i]
        got = np.asarray(seqs[i])[: int(lens[i])].tolist()
        assert got == o_seq, f"hypothesis {i}: {got} != {o_seq}"
        assert abs(float(scores[i]) - o_score) < 1e-4


def test_beam_captions_formatting(small_teacher):
    p, cfg, memory = small_teacher

    class FakeVocab:
        itos = {i: f"w{i}" for i in range(V)}

    seqs, scores, _ = D.beam_search_teacher(p, memory, cfg, max_length=8,
                                            beam_size=3)
    caps = D.beam_result_to_captions(seqs, scores, FakeVocab(), 2)
    assert 1 <= len(caps) <= 2
    for c in caps:
        assert "w1" not in c.split() and "w2" not in c.split()  # no START/END


def test_greedy_teacher_early_exit_identical(small_teacher):
    """The while_loop early termination of the teacher greedy/sampled decode
    must be bitwise the lax.scan output: post-all-done steps only write PAD
    into an already-PAD buffer.  Covered both for a random head (never
    finishes — full length) and an END-biased head (finishes at step ~1)."""
    p, cfg, memory = small_teacher
    mem3 = jnp.concatenate([memory, memory * 0.5, memory * -1.0], axis=0)

    p_eos = jax.tree.map(lambda x: x, p)
    bias = np.full((V,), -4.0, np.float32)
    bias[END] = 20.0
    p_eos["fc_out"] = dict(p_eos["fc_out"], bias=jnp.asarray(bias))

    for prm in (p, p_eos):
        for kw in ({"sample": False},
                   {"sample": True, "temperature": 1.3,
                    "rng": jax.random.PRNGKey(7)}):
            fast = D.greedy_decode_teacher(prm, mem3, cfg, max_length=9,
                                           early_exit=True, **kw)
            full = D.greedy_decode_teacher(prm, mem3, cfg, max_length=9,
                                           early_exit=False, **kw)
            np.testing.assert_array_equal(np.asarray(fast), np.asarray(full))


def test_student_greedy_early_exit_identical():
    """Student greedy/sampled early exit (XLA path) is bitwise the scan."""
    cfg = compact_student_config(V, embed_size=16, hidden_size=16, dropout=0.0)
    p, feats = _student_fixture(cfg)

    p_eos = jax.tree.map(lambda x: x, p)
    bias = np.full((V,), -4.0, np.float32)
    bias[END] = 20.0
    p_eos["decoder"] = dict(p_eos["decoder"])
    p_eos["decoder"]["output_projection"] = dict(
        p_eos["decoder"]["output_projection"], bias=jnp.asarray(bias))

    for prm in (p, p_eos):
        for kw in ({}, {"temperature": 1.1, "rng": jax.random.PRNGKey(7)}):
            fast = D.greedy_decode_student(prm, feats, cfg, max_length=11,
                                           early_exit=True, **kw)
            full = D.greedy_decode_student(prm, feats, cfg, max_length=11,
                                           early_exit=False, **kw)
            np.testing.assert_array_equal(np.asarray(fast), np.asarray(full))
