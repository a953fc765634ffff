"""On-device caption decoding: greedy, temperature sampling, beam search.

Replaces the reference's host decode loops (SURVEY §3.3-3.4) — one eager
dispatch + ``.item()`` sync per token there; one jitted ``lax.scan`` per
caption here, with on-device argmax/top_k/categorical (SURVEY §2.9 N10).

Semantics reproduced:
  * student greedy: argmax w/ temperature divide, stop at <END>, max_length
    tokens (student_model.py:314-381)
  * teacher beam: GNMT length penalty ((5+L)/6)^a, EOS-finalize, beam-width
    *shrink* on EOS (teacher_model.py:108-252).  The shrink is a dynamic
    shape, so this implementation keeps a fixed K slots + an ``n_live``
    counter: top-K candidates are computed but only the first ``n_live`` are
    accepted each step — provably the same accepted set as the reference's
    top-``B_live`` (candidates are score-sorted in both).
  * teacher temperature sampling: softmax(logits/T) multinomial
    (streamlit_app.py:165-221), via jax.random.categorical.

All teacher decode paths use the KV cache (models/transformer.py) instead of
re-running the full prefix each step.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imagecaptioner_tpu.core import modules as M
from imagecaptioner_tpu.core.config import StudentConfig, TeacherConfig
from imagecaptioner_tpu.data.vocabulary import END, PAD, START
from imagecaptioner_tpu.models import lstm as L
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.models import transformer as TD


# ---------------------------------------------------------------------------
# Student greedy / sampling (batched)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "max_length",
                                             "temperature", "early_exit"))
def greedy_decode_student(
    params: Dict, feats: jnp.ndarray, cfg: StudentConfig, *,
    max_length: int = 20, temperature: float = 1.0,
    rng: Optional[jax.Array] = None, early_exit: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched greedy decode over refined features (B, L, E).

    Returns (B, max_length) int32 tokens; positions at/after the first <END>
    are PAD.  Pass ``rng`` to switch from argmax to multinomial sampling at
    ``temperature`` (streamlit student path uses T=1.1).

    ``early_exit`` (default IC_BEAM_EARLY_EXIT, on): stop the decode loop
    once every row has emitted <END> — bitwise the full scan's output (the
    skipped steps write PAD into an already-PAD buffer).  The fused Pallas
    greedy kernel (best_greedy_decode_student) runs fixed-length; this is
    the XLA path used on CPU and as the kernel fallback.
    """
    B = feats.shape[0]
    hc0 = L.init_hidden(cfg.num_layers, B, cfg.hidden_size, feats.dtype)
    tok0 = jnp.full((B,), START, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def scan_fn(carry, xs):
        t, step_rng = xs
        hc, tok, done = carry
        emb = M.embedding(params["decoder"]["embedding"], tok).astype(feats.dtype)
        if cfg.variant == "enhanced":
            # learned per-step positional encoding (student_model_enhanced.py:495-497)
            from imagecaptioner_tpu.models.student_enhanced import MAX_POS

            pe = jax.lax.dynamic_slice_in_dim(
                params["decoder"]["pos_encoding"][0],
                jnp.minimum(t, MAX_POS - 1), 1, axis=0)
            emb = emb + jnp.where(t < MAX_POS, pe[0],
                                  jnp.zeros_like(pe[0])).astype(emb.dtype)
        logits, hc_new, _ = SM.decoder_step(params, emb, hc, feats, cfg)
        logits = logits.astype(jnp.float32)
        if temperature != 1.0:
            logits = logits / temperature
        if rng is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(step_rng, logits, axis=-1).astype(jnp.int32)
        is_end = nxt == END
        out = jnp.where(done | is_end, PAD, nxt)
        done_new = done | is_end
        # frozen sequences keep feeding their last real token; outputs masked
        tok_new = jnp.where(done_new, tok, nxt)
        return (hc_new, tok_new, done_new), out

    rngs = (jax.random.split(rng, max_length) if rng is not None
            else jnp.zeros((max_length, 2), jnp.uint32))
    ee = _EARLY_EXIT if early_exit is None else early_exit
    if not ee:
        _, toks = jax.lax.scan(scan_fn, (hc0, tok0, done0),
                               (jnp.arange(max_length), rngs))
        return toks.T  # (B, max_length)

    def cond(carry):
        t, (_, _, done), _ = carry
        return (t < max_length) & ~jnp.all(done)

    def body(carry):
        t, st, buf = carry
        st, out = scan_fn(st, (t, rngs[t]))
        return t + 1, st, jax.lax.dynamic_update_slice(
            buf, out[None], (t, jnp.int32(0)))

    buf0 = jnp.full((max_length, B), PAD, jnp.int32)
    _, _, toks = jax.lax.while_loop(
        cond, body, (jnp.int32(0), (hc0, tok0, done0), buf0))
    return toks.T  # (B, max_length)


_FALLBACK_LOGGED: set = set()


def _log_fallback_once(kind: str, err: BaseException, *, expected: bool):
    """One loud signal per process per kernel when the serving path degrades
    to lax.scan (VERDICT r2: a silent `except: pass` here would let a kernel
    regression silently lose the fused path with zero signal)."""
    if kind in _FALLBACK_LOGGED:
        return
    _FALLBACK_LOGGED.add(kind)
    import warnings

    if expected:  # shape-dependent VMEM budget — by-design fallback
        print(f"[decode] {kind}: {err} — using the lax.scan path", flush=True)
    else:
        warnings.warn(
            f"pallas greedy decode ({kind}) FAILED unexpectedly — serving "
            f"degraded to the lax.scan path. Kernel regression? {err!r}",
            RuntimeWarning, stacklevel=3)


def best_greedy_decode_student(params, feats, cfg: StudentConfig, *,
                               max_length: int = 20, temperature: float = 1.0,
                               rng=None):
    """Greedy decode with the fastest available implementation: the fused
    Pallas kernel on TPU for the full (2-layer) and compact (1-layer)
    students (argmax path), the lax.scan path otherwise.  Token-identical by
    test contract (tests/test_pallas_greedy.py).

    Fallbacks are never silent: an over-VMEM shape logs once (expected,
    ops/pallas_greedy.GreedyVmemExceeded), any other kernel failure warns
    once with the error.  Set IC_STRICT_PALLAS=1 to re-raise instead of
    falling back (used by the TPU test asserting the kernel path is live).
    """
    if rng is None and jax.default_backend() not in ("cpu",):
        import os

        from imagecaptioner_tpu.ops.pallas_greedy import (
            GreedyVmemExceeded, pallas_greedy_decode_compact,
            pallas_greedy_decode_student)

        strict = os.environ.get("IC_STRICT_PALLAS") == "1"
        kernel = None
        if cfg.variant == "full" and cfg.num_layers == 2:
            kernel = ("pallas_greedy_full", pallas_greedy_decode_student)
        elif cfg.variant == "compact" and cfg.num_layers == 1:
            kernel = ("pallas_greedy_compact", pallas_greedy_decode_compact)
        if kernel is not None:
            kind, fn = kernel
            try:
                return fn(params, feats, cfg, max_length=max_length,
                          temperature=temperature)
            except GreedyVmemExceeded as e:
                if strict:
                    raise
                _log_fallback_once(kind, e, expected=True)
            except Exception as e:  # noqa: BLE001 — any kernel failure
                if strict:
                    raise
                _log_fallback_once(kind, e, expected=False)
    return greedy_decode_student(params, feats, cfg, max_length=max_length,
                                 temperature=temperature, rng=rng)


# ---------------------------------------------------------------------------
# Teacher step machinery
# ---------------------------------------------------------------------------


def _teacher_logits_step(params, y, cfg: TeacherConfig) -> jnp.ndarray:
    """(B, 1, E) decoder output -> (B, V) fp32 logits (norm + head,
    teacher_model.py:167-168)."""
    y = M.layer_norm(params["pre_output_norm"], y)
    return M.dense(params["fc_out"], y)[:, 0, :].astype(jnp.float32)


def _teacher_embed_step(params, tok: jnp.ndarray, pos, cfg: TeacherConfig
                        ) -> jnp.ndarray:
    """(B,) token + scalar position -> (B, 1, E) with sinusoidal PE."""
    emb = M.embedding(params["embedding"], tok)[:, None, :]
    pe = jax.lax.dynamic_slice_in_dim(TM._pe(cfg), pos, 1, axis=0)
    return emb + pe[None, :, :].astype(emb.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "max_length", "sample",
                                             "temperature", "early_exit"))
def greedy_decode_teacher(
    params: Dict, memory: jnp.ndarray, cfg: TeacherConfig, *,
    max_length: int = 20, temperature: float = 1.0, sample: bool = False,
    rng: Optional[jax.Array] = None, early_exit: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched KV-cached greedy/sampled decode. memory (B, L, E) ->
    (B, max_length) tokens (PAD after first <END>).

    With ``early_exit`` (default: IC_BEAM_EARLY_EXIT, on) the loop stops
    once every row has emitted <END> — post-done steps only write PAD into
    a buffer that is already PAD, so the output is bitwise the full scan's
    (tests/test_decode.py::test_greedy_teacher_early_exit_identical)."""
    B = memory.shape[0]
    layers = params["decoder"]
    mem_kv = TD.precompute_memory_kv(layers, memory,
                                     num_heads=cfg.num_heads)
    self_kv = TD.init_kv_cache(len(layers), B, max_length + 1,
                               cfg.embed_size, memory.dtype,
                               num_heads=cfg.num_heads)
    tok0 = jnp.full((B,), START, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def scan_fn(carry, xs):
        self_kv, tok, done = carry
        t, step_rng = xs
        x = _teacher_embed_step(params, tok, t, cfg).astype(memory.dtype)
        y, self_kv = TD.decoder_step_cached(layers, x, t, self_kv, mem_kv,
                                            num_heads=cfg.num_heads)
        logits = _teacher_logits_step(params, y, cfg)
        if temperature != 1.0:
            logits = logits / temperature
        if sample:
            nxt = jax.random.categorical(step_rng, logits, axis=-1).astype(jnp.int32)
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        is_end = nxt == END
        out = jnp.where(done | is_end, PAD, nxt)
        done_new = done | is_end
        tok_new = jnp.where(done_new, tok, nxt)
        return (self_kv, tok_new, done_new), out

    rngs = (jax.random.split(rng, max_length) if rng is not None
            else jnp.zeros((max_length, 2), jnp.uint32))
    ee = _EARLY_EXIT if early_exit is None else early_exit
    if not ee:
        _, toks = jax.lax.scan(scan_fn, (self_kv, tok0, done0),
                               (jnp.arange(max_length), rngs))
        return toks.T

    # while_loop variant: stop once every row is done.  The out buffer is
    # initialized to PAD, which is exactly what the skipped steps would
    # have written (out = PAD whenever done), so outputs are bitwise equal.
    def cond(carry):
        t, (_, _, done), _ = carry
        return (t < max_length) & ~jnp.all(done)

    def body(carry):
        t, st, buf = carry
        st, out = scan_fn(st, (t, rngs[t]))
        return t + 1, st, jax.lax.dynamic_update_slice(
            buf, out[None], (t, jnp.int32(0)))

    buf0 = jnp.full((max_length, B), PAD, jnp.int32)
    _, _, toks = jax.lax.while_loop(
        cond, body, (jnp.int32(0), (self_kv, tok0, done0), buf0))
    return toks.T


# ---------------------------------------------------------------------------
# Teacher beam search (fixed-width masked; reference shrink semantics)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "max_length", "beam_size",
                                             "length_penalty", "early_exit"))
def beam_search_teacher(
    params: Dict, memory: jnp.ndarray, cfg: TeacherConfig, *,
    max_length: int = 20, beam_size: int = 5, length_penalty: float = 0.6,
    early_exit: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-image beam search. memory (1, L, E).

    Returns (seqs (K, max_length+1) incl. <START>, normalized scores (K,)
    sorted desc with -inf padding, lengths (K,)).
    """
    K = beam_size
    S = max_length + 1
    V = cfg.vocab_size
    layers = params["decoder"]
    # cross-attention K/V once for the image; the K beams attend it as K
    # grouped query rows (mem_group) instead of K duplicated K/V copies
    mem_kv = TD.precompute_memory_kv(layers, memory,
                                     num_heads=cfg.num_heads)
    self_kv = TD.init_kv_cache(len(layers), K, S, cfg.embed_size,
                               memory.dtype, num_heads=cfg.num_heads)

    def lp(length):  # GNMT penalty, teacher_model.py:202
        if length_penalty > 0:
            return ((5.0 + length.astype(jnp.float32)) / 6.0) ** length_penalty
        return jnp.float32(1.0)

    state = dict(
        seqs=jnp.full((K, S), PAD, jnp.int32).at[:, 0].set(START),
        scores=jnp.full((K,), -jnp.inf).at[0].set(0.0),  # only beam 0 live at t=0
        n_live=jnp.int32(K),  # reference starts with beam_size live slots
        self_kv=self_kv,
        # beam ancestry: anc[i, s] = cache slot whose position-s entry
        # belongs to the beam now in slot i (the cache itself is never
        # reordered — see transformer._attend_anc)
        anc=jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, S)),
        fin_seqs=jnp.full((K, S), PAD, jnp.int32),
        fin_scores=jnp.full((K,), -jnp.inf),
        fin_lens=jnp.zeros((K,), jnp.int32),
        fin_count=jnp.int32(0),
    )

    def step(state, t):
        # t = 0..max_length-1; current prefix length = t+1
        tok = state["seqs"][:, t]
        x = _teacher_embed_step(params, tok, t, cfg).astype(memory.dtype)
        # this step's cache rows are written by the current slots
        anc = state["anc"].at[:, t].set(jnp.arange(K, dtype=jnp.int32))
        y, self_kv = TD.decoder_step_cached(
            layers, x, t, state["self_kv"], mem_kv, num_heads=cfg.num_heads,
            mem_group=K, anc=anc[None] if _USE_ANC else None)
        logits = _teacher_logits_step(params, y, cfg)          # (K, V)
        logp = jax.nn.log_softmax(logits, axis=-1)
        cand = state["scores"][:, None] + logp                 # dead rows -inf
        top_scores, top_idx = jax.lax.top_k(cand.reshape(-1), K)
        origin = (top_idx // V).astype(jnp.int32)
        token = (top_idx % V).astype(jnp.int32)

        new, origin_src = _beam_bookkeeping(
            state, top_scores, origin, token, t, lp)
        # surviving beams inherit their ancestor's lineage row; the KV cache
        # itself is carried through un-reordered
        new["anc"] = anc[origin_src]
        if _USE_ANC:
            new["self_kv"] = self_kv
        else:
            new["self_kv"] = [
                {"k": _permute_rows_blocked(kv["k"], origin_src[None]),
                 "v": _permute_rows_blocked(kv["v"], origin_src[None])}
                for kv in self_kv]
        return new, None

    state = _run_decode_loop(step, state, max_length,
                             lambda st: st["n_live"] > 0, early_exit)

    # If nothing finished, finalize live beams (teacher_model.py:231-236)
    live_len = jnp.int32(S)
    live_norm = jnp.where(jnp.arange(K) < state["n_live"],
                          state["scores"] / lp(live_len), -jnp.inf)
    none_finished = state["fin_count"] == 0
    fin_scores = jnp.where(none_finished, live_norm, state["fin_scores"])
    fin_seqs = jnp.where(none_finished, state["seqs"], state["fin_seqs"])
    fin_lens = jnp.where(none_finished,
                         jnp.full((K,), S, jnp.int32), state["fin_lens"])

    order = jnp.argsort(-fin_scores)
    return fin_seqs[order], fin_scores[order], fin_lens[order]


def _beam_bookkeeping(state, top_scores, origin, token, t, lp):
    """Per-image accept/finalize/compact step shared by the single-image and
    packed beams.  ``state`` holds K-sized per-image arrays (no kv — the
    caller gathers the cache with the returned ``origin_src``).

    Semantics pinned by tests/test_beam_parity_torch.py: only the first
    ``n_live`` score-ordered candidates are accepted (the reference's
    ``topk(B_live)`` with shrinking beam), EOS candidates finalize with the
    GNMT penalty in candidate order, survivors compact into slots
    0..n_new-1 in score order."""
    K = state["seqs"].shape[0]

    accepted = jnp.arange(K) < state["n_live"]             # reference topk(B_live)
    is_end = token == END
    finalize = accepted & is_end & jnp.isfinite(top_scores)
    keep = accepted & (~is_end) & jnp.isfinite(top_scores)

    # --- finalize into the finished buffer (candidate order preserved) --
    hyp_len = t + 2  # includes <START> and <END>
    norm = top_scores / lp(jnp.int32(hyp_len))
    slot = state["fin_count"] + jnp.cumsum(finalize.astype(jnp.int32)) - 1
    slot = jnp.where(finalize, slot, K)  # K = scatter-drop
    fin_seq_rows = state["seqs"][origin].at[:, t + 1].set(token)
    fin_seqs = _scatter_rows(state["fin_seqs"], slot, fin_seq_rows, finalize)
    fin_scores = _scatter_vals(state["fin_scores"], slot, norm, finalize)
    fin_lens = _scatter_vals(state["fin_lens"], slot,
                             jnp.full((K,), hyp_len, jnp.int32), finalize)
    fin_count = state["fin_count"] + jnp.sum(finalize.astype(jnp.int32))

    # --- compact surviving beams into slots 0..n_new-1 ------------------
    # stable order: live candidates in score order (matches reference append)
    order = jnp.argsort(jnp.where(keep, jnp.arange(K), K + jnp.arange(K)))
    n_new = jnp.sum(keep.astype(jnp.int32))
    src = order  # candidate index per new slot
    new_seqs = state["seqs"][origin[src]].at[:, t + 1].set(token[src])
    new_scores = jnp.where(jnp.arange(K) < n_new, top_scores[src], -jnp.inf)
    return dict(
        seqs=new_seqs, scores=new_scores, n_live=n_new,
        fin_seqs=fin_seqs, fin_scores=fin_scores, fin_lens=fin_lens,
        fin_count=fin_count,
    ), origin[src]


@functools.partial(jax.jit, static_argnames=("cfg", "max_length", "beam_size",
                                             "length_penalty", "early_exit"))
def beam_search_teacher_packed(
    params: Dict, memory: jnp.ndarray, cfg: TeacherConfig, *,
    max_length: int = 20, beam_size: int = 5, length_penalty: float = 0.6,
    early_exit: Optional[bool] = None,
):
    """N-image beam search with the beams PACKED into the batch dimension.

    ``beam_search_teacher_batched`` vmaps the whole single-image search, so
    every per-step GEMM runs at batch K=5 (vmapped) — too skinny for the MXU
    (benchmarks/beam_diagnosis.json: 46 ms per B=16 decode step-loop).  Here
    the decoder step runs ONCE per step on the (N*K, ...) packed batch —
    one MXU-shaped GEMM set — and only the cheap per-image bookkeeping
    (top-k accept/finalize/compact, ~K-sized int ops) is vmapped.

    Token-identical to ``beam_search_teacher_batched`` (same bookkeeping
    code, tests/test_beam_batched.py).

    memory (N, L, E) -> (seqs (N, K, S), scores (N, K), lens (N, K)).
    """
    # image n's beams live at packed rows n*K .. n*K+K-1.  Cross-attention
    # K/V are projected once per IMAGE and shared by its K beams as grouped
    # query rows (mem_group=K in the decode step) — duplicating them per
    # beam would 5x both the projection matmuls and, worse, the per-step
    # HBM re-read of the K/V (the decode loop's largest traffic term).
    mem_kv = TD.precompute_memory_kv(params["decoder"], memory,
                                     num_heads=cfg.num_heads)
    return beam_decode_packed_kv(
        params, mem_kv, cfg, max_length=max_length, beam_size=beam_size,
        length_penalty=length_penalty, early_exit=early_exit,
        dtype=memory.dtype)


def beam_decode_packed_kv(
    params: Dict, mem_kv, cfg: TeacherConfig, *,
    max_length: int = 20, beam_size: int = 5, length_penalty: float = 0.6,
    early_exit: Optional[bool] = None, dtype=None,
):
    """Decode-only half of :func:`beam_search_teacher_packed`: consumes the
    PRECOMPUTED head-major cross-attention K/V (``precompute_memory_kv``)
    instead of encoder memory.

    This split exists so serving can decouple the encode batch from the
    decode pack width (:func:`beam_search_teacher_pipelined`): the ViT
    encoder and the memory-K/V projections are compute-bound and want the
    largest batch, while the decode loop is HBM-byte-bound and hits an XLA
    fusion pathology past N=8 packs (benchmarks/beam_byte_ledger.json
    float_N16/N32), so each side runs at its own best width.
    """
    N = mem_kv[0]["k"].shape[0]
    if dtype is None:
        dtype = mem_kv[0]["k"].dtype
    K = beam_size
    S = max_length + 1
    V = cfg.vocab_size
    layers = params["decoder"]
    self_kv = TD.init_kv_cache(len(layers), N * K, S, cfg.embed_size,
                               dtype, num_heads=cfg.num_heads)

    def lp(length):  # GNMT penalty, teacher_model.py:202
        if length_penalty > 0:
            return ((5.0 + length.astype(jnp.float32)) / 6.0) ** length_penalty
        return jnp.float32(1.0)

    state = dict(
        seqs=jnp.full((N, K, S), PAD, jnp.int32).at[:, :, 0].set(START),
        scores=jnp.full((N, K), -jnp.inf).at[:, 0].set(0.0),
        n_live=jnp.full((N,), K, jnp.int32),
        self_kv=self_kv,
        # per-image beam ancestry (see beam_search_teacher / _attend_anc)
        anc=jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                             (N, K, S)),
        fin_seqs=jnp.full((N, K, S), PAD, jnp.int32),
        fin_scores=jnp.full((N, K), -jnp.inf),
        fin_lens=jnp.zeros((N, K), jnp.int32),
        fin_count=jnp.zeros((N,), jnp.int32),
    )

    book = jax.vmap(
        lambda st, ts, og, tk, t: _beam_bookkeeping(st, ts, og, tk, t, lp),
        in_axes=(0, 0, 0, 0, None))

    def step(state, t):
        tok = state["seqs"][:, :, t].reshape(N * K)
        x = _teacher_embed_step(params, tok, t, cfg).astype(dtype)
        anc = state["anc"].at[:, :, t].set(jnp.arange(K, dtype=jnp.int32)[None, :])
        y, self_kv = TD.decoder_step_cached(
            layers, x, t, state["self_kv"], mem_kv, num_heads=cfg.num_heads,
            mem_group=K, anc=anc if _USE_ANC else None)
        logits = _teacher_logits_step(params, y, cfg)          # (N*K, V)
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(N, K, V)
        cand = state["scores"][:, :, None] + logp              # dead rows -inf
        top_scores, top_idx = jax.lax.top_k(cand.reshape(N, K * V), K)
        origin = (top_idx // V).astype(jnp.int32)              # (N, K)
        token = (top_idx % V).astype(jnp.int32)

        book_state = {k: state[k] for k in
                      ("seqs", "scores", "n_live", "fin_seqs", "fin_scores",
                       "fin_lens", "fin_count")}
        new, origin_src = book(book_state, top_scores, origin, token, t)
        # surviving beams inherit their ancestor's lineage row (a beam never
        # crosses images, so the gather stays inside each image's K rows);
        # the KV cache is carried un-reordered — the per-step block-diagonal
        # permutation matmul this replaces was a full cache read+write each
        # step (benchmarks/serving_hlo_profile.json: 334 us of the 3.76 ms
        # call, on top of forcing a double-buffered carry)
        new["anc"] = jnp.take_along_axis(anc, origin_src[:, :, None], axis=1)
        if _USE_ANC:
            new["self_kv"] = self_kv
        else:
            new["self_kv"] = [
                {"k": _permute_rows_blocked(kv["k"], origin_src),
                 "v": _permute_rows_blocked(kv["v"], origin_src)}
                for kv in self_kv]
        return new, None

    state = _run_decode_loop(step, state, max_length,
                             lambda st: jnp.any(st["n_live"] > 0), early_exit)

    # If nothing finished, finalize live beams (teacher_model.py:231-236)
    live_len = jnp.int32(S)
    live_norm = jnp.where(jnp.arange(K)[None, :] < state["n_live"][:, None],
                          state["scores"] / lp(live_len), -jnp.inf)
    none_finished = (state["fin_count"] == 0)[:, None]
    fin_scores = jnp.where(none_finished, live_norm, state["fin_scores"])
    fin_seqs = jnp.where(none_finished[:, :, None], state["seqs"],
                         state["fin_seqs"])
    fin_lens = jnp.where(none_finished,
                         jnp.full((N, K), S, jnp.int32), state["fin_lens"])

    order = jnp.argsort(-fin_scores, axis=1)
    return (jnp.take_along_axis(fin_seqs, order[:, :, None], axis=1),
            jnp.take_along_axis(fin_scores, order, axis=1),
            jnp.take_along_axis(fin_lens, order, axis=1))


def beam_search_teacher_pipelined(
    params: Dict, memory: jnp.ndarray, cfg: TeacherConfig, *,
    pack: int = 8, max_length: int = 20, beam_size: int = 5,
    length_penalty: float = 0.6, early_exit: Optional[bool] = None,
):
    """Two-stage packed beam serving: memory-K/V projection at the FULL
    batch, decode in packs of ``pack`` images.

    The coupled packed beam at N=8 splits ~40% ViT encode / 60% decode loop
    (benchmarks/serving_hlo_profile.json) because encode and decode share
    one program at the pack width — the compute-bound encoder runs at a
    tiny batch.  Here the caller encodes at the full batch B (where the
    ViT + cross-K/V projection matmuls are MXU-shaped) and the byte-bound
    decode loop runs `lax.map`-chained at its measured best width N=8,
    past which one pathological XLA output fusion costs 2.4-3.3x the byte
    bound (benchmarks/beam_byte_ledger.json float_N16/N32; VERDICT r4 #3).

    Token-identical per image to :func:`beam_search_teacher_packed` at any
    pack width — the decode core is the same function, and images never
    interact (tests/test_beam_batched.py).

    memory (B, L, E) with B % pack == 0 ->
    (seqs (B, K, S), scores (B, K), lens (B, K)).
    """
    B = memory.shape[0]
    if B % pack:
        raise ValueError(f"batch {B} not divisible by pack width {pack}")
    G = B // pack
    if G == 1:
        return beam_search_teacher_packed(
            params, memory, cfg, max_length=max_length, beam_size=beam_size,
            length_penalty=length_penalty, early_exit=early_exit)
    mem_kv = TD.precompute_memory_kv(params["decoder"], memory,
                                     num_heads=cfg.num_heads)
    packed_kv = jax.tree.map(
        lambda t: t.reshape((G, pack) + t.shape[1:]), mem_kv)

    def one_pack(kv):
        return beam_decode_packed_kv(
            params, kv, cfg, max_length=max_length, beam_size=beam_size,
            length_penalty=length_penalty, early_exit=early_exit,
            dtype=memory.dtype)

    seqs, scores, lens = jax.lax.map(one_pack, packed_kv)
    S = max_length + 1
    return (seqs.reshape(B, beam_size, S), scores.reshape(B, beam_size),
            lens.reshape(B, beam_size))


@functools.partial(jax.jit, static_argnames=("cfg", "max_length", "beam_size",
                                             "length_penalty", "early_exit"))
def beam_search_teacher_batched(
    params: Dict, memory: jnp.ndarray, cfg: TeacherConfig, *,
    max_length: int = 20, beam_size: int = 5, length_penalty: float = 0.6,
    early_exit: Optional[bool] = None,
):
    """vmap of :func:`beam_search_teacher` over a batch of images.

    memory (N, L, E) -> (seqs (N, K, S), scores (N, K), lens (N, K)).
    All beam state is static-shape, so batching the whole search is a single
    vmap — N independent beam searches run as one fused program (the
    reference can only do one image at a time, evaluate_student.py:152).
    Under ``early_exit`` the vmapped while_loop runs until every lane's
    beams are done (JAX's batching rule masks finished lanes)."""
    fn = lambda m: beam_search_teacher(  # noqa: E731
        params, m[None], cfg, max_length=max_length, beam_size=beam_size,
        length_penalty=length_penalty, early_exit=early_exit)
    return jax.vmap(fn)(memory)


# Measured A/B switch (IC_BEAM_ANC=0 -> physical per-step permute of the
# head-major cache instead of ancestry-select attention); both paths are
# token- and score-identical (tests).  Ancestry is the default: it wins at
# the recorded best serving point (N=8-16; 3.06 vs 3.27 ms/call device),
# the permute wins slightly at N=32 where the all-pairs score padding
# grows (14.5 vs 13.0) — docs/round3_notes.md has the full ledger.
_USE_ANC = _os.environ.get("IC_BEAM_ANC", "1") == "1"

# Early loop termination: the reference's beam loop breaks as soon as every
# beam has produced <END> (teacher_model.py:196-198 `if len(beams) == 0:
# break`); the fixed-width emulation reproduces that state as n_live == 0,
# after which every step is a provable no-op (all accept/finalize masks are
# gated on finite scores, and the scores of dead slots are -inf).  A
# `lax.while_loop` with an all-images-dead predicate skips those no-op
# steps — on a converged captioner (~6-token captions, max_length 20) that
# is ~2/3 of the decode steps.  IC_BEAM_EARLY_EXIT=0 restores the fixed
# `lax.scan` (used by the equivalence tests and fixed-work benchmarks).
_EARLY_EXIT = _os.environ.get("IC_BEAM_EARLY_EXIT", "1") == "1"


def _run_decode_loop(step, state, max_length, any_live, early_exit):
    """Run `state = step(state, t)[0]` for t = 0..max_length-1, stopping
    early (dynamic trip count) once `any_live(state)` is False."""
    if early_exit is None:
        early_exit = _EARLY_EXIT
    if not early_exit:
        state, _ = jax.lax.scan(step, state, jnp.arange(max_length))
        return state

    def cond(carry):
        t, st = carry
        return (t < max_length) & any_live(st)

    def body(carry):
        t, st = carry
        st, _ = step(st, t)
        return t + 1, st

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return state


def _permute_rows_blocked(kv, idx):
    """Per-image one-hot permutation of a per-layer head-major cache:
    kv (N*K, H, S, hd), idx (N, K) in [0, K).  HIGHEST precision — exact
    for a permutation (default MXU precision would truncate to bf16)."""
    R, H, S, hd = kv.shape
    N, K = idx.shape
    perm = jax.nn.one_hot(idx, K, dtype=kv.dtype)          # (N, K, K)
    out = jnp.einsum("nij,njhsd->nihsd", perm, kv.reshape(N, K, H, S, hd),
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(R, H, S, hd)


def _scatter_rows(buf, slot, rows, mask):
    """Scatter rows[i] -> buf[slot[i]] where mask[i]; slot==K drops."""
    K = buf.shape[0]
    safe = jnp.where(mask, slot, K)
    return buf.at[safe].set(rows, mode="drop")


def _scatter_vals(buf, slot, vals, mask):
    K = buf.shape[0]
    safe = jnp.where(mask, slot, K)
    return buf.at[safe].set(vals, mode="drop")


# ---------------------------------------------------------------------------
# Host-side detokenization
# ---------------------------------------------------------------------------


def tokens_to_words(tokens, vocab) -> List[str]:
    """(max_len,) decode output -> word list (PAD/START/END stripped)."""
    return vocab.decode(np.asarray(tokens).tolist())


def tokens_to_caption(tokens, vocab) -> str:
    return " ".join(tokens_to_words(tokens, vocab))


def beam_result_to_captions(seqs, scores, vocab, num_return_sequences: int = 1
                            ) -> List[str]:
    """Strip <START>/<END> and join (teacher_model.py:240-252)."""
    outs = []
    seqs = np.asarray(seqs)
    scores = np.asarray(scores)
    for i in range(min(num_return_sequences, len(seqs))):
        if not np.isfinite(scores[i]):
            continue
        toks = seqs[i].tolist()
        if toks and toks[0] == START:
            toks = toks[1:]
        if END in toks:
            toks = toks[: toks.index(END)]
        toks = [t for t in toks if t != PAD]
        outs.append(" ".join(vocab.itos.get(t, "<UNK>") for t in toks))
    return outs
