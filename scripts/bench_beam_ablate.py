#!/usr/bin/env python
"""Where does the packed-beam decode step spend its time?

Times DECODE-ONLY variants (memory pre-staged on device, encode excluded)
on the real chip, streamed via lax.map to amortize the relay dispatch floor:

  greedy_rows        plain KV-cached greedy scan over the same N*K packed
                     rows — the decoder-step floor (no beam logic, no reorder)
  beam_no_topk       packed beam with lax.top_k replaced by a first-K slice
                     (wrong results; isolates top_k cost)
  beam_no_reorder    packed beam minus the per-step self-KV reorder
                     (wrong results; isolates total reorder cost)
  beam_reorder_gather  physical reorder via XLA gather on the (leading)
                     beam axis of the per-layer head-major caches
  beam_reorder_perm  physical reorder via per-image (N,K,K) block-diagonal
                     one-hot permutation matmuls — the r3 production path
                     before the ancestry rewrite
  beam_ungrouped_mem correct beam with cross-attention K/V duplicated per
                     beam (the pre-grouping layout; 5x the per-step K/V
                     HBM re-read of the production grouped version)
  beam_full          the real beam_search_teacher_packed (no physical
                     reorder at all — ancestry-select attention,
                     transformer._attend_anc — plus grouped cross-attn)

All _packed_beam_variant arms use the ungrouped (per-beam K/V) layout and a
physically-reordered cache, so they ablate against beam_ungrouped_mem;
beam_full is the production path.

History note: earlier recordings of this file measured the r2 stacked
(L, N*K, S, E) cache, where the gather arm ran row-at-a-time (70% of the
whole step) and motivated the permutation matmul.  The cache is now
per-layer head-major (B, H, S, hd) and the production path does not
reorder it at all (ancestry-select attention).

Writes benchmarks/beam_ablation.json.  Usage:
  python scripts/bench_beam_ablate.py [--n 8 32] [--stream 4]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imagecaptioner_tpu.core.runtime import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagecaptioner_tpu.core import precision as P  # noqa: E402
from imagecaptioner_tpu.core import timing  # noqa: E402
from imagecaptioner_tpu.core.config import TeacherConfig  # noqa: E402
from imagecaptioner_tpu.data.vocabulary import END, PAD, START  # noqa: E402
from imagecaptioner_tpu.models import teacher as TM  # noqa: E402
from imagecaptioner_tpu.models import transformer as TD  # noqa: E402
from imagecaptioner_tpu.ops import decode as D  # noqa: E402

MAX_LEN = 20
K_BEAM = 5
MEM_TOKENS = 197


def _packed_beam_variant(params, memory, cfg, *, topk: bool,
                         reorder: str = "perm_blocked"):
    """beam_search_teacher_packed with a PHYSICALLY REORDERED cache and
    ablation switches (timing only — results are WRONG when a switch is
    off).  ``reorder``: 'none' (skip the per-step self-KV reorder), 'gather'
    (XLA gather on the leading beam axis), 'perm_blocked' (per-image
    (N,K,K) block-diagonal one-hot matmul — the pre-ancestry production
    path)."""
    N = memory.shape[0]
    K = K_BEAM
    S = MAX_LEN + 1
    V = cfg.vocab_size
    layers = params["decoder"]
    mem_kv = [{"k": jnp.repeat(c["k"], K, axis=0),
               "v": jnp.repeat(c["v"], K, axis=0)}
              for c in TD.precompute_memory_kv(layers, memory,
                                               num_heads=cfg.num_heads)]
    self_kv = TD.init_kv_cache(len(layers), N * K, S, cfg.embed_size,
                               memory.dtype, num_heads=cfg.num_heads)

    def lp(length):
        return ((5.0 + length.astype(jnp.float32)) / 6.0) ** 0.6

    state = dict(
        seqs=jnp.full((N, K, S), PAD, jnp.int32).at[:, :, 0].set(START),
        scores=jnp.full((N, K), -jnp.inf).at[:, 0].set(0.0),
        n_live=jnp.full((N,), K, jnp.int32),
        self_kv=self_kv,
        fin_seqs=jnp.full((N, K, S), PAD, jnp.int32),
        fin_scores=jnp.full((N, K), -jnp.inf),
        fin_lens=jnp.zeros((N, K), jnp.int32),
        fin_count=jnp.zeros((N,), jnp.int32),
    )
    book = jax.vmap(
        lambda st, ts, og, tk, t: D._beam_bookkeeping(st, ts, og, tk, t, lp),
        in_axes=(0, 0, 0, 0, None))

    def step(state, t):
        tok = state["seqs"][:, :, t].reshape(N * K)
        x = D._teacher_embed_step(params, tok, t, cfg).astype(memory.dtype)
        y, self_kv = TD.decoder_step_cached(layers, x, t, state["self_kv"],
                                            mem_kv, num_heads=cfg.num_heads)
        logits = D._teacher_logits_step(params, y, cfg)
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(N, K, V)
        cand = state["scores"][:, :, None] + logp
        if topk:
            top_scores, top_idx = jax.lax.top_k(cand.reshape(N, K * V), K)
        else:  # ablation: first-K slice, same shapes/dtypes
            top_scores = cand.reshape(N, K * V)[:, :K]
            top_idx = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None],
                                       (N, K))
        origin = (top_idx // V).astype(jnp.int32)
        token = (top_idx % V).astype(jnp.int32)

        book_state = {k: state[k] for k in
                      ("seqs", "scores", "n_live", "fin_seqs", "fin_scores",
                       "fin_lens", "fin_count")}
        new, origin_src = book(book_state, top_scores, origin, token, t)
        if reorder == "gather":
            gidx = (jnp.arange(N)[:, None] * K + origin_src).reshape(N * K)
            new["self_kv"] = [{"k": kv["k"][gidx], "v": kv["v"][gidx]}
                              for kv in self_kv]
        elif reorder == "perm_blocked":
            new["self_kv"] = [
                {"k": D._permute_rows_blocked(kv["k"], origin_src),
                 "v": D._permute_rows_blocked(kv["v"], origin_src)}
                for kv in self_kv]
        else:  # 'none': keep this step's writes, skip the reorder
            new["self_kv"] = self_kv
        return new, None

    state, _ = jax.lax.scan(step, state, jnp.arange(MAX_LEN))
    return state["seqs"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--stream", type=int, default=4)
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    cfg = TeacherConfig(vocab_size=2994)
    params = P.bf16_compute(TM.teacher_init(jax.random.PRNGKey(0), cfg))
    SS = args.stream

    out = {}
    for N in args.n:
        res = {}

        def mk_mem(i, _N=N):
            return jax.random.normal(
                jax.random.PRNGKey(7_000_000 + 100 * _N + i),
                (SS, _N, MEM_TOKENS, cfg.embed_size), jnp.bfloat16)

        def run(name, one_fn, _N=N):
            f = jax.jit(lambda stk: jax.lax.map(one_fn, stk))
            stats = timing.steady_state(f, mk_mem, n_small=2, n_large=8,
                                        pairs=args.pairs)
            r = timing.guarded_rate(stats, items_per_call=SS * _N,
                                    flops_per_item=None)
            res[name] = {
                "images_per_sec": r["items_per_sec"],
                "ms_per_image_batch": 1e3 * stats["per_call_marginal"] / SS,
                "ms_per_step": 1e3 * stats["per_call_marginal"] / SS / MAX_LEN,
            }
            print(N, name, json.dumps(res[name]))

        rows = N * K_BEAM
        run("greedy_rows",
            lambda m, _r=rows: D.greedy_decode_teacher(
                params, jnp.repeat(m, K_BEAM, axis=0), cfg,
                max_length=MAX_LEN))
        run("beam_no_topk",
            functools.partial(_packed_beam_variant, params, cfg=cfg,
                              topk=False, reorder="perm_blocked"))
        run("beam_no_reorder",
            functools.partial(_packed_beam_variant, params, cfg=cfg,
                              topk=True, reorder="none"))
        run("beam_reorder_gather",
            functools.partial(_packed_beam_variant, params, cfg=cfg,
                              topk=True, reorder="gather"))
        run("beam_reorder_perm",
            functools.partial(_packed_beam_variant, params, cfg=cfg,
                              topk=True, reorder="perm_blocked"))
        run("beam_ungrouped_mem",
            functools.partial(_packed_beam_variant, params, cfg=cfg,
                              topk=True, reorder="perm_blocked"))
        run("beam_full",
            lambda m: D.beam_search_teacher_packed(
                params, m, cfg, max_length=MAX_LEN, beam_size=K_BEAM)[0])
        out[f"N{N}"] = res

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "beam_ablation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
