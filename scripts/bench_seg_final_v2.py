"""Round-3 final-seg-stage experiments (bs128, 320^2 64ch -> 640^2 argmax).

The known wall: the phase conv's contraction is K=(2x2 taps x 64cin)=256
with N=20 output lanes -> ~15% MXU lane utilization (~9 TF/s measured).
Reassociating the conv as
   z[h', w, (u, pc)] = sum_{v, cin} pk[u, v, cin, pc] * xp[h', w+v, cin]
   y[h, w, pc]       = z[h, w, 0:20] + z[h+1, w, 20:40]
turns it into a 1x2 conv with K=(2 col-taps x 64)=128 (exactly one K tile)
and N=(2 row-taps x 20)=40 lanes (2.7x the lane utilization), plus one
cheap shifted row add. Exact reassociation (same products, same adds up to
float associativity).

Variants measured here (all produce int32 class ids [B, 640, 640]):
 a) current shipped: upsample2x_conv3x3_argmax (phase conv N=20)
 b) z-split: 1x2 conv N=40 -> row add -> per-phase argmax -> interleave
 c) z-split f32 accum variant (preferred_element_type=f32)
"""

import functools
import os
import sys

# persistent XLA compile cache: first compile of the big pipeline is
# minutes through the remote-TPU tunnel; later invocations (and the other
# bench/chain scripts) reuse it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import timed as _timed

from hydranet_tpu.ops.fused_upsample_conv import (_phase_kernels,
                                                  upsample2x_conv3x3_argmax)

B = int(os.environ.get("BENCH_BATCH", "128"))
H = W = 320
CIN, NCLS = 64, 5
DT = jnp.bfloat16
ITERS = 20


timed = functools.partial(_timed, iters=ITERS, width=52)


def zsplit_phase_logits(x, k, bias, acc_dtype=None):
    """Phase logits [B, H+1, W+1, 4*cout] via the z-split reassociation.

    With acc_dtype=f32 this mirrors the Pallas kernel's arithmetic
    EXACTLY (ADVICE r3 fix: the old oracle cast the row-add to bf16 and
    added bias in bf16; the kernel keeps f32 through row-add + bias and
    casts once at the end): f32 conv accumulation, f32 row add, f32 bias
    add, one cast to x.dtype.
    """
    cout = k.shape[-1]
    pk = _phase_kernels(k)                       # [2, 2, CIN, 4*cout]
    # K2: [1, 2, CIN, 2*4*cout]; lane order (u, phase, class)
    k2 = jnp.concatenate([pk[0][None], pk[1][None]], axis=-1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    z = jax.lax.conv_general_dilated(
        xp, k2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype or x.dtype)  # [B, 322, 321, 8*cout]
    n = 4 * cout
    y = z[:, :-1, :, :n] + z[:, 1:, :, n:]            # stays in acc dtype
    y = y + jnp.tile(bias, 4).astype(y.dtype)         # [B, 321, 321, 20]
    return y.astype(x.dtype)                          # single final cast


def _interleave_argmax(y, b, h, w, cout):
    phases = (y[:, :-1, :-1, 0 * cout:1 * cout],
              y[:, :-1, 1:, 1 * cout:2 * cout],
              y[:, 1:, :-1, 2 * cout:3 * cout],
              y[:, 1:, 1:, 3 * cout:4 * cout])
    a = jnp.stack([jnp.argmax(p, axis=-1).astype(jnp.int8)
                   for p in phases], axis=-1)
    a = a.reshape(b, h, w, 2, 2)
    a = a.transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, 2 * w)
    return a.astype(jnp.int32)


def zsplit_argmax(x, k, bias, acc_dtype=None):
    """1x2-conv reassociation of the phase conv + fused argmax/interleave."""
    b, h, w, _ = x.shape
    y = zsplit_phase_logits(x, k, bias, acc_dtype=acc_dtype)
    return _interleave_argmax(y, b, h, w, k.shape[-1])


def tie_aware_disagreement(oracle_logits, got_ids, want_ids, cout):
    """Count argmax disagreements that are NOT bf16 near-ties.

    Both paths cast final logits to bf16 before argmax, so accumulation-
    order noise can only flip the argmax where the top-2 bf16 logits sit
    within ~1 ulp of each other. For every full-res pixel where
    got != want, look up the oracle's bf16 phase logits at BOTH class
    picks and require |l[want] - l[got]| <= one bf16 ulp at that scale.
    Returns (n_disagree, n_real) where n_real are non-tie disagreements.
    """
    b, hp1, wp1, _ = oracle_logits.shape
    h, w = hp1 - 1, wp1 - 1
    lg = np.asarray(oracle_logits, np.float32)
    phases = np.stack([lg[:, :-1, :-1, 0 * cout:1 * cout],
                       lg[:, :-1, 1:, 1 * cout:2 * cout],
                       lg[:, 1:, :-1, 2 * cout:3 * cout],
                       lg[:, 1:, 1:, 3 * cout:4 * cout]], axis=3)
    # -> full-res [B, 2H, 2W, cout] logit field matching the id layout
    full = phases.reshape(b, h, w, 2, 2, cout).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)
    dis = got_ids != want_ids
    n_dis = int(dis.sum())
    if n_dis == 0:
        return 0, 0
    sel = full[dis]                                  # [n_dis, cout]
    rows = np.arange(n_dis)
    lw = sel[rows, want_ids[dis]]
    lgot = sel[rows, got_ids[dis]]
    # one bf16 ulp at the magnitude of the larger logit (bf16 has 8
    # mantissa bits -> ulp ~= 2^-8 * 2^ceil(log2 |v|))
    scale = np.maximum(np.maximum(np.abs(lw), np.abs(lgot)), 2.0 ** -126)
    ulp = 2.0 ** (np.floor(np.log2(scale)) - 7)
    n_real = int((np.abs(lw - lgot) > ulp).sum())
    return n_dis, n_real


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, CIN), DT)
    k = jnp.asarray(rng.randn(3, 3, CIN, NCLS) * 0.1, DT)
    bias = jnp.asarray(rng.randn(NCLS) * 0.1, DT)

    # correctness vs shipped path first
    want = np.asarray(upsample2x_conv3x3_argmax(x[:2], k, bias))
    got = np.asarray(zsplit_argmax(x[:2], k, bias))
    agree = (want == got).mean()
    print(f"zsplit vs shipped argmax agreement: {agree:.6f} "
          f"(<1.0 only at float-associativity ties)")

    timed("a) shipped upsample2x_conv3x3_argmax",
          lambda x: upsample2x_conv3x3_argmax(x, k, bias), x)
    timed("b) z-split 1x2 conv N=40 + row-add + argmax",
          lambda x: zsplit_argmax(x, k, bias), x)
    timed("c) z-split with f32 accum",
          lambda x: zsplit_argmax(x, k, bias, acc_dtype=jnp.float32), x)

    from hydranet_tpu.ops.fused_upsample_conv import _phase_argmax_interleave
    from hydranet_tpu.ops.pallas_seg_final import phase_logits_pallas

    # kernel variant sweep: halo strategy (all-Element views vs manual
    # DMA) x row loops (sequential vs full-unrolled — Mosaic can then
    # interleave the per-row VPU assembly with the MXU dots) x row-block
    # size (smaller rb = shorter unrolled loops + more pipelined grid
    # steps). Per-cell isolation: one Mosaic rejection must not kill the
    # rest of the sweep (chain v7's lesson).
    #
    # Parity gate (ADVICE r3 fix, tie-aware): the oracle is the f32-accum
    # z-split that now mirrors the kernel's arithmetic EXACTLY (f32 conv
    # accum -> f32 row add -> f32 bias add -> one bf16 cast). Residual
    # argmax flips can still come from f32 accumulation ORDER (XLA conv
    # vs Mosaic dot) rounding the final bf16 cast differently at a
    # near-tie, so the gate counts only disagreements whose top-2 bf16
    # logit gap exceeds one bf16 ulp — real errors, not ties. Agreement
    # vs the shipped bf16-accum path is reported for the record.
    oracle_logits = np.asarray(
        zsplit_phase_logits(x[:2], k, bias, acc_dtype=jnp.float32))
    wantp = np.asarray(_interleave_argmax(
        jnp.asarray(oracle_logits), 2, H, W, NCLS))
    first = True
    for halo in ("element", "dma"):
        for unroll, rb in ((False, None), (True, None), (True, 32),
                           (True, 16)):
            tag = f"halo={halo} unroll={int(unroll)} rb={rb or 'max'}"

            def pallas_argmax(x, halo=halo, unroll=unroll, rb=rb):
                y = phase_logits_pallas(x, k, bias, halo=halo,
                                        unroll=unroll, max_rb=rb or 128)
                return _phase_argmax_interleave(y, x.shape[0], H, W, NCLS)

            try:
                gotp = np.asarray(pallas_argmax(x[:2]))
                n_dis, n_real = tie_aware_disagreement(
                    oracle_logits, gotp, wantp, NCLS)
                agree = 1.0 - n_dis / wantp.size
                assert n_real == 0, (
                    f"{tag}: {n_real} NON-TIE argmax disagreements "
                    f"(of {n_dis} total) vs matched f32 oracle")
                if first:
                    print(f"pallas vs matched f32 oracle: agreement "
                          f"{agree:.6f} ({n_dis} tie flips, 0 real); "
                          f"vs shipped (bf16-accum) path: "
                          f"{(want == gotp).mean():.6f}")
                    first = False
                timed(f"d) pallas+argmax {tag}", pallas_argmax, x)
            except Exception as e:  # keep later cells alive
                print(f"d) pallas {tag} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
