"""Per-component property tables via an MXU one-hot matmul Pallas kernel.

Replaces `jax.ops.segment_sum` in the quantification megastep
(reference semantics: skimage regionprops_table area/centroid,
quantify_droplets_batch.py:81-95). XLA lowers segment_sum to a scatter-add,
which on TPU runs at ~40 ns/update regardless of collisions — measured
85 ms per 8x512x512 batch, i.e. 65% of the whole megastep. This kernel
reformulates the aggregation as matrix multiplies that run on the MXU with
all intermediates VMEM-resident:

    table[k, f] = sum_p [label(p) == k] * feat(p, f)

with the label split into (hi = k // 128, lo = k % 128) so the one-hot
factors stay small:  A = concat_f(onehot_hi * feat_f)  (5*40, chunk)
                     L = onehot_lo                     (128,  chunk)
    chunk_table = A @ L^T   ->  (5*40, 128) == (f, hi, lo)

(HI, LO) = (40, 128) rather than the r2 (65, 64): a 128-wide N side fills
the MXU's native tile (64 ran at half utilization) and the feature
multiplies shrink from 5*65 to 5*40 rows — measured faster with identical
exactness; CAP grows to 5120 slots as a side effect.

Exactness (integer results, no rounding):
  - one-hots and feature payloads (each <= 255: count bit, coordinate
    chunks of at most 8 bits) are exact in bf16;
  - each sub-chunk's f32 MXU dot sums <= (2^bits - 1) * chunk, exact while
    that bound is < 2^24 (`table_kernel_is_exact`; quantify falls back to
    the scatter path for the extreme-aspect shapes that violate it);
  - sub-chunks and chunks accumulate in int32 (the SUB=8 per-super-chunk
    results and the revisited output block across grid
    steps), bounded by (2^bits - 1) * n_pixels < 2^31 — guaranteed by the
    caller's `_coord_plan` (ops.connected_components), which narrows the
    chunk width below 8 bits for images past ~8.4M pixels.

Feature order: [count, axis-0 chunks low..high, axis-1 chunks low..high]
per the (shifts, bits) plan — the historical default is the byte split
[count, row & 255, row >> 8, col & 255, col >> 8].
Labels beyond CAP-1 one-hot to nothing and are dropped — callers detect
overflow via the separately-computed component count, exactly like the
segment_sum path did.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = 40
LO = 128
CAP = HI * LO  # 5120 table slots: labels 0 (background) .. 5119
NFEAT = 5  # feature count of the default byte-split plan


SUB = 8  # sub-chunks per grid step (Mosaic: 2nd-to-last block dim % 8 == 0)


def _chunk_for(w: int) -> int:
    """Lane-dimension chunk the kernel will use for image width `w`:
    whole rows, as many as fit ~4096 lanes (one row for wider images)."""
    return max(1, 4096 // w) * w


MAX_CHUNK = 8192
"""Widest supported lane chunk. Two bounds meet here: (a) every
per-sub-chunk VMEM buffer (bf16 one-hots, feature rows, int32 iotas —
the largest is the (LO, chunk) int32 iota at 4 * 128 * chunk bytes) stays
comfortably inside the 16 MB default scoped VMEM; (b) with bits <= 8 the
f32 per-dot exactness bound (2^bits - 1) * chunk < 2^24 holds with 8x
margin. Images wider than one row of this (w > 8192) take the scatter
path instead — exact at any size, just not MXU-accelerated."""


def table_kernel_is_exact(h: int, w: int, bits: int) -> bool:
    """True iff this (shape, plan) is inside the kernel's supported-and-
    exact domain: chunk <= MAX_CHUNK and each label's per-dot f32 sum
    (<= (2^bits - 1) * chunk) below 2^24. quantify falls back to the
    portable scatter path when this is False (single rows wider than
    MAX_CHUNK lanes)."""
    chunk = _chunk_for(w)
    return chunk <= MAX_CHUNK and ((1 << bits) - 1) * chunk < (1 << 24)


def _props_kernel(h0_ref, w_ref, lab_ref, out_ref, *, shifts, bits):
    """Grid (B, n_super). lab block: (1, SUB, chunk) int32 labels, flattened
    row-major; out block: (1, nfeat * HI, LO) int32, revisited across the
    super-chunk dimension. h0/w live whole in SMEM (rank-1 SMEM blocks
    cannot be per-step sliced by the Mosaic lowering).

    Each sub-chunk's MXU dot accumulates in f32 — exact iff its largest
    per-label partial sum (2^bits - 1) * chunk stays < 2^24 (see
    `table_kernel_is_exact`; callers fall back to scatter otherwise). The
    SUB per-sub-chunk results are accumulated in int32 rather than f32.
    Within today's supported domain (chunk <= MAX_CHUNK = 8192) f32
    accumulation would also have been exact — 255 * 8 * 8192 = 16.7M,
    a <0.4% margin under 2^24 — so int32 buys no correctness today; it
    removes that margin and keeps the accumulation exact for any future
    chunk widening (255 * 8 * 16384 = 33.4M would round in f32)."""
    chunk = lab_ref.shape[-1]
    nfeat = 1 + 2 * len(shifts)
    m = (1 << bits) - 1
    w = w_ref[0]                          # image width (SMEM scalar)
    h0 = h0_ref[pl.program_id(1)]         # first row of this super-chunk

    def body(s, acc):
        # fori_loop (not unrolled) keeps one sub-chunk's one-hot buffers
        # live at a time — unrolling blew the 16 MB VMEM stack
        lab = lab_ref[0, s, :].reshape(1, chunk)
        p = (s * chunk
             + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1))
        row = h0 + p // w
        col = p % w

        hi = lab // LO          # (1, chunk)
        lo = lab % LO

        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (HI, chunk), 0)
        oh_hi = (hi_iota == hi).astype(jnp.bfloat16)      # (HI, chunk)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (LO, chunk), 0)
        oh_lo = (lo_iota == lo).astype(jnp.bfloat16)      # (LO, chunk)

        feats = (
            (jnp.ones((1, chunk), jnp.bfloat16),)
            + tuple(((row >> sh) & m).astype(jnp.bfloat16) for sh in shifts)
            + tuple(((col >> sh) & m).astype(jnp.bfloat16) for sh in shifts)
        )
        a = jnp.concatenate([oh_hi * f for f in feats], axis=0)

        return acc + jax.lax.dot_general(
            a, oh_lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                                # (nfeat*HI, LO)

    tab = jax.lax.fori_loop(
        0, SUB, body, jnp.zeros((nfeat * HI, LO), jnp.int32))

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = tab

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[0] = out_ref[0] + tab


@functools.partial(jax.jit, static_argnames=("shifts", "bits", "interpret"))
def component_tables(labels: jax.Array, shifts=(0, 8), bits: int = 8,
                     interpret: bool = False) -> jax.Array:
    """(B, H, W) int32 compact label images -> (B, CAP, nfeat) int32 tables.

    table[b, k] = [pixel count, per-(shifts, bits)-plan coordinate chunk
    sums] of label k (k = 0 is background). Exact integers; see module
    docstring. The default plan is the historical byte split.
    """
    b, h, w = labels.shape
    nfeat = 1 + 2 * len(shifts)
    # chunk = k rows, flattened to the lane dimension OUTSIDE the kernel
    # (in-kernel sublane->lane reshapes are Mosaic-hostile); SUB chunks per
    # grid step satisfy the (8, 128) block-divisibility rule
    if not table_kernel_is_exact(h, w, bits):
        raise ValueError(
            f"component_tables: plan bits={bits} width={w} exceeds the "
            "f32 per-dot exactness bound (use the scatter path)")
    k = max(1, 4096 // w)
    n_super = -(-h // (k * SUB))
    pad = n_super * k * SUB - h
    if pad:
        # padded rows get an out-of-range label so they one-hot to nothing
        # (keeps even the background row 0 exact)
        labels = jnp.pad(labels, ((0, 0), (0, pad), (0, 0)),
                         constant_values=CAP)
    chunk = k * w
    lab3 = labels.reshape(b, n_super * SUB, chunk)
    h0s = (np.arange(n_super, dtype=np.int32) * k * SUB)

    out = pl.pallas_call(
        functools.partial(_props_kernel, shifts=tuple(shifts),
                          bits=int(bits)),
        grid=(b, n_super),
        in_specs=[
            pl.BlockSpec((n_super,), lambda i, j: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i, j: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SUB, chunk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nfeat * HI, LO), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nfeat * HI, LO), jnp.int32),
        interpret=interpret,
    )(h0s, np.asarray([w], np.int32), lab3)

    # (B, nfeat*HI, LO) -> (B, nfeat, HI*LO) -> (B, CAP, nfeat)
    return out.reshape(b, nfeat, CAP).transpose(0, 2, 1)


def component_tables_reference(labels: jax.Array, shifts=(0, 8),
                               bits: int = 8) -> jax.Array:
    """jnp oracle for the kernel (and the non-TPU fallback path)."""
    b, h, w = labels.shape
    p = h * w
    m = (1 << bits) - 1
    rows = jnp.arange(p, dtype=jnp.int32) // w
    cols = jnp.arange(p, dtype=jnp.int32) % w
    feats = jnp.stack(
        [jnp.ones(p, jnp.int32)]
        + [(rows >> s) & m for s in shifts]
        + [(cols >> s) & m for s in shifts], axis=-1)

    def one(lab):
        return jax.ops.segment_sum(feats, lab.reshape(-1), num_segments=CAP)

    return jax.vmap(one)(labels)
