"""Connected-component labeling on TPU.

Replaces the reference's host-side `skimage.measure.label`
(quantify_droplets_batch.py:82,86; algorithms.py:174) with a fully jittable
device algorithm, so the mask->droplet-table stage never leaves HBM.

Algorithm: iterative min-root propagation using SEGMENTED SCANS rather than
gathers — TPU random-access gathers over a 262k-element image are an order
of magnitude slower than vectorized scans, so classic pointer-jumping
union-find is the wrong shape for this hardware. Each sweep:

  1. forward + backward segmented min-scan along rows (every maximal
     horizontal run of foreground takes its run-minimum in one pass), then
  2. the same along columns,
  3. (8-connectivity only) four diagonal shifted mins.

A sweep moves information across entire straight runs at once, so blob-like
droplet masks converge in 2-4 sweeps (`lax.while_loop` until fixpoint;
serpentine worst cases just iterate more). The component root is the minimum
flat index == first pixel in raster order, so ranking roots by a 2D cumsum
reproduces skimage/scipy label ordering exactly (labels 1..n assigned in
raster order of first pixel) — this makes the droplet CSV `label` column
match the reference. Consecutive per-pixel labels come from a second
max-propagation of the rank image (again scans — no sort, no gather).

All shapes are static; batching via `jax.vmap` (the while_loop then runs
until every image in the batch converges).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DIAGONALS = ((-1, -1), (-1, 1), (1, -1), (1, 1))


def _shift(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """shifted[..., y, x] = x[..., y+dy, x+dx] with `fill` outside bounds.
    Operates on the last two dims (leading dims batch)."""
    h, w = x.shape[-2:]
    pt, pb = max(-dy, 0), max(dy, 0)
    plf, prt = max(-dx, 0), max(dx, 0)
    pad = [(0, 0)] * (x.ndim - 2) + [(pt, pb), (plf, prt)]
    padded = jnp.pad(x, pad, constant_values=fill)
    return padded[..., dy + pt: dy + pt + h, dx + plf: dx + plf + w]


def _shift1d(x: jax.Array, d: int, axis: int, fill) -> jax.Array:
    """shifted[..., i, ...] = x[..., i+d, ...] along `axis` (negative from
    the end), `fill` outside."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(-d, 0), max(d, 0))
    padded = jnp.pad(x, pad, constant_values=fill)
    start = d + max(-d, 0)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, start + n)
    return padded[tuple(idx)]


def _seg_scan(v: jax.Array, fg: jax.Array, identity, axis: int,
              reverse: bool, is_min: bool) -> jax.Array:
    """Segmented min/max scan along `axis`: prefix-reduce within contiguous
    foreground runs; background resets the segment. Hand-rolled
    Hillis-Steele doubling — lax.associative_scan generates a much larger
    HLO graph that blows up compile time inside batched while_loops.

    Monoid: elements (value, p) with p = 'window contains no reset';
    combine((av,ap),(bv,bp)) = (bp ? comb(av,bv) : bv, ap & bp); identity is
    (`identity`, True), and shifting in (identity, False) is equivalent once
    a window crosses the array edge (value already covers the full run)."""
    comb = jnp.minimum if is_min else jnp.maximum
    n = v.shape[axis]
    p = fg
    d = 1
    sgn = 1 if reverse else -1  # pull from the right when reversed
    while d < n:
        vs = _shift1d(v, sgn * d, axis, identity)
        ps = _shift1d(p, sgn * d, axis, False)
        v = jnp.where(p, comb(v, vs), v)
        p = p & ps
        d *= 2
    return v


def _run_ids(fg: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(row_rid, col_rid): 1-based index of the foreground run each pixel's
    row/column position belongs to (monotone non-decreasing along the axis;
    background pixels keep the id of the preceding run). Depends only on the
    mask, so it is computed ONCE per propagation, outside the while_loop."""
    rids = []
    for axis in (-1, -2):
        prev = _shift1d(fg, -1, axis, False)
        start = fg & ~prev
        rids.append(jnp.cumsum(start.astype(jnp.int32), axis=axis))
    return rids[0], rids[1]


def _seg_scan_cum(v: jax.Array, fg: jax.Array, fill, axis: int,
                  reverse: bool, is_min: bool, rid: jax.Array, big: int
                  ) -> jax.Array:
    """Segmented scan as a PLAIN cumulative min/max via the run-id offset
    trick: with values (incl. fill) in [0, big), u = v -/+ big*rid makes
    every earlier(/later) run's value lose any min(/max) comparison against
    the current run by at least big - fill > 0, so an ordinary prefix
    min/max of u followed by undoing the offset is exactly the segmented
    scan. This halves the Hillis-Steele work: the doubling ladder runs on
    ONE int32 array (9 shift+combine steps) instead of the (value,
    predicate) pair with per-step selects. (lax.cummin itself lowers ~4.5x
    SLOWER than the ladder on this TPU backend — measured r3 — so the
    ladder is hand-rolled.) Caller guarantees fill + big * max(rid) < 2^31
    (checked statically in _propagate_xla)."""
    v = jnp.where(fg, v, fill)  # bg holds stale values after a prior scan
    # sign: offsets must penalize runs EARLIER in scan order for prefix
    # scans and LATER for suffix scans; min penalizes upward, max downward.
    sgn = (1 if reverse else -1) if is_min else (-1 if reverse else 1)
    off = (sgn * big) * rid
    u = v + off
    # plain cummin/cummax via a hand-rolled doubling ladder: lax.cummin on
    # this TPU backend lowers ~4.5x slower than these 9 shift+combine steps
    # (measured via device_profile r3); the shifted-in pad constant only
    # ever loses comparisons, so it needs no overflow headroom.
    comb = jnp.minimum if is_min else jnp.maximum
    pad_const = (2 ** 31 - 1) if is_min else -(2 ** 31)
    n = u.shape[axis]
    d = 1
    shift_sgn = 1 if reverse else -1  # pull from the right when reversed
    while d < n:
        u = comb(u, _shift1d(u, shift_sgn * d, axis, pad_const))
        d *= 2
    return u - off


def _sweep(lab: jax.Array, fg: jax.Array, fill, connectivity: int,
           is_min: bool, rids=None, big: int = 0) -> jax.Array:
    """One propagation sweep (see module docstring). With `rids`, row/col
    segmented scans use the cummin/cummax offset trick (`_seg_scan_cum`)."""
    v = jnp.where(fg, lab, fill)
    for axis in (-1, -2):
        if rids is not None:
            rid = rids[0] if axis == -1 else rids[1]
            v = _seg_scan_cum(v, fg, fill, axis, False, is_min, rid, big)
            v = _seg_scan_cum(v, fg, fill, axis, True, is_min, rid, big)
        else:
            v = _seg_scan(v, fg, fill, axis, False, is_min)
            v = _seg_scan(v, fg, fill, axis, True, is_min)
    if connectivity == 2:
        comb = jnp.minimum if is_min else jnp.maximum
        m = jnp.where(fg, v, fill)
        for dy, dx in _DIAGONALS:
            v = comb(v, _shift(m, dy, dx, fill))
    return jnp.where(fg, v, lab)


def _scan_setup(fg: jax.Array, scan_impl: str):
    """(scan_impl, rids, big) for _sweep.

    scan_impl: 'cum' (offset-trick cumulative scans), 'hs' (Hillis-Steele
    doubling), or None = auto: 'cum' whenever its int32 headroom holds —
    values <= h*w and run ids <= ceil(n/2) along an n-length axis need
    h*w + (h*w+1)*ceil(max(h,w)/2) < 2^31 (true through ~1290^2, which
    also bounds the exact-regionprops images); 'hs' beyond.

    big must exceed the max propagated VALUE (not the fill, which is 0 for
    max-propagation): roots are flat indices < h*w, ranks <= ceil(h*w/2).
    """
    h, w = fg.shape[-2:]
    big = h * w + 1
    if scan_impl is None:
        fits = h * w + big * (max(h, w) // 2 + 1) < 2 ** 31
        scan_impl = "cum" if fits else "hs"
    rids = _run_ids(fg) if scan_impl == "cum" else None
    return scan_impl, rids, big


def _propagate_xla(init: jax.Array, fg: jax.Array, fill, connectivity: int,
                   is_min: bool, scan_impl: str = None) -> jax.Array:
    """Pure-XLA propagation to fixpoint (every sweep round-trips HBM)."""
    lab, _ = _propagate_counted(init, fg, fill, connectivity, is_min,
                                scan_impl)
    return lab


def _propagate_counted(init: jax.Array, fg: jax.Array, fill,
                       connectivity: int, is_min: bool,
                       scan_impl: str = None):
    """Propagate to fixpoint; also return the int32 count of sweeps that
    changed anything. A second propagation over the SAME mask needs exactly
    this many sweeps (see `_propagate_n`), letting it skip the fixpoint
    verify sweep and the per-sweep convergence reductions."""
    _, rids, big = _scan_setup(fg, scan_impl)

    def body(state):
        lab, _, k = state
        new = _sweep(lab, fg, fill, connectivity, is_min, rids, big)
        ch = jnp.any(new != lab)
        return new, ch, k + ch.astype(jnp.int32)

    lab, _, k = lax.while_loop(
        lambda s: s[1], body, (init, jnp.bool_(True), jnp.int32(0)))
    return lab, k


def _propagate_n(init: jax.Array, fg: jax.Array, fill, connectivity: int,
                 is_min: bool, n: jax.Array, scan_impl: str = None
                 ) -> jax.Array:
    """Exactly `n` sweeps, no convergence checks. Sound when `n` is the
    changing-sweep count of a prior propagation over the same mask: the
    distinguished value (component-min root index / component-max rank
    seeded at that same root) wins every comparison it enters, so its
    spread through the run/scan structure is value-independent — both
    propagations reach all pixels of a component on the same sweep."""
    _, rids, big = _scan_setup(fg, scan_impl)
    return lax.fori_loop(
        0, n,
        lambda i, lab: _sweep(lab, fg, fill, connectivity, is_min, rids,
                              big),
        init)


def _propagate(init: jax.Array, fg: jax.Array, fill, connectivity: int,
               is_min: bool, scan_impl: str = None) -> jax.Array:
    """Run sweeps to fixpoint on (..., H, W).

    Stays pure-XLA by design: the propagation is not the dominant cost of
    quantification (the property aggregation was, see ops/pallas_props.py).
    A VMEM-resident Pallas propagation kernel was built and removed in
    round 2: bit-identical but 350 s+ Mosaic compiles (large-lane rolls)
    for no measured speedup. The round-3 win was algorithmic instead: the
    offset-trick cumulative scans (`_seg_scan_cum`)."""
    return _propagate_xla(init, fg, fill, connectivity, is_min, scan_impl)


def _cumsum2d(x: jax.Array) -> jax.Array:
    """Inclusive cumsum over the flattened (H, W) array, computed as
    row-cumsums + row-offsets (fast TPU shape; a flat 262k cumsum is slow)."""
    cs = jnp.cumsum(x, axis=1)
    tot = cs[:, -1]
    offs = jnp.cumsum(tot) - tot
    return cs + offs[:, None]


@functools.partial(jax.jit, static_argnames=("connectivity",))
def propagate_roots(mask: jax.Array, connectivity: int = 1) -> jax.Array:
    """Min flat-index of each pixel's component (bg pixels keep own index)."""
    h, w = mask.shape
    fg = mask.astype(bool)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    big = h * w
    return _propagate(idx, fg, big, connectivity, is_min=True)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label(mask: jax.Array, connectivity: int = 1
          ) -> Tuple[jax.Array, jax.Array]:
    """Label connected components of a 2D binary mask.

    Args:
      mask: (H, W) bool/int array.
      connectivity: 1 (4-neighbors, reference quantify path,
        quantify_droplets_batch.py:82) or 2 (8-neighbors, algorithms.py:174).

    Returns:
      (labels, n): labels is (H, W) int32 with background 0 and components
      numbered 1..n in raster order of their first pixel (skimage-compatible);
      n is the int32 component count.
    """
    h, w = mask.shape
    fg = mask.astype(bool)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    roots, n_sweeps = _propagate_counted(idx, fg, h * w, connectivity,
                                         is_min=True)
    is_root = fg & (roots == idx)
    rank = _cumsum2d(is_root.astype(jnp.int32))  # at a root: its 1-based label
    rank_img = jnp.where(is_root, rank, 0)
    labels = _propagate_n(rank_img, fg, 0, connectivity,
                          is_min=False, n=n_sweeps)
    labels = jnp.where(fg, labels, 0)
    return labels, is_root.sum().astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label_batch(masks: jax.Array, connectivity: int = 1
                ) -> Tuple[jax.Array, jax.Array]:
    """Batched `label`: (B, H, W) masks -> (labels (B, H, W), n (B,)).
    Both propagations run natively batched (one compilation per batch)."""
    b, h, w = masks.shape
    fg = masks.astype(bool)
    idx = jnp.broadcast_to(
        jnp.arange(h * w, dtype=jnp.int32).reshape(h, w), (b, h, w))
    big = h * w
    roots, n_sweeps = _propagate_counted(idx, fg, big, connectivity,
                                         is_min=True)
    is_root = fg & (roots == idx)
    rank = jax.vmap(_cumsum2d)(is_root.astype(jnp.int32))
    rank_img = jnp.where(is_root, rank, 0)
    labels = _propagate_n(rank_img, fg, 0, connectivity,
                          is_min=False, n=n_sweeps)
    return (jnp.where(fg, labels, 0),
            is_root.sum(axis=(1, 2)).astype(jnp.int32))


def remove_small_batch(masks: jax.Array, min_size, max_labels: int,
                       connectivity: int = 2) -> jax.Array:
    """Batched remove_objects (algorithms.py:354-367): drop components
    smaller than min_size. Gather-free: component areas land in a compact
    table, keep flags are scattered back to the root pixels and
    max-propagated over each component."""
    return remove_small_batch_counted(masks, min_size, max_labels,
                                      connectivity)[0]


@functools.partial(jax.jit,
                   static_argnames=("max_labels", "connectivity"))
def remove_small_batch_counted(
        masks: jax.Array, min_size, max_labels: int,
        connectivity: int = 2) -> Tuple[jax.Array, jax.Array]:
    """`remove_small_batch` plus the EXACT per-image component count
    (B,) int32 — counted from the propagation roots, independent of the
    table cap, so callers can detect cap overflow and degrade-to-correct
    by re-running at a doubled cap (see `library.remove_objects`; the
    reference's skimage path has no cap, algorithms.py:354-367)."""
    b, h, w = masks.shape
    n_pix = h * w
    fg = masks.astype(bool)
    idx = jnp.broadcast_to(
        jnp.arange(n_pix, dtype=jnp.int32).reshape(h, w), (b, h, w))
    big = n_pix
    roots, n_sweeps = _propagate_counted(idx, fg, big, connectivity,
                                         is_min=True)
    is_root = fg & (roots == idx)
    rank = jax.vmap(_cumsum2d)(is_root.astype(jnp.int32))

    cap = max_labels + 1

    def keep_seed(fg_i, is_root_i, rank_i, roots_i):
        keys = jnp.where(fg_i, roots_i, n_pix).reshape(-1)
        areas = jax.ops.segment_sum(
            jnp.ones_like(keys), keys, num_segments=n_pix + 1)
        n_i = is_root_i.sum()
        slot = jnp.where(is_root_i & (rank_i <= max_labels), rank_i, 0
                         ).reshape(-1)
        compact_root = jnp.zeros(cap, jnp.int32).at[slot].set(
            jnp.where(slot > 0, idx[0].reshape(-1), 0))
        valid = (jnp.arange(cap) >= 1) & (jnp.arange(cap) <= n_i)
        keep = valid & (areas[compact_root] >= min_size)
        # cap-sized scatter of keep flags onto the root pixels
        seed = jnp.zeros(n_pix + 1, jnp.int32).at[
            jnp.where(valid, compact_root, n_pix)].set(keep.astype(jnp.int32))
        return seed[:-1].reshape(h, w)

    # components ranked beyond max_labels have unknown area: keep them
    # (conservative pass-through) so no component silently disappears;
    # the returned exact count lets callers detect this and re-run at a
    # larger cap for the correct sieve (degrade-to-correct)
    overflow = is_root & (rank > max_labels)
    seeds = jax.vmap(keep_seed)(fg, is_root, rank, roots)
    seeds = jnp.where(overflow, 1, seeds)
    kept = _propagate_n(jnp.where(fg, seeds, 0), fg, 0,
                        connectivity, is_min=False, n=n_sweeps)
    return fg & (kept > 0), is_root.sum(axis=(1, 2)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def component_areas(labels: jax.Array, num_segments: int) -> jax.Array:
    """areas[k] = pixel count of label k (index 0 = background)."""
    flat = labels.reshape(-1)
    return jax.ops.segment_sum(
        jnp.ones_like(flat, jnp.int32), flat, num_segments=num_segments
    )


@functools.partial(jax.jit, static_argnames=("num_segments",))
def sieve_small_components(
    labels: jax.Array, min_area: int, num_segments: int
) -> Tuple[jax.Array, jax.Array]:
    """Drop components smaller than `min_area` pixels and renumber 1..m
    preserving raster order — reproduces the reference's
    sieve-then-relabel (quantify_droplets_batch.py:83-86).

    `num_segments` must exceed the maximum label value.
    """
    areas = component_areas(labels, num_segments)
    keep = areas >= jnp.asarray(min_area, areas.dtype)
    keep = keep.at[0].set(False)
    new_ids = jnp.cumsum(keep.astype(jnp.int32)) * keep
    return new_ids[labels], keep.sum().astype(jnp.int32)


def _coord_plan(h: int, w: int, force_split: bool = False):
    """Static plan for EXACT int32 per-component coordinate sums at any
    image size (the reference's host skimage path has no size bound,
    quantify_droplets_batch.py:81-95 — neither may we).

    Returns (shifts, bits):
      (None, None)  -> a single int32 payload per axis is exact
                       (component sum <= n_pix * max_coord < 2^31);
      otherwise     -> each coordinate is split into len(shifts) chunks of
                       `bits` bits (chunk c = (coord >> shifts[c]) & mask),
                       with bits chosen so (2^bits - 1) * n_pix < 2^31,
                       i.e. every chunk's per-component sum is exact int32
                       no matter how large the component is.

    `force_split=True` requests a split plan even when unsplit would be
    exact — the Pallas table kernel needs payloads <= 255 for bf16
    exactness (ops/pallas_props.py), so it always aggregates chunks.
    """
    n_pix = h * w
    if n_pix >= 2 ** 31:
        raise ValueError(
            f"image {h}x{w} has >= 2^31 pixels: flat int32 pixel indices "
            "overflow; tile the image")
    mc = max(h - 1, w - 1, 1)
    if not force_split and n_pix * mc < 2 ** 31:
        return None, None
    bits = min(8, ((2 ** 31 - 1) // n_pix + 1).bit_length() - 1)
    shifts = tuple(range(0, mc.bit_length(), bits))
    return shifts, bits


def _out_base_bits(h: int, w: int) -> int:
    """log2 of the OUTPUT recombination base for split coordinate sums:
    totals are emitted as (lo, hi) int32 pairs with
    total == hi * 2^obits + lo. 8 keeps the historical byte contract
    ('sum-N-lo'/'sum-N-hi') whenever hi = total >> 8 fits int32
    (total bound n_pix * max_coord < 2^39, i.e. through 8192x8192);
    16 ('sum-N-lo16'/'sum-N-hi16') extends exactness to 2^47 — beyond
    any image that also satisfies n_pix < 2^31."""
    bound = h * w * max(h - 1, w - 1, 1)
    if bound < 2 ** 39:
        return 8
    if bound < 2 ** 47:
        return 16
    raise ValueError(
        f"image {h}x{w}: coordinate-sum bound {bound} exceeds the 2-limb "
        "int32 output contract (2^47); tile the image")


def _chunks_to_lo_hi(chunks: jax.Array, shifts, bits: int, obits: int):
    """Exact (lo, hi) int32 recombination of per-chunk coordinate sums:
    total = sum_c chunks[..., c] << shifts[c] == hi * 2^obits + lo.

    Multiprecision in int32: every hi term floor(term_c / 2^obits) is
    bounded by total / 2^obits < 2^31 (enforced by `_out_base_bits`), so
    the left-shifts below never wrap; `(v << s) & mask` is exact
    mod-2^obits arithmetic even where the raw int32 shift wraps (int32
    wrap is mod 2^32, a multiple of the mask modulus). lo accumulates at
    most len(shifts) * (2^obits - 1) — far inside int32."""
    del bits  # plan symmetry; exactness needs only the shifts
    lo = jnp.zeros_like(chunks[..., 0])
    hi = jnp.zeros_like(chunks[..., 0])
    mask = (1 << obits) - 1
    for c, s in enumerate(shifts):
        v = chunks[..., c]
        if s >= obits:
            hi = hi + (v << (s - obits))
        else:
            hi = hi + (v >> (obits - s))
            lo = lo + ((v << s) & mask)
    return lo, hi


def _chunks_to_total(chunks: jax.Array, shifts) -> jax.Array:
    """Exact single-int32 recombination — valid only when the caller's
    plan says the unsplit total fits int32 (n_pix * max_coord < 2^31)."""
    tot = jnp.zeros_like(chunks[..., 0])
    for c, s in enumerate(shifts):
        tot = tot + (chunks[..., c] << s)
    return tot


def _assemble_quantify(csums, n_total, hw, min_area, max_labels,
                       want_presieve: bool, shifts, bits: int):
    """Shared sieve + relabel + output assembly from per-component sums.

    csums: (cap, 1 + 2k) int32 — [area, axis0 chunk sums..., axis1 chunk
    sums...] in raster-rank order (slot k = pre-sieve label k), or
    (cap, 3) [area, sum0, sum1] when shifts is None (unsplit-exact).

    Output contract (consumed by pipelines/quantify_batch.py
    props_to_dataframe): 'area' plus per-axis coordinate sums as either a
    bare 'sum-N-lo' (total itself, small images), a ('sum-N-lo',
    'sum-N-hi') pair with total = hi * 256 + lo, or a ('sum-N-lo16',
    'sum-N-hi16') pair with total = hi * 65536 + lo (giant images)."""
    h, w = hw
    cap = max_labels + 1
    slots = jnp.arange(cap)
    slot_valid = (slots >= 1) & (slots <= n_total)
    area = jnp.where(slot_valid, csums[:, 0], 0)

    if shifts is None:
        payload = csums  # (cap, 3)
        pre0 = csums[:, 1].astype(jnp.float32)
        pre1 = csums[:, 2].astype(jnp.float32)
        obits = None
    else:
        k = len(shifts)
        obits = _out_base_bits(h, w)
        lo0, hi0 = _chunks_to_lo_hi(csums[:, 1:1 + k], shifts, bits, obits)
        lo1, hi1 = _chunks_to_lo_hi(csums[:, 1 + k:1 + 2 * k], shifts, bits,
                                    obits)
        payload = jnp.stack([csums[:, 0], lo0, hi0, lo1, hi1], axis=-1)
        # f32 combination for device consumers (heatmap centroids): rounds
        # above 2^24 by design — the exact path is the int32 (lo, hi) pair
        pre0 = hi0.astype(jnp.float32) * float(2 ** obits) + lo0
        pre1 = hi1.astype(jnp.float32) * float(2 ** obits) + lo1

    keep = slot_valid & (area >= min_area)
    new_label = jnp.cumsum(keep.astype(jnp.int32)) * keep
    out = jnp.zeros((cap, payload.shape[1]), jnp.int32).at[new_label].set(
        jnp.where(keep[:, None], payload, 0))
    result = {
        "count": keep.sum().astype(jnp.int32),
        "total": n_total,
    }
    if shifts is None:
        result["area"] = out[1:, 0]
        result["sum-0-lo"] = out[1:, 1]
        result["sum-1-lo"] = out[1:, 2]
    else:
        suffix = "" if obits == 8 else "16"
        result["area"] = out[1:, 0]
        result[f"sum-0-lo{suffix}"] = out[1:, 1]
        result[f"sum-0-hi{suffix}"] = out[1:, 2]
        result[f"sum-1-lo{suffix}"] = out[1:, 3]
        result[f"sum-1-hi{suffix}"] = out[1:, 4]
    if want_presieve:
        # pre-sieve table in raster order (labels as if min_area == 1)
        result["all_area"] = area[1:]
        result["all_sum-0"] = jnp.where(slot_valid, pre0, 0.0)[1:]
        result["all_sum-1"] = jnp.where(slot_valid, pre1, 0.0)[1:]
        result["all_count"] = jnp.minimum(n_total, max_labels)
    return result


def _props_impl(max_labels: int) -> str:
    """Which property-aggregation backend quantify uses (trace time):
    'pallas' = MXU one-hot matmul kernel (ops/pallas_props.py; TPU only,
    ~30x faster than XLA's scatter lowering of segment_sum), 'scatter' =
    the portable segment_sum path. UNETDC_TPU_PROPS=scatter forces the
    fallback; =interp runs the kernel in interpret mode (for CPU testing).
    """
    import os

    from unetdc_tpu.ops.pallas_props import CAP

    mode = os.environ.get("UNETDC_TPU_PROPS")
    if mode in ("scatter", "pallas", "interp"):
        return mode if max_labels + 1 <= CAP or mode == "scatter" \
            else "scatter"
    if max_labels + 1 > CAP:
        return "scatter"
    return "pallas" if jax.default_backend() == "tpu" else "scatter"


@functools.partial(jax.jit, static_argnames=("max_labels", "connectivity",
                                             "want_presieve", "impl"))
def quantify_mask_batch(masks: jax.Array, min_area: jax.Array,
                        max_labels: int, connectivity: int = 1,
                        want_presieve: bool = False, impl: str = None):
    """Batched `quantify_mask`: the propagation while_loop runs natively on
    (B, H, W) — compiling it once for the batch instead of per-vmap-instance
    keeps XLA compile time linear — and the cheap per-image table math is
    vmapped over precomputed roots. With `want_presieve`, the pre-sieve
    component table (area + f32-combined coordinate sums in raster order)
    is also returned, so callers that need both sieved and unsieved stats
    pay for the propagation only once.

    `impl` (default auto, see `_props_impl`): 'pallas' ranks components and
    aggregates properties with the MXU one-hot kernel; 'scatter' uses the
    portable segment_sum path."""
    b, h, w = masks.shape
    fg = masks.astype(bool)
    idx = jnp.broadcast_to(
        jnp.arange(h * w, dtype=jnp.int32).reshape(h, w), (b, h, w))
    big = h * w
    roots, n_sweeps = _propagate_counted(idx, fg, big, connectivity,
                                         is_min=True)
    if impl is None:
        impl = _props_impl(max_labels)
    if impl in ("pallas", "interp"):
        from unetdc_tpu.ops.pallas_props import table_kernel_is_exact

        kshifts, kbits = _coord_plan(h, w, force_split=True)
        if not table_kernel_is_exact(h, w, kbits):
            # extreme aspect ratio (single row wider than the f32 per-dot
            # exactness bound): the portable scatter path stays exact
            impl = "scatter"
    if impl in ("pallas", "interp"):
        from unetdc_tpu.ops.pallas_props import component_tables

        is_root = fg & (roots == idx)
        n_total = is_root.sum(axis=(1, 2)).astype(jnp.int32)
        rank = jax.vmap(_cumsum2d)(is_root.astype(jnp.int32))
        labels = _propagate_n(jnp.where(is_root, rank, 0), fg, 0,
                              connectivity, is_min=False, n=n_sweeps)
        labels = jnp.where(fg, labels, 0)
        tables = component_tables(labels, shifts=kshifts, bits=kbits,
                                  interpret=(impl == "interp"))
        return jax.vmap(
            lambda t, n: _quantify_from_table(t, n, (h, w), min_area,
                                              max_labels, want_presieve)
        )(tables, n_total)
    return jax.vmap(
        lambda m, r: _quantify_from_roots(m, r, min_area, max_labels,
                                          want_presieve)
    )(masks, roots)


def _quantify_from_table(table, n_total, hw, min_area, max_labels,
                         want_presieve: bool = False):
    """Sieve + relabel + output assembly from a per-label property table
    (ops/pallas_props.py layout: [count, axis-0 chunk sums..., axis-1
    chunk sums...] per label slot, chunked per `_coord_plan(h, w,
    force_split=True)`). Produces the exact output contract of
    `_quantify_from_roots` (same keys, same int32 exactness bounds)."""
    h, w = hw
    kshifts, kbits = _coord_plan(h, w, force_split=True)
    cap = max_labels + 1
    t = table[:cap]
    k = len(kshifts)
    img_shifts, img_bits = _coord_plan(h, w)
    if img_shifts is None:
        # recombine the kernel's chunks on device (exact in int32 here) so
        # the device->host transfer stays at 3 tables like the scatter path
        csums = jnp.stack([t[:, 0],
                           _chunks_to_total(t[:, 1:1 + k], kshifts),
                           _chunks_to_total(t[:, 1 + k:1 + 2 * k], kshifts)],
                          axis=-1)
        return _assemble_quantify(csums, n_total, hw, min_area, max_labels,
                                  want_presieve, None, 0)
    return _assemble_quantify(t, n_total, hw, min_area, max_labels,
                              want_presieve, kshifts, kbits)


def _quantify_from_roots(mask, roots, min_area, max_labels,
                         want_presieve: bool = False):
    h, w = mask.shape
    n_pix = h * w
    cap = max_labels + 1
    fg = mask.astype(bool)
    idx = jnp.arange(n_pix, dtype=jnp.int32).reshape(h, w)
    is_root = fg & (roots == idx)
    n_total = is_root.sum().astype(jnp.int32)
    rank = _cumsum2d(is_root.astype(jnp.int32))

    keys = jnp.where(fg, roots, n_pix).reshape(-1)
    rows = jnp.arange(n_pix, dtype=jnp.int32) // w
    cols = jnp.arange(n_pix, dtype=jnp.int32) % w
    # Exact at ANY image size: when a full-image component's coordinate
    # sums could exceed int32, split coordinates into `_coord_plan` chunks
    # (bytes through ~2896^2, narrower chunks beyond) — exactness at the
    # cost of extra scatter payloads. The common (<=~1290^2) case keeps
    # the cheaper 3-payload scatter.
    shifts, bits = _coord_plan(h, w)
    if shifts is None:
        feats = jnp.stack([jnp.ones_like(rows), rows, cols], axis=-1)
    else:
        m = (1 << bits) - 1
        feats = jnp.stack(
            [jnp.ones_like(rows)]
            + [(rows >> s) & m for s in shifts]
            + [(cols >> s) & m for s in shifts], axis=-1)
    sums = jax.ops.segment_sum(feats, keys, num_segments=n_pix + 1)

    slot = jnp.where(is_root & (rank <= max_labels), rank, 0).reshape(-1)
    compact_root = jnp.zeros(cap, jnp.int32).at[slot].set(
        jnp.where(slot > 0, idx.reshape(-1), 0))
    csums = sums[compact_root]  # (cap, 3 or 1 + 2 * n_chunks)
    return _assemble_quantify(csums, n_total, (h, w), min_area, max_labels,
                              want_presieve, shifts, bits)


@functools.partial(jax.jit,
                   static_argnames=("max_labels", "connectivity"))
def quantify_mask(mask: jax.Array, min_area: jax.Array, max_labels: int,
                  connectivity: int = 1):
    """Fused component statistics WITHOUT materializing a label image — the
    flagship quantification path (reference semantics of
    quantify_droplets_batch.py:81-95: label -> drop area<min_area ->
    relabel -> area/centroid table in raster order).

    Per-pixel work stays in scans/scatters; per-component work happens in
    compact (max_labels+1,) arrays. Returns dict with:
      'count': int32 number of surviving components (<= max_labels)
      'total': int32 number of components before the sieve (overflow check)
      'area', 'sum-0', 'sum-1': (max_labels,) int32 tables, entries [0:count)
        = kept components in raster order (label k = index k-1).
    """
    roots = propagate_roots(mask, connectivity)
    return _quantify_from_roots(mask, roots, min_area, max_labels)


def quantify_mask_adaptive(mask: jax.Array, min_area, max_labels: int = 4096,
                           connectivity: int = 1):
    """Degrade-to-correct `quantify_mask`: when the exact component count
    ('total', counted from propagation roots independent of the cap)
    overflows the table cap, re-run at the next power-of-two cap that
    fits — the same rescue the flagship engine applies per batch
    (pipelines/engine.py `_rerun_with_cap`). The reference has no cap at
    all (quantify_droplets_batch.py:81-95); this wrapper restores that
    contract for direct library/ops callers at the cost of one extra
    compile on pathological masks."""
    cap = max_labels
    while True:
        stats = quantify_mask(mask, jnp.asarray(min_area), cap,
                              connectivity)
        total = int(stats["total"])
        if total <= cap:
            return stats
        while cap < total:
            cap *= 2
